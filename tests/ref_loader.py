"""Import the reference PyTorch implementation (read-only at /root/reference)
for parity testing, stubbing the native deps absent from this image
(numba, torchdiffeq). Torch runs on CPU only.

The stub odeint implements torchdiffeq's fixed-grid euler semantics so
reference `synthesise` outputs are well-defined for parity comparison.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        class _AnyType:
            def __getitem__(self, item):
                return self

            def __call__(self, *a, **k):
                return self

        numba.int32 = _AnyType()
        numba.float32 = _AnyType()
        numba.void = _AnyType()

        def jit(signature=None, **kwargs):
            def deco(fn):
                return fn

            return deco

        numba.jit = jit
        sys.modules["numba"] = numba

    if "torchdiffeq" not in sys.modules:
        import torch

        td = types.ModuleType("torchdiffeq")

        def _odeint_euler(func, y0, t):
            """Fixed-grid euler identical to torchdiffeq's grid stepping."""
            ys = [y0]
            y = y0
            for i in range(len(t) - 1):
                dt = t[i + 1] - t[i]
                y = y + dt * func(t[i], y)
                ys.append(y)
            return torch.stack(ys)

        # Faithful reimplementation of torchdiffeq's adaptive RK solvers
        # (rk_common.py): Hairer initial-step selection, RMS error norm,
        # accept/reject controller with dfactor->1 on accept, FSAL, and
        # 4th-order dense-output interpolation at the requested times.
        # Tableaus use torchdiffeq's constants (dopri5 error weights are the
        # tf-contrib 1951/21600 family, NOT the textbook 5179/57600 set).
        _DP5_SOL = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
        _DP5_LOW = [1951 / 21600, 0.0, 22642 / 50085, 451 / 720, -12231 / 42400, 649 / 6300, 1 / 60]
        _ADAPTIVE_TABLEAUS = {
            "dopri5": dict(
                alpha=[1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0],
                beta=[
                    [1 / 5],
                    [3 / 40, 9 / 40],
                    [44 / 45, -56 / 15, 32 / 9],
                    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
                    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
                    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
                ],
                c_sol=_DP5_SOL,
                c_error=[h - l for h, l in zip(_DP5_SOL, _DP5_LOW)],
                order=5,
                c_mid=[
                    6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
                    -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
                    -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
                ],
            ),
            "bosh3": dict(
                alpha=[1 / 2, 3 / 4, 1.0],
                beta=[[1 / 2], [0.0, 3 / 4], [2 / 9, 1 / 3, 4 / 9]],
                c_sol=[2 / 9, 1 / 3, 4 / 9, 0.0],
                c_error=[2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8],
                order=3,
                c_mid=[0.0, 0.5, 0.0, 0.0],
            ),
            "fehlberg2": dict(
                alpha=[1 / 2, 1.0],
                beta=[[1 / 2], [1 / 256, 255 / 256]],
                c_sol=[1 / 512, 255 / 256, 1 / 512],
                c_error=[1 / 512 - 1 / 256, 0.0, 1 / 512],
                order=2,
                c_mid=[1 / 1024, 255 / 512, 1 / 1024],
            ),
            "adaptive_heun": dict(
                alpha=[1.0],
                beta=[[1.0]],
                c_sol=[1 / 2, 1 / 2],
                c_error=[-1 / 2, 1 / 2],
                order=2,
                c_mid=[1 / 4, 1 / 4],
            ),
        }

        import numpy as _np

        def _rms(x):
            # torchdiffeq's _rms_norm keeps the tensor dtype (f32 here)
            return _np.float32(torch.sqrt(torch.mean(x ** 2)))

        def _odeint_adaptive(func, y0, t, method, rtol, atol, max_steps=10000):
            # controller scalars (t, dt, error ratio, factors) are all
            # np.float32, matching torchdiffeq's f32 tensor arithmetic — and
            # the f32 controller in stabletts_tpu/ops/ode.py being verified
            tab = _ADAPTIVE_TABLEAUS[method]
            alpha, beta = tab["alpha"], tab["beta"]
            c_sol, c_err, c_mid = tab["c_sol"], tab["c_error"], tab["c_mid"]
            order = tab["order"]
            is_fsal = c_sol[-1] == 0.0 and list(beta[-1]) == list(c_sol[:-1])
            f32 = _np.float32
            rtol, atol = f32(rtol), f32(atol)
            t = [f32(ti) for ti in t]
            t0 = t[0]
            y = y0.clone()
            f0 = func(torch.tensor(t0), y)

            # _select_initial_step (called with order - 1 -> exponent 1/order)
            scale = atol + y.abs() * rtol
            d0, d1 = _rms(y / scale), _rms(f0 / scale)
            h0 = f32(1e-6) if (d0 < 1e-5 or d1 < 1e-5) else f32(0.01) * d0 / d1
            fp = func(torch.tensor(t0 + h0), y + h0 * f0)
            d2 = f32(_rms((fp - f0) / scale) / h0)
            if d1 <= 1e-15 and d2 <= 1e-15:
                h1 = max(f32(1e-6), f32(h0 * f32(1e-3)))
            else:
                h1 = f32(f32(0.01 / max(d1, d2)) ** f32(1.0 / order))
            dt = min(f32(100) * h0, h1)

            t_prev, t_cur, fc = t0, t0, f0
            coeffs = [y.clone()] * 5
            outs = [y0]
            ti = 1

            def interp_at(tq):
                span = f32(t_cur - t_prev)
                x = f32(0.0) if span <= 0 else f32((tq - t_prev) / span)
                a, b, c, d_, e_ = coeffs
                return (((a * x + b) * x + c) * x + d_) * x + e_

            n = 0
            while ti < len(t):
                if t[ti] <= t_cur:
                    outs.append(interp_at(t[ti]))
                    ti += 1
                    continue
                assert n < max_steps, "max steps exceeded"
                n += 1
                # one attempted RK step of size dt from (t_cur, y, fc)
                ks = [fc]
                yi = y
                for i in range(len(alpha)):
                    yi = y
                    for j, b_ in enumerate(beta[i]):
                        if b_ != 0.0:
                            yi = yi + dt * b_ * ks[j]
                    ks.append(func(torch.tensor(f32(t_cur + f32(dt * f32(alpha[i])))), yi))
                if is_fsal:
                    y1 = yi
                else:
                    y1 = y
                    for i, cs in enumerate(c_sol):
                        if cs != 0.0:
                            y1 = y1 + dt * cs * ks[i]
                err = torch.zeros_like(y)
                y_mid = y
                for i in range(len(c_sol)):
                    if c_err[i] != 0.0:
                        err = err + dt * c_err[i] * ks[i]
                    if c_mid[i] != 0.0:
                        y_mid = y_mid + dt * c_mid[i] * ks[i]
                etol = atol + rtol * torch.maximum(y.abs(), y1.abs())
                e = _rms(err / etol)
                accept = e <= 1.0
                dfac = f32(1.0) if e < 1.0 else f32(0.2)
                efac = f32(f32(0.9) * f32(max(e, f32(1e-10)) ** f32(-1.0 / order)))
                fac = min(f32(10.0), max(efac, dfac))
                if accept:
                    f1 = ks[-1]
                    a = 2.0 * dt * (f1 - fc) - 8.0 * (y1 + y) + 16.0 * y_mid
                    b = dt * (5.0 * fc - 3.0 * f1) + 18.0 * y + 14.0 * y1 - 32.0 * y_mid
                    c = dt * (f1 - 4.0 * fc) - 11.0 * y - 5.0 * y1 + 16.0 * y_mid
                    coeffs = [a, b, c, dt * fc, y.clone()]
                    t_prev, t_cur, y, fc = t_cur, f32(t_cur + dt), y1, f1
                dt = f32(dt * fac)
            return torch.stack(outs)

        # Faithful reimplementation of torchdiffeq's fixed_adams.py
        # AdamsBashforthMoulton (method='implicit_adams'): 3/8-rule RK4
        # bootstrap while the f-history is short (_MIN_ORDER=4), then a
        # growing-order Adams-Bashforth predictor + Adams-Moulton corrector
        # iterated at most _MAX_ITERS=4 times with an element-wise linf
        # convergence ratio on the increment. History deque holds
        # max_order-1 = 11 values. Coefficients derived exactly (rational
        # Lagrange integration) instead of transcribing torchdiffeq's
        # integer tables.
        from fractions import Fraction as _Fr

        def _lagrange_integrals(nodes):
            out = []
            for j, xj in enumerate(nodes):
                poly = [_Fr(1)]
                denom = _Fr(1)
                for i, xi in enumerate(nodes):
                    if i == j:
                        continue
                    new = [_Fr(0)] * (len(poly) + 1)
                    for k, c in enumerate(poly):
                        new[k + 1] += c
                        new[k] -= c * xi
                    poly = new
                    denom *= xj - xi
                out.append(float(sum(c / (k + 1) for k, c in enumerate(poly)) / denom))
            return out

        _AB = {k: _lagrange_integrals([_Fr(-i) for i in range(k)]) for k in range(1, 12)}
        _AM = {k: _lagrange_integrals([_Fr(1 - i) for i in range(k)]) for k in range(1, 13)}
        assert _AB[4] == [55 / 24, -59 / 24, 37 / 24, -9 / 24]
        assert _AM[4] == [9 / 24, 19 / 24, -5 / 24, 1 / 24]

        def _odeint_implicit_adams(func, y0, t, rtol, atol, max_order=12,
                                   max_iters=4, require_convergence=False):
            ys = [y0]
            y = y0
            hist = []  # f at past grid points, newest first
            for n in range(len(t) - 1):
                t0, t1 = t[n], t[n + 1]
                dt = t1 - t0
                f0 = func(t0, y)
                hist = [f0] + hist[: max_order - 2]
                order = len(hist)
                if order < 3:  # _MIN_ORDER - 1
                    k1 = f0
                    k2 = func(t0 + dt / 3, y + dt * k1 / 3)
                    k3 = func(t0 + dt * 2 / 3, y + dt * (k2 - k1 / 3))
                    k4 = func(t1, y + dt * (k1 - k2 + k3))
                    dy = (k1 + 3 * (k2 + k3) + k4) * dt * 0.125
                else:
                    ab, am = _AB[order], _AM[order + 1]
                    dy = dt * sum(c * h for c, h in zip(ab, hist))
                    delta = dt * sum(c * h for c, h in zip(am[1:], hist))
                    converged = False
                    for _ in range(max_iters):
                        dy_old = dy
                        f_new = func(t1, y + dy)
                        dy = dt * am[0] * f_new + delta
                        scale = atol + rtol * torch.maximum(dy_old.abs(), dy.abs())
                        converged = bool(((dy_old - dy).abs() / scale).max() < 1)
                        if converged:
                            break
                    if require_convergence:
                        assert converged, f"corrector did not converge at step {n}"
                y = y + dy
                ys.append(y)
            return torch.stack(ys)

        def odeint(func, y0, t, method="euler", rtol=1e-7, atol=1e-9, **kw):
            if method in (None, "euler"):
                return _odeint_euler(func, y0, t)
            if method in _ADAPTIVE_TABLEAUS:
                return _odeint_adaptive(func, y0, t, method, rtol, atol)
            if method == "implicit_adams":
                return _odeint_implicit_adams(func, y0, t, rtol, atol, **kw)
            raise NotImplementedError(f"stub does not support method={method!r}")

        td.odeint = odeint
        sys.modules["torchdiffeq"] = td


def load_reference():
    """Returns the reference namespace (models etc.) with stubs installed."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import config as ref_config  # /root/reference/config.py
    import models.model as ref_model
    import models.estimator as ref_estimator

    return types.SimpleNamespace(
        config=ref_config,
        model=ref_model,
        estimator=ref_estimator,
    )


def load_reference_vocos():
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from vocoders.vocos.models import model as ref_vocos_model

    return ref_vocos_model
