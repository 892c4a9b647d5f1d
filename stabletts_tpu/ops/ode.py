"""Jit-compilable ODE solvers for the flow-matching sampler.

Replaces torchdiffeq (reference: models/flow_matching.py:54) with XLA-native
fixed-step integrators (`lax.scan`, static step count) plus a bounded-iteration
adaptive dopri5 for API parity. All solvers integrate dy/dt = f(t, y) over a
monotone t grid; fixed-step solvers evaluate exactly on the grid like
torchdiffeq's fixed-grid solvers do.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

FIXED_SOLVERS = ("euler", "midpoint", "heun2", "heun3", "rk4", "implicit_adams")
ADAPTIVE_SOLVERS = ("dopri5", "bosh3", "fehlberg2", "adaptive_heun")


def odeint_fixed(
    f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    t_span: jnp.ndarray,
    method: str = "euler",
) -> jnp.ndarray:
    """Integrate over the grid t_span ([N+1]) and return the final state.

    Step sizes are the grid diffs, so a linspace(0, 1, n+1) grid reproduces
    torchdiffeq's fixed-solver trajectory on the same grid.
    """
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]

    def euler(y, t, dt):
        return y + dt * f(t, y)

    def midpoint(y, t, dt):
        k1 = f(t, y)
        return y + dt * f(t + dt * 0.5, y + dt * 0.5 * k1)

    def heun2(y, t, dt):
        k1 = f(t, y)
        k2 = f(t + dt, y + dt * k1)
        return y + dt * 0.5 * (k1 + k2)

    def heun3(y, t, dt):
        k1 = f(t, y)
        k2 = f(t + dt / 3, y + dt / 3 * k1)
        k3 = f(t + dt * 2 / 3, y + dt * 2 / 3 * k2)
        return y + dt * 0.25 * (k1 + 3 * k3)

    def rk4(y, t, dt):
        k1 = f(t, y)
        k2 = f(t + dt * 0.5, y + dt * 0.5 * k1)
        k3 = f(t + dt * 0.5, y + dt * 0.5 * k2)
        k4 = f(t + dt, y + dt * k3)
        return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    if method == "implicit_adams":
        return _odeint_implicit_adams(f, y0, t_span)

    steppers = {"euler": euler, "midpoint": midpoint, "heun2": heun2, "heun3": heun3, "rk4": rk4}
    stepper = steppers[method]

    def body(y, t_dt):
        t, dt = t_dt
        y_new = stepper(y, t, dt).astype(y.dtype)  # keep the carry dtype stable
        return y_new, None

    y_final, _ = jax.lax.scan(body, y0, (ts, dts))
    return y_final


def _adams_coefficients(max_order: int = 12):
    """Exact Adams-Bashforth / Adams-Moulton coefficients via rational
    Lagrange-basis integration (equivalent to torchdiffeq's hard-coded
    _BASHFORTH_COEFFICIENTS/_MOULTON_COEFFICIENTS/_DIVISOR tables in
    fixed_adams.py, but derived instead of transcribed — the low orders are
    asserted against the textbook values below).

    ab[k][j] multiplies f_{n-j} (k terms); am[k][0] multiplies f_{n+1} and
    am[k][j>=1] multiplies f_{n-(j-1)} (k terms)."""
    from fractions import Fraction

    def lagrange_integrals(nodes):
        coeffs = []
        for j, xj in enumerate(nodes):
            poly = [Fraction(1)]  # ascending coefficients of prod(s - x_i)
            denom = Fraction(1)
            for i, xi in enumerate(nodes):
                if i == j:
                    continue
                new = [Fraction(0)] * (len(poly) + 1)
                for k, c in enumerate(poly):
                    new[k + 1] += c
                    new[k] -= c * xi
                poly = new
                denom *= xj - xi
            integral = sum(c / (k + 1) for k, c in enumerate(poly))
            coeffs.append(float(integral / denom))
        return coeffs

    ab = {k: lagrange_integrals([Fraction(-i) for i in range(k)])
          for k in range(1, max_order)}
    am = {k: lagrange_integrals([Fraction(1 - i) for i in range(k)])
          for k in range(1, max_order + 1)}
    assert ab[4] == [55 / 24, -59 / 24, 37 / 24, -9 / 24]
    assert am[4] == [9 / 24, 19 / 24, -5 / 24, 1 / 24]
    assert am[5] == [251 / 720, 646 / 720, -264 / 720, 106 / 720, -19 / 720]
    return ab, am


_AB_COEFFS, _AM_COEFFS = _adams_coefficients()
# torchdiffeq fixed_adams.py constants: orders below _MIN_ORDER-1 bootstrap
# with the 3/8-rule RK4; history deque holds max_order-1 values; the AM
# corrector runs at most _MAX_ITERS functional iterations.
_ADAMS_MIN_ORDER = 4
_ADAMS_MAX_ORDER = 12
_ADAMS_MAX_ITERS = 4


def _odeint_implicit_adams(f, y0, t_span, rtol=1e-7, atol=1e-9):
    """torchdiffeq's `implicit_adams` (fixed_adams.py AdamsBashforthMoulton,
    implicit=True), trajectory-faithful: the first two steps use the 3/8-rule
    RK4 (`rk4_alt_step_func`), after which the order grows with the f-history
    (order = min(len(history), 11)); each step runs an Adams-Bashforth
    predictor then an Adams-Moulton corrector iterated <= 4 times with
    torchdiffeq's element-wise linf convergence ratio (default odeint
    tolerances rtol=1e-7/atol=1e-9, as the reference's plain
    `torchdiffeq.odeint(..., method=solver)` call passes none).

    The pre-saturation steps are unrolled (static grid under jit); once the
    order saturates at 11 the remaining steps run under `lax.scan` with a
    [11, ...] history buffer, so compile cost is bounded for long grids.
    The corrector's early-exit is a bounded `lax.while_loop`, bit-matching
    torchdiffeq's `break` on convergence (at the default tolerances the
    threshold sits at f32 machine precision, so all 4 iterations run each
    step — torchdiffeq then warns 'Solution may be incorrect' but uses the
    final iterate, as this implementation does). Trajectory parity vs the
    in-repo torch oracle is asserted in tests/test_ode.py.

    Two fixed_adams.py details are under-determined without the package
    installed and documented as deviations: (a) the exact bootstrap length
    (this implementation switches from RK4 to Adams at the first step with 3
    history values); (b) any history-deque adjustment torchdiffeq makes in
    its non-convergence branch (this implementation always keeps the full
    history, so the order grows monotonically to 11).
    """
    n_steps = int(t_span.shape[0]) - 1
    f32 = jnp.float32
    y_dtype = jnp.result_type(y0)
    ts = t_span.astype(f32)

    def f32_eval(t, y):
        return f(t, y.astype(y_dtype)).astype(f32)

    hist_cap = _ADAMS_MAX_ORDER - 1

    def corrector(dy_pred, delta, b0, t1, dt, y):
        def cond(c):
            _, it, conv = c
            return (~conv) & (it < _ADAMS_MAX_ITERS)

        def body(c):
            dy, it, _ = c
            f_new = f32_eval(t1, y + dy)
            dy_new = dt * b0 * f_new + delta
            scale = atol + rtol * jnp.maximum(jnp.abs(dy), jnp.abs(dy_new))
            ratio = jnp.max(jnp.abs(dy - dy_new) / scale)
            return (dy_new, it + 1, ratio < 1.0)

        dy, _, _ = jax.lax.while_loop(
            cond, body, (dy_pred, jnp.asarray(0), jnp.asarray(False))
        )
        return dy

    def abm_step(y, hist, t0, t1, dt, order):
        """hist: list/array of f values, newest first, len == order."""
        ab = _AB_COEFFS[order]
        am = _AM_COEFFS[order + 1]
        dy_pred = dt * sum(ab[j] * hist[j] for j in range(order))
        delta = dt * sum(am[j + 1] * hist[j] for j in range(order))
        return corrector(dy_pred, delta, am[0], t1, dt, y)

    y = y0.astype(f32)
    hist: list = []  # f at past grid points, newest first
    i = 0
    # unrolled head: RK4 bootstrap + growing-order ABM until order saturates
    while i < n_steps and len(hist) < hist_cap:
        t0, t1 = ts[i], ts[i + 1]
        dt = t1 - t0
        f0 = f32_eval(t0, y)
        hist = [f0] + hist[: hist_cap - 1]
        order = len(hist)
        if order < _ADAMS_MIN_ORDER - 1:
            # rk4_alt_step_func: the 3/8 rule with k1 = the history f0
            k1 = f0
            k2 = f32_eval(t0 + dt / 3, y + dt * k1 / 3)
            k3 = f32_eval(t0 + dt * 2 / 3, y + dt * (k2 - k1 / 3))
            k4 = f32_eval(t1, y + dt * (k1 - k2 + k3))
            dy = (k1 + 3 * (k2 + k3) + k4) * dt * 0.125
        else:
            dy = abm_step(y, hist, t0, t1, dt, order)
        y = y + dy
        i += 1

    if i < n_steps:
        # saturated tail: fixed order = hist_cap, scanned
        hist_buf = jnp.stack(hist)  # [hist_cap, ...] newest first

        def body(carry, t01):
            y, h = carry
            t0, t1 = t01
            dt = t1 - t0
            f0 = f32_eval(t0, y)
            h = jnp.concatenate([f0[None], h[:-1]], axis=0)
            dy = abm_step(y, h, t0, t1, dt, hist_cap)
            return (y + dy, h), None

        (y, _), _ = jax.lax.scan(body, (y, hist_buf), (ts[i:-1], ts[i + 1:]))

    return y.astype(y_dtype)


# Embedded Runge-Kutta Butcher tableaus in torchdiffeq's representation:
# (alpha [s-1], beta rows, c_sol [s], c_error [s], order, c_mid [s]).
# c_error is b_high - b_low; torchdiffeq's dopri5 inherits the tf-contrib
# odes port's 4th-order weights (1951/21600, ...) which differ slightly from
# the textbook 5179/57600 set — reproduced here for trajectory parity with
# the reference's `torchdiffeq.odeint(..., method=solver)` call
# (reference: models/flow_matching.py:54, webui.py:110).
# c_mid defines y(t0+dt/2) for the quartic dense-output interpolant; dopri5's
# is torchdiffeq's DPS_C_MID, bosh3's its _BS_C_MID; the two order-2 solvers
# use c_sol/2 (a 2nd-order midpoint estimate, matching the solver's order).
_DOPRI5_B_LOW = [1951 / 21600, 0.0, 22642 / 50085, 451 / 720, -12231 / 42400, 649 / 6300, 1 / 60]
_TABLEAUS = {
    # Dormand-Prince 5(4)
    "dopri5": (
        [1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0],
        [
            [1 / 5],
            [3 / 40, 9 / 40],
            [44 / 45, -56 / 15, 32 / 9],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
            [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
        ],
        [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0],
        [h - l for h, l in zip([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0], _DOPRI5_B_LOW)],
        5,
        [
            6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
            -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
            -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
        ],
    ),
    # Bogacki-Shampine 3(2)
    "bosh3": (
        [1 / 2, 3 / 4, 1.0],
        [[1 / 2], [0.0, 3 / 4], [2 / 9, 1 / 3, 4 / 9]],
        [2 / 9, 1 / 3, 4 / 9, 0.0],
        [2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8],
        3,
        [0.0, 0.5, 0.0, 0.0],
    ),
    # Runge-Kutta-Fehlberg 2(1)
    "fehlberg2": (
        [1 / 2, 1.0],
        [[1 / 2], [1 / 256, 255 / 256]],
        [1 / 512, 255 / 256, 1 / 512],
        [1 / 512 - 1 / 256, 0.0, 1 / 512],
        2,
        [1 / 1024, 255 / 512, 1 / 1024],
    ),
    # Heun-Euler 2(1)
    "adaptive_heun": (
        [1.0],
        [[1.0]],
        [1 / 2, 1 / 2],
        [-1 / 2, 1 / 2],
        2,
        [1 / 4, 1 / 4],
    ),
}


def odeint_adaptive(
    f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    t0: float,
    t1: float,
    method: str = "dopri5",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 256,
    first_step: float | None = None,
    err_weight: jnp.ndarray | None = None,
    err_count: int | None = None,
) -> jnp.ndarray:
    """Adaptive embedded-RK integration matching torchdiffeq's algorithm.

    Runs under jit via lax.while_loop capped at max_steps accepted+rejected
    attempts; replaces torchdiffeq's adaptive solvers (dopri5/bosh3/fehlberg2/
    adaptive_heun) with trajectory-level parity:

    * first_step=None selects the initial step like torchdiffeq's
      `_select_initial_step` (Hairer I.4 heuristic: two extra f evals at t0).
    * steps are NOT clamped at t1 — the solver overshoots the interval end and
      the result at t1 is read from the 4th-order dense-output interpolant of
      the final accepted step, exactly like torchdiffeq's `_interp_evaluate`.
    * step controller: factor = min(10, max(0.9 / e^(1/order), dfactor)) with
      dfactor = 1 on accepted steps (dt never shrinks on accept) and 0.2 on
      rejected, e = RMS of error / (atol + rtol·max(|y0|,|y1|)).
    * FSAL: the next step's f0 is the last stage's k, not a fresh f(t1, y1).

    The step controller (t, dt, error norm) and the stage accumulation run in
    float32 regardless of y0.dtype: with a bf16 state the controller would
    quantize t/dt (verified: dy/dt=y over [0,1] in bf16 time gives 2.859 vs
    e=2.718 and can exhaust max_steps mid-trajectory). Only the f(t, y) calls
    see y0.dtype, so a bf16 network still computes in bf16.

    err_weight/err_count restrict the RMS error norm to the valid region of a
    padded state (weight broadcastable to y, 1 at valid elements; count = the
    number of valid elements). The serving path pads the mel length to an
    attention-block multiple (models/sampler.py) — without the mask the norm
    averages over pad frames whose velocity is identically zero, deflating
    the error ratio by sqrt(T_pad/T_valid) and silently loosening step
    control relative to the reference's unpadded torchdiffeq call.

    Caveat for TPU serving: the embedded error estimate sits on top of the
    network's own matmul noise. With default TPU matmul precision (bf16
    inputs) that noise floor is ~1e-2 relative, far above rtol/atol=1e-5, so
    the controller step-thrashes. Fixed-step solvers are the recommended
    production path (as the reference's README also recommends 10-30 fixed
    steps); adaptive solvers exist for API/behavior parity and run best at
    f32 matmul precision.
    """
    alpha, beta, c_sol, c_err, order, c_mid = _TABLEAUS[method]
    n_stages = len(c_sol)
    y_dtype = jnp.result_type(y0)
    f32 = jnp.float32
    is_fsal = c_sol[-1] == 0.0 and list(beta[-1]) == list(c_sol[:-1])

    def f32_eval(t, y):
        return f(t, y.astype(y_dtype)).astype(f32)

    if err_weight is None:
        def rms(x):
            return jnp.sqrt(jnp.mean(x.astype(f32) ** 2))
    else:
        w = err_weight.astype(f32)
        cnt = f32(err_count if err_count is not None else y0.size)

        def rms(x):
            return jnp.sqrt(jnp.sum((x.astype(f32) * w) ** 2) / cnt)

    def rk_step(t, dt, y, f0):
        # y, ks, and the combination arithmetic are f32; f is called at y_dtype
        ks = [f0]
        for i in range(n_stages - 1):
            yi = y
            for j, b in enumerate(beta[i]):
                if b != 0.0:
                    yi = yi + dt * b * ks[j]
            ks.append(f32_eval(t + dt * alpha[i], yi))
        if is_fsal:
            y1 = yi  # the last stage input IS y1 (its beta row == c_sol)
        else:
            y1 = y
            for i in range(n_stages):
                if c_sol[i] != 0.0:
                    y1 = y1 + dt * c_sol[i] * ks[i]
        err = jnp.zeros_like(y)
        y_mid = y
        for i in range(n_stages):
            if c_err[i] != 0.0:
                err = err + dt * c_err[i] * ks[i]
            if c_mid[i] != 0.0:
                y_mid = y_mid + dt * c_mid[i] * ks[i]
        return y1, ks[-1], err, y_mid

    def interp_fit(ya, yb, y_mid, fa, fb, dt):
        # torchdiffeq _interp_fit: quartic through (ya, y_mid, yb) with end
        # slopes dt*fa / dt*fb in x = (t - t0)/dt coordinates
        a = 2.0 * dt * (fb - fa) - 8.0 * (yb + ya) + 16.0 * y_mid
        b = dt * (5.0 * fa - 3.0 * fb) + 18.0 * ya + 14.0 * yb - 32.0 * y_mid
        c = dt * (fb - 4.0 * fa) - 11.0 * ya - 5.0 * yb + 16.0 * y_mid
        d = dt * fa
        return jnp.stack([a, b, c, d, ya])

    def err_ratio(y, y_new, err):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return rms(err / scale)

    y0f = y0.astype(f32)
    t0 = jnp.asarray(t0, dtype=f32)
    t1 = jnp.asarray(t1, dtype=f32)
    f0 = f32_eval(t0, y0f)

    if first_step is None:
        # torchdiffeq _select_initial_step (called with order-1, so the
        # exponent is 1/order)
        iscale = atol + jnp.abs(y0f) * rtol
        d0 = rms(y0f / iscale)
        d1 = rms(f0 / iscale)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), f32(1e-6), 0.01 * d0 / d1)
        yp = y0f + h0 * f0
        fp = f32_eval(t0 + h0, yp)
        d2 = rms((fp - f0) / iscale) / h0
        h1 = jnp.where(
            (d1 <= 1e-15) & (d2 <= 1e-15),
            jnp.maximum(f32(1e-6), h0 * 1e-3),
            (0.01 / jnp.maximum(d1, d2)) ** (1.0 / order),
        )
        dt0 = jnp.minimum(100.0 * h0, h1)
    else:
        dt0 = jnp.asarray(first_step, dtype=f32)

    def cond(state):
        _, t_cur, _, _, _, _, n = state
        return (t_cur < t1) & (n < max_steps)

    def body(state):
        t_prev, t_cur, y, fc, dt, coeffs, n = state
        y_new, f_new, err, y_mid = rk_step(t_cur, dt, y, fc)
        e = err_ratio(y, y_new, err)
        accept = e <= 1.0
        coeffs_new = interp_fit(y, y_new, y_mid, fc, f_new, dt)
        keep = lambda old, new: jnp.where(accept, new, old)
        # controller: never shrink on accept (dfactor -> 1), e=0 -> max growth
        dfac = jnp.where(e < 1.0, f32(1.0), f32(0.2))
        efac = 0.9 * jnp.maximum(e, 1e-10) ** (-1.0 / order)
        fac = jnp.minimum(f32(10.0), jnp.maximum(efac, dfac))
        return (
            keep(t_prev, t_cur),
            keep(t_cur, t_cur + dt),
            keep(y, y_new),
            keep(fc, f_new),
            dt * fac,
            keep(coeffs, coeffs_new),
            n + 1,
        )

    coeffs0 = jnp.stack([y0f] * 5)
    state = (t0, t0, y0f, f0, dt0, coeffs0, jnp.asarray(0))
    t_prev, t_cur, y_fin, _, _, coeffs, _ = jax.lax.while_loop(cond, body, state)

    # dense-output evaluation at t1 (torchdiffeq _interp_evaluate); if the
    # last accepted step landed exactly on t1 this reduces to y_fin
    span = jnp.maximum(t_cur - t_prev, 1e-30)
    x = jnp.clip((t1 - t_prev) / span, 0.0, 1.0)
    a, b, c, d, e_ = coeffs
    y_out = (((a * x + b) * x + c) * x + d) * x + e_
    y_out = jnp.where(t_cur > t_prev, y_out, y_fin)
    return y_out.astype(y_dtype)


def odeint_dopri5(f, y0, t0, t1, **kwargs) -> jnp.ndarray:
    """Back-compat alias for odeint_adaptive(method='dopri5')."""
    return odeint_adaptive(f, y0, t0, t1, method="dopri5", **kwargs)


def odeint(f, y0, t_span, method: str = "euler", **kwargs) -> jnp.ndarray:
    """Dispatch: fixed-grid solvers use the t_span grid; adaptive solvers
    integrate from t_span[0] to t_span[-1] with step control."""
    if method in FIXED_SOLVERS:
        return odeint_fixed(f, y0, t_span, method)
    if method in ADAPTIVE_SOLVERS:
        return odeint_adaptive(f, y0, t_span[0], t_span[-1], method=method, **kwargs)
    raise ValueError(f"unknown solver {method!r}; supported: {FIXED_SOLVERS + ADAPTIVE_SOLVERS}")
