"""ODE solver tests: convergence on analytic problems, torchdiffeq-grid
semantics (step sizes = grid diffs), and adaptive-solver trajectory parity
against a faithful torch reimplementation of torchdiffeq's algorithm
(tests/ref_loader.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stabletts_tpu.ops.ode import odeint, odeint_fixed, odeint_dopri5


def test_euler_linear_decay():
    # dy/dt = -y, y(0)=1 -> y(1)=e^-1; euler with n steps ~ (1-1/n)^n
    f = lambda t, y: -y
    y0 = jnp.ones((2, 3))
    n = 100
    t = jnp.linspace(0.0, 1.0, n + 1)
    y = odeint_fixed(f, y0, t, "euler")
    expected = (1 - 1 / n) ** n
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)


def test_rk4_accuracy():
    f = lambda t, y: -y
    y0 = jnp.ones((1,))
    t = jnp.linspace(0.0, 1.0, 11)
    y = odeint_fixed(f, y0, t, "rk4")
    np.testing.assert_allclose(np.asarray(y), np.exp(-1.0), rtol=1e-6)


def test_midpoint_and_heun_better_than_euler():
    f = lambda t, y: jnp.cos(t) * y  # y(t) = exp(sin t)
    y0 = jnp.ones(())
    t = jnp.linspace(0.0, 1.0, 11)
    exact = np.exp(np.sin(1.0))
    errs = {m: abs(float(odeint_fixed(f, y0, t, m)) - exact) for m in ("euler", "midpoint", "heun2", "heun3", "rk4")}
    assert errs["midpoint"] < errs["euler"]
    assert errs["heun2"] < errs["euler"]
    assert errs["rk4"] < errs["midpoint"]


def test_dopri5_adaptive():
    f = lambda t, y: -10.0 * y
    y0 = jnp.ones((4,))
    y = odeint_dopri5(f, y0, 0.0, 1.0, rtol=1e-6, atol=1e-6)
    # atol dominates at |y| ~ 1e-5, so global relative error is ~1e-3
    np.testing.assert_allclose(np.asarray(y), np.exp(-10.0), rtol=5e-3)


def test_adaptive_solver_family():
    # all four adaptive solvers converge on a smooth problem
    f = lambda t, y: jnp.cos(t) * y  # y(t) = exp(sin t)
    y0 = jnp.ones((4,))
    exact = np.exp(np.sin(1.0))
    for method, tol in [("dopri5", 1e-4), ("bosh3", 1e-3), ("fehlberg2", 5e-3), ("adaptive_heun", 5e-3)]:
        y = odeint(f, y0, jnp.linspace(0.0, 1.0, 11), method=method, max_steps=2048)
        np.testing.assert_allclose(np.asarray(y), exact, rtol=tol, err_msg=method)


def test_implicit_adams():
    # order-4 multistep: should beat heun2 on the same grid and approach rk4
    f = lambda t, y: jnp.cos(t) * y
    y0 = jnp.ones(())
    t = jnp.linspace(0.0, 1.0, 21)
    exact = np.exp(np.sin(1.0))
    err_adams = abs(float(odeint(f, y0, t, method="implicit_adams")) - exact)
    err_heun = abs(float(odeint(f, y0, t, method="heun2")) - exact)
    assert err_adams < err_heun
    assert err_adams < 1e-5
    # short grids fall back to pure RK4 bootstrap
    t3 = jnp.linspace(0.0, 1.0, 4)
    y3 = odeint(f, y0, t3, method="implicit_adams")
    np.testing.assert_allclose(float(y3), exact, rtol=1e-3)


def test_adaptive_solvers_jit_with_batched_state():
    import jax

    f = lambda t, y: -y
    y0 = jnp.ones((2, 8, 4))
    # 5e-3: torchdiffeq semantics overshoot t=1 and interpolate back with a
    # quartic whose midpoint estimate is only solver-order accurate, so the
    # low-order solvers land ~2e-3 off the analytic value (as torchdiffeq
    # itself does) — trajectory parity is asserted separately in
    # test_adaptive_trajectory_parity_vs_torchdiffeq
    for method in ("bosh3", "adaptive_heun"):
        y = jax.jit(lambda y0: odeint(f, y0, jnp.linspace(0.0, 1.0, 2), method=method))(y0)
        np.testing.assert_allclose(np.asarray(y), np.exp(-1.0), rtol=5e-3)


def test_dispatch_and_nonuniform_grid():
    f = lambda t, y: -y
    y0 = jnp.ones(())
    # non-uniform grid: steps follow grid diffs exactly
    t = jnp.asarray([0.0, 0.5, 1.0, 1.25, 2.0])
    y = odeint(f, y0, t, method="euler")
    expected = 1.0
    tn = np.asarray(t)
    for dt in np.diff(tn):
        expected *= 1 - dt
    np.testing.assert_allclose(float(y), expected, rtol=1e-6)


@pytest.mark.parametrize("method", ["dopri5", "bosh3", "fehlberg2", "adaptive_heun"])
def test_adaptive_trajectory_parity_vs_torchdiffeq(method):
    """Step-for-step parity with torchdiffeq's adaptive solvers (reference:
    models/flow_matching.py:54 rtol/atol=1e-5): same initial-step selection,
    same accept/reject controller, same dense-output interpolation at t=1.

    The oracle is tests/ref_loader.py's faithful torch reimplementation of
    torchdiffeq's rk_common.py. On a 6-dim linear+forcing system the final
    states agree to ~1e-6 (the residual is f-eval ulp noise flipping no
    accept/reject decisions at this size)."""
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_loader import _install_stubs

    _install_stubs()
    import torchdiffeq

    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6)).astype(np.float32) * 0.8
    y0 = rng.standard_normal((4, 6)).astype(np.float32)

    def ft(t, y):
        return y @ torch.from_numpy(A).T + torch.sin(3.0 * t) * 0.5

    def fj(t, y):
        return y @ jnp.asarray(A).T + jnp.sin(3.0 * t) * 0.5

    ref = torchdiffeq.odeint(
        ft, torch.from_numpy(y0), torch.linspace(0, 1, 11), method=method,
        rtol=1e-5, atol=1e-5,
    )[-1].numpy()
    got = np.asarray(
        odeint(fj, jnp.asarray(y0), jnp.linspace(0.0, 1.0, 11), method=method, max_steps=20000)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_grid", [11, 31])
def test_implicit_adams_trajectory_parity_vs_torchdiffeq(n_grid):
    """Trajectory parity for `implicit_adams` against the faithful torch
    reimplementation of torchdiffeq's fixed_adams.py (tests/ref_loader.py):
    3/8-rule RK4 bootstrap, growing order up to 11, AM corrector with <= 4
    functional iterations and early convergence exit, default odeint
    tolerances (the reference's plain torchdiffeq.odeint call,
    models/flow_matching.py:54 / webui.py solver dropdown). The 31-point
    grid exercises order saturation and the scanned tail.

    Note: at the default tolerances the convergence threshold sits at f32
    machine precision, so the corrector runs all 4 iterations each step (in
    torchdiffeq too, which then warns 'Solution may be incorrect'); the
    early-exit path is still implemented and bit-matched. See the
    _odeint_implicit_adams docstring for the two fixed_adams.py details that
    are under-determined without the package installed."""
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_loader import _install_stubs

    _install_stubs()
    import torchdiffeq

    rng = np.random.default_rng(1)
    A = rng.standard_normal((6, 6)).astype(np.float32) * 0.8
    y0 = rng.standard_normal((4, 6)).astype(np.float32)

    def ft(t, y):
        return y @ torch.from_numpy(A).T + torch.sin(3.0 * t) * 0.5

    def fj(t, y):
        return y @ jnp.asarray(A).T + jnp.sin(3.0 * t) * 0.5

    tt = torch.linspace(0, 1, n_grid)
    ref = torchdiffeq.odeint(
        ft, torch.from_numpy(y0), tt, method="implicit_adams",
    )[-1].numpy()
    got = np.asarray(
        odeint(fj, jnp.asarray(y0), jnp.linspace(0.0, 1.0, n_grid),
               method="implicit_adams")
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_implicit_adams_jit():
    import jax

    f = lambda t, y: -y
    y0 = jnp.ones((2, 8))
    y = jax.jit(
        lambda y0: odeint(f, y0, jnp.linspace(0.0, 1.0, 21), method="implicit_adams")
    )(y0)
    np.testing.assert_allclose(np.asarray(y), np.exp(-1.0), rtol=1e-5)


def test_adaptive_bf16_state_keeps_f32_controller():
    # regression: with a bf16 state the step controller must still run in
    # f32 — a bf16 t/dt quantizes the grid (dy/dt=y gave 2.859 vs e) and can
    # exhaust max_steps mid-trajectory, silently returning a partial result
    f = lambda t, y: y
    y0 = jnp.ones((4, 8), jnp.bfloat16)
    y = odeint(f, y0, jnp.linspace(0.0, 1.0, 2), method="dopri5", max_steps=64)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), np.e, rtol=2e-2)
    # tight-tolerance check in f32 confirms the controller integrates fully
    y32 = odeint(f, jnp.ones(()), jnp.linspace(0.0, 1.0, 2), method="dopri5")
    np.testing.assert_allclose(float(y32), np.e, rtol=1e-4)
