"""ODE solver tests: convergence on analytic problems and torchdiffeq-grid
semantics (step sizes = grid diffs)."""

import numpy as np
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
    for method in ("bosh3", "adaptive_heun"):
        y = jax.jit(lambda y0: odeint(f, y0, jnp.linspace(0.0, 1.0, 2), method=method))(y0)
        np.testing.assert_allclose(np.asarray(y), np.exp(-1.0), rtol=1e-3)


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
