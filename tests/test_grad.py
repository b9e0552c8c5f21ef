"""Reverse-mode differentiability of the dynamical core.

A capability the reference cannot offer: `jax.grad` flows through the full
model step (thermo + 120-substep BBM momentum + transport), enabling
gradient-based calibration and adjoint/variational data assimilation. The
division floors and norm epsilons that make this NaN-free are documented at
their call sites (ops/momentum.py, ops/rheology.py) — they are invisible in
the float32 primal except on where-masked lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator


def _sim(tmp_path):
    cfg = Config({
        "grid.preset": "square", "grid.nx": 16, "grid.ny": 16,
        "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 8.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    })
    return Simulator(cfg)


def test_grad_through_full_step_finite_and_matches_fd(tmp_path):
    """d(mean KE after one step)/d(wind) is finite, nonzero, and its
    directional derivative matches a central finite difference."""
    sim = _sim(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()

    def loss(wind_u):
        s2, _, _ = sim.raw_step_fn(sim.state, f.replace(wind_u=wind_u), ti)
        return jnp.mean(s2.vt_u ** 2 + s2.vt_v ** 2)

    loss64 = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(f.wind_u)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    # directional FD check along a smooth perturbation
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(f.wind_u.shape).astype(np.float32))
    eps = 1e-2
    fd = (float(loss64(f.wind_u + eps * d)) - float(loss64(f.wind_u - eps * d))) / (2 * eps)
    ad = float(jnp.sum(jnp.asarray(g) * d))
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.15)


def test_grad_wrt_initial_state_finite(tmp_path):
    """Adjoint sensitivities w.r.t. the initial thickness field are finite
    (thickness enters through slab mass, Pmax=P*h^1.5 and transport)."""
    sim = _sim(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()

    def loss(thick):
        s2, _, _ = sim.raw_step_fn(sim.state.replace(thick=thick), f, ti)
        return jnp.mean(s2.vt_u ** 2 + s2.vt_v ** 2) + jnp.mean(s2.damage)

    g = np.asarray(jax.jit(jax.grad(loss))(sim.state.thick))
    assert np.isfinite(g).all()


def test_grad_through_multi_step_rollout(tmp_path):
    """Gradients survive a 3-step rollout (scan over steps) — the shape of a
    variational DA window."""
    sim = _sim(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()

    def loss(wind_u):
        f2 = f.replace(wind_u=wind_u)

        def body(s, _):
            s2, _, _ = sim.raw_step_fn(s, f2, ti)
            return s2, None

        s_final, _ = jax.lax.scan(body, sim.state, None, length=3)
        return jnp.mean(s_final.vt_u ** 2 + s_final.vt_v ** 2)

    g = np.asarray(jax.jit(jax.grad(loss))(f.wind_u))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_gradient_recovers_drag_coefficient(tmp_path):
    """Parameter estimation through the adjoint: generate synthetic velocity
    observations with a known ocean drag coefficient, then recover it from a
    perturbed first guess by gradient descent on the misfit — the shape of a
    gradient-based calibration loop."""
    import dataclasses

    from nextsim_tpu.ops import momentum

    sim = _sim(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ga = dict(sim.grid_arrays)
    ga["cohesion"] = sim.c_fix + sim.c_alea * sim.state.random_number

    true_cdw = 0.0055

    def forward(cdw):
        p = dataclasses.replace(sim.dyn, quad_drag_coef_water=cdw)
        s2, _ = momentum.explicit_solve(sim.state, f, ga, sim.dt, p)
        return s2.vt_u, s2.vt_v

    obs_u, obs_v = jax.jit(forward)(true_cdw)

    def misfit(cdw):
        u, v = forward(cdw)
        return jnp.mean((u - obs_u) ** 2 + (v - obs_v) ** 2)

    g = jax.jit(jax.grad(misfit))
    m = jax.jit(misfit)
    cdw = 0.0080  # 45% off
    m0 = float(m(cdw))
    # sign-descent with step halving on sign flips (bisection-like; robust
    # to the misfit's scale without tuning a learning rate)
    step, prev_sign = 5e-4, 0
    for _ in range(30):
        gv = float(g(cdw))
        s = 1 if gv > 0 else -1
        if prev_sign and s != prev_sign:
            step *= 0.5
        cdw -= s * step
        prev_sign = s
    assert abs(cdw - true_cdw) / true_cdw < 0.10, cdw
    assert float(m(cdw)) < 0.2 * m0
