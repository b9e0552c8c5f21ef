"""FSD tests: bins, breakup conservation, welding, updateFSD, simulator."""

import jax.numpy as jnp
import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.ops import fsd


def make_params(n=8, **over):
    kw = dict(num_bins=n, welding_type="roach")
    kw.update(over)
    return fsd.FSDParams(**kw)


def test_bins_constant_size():
    p = make_params()
    b = fsd.make_bins(p)
    assert b.low[0] == 10.0 and b.up[0] == 20.0
    np.testing.assert_allclose(b.width, 10.0)
    np.testing.assert_allclose(b.centre[0], 15.0)
    np.testing.assert_allclose(b.area_centre, 0.66 * b.centre**2)
    # alpha merge matrix within [1, n] where defined
    a = b.alpha_merge
    assert a.max() <= p.num_bins and (a[a > 0] >= 1).all()


def test_bins_constant_area():
    p = make_params(fsd_type="constant_area")
    b = fsd.make_bins(p)
    np.testing.assert_allclose(np.diff(b.area_low), b.area_binwidth[:-1])
    assert (np.diff(b.width) < 0).all()  # equal-area bins shrink in size


def test_init_and_update_fsd():
    p = make_params(n=5)
    conc = jnp.asarray([[0.8, 0.0], [0.5, 1.0]])
    cf = fsd.init_fsd(p, conc)
    np.testing.assert_allclose(np.asarray(cf.sum(axis=0)), np.asarray(conc))
    assert float(cf[-1, 0, 0]) == pytest.approx(0.8)
    # conc halves: FSD rescales, shape preserved
    cf2 = fsd.update_fsd(cf, conc * 0.5)
    np.testing.assert_allclose(np.asarray(cf2.sum(axis=0)), np.asarray(conc) * 0.5)
    # ice appears where FSD was empty -> all unbroken
    cf3 = fsd.update_fsd(jnp.zeros_like(cf), conc)
    assert float(cf3[-1, 1, 1]) == pytest.approx(1.0)


def test_wave_breakup_conserves_area_and_breaks():
    p = make_params(n=8, breakup_type="uniform_size")
    b = fsd.make_bins(p)
    shape = (4, 4)
    conc = jnp.full(shape, 0.9)
    cf = fsd.init_fsd(p, conc)
    wlbk = jnp.full(shape, 50.0)  # 50 m breaking wavelength
    cf2, broke = fsd.wave_breakup(
        cf, conc * 1.0, conc, jnp.zeros(shape), jnp.zeros(shape), wlbk, 3600.0,
        p, b,
    )
    assert bool(np.asarray(broke).all())
    # total area conserved
    np.testing.assert_allclose(np.asarray(cf2.sum(axis=0)), 0.9, rtol=1e-5)
    # area moved out of the unbroken bin into smaller bins
    assert float(cf2[-1, 0, 0]) < 0.9
    assert float(cf2[:-1, 0, 0].sum()) > 0.0
    # no waves: no breakup
    cf3, broke3 = fsd.wave_breakup(
        cf, conc, conc, jnp.zeros(shape), jnp.zeros(shape),
        jnp.full(shape, 1000.0), 3600.0, p, b,
    )
    np.testing.assert_allclose(np.asarray(cf3), np.asarray(cf))
    assert not bool(np.asarray(broke3).any())


def test_welding_moves_area_to_larger_floes():
    # scaled areas + small kappa: the gentle regime where the coagulation
    # direction is visible before equilibration
    p = make_params(n=6, welding_kappa=1e-4, welding_use_scaled_area=True)
    b = fsd.make_bins(p)
    shape = (2, 2)
    # broken ice: everything in the smallest bins
    cf = jnp.zeros((6,) + shape).at[0].set(0.4).at[1].set(0.4)
    freezing = jnp.full(shape, True)
    cf2 = fsd.welding_roach(cf, 900.0, p, b, freezing)
    # coagulation moves area out of the smallest bin toward larger floes
    assert float(cf2[0, 0, 0]) < float(cf[0, 0, 0])
    assert float(cf2[2:, 0, 0].sum()) > float(cf[2:, 0, 0].sum())
    # bounded and non-negative
    assert float(np.asarray(cf2).min()) >= 0.0
    assert float(np.asarray(cf2.sum(axis=0)).max()) <= 1.0 + 1e-6
    # no welding when not freezing
    cf3 = fsd.welding_roach(cf, 900.0, p, b, jnp.full(shape, False))
    np.testing.assert_allclose(np.asarray(cf3), np.asarray(cf))


def test_dmax_dmean():
    p = make_params(n=5)
    b = fsd.make_bins(p)
    cf = jnp.zeros((5, 2, 2)).at[4].set(1.0)
    dmax, dmean = fsd.dmax_dmean(cf, p, b)
    assert float(dmax[0, 0]) == pytest.approx(b.centre[4])
    assert float(dmean[0, 0]) == pytest.approx(b.centre[4])


@pytest.mark.slow
def test_simulator_with_fsd_runs():
    cfg = Config(overrides={
        "grid.nx": 16, "grid.ny": 16, "grid.resolution": 10e3,
        "simul.timestep": 200, "dynamics.substeps": 60,
        "thermo.use_thermo_forcing": False,
        "setup.atmosphere-type": "constant", "setup.ocean-type": "constant",
        "setup.ice-type": "constant",
        "dynamics.use_coriolis": False,
        "wave_coupling.num_fsd_bins": 6,
        "ideal_simul.constant_wind_u": 10.0,
        "simul.spinup_duration": 0.0,
    })
    from nextsim_tpu.model.simulator import Simulator

    sim = Simulator(cfg)
    assert sim.state.conc_fsd is not None
    for _ in range(3):
        sim.step()
    cf = np.asarray(sim.state.conc_fsd)
    ctot = np.asarray(sim.state.conc + sim.state.conc_young)
    np.testing.assert_allclose(cf.sum(axis=0), ctot, atol=1e-5)


def test_melt_type3_lateral_melt_in_thermo():
    """Full thermo step with FSD lateral melt (melt_type=3): broken warm ice
    loses concentration laterally; unbroken ice follows melt_type 2."""
    from nextsim_tpu.forcing.providers import ConstantForcing
    from nextsim_tpu.grid.grid import Grid
    from nextsim_tpu.model import init_state
    from nextsim_tpu.model.params_thermo import thermo_params
    from nextsim_tpu.ops import thermo

    cfg = Config(overrides={
        "grid.nx": 8, "grid.ny": 8, "grid.resolution": 10e3,
        "setup.atmosphere-type": "constant", "setup.ocean-type": "constant",
        "setup.ice-type": "constant",
        "thermo.use_thermo_forcing": True,
        "thermo.melt_type": 3,
        "wave_coupling.num_fsd_bins": 6,
        # warm forcing to drive melt
        "ideal_simul.constant_tair": 5.0,
        "ideal_simul.constant_Qsw_in": 300.0,
        "ideal_simul.constant_Qlw_in": 330.0,
    })
    grid = Grid.square(nx=8, ny=8, dx=10e3)
    state = init_state.init_state(cfg, grid)
    mask = jnp.asarray(grid.mask)
    fp = fsd.FSDParams.from_config(cfg)
    fb = fsd.make_bins(fp)
    # warm ocean slightly above freezing, broken ice in small bins
    ctot = mask * 0.9
    cf = jnp.zeros((6, 8, 8)).at[0].set(0.45 * mask).at[2].set(0.45 * mask)
    state = state.replace(
        conc=ctot, thick=ctot * 1.0, sst=jnp.full(grid.shape, -1.0),
        conc_fsd=cf,
    )
    forcing = ConstantForcing(cfg, grid)(0.0, 0.0)
    ga = {"mask": mask, "open_mask": jnp.asarray(grid.open_mask), "delta_x": grid.dx}
    p = thermo_params(cfg)
    s2, diag = thermo.thermo_step(state, forcing, ga, 900.0, p, fsd_params=fp, fsd_bins=fb)
    # conc dropped (lateral + vertical melt), everything finite + bounded
    assert float(np.asarray(s2.conc)[4, 4]) < 0.9
    assert np.isfinite(np.asarray(s2.conc_fsd)).all()
    assert float(np.asarray(s2.conc_fsd).min()) >= 0.0
