"""Multi-device tests on the virtual 8-device CPU mesh: halo exchange
equivalence, sharded step equivalence with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsim_tpu.parallel.halo import sharded_stencil_apply
from nextsim_tpu.parallel.sharding import make_device_mesh, shard_tree


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_device_mesh(devices=jax.devices()[:8])


def test_halo_exchange_matches_global_stencil(mesh8, rng):
    """5-point stencil with explicit halos == the same stencil globally."""
    ny = nx = 64
    x = jnp.asarray(rng.normal(size=(ny, nx)).astype(np.float32))

    def global_stencil(a):
        p = jnp.pad(a, 1, mode="wrap")  # halo wrap matches ppermute periodicity
        return p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * p[1:-1, 1:-1]

    def local_stencil(ext):
        return ext[:-2, 1:-1] + ext[2:, 1:-1] + ext[1:-1, :-2] + ext[1:-1, 2:] - 4 * ext[1:-1, 1:-1]

    expected = np.asarray(global_stencil(x))
    got = np.asarray(sharded_stencil_apply(local_stencil, x, mesh8, halo=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_sharded_step_matches_single_device():
    """The GSPMD-sharded full step must agree with the unsharded step."""
    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    over = {
        "grid.nx": 32, "grid.ny": 32, "grid.resolution": 10e3,
        "simul.timestep": 200, "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": True,
        "setup.thermo-type": "winton",
        "setup.atmosphere-type": "constant", "setup.ocean-type": "constant",
        "setup.ice-type": "constant",
        "dynamics.use_coriolis": False,
        "ideal_simul.constant_wind_u": 8.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
    }
    sim1 = Simulator(Config(overrides=over))
    mesh = make_device_mesh(devices=jax.devices()[:4])
    sim2 = Simulator(Config(overrides=over), mesh=mesh)

    f1 = sim1.forcing_provider(sim1.current_time, sim1.time_init)
    f2 = shard_tree(sim2.forcing_provider(sim2.current_time, sim2.time_init), mesh)
    t1 = sim1.time_info()

    s1, d1, v1 = sim1._step_fn(sim1.state, f1, t1)
    s2, d2, v2 = sim2._step_fn(sim2.state, f2, t1)
    for name in ("conc", "thick", "damage", "vt_u", "vt_v", "sst", "tice"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(s2, name))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6, err_msg=name)
    assert not bool(np.asarray(v2).any())


def test_scaling_harness_smoke():
    """The weak-scaling harness runs on the CPU mesh (tiny sizes)."""
    from nextsim_tpu.parallel.scaling import measure

    results = measure(cells_per_device_side=16, steps=1, substeps=4)
    assert results[0]["devices"] == 1
    assert results[-1]["devices"] == len(jax.devices())
    for r in results:
        assert r["cell_substeps_per_s"] > 0
