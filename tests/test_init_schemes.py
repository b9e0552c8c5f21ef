"""Ice initialisation scheme tests: TOPAZ-like dataset init, Warren snow
climatology, assimilation."""

import datetime
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.grid.grid import Grid
from nextsim_tpu.model import init_ice_datasets, init_state
from nextsim_tpu.model.checks import check_velocity_fields
from nextsim_tpu.core.state import State


def write_topaz_like(tmp_path, year=2015, month=10):
    """Synthetic TP4DAILY file: curvilinear grid with conc/thick/snow."""
    from scipy.io import netcdf_file

    nyg, nxg = 30, 30
    # a curvilinear-ish lat/lon patch covering the Arctic test box
    lat2d = np.linspace(70.0, 88.0, nyg)[:, None] * np.ones((1, nxg))
    lon2d = np.ones((nyg, 1)) * np.linspace(-90.0, 30.0, nxg)[None, :]
    epoch = datetime.datetime(1900, 1, 1)
    base_days = (datetime.datetime(year, month, 15) - epoch).days
    times = np.array([base_days, base_days + 1], np.float64)
    with netcdf_file(os.path.join(tmp_path, f"TP4DAILY_{year}{month:02d}_30m.nc"), "w", version=2) as nc:
        nc.createDimension("time", 2)
        nc.createDimension("y", nyg)
        nc.createDimension("x", nxg)
        tv = nc.createVariable("time", "f8", ("time",))
        tv.units = b"days since 1900-01-01 00:00:00"
        tv[:] = times
        for nm, arr in (("latitude", lat2d), ("longitude", lon2d)):
            v = nc.createVariable(nm, "f4", ("y", "x"))
            v[:] = arr
        for nm, val in (("fice", 0.85), ("hice", 2.0), ("hsnow", 0.2)):
            v = nc.createVariable(nm, "f4", ("time", "y", "x"))
            v[:] = np.full((2, nyg, nxg), val, np.float32)


def arctic_box():
    # a box well inside 70-88N: pole-centered
    return Grid.square(nx=12, ny=12, dx=50e3, x0=-300e3, y0=-1800e3)


def test_topaz_ice_init(tmp_path):
    write_topaz_like(tmp_path)
    cfg = Config(overrides={
        "setup.ice-type": "topaz4",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.time_init": "2015-10-15 12:00:00",
        "thermo.use_thermo_forcing": False,
    })
    grid = arctic_box()
    state = init_state.init_state(cfg, grid)
    conc = np.asarray(state.conc)
    mask = grid.mask
    interior = conc[mask > 0.5]
    np.testing.assert_allclose(interior, 0.85, rtol=1e-5)
    # effective thickness = absolute * conc (fe.cpp:11777-11779)
    np.testing.assert_allclose(
        np.asarray(state.thick)[mask > 0.5], 2.0 * 0.85, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.snow_thick)[mask > 0.5], 0.2 * 0.85, rtol=1e-5
    )


def test_missing_data_raises(tmp_path):
    cfg = Config(overrides={
        "setup.ice-type": "topaz4",
        "setup.oceanic_forcing_input_path": str(tmp_path),  # empty dir
        "simul.time_init": "2015-10-15 00:00:00",
    })
    with pytest.raises(FileNotFoundError):
        init_state.init_state(cfg, arctic_box())


def test_warren_climatology_values():
    g = arctic_box()
    # mid-winter (January): central-Arctic snow ~25-40 cm in Warren 99
    snow = init_ice_datasets.warren_snow(g, 36526.0 + 15)  # 2000-01-16
    assert 0.1 < snow.mean() < 0.7
    # late summer (August): thinner
    snow_aug = init_ice_datasets.warren_snow(
        g, 36526.0 + 212
    )  # 2000-08
    assert snow_aug.mean() < snow.mean()


def test_assimilation_tracks_update():
    g = Grid.square(nx=16, ny=16, dx=10e3)
    mask = jnp.asarray(g.mask)
    s = State.zeros(g).replace(conc=mask * 0.8, thick=mask * 1.6)
    obs = np.where(np.asarray(mask) > 0, 0.5, 0.0)
    s2 = init_ice_datasets.assimilate_conc(s, obs, mask)
    np.testing.assert_allclose(
        np.asarray(s2.conc)[g.mask > 0.5], 0.5, rtol=1e-6
    )
    # reduction scaled the volume proportionally
    np.testing.assert_allclose(
        np.asarray(s2.thick)[g.mask > 0.5], 1.0, rtol=1e-5
    )
    # conc_upd records the applied change (negative here)
    np.testing.assert_allclose(
        np.asarray(s2.conc_upd)[g.mask > 0.5], -0.3, rtol=1e-5
    )


def test_check_velocity_fields_flags_outlier():
    g = Grid.square(nx=16, ny=16, dx=10e3)
    s = State.zeros(g)
    u = jnp.full(g.node_shape, 0.6)
    u = u.at[8, 8].set(3.0)  # rogue node
    s = s.replace(vt_u=u, vt_v=jnp.zeros(g.node_shape))
    n, rel = check_velocity_fields(s, jnp.asarray(g.node_mask))
    assert int(n) >= 1
    assert float(rel) > 4.0
    # uniform field: nothing flagged
    s2 = s.replace(vt_u=jnp.full(g.node_shape, 0.6))
    n2, _ = check_velocity_fields(s2, jnp.asarray(g.node_mask))
    assert int(n2) == 0
