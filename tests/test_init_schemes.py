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


def _write_curvilinear_nc(path, variables, year=2015, month=10, day=15,
                          lat_name="latitude", lon_name="longitude"):
    """Synthetic curvilinear ice-product file with the given 2-D variables."""
    from scipy.io import netcdf_file

    nyg, nxg = 30, 30
    lat2d = np.linspace(70.0, 88.0, nyg)[:, None] * np.ones((1, nxg))
    lon2d = np.ones((nyg, 1)) * np.linspace(-90.0, 30.0, nxg)[None, :]
    epoch = datetime.datetime(1900, 1, 1)
    base_days = (datetime.datetime(year, month, day) - epoch).days
    times = np.array([base_days, base_days + 1], np.float64)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with netcdf_file(path, "w", version=2) as nc:
        nc.createDimension("time", 2)
        nc.createDimension("y", nyg)
        nc.createDimension("x", nxg)
        tv = nc.createVariable("time", "f8", ("time",))
        tv.units = b"days since 1900-01-01 00:00:00"
        tv[:] = times
        for nm, arr in ((lat_name, lat2d), (lon_name, lon2d)):
            v = nc.createVariable(nm, "f4", ("y", "x"))
            v[:] = arr
        for nm, val in variables:
            v = nc.createVariable(nm, "f4", ("time", "y", "x"))
            v[:] = np.full((2, nyg, nxg), val, np.float32)


def write_topaz_like(tmp_path, year=2015, month=10):
    """Synthetic topaz_rean file (reference mask %Y/topaz_rean_%Y%m.nc)."""
    _write_curvilinear_nc(
        os.path.join(tmp_path, str(year), f"topaz_rean_{year}{month:02d}.nc"),
        [("siconc", 0.85), ("sithick", 2.0), ("sisnthick", 0.2)],
        year=year, month=month,
    )


def arctic_box():
    # a box well inside 70-88N: pole-centered
    return Grid.square(nx=12, ny=12, dx=50e3, x0=-300e3, y0=-1800e3)


def test_topaz_ice_init(tmp_path):
    write_topaz_like(tmp_path)
    cfg = Config(overrides={
        "setup.ice-type": "topaz4_rean",
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
        "setup.ice-type": "topaz4_rean",
        "setup.oceanic_forcing_input_path": str(tmp_path),  # empty dir
        "simul.time_init": "2015-10-15 00:00:00",
    })
    with pytest.raises(FileNotFoundError):
        init_state.init_state(cfg, arctic_box())


def test_topaz_amsr2_osisaf_blend(tmp_path):
    """The TOPAZ+AMSR2+OSISAF blend: OSISAF conc replaces TOPAZ conc where
    ice, AMSR2 lowers it, MYI type scales the thickness x1.5 and sets
    ridge_ratio=0.9 (fe.cpp:12404-12540)."""
    write_topaz_like(tmp_path)
    # obs read at time_init - 0.5 -> same day files
    _write_curvilinear_nc(
        os.path.join(tmp_path, "ice_conc_nh_polstere-100_multi_201510151200.nc"),
        [("ice_conc", 90.0)], lat_name="lat", lon_name="lon",
    )
    _write_curvilinear_nc(
        os.path.join(tmp_path, "ice_type_nh_polstere-100_multi_201510151200.nc"),
        [("ice_type", 3.0)], lat_name="lat", lon_name="lon",  # MYI
    )
    _write_curvilinear_nc(
        os.path.join(tmp_path, "Arc_20151015_res3.125_pyres.nc"),
        [("sea_ice_concentration", 80.0)],
    )
    cfg = Config(overrides={
        "setup.ice-type": "topaz4_nrt-amsr2-osisaf",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.time_init": "2015-10-15 18:00:00",
        "thermo.use_thermo_forcing": False,
    })
    # the nrt background needs topaz_nrt files; reuse the rean data under
    # the nrt mask
    import shutil

    shutil.copy(
        os.path.join(tmp_path, "2015", "topaz_rean_201510.nc"),
        os.path.join(tmp_path, "topaz_nrt_20151015.nc"),
    )
    grid = arctic_box()
    state = init_state.init_state(cfg, grid)
    m = grid.mask > 0.5
    conc = np.asarray(state.conc)[m]
    # AMSR2 (0.8) < OSISAF (0.9) -> conc = 0.8
    np.testing.assert_allclose(conc, 0.8, rtol=1e-5)
    # MYI: hi = 2.0 * 1.5, effective = * conc
    np.testing.assert_allclose(np.asarray(state.thick)[m], 3.0 * 0.8, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.ridge_ratio)[m], 0.9, rtol=1e-5)


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


def _write_dist2coast(tmp_path, km=100.0):
    """Static regular-latlon dist2coast file (reference: dataset.cpp
    dist2coast descriptor; variable in km, a=1000 -> m)."""
    from scipy.io import netcdf_file

    lats = np.arange(40.0, 90.1, 2.0)
    lons = np.arange(-180.0, 180.0, 4.0)
    with netcdf_file(os.path.join(str(tmp_path), "dist2coast_4deg.nc"), "w") as nc:
        nc.createDimension("lat", len(lats))
        nc.createDimension("lon", len(lons))
        nc.createVariable("lat", "f4", ("lat",))[:] = lats
        nc.createVariable("lon", "f4", ("lon",))[:] = lons
        v = nc.createVariable("dist", "f4", ("lat", "lon"))
        v[:] = np.full((len(lats), len(lons)), km, np.float32)


def test_assimilate_osisaf_amsr2_full_blend(tmp_path):
    """Full restart assimilation blend (reference:
    assimilate_topazForecastAmsr2OsisafIce, fe.cpp:12283-12404): OSISAF
    2:1 blend where ice and offshore, AMSR2 opening override, proportional
    thickness/damage/ridge scaling, young-ice blend with the reference's
    weights, conc_upd tracking."""
    write_topaz_like(tmp_path)
    import shutil

    shutil.copy(
        os.path.join(str(tmp_path), "2015", "topaz_rean_201510.nc"),
        os.path.join(str(tmp_path), "topaz_nrt_20151015.nc"),
    )
    _write_curvilinear_nc(
        os.path.join(str(tmp_path), "ice_conc_nh_polstere-100_multi_201510151200.nc"),
        [("ice_conc", 90.0)], lat_name="lat", lon_name="lon",
    )
    _write_curvilinear_nc(
        os.path.join(str(tmp_path), "Arc_20151015_res3.125_pyres.nc"),
        [("sea_ice_concentration", 40.0)],
    )
    _write_dist2coast(tmp_path, km=100.0)

    cfg = Config(overrides={
        "setup.ice-type": "topaz4_nrt-amsr2-osisaf",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.time_init": "2015-10-15 18:00:00",
        "thermo.newice_type": 4,
    })
    from nextsim_tpu.utils.dates import string_to_datenum

    t0 = string_to_datenum("2015-10-15 18:00:00")
    grid = arctic_box()
    mask = jnp.asarray(grid.mask)
    s = State.zeros(grid).replace(
        conc=mask * 0.6, thick=mask * 1.2, snow_thick=mask * 0.1,
        ridge_ratio=mask * 0.2, damage=mask * 0.5,
        conc_young=mask * 0.15, h_young=mask * 0.015,
    )
    s2 = init_ice_datasets.assimilate_topaz_amsr2_osisaf(cfg, grid, s, mask, t0)
    m = grid.mask > 0.5
    # OSISAF: (2*0.6 + 0.9)/3 = 0.7; AMSR2 0.4 < 0.7 -> conc = 0.4
    np.testing.assert_allclose(np.asarray(s2.conc)[m], 0.4, rtol=1e-5)
    r = 0.4 / 0.6
    np.testing.assert_allclose(np.asarray(s2.thick)[m], 1.2 * r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.damage)[m], 0.5 * r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.ridge_ratio)[m], 0.2 * r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.conc_upd)[m], -0.2, rtol=1e-4)
    # young ice: obs = max(0.4-0.4, 0) = 0 -> cy = 2*0.15/1.5 = 0.2
    # (the reference's mixed sigma weights, fe.cpp:12384-12386)
    np.testing.assert_allclose(np.asarray(s2.conc_young)[m], 0.2, rtol=1e-5)


def test_conc_bins_nic():
    """(reference: concBinsNic, fe.cpp:12062-12117)"""
    lo, hi = init_ice_datasets.conc_bins_nic(np.array([0.0, 0.3, 0.85, 0.95]), False)
    np.testing.assert_allclose(lo, [0.0, 0.1, 0.8, 0.0])
    np.testing.assert_allclose(hi, [0.0, 0.8, 1.0, 0.0])
    lo, hi = init_ice_datasets.conc_bins_nic(
        np.array([0.1, 0.25, 0.4, 0.6, 0.8, 0.95]), True
    )
    np.testing.assert_allclose(lo, [0.1, 0.2, 0.4, 0.6, 0.8, 0.9])
    np.testing.assert_allclose(hi, [0.3, 0.4, 0.6, 0.8, 1.0, 1.0])


def test_assimilate_nic_no_young(tmp_path):
    """NIC chart assimilation, no-young-ice path (reference:
    fe.cpp:12261-12279): conc forced into the chart bin, thickness follows;
    NIC > 1 means masked (model untouched)."""
    _write_curvilinear_nc(
        os.path.join(str(tmp_path), "NIC_20151015_res3.125_pyres.nc"),
        [("sea_ice_concentration", 85.0)],
    )
    cfg = Config(overrides={
        "setup.ice-type": "topaz4_nrt-amsr2-osisaf-nic",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.time_init": "2015-10-15 18:00:00",
        "thermo.newice_type": 0,
    })
    from nextsim_tpu.utils.dates import string_to_datenum

    t0 = string_to_datenum("2015-10-15 18:00:00")
    grid = arctic_box()
    mask = jnp.asarray(grid.mask)
    s = State.zeros(grid).replace(conc=mask * 0.3, thick=mask * 0.3)
    s2 = init_ice_datasets.assimilate_ice(cfg, grid, s, mask, t0)
    m = grid.mask > 0.5
    # bin for 0.85 is [0.8, 1.0]; conc 0.3 < 0.8 ->
    # target = (0.8 + 0.5*(0.8+1.0))/2 = 0.85, thick += max(hi,0.5)*(0.85-0.3)
    np.testing.assert_allclose(np.asarray(s2.conc)[m], 0.85, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.thick)[m], 0.3 + 1.0 * 0.55, rtol=1e-4)


def test_assimilate_nic_masked_leaves_model(tmp_path):
    _write_curvilinear_nc(
        os.path.join(str(tmp_path), "NIC_20151015_res3.125_pyres.nc"),
        [("sea_ice_concentration", 150.0)],  # masked: > 100%
    )
    cfg = Config(overrides={
        "setup.ice-type": "topaz4_nrt-amsr2-osisaf-nic",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "thermo.newice_type": 0,
    })
    from nextsim_tpu.utils.dates import string_to_datenum

    t0 = string_to_datenum("2015-10-15 18:00:00")
    grid = arctic_box()
    mask = jnp.asarray(grid.mask)
    s = State.zeros(grid).replace(conc=mask * 0.3, thick=mask * 0.3)
    s2 = init_ice_datasets.assimilate_topaz_amsr2_osisaf_nic(cfg, grid, s, mask, t0)
    m = grid.mask > 0.5
    np.testing.assert_allclose(np.asarray(s2.conc)[m], 0.3, rtol=1e-6)


def test_assimilate_slab_ocean_constant():
    """(reference: assimilateSlabOcean, fe.cpp:11351-11368)"""
    grid = arctic_box()
    mask = jnp.asarray(grid.mask)
    cfg = Config(overrides={"setup.ocean-type": "constant"})
    s = State.zeros(grid)  # sst=-1.8, sss=32
    mu = cfg["thermo.freezingpoint_mu"]
    s2 = init_ice_datasets.assimilate_slab_ocean(cfg, s, None, None, lambda x: -mu * x)
    np.testing.assert_allclose(
        np.asarray(s2.sss), (32.0 + 1.8 / mu) / 2.0, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s2.sst), (-1.8 + 1.0) / 2.0, rtol=1e-5)
