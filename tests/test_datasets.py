"""Forcing dataset ingest tests with synthetic NetCDF files."""

import datetime
import os

import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.forcing.datasets import (
    REGISTRY,
    DatasetForcing,
    _DatasetReader,
    _parse_time_units,
    _RegularLatLonInterp,
)
from nextsim_tpu.grid.grid import Grid


def write_era5_like(tmp_path, year=2015):
    """Synthetic per-variable yearly ERA5 files on a coarse lat/lon grid."""
    from scipy.io import netcdf_file

    lats = np.arange(40.0, 90.1, 2.0)
    lons = np.arange(-180.0, 180.0, 4.0)
    # hourly -> keep just 8 times, 3-hourly from Oct 16
    epoch = datetime.datetime(1900, 1, 1)
    base = (datetime.datetime(year, 10, 16) - epoch).total_seconds() / 3600.0
    times = base + np.arange(8) * 3.0  # hours since 1900

    def field(t_index):
        # zonal wind increasing with time; temperature varying with lat
        return np.ones((len(lats), len(lons)))

    for var, gen in [
        ("u10", lambda ti: np.full((len(lats), len(lons)), 5.0 + ti)),
        ("v10", lambda ti: np.zeros((len(lats), len(lons)))),
        ("t2m", lambda ti: 258.15 + np.broadcast_to(np.linspace(0, 10, len(lats))[:, None], (len(lats), len(lons)))),
        ("msl", lambda ti: np.full((len(lats), len(lons)), 1013e2)),
        ("msdwswrf", lambda ti: np.full((len(lats), len(lons)), 50.0)),
        ("msdwlwrf", lambda ti: np.full((len(lats), len(lons)), 250.0)),
        ("mtpr", lambda ti: np.full((len(lats), len(lons)), 1e-5)),
        ("msr", lambda ti: np.full((len(lats), len(lons)), 9e-6)),
        ("d2m", lambda ti: np.full((len(lats), len(lons)), 258.15)),
    ]:
        with netcdf_file(os.path.join(tmp_path, f"ERA5_{var}_y{year}.nc"), "w") as nc:
            nc.createDimension("time", len(times))
            nc.createDimension("latitude", len(lats))
            nc.createDimension("longitude", len(lons))
            tv = nc.createVariable("time", "f8", ("time",))
            tv.units = b"hours since 1900-01-01 00:00:00"
            tv[:] = times
            la = nc.createVariable("latitude", "f4", ("latitude",))
            la[:] = lats
            lo = nc.createVariable("longitude", "f4", ("longitude",))
            lo[:] = lons
            v = nc.createVariable(var, "f4", ("time", "latitude", "longitude"))
            v[:] = np.stack([gen(ti) for ti in range(len(times))])


def test_parse_time_units():
    epoch, f = _parse_time_units("hours since 1950-01-01 00:00:00")
    assert f == pytest.approx(1 / 24)
    assert epoch == pytest.approx(18262.0)  # days from 1900 to 1950


def test_regular_latlon_interp_exact_on_linear():
    lats = np.arange(50.0, 90.0, 2.0)
    lons = np.arange(0.0, 360.0, 4.0)
    f = np.broadcast_to(lats[:, None], (len(lats), len(lons))).copy()
    it = _RegularLatLonInterp(lats, lons, np.array([[61.0]]), np.array([[10.0]]), True)
    assert float(it(f)[0, 0]) == pytest.approx(61.0, abs=1e-6)


def test_dataset_reader_era5(tmp_path):
    write_era5_like(tmp_path)
    grid = Grid.square(nx=16, ny=16, dx=50e3, x0=-400e3, y0=-2800e3)
    reader = _DatasetReader(REGISTRY["era5"], grid, str(tmp_path))
    # t = 2015-10-16 04:30 → between plane 1 (03:00) and plane 2 (06:00)
    from nextsim_tpu.utils.dates import string_to_datenum

    t = string_to_datenum("2015-10-16 04:30:00")
    fields = reader.fields_at(t)
    assert "tair" in fields and "wind_u" in fields
    assert fields["tair"].shape == grid.shape
    assert fields["wind_u"].shape == grid.node_shape
    # u10 = 5 + time_index; at 04:30 interp between 6.0 and 7.0 -> 6.5;
    # rotation mixes u/v but |v_en|=(6.5, 0) so |result| must be 6.5
    mag = np.hypot(fields["wind_u"], fields["wind_v"])
    np.testing.assert_allclose(mag, 6.5, rtol=1e-5)
    # tair varies linearly with latitude: in range [-15, -5]
    assert fields["tair"].min() > -16 and fields["tair"].max() < -4


def test_dataset_forcing_provider(tmp_path):
    write_era5_like(tmp_path)
    cfg = Config(
        overrides={
            "setup.atmosphere-type": "era5",
            "setup.ocean-type": "constant",
            "setup.atmospheric_forcing_input_path": str(tmp_path),
            "simul.spinup_duration": 0.0,
        }
    )
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    provider = DatasetForcing(cfg, grid)
    from nextsim_tpu.utils.dates import string_to_datenum

    t0 = string_to_datenum("2015-10-16 03:00:00")
    f = provider(t0, t0)
    assert f.wind_u.shape == grid.node_shape
    mag = np.hypot(np.asarray(f.wind_u), np.asarray(f.wind_v))
    np.testing.assert_allclose(mag, 6.0, rtol=1e-5)  # plane index 1
    # ocean fields fall back to constant provider
    assert float(np.asarray(f.ocean_u).max()) == 0.0
    assert float(np.asarray(f.mld)[0, 0]) == cfg["ideal_simul.constant_mld"]


def test_forecast_air_temperature_correction(tmp_path):
    """forecast.air_temperature_correction shifts dataset tair/dair but not
    wind (reference: forcingAtmosphere fe.cpp:10837,10866-10918)."""
    write_era5_like(tmp_path)
    base = {
        "setup.atmosphere-type": "era5",
        "setup.ocean-type": "constant",
        "setup.atmospheric_forcing_input_path": str(tmp_path),
        "simul.spinup_duration": 0.0,
    }
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    from nextsim_tpu.utils.dates import string_to_datenum

    t0 = string_to_datenum("2015-10-16 03:00:00")
    f0 = DatasetForcing(Config(overrides=base), grid)(t0, t0)
    f1 = DatasetForcing(
        Config(overrides={**base, "forecast.air_temperature_correction": 2.5}),
        grid,
    )(t0, t0)
    np.testing.assert_allclose(
        np.asarray(f1.tair), np.asarray(f0.tair) + 2.5, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(f1.wind_u), np.asarray(f0.wind_u))


def write_erai_waves_like(tmp_path, year=2015):
    """Synthetic yearly erai_waves_1deg file: swh/mwp constant, mwd spanning
    the 0/360 wrap to exercise component interpolation."""
    from scipy.io import netcdf_file

    lats = np.arange(40.0, 90.1, 2.0)
    lons = np.arange(-180.0, 180.0, 4.0)
    epoch = datetime.datetime(1900, 1, 1)
    base = (datetime.datetime(year, 10, 16) - epoch).days
    times = base + np.arange(4) * 0.25
    with netcdf_file(os.path.join(tmp_path, f"erai_waves_1deg_{year}.nc"), "w") as nc:
        nc.createDimension("time", len(times))
        nc.createDimension("latitude", len(lats))
        nc.createDimension("longitude", len(lons))
        tv = nc.createVariable("time", "f8", ("time",))
        tv.units = b"days since 1900-01-01 00:00:00"
        tv[:] = times
        nc.createVariable("latitude", "f4", ("latitude",))[:] = lats
        nc.createVariable("longitude", "f4", ("longitude",))[:] = lons
        shp = (len(times), len(lats), len(lons))
        nc.createVariable("swh", "f4", ("time", "latitude", "longitude"))[:] = np.full(shp, 2.5)
        nc.createVariable("mwp", "f4", ("time", "latitude", "longitude"))[:] = np.full(shp, 10.0)
        # direction 350..10 degrees across the wrap: naive averaging would
        # give ~180; component interpolation must stay near 0/360
        mwd = np.full(shp, 355.0)
        mwd[..., ::2] = 5.0
        nc.createVariable("mwd", "f4", ("time", "latitude", "longitude"))[:] = mwd


def test_wave_dataset_direction_interp(tmp_path):
    write_erai_waves_like(tmp_path)
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    reader = _DatasetReader(REGISTRY["erai_waves_1deg"], grid, str(tmp_path))
    from nextsim_tpu.utils.dates import string_to_datenum

    t = string_to_datenum("2015-10-16 06:00:00")
    fields = reader.fields_at(t)
    assert fields["swh"] == pytest.approx(2.5, abs=1e-5)
    # recombination happens in the provider; the reader carries components
    assert "_mwd_cos" in fields and "_mwd_sin" in fields
    ang = np.degrees(np.arctan2(fields["_mwd_sin"], fields["_mwd_cos"])) % 360.0
    # stays near north (0/360) — never the naive 180 average
    assert np.all((ang < 30) | (ang > 330))


def test_wave_forcing_feeds_provider_and_registry_complete(tmp_path):
    write_era5_like(tmp_path)
    write_erai_waves_like(tmp_path)
    os.environ["NEXTSIM_DATA_DIR"] = str(tmp_path)
    try:
        cfg = Config({
            "setup.atmosphere-type": "era5",
            "setup.atmospheric_forcing_input_path": str(tmp_path),
            "wimsetup.wave-type": "eraiw_1deg",
            "grid.preset": "square",
            "grid.nx": 8, "grid.ny": 8, "grid.resolution": 50e3,
            "simul.spinup_duration": 0.0,
        })
        grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
        prov = DatasetForcing(cfg, grid)
        from nextsim_tpu.utils.dates import string_to_datenum

        t = string_to_datenum("2015-10-16 06:00:00")
        f = prov(t, t)
        assert f.swh is not None and float(np.asarray(f.swh).max()) == pytest.approx(2.5, abs=1e-4)
        assert f.mwp is not None and float(np.asarray(f.mwp).max()) == pytest.approx(10.0, abs=1e-4)
        ang = np.asarray(f.mwd) % 360.0
        assert np.all((ang < 30) | (ang > 330))
    finally:
        del os.environ["NEXTSIM_DATA_DIR"]


def test_new_descriptors_registered():
    """Catalog parity: the remaining reference dataset families all have
    registry descriptors (SURVEY.md §2.4)."""
    for name in [
        "ecmwf_nrt_arome", "ecmwf_nrt_arome_ensemble", "cfsr_hi",
        "topaz5_nrt", "ww3a", "erai_waves_1deg",
    ]:
        assert name in REGISTRY, name
    arome = REGISTRY["ecmwf_nrt_arome"]
    assert arome.grid_oriented_vectors and arome.vectors
    assert REGISTRY["ecmwf_nrt_arome_ensemble"].member_dim == "ensemble_member"
    fp = [v for v in REGISTRY["ww3a"].variables if v.file_var == "fp"][0]
    assert fp.transform == "inv"


def test_cfsr_hi_layered_sources():
    cfg = Config({
        "setup.atmosphere-type": "cfsr_hi",
        "grid.preset": "square", "grid.nx": 8, "grid.ny": 8,
        "grid.resolution": 50e3,
    })
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    prov = DatasetForcing(cfg, grid)
    names = [s.spec.name for s in prov.sources]
    assert names == ["cfsr", "cfsr_hi"]  # hi-res winds override


def test_arome_ensemble_member_selection(tmp_path):
    """The ensemble_member record dimension is sliced by
    statevector.ensemble_member (reference: externaldata.cpp:852-858)."""
    from scipy.io import netcdf_file

    ny, nx, nmem = 6, 7, 3
    # small curvilinear grid around the pole area of the model square grid
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    glat, glon = grid.cell_latlon()
    lat2d = np.linspace(glat.min() - 1, glat.max() + 1, ny)[:, None] * np.ones((1, nx))
    lon2d = np.ones((ny, 1)) * np.linspace(glon.min() - 2, glon.max() + 2, nx)[None, :]
    epoch = datetime.datetime(1970, 1, 1)
    base = (datetime.datetime(2015, 10, 16) - epoch).total_seconds()
    fn = os.path.join(tmp_path, "ecmwf_nrt_arome_blended_ensemble_20151016.nc")
    with netcdf_file(fn, "w") as nc:
        nc.createDimension("time", 2)
        nc.createDimension("ensemble_member", nmem)
        nc.createDimension("y", ny)
        nc.createDimension("x", nx)
        tv = nc.createVariable("time", "f8", ("time",))
        tv.units = b"seconds since 1970-01-01 00:00:00"
        tv[:] = base + np.arange(2) * 43200.0
        nc.createVariable("latitude", "f4", ("y", "x"))[:] = lat2d
        nc.createVariable("longitude", "f4", ("y", "x"))[:] = lon2d
        t2m = nc.createVariable(
            "air_temperature_2m", "f4", ("time", "ensemble_member", "y", "x")
        )
        # member m has temperature 270+m everywhere
        data = np.zeros((2, nmem, ny, nx))
        for m in range(nmem):
            data[:, m] = 270.0 + m
        t2m[:] = data

    from nextsim_tpu.utils.dates import string_to_datenum

    t = string_to_datenum("2015-10-16 06:00:00")
    for member in (1, 3):
        reader = _DatasetReader(
            REGISTRY["ecmwf_nrt_arome_ensemble"], grid, str(tmp_path), member=member
        )
        fields = reader.fields_at(t)
        want = 270.0 + (member - 1) - 273.15  # tair in C
        assert fields["tair"] == pytest.approx(want, abs=1e-4), member


def _write_curvi_ocean(path, varlist, time_units=b"days since 1900-01-01 00:00:00",
                       times=None):
    """Small curvilinear ocean file covering the pole-area square grid."""
    from scipy.io import netcdf_file

    ny, nx = 10, 11
    grid = Grid.square(nx=8, ny=8, dx=50e3, x0=-200e3, y0=-2800e3)
    glat, glon = grid.cell_latlon()
    lat2d = np.linspace(glat.min() - 1, glat.max() + 1, ny)[:, None] * np.ones((1, nx))
    lon2d = np.ones((ny, 1)) * np.linspace(glon.min() - 2, glon.max() + 2, nx)[None, :]
    if times is None:
        epoch = datetime.datetime(1900, 1, 1)
        base = (datetime.datetime(2015, 10, 16) - epoch).days
        times = np.array([base, base + 1], np.float64)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with netcdf_file(path, "w", version=2) as nc:
        nc.createDimension("time", len(times))
        nc.createDimension("y", ny)
        nc.createDimension("x", nx)
        tv = nc.createVariable("time", "f8", ("time",))
        tv.units = time_units
        tv[:] = times
        nc.createVariable("latitude", "f4", ("y", "x"))[:] = lat2d
        nc.createVariable("longitude", "f4", ("y", "x"))[:] = lon2d
        for nm, val in varlist:
            v = nc.createVariable(nm, "f4", ("time", "y", "x"))
            v[:] = np.full((len(times), ny, nx), val, np.float32)
    return grid


def test_ocean_altimeter_layering(tmp_path):
    """setup.ocean-type=topaz4_rean-altimeter: the altimeter ocean_currents
    nodes dataset (reference: dataset.cpp:5839 current_%Y.nc) overrides the
    topaz4r currents/SSH while hydrography stays topaz4r
    (fe.cpp:792-795)."""
    _write_curvi_ocean(
        os.path.join(tmp_path, "2015", "topaz_rean_201510.nc"),
        [("uo", 0.10), ("vo", 0.00), ("zos", 0.20),
         ("thetao", -1.0), ("so", 33.0), ("mlotst", 20.0)],
    )
    grid = _write_curvi_ocean(
        os.path.join(tmp_path, "current_2015.nc"),
        [("U", 0.50), ("V", 0.10), ("SSH", 0.40)],
    )
    cfg = Config(overrides={
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "topaz4_rean-altimeter",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.spinup_duration": 0.0,
    })
    provider = DatasetForcing(cfg, grid)
    from nextsim_tpu.utils.dates import string_to_datenum

    t = string_to_datenum("2015-10-16 12:00:00")
    f = provider(t, t)
    # currents from the altimeter dataset (magnitude is rotation-invariant)
    mag = np.hypot(np.asarray(f.ocean_u), np.asarray(f.ocean_v))
    np.testing.assert_allclose(mag, np.hypot(0.50, 0.10), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(f.ssh), 0.40, atol=1e-3)
    # hydrography from topaz4r
    np.testing.assert_allclose(np.asarray(f.ocean_temp), -1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f.mld), 20.0, atol=1e-2)


def test_ocean_atrest(tmp_path):
    """setup.ocean-type=topaz4_rean_atrest: hydrography + SSH from topaz4r
    but the currents stay at the ideal_simul constants
    (fe.cpp:11219-11236)."""
    grid = _write_curvi_ocean(
        os.path.join(tmp_path, "2015", "topaz_rean_201510.nc"),
        [("uo", 0.10), ("vo", 0.05), ("zos", 0.20),
         ("thetao", -1.0), ("so", 33.0), ("mlotst", 20.0)],
    )
    cfg = Config(overrides={
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "topaz4_rean_atrest",
        "setup.oceanic_forcing_input_path": str(tmp_path),
        "simul.spinup_duration": 0.0,
        "ideal_simul.constant_ocean_u": 0.0,
        "ideal_simul.constant_ocean_v": 0.0,
    })
    provider = DatasetForcing(cfg, grid)
    from nextsim_tpu.utils.dates import string_to_datenum

    t = string_to_datenum("2015-10-16 12:00:00")
    f = provider(t, t)
    assert float(np.abs(np.asarray(f.ocean_u)).max()) == 0.0
    assert float(np.abs(np.asarray(f.ocean_v)).max()) == 0.0
    np.testing.assert_allclose(np.asarray(f.ssh), 0.20, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f.ocean_temp), -1.0, atol=1e-3)
