"""Deformation statistics on a real(istic)-coastline domain (VERDICT r2
weak #5): the BBM LKF signature must survive — and sharpen — when the
domain has coastline stress concentrators instead of the synthetic disc.

The coastline comes from tools/make_synthetic_etopo.py (approximate
hand-encoded circum-Arctic landmass polygons rasterized to an ETOPO-style
file; the reference gets the same information from its coastline-following
mesh, mesh/README.md, + initBathymetry fe.cpp:13749-13777)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator


@pytest.fixture(scope="module")
def etopo_dir(tmp_path_factory):
    import make_synthetic_etopo as mse

    d = tmp_path_factory.mktemp("etopo")
    # coarse raster is plenty for a 40 km model grid and keeps this fast
    mse.write(os.path.join(d, "ETOPO_Arctic_2arcmin.nc"), dlat=0.5, dlon=1.0)
    return str(d)


@pytest.mark.slow
def test_coastline_deformation_heavy_tail(etopo_dir, monkeypatch):
    """15 steps of BBM on the approximate-Arctic coastline at 40 km:
    deformation must be heavy-tailed (LKFs) and damage must concentrate
    near coasts relative to the basin interior."""
    from scipy import ndimage

    monkeypatch.setenv("NEXTSIM_DATA_DIR", etopo_dir)
    cfg = Config(overrides={
        "grid.preset": "arctic_etopo",
        "grid.nx": 152, "grid.ny": 152, "grid.resolution": 40e3,
        "setup.bathymetry-type": "etopo",
        "simul.timestep": 600, "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 120,
        "dynamics.use_coriolis": True,
        "dynamics.alea_factor": 0.33,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant_partial",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 12.0,
        "ideal_simul.constant_wind_v": -4.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
    })
    sim = Simulator(cfg)
    mask = np.asarray(sim.grid.mask)
    assert 0.3 < mask.mean() < 0.7  # a real coastline, not a disc

    for _ in range(15):
        sim.step()
    s = sim.host_state()
    u = np.asarray(s.vt_u, np.float64)
    v = np.asarray(s.vt_v, np.float64)
    assert np.isfinite(u).all() and np.isfinite(v).all()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from deformation_stats import deformation_rates, stats

    conc = np.asarray(s.conc)
    _, _, total = deformation_rates(u, v, 40e3)
    st = stats(total, mask=(conc > 0.15).astype(np.float32))
    # heavy tail: LKF concentration, not a smooth viscous field. The disc
    # run (VALIDATION.md) gives p99/p50 ~ 220; coasts must keep >= O(10).
    assert st["p99_per_day"] / max(st["p50_per_day"], 1e-12) > 10.0

    # damage concentrates near coasts: mean damage within 3 cells of land
    # exceeds the interior mean (coasts are the stress concentrators)
    dmg = np.asarray(s.damage, np.float64)
    land = mask < 0.5
    near = ndimage.binary_dilation(land, iterations=3) & ~land & (conc > 0.15)
    far = ~ndimage.binary_dilation(land, iterations=10) & (conc > 0.15)
    assert near.sum() > 100 and far.sum() > 100
    assert dmg[near].mean() > dmg[far].mean()
