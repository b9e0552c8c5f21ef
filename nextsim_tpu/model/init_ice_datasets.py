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

#: ice products (reference: dataset.cpp ice_* descriptors; TOPAZ ice fields
#: ride in the same reanalysis/forecast files as the ocean fields)
ICE_DATASETS = {
    "topaz": dict(dataset="topaz4r", conc="siconc", thick="sithick", snow="sisnthick"),
    "topaz_nrt": dict(dataset="topaz4nrt", conc="siconc", thick="sithick", snow="sisnthick"),
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


def _read_obs(cfg, grid, dataset_name: str, t: float) -> Dict[str, np.ndarray]:
    """Read one obs ice product through the dataset registry."""
    import os

    from nextsim_tpu.forcing.datasets import REGISTRY, _DatasetReader

    dirname = cfg["setup.oceanic_forcing_input_path"] or os.environ.get(
        "NEXTSIM_DATA_DIR", "."
    )
    reader = _DatasetReader(REGISTRY[dataset_name], grid, dirname)
    return reader.fields_at(t)


def topaz_amsr2_osisaf_ice(cfg, grid, state, mask, time_init: float, scheme: str = "topaz_nrt"):
    """TOPAZ forecast background blended with OSISAF conc/type and AMSR2
    conc (reference: topazForecastAmsr2OsisafIce, fe.cpp:12404-12600):

    * conc: OSISAF where TOPAZ has ice, lowered to AMSR2 where AMSR2 < OSISAF
    * thickness: TOPAZ absolute thickness scaled by the OSISAF ice-type
      factor (FYI x1, MYI x1.5, mixed x1.25) and converted to effective
    * ridge_ratio from the ice-type (0 / 0.3 / 0.9 / 0.6)
    """
    bg = _read_ice_fields(cfg, grid, scheme, time_init)
    # obs are read half a day back, as the reference does (fe.cpp:12409-12412)
    t_obs = time_init - 0.5
    osisaf = _read_obs(cfg, grid, "ice_osisaf", t_obs)
    osisaf_type = _read_obs(cfg, grid, "ice_osisaf_type", t_obs)
    amsr2 = _read_obs(cfg, grid, "ice_amsr2", t_obs)

    dtype = state.conc.dtype
    hi = np.where(bg["thick"] > 1e-14, bg["thick"], 0.0)  # absolute
    hs = np.where(bg.get("snow", np.zeros(grid.shape)) > 1e-14, bg.get("snow", 0.0), 0.0)
    conc = np.minimum(1.0, bg["conc"])
    conc = np.where(conc > 1e-14, conc, 0.0)
    if "obs_conc" in osisaf:
        conc = np.where(conc > 0.0, osisaf["obs_conc"], conc)
    if "obs_conc" in amsr2:
        conc = np.where(amsr2["obs_conc"] < conc, amsr2["obs_conc"], conc)

    ice_type = osisaf_type.get("obs_type", np.full(grid.shape, 2.0))
    ratio_fyi, ratio_myi = 0.3, 0.9
    ratio_mixed = 0.5 * (ratio_fyi + ratio_myi)
    tf_fyi, tf_myi = 1.0, 1.5
    tf_mixed = 0.5 * (tf_fyi + tf_myi)
    ridge = np.select(
        [ice_type < 1.5, ice_type < 2.5, ice_type < 3.5],
        [0.0, ratio_fyi, ratio_myi], default=ratio_mixed,
    )
    thickfac = np.select(
        [ice_type < 1.5, ice_type < 2.5, ice_type < 3.5],
        [tf_fyi, tf_fyi, tf_myi], default=tf_mixed,
    )
    has_ice = (hi > 0.0) & (conc > 0.2)
    hi = np.where(has_ice, hi * thickfac, 0.0)
    ridge = np.where(has_ice, ridge, 0.0)

    gone = (conc < 0.01) | (hi < phys_hmin())
    conc = np.where(gone, 0.0, conc)
    hi = np.where(gone, 0.0, hi)
    hs = np.where(gone, 0.0, hs)
    ridge = np.where(gone, 0.0, ridge)

    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(hi * conc * m, dtype),  # absolute -> effective
        snow_thick=jnp.asarray(hs * conc * m, dtype),
        ridge_ratio=jnp.asarray(ridge * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
    )


def cs2_smos_ice(cfg, grid, state, mask, time_init: float):
    """CS2-SMOS merged thickness analysis + its concentration (reference:
    cs2SmosIce, fe.cpp:13100-13270): conc and absolute thickness from the
    product, snow from the Warren climatology."""
    obs = _read_obs(cfg, grid, "ice_cs2_smos", time_init)
    dtype = state.conc.dtype
    conc = np.clip(obs.get("obs_conc", np.zeros(grid.shape)), 0.0, 1.0)
    hi = np.maximum(obs.get("obs_thick", np.zeros(grid.shape)), 0.0)
    gone = (conc < 0.01) | (hi < phys_hmin())
    conc = np.where(gone, 0.0, conc)
    hi = np.where(gone, 0.0, hi)
    snow = warren_snow(grid, time_init) * conc
    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(hi * conc * m, dtype),
        snow_thick=jnp.asarray(snow * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
        ridge_ratio=jnp.zeros(grid.shape, dtype),
    )


def obs_conc_ice(cfg, grid, state, mask, time_init: float, product: str,
                 const_thick: Optional[float] = None):
    """Concentration-only products (AMSR2/AMSRE/NIC): conc from the product,
    thickness constant or from ideal_simul.init_thickness (reference:
    AMSR2_CSTTHICK etc.)."""
    obs = _read_obs(cfg, grid, product, time_init)
    dtype = state.conc.dtype
    conc = np.clip(obs.get("obs_conc", np.zeros(grid.shape)), 0.0, 1.0)
    h = const_thick if const_thick is not None else cfg["ideal_simul.init_thickness"]
    hi = np.where(conc > 0.01, h, 0.0)
    snow = warren_snow(grid, time_init) * conc
    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(hi * conc * m, dtype),
        snow_thick=jnp.asarray(snow * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
        ridge_ratio=jnp.zeros(grid.shape, dtype),
    )


def piomas_ice(cfg, grid, state, mask, time_init: float):
    """PIOMAS reanalysis conc/thickness/snow (reference: piomasIce)."""
    obs = _read_obs(cfg, grid, "ice_piomas", time_init)
    dtype = state.conc.dtype
    conc = np.clip(obs.get("obs_conc", np.zeros(grid.shape)), 0.0, 1.0)
    vol = np.maximum(obs.get("obs_thick", np.zeros(grid.shape)), 0.0)  # effective
    snow = np.maximum(obs.get("obs_snow", np.zeros(grid.shape)), 0.0)
    gone = conc < 0.01
    conc = np.where(gone, 0.0, conc)
    vol = np.where(gone, 0.0, vol)
    snow = np.where(gone, 0.0, snow)
    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(vol * m, dtype),
        snow_thick=jnp.asarray(snow * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
        ridge_ratio=jnp.zeros(grid.shape, dtype),
    )


def phys_hmin() -> float:
    from nextsim_tpu.core import constants as phys

    return phys.hmin


def smos_ice(cfg, grid, state, mask, time_init: float):
    """SMOS thin-ice init (reference: smosIce, fe.cpp:13326-13376): conc and
    snow from the TOPAZ background, thickness directly from the SMOS
    product."""
    bg = _read_ice_fields(cfg, grid, "topaz", time_init)
    obs = _read_obs(cfg, grid, "ice_smos", time_init)
    dtype = state.conc.dtype
    conc = np.minimum(1.0, bg["conc"])
    conc = np.where(conc > 1e-14, conc, 0.0)
    hi = np.maximum(obs.get("obs_thick", np.zeros(grid.shape)), 0.0)
    snow = np.where(bg.get("snow", np.zeros(grid.shape)) > 1e-14, bg.get("snow", 0.0), 0.0)
    empty = (conc <= 0.0) | (hi <= 0.0)
    conc = np.where(empty, 0.0, conc)
    hi = np.where(empty, 0.0, hi)
    snow = np.where(empty, 0.0, snow)
    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(hi * m, dtype),
        snow_thick=jnp.asarray(snow * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
        ridge_ratio=jnp.zeros(grid.shape, dtype),
    )


def model_output_ice(cfg, grid, state, mask, time_init: float, product: str):
    """NEMO / CICE model-output ice init (reference: nemoIce fe.cpp:12792,
    ciceIce fe.cpp:12843): conc/effective thickness/snow straight from the
    model file."""
    obs = _read_obs(cfg, grid, product, time_init)
    dtype = state.conc.dtype
    conc = np.clip(obs.get("obs_conc", np.zeros(grid.shape)), 0.0, 1.0)
    vol = np.maximum(obs.get("obs_thick", np.zeros(grid.shape)), 0.0)
    snow = np.maximum(obs.get("obs_snow", np.zeros(grid.shape)), 0.0)
    empty = (conc <= 0.0) | (vol <= 0.0)
    conc = np.where(empty, 0.0, conc)
    vol = np.where(empty, 0.0, vol)
    snow = np.where(empty, 0.0, snow)
    m = np.asarray(mask)
    return state.replace(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(vol * m, dtype),
        snow_thick=jnp.asarray(snow * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
        ridge_ratio=jnp.zeros(grid.shape, dtype),
    )


def topaz_osisaf_icesat_ice(cfg, grid, state, mask, time_init: float):
    """TOPAZ reanalysis + OSISAF conc/type + ICESat MYI thickness + AMSR-E
    young ice (reference: topazIceOsisafIcesat, fe.cpp:11798-11925):
    MYI cells take max(icesat, topaz) absolute thickness; ridge_ratio is the
    type ratio *scaled by conc* (unlike the AMSR2 blend); AMSR-E excess conc
    becomes young ice."""
    bg = _read_ice_fields(cfg, grid, "topaz", time_init)
    osisaf = _read_obs(cfg, grid, "ice_osisaf", time_init)
    osisaf_type = _read_obs(cfg, grid, "ice_osisaf_type", time_init)
    amsre = _read_obs(cfg, grid, "ice_amsre", time_init)
    icesat = _read_obs(cfg, grid, "ice_icesat", time_init)

    dtype = state.conc.dtype
    hi = np.where(bg["thick"] > 1e-14, bg["thick"], 0.0)  # absolute
    hs = np.where(bg.get("snow", np.zeros(grid.shape)) > 1e-14, bg.get("snow", 0.0), 0.0)
    conc = np.minimum(1.0, bg["conc"])
    conc = np.where(conc > 1e-14, conc, 0.0)
    if "obs_conc" in osisaf:
        conc = np.where(conc > 0.0, osisaf["obs_conc"], conc)

    ice_type = osisaf_type.get("obs_type", np.full(grid.shape, 2.0))
    icesat_h = icesat.get("obs_thick", np.zeros(grid.shape))
    ratio_fyi, ratio_myi = 0.3, 0.9
    ratio_mixed = 0.5 * (ratio_fyi + ratio_myi)
    thick_fyi = hi
    thick_myi = np.maximum(icesat_h, hi)
    thick_mixed = 0.5 * (thick_fyi + thick_myi)
    ridge = np.select(
        [ice_type < 1.5, ice_type < 2.5, ice_type < 3.5],
        [0.0, ratio_fyi, ratio_myi], default=ratio_mixed,
    )
    hi_typed = np.select(
        [ice_type < 1.5, ice_type < 2.5, ice_type < 3.5],
        [thick_fyi, thick_fyi, thick_myi], default=thick_mixed,
    )
    has_ice = (hi > 0.0) & (conc > 0.2)
    hi = np.where(has_ice, hi_typed, hi)
    ridge = np.where(has_ice, ridge, 0.0)

    gone = (conc < 0.01) | (hi < phys_hmin())
    conc = np.where(gone, 0.0, conc)
    hi = np.where(gone, 0.0, hi)
    hs = np.where(gone, 0.0, hs)
    # this scheme scales ridge_ratio by conc (fe.cpp:11911)
    ridge = np.where(gone, 0.0, ridge * conc)

    m = np.asarray(mask)
    updates = dict(
        conc=jnp.asarray(conc * m, dtype),
        thick=jnp.asarray(hi * conc * m, dtype),
        snow_thick=jnp.asarray(hs * conc * m, dtype),
        ridge_ratio=jnp.asarray(ridge * m, dtype),
        damage=jnp.zeros(grid.shape, dtype),
    )
    # AMSR-E excess concentration becomes young ice (fe.cpp:11917-11921)
    if cfg["thermo.newice_type"] == 4 and "obs_conc" in amsre:
        cy = np.clip(amsre["obs_conc"] - conc, 0.0, 1.0)
        h_young_min = cfg["thermo.h_young_min"]
        h_young_max = cfg["thermo.h_young_max"]
        updates["conc_young"] = jnp.asarray(cy * m, dtype)
        updates["h_young"] = jnp.asarray(
            cy * (h_young_min + 0.5 * (h_young_max - h_young_min)) * m, dtype
        )
    return state.replace(**updates)
