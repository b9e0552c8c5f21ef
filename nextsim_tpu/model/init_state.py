"""Model state initialisation.

Implements the reference's initVariables/initIce/initSlabOcean family
(reference: model/finiteelement.cpp:11396-11515 dispatch over 25 IceType
schemes; constantIce at 11662-11753; initSlabOcean at 11307-11351;
checkConsistency at 11515-11634). Data-driven schemes (TOPAZ, CS2-SMOS, ...)
are added in nextsim_tpu/model/init_ice_datasets.py as the forcing layer
grows; the idealised schemes here unblock everything else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nextsim_tpu.core import constants as phys
from nextsim_tpu.core.state import State


def freezing_point(cfg, sss):
    """Freezing point of sea water (reference: fe.cpp freezingPoint)."""
    if cfg["thermo.freezingpoint-type"] == "unesco":
        return (-0.0575 + 1.710523e-3 * jnp.sqrt(sss) - 2.154996e-4 * sss) * sss
    return -cfg["thermo.freezingpoint_mu"] * sss


def init_state(cfg, grid, dtype=jnp.float32, seed: int = 7) -> State:
    state = State.zeros(grid, dtype=dtype, cfg=cfg)
    mask = jnp.asarray(grid.mask, dtype)

    state = _init_slab_ocean(cfg, grid, state)
    state = _init_ice(cfg, grid, state, mask)

    # per-cell uniform random for the cohesion alea (reference:
    # fe.cpp:11459-11475 - uniform_01 on root, broadcast)
    key = jax.random.PRNGKey(seed)
    rnd = jax.random.uniform(key, grid.shape, dtype)
    state = state.replace(random_number=rnd)

    state = check_consistency(cfg, state, mask)
    return state


def _init_slab_ocean(cfg, grid, state) -> State:
    ocean_type = cfg["setup.ocean-type"]
    mu = cfg["thermo.freezingpoint_mu"]
    if ocean_type == "constant":
        # (reference: fe.cpp:11312-11315)
        sst = jnp.full(grid.shape, 1.0, state.sst.dtype)
        sss = jnp.full(grid.shape, 1.8 / mu, state.sss.dtype)
        return state.replace(sst=sst, sss=sss)
    # dataset oceans initialise from the first forcing plane in the
    # simulator once the provider is up (fe.cpp:11322-11330)
    return state


def _init_ice(cfg, grid, state, mask) -> State:
    ice_type = cfg["setup.ice-type"]
    if ice_type in ("constant", "constant_partial"):
        return _constant_ice(cfg, grid, state, mask, partial=ice_type == "constant_partial")

    # dataset-backed schemes (reference: initIce dispatch, fe.cpp:11396-11515;
    # config names per the str2conc map, fe.cpp:1328-1347)
    from nextsim_tpu.model import init_ice_datasets as iid
    from nextsim_tpu.utils import dates as _dates

    time_init_str = cfg["simul.time_init"]
    t0 = _dates.string_to_datenum(time_init_str) if time_init_str else 0.0

    if ice_type in ("topaz4_rean", "topaz4", "topaz"):
        return iid.topaz_like_ice(cfg, grid, state, mask, "topaz", t0)
    if ice_type in ("topaz4_nrt", "topaz5_nrt"):
        return iid.topaz_like_ice(cfg, grid, state, mask, "topaz_nrt", t0)
    if ice_type == "glorys12":
        return iid.topaz_like_ice(cfg, grid, state, mask, "glorys12", t0)
    if ice_type in (
        "topaz4_nrt-amsr2", "topaz4_nrt-amsr2-osisaf",
        "topaz4_nrt-amsr2-osisaf-nic", "topaz4_nrt-amsr2-osisaf-nic_weekly",
    ):
        return iid.topaz_amsr2_osisaf_ice(cfg, grid, state, mask, t0)
    if ice_type in ("cs2-smos", "cs2-smos-amsr2"):
        return iid.cs2_smos_ice(cfg, grid, state, mask, t0)
    if ice_type in ("amsr2", "amsr2-cst_thick"):
        return iid.obs_conc_ice(cfg, grid, state, mask, t0, "ice_amsr2")
    if ice_type == "amsre":
        return iid.obs_conc_ice(cfg, grid, state, mask, t0, "ice_amsre")
    if ice_type == "piomas":
        return iid.piomas_ice(cfg, grid, state, mask, t0)
    if ice_type == "smos":
        return iid.smos_ice(cfg, grid, state, mask, t0)
    if ice_type == "nemo":
        return iid.model_output_ice(cfg, grid, state, mask, t0, "ice_nemo")
    if ice_type == "cice":
        return iid.model_output_ice(cfg, grid, state, mask, t0, "ice_cice")
    if ice_type == "topaz4_rean-osisaf-icesat":
        return iid.topaz_osisaf_icesat_ice(cfg, grid, state, mask, t0)
    # NOTE: the reference's IceType enum also lists ARBITRARY, MITGCM,
    # TARGET and BINARY (enums.hpp:48,52,53,61) but they are unreachable
    # there too: no entry in the str2conc config map (fe.cpp:1327-1347) and
    # no case in the initIce switch (fe.cpp:11400-11456). Every name a
    # reference config can actually select dispatches above.
    raise NotImplementedError(f"unknown ice init scheme {ice_type!r}")


def _constant_ice(cfg, grid, state, mask, partial: bool) -> State:
    """(reference: constantIce, fe.cpp:11662-11753)"""
    c_const = cfg["ideal_simul.init_concentration"]
    h_const = cfg["ideal_simul.init_thickness"]
    hs_const = cfg["ideal_simul.init_snow_thickness"]
    dtype = state.conc.dtype

    conc = jnp.full(grid.shape, c_const, dtype)
    thick = jnp.full(grid.shape, c_const * h_const, dtype)  # ice volume
    snow = jnp.full(grid.shape, hs_const, dtype)

    conc_young = jnp.zeros_like(conc)
    h_young = jnp.zeros_like(conc)
    hs_young = jnp.zeros_like(conc)

    use_thermo = cfg["thermo.use_thermo_forcing"]
    use_young = cfg["thermo.newice_type"] == 4
    sst_limit = cfg["ideal_simul.init_SST_limit"]
    tfrw = freezing_point(cfg, state.sss)
    warm = use_thermo & (state.sst > tfrw + sst_limit) if use_thermo else jnp.zeros_like(conc, bool)
    conc = jnp.where(warm, 0.0, conc)
    thick = jnp.where(warm, 0.0, thick)
    snow = jnp.where(warm, 0.0, snow)

    if use_young:
        yc = cfg["ideal_simul.init_young_conc"]
        h_young_min = cfg["thermo.h_young_min"]
        h_young_max = cfg["thermo.h_young_max"]
        set_young = jnp.logical_not(warm)
        conc_young = jnp.where(set_young, yc, 0.0).astype(dtype)
        h_young = (h_young_min + 0.5 * (h_young_max - h_young_min)) * conc_young
        hs_young = hs_const * conc_young

    if partial:
        # no ice for x < xmin + 0.3*(xmax-xmin) (fe.cpp:11707-11744)
        x, _ = grid.cell_xy()
        nodes_x, _ = grid.node_xy()
        xmin, xmax = float(nodes_x.min()), float(nodes_x.max())
        xedge = xmin + 0.3 * (xmax - xmin)
        bare = jnp.asarray(x < xedge)
        conc = jnp.where(bare, 0.0, conc)
        thick = jnp.where(bare, 0.0, thick)
        snow = jnp.where(bare, 0.0, snow)

    return state.replace(
        conc=conc * mask,
        thick=thick * mask,
        snow_thick=snow * mask,
        conc_young=conc_young * mask,
        h_young=h_young * mask,
        hs_young=hs_young * mask,
        damage=jnp.zeros_like(conc),
        ridge_ratio=jnp.zeros_like(conc),
    )


def check_consistency(cfg, state, mask) -> State:
    """Bounds enforcement after init (reference: checkConsistency,
    fe.cpp:11515-11634): clamp conc/vols, zero ice where conc < cmin, set
    ice temperatures consistent with the freezing point."""
    mu = cfg["thermo.freezingpoint_mu"]
    tfr_ice = -mu * phys.si

    conc = jnp.clip(state.conc, 0.0, 1.0) * mask
    thick = jnp.maximum(state.thick, 0.0) * mask
    snow = jnp.maximum(state.snow_thick, 0.0) * mask
    no_ice = (conc < phys.cmin) | (thick <= 0.0)
    conc = jnp.where(no_ice, 0.0, conc)
    thick = jnp.where(no_ice, 0.0, thick)
    snow = jnp.where(no_ice, 0.0, snow)

    tice = state.tice
    tice = jnp.minimum(tice, tfr_ice)  # ice can't be warmer than its melting point

    return state.replace(conc=conc, thick=thick, snow_thick=snow, tice=tice)
