"""The model state as a JAX pytree.

``State`` carries every prognostic field of the reference's variable set
(reference: model/model_variable.hpp:51-90) on the structured grid:
cell-centered tracers (ny, nx), stacked multi-layer fields (3, ny, nx) and
node-staggered velocity (ny+1, nx+1). ``Diag`` carries the D_* diagnostic
fields (reference: model/model_variable.hpp:91-134) recomputed every step.

Both are registered dataclass pytrees: jit/vmap/scan transparent, shardable
leaf-by-leaf with `jax.sharding.NamedSharding`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class State:
    # --- cell tracers (ny, nx) -------------------------------------------
    conc: Any  # ice concentration of thick ("old") ice [0..1]
    thick: Any  # ice volume per cell area (effective thickness) [m]
    snow_thick: Any  # snow volume per cell area [m]
    damage: Any  # BBM damage [0..1]
    ridge_ratio: Any  # ridged-ice volume fraction [0..1]
    tice: Any  # (3, ny, nx) ice temperatures: surface, mid (Winton T1), bottom (T2) [C]
    sigma: Any  # (3, ny, nx) stress components sxx, syy, sxy [Pa]
    sst: Any  # slab-ocean temperature [C]
    sss: Any  # slab-ocean salinity [g/kg]
    tsurf_young: Any  # young-ice surface temperature [C]
    h_young: Any  # young-ice volume per cell area [m]
    hs_young: Any  # young-ice snow volume [m]
    conc_young: Any  # young-ice concentration [0..1]
    random_number: Any  # per-cell uniform random for cohesion
    fyi_fraction: Any  # first-year-ice fraction
    age_det: Any  # observable (detectable) ice age [s]
    age: Any  # volume-weighted ice age [s]
    conc_upd: Any  # concentration update from assimilation
    conc_myi: Any  # multiyear-ice concentration
    thick_myi: Any  # multiyear-ice volume
    conc_summer: Any  # summer-minimum concentration tracker
    thick_summer: Any  # summer-minimum volume tracker
    freeze_days: Any  # consecutive freezing days counter
    freeze_onset: Any  # freeze-onset flag (0/1)
    del_vi_tend: Any  # daily ice-volume tendency accumulator [m]
    pond_volume: Any  # melt pond volume [m water]
    lid_volume: Any  # melt pond lid volume [m water]
    drag_ui: Any  # ice-atmosphere momentum drag coef (stability-adjusted)
    drag_ti: Any  # ice-atmosphere thermo drag coef
    drag_ui_young: Any
    drag_ti_young: Any
    time_relaxation_damage: Any  # damage healing time [s]
    # --- node fields (ny+1, nx+1) ----------------------------------------
    vt_u: Any  # ice velocity x [m/s]
    vt_v: Any  # ice velocity y [m/s]
    ut_u: Any  # time-integrated velocity x [m] (drifter/diag parity with M_UT)
    ut_v: Any
    # --- optional FSD bins (None unless wave_coupling.num_fsd_bins > 0) ---
    conc_fsd: Any = None  # (nbins, ny, nx) area-based FSD
    conc_mech_fsd: Any = None  # mechanical FSD (distinguish_mech_fsd)

    @staticmethod
    def zeros(grid, dtype=jnp.float32, cfg=None) -> "State":
        ny, nx = grid.shape
        cell = lambda: jnp.zeros((ny, nx), dtype)
        node = lambda: jnp.zeros((ny + 1, nx + 1), dtype)
        quad_drag_coef_air = 0.0020 if cfg is None else _quad_drag_air(cfg)
        drag_ice_t = 1.3e-3 if cfg is None else cfg["thermo.drag_ice_t"]
        t_relax = 25.0 * 86400.0 if cfg is None else cfg["dynamics.time_relaxation_damage"] * 86400.0
        mu = 0.055 if cfg is None else cfg["thermo.freezingpoint_mu"]
        tfr_ice = -mu * 5.0  # freezing point of ice (si=5 g/kg)
        return State(
            conc=cell(), thick=cell(), snow_thick=cell(),
            damage=cell(), ridge_ratio=cell(),
            tice=jnp.full((3, ny, nx), tfr_ice, dtype),
            sigma=jnp.zeros((3, ny, nx), dtype),
            sst=cell() - 1.8, sss=cell() + 32.0,
            tsurf_young=jnp.full((ny, nx), tfr_ice, dtype),
            h_young=cell(), hs_young=cell(), conc_young=cell(),
            random_number=cell(),
            fyi_fraction=cell(), age_det=cell(), age=cell(), conc_upd=cell(),
            conc_myi=cell(), thick_myi=cell(), conc_summer=cell(), thick_summer=cell(),
            freeze_days=cell(), freeze_onset=cell(), del_vi_tend=cell(),
            pond_volume=cell(), lid_volume=cell(),
            drag_ui=jnp.full((ny, nx), quad_drag_coef_air, dtype),
            drag_ti=jnp.full((ny, nx), drag_ice_t, dtype),
            drag_ui_young=jnp.full((ny, nx), quad_drag_coef_air, dtype),
            drag_ti_young=jnp.full((ny, nx), drag_ice_t, dtype),
            time_relaxation_damage=jnp.full((ny, nx), t_relax, dtype),
            vt_u=node(), vt_v=node(), ut_u=node(), ut_v=node(),
        )

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


@_pytree_dataclass
class Diag:
    """Per-step diagnostic fields (reference D_* variables)."""

    # nodal
    tau_ax: Any  # atmosphere->ice stress x at nodes [N/m2]
    tau_ay: Any
    tau_wx: Any  # ice->ocean stress x at nodes [N/m2]
    tau_wy: Any
    # cell
    tau_ow: Any  # open-water atm drag bulk coefficient
    qa: Any; qsw: Any; qlw: Any; qsh: Any; qlh: Any
    qo: Any; qnosun: Any; qsw_ocean: Any; qassim: Any
    dels: Any; fwflux: Any; fwflux_ice: Any; brine: Any
    evap: Any; rain: Any
    vice_melt: Any; del_vi_young: Any; del_hi: Any; del_hi_young: Any
    newice: Any; mlt_top: Any; mlt_bot: Any; snow2ice: Any
    albedo: Any; sialb: Any; pond_fraction: Any
    divergence: Any
    del_ci_ridge_myi: Any; del_vi_mlt_myi: Any; del_ci_mlt_myi: Any
    del_vi_rplnt_myi: Any; del_ci_rplnt_myi: Any

    @staticmethod
    def zeros(grid, dtype=jnp.float32) -> "Diag":
        ny, nx = grid.shape
        cell = jnp.zeros((ny, nx), dtype)
        node = jnp.zeros((ny + 1, nx + 1), dtype)
        kw = {}
        for f in dataclasses.fields(Diag):
            kw[f.name] = node if f.name.startswith("tau_a") or f.name.startswith("tau_w") and f.name != "tau_ow" else cell
        kw["tau_ow"] = cell
        return Diag(**kw)

    def replace(self, **kw) -> "Diag":
        return dataclasses.replace(self, **kw)


def _quad_drag_air(cfg) -> float:
    """Atmosphere quadratic drag coefficient by forcing source (reference:
    model/finiteelement.cpp:1094-1160 selects per atmosphere-type)."""
    atm = cfg["setup.atmosphere-type"]
    table = {
        "asr": cfg["dynamics.ASR_quad_drag_coef_air"],
        "era5": cfg["dynamics.ERA5_quad_drag_coef_air"],
        "generic_ps": cfg["dynamics.ERA5_quad_drag_coef_air"],
        "cfsr": cfg["dynamics.CFSR_quad_drag_coef_air"],
        "cfsr_hi": cfg["dynamics.CFSR_quad_drag_coef_air"],
        "ecmwf_nrt": cfg["dynamics.ECMWF_quad_drag_coef_air"],
        "ecmwf_nrt_arome": cfg["dynamics.ECMWF_quad_drag_coef_air"],
        "ecmwf_nrt_arome_ensemble": cfg["dynamics.ECMWF_quad_drag_coef_air"],
        # CONSTANT uses the ASR coefficient (reference: finiteelement.cpp:1286)
        "constant": cfg["dynamics.ASR_quad_drag_coef_air"],
    }
    return table.get(atm, cfg["dynamics.ECMWF_quad_drag_coef_air"])
