"""Variable registry: the static metadata table driving advection transforms,
bounds clamping, restart and export, generically over the State pytree.

Mirrors the reference's ModelVariable attribute table (reference:
model/model_variable.hpp:26-215, model/model_variable.cpp initElemental):
each variable declares kind (cell/node), prognostic flag, the transformation
applied before transport (none/conc/thick/enthalpy), diffusivity, bounds and
the export name used in output/restart files (so files are field-for-field
comparable with reference output).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

CELL = "cell"
NODE = "node"

# transport transforms (reference: model_variable.hpp:42-49)
NONE = "none"  # conservative area-density already; flux-form advect directly
CONC = "conc"  # multiply by conc before transport
THICK = "thick"  # multiply by thick before transport
ENTHALPY = "enthalpy"  # Winton (2000) eq. 39 transform for tice[1]
INTENSIVE = "intensive"  # advective (non-conservative) form, e.g. SST/SSS


@dataclasses.dataclass(frozen=True)
class VarSpec:
    name: str  # State field name
    kind: str = CELL
    prognostic: bool = True
    transform: str = NONE
    export_name: str = ""  # reference Exporter/restart name
    bounds: Tuple[Optional[float], Optional[float]] = (None, None)
    components: int = 0  # >0 for stacked leading axis (tice: 3, sigma: 3)


# ---------------------------------------------------------------------------
# Prognostic variables (reference: model_variable.hpp:51-90 and
# model_variable.cpp; export names from model_variable.cpp:32-433)
# ---------------------------------------------------------------------------
_SPECS = [
    VarSpec("conc", transform=NONE, export_name="Concentration", bounds=(0.0, 1.0)),
    VarSpec("thick", transform=NONE, export_name="Thickness", bounds=(0.0, None)),
    VarSpec("snow_thick", transform=NONE, export_name="Snow", bounds=(0.0, None)),
    VarSpec("damage", transform=INTENSIVE, export_name="Damage", bounds=(0.0, 1.0)),
    VarSpec("ridge_ratio", transform=INTENSIVE, export_name="Ridge_ratio", bounds=(0.0, 1.0)),
    # tice[0] surface T (intensive), tice[1] enthalpy transform, tice[2] thick
    VarSpec("tice", components=3, transform=ENTHALPY, export_name="Tice", bounds=(-100.0, None)),
    VarSpec("sigma", components=3, transform=INTENSIVE, export_name="M_sigma"),
    VarSpec("sst", transform=INTENSIVE, export_name="SST", bounds=(-3.0, None)),
    VarSpec("sss", transform=INTENSIVE, export_name="SSS", bounds=(0.0, None)),
    VarSpec("tsurf_young", transform=INTENSIVE, export_name="Tsurf_young_ice", bounds=(-100.0, 0.0)),
    VarSpec("h_young", transform=NONE, export_name="Thickness_young_ice", bounds=(0.0, None)),
    VarSpec("hs_young", transform=NONE, export_name="Snow_young_ice", bounds=(0.0, None)),
    VarSpec("conc_young", transform=NONE, export_name="Concentration_young_ice", bounds=(0.0, 1.0)),
    VarSpec("random_number", transform=INTENSIVE, export_name="M_random_number", bounds=(0.0, 1.0)),
    VarSpec("fyi_fraction", transform=NONE, export_name="Fyi_fraction", bounds=(0.0, 1.0)),
    VarSpec("age_det", transform=CONC, export_name="Age_d", bounds=(0.0, None)),
    VarSpec("age", transform=THICK, export_name="Age", bounds=(0.0, None)),
    VarSpec("conc_upd", transform=NONE, export_name="Concentration_update", bounds=(-1.0, 1.0)),
    VarSpec("conc_myi", transform=NONE, export_name="Concentration_myi", bounds=(0.0, 1.0)),
    VarSpec("thick_myi", transform=NONE, export_name="Thickness_myi", bounds=(0.0, None)),
    VarSpec("conc_summer", transform=NONE, export_name="Concentration_summer", bounds=(0.0, 1.0)),
    VarSpec("thick_summer", transform=NONE, export_name="Thickness_summer", bounds=(0.0, None)),
    VarSpec("freeze_days", transform=INTENSIVE, export_name="Ice_freezing_days", bounds=(0.0, None)),
    VarSpec("freeze_onset", transform=INTENSIVE, export_name="Ice_freezing_onset", bounds=(0.0, 1.0)),
    VarSpec("del_vi_tend", transform=INTENSIVE, export_name="Ice_volume_tendency_daily"),
    VarSpec("pond_volume", transform=NONE, export_name="Meltpond_volume", bounds=(0.0, None)),
    VarSpec("lid_volume", transform=NONE, export_name="Meltpond_lid_volume", bounds=(0.0, None)),
    # persistent (non-advected) drag coefficients from the stability scheme
    VarSpec("drag_ui", prognostic=False, transform=INTENSIVE, export_name="ice-atmosphere_drag"),
    VarSpec("drag_ti", prognostic=False, transform=INTENSIVE, export_name="ice-atmosphere_thermo_drag"),
    VarSpec("drag_ui_young", prognostic=False, transform=INTENSIVE, export_name="ice-atmosphere_drag_young"),
    VarSpec("drag_ti_young", prognostic=False, transform=INTENSIVE, export_name="ice-atmosphere_thermo_drag_young"),
    VarSpec("time_relaxation_damage", prognostic=False, transform=INTENSIVE, export_name="Time_relaxation_damage"),
    # nodal prognostics (reference: restart stores M_VT, M_UM, M_UT)
    VarSpec("vt_u", kind=NODE, export_name="M_VT_x"),
    VarSpec("vt_v", kind=NODE, export_name="M_VT_y"),
    VarSpec("ut_u", kind=NODE, export_name="M_UT_x"),
    VarSpec("ut_v", kind=NODE, export_name="M_UT_y"),
]

SPECS: Dict[str, VarSpec] = {s.name: s for s in _SPECS}

#: cell variables transported by the advection operator, in order
ADVECTED = [
    s.name
    for s in _SPECS
    if s.kind == CELL and s.prognostic and s.name not in ("random_number",)
]

#: export names of diagnostic (D_*) fields — see core/state.py Diag
DIAG_EXPORT_NAMES = {
    "qa": "Qatm", "qsw": "Qsw", "qlw": "Qlw", "qsh": "Qsh", "qlh": "Qlh",
    "qo": "Qocean", "qnosun": "Qnosun", "qsw_ocean": "Qsw_ocean",
    "qassim": "Qassim", "dels": "Saltflux", "fwflux": "D_fwflux",
    "fwflux_ice": "D_fwflux_ice", "vice_melt": "D_vice_melt",
    "del_vi_young": "D_del_vi_young", "del_hi": "D_del_hi",
    "del_hi_young": "D_del_hi_young", "newice": "D_newice",
    "mlt_bot": "D_mlt_bot", "mlt_top": "D_mlt_top", "snow2ice": "D_snow2ice",
    "brine": "D_brine", "evap": "D_evap", "rain": "D_rain",
    "albedo": "albedo", "sialb": "sialb", "pond_fraction": "Meltpond_fraction",
    "divergence": "Divergence",
    "del_ci_ridge_myi": "MYI_area_ridging_change_daily_rate",
    "del_vi_mlt_myi": "MYI_volume_melt_change_daily_rate",
    "del_ci_mlt_myi": "MYI_area_melt_change_daily_rate",
    "del_vi_rplnt_myi": "MYI_volume_replenishment_change_daily_rate",
    "del_ci_rplnt_myi": "MYI_area_replenishment_change_daily_rate",
    "tau_ax": "D_tau_a_x", "tau_ay": "D_tau_a_y",
    "tau_wx": "D_tau_w_x", "tau_wy": "D_tau_w_y",
    "tau_ow": "D_tau_ow",
}
