"""Golden regression: a fixed toy run must reproduce stored field statistics.

The reference has no golden tests; its stand-in is the toy config + eyeball
(SURVEY.md §4). Here the toy run's summary statistics are pinned so any
future refactor that changes the physics shows up as a diff. Tolerances are
loose enough for cross-platform float32 reduction-order noise, tight enough
to catch a formula change.

To intentionally re-baseline after a physics change: run with
UPDATE_GOLDEN=1 and commit the new numbers printed at the end.
"""

import json
import os
import pathlib

import numpy as np
import pytest

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator

GOLDEN_FILE = pathlib.Path(__file__).parent / "golden_toy.json"


def run_toy():
    cfg = Config(overrides={
        "grid.nx": 48, "grid.ny": 48, "grid.resolution": 10e3,
        "simul.timestep": 200, "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 120,
        "dynamics.use_coriolis": False,
        "dynamics.alea_factor": 0.33,
        "dynamics.C_lab": 1.5e6,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant_partial",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 20.0,
        "simul.spinup_duration": 0.0,
        "tpu.donate_state": False,
    })
    sim = Simulator(cfg)
    for _ in range(15):
        sim.step()
    s = sim.state
    stats = {
        "conc_sum": float(np.asarray(s.conc).sum()),
        "thick_sum": float(np.asarray(s.thick).sum()),
        "conc_max": float(np.asarray(s.conc).max()),
        "thick_max": float(np.asarray(s.thick).max()),
        "damage_mean": float(np.asarray(s.damage).mean()),
        "damage_max": float(np.asarray(s.damage).max()),
        "speed_max": float(np.hypot(np.asarray(s.vt_u), np.asarray(s.vt_v)).max()),
        "speed_mean": float(np.hypot(np.asarray(s.vt_u), np.asarray(s.vt_v)).mean()),
        "sigma_absmax": float(np.abs(np.asarray(s.sigma)).max()),
        "ridge_max": float(np.asarray(s.ridge_ratio).max()),
        # LKF-sharpness guard (VERDICT r1 weak #6): gradient energy of the
        # damage field — numerical diffusion in the intensive-tracer
        # transport smears damage fronts and shows up here as a drop
        "damage_grad_energy": float(
            (np.diff(np.asarray(s.damage), axis=0) ** 2).sum()
            + (np.diff(np.asarray(s.damage), axis=1) ** 2).sum()
        ),
    }
    return stats


def test_golden_toy_run():
    stats = run_toy()
    if os.environ.get("UPDATE_GOLDEN") or not GOLDEN_FILE.exists():
        GOLDEN_FILE.write_text(json.dumps(stats, indent=1))
        pytest.skip(f"golden baseline written to {GOLDEN_FILE}")
    golden = json.loads(GOLDEN_FILE.read_text())
    for key, ref in golden.items():
        got = stats[key]
        tol = 0.02 * max(abs(ref), 1e-6) + 1e-6
        assert abs(got - ref) <= tol, (
            f"golden mismatch for {key}: got {got!r}, baseline {ref!r} "
            "(rerun with UPDATE_GOLDEN=1 if the physics change is intended)"
        )
