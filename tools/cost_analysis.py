"""Per-substep roofline numbers for the momentum hot loop.

XLA's `Compiled.cost_analysis()` counts a `while` body ONCE, so the
production 120-substep program under-reports loop flops. The honest count
here is MARGINAL: two fully-unrolled variants (substeps=4 and substeps=12,
unroll=substeps, so no while loop remains) are compiled and differenced —
(flops(12) - flops(4)) / 8 is exactly one substep's flop/transcendental
count with prep, smoother and output handling cancelled. The same
difference on measured wall time gives the marginal substep time free of
dispatch overhead.

Utilization is reported against a v5e VPU peak model: 4 ALU lanesets of
shape (8, 128) at 940 MHz = 3.85 Top/s counting one op/lane/cycle (twice
that if every op were an FMA). Physics is a mix of adds/muls/selects/
divides/rsqrts, so the honest ceiling for this op mix sits between the two
bounds; the transcendental density contextualises the gap (SURVEY §5
"per-kernel roofline"; VERDICT r3 item 4).

Usage: python tools/cost_analysis.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VPU_OPS_PER_S = 4 * 8 * 128 * 0.94e9  # one op/lane/cycle
VPU_FMA_FLOPS_PER_S = 2 * VPU_OPS_PER_S


def _build(nx, substeps, unroll):
    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    cfg = Config(overrides={
        "grid.preset": "arctic",
        "grid.nx": nx, "grid.ny": nx, "grid.resolution": 10e3,
        "simul.timestep": 200,
        "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": substeps,
        "tpu.substep_unroll": unroll,
        "dynamics.alea_factor": 0.33,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant",
        "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 10.0,
        "ideal_simul.constant_wind_v": -3.0,
        "dynamics.use_coriolis": True,
    })
    sim = Simulator(cfg)
    forcing = sim.forcing_provider(sim.current_time, sim.time_init)
    return sim, forcing, sim.time_info()


def _measure(sim, forcing, tinfo, n_steps=30, windows=4):
    import jax

    compiled = jax.jit(sim.raw_step_fn).lower(
        sim.state, forcing, tinfo
    ).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    try:
        ma = compiled.memory_analysis()
        mem = {
            "temp_bytes": int(getattr(ma, "temp_size_in_bytes", 0)),
            "argument_bytes": int(getattr(ma, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(ma, "output_size_in_bytes", 0)),
        }
    except Exception:
        mem = {}
    s, _, _ = compiled(sim.state, forcing, tinfo)
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            s, _, _ = compiled(s, forcing, tinfo)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return {
        "flops": float(ca.get("flops", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
        "step_s": best,
        "memory": mem,
    }


def main() -> None:
    import jax

    nx = 464
    cells = nx * nx
    lo_sub, hi_sub = 4, 12

    runs = {}
    for tag, sub, unroll in (
        ("lo", lo_sub, lo_sub), ("hi", hi_sub, hi_sub), ("prod", 120, 4),
    ):
        sim, forcing, tinfo = _build(nx, sub, unroll)
        runs[tag] = _measure(sim, forcing, tinfo)
        runs[tag]["substeps"] = sub

    dsub = hi_sub - lo_sub
    per_substep = {
        k: (runs["hi"][k] - runs["lo"][k]) / dsub
        for k in ("flops", "transcendentals", "bytes", "step_s")
    }
    hbm = runs["prod"]["memory"]  # device-memory footprint of one step
    marg_flops_s = per_substep["flops"] / per_substep["step_s"]
    prod = runs["prod"]
    prod_us_per_substep = prod["step_s"] * 1e6 / 120
    # production achieved rate from the marginal flop count (the
    # prep/smoother flops are amortised over 120 substeps — negligible)
    prod_flops_s = per_substep["flops"] * 120 / prod["step_s"]

    report = {
        "grid": f"{nx}x{nx}",
        "cells": cells,
        "method": (
            f"marginal between fully-unrolled substeps={lo_sub} and "
            f"={hi_sub} programs (XLA cost_analysis counts while bodies "
            "once; full unroll removes the loop)"
        ),
        "per_substep": {
            "flops": per_substep["flops"],
            "flops_per_cell": per_substep["flops"] / cells,
            "transcendentals": per_substep["transcendentals"],
            "transcendentals_per_cell": per_substep["transcendentals"] / cells,
            "hlo_bytes": per_substep["bytes"],
            "marginal_us": per_substep["step_s"] * 1e6,
        },
        "production": {
            "substeps": 120, "unroll": 4,
            "step_ms": prod["step_s"] * 1e3,
            "us_per_substep": prod_us_per_substep,
            "achieved_flops_per_s": prod_flops_s,
        },
        "vpu_peak_model": {
            "ops_per_s": VPU_OPS_PER_S,
            "fma_flops_per_s": VPU_FMA_FLOPS_PER_S,
            "utilization_vs_ops": prod_flops_s / VPU_OPS_PER_S,
            "utilization_vs_fma": prod_flops_s / VPU_FMA_FLOPS_PER_S,
            "transcendental_per_flop": (
                per_substep["transcendentals"] / max(per_substep["flops"], 1.0)
            ),
        },
        "hbm_memory": hbm,
        "raw": runs,
        "device": str(jax.devices()[0]),
    }
    out = json.dumps(report, indent=1)
    print(out)
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
