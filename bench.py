"""Benchmark: momentum+rheology substep throughput on the pan-Arctic domain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: grid-cell substeps per second per chip for the fused BBM
momentum+rheology kernel (the reference's hot loop #1, explicitSolve,
model/finiteelement.cpp:10182-10643 — 120 substeps per 200 s model step on a
10 km pan-Arctic mesh).

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md), so
the anchor is the reference's *operational workload rate*: its example HPC
job runs the ~10 km pan-Arctic mesh (~120k triangles, SURVEY.md §6) with 16
MPI ranks at dt=200 s and 120 substeps inside a 4 h walltime for a multi-day
forecast — equivalent to ~1e7 element-substeps/s. vs_baseline is our
cell-substeps/s divided by that anchor.
"""

from __future__ import annotations

import json
import time

REFERENCE_ANCHOR_CELL_SUBSTEPS_PER_S = 1.0e7


def main() -> None:
    import jax

    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    # pan-Arctic scale: 608x608 at 10 km (~370k cells incl. land; ~246k ocean)
    nx = ny = 608
    substeps = 120
    cfg = Config(
        overrides={
            "grid.preset": "arctic",
            "grid.nx": nx,
            "grid.ny": ny,
            "grid.resolution": 10e3,
            "simul.timestep": 200,
            "simul.time_init": "2015-10-16 00:00:00",
            "dynamics.substeps": substeps,
            "dynamics.alea_factor": 0.33,
            "thermo.use_thermo_forcing": False,
            "setup.ice-type": "constant",
            "setup.atmosphere-type": "constant",
            "setup.ocean-type": "constant",
            "ideal_simul.constant_wind_u": 10.0,
            "ideal_simul.constant_wind_v": -3.0,
            "dynamics.use_coriolis": True,
        }
    )
    cfg.set("tpu.steps_per_call", 10)  # fused multi-step device program
    sim = Simulator(cfg)
    forcing = sim.forcing_provider(sim.current_time, sim.time_init)
    tinfo = sim.time_info()
    chunk = sim._build_chunk_fn(sim._chunk_k)

    # warmup/compile
    state, diag, viol, acc, lex = chunk(sim.state, forcing, tinfo)
    jax.block_until_ready(state)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps // sim._chunk_k):
        state, diag, viol, acc, lex = chunk(state, forcing, tinfo)
    jax.block_until_ready(state)
    dt_wall = time.perf_counter() - t0

    cells = nx * ny
    cell_substeps_per_s = cells * substeps * n_steps / dt_wall
    steps_per_s = n_steps / dt_wall

    print(
        json.dumps(
            {
                "metric": "bbm_momentum_cell_substeps_per_s_per_chip",
                "value": round(cell_substeps_per_s, 1),
                "unit": "cell-substeps/s",
                "vs_baseline": round(
                    cell_substeps_per_s / REFERENCE_ANCHOR_CELL_SUBSTEPS_PER_S, 3
                ),
                "detail": {
                    "grid": f"{nx}x{ny}@10km",
                    "substeps": substeps,
                    "steps_per_s": round(steps_per_s, 3),
                    "model_s_per_wall_s": round(steps_per_s * 200.0, 1),
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
