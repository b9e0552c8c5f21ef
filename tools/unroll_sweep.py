"""Sweep tpu.substep_unroll on the bench domain (real TPU).

Re-validates the unroll=4 choice recorded in DynParams.substep_unroll
(ops/momentum.py). Run from the repo root:  python tools/unroll_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator


def measure(unroll: int, n_steps: int = 30, reps: int = 5) -> float:
    cfg = Config(
        overrides={
            "grid.preset": "arctic",
            "grid.nx": 464,
            "grid.ny": 464,
            "grid.resolution": 10e3,
            "simul.timestep": 200,
            "simul.time_init": "2015-10-16 00:00:00",
            "dynamics.substeps": 120,
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
    cfg.set("tpu.steps_per_call", 10)
    cfg.set("tpu.substep_unroll", unroll)
    sim = Simulator(cfg)
    k = sim._chunk_k
    forcing = sim.forcing_provider(sim.current_time, sim.time_init)
    tinfo = sim.time_info()
    f_rest = jax.tree.map(lambda *xs: jnp.stack(xs), *([forcing] * (k - 1)))
    ti_rest = jax.tree.map(lambda *xs: jnp.stack(xs), *([tinfo] * (k - 1)))
    chunk = sim._build_chunk_fn(k)
    state, *_ = chunk(sim.state, forcing, f_rest, tinfo, ti_rest)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps // k):
            state, *_ = chunk(state, forcing, f_rest, tinfo, ti_rest)
        jax.block_until_ready(state)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best


if __name__ == "__main__":
    for unroll in (2, 4, 6, 8, 12):
        ms = measure(unroll) * 1e3
        print(f"unroll={unroll:3d}  {ms:7.3f} ms/step  {ms*1e3/120:6.2f} us/substep",
              flush=True)
