"""Per-phase NaN bisection tool.

Replays a run from a restart checkpoint with the step split into its three
phases (thermo / momentum / transport), checking every state leaf for
non-finite values after each phase and reporting the first offending field,
cell and the local pre-phase state. Usage:

    python tools/nan_bisect.py <config overrides used for the run...> \
        restart.input_path=<dir> restart.basename=ckpt

The config is rebuilt from the same CLI override syntax as the main
entrypoint; the checkpoint grid must match.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from nextsim_tpu.config import Config
from nextsim_tpu.model.simulator import Simulator
from nextsim_tpu.output.restart import read_restart
from nextsim_tpu.ops import momentum, transport
from nextsim_tpu.ops import thermo as thermo_ops
import dataclasses

overrides = {}
for ov in sys.argv[1:]:
    k, _, v = ov.partition("=")
    overrides[k] = v
overrides.setdefault("restart.type", "continue")
overrides.setdefault("debugging.check_fields_fast", "false")
overrides.setdefault("tpu.donate_state", "false")
cfg = Config(overrides=overrides)
sim = Simulator(cfg)
read_restart(sim, basename=cfg["restart.basename"] or "ckpt")
print("resumed at pcpt", sim.pcpt, flush=True)


def first_bad(state, tag):
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        a = np.asarray(v)
        bad = ~np.isfinite(a)
        if bad.any():
            idx = tuple(int(x) for x in np.argwhere(bad)[0])
            print(f"[{tag}] first non-finite: {f.name} at {idx}; count={bad.sum()}")
            return f.name, idx
    return None


import jax

for k in range(80):
    forcing = sim.forcing_provider(sim.current_time + sim.dt / 86400.0, sim.time_init)
    tinfo = sim.time_info()
    ga = dict(sim.grid_arrays)
    ga["cohesion"] = sim.c_fix + sim.c_alea * sim.state.random_number

    s1, tdiag = thermo_ops.thermo_step(sim.state, forcing, ga, sim.dt,
                                       cfg_params=sim._thermo_params, tinfo=tinfo)
    hit = first_bad(s1, f"step{sim.pcpt} thermo")
    if hit:
        name, idx = hit
        j, i = idx[-2], idx[-1]
        print("pre-thermo local state at", (j, i))
        for fld in ("conc", "thick", "snow_thick", "conc_young", "h_young",
                    "hs_young", "sst", "sss", "tsurf_young"):
            print(" ", fld, float(np.asarray(getattr(sim.state, fld))[j, i]))
        t = np.asarray(sim.state.tice)[:, j, i]
        print("  tice", t)
        break

    s2, mdiag = momentum.explicit_solve(s1, forcing, ga, sim.dt, sim.dyn)
    hit = first_bad(s2, f"step{sim.pcpt} momentum")
    if hit:
        name, idx = hit
        j, i = idx[-2], idx[-1]
        print("post-thermo local state at", (j, i), "and neighbors")
        for fld in ("conc", "thick", "conc_young", "h_young", "damage"):
            a = np.asarray(getattr(s1, fld))
            print(" ", fld, a[max(0,j-1):j+2, max(0,i-1):i+2])
        print("  sigma", np.asarray(s1.sigma)[:, j, i])
        break

    s3, vdiag = transport.transport_and_ridge(s2, ga, sim.dt, sim._transport_params)
    hit = first_bad(s3, f"step{sim.pcpt} transport")
    if hit:
        break

    sim.state = s3
    sim.pcpt += 1
    if k % 10 == 0:
        print("clean step", sim.pcpt, flush=True)
else:
    print("no NaN in 80 replayed steps")
