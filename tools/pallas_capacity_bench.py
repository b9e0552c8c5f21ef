"""Race tpu.substep_kernel=xla vs =pallas past the single-chip HBM cliff.

The BASELINE.md capacity sweep found the momentum loop leaves the
cache-resident regime between 896^2 and 1216^2 cells on one v5e: per-cell
substep cost jumps ~2.7x as every substep starts streaming the plane working
set from HBM. The blocked Pallas kernel (ops/momentum_pallas.py) amortizes
that traffic by group_substeps. This tool measures both paths on the real
chip at those sizes, sweeps the kernel tile, and checks on-chip agreement
(bitwise over the pre-failure horizon, statistical beyond — see
tests/test_momentum_pallas.py for why Mosaic/XLA codegen ULPs preclude
long-horizon bit-equality).

Run from the repo root:  python tools/pallas_capacity_bench.py [--sizes 1216]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nextsim_tpu.config import Config
from nextsim_tpu.forcing.providers import ConstantForcing
from nextsim_tpu.grid.grid import Grid
from nextsim_tpu.model import init_state, params
from nextsim_tpu.ops import momentum


def make_setup(n: int, substeps: int = 120, dx: float = 10e3):
    cfg = Config(
        overrides={
            "grid.nx": n,
            "grid.ny": n,
            "grid.resolution": dx,
            "ideal_simul.constant_wind_u": 10.0,
            "ideal_simul.constant_wind_v": -3.0,
            "setup.atmosphere-type": "constant",
            "setup.dynamics-type": "bbm",
            "dynamics.substeps": substeps,
            "thermo.use_thermo_forcing": False,
            "simul.spinup_duration": 0.0,
        }
    )
    grid = Grid.square(nx=n, ny=n, dx=dx)
    state = init_state.init_state(cfg, grid)
    forcing = ConstantForcing(cfg, grid)(0.0, 0.0)
    dyn = params.dyn_params(cfg, dx, n_cells=n * n)
    node_lat, _ = grid.node_latlon()
    c_fix, c_alea = params.cohesion_params(cfg, dx)
    ga = {
        "mask": jnp.asarray(grid.mask),
        "open_mask": jnp.asarray(grid.open_mask),
        "node_mask": jnp.asarray(grid.node_mask),
        "node_dirichlet": jnp.asarray(grid.node_dirichlet),
        "node_lat": jnp.asarray(node_lat, jnp.float32),
        "delta_x": dx,
        "cohesion": c_fix + c_alea * state.random_number,
    }
    return state, forcing, dyn, ga


def timed(fn, state, reps: int) -> float:
    out = fn(state)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def e2e(n: int, kernel: str, tile: str, n_steps: int, reps: int) -> float:
    """Full-Simulator chunked step timing (the BASELINE.md capacity-sweep
    configuration: arctic preset, tpu.steps_per_call=10, thermo off) — the
    honest end-to-end number where the substep loop competes with the whole
    program's HBM working set."""
    from nextsim_tpu.model.simulator import Simulator

    b, k, u = (int(x) for x in tile.split("x"))
    dx = 10e3 * 464 / n  # keep the pan-Arctic footprint
    cfg = Config(
        overrides={
            "grid.preset": "arctic",
            "grid.nx": n,
            "grid.ny": n,
            "grid.resolution": dx,
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
    cfg.set("tpu.substep_kernel", kernel)
    cfg.set("tpu.pallas_block_rows", b)
    cfg.set("tpu.pallas_group_substeps", k)
    cfg.set("tpu.pallas_unroll", u)
    sim = Simulator(cfg)
    kk = sim._chunk_k
    forcing = sim.forcing_provider(sim.current_time, sim.time_init)
    tinfo = sim.time_info()
    f_rest = jax.tree.map(lambda *xs: jnp.stack(xs), *([forcing] * (kk - 1)))
    ti_rest = jax.tree.map(lambda *xs: jnp.stack(xs), *([tinfo] * (kk - 1)))
    chunk = sim._build_chunk_fn(kk)
    state, *_ = chunk(sim.state, forcing, f_rest, tinfo, ti_rest)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps // kk):
            state, *_ = chunk(state, forcing, f_rest, tinfo, ti_rest)
        jax.block_until_ready(state)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1216])
    ap.add_argument("--substeps", type=int, default=120)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--steps-per-call", type=int, default=5,
        help="fuse N momentum steps per device call so the remote-tunnel "
        "dispatch latency (~tens of ms) cannot dominate the window",
    )
    ap.add_argument(
        "--tiles", type=str, nargs="+",
        default=["128x8x1", "256x8x1", "256x16x1", "512x8x1", "256x8x2"],
        help="pallas tiles as BLOCK_ROWSxGROUP_SUBSTEPSxUNROLL",
    )
    ap.add_argument(
        "--e2e", action="store_true",
        help="race the kernels through the full Simulator chunk program "
        "(BASELINE capacity-sweep config) instead of the isolated solve",
    )
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}  backend: {jax.default_backend()}")

    if args.e2e:
        for n in args.sizes:
            t_xla = e2e(n, "xla", "256x16x1", 30, args.reps)
            print(json.dumps({
                "grid": f"{n}x{n}", "path": "xla", "e2e_ms_per_step":
                round(t_xla * 1e3, 3), "vs_xla": 1.0,
            }))
            for tile in args.tiles:
                t = e2e(n, "pallas", tile, 30, args.reps)
                print(json.dumps({
                    "grid": f"{n}x{n}", "path": "pallas", "tile": tile,
                    "e2e_ms_per_step": round(t * 1e3, 3),
                    "vs_xla": round(t_xla / t, 3),
                }))
        return

    for n in args.sizes:
        state, forcing, dyn, ga = make_setup(n, substeps=args.substeps)
        cells = n * n

        spc = args.steps_per_call

        def run_with(dp):
            def one(s):
                return momentum.explicit_solve(s, forcing, ga, 200.0, dp)[0]

            f = jax.jit(lambda s: jax.lax.fori_loop(0, spc, lambda i, c: one(c), s))
            return timed(f, state, args.reps) / spc

        rows = []
        t_xla = run_with(dataclasses.replace(dyn, substep_kernel="xla"))
        rows.append(("xla", f"unroll={dyn.substep_unroll}", t_xla))
        for tile in args.tiles:
            b, k, u = (int(x) for x in tile.split("x"))
            try:
                t = run_with(dataclasses.replace(
                    dyn, substep_kernel="pallas", pallas_block_rows=b,
                    pallas_group_substeps=k, pallas_unroll=u,
                ))
            except Exception as e:  # VMEM overflow etc. — report and move on
                print(json.dumps({"grid": n, "tile": tile, "error": str(e)[:200]}))
                continue
            rows.append(("pallas", tile, t))
        for kind, detail, t in rows:
            print(json.dumps({
                "grid": f"{n}x{n}", "path": kind, "tile": detail,
                "ms_per_step": round(t * 1e3, 3),
                "us_per_substep": round(t * 1e6 / args.substeps, 3),
                "ns_per_cell_substep": round(t * 1e9 / args.substeps / cells, 4),
                "vs_xla": round(t_xla / t, 3),
            }))

        # --- on-chip agreement: short-horizon pointwise, long-horizon stats.
        # Mosaic and XLA contract FMAs differently; the BBM failure branch
        # amplifies those ULPs once damage starts growing, so the long
        # horizon is held to statistics (tests/test_momentum_pallas.py).
        agreement = {"grid": f"{n}x{n}", "agreement": {}}
        for substeps, tag in ((1, "substep1"), (120, "substeps120")):
            sA, fA, dA, gA = make_setup(min(n, 464), substeps=substeps)
            ref, _ = jax.jit(lambda s: momentum.explicit_solve(
                s, fA, gA, 200.0,
                dataclasses.replace(dA, substep_kernel="xla")))(sA)
            out, _ = jax.jit(lambda s: momentum.explicit_solve(
                s, fA, gA, 200.0,
                dataclasses.replace(dA, substep_kernel="pallas",
                                    pallas_block_rows=128)))(sA)
            ur, uo = np.asarray(ref.vt_u), np.asarray(out.vt_u)
            agreement["agreement"][tag] = {
                "max_abs_u_diff": float(np.abs(ur - uo).max()),
                "frac_u_differing": round(float((ur != uo).mean()), 4),
                "mean_abs_u_ratio": round(
                    float(np.abs(uo).mean() / max(np.abs(ur).mean(), 1e-30)), 6
                ),
                "damage_mean_diff": round(float(
                    np.asarray(out.damage).mean() - np.asarray(ref.damage).mean()
                ), 8),
                "finite": bool(np.isfinite(uo).all()),
            }
        print(json.dumps(agreement))


if __name__ == "__main__":
    main()
