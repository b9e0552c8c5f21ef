"""Micro-benchmark: blocked Pallas substep kernel vs the XLA fori_loop path.

Runs the full explicit_solve (120 BBM substeps + OW smoother) at pan-Arctic
size on the attached accelerator and reports cell-substeps/s for both paths
plus their max relative deviation. Usage:

    python tools/bench_blocked.py [ny nx [substeps [B K]]]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_problem(ny, nx, seed=0):
    import jax.numpy as jnp

    from nextsim_tpu.core.state import State
    from nextsim_tpu.forcing.base import Forcing

    rng = np.random.default_rng(seed)
    dx = 10000.0
    mask = np.ones((ny, nx), np.float32)
    # carve some "land": a border plus a blob, ~1/3 of the domain
    mask[: ny // 6, :] = 0
    mask[:, : nx // 8] = 0
    yy, xx = np.mgrid[0:ny, 0:nx]
    mask[((yy - 0.7 * ny) ** 2 + (xx - 0.75 * nx) ** 2) < (0.22 * ny) ** 2] = 0

    grid = types.SimpleNamespace(shape=(ny, nx))
    state = State.zeros(grid).replace(
        conc=jnp.array((rng.uniform(0.2, 1.0, (ny, nx)) * mask).astype(np.float32)),
        thick=jnp.array((rng.uniform(0.1, 2.0, (ny, nx)) * mask).astype(np.float32)),
        damage=jnp.array((rng.uniform(0, 0.5, (ny, nx)) * mask).astype(np.float32)),
        sigma=jnp.array(rng.normal(0, 100, (3, ny, nx)).astype(np.float32)),
        vt_u=jnp.array(rng.normal(0, 0.1, (ny + 1, nx + 1)).astype(np.float32)),
        vt_v=jnp.array(rng.normal(0, 0.1, (ny + 1, nx + 1)).astype(np.float32)),
    )

    cellz = jnp.zeros((ny, nx), jnp.float32)
    forcing = Forcing(
        wind_u=jnp.full((ny + 1, nx + 1), 10.0, jnp.float32),
        wind_v=jnp.full((ny + 1, nx + 1), -3.0, jnp.float32),
        ocean_u=jnp.full((ny + 1, nx + 1), 0.05, jnp.float32),
        ocean_v=jnp.full((ny + 1, nx + 1), 0.02, jnp.float32),
        ssh=jnp.zeros((ny + 1, nx + 1), jnp.float32),
        tair=cellz, dair=None, sphuma=None, mixrat=None, mslp=cellz,
        qsw_in=cellz, qlw_in=None, tcc=None, precip=cellz, snowfr=None,
        snowfall=None, ocean_temp=cellz, ocean_salt=cellz, mld=None,
        qdw=None, fdw=None,
        depth=jnp.full((ny, nx), 50.0, jnp.float32),
        tau_wi_u=None, tau_wi_v=None, wlbk=None,
    )
    node_mask = np.zeros((ny + 1, nx + 1), np.float32)
    node_mask[:-1, :-1] = np.maximum(node_mask[:-1, :-1], mask)
    node_mask[1:, :-1] = np.maximum(node_mask[1:, :-1], mask)
    node_mask[:-1, 1:] = np.maximum(node_mask[:-1, 1:], mask)
    node_mask[1:, 1:] = np.maximum(node_mask[1:, 1:], mask)
    node_dirichlet = np.zeros((ny + 1, nx + 1), np.float32)
    node_dirichlet[0, :] = 1
    node_dirichlet[-1, :] = 1
    node_dirichlet[:, 0] = 1
    node_dirichlet[:, -1] = 1
    grid_arrays = dict(
        mask=jnp.array(mask),
        node_mask=jnp.array(node_mask),
        node_dirichlet=jnp.array(node_dirichlet),
        node_lat=jnp.full((ny + 1, nx + 1), 80.0, jnp.float32),
        delta_x=jnp.float32(dx),
        cell_area=jnp.float32(dx * dx),
        cohesion=jnp.full((ny, nx), 4000.0, jnp.float32),
    )
    return state, forcing, grid_arrays, mask


def main():
    import jax

    from nextsim_tpu.ops import momentum
    from nextsim_tpu.ops.momentum import DynParams

    args = sys.argv[1:]
    ny = int(args[0]) if args else 608
    nx = int(args[1]) if len(args) > 1 else ny
    substeps = int(args[2]) if len(args) > 2 else 120
    B = int(args[3]) if len(args) > 3 else 64
    K = int(args[4]) if len(args) > 4 else 12

    import nextsim_tpu.ops.momentum_pallas as mp
    import nextsim_tpu.ops.momentum_pallas_blocked as mb
    import functools

    mb_orig = mb.substep_loop_blocked
    mb.substep_loop_blocked = functools.partial(mb_orig, block_rows=B, group_substeps=K)
    fits_orig = mp.fits_vmem
    mp.fits_vmem = lambda *a, **kw: False  # force the blocked path

    state, forcing, grid_arrays, mask = build_problem(ny, nx)
    dt = 200.0
    p_x = DynParams(dynamics_type="bbm", substeps=substeps)
    p_b = dataclasses.replace(p_x, use_pallas=True)

    def run(p):
        fn = jax.jit(
            lambda s: momentum.explicit_solve(s, forcing, grid_arrays, dt, p)[0]
        )
        out = fn(state)
        jax.block_until_ready(out.vt_u)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(state)
        jax.block_until_ready(out.vt_u)
        dt_wall = (time.perf_counter() - t0) / n
        return out, dt_wall

    out_x, t_x = run(p_x)
    out_b, t_b = run(p_b)

    cells = ny * nx
    ocean = int(mask.sum())
    print(f"device: {jax.devices()[0]}  grid {ny}x{nx}  substeps {substeps}  B={B} K={K}")
    for name, t in (("xla", t_x), ("blocked", t_b)):
        print(
            f"{name:8s} {t*1e3:8.2f} ms/step  "
            f"raw {cells*substeps/t:.3e}  ocean {ocean*substeps/t:.3e} cell-substeps/s"
        )
    for f in ("vt_u", "vt_v", "damage"):
        a = np.asarray(getattr(out_x, f))
        b = np.asarray(getattr(out_b, f))
        print(f"rel err {f}: {np.max(np.abs(a-b))/(np.max(np.abs(a))+1e-30):.2e}")
    a = np.asarray(out_x.sigma)
    b = np.asarray(out_b.sigma)
    print(f"rel err sigma: {np.max(np.abs(a-b))/(np.max(np.abs(a))+1e-30):.2e}")

    mp.fits_vmem = fits_orig
    mb.substep_loop_blocked = mb_orig


if __name__ == "__main__":
    main()
