"""Hand-scheduled multi-chip substep loop: shard_map over seam blocks.

The default multi-chip schedule (parallel/sharding.py) is GSPMD: XLA inserts
the halo collective-permutes for the stencils' shifted reads. This module is
the *explicit* schedule — the structured-grid equivalent of the reference's
per-substep MPI ghost exchange (FiniteElement::updateGhosts,
model/finiteelement.cpp:13963-14105, called from the momentum hot loop at
fe.cpp:10534): the substep loop runs inside `shard_map`, each device owns one
block, and exactly one ppermute ring exchange of the two velocity planes per
substep moves data — everything else is shard-local.

Layout. With a ('y','x') device mesh of shape (dpy, dpx) and global cells
(ny, nx) (mesh-divisible; the Simulator enforces this), device (a, b) holds

* an *ext node block* of shape (By+3, Bx+3), By = ny//dpy: rows are global
  node rows a*By-1 .. a*By+By+1 — one ring row each side of the owned range
  a*By .. a*By+By. Seam rows (a*By) are OWNED BY BOTH adjacent devices and
  computed redundantly with bit-identical inputs, so no reconciliation is
  ever needed (the reference instead sums partial FE assemblies across the
  ghost ring; on a structured grid redundant compute is cheaper than the
  extra message).
* an *ext cell block* of shape (By+2, Bx+2): global cell rows a*By-1 ..
  a*By+By. The ring cells are recomputed locally each substep from the
  exchanged velocity ring (their inputs equal the neighbour's interior
  inputs, so carried ring stress/damage stay consistent without ever being
  sent).

Per substep: exchange vt_u, vt_v rings -> strain on all ext cells -> rheology
on all ext cells -> stress divergence + node solve on the ext node block. Ring
node values written by the solve are garbage (their stress-divergence stencil
is incomplete) but are overwritten by the next exchange before any read; ring
values beyond the global domain are zero-filled at layout construction and
are annihilated by volume=0 / conc=0 on out-of-domain cells (same invariant
as parallel/halo.py: the outermost global cells are land).

Equivalence with the GSPMD path is pinned by
tests/test_parallel.py (sharded-vs-single and shard_map-vs-gspmd).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from nextsim_tpu.parallel.halo import _shift_from


# ---------------------------------------------------------------------------
# layout conversion (host-computed gather indices; traced once per jit)
# ---------------------------------------------------------------------------

def _ext_idx_cells(d: int, B: int) -> np.ndarray:
    """Row indices into the 1-padded global cell array for the stacked ext
    cell blocks: block a covers padded rows a*B .. a*B+B+1."""
    return np.concatenate([a * B + np.arange(B + 2) for a in range(d)])


def _ext_idx_nodes(d: int, B: int) -> np.ndarray:
    """Row indices into the 1-padded global node array for the stacked ext
    node blocks: block a covers padded rows a*B .. a*B+B+2."""
    return np.concatenate([a * B + np.arange(B + 3) for a in range(d)])


def _own_idx_cells(d: int, B: int, n: int) -> np.ndarray:
    """Inverse: for each global cell row, its position in the stacked ext
    layout (owning block a = j//B, local offset +1 for the ring)."""
    j = np.arange(n)
    a = j // B
    return a * (B + 2) + (j - a * B) + 1


def _own_idx_nodes(d: int, B: int, n: int) -> np.ndarray:
    """Inverse for node rows; the seam row a*B is read from the lower owner
    (both owners hold identical values by construction)."""
    r = np.arange(n)
    a = np.minimum(r // B, d - 1)
    return a * (B + 3) + (r - a * B) + 1


def to_ext_cells(g, dpy: int, dpx: int, By: int, Bx: int):
    """Global (ny, nx) cell plane -> stacked ext blocks
    (dpy*(By+2), dpx*(Bx+2)), out-of-domain ring zero-filled."""
    gp = jnp.pad(g, ((1, 1), (1, 1)))
    return gp[_ext_idx_cells(dpy, By)[:, None], _ext_idx_cells(dpx, Bx)[None, :]]


def to_ext_nodes(g, dpy: int, dpx: int, By: int, Bx: int):
    """Global (ny+1, nx+1) node plane -> stacked ext blocks
    (dpy*(By+3), dpx*(Bx+3)), out-of-domain ring zero-filled."""
    gp = jnp.pad(g, ((1, 1), (1, 1)))
    return gp[_ext_idx_nodes(dpy, By)[:, None], _ext_idx_nodes(dpx, Bx)[None, :]]


def from_ext_cells(e, dpy: int, dpx: int, By: int, Bx: int, ny: int, nx: int):
    return e[_own_idx_cells(dpy, By, ny)[:, None], _own_idx_cells(dpx, Bx, nx)[None, :]]


def from_ext_nodes(e, dpy: int, dpx: int, By: int, Bx: int, ny: int, nx: int):
    return e[
        _own_idx_nodes(dpy, By, ny + 1)[:, None],
        _own_idx_nodes(dpx, Bx, nx + 1)[None, :],
    ]


# ---------------------------------------------------------------------------
# per-substep ring exchange (inside shard_map)
# ---------------------------------------------------------------------------

def exchange_seam_ring(ext, axes=("y", "x")):
    """Refresh the 1-wide ring of a seam-overlapped ext node block.

    The seam row duplicates the neighbour's edge row, so the strips differ
    from parallel/halo.exchange_halo: ring row 0 (global a*B-1) is the south
    neighbour's interior row B-1 = its ext index B (== -3); ring row B+2 is
    the north neighbour's interior row 1 = its ext index 2. y before x so the
    x-pass payload carries refreshed y-rings and corners get the diagonal
    neighbour's value in two hops (reference updateGhosts moves the same
    per-substep velocity ghost ring, fe.cpp:13963-14105)."""
    y_axis, x_axis = axes
    from_south = _shift_from(ext[-3:-2, :], y_axis, reverse=False)
    from_north = _shift_from(ext[2:3, :], y_axis, reverse=True)
    ext = ext.at[0:1, :].set(from_south)
    ext = ext.at[-1:, :].set(from_north)
    from_west = _shift_from(ext[:, -3:-2], x_axis, reverse=False)
    from_east = _shift_from(ext[:, 2:3], x_axis, reverse=True)
    ext = ext.at[:, 0:1].set(from_west)
    ext = ext.at[:, -1:].set(from_east)
    return ext


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------

def substep_loop(mesh, p, dyn_type, dte, dt, dx, consts, carry, steps):
    """Run the momentum substep loop hand-scheduled over `mesh`.

    `consts` / `carry` are the global-layout planes from
    ops/momentum.explicit_solve (carry order: vt_u, vt_v, ut_u, ut_v, sxx,
    syy, sxy, damage — first four node planes, last four cell planes).
    Returns the carry in global layout. The physics body is the same
    _build_substep the GSPMD path runs — one source of truth."""
    from jax import shard_map

    from nextsim_tpu.ops.momentum import _build_substep

    dpy, dpx = mesh.devices.shape
    ny, nx = consts.conc.shape[-2:]
    By, Bx = ny // dpy, nx // dpx
    assert By * dpy == ny and Bx * dpx == nx, (consts.conc.shape, mesh.devices.shape)

    node_shape = (ny + 1, nx + 1)

    def to_ext(v):
        if getattr(v, "ndim", 0) != 2:
            return v
        if v.shape == node_shape:
            return to_ext_nodes(v, dpy, dpx, By, Bx)
        return to_ext_cells(v, dpy, dpx, By, Bx)

    cdict = {k: v for k, v in vars(consts).items() if v is not None}
    none_keys = [k for k, v in vars(consts).items() if v is None]
    ext_consts = {k: to_ext(v) for k, v in cdict.items()}
    ext_carry = tuple(to_ext(v) for v in carry)

    def spec_of(v):
        return P("y", "x") if getattr(v, "ndim", 0) == 2 else P()

    in_specs = (
        tuple(spec_of(v) for v in ext_carry),
        {k: spec_of(v) for k, v in ext_consts.items()},
    )
    out_specs = tuple(spec_of(v) for v in ext_carry)

    def run(carry_l, consts_l):
        cl = SimpleNamespace(**consts_l, **{k: None for k in none_keys})
        body = _build_substep(p, dyn_type, dte, dt, dx, cl)

        def sub(_, cr):
            vt_u, vt_v, *rest = cr
            vt_u = exchange_seam_ring(vt_u)
            vt_v = exchange_seam_ring(vt_v)
            return body((vt_u, vt_v, *rest))

        return lax.fori_loop(0, steps, sub, carry_l, unroll=p.substep_unroll)

    out = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)(
        ext_carry, ext_consts
    )

    def from_ext(v, is_node):
        if is_node:
            return from_ext_nodes(v, dpy, dpx, By, Bx, ny, nx)
        return from_ext_cells(v, dpy, dpx, By, Bx, ny, nx)

    return tuple(from_ext(v, i < 4) for i, v in enumerate(out))
