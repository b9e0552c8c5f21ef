"""Hand-scheduled multi-chip substep loop: shard_map over seam blocks.

The default multi-chip schedule (parallel/sharding.py) is GSPMD: XLA inserts
the halo collective-permutes for the stencils' shifted reads. This module is
the *explicit* schedule — the structured-grid equivalent of the reference's
per-substep MPI ghost exchange (FiniteElement::updateGhosts,
model/finiteelement.cpp:13963-14105, called from the momentum hot loop at
fe.cpp:10534): the substep loop runs inside `shard_map`, each device owns one
block, and explicit ppermute ring exchanges of the two velocity planes move
data — everything else is shard-local.

Layout. With a ('y','x') device mesh of shape (dpy, dpx), global cells
(ny, nx) (mesh-divisible; the Simulator enforces this) and halo depth H,
device (a, b) holds

* an *ext node block* of shape (By+2H+1, Bx+2H+1), By = ny//dpy: global node
  rows a*By-H .. a*By+By+H — H ring rows each side of the owned range
  a*By .. a*By+By. Seam rows (a*By) are OWNED BY BOTH adjacent devices and
  computed redundantly with bit-identical inputs, so no reconciliation is
  ever needed (the reference instead sums partial FE assemblies across the
  ghost ring; on a structured grid redundant compute is cheaper than the
  extra message).
* an *ext cell block* of shape (By+2H, Bx+2H): global cell rows a*By-H ..
  a*By+By+H-1. Ring cells are recomputed locally each substep from the
  exchanged velocity rings (their inputs equal the neighbour's interior
  inputs, so carried ring stress/damage stay consistent without ever being
  sent).

Communication-avoiding depth (tpu.halo_depth = H > 1): one ring exchange
refreshes H layers, after which H substeps run with ZERO communication — the
correct-data frontier erodes inward exactly one node+cell layer per substep
(strain consumes a node layer, the stress-divergence/solve consumes a cell
layer), so after H substeps the owned region is still exact and the next
exchange resets the frontier. Redundant compute grows as ~2H/B per axis;
messages shrink by H. The classic latency trade for when ICI/DCN round-trips
dominate the per-substep critical path (the reference has no equivalent —
it pays one MPI exchange every substep, fe.cpp:10534).

Ring values beyond the global domain are zero-filled in the STATIC fields at
layout construction (conc=0, volume=0 there annihilate any wrapped velocity
garbage the periodic ppermute brings — same invariant as parallel/halo.py:
the outermost global cells are land), so no special-casing at mesh edges.

Equivalence with the GSPMD path and the single-device step is pinned by
tests/test_parallel.py for H=1 and H>1.

COST NOTE (layout conversion): substep_loop converts global -> ext layouts
on entry and back on exit EVERY dynamics step — two all-to-all-ish
reshuffles of the 8 carry planes plus one of each 2-D const plane per step
(the consts' gathers are loop-invariant inside one jit call but re-run per
step because the Simulator keeps the state in the global layout between
steps). At 120 substeps/step the amortised cost is 2/120 reshuffles per
exchange saved, which the CPU-mesh race absorbs easily — but on a real ICI
pod it could eat part of the schedule's advantage. If pod profiling shows
it on the critical path, the fix is to carry the ext layout across steps
in the Simulator (convert once at init, reconvert only for IO/outputs,
which are boundary events anyway). Blocked on pod access; re-measure with
tools/partition_mode_bench.py before changing the default.
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

def _ext_idx_cells(d: int, B: int, H: int) -> np.ndarray:
    """Row indices into the H-padded global cell array for the stacked ext
    cell blocks: block a covers global rows a*B-H .. a*B+B+H-1."""
    return np.concatenate([a * B + np.arange(B + 2 * H) for a in range(d)])


def _ext_idx_nodes(d: int, B: int, H: int) -> np.ndarray:
    """Row indices into the H-padded global node array for the stacked ext
    node blocks: block a covers global rows a*B-H .. a*B+B+H."""
    return np.concatenate([a * B + np.arange(B + 2 * H + 1) for a in range(d)])


def _own_idx_cells(d: int, B: int, H: int, n: int) -> np.ndarray:
    """Inverse: for each global cell row, its position in the stacked ext
    layout (owning block a = j//B, local offset +H for the ring)."""
    j = np.arange(n)
    a = j // B
    return a * (B + 2 * H) + (j - a * B) + H


def _own_idx_nodes(d: int, B: int, H: int, n: int) -> np.ndarray:
    """Inverse for node rows; the seam row a*B is read from the lower owner
    (both owners hold identical values by construction)."""
    r = np.arange(n)
    a = np.minimum(r // B, d - 1)
    return a * (B + 2 * H + 1) + (r - a * B) + H


def to_ext_cells(g, dpy: int, dpx: int, By: int, Bx: int, H: int = 1):
    """Global (ny, nx) cell plane -> stacked ext blocks
    (dpy*(By+2H), dpx*(Bx+2H)), out-of-domain ring zero-filled."""
    gp = jnp.pad(g, ((H, H), (H, H)))
    return gp[
        _ext_idx_cells(dpy, By, H)[:, None], _ext_idx_cells(dpx, Bx, H)[None, :]
    ]


def to_ext_nodes(g, dpy: int, dpx: int, By: int, Bx: int, H: int = 1):
    """Global (ny+1, nx+1) node plane -> stacked ext blocks
    (dpy*(By+2H+1), dpx*(Bx+2H+1)), out-of-domain ring zero-filled."""
    gp = jnp.pad(g, ((H, H), (H, H)))
    return gp[
        _ext_idx_nodes(dpy, By, H)[:, None], _ext_idx_nodes(dpx, Bx, H)[None, :]
    ]


def from_ext_cells(e, dpy, dpx, By, Bx, ny, nx, H: int = 1):
    return e[
        _own_idx_cells(dpy, By, H, ny)[:, None],
        _own_idx_cells(dpx, Bx, H, nx)[None, :],
    ]


def from_ext_nodes(e, dpy, dpx, By, Bx, ny, nx, H: int = 1):
    return e[
        _own_idx_nodes(dpy, By, H, ny + 1)[:, None],
        _own_idx_nodes(dpx, Bx, H, nx + 1)[None, :],
    ]


# ---------------------------------------------------------------------------
# ring exchange (inside shard_map)
# ---------------------------------------------------------------------------

def exchange_seam_ring(ext, B_y: int, B_x: int, H: int = 1, axes=("y", "x")):
    """Refresh the H-wide rings of a seam-overlapped ext node block.

    The seam row duplicates the neighbour's edge row, so the strips differ
    from parallel/halo.exchange_halo: the south ring (rows 0..H-1, global
    a*B-H..a*B-1) is the south neighbour's interior rows B-H..B-1 = its ext
    indices B..B+H-1; the north ring is the north neighbour's interior rows
    1..H = its ext indices H+1..2H. y before x so the x-pass payload carries
    refreshed y-rings and corners get the diagonal neighbour's value in two
    hops (reference updateGhosts moves the same velocity ghost ring,
    fe.cpp:13963-14105)."""
    y_axis, x_axis = axes
    from_south = _shift_from(ext[B_y : B_y + H, :], y_axis, reverse=False)
    from_north = _shift_from(ext[H + 1 : 2 * H + 1, :], y_axis, reverse=True)
    ext = ext.at[:H, :].set(from_south)
    ext = ext.at[-H:, :].set(from_north)
    from_west = _shift_from(ext[:, B_x : B_x + H], x_axis, reverse=False)
    from_east = _shift_from(ext[:, H + 1 : 2 * H + 1], x_axis, reverse=True)
    ext = ext.at[:, :H].set(from_west)
    ext = ext.at[:, -H:].set(from_east)
    return ext


def exchange_cell_ring(ext, B_y: int, B_x: int, H: int, axes=("y", "x")):
    """Refresh the H-wide rings of an ext CELL block (carried stress/damage).

    Needed only for halo_depth H>1: the vt exchange restores the velocity
    frontier, but a carried ring cell at depth k erodes after k substeps and
    is never recomputed correctly from local data — its value must come from
    the owner. Cell blocks are not seam-overlapped, so the strips differ
    from the node exchange: the south ring (global a*B-H..a*B-1) is the
    south neighbour's ext indices B..B+H-1; the north ring is the north
    neighbour's ext indices H..2H-1."""
    y_axis, x_axis = axes
    from_south = _shift_from(ext[B_y : B_y + H, :], y_axis, reverse=False)
    from_north = _shift_from(ext[H : 2 * H, :], y_axis, reverse=True)
    ext = ext.at[:H, :].set(from_south)
    ext = ext.at[-H:, :].set(from_north)
    from_west = _shift_from(ext[:, B_x : B_x + H], x_axis, reverse=False)
    from_east = _shift_from(ext[:, H : 2 * H], x_axis, reverse=True)
    ext = ext.at[:, :H].set(from_west)
    ext = ext.at[:, -H:].set(from_east)
    return ext


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------

def substep_loop(mesh, p, dyn_type, dte, dt, dx, consts, carry, steps,
                 halo_depth: int = 1):
    """Run the momentum substep loop hand-scheduled over `mesh`.

    `consts` / `carry` are the global-layout planes from
    ops/momentum.explicit_solve (carry order: vt_u, vt_v, ut_u, ut_v, sxx,
    syy, sxy, damage — first four node planes, last four cell planes).
    Returns the carry in global layout. The physics body is the same
    _build_substep the GSPMD path runs — one source of truth.

    ``halo_depth`` = substeps per exchange (communication-avoiding; must
    divide `steps` and stay well under the block size)."""
    from jax import shard_map

    from nextsim_tpu.ops.momentum import _build_substep

    H = int(halo_depth)
    dpy, dpx = mesh.devices.shape
    ny, nx = consts.conc.shape[-2:]
    By, Bx = ny // dpy, nx // dpx
    if By * dpy != ny or Bx * dpx != nx:
        raise ValueError(
            f"grid {ny}x{nx} is not divisible by the ({dpy},{dpx}) device "
            "mesh (the Simulator pads to divisibility; direct callers must "
            "pass mesh-divisible planes)"
        )
    if H < 1:
        raise ValueError(f"tpu.halo_depth={H} must be >= 1")
    if steps % H:
        raise ValueError(
            f"tpu.halo_depth={H} must divide dynamics.substeps={steps}"
        )
    if H >= min(By, Bx):
        raise ValueError(
            f"tpu.halo_depth={H} must be < the per-device block "
            f"({By}x{Bx} cells on the ({dpy},{dpx}) mesh)"
        )

    node_shape = (ny + 1, nx + 1)

    def to_ext(v):
        if getattr(v, "ndim", 0) != 2:
            return v
        if v.shape == node_shape:
            return to_ext_nodes(v, dpy, dpx, By, Bx, H)
        return to_ext_cells(v, dpy, dpx, By, Bx, H)

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

        def group(_, cr):
            vt_u, vt_v, ut_u, ut_v, sxx, syy, sxy, damage = cr
            vt_u = exchange_seam_ring(vt_u, By, Bx, H)
            vt_v = exchange_seam_ring(vt_v, By, Bx, H)
            if H > 1:
                # carried ring stress/damage at depth k erode after k
                # substeps; restore them from their owners each group (for
                # H=1 they stay exact by induction — skip the messages)
                sxx = exchange_cell_ring(sxx, By, Bx, H)
                syy = exchange_cell_ring(syy, By, Bx, H)
                sxy = exchange_cell_ring(sxy, By, Bx, H)
                damage = exchange_cell_ring(damage, By, Bx, H)
            cr = (vt_u, vt_v, ut_u, ut_v, sxx, syy, sxy, damage)
            # H communication-free substeps per exchange (compile-time
            # unrolled; the correct-data frontier erodes one layer each)
            for _ in range(H):
                cr = body(cr)
            return cr

        unroll = max(1, p.substep_unroll // H)
        return lax.fori_loop(0, steps // H, group, carry_l, unroll=unroll)

    out = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=out_specs)(
        ext_carry, ext_consts
    )

    def from_ext(v, is_node):
        if is_node:
            return from_ext_nodes(v, dpy, dpx, By, Bx, ny, nx, H)
        return from_ext_cells(v, dpy, dpx, By, Bx, ny, nx, H)

    return tuple(from_ext(v, i < 4) for i, v in enumerate(out))
