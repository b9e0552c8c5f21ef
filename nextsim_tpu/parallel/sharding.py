"""Multi-chip domain decomposition via jax.sharding.

The reference scales by METIS-partitioning the unstructured mesh and doing
point-to-point ghost exchange every dynamics substep (reference:
core/src/gmshmeshseq.cpp:414-532; updateGhosts fe.cpp:13963-14105). Here the
domain is a structured grid, so the decomposition is a static 2-D block
layout over a `Mesh(('y','x'))` of devices: every state leaf is annotated
with a NamedSharding and the jitted step is partitioned by GSPMD, which
inserts the halo collective-permutes for the shifted stencil reads
automatically — the halo exchange *is* the compiler's job here, overlapped
with compute by the XLA scheduler over ICI.

A hand-written shard_map + Pallas remote-DMA path exists for the hot substep
loop in nextsim_tpu/parallel/halo.py for when explicit scheduling beats
GSPMD.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(shape: Tuple[int, int] | None = None, devices=None) -> Mesh:
    """Create a ('y','x') device mesh. shape=(dpy,dpx); default: all devices
    in a near-square factorisation."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        dpy = int(np.floor(np.sqrt(n)))
        while n % dpy:
            dpy -= 1
        shape = (dpy, n // dpy)
    assert shape[0] * shape[1] == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, ("y", "x"))


def leaf_spec(leaf, mesh: Mesh | None = None) -> P:
    """PartitionSpec for a state/forcing leaf by rank: trailing two dims are
    (y, x) grid dims; leading dims (components) replicated.

    Node-staggered arrays are (ny+1, nx+1), which jax's explicit-sharding
    path cannot split evenly, so any leaf whose trailing dims are not
    divisible by the mesh shape is replicated at the jit boundary; GSPMD
    still computes them shard-wise internally (it pads uneven intermediates),
    so only the small boundary transfer is paid.

    VERIFIED (round 2, parallel/partition_check.py +
    tests/test_parallel.py::test_substep_loop_is_partitioned): on the
    8-device (2,4) CPU mesh at 64^2/120 substeps the compiled substep
    while-loop carries have LOCAL shapes — f32[33,17] for (65,65) node
    fields, f32[32,16] for (64,64) cell fields — with collective-permute
    halos inside the loop body. The boundary replication costs one
    all-gather of the node leaves per device call, amortised across
    tpu.steps_per_call fused steps.
    """
    if leaf is None:
        return P()
    nd = getattr(leaf, "ndim", 0)
    if nd >= 2:
        if mesh is not None:
            dpy, dpx = mesh.devices.shape
            ny, nx = leaf.shape[-2], leaf.shape[-1]
            if ny % dpy or nx % dpx:
                return P()
        return P(*([None] * (nd - 2) + ["y", "x"]))
    return P()


def tree_shardings(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, leaf_spec(leaf, mesh)), tree
    )


def shard_tree(tree, mesh: Mesh):
    shardings = tree_shardings(tree, mesh)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), tree, shardings
    )


def shard_state_and_grid(state, grid_arrays: Dict, mesh: Mesh):
    state = shard_tree(state, mesh)
    out = {}
    for k, v in grid_arrays.items():
        if hasattr(v, "ndim") and v.ndim >= 2:
            out[k] = jax.device_put(v, NamedSharding(mesh, leaf_spec(v, mesh)))
        else:
            out[k] = v
    return state, out
