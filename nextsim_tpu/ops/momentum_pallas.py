"""Blocked Pallas TPU kernel: K-substep-grouped momentum loop for big domains.

In the cache-resident regime (<~1M cells single chip) the explicit momentum
loop is VPU-compute-bound and XLA's streaming `fori_loop` wins (round-3
measurements; see the dispatch note in ops/momentum.py). Past the HBM cliff
(BASELINE.md capacity sweep: per-cell cost jumps ~2.7x between 896^2 and
1216^2) every substep streams the whole plane working set from HBM. This
kernel trades that traffic for redundant halo compute: the domain is split
into row strips, each strip is DMA'd into VMEM with a K-row halo on each
side, K substeps run entirely in VMEM, and only the valid interior rows are
written back. Because one substep's domain of dependence grows by exactly one
row (strain: node->cell is 1-wide; stress divergence: cell->node is 1-wide),
a K-row halo makes the interior of a K-substep group exact vs the global
computation — the same overlap-halo trade the reference makes spatially with
its per-substep MPI ghost exchange (model/finiteelement.cpp:13963-14105,
10534), traded here in *time* instead: HBM traffic drops by ~K while the
halo adds 2K/B redundant compute.

Implementation notes:
  * One `pl.pallas_call` runs the whole substep loop: grid
    (n_groups, n_blocks), sequential on the TensorCore. State lives in a
    double-buffered HBM array aliased input->output; group g reads slot
    g%2 and writes slot (g+1)%2 (Jacobi-style, so a block never reads
    rows its same-group neighbour already wrote).
  * All planes are padded to tile-aligned shape with *land-like* zeros
    (conc=0, volume=0, solve=0): the update rules then keep padded cells
    identically zero (sigma/damage zeroed by the has_ice mask, velocity
    frozen by the solve mask), so padding behaves exactly like the closed
    boundary the zero-fill stencil shifts of ops/stencil.py encode.
  * The physics body is SHARED with the XLA and shard_map paths: the kernel
    calls momentum._build_substep with a co-shaped stencil provider
    (strain_rates / stress_divergence re-expressed as zero-fill shifts with
    the exact same factored arithmetic, term order included) — one source
    of physics truth, with the blocking pinned bitwise across tile
    configurations (tests/test_momentum_pallas.py).
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: state planes carried through the loop (momentum.explicit_solve's carry)
_STATE_NAMES = ("vt_u", "vt_v", "ut_u", "ut_v", "sxx", "syy", "sxy", "damage")
_N_STATE = len(_STATE_NAMES)

#: loop-invariant coefficient planes read by _build_substep, per rheology.
#: 'cell'-shaped planes are (ny, nx), 'node' planes (ny+1, nx+1); both are
#: embedded co-shaped at the same (row K, col 0) origin of the padded block.
_CELL_PLANES = {
    "bbm": ("volume", "conc", "cohesion", "bbm_expC", "bbm_pmax",
            "bbm_heal", "bbm_rtd"),
    "evp": ("volume", "thick", "evp_P"),
    "mevp": ("volume", "thick", "evp_P"),
}
_NODE_PLANES = (
    "grad_ssh_u", "grad_ssh_v", "tau_ax", "tau_ay", "dte_over_mass_const",
    "beta_cor_const", "dom_cos", "dom_sin", "ocn_rot_x", "ocn_rot_y",
    "ocean_u", "ocean_v", "c_bu", "rlmass", "solve",
)
_MEVP_EXTRA = ("vtm_u", "vtm_v")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Co-shaped stencils: zero-fill shifts with ops/stencil.py's exact arithmetic
# ---------------------------------------------------------------------------

def _shift_up(a):
    """out[j, i] = a[j+1, i]; last row zero."""
    return jnp.concatenate([a[1:, :], jnp.zeros_like(a[:1, :])], axis=0)


def _shift_down(a):
    """out[j, i] = a[j-1, i]; first row zero."""
    return jnp.concatenate([jnp.zeros_like(a[:1, :]), a[:-1, :]], axis=0)


def _shift_left(a):
    """out[j, i] = a[j, i+1]; last column zero."""
    return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)


def _shift_right(a):
    """out[j, i] = a[j, i-1]; first column zero."""
    return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)


def _strain_rates_co(u, v, dx: float):
    """stencil.strain_rates on co-shaped planes. Cell (j,i) has corner nodes
    SW=(j,i), SE=(j,i+1), NW=(j+1,i), NE=(j+1,i+1); same factored diagonal
    differences, same term order."""
    r = 1.0 / (2.0 * dx)
    u_nw = _shift_up(u)
    u_se = _shift_left(u)
    u_ne = _shift_left(u_nw)
    v_nw = _shift_up(v)
    v_se = _shift_left(v)
    v_ne = _shift_left(v_nw)
    ua = u_ne - u
    ub = u_se - u_nw
    va = v_ne - v
    vb = v_se - v_nw
    dudx = (ua + ub) * r
    dudy = (ua - ub) * r
    dvdx = (va + vb) * r
    dvdy = (va - vb) * r
    return dudx, dvdy, 0.5 * (dudy + dvdx)


def _stress_divergence_co(sxx, syy, sxy, volume, dx: float):
    """stencil.stress_divergence on co-shaped planes: node (j,i) reads cells
    (j-1,i-1), (j-1,i), (j,i-1), (j,i), zero-filled outside; identical
    factored S/D form and term order."""
    r = 1.0 / (2.0 * dx)
    vsxy = volume * sxy

    def dxy_pair(f1, f2):
        s = f1 + f2
        d = f1 - f2
        return (
            _shift_right(_shift_down(s)) - _shift_down(d)
            + _shift_right(d) - s
        ) * r

    grad_u = dxy_pair(volume * sxx, vsxy)
    grad_v = dxy_pair(vsxy, volume * syy)
    return -grad_u, -grad_v


_CO_STENCIL = SimpleNamespace(
    strain_rates=_strain_rates_co, stress_divergence=_stress_divergence_co
)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(
    coeff_hbm, state_in_hbm, state_hbm,  # state_in aliased to state (output)
    coeff_vmem, state_vmem, sems,
    *,
    names, steps: int, group: int, block_rows: int,
    dte: float, dt: float, dx: float, dyn_type: str, p, unroll: int,
):
    from nextsim_tpu.ops import momentum

    del state_in_hbm  # aliased: all access goes through the output ref
    g = pl.program_id(0)
    i = pl.program_id(1)
    K = group
    B = block_rows
    R = B + 2 * K
    row0 = pl.multiple_of(i * B, 8)
    read_slot = lax.rem(g, 2)
    write_slot = lax.rem(g + 1, 2)

    read_coeff = pltpu.make_async_copy(
        coeff_hbm.at[:, pl.ds(row0, R), :], coeff_vmem, sems.at[0]
    )
    read_state = pltpu.make_async_copy(
        state_hbm.at[read_slot, :, pl.ds(row0, R), :], state_vmem, sems.at[1]
    )
    read_coeff.start()
    read_state.start()
    read_coeff.wait()
    read_state.wait()

    vals = {nm: coeff_vmem[k] for k, nm in enumerate(names)}
    vals["solve"] = vals["solve"] > 0.5
    fields = dict.fromkeys(
        ("conc", "thick", "cohesion", "time_relaxation_damage", "volume",
         "bbm_expC", "bbm_pmax", "bbm_heal", "bbm_rtd", "evp_P",
         "vtm_u", "vtm_v")
    )
    fields.update(vals)
    c = SimpleNamespace(**fields)

    body = momentum._build_substep(p, dyn_type, dte, dt, dx, c, st=_CO_STENCIL)

    # number of substeps this group runs; static when groups divide steps
    # (the production case: 120 % 8 == 0). Mosaic's fori_loop supports only
    # unroll=1 or full unroll, so any unroll>1 means "fully unroll the
    # group" — and a short last group (traced trip count) forces 1.
    if steps % group == 0:
        k_this = group
        if unroll != 1:
            unroll = group
    else:
        k_this = jnp.minimum(group, steps - g * group)
        unroll = 1
    init = tuple(state_vmem[k] for k in range(_N_STATE))
    out = lax.fori_loop(0, k_this, lambda _, cr: body(cr), init, unroll=unroll)

    for k in range(_N_STATE):
        state_vmem[k] = out[k]

    write = pltpu.make_async_copy(
        state_vmem.at[:, pl.ds(K, B), :],
        state_hbm.at[write_slot, :, pl.ds(row0 + K, B), :],
        sems.at[2],
    )
    write.start()
    write.wait()


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def _embed(a, shape, K, Rp, Cp, dtype):
    """Embed plane `a` (broadcast to `shape`) at row offset K / col 0 of a
    zero (Rp, Cp) plane — land-like padding (see module docstring)."""
    a = jnp.broadcast_to(jnp.asarray(a, dtype), shape)
    out = jnp.zeros((Rp, Cp), dtype)
    return lax.dynamic_update_slice(out, a, (K, 0))


def substep_loop_blocked(
    consts,
    carry,
    steps: int, dte: float, dt: float, dx: float, dyn_type: str, p,
    block_rows: int = 256,
    group_substeps: int = 8,
    unroll: int = 1,
    interpret: bool | None = None,
):
    """Run the substep loop with the blocked kernel.

    ``consts``/``carry`` are exactly what momentum.explicit_solve hands the
    XLA `fori_loop` path; returns the same carry tuple after ``steps``
    substeps (mEVP displacement handling stays with the caller).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vt_u = carry[0]
    ny1, nx1 = vt_u.shape
    ny, nx = ny1 - 1, nx1 - 1
    dtype = vt_u.dtype

    cell_names = _CELL_PLANES[dyn_type]
    node_names = _NODE_PLANES + (_MEVP_EXTRA if dyn_type == "mevp" else ())
    names = cell_names + node_names

    # Mosaic DMA offsets along the sublane dim must be divisible by the
    # (8, 128) f32 tile: keep the halo (= VMEM write offset) and the block
    # size multiples of 8.
    K = _round_up(max(1, min(group_substeps, steps)), 8)
    B = _round_up(min(block_rows, _round_up(ny1, 8)), 8)
    n_blocks = -(-ny1 // B)
    n_groups = -(-steps // K)
    Rp = n_blocks * B + 2 * K
    Cp = _round_up(nx1, 128)

    coeff = jnp.stack([
        _embed(
            getattr(consts, nm),
            (ny, nx) if nm in cell_names else (ny1, nx1),
            K, Rp, Cp, dtype,
        )
        for nm in names
    ])

    state_planes = [
        _embed(a, a.shape, K, Rp, Cp, dtype) for a in carry
    ]
    state = jnp.stack(state_planes)
    state = jnp.stack([state, state])  # double buffer: both slots start equal

    kernel = functools.partial(
        _kernel, names=names, steps=steps, group=K, block_rows=B,
        dte=dte, dt=dt, dx=dx, dyn_type=dyn_type, p=p, unroll=unroll,
    )
    R = B + 2 * K
    out = pl.pallas_call(
        kernel,
        grid=(n_groups, n_blocks),
        out_shape=jax.ShapeDtypeStruct(state.shape, dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((len(names), R, Cp), dtype),
            pltpu.VMEM((_N_STATE, R, Cp), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(coeff, state)

    final = out[n_groups % 2, :, K : K + ny1, :nx1]
    new = {nm: final[k] for k, nm in enumerate(_STATE_NAMES)}
    return (
        new["vt_u"], new["vt_v"], new["ut_u"], new["ut_v"],
        new["sxx"][:ny, :nx], new["syy"][:ny, :nx], new["sxy"][:ny, :nx],
        new["damage"][:ny, :nx],
    )
