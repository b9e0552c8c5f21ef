"""Blocked Pallas TPU kernel: K-substep-grouped momentum loop for big domains.

The single-block kernel (ops/momentum_pallas.py) keeps the whole domain in
VMEM and only fits up to ~384x384 cells. This variant handles pan-Arctic
sizes: the domain is split into row strips, each strip is DMA'd into VMEM
with a K-row halo on each side, K substeps run entirely in VMEM, and only
the valid interior rows are written back to HBM. Because one substep's
domain of dependence grows by exactly one row (strain rate: node->cell is
1-wide; stress divergence: cell->node is 1-wide), a K-row halo makes the
interior of a K-substep group bit-exact vs the global computation — the
same overlap-halo trade the reference makes spatially with its per-substep
MPI ghost exchange (model/finiteelement.cpp:13963-14105,10534), traded here
in *time* instead: HBM traffic drops by ~K while the halo adds 2K/B
redundant compute.

Implementation notes:
  * One `pl.pallas_call` runs the whole substep loop: grid
    (n_groups, n_blocks), sequential on the TensorCore. State lives in a
    double-buffered HBM array aliased input->output; group g reads slot
    g%2 and writes slot (g+1)%2 (Jacobi-style, so a block never reads
    rows its same-group neighbour already wrote).
  * All planes are padded to lane-aligned width with *land-like* values
    (conc=0, solve=0): the update rules then keep padded cells identically
    zero (sigma/damage zeroed by the has_ice mask, velocity frozen by the
    solve mask), so padding behaves exactly like the reference's closed
    boundary and zero-fill stencil shifts match ops/stencil.py's jnp.pad
    semantics.
  * The physics is shared with the XLA path: the kernel body calls
    rheology.bbm_update_planes / vp_update_planes with precomputed
    loop-invariant planes; only the stencils are re-expressed as co-shaped
    zero-fill shifts (_strain_rates_co / _stress_div_co below, matching
    ops/stencil.py term-for-term).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextsim_tpu.core import constants as phys
from nextsim_tpu.ops import rheology

#: default rows of valid interior each block owns (multiple of 8: sublane tile)
DEFAULT_BLOCK_ROWS = 64
#: default substeps fused per VMEM residency (= halo rows per side; multiple
#: of 8 — Mosaic requires DMA sublane offsets divisible by the (8,128) tile)
DEFAULT_GROUP_SUBSTEPS = 16

_N_STATE = 8  # vt_u, vt_v, sxx, syy, sxy, damage, ut_du, ut_dv


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Co-shaped stencils (zero-fill shifts; same arithmetic as ops/stencil.py)
# ---------------------------------------------------------------------------

def _shift_up(a):
    """out[j, i] = a[j+1, i]; last row zero (reads the row above)."""
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
    """Cell strain rates on co-shaped planes: cell (j,i) has corner nodes
    SW=(j,i), SE=(j,i+1), NW=(j+1,i), NE=(j+1,i+1). Mirrors
    stencil.strain_rates term-for-term."""
    r = 1.0 / (2.0 * dx)
    u_n = _shift_up(u)        # NW corner
    u_e = _shift_left(u)      # SE corner
    u_ne = _shift_left(u_n)   # NE corner
    v_n = _shift_up(v)
    v_e = _shift_left(v)
    v_ne = _shift_left(v_n)
    ua = u_ne - u             # ne - sw
    ub = u_e - u_n            # se - nw
    va = v_ne - v
    vb = v_e - v_n
    dudx = (ua + ub) * r
    dudy = (ua - ub) * r
    dvdx = (va + vb) * r
    dvdy = (va - vb) * r
    return dudx, dvdy, 0.5 * (dudy + dvdx)


def _node_force_co(fx, fy, dx: float):
    """Co-shaped stencil.node_force: node (j,i) reads cells
    (j-1,i-1), (j-1,i), (j,i-1), (j,i) with zero outside."""
    r = 1.0 / (2.0 * dx)
    fx_d = _shift_down(fx)
    fy_d = _shift_down(fy)
    fx_r = _shift_right(fx)
    fy_r = _shift_right(fy)
    fx_dr = _shift_right(fx_d)
    fy_dr = _shift_right(fy_d)
    gx = (fx_dr - fx_d + fx_r - fx) * r
    gy = (fy_dr + fy_d - fy_r - fy) * r
    return gx, gy


def _stress_div_co(sxx, syy, sxy, volume, dx: float):
    """Co-shaped stencil.stress_divergence (sign per Danilov et al. 2015)."""
    gxx, gxy = _node_force_co(volume * sxx, volume * sxy, dx)
    gyx, gyy = _node_force_co(volume * sxy, volume * syy, dx)
    return -(gxx + gxy), -(gyx + gyy)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(
    coeff_hbm, state_in_hbm, state_hbm,  # state_in aliased to state (output)
    coeff_vmem, state_vmem, sems,
    *,
    steps: int, group: int, block_rows: int,
    dte: float, dt: float, dx: float, dyn_type: str, p,
):
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

    cos_ota = math.cos(math.radians(p.ocean_turning_angle_deg))

    if dyn_type == "bbm":
        (volume, conc, cohesion, pmax, heal, rtd, expC,
         dte_over_mass, beta_cor, rlmass, c_bu, tau_ax, tau_ay,
         ocean_u, ocean_v, gssh_u, gssh_v, solve_f, sin_ota,
         vtm_u, vtm_v) = (coeff_vmem[k] for k in range(21))
        P_evp = thick = None
    else:
        (volume, thick, P_evp,
         dte_over_mass, beta_cor, rlmass, c_bu, tau_ax, tau_ay,
         ocean_u, ocean_v, gssh_u, gssh_v, solve_f, sin_ota,
         vtm_u, vtm_v) = (coeff_vmem[k] for k in range(17))
        conc = cohesion = pmax = heal = rtd = expC = None
    solve = solve_f > 0.5

    # number of substeps this group runs (last group may be short)
    k_this = jnp.minimum(group, steps - g * group)

    def substep(_, carry):
        vt_u, vt_v, sxx, syy, sxy, damage, ut_du, ut_dv = carry
        eps11, eps22, eps12 = _strain_rates_co(vt_u, vt_v, dx)
        if dyn_type == "bbm":
            sxx, syy, sxy, damage = rheology.bbm_update_planes(
                sxx, syy, sxy, damage, conc, None, cohesion, None,
                eps11, eps22, eps12, None, dte, p.bbm,
                expC=expC, Pmax=pmax, heal_rate=heal, rtd_coef=rtd,
            )
        elif dyn_type == "evp":
            T = dt / 3.0
            sxx, syy, sxy = rheology.vp_update_planes(
                sxx, syy, sxy, None, thick, eps11, eps22, eps12,
                0.5 * dte / T, 0.5 * dte / T * p.evp.e * p.evp.e, p.evp,
                P=P_evp,
            )
        else:  # mevp
            ra = 1.0 / p.mevp_alpha
            sxx, syy, sxy = rheology.vp_update_planes(
                sxx, syy, sxy, None, thick, eps11, eps22, eps12,
                ra, ra, p.evp, P=P_evp,
            )

        gsu, gsv = _stress_div_co(sxx, syy, sxy, volume, dx)
        grad_u = gssh_u + gsu
        grad_v = gssh_v + gsv

        if dyn_type == "mevp":
            b_mevp = p.mevp_beta + 1.0
            delu = (vtm_u - vt_u) / b_mevp
            delv = (vtm_v - vt_v) / b_mevp
        else:
            delu = 0.0
            delv = 0.0

        uice, vice = vt_u, vt_v
        du = ocean_u - uice
        dv = ocean_v - vice
        c_prime = phys.rhow * p.quad_drag_coef_water * jnp.sqrt(du * du + dv * dv)
        tau_b = c_bu / (jnp.sqrt(uice * uice + vice * vice) + p.u0)
        alpha = 1.0 + dte_over_mass * (c_prime * cos_ota + tau_b)
        beta = beta_cor + dte_over_mass * c_prime * sin_ota
        rdenom = 1.0 / (alpha * alpha + beta * beta)
        tau_x = tau_ax + c_prime * (ocean_u * cos_ota - ocean_v * sin_ota)
        tau_y = tau_ay + c_prime * (ocean_v * cos_ota + ocean_u * sin_ota)
        grad_x = grad_u * rlmass
        grad_y = grad_v * rlmass

        new_u = (
            alpha * uice + beta * vice
            + dte_over_mass * (alpha * (grad_x + tau_x) + beta * (grad_y + tau_y))
            + alpha * delu + beta * delv
        ) * rdenom
        new_v = (
            alpha * vice - beta * uice
            + dte_over_mass * (alpha * (grad_y + tau_y) - beta * (grad_x + tau_x))
            + alpha * delv - beta * delu
        ) * rdenom

        vt_u = jnp.where(solve, new_u, vt_u)
        vt_v = jnp.where(solve, new_v, vt_v)
        if dyn_type != "mevp":
            ut_du = ut_du + dte * vt_u
            ut_dv = ut_dv + dte * vt_v
        return (vt_u, vt_v, sxx, syy, sxy, damage, ut_du, ut_dv)

    init = tuple(state_vmem[k] for k in range(_N_STATE))
    out = lax.fori_loop(0, k_this, substep, init)

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

def _pad_plane(a, rows_before, rows_total, cols_total, value=0.0):
    """Embed plane `a` at row offset rows_before in a (rows_total, cols_total)
    constant-filled plane."""
    ny, nx = a.shape
    out = jnp.full((rows_total, cols_total), value, a.dtype)
    return lax.dynamic_update_slice(out, a, (rows_before, 0))


def substep_loop_blocked(
    cell_inputs,
    node_inputs,
    vt_u, vt_v, sigma, damage,
    steps: int, dte: float, dt: float, dx: float, dyn_type: str, p,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    group_substeps: int = DEFAULT_GROUP_SUBSTEPS,
    interpret: bool = False,
):
    """Run the substep loop with the blocked kernel.

    Same contract as momentum_pallas.substep_loop_pallas: returns
    (vt_u, vt_v, sigma, damage, ut_du, ut_dv).
    """
    conc, thick, cohesion, trelax, mask = cell_inputs
    (node_mass, rlmass, c_bu, fcor, tau_ax, tau_ay,
     ocean_u, ocean_v, gssh_u, gssh_v, solve_f, sin_ota) = node_inputs

    ny1, nx1 = vt_u.shape
    dtype = vt_u.dtype
    # Mosaic DMA offsets along the sublane dim must be divisible by the
    # (8, 128) f32 tile: keep the halo (= VMEM write offset) and the block
    # size multiples of 8.
    K = _round_up(min(group_substeps, steps), 8)
    B = _round_up(block_rows, 8)
    n_blocks = -(-ny1 // B)
    n_groups = -(-steps // K)
    Rp = n_blocks * B + 2 * K
    Cp = _round_up(nx1, 128)
    area = dx * dx

    # -- loop-invariant planes (same hoists as the XLA path) ----------------
    min_m = phys.rhoi * p.min_h
    dtep = dte / (p.mevp_beta + 1.0) if dyn_type == "mevp" else dte
    dte_over_mass = dtep / jnp.maximum(min_m, node_mass)
    beta_cor = dtep * fcor
    volume = thick * area * mask

    if dyn_type == "bbm":
        from nextsim_tpu.ops.rheology import _fast_pow

        expC = jnp.exp(p.bbm.compaction_param * (1.0 - conc))
        pmax = (
            _fast_pow(thick, p.bbm.exponent_compression_factor)
            * p.bbm.compression_factor * expC
        )
        heal = dte / trelax * expC
        rtd = jnp.sqrt(p.bbm.young * expC) / (
            dx * math.sqrt(2.0 * (1.0 + p.bbm.nu0) * phys.rhoi)
        )
        cell_planes = [volume, conc, cohesion, pmax, heal, rtd, expC]
    else:
        P_evp = p.evp.Pstar * jnp.exp(-p.evp.C * (1.0 - conc))
        cell_planes = [volume, thick, P_evp]

    node_planes = [
        dte_over_mass, beta_cor, rlmass, c_bu, tau_ax, tau_ay,
        ocean_u, ocean_v, gssh_u, gssh_v, solve_f, sin_ota,
        vt_u, vt_v,  # vtm (mEVP reference velocity; unused otherwise)
    ]

    # -- pad to (Rp, Cp) with land-like values ------------------------------
    # Padded cells have conc=0/volume=0 (-> sigma, damage forced to 0 by the
    # has_ice mask) and padded nodes have solve=0 (-> velocity frozen at 0),
    # so the pad region stays identically zero through every substep: it is
    # indistinguishable from the closed-boundary land framing of the domain.
    planes = [_pad_plane(a, K, Rp, Cp) for a in cell_planes + node_planes]
    coeff = jnp.stack(planes)

    zero_n = jnp.zeros_like(vt_u)
    state_planes = [
        _pad_plane(a, K, Rp, Cp)
        for a in (vt_u, vt_v, sigma[0], sigma[1], sigma[2], damage,
                  zero_n, zero_n)
    ]
    state = jnp.stack(state_planes)
    state = jnp.stack([state, state])  # double buffer: both slots start equal

    kernel = functools.partial(
        _kernel, steps=steps, group=K, block_rows=B,
        dte=dte, dt=dt, dx=dx, dyn_type=dyn_type, p=p,
    )
    R = B + 2 * K
    n_coeff = len(planes)
    out = pl.pallas_call(
        kernel,
        grid=(n_groups, n_blocks),
        out_shape=jax.ShapeDtypeStruct(state.shape, dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_coeff, R, Cp), dtype),
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
    vt_u, vt_v = final[0], final[1]
    ny, nx = ny1 - 1, nx1 - 1  # cell planes are one row/col smaller
    sigma = jnp.stack([final[2][:ny, :nx], final[3][:ny, :nx], final[4][:ny, :nx]])
    damage = final[5][:ny, :nx]
    ut_du, ut_dv = final[6], final[7]
    if dyn_type == "mevp":
        ut_du = dt * vt_u
        ut_dv = dt * vt_v
    return vt_u, vt_v, sigma, damage, ut_du, ut_dv
