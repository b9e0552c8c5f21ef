"""Pallas TPU kernel: the fused momentum+rheology substep loop.

The XLA path (ops/momentum.py) emits the 120-substep loop as ~120 rounds of
fused elementwise kernels, each reading and writing the full state from HBM
— bandwidth-bound at roughly (substeps x working-set) of HBM traffic. This
kernel instead keeps the ENTIRE substep state (velocities, stress, damage)
plus all per-step coefficient fields resident in VMEM and runs the whole
`lax.fori_loop` inside one `pl.pallas_call`, cutting HBM traffic by ~the
substep count. It is the TPU-native answer to the reference's hot loop #1
(explicitSolve substepping, model/finiteelement.cpp:10420-10573) in the
same way the reference fuses it into one tight MPI-rank loop.

Applicability: the working set is ~26 arrays x N^2 x 4B, so the single-block
kernel fits v5e VMEM (~16 MB/core) up to roughly 384x384 cells — the toy and
regional configs. Larger domains automatically use the K-substep-grouped
blocked variant (ops/momentum_pallas_blocked.py) when `tpu.use_pallas` is on;
note that on v5e the XLA loop measured *faster* than both kernels at 608²
(the loop is VPU-compute-bound, not HBM-bound — see NOTES_NEXT_ROUND.md), so
`tpu.use_pallas` stays off by default.

The physics code is shared: the kernel body calls the same
`rheology.bbm_update`/`vp_update` and `stencil.*` functions used by the XLA
path — Pallas traces them onto VPU ops directly, so there is exactly one
source of truth for the formulas.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextsim_tpu.core import constants as phys
from nextsim_tpu.ops import rheology, stencil

#: approximate VMEM working-set budget (bytes) for the single-block kernel
VMEM_BUDGET = 14 * 1024 * 1024
_N_ARRAYS = 26


def fits_vmem(ny: int, nx: int, dtype_bytes: int = 4) -> bool:
    return _N_ARRAYS * (ny + 1) * (nx + 1) * dtype_bytes <= VMEM_BUDGET


def _substep_kernel(
    # read-only cell fields
    conc_ref, thick_ref, cohesion_ref, trelax_ref, mask_ref,
    # read-only node fields
    node_mass_ref, rlmass_ref, cbu_ref, fcor_ref,
    tau_ax_ref, tau_ay_ref, ocean_u_ref, ocean_v_ref,
    gssh_u_ref, gssh_v_ref, solve_ref, sin_ota_ref,
    # in/out state
    vt_u_ref, vt_v_ref, sigma_ref, damage_ref,
    # outputs
    out_vt_u_ref, out_vt_v_ref, out_sigma_ref, out_damage_ref,
    out_ut_du_ref, out_ut_dv_ref,
    *,
    steps: int,
    dte: float,
    dt: float,
    dx: float,
    dyn_type: str,
    p,
):
    """One full substep loop over the whole (VMEM-resident) domain."""
    conc = conc_ref[:]
    thick = thick_ref[:]
    cohesion = cohesion_ref[:]
    trelax = trelax_ref[:]
    mask = mask_ref[:]
    node_mass = node_mass_ref[:]
    rlmass = rlmass_ref[:]
    c_bu = cbu_ref[:]
    fcor = fcor_ref[:]
    tau_ax = tau_ax_ref[:]
    tau_ay = tau_ay_ref[:]
    ocean_u = ocean_u_ref[:]
    ocean_v = ocean_v_ref[:]
    grad_ssh_u = gssh_u_ref[:]
    grad_ssh_v = gssh_v_ref[:]
    solve = solve_ref[:] > 0.5
    sin_ota_signed = sin_ota_ref[:]

    cos_ota = math.cos(math.radians(p.ocean_turning_angle_deg))
    min_m = phys.rhoi * p.min_h
    area = dx * dx
    volume = thick * area * mask

    vtm_u = vt_u_ref[:]
    vtm_v = vt_v_ref[:]

    # loop-invariant BBM transcendentals hoisted out of the substep loop
    if dyn_type == "bbm":
        from nextsim_tpu.ops.rheology import _fast_pow

        bbm_expC = jnp.exp(p.bbm.compaction_param * (1.0 - conc))
        bbm_pmax = (
            _fast_pow(thick, p.bbm.exponent_compression_factor)
            * p.bbm.compression_factor * bbm_expC
        )
        bbm_heal = dte / trelax * bbm_expC
        bbm_rtd = jnp.sqrt(p.bbm.young * bbm_expC) / (
            dx * math.sqrt(2.0 * (1.0 + p.bbm.nu0) * phys.rhoi)
        )
    else:
        bbm_expC = bbm_pmax = bbm_heal = bbm_rtd = None

    # loop-invariant node coefficients (node_mass, fcor are fixed)
    dtep_const = dte / (p.mevp_beta + 1.0) if dyn_type == "mevp" else dte
    dte_over_mass = dtep_const / jnp.maximum(min_m, node_mass)
    beta_cor = dtep_const * fcor

    def substep(s, carry):
        vt_u, vt_v, sigma, damage, ut_du, ut_dv = carry
        eps11, eps22, eps12 = stencil.strain_rates(vt_u, vt_v, dx)
        if dyn_type == "bbm":
            sigma, damage = rheology.bbm_update(
                sigma, damage, conc, thick, cohesion, trelax,
                eps11, eps22, eps12, dx, dte, p.bbm,
                expC=bbm_expC, Pmax=bbm_pmax,
                heal_rate=bbm_heal, rtd_coef=bbm_rtd,
            )
        elif dyn_type == "evp":
            sigma = rheology.evp_update(
                sigma, conc, thick, eps11, eps22, eps12, dte, dt, p.evp
            )
        else:  # mevp
            sigma = rheology.mevp_update(
                sigma, conc, thick, eps11, eps22, eps12, p.mevp_alpha, p.evp
            )

        gsu, gsv = stencil.stress_divergence(sigma[0], sigma[1], sigma[2], volume, dx)
        grad_u = grad_ssh_u + gsu
        grad_v = grad_ssh_v + gsv

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
        beta = beta_cor + dte_over_mass * c_prime * sin_ota_signed
        rdenom = 1.0 / (alpha * alpha + beta * beta)
        tau_x = tau_ax + c_prime * (ocean_u * cos_ota - ocean_v * sin_ota_signed)
        tau_y = tau_ay + c_prime * (ocean_v * cos_ota + ocean_u * sin_ota_signed)
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
        return (vt_u, vt_v, sigma, damage, ut_du, ut_dv)

    init = (
        vt_u_ref[:], vt_v_ref[:], sigma_ref[:], damage_ref[:],
        jnp.zeros_like(vtm_u), jnp.zeros_like(vtm_v),
    )
    vt_u, vt_v, sigma, damage, ut_du, ut_dv = lax.fori_loop(0, steps, substep, init)

    if dyn_type == "mevp":
        ut_du = dt * vt_u
        ut_dv = dt * vt_v

    out_vt_u_ref[:] = vt_u
    out_vt_v_ref[:] = vt_v
    out_sigma_ref[:] = sigma
    out_damage_ref[:] = damage
    out_ut_du_ref[:] = ut_du
    out_ut_dv_ref[:] = ut_dv


def substep_loop_pallas(
    cell_inputs: Tuple,
    node_inputs: Tuple,
    vt_u, vt_v, sigma, damage,
    steps: int, dte: float, dt: float, dx: float, dyn_type: str, p,
    interpret: bool = False,
):
    """Run the fused substep loop; returns (vt_u, vt_v, sigma, damage,
    ut_du, ut_dv) where ut_d* are the accumulated displacement increments."""
    ny1, nx1 = vt_u.shape
    dtype = vt_u.dtype
    kernel = functools.partial(
        _substep_kernel, steps=steps, dte=dte, dt=dt, dx=dx, dyn_type=dyn_type, p=p
    )
    out_shape = (
        jax.ShapeDtypeStruct((ny1, nx1), dtype),  # vt_u
        jax.ShapeDtypeStruct((ny1, nx1), dtype),  # vt_v
        jax.ShapeDtypeStruct(sigma.shape, dtype),  # sigma
        jax.ShapeDtypeStruct(damage.shape, dtype),  # damage
        jax.ShapeDtypeStruct((ny1, nx1), dtype),  # ut_du
        jax.ShapeDtypeStruct((ny1, nx1), dtype),  # ut_dv
    )
    n_in = len(cell_inputs) + len(node_inputs) + 4
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)] * n_in,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)
            for _ in out_shape
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * VMEM_BUDGET)
        ),
        interpret=interpret,
    )(*cell_inputs, *node_inputs, vt_u, vt_v, sigma, damage)
