"""Blocked Pallas substep kernel: equivalence vs the XLA fori_loop path.

The kernel (ops/momentum_pallas.py) shares the physics body with the XLA
path (momentum._build_substep) and re-expresses only the stencils as
co-shaped zero-fill shifts with identical factored arithmetic. What is
pinned, and how:

* The halo/double-buffer bookkeeping is EXACT: different (block_rows,
  group_substeps) configurations — multi-block multi-group vs whole-domain
  single-group — must agree BITWISE, because they run the same per-substep
  ops and differ only in the blocking (measured exact on CPU interpret and
  on the real chip).
* The co-shaped stencils match ops/stencil.py bitwise on shared inputs.
* Against the XLA loop, bit-equality holds only while no cell crosses the
  BBM failure threshold: Mosaic and XLA may contract FMAs differently, and
  the `failing` branch amplifies one-ULP stress differences into visible
  velocity differences (observed on-chip: substeps 1-3 bitwise, divergence
  onset exactly when damage starts growing). So the XLA comparison is
  bitwise over the pre-failure horizon and statistical beyond — the same
  tolerance-tier philosophy as validation/ref_compare.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsim_tpu.ops import momentum, momentum_pallas, stencil

from test_momentum import make_setup


def _solve(state, forcing, ga, dyn, **repl):
    dyn = dataclasses.replace(dyn, **repl)
    state2, _diag = momentum.explicit_solve(state, forcing, ga, 300.0, dyn)
    return state2


def _assert_state_equal(a, b):
    for f in ("vt_u", "vt_v", "ut_u", "ut_v", "damage", "sigma"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


@pytest.mark.parametrize("dynamics", ["bbm", "mevp", "evp"])
def test_blocking_configs_agree_bitwise(dynamics):
    """Row-blocking + substep-grouping is exact: a 3-block/3-group run (with
    a short bottom block, a short last group, and column padding 33 -> 128)
    must be bit-identical to the whole-domain single-group run."""
    cfg, grid, state, forcing, dyn, ga = make_setup(
        dynamics=dynamics, wind=10.0, substeps=20
    )
    wide = _solve(
        state, forcing, ga, dyn,
        substep_kernel="pallas", pallas_block_rows=64, pallas_group_substeps=24,
    )
    blocked = _solve(
        state, forcing, ga, dyn,
        substep_kernel="pallas", pallas_block_rows=16, pallas_group_substeps=8,
    )
    _assert_state_equal(wide, blocked)


def test_co_stencils_match_padslice():
    """The co-shaped zero-fill-shift stencils reproduce ops/stencil.py on the
    shared (valid) region. Strain is bitwise; stress divergence is
    FMA-contraction-level (~1e-11 absolute observed: XLA may contract the
    volume*sigma multiply into an fma in one expression tree and not the
    other) — the transcription itself is term-for-term identical."""
    rng = np.random.default_rng(7)
    ny, nx = 13, 21
    u = jnp.asarray(rng.standard_normal((ny + 1, nx + 1)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((ny + 1, nx + 1)), jnp.float32)
    dx = 10e3

    @jax.jit
    def both(u, v):
        ref = stencil.strain_rates(u, v, dx)
        # embed co-shaped: same planes zero-padded one row/col at the far end
        uc = jnp.pad(u, ((0, 1), (0, 1)))
        vc = jnp.pad(v, ((0, 1), (0, 1)))
        co = momentum_pallas._strain_rates_co(uc, vc, dx)
        return ref, tuple(x[:ny, :nx] for x in co)

    ref, co = both(u, v)
    for r, c in zip(ref, co):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(c))

    s = [jnp.asarray(rng.standard_normal((ny, nx)), jnp.float32) for _ in range(4)]

    @jax.jit
    def both_div(sxx, syy, sxy, vol):
        ref = stencil.stress_divergence(sxx, syy, sxy, vol, dx)
        # co-shaped layout: cell and node planes share the same origin, so a
        # cell plane extended by one trailing zero row/col covers the
        # (ny+1, nx+1) node output
        pad = lambda a: jnp.pad(a, ((0, 1), (0, 1)))  # noqa: E731
        co = momentum_pallas._stress_divergence_co(
            pad(sxx), pad(syy), pad(sxy), pad(vol), dx
        )
        return ref, co

    ref, co = both_div(*s)
    for r, c in zip(ref, co):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(c), rtol=1e-5, atol=1e-9
        )


@pytest.mark.parametrize("dynamics", ["bbm", "mevp"])
def test_pallas_matches_xla(dynamics):
    """vs the XLA loop: tight agreement over a short horizon (before the
    failure branch can amplify codegen ULPs), finite + statistically equal
    over the full substep count."""
    cfg, grid, state, forcing, dyn, ga = make_setup(
        dynamics=dynamics, wind=10.0, substeps=3
    )
    ref = _solve(state, forcing, ga, dyn, substep_kernel="xla")
    out = _solve(
        state, forcing, ga, dyn,
        substep_kernel="pallas", pallas_block_rows=16, pallas_group_substeps=8,
    )
    np.testing.assert_allclose(
        np.asarray(ref.vt_u), np.asarray(out.vt_u), atol=1e-9, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref.sigma), np.asarray(out.sigma), atol=1e-4, rtol=1e-6
    )

    cfg, grid, state, forcing, dyn, ga = make_setup(
        dynamics=dynamics, wind=10.0, substeps=40
    )
    ref = _solve(state, forcing, ga, dyn, substep_kernel="xla")
    out = _solve(
        state, forcing, ga, dyn,
        substep_kernel="pallas", pallas_block_rows=16, pallas_group_substeps=8,
    )
    u_r, u_o = np.asarray(ref.vt_u), np.asarray(out.vt_u)
    assert np.isfinite(u_o).all()
    # statistical equality: identical physics, ULP-level chaos at cell level
    np.testing.assert_allclose(np.abs(u_r).mean(), np.abs(u_o).mean(), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ref.damage).mean(), np.asarray(out.damage).mean(), atol=1e-3
    )


def test_pallas_rejects_device_mesh():
    cfg, grid, state, forcing, dyn, ga = make_setup(substeps=8)
    dyn = dataclasses.replace(dyn, substep_kernel="pallas")
    with pytest.raises(ValueError, match="single-device"):
        momentum.explicit_solve(
            state, forcing, ga, 300.0, dyn, mesh=object(), partition_mode="gspmd"
        )
