"""Stencil operator tests: exactness on linear fields, adjointness, masks."""

import jax.numpy as jnp
import numpy as np

from nextsim_tpu.ops import stencil


def _node_coords(ny, nx, dx):
    x = np.arange(nx + 1) * dx
    y = np.arange(ny + 1) * dx
    return np.meshgrid(x, y)  # X[j,i], Y[j,i]


def test_strain_rates_linear_field():
    ny, nx, dx = 6, 8, 1000.0
    X, Y = _node_coords(ny, nx, dx)
    a, b, c, d = 2e-5, -1e-5, 3e-5, 4e-6
    u = a * X + b * Y
    v = c * X + d * Y
    e11, e22, e12 = stencil.strain_rates(jnp.asarray(u), jnp.asarray(v), dx)
    np.testing.assert_allclose(np.asarray(e11), a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e22), d, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e12), 0.5 * (b + c), rtol=1e-5)


def test_stress_divergence_uniform_stress_zero_interior():
    ny, nx, dx = 6, 8, 1000.0
    s = jnp.ones((ny, nx)) * 1e4
    vol = jnp.ones((ny, nx)) * dx * dx
    gu, gv = stencil.stress_divergence(s, s, jnp.zeros_like(s), vol, dx)
    # interior nodes see zero net force for uniform stress
    np.testing.assert_allclose(np.asarray(gu)[1:-1, 1:-1], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv)[1:-1, 1:-1], 0.0, atol=1e-6)


def test_stress_divergence_linear_stress():
    # sxx = g*x  => force per unit mass should be +g after lumped-mass division
    ny, nx, dx = 8, 10, 500.0
    xc = (np.arange(nx) + 0.5) * dx
    g = 0.02  # Pa/m
    sxx = jnp.asarray(np.broadcast_to(g * xc[None, :], (ny, nx)).copy())
    vol = jnp.ones((ny, nx)) * dx * dx  # thick=1
    gu, gv = stencil.stress_divergence(sxx, jnp.zeros_like(sxx), jnp.zeros_like(sxx), vol, dx)
    rlmass = 4.0 / (4 * dx * dx)
    acc = np.asarray(gu) * rlmass
    # the sign convention: grad_terms -= vol*(sxx*dxN) and the node update adds
    # grad_x directly to the rhs, so d(sigma)/dx>0 should accelerate +x... the
    # reference's sign ("counter-intuitive", Danilov 2015) gives F = -d(sxx)/dx
    # contribution to RHS as assembled; net nodal acceleration = +d(sxx)/dx:
    np.testing.assert_allclose(acc[2:-2, 2:-2], g, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv)[2:-2, 2:-2], 0.0, atol=1e-8)


def test_adjointness():
    # <sigma, B v> over cells == <B^T sigma, v> over nodes
    rng = np.random.default_rng(0)
    ny, nx, dx = 5, 7, 800.0
    u = jnp.asarray(rng.normal(size=(ny + 1, nx + 1)))
    v = jnp.asarray(rng.normal(size=(ny + 1, nx + 1)))
    sxx = jnp.asarray(rng.normal(size=(ny, nx)))
    syy = jnp.asarray(rng.normal(size=(ny, nx)))
    sxy = jnp.asarray(rng.normal(size=(ny, nx)))
    e11, e22, e12 = stencil.strain_rates(u, v, dx)
    vol = jnp.ones((ny, nx))
    lhs = float(jnp.sum(sxx * e11 + syy * e22 + 2.0 * sxy * e12))
    gu, gv = stencil.stress_divergence(sxx, syy, sxy, vol, dx)
    rhs = float(jnp.sum(-gu * u - gv * v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-12) < 1e-5


def test_node_max_and_sums():
    cell = jnp.asarray(np.arange(12.0).reshape(3, 4))
    nm = stencil.node_max_of_cells(cell)
    assert nm.shape == (4, 5)
    assert float(nm[0, 0]) == 0.0  # only cell (0,0)
    assert float(nm[1, 1]) == 5.0  # cells 0,1,4,5
    s = stencil.cells_to_node_sum(jnp.ones((3, 4)))
    assert float(s[1, 1]) == 4.0 and float(s[0, 0]) == 1.0


def test_neighbor_mean_masked():
    ny = nx = 4
    u = jnp.ones((ny + 1, nx + 1)) * 2.0
    ok = jnp.ones((ny + 1, nx + 1))
    m = stencil.neighbor_mean_nodes(u, ok)
    np.testing.assert_allclose(np.asarray(m)[1:-1, 1:-1], 2.0, rtol=1e-6)


def test_laplacian_constant_zero():
    f = jnp.full((5, 5), 3.0)
    mask = jnp.ones((5, 5))
    lap = stencil.laplacian_cells(f, mask, 100.0)
    np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-10)
