"""Grid and State tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nextsim_tpu.config import Config
from nextsim_tpu.core.state import Diag, State
from nextsim_tpu.grid.grid import Grid


def test_square_grid_masks():
    g = Grid.square(nx=16, ny=12, dx=1e3)
    assert g.shape == (12, 16)
    assert g.node_shape == (13, 17)
    # outer ring is land
    assert g.mask[0].sum() == 0 and g.mask[:, 0].sum() == 0
    assert g.mask[1:-1, 1:-1].min() == 1.0
    nm = g.node_mask
    nd = g.node_dirichlet
    # nodes strictly inside the ocean are not dirichlet
    assert nd[3:-3, 3:-3].sum() == 0
    # coast nodes (touching ring land cells) are dirichlet
    assert nd[1, 5] == 1.0
    # corner-most nodes touch only land -> masked out entirely
    assert nm[0, 0] == 0.0


def test_grid_latlon_inverse_consistency():
    g = Grid.square(nx=8, ny=8, dx=10e3, x0=-300e3, y0=-3000e3)
    lat, lon = g.cell_latlon()
    x, y = g.cell_xy()
    x2, y2 = g.projection.forward(lat, lon)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1.0)
    np.testing.assert_allclose(np.asarray(y2), y, atol=1.0)


def test_state_pytree():
    g = Grid.square(nx=8, ny=8)
    s = State.zeros(g)
    leaves = jax.tree_util.tree_leaves(s)
    assert all(isinstance(l, jnp.ndarray) for l in leaves)
    assert s.tice.shape == (3, 8, 8)
    assert s.vt_u.shape == (9, 9)
    # jit-through
    f = jax.jit(lambda st: st.replace(conc=st.conc + 1.0))
    s2 = f(s)
    assert float(s2.conc[0, 0]) == 1.0


def test_state_from_config():
    cfg = Config()
    g = Grid.square(nx=8, ny=8)
    s = State.zeros(g, cfg=cfg)
    assert abs(float(s.drag_ui[0, 0]) - cfg["dynamics.ASR_quad_drag_coef_air"]) < 1e-9
    d = Diag.zeros(g)
    assert d.tau_ax.shape == (9, 9)
    assert d.qa.shape == (8, 8)
