"""Driver entry-point tests: single-chip compile + multichip dry-run."""

import jax
import pytest

import __graft_entry__ as entry_mod

# heavy integration tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


def test_entry_compiles():
    fn, args = entry_mod.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


@pytest.mark.parametrize("n", [4, 8])
def test_dryrun_multichip(n):
    entry_mod.dryrun_multichip(n)
