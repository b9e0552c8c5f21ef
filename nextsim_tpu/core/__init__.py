from nextsim_tpu.core.state import State, Diag  # noqa: F401
