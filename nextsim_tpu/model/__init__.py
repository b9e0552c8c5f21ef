from nextsim_tpu.model.simulator import Simulator  # noqa: F401
