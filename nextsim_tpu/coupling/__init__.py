from nextsim_tpu.coupling.exchange import Coupler  # noqa: F401
