from nextsim_tpu.forcing.base import Forcing  # noqa: F401
