from nextsim_tpu.grid.grid import Grid  # noqa: F401
from nextsim_tpu.grid.projection import PolarStereo  # noqa: F401
