from nextsim_tpu.ensemble.perturbation import (  # noqa: F401
    EnsembleForcing,
    PerturbationParams,
    spectral_noise,
)
