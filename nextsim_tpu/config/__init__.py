from nextsim_tpu.config.schema import Config, OPTIONS  # noqa: F401
