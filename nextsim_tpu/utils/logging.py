"""Leveled logger, process-0 only by default.

Mirrors the reference's 5-level LOG macro (reference: core/include/debug.hpp:
66-68) which logs to stderr on MPI rank 0 unless debugging.log-all is set.
Here "rank" is `jax.process_index()` for multi-host runs.
"""

from __future__ import annotations

import logging as _pylogging
import sys

LEVELS = {
    "error": _pylogging.ERROR,
    "warning": _pylogging.WARNING,
    "info": _pylogging.INFO,
    "verbose": _pylogging.DEBUG,  # reference 'verbose' maps onto DEBUG-5
    "debug": _pylogging.DEBUG,
}

_logger = None


def get_logger(level: str = "info", log_all: bool = False) -> _pylogging.Logger:
    global _logger
    if _logger is not None:
        return _logger
    logger = _pylogging.getLogger("nextsim_tpu")
    logger.setLevel(LEVELS.get(level, _pylogging.INFO))
    handler = _pylogging.StreamHandler(sys.stderr)
    handler.setFormatter(_pylogging.Formatter("[%(asctime)s] %(levelname)s %(message)s", "%H:%M:%S"))
    logger.addHandler(handler)
    if not log_all:
        try:
            import jax

            if jax.process_index() != 0:
                logger.setLevel(_pylogging.ERROR)
        except Exception:
            pass
    _logger = logger
    return logger
