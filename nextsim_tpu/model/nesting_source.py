"""Outer-run field source for nesting.

The reference reads `nesting_[outer_mesh]_[yyyymmdd].nc` files produced by an
outer-domain neXtSIM run (reference: forcingNesting, fe.cpp:11060-11130 and
the nesting_* dataset descriptors in dataset.cpp). Here the outer run is
another nextsim_tpu run, and its snapshot exports (`field_*.npz` + manifest)
are the exchange format: `nesting.outer_mesh` points at the outer run's
exporter directory. Snapshots must be on the same grid (an interpolating
variant belongs with the dataset layer once cross-grid nesting is needed).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


class NestingSource:
    def __init__(self, directory: str, grid):
        self.directory = directory
        self.grid = grid
        self._index = []  # (time, npz_path)
        self._cache: Dict[str, Dict] = {}
        if directory and os.path.isdir(directory):
            for man in sorted(glob.glob(os.path.join(directory, "field_*.json"))):
                try:
                    with open(man) as f:
                        meta = json.load(f)
                    self._index.append((meta["time"], man.replace(".json", ".npz")))
                except Exception:
                    continue
            self._index.sort()

    def fields_at(self, t: float) -> Optional[Dict[str, jnp.ndarray]]:
        if not self._index:
            return None
        # nearest snapshot at or before t (falling back to the first)
        best = self._index[0][1]
        for tt, path in self._index:
            if tt <= t + 1e-9:
                best = path
            else:
                break
        if best not in self._cache:
            with np.load(best) as data:
                fields = {}
                for name in ("conc", "thick", "snow_thick", "damage",
                             "ridge_ratio", "vt_u", "vt_v", "sigma"):
                    if name in data:
                        fields[name] = jnp.asarray(data[name])
            self._cache = {best: fields}  # keep one
        return self._cache[best]
