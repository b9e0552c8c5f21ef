#!/usr/bin/env python
"""Extract the RTparam Chebyshev coefficient tables into an .npz.

The reference WIM module hard-codes 2-D Chebyshev expansions of the
Kohout & Meylan (2008) wave-ice scattering model as ten C functions
``Amn_fxn_{L,H}{1..5}`` (reference: modules/wim/src/RTparam_hardcoded.c,
themselves generated from RTparam.m data files).  These are *physical
data tables* — Chebyshev coefficients of per-floe attenuation and
reflection/transmission coefficients over the (alp_nd, h_nd) plane —
not program logic.  This script parses them out of the reference source
and stores them as a single padded numpy archive that the JAX
implementation (nextsim_tpu/wim/rtparam.py) evaluates directly.

Output npz layout:
  tables: (10, 11, 11, 4) float64 — [table, m (alp order), n (h order), column]
          zero-padded; table index = LOW*5 + (OPT-1) with LOW=1 meaning the
          low-thickness regime (matches the C dispatch in RTparam_fast.c).
  ncx, ncy: (10,) int — true Chebyshev orders per table (degree, inclusive).
  ncols:    (10,) int — number of interpolated quantities (3 or 4).
"""
from __future__ import annotations

import re
import sys

import numpy as np

SRC = "/root/reference/modules/wim/src/RTparam_hardcoded.c"
OUT = "nextsim_tpu/wim/rtparam_tables.npz"

# Chebyshev orders per (OPT, LOW) — from RTparam_fast.c:149-154.
NCX_L = [10, 10, 10, 10, 3]
NCY_L = [10, 10, 10, 10, 10]
NCX_H = [10, 10, 10, 10, 4]
NCY_H = [10, 10, 10, 10, 10]
# interpolation mode per OPT (RTparam_fast.c:145): 3 quantities for modes 1,2
# (log-ac / ac + args), 4 for mode 3 (Re/Im of R and T).
INTERP_MODE = [1, 1, 3, 2, 1]


def parse_tables(text: str):
    out = {}
    for m in re.finditer(
        r"int Amn_fxn_([LH])(\d)\(double \*chebys,int ncol\) \{(.*?)\n\}",
        text,
        re.S,
    ):
        regime, opt, body = m.group(1), int(m.group(2)), m.group(3)
        rows = re.findall(r"\{([\s\d.eE+,-]+)\}", body)
        data = np.array(
            [[float(v) for v in r.split(",")] for r in rows], dtype=np.float64
        )
        out[(regime, opt)] = data
    return out


def main():
    text = open(SRC).read()
    raw = parse_tables(text)
    assert len(raw) == 10, sorted(raw)

    tables = np.zeros((10, 11, 11, 4), dtype=np.float64)
    ncx = np.zeros(10, dtype=np.int64)
    ncy = np.zeros(10, dtype=np.int64)
    ncols = np.zeros(10, dtype=np.int64)
    for (regime, opt), data in raw.items():
        low = 1 if regime == "L" else 0
        t = low * 5 + (opt - 1)
        cx = (NCX_L if low else NCX_H)[opt - 1]
        cy = (NCY_L if low else NCY_H)[opt - 1]
        ncx[t], ncy[t] = cx, cy
        nc = 3 if INTERP_MODE[opt - 1] in (1, 2) else 4
        ncols[t] = nc
        expected = (cx + 1) * (cy + 1)
        assert data.shape[0] == expected, ((regime, opt), data.shape, expected)
        assert data.shape[1] == nc, ((regime, opt), data.shape, nc)
        # C layout: chebys[s], s = nx + ny*(Ncx+1)  (RTparam_fast.c:478) —
        # i.e. row-major over (ny, nx). Reshape then transpose to [m=nx, n=ny].
        arr = data.reshape(cy + 1, cx + 1, nc).transpose(1, 0, 2)
        tables[t, : cx + 1, : cy + 1, :nc] = arr

    np.savez_compressed(OUT, tables=tables, ncx=ncx, ncy=ncy, ncols=ncols)
    print(f"wrote {OUT}: tables {tables.shape}, ncx={ncx}, ncols={ncols}")


if __name__ == "__main__":
    sys.exit(main())
