"""Sea-ice deformation statistics — the scientific validation channel.

The reference's BBM rheology is validated against observed deformation-rate
scaling (Rampal et al. 2016; Olason et al. 2024 — SURVEY.md §4.6): the PDFs
of divergence/shear/total deformation are heavy-tailed and multifractal in
space. This tool computes those statistics from a snapshot (velocity field),
enabling the same eyeball-plus-PDF comparison the reference community uses.

Usage:
    python tools/deformation_stats.py <field_XXX.npz> [dx_meters]
Prints percentiles + tail exponent estimate and writes a PDF plot alongside.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single source of truth shared with validation/ref_compare.py's
# statistical channel
from nextsim_tpu.validation.deformation import deformation_rates, stats  # noqa: E402


def main(argv):
    path = argv[1]
    dx = float(argv[2]) if len(argv) > 2 else 10e3
    data = np.load(path)
    u, v = np.asarray(data["vt_u"]), np.asarray(data["vt_v"])
    div, shear, total = deformation_rates(u, v, dx)
    mask = (np.asarray(data["conc"]) > 0.15) if "conc" in data else None
    result = {
        "divergence": stats(np.abs(div), mask),
        "shear": stats(shear, mask),
        "total": stats(total, mask),
    }
    print(json.dumps(result, indent=1))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        vals = (total[mask > 0.5] if mask is not None else total.ravel()) * 86400.0
        vals = vals[vals > 0]
        if vals.size:
            fig, ax = plt.subplots(figsize=(5, 4))
            bins = np.logspace(np.log10(max(vals.min(), 1e-5)), np.log10(vals.max()), 40)
            ax.hist(vals, bins=bins, density=True)
            ax.set_xscale("log")
            ax.set_yscale("log")
            ax.set_xlabel("total deformation rate [1/day]")
            ax.set_ylabel("PDF")
            out = os.path.splitext(path)[0] + "_deformation.png"
            fig.tight_layout()
            fig.savefig(out, dpi=110)
            print(out)
    except Exception:
        pass


if __name__ == "__main__":
    main(sys.argv)
