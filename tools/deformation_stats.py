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


def deformation_rates(u_node: np.ndarray, v_node: np.ndarray, dx: float):
    """Cell divergence, shear and total deformation [1/s] from node
    velocities (same Q1 operators as the model, ops/stencil.py)."""
    r = 1.0 / (2.0 * dx)
    u_sw, u_se, u_nw, u_ne = u_node[:-1, :-1], u_node[:-1, 1:], u_node[1:, :-1], u_node[1:, 1:]
    v_sw, v_se, v_nw, v_ne = v_node[:-1, :-1], v_node[:-1, 1:], v_node[1:, :-1], v_node[1:, 1:]
    dudx = (u_se + u_ne - u_sw - u_nw) * r
    dudy = (u_nw + u_ne - u_sw - u_se) * r
    dvdx = (v_se + v_ne - v_sw - v_nw) * r
    dvdy = (v_nw + v_ne - v_sw - v_se) * r
    div = dudx + dvdy
    shear = np.sqrt((dudx - dvdy) ** 2 + (dudy + dvdx) ** 2)
    total = np.sqrt(div**2 + shear**2)
    return div, shear, total


def stats(total: np.ndarray, mask=None):
    """Percentiles + a log-log tail-slope estimate of the deformation PDF."""
    vals = total[mask > 0.5] if mask is not None else total.ravel()
    vals = vals[np.isfinite(vals) & (vals > 0)]
    if vals.size < 10:
        return {"n": int(vals.size)}
    day = 86400.0
    out = {
        "n": int(vals.size),
        "mean_per_day": float(vals.mean() * day),
        "p50_per_day": float(np.percentile(vals, 50) * day),
        "p90_per_day": float(np.percentile(vals, 90) * day),
        "p99_per_day": float(np.percentile(vals, 99) * day),
        "max_per_day": float(vals.max() * day),
    }
    # tail exponent: slope of log-survival between p90 and p99.9
    xs = np.percentile(vals, [90, 99, 99.9])
    if xs[0] > 0 and xs[-1] > xs[0]:
        probs = np.array([0.10, 0.01, 0.001])
        slope = np.polyfit(np.log(xs), np.log(probs), 1)[0]
        out["tail_exponent"] = float(-slope)
    return out


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
