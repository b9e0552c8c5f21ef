"""Build + run the reference-hot-loop CPU anchor (native/ref_hotloop_bench.cpp).

The reference executable cannot be compiled in this image (Boost.MPI,
NetCDF-C++4 and Gmsh are absent and installing packages is out of scope), so
the measured anchor is the reference's momentum hot loop — explicitSolve's
per-substep element+node work (model/finiteelement.cpp:10420-10573),
re-implemented from the formula set in C++ (-O3, double precision, P1
triangles) and timed on this machine's CPU. See BASELINE.md for the derived
job-scale bound used as bench.py's vs_baseline denominator.

Usage: python tools/bench_anchor.py [N] [substeps]
Prints the benchmark's JSON line plus the 64-core ideal-scaling bound.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
SRC = REPO / "native" / "ref_hotloop_bench.cpp"
EXE = REPO / "native" / "build" / "ref_hotloop_bench"

# reference example HPC job: 16 MPI ranks x 4 OMP threads = 64 cores
# (model/job_mpi.pbs:10-35)
JOB_CORES = 64


def run(n: int = 350, substeps: int = 120) -> dict:
    EXE.parent.mkdir(exist_ok=True)
    if not EXE.exists() or EXE.stat().st_mtime < SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops",
             "-o", str(EXE), str(SRC)],
            check=True,
        )
    out = subprocess.run(
        [str(EXE), str(n), str(substeps), "3"],
        check=True, capture_output=True, text=True,
    ).stdout
    res = json.loads(out)
    res["job_cores"] = JOB_CORES
    res["element_substeps_per_s_job_ideal"] = (
        res["element_substeps_per_s_core"] * JOB_CORES
    )
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 350
    substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    print(json.dumps(run(n, substeps)))
