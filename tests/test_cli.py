"""CLI surface tests (reference: model/main.cpp:21-37 — --help prints the
option table; program_options errors print one-line messages)."""

import pytest

from nextsim_tpu.__main__ import main


def test_help_options_lists_everything(capsys):
    assert main(["--help-options"]) == 0
    out = capsys.readouterr().out
    # every section header present, enums rendered, 300+ lines
    for sec in ("[simul]", "[dynamics]", "[thermo]", "[moorings]", "[tpu]"):
        assert sec in out
    assert "one of" in out and "default=" in out
    assert len(out.splitlines()) > 300


@pytest.mark.parametrize("argv,needle", [
    (["--config-files", "/does/not/exist.cfg"], "config file not found"),
    (["setup.dynamics-type=bogus"], "allowed"),
    (["nosuch.option=1"], "unknown option"),
])
def test_config_errors_are_one_liners(argv, needle, capsys):
    assert main(argv) == 2
    err = capsys.readouterr().err
    assert "config error" in err and needle in err
    assert "Traceback" not in err


def test_compilation_cache_option(tmp_path):
    """tpu.compilation_cache_dir populates a persistent XLA cache so a
    relaunch of the same program skips compilation (operationally decisive
    behind a slow-compile link: 13 min measured for the 608^2 program)."""
    import os
    import subprocess
    import sys

    cache = tmp_path / "xla_cache"
    args = [
        sys.executable, "-m", "nextsim_tpu",
        "--config-files", "configs/toy.cfg",
        "grid.nx=32", "grid.ny=32", "simul.duration=0.003472222",
        f"output.exporter_path={tmp_path / 'out'}",
        f"tpu.compilation_cache_dir={cache}",
        "moorings.use_moorings=false", "output.output_per_day=0",
    ]
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(args, env=env, capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    entries = list(cache.glob("*"))
    assert entries, "no compilation cache entries written"


def test_profile_dir_writes_trace(tmp_path):
    """debugging.profile_dir wraps the main loop in a jax.profiler trace
    (the xprof analog of the reference's gperftools hook, run.sh:64-78)."""
    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    prof = tmp_path / "prof"
    cfg = Config(overrides={
        "grid.nx": 32, "grid.ny": 32, "grid.resolution": 10e3,
        "simul.timestep": 300, "simul.duration": 900.0 / 86400.0,
        "simul.time_init": "2015-10-16 00:00:00",
        "dynamics.substeps": 30,
        "thermo.use_thermo_forcing": False,
        "setup.ice-type": "constant", "setup.atmosphere-type": "constant",
        "setup.ocean-type": "constant",
        "ideal_simul.constant_wind_u": 10.0,
        "output.exporter_path": str(tmp_path / "out"),
        "output.output_per_day": 0,
        "debugging.profile_dir": str(prof),
    })
    Simulator(cfg).run()
    traces = list(prof.rglob("*.pb")) + list(prof.rglob("*.json.gz")) \
        + list(prof.rglob("*.trace*"))
    assert traces, f"no trace files under {prof}"
