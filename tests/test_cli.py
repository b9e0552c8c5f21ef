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
