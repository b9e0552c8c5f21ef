"""Config schema tests: defaults, INI parsing of the reference toy config."""

import pathlib

import pytest

from nextsim_tpu.config import Config

REF_TOY = pathlib.Path("/root/reference/config-files/nextsim.toy.cfg")


def test_defaults_match_reference():
    cfg = Config()
    # spot-check defaults transcribed from model/options.cpp
    assert cfg["simul.timestep"] == 200
    assert cfg["dynamics.substeps"] == 120
    assert cfg["dynamics.young"] == pytest.approx(5.9605e8)
    assert cfg["dynamics.compaction_param"] == -20.0
    assert cfg["thermo.newice_type"] == 4
    assert cfg["setup.dynamics-type"] == "bbm"
    assert cfg["moorings.variables"][0] == "conc"


@pytest.mark.skipif(not REF_TOY.exists(), reason="reference configs not mounted")
def test_parse_reference_toy_config():
    cfg = Config.from_files(str(REF_TOY))
    assert cfg["setup.ice-type"] == "constant_partial"
    assert cfg["simul.timestep"] == 300
    assert cfg["simul.duration"] == 1.0
    assert cfg["thermo.use_thermo_forcing"] is False
    assert cfg["dynamics.use_coriolis"] is False
    assert cfg["dynamics.alea_factor"] == pytest.approx(0.33)
    assert cfg["dynamics.C_lab"] == pytest.approx(1.5e6)
    assert cfg["ideal_simul.constant_wind_u"] == 20.0
    assert cfg["restart.write_interval_restart"] is False
    # trailing-comment stripping: "datetime_in_filename=false#true"
    assert cfg["output.datetime_in_filename"] is False
    # repeated keys accumulate, replacing the default list
    assert cfg["moorings.variables"] == ["conc", "thick", "velocity", "damage"]
    assert cfg["moorings.snapshot"] is True


REF_CPL = pathlib.Path("/root/reference/config-files/cpl_run_opa4.cfg")


@pytest.mark.skipif(not REF_CPL.exists(), reason="reference configs not mounted")
def test_parse_reference_coupled_config():
    """The shipped coupled reference config parses directly (a reference
    user's production file works unchanged). NB the third shipped file,
    nextsim.cfg, uses `ice-type=topaz` / `ocean-type=topaz` — values the
    REFERENCE's own str2conc/str2ocean maps (fe.cpp:1314-1348) also reject
    (the file is stale upstream); our strict schema mirrors the reference
    code, not the stale file."""
    cfg = Config.from_files(str(REF_CPL))
    assert cfg["setup.ice-type"] == "nemo"
    assert cfg["setup.ocean-type"] == "coupled"
    assert cfg["coupler.timestep"] == 3600
    assert cfg["setup.bathymetry-type"] == "etopo"


def test_unknown_option_rejected():
    cfg = Config()
    with pytest.raises(KeyError):
        cfg.set("dynamics.nonexistent", 1)


def test_enum_validation():
    cfg = Config()
    with pytest.raises(ValueError):
        cfg.set("setup.dynamics-type", "implicit")
    cfg.set("setup.dynamics-type", "mevp")
    assert cfg["setup.dynamics-type"] == "mevp"


def test_overrides_and_dump():
    cfg = Config(overrides={"simul.timestep": "450", "tpu.dtype": "bfloat16"})
    assert cfg["simul.timestep"] == 450
    text = cfg.dump()
    assert "[dynamics]" in text and "substeps=120" in text


def test_all_shipped_configs_parse():
    """Every config under configs/ must parse through the schema (catches a
    shipped option falling out of sync with config/schema.py)."""
    import glob

    from nextsim_tpu.config import Config

    cfgs = sorted(glob.glob("configs/*.cfg"))
    assert cfgs, "no shipped configs found (run from the repo root)"
    for path in cfgs:
        cfg = Config()
        cfg.load_ini(path)
        assert cfg["simul.timestep"] > 0, path
