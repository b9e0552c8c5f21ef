"""Reference binary-format codec tests (native C++ + numpy fallback)."""

import numpy as np
import pytest

from nextsim_tpu.output import ref_binary


def test_native_roundtrip(tmp_path, rng):
    base = str(tmp_path / "field_test")
    recs = [
        ("Concentration", "float", rng.uniform(0, 1, 100).astype(np.float64)),
        ("Thickness", "double", rng.uniform(0, 3, 100)),
        ("id", "int", np.arange(50, dtype=np.int32)),
    ]
    ref_binary.write_file(base, recs)
    out = ref_binary.read_file(base)
    np.testing.assert_allclose(out["Concentration"], recs[0][2].astype(np.float32))
    np.testing.assert_array_equal(out["Thickness"], recs[1][2])
    np.testing.assert_array_equal(out["id"], recs[2][2])
    # .dat lines carry name/type/size
    lines = open(base + ".dat").read().splitlines()
    assert lines[0].startswith("Concentration float 100")


def test_binary_layout_matches_reference_format(tmp_path):
    """Byte-level check: int32 count then payload (exporter.cpp:36-53)."""
    base = str(tmp_path / "fmt")
    data = np.array([1.5, -2.5, 3.0], np.float64)
    ref_binary.write_file(base, [("x", "float", data)])
    raw = open(base + ".bin", "rb").read()
    n = np.frombuffer(raw[:4], np.int32)[0]
    assert n == 3
    vals = np.frombuffer(raw[4:16], np.float32)
    np.testing.assert_allclose(vals, data.astype(np.float32))
    assert len(raw) == 4 + 12


def test_native_lib_actually_built():
    lib = ref_binary._load_native()
    assert lib is not None, "native codec failed to build (g++ missing?)"


def test_write_state(tmp_path):
    from nextsim_tpu.config import Config
    from nextsim_tpu.model.simulator import Simulator

    cfg = Config(overrides={
        "grid.nx": 8, "grid.ny": 8, "grid.resolution": 10e3,
        "thermo.use_thermo_forcing": False,
        "setup.atmosphere-type": "constant", "setup.ocean-type": "constant",
        "setup.ice-type": "constant",
        "output.exporter_path": str(tmp_path),
        "dynamics.use_coriolis": False,
    })
    sim = Simulator(cfg)
    path = ref_binary.write_state(sim, "t0")
    out = ref_binary.read_file(path[:-4])
    assert "Concentration" in out and "M_VT" in out and "Tice" in out
    assert out["Concentration"].size == 64
    assert out["M_VT"].size == 2 * 81
    assert out["Tice"].size == 3 * 64
    np.testing.assert_allclose(
        out["Concentration"].reshape(8, 8), np.asarray(sim.state.conc), rtol=1e-6
    )
