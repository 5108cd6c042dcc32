"""Calibration-artifact structure tests (CPU-side).

The measurement functions need a real TPU; what the CPU suite can and
must pin is (a) the committed CALIBRATION.json carries every key the
bench ruler machinery reads — a silent key rename would send every
pe_fraction to the op-model fallback without anyone noticing — and
(b) the ruler helpers in bench.py price work sensibly from it.
"""

import json
import pathlib
import sys

import pytest

_REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def cal():
    sys.path.insert(0, str(_REPO))
    from tpu_ntt.utils.calibrate import load_calibration
    c = load_calibration(_REPO / "CALIBRATION.json")
    assert c is not None, "committed CALIBRATION.json must parse"
    return c


def test_artifact_keys(cal):
    for key in ("pe_ceiling", "stage_ceiling", "stage_ceiling_lane"):
        for flavor in ("shoup", "f32", "mont"):
            assert cal[key][flavor]["gbf_per_s"] > 0
    assert cal["kernel_ceiling"]["shoup256"]["mrows_per_s"] > 0
    for unit in ("polymul", "roundtrip"):
        assert cal["incomplete_kernel"][unit]["mrows_per_s"] > 0
    assert cal["hbm_bytes_per_s"] > 1e11
    assert cal["platform"] == "tpu"


def test_physical_orderings(cal):
    """Sanity relations the rulers rely on: repack costs time (stage <=
    pe is NOT guaranteed — Harvey lazy stages beat the no-repack loop's
    scheduling sometimes — but lane rolls must not be cheaper than
    sublane rolls by more than noise), and the incomplete roundtrip
    (2 transforms) must be faster than the full polymul (3 transforms
    + basemul)."""
    for flavor in ("shoup", "f32", "mont"):
        sub = cal["stage_ceiling"][flavor]["gbf_per_s"]
        lane = cal["stage_ceiling_lane"][flavor]["gbf_per_s"]
        assert lane <= sub * 1.05, (flavor, sub, lane)
    ik = cal["incomplete_kernel"]
    assert (ik["roundtrip"]["mrows_per_s"]
            > ik["polymul"]["mrows_per_s"] * 1.3)


def test_bench_ruler_uses_artifact(cal, monkeypatch):
    monkeypatch.chdir(_REPO)
    import bench
    t = bench._measured_ceiling_s("mont", 1e9, 0.0, 0.5, 0.0)
    assert t is not None and 1e9 / t > 1e11      # plausible G bf/s
    # phase model: serial sum of per-phase maxes >= single-phase max
    phases = [dict(name="a", bf=5e8, passes=3.0),
              dict(name="b", bf=5e8, lane_frac=1.0, passes=3.0)]
    fn = bench._phase_ceiling_fn("mont", phases, 1e6)
    t2 = fn(cal)
    assert t2 >= bench._measured_ceiling_s("mont", 1e9, 0.0, 0.5, 0.0)
