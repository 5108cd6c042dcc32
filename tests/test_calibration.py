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


def test_round5_class_ruler_keys(cal):
    """The round-5 whole-kernel class rulers the bench rows re-base on
    (VERDICT r4 next #1/#5): a silent key rename would quietly send
    those rows back to looser rulers."""
    # f32 preset class: valid via the streamed component
    f32 = cal["kernel_ceiling"]["f32_256"]
    assert f32["mrows_per_s"] >= f32["resident_mrows_per_s"]
    assert f32["mrows_per_s"] > 0
    # flat big-q class + per-section diagnosis
    bq = cal["bigq_flat"]
    assert bq["n"] == 4096 and bq["polymul"]["mrows_per_s"] > 0
    for sec in ("split", "channels", "garner"):
        assert sec in bq["sections"]
    # fused four-step f32 class at the large23 point
    fk = cal["fourstep_kernel_f32"]
    assert fk["n"] == 1 << 16 and fk["q"] == 7340033
    assert fk["mrows_per_s"] > 0
    # measured per-phase costs of the blocked big-q pipeline (bigq1m)
    bp = cal["bigq_blocked_phases"]
    assert bp["n"] == 1 << 20 and bp["composed_row_s"] > 0
    for ph in ("split", "k1", "k2", "k3", "garner"):
        assert bp["per_row_s"][ph] > 0
