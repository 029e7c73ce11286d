"""Unit tests for the parity-report gate logic (`cli/parity_report.py`):
the BASELINE 1% rule — CSIM at most tol worse (better always passes),
pose/exp errors at most tol·reference higher."""

from stylegan_directions_face_reenactment_tpu.cli.parity_report import _gate

REF = {"csim": 0.80, "pose": 2.0, "exp": 0.10}


def _ours(csim=0.80, pose=2.0, exp=0.10):
    return {"csim": csim, "pose_error_deg": pose, "expression_error": exp}


def test_gate_exact_match_passes():
    g = _gate(_ours(), REF, 0.01)
    assert g["pass"] and all(c["pass"] for c in g["checks"].values())


def test_gate_better_always_passes():
    g = _gate(_ours(csim=0.95, pose=1.0, exp=0.01), REF, 0.01)
    assert g["pass"]


def test_gate_within_tolerance_passes():
    g = _gate(_ours(csim=0.80 * 0.995, pose=2.0 * 1.005, exp=0.10 * 1.005),
              REF, 0.01)
    assert g["pass"]


def test_gate_csim_shortfall_fails():
    g = _gate(_ours(csim=0.80 * 0.98), REF, 0.01)
    assert not g["pass"]
    assert not g["checks"]["csim"]["pass"]
    assert g["checks"]["pose"]["pass"] and g["checks"]["exp"]["pass"]


def test_gate_pose_excess_fails():
    g = _gate(_ours(pose=2.0 * 1.02), REF, 0.01)
    assert not g["pass"] and not g["checks"]["pose"]["pass"]


def test_gate_exp_excess_fails():
    g = _gate(_ours(exp=0.10 * 1.02), REF, 0.01)
    assert not g["pass"] and not g["checks"]["exp"]["pass"]


def test_gate_wider_tolerance():
    g = _gate(_ours(pose=2.0 * 1.04), REF, 0.05)
    assert g["pass"]
