"""The reference-verification harness must actually parse (round-2 verdict
#5: 'each check is a small parser, not a comment'). Exercise it against a
synthetic populated mount with matching AND mismatching constants."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(ref_dir):
    p = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "verify_reference.py"),
         "--ref", str(ref_dir)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": str(REPO)},
    )
    return p.returncode, p.stdout


def test_empty_mount_all_skip(tmp_path):
    rc, out = _run(tmp_path)
    assert rc == 0
    assert "0 pass, 0 fail" in out and "15 skipped" in out
    assert out.count("[SKIP") == 15


def test_matching_mount_passes(tmp_path):
    from hocon.data.fphab import CAM_EXTR, CAM_INTR, REORDER_IDX
    from hocon.data.ho3d import MANO_TO_STANDARD
    from hocon.geometry.mano import FINGERTIP_VERT_IDS, JOINT_REORDER

    (tmp_path / "manopth").mkdir()
    (tmp_path / "manopth" / "manolayer.py").write_text(
        f"TIPS = {list(FINGERTIP_VERT_IDS)}\n"
        f"REORDER = {list(JOINT_REORDER)}\n"
    )
    (tmp_path / "datasets").mkdir()
    intr_rows = [[float(v) for v in row] for row in CAM_INTR]
    extr_rows = [[float(v) for v in row] for row in CAM_EXTR]
    (tmp_path / "datasets" / "fhbhands.py").write_text(
        f"cam_intr = {intr_rows}\n"
        f"cam_extr = {extr_rows}\n"
        f"reorder_idx = {list(REORDER_IDX)}\n"
        "train_subjects = ['Subject_1', 'Subject_3', 'Subject_4']\n"
        "test_subjects = ['Subject_2', 'Subject_5', 'Subject_6']\n"
        "def mark(fraction): pass\n"
        "def pairs(spacing): pass\n"
    )
    (tmp_path / "datasets" / "ho3dv2.py").write_text(
        "import numpy as np\n"
        "cam_extr = np.array([[1, -1, -1]])\n"
        f"idxs = {list(MANO_TO_STANDARD)}\n"
    )
    rc, out = _run(tmp_path)
    assert rc == 0, out
    for name in ("mano/fingertip-vert-ids", "mano/joint-reorder",
                 "fphab/cam-intrinsics", "fphab/cam-extrinsics",
                 "fphab/joint-reorder", "fphab/subject-splits",
                 "ho3d/joint-order"):
        line = next(ln for ln in out.splitlines() if f"] {name}:" in ln)
        assert line.startswith("[PASS"), line
    assert out.count("[FAIL") == 0, out


def test_mismatching_mount_fails(tmp_path):
    """A reference with a DIFFERENT joint order must FAIL, not pass/skip."""
    (tmp_path / "manolayer.py").write_text(
        f"REORDER = {list(range(21))}\n"       # wrong permutation
        "TIPS = [744, 320, 443, 554, 671]\n"   # wrong tips
    )
    rc, out = _run(tmp_path)
    assert rc == 1
    line = next(
        ln for ln in out.splitlines() if "] mano/joint-reorder:" in ln
    )
    assert line.startswith("[FAIL"), line
