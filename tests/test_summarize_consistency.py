"""Tests for scripts/summarize_consistency.py (seed-table statistics)."""

import importlib.util
import json
import math
import pathlib
import sys

_SPEC = importlib.util.spec_from_file_location(
    "summarize_consistency",
    pathlib.Path(__file__).parent.parent / "scripts" / "summarize_consistency.py",
)
sc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sc)


def test_t_stats_known_values():
    mean, std, t, p = sc.t_stats([1.0, 1.0, 1.0, 1.0])
    assert mean == 1.0 and std == 0.0 and math.isinf(t) and p == 0.0

    gains = [-0.82, 1.07, 0.53, 1.79, 0.70, 0.89]
    mean, std, t, p = sc.t_stats(gains)
    assert abs(mean - 0.6933) < 1e-3
    assert abs(std - 0.8602) < 1e-3
    assert abs(t - 1.974) < 1e-2
    assert 0.0 < p < 0.05


def test_log_parsing_merges_and_overrides(tmp_path, capsys):
    log = tmp_path / "batch.log"
    lines = [
        "=== [consist-box] 10:00:00 :: python ...",  # non-JSON noise
        json.dumps({"seed": 3, "obj_faces": 0, "consistency_gain_mm": 2.0}),
        json.dumps({"seed": 0, "obj_faces": 0, "consistency_gain_mm": 9.9}),
        # A sparsity-ablation row must form its OWN group, not merge into
        # the default fraction=0.125/frames=8 table.
        json.dumps({"seed": 0, "obj_faces": 0, "fraction": 0.0625,
                    "frames_per_video": 16, "consistency_gain_mm": 4.0}),
        '{"broken json": ',  # must not crash the parser
    ]
    log.write_text("\n".join(lines) + "\n")
    sc.main([str(log)])
    out = capsys.readouterr().out
    # Committed seed 0 (5.05) is overridden by the log's 9.9; seed 3 added.
    assert ("box (12-face), fraction=0.125, 8-frame videos: "
            "n=4 seeds=[0, 1, 2, 3]") in out
    assert "9.9" in out and "5.05" not in out
    assert ("box (12-face), fraction=0.0625, 16-frame videos: "
            "n=1 seeds=[0]") in out
    assert "realistic (1280-face), fraction=0.125, 8-frame videos: n=6" in out
