"""Summarize consistency-gain seed runs (VERDICT r4 #5).

Reads `repro_synthetic_consistency.py` result-JSON lines (one per seed)
from the given log/JSON files plus the hard-coded table of committed
rounds-2/4 results, groups by workload (obj_faces), and prints per-group
mean/std of the gain, the one-sided paired t statistic against zero, and
a normal-approximation p-value — the significance statement RESULTS.md
quotes.

Usage: python scripts/summarize_consistency.py [log_or_json ...]
With no arguments, scans every committed `measurements/tpu_batch_*.log`
— the argless call reproduces every seed table in RESULTS.md.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

# Committed results from RESULTS.md (rounds 2 and 4) keyed by
# (obj_faces, fraction, frames_per_video, seed) -> gain vs the
# equal-compute control, in mm. (Rounds 2/4 all ran the default
# fraction=0.125, frames=8 protocol.)
COMMITTED = {
    (0, 0.125, 8, 2.0, 3, 0): 5.05, (0, 0.125, 8, 2.0, 3, 1): -0.40,
    (0, 0.125, 8, 2.0, 3, 2): 1.96,
    (1280, 0.125, 8, 2.0, 3, 0): -0.82, (1280, 0.125, 8, 2.0, 3, 1): 1.07,
    (1280, 0.125, 8, 2.0, 3, 2): 0.53, (1280, 0.125, 8, 2.0, 3, 3): 1.79,
    (1280, 0.125, 8, 2.0, 3, 4): 0.70, (1280, 0.125, 8, 2.0, 3, 5): 0.89,
}


def t_stats(gains):
    n = len(gains)
    mean = sum(gains) / n
    var = sum((g - mean) ** 2 for g in gains) / (n - 1) if n > 1 else 0.0
    std = math.sqrt(var)
    t = mean / (std / math.sqrt(n)) if std > 0 else float("inf")
    # One-sided p via the normal approximation (adequate at n>=10; the
    # exact t CDF isn't in the stdlib and scipy is not a dependency).
    p = 0.5 * math.erfc(t / math.sqrt(2.0))
    return mean, std, t, p


def main(paths):
    rows = dict(COMMITTED)
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not (line.startswith("{") and "consistency_gain_mm" in line):
                    continue
                # Logs may prefix-wrap JSON; grab the outermost object.
                m = re.search(r"\{.*\}", line)
                try:
                    d = json.loads(m.group(0))
                except (json.JSONDecodeError, AttributeError):
                    continue
                key = (d["obj_faces"], d.get("fraction", 0.125),
                       d.get("frames_per_video", 8),
                       d.get("lambda_consist", 2.0),
                       d.get("spacing", 3), d["seed"])
                gain = d["consistency_gain_mm"]
                if math.isfinite(gain):  # fraction=1.0 has no unannotated
                    rows[key] = gain     # frames -> NaN; skip such runs

    for faces, frac, frames, lam, spc in sorted({k[:5] for k in rows}):
        group = (faces, frac, frames, lam, spc)
        seeds = sorted(k[5] for k in rows if k[:5] == group)
        gains = [rows[group + (s,)] for s in seeds]
        mean, std, t, p = t_stats(gains)
        name = "box (12-face)" if faces == 0 else f"realistic ({faces}-face)"
        pos = sum(g > 0 for g in gains)
        lam_tag = "" if lam == 2.0 else f", lambda_consist={lam:g}"
        spc_tag = "" if spc == 3 else f", spacing={spc}"
        print(f"{name}, fraction={frac:g}, {frames}-frame videos"
              f"{lam_tag}{spc_tag}: n={len(gains)} seeds={seeds}")
        print(f"  gains: {gains}")
        print(f"  mean {mean:+.2f} mm  std {std:.2f}  {pos}/{len(gains)} "
              f"positive  one-sided t={t:.2f}  p~{p:.4f}")


if __name__ == "__main__":
    paths = sys.argv[1:]
    if not paths:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(p for p in glob.glob(os.path.join(
            repo, "measurements", "tpu_batch_*.log"))
            if "_attempt" not in os.path.basename(p))
    main(paths)
