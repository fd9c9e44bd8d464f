"""Reproducibility helpers.

Reference parity: libyana ``exputils.argutils.save_args`` — dump the full
flag dict to the run dir (opt.txt human-readable + opt.json machine-
readable) at experiment start.
"""

from __future__ import annotations

import json
import os
import sys


def save_args(args, run_dir: str, prefix: str = "opt") -> None:
    os.makedirs(run_dir, exist_ok=True)
    d = vars(args) if hasattr(args, "__dict__") else dict(args)
    with open(os.path.join(run_dir, f"{prefix}.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n\n")
        for k in sorted(d):
            f.write(f"{k}: {d[k]}\n")
    with open(os.path.join(run_dir, f"{prefix}.json"), "w") as f:
        # Keep native JSON types (int/bool/str round-trip as themselves);
        # repr() only for values json cannot encode — a dump of all-repr
        # strings could not be reloaded as a typed config.
        json.dump(d, f, indent=1, default=repr)
