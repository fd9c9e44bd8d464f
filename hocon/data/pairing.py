"""Temporal frame-pair target sampling, shared by all pose datasets.

Reference parity: the frame-pair protocol of ``trainmeshwarp.py`` /
``[pub:meshreg/datasets/fhbhands.py]`` — pairs are (annotated ref frame,
temporally offset target frame) within one video, offset bounded by
``--spacing``.

VERIFY (reference tree empty — SURVEY.md preamble): whether the
reference's ``--spacing`` is the MAXIMUM of a random offset (our default)
or a FIXED offset is unconfirmed and materially affects the headline
consistency experiment. ``fixed=True`` (CLI: ``--pair_fixed_spacing``)
implements the fixed-offset reading so the protocol can be matched exactly
once ``scripts/verify_reference.py`` can confirm it.
"""

from __future__ import annotations

import numpy as np


def pair_target(
    ref: int,
    count: int,
    spacing: int,
    rng: np.random.Generator,
    fixed: bool = False,
) -> int:
    """Sequence-local target index for a ref frame.

    Default: offset magnitude uniform in [1, spacing], random sign, clipped
    to the sequence. ``fixed``: magnitude exactly ``spacing``; at sequence
    edges the sign flips inward first (keeping |tgt-ref| == spacing where
    possible) before falling back to clipping.
    """
    mag = spacing if fixed else int(rng.integers(1, spacing + 1))
    sign = 1 if rng.random() < 0.5 else -1
    cand = ref + sign * mag
    if fixed and not (0 <= cand < count):
        cand = ref - sign * mag
    tgt = int(np.clip(cand, 0, count - 1))
    if tgt == ref:
        tgt = min(ref + 1, count - 1)
    return tgt
