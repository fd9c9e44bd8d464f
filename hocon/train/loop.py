"""Epoch loop.

Reference parity: ``meshreg/netscripts/epochpass.py`` ``epoch_pass`` —
iterate the loader, run the (jitted) step, accumulate AverageMeters for
every loss term, feed EvalUtil when evaluating, periodic sample
visualization. The hot path is a single jitted step per batch; the host
only stacks numpy arrays and places them with the batch sharding.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from hocon.evaluation.zimeval import EvalUtil, VertexErrorMeter
from hocon.train.metrics import AverageMeters, StepTimer
from hocon.train.sharding import shard_batch


def epoch_pass(
    loader,
    state,
    step_fn: Callable,
    train: bool,
    epoch: int = 0,
    mesh=None,
    writer=None,
    max_steps: Optional[int] = None,
    vis_fn: Optional[Callable] = None,
    vis_freq: int = 0,
    pck_thresholds: Sequence[float] = (15.0, 30.0, 45.0),
) -> tuple:
    """Run one epoch. Returns (state, metrics dict).

    In train mode ``step_fn(state, batch) -> (state, terms)``.
    In eval mode ``step_fn(state, batch) -> preds`` and MPJPE / AUC /
    object vertex error are accumulated host-side (EvalUtil).
    """
    if not train and getattr(loader, "train_only", False):
        raise ValueError(
            f"{type(loader).__name__} is train-only (drops the dataset tail "
            "and carries no _valid masks); evaluation must use BatchLoader "
            "so every sample is scored exactly once."
        )
    meters = AverageMeters()
    timer = StepTimer()
    evaluator = EvalUtil() if not train else None
    obj_meter = VertexErrorMeter() if not train else None
    corner_meter = VertexErrorMeter() if not train else None

    # Train-mode metric handling is BATCHED: fetching every step's scalar
    # terms (or state.step) forces a host<->device round trip per step —
    # measured 30-100 ms over a tunnel, and a pipeline bubble even on a
    # local host. Terms stay on device (tiny scalars) and are fetched in
    # one transfer every ``metric_sync_steps``; step numbers come from a
    # host-side counter fetched once per epoch.
    step_base = None
    pending: list = []

    def _flush_pending():
        if not pending:
            return
        fetched = jax.device_get(pending)  # ONE sync for the whole window
        first = step_base + flushed_upto[0]
        for off, terms in enumerate(fetched):
            meters.update(terms)
            if writer is not None:
                writer.log_step(first + off, terms)
        flushed_upto[0] += len(fetched)
        pending.clear()

    flushed_upto = [0]
    metric_sync_steps = 20
    pending_eval = None

    def _score_eval(i, batch, preds):
        preds = jax.device_get(preds)
        gt_j = np.asarray(batch["joints3d"])
        # Wrap-around padding rows (drop_last=False) carry _valid == 0
        # and must not bias the metrics.
        keep = (
            np.asarray(batch["_valid"]) > 0
            if "_valid" in batch
            else np.ones(gt_j.shape[0], bool)
        )
        evaluator.feed(gt_j[keep], preds["joints_c_mm"][keep])
        if "obj_verts_c_mm" in preds and "objverts3d" in batch:
            ovm = (
                np.asarray(batch["obj_verts_mask"])[keep]
                if "obj_verts_mask" in batch
                else None
            )
            obj_meter.feed(
                np.asarray(batch["objverts3d"])[keep],
                preds["obj_verts_c_mm"][keep],
                ovm,
            )
        if "obj_corners_c_mm" in preds and "objcorners3d" in batch:
            corner_meter.feed(
                np.asarray(batch["objcorners3d"])[keep],
                preds["obj_corners_c_mm"][keep],
            )
        if vis_fn is not None and vis_freq and i % vis_freq == 0:
            vis_fn(epoch, i, jax.device_get(batch), preds)

    for i, batch in enumerate(loader.epoch(epoch)):
        if max_steps is not None and i >= max_steps:
            break
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        if train:
            if step_base is None:
                step_base = int(jax.device_get(state.step)) + 1
            state, terms = step_fn(state, batch)
            pending.append(terms)
            if len(pending) >= metric_sync_steps:
                _flush_pending()
        else:
            # One-deep pipeline: dispatch this batch's forward (async),
            # then score the PREVIOUS batch while the device runs — the
            # per-batch fetch no longer serializes device and host.
            preds = step_fn(state, batch)
            if pending_eval is not None:
                _score_eval(*pending_eval)
            pending_eval = (i, batch, preds)
        timer.tick()

    if pending_eval is not None:
        _score_eval(*pending_eval)
    _flush_pending()
    metrics = meters.averages()
    metrics["steps_per_sec"] = timer.rate()
    if not train:
        epe_mean, epe_med, auc, pck, thresh = evaluator.get_measures(0.0, 50.0, 20)
        metrics.update(
            mpjpe_mm=epe_mean, mpjpe_median_mm=epe_med, auc=auc,
        )
        # PCK curve samples (reference reports the curve alongside AUC):
        # interpolate the measured curve at the requested thresholds so the
        # report never silently depends on the linspace step.
        thresh = np.asarray(thresh, np.float64)
        pck = np.asarray(pck, np.float64)
        for t in pck_thresholds:
            metrics[f"pck@{float(t):.1f}mm"] = float(np.interp(t, thresh, pck))
        if obj_meter is not None and obj_meter._count:
            metrics["obj_verts_err_mm"] = obj_meter.mean
        if corner_meter is not None and corner_meter._count:
            metrics["obj_corners_err_mm"] = corner_meter.mean
    if writer is not None:
        writer.log_epoch(epoch, "train" if train else "val", metrics)
    return state, metrics
