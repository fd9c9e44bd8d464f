"""Checkpoint save/resume via Orbax.

Reference parity: ``meshreg/netscripts/reloadmodel.py`` — torch.save of
{epoch, state_dict, optimizer} per snapshot, ``reload_model`` with partial
key matching (warm-starting the warp stage from the baseline stage),
``reload_optimizer``. TPU-native equivalent: Orbax CheckpointManager over
the TrainState pytree (async-capable, multi-host safe), plus partial
restore (params only) for warm starts. Recovery contract (SURVEY.md §5.3):
restore-latest on restart.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from hocon.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None):
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    }
                )
            ),
            metrics=metrics,
        )

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore a full TrainState (shapes/dtypes from the template)."""
        step = step if step is not None else self._mgr.latest_step()
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(template))
        )["state"]
        return TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_params_only(self, state: TrainState,
                            step: Optional[int] = None) -> TrainState:
        """Warm start: load params (+BN stats), keep fresh optimizer state —
        the reference's baseline->warp-stage reload. PARTIAL matching: only
        subtrees present in BOTH the checkpoint and the target (with equal
        shapes) are loaded, so checkpoints transfer across model variants
        (e.g. hand+object baseline -> hand-only warp stage), mirroring the
        reference's non-strict ``reload_model``."""
        step = step if step is not None else self._mgr.latest_step()
        raw = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )["state"]
        params, n_p, skipped_p = _merge_partial(state.params, raw.get("params", {}))
        stats, n_s, skipped_s = _merge_partial(
            state.batch_stats, raw.get("batch_stats", {})
        )
        if n_p == 0:
            raise ValueError("warm start matched zero parameter arrays")
        skipped = skipped_p + skipped_s
        if skipped:
            print(f"[hocon] warm start: skipped {len(skipped)} unmatched "
                  f"arrays (e.g. {skipped[:3]})")
        return TrainState(
            params=params, batch_stats=stats,
            opt_state=state.opt_state, step=state.step,
        )


def _merge_partial(target, source, path=""):
    """Copy source leaves into target where paths exist and shapes match.

    Returns (merged, n_loaded, skipped_paths)."""
    import numpy as np

    if isinstance(target, dict):
        out = {}
        n = 0
        skipped = []
        src = source if isinstance(source, dict) else {}
        for k, v in target.items():
            merged, nk, sk = _merge_partial(v, src.get(k), f"{path}/{k}")
            out[k] = merged
            n += nk
            skipped += sk
        # Source-only keys are dropped (target structure wins).
        return out, n, skipped
    if source is None:
        return target, 0, [path + " (missing)"]
    if hasattr(target, "shape") and np.shape(source) != np.shape(target):
        return target, 0, [path + " (shape mismatch)"]
    import jax.numpy as jnp

    return jnp.asarray(source, dtype=getattr(target, "dtype", None)), 1, []


def restore_for_warm_start(directory: str, state: TrainState) -> TrainState:
    mgr = CheckpointManager(directory)
    if mgr.latest_step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    return mgr.restore_params_only(state)
