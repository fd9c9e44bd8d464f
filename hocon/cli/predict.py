"""Batch inference CLI — dump per-frame predictions for downstream use.

Beyond-reference convenience (the reference only prints metrics or dumps
the CodaLab zip): loads a checkpoint, runs a dataset split, and writes
``predictions.npz`` with camera-frame joints/vertices, root-centered mm
outputs, 2D keypoints, and (if enabled) object poses — the artifact a
serving/analysis pipeline consumes.

Example:
  python -m hocon.cli.predict --dataset synthetic --image_size 64 \
      --resume checkpoints/run/ckpt --out preds/
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from hocon.cli import opts
from hocon.cli.train import apply_torch_init, build_model
from hocon.data.factory import get_dataset
from hocon.data.pipeline import GrainEvalLoader, probe_batch
from hocon.train.checkpoints import CheckpointManager
from hocon.train.sharding import make_mesh, replicate, shard_batch
from hocon.train.state import create_train_state, make_optimizer
from hocon.train.steps import make_eval_step


def main(argv=None):
    from hocon.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser("hocon.predict")
    opts.add_exp_opts(parser)
    opts.add_net_opts(parser)
    opts.add_data_opts(parser)
    parser.add_argument("--out", default="preds", help="output directory")
    args = parser.parse_args(argv)

    mano = opts.load_mano_or_synthetic(args.mano_assets, getattr(args, "mano_side", "right"))
    mesh = make_mesh()
    ds = get_dataset(
        args.dataset, args.val_split, args.data_root, args.image_size,
        use_objects=args.use_objects, train=False, mano=mano, seed=args.seed,
        center_idx=args.center_idx,  # must match the model's root joint
        synth_videos=args.synth_videos, synth_frames=args.synth_frames,
        decimate_objects_to=getattr(args, "decimate_objects_to", 0),
        uint8_images=getattr(args, "uint8_images", False),
    )
    # UNSHARDED loader: predictions.npz must cover the FULL split exactly
    # once, so every process walks the same global batches (all must
    # participate in the jitted step) and only process 0 writes — the same
    # protocol as evaluate.py --dump_codalab. shard_batch still splits each
    # batch across the device mesh inside the step. GrainEvalLoader keeps
    # BatchLoader's exact batches + _valid masks; --workers > 0 moves the
    # per-sample decode/crop into child processes.
    loader = GrainEvalLoader(
        ds, args.batch_size, shuffle=False, drop_last=False,
        worker_count=args.workers,
    )

    model = build_model(args, mano)
    # probe_batch, not next(iter(loader)): pulling batch 0 from the loader
    # would spin up (and abandon) a Grain worker pool under --workers > 0.
    sample = probe_batch(ds, loader.local_batch)
    state = create_train_state(
        model, mano, make_optimizer(), sample, jax.random.PRNGKey(0),
        with_object=args.use_objects,
    )
    state = apply_torch_init(args, model, state)
    state = replicate(state, mesh)
    if args.resume:
        state = CheckpointManager(args.resume).restore(state)
        print(f"loaded checkpoint from {args.resume}")

    eval_step = make_eval_step(model, mano)
    collected: dict[str, list] = {}
    for batch in loader.epoch(0):
        keep = np.asarray(batch.pop("_valid")) > 0
        preds = eval_step(state, shard_batch(batch, mesh))
        if jax.process_count() > 1:
            # Step outputs are batch-sharded across processes; device_get
            # on a multi-process array raises. Gather onto every host.
            from jax.experimental import multihost_utils

            preds = multihost_utils.process_allgather(preds, tiled=True)
        preds = jax.device_get(preds)
        for k, v in preds.items():
            collected.setdefault(k, []).append(np.asarray(v)[keep])
    if jax.process_index() != 0:
        return None

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "predictions.npz")
    np.savez_compressed(
        out_path, **{k: np.concatenate(v) for k, v in collected.items()}
    )
    total = sum(len(a) for a in collected.get("joints_cam", []))
    print(f"wrote {total} frame predictions "
          f"({sorted(collected)}) to {out_path}")
    return out_path


if __name__ == "__main__":
    main()
