"""Evaluation CLI.

Reference parity: ``evalmeshreg.py`` — load a checkpoint, run the val/test
split, print MPJPE / AUC / object vertex error, and (HO-3D) dump the
CodaLab pred.json zip.

Example:
  python -m hocon.cli.evaluate --dataset synthetic --image_size 64 \
      --resume checkpoints/run/ckpt
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
from hocon.evaluation.codalab import dump_ho3d_codalab
from hocon.train.checkpoints import CheckpointManager
from hocon.train.loop import epoch_pass
from hocon.train.sharding import make_mesh, replicate, shard_batch
from hocon.train.state import create_train_state, make_optimizer
from hocon.train.steps import make_eval_step


def main(argv=None):
    from hocon.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser("hocon.evaluate")
    opts.add_exp_opts(parser)
    opts.add_net_opts(parser)
    opts.add_data_opts(parser)
    parser.add_argument("--dump_codalab", default="",
                        help="dir to write HO-3D pred.zip into")
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
    if getattr(args, "check_data", False):
        from hocon.data.check import check_dataset

        raise SystemExit(
            1 if check_dataset(ds, args.val_split,
                               max_seqs=args.check_data_seqs) else 0
        )
    # --workers > 0 moves JPEG decode / crop per sample into Grain child
    # processes; batches and _valid masks are bit-identical to workers=0.
    loader = GrainEvalLoader(
        ds, args.batch_size, shuffle=False, drop_last=False,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        worker_count=args.workers,
    )

    model = build_model(args, mano)
    optimizer = make_optimizer(args.optimizer, args.lr)
    # Shape-probe directly from the dataset: pulling the probe from the
    # loader would spin up (and abandon) a Grain worker pool when
    # --workers > 0.
    sample = probe_batch(ds, loader.local_batch)
    state = create_train_state(
        model, mano, optimizer, sample, jax.random.PRNGKey(0),
        with_object=args.use_objects,
    )
    state = apply_torch_init(args, model, state)
    state = replicate(state, mesh)
    if args.resume:
        state = CheckpointManager(args.resume).restore(state)
        print(f"loaded checkpoint from {args.resume}")

    eval_step = make_eval_step(model, mano)

    if args.dump_codalab:
        # The submission must cover the FULL split exactly once. EVERY
        # process runs the same unsharded loop (all must participate in the
        # jitted step — a process-0-only compute path would deadlock a
        # multi-process mesh); only process 0 writes the file.
        dump_loader = GrainEvalLoader(
            ds, args.batch_size, shuffle=False, drop_last=False,
            worker_count=args.workers,
        )
        all_joints, all_verts = [], []
        for batch in dump_loader.epoch(0):
            # GrainEvalLoader always provides _valid; fail loudly if a loader
            # variant ever drops it (a defaulted mask of the wrong length
            # would silently truncate the submission).
            keep = np.asarray(batch.pop("_valid")) > 0
            preds = eval_step(state, shard_batch(batch, mesh))
            if jax.process_count() > 1:
                # The step's outputs are batch-sharded across processes;
                # device_get on a multi-process array raises. Gather the
                # full value onto every host first (all hosts participate).
                from jax.experimental import multihost_utils

                preds = multihost_utils.process_allgather(preds, tiled=True)
            preds = jax.device_get(preds)
            all_joints.append(preds["joints_cam"][keep])
            all_verts.append(preds["verts_cam"][keep])
        if jax.process_index() != 0:
            return
        zip_path = dump_ho3d_codalab(
            np.concatenate(all_joints), np.concatenate(all_verts),
            args.dump_codalab,
        )
        print(f"CodaLab submission written to {zip_path}")
        return

    _, metrics = epoch_pass(
        loader, state, eval_step, train=False, epoch=0, mesh=mesh,
        max_steps=args.max_steps_per_epoch or None,
    )
    print(f"MPJPE: {metrics['mpjpe_mm']:.2f} mm (median "
          f"{metrics['mpjpe_median_mm']:.2f}), AUC(0-50mm): {metrics['auc']:.4f}")
    if "obj_verts_err_mm" in metrics:
        print(f"object vertex error: {metrics['obj_verts_err_mm']:.2f} mm")
    return metrics


if __name__ == "__main__":
    main()
