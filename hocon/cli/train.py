"""Baseline supervised training CLI.

Reference parity: ``trainmeshreg.py`` — argparse flags, dataset/model/
optimizer construction, epoch loop with periodic eval + snapshots.

Example (synthetic smoke run):
  python -m hocon.cli.train --dataset synthetic --image_size 64 \
      --batch_size 8 --epochs 2 --use_objects
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from hocon.cli import opts
from hocon.data.factory import get_dataset
from hocon.data.pipeline import BatchLoader, probe_batch
from hocon.exp.args import save_args
from hocon.models.backbone import STAGE_SIZES as _IMPORT_STAGE_SIZES
from hocon.models.hocnet import HOCNet
from hocon.train.checkpoints import CheckpointManager, restore_for_warm_start
from hocon.train.loop import epoch_pass
from hocon.train.metrics import MetricWriter
from hocon.train.sharding import make_mesh, replicate
from hocon.train.state import create_train_state, make_optimizer
from hocon.train.steps import make_eval_step, make_train_step


def build_model(args, mano):
    import jax.numpy as jnp

    if (
        getattr(args, "torch_ckpt", "")
        and args.use_objects
        and args.obj_rot_param != "axisang"
    ):
        print(
            "[hocon] --torch_ckpt implies --obj_rot_param axisang (the "
            "reference regresses axis-angle; the 6d head has a different "
            "output width) — overriding."
        )
        args.obj_rot_param = "axisang"
    return HOCNet(
        ncomps=args.ncomps,
        center_idx=args.center_idx,
        with_object=args.use_objects,
        block_rot=args.block_rot,
        obj_rot_param=args.obj_rot_param,
        backbone=args.backbone,
        freeze_batchnorm=args.freeze_batchnorm,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


def apply_torch_init(args, model, state):
    """Handle ``--torch_trunk`` / ``--torch_ckpt``: import PyTorch weights
    into a freshly created (host-resident, un-replicated) TrainState.

    Precedence: callers apply this BEFORE resume/auto-restore/warm-start so
    any checkpoint restore overrides the import (the import is an *init*).
    """
    import dataclasses

    trunk_path = getattr(args, "torch_trunk", "")
    ckpt_path = getattr(args, "torch_ckpt", "")
    if not trunk_path and not ckpt_path:
        return state
    if trunk_path and ckpt_path:
        raise ValueError("--torch_trunk and --torch_ckpt are exclusive")
    if args.backbone not in _IMPORT_STAGE_SIZES:
        raise ValueError(
            f"torch import supports backbones "
            f"{sorted(_IMPORT_STAGE_SIZES)}, not {args.backbone!r}"
        )
    from hocon.utils.torch_import import (
        import_hocnet,
        import_trunk_into_hocnet,
        load_torch_checkpoint,
    )

    stages = _IMPORT_STAGE_SIZES[args.backbone]
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    if ckpt_path:
        sd = load_torch_checkpoint(ckpt_path)
        variables = import_hocnet(
            variables, sd, trunk_prefix=args.torch_trunk_prefix,
            stage_sizes=stages,
            strict_heads=not getattr(args, "torch_loose", False),
            model=model,
        )
        print(f"[hocon] imported reference checkpoint {ckpt_path}")
    else:
        sd = load_torch_checkpoint(trunk_path)
        variables = import_trunk_into_hocnet(
            variables, sd, prefix="", stage_sizes=stages
        )
        print(f"[hocon] imported ImageNet trunk weights from {trunk_path}")
    return dataclasses.replace(
        state, params=variables["params"],
        batch_stats=variables["batch_stats"],
    )


def hand_lambdas(args):
    return dict(
        lambda_verts3d=args.mano_lambda_verts3d,
        lambda_joints3d=args.mano_lambda_joints3d,
        lambda_joints2d=args.mano_lambda_joints2d,
        lambda_shape=args.mano_lambda_shape,
        lambda_pose=args.mano_lambda_pose_reg,
    )


def obj_lambdas(args):
    return dict(
        lambda_obj_verts3d=args.obj_lambda_verts3d,
        lambda_obj_verts2d=args.obj_lambda_verts2d,
    )


def setup_common(args):
    mano = opts.load_mano_or_synthetic(args.mano_assets, getattr(args, "mano_side", "right"))
    run_dir = os.path.join("checkpoints", args.exp_id)
    save_args(args, run_dir)
    writer = MetricWriter(run_dir)
    mesh = make_mesh()

    train_ds = get_dataset(
        args.dataset, args.split, args.data_root, args.image_size,
        fraction=args.fraction, use_objects=args.use_objects,
        pair_mode=getattr(args, "pair_mode", False),
        clip_len=getattr(args, "clip_len", 2),
        pair_spacing=args.spacing,
        pair_fixed_spacing=getattr(args, "pair_fixed_spacing", False),
        train=True, mano=mano, seed=args.seed,
        center_idx=args.center_idx,
        synth_videos=args.synth_videos, synth_frames=args.synth_frames,
        decimate_objects_to=getattr(args, "decimate_objects_to", 0),
        uint8_images=getattr(args, "uint8_images", False),
    )
    if getattr(args, "pair_mode", False) and getattr(args, "consist_gt_refs", False):
        from hocon.data.queries import BaseQueries

        pose_ds = train_ds.pose_dataset
        if (
            hasattr(pose_ds, "available_queries")
            and BaseQueries.VERTS3D not in pose_ds.available_queries()
        ):
            print(
                "[hocon] WARNING: --consist_gt_refs requested but the "
                f"{type(pose_ds).__name__} dataset serves no GT hand "
                "vertices (no MANO fits found); the warp will anchor on "
                "PREDICTED ref meshes instead (weaker, not the reference "
                "--consist_gt_refs protocol)."
            )
    val_ds = get_dataset(
        args.dataset, args.val_split, args.data_root, args.image_size,
        use_objects=args.use_objects, train=False, mano=mano, seed=args.seed,
        center_idx=args.center_idx,
        synth_videos=max(2, args.synth_videos // 4), synth_frames=args.synth_frames,
        decimate_objects_to=getattr(args, "decimate_objects_to", 0),
        uint8_images=getattr(args, "uint8_images", False),
    )
    if getattr(args, "check_data", False):
        from hocon.data.check import check_dataset

        n_bad = check_dataset(
            train_ds, args.split, max_seqs=args.check_data_seqs
        )
        n_bad += check_dataset(
            val_ds, args.val_split, max_seqs=args.check_data_seqs
        )
        raise SystemExit(1 if n_bad else 0)
    if args.workers > 0:
        from hocon.data.pipeline import GrainEpochLoader

        train_loader = GrainEpochLoader(
            train_ds, args.batch_size, seed=args.seed,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
            worker_count=args.workers,
        )
    else:
        train_loader = BatchLoader(
            train_ds, args.batch_size, seed=args.seed,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
            prefetch=getattr(args, "prefetch", 0),
        )
    # drop_last=False: in-training validation must score every sample
    # exactly once (same invariant evaluate.py enforces) — the tail-padded
    # rows carry _valid=0 masks, so metrics match hocon.cli.evaluate.
    # With --workers > 0 the sample assembly runs in Grain child processes
    # (GrainEvalLoader keeps BatchLoader's exact batches + _valid masks).
    from hocon.data.pipeline import GrainEvalLoader

    val_loader = GrainEvalLoader(
        val_ds, args.batch_size, shuffle=False, drop_last=False,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        worker_count=args.workers,
    )
    return mano, run_dir, writer, mesh, train_loader, val_loader


def main(argv=None):
    from hocon.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser("hocon.train")
    opts.add_exp_opts(parser)
    opts.add_net_opts(parser)
    opts.add_data_opts(parser)
    args = parser.parse_args(argv)

    mano, run_dir, writer, mesh, train_loader, val_loader = setup_common(args)
    model = build_model(args, mano)
    optimizer = make_optimizer(
        args.optimizer, args.lr, args.momentum, args.weight_decay,
        args.lr_decay_step, args.lr_decay_gamma, args.grad_clip,
    )

    sample = probe_batch(train_loader.dataset, train_loader.local_batch)
    state = create_train_state(
        model, mano, optimizer, sample, jax.random.PRNGKey(args.seed),
        with_object=args.use_objects,
    )
    state = apply_torch_init(args, model, state)
    state = replicate(state, mesh)

    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if args.resume:
        state = CheckpointManager(args.resume).restore(state)
        print(f"resumed from {args.resume} at step {int(state.step)}")
    elif ckpt.latest_step is not None:
        state = ckpt.restore(state)
        print(f"auto-restored latest snapshot (step {int(state.step)})")
    elif args.warm_start:
        state = restore_for_warm_start(args.warm_start, state)
        print(f"warm-started params from {args.warm_start}")

    train_step = make_train_step(
        model, mano, optimizer, hand_lambdas(args), obj_lambdas(args)
    )
    eval_step = make_eval_step(model, mano)
    max_steps = args.max_steps_per_epoch or None

    for epoch in range(args.epochs):
        if args.profile and epoch == 0:
            jax.profiler.start_trace(os.path.join(run_dir, "trace"))
        state, train_metrics = epoch_pass(
            train_loader, state, train_step, train=True, epoch=epoch,
            mesh=mesh, writer=writer, max_steps=max_steps,
        )
        if args.profile and epoch == 0:
            jax.profiler.stop_trace()
        print(f"[epoch {epoch}] train "
              f"loss={train_metrics.get('loss_total', float('nan')):.4f} "
              f"({train_metrics['steps_per_sec']:.2f} steps/s)")
        if (epoch + 1) % args.eval_freq == 0:
            vis_fn = None
            if args.vis_freq:
                from hocon.visualize.samplevis import sample_vis

                def vis_fn(ep, i, batch, preds):  # noqa: E306
                    sample_vis(
                        batch, preds,
                        os.path.join(run_dir, "images", f"ep{ep}_b{i}.png"),
                    )

            _, val_metrics = epoch_pass(
                val_loader, state, eval_step, train=False, epoch=epoch,
                writer=writer, mesh=mesh, max_steps=max_steps,
                vis_fn=vis_fn, vis_freq=args.vis_freq,
            )
            print(f"[epoch {epoch}] val MPJPE={val_metrics['mpjpe_mm']:.2f}mm "
                  f"AUC={val_metrics['auc']:.3f}")
        if (epoch + 1) % args.snapshot_freq == 0:
            ckpt.save(int(jax.device_get(state.step)), state)
    ckpt.wait()
    writer.plot_curves()
    writer.close()
    return state


if __name__ == "__main__":
    main()
