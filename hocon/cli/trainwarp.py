"""Photometric-consistency training CLI (frame pairs, sparse supervision).

Reference parity: ``trainmeshwarp.py`` — frame-PAIR dataset, warp loss
through the differentiable renderer, typically warm-started from a
baseline checkpoint (--warm_start) and run with a small --fraction.

Example (synthetic smoke run):
  python -m hocon.cli.trainwarp --dataset synthetic --image_size 64 \
      --batch_size 4 --epochs 2 --fraction 0.25 --use_objects
"""

from __future__ import annotations

import argparse
import os

import jax

from hocon.cli import opts
from hocon.cli.train import (
    apply_torch_init,
    build_model,
    hand_lambdas,
    obj_lambdas,
    setup_common,
)
from hocon.train.checkpoints import CheckpointManager, restore_for_warm_start
from hocon.train.loop import epoch_pass
from hocon.train.sharding import replicate
from hocon.train.state import create_train_state, make_optimizer
from hocon.train.steps import make_eval_step, make_warp_train_step


def main(argv=None):
    from hocon.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser("hocon.trainwarp")
    opts.add_exp_opts(parser)
    opts.add_net_opts(parser)
    opts.add_data_opts(parser)
    opts.add_warp_opts(parser)
    args = parser.parse_args(argv)
    args.pair_mode = True

    mano, run_dir, writer, mesh, train_loader, val_loader = setup_common(args)
    model = build_model(args, mano)
    optimizer = make_optimizer(
        args.optimizer, args.lr, args.momentum, args.weight_decay,
        args.lr_decay_step, args.lr_decay_gamma, args.grad_clip,
    )

    from hocon.data.pipeline import probe_batch

    sample = probe_batch(train_loader.dataset, train_loader.local_batch)
    state = create_train_state(
        model, mano, optimizer, sample["ref"], jax.random.PRNGKey(args.seed),
        with_object=args.use_objects,
    )
    state = apply_torch_init(args, model, state)
    state = replicate(state, mesh)

    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if args.resume:
        state = CheckpointManager(args.resume).restore(state)
    elif ckpt.latest_step is not None:
        state = ckpt.restore(state)
    elif args.warm_start:
        state = restore_for_warm_start(args.warm_start, state)
        print(f"warm-started params from {args.warm_start}")

    train_step = make_warp_train_step(
        model, mano, optimizer,
        image_size=(args.image_size, args.image_size),
        hand_lambdas=hand_lambdas(args), obj_lambdas=obj_lambdas(args),
        lambda_consist=args.lambda_consist,
        consist_gt_refs=args.consist_gt_refs,
        sigma=args.raster_sigma, gamma=args.raster_gamma,
        backend=args.raster_backend, photo_downscale=args.photo_downscale,
    )
    eval_step = make_eval_step(model, mano)
    max_steps = args.max_steps_per_epoch or None

    vis_batch = sample if args.vis_freq else None
    for epoch in range(args.epochs):
        state, train_metrics = epoch_pass(
            train_loader, state, train_step, train=True, epoch=epoch,
            mesh=mesh, writer=writer, max_steps=max_steps,
        )
        # Warp panels every N EPOCHS here (there is no per-batch eval
        # visualization hook in warp training; see --vis_freq help).
        if vis_batch is not None and (epoch + 1) % args.vis_freq == 0:
            from hocon.visualize.warpvis import save_warp_panels

            save_warp_panels(
                model, mano, state, vis_batch,
                os.path.join(run_dir, "images", f"warp_ep{epoch}.png"),
                image_size=(args.image_size, args.image_size),
                backend=args.raster_backend,
                consist_gt_refs=args.consist_gt_refs,
                sigma=args.raster_sigma, gamma=args.raster_gamma,
            )
        print(f"[epoch {epoch}] train "
              f"loss={train_metrics.get('loss_total', float('nan')):.4f} "
              f"photo={train_metrics.get('photo_total', float('nan')):.4f} "
              f"({train_metrics['steps_per_sec']:.2f} steps/s)")
        if (epoch + 1) % args.eval_freq == 0:
            _, val_metrics = epoch_pass(
                val_loader, state, eval_step, train=False, epoch=epoch,
                writer=writer, mesh=mesh, max_steps=max_steps,
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
