"""Decompose the warp train step cost on the real TPU.

Times each stage in isolation (chained K-step loops between host syncs —
the only reliable methodology over the axon tunnel, see CLAUDE.md):
  - supervised-only train step (trunk fwd/bwd + MANO + losses + Adam)
  - raster forward (hand+object planes, 256^2)
  - raster forward+backward (grad w.r.t. verts)
  - bilinear warp sampling fwd+bwd
  - SSIM fwd+bwd
  - full warp step (the bench number)

Usage: python scripts/profile_step.py [--res 256] [--batch 16]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, args, steps=30, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def timeit_state(step, state, batch, steps=30, warmup=3):
    """Like timeit but threads the (donated) train state through."""
    import jax
    import jax.numpy as jnp

    # Steps donate their input state; give this timing its own copy so the
    # caller's state survives for the next measurement.
    state = jax.tree_util.tree_map(jnp.copy, state)
    for _ in range(warmup):
        state, terms = step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, terms = step(state, batch)
    jax.block_until_ready(state.params)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--obj_faces", type=int, default=0,
                   help="isolated-raster mesh: add a UV-sphere object of "
                        "~this many faces (the realistic-object workload)")
    args = p.parse_args()

    from hocon.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from hocon.data.factory import get_dataset
    from hocon.data.pipeline import BatchLoader
    from hocon.geometry.mano import synthetic_mano_model
    from hocon.geometry.project import persp_project
    from hocon.models.hocnet import HOCNet
    from hocon.render.raster import face_planes, normalize_depth, soft_rasterize
    from hocon.render.ssim import ssim
    from hocon.render.warp import bilinear_sample
    from hocon.train.state import create_train_state, make_optimizer
    from hocon.train.steps import make_train_step, make_warp_train_step

    res, b = args.res, args.batch
    print(f"devices: {jax.devices()}")

    mano = synthetic_mano_model(0)
    ds = get_dataset(
        "synthetic", "train", image_size=res, use_objects=True, train=True,
        mano=mano, pair_mode=True, fraction=0.25, synth_videos=2,
        synth_frames=16, seed=0, synth_obj_faces=args.obj_faces,
    )
    loader = BatchLoader(ds, batch_size=b, seed=0, drop_last=False)
    # Pin the batch on device once: re-sending 25MB over the axon tunnel
    # every step would swamp every measurement.
    batch = jax.device_put(next(iter(loader)))

    model = HOCNet(with_object=True, freeze_batchnorm=True,
                   dtype=jnp.bfloat16)
    optimizer = make_optimizer("adam", 1e-4)
    state = create_train_state(
        model, mano, optimizer, batch["ref"], jax.random.PRNGKey(0)
    )

    # --- full warp step ---
    warp_step = make_warp_train_step(
        model, mano, optimizer, image_size=(res, res), backend="auto"
    )
    t = timeit_state(warp_step, state, batch, steps=args.steps)
    print(f"full warp step:        {t * 1e3:8.2f} ms  "
          f"({b / t:.1f} pairs/s)")

    # --- supervised-only step ---
    sup_step = make_train_step(model, mano, optimizer)
    t = timeit_state(sup_step, state, batch["ref"], steps=args.steps)
    print(f"supervised step:       {t * 1e3:8.2f} ms")

    # --- trunk (ResNet) fwd+bwd in isolation, with XLA-reported FLOPs ---
    # The warp step runs the trunk on 2*b images (ref + tgt jointly).
    from hocon.models.backbone import resnet18

    trunk = resnet18(dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(-2, 2, (2 * b, res, res, 3)),
        jnp.float32,
    )
    tvars = trunk.init(jax.random.PRNGKey(0), imgs[:1])

    def trunk_loss(params, x):
        feats = trunk.apply(
            {"params": params, "batch_stats": tvars["batch_stats"]}, x
        )
        return jnp.sum(feats.astype(jnp.float32) ** 2)

    trunk_fwdbwd = jax.jit(jax.grad(trunk_loss))

    def mfu(fn, fargs, t):
        try:
            cost = fn.lower(*fargs).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            return ""
        # v5e peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s f32 (MXU).
        return (f"  [{flops / 1e9:.1f} GFLOP -> {flops / t / 1e12:.1f} "
                f"TFLOP/s, {flops / t / 197e12 * 100:.1f}% of bf16 peak]")

    t = timeit(trunk_fwdbwd, (tvars["params"], imgs), steps=args.steps)
    print(f"trunk fwd+bwd (2b imgs):{t * 1e3:7.2f} ms"
          + mfu(trunk_fwdbwd, (tvars["params"], imgs), t))

    trunk_fwd = jax.jit(trunk_loss)
    t = timeit(trunk_fwd, (tvars["params"], imgs), steps=args.steps)
    print(f"trunk fwd (2b imgs):   {t * 1e3:8.2f} ms"
          + mfu(trunk_fwd, (tvars["params"], imgs), t))

    # --- raster fwd / fwd+bwd on representative mesh ---
    # A *posed* MANO hand, not random points: random verts under the real
    # face connectivity make every face span the whole point blob, so the
    # y/x chunk culling is inert and the isolated timing overstates the
    # in-step raster cost ~4x (round-4 finding — see KERNELS.md).
    from hocon.geometry.mano import mano_forward

    rng = np.random.default_rng(0)
    hand, _ = mano_forward(
        mano, jnp.zeros((b, 15)), jnp.zeros((b, 10)), jnp.zeros((b, 3)),
        scale_mm=False,
    )
    hand = hand + jnp.asarray([0.0, 0.0, 0.5])
    faces_h = np.asarray(mano.faces)
    n_hand = hand.shape[1]
    if args.obj_faces:
        from hocon.data.synthetic import uv_sphere

        sv, faces_o = uv_sphere(args.obj_faces)
        sv = sv * 0.06 + np.asarray([0.04, 0.0, 0.55], np.float32)
        obj = jnp.tile(jnp.asarray(sv)[None], (b, 1, 1))
    else:
        obj = jnp.asarray(
            rng.uniform(-0.05, 0.05, (b, 8, 3)), jnp.float32
        ) + jnp.asarray([0.0, 0.0, 0.55])
        faces_o = np.asarray(
            [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7], [0, 1, 5],
             [0, 5, 4], [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5],
             [0, 3, 7], [0, 7, 4]],
            np.int32,
        )
    verts = jnp.concatenate([hand, obj], axis=1)
    faces = np.concatenate([faces_h, np.asarray(faces_o) + n_hand])
    print(f"raster mesh: {verts.shape[1]} verts / {faces.shape[0]} faces")
    faces_b = jnp.broadcast_to(
        jnp.asarray(faces)[None], (b,) + faces.shape
    )
    k = jnp.tile(
        jnp.asarray(
            [[220.0, 0, res / 2], [0, 220.0, res / 2], [0, 0, 1.0]], jnp.float32
        )[None],
        (b, 1, 1),
    )
    pix = persp_project(verts, k)
    zs = verts[..., 2]
    attrs = pix  # flow-texture channels, like the warp loss

    @jax.jit
    def raster_fwd(pix, zs, attrs):
        out = soft_rasterize(
            pix, zs, faces_b, attrs=attrs, image_size=(res, res),
            backend="auto", backface_cull=True,  # the warp step's default
        )
        return out.sil.sum() + out.attr.sum() + out.vis.sum()

    t = timeit(raster_fwd, (pix, zs, attrs), steps=args.steps)
    print(f"raster fwd:            {t * 1e3:8.2f} ms")

    @jax.jit
    def raster_fwdbwd(pix, zs, attrs):
        return jax.grad(
            lambda p, z, a: raster_fwd(p, z, a).astype(jnp.float32),
            argnums=(0, 1, 2),
        )(pix, zs, attrs)

    t = timeit(raster_fwdbwd, (pix, zs, attrs), steps=args.steps)
    print(f"raster fwd+bwd:        {t * 1e3:8.2f} ms")

    # --- plane prep cost alone (fwd) ---
    @jax.jit
    def prep(pix, zs, attrs):
        planes = face_planes(pix, normalize_depth(zs), faces_b, attrs)
        return planes.rows.sum()

    t = timeit(prep, (pix, zs, attrs), steps=args.steps)
    print(f"plane prep (fwd only): {t * 1e3:8.2f} ms")

    # --- bilinear sampling fwd+bwd ---
    # Two query patterns: uniform-random (worst case — every source-row
    # segment live in every block) and the REAL warp coords (this scene's
    # rendered flow texture: background ~0, object rows clustered), which
    # the sampler's segmented-K row selection exploits.
    img = jnp.asarray(rng.uniform(0, 1, (b, res, res, 3)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(0, res, (b, res, res, 2)), jnp.float32
    )

    @jax.jit
    def samp_fwdbwd(img, coords):
        return jax.grad(
            lambda i, c: bilinear_sample(i, c).sum(), argnums=(0, 1)
        )(img, coords)

    t = timeit(samp_fwdbwd, (img, coords), steps=args.steps)
    print(f"bilinear fwd+bwd (uniform-random coords): {t * 1e3:8.2f} ms")

    flow = jax.jit(lambda p, z, a: soft_rasterize(
        p, z, faces_b, attrs=a, image_size=(res, res), backend="auto",
        backface_cull=True,
    ).attr)(pix, zs, attrs)
    coords_warp = jax.lax.stop_gradient(flow[..., :2])
    t = timeit(samp_fwdbwd, (img, coords_warp), steps=args.steps)
    print(f"bilinear fwd+bwd (real warp coords):      {t * 1e3:8.2f} ms")

    # --- SSIM fwd+bwd ---
    img2 = jnp.asarray(rng.uniform(0, 1, (b, res, res, 3)), jnp.float32)

    @jax.jit
    def ssim_fwdbwd(a, c):
        return jax.grad(lambda x, y: jnp.sum(ssim(x, y)))(a, c)

    t = timeit(ssim_fwdbwd, (img, img2), steps=args.steps)
    print(f"ssim fwd+bwd:          {t * 1e3:8.2f} ms")

    # --- residual slice: MANO layer and the Adam update in isolation ---
    # (closes the "MANO + losses + Adam ~4.4 ms" bucket of the round-4
    # decomposition into its two candidate costs; the warp step runs the
    # MANO layer on 2b samples, ref + tgt.)
    pose = jnp.zeros((2 * b, 15))
    betas = jnp.zeros((2 * b, 10))
    rot = jnp.zeros((2 * b, 3))

    @jax.jit
    def mano_fwdbwd(pose, betas, rot):
        def f(p, s, r):
            v, j = mano_forward(mano, p, s, r, scale_mm=False)
            return jnp.sum(v) + jnp.sum(j)

        return jax.grad(f, argnums=(0, 1, 2))(pose, betas, rot)

    t = timeit(mano_fwdbwd, (pose, betas, rot), steps=args.steps)
    print(f"mano fwd+bwd (2b):     {t * 1e3:8.2f} ms")

    grads_like = jax.tree_util.tree_map(jnp.ones_like, state.params)

    @jax.jit
    def adam_update(grads, opt_state, params):
        updates, new_opt = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), new_opt

    t = timeit(
        adam_update, (grads_like, state.opt_state, state.params),
        steps=args.steps,
    )
    print(f"adam update alone:     {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
