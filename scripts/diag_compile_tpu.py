"""Apportion the warp-step compile time on the real TPU (VERDICT r4 #3).

Round-4 bench logs showed compile+warmup at 241-324 s on a healthy tunnel
vs the "normal ~24 s" from early rounds. scripts/diag_compile.py already
split the CPU side (trace+lower ~5 s, CPU XLA ~33 s with Pallas kernels
interpreted, i.e. excluded). This script times, in ONE process on the TPU:

  1. trivial matmul jit           — tunnel RTT + compile-service floor
  2. raster fwd jit               — 1 Mosaic kernel + small XLA graph
  3. raster fwd+bwd (grad) jit    — 2 Mosaic kernels
  4. bilinear sampler fwd+bwd jit — 2 more Mosaic kernels
  5. full warp train step, AOT    — trace+lower / XLA+Mosaic compile split

so the 4-5 min window can be attributed per kernel vs graph vs tunnel.

Usage: python scripts/diag_compile_tpu.py [--obj_faces 1280]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obj_faces", type=int, default=1280)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    res, b = args.res, args.batch

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"import jax: {time.perf_counter() - t0:.1f}s "
        f"platform={jax.devices()[0].platform}")

    # 1. compile-service floor
    t0 = time.perf_counter()
    x = jnp.ones((512, 512))
    jax.jit(lambda a: a @ a)(x).block_until_ready()
    log(f"[1] trivial matmul jit: {time.perf_counter() - t0:.1f}s")

    from hocon.data.synthetic import uv_sphere
    from hocon.geometry.mano import mano_forward, synthetic_mano_model
    from hocon.geometry.project import persp_project
    from hocon.render import raster as R

    mano = synthetic_mano_model(0)
    verts, _ = mano_forward(
        mano, jnp.zeros((b, 15)), jnp.zeros((b, 10)), jnp.zeros((b, 3)),
        scale_mm=False,
    )
    verts = verts + jnp.asarray([0.0, 0.0, 0.6])
    foc = res * 0.86
    k = jnp.tile(
        jnp.asarray([[foc, 0, res / 2], [0, foc, res / 2], [0, 0, 1.0]])[None],
        (b, 1, 1),
    )
    faces = mano.faces
    if args.obj_faces:
        sv, sf = uv_sphere(args.obj_faces)
        sv = sv * 0.06 + np.asarray([0.04, 0.0, 0.62], np.float32)
        overts = jnp.tile(jnp.asarray(sv)[None], (b, 1, 1))
        faces = jnp.concatenate(
            [jnp.asarray(faces), jnp.asarray(sf) + verts.shape[1]], axis=0
        )
        verts = jnp.concatenate([verts, overts], axis=1)
    vp = persp_project(verts, k)
    vz = verts[..., 2]
    attrs = vp * 0.01

    # 2. raster forward only (1 Mosaic kernel)
    def rfwd(vp, vz, attrs):
        o = R.soft_rasterize(
            vp, vz, faces, attrs, image_size=(res, res), sigma=0.8,
            gamma=0.05, backend="pallas", backface_cull=True,
        )
        return o.sil.sum() + o.attr.sum() + o.vis.sum()

    t0 = time.perf_counter()
    jax.jit(rfwd)(vp, vz, attrs).block_until_ready()
    log(f"[2] raster fwd jit (1 Mosaic kernel): "
        f"{time.perf_counter() - t0:.1f}s")

    # 3. raster fwd+bwd (adds the bwd Mosaic kernel)
    t0 = time.perf_counter()
    g = jax.jit(jax.grad(rfwd, argnums=(0, 1, 2)))(vp, vz, attrs)
    jax.block_until_ready(g)
    log(f"[3] raster grad jit (+1 Mosaic kernel): "
        f"{time.perf_counter() - t0:.1f}s")

    # 4. bilinear sampler fwd+bwd (2 more Mosaic kernels)
    from hocon.render.sample_pallas import bilinear_sample_pallas

    img = jnp.ones((b, res, res, 3))
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(res, dtype=jnp.float32),
                     jnp.arange(res, dtype=jnp.float32))[::-1], -1
    )[None].repeat(b, 0) * 0.97

    def sfwd(coords, img):
        return bilinear_sample_pallas(img, coords).sum()

    t0 = time.perf_counter()
    gs = jax.jit(jax.grad(sfwd))(coords, img)
    jax.block_until_ready(gs)
    log(f"[4] bilinear fwd+bwd jit (2 Mosaic kernels): "
        f"{time.perf_counter() - t0:.1f}s")

    # 5. full warp train step, AOT phase split
    from hocon.data.factory import get_dataset
    from hocon.data.pipeline import BatchLoader
    from hocon.models.hocnet import HOCNet
    from hocon.train.state import create_train_state, make_optimizer
    from hocon.train.steps import make_warp_train_step

    ds = get_dataset(
        "synthetic", "train", image_size=res, use_objects=True, train=True,
        mano=mano, pair_mode=True, fraction=0.25, synth_videos=2,
        synth_frames=max(4, b), seed=0, synth_obj_faces=args.obj_faces,
    )
    batch = next(iter(BatchLoader(ds, batch_size=b, seed=0)))
    model = HOCNet(with_object=True, freeze_batchnorm=True,
                   dtype=jnp.bfloat16)
    optimizer = make_optimizer("adam", 1e-4)
    state = create_train_state(model, mano, optimizer, batch["ref"],
                               jax.random.PRNGKey(0), with_object=True)
    step = make_warp_train_step(model, mano, optimizer,
                                image_size=(res, res), backend="pallas")
    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    log(f"[5a] warp step trace+lower: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f"[5b] warp step XLA+Mosaic compile: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = compiled(state, batch)
    jax.block_until_ready(out[0].params)
    log(f"[5c] warp step first run: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
