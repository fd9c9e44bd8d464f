"""Sweep raster kernel tile sizes on the real TPU (MANO-mesh micro-bench).

Times the Pallas raster fwd and fwd+bwd at 256^2 on the synthetic MANO
hand (the same mesh scale as the bench step). All configs run in ONE
process (tile constants are re-read by reloading raster_pallas and
clearing soft_rasterize's jit cache) — per-process startup plus tunnel
compile latency makes one-config-per-process sweeps impractically slow.
"""

from __future__ import annotations

import argparse
import importlib
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument(
        "--obj_faces", type=int, default=0,
        help="add a UV-sphere object of ~this many faces next to the hand "
             "(the bench's realistic-object workload)",
    )
    ap.add_argument(
        "--cull", action="store_true",
        help="enable backface culling (the warp step's default), so the "
             "sweep sees the production chunk occupancy",
    )
    ap.add_argument(
        "--configs", nargs="*", default=None,
        help="fc,rb,xb[,cutoff_sigmas] tuples, e.g. 32,8,256 32,8,256,3.5",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hocon.geometry.mano import mano_forward, synthetic_mano_model
    from hocon.geometry.project import persp_project

    res = args.res
    mano = synthetic_mano_model(0)
    b = args.batch
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
        import numpy as np

        from hocon.data.synthetic import uv_sphere

        sv, sf = uv_sphere(args.obj_faces)
        sv = sv * 0.06 + np.asarray([0.04, 0.0, 0.62], np.float32)
        overts = jnp.tile(jnp.asarray(sv)[None], (b, 1, 1))
        faces = jnp.concatenate(
            [jnp.asarray(faces), jnp.asarray(sf) + verts.shape[1]], axis=0
        )
        verts = jnp.concatenate([verts, overts], axis=1)
        print(f"mesh: {verts.shape[1]} verts / {faces.shape[0]} faces")
    vp = persp_project(verts, k)
    vz = verts[..., 2]
    attrs = vp * 0.01

    def run_cfg(fc, rb, xb, cutoff=4.5):
        os.environ["HOCON_FACE_CHUNK"] = str(fc)
        os.environ["HOCON_ROW_BLOCK"] = str(rb)
        os.environ["HOCON_LANE_BLOCK"] = str(xb)
        os.environ["HOCON_CUTOFF_SIGMAS"] = str(cutoff)
        import hocon.render.raster as R
        import hocon.render.raster_pallas as RP

        importlib.reload(RP)
        R.soft_rasterize.clear_cache()

        @jax.jit
        def fwd(vp, vz, attrs):
            o = R.soft_rasterize(
                vp, vz, faces, attrs, image_size=(res, res),
                backend="pallas", backface_cull=args.cull,
            )
            return o.sil.sum() + o.attr.sum() + o.vis.sum()

        bwd = jax.jit(jax.grad(fwd, argnums=(0, 1, 2)))

        def timeit(fn, n=20):
            r = None
            for _ in range(5):
                r = fn(vp, vz, attrs)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(vp, vz, attrs)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n * 1e3

        t_f = timeit(fwd)
        t_fb = timeit(bwd)
        print(
            f"FC={fc:>2} RB={rb:>2} XB={xb:>3} CUT={cutoff:3.1f} | "
            f"fwd {t_f:6.2f} ms"
            f" | fwd+bwd {t_fb:6.2f} ms | bwd {t_fb - t_f:6.2f} ms",
            flush=True,
        )

    if args.configs:
        configs = [
            tuple(
                float(v) if i == 3 else int(v)
                for i, v in enumerate(c.split(","))
            )
            for c in args.configs
        ]
    else:
        configs = [
            (32, 8, 256),  # current default
            (32, 16, 256),
            (64, 8, 256),
            (64, 16, 256),
            (16, 8, 256),
            (32, 32, 256),
        ]
    for cfg in configs:
        run_cfg(*cfg)


if __name__ == "__main__":
    main()
