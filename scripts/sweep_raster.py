"""Sweep raster kernel tile sizes on the real TPU (MANO-mesh micro-bench).

Times the Pallas raster fwd and fwd+bwd at 256^2 on the synthetic MANO
hand (the same mesh scale as the bench step). All configs run in ONE
process (tile constants are re-read by reloading raster_pallas and
clearing soft_rasterize's jit cache) — per-process startup plus tunnel
compile latency makes one-config-per-process sweeps impractically slow.
"""

from __future__ import annotations

import importlib
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from hocon.geometry.mano import mano_forward, synthetic_mano_model
    from hocon.geometry.project import persp_project

    mano = synthetic_mano_model(0)
    b = 16
    verts, _ = mano_forward(
        mano, jnp.zeros((b, 15)), jnp.zeros((b, 10)), jnp.zeros((b, 3)),
        scale_mm=False,
    )
    verts = verts + jnp.asarray([0.0, 0.0, 0.6])
    k = jnp.tile(
        jnp.asarray([[220.0, 0, 128], [0, 220.0, 128], [0, 0, 1.0]])[None],
        (b, 1, 1),
    )
    vp = persp_project(verts, k)
    vz = verts[..., 2]
    attrs = vp * 0.01
    faces = mano.faces

    def run_cfg(fc, rb, xb):
        os.environ["HOCON_FACE_CHUNK"] = str(fc)
        os.environ["HOCON_ROW_BLOCK"] = str(rb)
        os.environ["HOCON_LANE_BLOCK"] = str(xb)
        import hocon.render.raster as R
        import hocon.render.raster_pallas as RP

        importlib.reload(RP)
        R.soft_rasterize.clear_cache()

        @jax.jit
        def fwd(vp, vz, attrs):
            o = R.soft_rasterize(
                vp, vz, faces, attrs, image_size=(256, 256), backend="pallas"
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
            f"FC={fc:>2} RB={rb:>2} XB={xb:>3} | fwd {t_f:6.2f} ms | "
            f"fwd+bwd {t_fb:6.2f} ms | bwd {t_fb - t_f:6.2f} ms",
            flush=True,
        )

    configs = [
        (32, 8, 256),  # current default
        (32, 16, 256),
        (64, 8, 256),
        (64, 16, 256),
        (16, 8, 256),
        (32, 32, 256),
    ]
    for fc, rb, xb in configs:
        run_cfg(fc, rb, xb)


if __name__ == "__main__":
    main()
