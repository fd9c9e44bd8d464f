"""TPU validation + timing for the round-5 kernel-body fast math.

Checks, on the real TPU with the realistic (~2.85k-face) scene:
  1. Mosaic lowering of `_kexp` (bitcast_convert_type exponent trick) and
     `_krcp` (pl.reciprocal approx + 2 Newton steps) actually compiles.
  2. Numerics: Pallas FAST vs Pallas exact (outputs + grads), and both vs
     the XLA oracle, reported as max-abs diffs against the 2e-5 parity
     tripwire.
  3. Timing: raster fwd and fwd+bwd, FAST on vs off (chained loops,
     CLAUDE.md timing methodology).

All arrays are passed as jit ARGUMENTS (axon closure-constant bug,
CLAUDE.md). A/B within one process via importlib.reload(raster_pallas) +
soft_rasterize.clear_cache(), like scripts/sweep_raster.py.

Usage: python scripts/check_fastmath_tpu.py [--obj_faces 1280]
"""

from __future__ import annotations

import argparse
import importlib
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obj_faces", type=int, default=1280)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hocon.geometry.mano import mano_forward, synthetic_mano_model
    from hocon.geometry.project import persp_project

    res = args.res
    b = args.batch
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
        from hocon.data.synthetic import uv_sphere

        sv, sf = uv_sphere(args.obj_faces)
        sv = sv * 0.06 + np.asarray([0.04, 0.0, 0.62], np.float32)
        overts = jnp.tile(jnp.asarray(sv)[None], (b, 1, 1))
        faces = jnp.concatenate(
            [jnp.asarray(faces), jnp.asarray(sf) + verts.shape[1]], axis=0
        )
        verts = jnp.concatenate([verts, overts], axis=1)
    print(f"mesh: {verts.shape[1]} verts / {faces.shape[0]} faces", flush=True)
    vp = persp_project(verts, k)
    vz = verts[..., 2]
    attrs = vp * 0.01

    def build(fast_exp, fast_rcp, backend):
        os.environ["HOCON_FAST_EXP"] = str(fast_exp)
        os.environ["HOCON_FAST_RCP"] = str(fast_rcp)
        import hocon.render.raster as R
        import hocon.render.raster_pallas as RP

        importlib.reload(RP)
        R.soft_rasterize.clear_cache()

        @jax.jit
        def fwd_out(vp, vz, attrs):
            o = R.soft_rasterize(
                vp, vz, faces, attrs, image_size=(res, res),
                sigma=0.8, gamma=0.05, backend=backend, backface_cull=True,
            )
            return o.sil, o.attr, o.vis, o.depth

        @jax.jit
        def loss(vp, vz, attrs):
            o = R.soft_rasterize(
                vp, vz, faces, attrs, image_size=(res, res),
                sigma=0.8, gamma=0.05, backend=backend, backface_cull=True,
            )
            return o.sil.sum() + (o.attr ** 2).sum() + o.vis.sum()

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        return fwd_out, bwd

    def timeit(fn, n=30):
        r = None
        for _ in range(5):
            r = fn(vp, vz, attrs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(vp, vz, attrs)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    results = {}
    for name, (fe, fr, bk) in {
        "fast": (1, 1, "pallas"),
        "exact": (0, 0, "pallas"),
        "xla": (0, 0, "xla"),
    }.items():
        t0 = time.perf_counter()
        fwd_out, bwd = build(fe, fr, bk)
        outs = jax.tree.map(np.asarray, fwd_out(vp, vz, attrs))
        grads = jax.tree.map(np.asarray, bwd(vp, vz, attrs))
        print(f"[{name}] compile+first-run: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t_f = timeit(fwd_out)
        t_fb = timeit(bwd)
        print(f"[{name}] fwd {t_f:6.2f} ms | fwd+bwd {t_fb:6.2f} ms | "
              f"bwd {t_fb - t_f:6.2f} ms", flush=True)
        results[name] = (outs, grads)

    def report(a, b, label):
        names = ["sil", "attr", "vis", "depth"]
        for n_, x, y in zip(names, a[0], b[0]):
            print(f"  {label} fwd  {n_:>5}: max|d|={np.abs(x - y).max():.3g}")
        for n_, x, y in zip(["d_vp", "d_vz", "d_attr"], a[1], b[1]):
            gn = max(np.abs(y).max(), 1e-30)
            cos = float(
                (x * y).sum()
                / max(np.linalg.norm(x) * np.linalg.norm(y), 1e-30)
            )
            print(f"  {label} grad {n_:>6}: max|d|={np.abs(x - y).max():.3g} "
                  f"rel={np.abs(x - y).max() / gn:.3g} cos={cos:.7f}")

    print("fast vs exact (both Pallas, TPU):", flush=True)
    report(results["fast"], results["exact"], "f/e")
    print("fast Pallas vs XLA oracle (TPU):", flush=True)
    report(results["fast"], results["xla"], "f/x")
    print("exact Pallas vs XLA oracle (TPU):", flush=True)
    report(results["exact"], results["xla"], "e/x")


if __name__ == "__main__":
    main()
