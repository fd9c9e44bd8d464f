"""Diagnose the warp-step compile blow-up (VERDICT r4 #3).

Round-4 bench logs show compile+warmup at 241-458 s on a HEALTHY tunnel
(probe 1.7-2.2 s) vs the "normal ~24 s" noted in CLAUDE.md early rounds.
This script splits the cost locally on the CPU backend: trace+lower time,
XLA compile time, and HLO op counts of the lowered module — so we can tell
graph-side cost (our kernels/unrolled loops) from tunnel-side cost.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python scripts/diag_compile.py [--obj_faces N] [--res R]
"""

from __future__ import annotations

import argparse
import collections
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

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from hocon.data.factory import get_dataset
    from hocon.data.pipeline import BatchLoader
    from hocon.geometry.mano import synthetic_mano_model
    from hocon.models.hocnet import HOCNet
    from hocon.train.sharding import make_mesh, replicate, shard_batch
    from hocon.train.state import create_train_state, make_optimizer
    from hocon.train.steps import make_warp_train_step

    log(f"imports: {time.perf_counter() - t0:.1f}s; platform="
        f"{jax.devices()[0].platform}")

    mano = synthetic_mano_model(0)
    ds = get_dataset(
        "synthetic", "train", image_size=args.res, use_objects=True,
        train=True, mano=mano, pair_mode=True, fraction=0.25, synth_videos=2,
        synth_frames=max(4, args.batch), seed=0,
        synth_obj_faces=args.obj_faces,
    )
    loader = BatchLoader(ds, batch_size=args.batch, seed=0, drop_last=False)
    batch = next(iter(loader))

    mesh = make_mesh()
    model = HOCNet(with_object=True, freeze_batchnorm=True,
                   dtype=jnp.bfloat16)
    optimizer = make_optimizer("adam", 1e-4)
    state = create_train_state(
        model, mano, optimizer, batch["ref"], jax.random.PRNGKey(0)
    )
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step = make_warp_train_step(
        model, mano, optimizer, image_size=(args.res, args.res),
        backend="auto",
    )

    t0 = time.perf_counter()
    lowered = step.lower(state, batch)
    t_lower = time.perf_counter() - t0
    log(f"trace+lower: {t_lower:.1f}s")

    # Op census of the lowered StableHLO module (cheap text scan).
    t0 = time.perf_counter()
    txt = lowered.as_text()
    counts = collections.Counter()
    for line in txt.splitlines():
        line = line.strip()
        if "=" in line:
            rhs = line.split("=", 1)[1].strip()
            op = rhs.split(" ", 1)[0].split("(", 1)[0]
            counts[op] += 1
    total = sum(counts.values())
    log(f"lowered module: {len(txt) / 1e6:.1f} MB text, {total} ops "
        f"(census {time.perf_counter() - t0:.1f}s)")
    for op, n in counts.most_common(20):
        log(f"  {op:40s} {n}")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"XLA compile: {t_compile:.1f}s")
    try:
        mem = compiled.memory_analysis()
        log(f"memory analysis: {mem}")
    except Exception as e:  # noqa: BLE001
        log(f"memory analysis unavailable: {e}")

    print(f"RESULT lower={t_lower:.1f}s compile={t_compile:.1f}s "
          f"ops={total} obj_faces={args.obj_faces} res={args.res}")


if __name__ == "__main__":
    main()
