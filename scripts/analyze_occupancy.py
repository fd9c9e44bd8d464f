"""CPU-side chunk-occupancy model for the Pallas rasterizer schedule.

The kernel's cost is ~ sum over grid programs of
    n_loop_iters * c_skip  +  n_hit_chunks * c_body(FC, RB, W)
(`_raster_kernel`: skipped chunks cost a scalar bounds read + branch; hit
chunks evaluate the full (FACE_CHUNK, ROW_BLOCK, LANE_BLOCK) pixel block).
This script replays the exact scheduling math (sort_faces_by_y + the
pack_sorted_planes chunk bounds + _chunk_ranges interval logic) on the
bench's realistic scene geometry and reports, per config, the total
face-pixel block work and loop iterations.

VALIDATION CAVEAT (round 4, v5e-1): the model's face-pixel-work metric
ANTI-correlated with measured wall time for the banded/lane-split
schedules it was built to rank — it predicted 0.64-0.78x work for banded
128-lane configs at 2.85k faces, but every such config measured 5-33%
SLOWER than the single-level (FC32, LB256) default, and the full train
step regressed 7% (measurements/tpu_batch_r4b.log). Per-program fixed
costs, SMEM bounds machinery, and VMEM-block revisits dominate at this
scale and are not modeled. Treat the output as a lower-bound intuition
for *block-evaluation* work only — never promote a schedule from this
model without an on-TPU sweep (scripts/sweep_raster.py).

Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
             python scripts/analyze_occupancy.py [--obj_faces 1280]
"""

from __future__ import annotations

import argparse

import numpy as np

CUTOFF_SIGMAS = 4.5


def chunk_bounds(bbox, valid, face_chunk, margin):
    """Replicates pack_sorted_planes' margin-expanded per-chunk bounds."""
    b, f, _ = bbox.shape
    fp = -(-f // face_chunk) * face_chunk
    nc = fp // face_chunk

    def reduce(vals, fill, red):
        v = np.where(valid > 0, vals, fill)
        v = np.pad(v, ((0, 0), (0, fp - f)), constant_values=fill)
        return red(v.reshape(b, nc, face_chunk), axis=-1)

    cymin = reduce(bbox[..., 0], np.inf, np.min) - margin
    cymax = reduce(bbox[..., 1], -np.inf, np.max) + margin
    cxmin = reduce(bbox[..., 2], np.inf, np.min) - margin
    cxmax = reduce(bbox[..., 3], -np.inf, np.max) + margin
    return np.stack([cymin, cymax, cxmin, cxmax], axis=-1)  # (B, NC, 4)


def model_cost(bounds, hp, wp, row_block, lane_block):
    """Returns (hit_blocks, loop_iters) summed over the whole grid.

    hit_blocks counts (program, chunk) pairs whose pl.when body runs;
    loop_iters counts fori_loop iterations (hit or skipped) — the
    single-level per-row-block [first, last) interval of _chunk_ranges.
    """
    b, nc, _ = bounds.shape
    xb = lane_block if wp <= lane_block else 128
    nyb, nxb = hp // row_block, wp // xb
    y0 = np.arange(nyb)[None, None, :] * row_block  # (1, 1, NYB)
    x0 = np.arange(nxb)[None, None, :] * xb

    ov_y = (y0 + row_block > bounds[..., 0:1]) & (y0 < bounds[..., 1:2])
    ov_x = (x0 + xb > bounds[..., 2:3]) & (x0 < bounds[..., 3:4])
    # hit = chunk body actually runs for (b, chunk, yblock, xblock)
    hit = ov_y[:, :, :, None] & ov_x[:, :, None, :]

    any_k = ov_y.any(axis=1)  # (B, NYB)
    first = np.argmax(ov_y, axis=1)
    last = nc - 1 - np.argmax(ov_y[:, ::-1], axis=1)
    iters = np.where(any_k, last - first + 1, 0).sum() * nxb
    return int(hit.sum()), int(iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obj_faces", type=int, default=1280)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from hocon.data.factory import get_dataset
    from hocon.data.pipeline import BatchLoader
    from hocon.geometry.mano import synthetic_mano_model
    from hocon.geometry.project import persp_project
    from hocon.render.raster import face_valid, gather_faces
    from hocon.render.raster_pallas import sort_faces_by_y

    res = args.res
    mano = synthetic_mano_model(0)
    ds = get_dataset(
        "synthetic", "train", image_size=res, use_objects=True, train=True,
        mano=mano, pair_mode=True, fraction=0.25, synth_videos=2,
        synth_frames=max(4, args.batch // 2), seed=0,
        synth_obj_faces=args.obj_faces,
    )
    batch = next(iter(BatchLoader(ds, batch_size=args.batch, seed=0,
                                  drop_last=False)))["tgt"]

    hand = batch["verts3d"] / 1000.0 + batch["center3d"][:, None]
    obj = batch["objverts3d"] / 1000.0 + batch["center3d"][:, None]
    verts = jnp.asarray(np.concatenate([hand, obj], axis=1))
    ofaces = batch["obj_faces"].astype(np.int32) + hand.shape[1]
    faces = jnp.asarray(
        np.concatenate(
            [np.broadcast_to(np.asarray(mano.faces)[None],
                             (hand.shape[0],) + mano.faces.shape), ofaces],
            axis=1,
        )
    )
    vp = persp_project(verts, jnp.asarray(batch["camintr"]))

    hp = -(-res // 8) * 8
    wp = -(-res // 128) * 128
    print(f"scene: {faces.shape[1]} faces, {res}px, batch {args.batch}")

    header = (
        f"{'FC':>3} {'RB':>3} {'LB':>4} | "
        f"{'Mface-pix-evals':>15} {'iters':>8} {'rel':>6}"
    )
    print(header)
    base_work = None
    for fc in (16, 32, 64):
        for lb in (256, 128):
            fs, bbox = sort_faces_by_y(vp, faces, backface_cull=True)
            fv = gather_faces(vp, fs)
            valid = np.asarray(face_valid(fv, True))
            bounds = chunk_bounds(
                np.asarray(bbox), valid, fc, CUTOFF_SIGMAS * 1.0
            )
            rb = 8
            hits, iters = model_cost(bounds, hp, wp, rb, lb)
            work = hits * fc * rb * min(lb, wp)  # face-pixel evals
            if base_work is None and fc == 32 and lb == 256:
                base_work = work
            rel = work / base_work if base_work else float("nan")
            print(f"{fc:>3} {rb:>3} {min(lb, wp):>4} | "
                  f"{work / 1e6:>15.1f} {iters:>8} {rel:>6.2f}")


if __name__ == "__main__":
    main()
