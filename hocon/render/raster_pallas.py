"""Pallas TPU forward kernel for the soft rasterizer.

Replaces the reference's only native component (neural_renderer's CUDA
``forward_face_index_map``/texture-sampling kernels) with a TPU-native
design:

- The INT face indices are **sorted by screen-space y** before the plane
  rows are built (``sort_faces_by_y`` — the differentiable tensors never
  get permuted) and grouped into chunks of ``FACE_CHUNK``; each chunk
  carries a margin-expanded [y, x] bounding interval so a pixel-block
  program skips chunks that cannot influence it (the TPU analogue of NMR's
  per-pixel face loop, but branch-free inside a chunk and with no atomics).
- Grid = (batch, row-block of 8 rows, lane-block of 128 columns). Within a
  program, a face chunk is evaluated against the whole (8, 128) pixel
  block at once: coefficients (FC, 1, 1) broadcast against pixel
  x (1, 1, XB) and y (1, 8, 1) on the VPU — faces in the leading dim,
  pixels in (sublane, lane).
- Aggregation (soft-silhouette log accumulator + streaming max-renormalized
  depth softmax) lives in VMEM scratch; one final pass writes the block.
  Fully deterministic: plain sums, no z-buffer races (SURVEY.md §5.2).

Backward: a HAND-WRITTEN Pallas kernel (``_raster_bwd_kernel``) — the
same grid as the forward, with the whole (b,) dcoeffs block resident in
VMEM across the pixel-block sweep; it recomputes the per-(face, pixel)
forward quantities and chains the output cotangents back to every affine
coefficient row. Validated against an f64 ``jax.vjp`` of the XLA backend
(``_rasterize_sorted_bwd_xla`` remains available as the reference
implementation for tests). This kernel is worth ~17x train-step throughput
over the autodiff backward.
"""

from __future__ import annotations

import functools
import math
import os
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hocon.render.raster import (
    _AREA_EPS,
    FacePlanes,
    RasterOutput,
    face_det2d,
    face_valid,
    gather_faces,
    rasterize_planes_xla,
)

# Swept optimal at 256^2 / ~1.6k faces on v5e (see CLAUDE.md perf notes);
# env-overridable for re-sweeps without editing module constants (def-time
# defaults bind these at import, so monkeypatching does NOT work).
FACE_CHUNK = int(os.environ.get("HOCON_FACE_CHUNK", "32"))
ROW_BLOCK = int(os.environ.get("HOCON_ROW_BLOCK", "8"))
# Max pixel-column block per program (lane-axis tile). Chunks are culled
# against both the row block's y-interval and the lane block's x-interval.
# Measured at 256px (centered hand): splitting 256 -> 2x128 costs MORE
# (+3 ms fwd: per-program overhead beats the culling win, since most
# chunks straddle the image center), so a single lane block is used up to
# this width. Wider renders split into 128-column blocks: at 512px,
# 4x128 beats 2x256 by 24% fwd+bwd (chunk x-spans are a small fraction of
# the width, so the x test culls most chunk/block pairs) — and a single
# 512-wide block does not even fit the backward's scoped VMEM.
LANE_BLOCK = int(os.environ.get("HOCON_LANE_BLOCK", "256"))
# NOTE (round 4): a two-level banded x-culling scheme (x-sort within
# y-bands + per-(band, lane-block) chunk ranges) was implemented and swept
# on v5e-1 at the realistic face count (2852 faces, 256px, backface cull
# on): EVERY banded / lane-split config lost to the single-level default —
# 21.40 ms fwd+bwd for (FC32, LB256, no bands) vs 22.6-28.5 ms for bands
# of 2-4 chunks at LB 256/128 and FC 16/32 — and the full train step
# regressed 393.9 -> 365.5 pairs/s. The CPU occupancy model
# (scripts/analyze_occupancy.py) had predicted 0.64-0.78x face-pixel
# work, but per-program fixed costs, the extra bounds machinery, and the
# coarsened y-culling dominate the saved block evaluations at this scale.
# The scheme was deleted (measurements/tpu_batch_r4b.log); don't re-add
# without a measurement at a much larger face count or image width.


class RasterConfig(typing.NamedTuple):
    """Kernel schedule (hashable — used as a jit-static / nondiff arg).

    face_chunk: faces per culling chunk; lane_block: max pixel-column
    block per program.
    """

    face_chunk: int
    lane_block: int


def default_config() -> RasterConfig:
    """The module-constant (env-overridable) schedule."""
    return RasterConfig(FACE_CHUNK, LANE_BLOCK)


def _lane_block(wp: int, lane_block: int = LANE_BLOCK) -> int:
    """Lane-block width for a padded image width (wp a multiple of 128)."""
    return wp if wp <= lane_block else 128
# Coverage is sigmoid(-d^2/sigma^2): at 3.5*sigma from a face it is
# ~4.8e-6 (gradient smaller still) — below the Pallas/XLA parity tolerance
# (2e-5; the full CPU suite passes at 3.5) and far below anything the
# photometric loss can see. 3.0 measurably breaks the 2e-5 parity, so 3.5
# is the quality-safe floor. Swept on v5e-1 at 2852 faces: 4.5 -> 3.5 is
# -0.5 ms fwd+bwd (20.66 -> 20.17; toy 11.83 -> 11.38) — the margin is a
# minor share of the chunk y-intervals (occupancy shows ~6 hit chunks per
# row block either way). Env-overridable for sweeps (sweep_raster.py
# reloads this module).
CUTOFF_SIGMAS = float(os.environ.get("HOCON_CUTOFF_SIGMAS", "3.5"))
_BIG_NEG = -1e4  # inert-face edge constant; squared stays in f32 range
# Fixed-reference softmax (forward fast path): every logit is bounded —
# log(sigmoid) <= 0 and -zbar/gamma >= -1/gamma — so when 1/gamma is
# moderate the weights exp(l - 0) stay inside f32 range (floor
# exp(-1/gamma - cutoff tail) and the den floor is the background weight
# exp(-1/gamma) >= exp(-60) ~ 8.8e-27, far above f32 denormals at 1e-38).
# The streaming max-renormalized path (m tracked per pixel) is kept for
# larger 1/gamma. 60 leaves two orders of slack for the attr numerators.
_FIXED_M_MAX_INV_GAMMA = 60.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prod_axis0(t: jnp.ndarray) -> jnp.ndarray:
    """Product over the leading axis, keepdims — via pairwise halving.

    Mosaic TPU has no reduce_prod lowering (NotImplementedError at kernel
    compile; CPU interpret mode passes silently), so the (FC, RB, W)
    product folds in log2(FC) elementwise multiplies instead."""
    while t.shape[0] > 1:
        h = t.shape[0] // 2
        head = t[:h] * t[h : 2 * h]
        if t.shape[0] % 2:
            head = jnp.concatenate([head, t[2 * h :]], axis=0)
        t = head
    return t


# CLOSED EXPERIMENT (round 5, v5e-1, measurements/fastmath_r5_ab.log):
# kernel-body fast transcendentals LOST. A degree-5 exp2-polynomial exp
# (bit-built 2^n scale, max rel err 5.7e-6 — under the 2e-5 parity) made
# the realistic raster fwd ~9% SLOWER (6.88 -> 7.64 ms; fwd+bwd 18.58 ->
# 20.00): TPU's hardware exp is one fast VPU transcendental, and the
# poly+bitcast replaces it with ~10 cheap ops that aren't cheaper. An
# approximate reciprocal (pl.reciprocal approx=True) + 2 Newton steps for
# the sigmoid divides measured a wash (18.42 vs 18.58 fwd+bwd, inside the
# ~0.7% run-to-run spread; ONE Newton step breaks 2e-5 forward parity —
# the per-face reciprocal error compounds ~8-16x through the silhouette
# product over overlapping faces). Both deleted; the kernels are not
# transcendental-bound. Don't re-attempt without profile evidence that
# exp/divide issue slots are the bottleneck.

# CLOSED EXPERIMENT (round 4h, v5e-1, measurements/sweep_ysort_real.log):
# replacing the float argsort below with a counting sort over fixed-height
# y bins (onehot + cumsum rank + one inverting scatter; bins of 2/4/8 rows)
# LOST decisively at the realistic face count (2852 faces, cull on,
# CUT=3.5): fwd+bwd 20.04 ms argsort vs 21.87/24.21/24.12 ms for
# bucket2/4/8, and the full train step regressed 399.9 -> 377.9 pairs/s.
# Two compounding causes: (a) the (F, H/bin) onehot-cumsum plus the
# permutation-inverting scatter cost MORE on TPU than XLA's bitonic
# argsort at this F; (b) coarser bins widen chunk y-extents, inflating
# kernel block work. Don't re-attempt without a much larger F or a
# scatter-free rank construction.
def sort_faces_by_y(
    verts_pix: jnp.ndarray,
    faces: jnp.ndarray,
    backface_cull: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort INT face indices by screen-space y-center (pure scheduling).

    Doing the sort on the integer connectivity BEFORE ``face_planes`` means
    the differentiable plane rows are built already in sorted order:
    ``pack_sorted_planes(presorted=True)`` then needs no take_along_axis on
    the (B, F, R, 3) rows tensor and its backward no scatter. Everything
    here is stop-gradient.

    Culled faces (the shared ``face_valid`` predicate — degenerate, plus
    backfacing when ``backface_cull``; MUST match ``face_planes``'s
    setting) sort last so inert chunks cluster and cull in one bounds
    check.

    Returns:
      faces_sorted: (B, F, 3) int32.
      face_bbox: (B, F, 4) [ymin, ymax, xmin, xmax] in the sorted order.
    """
    vp = jax.lax.stop_gradient(verts_pix)
    if faces.ndim == 2:
        faces = jnp.broadcast_to(faces[None], (vp.shape[0],) + faces.shape)
    fv = gather_faces(vp, faces)  # (B, F, 3, 2)
    valid = face_valid(fv, backface_cull)
    ymin = jnp.min(fv[..., 1], axis=-1)
    ymax = jnp.max(fv[..., 1], axis=-1)
    ycenter = jnp.where(valid, 0.5 * (ymin + ymax), jnp.inf)
    ycenter = jnp.where(jnp.isnan(ycenter), jnp.inf, ycenter)
    order = jnp.argsort(ycenter, axis=1)  # (B, F)
    faces_sorted = jnp.take_along_axis(faces, order[:, :, None], axis=1)
    bbox = jnp.stack(
        [ymin, ymax, jnp.min(fv[..., 0], axis=-1), jnp.max(fv[..., 0], axis=-1)],
        axis=-1,
    )
    bbox = jnp.take_along_axis(bbox, order[:, :, None], axis=1)
    return faces_sorted, bbox


def pack_sorted_planes(
    planes: FacePlanes,
    face_bbox: jnp.ndarray,
    sigma: float,
    face_chunk: int = FACE_CHUNK,
    presorted: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort faces by y-center, bake validity into coeffs, compute chunk bounds.

    Args:
      planes: FacePlanes with rows (B, F, R, 3).
      face_bbox: (B, F, 4) [ymin, ymax, xmin, xmax] per face (from verts,
        stop-gradient — used only for scheduling).
      presorted: faces are already y-sorted (``sort_faces_by_y``) — skip
        the in-place permutation of the differentiable rows tensor.

    Returns:
      coeffs: (B, Fp, R*3) float32, faces sorted by y, padded with inert
        faces (all three s-rows constant -1e4 -> zero coverage).
      bounds: (B, NC, 4) float32 per-chunk margin-expanded
        [ymin, ymax, xmin, xmax] for row-block AND lane-block culling.
    """
    rows, valid = planes.rows, planes.valid
    b, f, r, _ = rows.shape

    face_bbox = jax.lax.stop_gradient(face_bbox)
    if presorted:
        bbox = face_bbox
    else:
        ycenter = jnp.where(
            valid > 0, 0.5 * (face_bbox[..., 0] + face_bbox[..., 1]), jnp.inf
        )
        # Infinite bboxes (culling disabled) make the key NaN; sort last.
        ycenter = jnp.where(jnp.isnan(ycenter), jnp.inf, ycenter)
        order = jnp.argsort(ycenter, axis=1)  # (B, F)
        rows = jnp.take_along_axis(rows, order[:, :, None, None], axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)
        bbox = jnp.take_along_axis(face_bbox, order[:, :, None], axis=1)

    # Bake invalidity: all 3 perpendicular-distance rows -> constant -1e4
    # (outside everywhere, squared distance 1e8 -> p == 0), rest -> 0.
    v = valid[..., None, None] > 0
    inert_edge = jnp.asarray([0.0, 0.0, _BIG_NEG], rows.dtype)
    edge = jnp.where(v, rows[:, :, :3], inert_edge)
    rest = jnp.where(v, rows[:, :, 3:], 0.0)
    coeffs = jnp.concatenate([edge, rest], axis=2).reshape(b, f, r * 3)

    fp = _round_up(f, face_chunk)
    if fp > f:
        pad = jnp.zeros((b, fp - f, r * 3), coeffs.dtype)
        # Constant columns (index 3k+2) of the three s-rows.
        pad = pad.at[:, :, jnp.asarray([2, 5, 8])].set(_BIG_NEG)
        coeffs = jnp.concatenate([coeffs, pad], axis=1)

    nc = fp // face_chunk
    margin = CUTOFF_SIGMAS * sigma

    def chunk_reduce(vals, lo_fill, reducer):
        v = jnp.where(valid > 0, vals, lo_fill)
        v = jnp.pad(v, ((0, 0), (0, fp - f)), constant_values=lo_fill)
        return reducer(v.reshape(b, nc, face_chunk), axis=-1)

    cymin = chunk_reduce(bbox[..., 0], jnp.inf, jnp.min) - margin
    cymax = chunk_reduce(bbox[..., 1], -jnp.inf, jnp.max) + margin
    cxmin = chunk_reduce(bbox[..., 2], jnp.inf, jnp.min) - margin
    cxmax = chunk_reduce(bbox[..., 3], -jnp.inf, jnp.max) + margin
    bounds = jnp.stack([cymin, cymax, cxmin, cxmax], axis=-1)
    return coeffs, bounds.astype(jnp.float32)


def _chunk_ranges(bounds: jnp.ndarray, hp: int) -> jnp.ndarray:
    """Per row-block [k_start, k_end) bounds into the y-sorted chunk list.

    Measured motivation: with every chunk body culled (mesh off-screen)
    the forward still spent ~2 ms in the 49-iteration skip loop (scalar
    bounds reads + branches per program). Faces are y-sorted, so the
    chunks overlapping a row block cluster in one index range; looping
    only [first, last+1) removes almost all skip iterations while the
    in-loop y/x test keeps correctness for any interval stragglers.
    """
    nyb = hp // ROW_BLOCK
    y0 = (
        jnp.arange(nyb, dtype=jnp.float32)[None, None, :] * ROW_BLOCK
    )  # (1, 1, NYB)
    ov = jnp.logical_and(
        y0 + ROW_BLOCK > bounds[..., 0:1], y0 < bounds[..., 1:2]
    )  # (B, NC, NYB)
    nc = ov.shape[1]
    any_k = jnp.any(ov, axis=1)  # (B, NYB)
    first = jnp.argmax(ov, axis=1).astype(jnp.int32)
    last = (nc - 1 - jnp.argmax(ov[:, ::-1], axis=1)).astype(jnp.int32)
    ks = jnp.where(any_k, first, 0)
    ke = jnp.where(any_k, last + 1, 0)
    return jnp.stack([ks, ke], axis=-1)  # (B, NYB, 2) int32


def _raster_kernel(
    krange_ref,  # SMEM (1, NYB, 2) int32 — chunk range per row block
    bounds_ref,  # SMEM (1, NC, 4)
    coeffs_ref,  # VMEM (1, Fp, R*3)
    sil_ref,  # VMEM (1, RB, XB)
    attr_ref,  # VMEM (1, C+1, RB, XB)  (user attrs + zbar channel)
    vis_ref,  # VMEM (1, RB, XB)
    mden_ref,  # VMEM (1, 2, RB, XB)    (softmax max logit m, rel. denom)
    acc_ref,  # VMEM scratch (C+4, RB, XB): [log_neg, m, den, attr..., z]
    *,
    n_attr: int,  # C + 1 (incl. depth channel)
    width: int,  # lane-block width XB
    face_chunk: int,
    sigma: float,
    gamma: float,
    fixed_m: bool,
):
    rb = ROW_BLOCK
    y_base = (pl.program_id(1) * rb).astype(jnp.float32)
    x_base = (pl.program_id(2) * width).astype(jnp.float32)
    inv_sigma_sq = 1.0 / (sigma * sigma)
    inv_gamma = 1.0 / gamma
    l_bg = jnp.float32(-1.0 / gamma)  # background logit (p=1, zbar=1)
    # Fixed-m path: softmax weights are exp(l - 0), so the background
    # weight is the compile-time constant exp(l_bg).
    w_bg = jnp.float32(math.exp(-1.0 / gamma))

    # Softmax state, initialized with the background "face" (zbar_bg = 1,
    # attrs_bg = 0). Streaming path: acc[0] accumulates sum log(1 - p)
    # and acc[1] tracks the running max logit m (weights exp(l - m), bg
    # weight 1). Fixed-m path: acc[0] accumulates prod (1 - p) directly,
    # acc[1] stays 0 (saved to mden so the backward's exp(l - m) chain is
    # unchanged), weights are exp(l) and the bg weight is exp(l_bg).
    acc_ref[...] = jnp.zeros_like(acc_ref)
    if fixed_m:
        acc_ref[0:1] = jnp.ones((1, rb, width), jnp.float32)
        acc_ref[2:3] = jnp.full((1, rb, width), w_bg, jnp.float32)
        acc_ref[n_attr + 2 : n_attr + 3] = jnp.full(
            (1, rb, width), w_bg, jnp.float32
        )
    else:
        acc_ref[1:2] = jnp.full((1, rb, width), l_bg, jnp.float32)
        acc_ref[2:3] = jnp.ones((1, rb, width), jnp.float32)
        acc_ref[n_attr + 2 : n_attr + 3] = jnp.ones(
            (1, rb, width), jnp.float32
        )

    # iota must be integer-typed on TPU; convert after.
    x = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2).astype(jnp.float32)
        + x_base
        + 0.5
    )  # pixel-center columns
    y = (
        jax.lax.broadcasted_iota(jnp.int32, (1, rb, 1), 1).astype(jnp.float32)
        + y_base
        + 0.5
    )  # pixel-center rows

    def chunk_body(k, _):
        ymin = bounds_ref[0, k, 0]
        ymax = bounds_ref[0, k, 1]
        xmin = bounds_ref[0, k, 2]
        xmax = bounds_ref[0, k, 3]
        hit_y = jnp.logical_and(y_base + rb > ymin, y_base < ymax)
        hit_x = jnp.logical_and(x_base + width > xmin, x_base < xmax)

        @pl.when(jnp.logical_and(hit_y, hit_x))
        def _():
            a = coeffs_ref[0, pl.ds(k * face_chunk, face_chunk), :]  # (FC, 3R)

            def coeff(r, j):
                return a[:, 3 * r + j : 3 * r + j + 1][:, :, None]  # (FC,1,1)

            def row_eval(r):
                return coeff(r, 0) * x + (coeff(r, 1) * y + coeff(r, 2))

            # Signed squared distance to the triangle (see FacePlanes docs).
            s0, s1, s2 = row_eval(0), row_eval(1), row_eval(2)
            d_in = jnp.minimum(jnp.minimum(s0, s1), s2)
            dist2 = None
            for ke, sk in enumerate((s0, s1, s2)):
                u = row_eval(3 + ke)
                length = coeff(6 + ke, 2)  # constant row
                ov = jnp.maximum(jnp.maximum(-u, u - length), 0.0)
                d2 = sk * sk + ov * ov
                dist2 = d2 if dist2 is None else jnp.minimum(dist2, d2)
            signed_sq = jnp.where(d_in > 0, d_in * d_in, -dist2)
            logits = signed_sq * inv_sigma_sq
            zbar = jnp.clip(row_eval(9), 0.0, 1.0)
            if fixed_m:
                # ONE exp serves sigmoid AND its complement: with
                # e = exp(-|x|) and r = 1/(1+e), sigmoid(x) is r (x>=0)
                # or r*e (x<0) and 1-sigmoid(x) is the swap — no softplus
                # (exp+log1p) and no max/rescale pass. Weights exp(l) are
                # in-range by the _FIXED_M_MAX_INV_GAMMA bound; a face
                # beyond the cutoff underflows to an exact 0 contribution,
                # which is what culling already assumes is unobservable.
                e2 = jnp.exp(-jnp.abs(logits))
                r = 1.0 / (1.0 + e2)
                pos = logits >= 0
                one = jnp.float32(1.0)
                sig = r * jnp.where(pos, one, e2)
                oms = r * jnp.where(pos, e2, one)  # 1 - sigmoid, exact swap
                w = sig * jnp.exp(-zbar * inv_gamma)  # (FC, RB, W)

                acc_ref[0:1] *= _prod_axis0(oms)
                acc_ref[2:3] += jnp.sum(w, axis=0, keepdims=True)
                for c in range(n_attr - 1):
                    acc_ref[3 + c : 4 + c] += jnp.sum(
                        w * row_eval(10 + c), axis=0, keepdims=True
                    )
                acc_ref[n_attr + 2 : n_attr + 3] += jnp.sum(
                    w * zbar, axis=0, keepdims=True
                )
                return
            # ONE softplus serves both accumulators (same identity as the
            # XLA backend — raster.py _aggregate_chunk): log(sigmoid(x))
            # == -sp, log(1 - sigmoid(x)) == -(x + sp), sp = softplus(-x).
            sp = jax.nn.softplus(-logits)
            l = -sp - zbar * inv_gamma  # (FC, RB, W)

            m_old = acc_ref[1:2]
            m_new = jnp.maximum(m_old, jnp.max(l, axis=0, keepdims=True))
            scale = jnp.exp(m_old - m_new)
            w = jnp.exp(l - m_new)  # (FC, RB, W)

            acc_ref[0:1] += jnp.sum(-(logits + sp), axis=0, keepdims=True)
            acc_ref[1:2] = m_new
            acc_ref[2:3] = acc_ref[2:3] * scale + jnp.sum(w, axis=0, keepdims=True)
            for c in range(n_attr - 1):
                acc_ref[3 + c : 4 + c] = acc_ref[3 + c : 4 + c] * scale + jnp.sum(
                    w * row_eval(10 + c), axis=0, keepdims=True
                )
            acc_ref[n_attr + 2 : n_attr + 3] = acc_ref[
                n_attr + 2 : n_attr + 3
            ] * scale + jnp.sum(w * zbar, axis=0, keepdims=True)

        return 0

    yi = pl.program_id(1)
    jax.lax.fori_loop(
        krange_ref[0, yi, 0], krange_ref[0, yi, 1], chunk_body, 0
    )

    den = acc_ref[2]
    inv_den = 1.0 / den
    if fixed_m:
        sil_ref[0] = 1.0 - acc_ref[0]  # acc[0] holds prod(1 - p) directly
        vis_ref[0] = 1.0 - w_bg * inv_den
    else:
        sil_ref[0] = 1.0 - jnp.exp(acc_ref[0])
        vis_ref[0] = 1.0 - jnp.exp(l_bg - acc_ref[1]) * inv_den
    attr_ref[0] = acc_ref[3 : n_attr + 3] * inv_den[None]
    # Softmax state saved for the backward kernel (fixed-m path: m stayed
    # 0 in acc[1], so the backward's exp(l - m) chain needs no change).
    mden_ref[0, 0] = acc_ref[1]
    mden_ref[0, 1] = den


def _forward_padded(coeffs, bounds, image_size, sigma, gamma, n_attr,
                    config: RasterConfig):
    """Run the forward kernel; returns PADDED (sil, attr, vis, mden)."""
    b, fp, r3 = coeffs.shape
    h, w = image_size
    wp = _round_up(w, 128)
    hp = _round_up(h, ROW_BLOCK)
    nc = bounds.shape[1]
    xb = _lane_block(wp, config.lane_block)
    interpret = jax.default_backend() == "cpu"

    # Same VMEM-residency bound as the backward (the (1, Fp, R*3) coeff
    # block is resident per program); guard here too so forward-only paths
    # (eval/vis) get the diagnosable error instead of Mosaic's opaque
    # scoped-allocation failure.
    if fp * r3 * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"soft_rasterize: {fp} padded faces x {r3} plane coefficients "
            f"needs ~{fp * r3 * 4 / 1e6:.0f} MB of VMEM residency "
            "(budget ~12 MB); decimate the mesh (--decimate_objects_to)"
        )

    kernel = functools.partial(
        _raster_kernel,
        n_attr=n_attr,
        width=xb,
        face_chunk=config.face_chunk,
        sigma=sigma,
        gamma=gamma,
        fixed_m=(1.0 / gamma) <= _FIXED_M_MAX_INV_GAMMA,
    )
    nyb = hp // ROW_BLOCK
    krange = _chunk_ranges(bounds, hp)
    return pl.pallas_call(
        kernel,
        grid=(b, nyb, wp // xb),
        in_specs=[
            pl.BlockSpec((1, nyb, 2), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, 4), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, fp, r3), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_BLOCK, xb), lambda bi, yi, xi: (bi, yi, xi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_attr, ROW_BLOCK, xb),
                         lambda bi, yi, xi: (bi, 0, yi, xi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, xb), lambda bi, yi, xi: (bi, yi, xi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ROW_BLOCK, xb),
                         lambda bi, yi, xi: (bi, 0, yi, xi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, n_attr, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_attr + 3, ROW_BLOCK, xb), jnp.float32)
        ],
        interpret=interpret,
    )(krange, bounds, coeffs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _rasterize_sorted(coeffs, bounds, image_size, sigma, gamma, n_attr,
                      config: RasterConfig):
    h, w = image_size
    sil, attr, vis, _ = _forward_padded(
        coeffs, bounds, image_size, sigma, gamma, n_attr, config
    )
    return sil[:, :h, :w], attr[:, :, :h, :w], vis[:, :h, :w]


def _rasterize_sorted_fwd(coeffs, bounds, image_size, sigma, gamma, n_attr,
                          config: RasterConfig):
    h, w = image_size
    sil, attr, vis, mden = _forward_padded(
        coeffs, bounds, image_size, sigma, gamma, n_attr, config
    )
    out = (sil[:, :h, :w], attr[:, :, :h, :w], vis[:, :h, :w])
    return out, (coeffs, bounds, sil, attr, vis, mden)


def _raster_bwd_kernel(
    krange_ref,  # SMEM (1, NYB, 2) int32 — chunk range per row block
    bounds_ref,  # SMEM (1, NC, 4)
    coeffs_ref,  # VMEM (1, Fp, 3R)       block @ (b,) — resident across yi/xi
    sil_ref,  # VMEM (1, RB, XB)          @ (b, yi, xi)
    attr_ref,  # VMEM (1, C+1, RB, XB)    @ (b, yi, xi)
    vis_ref,  # VMEM (1, RB, XB)
    mden_ref,  # VMEM (1, 2, RB, XB)
    gsil_ref,  # VMEM (1, RB, XB)
    gattr_ref,  # VMEM (1, C+1, RB, XB)
    gvis_ref,  # VMEM (1, RB, XB)
    dcoeffs_ref,  # out VMEM (1, Fp, 3R)  block @ (b,) — revisited over yi/xi
    *,
    n_attr: int,
    width: int,  # lane-block width XB
    face_chunk: int,
    sigma: float,
    gamma: float,
):
    """Gradient of the soft raster w.r.t. the face-plane coefficients.

    Grid (batch, pixel row-block, lane-block) — the same shape as the
    forward. The full (b,) dcoeffs block stays resident in VMEM across the
    pixel-block sweep and accumulates; inside a program, a chunk loop skips
    face chunks whose y/x-interval misses this pixel block (scalar compare
    — an inactive chunk costs no block DMA and no program launch).
    Deterministic: one program sequence owns each output block.
    """
    yi = pl.program_id(1)
    xi = pl.program_id(2)
    rb = ROW_BLOCK
    inv_sigma_sq = 1.0 / (sigma * sigma)
    inv_gamma = 1.0 / gamma

    @pl.when(jnp.logical_and(yi == 0, xi == 0))
    def _():
        dcoeffs_ref[...] = jnp.zeros_like(dcoeffs_ref)

    y0 = (yi * rb).astype(jnp.float32)
    x0 = (xi * width).astype(jnp.float32)

    x = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2).astype(jnp.float32)
        + x0
        + 0.5
    )
    y = (
        jax.lax.broadcasted_iota(jnp.int32, (1, rb, 1), 1).astype(jnp.float32)
        + y0
        + 0.5
    )
    y_col = y[0]  # (RB, 1) — sublane weights for the two-pass reduction

    # --- saved per-pixel state + incoming grads (shared by all chunks) ---
    sil = sil_ref[0]
    one_m_sil = 1.0 - sil
    vis = vis_ref[0]
    m = mden_ref[0, 0]
    inv_den = 1.0 / mden_ref[0, 1]
    gsil = gsil_ref[0]
    gvis = gvis_ref[0]
    g_z = gattr_ref[0, n_attr - 1]
    out_z = attr_ref[0, n_attr - 1]

    def chunk_body(k, _):
        a = coeffs_ref[0, pl.ds(k * face_chunk, face_chunk), :]  # (FC, 3R)
        ymin = bounds_ref[0, k, 0]
        ymax = bounds_ref[0, k, 1]
        xmin = bounds_ref[0, k, 2]
        xmax = bounds_ref[0, k, 3]
        hit_y = jnp.logical_and(y0 + rb > ymin, y0 < ymax)
        hit_x = jnp.logical_and(x0 + width > xmin, x0 < xmax)

        def coeff(r, j):
            return a[:, 3 * r + j : 3 * r + j + 1][:, :, None]  # (FC, 1, 1)

        @pl.when(jnp.logical_and(hit_y, hit_x))
        def _():
            def row_eval(r):
                return coeff(r, 0) * x + (coeff(r, 1) * y + coeff(r, 2))

            # Per-row (FC, 3) gradient pieces, written back to dcoeffs in
            # ONE concatenated += per chunk instead of 3 RMW stores per
            # add_row (36 dynamic-slice VMEM round-trips -> 1).
            row_grads = {}

            def add_row(r, dval):  # dval: (FC, RB, W)
                # Two-pass reduction: the x-weight varies only along lanes
                # and the y-weight only along sublanes, so reduce sublanes
                # first (S_w), lanes first (T_y), then apply the 1-D weights
                # — ~2.5x fewer VPU ops than three full weighted reductions.
                s_w = jnp.sum(dval, axis=1)  # (FC, W)
                t_y = jnp.sum(dval, axis=2)  # (FC, RB)
                da = jnp.sum(s_w * x[0], axis=1, keepdims=True)  # (FC, 1)
                db = jnp.sum(t_y * y_col[:, 0][None, :], axis=1, keepdims=True)
                dc = jnp.sum(s_w, axis=1, keepdims=True)
                row_grads[r] = jnp.concatenate([da, db, dc], axis=1)  # (FC,3)

            # --- recompute forward per-(face, pixel) quantities ---
            s = [row_eval(0), row_eval(1), row_eval(2)]
            d_in = jnp.minimum(jnp.minimum(s[0], s[1]), s[2])
            us, lens, ovs, c2s = [], [], [], []
            for ke in range(3):
                u = row_eval(3 + ke)
                length = coeff(6 + ke, 2)
                ov = jnp.maximum(jnp.maximum(-u, u - length), 0.0)
                us.append(u)
                lens.append(length)
                ovs.append(ov)
                c2s.append(s[ke] * s[ke] + ov * ov)
            dist2 = jnp.minimum(jnp.minimum(c2s[0], c2s[1]), c2s[2])
            inside = d_in > 0
            signed_sq = jnp.where(inside, d_in * d_in, -dist2)
            logits = signed_sq * inv_sigma_sq
            zraw = row_eval(9)
            z = jnp.clip(zraw, 0.0, 1.0)
            # exp(l - m) with l = log(sigmoid(logits)) - z/gamma, computed
            # as sig * exp(-z/gamma - m): one sigmoid + one exp, and the
            # sigmoid is reused for the silhouette/coverage chain below
            # (saves the softplus recompute entirely). The factored
            # exponent e = -z/gamma - m satisfies e <= -log(sig) (because
            # l <= m), so e > 80 forces sig < e^-80 — a face >= 8.9 sigma
            # from the pixel, far beyond the 4.5-sigma cutoff the chunk
            # culling already declares unobservable. Clamping e there
            # stops the f32 overflow (inf * denormal-sig = NaN) that a
            # sharp gamma (1/gamma > ~88) hits on empty pixels, while
            # only shrinking contributions the cutoff contract zeroes
            # wholesale when they land one chunk further out.
            sig = jax.nn.sigmoid(logits)
            e_w = jnp.minimum(-z * inv_gamma - m, jnp.float32(80.0))
            what = sig * jnp.exp(e_w) * inv_den  # (FC, RB, W)

            # dL/dl accumulates softmax-competition terms over channels.
            ssum = g_z * (z - out_z) + gvis * (1.0 - vis)
            for c in range(n_attr - 1):
                g_c = gattr_ref[0, c]
                out_c = attr_ref[0, c]
                a_c = row_eval(10 + c)
                ssum += g_c * (a_c - out_c)
                add_row(10 + c, what * g_c)  # direct attr-row gradient
            dl = what * ssum

            # silhouette path: d(-softplus(x))/dx = -sigmoid(x);
            # dL/dA = -gsil * (1 - sil); sigmoid(-x) == 1 - sigmoid(x).
            dx = gsil * one_m_sil * sig + dl * (1.0 - sig)
            clip_mask = jnp.logical_and(zraw > 0.0, zraw < 1.0).astype(
                jnp.float32
            )
            add_row(9, (what * g_z - dl * inv_gamma) * clip_mask)

            dss = dx * inv_sigma_sq  # dL/d(signed_sq)
            insf = inside.astype(jnp.float32)
            # Tie-splitting masks (even split, matching jnp.min gradients).
            in_masks = [(sk == d_in).astype(jnp.float32) for sk in s]
            in_cnt = in_masks[0] + in_masks[1] + in_masks[2]
            o_masks = [(c2 == dist2).astype(jnp.float32) for c2 in c2s]
            o_cnt = o_masks[0] + o_masks[1] + o_masks[2]

            # The tie counts are exactly 1, 2, or 3, so the 1/cnt split is a
            # two-select table lookup instead of a VPU divide; folding the
            # inside/outside gate in here too turns the six per-face-pixel
            # divides of the naive form into two selects + one multiply.
            def _rcp123(cnt):
                return jnp.where(
                    cnt == jnp.float32(1.0),
                    jnp.float32(1.0),
                    jnp.where(
                        cnt == jnp.float32(2.0),
                        jnp.float32(0.5),
                        jnp.float32(1.0 / 3.0),
                    ),
                )

            in_sel = _rcp123(in_cnt) * insf
            o_sel = _rcp123(o_cnt) * (1.0 - insf)
            for ke in range(3):
                sel_in = in_masks[ke] * in_sel
                sel_out = o_masks[ke] * o_sel
                ds = (2.0 * d_in * sel_in - 2.0 * s[ke] * sel_out) * dss
                add_row(ke, ds)
                # overhang branch: ov = max(-u, u - L, 0)
                a_side = -us[ke]
                b_side = us[ke] - lens[ke]
                take_b = jnp.logical_and(b_side >= a_side, b_side > 0).astype(
                    jnp.float32
                )
                take_a = jnp.logical_and(a_side > b_side, a_side > 0).astype(
                    jnp.float32
                )
                dov = -2.0 * ovs[ke] * sel_out * dss  # dL/d(ov)
                add_row(3 + ke, dov * (take_b - take_a))
                add_row(6 + ke, dov * (-take_b))

            n_rows = 10 + (n_attr - 1)
            dg = jnp.concatenate(
                [row_grads[r] for r in range(n_rows)], axis=1
            )  # (FC, 3R)
            dcoeffs_ref[0, pl.ds(k * face_chunk, face_chunk), :] += dg

        return 0

    jax.lax.fori_loop(
        krange_ref[0, yi, 0], krange_ref[0, yi, 1], chunk_body, 0
    )


def _backward_pallas(residual, grads, image_size, sigma, gamma, n_attr,
                     config: RasterConfig):
    coeffs, bounds, sil, attr, vis, mden = residual
    g_sil, g_attr, g_vis = grads
    b, fp, r3 = coeffs.shape
    h, w = image_size
    hp, wp = sil.shape[1], sil.shape[2]
    nc = bounds.shape[1]
    interpret = jax.default_backend() == "cpu"

    # Pad incoming (cropped) grads back to kernel-padded size with zeros.
    g_sil = jnp.pad(g_sil, ((0, 0), (0, hp - h), (0, wp - w)))
    g_attr = jnp.pad(g_attr, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    g_vis = jnp.pad(g_vis, ((0, 0), (0, hp - h), (0, wp - w)))

    # The whole (Fp, 3R) coefficient table AND the same-sized dcoeffs
    # accumulator stay resident in VMEM per batch element (that residency is
    # what makes the single-grid backward fast). VMEM is ~16 MB/core; past
    # roughly ~45k padded faces the two blocks alone exceed it and Mosaic
    # fails with an opaque scoped-allocation error — raise a diagnosable one
    # instead (advisor r2). Larger meshes need --decimate_objects_to or a
    # chunked-grid backward.
    vmem_needed = 2 * fp * r3 * 4
    if vmem_needed > 12 * 1024 * 1024:
        raise ValueError(
            f"soft_rasterize backward: {fp} padded faces x {r3} plane "
            f"coefficients needs ~{vmem_needed / 1e6:.0f} MB of VMEM "
            "residency (budget ~12 MB after pixel blocks); decimate the "
            "mesh (--decimate_objects_to) to fit"
        )
    xb = _lane_block(wp, config.lane_block)
    kernel = functools.partial(
        _raster_bwd_kernel,
        n_attr=n_attr,
        width=xb,
        face_chunk=config.face_chunk,
        sigma=sigma,
        gamma=gamma,
    )
    rbk = ROW_BLOCK
    img_spec = pl.BlockSpec((1, rbk, xb), lambda bi, yi, xi: (bi, yi, xi),
                            memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec(
        (1, n_attr, rbk, xb), lambda bi, yi, xi: (bi, 0, yi, xi),
        memory_space=pltpu.VMEM,
    )
    nyb = hp // rbk
    krange = _chunk_ranges(bounds, hp)
    dcoeffs = pl.pallas_call(
        kernel,
        grid=(b, nyb, wp // xb),
        in_specs=[
            pl.BlockSpec((1, nyb, 2), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, 4), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            # Whole coefficient table resident per batch element (fetched
            # once per b, constant across the pixel-block sweep).
            pl.BlockSpec((1, fp, r3), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            img_spec,
            chan_spec,
            img_spec,
            pl.BlockSpec((1, 2, rbk, xb), lambda bi, yi, xi: (bi, 0, yi, xi),
                         memory_space=pltpu.VMEM),
            img_spec,
            chan_spec,
            img_spec,
        ],
        # Output block depends only on b: it stays resident in VMEM across
        # the pixel-block sweep and accumulates (zeroed at yi == xi == 0).
        out_specs=pl.BlockSpec(
            (1, fp, r3), lambda bi, yi, xi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, fp, r3), jnp.float32),
        interpret=interpret,
    )(krange, bounds, coeffs, sil, attr, vis, mden, g_sil, g_attr, g_vis)
    return dcoeffs


def _xla_equivalent(coeffs, image_size, sigma, gamma, n_attr):
    """The same math as the kernel, via the XLA streaming backend — used to
    derive exact gradients for the custom VJP."""
    b, fp, r3 = coeffs.shape
    r = r3 // 3
    rows = coeffs.reshape(b, fp, r, 3)
    # Validity is baked into the coeffs (inert faces have zero coverage), so
    # all faces count as 'valid' here.
    planes = FacePlanes(rows=rows, valid=jnp.ones((b, fp), coeffs.dtype))
    out = rasterize_planes_xla(planes, image_size, sigma, gamma)
    attr = jnp.concatenate(
        [jnp.moveaxis(out.attr, -1, 1), out.depth[:, None]], axis=1
    )  # (B, C+1, H, W)
    return out.sil, attr, out.vis


def _rasterize_sorted_bwd(image_size, sigma, gamma, n_attr, config,
                          residual, grads):
    dcoeffs = _backward_pallas(
        residual, grads, image_size, sigma, gamma, n_attr, config
    )
    return dcoeffs, None


def _rasterize_sorted_bwd_xla(image_size, sigma, gamma, n_attr, config,
                              residual, grads):
    """Reference backward via jax.vjp of the XLA path (used by tests to
    validate the hand-written backward kernel)."""
    del config  # the XLA reference has no schedule
    coeffs = residual[0]
    _, vjp = jax.vjp(
        lambda c: _xla_equivalent(c, image_size, sigma, gamma, n_attr), coeffs
    )
    (dcoeffs,) = vjp(grads)
    return dcoeffs, None


_rasterize_sorted.defvjp(_rasterize_sorted_fwd, _rasterize_sorted_bwd)


def rasterize_planes_pallas(
    planes: FacePlanes,
    face_bbox: jnp.ndarray = None,
    image_size: tuple[int, int] = (256, 256),
    sigma: float = 1.0,
    gamma: float = 1.0 / 40.0,
    presorted: bool = False,
    config: RasterConfig | None = None,
) -> RasterOutput:
    """Rasterize prepared face planes with the Pallas TPU kernel.

    ``face_bbox`` (B, F, 4) [ymin, ymax, xmin, xmax] enables chunk culling;
    if None, bounds are conservatively infinite (no culling). With
    ``presorted`` the planes were built from ``sort_faces_by_y`` output and
    packing skips the row permutation. ``config`` pins the kernel schedule
    (None = module/env defaults).
    """
    if config is None:
        config = default_config()
    rows, valid = planes.rows, planes.valid
    b, f, r, _ = rows.shape
    n_attr = r - 9  # user attrs + depth channel
    if face_bbox is None:
        face_bbox = jnp.concatenate(
            [
                jnp.full((b, f, 1), -jnp.inf),
                jnp.full((b, f, 1), jnp.inf),
                jnp.full((b, f, 1), -jnp.inf),
                jnp.full((b, f, 1), jnp.inf),
            ],
            axis=-1,
        )
    coeffs, bounds = pack_sorted_planes(
        planes, face_bbox, sigma, face_chunk=config.face_chunk,
        presorted=presorted,
    )
    sil, attr, vis = _rasterize_sorted(
        coeffs, bounds, image_size, sigma, gamma, n_attr, config
    )
    return RasterOutput(
        sil=sil,
        attr=jnp.moveaxis(attr[:, : n_attr - 1], 1, -1),
        depth=attr[:, n_attr - 1],
        vis=vis,
    )
