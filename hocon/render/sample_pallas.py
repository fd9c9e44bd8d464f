"""Pallas TPU kernel for bilinear image sampling (the warp's grid_sample).

Why a kernel: TPU gathers are index-count bound — the round-1 warp step
spent ~28 ms (of 85) sampling the reference image at the rendered
coordinates, and bf16/patch-shape tricks don't move it (CLAUDE.md perf
notes). The matmul reformulation (one-hot/hat row selection on the MXU,
see ``warp.bilinear_sample_mm``) is compute-cheap but XLA round-trips the
(P, W*C) row tensor through HBM. This kernel fuses the whole pipeline in
VMEM:

  for each block of ROW_BLOCK output rows (folded into one lane axis
  P = RB*Wq):
    ohT   = hat(iota_H - y)          (H, P)    y-lerp weights, bf16
    rowsT = imgT @ ohT               (C*W, P)  MXU — y-interpolated columns
    wxT   = hat(iota_W - x)          (W, P)    x-lerp weights
    out_c = sum_w (rowsT[c*W:...] * wxT)       (1, P)  sublane reduction

``hat(d) = max(0, 1 - |d|)`` with coordinates clamped to the valid range
reproduces exactly the border-clamp bilinear semantics of
``warp.bilinear_sample_gather`` (same as torch grid_sample
padding_mode='border', the reference's warp sampler).

**Segmented contraction (round 4):** each query has exactly <=2 nonzero
hat weights, yet the dense dot contracts over ALL H source rows. The
contraction is split into SEG=128-row segments (the MXU-native K tile)
and a per-(batch, row-block, segment) hit flag — precomputed on XLA into
SMEM — lets the kernel skip segments no query in the block touches with
``pl.when``. The warp's real coords make this pay: background pixels
sample ~(0, 0) (flow attr ≈ 0 outside the silhouette) and object pixels
cluster in a small y-band, so most blocks touch 1 of H/128 segments.
Numerically this is the same sum — skipped segments contribute exact
0.0, and f32 addition with zeros is lossless (boundary-straddling
queries can differ by 1 ulp where the full dot's FMA fused a
multiply-add the split rounds twice).

The image lives in VMEM transposed CHANNEL-MAJOR as (C*W, H) bf16 (393 KB
at 256^2x3) and stays resident across the row-block grid dimension;
c-major means each output channel is a CONTIGUOUS (W, P) sublane slice of
the product — no per-channel one-hot masking passes — and the x-hat
weights are computed once at (W, P). The backward is a hand-written
mirror kernel (2 segmented matmuls: rowsT + the y-derivative rows,
sharing ONE scratch accumulator sequentially) returning dcoords; the
image is data (no gradient needed). The cotangent enters per channel as
(1, P) rows — the (C*W, P) broadcast the old backward materialized is
never built.

Reference parity: torch ``F.grid_sample`` used by the consistency warp,
SURVEY.md §3.2 step (3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8  # output rows per program
SEG = 128  # source-row segment (MXU-native contraction tile)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _hat_and_mask(iota, coord, lo, hi):
    """Hat weights for clamped bilinear + in-range derivative mask.

    coord: (1, P) raw pixel coord minus 0.5; clamped to [lo, hi].
    Returns (weights (N, P) f32, dweights/dcoord (N, P) f32, clamp mask).
    """
    cl = jnp.clip(coord, jnp.float32(lo), jnp.float32(hi))
    delta = iota - cl  # (N, P)
    w = jnp.maximum(jnp.float32(0.0), jnp.float32(1.0) - jnp.abs(delta))
    # RIGHT-hand subgradient at the hat kinks: support delta in (-1, 1]
    # with sign(0) := -1, giving the full forward-difference slope
    # d/dx = img[x0+1] - img[x0] at exactly-integer coords. A symmetric
    # sign(0) = 0 zeroed ALL three neighbor derivatives there
    # (reviewer-confirmed); the gather reference returns HALF the slope at
    # those ties (JAX maximum/clip tie-splitting inside jnp.clip), so the
    # two backends differ only on this measure-zero set, each by a valid
    # subgradient (tested in test_warp.py).
    dw = jnp.where(
        jnp.logical_and(delta > jnp.float32(-1.0), delta <= jnp.float32(1.0)),
        jnp.where(delta > jnp.float32(0.0), jnp.float32(1.0),
                  jnp.float32(-1.0)),
        jnp.float32(0.0),
    )
    in_rng = jnp.logical_and(coord > lo, coord < hi).astype(jnp.float32)
    return w, dw, in_rng


def _flatten_rows(xy_ref, j):
    """(1, 2, RB, Wq) coord plane j -> (1, RB*Wq) via lane-axis concat.

    Explicit concat of static row slices (a (RB, Wq) -> (1, RB*Wq) reshape
    would merge sublanes into lanes — a Mosaic relayout)."""
    return jnp.concatenate(
        [xy_ref[0, j, r : r + 1, :] for r in range(ROW_BLOCK)], axis=1
    ) - jnp.float32(0.5)


def _seg_dot(acc_ref, seghit_ref, yi, imgT, ohT, h):
    """acc_ref <- imgT @ ohT, skipping dead 128-source-row segments.

    One (C*W, SEG) @ (SEG, P) partial dot per LIVE segment; the SMEM hit
    flags were computed by ``_seg_hits`` (full (1, NYB, NSEG) table per
    batch — Mosaic requires SMEM block dims to equal the array dims, so
    the row-block is selected by ``yi``, not the BlockSpec). With
    h <= SEG there is nothing to skip and the single full dot avoids the
    scratch zeroing pass."""
    nseg = -(-h // SEG)
    ohT = ohT.astype(imgT.dtype)  # one cast (bf16 on TPU) — the dot would
    # cast per segment anyway, and bf16 halves the (H, P) VMEM residency.
    if nseg <= 1:
        acc_ref[...] = jax.lax.dot_general(
            imgT, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for s in range(nseg):
        lo, hi = s * SEG, min(h, (s + 1) * SEG)

        @pl.when(seghit_ref[0, yi, s] > 0)
        def _(lo=lo, hi=hi):
            acc_ref[...] += jax.lax.dot_general(
                imgT[:, lo:hi], ohT[lo:hi, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _sample_kernel(seghit_ref, imgT_ref, xy_ref, out_ref, acc_ref, *, h, w, c):
    """Forward: out (1, C, RB, Wq) from imgT (1, C*W, H) and xy (1, 2, RB, Wq).

    All ROW_BLOCK output rows are folded into the lane axis (P = RB*Wq), so
    the row selection is ONE segmented (C*W, H) @ (H, P) matmul per program
    instead of RB narrow ones — ~8x larger N amortizes the MXU weight load."""
    wq = xy_ref.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
    imgT = imgT_ref[0]  # (C*W, H) bf16, c-major
    x = _flatten_rows(xy_ref, 0)  # (1, RB*Wq)
    y = _flatten_rows(xy_ref, 1)
    ohT, _, _ = _hat_and_mask(iota_h, y, 0.0, h - 1.0)  # (H, RB*Wq)
    _seg_dot(acc_ref, seghit_ref, pl.program_id(1), imgT, ohT, h)
    rowsT = acc_ref[...]  # (C*W, RB*Wq) — y-interpolated flat columns
    wx, _, _ = _hat_and_mask(iota_w, x, 0.0, w - 1.0)  # (W, RB*Wq)
    for ci in range(c):
        # c-major: channel ci is the contiguous sublane block [ci*w, ci*w+w).
        s = jnp.sum(
            rowsT[ci * w : (ci + 1) * w] * wx, axis=0, keepdims=True
        )
        for r in range(ROW_BLOCK):
            out_ref[0, ci, r : r + 1, :] = s[:, r * wq : (r + 1) * wq]


def _sample_bwd_kernel(
    gnz_ref, seghit_ref, imgT_ref, xy_ref, g_ref, dxy_ref, acc_ref, *, h, w, c
):
    """Backward: dcoords (1, 2, RB, Wq) from the output cotangent g.

    Same row-folding and segment skipping as the forward; the two dots
    (rowsT for gx, y-derivative rows for gy) reuse ONE scratch
    accumulator sequentially, and the cotangent is reduced per channel
    against (1, P) rows instead of materializing its (C*W, P) broadcast.

    Blocks whose cotangent is identically zero skip everything (the warp
    loss's stop-gradient mask zeroes the background EXACTLY, and the
    sampler has no geometric culling — pure-background row blocks would
    otherwise still pay both segmented dots): dxy is zero-filled and the
    body runs under ``pl.when`` on a precomputed any-nonzero flag."""
    wq = xy_ref.shape[-1]
    dxy_ref[...] = jnp.zeros_like(dxy_ref)
    # Hoisted: program_id has no lowering INSIDE a pl.when branch on the
    # CPU interpreter path (works at kernel top level on every backend).
    yi = pl.program_id(1)

    @pl.when(gnz_ref[0, 0, yi] > 0)
    def _():
        iota_h = jax.lax.broadcasted_iota(
            jnp.int32, (h, 1), 0
        ).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(
            jnp.int32, (w, 1), 0
        ).astype(jnp.float32)
        imgT = imgT_ref[0]
        x = _flatten_rows(xy_ref, 0)  # (1, RB*Wq)
        y = _flatten_rows(xy_ref, 1)

        gs = [
            jnp.concatenate(
                [g_ref[0, ci, r : r + 1, :] for r in range(ROW_BLOCK)], axis=1
            )
            for ci in range(c)
        ]  # per-channel cotangent, each (1, RB*Wq)

        # STAGED to cap scoped VMEM: the (H, P)/(W, P) hat tensors are
        # 1-2 MB each next to the 6.3 MB accumulator, so each is
        # (re)computed right before its single use and dead after — all
        # four alive at once blew the 16 MB scoped-VMEM limit (measured
        # 20.3 MB on TPU lowering).
        # x gradient: d(out_c)/dx = sum_w rowsT[c] * dwx; chain with g_c.
        ohT, _, _ = _hat_and_mask(iota_h, y, 0.0, h - 1.0)
        _seg_dot(acc_ref, seghit_ref, yi, imgT, ohT, h)
        _, dwx, xmask = _hat_and_mask(iota_w, x, 0.0, w - 1.0)
        gx = jnp.zeros_like(x)
        for ci in range(c):
            t = jnp.sum(
                acc_ref[ci * w : (ci + 1) * w] * dwx, axis=0, keepdims=True
            )
            gx += t * gs[ci]

        # y gradient through the y-lerp weights: drows/dy = imgT @ dohT.
        _, dohT, ymask = _hat_and_mask(iota_h, y, 0.0, h - 1.0)
        _seg_dot(acc_ref, seghit_ref, yi, imgT, dohT, h)
        wx, _, _ = _hat_and_mask(iota_w, x, 0.0, w - 1.0)
        gy = jnp.zeros_like(y)
        for ci in range(c):
            t = jnp.sum(
                acc_ref[ci * w : (ci + 1) * w] * wx, axis=0, keepdims=True
            )
            gy += t * gs[ci]

        gx = gx * xmask
        gy = gy * ymask
        for r in range(ROW_BLOCK):
            dxy_ref[0, 0, r : r + 1, :] = gx[:, r * wq : (r + 1) * wq]
            dxy_ref[0, 1, r : r + 1, :] = gy[:, r * wq : (r + 1) * wq]


def _seg_hits(xy, h):
    """Per-(batch, row-block) segment hit flags (B, NYB, NSEG) int32.

    A query with clamped source row cl touches segment [lo, hi) iff
    cl in (lo-1, hi): hat weights are nonzero on rows (cl-1, cl+1).
    Stop-gradient scheduling data, like the raster's chunk ranges."""
    b, _, hp, wp = xy.shape
    nseg = -(-h // SEG)
    cl = jnp.clip(xy[:, 1] - 0.5, 0.0, h - 1.0).reshape(
        b, hp // ROW_BLOCK, ROW_BLOCK * wp
    )
    lo = jnp.arange(nseg, dtype=jnp.float32)[None, None, :] * SEG
    hi = jnp.minimum(lo + SEG, float(h))
    hit = jnp.any(
        (cl[..., None] > lo - 1.0) & (cl[..., None] < hi), axis=2
    )
    return hit.astype(jnp.int32)


def _pad_queries(xy: jnp.ndarray):
    """Pad (B, 2, Hq, Wq) queries to (ROW_BLOCK, 128) multiples."""
    b, _, hq, wq = xy.shape
    hp, wp = _round_up(hq, ROW_BLOCK), _round_up(wq, 128)
    if (hp, wp) != (hq, wq):
        xy = jnp.pad(xy, ((0, 0), (0, 0), (0, hp - hq), (0, wp - wq)))
    return xy, hp, wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_padded(seghit, imgT, xy, dims):
    return _sample_fwd_call(seghit, imgT, xy, dims)


def _sample_fwd_call(seghit, imgT, xy, dims):
    h, w, c = dims
    b, _, hp, wp = xy.shape
    nseg = seghit.shape[-1]
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_sample_kernel, h=h, w=w, c=c)
    nyb = hp // ROW_BLOCK
    return pl.pallas_call(
        kernel,
        grid=(b, nyb),
        in_specs=[
            # Full per-batch hit table: Mosaic requires SMEM block dims to
            # equal the array dims; the kernel selects its row block via
            # program_id(1) (same pattern as the raster's krange).
            pl.BlockSpec((1, nyb, nseg), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w * c, h), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ROW_BLOCK, wp), lambda bi, yi: (bi, 0, yi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, ROW_BLOCK, wp), lambda bi, yi: (bi, 0, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w * c, ROW_BLOCK * wp), jnp.float32)
        ],
        interpret=interpret,
    )(seghit, imgT, xy)


def _sample_fwd(seghit, imgT, xy, dims):
    return _sample_fwd_call(seghit, imgT, xy, dims), (seghit, imgT, xy)


def _sample_bwd(dims, residual, g):
    seghit, imgT, xy = residual
    h, w, c = dims
    b, _, hp, wp = xy.shape
    nseg = seghit.shape[-1]
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_sample_bwd_kernel, h=h, w=w, c=c)
    nyb = hp // ROW_BLOCK
    # Any-nonzero cotangent per (batch, row block): exact block skipping
    # for the masked warp loss (background g is identically zero there).
    # Shaped (B, 1, NYB): Mosaic requires the SMEM block's last two dims to
    # equal the array's (a (1, NYB) block over (B, NYB) fails TPU lowering
    # — caught by the r4e2 batch; CPU interpret mode passes silently).
    gnz = jnp.any(
        g.reshape(b, c, nyb, ROW_BLOCK * wp) != 0, axis=(1, 3)
    ).astype(jnp.int32)[:, None, :]  # (B, 1, NYB)
    dxy = pl.pallas_call(
        kernel,
        grid=(b, nyb),
        in_specs=[
            pl.BlockSpec((1, 1, nyb), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nyb, nseg), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w * c, h), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ROW_BLOCK, wp), lambda bi, yi: (bi, 0, yi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, ROW_BLOCK, wp), lambda bi, yi: (bi, 0, yi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, ROW_BLOCK, wp), lambda bi, yi: (bi, 0, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w * c, ROW_BLOCK * wp), jnp.float32)
        ],
        interpret=interpret,
    )(gnz, seghit, imgT, xy, g)
    return None, None, dxy  # scheduling + image are data: no gradients


_sample_padded.defvjp(_sample_fwd, _sample_bwd)


def bilinear_sample_pallas(
    image: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear-sample ``image`` (B, H, W, C) at ``coords`` (B, Hq, Wq, 2).

    Drop-in replacement for ``warp.bilinear_sample_gather`` (same border
    clamp); differentiable in ``coords`` (image treated as data). The image
    is quantized to bf16 for the MXU row-selection — exact for 8-bit-sourced
    images.
    """
    b, h, w, c = image.shape
    _, hq, wq, _ = coords.shape
    # The backward kernel returns gradients for COORDS only; make the
    # image's data-only role explicit rather than letting the custom VJP's
    # None silently instantiate zeros (a caller differentiating w.r.t. the
    # image should use warp.bilinear_sample(..., image_grad=True)).
    image = jax.lax.stop_gradient(image)
    # bf16 rows feed the MXU on TPU; CPU (interpret mode) keeps f32 so the
    # kernel is bit-comparable to the gather reference in tests.
    mm_dtype = (
        jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    )
    # CHANNEL-MAJOR flat layout: (B, C*W, H), row ci*W + wpos.
    imgT = image.transpose(0, 3, 2, 1).reshape(b, c * w, h).astype(mm_dtype)
    xy = jnp.moveaxis(coords, -1, 1)  # (B, 2, Hq, Wq)
    xy, hp, wp = _pad_queries(xy)
    seghit = jax.lax.stop_gradient(_seg_hits(xy, h))
    out = _sample_padded(seghit, imgT, xy, (h, w, c))  # (B, C, hp, wp)
    out = out[:, :, :hq, :wq]
    return jnp.moveaxis(out, 1, -1)
