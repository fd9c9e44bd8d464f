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
    wxT   = tile_c(hat(iota_W - x))  (C*W, P)  x-lerp weights
    out_c = sum_w (rowsT * wxT)[c]   (1, P)    contiguous sublane reduction

``hat(d) = max(0, 1 - |d|)`` with coordinates clamped to the valid range
reproduces exactly the border-clamp bilinear semantics of
``warp.bilinear_sample_gather`` (same as torch grid_sample
padding_mode='border', the reference's warp sampler).

The image lives in VMEM transposed CHANNEL-MAJOR as (C*W, H) bf16 (393 KB
at 256^2x3) and stays resident across the row-block grid dimension;
c-major means each output channel is a CONTIGUOUS (W, P) sublane slice of
the product — no per-channel one-hot masking passes — and the x-hat
weights are computed once at (W, P) and tiled, not recomputed at (C*W, P).
The backward is a hand-written mirror kernel (2 matmuls: recompute rowsT +
the y-derivative rows) returning dcoords; the image is data (no gradient
needed).

Reference parity: torch ``F.grid_sample`` used by the consistency warp,
SURVEY.md §3.2 step (3).

CLOSED experiment (round 4, measured loss — do not re-attempt without new
evidence): a segmented-K variant skipped 128-row source segments with no
hat-weight hits (SMEM per-(batch, row-block, segment) flag table, plus an
all-zero-cotangent row-block skip in the backward). On v5e-1 it REGRESSED
bilinear fwd+bwd 5.3 -> 8.3 ms with real warp coords (9.9 ms uniform) and
the full warp step 507.6 -> 462.7 toy / 394.8 -> 372.3 realistic pairs/s:
the per-segment flag reads, smaller per-matmul shapes, and the extra
any-nonzero reduction pass over the cotangents cost more than the skipped
MXU work (raw logs: measurements/tpu_batch_r4f2.log; code at git
43539b4^..43539b4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8  # output rows per program


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


def _tile_c(mat, c):
    """Tile (W, P) sublane-wise to (C*W, P) — matches the c-major flat axis."""
    return jnp.concatenate([mat] * c, axis=0) if c > 1 else mat


def _sample_kernel(imgT_ref, xy_ref, out_ref, *, h, w, c):
    """Forward: out (1, C, RB, Wq) from imgT (1, C*W, H) and xy (1, 2, RB, Wq).

    All ROW_BLOCK output rows are folded into the lane axis (P = RB*Wq), so
    the row selection is ONE (C*W, H) @ (H, P) matmul per program instead
    of RB narrow ones — ~8x larger N amortizes the MXU weight load."""
    wq = xy_ref.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
    imgT = imgT_ref[0]  # (C*W, H) bf16, c-major
    x = _flatten_rows(xy_ref, 0)  # (1, RB*Wq)
    y = _flatten_rows(xy_ref, 1)
    ohT, _, _ = _hat_and_mask(iota_h, y, 0.0, h - 1.0)  # (H, RB*Wq)
    rowsT = jax.lax.dot_general(
        imgT,
        ohT.astype(imgT.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C*W, RB*Wq) — y-interpolated flat columns
    wx, _, _ = _hat_and_mask(iota_w, x, 0.0, w - 1.0)  # (W, RB*Wq)
    prod = rowsT * _tile_c(wx, c)
    for ci in range(c):
        # c-major: channel ci is the contiguous sublane block [ci*w, ci*w+w).
        s = jnp.sum(prod[ci * w : (ci + 1) * w], axis=0, keepdims=True)
        for r in range(ROW_BLOCK):
            out_ref[0, ci, r : r + 1, :] = s[:, r * wq : (r + 1) * wq]


def _sample_bwd_kernel(imgT_ref, xy_ref, g_ref, dxy_ref, *, h, w, c):
    """Backward: dcoords (1, 2, RB, Wq) from the output cotangent g.

    Same row-folding as the forward: both dots run once at (H, RB*Wq)."""
    wq = xy_ref.shape[-1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
    imgT = imgT_ref[0]
    x = _flatten_rows(xy_ref, 0)  # (1, RB*Wq)
    y = _flatten_rows(xy_ref, 1)
    ohT, dohT, ymask = _hat_and_mask(iota_h, y, 0.0, h - 1.0)
    wx, dwx, xmask = _hat_and_mask(iota_w, x, 0.0, w - 1.0)
    # Cotangent on the c-major flat axis: gflat[ci*w + k, p] = g[ci, p].
    gflat = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.concatenate(
                    [g_ref[0, ci, r : r + 1, :] for r in range(ROW_BLOCK)],
                    axis=1,
                ),
                (w, ROW_BLOCK * wq),
            )
            for ci in range(c)
        ],
        axis=0,
    )  # (C*W, RB*Wq)

    rowsT = jax.lax.dot_general(
        imgT, ohT.astype(imgT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gx = jnp.sum(
        rowsT * gflat * _tile_c(dwx, c), axis=0, keepdims=True
    )  # (1, RB*Wq)

    # y gradient through the y-lerp weights: drows/dy = imgT @ dohT.
    dtT = jax.lax.dot_general(
        imgT, dohT.astype(imgT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gy = jnp.sum(dtT * gflat * _tile_c(wx, c), axis=0, keepdims=True)

    gx = gx * xmask
    gy = gy * ymask
    for r in range(ROW_BLOCK):
        dxy_ref[0, 0, r : r + 1, :] = gx[:, r * wq : (r + 1) * wq]
        dxy_ref[0, 1, r : r + 1, :] = gy[:, r * wq : (r + 1) * wq]


def _pad_queries(xy: jnp.ndarray):
    """Pad (B, 2, Hq, Wq) queries to (ROW_BLOCK, 128) multiples."""
    b, _, hq, wq = xy.shape
    hp, wp = _round_up(hq, ROW_BLOCK), _round_up(wq, 128)
    if (hp, wp) != (hq, wq):
        xy = jnp.pad(xy, ((0, 0), (0, 0), (0, hp - hq), (0, wp - wq)))
    return xy, hp, wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sample_padded(imgT, xy, dims):
    return _sample_fwd_call(imgT, xy, dims)


def _sample_fwd_call(imgT, xy, dims):
    h, w, c = dims
    b, _, hp, wp = xy.shape
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_sample_kernel, h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b, hp // ROW_BLOCK),
        in_specs=[
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
        interpret=interpret,
    )(imgT, xy)


def _sample_fwd(imgT, xy, dims):
    return _sample_fwd_call(imgT, xy, dims), (imgT, xy)


def _sample_bwd(dims, residual, g):
    imgT, xy = residual
    h, w, c = dims
    b, _, hp, wp = xy.shape
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_sample_bwd_kernel, h=h, w=w, c=c)
    dxy = pl.pallas_call(
        kernel,
        grid=(b, hp // ROW_BLOCK),
        in_specs=[
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
        interpret=interpret,
    )(imgT, xy, g)
    return None, dxy  # image is data: no gradient


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
    out = _sample_padded(imgT, xy, (h, w, c))  # (B, C, hp, wp)
    out = out[:, :, :hq, :wq]
    return jnp.moveaxis(out, 1, -1)
