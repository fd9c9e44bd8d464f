"""Pallas TPU forward kernel for the soft rasterizer.

Replaces the reference's only native component (neural_renderer's CUDA
``forward_face_index_map``/texture-sampling kernels) with a TPU-native
design:

- Faces are **sorted by screen-space y** and grouped into chunks of
  ``FACE_CHUNK``; each chunk carries a y-interval (expanded by the coverage
  cutoff radius) so a pixel-row program skips chunks that cannot influence
  it (the TPU analogue of NMR's per-pixel face loop, but branch-free inside
  a chunk and with no atomics).
- Grid = (batch, row-block of 8 image rows). Within a program, a face chunk
  is evaluated against the whole (8, W) pixel block at once: coefficients
  (FC, 1, 1) broadcast against pixel x (1, 1, W) and y (1, 8, 1) on the
  VPU — faces in the leading dim, pixels in (sublane, lane).
- Aggregation (soft-silhouette log accumulator + streaming max-renormalized
  depth softmax) lives in VMEM scratch; one final pass writes the block.
  Fully deterministic: plain sums, no z-buffer races (SURVEY.md §5.2).

Backward: gradients come from ``jax.vjp`` over the XLA streaming backend
(raster.rasterize_planes_xla), which computes the same math (the kernel's
chunk culling only drops contributions below the coverage cutoff ~e^-36).
A hand-written Pallas backward is a planned optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hocon.render.raster import FacePlanes, RasterOutput, rasterize_planes_xla

FACE_CHUNK = 32
ROW_BLOCK = 8
# Coverage is sigmoid(-d^2/sigma^2): at 6*sigma from a face it is ~2e-16,
# so culling chunks beyond this radius is numerically exact in f32.
CUTOFF_SIGMAS = 6.0
_BIG_NEG = -1e4  # inert-face edge constant; squared stays in f32 range


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_sorted_planes(
    planes: FacePlanes,
    face_bbox: jnp.ndarray,
    sigma: float,
    face_chunk: int = FACE_CHUNK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort faces by y-center, bake validity into coeffs, compute chunk bounds.

    Args:
      planes: FacePlanes with rows (B, F, R, 3).
      face_bbox: (B, F, 4) [ymin, ymax, xmin, xmax] per face (from verts,
        stop-gradient — used only for scheduling).

    Returns:
      coeffs: (B, Fp, R*3) float32, faces sorted by y, padded with inert
        faces (all three s-rows constant -1e4 -> zero coverage).
      ybounds: (B, NC, 2) float32 per-chunk [ymin - margin, ymax + margin].
    """
    rows, valid = planes.rows, planes.valid
    b, f, r, _ = rows.shape

    face_bbox = jax.lax.stop_gradient(face_bbox)
    ycenter = jnp.where(
        valid > 0, 0.5 * (face_bbox[..., 0] + face_bbox[..., 1]), jnp.inf
    )
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
    ymin = jnp.where(valid > 0, bbox[..., 0], jnp.inf)
    ymax = jnp.where(valid > 0, bbox[..., 1], -jnp.inf)
    ymin = jnp.pad(ymin, ((0, 0), (0, fp - f)), constant_values=jnp.inf)
    ymax = jnp.pad(ymax, ((0, 0), (0, fp - f)), constant_values=-jnp.inf)
    cymin = jnp.min(ymin.reshape(b, nc, face_chunk), axis=-1) - margin
    cymax = jnp.max(ymax.reshape(b, nc, face_chunk), axis=-1) + margin
    ybounds = jnp.stack([cymin, cymax], axis=-1).astype(jnp.float32)
    return coeffs, ybounds


def _raster_kernel(
    ybounds_ref,  # SMEM (1, NC, 2)
    coeffs_ref,  # VMEM (1, Fp, R*3)
    sil_ref,  # VMEM (1, RB, W)
    attr_ref,  # VMEM (1, C+1, RB, W)   (user attrs + zbar channel)
    vis_ref,  # VMEM (1, RB, W)
    acc_ref,  # VMEM scratch (C+4, RB, W): [log_neg, m, den, attr..., z]
    *,
    n_chunks: int,
    n_attr: int,  # C + 1 (incl. depth channel)
    width: int,
    face_chunk: int,
    sigma: float,
    gamma: float,
):
    rb = ROW_BLOCK
    y_base = (pl.program_id(1) * rb).astype(jnp.float32)
    inv_sigma_sq = 1.0 / (sigma * sigma)
    inv_gamma = 1.0 / gamma
    l_bg = jnp.float32(-1.0 / gamma)  # background logit (p=1, zbar=1)

    # Streaming max-renormalized softmax state, initialized with the
    # background "face" (weight 1 at logit l_bg, zbar_bg = 1, attrs_bg = 0).
    acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[1:2] = jnp.full((1, rb, width), l_bg)
    acc_ref[2:3] = jnp.ones((1, rb, width))
    acc_ref[n_attr + 2 : n_attr + 3] = jnp.ones((1, rb, width))

    # iota must be integer-typed on TPU; convert after.
    x = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2).astype(jnp.float32)
        + 0.5
    )  # pixel-center columns
    y = (
        jax.lax.broadcasted_iota(jnp.int32, (1, rb, 1), 1).astype(jnp.float32)
        + y_base
        + 0.5
    )  # pixel-center rows

    def chunk_body(k, _):
        ymin = ybounds_ref[0, k, 0]
        ymax = ybounds_ref[0, k, 1]

        @pl.when(jnp.logical_and(y_base + rb > ymin, y_base < ymax))
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
            # log(p) - z/gamma, with log(sigmoid(x)) == -softplus(-x).
            l = -jax.nn.softplus(-logits) - zbar * inv_gamma  # (FC, RB, W)

            m_old = acc_ref[1:2]
            m_new = jnp.maximum(m_old, jnp.max(l, axis=0, keepdims=True))
            scale = jnp.exp(m_old - m_new)
            w = jnp.exp(l - m_new)  # (FC, RB, W)

            acc_ref[0:1] += jnp.sum(-jax.nn.softplus(logits), axis=0, keepdims=True)
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

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    log_neg = acc_ref[0]
    m = acc_ref[1]
    den = acc_ref[2]
    inv_den = 1.0 / den
    sil_ref[0] = 1.0 - jnp.exp(log_neg)
    vis_ref[0] = 1.0 - jnp.exp(l_bg - m) * inv_den
    attr_ref[0] = acc_ref[3 : n_attr + 3] * inv_den[None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _rasterize_sorted(coeffs, ybounds, image_size, sigma, gamma, n_attr):
    return _rasterize_sorted_fwd_impl(
        coeffs, ybounds, image_size, sigma, gamma, n_attr
    )


def _rasterize_sorted_fwd_impl(coeffs, ybounds, image_size, sigma, gamma, n_attr):
    b, fp, r3 = coeffs.shape
    h, w = image_size
    wp = _round_up(w, 128)
    hp = _round_up(h, ROW_BLOCK)
    nc = ybounds.shape[1]
    interpret = jax.default_backend() == "cpu"

    kernel = functools.partial(
        _raster_kernel,
        n_chunks=nc,
        n_attr=n_attr,
        width=wp,
        face_chunk=FACE_CHUNK,
        sigma=sigma,
        gamma=gamma,
    )
    sil, attr, vis = pl.pallas_call(
        kernel,
        grid=(b, hp // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((1, nc, 2), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, fp, r3), lambda bi, yi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_BLOCK, wp), lambda bi, yi: (bi, yi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_attr, ROW_BLOCK, wp),
                         lambda bi, yi: (bi, 0, yi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, wp), lambda bi, yi: (bi, yi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, n_attr, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_attr + 3, ROW_BLOCK, wp), jnp.float32)
        ],
        interpret=interpret,
    )(ybounds, coeffs)
    return sil[:, :h, :w], attr[:, :, :h, :w], vis[:, :h, :w]


def _rasterize_sorted_fwd(coeffs, ybounds, image_size, sigma, gamma, n_attr):
    out = _rasterize_sorted_fwd_impl(coeffs, ybounds, image_size, sigma, gamma, n_attr)
    return out, coeffs


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


def _rasterize_sorted_bwd(image_size, sigma, gamma, n_attr, residual, grads):
    coeffs = residual
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
) -> RasterOutput:
    """Rasterize prepared face planes with the Pallas TPU kernel.

    ``face_bbox`` (B, F, 4) [ymin, ymax, xmin, xmax] enables chunk culling;
    if None, bounds are conservatively infinite (no culling).
    """
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
    coeffs, ybounds = pack_sorted_planes(planes, face_bbox, sigma)
    sil, attr, vis = _rasterize_sorted(
        coeffs, ybounds, image_size, sigma, gamma, n_attr
    )
    return RasterOutput(
        sil=sil,
        attr=jnp.moveaxis(attr[:, : n_attr - 1], 1, -1),
        depth=attr[:, n_attr - 1],
        vis=vis,
    )
