"""Soft differentiable rasterizer — shared math + pure-XLA backend.

Functional contract (matches what the reference gets from neural_renderer's
``rasterize`` — silhouette, per-pixel interpolated vertex attributes
("texture"/flow coordinates), depth — but with a soft formulation giving
exact gradients instead of NMR's hand-written approximate CUDA backward):

  For every screen-projected triangle f and pixel q:
    d2(q,f)  = SIGNED SQUARED distance (px^2) from q to the triangle
               (positive inside; exact point-to-segment outside) — built
               from per-face functions that are all AFFINE in pixel coords
               (see FacePlanes).
    p(q,f)   = sigmoid(d2 / sigma^2)                 soft coverage (SoftRas)
    sil(q)   = 1 - prod_f (1 - p(q,f))               soft silhouette
    l(q,f)   = log p - zbar(q,f) / gamma             depth-softmax logit
    attr(q)  = softmax over {l(q,f)} U {l_bg} of the interpolated
               attributes (background: attrs 0, zbar 1) — occlusion-aware
               blending that replaces the z-buffer visibility test
               (no atomics, deterministic).
    vis(q)   = 1 - background softmax share          soft visibility mask

  zbar is screen-space-interpolated depth normalized to [0,1] with
  stop-gradient bounds. The softmax is computed STREAMING with a running
  max (carried through the face-chunk scan), so gamma may be arbitrarily
  sharp without overflow and empty pixels cleanly fall back to background.

TPU mapping: every per-pixel quantity (edge distances, along-edge coords,
zbar, C attributes) is affine in (x, y), so evaluating them over a pixel
tile is one batched matmul/broadcast of ``planes[F, 10+C, 3]`` against
``[x; y; 1]``; the sigmoid / exp / reductions over faces are VPU work. The
Pallas kernels (raster_pallas.py) and this XLA backend share the plane
precomputation and compute the same math, so they are numerically
interchangeable (the kernels add chunk culling below the ~6*sigma coverage
cutoff).

Numerical safety: log(1-p) accumulates as -softplus(logits) (never log(0));
log(p) as -softplus(-logits).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_DEGENERATE_EPS = 1e-12
# Faces with |2*area| below this (px^2) are culled as degenerate.
_AREA_EPS = 1e-6


class RasterOutput(NamedTuple):
    sil: jnp.ndarray  # (B, H, W)   soft silhouette in [0, 1]
    attr: jnp.ndarray  # (B, H, W, C) aggregated vertex attributes
    depth: jnp.ndarray  # (B, H, W)  aggregated normalized depth in [0, 1]
    vis: jnp.ndarray  # (B, H, W)   fraction of softmax mass from faces
    #                   (1 - background share); use as a soft visibility mask


class FacePlanes(NamedTuple):
    """Per-face affine coefficient rows: value(x, y) = row . (x, y, 1).

    Row layout (R = 10 + C):
      rows 0-2: s_k — signed perpendicular distance (px) to the line through
                edge k (positive inside the triangle),
      rows 3-5: u_k — along-edge coordinate of the pixel on edge k,
      rows 6-8: constant rows evaluating to L_k (edge k length),
      row 9:    zbar (screen-interpolated normalized depth),
      rows 10+: user attributes.
    Together these give the exact signed squared distance to the TRIANGLE
    (not its edge lines): inside d2 = (min_k s_k)^2; outside
    d2 = -min_k (s_k^2 + overhang_k^2) with overhang = max(0, -u, u - L).
    The naive min-edge-line-distance formulation leaks coverage far beyond
    sliver triangles along their extensions; point-to-segment does not.
    """

    rows: jnp.ndarray  # (B, F, 10 + C, 3)
    valid: jnp.ndarray  # (B, F) 1.0 for non-degenerate faces


N_GEOM_ROWS = 10  # s(3) + u(3) + L(3) + zbar(1)


def normalize_depth(
    verts_z: jnp.ndarray, margin: float = 0.05
) -> jnp.ndarray:
    """Normalize camera-space z to [0,1] per batch element (stop-grad bounds)."""
    zmin = jax.lax.stop_gradient(jnp.min(verts_z, axis=-1, keepdims=True))
    zmax = jax.lax.stop_gradient(jnp.max(verts_z, axis=-1, keepdims=True))
    span = jnp.maximum(zmax - zmin, 1e-6)
    return (verts_z - zmin) / span * (1.0 - 2.0 * margin) + margin


def gather_faces(arr: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-face gather supporting shared (F,3) or per-batch (B,F,3) faces."""
    if faces.ndim == 2:
        return arr[:, faces]
    return jax.vmap(lambda a, f: a[f])(arr, faces)


def face_det2d(fv: jnp.ndarray) -> jnp.ndarray:
    """Signed 2x(triangle area) from gathered screen-space verts (..., 3, 2).

    Differences-first so duplicate-vertex faces give EXACTLY zero in f32
    (an adjugate-style expansion leaves a ~1e-5 rounding residue that would
    let degenerate faces leak garbage planes). The degeneracy criterion is
    ``|face_det2d(fv)| > _AREA_EPS``; every consumer (plane validity in
    ``face_planes``, scheduling keys in ``sort_faces_by_y``) MUST use this
    one helper so the predicates cannot drift apart.
    """
    return (fv[..., 1, 0] - fv[..., 0, 0]) * (fv[..., 2, 1] - fv[..., 0, 1]) - (
        fv[..., 2, 0] - fv[..., 0, 0]
    ) * (fv[..., 1, 1] - fv[..., 0, 1])


# Backface culling keeps NEAR-TANGENT backfaces: cull only when the signed
# area exceeds this fraction of the mesh's mean |area|. The rim band's
# barely-backfacing faces stabilize the attribute softmax at silhouette
# pixels (they interpolate where front faces must extrapolate); culling
# them costs little compute but measurably degrades the photometric warp
# (perfect-warp DSSIM 0.0076 -> 0.062 at margin 0, fully recovered at 0.25
# while still culling ~45% of a convex solid's faces).
BACKFACE_MARGIN_FRAC = 0.25


def face_valid(fv: jnp.ndarray, backface_cull: bool = False) -> jnp.ndarray:
    """Face validity predicate (bool), shared by planes and scheduling.

    Always culls degenerate faces (``|det| <= _AREA_EPS``). With
    ``backface_cull``, additionally culls faces whose screen-space winding
    is clearly counter-clockwise in the y-down pixel frame
    (``det > BACKFACE_MARGIN_FRAC * mean|det|``): for the standard outward
    winding convention (``cross(v1-v0, v2-v0)`` points out of the mesh —
    MANO/SMPL, our synthetic meshes, and ``meshes.orient_faces_outward``
    output), those are faces whose outward normal points away from the
    camera by a margin. On a watertight mesh every backface lies behind a
    frontface along its ray, so culling leaves the soft render nearly
    unchanged while ~halving the live face count
    (test_backface_cull.py). Culled faces y-sort to +inf, so their chunks
    vanish from the Pallas kernels' loop ranges — the speedup needs no
    kernel change.
    """
    det = face_det2d(fv)
    valid = jnp.abs(det) > _AREA_EPS
    if backface_cull:
        # mean|det| over NON-degenerate faces only: padded object-face
        # slots (det=0, a buffer-sizing artifact) must not dilute the
        # margin, or the effective margin would scale with the padding
        # fraction instead of staying at the calibrated value.
        absdet = jnp.abs(det)
        n_valid = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
        margin = BACKFACE_MARGIN_FRAC * (
            jnp.sum(jnp.where(valid, absdet, 0.0), axis=-1, keepdims=True)
            / n_valid
        )
        valid = jnp.logical_and(valid, det < margin)
    return valid


def face_planes(
    verts_pix: jnp.ndarray,
    verts_zbar: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: Optional[jnp.ndarray],
    backface_cull: bool = False,
) -> FacePlanes:
    """Build the affine plane rows for every face.

    Args:
      verts_pix: (B, V, 2) screen-space vertex positions in pixels.
      verts_zbar: (B, V) normalized depth in [0, 1] (see normalize_depth).
      faces: (F, 3) int vertex indices, or (B, F, 3) per-sample meshes
        (e.g. hand + per-sample object; padded faces may be degenerate —
        they are culled via the validity mask).
      attrs: optional (B, V, C) per-vertex attributes to interpolate.
    """
    # ONE fused gather of [pix, zbar, attrs] per face-vertex (a single
    # scatter-add in the backward instead of three).
    payload = [verts_pix, verts_zbar[..., None]]
    if attrs is not None:
        payload.append(attrs)
    fall = gather_faces(jnp.concatenate(payload, axis=-1), faces)
    fv = fall[..., :2]  # (B, F, 3, 2)
    fz = fall[..., 2]  # (B, F, 3)
    ones = jnp.ones_like(fz)
    # mat columns are the homogeneous vertices: [x;y;1] per vertex.
    mat = jnp.stack([fv[..., 0], fv[..., 1], ones], axis=-2)  # (B, F, 3, 3)

    # Closed-form 3x3 inverse via adjugate (batched, no linalg call needed).
    a, b, c = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    d, e, f = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    g, h, i = mat[..., 2, 0], mat[..., 2, 1], mat[..., 2, 2]
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        axis=-2,
    )  # (B, F, 3, 3)
    # det == 2 * signed triangle area (shared predicate — see face_valid).
    det = face_det2d(fv)
    valid = face_valid(fv, backface_cull).astype(verts_pix.dtype)
    safe_det = jnp.where(jnp.abs(det) > _AREA_EPS, det, 1.0)
    # Rows of minv give barycentric coords: w_k(x,y) = minv[k] . (x,y,1).
    minv = adj / safe_det[..., None, None]

    # Edge-distance normalization: |grad w_k| = ||(a_k, b_k)||, so
    # w_k / |grad w_k| is the signed pixel distance to edge line k.
    grad_norm = jnp.sqrt(
        minv[..., 0] ** 2 + minv[..., 1] ** 2 + _DEGENERATE_EPS
    )  # (B, F, 3)
    edge_rows = minv / grad_norm[..., None]  # (B, F, 3, 3)

    # Along-edge coordinate rows. Edge k runs A_k -> B_k with
    # A_k = v_{k+1}, B_k = v_{k+2} (the edge opposite vertex k, matching the
    # barycentric row s_k above).
    v_a = fv[:, :, jnp.asarray([1, 2, 0]), :]  # (B, F, 3, 2)
    v_b = fv[:, :, jnp.asarray([2, 0, 1]), :]
    e_vec = v_b - v_a
    e_len = jnp.sqrt(jnp.sum(e_vec**2, axis=-1) + _DEGENERATE_EPS)  # (B,F,3)
    e_hat = e_vec / e_len[..., None]
    u_rows = jnp.concatenate(
        [e_hat, -jnp.sum(v_a * e_hat, axis=-1, keepdims=True)], axis=-1
    )  # (B, F, 3, 3): u_k(x,y) = (p - A_k) . e_hat_k
    zero = jnp.zeros_like(e_len)
    l_rows = jnp.stack([zero, zero, e_len], axis=-1)  # constant rows -> L_k

    z_row = jnp.einsum("bfk,bfkc->bfc", fz, minv)[..., None, :]  # (B,F,1,3)
    rows = [edge_rows, u_rows, l_rows, z_row]
    if attrs is not None:
        fattr = fall[..., 3:]  # (B, F, 3, C)
        attr_rows = jnp.einsum("bfkc,bfkm->bfcm", fattr, minv)  # (B,F,C,3)
        rows.append(attr_rows)
    return FacePlanes(rows=jnp.concatenate(rows, axis=-2), valid=valid)


def _pixel_grid(h: int, w: int, dtype) -> jnp.ndarray:
    """Homogeneous pixel-center coordinates, shape (3, H*W)."""
    ys = (jnp.arange(h, dtype=dtype) + 0.5)[:, None]
    xs = (jnp.arange(w, dtype=dtype) + 0.5)[None, :]
    x = jnp.broadcast_to(xs, (h, w)).reshape(-1)
    y = jnp.broadcast_to(ys, (h, w)).reshape(-1)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=0)


def _aggregate_chunk(planes_chunk, valid_chunk, pix, sigma, gamma):
    """Evaluate one face chunk against one pixel block.

    planes_chunk: (B, FC, R, 3); valid_chunk: (B, FC); pix: (3, P).
    Returns per-pixel per-face quantities for the streaming aggregation:
      log_neg (B, P): sum_f log(1 - p_f)  (silhouette product)
      l       (B, FC, P): softmax logits log(p_f) - zbar_f / gamma
      interp  (B, FC, C+1, P): interpolated [attrs; zbar]
    """
    vals = jnp.einsum(
        "bfrk,kp->bfrp", planes_chunk, pix, precision=jax.lax.Precision.HIGHEST
    )  # (B, FC, R, P)
    s = vals[:, :, 0:3]  # perpendicular signed distance to edge lines
    u = vals[:, :, 3:6]  # along-edge coordinate
    length = vals[:, :, 6:9]  # constant edge lengths
    overhang = jnp.maximum(jnp.maximum(-u, u - length), 0.0)
    dist2_out = jnp.min(s * s + overhang * overhang, axis=2)  # (B, FC, P)
    d_in = jnp.min(s, axis=2)
    # Signed squared distance to the triangle (SoftRas-style), in px^2.
    signed_sq = jnp.where(d_in > 0, d_in * d_in, -dist2_out)
    signed_sq = jnp.where(valid_chunk[..., None] > 0, signed_sq, -1e18)
    logits = signed_sq / (sigma * sigma)
    # ONE softplus serves both accumulators: with sp = softplus(-x),
    # log(sigmoid(x)) == -sp and log(1 - sigmoid(x)) == -softplus(x)
    # == -(x + sp) (identity softplus(x) = x + softplus(-x); exact at the
    # saturated ends, ~1e-6 abs rounding in between — far below test/loss
    # noise). Saves an exp+log per (face, pixel) in the hot path.
    sp = jax.nn.softplus(-logits)
    log_neg = -(logits + sp)  # (B, FC, P)
    # Clamp interpolated depth to the normalized range: inside a face the
    # affine interpolation already lies in [0,1]; outside it extrapolates
    # arbitrarily.
    zbar = jnp.clip(vals[:, :, 9], 0.0, 1.0)  # (B, FC, P)
    l = -sp - zbar / gamma  # log(p) - z/gamma
    interp = jnp.concatenate(
        [vals[:, :, 10:], zbar[:, :, None]], axis=2
    )  # (B, FC, C+1, P)
    return jnp.sum(log_neg, axis=1), l, interp


def rasterize_planes_xla(
    planes: FacePlanes,
    image_size: tuple[int, int],
    sigma: float,
    gamma: float,
    face_chunk: int = 128,
    pixel_rows: int = 16,
) -> RasterOutput:
    """Streaming XLA rasterization of prepared face planes.

    Scans over face chunks (bounded memory) for each block of pixel rows.
    Fully differentiable; used on CPU/tests and as the recompute backward
    for the Pallas forward kernel.
    """
    rows, valid = planes.rows, planes.valid
    b, f, r, _ = rows.shape
    n_attr = r - (N_GEOM_ROWS - 1)  # zbar + C user attrs
    h, w = image_size
    dtype = rows.dtype

    # Pad faces to a chunk multiple (padded faces are invalid -> no-ops).
    f_pad = (-f) % face_chunk
    if f_pad:
        rows = jnp.pad(rows, ((0, 0), (0, f_pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, f_pad)))
    n_chunks = rows.shape[1] // face_chunk
    rows_c = rows.reshape(b, n_chunks, face_chunk, r, 3)
    valid_c = valid.reshape(b, n_chunks, face_chunk)

    h_pad = (-h) % pixel_rows
    grid = _pixel_grid(h + h_pad, w, dtype).reshape(3, -1, pixel_rows * w)
    n_blocks = grid.shape[1]

    l_bg = jnp.asarray(-1.0 / gamma, dtype)  # background logit (p=1, zbar=1)

    def pixel_block(pix):  # pix: (3, P)
        p_sz = pix.shape[-1]

        @jax.checkpoint  # rematerialize in backward: the per-chunk (B,FC,P)
        # intermediates would otherwise be saved for EVERY scan step, which
        # is the full O(faces x pixels) tensor (tens of GB at 256^2).
        def scan_fn(carry, chunk):
            # Streaming max-renormalized softmax over faces (+ background):
            # carry m is the running max logit; accumulators are relative to
            # exp(m), so gamma can be arbitrarily sharp without under/overflow.
            log_neg, m, num, den = carry
            planes_chunk, valid_chunk = chunk
            ln, l, interp = _aggregate_chunk(
                planes_chunk, valid_chunk, pix, sigma, gamma
            )
            m_new = jnp.maximum(m, jnp.max(l, axis=1))
            scale = jnp.exp(m - m_new)
            w = jnp.exp(l - m_new[:, None])  # (B, FC, P)
            num = num * scale[:, None] + jnp.einsum("bfp,bfcp->bcp", w, interp)
            den = den * scale + jnp.sum(w, axis=1)
            return (log_neg + ln, m_new, num, den), None

        # Initialize with the background "face": weight 1 at logit l_bg,
        # zbar_bg = 1, attrs_bg = 0.
        num0 = jnp.zeros((b, n_attr, p_sz), dtype).at[:, -1].set(1.0)
        init = (
            jnp.zeros((b, p_sz), dtype),
            jnp.full((b, p_sz), l_bg, dtype),
            num0,
            jnp.ones((b, p_sz), dtype),
        )
        (log_neg, m, num, den), _ = jax.lax.scan(
            scan_fn,
            init,
            (rows_c.transpose(1, 0, 2, 3, 4), valid_c.transpose(1, 0, 2)),
        )
        vis = 1.0 - jnp.exp(l_bg - m) / den
        return log_neg, num / den[:, None], vis

    log_neg, agg, vis = jax.lax.map(pixel_block, grid.transpose(1, 0, 2))
    # (n_blocks, B, ...) -> (B, H, W, ...)
    log_neg = log_neg.transpose(1, 0, 2).reshape(b, h + h_pad, w)[:, :h]
    vis = vis.transpose(1, 0, 2).reshape(b, h + h_pad, w)[:, :h]
    agg = agg.transpose(1, 2, 0, 3).reshape(b, n_attr, h + h_pad, w)[:, :, :h]

    sil = 1.0 - jnp.exp(log_neg)
    attr = jnp.moveaxis(agg[:, :-1], 1, -1)
    return RasterOutput(sil=sil, attr=attr, depth=agg[:, -1], vis=vis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "sigma", "gamma", "backend", "face_chunk",
        "backface_cull",
    ),
)
def soft_rasterize(
    verts_pix: jnp.ndarray,
    verts_z: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: Optional[jnp.ndarray] = None,
    image_size: tuple[int, int] = (256, 256),
    sigma: float = 1.0,
    gamma: float = 1.0 / 40.0,
    backend: str = "auto",
    face_chunk: int = 128,
    backface_cull: bool = False,
) -> RasterOutput:
    """Soft-rasterize a batch of meshes. Public entry point.

    Args:
      verts_pix: (B, V, 2) vertices projected to pixel coordinates.
      verts_z: (B, V) camera-space depth (any positive scale).
      faces: (F, 3) int triangle indices.
      attrs: optional (B, V, C) vertex attributes (e.g. reference-frame
        pixel coords for the photometric warp).
      sigma: boundary softness in pixels — coverage is
        sigmoid(+-d^2 / sigma^2) with d the exact pixel distance to the
        triangle, so influence is numerically zero beyond ~6*sigma.
      gamma: depth-softmax temperature on normalized depth in [0,1]
        (keep >= 1/60 for f32 range).
      backend: 'xla', 'pallas', or 'auto' (pallas on TPU else xla).
      backface_cull: cull faces wound away from the camera (see
        ``face_valid``). Exact only for watertight outward-wound meshes
        (backfaces are occluded); roughly halves the live face count, and
        with it the Pallas kernels' chunk work. Off by default — enable
        where the mesh contract is known (the warp loss does).
    """
    if attrs is None:
        attrs = jnp.zeros(verts_pix.shape[:2] + (0,), verts_pix.dtype)
    zbar = normalize_depth(verts_z)

    if backend == "auto":
        # Explicit tpu test: any OTHER backend (gpu/rocm) must take the
        # XLA path — the Mosaic TPU kernels do not lower there.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from hocon.render import raster_pallas
        from hocon.render.raster_pallas import (
            rasterize_planes_pallas,
            sort_faces_by_y,
        )

        # Sort the INT face indices by screen y before building planes: the
        # differentiable (B, F, R, 3) plane rows are then born in sorted
        # order, so packing needs no take_along_axis on them (and the
        # backward no scatter) — the sort permutes only integer metadata.
        cfg = raster_pallas.default_config()
        faces_sorted, face_bbox = sort_faces_by_y(
            verts_pix, faces, backface_cull=backface_cull,
        )
        planes = face_planes(verts_pix, zbar, faces_sorted, attrs,
                             backface_cull=backface_cull)
        return rasterize_planes_pallas(
            planes, face_bbox, image_size=image_size, sigma=sigma,
            gamma=gamma, presorted=True, config=cfg,
        )
    planes = face_planes(verts_pix, zbar, faces, attrs,
                         backface_cull=backface_cull)
    return rasterize_planes_xla(
        planes, image_size=image_size, sigma=sigma, gamma=gamma,
        face_chunk=face_chunk,
    )
