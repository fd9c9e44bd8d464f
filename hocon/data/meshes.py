"""Mesh utilities: decimation for the rasterizer face budget.

Reference parity: SURVEY.md §2.2 "Object models → decimated variants for
rasterizer budget". The reference renders decimated object meshes inside
the photometric-consistency loss; raw YCB ``textured_simple.obj`` meshes
are ~10-20k faces while the Pallas rasterizer is swept at ~1-2k faces, so
real-data renderer-in-the-loop training needs this reduction.

Vertex-clustering decimation: snap vertices to a uniform grid, merge
vertices sharing a cell (cluster centroid), drop faces that became
degenerate. The grid pitch is bisected until the face count fits the
target. O(V + F) per iteration, deterministic, watertight-ish — accuracy
is bounded by the final pitch (<~2% of the bounding-box diagonal at 1-2k
faces on YCB-scale meshes), which is far below the soft-rasterizer sigma.
"""

from __future__ import annotations

import numpy as np


def bbox_corners(verts: np.ndarray) -> np.ndarray:
    """(V, 3) -> the 8 axis-aligned bounding-box corners (8, 3).

    Corner order: binary counting over (x, y, z) min/max — matches the
    reference's object-corner metric on HO-3D (re-verify exact order when
    the reference tree is mounted; the error metric is order-invariant as
    long as GT and prediction use the same canonical corners).
    """
    v = np.asarray(verts, np.float32)
    lo, hi = v.min(axis=0), v.max(axis=0)
    out = np.empty((8, 3), np.float32)
    for c in range(8):
        out[c] = [
            (lo, hi)[(c >> 2) & 1][0],
            (lo, hi)[(c >> 1) & 1][1],
            (lo, hi)[c & 1][2],
        ]
    return out


def _cluster_once(
    verts: np.ndarray, faces: np.ndarray, pitch: float
) -> tuple[np.ndarray, np.ndarray]:
    lo = verts.min(axis=0)
    cells = np.floor((verts - lo) / max(pitch, 1e-12)).astype(np.int64)
    # Unique cell id per vertex -> cluster index.
    _, cluster, counts = np.unique(
        cells, axis=0, return_inverse=True, return_counts=True
    )
    # Cluster centroids.
    centroids = np.zeros((len(counts), 3), np.float64)
    np.add.at(centroids, cluster, verts)
    centroids /= counts[:, None]
    new_faces = cluster[faces]
    # Drop degenerate faces (any two corners merged).
    keep = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    new_faces = new_faces[keep]
    # Drop duplicate faces (ignoring winding-preserving rotation).
    if len(new_faces):
        key = np.sort(new_faces, axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        new_faces = new_faces[np.sort(first)]
    return centroids.astype(np.float32), new_faces.astype(np.int32)


def decimate_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    target_faces: int,
    max_iters: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce (verts, faces) to <= target_faces by vertex clustering.

    The ``<= target_faces`` contract is GUARANTEED (callers size rasterizer
    buffers from it — over-budget meshes would be truncated downstream into
    faces with out-of-range vertex indices). Returns the input unchanged
    when it already fits. Search: the grid pitch starts at 1/64 of the bbox
    diagonal and grows by sqrt(2) until the budget is met; if a step
    overshoots to an empty mesh, the pitch is bisected between the last
    over-budget pitch and the emptying one. If no pitch fits (pathological
    geometry), the largest-area faces of the coarsest over-budget
    clustering are kept — a valid sub-mesh, never out-of-range indices.
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    if len(faces) <= target_faces:
        return verts, faces.astype(np.int32)
    diag = float(np.linalg.norm(verts.max(axis=0) - verts.min(axis=0)))
    pitch = diag / 64.0
    best_over = None  # finest clustering still over budget
    lo = hi = None  # lo: pitch known over budget; hi: known empty/fits
    for _ in range(max_iters):
        v, f = _cluster_once(verts, faces, pitch)
        if 0 < len(f) <= target_faces:
            return v, f
        if len(f) == 0:
            hi = pitch
            break
        best_over = (v, f)  # coarsest-so-far: fewest faces over budget
        lo = pitch
        pitch *= 1.4142135623730951  # sqrt(2): gentle coarsening
    if lo is not None and hi is not None:
        for _ in range(20):  # bisect into the (over-budget, empty) gap
            mid = 0.5 * (lo + hi)
            v, f = _cluster_once(verts, faces, mid)
            if 0 < len(f) <= target_faces:
                return v, f
            if len(f) > target_faces:
                lo, best_over = mid, (v, f)
            else:
                hi = mid
    # No pitch fits: hard-trim the coarsest over-budget clustering to the
    # largest-area faces (valid indices; an open but renderable sub-mesh).
    v, f = best_over if best_over is not None else (verts, faces)
    fv = v[f]
    area2 = np.linalg.norm(
        np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), axis=1
    )
    keep = np.sort(np.argsort(-area2)[:target_faces])
    return v, f[keep].astype(np.int32)
