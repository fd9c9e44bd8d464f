"""ROI cropping and affine transforms (host-side numpy/cv2).

Reference parity: the crop/affine logic of ``meshreg/datasets/handataset.py``
— crop a square ROI around the hand (from its 2D joint extent), apply
scale/rotation/translation jitter, warp the image to the network input
resolution, and apply the SAME affine to 2D labels and camera intrinsics.

A 2D affine A on pixel coordinates composes with the pinhole model as
``K' = A_3x3 @ K`` (z is untouched), so downstream projection with the
adjusted intrinsics stays exact — no resampling error on the labels.
"""

from __future__ import annotations

import numpy as np

try:  # cv2 is the fast path; PIL fallback keeps the module importable.
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def square_bbox_from_points(points2d: np.ndarray, scale: float = 1.3) -> tuple:
    """Square ROI (center, side) covering 2D points with a margin factor."""
    mins = points2d.min(axis=0)
    maxs = points2d.max(axis=0)
    center = (mins + maxs) / 2.0
    side = float(np.max(maxs - mins)) * scale
    return center, max(side, 1.0)


def build_crop_affine(
    center: np.ndarray,
    side: float,
    out_res: int,
    rot_deg: float = 0.0,
    scale_jitter: float = 1.0,
    center_jitter: np.ndarray | None = None,
) -> np.ndarray:
    """Affine (3, 3) mapping source pixels -> (out_res, out_res) crop pixels.

    The crop covers a square of size ``side * scale_jitter`` centered at
    ``center + center_jitter``, rotated by ``rot_deg`` about the center.
    """
    c = np.asarray(center, np.float64).copy()
    if center_jitter is not None:
        c = c + np.asarray(center_jitter, np.float64)
    s = out_res / (side * scale_jitter)
    t = np.deg2rad(rot_deg)
    rot = np.array(
        [[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]], np.float64
    )
    m = s * rot
    # Map c -> crop center.
    offset = np.array([out_res / 2.0, out_res / 2.0]) - m @ c
    aff = np.eye(3)
    aff[:2, :2] = m
    aff[:2, 2] = offset
    return aff


def warp_image(image: np.ndarray, affine: np.ndarray, out_res: int) -> np.ndarray:
    """Warp an HxWx3 uint8/float image by the (3, 3) pixel affine."""
    if _HAS_CV2:
        return cv2.warpAffine(
            image,
            affine[:2].astype(np.float32),
            (out_res, out_res),
            flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
        )
    from PIL import Image  # pragma: no cover

    inv = np.linalg.inv(affine)
    pil = Image.fromarray(image)
    out = pil.transform(
        (out_res, out_res), Image.AFFINE,
        data=inv[:2].reshape(-1), resample=Image.BILINEAR,
    )
    return np.asarray(out)


def transform_points2d(points2d: np.ndarray, affine: np.ndarray) -> np.ndarray:
    return points2d @ affine[:2, :2].T + affine[:2, 2]


def transform_intrinsics(camintr: np.ndarray, affine: np.ndarray) -> np.ndarray:
    return affine @ camintr
