"""Differentiable rendering (reference layers L0/L1: neural_renderer CUDA).

The reference's only native component is the NMR CUDA rasterizer
(``neural_renderer/cuda/rasterize_cuda_kernel.cu``: ``forward_face_index_map``
z-buffer + approximate backward). The TPU-native equivalent here is a **soft
rasterizer** (SoftRas-style probabilistic silhouettes + depth-softmax
attribute aggregation) with *exact* gradients:

- ``hocon.render.raster``        — shared math + pure-XLA streaming backend
  (used for tests, CPU, and the recompute-based backward pass).
- ``hocon.render.raster_pallas`` — Pallas TPU forward kernel (MXU matmul of
  face-plane coefficients against the homogeneous pixel grid).
- ``hocon.render.ssim``          — windowed SSIM photometric loss.
- ``hocon.render.warp``          — frame-pair photometric-consistency warp.

Design rule (SURVEY.md §5.2): no z-buffer atomics anywhere — aggregation is
a deterministic reduction over faces, so results are bitwise reproducible.
"""

from hocon.render.raster import RasterOutput, soft_rasterize
from hocon.render.ssim import ssim
