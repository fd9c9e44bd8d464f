"""Differentiable geometry ops (reference layer L1: manopth + project.py)."""

from hocon.geometry.rot import (
    rodrigues,
    rot6d_to_matrix,
    matrix_to_rodrigues,
)
from hocon.geometry.project import persp_project, transform_points
