"""HO-3D CodaLab submission dump.

Reference parity: the HO-3D eval path dumps per-frame predicted joints and
vertices (meters, OpenGL camera convention — y/z flipped vs our CV frame)
as ``pred.json`` zipped for the CodaLab server.
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np

_FLIP = np.diag([1.0, -1.0, -1.0])


def dump_ho3d_codalab(
    joints_cam: np.ndarray,  # (N, 21, 3) meters, CV convention
    verts_cam: np.ndarray,  # (N, 778, 3) meters, CV convention
    out_dir: str,
    zip_name: str = "pred.zip",
) -> str:
    """Write pred.json (+zip). Returns the zip path."""
    os.makedirs(out_dir, exist_ok=True)
    joints = np.asarray(joints_cam) @ _FLIP.T
    verts = np.asarray(verts_cam) @ _FLIP.T
    payload = [
        [j.round(6).tolist(), v.round(6).tolist()]
        for j, v in zip(joints, verts)
    ]
    json_path = os.path.join(out_dir, "pred.json")
    with open(json_path, "w") as f:
        json.dump(payload, f)
    zip_path = os.path.join(out_dir, zip_name)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(json_path, "pred.json")
    return zip_path
