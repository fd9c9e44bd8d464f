"""HO-3D CodaLab submission dump.

Reference parity: the HO-3D eval path dumps per-frame predicted joints and
vertices (meters, OpenGL camera convention — y/z flipped vs our CV frame)
as ``pred.json`` zipped for the CodaLab server.

Official format (HO-3D ``eval.py`` / ``dump()`` in the challenge utils —
re-verify against the reference tree when mounted): the JSON payload is TWO
parallel top-level lists, ``[xyz_pred_list, verts_pred_list]``, one entry
per evaluation frame, and the joints must be in the dataset's original
annotation order (MANO kinematic order + appended fingertips), NOT the
standard evaluation order this codebase uses internally — so we apply the
inverse of ``hocon.data.ho3d.MANO_TO_STANDARD`` before dumping.
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np

from hocon.data.ho3d import MANO_TO_STANDARD

_FLIP = np.diag([1.0, -1.0, -1.0])

# standard evaluation order -> HO-3D annotation (MANO) order.
STANDARD_TO_MANO = np.argsort(np.asarray(MANO_TO_STANDARD))


def dump_ho3d_codalab(
    joints_cam: np.ndarray,  # (N, 21, 3) meters, CV convention, standard order
    verts_cam: np.ndarray,  # (N, 778, 3) meters, CV convention
    out_dir: str,
    zip_name: str = "pred.zip",
) -> str:
    """Write pred.json (+zip). Returns the zip path."""
    os.makedirs(out_dir, exist_ok=True)
    joints = np.asarray(joints_cam)[:, STANDARD_TO_MANO] @ _FLIP.T
    verts = np.asarray(verts_cam) @ _FLIP.T
    xyz_pred_list = [j.round(6).tolist() for j in joints]
    verts_pred_list = [v.round(6).tolist() for v in verts]
    json_path = os.path.join(out_dir, "pred.json")
    with open(json_path, "w") as f:
        json.dump([xyz_pred_list, verts_pred_list], f)
    zip_path = os.path.join(out_dir, zip_name)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(json_path, "pred.json")
    return zip_path
