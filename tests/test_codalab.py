"""HO-3D CodaLab dump format tests.

The official server expects ``json.dump([xyz_pred_list, verts_pred_list])``
— two parallel top-level lists — with joints in the dataset's original
annotation (MANO) order and OpenGL camera convention.
"""

import json
import zipfile

import numpy as np

from hocon.data.ho3d import COORD_FLIP, MANO_TO_STANDARD
from hocon.evaluation.codalab import dump_ho3d_codalab


def test_codalab_payload_format_and_order(tmp_path):
    rng = np.random.default_rng(0)
    n = 3
    joints_std = rng.standard_normal((n, 21, 3)).astype(np.float64)
    verts = rng.standard_normal((n, 778, 3)).astype(np.float64)

    zip_path = dump_ho3d_codalab(joints_std, verts, str(tmp_path))

    with zipfile.ZipFile(zip_path) as z:
        payload = json.loads(z.read("pred.json"))

    # Two parallel top-level lists, one entry per frame.
    assert isinstance(payload, list) and len(payload) == 2
    xyz_list, verts_list = payload
    assert len(xyz_list) == n and len(verts_list) == n
    assert np.asarray(xyz_list[0]).shape == (21, 3)
    assert np.asarray(verts_list[0]).shape == (778, 3)

    # Joints are in MANO annotation order: reordering the dump by
    # MANO_TO_STANDARD recovers our standard order (OpenGL-flipped).
    dumped = np.asarray(xyz_list)
    recovered = dumped[:, list(MANO_TO_STANDARD)] @ COORD_FLIP.T
    np.testing.assert_allclose(recovered, joints_std, atol=1e-5)
    # Vertices keep MANO vertex order, only the coordinate flip applies.
    np.testing.assert_allclose(
        np.asarray(verts_list) @ COORD_FLIP.T, verts, atol=1e-5
    )
