"""FPHAB / HO-3D parser tests over generated fixture trees that replicate
the official annotation formats (SURVEY.md §4.3: synthetic mini-dataset
fixtures exercising parsing/crop/pair determinism)."""

import os
import pickle

import numpy as np
import pytest

from hocon.data import fphab as F
from hocon.data import ho3d as H


def _write_fphab_tree(root, n_frames=6):
    rng = np.random.default_rng(0)
    subj, action, seq = "Subject_1", "open_milk", "1"
    skel_dir = os.path.join(root, "Hand_pose_annotation_v1", subj, action, seq)
    vid_dir = os.path.join(root, "Video_files", subj, action, seq, "color")
    obj_dir = os.path.join(
        root, "Object_6D_pose_annotation_v1_1", subj, action, seq
    )
    model_dir = os.path.join(root, "Object_models", "milk_model")
    for d in (skel_dir, vid_dir, obj_dir, model_dir):
        os.makedirs(d, exist_ok=True)

    # World-frame skeletons (mm), in FPHAB joint order.
    joints_world = rng.uniform(-100, 100, (n_frames, 21, 3)).astype(np.float32)
    joints_world[..., 2] += 500
    with open(os.path.join(skel_dir, "skeleton.txt"), "w") as f:
        for i in range(n_frames):
            f.write(f"{i} " + " ".join(f"{v:.4f}" for v in joints_world[i].ravel()) + "\n")

    with open(os.path.join(obj_dir, "object_pose.txt"), "w") as f:
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [10.0 * i, 5.0, 400.0]
            f.write(f"{i} " + " ".join(f"{v:.4f}" for v in pose.ravel()) + "\n")

    # ASCII PLY box model (mm).
    verts = (np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32) * 30)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    with open(os.path.join(model_dir, "milk_model.ply"), "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")

    import cv2

    img = rng.integers(0, 255, (1080, 1920, 3), np.uint8)
    for i in range(n_frames):
        cv2.imwrite(os.path.join(vid_dir, f"color_{i:04d}.jpeg"), img)
    return joints_world


def test_fphab_parse_and_camera_transform(tmp_path):
    root = str(tmp_path)
    joints_world = _write_fphab_tree(root)
    ds = F.FPHAB(root, split="train", use_objects=True, fraction=1.0)
    assert len(ds) == 6
    s = ds.get_sample(0)
    # Joint transform: world mm -> camera m with REORDER first.
    want = (
        joints_world[0][list(F.REORDER_IDX)] @ F.CAM_EXTR[:3, :3].T
        + F.CAM_EXTR[:3, 3]
    ) / 1000.0
    np.testing.assert_allclose(s["joints3d_cam"], want, atol=1e-5)
    assert s["obj_verts_can"].shape == (8, 3)
    assert s["obj_faces"].shape == (4, 3)
    # Object pose maps to camera frame with meter translation.
    assert 0.1 < s["obj_pose"][2, 3] < 1.0
    assert os.path.exists(s["image_path"])


def test_fphab_fraction_and_pairs(tmp_path):
    root = str(tmp_path)
    _write_fphab_tree(root)
    ds = F.FPHAB(root, split="train", use_objects=False, fraction=0.34)
    # step = round(1/0.34) = 3 -> frames 0, 3 supervised out of 6.
    assert ds.supervised.sum() == 2
    assert ds.supervised[0] and ds.supervised[3]
    rng = np.random.default_rng(0)
    for i in range(6):
        ref, tgt = ds.sample_pair(i, rng)
        assert ds.supervised[ref]
        assert ref != tgt
        assert 0 <= tgt < 6


def test_fphab_hand_dataset_integration(tmp_path):
    from hocon.data.hand_dataset import HandDataset, HandDatasetConfig
    from hocon.data.queries import TransQueries

    root = str(tmp_path)
    _write_fphab_tree(root)
    ds = F.FPHAB(root, split="train", use_objects=True)
    hd = HandDataset(
        ds, HandDatasetConfig(image_size=64, max_obj_verts=8, max_obj_faces=4)
    )
    s = hd[0]
    assert s[TransQueries.IMAGE.value].shape == (64, 64, 3)
    np.testing.assert_allclose(s[TransQueries.JOINTS3D.value][9], 0, atol=1e-3)


def _write_ho3d_tree(root, n_frames=4, split="train"):
    rng = np.random.default_rng(1)
    seq_dir = os.path.join(root, split if split == "train" else "evaluation", "ABF10")
    os.makedirs(os.path.join(seq_dir, "meta"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "rgb"), exist_ok=True)
    model_dir = os.path.join(root, "models_root", "models", "003_cracker_box")
    os.makedirs(model_dir, exist_ok=True)
    np.savetxt(
        os.path.join(model_dir, "points.xyz"),
        rng.uniform(-0.05, 0.05, (20, 3)).astype(np.float32),
    )

    import cv2

    joints_all = []
    for i in range(n_frames):
        joints = rng.uniform(-0.1, 0.1, (21, 3)).astype(np.float32)
        joints[:, 2] -= 0.5  # OpenGL: in front of camera is -z
        meta = {
            "handJoints3D": joints if split == "train" else joints[0],
            "handPose": rng.standard_normal(48).astype(np.float32),
            "handBeta": rng.standard_normal(10).astype(np.float32),
            "handTrans": np.zeros(3, np.float32),
            "objName": "003_cracker_box",
            "objRot": np.zeros(3, np.float32),
            "objTrans": np.array([0.0, 0.0, -0.6], np.float32),
            "camMat": np.array(
                [[614.0, 0, 320.0], [0, 614.0, 240.0], [0, 0, 1]], np.float32
            ),
        }
        with open(os.path.join(seq_dir, "meta", f"{i:04d}.pkl"), "wb") as f:
            pickle.dump(meta, f)
        cv2.imwrite(
            os.path.join(seq_dir, "rgb", f"{i:04d}.png"),
            rng.integers(0, 255, (480, 640, 3), np.uint8),
        )
        joints_all.append(joints)
    return np.stack(joints_all)


def test_ho3d_parse_train(tmp_path):
    root = str(tmp_path)
    joints = _write_ho3d_tree(root, split="train")
    ds = H.HO3D(root, split="train", use_objects=True)
    assert len(ds) == 4
    s = ds.get_sample(1)
    want = joints[1][list(H.MANO_TO_STANDARD)] @ H.COORD_FLIP.T
    np.testing.assert_allclose(s["joints3d_cam"], want, atol=1e-6)
    assert float(s["joints3d_cam"][:, 2].mean()) > 0  # CV convention: +z forward
    assert s["obj_verts_can"].shape == (20, 3)
    assert s["obj_pose"][2, 3] > 0
    assert s["mano_pose"].shape == (48,)


def test_ho3d_mano_fit_verts(tmp_path, mano_model):
    """With a MANO model, train-split samples expose GT vertices computed
    from the per-frame MANO fits (reference HO-3D supervision)."""
    root = str(tmp_path)
    _write_ho3d_tree(root, split="train")
    ds = H.HO3D(root, split="train", mano=mano_model)
    s = ds.get_sample(0)
    v = s["verts3d_cam"]
    assert v is not None and v.shape == (778, 3)
    assert np.all(np.isfinite(v))
    # CV convention: hand sits in front of the camera (+z) like the joints.
    assert v[:, 2].mean() > 0


def test_ho3d_get_sample_is_jax_free(tmp_path, mano_model, monkeypatch):
    """MANO fit vertices and object rotations are precomputed (batched) at
    init; ``get_sample`` must not touch jax or re-read meta pickles —
    eager dispatch is ~100ms/op on this host and would dominate real-data
    loading (VERDICT r2 #4)."""
    root = str(tmp_path)
    _write_ho3d_tree(root, split="train")
    ds = H.HO3D(root, split="train", use_objects=True, mano=mano_model)

    import jax
    import jax.numpy as jnp

    def boom(*a, **k):
        raise AssertionError("jax dispatch inside get_sample")

    monkeypatch.setattr(jnp, "asarray", boom)
    monkeypatch.setattr(jax, "jit", boom)
    monkeypatch.setattr(H, "pickle", None)  # any meta re-read -> AttributeError
    for i in range(len(ds)):
        s = ds.get_sample(i)
    assert s["verts3d_cam"].shape == (778, 3)
    assert s["obj_pose"][2, 3] > 0
    # The precomputed path must agree with the per-sample math it replaced.
    assert s["joints3d_cam"][:, 2].mean() > 0
    assert s["verts3d_cam"][:, 2].mean() > 0


def test_fphab_mano_fits(tmp_path, mano_model):
    """With MANO fits on disk, FPHAB samples carry GT hand vertices and the
    dataset declares VERTS3D (enables vertex supervision + GT-ref warps)."""
    from hocon.data.queries import BaseQueries

    root = str(tmp_path)
    _write_fphab_tree(root)
    rng = np.random.default_rng(3)
    fits_dir = os.path.join(root, "fhbhands_fits", "Subject_1", "open_milk", "1")
    os.makedirs(fits_dir)
    fits = {
        i: {
            "pose": rng.standard_normal(48).astype(np.float32) * 0.1,
            "shape": rng.standard_normal(10).astype(np.float32) * 0.1,
            "trans": np.array([0.0, 0.0, 0.5], np.float32),
        }
        for i in range(6)
    }
    with open(os.path.join(fits_dir, "fits.pkl"), "wb") as f:
        pickle.dump(fits, f)

    ds = F.FPHAB(root, split="train", mano=mano_model)
    assert BaseQueries.VERTS3D in ds.available_queries()
    s = ds.get_sample(0)
    v = s["verts3d_cam"]
    assert v is not None and v.shape == (778, 3)
    assert np.all(np.isfinite(v))
    # trans puts the hand ~0.5m in front of the camera.
    assert 0.2 < v[:, 2].mean() < 0.8
    # Without a MANO model the fits are ignored (no vertex queries).
    ds_nomano = F.FPHAB(root, split="train")
    assert BaseQueries.VERTS3D not in ds_nomano.available_queries()
    assert ds_nomano.get_sample(0)["verts3d_cam"] is None


def test_check_data_clean_tree_reports_ok(tmp_path, capsys):
    """--check_data walks one sample per sequence through the full pipeline
    and reports zero anomalies on a well-formed tree."""
    from hocon.data.check import check_dataset
    from hocon.data.hand_dataset import HandDataset, HandDatasetConfig

    root = str(tmp_path)
    _write_fphab_tree(root)
    ds = F.FPHAB(root, split="train", use_objects=True)
    hd = HandDataset(
        ds, HandDatasetConfig(image_size=64, max_obj_verts=8, max_obj_faces=4)
    )
    assert check_dataset(hd, "train") == 0
    out = capsys.readouterr().out
    assert "OK" in out and "1 sequences checked" in out


def test_check_data_flags_anomalies(tmp_path, capsys):
    """A broken tree (missing image, behind-camera joints) is reported as
    anomalies, not a crash."""
    from hocon.data.check import check_dataset
    from hocon.data.hand_dataset import HandDataset, HandDatasetConfig

    root = str(tmp_path)
    _write_ho3d_tree(root, split="train")
    ds = H.HO3D(root, split="train")
    # Corrupt: flip the parsed joints behind the camera and drop the image.
    ds._joints_cam[:, :, 2] *= -1
    os.remove(ds._rgb_path(ds.entries[0]))
    hd = HandDataset(ds, HandDatasetConfig(image_size=64))
    n_bad = check_dataset(hd, "train")
    assert n_bad >= 2
    out = capsys.readouterr().out
    assert "image missing" in out and "behind camera" in out


def test_decimate_mesh_budget_and_geometry():
    from scipy.spatial import ConvexHull

    from hocon.data.meshes import decimate_mesh

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((6000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    hull = ConvexHull(pts)
    verts = pts.astype(np.float32)
    faces = hull.simplices.astype(np.int64)
    assert len(faces) > 10000  # dense sphere, YCB-scale face count

    dv, df = decimate_mesh(verts, faces, 1500)
    assert 0 < len(df) <= 1500
    assert df.max() < len(dv)
    # Degenerate faces were dropped.
    assert np.all(df[:, 0] != df[:, 1])
    assert np.all(df[:, 1] != df[:, 2])
    # Geometry preserved: decimated verts stay near the unit sphere.
    r = np.linalg.norm(dv, axis=1)
    assert 0.9 < r.min() and r.max() < 1.1

    # Already within budget -> unchanged.
    sv, sf = decimate_mesh(verts[:10], faces[:5] % 10, 100)
    assert len(sf) == 5 and len(sv) == 10


def test_decimated_mesh_renders(mano_model):
    """A 20k-face mesh decimates and renders through the soft rasterizer."""
    from scipy.spatial import ConvexHull

    from hocon.data.meshes import decimate_mesh
    from hocon.render.raster import soft_rasterize

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    pts = rng.standard_normal((6000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    hull = ConvexHull(pts)
    dv, df = decimate_mesh(
        (pts * 0.05).astype(np.float32), hull.simplices.astype(np.int64), 1000
    )
    verts = jnp.asarray(dv)[None] + jnp.asarray([0.0, 0.0, 0.5])
    k = jnp.asarray(
        [[[60.0, 0.0, 16.0], [0.0, 60.0, 16.0], [0.0, 0.0, 1.0]]]
    )
    pix = (verts @ jnp.swapaxes(k, 1, 2))
    pix = pix[..., :2] / pix[..., 2:3]
    out = soft_rasterize(
        pix, verts[..., 2], jnp.asarray(df)[None], attrs=pix,
        image_size=(32, 32),
    )
    sil = np.asarray(out.sil)
    assert np.isfinite(sil).all()
    assert sil.max() > 0.5  # the sphere is visible


def test_ho3d_eval_split_root_only(tmp_path):
    root = str(tmp_path)
    _write_ho3d_tree(root, split="evaluation")
    ds = H.HO3D(root, split="test")
    s = ds.get_sample(0)
    assert s["joints3d_cam"].shape == (21, 3)
    # All joints equal the root in the eval split.
    np.testing.assert_allclose(
        s["joints3d_cam"],
        np.broadcast_to(s["joints3d_cam"][0:1], (21, 3)),
        atol=1e-6,
    )


def test_decimate_mesh_guarantees_budget_on_pathological_geometry():
    """The <= target contract must hold even when clustering jumps from
    over-budget straight to empty (near-planar sliver strip)."""
    from hocon.data.meshes import decimate_mesh

    rng = np.random.default_rng(0)
    # A long, hair-thin strip: clustering collapses it abruptly.
    n = 400
    x = np.linspace(0.0, 1.0, n)
    verts = np.stack(
        [
            np.concatenate([x, x]),
            np.concatenate([np.zeros(n), np.full(n, 1e-5)]),
            np.concatenate([np.zeros(n), np.zeros(n)]),
        ],
        axis=1,
    ).astype(np.float32)
    faces = []
    for i in range(n - 1):
        faces.append([i, i + 1, n + i])
        faces.append([i + 1, n + i + 1, n + i])
    faces = np.asarray(faces, np.int64)
    for target in (700, 100, 10):
        dv, df = decimate_mesh(verts, faces, target)
        assert 0 < len(df) <= target, (target, len(df))
        assert df.max() < len(dv)  # indices always in range


def test_hand_dataset_rejects_over_budget_object_mesh(mano_model):
    """Over-budget meshes must raise, not silently truncate into faces
    with out-of-range indices."""
    import pytest

    from hocon.data.hand_dataset import HandDataset, HandDatasetConfig
    from hocon.data.synthetic import SyntheticHandDataset

    ds = SyntheticHandDataset(
        n_videos=1, frames_per_video=2, image_size=32, mano=mano_model,
        obj_n_faces=320,
    )
    wrapped = HandDataset(
        ds, HandDatasetConfig(image_size=32, max_obj_verts=8, max_obj_faces=12)
    )
    with pytest.raises(ValueError, match="exceeds the configured buffers"):
        wrapped[0]


def test_ho3d_fit_verts_memmap_cache(tmp_path, mano_model, monkeypatch):
    """Fit vertices live in a disk-backed memmap (not resident RSS), the
    cache is reused across constructions, and pickling the dataset (spawn
    workers) re-opens the file instead of shipping a dense copy."""
    import pickle as pkl

    root = str(tmp_path / "data")
    cache = tmp_path / "cache"
    monkeypatch.setenv("HOCON_CACHE_DIR", str(cache))
    _write_ho3d_tree(root, split="train")

    ds = H.HO3D(root, split="train", mano=mano_model)
    assert isinstance(ds._fit_verts, np.memmap)
    files = list(cache.glob("ho3d-fits-*.f32"))
    assert len(files) == 1
    v0 = np.array(ds.get_sample(0)["verts3d_cam"])

    # Second construction hits the cache (no recompute) with identical data.
    mtime = files[0].stat().st_mtime_ns
    ds2 = H.HO3D(root, split="train", mano=mano_model)
    assert files[0].stat().st_mtime_ns == mtime
    np.testing.assert_array_equal(
        np.array(ds2.get_sample(0)["verts3d_cam"]), v0
    )

    # Pickle round-trip: the payload must NOT embed the dense array (the
    # full HO-3D train split is ~620 MB), and the restored dataset
    # re-opens the memmap.
    assert ds.__getstate__()["_fit_verts"] is None
    ds3 = pkl.loads(pkl.dumps(ds))
    assert isinstance(ds3._fit_verts, np.memmap)
    np.testing.assert_array_equal(
        np.array(ds3.get_sample(0)["verts3d_cam"]), v0
    )


def test_check_data_flags_all_zero_joints(tmp_path, capsys):
    """All-zero joints3d_cam (annotations present but unparsed — a primary
    mis-layout symptom) must be an anomaly, not exit code 0."""
    from hocon.data.check import check_dataset
    from hocon.data.hand_dataset import HandDataset, HandDatasetConfig

    root = str(tmp_path)
    _write_ho3d_tree(root, split="train")
    ds = H.HO3D(root, split="train")
    ds._joints_cam[:] = 0.0  # simulate handJoints3D=None everywhere
    hd = HandDataset(ds, HandDatasetConfig(image_size=64))
    assert check_dataset(hd, "train") >= 1
    assert "all zeros" in capsys.readouterr().out
