"""HO-3D (v2) dataset parser.

Reference parity: ``meshreg/datasets/ho3dv2.py`` — per-frame meta pickles
(handJoints3D, handPose(48), handBeta, objRot/objTrans/objName, camMat),
YCB object models, fully annotated train split, evaluation split with only
root + object pose (predictions go to the CodaLab server; see
``hocon.evaluation.codalab``).

Layout (official download):
  root/train/<seq>/rgb/%04d.png     + meta/%04d.pkl
  root/evaluation/<seq>/rgb/%04d.png + meta/%04d.pkl
  root/evaluation.txt, root/train.txt (frame lists "seq/%04d")
  ycb_root/models/<objName>/points.xyz (+ textured simple mesh)

HO-3D annotations use the OpenGL camera convention: y and z are negated
relative to the CV convention used everywhere in this codebase
(``COORD_FLIP``). Joint order in the pickles is MANO kinematic order +
appended fingertips; ``MANO_TO_STANDARD`` reorders to the standard
evaluation order. Re-verify both against the real dataset (SURVEY.md
preamble) before trusting metrics.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

COORD_FLIP = np.diag([1.0, -1.0, -1.0]).astype(np.float32)

# MANO kinematic order (+5 tips) -> standard evaluation order.
MANO_TO_STANDARD = (
    0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20
)


def load_xyz_points(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float32)[:, :3]


class HO3D:
    """Pose-dataset-protocol implementation for HO-3D v2."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        ycb_root: Optional[str] = None,
        fraction: float = 1.0,
        use_objects: bool = False,
        pair_spacing: int = 8,
        pair_fixed_spacing: bool = False,
        mano=None,
        decimate_objects_to: Optional[int] = None,
    ):
        """``mano``: optional ManoModel — when given, GT hand VERTICES are
        computed from the per-frame MANO fits in the train-split metas
        (handPose/handBeta/handTrans), enabling vertex supervision and
        GT-ref photometric warps, as the reference does on HO-3D."""
        self.root = root
        self.split = split
        self.pair_spacing = pair_spacing
        self.pair_fixed_spacing = pair_fixed_spacing
        self.use_objects = use_objects
        self.mano = mano
        self.decimate_objects_to = decimate_objects_to
        self.ycb_root = ycb_root or os.path.join(root, "models_root")

        split_dir = "train" if split == "train" else "evaluation"
        list_file = os.path.join(
            root, "train.txt" if split == "train" else "evaluation.txt"
        )
        entries = []
        if os.path.exists(list_file):
            with open(list_file) as f:
                entries = [ln.strip() for ln in f if ln.strip()]
        else:  # fall back to a directory walk
            base = os.path.join(root, split_dir)
            for seq in sorted(os.listdir(base)):
                meta_dir = os.path.join(base, seq, "meta")
                if not os.path.isdir(meta_dir):
                    continue
                for fn in sorted(os.listdir(meta_dir)):
                    entries.append(f"{seq}/{os.path.splitext(fn)[0]}")

        self.split_dir = split_dir
        self.entries = entries
        self._obj_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        # Group by sequence for pair sampling / fraction marking.
        self._seq_bounds = []
        seq_lengths = []
        last_seq, start = None, 0
        for i, e in enumerate(entries):
            seq = e.split("/")[0]
            if seq != last_seq:
                if last_seq is not None:
                    self._seq_bounds.append((start, i - start))
                    seq_lengths.append(i - start)
                last_seq, start = seq, i
        if last_seq is not None:
            self._seq_bounds.append((start, len(entries) - start))
            seq_lengths.append(len(entries) - start)

        from hocon.data.fphab import _mark_supervised

        self.supervised = (
            _mark_supervised(seq_lengths, fraction)
            if split == "train"
            else np.ones(len(entries), bool)
        )
        self._sample_seq = np.zeros(len(entries), np.int64)
        for si, (s, c) in enumerate(self._seq_bounds):
            self._sample_seq[s : s + c] = si

    def available_queries(self) -> set:
        from hocon.data.queries import BaseQueries

        qs = {BaseQueries.IMAGE, BaseQueries.JOINTS2D, BaseQueries.JOINTS3D,
              BaseQueries.CAMINTR, BaseQueries.SIDE, BaseQueries.CENTER3D}
        if self.mano is not None and self.split == "train":
            qs.add(BaseQueries.VERTS3D)
        if self.use_objects:
            qs |= {BaseQueries.OBJVERTS3D, BaseQueries.OBJVERTSCAN,
                   BaseQueries.OBJFACES, BaseQueries.OBJPOSE,
                   BaseQueries.OBJCORNERS}
        return qs

    def __len__(self):
        return len(self.entries)

    def _load_object(self, name: str) -> tuple[np.ndarray, Optional[np.ndarray]]:
        if name not in self._obj_cache:
            base = os.path.join(self.ycb_root, "models", name)
            obj_path = os.path.join(base, "textured_simple.obj")
            if os.path.exists(obj_path):
                verts, faces = _load_obj(obj_path)
                if self.decimate_objects_to:
                    from hocon.data.meshes import decimate_mesh

                    verts, faces = decimate_mesh(
                        verts, faces, self.decimate_objects_to
                    )
            else:
                verts = load_xyz_points(os.path.join(base, "points.xyz"))
                faces = None
            self._obj_cache[name] = (verts, faces)
        return self._obj_cache[name]

    def _meta_path(self, entry: str) -> str:
        seq, fid = entry.split("/")
        return os.path.join(self.root, self.split_dir, seq, "meta", fid + ".pkl")

    def _rgb_path(self, entry: str) -> str:
        seq, fid = entry.split("/")
        base = os.path.join(self.root, self.split_dir, seq, "rgb", fid)
        for ext in (".png", ".jpg", ".jpeg"):
            if os.path.exists(base + ext):
                return base + ext
        return base + ".png"

    def get_sample(self, i: int) -> dict:
        entry = self.entries[i]
        with open(self._meta_path(entry), "rb") as f:
            meta = pickle.load(f, encoding="latin1")

        camintr = np.asarray(meta["camMat"], np.float32)
        joints = meta.get("handJoints3D")
        if joints is not None and np.asarray(joints).ndim == 2:
            joints_cam = (
                np.asarray(joints, np.float32)[list(MANO_TO_STANDARD)] @ COORD_FLIP.T
            )
        elif joints is not None:  # evaluation split: root joint only
            root = np.asarray(joints, np.float32) @ COORD_FLIP.T
            joints_cam = np.tile(root[None], (21, 1))
        else:
            joints_cam = np.zeros((21, 3), np.float32)

        verts_cam = None
        if (
            self.mano is not None
            and meta.get("handPose") is not None
            and meta.get("handBeta") is not None
        ):
            verts_cam = self._mano_verts(
                np.asarray(meta["handPose"], np.float32),
                np.asarray(meta["handBeta"], np.float32),
                np.asarray(
                    meta.get("handTrans", np.zeros(3)), np.float32
                ),
            )

        out = {
            "image_path": self._rgb_path(entry),
            "joints3d_cam": joints_cam,
            "verts3d_cam": verts_cam,
            "camintr": camintr,
            "obj_verts_can": None,
            "obj_faces": None,
            "obj_pose": None,
            "supervised": bool(self.supervised[i]),
            "seq_id": entry.split("/")[0],
            "frame_idx": int(entry.split("/")[1]),
            "side": "right",
            "mano_pose": np.asarray(meta["handPose"], np.float32)
            if meta.get("handPose") is not None
            else None,
            "mano_betas": np.asarray(meta["handBeta"], np.float32)
            if meta.get("handBeta") is not None
            else None,
        }
        if self.use_objects and meta.get("objName") is not None:
            verts, faces = self._load_object(meta["objName"])
            from hocon.geometry.rot import rodrigues

            import jax.numpy as jnp

            rot = np.asarray(
                rodrigues(jnp.asarray(meta["objRot"], jnp.float32).reshape(1, 3))
            )[0]
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = COORD_FLIP @ rot
            pose[:3, 3] = COORD_FLIP @ np.asarray(meta["objTrans"], np.float32)
            out.update(obj_verts_can=verts, obj_faces=faces, obj_pose=pose)
        return out

    def _mano_verts(self, pose48: np.ndarray, betas: np.ndarray,
                    trans: np.ndarray) -> np.ndarray:
        """Camera-frame hand vertices from a HO-3D MANO fit (meters)."""
        import jax
        import jax.numpy as jnp

        from hocon.geometry.mano import mano_forward

        @jax.jit
        def fwd(pose, betas, trans):
            v, _ = mano_forward(
                self.mano,
                pose[None, 3:],
                betas[None],
                pose[None, :3],
                trans=trans[None],
                use_pca=False,  # HO-3D stores full 45-dof axis-angle
                flat_hand_mean=False,
                scale_mm=False,
            )
            return v[0]

        if not hasattr(self, "_mano_fwd"):
            self._mano_fwd = fwd
        verts_gl = np.asarray(
            self._mano_fwd(jnp.asarray(pose48), jnp.asarray(betas),
                           jnp.asarray(trans))
        )
        return (verts_gl @ COORD_FLIP.T).astype(np.float32)

    def sample_pair(self, i: int, rng: np.random.Generator) -> tuple[int, int]:
        from hocon.data.pairing import pair_target

        si = self._sample_seq[i]
        start, count = self._seq_bounds[si]
        sup_local = np.nonzero(self.supervised[start : start + count])[0]
        local = i - start
        ref = int(sup_local[np.argmin(np.abs(sup_local - local))])
        tgt = pair_target(ref, count, self.pair_spacing, rng,
                          fixed=self.pair_fixed_spacing)
        return start + ref, start + tgt


def _load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal Wavefront OBJ loader (v / f lines only)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
