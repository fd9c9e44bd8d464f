"""FPHAB (First-Person Hand Action Benchmark, "fhbhands") dataset parser.

Reference parity: ``meshreg/datasets/fhbhands.py`` + ``fhbutils.py`` —
walks the annotation tree, builds the per-frame sample index, converts
world-frame skeletons to the color camera frame, loads the 4 object models
and their per-frame 6-DoF poses, supports ``--fraction`` sparse-supervision
subsampling and temporal pair sampling.

Expected directory layout (the official download):
  root/
    Video_files/Subject_K/<action>/<seq>/color/color_%04d.jpeg
    Hand_pose_annotation_v1/Subject_K/<action>/<seq>/skeleton.txt
        each line: frame_idx + 63 floats (21 joints x 3, world frame, mm)
    Object_6D_pose_annotation_v1_1/Subject_K/<action>/<seq>/object_pose.txt
        each line: frame_idx + 16 floats (row-major 4x4 object->world, mm)
    Object_models/<name>_model/<name>_model.ply

NOTE (provenance): the camera constants and joint reorder below are encoded
from the published FPHAB dataset documentation / public reference code, but
the reference tree was unreadable at survey time (SURVEY.md preamble) —
re-verify against the real dataset before trusting metric numbers.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# Color-camera intrinsics (FPHAB documentation).
CAM_INTR = np.array(
    [
        [1395.749023, 0.0, 935.732544],
        [0.0, 1395.749268, 540.681030],
        [0.0, 0.0, 1.0],
    ],
    np.float32,
)

# World (skeleton) frame -> color camera frame; translation in mm.
CAM_EXTR = np.array(
    [
        [0.999988496304, -0.00468848412856, 0.000982563360594, 25.7],
        [0.00469115935266, 0.999985218048, -0.00273845880292, 1.22],
        [-0.000969709653873, 0.00274303671904, 0.99999576807, 3.902],
        [0.0, 0.0, 0.0, 1.0],
    ],
    np.float32,
)

# FPHAB skeleton order: [Wrist, TMCP, IMCP, MMCP, RMCP, PMCP, TPIP, TDIP,
# TTIP, IPIP, IDIP, ITIP, MPIP, MDIP, MTIP, RPIP, RDIP, RTIP, PPIP, PDIP,
# PTIP] -> standard [wrist, thumb(1..tip), index, middle, ring, pinky].
REORDER_IDX = (0, 1, 6, 7, 8, 2, 9, 10, 11, 3, 12, 13, 14, 4, 15, 16, 17, 5, 18, 19, 20)

OBJECTS = ("juice_bottle", "liquid_soap", "milk", "salt")

# Subject split used by the reference for train/test.
TRAIN_SUBJECTS = ("Subject_1", "Subject_3", "Subject_4")
TEST_SUBJECTS = ("Subject_2", "Subject_5", "Subject_6")

# Actions with object 6-DoF annotations (the subset the reference trains
# the object branch on).
OBJECT_ACTIONS = {
    "open_juice_bottle": "juice_bottle",
    "close_juice_bottle": "juice_bottle",
    "pour_juice_bottle": "juice_bottle",
    "open_liquid_soap": "liquid_soap",
    "close_liquid_soap": "liquid_soap",
    "pour_liquid_soap": "liquid_soap",
    "open_milk": "milk",
    "close_milk": "milk",
    "pour_milk": "milk",
    "put_salt": "salt",
}


def load_skeletons(path: str) -> dict[int, np.ndarray]:
    """skeleton.txt -> {frame_idx: (21, 3) world-frame mm}."""
    out = {}
    with open(path) as f:
        for line in f:
            vals = line.split()
            if len(vals) != 64:
                continue
            out[int(float(vals[0]))] = (
                np.asarray(vals[1:], np.float32).reshape(21, 3)
            )
    return out


def load_object_poses(path: str) -> dict[int, np.ndarray]:
    """object_pose.txt -> {frame_idx: (4, 4) object->world, mm translation}."""
    out = {}
    with open(path) as f:
        for line in f:
            vals = line.split()
            if len(vals) != 17:
                continue
            out[int(float(vals[0]))] = np.asarray(vals[1:], np.float32).reshape(4, 4)
    return out


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal ASCII/binary-LE PLY loader -> (verts (V,3), faces (F,3))."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vert = n_face = 0
        fmt = "ascii"
        vert_props = []
        in_vertex = False
        for line in header:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
                in_vertex = True
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                in_vertex = False
            elif line.startswith("property") and in_vertex:
                vert_props.append(line.split()[1])
        if fmt == "ascii":
            verts = []
            for _ in range(n_vert):
                verts.append(
                    [float(v) for v in f.readline().split()[:3]]
                )
            faces = []
            for _ in range(n_face):
                vals = f.readline().split()
                faces.append([int(v) for v in vals[1:4]])
            return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
        # binary_little_endian with float vertex properties
        n_props = len(vert_props)
        vert_data = np.frombuffer(
            f.read(n_vert * n_props * 4), dtype="<f4"
        ).reshape(n_vert, n_props)
        verts = vert_data[:, :3].copy()
        faces = np.empty((n_face, 3), np.int32)
        for i in range(n_face):
            (cnt,) = np.frombuffer(f.read(1), dtype=np.uint8)
            idx = np.frombuffer(f.read(int(cnt) * 4), dtype="<i4")
            faces[i] = idx[:3]
        return verts, faces


def load_mano_fits(path: str) -> dict[int, dict]:
    """Load per-sequence precomputed MANO fits.

    ``fits.pkl`` maps ``frame_idx -> {"pose": (48,) axis-angle incl. root,
    "shape"|"betas": (10,), "trans": (3,) meters}`` in the COLOR-CAMERA
    frame (the frame every label in this codebase lives in). The reference
    distributes precomputed fits ("fhbhands_fits") that enable hand-VERTEX
    supervision and GT-mesh warp anchors on FPHAB
    ([pub:meshreg/datasets/fhbhands.py]); the exact on-disk layout must be
    re-verified against the real download (SURVEY.md provenance warning) —
    only this loader changes when it is.
    """
    import pickle

    with open(path, "rb") as f:
        raw = pickle.load(f, encoding="latin1")
    out = {}
    for k, v in raw.items():
        out[int(k)] = {
            "pose": np.asarray(v["pose"], np.float32).reshape(48),
            "betas": np.asarray(
                v.get("betas", v.get("shape")), np.float32
            ).reshape(10),
            "trans": np.asarray(v.get("trans", np.zeros(3)), np.float32),
        }
    return out


def _mark_supervised(
    n_frames_per_seq: list[int], fraction: float, seed: int = 0
) -> np.ndarray:
    """Per-frame supervision mask: ~fraction of frames per sequence, evenly
    spaced, always including frame 0.

    VERIFY (reference tree unreadable, SURVEY.md preamble): the reference's
    exact --fraction sampling protocol is unconfirmed — evenly-spaced with
    frame 0 annotated is the natural reading, but at very small fractions
    (0.65%) a different scheme (random per-seq, global stride) can differ
    materially. Re-derive from [pub:meshreg/datasets/fhbhands.py] when
    available."""
    flags = []
    step = max(1, int(round(1.0 / max(fraction, 1e-6))))
    for n in n_frames_per_seq:
        m = np.zeros(n, bool)
        m[::step] = True
        flags.append(m)
    return np.concatenate(flags) if flags else np.zeros(0, bool)


class FPHAB:
    """Pose-dataset-protocol implementation for FPHAB."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        fraction: float = 1.0,
        use_objects: bool = False,
        pair_spacing: int = 8,
        pair_fixed_spacing: bool = False,
        decimate_objects_to: Optional[int] = None,
        mano=None,
    ):
        """``mano``: optional ManoModel — when given AND precomputed MANO
        fits exist under ``root/fhbhands_fits/``, GT hand VERTICES are
        computed per frame (vertex supervision + GT-ref photometric warps,
        the reference FPHAB protocol). ``decimate_objects_to``: face budget
        for object meshes (vertex-clustering decimation; the rasterizer is
        swept at ~1-2k faces)."""
        self.root = root
        self.split = split
        self.pair_spacing = pair_spacing
        self.pair_fixed_spacing = pair_fixed_spacing
        self.mano = mano
        subjects = TRAIN_SUBJECTS if split == "train" else TEST_SUBJECTS

        skel_root = os.path.join(root, "Hand_pose_annotation_v1")
        video_root = os.path.join(root, "Video_files")
        obj_pose_root = os.path.join(root, "Object_6D_pose_annotation_v1_1")
        fits_root = os.path.join(root, "fhbhands_fits")

        self.objects = {}
        if use_objects:
            for name in OBJECTS:
                ply = os.path.join(
                    root, "Object_models", f"{name}_model", f"{name}_model.ply"
                )
                if os.path.exists(ply):
                    verts, faces = load_ply(ply)
                    if decimate_objects_to:
                        from hocon.data.meshes import decimate_mesh

                        verts, faces = decimate_mesh(
                            verts, faces, decimate_objects_to
                        )
                    self.objects[name] = (verts / 1000.0, faces)  # mm -> m

        self.samples = []  # (img_path, joints_cam_m (21,3), obj_name, obj_pose)
        seq_lengths = []
        self._seq_bounds = []  # (start, length) per sequence
        for subject in sorted(subjects):
            subj_dir = os.path.join(skel_root, subject)
            if not os.path.isdir(subj_dir):
                continue
            for action in sorted(os.listdir(subj_dir)):
                if use_objects and action not in OBJECT_ACTIONS:
                    continue
                act_dir = os.path.join(subj_dir, action)
                for seq in sorted(os.listdir(act_dir)):
                    skel_path = os.path.join(act_dir, seq, "skeleton.txt")
                    if not os.path.exists(skel_path):
                        continue
                    skels = load_skeletons(skel_path)
                    fits = {}
                    if mano is not None:
                        fit_pkl = os.path.join(
                            fits_root, subject, action, seq, "fits.pkl"
                        )
                        if os.path.exists(fit_pkl):
                            fits = load_mano_fits(fit_pkl)
                    obj_poses = {}
                    obj_name = OBJECT_ACTIONS.get(action)
                    if use_objects and obj_name in self.objects:
                        p = os.path.join(obj_pose_root, subject, action, seq,
                                         "object_pose.txt")
                        if os.path.exists(p):
                            obj_poses = load_object_poses(p)
                    start = len(self.samples)
                    count = 0
                    for frame_idx in sorted(skels):
                        if use_objects and frame_idx not in obj_poses:
                            continue
                        img = os.path.join(
                            video_root, subject, action, seq, "color",
                            f"color_{frame_idx:04d}.jpeg",
                        )
                        world_mm = skels[frame_idx][list(REORDER_IDX)]
                        cam_mm = world_mm @ CAM_EXTR[:3, :3].T + CAM_EXTR[:3, 3]
                        self.samples.append(
                            dict(
                                image_path=img,
                                joints3d_cam=cam_mm / 1000.0,
                                obj_name=obj_name if obj_poses else None,
                                obj_pose_world=obj_poses.get(frame_idx),
                                mano_fit=fits.get(frame_idx),
                                seq_id=(subject, action, seq),
                                frame_idx=frame_idx,
                            )
                        )
                        count += 1
                    if count:
                        seq_lengths.append(count)
                        self._seq_bounds.append((start, count))

        self.supervised = (
            _mark_supervised(seq_lengths, fraction)
            if split == "train"
            else np.ones(len(self.samples), bool)
        )
        self._sample_seq = np.zeros(len(self.samples), np.int64)
        for si, (start, count) in enumerate(self._seq_bounds):
            self._sample_seq[start : start + count] = si
        self._precompute_fit_verts()

    def _precompute_fit_verts(self, chunk: int = 1024):
        """Batched MANO forward over ALL fitted frames, once, at init.

        Fits are static per frame; computing vertices here (instead of
        lazily per __getitem__) keeps the dataloader hot path free of
        device dispatches AND makes the (~9.3 KB/frame) result a single
        read-only array that multiprocess loader workers share via
        fork copy-on-write rather than rebuilding per worker.
        """
        self._fit_row = np.full(len(self.samples), -1, np.int64)
        if self.mano is None:
            return
        rows = [i for i, s in enumerate(self.samples)
                if s.get("mano_fit") is not None]
        if not rows:
            return
        import jax
        import jax.numpy as jnp

        from hocon.geometry.mano import mano_forward

        @jax.jit
        def fwd(pose, betas, trans):  # pose (N, 48) incl. root aa
            v, _ = mano_forward(
                self.mano, pose[:, 3:], betas, pose[:, :3], trans=trans,
                use_pca=False, flat_hand_mean=False, scale_mm=False,
            )
            return v

        pose = np.stack(
            [np.asarray(self.samples[i]["mano_fit"]["pose"], np.float32)
             for i in rows]
        )
        betas = np.stack(
            [np.asarray(self.samples[i]["mano_fit"]["betas"], np.float32)
             for i in rows]
        )
        trans = np.stack(
            [np.asarray(self.samples[i]["mano_fit"]["trans"], np.float32)
             for i in rows]
        )
        n = len(rows)
        out = np.empty((n, self.mano.v_template.shape[0], 3), np.float32)
        for s0 in range(0, n, chunk):
            s1 = min(s0 + chunk, n)
            pad = chunk - (s1 - s0)  # fixed chunk shape -> one compile
            out[s0:s1] = np.asarray(
                fwd(
                    jnp.asarray(np.pad(pose[s0:s1], ((0, pad), (0, 0)))),
                    jnp.asarray(np.pad(betas[s0:s1], ((0, pad), (0, 0)))),
                    jnp.asarray(np.pad(trans[s0:s1], ((0, pad), (0, 0)))),
                )
            )[: s1 - s0]
        self._fit_verts = out
        self._fit_row[rows] = np.arange(n)

    def available_queries(self) -> set:
        from hocon.data.queries import BaseQueries

        qs = {BaseQueries.IMAGE, BaseQueries.JOINTS2D, BaseQueries.JOINTS3D,
              BaseQueries.CAMINTR, BaseQueries.SIDE, BaseQueries.CENTER3D}
        if self.objects:
            qs |= {BaseQueries.OBJVERTS3D, BaseQueries.OBJVERTSCAN,
                   BaseQueries.OBJFACES, BaseQueries.OBJPOSE,
                   BaseQueries.OBJCORNERS}
        if self.mano is not None and any(
            s.get("mano_fit") is not None for s in self.samples
        ):
            qs.add(BaseQueries.VERTS3D)
        return qs

    def __len__(self):
        return len(self.samples)

    def get_sample(self, i: int) -> dict:
        s = self.samples[i]
        out = {
            "image_path": s["image_path"],
            "joints3d_cam": s["joints3d_cam"].astype(np.float32),
            "verts3d_cam": (
                self._fit_verts[self._fit_row[i]]
                if self._fit_row[i] >= 0
                else None
            ),
            "camintr": CAM_INTR,
            "obj_verts_can": None,
            "obj_faces": None,
            "obj_pose": None,
            "supervised": bool(self.supervised[i]),
            "seq_id": s["seq_id"],
            "frame_idx": s["frame_idx"],
            "side": "right",
        }
        if s["obj_name"] is not None and s["obj_pose_world"] is not None:
            verts, faces = self.objects[s["obj_name"]]
            pose = CAM_EXTR @ s["obj_pose_world"]  # object -> camera, mm
            pose = pose.copy()
            pose[:3, 3] /= 1000.0  # m
            out.update(obj_verts_can=verts, obj_faces=faces, obj_pose=pose)
        return out

    def sample_pair(self, i: int, rng: np.random.Generator) -> tuple[int, int]:
        """(nearest annotated ref, i's frame or a spaced neighbor) in-sequence.

        Offset protocol lives in :mod:`hocon.data.pairing` (VERIFY note
        there: random-within-spacing vs fixed-spacing)."""
        from hocon.data.pairing import pair_target

        si = self._sample_seq[i]
        start, count = self._seq_bounds[si]
        sup_local = np.nonzero(self.supervised[start : start + count])[0]
        local = i - start
        ref = int(sup_local[np.argmin(np.abs(sup_local - local))])
        tgt = pair_target(ref, count, self.pair_spacing, rng,
                          fixed=self.pair_fixed_spacing)
        return start + ref, start + tgt
