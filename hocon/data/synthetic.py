"""Synthetic pose dataset — renders the synthetic MANO hand (+ a box object).

Role (SURVEY.md §4.3): a fully self-contained stand-in for FPHAB/HO-3D so
unit/integration tests and benchmarks exercise the complete pipeline
(annotations -> crop/augment -> training with supervised AND photometric
losses -> eval) without licensed assets or dataset downloads. Videos are
smooth pose interpolations, so temporal frame pairs carry real photometric
signal for the consistency loss.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from hocon.geometry.mano import ManoModel, mano_forward, synthetic_mano_model

# Bump when renderer semantics or the frame-generation recipe change — the
# disk cache below is keyed on it, so stale frames can never be served.
_RENDER_CACHE_VERSION = 1

_BOX_VERTS = (
    np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float32,
    )
    * 0.5
)
_BOX_FACES = np.array(
    [
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ],
    np.int32,
)


def uv_sphere(target_faces: int) -> tuple[np.ndarray, np.ndarray]:
    """Unit UV sphere with ~``target_faces`` triangles (outward winding).

    Stands in for a YCB-scale decimated object (SURVEY.md §2.2 "decimated
    variants for rasterizer budget"): real ``textured_simple.obj`` meshes
    decimate to ~1-2k faces before rendering, so benchmarks with this
    object reflect real-data raster workloads instead of the 12-face box.
    """
    nlon = max(8, int(round(np.sqrt(target_faces / 2.0))))
    nlat = max(3, int(round(target_faces / (2.0 * nlon))) + 1)
    ring_i = np.arange(1, nlat)
    theta = np.pi * ring_i / nlat  # (nlat-1,)
    phi = 2.0 * np.pi * np.arange(nlon) / nlon  # (nlon,)
    st, ct = np.sin(theta)[:, None], np.cos(theta)[:, None]
    rings = np.stack(
        [st * np.cos(phi)[None], st * np.sin(phi)[None],
         np.broadcast_to(ct, (nlat - 1, nlon))],
        axis=-1,
    ).reshape(-1, 3)  # ((nlat-1)*nlon, 3)
    verts = np.concatenate(
        [rings, [[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]]], axis=0
    ).astype(np.float32)
    top, bot = len(rings), len(rings) + 1
    faces = []
    idx = lambda i, j: i * nlon + (j % nlon)  # ring i (0-based), lon j
    for j in range(nlon):  # pole fans
        faces.append([top, idx(0, j + 1), idx(0, j)])
        faces.append([bot, idx(nlat - 2, j), idx(nlat - 2, j + 1)])
    for i in range(nlat - 2):  # ring quads -> 2 tris
        for j in range(nlon):
            a, b = idx(i, j), idx(i, j + 1)
            c, d = idx(i + 1, j), idx(i + 1, j + 1)
            faces.append([a, d, b])
            faces.append([a, c, d])
    from hocon.data.meshes import orient_faces_outward

    # Normalize winding: the hand-built fans/quads leave one pole fan
    # wound inward, which would punch holes under backface culling.
    faces = orient_faces_outward(verts, np.asarray(faces, np.int32))
    return verts, faces


class SyntheticHandDataset:
    """Pose-dataset-protocol implementation over procedurally rendered clips."""

    def __init__(
        self,
        n_videos: int = 4,
        frames_per_video: int = 6,
        image_size: int = 64,
        seed: int = 0,
        mano: ManoModel | None = None,
        supervised_fraction: float = 1.0,
        with_object: bool = True,
        pair_spacing: int = 2,
        pair_fixed_spacing: bool = False,
        obj_n_faces: int = 0,
    ):
        import jax.numpy as jnp

        from hocon.geometry.project import persp_project
        from hocon.render.raster import soft_rasterize

        self.mano = mano if mano is not None else synthetic_mano_model(0)
        self.image_size = image_size
        self.pair_spacing = pair_spacing
        self.pair_fixed_spacing = pair_fixed_spacing
        self.frames_per_video = frames_per_video
        n = n_videos * frames_per_video
        rng = np.random.default_rng(seed)

        # Smoothly interpolated MANO parameters per video.
        pose0 = rng.standard_normal((n_videos, 15)).astype(np.float32) * 0.3
        pose1 = pose0 + rng.standard_normal((n_videos, 15)).astype(np.float32) * 0.4
        root0 = rng.standard_normal((n_videos, 3)).astype(np.float32) * 0.3
        root1 = root0 + rng.standard_normal((n_videos, 3)).astype(np.float32) * 0.3
        trans0 = np.concatenate(
            [rng.uniform(-0.03, 0.03, (n_videos, 2)), rng.uniform(0.55, 0.7, (n_videos, 1))],
            axis=1,
        ).astype(np.float32)
        trans1 = trans0 + rng.uniform(-0.04, 0.04, (n_videos, 3)).astype(np.float32)

        t = np.linspace(0.0, 1.0, frames_per_video, dtype=np.float32)
        lerp = lambda a, b: (
            a[:, None] * (1 - t[None, :, None]) + b[:, None] * t[None, :, None]
        ).reshape(n, -1)
        pose = lerp(pose0, pose1)
        root = lerp(root0, root1)
        trans = lerp(trans0, trans1)
        betas = np.zeros((n, 10), np.float32)

        f = image_size * 1.6
        self.camintr = np.array(
            [[f, 0, image_size / 2], [0, f, image_size / 2], [0, 0, 1]], np.float32
        )

        self.pose, self.betas, self.root, self.trans = pose, betas, root, trans

        # Object following the wrist: a 12-face box by default, or (for
        # real-data-scale raster workloads) a UV sphere with ~obj_n_faces
        # triangles standing in for a decimated YCB mesh.
        self.obj_scale = 0.06
        if obj_n_faces and obj_n_faces > 12:
            sv, sf = uv_sphere(obj_n_faces)
            self.obj_verts_can = sv * (self.obj_scale * 0.5)
            self.obj_faces = sf
        else:
            self.obj_verts_can = _BOX_VERTS * self.obj_scale
            self.obj_faces = _BOX_FACES
        self.with_object = with_object

        # Rendering all frames at init is the dominant setup cost (compiles +
        # rasterization over the TPU tunnel: ~15 min at 256px in BENCH_r02),
        # so derived arrays are disk-cached keyed by every input that affects
        # them. Cache hit -> zero jax dispatches in __init__.
        cached = self._cache_load(n_videos, seed)
        if cached is not None:
            self.verts, self.joints, self.images = cached
            self._set_obj_pose(n)
        else:
            verts, joints = mano_forward(
                self.mano, jnp.asarray(pose), jnp.asarray(betas),
                jnp.asarray(root), trans=jnp.asarray(trans), scale_mm=False,
            )
            self.verts = np.asarray(verts)
            self.joints = np.asarray(joints)
            self._set_obj_pose(n)

            # Render all frames once (hand + object, vertex-colored).
            all_v = self.verts
            all_f = np.asarray(self.mano.faces)
            if with_object:
                obj_v = (
                    self.obj_verts_can[None]
                    @ self.obj_pose[:, :3, :3].transpose(0, 2, 1)
                    + self.obj_pose[:, None, :3, 3]
                )
                all_v = np.concatenate([all_v, obj_v], axis=1)
                all_f = np.concatenate(
                    [all_f, self.obj_faces + self.verts.shape[1]], axis=0
                )
            colors = self._vertex_colors(all_v.shape[1])
            vp = persp_project(jnp.asarray(all_v), jnp.asarray(self.camintr)[None])
            out = soft_rasterize(
                vp,
                jnp.asarray(all_v[..., 2]),
                jnp.asarray(all_f),
                attrs=jnp.asarray(np.tile(colors[None], (n, 1, 1))),
                image_size=(image_size, image_size),
                sigma=0.7,
                # auto: Pallas on TPU (the giant unrolled XLA scan at 256px
                # costs 10+ min of compile over the axon tunnel — BENCH_r02's
                # 884 s data setup), XLA on CPU (tests; interpret-mode Pallas
                # would be far slower there).
                backend="auto",
            )
            sil = np.asarray(out.sil)[..., None]
            rgb = np.clip(np.asarray(out.attr), 0, 1) * sil + 0.15 * (1 - sil)
            self.images = (rgb * 255).astype(np.uint8)
            self._cache_save(n_videos, seed)

        # Sparse supervision: mark ~fraction of frames per video, always
        # including the first frame (the annotated "ref" anchor).
        self.supervised = np.zeros(n, bool)
        step = max(1, int(round(1.0 / max(supervised_fraction, 1e-6))))
        for v in range(n_videos):
            idx = np.arange(v * frames_per_video, (v + 1) * frames_per_video)
            self.supervised[idx[::step]] = True

    # ---- rendered-frame disk cache ------------------------------------
    def _cache_path(self, n_videos: int, seed: int) -> str | None:
        """Cache file for the (verts, joints, images) arrays, or None if
        caching is disabled (``HOCON_SYNTH_CACHE=0``)."""
        if os.environ.get("HOCON_SYNTH_CACHE", "1") == "0":
            return None
        import jax

        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
        h = hashlib.sha1()
        h.update(str((
            _RENDER_CACHE_VERSION, n_videos, self.frames_per_video,
            self.image_size, seed, self.with_object, self.mano.side, backend,
        )).encode())
        # Every input that feeds the render: MANO assets + object mesh. The
        # MANO fields are DEVICE arrays — hashing them directly costs one
        # device->host readback each, which over the tunneled TPU measured
        # 154 s for the 8 fields. Constructors stamp a host-computed
        # ``digest`` precisely so this path never touches the device; the
        # fallback (hand-built models, e.g. in tests) fetches all fields in
        # ONE batched transfer.
        if self.mano.digest:
            h.update(self.mano.digest.encode())
        else:
            import jax as _jax

            for a in _jax.device_get([
                self.mano.v_template, self.mano.shapedirs, self.mano.posedirs,
                self.mano.joint_regressor, self.mano.skin_weights,
                self.mano.hands_components, self.mano.hands_mean,
                self.mano.faces,
            ]):
                h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        for a in (self.obj_verts_can, self.obj_faces):
            h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        cache_dir = os.environ.get(
            "HOCON_CACHE_DIR", os.path.expanduser("~/.cache/hocon")
        )
        return os.path.join(cache_dir, f"synth-{h.hexdigest()[:16]}.npz")

    def _set_obj_pose(self, n: int) -> None:
        """Object 6-DoF per frame: identity rotation, translation following
        the wrist at a fixed offset (single-sourced for both the cache-hit
        and render paths of __init__)."""
        wrist = self.joints[:, 0]
        self.obj_pose = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        self.obj_pose[:, :3, 3] = wrist + np.array(
            [0.0, 0.04, 0.02], np.float32
        )

    def _cache_load(self, n_videos: int, seed: int):
        path = self._cache_path(n_videos, seed)
        if path is None:
            return None
        if not os.path.exists(path):
            # Read-only fallback: pre-rendered frames shipped in the repo
            # (assets/synth_cache/) so the driver's bench keeps its fast
            # setup even on a fresh host where ~/.cache is empty. A cold
            # render of the bench dataset costs ~3 min over the TPU tunnel.
            repo_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "assets", "synth_cache", os.path.basename(path),
            )
            if not os.path.exists(repo_path):
                return None
            path = repo_path
        try:
            with np.load(path) as z:
                return z["verts"], z["joints"], z["images"]
        except Exception:  # corrupt/partial file -> regenerate
            return None

    def _cache_save(self, n_videos: int, seed: int) -> None:
        path = self._cache_path(n_videos, seed)
        if path is None:
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:  # handle: np.savez must not append ".npz"
            np.savez(f, verts=self.verts, joints=self.joints, images=self.images)
        os.replace(tmp, path)  # atomic: concurrent writers can't corrupt

    @staticmethod
    def _vertex_colors(nv: int) -> np.ndarray:
        """High-frequency procedural vertex colors (photometric texture)."""
        i = np.arange(nv, dtype=np.float32)
        return np.stack(
            [
                0.5 + 0.5 * np.sin(i * 0.7),
                0.5 + 0.5 * np.sin(i * 1.3 + 1.0),
                0.5 + 0.5 * np.sin(i * 2.9 + 2.0),
            ],
            axis=-1,
        ).astype(np.float32)

    def available_queries(self) -> set:
        from hocon.data.queries import BaseQueries

        qs = {BaseQueries.IMAGE, BaseQueries.JOINTS2D, BaseQueries.JOINTS3D,
              BaseQueries.VERTS3D, BaseQueries.CAMINTR, BaseQueries.SIDE,
              BaseQueries.CENTER3D}
        if self.with_object:
            qs |= {BaseQueries.OBJVERTS3D, BaseQueries.OBJVERTSCAN,
                   BaseQueries.OBJFACES, BaseQueries.OBJPOSE,
                   BaseQueries.OBJCORNERS}
        return qs

    def __len__(self):
        return len(self.images)

    def get_sample(self, i: int) -> dict:
        return {
            "image": self.images[i],
            "joints3d_cam": self.joints[i],
            "verts3d_cam": self.verts[i],
            "camintr": self.camintr,
            "obj_verts_can": self.obj_verts_can if self.with_object else None,
            "obj_faces": self.obj_faces if self.with_object else None,
            "obj_pose": self.obj_pose[i] if self.with_object else None,
            "supervised": bool(self.supervised[i]),
            "seq_id": i // self.frames_per_video,
            "frame_idx": i % self.frames_per_video,
            "side": "right",
        }

    def sample_pair(self, i: int, rng: np.random.Generator) -> tuple[int, int]:
        """(annotated ref frame, temporally-offset tgt frame) in i's video."""
        from hocon.data.pairing import pair_target

        video = i // self.frames_per_video
        base = video * self.frames_per_video
        sup = np.nonzero(self.supervised[base : base + self.frames_per_video])[0]
        local = i - base
        ref_local = int(sup[np.argmin(np.abs(sup - local))])
        tgt_local = pair_target(ref_local, self.frames_per_video,
                                self.pair_spacing, rng,
                                fixed=self.pair_fixed_spacing)
        return base + ref_local, base + tgt_local
