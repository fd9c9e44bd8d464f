"""Data-layer tests: crop affine consistency, synthetic dataset, loader
sharding determinism (SURVEY.md §4.3)."""

import numpy as np
import pytest

from hocon.data.augment import AugmentConfig
from hocon.data.cropping import (
    build_crop_affine,
    square_bbox_from_points,
    transform_intrinsics,
    transform_points2d,
    warp_image,
)
from hocon.data.hand_dataset import HandDataset, HandDatasetConfig
from hocon.data.pipeline import BatchLoader
from hocon.data.queries import TransQueries
from hocon.data.synthetic import SyntheticHandDataset


def test_affine_label_image_consistency():
    """Projecting 3D with the adjusted K must match affine-transformed 2D."""
    rng = np.random.default_rng(0)
    pts3d = rng.uniform(-0.1, 0.1, (21, 3)).astype(np.float32)
    pts3d[:, 2] += 0.6
    k = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)
    pts2d = (pts3d @ k.T)[:, :2] / (pts3d @ k.T)[:, 2:3]
    center, side = square_bbox_from_points(pts2d, 1.3)
    aff = build_crop_affine(center, side, 128, rot_deg=20.0, scale_jitter=1.1,
                            center_jitter=np.array([3.0, -2.0]))
    k_adj = transform_intrinsics(k, aff)
    proj = (pts3d @ k_adj.T)[:, :2] / (pts3d @ k_adj.T)[:, 2:3]
    direct = transform_points2d(pts2d, aff)
    np.testing.assert_allclose(proj, direct, atol=1e-3)


def test_warp_image_moves_pixel_content():
    img = np.zeros((64, 64, 3), np.float32)
    img[30:34, 20:24] = 1.0  # block at (x~22, y~32)
    aff = build_crop_affine(np.array([22.0, 32.0]), 16, 32)
    crop = warp_image(img, aff, 32)
    # Block center should land at crop center.
    assert crop[14:18, 14:18].mean() > 0.9
    assert crop[:4, :4].mean() < 0.05


@pytest.fixture(scope="module")
def synth(mano_model):
    return SyntheticHandDataset(
        n_videos=2, frames_per_video=4, image_size=64, mano=mano_model,
        supervised_fraction=0.5,
    )


def test_synthetic_dataset_samples(synth):
    assert len(synth) == 8
    s = synth.get_sample(0)
    assert s["image"].shape == (64, 64, 3) and s["image"].dtype == np.uint8
    assert s["joints3d_cam"].shape == (21, 3)
    # Hand is actually visible (non-background pixels exist).
    assert (np.abs(s["image"].astype(int) - 38) > 20).mean() > 0.03
    # Supervision fraction respected: 2 of 4 frames per video.
    assert synth.supervised.sum() == 4


def test_hand_dataset_single_frame(synth):
    ds = HandDataset(
        synth,
        HandDatasetConfig(
            image_size=64, train=True, augment=AugmentConfig(enabled=True),
            max_obj_verts=8, max_obj_faces=12,
        ),
    )
    s = ds[1]
    img = s[TransQueries.IMAGE.value]
    assert img.shape == (64, 64, 3)
    j3 = s[TransQueries.JOINTS3D.value]
    assert j3.shape == (21, 3)
    np.testing.assert_allclose(j3[9], 0.0, atol=1e-3)  # root-centered
    # 2D labels consistent with adjusted intrinsics.
    jc = s[TransQueries.JOINTS_CAM.value]
    k = s[TransQueries.CAMINTR.value]
    proj = (jc @ k.T)[:, :2] / (jc @ k.T)[:, 2:3]
    np.testing.assert_allclose(proj, s[TransQueries.JOINTS2D.value], atol=1e-2)
    # 2D joints inside the crop.
    j2 = s[TransQueries.JOINTS2D.value]
    assert (j2 > -16).all() and (j2 < 80).all()
    assert s["obj_verts_mask"].sum() == 8


def test_hand_dataset_determinism(synth):
    ds = HandDataset(synth, HandDatasetConfig(image_size=64), seed=3)
    a = ds[2]
    b = ds[2]
    np.testing.assert_array_equal(
        a[TransQueries.IMAGE.value], b[TransQueries.IMAGE.value]
    )


def test_hue_jitter_fused_rotation():
    """The fused single-matmul hue rotation (augment.py) must equal the
    two-stage RGB->YIQ->rotate->RGB reference, and leave gray pixels gray
    (hue rotation only touches the I/Q chroma channels)."""
    from hocon.data.augment import _RGB2YIQ, _YIQ2RGB, color_jitter

    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32) * 0.8 + 0.1
    t = 0.07 * np.pi  # what hue=0.1 can draw
    cos, sin = np.cos(t), np.sin(t)
    rot = np.array([[1, 0, 0], [0, cos, -sin], [0, sin, cos]], np.float32)
    ref = ((img @ _RGB2YIQ.T) @ rot.T) @ _YIQ2RGB.T
    fused = img @ (_YIQ2RGB @ rot @ _RGB2YIQ).astype(np.float32).T
    np.testing.assert_allclose(fused, ref, atol=1e-6)

    gray = np.full((8, 8, 3), 0.5, np.float32)
    out = gray @ (_YIQ2RGB @ rot @ _RGB2YIQ).astype(np.float32).T
    np.testing.assert_allclose(out, gray, atol=1e-6)

    # hue is ON by default in train-mode jitter and changes the image.
    cfg = AugmentConfig(brightness=0, contrast=0, saturation=0)
    assert cfg.hue > 0
    jit = color_jitter(np.random.default_rng(1), img, cfg)
    assert np.abs(jit - img).max() > 1e-4


def test_pair_mode_same_video_and_color_jitter(synth):
    ds = HandDataset(
        synth,
        HandDatasetConfig(image_size=64, pair_mode=True, train=True),
    )
    s = ds[5]
    assert "ref" in s and "tgt" in s
    ref_sup = s["ref"][TransQueries.SUP_MASK.value]
    assert ref_sup == 1.0  # ref frames are always annotated


def test_batch_loader_shapes_and_sharding(synth):
    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    loader = BatchLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    assert batch[TransQueries.IMAGE.value].shape == (4, 64, 64, 3)
    assert batch[TransQueries.JOINTS3D.value].shape == (4, 21, 3)

    # Two-host sharding partitions each global batch without overlap.
    l0 = BatchLoader(ds, batch_size=4, seed=0, shard_index=0, shard_count=2)
    l1 = BatchLoader(ds, batch_size=4, seed=0, shard_index=1, shard_count=2)
    i0, _ = l0.epoch_indices(0)
    i1, _ = l1.epoch_indices(0)
    assert i0.shape == (2, 2) and i1.shape == (2, 2)
    for b0, b1 in zip(i0, i1):
        assert set(b0) & set(b1) == set()
    full, _ = BatchLoader(ds, batch_size=4, seed=0).epoch_indices(0)
    np.testing.assert_array_equal(
        np.sort(np.concatenate([i0, i1], axis=1).ravel()), np.sort(full.ravel())
    )

    # drop_last=False pads with wrap-around rows marked invalid.
    l = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False)
    idx, valid = l.epoch_indices(0)
    assert idx.shape == valid.shape == (3, 3)
    assert valid.sum() == 8  # 8 real samples, 1 pad
    batch = list(l.epoch(0))[-1]
    assert batch["_valid"].sum() == 2


def test_query_declarations(synth):
    from hocon.data.queries import BaseQueries

    qs = synth.available_queries()
    assert BaseQueries.VERTS3D in qs and BaseQueries.OBJPOSE in qs
    # Requesting something the dataset can serve works...
    HandDataset(synth, HandDatasetConfig(image_size=64),
                required_queries={BaseQueries.JOINTS3D})
    # ...an unservable query raises.
    synth_noobj = SyntheticHandDataset(
        n_videos=1, frames_per_video=2, image_size=32, with_object=False,
    )
    with pytest.raises(ValueError):
        HandDataset(synth_noobj, HandDatasetConfig(image_size=32),
                    required_queries={BaseQueries.OBJPOSE})


def test_grain_loader_if_available(synth):
    pytest.importorskip("grain")
    from hocon.data.pipeline import grain_loader

    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    loader = grain_loader(ds, batch_size=4, shuffle=False, num_epochs=1)
    batch = next(iter(loader))
    assert batch[TransQueries.IMAGE.value].shape == (4, 64, 64, 3)


def test_grain_epoch_loader(synth):
    pytest.importorskip("grain")
    from hocon.data.pipeline import GrainEpochLoader

    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    loader = GrainEpochLoader(ds, batch_size=4, shuffle=True, seed=0)
    assert loader.steps_per_epoch() == 2
    b0 = list(loader.epoch(0))
    b1 = list(loader.epoch(1))
    assert len(b0) == len(b1) == 2
    assert b0[0][TransQueries.IMAGE.value].shape == (4, 64, 64, 3)


def test_grain_epoch_loader_rejected_by_eval_pass(synth):
    """Feeding the tail-dropping Grain loader to an eval pass must be an
    error, not a silent metric bias (VERDICT r2 #8)."""
    pytest.importorskip("grain")
    from hocon.data.pipeline import GrainEpochLoader
    from hocon.train.loop import epoch_pass

    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    loader = GrainEpochLoader(ds, batch_size=4, shuffle=True, seed=0)
    with pytest.raises(ValueError, match="train-only"):
        epoch_pass(loader, state=None, step_fn=None, train=False)


def test_grain_epoch_loader_workers_epoch_boundary(synth):
    """worker_count > 0: epochs stay the declared length, every sample id
    appears exactly once per epoch, and the stream continues cleanly
    across the epoch boundary (VERDICT r2 #8)."""
    pytest.importorskip("grain")
    from hocon.data.pipeline import GrainEpochLoader

    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    loader = GrainEpochLoader(
        ds, batch_size=4, shuffle=True, seed=0, worker_count=2
    )
    epochs = [list(loader.epoch(e)) for e in range(2)]
    for batches in epochs:
        assert len(batches) == loader.steps_per_epoch()
        for b in batches:
            assert b[TransQueries.IMAGE.value].shape == (4, 64, 64, 3)
        ids = np.concatenate(
            [np.asarray(b["sample_idx"]).ravel() for b in batches]
        )
        # Full-epoch coverage: each dataset index exactly once (8 samples,
        # batch 4, 2 steps -> no repeats and no drops within the epoch).
        assert len(np.unique(ids)) == len(ids)


def test_grain_eval_loader_bitwise_parity(synth):
    """GrainEvalLoader (workers>0) must yield batches BIT-IDENTICAL to
    BatchLoader (workers=0) — same sample order, same wrap-around tail
    padding, same _valid masks — so eval metrics cannot depend on the
    worker count (VERDICT r3 #5)."""
    pytest.importorskip("grain")
    from hocon.data.pipeline import GrainEvalLoader

    ds = HandDataset(synth, HandDatasetConfig(image_size=64))
    # batch 3 over 8 samples -> 3 batches with a padded tail row.
    ref = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False)
    got = GrainEvalLoader(
        ds, batch_size=3, shuffle=False, drop_last=False, worker_count=2
    )
    assert got.steps_per_epoch() == ref.steps_per_epoch() == 3
    ref_batches = list(ref.epoch(0))
    got_batches = list(got.epoch(0))
    assert len(ref_batches) == len(got_batches)
    assert np.asarray(ref_batches[-1]["_valid"]).sum() == 2  # real tail rows
    for rb, gb in zip(ref_batches, got_batches):
        assert sorted(rb.keys()) == sorted(gb.keys())
        for k in rb:
            r, g = np.asarray(rb[k]), np.asarray(gb[k])
            assert r.dtype == g.dtype, k
            np.testing.assert_array_equal(r, g, err_msg=k)
    # worker_count=0 falls back to the in-process path, also identical.
    got0 = list(GrainEvalLoader(
        ds, batch_size=3, shuffle=False, drop_last=False, worker_count=0
    ).epoch(0))
    for rb, gb in zip(ref_batches, got0):
        for k in rb:
            np.testing.assert_array_equal(np.asarray(rb[k]), np.asarray(gb[k]))
    # The eval-pass guard on the tail-dropping train loader must survive.
    from hocon.train.loop import epoch_pass
    from hocon.data.pipeline import GrainEpochLoader

    with pytest.raises(ValueError, match="train-only"):
        epoch_pass(
            GrainEpochLoader(ds, batch_size=4, shuffle=True, seed=0),
            state=None, step_fn=None, train=False,
        )


def test_rotation_aug_rotates_3d_labels(synth):
    """In-plane rotation jitter must rotate 3D labels about the optical
    axis (round-1 advisor, high severity): the adjusted K carries no
    rotation, 3D labels reproject exactly under it, and two different
    rotation jitters of the same frame are related by a pure z-rotation
    applied consistently to joints AND verts/object labels."""
    cfg = HandDatasetConfig(
        image_size=64, train=True,
        augment=AugmentConfig(
            enabled=True, rot_jitter_deg=30.0, scale_jitter=0.0,
            center_jitter_frac=0.0, brightness=0.0, contrast=0.0,
            saturation=0.0,
        ),
        max_obj_verts=8, max_obj_faces=12,
    )
    a = HandDataset(synth, cfg, seed=11)[0]
    b = HandDataset(synth, cfg, seed=12)[0]
    for s in (a, b):
        k = s[TransQueries.CAMINTR.value]
        # Rotation folded out of the intrinsics (fx == fy here).
        assert abs(k[0, 1]) < 1e-3 * abs(k[0, 0])
        assert abs(k[1, 0]) < 1e-3 * abs(k[1, 1])
        # 3D labels reproject exactly with the adjusted K.
        jc = s[TransQueries.JOINTS_CAM.value]
        hom = jc @ k.T
        np.testing.assert_allclose(
            hom[:, :2] / hom[:, 2:3], s[TransQueries.JOINTS2D.value],
            atol=1e-2,
        )
    ja = a[TransQueries.JOINTS_CAM.value]
    jb = b[TransQueries.JOINTS_CAM.value]
    # Pure Rz relation: depths and xy-norms invariant, xy actually rotated.
    np.testing.assert_allclose(ja[:, 2], jb[:, 2], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(ja[:, :2], axis=1),
        np.linalg.norm(jb[:, :2], axis=1), atol=1e-5,
    )
    assert np.abs(ja[:, :2] - jb[:, :2]).max() > 1e-4
    # Recover the relative angle from the joints and check verts + object
    # labels rotate by the SAME angle (labels stay mutually consistent).
    cross = np.sum(jb[:, 0] * ja[:, 1] - jb[:, 1] * ja[:, 0])
    dot = np.sum(jb[:, 0] * ja[:, 0] + jb[:, 1] * ja[:, 1])
    t = np.arctan2(cross, dot)
    rz = np.array(
        [[np.cos(t), -np.sin(t), 0.0],
         [np.sin(t), np.cos(t), 0.0],
         [0.0, 0.0, 1.0]], np.float32,
    )
    for q in (TransQueries.VERTS3D, TransQueries.OBJVERTS3D,
              TransQueries.JOINTS3D):
        if q.value not in a:
            continue
        np.testing.assert_allclose(
            b[q.value] @ rz.T, a[q.value], atol=0.2,
        )  # mm tolerance: affine resampling noise only


def test_pair_fixed_spacing_protocol(mano_model):
    """--pair_fixed_spacing: |tgt - ref| == spacing exactly (away from
    sequence edges the sign flips inward to preserve the magnitude)."""
    from hocon.data.pairing import pair_target

    rng = np.random.default_rng(0)
    for _ in range(50):
        # interior ref: both directions fit
        assert abs(pair_target(10, 32, 4, rng, fixed=True) - 10) == 4
        # edge ref: flipped inward, magnitude preserved
        assert pair_target(0, 32, 4, rng, fixed=True) == 4
        assert pair_target(31, 32, 4, rng, fixed=True) == 27
        # default mode: magnitude in [1, spacing]
        d = abs(pair_target(10, 32, 4, rng, fixed=False) - 10)
        assert 1 <= d <= 4

    ds = SyntheticHandDataset(
        n_videos=1, frames_per_video=12, image_size=32, mano=mano_model,
        supervised_fraction=0.5, pair_spacing=3, pair_fixed_spacing=True,
    )
    rng = np.random.default_rng(1)
    for i in range(12):
        r, t = ds.sample_pair(i, rng)
        assert abs(t - r) == 3
        assert ds.supervised[r]


def test_synthetic_realistic_object_frames_match_mesh(mano_model, tmp_path,
                                                      monkeypatch):
    """The rendered frames must use the SAME object connectivity as
    `get_sample` (round-2 verdict: frames were rendered with the 12-face box
    connectivity even when `obj_n_faces` selected the sphere, corrupting the
    photometric signal). Re-render frame 0 directly from get_sample fields
    and require bitwise equality."""
    import jax.numpy as jnp

    from hocon.geometry.project import persp_project
    from hocon.render.raster import soft_rasterize

    monkeypatch.setenv("HOCON_CACHE_DIR", str(tmp_path))
    ds = SyntheticHandDataset(
        n_videos=1, frames_per_video=2, image_size=64, mano=mano_model,
        obj_n_faces=320,
    )
    s = ds.get_sample(0)
    assert len(s["obj_faces"]) > 12  # the sphere, not the box
    obj_v = s["obj_verts_can"] @ s["obj_pose"][:3, :3].T + s["obj_pose"][:3, 3]
    all_v = np.concatenate([ds.verts[0], obj_v], axis=0)
    all_f = np.concatenate(
        [np.asarray(mano_model.faces), s["obj_faces"] + ds.verts.shape[1]],
        axis=0,
    )
    colors = ds._vertex_colors(all_v.shape[0])
    vp = persp_project(jnp.asarray(all_v)[None], jnp.asarray(ds.camintr)[None])
    out = soft_rasterize(
        vp, jnp.asarray(all_v[..., 2])[None], jnp.asarray(all_f),
        attrs=jnp.asarray(colors[None]), image_size=(64, 64), sigma=0.7,
        backend="xla",
    )
    sil = np.asarray(out.sil)[0][..., None]
    rgb = np.clip(np.asarray(out.attr)[0], 0, 1) * sil + 0.15 * (1 - sil)
    expect = (rgb * 255).astype(np.uint8)
    np.testing.assert_array_equal(expect, ds.images[0])


def test_synthetic_render_cache_roundtrip(mano_model, tmp_path, monkeypatch):
    """Second construction with identical inputs loads frames from the disk
    cache (no render) and yields identical arrays; different inputs miss."""
    monkeypatch.setenv("HOCON_CACHE_DIR", str(tmp_path))
    kw = dict(n_videos=1, frames_per_video=2, image_size=32, mano=mano_model)
    a = SyntheticHandDataset(**kw)
    files = list(tmp_path.glob("synth-*.npz"))
    assert len(files) == 1
    # Cache hit: poison soft_rasterize — a render attempt would now fail.
    import hocon.render.raster as raster_mod

    def _boom(*a, **k):  # pragma: no cover - only runs on cache miss
        raise AssertionError("cache miss: render was invoked")

    monkeypatch.setattr(raster_mod, "soft_rasterize", _boom)
    b = SyntheticHandDataset(**kw)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.verts, b.verts)
    np.testing.assert_array_equal(a.joints, b.joints)
    monkeypatch.undo()
    monkeypatch.setenv("HOCON_CACHE_DIR", str(tmp_path))
    c = SyntheticHandDataset(**{**kw, "image_size": 16})  # different key
    assert len(list(tmp_path.glob("synth-*.npz"))) == 2
    assert c.images.shape[1] == 16


def test_synthetic_realistic_object_pipeline():
    """`synth_obj_faces` swaps the 12-face box for a ~N-face sphere (the
    YCB-scale decimated-object stand-in) and the full factory/loader path
    pads and batches it correctly."""
    from hocon.data.factory import get_dataset
    from hocon.data.synthetic import uv_sphere

    v, f = uv_sphere(320)
    # Closed, outward-wound surface.
    vol = np.sum(
        np.einsum("ij,ij->i", v[f[:, 0]], np.cross(v[f[:, 1]], v[f[:, 2]]))
    ) / 6.0
    assert vol > 0
    assert 250 <= len(f) <= 400

    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=True, train=True,
        synth_videos=1, synth_frames=2, synth_obj_faces=320,
    )
    loader = BatchLoader(ds, batch_size=2, seed=0, drop_last=False)
    batch = next(iter(loader))
    assert batch[TransQueries.OBJVERTS3D.value].shape[1] == len(v)
    assert batch["obj_faces"].shape[1] == len(f)


def test_uint8_images_device_normalization(synth):
    """uint8_images loaders + on-device normalization reproduce the f32
    host-normalized path up to crop quantization (<= 0.5/255 pre-norm),
    with all labels identical (steps._device_images)."""
    import jax.numpy as jnp

    from hocon.data.augment import IMAGENET_STD
    from hocon.train.steps import _device_images

    cfg = dict(image_size=64, train=False)
    ds8 = HandDataset(synth, HandDatasetConfig(uint8_images=True, **cfg))
    dsf = HandDataset(synth, HandDatasetConfig(**cfg))
    s8, sf = ds8[0], dsf[0]
    img8 = s8[TransQueries.IMAGE.value]
    assert img8.dtype == np.uint8
    dev = np.asarray(_device_images(jnp.asarray(img8)))
    atol = (0.5 / 255.0) / float(np.min(IMAGENET_STD)) + 1e-5
    np.testing.assert_allclose(dev, sf[TransQueries.IMAGE.value], atol=atol)
    # f32 images pass through _device_images untouched.
    ff = jnp.asarray(sf[TransQueries.IMAGE.value])
    assert _device_images(ff) is ff
    # Labels are unaffected by the image dtype.
    for k in (TransQueries.JOINTS3D.value, TransQueries.JOINTS2D.value,
              TransQueries.CAMINTR.value):
        np.testing.assert_array_equal(s8[k], sf[k])


def test_uint8_images_warp_step_runs(synth):
    """The full warp train step accepts a uint8 pair batch (trunk input and
    photometric target both normalized on device at loss entry)."""
    import jax
    import jax.numpy as jnp

    from hocon.models.hocnet import HOCNet
    from hocon.train.state import create_train_state, make_optimizer
    from hocon.train.steps import make_warp_train_step

    ds = HandDataset(
        synth,
        HandDatasetConfig(image_size=64, pair_mode=True, train=True,
                          uint8_images=True),
    )
    loader = BatchLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    assert batch["ref"][TransQueries.IMAGE.value].dtype == np.uint8
    mano = synth.mano
    model = HOCNet(with_object=False, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 1e-4)
    state = create_train_state(
        model, mano, optimizer, batch["ref"], jax.random.PRNGKey(0),
        with_object=False,
    )
    step = make_warp_train_step(model, mano, optimizer, image_size=(64, 64))
    state, terms = step(state, batch)
    assert np.isfinite(float(terms["loss_total"]))
    assert float(terms["photo_total"]) > 0.0


def test_batch_loader_prefetch_identical_and_propagates(synth):
    """prefetch=N yields byte-identical batch sequences to the synchronous
    path, and worker-thread exceptions reach the consumer."""
    ds = HandDataset(synth, HandDatasetConfig(image_size=64, train=False))
    sync = BatchLoader(ds, batch_size=4, seed=3)
    pre = BatchLoader(ds, batch_size=4, seed=3, prefetch=2)
    for b1, b2 in zip(sync.epoch(1), pre.epoch(1)):
        assert sorted(b1) == sorted(b2)
        for k in b1:
            np.testing.assert_array_equal(np.asarray(b1[k]),
                                          np.asarray(b2[k]))

    class _Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("boom")

    bad = BatchLoader(_Boom(), batch_size=4, shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(bad.epoch(0)))


def test_prefetcher_releases_thread_on_abandonment(synth):
    """Dropping a prefetching iterator (``next(iter(loader))`` or a
    mid-epoch ``break``) must stop the producer thread and release its
    queued batches — one leaked thread + pinned batches per epoch
    otherwise."""
    import gc
    import threading
    import time

    ds = HandDataset(synth, HandDatasetConfig(image_size=64, train=False))
    loader = BatchLoader(ds, batch_size=4, prefetch=2)

    before = threading.active_count()
    for _ in range(3):
        it = loader.epoch(0)
        next(it)
        del it
        gc.collect()
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_worker_env_restored_between_pulls(monkeypatch):
    """_WorkerEnvLoader must not hold the CPU-pinned worker env across the
    whole (infinite) stream: between batch pulls the parent env is the real
    one, so unrelated mid-run subprocesses see the accelerator env."""
    import os

    from hocon.data.pipeline import _WorkerEnvLoader

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")

    seen = []

    def fake_stream():
        while True:
            seen.append(
                (os.environ.get("JAX_PLATFORMS"),
                 os.environ.get("PALLAS_AXON_POOL_IPS"))
            )
            yield {"x": np.zeros(1)}

    it = iter(_WorkerEnvLoader(fake_stream()))
    for _ in range(3):
        next(it)
        # Worker env active during the pull (spawn inherits CPU pinning)...
        assert seen[-1] == ("cpu", None)
        # ...and fully restored between pulls.
        assert os.environ["JAX_PLATFORMS"] == "tpu"
        assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"


def test_batch_loader_pad_exceeds_dataset(synth):
    """drop_last=False with batch_size > 2*len(dataset): the wrap-around
    padding must tile indices (np.resize), not silently under-fill and
    crash the reshape."""
    class _Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"x": np.float32([i])}

    loader = BatchLoader(_Tiny(), batch_size=8, shuffle=False,
                         drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["x"].shape == (8, 1)
    np.testing.assert_array_equal(b["_valid"], [1, 1, 1, 0, 0, 0, 0, 0])


def test_probe_batch_does_not_consume_loader(synth):
    """probe_batch builds the init/shape-probe batch straight from the
    dataset; a GrainEpochLoader-style shared iterator must not lose its
    first batch to the probe."""
    from hocon.data.pipeline import probe_batch

    ds = HandDataset(synth, HandDatasetConfig(image_size=64, train=False))
    probe = probe_batch(ds, 4)
    ref = next(iter(BatchLoader(ds, batch_size=4, shuffle=False).epoch(0)))
    assert sorted(probe) == sorted(ref)
    for k in ref:
        assert np.asarray(probe[k]).shape == np.asarray(ref[k]).shape, k
    np.testing.assert_array_equal(probe["_valid"], np.ones(4, np.float32))
