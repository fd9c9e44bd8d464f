"""Training-stack integration tests (SURVEY.md §4.4/4.5): supervised and
warp steps learn on synthetic data; checkpoint round-trip; 8-device data
parallelism on the virtual CPU mesh; CLI smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hocon.data.factory import get_dataset
from hocon.data.pipeline import BatchLoader
from hocon.models.hocnet import HOCNet
from hocon.train.sharding import make_mesh, replicate, shard_batch
from hocon.train.state import create_train_state, make_optimizer
from hocon.train.steps import make_eval_step, make_train_step, make_warp_train_step


def _fresh(state):
    # Train steps donate their input state; hand each test its own copy.
    return jax.tree_util.tree_map(jnp.copy, state)


@pytest.fixture(scope="module")
def setup(mano_model):
    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=True, train=True,
        mano=mano_model, synth_videos=2, synth_frames=4,
    )
    loader = BatchLoader(ds, batch_size=8, seed=0)
    model = HOCNet(with_object=True, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 1e-3)
    batch = next(iter(loader))
    state = create_train_state(
        model, mano_model, optimizer, batch, jax.random.PRNGKey(0)
    )
    return ds, loader, model, optimizer, batch, state


def test_supervised_step_decreases_loss(setup, mano_model):
    _, _, model, optimizer, batch, state = setup
    state = _fresh(state)
    step = make_train_step(model, mano_model, optimizer)
    losses = []
    for _ in range(12):
        state, terms = step(state, batch)
        losses.append(float(terms["loss_total"]))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()
    assert float(terms["loss_obj_verts3d"]) >= 0


def test_eval_step_and_evalutil(setup, mano_model):
    _, loader, model, _, batch, state = setup
    eval_step = make_eval_step(model, mano_model)
    preds = jax.device_get(eval_step(state, batch))
    assert preds["joints_c_mm"].shape == (8, 21, 3)

    from hocon.evaluation.zimeval import EvalUtil

    ev = EvalUtil()
    ev.feed(np.asarray(batch["joints3d"]), preds["joints_c_mm"])
    epe, med, auc, pck, th = ev.get_measures(0, 50, 20)
    assert np.isfinite(epe) and 0 <= auc <= 1
    assert pck.shape == th.shape


def test_warp_step_runs_and_learns(mano_model):
    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=False, train=True,
        mano=mano_model, pair_mode=True, fraction=0.5,
        synth_videos=2, synth_frames=4,
    )
    loader = BatchLoader(ds, batch_size=4, seed=0)
    model = HOCNet(with_object=False, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 5e-4)
    batch = next(iter(loader))
    state = create_train_state(
        model, mano_model, optimizer, batch["ref"], jax.random.PRNGKey(0),
        with_object=False,
    )
    step = make_warp_train_step(
        model, mano_model, optimizer, image_size=(64, 64),
        consist_gt_refs=True, backend="xla",
    )
    losses, photos = [], []
    for _ in range(8):
        state, terms = step(state, batch)
        losses.append(float(terms["loss_total"]))
        photos.append(float(terms["photo_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(terms["mask_area"]) > 10  # renderer produced a real mask


def test_clip_consistency_step(mano_model):
    """k-frame clips (one annotated ref + 2 targets) run through the warp
    step with targets folded into the batch dim."""
    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=False, train=True,
        mano=mano_model, pair_mode=True, clip_len=3, fraction=0.5,
        synth_videos=2, synth_frames=4,
    )
    loader = BatchLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    assert batch["tgt"]["image"].shape == (4, 2, 64, 64, 3)
    model = HOCNet(with_object=False, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 5e-4)
    state = create_train_state(
        model, mano_model, optimizer, batch["ref"], jax.random.PRNGKey(0),
        with_object=False,
    )
    step = make_warp_train_step(
        model, mano_model, optimizer, image_size=(64, 64), backend="xla",
    )
    for _ in range(3):
        state, terms = step(state, batch)
    assert np.isfinite(float(terms["loss_total"]))
    assert float(terms["mask_area"]) > 10


def test_warp_step_photo_downscale(mano_model):
    """photo_downscale computes the photometric term at reduced resolution
    but stays finite and keeps a live mask."""
    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=False, train=True,
        mano=mano_model, pair_mode=True, fraction=0.5,
        synth_videos=2, synth_frames=4,
    )
    loader = BatchLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    model = HOCNet(with_object=False, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 5e-4)
    state = create_train_state(
        model, mano_model, optimizer, batch["ref"], jax.random.PRNGKey(0),
        with_object=False,
    )
    step = make_warp_train_step(
        model, mano_model, optimizer, image_size=(64, 64), backend="xla",
        photo_downscale=2,
    )
    state, terms = step(state, batch)
    assert np.isfinite(float(terms["loss_total"]))
    assert float(terms["mask_area"]) > 5  # (32x32 mask now)


def test_checkpoint_roundtrip(tmp_path, setup, mano_model):
    from hocon.train.checkpoints import CheckpointManager

    _, _, model, optimizer, batch, state = setup
    state = _fresh(state)
    step = make_train_step(model, mano_model, optimizer)
    state, _ = step(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(jax.device_get(state.step)), state)
    mgr.wait()

    fresh = create_train_state(
        model, mano_model, optimizer, batch, jax.random.PRNGKey(1)
    )
    restored = mgr.restore(fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert int(restored.step) == int(state.step)
    warm = mgr.restore_params_only(fresh)
    assert int(warm.step) == 0  # fresh optimizer/step
    np.testing.assert_allclose(
        np.asarray(warm.params["trunk"]["conv_init"]["kernel"]),
        np.asarray(state.params["trunk"]["conv_init"]["kernel"]),
    )

    # Partial warm start across model variants: hand-only model loads the
    # shared subtrees from a hand+object checkpoint (reference non-strict
    # reload_model).
    model_noobj = HOCNet(with_object=False, freeze_batchnorm=True)
    state_noobj = create_train_state(
        model_noobj, mano_model, optimizer, batch, jax.random.PRNGKey(2),
        with_object=False,
    )
    warm2 = mgr.restore_params_only(state_noobj)
    np.testing.assert_allclose(
        np.asarray(warm2.params["trunk"]["conv_init"]["kernel"]),
        np.asarray(state.params["trunk"]["conv_init"]["kernel"]),
    )
    assert "obj_head" not in warm2.params


def test_data_parallel_8_devices(setup, mano_model):
    """pjit DP over the virtual 8-device CPU mesh: batch sharded, params
    replicated, one step executes and matches single-device numerics."""
    _, _, model, optimizer, batch, state = setup
    assert jax.device_count() == 8
    mesh = make_mesh()
    step = make_train_step(model, mano_model, optimizer)

    state_r = replicate(_fresh(state), mesh)
    batch_s = shard_batch(batch, mesh)
    new_state, terms = step(state_r, batch_s)
    loss_dp = float(terms["loss_total"])

    new_state_1, terms_1 = step(_fresh(state), batch)
    loss_1 = float(terms_1["loss_total"])
    np.testing.assert_allclose(loss_dp, loss_1, rtol=2e-4)
    # The compiled DP step must contain a cross-device gradient reduction.
    hlo = jax.jit(step).lower(state_r, batch_s).compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the DP step HLO"
    # Param updates agree across placements.
    p_dp = jax.device_get(new_state.params["mano_head"]["pose_mlp"]["Dense_2"]["kernel"])
    p_1 = jax.device_get(new_state_1.params["mano_head"]["pose_mlp"]["Dense_2"]["kernel"])
    np.testing.assert_allclose(p_dp, p_1, atol=1e-5)


@pytest.mark.slow
def test_train_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hocon.cli.train import main

    state = main([
        "--dataset", "synthetic", "--image_size", "64", "--batch_size", "8",
        "--epochs", "1", "--synth_videos", "2", "--synth_frames", "4",
        "--exp_id", "smoke", "--max_steps_per_epoch", "2", "--no_bf16",
    ])
    assert state is not None
    assert os.path.exists(tmp_path / "checkpoints" / "smoke" / "opt.txt")
    assert os.path.exists(tmp_path / "checkpoints" / "smoke" / "metrics.jsonl")


@pytest.mark.slow
def test_trainwarp_cli_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hocon.cli.trainwarp import main

    state = main([
        "--dataset", "synthetic", "--image_size", "64", "--batch_size", "8",
        "--epochs", "1", "--synth_videos", "2", "--synth_frames", "4",
        "--exp_id", "smokewarp", "--max_steps_per_epoch", "2",
        "--fraction", "0.5", "--raster_backend", "xla", "--no_bf16",
    ])
    assert state is not None


def test_predict_cli_smoke(tmp_path, monkeypatch):
    """predict.py writes predictions.npz covering the FULL split exactly
    once — incl. the padded tail batch (_valid filtering; 2x4=8 frames at
    batch 5 -> batches of 5 and 3+2 pad) — and --workers N produces a
    bit-identical artifact (GrainEvalLoader parity at the CLI level)."""
    monkeypatch.chdir(tmp_path)
    import numpy as np

    from hocon.cli.predict import main

    base = [
        "--dataset", "synthetic", "--image_size", "64", "--batch_size", "5",
        "--synth_videos", "2", "--synth_frames", "4", "--no_bf16",
    ]
    out0 = main(base + ["--out", "p0"])
    preds0 = dict(np.load(out0))
    assert preds0["joints_cam"].shape[0] == 8  # full split, no pad rows
    assert preds0["joints2d"].shape == (8, 21, 2)

    out2 = main(base + ["--out", "p2", "--workers", "2"])
    preds2 = dict(np.load(out2))
    assert sorted(preds2) == sorted(preds0)
    for k in preds0:
        np.testing.assert_array_equal(preds2[k], preds0[k])


def test_warp_step_data_parallel_8_devices(mano_model):
    """The WARP train step under 8-device DP: sharded pair batch, numerics
    parity with single-device, gradient all-reduce present in the HLO
    (VERDICT r1: warp-path multi-device coverage must live in-repo)."""
    ds = get_dataset(
        "synthetic", "train", image_size=32, use_objects=False, train=True,
        mano=mano_model, pair_mode=True, fraction=0.5,
        synth_videos=2, synth_frames=5,
    )
    loader = BatchLoader(ds, batch_size=8, seed=0)
    batch = next(iter(loader))
    model = HOCNet(with_object=False, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 5e-4)
    state = create_train_state(
        model, mano_model, optimizer, batch["ref"], jax.random.PRNGKey(0),
        with_object=False,
    )
    step = make_warp_train_step(
        model, mano_model, optimizer, image_size=(32, 32), backend="xla",
    )

    mesh = make_mesh()
    state_r = replicate(_fresh(state), mesh)
    batch_s = shard_batch(batch, mesh)
    new_state, terms = step(state_r, batch_s)
    loss_dp = float(terms["loss_total"])

    _, terms_1 = step(_fresh(state), batch)
    np.testing.assert_allclose(loss_dp, float(terms_1["loss_total"]), rtol=5e-4)
    hlo = jax.jit(step).lower(state_r, batch_s).compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the DP warp step HLO"


def test_eval_object_corner_metric(mano_model):
    """OBJCORNERS flow end-to-end: dataset emits posed bbox corners, the
    eval step emits predicted corners, epoch_pass reports the error."""
    from hocon.train.loop import epoch_pass

    ds = get_dataset(
        "synthetic", "test", image_size=32, use_objects=True, train=False,
        mano=mano_model, synth_videos=2, synth_frames=3,
    )
    loader = BatchLoader(ds, batch_size=4, seed=0, drop_last=False)
    batch = next(iter(loader))
    assert batch["objcorners3d"].shape == (4, 8, 3)
    assert batch["obj_corners_can"].shape == (4, 8, 3)
    model = HOCNet(with_object=True, freeze_batchnorm=True)
    optimizer = make_optimizer("adam", 1e-3)
    state = create_train_state(
        model, mano_model, optimizer, batch, jax.random.PRNGKey(0)
    )
    eval_step = make_eval_step(model, mano_model)
    _, metrics = epoch_pass(
        loader, state, eval_step, train=False, epoch=0, max_steps=2,
        pck_thresholds=(20.0, 40.0),
    )
    assert np.isfinite(metrics["obj_corners_err_mm"])
    assert "pck@20.0mm" in metrics and "pck@40.0mm" in metrics
    assert 0.0 <= metrics["pck@20.0mm"] <= 1.0
