import numpy as np

from hocon.visualize.samplevis import sample_vis


def test_warp_panels(tmp_path, mano_model):
    import jax

    from hocon.data.factory import get_dataset
    from hocon.data.pipeline import BatchLoader
    from hocon.models.hocnet import HOCNet
    from hocon.train.state import create_train_state, make_optimizer
    from hocon.visualize.warpvis import save_warp_panels

    ds = get_dataset(
        "synthetic", "train", image_size=64, use_objects=False, train=True,
        mano=mano_model, pair_mode=True, synth_videos=1, synth_frames=4,
    )
    batch = next(iter(BatchLoader(ds, batch_size=2, seed=0, drop_last=False)))
    model = HOCNet(with_object=False)
    state = create_train_state(
        model, mano_model, make_optimizer(), batch["ref"],
        jax.random.PRNGKey(0), with_object=False,
    )
    out = save_warp_panels(
        model, mano_model, state, batch, str(tmp_path / "warp.png"),
        image_size=(64, 64), backend="xla",
    )
    import os

    assert out is not None and os.path.getsize(out) > 1000


def test_sample_vis_writes_grid(tmp_path):
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((3, 32, 32, 3)).astype(np.float32) * 0.2,
        "joints2d": rng.uniform(4, 28, (3, 21, 2)).astype(np.float32),
    }
    preds = {"joints2d": rng.uniform(4, 28, (3, 21, 2)).astype(np.float32)}
    warp = {
        "mask": rng.uniform(0, 1, (3, 32, 32)).astype(np.float32),
        "warped": rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32),
        "target": rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32),
    }
    out = sample_vis(batch, preds, str(tmp_path / "grid.png"), warp=warp)
    assert out is not None
    import os

    assert os.path.getsize(out) > 1000
