import numpy as np

from hocon.visualize.samplevis import sample_vis


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
