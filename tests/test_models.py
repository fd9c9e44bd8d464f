"""Model-layer tests: shapes, init, loss masking, overfit-one-batch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hocon.models.backbone import resnet18
from hocon.models.hocnet import HOCNet
from hocon.models.losses import total_supervised_loss


def _fake_batch(b=2, res=64, vo=30):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.standard_normal((b, res, res, 3)).astype(np.float32)),
        "camintr": jnp.asarray(
            np.tile(
                np.array([[100.0, 0, res / 2], [0, 100.0, res / 2], [0, 0, 1]], np.float32),
                (b, 1, 1),
            )
        ),
        "obj_verts_can": jnp.asarray(
            rng.uniform(-0.05, 0.05, (b, vo, 3)).astype(np.float32)
        ),
    }


def test_resnet18_shapes():
    model = resnet18()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled = model.apply(variables, x)
    assert pooled.shape == (2, 512)
    pooled, spatial = model.apply(variables, x, return_spatial=True)
    assert spatial.shape == (2, 2, 2, 512)


def test_hocnet_forward_shapes(mano_model):
    batch = _fake_batch()
    net = HOCNet()
    variables = net.init(
        jax.random.PRNGKey(0), batch["images"], batch["camintr"], mano_model,
        batch["obj_verts_can"],
    )
    out = net.apply(
        variables, batch["images"], batch["camintr"], mano_model,
        batch["obj_verts_can"],
    )
    assert out["verts_c_mm"].shape == (2, 778, 3)
    assert out["joints_c_mm"].shape == (2, 21, 3)
    assert out["joints2d"].shape == (2, 21, 2)
    assert out["obj_verts_c_mm"].shape == (2, 30, 3)
    assert out["obj_rot"].shape == (2, 3, 3)
    # Centered outputs are truly centered.
    np.testing.assert_allclose(np.asarray(out["joints_c_mm"][:, 9]), 0.0, atol=1e-3)
    # Initial translation puts the hand in front of the camera.
    assert float(jnp.min(out["verts_cam"][..., 2])) > 0.1
    for v in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(v)))


def test_block_rot_freezes_rotation(mano_model):
    batch = _fake_batch()
    net = HOCNet(block_rot=True)
    variables = net.init(
        jax.random.PRNGKey(0), batch["images"], batch["camintr"], mano_model,
        batch["obj_verts_can"],
    )
    out = net.apply(
        variables, batch["images"], batch["camintr"], mano_model,
        batch["obj_verts_can"],
    )
    np.testing.assert_allclose(
        np.asarray(out["obj_rot"]),
        np.broadcast_to(np.eye(3), (2, 3, 3)),
        atol=1e-6,
    )


def test_loss_masking():
    pred = {
        "joints_c_mm": jnp.ones((4, 21, 3)),
        "betas": jnp.zeros((4, 10)),
        "pose_pca": jnp.zeros((4, 15)),
    }
    gt = {"joints_c_mm": jnp.zeros((4, 21, 3))}
    full, _ = total_supervised_loss(pred, gt, jnp.ones(4))
    half, _ = total_supervised_loss(pred, gt, jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(full), float(half), rtol=1e-5)
    # Masked-out samples don't contribute: corrupt them, loss unchanged.
    pred2 = dict(pred, joints_c_mm=pred["joints_c_mm"].at[2:].set(1e6))
    half2, _ = total_supervised_loss(pred2, gt, jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(half2), float(half), rtol=1e-5)


@pytest.mark.slow
def test_overfit_one_batch(mano_model):
    """Integration (SURVEY.md §4.4): N steps of Adam on one batch must
    drive supervised hand loss way down — proves grads flow through
    trunk -> heads -> MANO -> losses."""
    batch = _fake_batch(b=2, res=64)
    net = HOCNet(with_object=False, freeze_batchnorm=True)
    variables = net.init(
        jax.random.PRNGKey(0), batch["images"], batch["camintr"], mano_model
    )
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # Synthetic GT: the MANO output of a fixed random parameter set.
    from hocon.geometry.mano import mano_forward

    rng = np.random.default_rng(1)
    gt_pose = jnp.asarray(rng.standard_normal((2, 15)).astype(np.float32) * 0.3)
    gt_beta = jnp.zeros((2, 10))
    gt_root = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32) * 0.2)
    vgt, jgt = mano_forward(mano_model, gt_pose, gt_beta, gt_root, scale_mm=False)
    center = jgt[:, 9:10]
    gt = {
        "verts_c_mm": (vgt - center) * 1000.0,
        "joints_c_mm": (jgt - center) * 1000.0,
    }

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = net.apply(
                {"params": p, "batch_stats": bstats},
                batch["images"], batch["camintr"], mano_model, train=True,
            )
            loss, terms = total_supervised_loss(out, gt, jnp.ones(2))
            return loss, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
