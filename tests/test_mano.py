"""MANO layer tests: property-based + independent numpy oracle.

The reference validates its hand layer against the original chumpy MANO via
manopth's comparison tests (SURVEY.md §4); without network access to those
assets, we validate against (a) an independent numpy reimplementation of the
published LBS math and (b) geometric invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hocon.geometry import mano as M


def _numpy_mano_oracle(model, pose_pca, betas, global_rot):
    """Straight-line numpy re-derivation of the MANO forward (meters, no
    centering), written independently of the JAX implementation."""
    comps = np.asarray(model.hands_components)
    full = pose_pca @ comps[: pose_pca.shape[-1]] + np.asarray(model.hands_mean)
    aa = np.concatenate([global_rot, full], axis=-1).reshape(-1, 16, 3)

    # rotation via scipy for independence
    from scipy.spatial.transform import Rotation

    b = aa.shape[0]
    rots = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(b, 16, 3, 3)

    v_t = np.asarray(model.v_template)
    v_shaped = v_t[None] + np.einsum("vds,bs->bvd", np.asarray(model.shapedirs), betas)
    j = np.einsum("jv,bvd->bjd", np.asarray(model.joint_regressor), v_shaped)
    pose_feat = (rots[:, 1:] - np.eye(3)).reshape(b, 135)
    v_posed = v_shaped + np.einsum("vdp,bp->bvd", np.asarray(model.posedirs), pose_feat)

    g = np.zeros((b, 16, 4, 4))
    for jj in range(16):
        local = np.zeros((b, 4, 4))
        local[:, :3, :3] = rots[:, jj]
        local[:, 3, 3] = 1.0
        parent = M.MANO_PARENTS[jj]
        if parent < 0:
            local[:, :3, 3] = j[:, jj]
            g[:, jj] = local
        else:
            local[:, :3, 3] = j[:, jj] - j[:, parent]
            g[:, jj] = g[:, parent] @ local

    joints16 = g[:, :, :3, 3]
    gs = g.copy()
    gs[:, :, :3, 3] -= np.einsum("bjrc,bjc->bjr", g[:, :, :3, :3], j)
    w = np.asarray(model.skin_weights)
    t = np.einsum("vj,bjrc->bvrc", w, gs)
    verts = np.einsum("bvrc,bvc->bvr", t[:, :, :3, :3], v_posed) + t[:, :, :3, 3]
    tips = verts[:, list(M.FINGERTIP_VERT_IDS)]
    joints = np.concatenate([joints16, tips], axis=1)[:, list(M.JOINT_REORDER)]
    return verts, joints


def test_forward_matches_numpy_oracle(mano_model):
    rng = np.random.default_rng(0)
    b = 4
    pose = rng.standard_normal((b, 15)).astype(np.float32) * 0.5
    betas = rng.standard_normal((b, 10)).astype(np.float32) * 0.5
    root = rng.standard_normal((b, 3)).astype(np.float32)
    verts, joints = M.mano_forward(
        mano_model,
        jnp.asarray(pose),
        jnp.asarray(betas),
        jnp.asarray(root),
        scale_mm=False,
    )
    want_v, want_j = _numpy_mano_oracle(mano_model, pose, betas, root)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-5)


def test_rest_pose_zero_mean_flat_recovers_template(mano_model):
    """flat_hand_mean + zero pose + zero betas + zero root == template."""
    b = 2
    verts, _ = M.mano_forward(
        mano_model,
        jnp.zeros((b, 15)),
        jnp.zeros((b, 10)),
        jnp.zeros((b, 3)),
        flat_hand_mean=True,
        scale_mm=False,
    )
    want = np.asarray(mano_model.v_template)
    np.testing.assert_allclose(np.asarray(verts[0]), want, atol=1e-5)


def test_global_rotation_equivariance(mano_model):
    """Rotating the root rotates the whole (wrist-anchored) mesh."""
    from hocon.geometry.rot import rodrigues

    rng = np.random.default_rng(1)
    pose = jnp.asarray(rng.standard_normal((1, 15)).astype(np.float32) * 0.3)
    betas = jnp.zeros((1, 10))
    aa = jnp.asarray([[0.3, -0.2, 0.9]])
    v0, j0 = M.mano_forward(mano_model, pose, betas, jnp.zeros((1, 3)), scale_mm=False)
    v1, j1 = M.mano_forward(mano_model, pose, betas, aa, scale_mm=False)
    r = np.asarray(rodrigues(aa))[0]
    wrist = np.asarray(j0[0, 0])
    wrist1 = np.asarray(j1[0, 0])
    want = (np.asarray(v0[0]) - wrist) @ r.T + wrist1
    np.testing.assert_allclose(np.asarray(v1[0]), want, atol=1e-5)


def test_center_idx_and_mm_scaling(mano_model):
    rng = np.random.default_rng(2)
    pose = jnp.asarray(rng.standard_normal((2, 15)).astype(np.float32))
    betas = jnp.zeros((2, 10))
    root = jnp.zeros((2, 3))
    _, j_mm = M.mano_forward(mano_model, pose, betas, root, center_idx=9)
    np.testing.assert_allclose(np.asarray(j_mm[:, 9]), 0.0, atol=1e-4)
    _, j_m = M.mano_forward(mano_model, pose, betas, root, center_idx=9, scale_mm=False)
    np.testing.assert_allclose(np.asarray(j_mm), np.asarray(j_m) * 1000.0, atol=1e-3)


def test_translation_applied_before_scaling(mano_model):
    t = jnp.asarray([[0.1, 0.0, 0.0]])
    _, j0 = M.mano_forward(mano_model, jnp.zeros((1, 15)), jnp.zeros((1, 10)), jnp.zeros((1, 3)))
    _, j1 = M.mano_forward(
        mano_model, jnp.zeros((1, 15)), jnp.zeros((1, 10)), jnp.zeros((1, 3)), trans=t
    )
    np.testing.assert_allclose(np.asarray(j1 - j0)[..., 0], 100.0, atol=1e-3)


def test_grads_flow_and_finite(mano_model):
    def loss(pose, betas, root):
        v, j = M.mano_forward(mano_model, pose, betas, root, scale_mm=False)
        return jnp.sum(v**2) + jnp.sum(j**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.ones((1, 15)) * 0.1, jnp.ones((1, 10)) * 0.1, jnp.ones((1, 3)) * 0.1
    )
    for gi in g:
        arr = np.asarray(gi)
        assert np.all(np.isfinite(arr))
        assert np.any(arr != 0)


def test_jit_compiles_and_matches_eager(mano_model):
    fwd = jax.jit(lambda p, b, r: M.mano_forward(mano_model, p, b, r))
    p = jnp.ones((2, 15)) * 0.2
    b = jnp.ones((2, 10)) * 0.1
    r = jnp.ones((2, 3)) * 0.3
    v_jit, j_jit = fwd(p, b, r)
    v, j = M.mano_forward(mano_model, p, b, r)
    np.testing.assert_allclose(np.asarray(v_jit), np.asarray(v), atol=1e-4)
    assert v_jit.shape == (2, 778, 3)
    assert j_jit.shape == (2, 21, 3)


def test_use_pca_false_full_axis_angle(mano_model):
    rng = np.random.default_rng(3)
    full = jnp.asarray(rng.standard_normal((1, 45)).astype(np.float32) * 0.2)
    v, j = M.mano_forward(
        mano_model, full, jnp.zeros((1, 10)), jnp.zeros((1, 3)), use_pca=False
    )
    assert v.shape == (1, 778, 3) and np.all(np.isfinite(np.asarray(v)))


def test_synthetic_model_is_deterministic():
    m1 = M.synthetic_mano_model(seed=7)
    m2 = M.synthetic_mano_model(seed=7)
    np.testing.assert_array_equal(np.asarray(m1.v_template), np.asarray(m2.v_template))
    np.testing.assert_array_equal(np.asarray(m1.faces), np.asarray(m2.faces))


def test_chumpy_free_loader_roundtrip(tmp_path):
    """Loader handles a MANO-shaped pickle (plain numpy stands in for chumpy)."""
    import pickle

    m = M.synthetic_mano_model(seed=0)
    raw = {
        "v_template": np.asarray(m.v_template),
        "shapedirs": np.asarray(m.shapedirs),
        "posedirs": np.asarray(m.posedirs),
        "J_regressor": np.asarray(m.joint_regressor),
        "weights": np.asarray(m.skin_weights),
        "hands_components": np.asarray(m.hands_components),
        "hands_mean": np.asarray(m.hands_mean),
        "f": np.asarray(m.faces, dtype=np.uint32),
    }
    path = tmp_path / "MANO_RIGHT.pkl"
    with open(path, "wb") as f:
        pickle.dump(raw, f)
    loaded = M.load_mano_model(str(path))
    np.testing.assert_allclose(
        np.asarray(loaded.v_template), np.asarray(m.v_template), atol=1e-6
    )
    assert loaded.faces.dtype == jnp.int32


def test_left_hand_is_mirrored_right(mano_model):
    """Oracle: forward on the mirrored (left) model with mirrored inputs
    equals the x-flipped right-hand forward (manopth ManoLayer side parity:
    left-ness lives entirely in the assets, the forward math is shared)."""
    left = M.mirror_mano_model(mano_model)
    assert left.side == "left"

    rng = np.random.default_rng(11)
    b = 3
    pose = jnp.asarray(rng.standard_normal((b, 45)) * 0.3, jnp.float32)
    betas = jnp.asarray(rng.standard_normal((b, 10)) * 0.5, jnp.float32)
    rot = jnp.asarray(rng.standard_normal((b, 3)) * 0.8, jnp.float32)
    trans = jnp.asarray(rng.standard_normal((b, 3)) * 0.1, jnp.float32)

    mirror_xyz = jnp.asarray([-1.0, 1.0, 1.0])
    aa_flip = jnp.asarray([1.0, -1.0, -1.0])

    v_r, j_r = M.mano_forward(
        mano_model, pose, betas, rot, trans=trans, use_pca=False
    )
    v_l, j_l = M.mano_forward(
        left,
        (pose.reshape(b, 15, 3) * aa_flip[None, None]).reshape(b, 45),
        betas,
        rot * aa_flip[None],
        trans=trans * mirror_xyz[None],
        use_pca=False,
    )
    np.testing.assert_allclose(v_l, v_r * mirror_xyz, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(j_l, j_r * mirror_xyz, rtol=1e-4, atol=1e-3)
    # PCA decode mirrors consistently too: same coefficients map to the
    # mirrored full pose, so the PCA path also satisfies the oracle.
    v_rp, _ = M.mano_forward(mano_model, pose[:, :15], betas, rot, use_pca=True)
    v_lp, _ = M.mano_forward(
        left, pose[:, :15], betas, rot * aa_flip[None], use_pca=True
    )
    np.testing.assert_allclose(v_lp, v_rp * mirror_xyz, rtol=1e-4, atol=1e-3)


def test_mirror_is_involution(mano_model):
    back = M.mirror_mano_model(M.mirror_mano_model(mano_model))
    np.testing.assert_allclose(back.v_template, mano_model.v_template, atol=1e-7)
    np.testing.assert_allclose(back.posedirs, mano_model.posedirs, atol=1e-7)
    np.testing.assert_allclose(
        back.hands_components, mano_model.hands_components, atol=1e-7
    )
    np.testing.assert_array_equal(back.faces, mano_model.faces)
    assert back.side == "right"
