"""Backface culling (raster.face_valid) + mesh orientation utilities.

The culling contract (SURVEY.md §3.5 — the reference's NMR renders with
backface culling on closed meshes; our soft formulation treats culled
faces as absent): for watertight outward-wound meshes the render keeps its
attribute accuracy and silhouette support while roughly half the faces go
inert — which the Pallas kernels turn into halved chunk work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hocon.data.meshes import decimate_mesh, orient_faces_outward
from hocon.data.synthetic import _BOX_FACES, _BOX_VERTS, uv_sphere
from hocon.geometry.project import persp_project
from hocon.render import raster as R


def _sphere_scene(n_faces=500, rad=0.08, center=(0.0, 0.0, 0.6), res=128):
    sv, sf = uv_sphere(n_faces)
    c = np.asarray(center, np.float32)
    v = (sv * rad + c).astype(np.float32)
    foc = 120.0
    k = jnp.asarray([[foc, 0, res / 2], [0, foc, res / 2], [0, 0, 1.0]])
    vp = persp_project(jnp.asarray(v)[None], k[None])
    return v, sf, vp, jnp.asarray(v)[None, :, 2], k, res


def test_face_valid_convention_matches_3d_facing():
    """front face (outward normal toward camera) <=> det2d < 0 (y-down);
    near-tangent backfaces inside the margin band stay kept."""
    v, sf, vp, _, _, _ = _sphere_scene()
    tri = v[sf]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cent = tri.mean(1)
    frontal = (n * cent).sum(-1) < 0  # camera at the origin
    fv = R.gather_faces(vp, jnp.asarray(sf))
    det = np.asarray(R.face_det2d(fv))[0]
    kept = np.asarray(R.face_valid(fv, backface_cull=True))[0]
    margin = R.BACKFACE_MARGIN_FRAC * np.abs(det).mean()
    # Every frontal face is kept; every face backfacing beyond the margin
    # is culled.
    assert kept[frontal & (np.abs(det) > 1.0)].all()
    assert not kept[det > margin].any()
    # And a solid chunk of the convex solid's faces goes inert.
    assert 0.25 < (~kept).mean() < 0.65


def test_cull_preserves_attr_accuracy_and_support():
    """vs the analytic sphere: attr error must not degrade, silhouette
    support must be preserved (interior sil drops to the soft face-union
    level, but the >0.5 support region stays put)."""
    v, sf, vp, vz, k, res = _sphere_scene()
    attrs = jnp.asarray(v)[None]  # attr = 3D position; GT = ray-sphere hit
    outs = {}
    for cull in (False, True):
        outs[cull] = R.soft_rasterize(
            vp, vz, jnp.asarray(sf), attrs=attrs, image_size=(res, res),
            backend="xla", backface_cull=cull,
        )
    ys, xs = np.mgrid[0:res, 0:res]
    d = np.stack(
        [(xs + 0.5 - res / 2) / 120.0, (ys + 0.5 - res / 2) / 120.0,
         np.ones_like(xs, np.float64)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.array([0.0, 0.0, 0.6])
    bq = -(d * c).sum(-1)
    disc = bq * bq - ((c * c).sum() - 0.08**2)
    hit = disc > 0
    t = -bq - np.sqrt(np.maximum(disc, 0))
    gt = t[..., None] * d

    med = {}
    for cull, out in outs.items():
        sil = np.asarray(out.sil)[0]
        err = np.linalg.norm(np.asarray(out.attr)[0] - gt, axis=-1)
        m = hit & (sil > 0.5)
        med[cull] = np.median(err[m])
    assert med[True] <= med[False] * 1.5 + 1e-4

    sa = np.asarray(outs[False].sil)[0] > 0.5
    sb = np.asarray(outs[True].sil)[0] > 0.5
    iou = (sa & sb).sum() / max((sa | sb).sum(), 1)
    # The soft rim thins by ~1px (the second surface layer no longer backs
    # up boundary coverage) — support shifts slightly but the interior is
    # fully preserved: everywhere the unculled sil is confident, the culled
    # one still passes threshold.
    assert iou > 0.94
    sa_high = np.asarray(outs[False].sil)[0] > 0.9
    assert (sb | ~sa_high).all()


def test_cull_pallas_matches_xla():
    v, sf, vp, vz, _, res = _sphere_scene(n_faces=240, res=64)
    attrs = jnp.asarray(v)[None] * 10.0

    def render(backend):
        return R.soft_rasterize(
            vp, vz, jnp.asarray(sf), attrs=attrs, image_size=(res, res),
            backend=backend, backface_cull=True,
        )

    out_x, out_p = render("xla"), render("pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.sil), np.asarray(out_x.sil), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_p.attr), np.asarray(out_x.attr), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_p.depth), np.asarray(out_x.depth), atol=2e-4)

    def loss(backend, vp_, a_):
        out = R.soft_rasterize(
            vp_, vz, jnp.asarray(sf), attrs=a_, image_size=(res, res),
            backend=backend, backface_cull=True,
        )
        return (jnp.sum(out.sil**2) + jnp.sum(out.attr**2)
                + jnp.sum((1.0 - out.depth) ** 2))

    gx = jax.grad(lambda a, b: loss("xla", a, b), argnums=(0, 1))(vp, attrs)
    gp = jax.grad(lambda a, b: loss("pallas", a, b), argnums=(0, 1))(vp, attrs)
    for x, p in zip(gx, gp):
        x, p = np.asarray(x).ravel(), np.asarray(p).ravel()
        cos = (x @ p) / max(np.linalg.norm(x) * np.linalg.norm(p), 1e-9)
        assert cos > 0.9999
        np.testing.assert_allclose(p, x, atol=5e-2, rtol=5e-3)


def test_cull_zero_grad_for_backfaces():
    """Vertex gradients of a deep-interior pixel's attr must not reference
    culled faces: perturbing a pure-backface vertex changes nothing."""
    v, sf, vp, vz, _, res = _sphere_scene(n_faces=240, res=64)
    attrs = jnp.asarray(v)[None]
    fv = R.gather_faces(vp, jnp.asarray(sf))
    det = np.asarray(R.face_det2d(fv))[0]
    margin = R.BACKFACE_MARGIN_FRAC * np.abs(det).mean()
    culled = det > margin
    only_back = np.setdiff1d(
        np.unique(sf[culled]), np.unique(sf[~culled]))
    if len(only_back) == 0:
        pytest.skip("sphere tessellation has no pure-culled vertex")

    def sil_sum(vp_):
        out = R.soft_rasterize(
            vp_, vz, jnp.asarray(sf), attrs=attrs, image_size=(res, res),
            backend="xla", backface_cull=True,
        )
        return jnp.sum(out.sil) + jnp.sum(out.attr)

    g = np.asarray(jax.grad(sil_sum)(vp))[0]
    assert np.abs(g[only_back]).max() == 0.0


def test_orient_faces_outward_box_identity():
    f2 = orient_faces_outward(_BOX_VERTS, _BOX_FACES)
    assert np.array_equal(f2, _BOX_FACES)


def _outward_frac(v, f):
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cent = tri.mean(1) - v.mean(0)
    return ((n * cent).sum(-1) > 0).mean()


def test_orient_faces_outward_fixes_random_flips():
    sv, sf = uv_sphere(800)
    rng = np.random.default_rng(0)
    flip = rng.uniform(size=len(sf)) < 0.4
    bad = sf.copy()
    bad[flip] = bad[flip][:, ::-1]
    fixed = orient_faces_outward(sv, bad)
    assert _outward_frac(sv, fixed) == 1.0


def test_orient_faces_outward_global_flip():
    fixed = orient_faces_outward(_BOX_VERTS, _BOX_FACES[:, ::-1])
    assert _outward_frac(_BOX_VERTS, fixed) == 1.0


def test_orient_faces_outward_multi_component():
    """Two disjoint boxes, one inverted + partially scrambled."""
    v2 = np.concatenate([_BOX_VERTS, _BOX_VERTS + np.float32([3, 0, 0])])
    fb = _BOX_FACES[:, ::-1].copy()
    fb[::3] = fb[::3][:, ::-1]
    f2 = np.concatenate([_BOX_FACES, fb + 8])
    fixed = orient_faces_outward(v2, f2)
    tri = v2[fixed]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centers = np.where(np.arange(len(fixed))[:, None] < 12,
                       np.float32([0, 0, 0]), np.float32([3, 0, 0]))
    cent = tri.mean(1) - centers
    assert ((n * cent).sum(-1) > 0).all()


def test_uv_sphere_fully_outward():
    for n in (60, 320, 1280):
        sv, sf = uv_sphere(n)
        assert _outward_frac(sv, sf) == 1.0, n


def test_decimate_mesh_orients_output():
    sv, sf = uv_sphere(4000)
    bad = sf.copy()
    bad[::5] = bad[::5][:, ::-1]  # scramble some windings pre-decimation
    dv, df = decimate_mesh(sv, bad, target_faces=600)
    assert len(df) <= 600
    assert _outward_frac(dv, df) > 0.99


def test_orient_faces_outward_open_patch_keeps_authored_winding():
    """OPEN components have no signed-volume 'outward': a coherent patch
    offset from the origin must keep its dataset-authored orientation
    (origin-dependent signed volume used to flip it wholesale, after which
    backface culling silently erased it from the warp render)."""
    verts = np.array(
        [[0, 0, -5], [1, 0, -5], [0, 1, -5], [1, 1, -5]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)  # normals +z
    assert np.array_equal(orient_faces_outward(verts, faces), faces)

    # A minority incoherent face is fixed toward the majority's winding.
    scrambled = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    out = orient_faces_outward(verts, scrambled)
    tri = verts[out]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (n[:, 2] > 0).all()

    # Closed components still get the exact signed-volume flip even when
    # offset far from the origin.
    v_off = _BOX_VERTS + np.float32([50, -30, 7])
    fixed = orient_faces_outward(v_off, _BOX_FACES[:, ::-1])
    assert _outward_frac(v_off, fixed) == 1.0
