"""Shape-renderer tests: rasterizer vs a per-pixel numpy oracle, normals
vs a live-torch oracle of the reference accumulation, and the full
`render_shape` / `shape_visualization` surface.

Reference semantics: `libs/DECA/decalib/utils/renderer.py:28-79,225-294`
(pytorch3d settings: blur 0, faces_per_pixel 1, no perspective
correction) and `decalib/utils/util.py:173-224`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.models.deca.render import (
    add_directionlight, default_lights, face_vertices, rasterize,
    render_shape, shape_visualization, vertex_normals)


def oracle_rasterize(verts, faces, attributes, size):
    """Per-pixel python rasterizer: nearest face whose affine barycentric
    coordinates are all >= 0 wins; attributes interpolate with the same
    weights; uncovered pixels are zero."""
    batch = verts.shape[0]
    depth = attributes.shape[-1]
    out = np.zeros((batch, size, size, depth), np.float32)
    cover = np.zeros((batch, size, size), np.float32)
    coords = (2.0 * (np.arange(size) + 0.5) / size) - 1.0
    for b in range(batch):
        for r in range(size):
            for c in range(size):
                x, y = coords[c], coords[r]
                best_z = np.inf
                for f in range(faces.shape[0]):
                    v = verts[b, faces[f]]
                    area = ((v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1])
                            - (v[2, 0] - v[0, 0]) * (v[1, 1] - v[0, 1]))
                    if abs(area) <= 1e-12:
                        continue
                    w0 = ((v[1, 0] - x) * (v[2, 1] - y)
                          - (v[2, 0] - x) * (v[1, 1] - y)) / area
                    w1 = ((v[2, 0] - x) * (v[0, 1] - y)
                          - (v[0, 0] - x) * (v[2, 1] - y)) / area
                    w2 = ((v[0, 0] - x) * (v[1, 1] - y)
                          - (v[1, 0] - x) * (v[0, 1] - y)) / area
                    if w0 < 0 or w1 < 0 or w2 < 0:
                        continue
                    z = w0 * v[0, 2] + w1 * v[1, 2] + w2 * v[2, 2]
                    if z < best_z:
                        best_z = z
                        bary = np.array([w0, w1, w2], np.float32)
                        out[b, r, c] = bary @ attributes[b, f]
                        cover[b, r, c] = 1.0
    return out, cover


def test_rasterize_matches_oracle():
    rng = np.random.RandomState(0)
    size = 24
    n_verts, n_faces, batch = 12, 8, 2
    verts = rng.uniform(-1.2, 1.2, (batch, n_verts, 3)).astype(np.float32)
    verts[..., 2] = rng.uniform(1.0, 3.0, (batch, n_verts))
    # unique vertex-sets only: duplicate triangles in different vertex
    # order create exact z-ties whose winner is rounding-order dependent
    # (arbitrary in pytorch3d as well)
    seen, faces = set(), []
    while len(faces) < n_faces:
        f = rng.randint(0, n_verts, 3)
        key = frozenset(f.tolist())
        if len(key) == 3 and key not in seen:
            seen.add(key)
            faces.append(f)
    faces = np.asarray(faces, np.int32)
    attrs = rng.randn(batch, n_faces, 3, 5).astype(np.float32)

    want, want_cover = oracle_rasterize(verts, faces, attrs, size)
    got, got_cover = rasterize(jnp.asarray(verts), jnp.asarray(faces),
                               jnp.asarray(attrs), image_size=size, chunk=3)
    np.testing.assert_array_equal(np.asarray(got_cover), want_cover)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rasterize_zbuffer_nearer_face_wins():
    # two full-screen-ish triangles; the one at z=1 must occlude z=2
    verts = np.array([[[-3, -3, 2], [3, -3, 2], [0, 4, 2],
                       [-3, -3, 1], [3, -3, 1], [0, 4, 1]]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    attrs = np.zeros((1, 2, 3, 1), np.float32)
    attrs[0, 0] = 7.0  # far triangle carries 7
    attrs[0, 1] = 3.0  # near triangle carries 3
    out, cover = rasterize(jnp.asarray(verts), jnp.asarray(faces),
                           jnp.asarray(attrs), image_size=8)
    assert np.asarray(cover).min() == 1.0  # both triangles cover the frame
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_rasterize_winding_invariant():
    # pytorch3d divides by the signed area: either winding rasterizes
    verts = np.array([[[-4, -4, 1], [4, -4, 1], [0, 6, 1]]], np.float32)
    attrs = np.ones((1, 1, 3, 1), np.float32)
    fwd = np.array([[0, 1, 2]], np.int32)
    rev = np.array([[0, 2, 1]], np.int32)
    _, cover_f = rasterize(jnp.asarray(verts), jnp.asarray(fwd),
                           jnp.asarray(attrs), image_size=8)
    _, cover_r = rasterize(jnp.asarray(verts), jnp.asarray(rev),
                           jnp.asarray(attrs), image_size=8)
    np.testing.assert_array_equal(np.asarray(cover_f), np.asarray(cover_r))
    assert np.asarray(cover_f).min() == 1.0


def test_vertex_normals_matches_reference_math():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    batch, n_verts, n_faces = 2, 10, 14
    verts = rng.randn(batch, n_verts, 3).astype(np.float32)
    faces = rng.randint(0, n_verts, (n_faces, 3)).astype(np.int64)

    # reference accumulation (`decalib/utils/util.py:193-224`)
    tv = torch.from_numpy(verts)
    tf = torch.from_numpy(np.broadcast_to(faces, (batch, n_faces, 3)).copy())
    normals = torch.zeros(batch * n_verts, 3)
    tf_off = tf + (torch.arange(batch, dtype=torch.int64) * n_verts)[:, None, None]
    vf = tv.reshape(batch * n_verts, 3)[tf_off.reshape(-1, 3)]
    flat = tf_off.reshape(-1, 3)
    normals.index_add_(0, flat[:, 1], torch.linalg.cross(vf[:, 2] - vf[:, 1], vf[:, 0] - vf[:, 1]))
    normals.index_add_(0, flat[:, 2], torch.linalg.cross(vf[:, 0] - vf[:, 2], vf[:, 1] - vf[:, 2]))
    normals.index_add_(0, flat[:, 0], torch.linalg.cross(vf[:, 1] - vf[:, 0], vf[:, 2] - vf[:, 0]))
    want = F.normalize(normals, eps=1e-6, dim=1).reshape(batch, n_verts, 3).numpy()

    got = np.asarray(vertex_normals(jnp.asarray(verts),
                                    jnp.asarray(faces.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_face_vertices_gather():
    verts = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    faces = jnp.asarray([[0, 2, 4], [1, 3, 5]], jnp.int32)
    out = face_vertices(verts, faces)
    assert out.shape == (2, 2, 3, 3)
    np.testing.assert_array_equal(np.asarray(out[1, 0, 2]),
                                  np.asarray(verts[1, 4]))


def test_add_directionlight_formula():
    # one light straight down +z with intensity 1.7 on a +z normal:
    # shading = clamp(1, 0, 1) * 1.7, averaged over the 5 default lights
    normals = jnp.asarray([[[0.0, 0.0, 1.0]]])
    lights = default_lights(1)
    out = np.asarray(add_directionlight(normals, lights))[0, 0]
    # manual: mean over lights of clamp(n·normalize(pos),0,1)*1.7
    pos = np.array([[-1, 1, 1], [1, 1, 1], [-1, -1, 1], [1, -1, 1],
                    [0, 0, 1]], np.float32)
    dirs = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    want = (np.clip(dirs[:, 2], 0, 1) * 1.7).mean()
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_render_shape_sphere():
    """A z>0-facing hemisphere-ish mesh renders: lit gray inside coverage,
    zero background, composite blends with images."""
    # icosphere-lite: a fan of triangles over a coarse UV sphere front half
    n_u, n_v = 12, 6
    us = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    vs = np.linspace(0.15 * np.pi, 0.85 * np.pi, n_v)
    pts = np.array([[np.cos(u) * np.sin(v) * 0.7, np.cos(v) * 0.7,
                     -np.sin(u) * np.sin(v) * 0.7]
                    for v in vs for u in us], np.float32)
    faces = []
    for i in range(n_v - 1):
        for j in range(n_u):
            a = i * n_u + j
            b = i * n_u + (j + 1) % n_u
            c = (i + 1) * n_u + j
            d = (i + 1) * n_u + (j + 1) % n_u
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)

    # outward-orient the winding (sphere centered at origin: outward
    # vertex normal ≈ vertex direction)
    nrm = np.asarray(vertex_normals(jnp.asarray(pts)[None],
                                    jnp.asarray(faces)))[0]
    if (nrm * pts).sum() < 0:
        faces = faces[:, ::-1].copy()

    # reference frame: world camera-facing side is +z; transformed frame
    # negates y and z (`decalib/deca.py:175`)
    verts = jnp.asarray(pts)[None]
    tverts = verts * jnp.asarray([1.0, -1.0, -1.0])
    size = 32
    img = render_shape(verts, tverts, jnp.asarray(faces), image_size=size)
    img = np.asarray(img)
    assert img.shape == (1, size, size, 3)
    assert np.isfinite(img).all()
    # corners are background (sphere of radius .7 doesn't reach them)
    np.testing.assert_array_equal(img[0, 0, 0], 0.0)
    # center is covered and lit
    assert img[0, size // 2, size // 2].min() > 0.05
    # gray albedo: all three channels equal
    np.testing.assert_allclose(img[..., 0], img[..., 1], atol=1e-6)

    # composite over a white background: background stays white
    bg = jnp.ones((1, size, size, 3))
    over = np.asarray(render_shape(verts, tverts, jnp.asarray(faces),
                                   images=bg, image_size=size))
    np.testing.assert_array_equal(over[0, 0, 0], 1.0)
    # covered pixels unchanged vs the black-background render
    mask = img[0].sum(-1) > 0
    np.testing.assert_allclose(over[0][mask], img[0][mask], atol=1e-6)


def test_shape_visualization_flame():
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        synthetic_flame_params)

    key = jax.random.PRNGKey(0)
    flame = synthetic_flame_params(key)
    params = {"flame": flame}
    batch = 2
    codedict = {
        "shape": jnp.zeros((batch, 100)),
        "exp": jnp.zeros((batch, 50)),
        "pose": jnp.zeros((batch, 6)),
        "cam": jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]]), (batch, 1)),
    }
    size = 48
    images = jnp.full((batch, size, size, 3), 0.25)
    out = shape_visualization(params, codedict, images=images,
                              image_size=size)
    out = np.asarray(out)
    assert out.shape == (batch, size, size, 3)
    assert np.isfinite(out).all()
    # jittable
    jitted = jax.jit(lambda c: shape_visualization(params, c, images=images,
                                                   image_size=size))
    out2 = np.asarray(jitted(codedict))
    np.testing.assert_allclose(out2, out, atol=1e-5)
