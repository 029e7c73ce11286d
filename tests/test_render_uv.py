"""UV-space texture/detail rendering tests.

Oracles: the reference's own pure-torch lighting/topology functions
(`libs/DECA/decalib/utils/renderer.py::SRenderY.{add_SHlight,add_pointlight}`,
`decalib/utils/util.py::generate_triangles`) AST-extracted and executed
live; torch `grid_sample` for the albedo lookup; analytic single-triangle
scenes for the rasterized paths; and the full `decode_deca` surface
(`decalib/deca.py:160-227`) driven structurally on synthetic topology.
"""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stylegan_directions_face_reenactment_tpu.models.deca.render import (
    SH_CONSTANT_FACTOR, add_shlight, add_pointlight, decode_deca,
    displacement2normal, displacement2vertex, generate_triangles,
    load_obj_uv, load_render_assets, process_uvcoords, rasterize,
    render_shape, render_textured, synthetic_render_assets, vertex_normals,
    visofp, world2uv)


def _ref_constant_factor():
    pi = np.pi
    return torch.tensor([
        1 / np.sqrt(4 * pi), ((2 * pi) / 3) * (np.sqrt(3 / (4 * pi))),
        ((2 * pi) / 3) * (np.sqrt(3 / (4 * pi))),
        ((2 * pi) / 3) * (np.sqrt(3 / (4 * pi))),
        (pi / 4) * 3 * (np.sqrt(5 / (12 * pi))),
        (pi / 4) * 3 * (np.sqrt(5 / (12 * pi))),
        (pi / 4) * 3 * (np.sqrt(5 / (12 * pi))),
        (pi / 4) * (3 / 2) * (np.sqrt(5 / (12 * pi))),
        (pi / 4) * (1 / 2) * (np.sqrt(5 / (4 * pi)))]).float()


def test_sh_constant_factor_matches_reference():
    np.testing.assert_allclose(np.asarray(SH_CONSTANT_FACTOR),
                               _ref_constant_factor().numpy(), rtol=1e-7)


def test_add_shlight_matches_live_reference():
    from ref_loader import extract_ref_function
    ref = extract_ref_function("libs/DECA/decalib/utils/renderer.py",
                               "add_SHlight", class_name="SRenderY")
    rng = np.random.RandomState(0)
    normals = rng.randn(2, 9, 7, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    sh = rng.randn(2, 9, 3).astype(np.float32)

    self_ns = SimpleNamespace(constant_factor=_ref_constant_factor())
    want = ref(self_ns, torch.from_numpy(normals.transpose(0, 3, 1, 2)),
               torch.from_numpy(sh)).numpy().transpose(0, 2, 3, 1)
    got = add_shlight(jnp.asarray(normals), jnp.asarray(sh))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_add_pointlight_matches_live_reference():
    import torch.nn.functional as F
    from ref_loader import extract_ref_function
    ref = extract_ref_function("libs/DECA/decalib/utils/renderer.py",
                               "add_pointlight", class_name="SRenderY",
                               namespace={"F": F})
    rng = np.random.RandomState(1)
    verts = rng.randn(2, 11, 3).astype(np.float32)
    normals = rng.randn(2, 11, 3).astype(np.float32)
    lights = rng.randn(2, 4, 6).astype(np.float32)
    want = ref(SimpleNamespace(), torch.from_numpy(verts),
               torch.from_numpy(normals), torch.from_numpy(lights)).numpy()
    got = add_pointlight(jnp.asarray(verts), jnp.asarray(normals),
                         jnp.asarray(lights))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_generate_triangles_matches_live_reference():
    from ref_loader import extract_ref_function
    ref = extract_ref_function("libs/DECA/decalib/utils/util.py",
                               "generate_triangles", namespace={"np": np})
    for h, w in ((16, 16), (12, 20)):
        np.testing.assert_array_equal(generate_triangles(h, w), ref(h, w))


def test_process_uvcoords():
    uv = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.25, 0.75]])
    out = np.asarray(process_uvcoords(uv))
    np.testing.assert_allclose(out[:, 2], 1.0)
    np.testing.assert_allclose(out[0], [-1.0, 1.0, 1.0])   # y negated
    np.testing.assert_allclose(out[1], [1.0, -1.0, 1.0])
    np.testing.assert_allclose(out[2], [-0.5, -0.5, 1.0])


def _fullscreen_quad():
    """Two triangles covering the whole screen AND the whole uv square."""
    verts = np.array([[[-2, -2, 1], [2, -2, 1], [-2, 2, 1], [2, 2, 1]]],
                     np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    uvcoords = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    uvfaces = faces.copy()
    return verts, faces, uvcoords, uvfaces


def test_render_textured_albedo_sampling_matches_torch_grid_sample():
    """Textured quad, no lights: images == albedo_images == grid_sample of
    the texture at the rasterized uv grid (torch oracle)."""
    import torch.nn.functional as F
    verts, faces, uvcoords, uvfaces = _fullscreen_quad()
    rng = np.random.RandomState(2)
    tex = rng.rand(1, 16, 16, 3).astype(np.float32)
    ops = render_textured(jnp.asarray(verts), jnp.asarray(verts),
                          jnp.asarray(faces), jnp.asarray(tex),
                          jnp.asarray(uvcoords), jnp.asarray(uvfaces),
                          lights=None, image_size=12)
    assert np.asarray(ops["alpha_images"]).min() == 1.0  # full coverage
    grid = torch.from_numpy(np.asarray(ops["grid"]))
    want = F.grid_sample(torch.from_numpy(tex.transpose(0, 3, 1, 2)), grid,
                         mode="bilinear", align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ops["images"]), want,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ops["albedo_images"]), want,
                               rtol=1e-5, atol=1e-5)
    # no lights → zero shading images (`renderer.py:176-177`)
    np.testing.assert_allclose(np.asarray(ops["shading_images"]), 0.0)


def test_render_textured_sh_and_point_shading():
    """images == albedo * shading for both light parameterizations, with
    the shading computed by the (live-parity-tested) lighting functions
    on the rasterized normal/vertex maps. The DECA convention: world
    normals face +z (toward the lights), the projection negates y/z so
    TRANSFORMED normals face -z (the pos_mask visibility test)."""
    verts, faces, uvcoords, uvfaces = _fullscreen_quad()
    tverts = verts * np.array([1, -1, -1], np.float32)  # `deca.py:175`
    tex = np.full((1, 8, 8, 3), 0.5, np.float32)
    rng = np.random.RandomState(3)

    sh = rng.randn(1, 9, 3).astype(np.float32)
    ops = render_textured(jnp.asarray(verts), jnp.asarray(tverts),
                          jnp.asarray(faces), jnp.asarray(tex),
                          jnp.asarray(uvcoords), jnp.asarray(uvfaces),
                          lights=jnp.asarray(sh), image_size=8)
    want = np.asarray(ops["albedo_images"]) * np.asarray(
        add_shlight(ops["normal_images"], jnp.asarray(sh)))
    np.testing.assert_allclose(np.asarray(ops["images"]), want,
                               rtol=1e-5, atol=1e-6)
    # flat quad: world normals all (0, 0, +1)
    np.testing.assert_allclose(np.asarray(ops["normal_images"])[..., 2],
                               1.0, atol=1e-6)
    # pos_mask: TRANSFORMED normal z = -1 < -0.05 → visible everywhere
    np.testing.assert_allclose(np.asarray(ops["pos_mask"]), 1.0)

    pt = rng.randn(1, 3, 6).astype(np.float32)
    ops = render_textured(jnp.asarray(verts), jnp.asarray(tverts),
                          jnp.asarray(faces), jnp.asarray(tex),
                          jnp.asarray(uvcoords), jnp.asarray(uvfaces),
                          lights=jnp.asarray(pt), light_type="point",
                          image_size=8)
    assert np.isfinite(np.asarray(ops["images"])).all()
    assert np.abs(np.asarray(ops["images"])).max() > 0.0


def test_world2uv_interpolates_world_positions():
    """Full-UV quad: texel (r, c) must read the bilinear point of the
    world-space quad at that uv location (barycentric interpolation of a
    bilinear corner layout is exact)."""
    verts, faces, uvcoords, uvfaces = _fullscreen_quad()
    world = np.array([[[0, 0, 0], [10, 0, 2], [0, 6, 4], [10, 6, 6]]],
                     np.float32)
    uv_size = 16
    out = np.asarray(world2uv(jnp.asarray(world), jnp.asarray(faces),
                              jnp.asarray(uvcoords), jnp.asarray(uvfaces),
                              uv_size=uv_size))
    # uv pixel centers: col c ↔ u = (c+.5)/S; `process_uvcoords` negates
    # the v axis, so v=0 lands on the BOTTOM row: row r ↔ v = 1-(r+.5)/S
    # (same orientation as the reference's uv rasterizer feeding the
    # y-negated uvcoords into pytorch3d)
    for (r, c) in ((2, 3), (8, 12), (13, 5)):
        u = (c + 0.5) / uv_size
        v = 1.0 - (r + 0.5) / uv_size
        want = np.array([10 * u, 6 * v, 0]) + np.array(
            [0, 0, 2 * u + 4 * v])
        np.testing.assert_allclose(out[0, r, c], want, rtol=1e-4, atol=1e-4)


def test_displacement2normal_composition():
    """Zero displacement + zero fixed offset → normals of the world2uv
    surface itself; and the function composes exactly world2uv +
    vertex_normals on the dense grid."""
    verts, faces, uvcoords, uvfaces = _fullscreen_quad()
    world = np.array([[[0, 0, 0], [4, 0, 0], [0, 4, 0], [4, 4, 0]]],
                     np.float32)
    uv_size = 16
    key = jax.random.PRNGKey(0)
    assets = {
        "uvcoords": jnp.asarray(uvcoords), "uvfaces": jnp.asarray(uvfaces),
        "uv_face_eye_mask": jnp.ones((uv_size, uv_size, 1), jnp.float32),
        "fixed_uv_dis": jnp.zeros((uv_size, uv_size), jnp.float32),
        "dense_faces": jnp.asarray(generate_triangles(uv_size, uv_size)),
    }
    normals = jnp.tile(jnp.asarray([[[0.0, 0.0, -1.0]]]), (1, 4, 1))
    uv_z = jax.random.normal(key, (1, uv_size, uv_size, 1)) * 0.1

    got = displacement2normal(uv_z, jnp.asarray(world), normals,
                              jnp.asarray(faces), assets)
    uv_cv = world2uv(jnp.asarray(world), jnp.asarray(faces),
                     assets["uvcoords"], assets["uvfaces"], uv_size)
    uv_cn = world2uv(normals, jnp.asarray(faces), assets["uvcoords"],
                     assets["uvfaces"], uv_size)
    dense = (uv_cv + uv_z * uv_cn).reshape(1, -1, 3)
    want = vertex_normals(dense, assets["dense_faces"]).reshape(
        1, uv_size, uv_size, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    dv, df = displacement2vertex(uv_z, jnp.asarray(world), normals,
                                 jnp.asarray(faces), assets)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dense),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(df),
                                  np.asarray(assets["dense_faces"]))


def test_visofp_thresholds_landmark_normals():
    from stylegan_directions_face_reenactment_tpu.models.deca.flame import (
        synthetic_flame_params, vertices2landmarks)
    fl = synthetic_flame_params(jax.random.PRNGKey(4), n_verts=32,
                                n_faces=40)
    normals = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 3))
    got = visofp(normals, fl)
    n68 = vertices2landmarks(normals, fl["faces"],
                             fl["full_lmk_faces_idx"],
                             fl["full_lmk_bary_coords"])
    want = (np.asarray(n68)[:, :, 2:] < 0.1).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert got.shape == (2, 68, 1)


def test_render_shape_detail_normals_override():
    """render_shape(detail_normal_images=...) shades with the supplied
    normals (`renderer.py:281-282`) instead of the rasterized ones."""
    verts, faces, _, _ = _fullscreen_quad()
    tverts = verts * np.array([1, -1, -1], np.float32)
    detail = jnp.tile(jnp.asarray([[[[0.0, 0.0, 1.0]]]]), (1, 8, 8, 1))
    base = render_shape(jnp.asarray(verts), jnp.asarray(tverts),
                        jnp.asarray(faces), image_size=8)
    overridden = render_shape(jnp.asarray(verts), jnp.asarray(tverts),
                              jnp.asarray(faces), detail_normal_images=detail,
                              image_size=8)
    # the quad's own world normals are already (0,0,+1): override agrees
    np.testing.assert_allclose(np.asarray(overridden), np.asarray(base),
                               atol=1e-5)
    flipped = render_shape(jnp.asarray(verts), jnp.asarray(tverts),
                           jnp.asarray(faces), detail_normal_images=-detail,
                           image_size=8)
    # flipped normals face away from every light (clamped dot) → black
    np.testing.assert_allclose(np.asarray(flipped), 0.0, atol=1e-6)
    assert np.asarray(base).max() > 0.1


def test_load_obj_uv(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("# comment\n"
                 "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "vt 0.1 0.2\nvt 0.9 0.2\nvt 0.5 0.8\n"
                 "f 1/1/1 2/2/1 3/3/1\n")
    uvcoords, uvfaces = load_obj_uv(str(p))
    np.testing.assert_allclose(uvcoords,
                               [[0.1, 0.2], [0.9, 0.2], [0.5, 0.8]])
    np.testing.assert_array_equal(uvfaces, [[0, 1, 2]])

    assets = load_render_assets(str(p), uv_size=8)
    assert assets["uv_face_eye_mask"].shape == (8, 8, 1)
    assert assets["fixed_uv_dis"].shape == (8, 8)
    assert assets["dense_faces"].ndim == 2

    # quad faces fan-triangulate like pytorch3d's load_obj
    q = tmp_path / "quad.obj"
    q.write_text("vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
                 "f 1/1 2/2 3/3 4/4\n")
    _, qf = load_obj_uv(str(q))
    np.testing.assert_array_equal(qf, [[0, 1, 2], [0, 2, 3]])

    # faces without vt indices are an error, not silently empty topology
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    with pytest.raises(ValueError, match="vt"):
        load_obj_uv(str(bad))


@pytest.mark.slow
def test_decode_deca_structure():
    """Full `decode_deca` surface (`decalib/deca.py:160-227`) on synthetic
    FLAME + synthetic UV topology: every reference opdict/visdict key,
    finite outputs, correct shapes; uv_texture_gt composition math."""
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
        deca_encode)

    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 4)
    n_faces = 64
    fl = synthetic_flame_params(ks[0], n_verts=48, n_faces=n_faces)
    params = init_deca(ks[1], fl, with_detail=True)
    uv_size = 256  # fixed by the detail decoder architecture (8·2^5)
    assets = synthetic_render_assets(ks[2], n_faces, uv_size=uv_size)

    size = 32
    images = jax.random.uniform(ks[3], (2, size, size, 3))
    code = deca_encode(params, images, with_detail=True)
    code["images"] = images

    opdict, visdict = decode_deca(params, code, assets, image_size=size,
                                  uv_size=uv_size)
    for k in ("vertices", "normals", "transformed_vertices", "landmarks2d",
              "landmarks3d", "uv_detail_normals", "uv_texture_gt",
              "displacement_map"):
        assert k in opdict, k
        assert np.isfinite(np.asarray(opdict[k])).all(), k
    assert opdict["landmarks2d"].shape == (2, 68, 2)
    assert opdict["landmarks3d"].shape == (2, 68, 4)  # +visibility column
    assert opdict["uv_detail_normals"].shape == (2, uv_size, uv_size, 3)
    assert opdict["uv_texture_gt"].shape == (2, uv_size, uv_size, 3)
    for k in ("inputs", "landmarks2d", "landmarks3d", "shape_images",
              "shape_detail_images"):
        assert k in visdict, k
        assert visdict[k].shape[0] == 2
    assert visdict["shape_images"].shape == (2, size, size, 3)
    # the reference's in-place z += 10 mutations accumulate: the returned
    # transformed_vertices carry z+30 relative to the raw projection
    # (`renderer.py:135,255` ×3 calls before opdict is built)
    from stylegan_directions_face_reenactment_tpu.geometry.rotations import (
        batch_orth_proj)
    tv_raw = batch_orth_proj(opdict["vertices"], code["cam"])
    tv_raw = tv_raw.at[:, :, 1:].multiply(-1.0)
    np.testing.assert_allclose(
        np.asarray(opdict["transformed_vertices"][:, :, 2]
                   - tv_raw[:, :, 2]), 30.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(opdict["transformed_vertices"][:, :, :2]),
        np.asarray(tv_raw[:, :, :2]), atol=1e-5)
    # all-ones mask (synthetic assets) → uv_texture_gt is exactly the
    # grid-sampled input images (`deca.py:195-198` with mask==1)
    from stylegan_directions_face_reenactment_tpu.models.nn import grid_sample
    uv_pverts = world2uv(opdict["transformed_vertices"], fl["faces"],
                         assets["uvcoords"], assets["uvfaces"], uv_size)
    want = grid_sample(images, uv_pverts[..., :2], align_corners=False)
    np.testing.assert_allclose(np.asarray(opdict["uv_texture_gt"]),
                               np.asarray(want), atol=1e-5)


def test_vis_landmarks_drawing():
    from stylegan_directions_face_reenactment_tpu.utils.visualization import (
        vis_landmarks)
    size = 64
    imgs = np.zeros((1, size, size, 3), np.float32)
    # points along a horizontal row, 8 px apart: disks at the points,
    # white 1-px line segments between consecutive in-group points
    lms = np.zeros((1, 68, 2), np.float32)
    lms[0, :, 0] = 4 + (np.arange(68) % 32) * 1.75
    lms[0, :, 1] = 8 + (np.arange(68) // 32) * 20
    out = vis_landmarks(imgs, lms, is_scale=False)
    assert out.shape == (1, size, size, 3)
    # disk pixels 2 rows off the line stay green (the line never reaches)
    x0, y0 = int(round(lms[0, 0, 0])), int(round(lms[0, 0, 1]))
    np.testing.assert_allclose(out[0, y0 + 2, x0], [0, 1, 0])
    # between-point pixels on the line are white
    assert (out[0, y0] == 1.0).all(axis=-1).any()
    # 4-column landmarks: per-point visibility coloring (green/blue)
    lms4 = np.concatenate([lms, np.zeros((1, 68, 1)),
                           np.zeros((1, 68, 1))], axis=2)
    lms4[0, :, 3] = (np.arange(68) % 2)     # alternate visibility
    out4 = vis_landmarks(imgs, lms4, is_scale=False)
    assert (out4[..., 1] == 1).any() and (out4[..., 2] == 1).any()
    # gt landmarks draw red on top
    gt = np.zeros((1, 68, 2), np.float32)   # is-scale form → center
    outg = vis_landmarks(imgs, lms, gt_landmarks=gt, is_scale=False)
    np.testing.assert_allclose(outg[0, size // 2, size // 2], [1, 0, 0])
    # off-frame landmarks draw nothing (cv2-style clipping, no border
    # smearing)
    far = np.full((1, 68, 2), 300.0, np.float32)
    far[0, :, 1] = -40.0
    out_far = vis_landmarks(imgs, far, is_scale=False)
    np.testing.assert_allclose(out_far, 0.0)
