"""DECA mesh export + visualize grid: live parity vs the reference's
`util.write_obj`/`upsample_mesh` (AST-extracted, pure numpy) and torch's
`F.interpolate` nearest resize, plus end-to-end `save_obj`/`save_ply`
structure checks."""

import os

import numpy as np
import pytest

from stylegan_directions_face_reenactment_tpu.models.deca.mesh_io import (
    write_obj, upsample_mesh, save_obj, save_ply, visualize, to_image_u8,
    _make_grid, _resize_nearest)

from ref_loader import extract_ref_function

REF_UTIL = "libs/DECA/decalib/utils/util.py"


class _Cv2Stub:
    """Capture the reference's cv2.imwrite calls (cv2 is not installed)."""

    def __init__(self):
        self.written = {}

    def imwrite(self, path, img):
        self.written[path] = np.asarray(img).copy()
        return True


@pytest.fixture(scope="module")
def ref_write_obj():
    return extract_ref_function(REF_UTIL, "write_obj",
                                namespace={"os": os, "np": np})


def _mesh(rng, nv=17, nf=24):
    verts = rng.standard_normal((nv, 3)).astype(np.float32)
    faces = rng.integers(0, nv, (nf, 3)).astype(np.int64)
    return verts, faces


def test_write_obj_text_parity_untextured(tmp_path, ref_write_obj):
    rng = np.random.default_rng(0)
    verts, faces = _mesh(rng)
    ref_write_obj(str(tmp_path / "ref.obj"), verts, faces.copy())
    write_obj(str(tmp_path / "ours.obj"), verts, faces)
    assert (tmp_path / "ours.obj").read_text() == \
        (tmp_path / "ref.obj").read_text()


def test_write_obj_text_parity_colors_inverse(tmp_path, ref_write_obj):
    rng = np.random.default_rng(1)
    verts, faces = _mesh(rng)
    colors = rng.integers(0, 256, (verts.shape[0], 3)).astype(np.uint8)
    ref_write_obj(str(tmp_path / "ref.obj"), verts, faces.copy(),
                  colors=colors, inverse_face_order=True)
    write_obj(str(tmp_path / "ours.obj"), verts, faces, colors=colors,
              inverse_face_order=True)
    assert (tmp_path / "ours.obj").read_text() == \
        (tmp_path / "ref.obj").read_text()


def test_write_obj_text_parity_textured(tmp_path, ref_write_obj):
    from PIL import Image
    rng = np.random.default_rng(2)
    verts, faces = _mesh(rng)
    nuv = 11
    uvcoords = rng.random((nuv, 2)).astype(np.float32)
    uvfaces = rng.integers(0, nuv, faces.shape).astype(np.int64)
    tex_rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    nrm_rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)

    stub = _Cv2Stub()
    ref_write_obj.__globals__["cv2"] = stub
    # the reference receives BGR arrays (tensor2image output) and writes
    # them through BGR-interpreting cv2.imwrite → RGB files
    ref_write_obj(str(tmp_path / "ref.obj"), verts, faces.copy(),
                  texture=tex_rgb[:, :, ::-1], uvcoords=uvcoords,
                  uvfaces=uvfaces.copy(), normal_map=nrm_rgb[:, :, ::-1])
    write_obj(str(tmp_path / "ours.obj"), verts, faces, texture=tex_rgb,
              uvcoords=uvcoords, uvfaces=uvfaces, normal_map=nrm_rgb)

    ours = (tmp_path / "ours.obj").read_text()
    ref = (tmp_path / "ref.obj").read_text().replace("ref.mtl", "ours.mtl")
    assert ours == ref
    assert (tmp_path / "ours.mtl").read_text() == \
        (tmp_path / "ref.mtl").read_text().replace(
            "ref_", "ours_").replace("ref.png", "ours.png")
    # PNG pixel parity: undo the stub's BGR capture
    assert np.array_equal(
        np.asarray(Image.open(tmp_path / "ours.png")),
        stub.written[str(tmp_path / "ref.png")][:, :, ::-1])
    assert np.array_equal(
        np.asarray(Image.open(tmp_path / "ours_normals.png")),
        stub.written[str(tmp_path / "ref_normals.png")][:, :, ::-1])


def _dense_template(rng, nv, uv=16, npix=40, nf_dense=30):
    return {
        "img_size": uv,
        "f": rng.integers(0, npix, (nf_dense, 3)).astype(np.int64),
        "x_coords": rng.integers(0, uv, (uv * uv,)).astype(np.float64),
        "y_coords": rng.integers(0, uv, (uv * uv,)).astype(np.float64),
        "valid_pixel_ids": rng.choice(uv * uv, npix, replace=False),
        "valid_pixel_3d_faces": rng.integers(0, nv, (npix, 3)).astype(
            np.int64),
        "valid_pixel_b_coords": rng.dirichlet(np.ones(3), npix),
    }


def test_upsample_mesh_parity():
    ref_fn = extract_ref_function(REF_UTIL, "upsample_mesh",
                                  namespace={"np": np})
    rng = np.random.default_rng(3)
    verts, faces = _mesh(rng)
    normals = rng.standard_normal(verts.shape).astype(np.float32)
    disp = rng.standard_normal((16, 16)).astype(np.float32)
    tex = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    tmpl = _dense_template(rng, verts.shape[0])
    rv, rc, rf = ref_fn(verts, normals, faces, disp, tex, tmpl)
    ov, oc, of = upsample_mesh(verts, normals, faces, disp, tex, tmpl)
    np.testing.assert_allclose(ov, rv, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(oc, rc)
    np.testing.assert_array_equal(of, rf)


def test_save_obj_end_to_end(tmp_path):
    rng = np.random.default_rng(4)
    nv, nf, uv = 17, 24, 16
    verts, faces = _mesh(rng, nv, nf)
    nuv = 11
    opdict = {
        "vertices": verts[None],
        "normals": rng.standard_normal((1, nv, 3)).astype(np.float32),
        "uv_texture_gt": rng.random((1, uv, uv, 3)).astype(np.float32),
        "uv_detail_normals": rng.uniform(-1, 1, (1, uv, uv, 3)).astype(
            np.float32),
        "displacement_map": rng.standard_normal((1, uv, uv, 1)).astype(
            np.float32),
    }
    uvcoords = rng.random((nuv, 2)).astype(np.float32)
    uvfaces = rng.integers(0, nuv, (nf, 3)).astype(np.int64)
    tmpl = _dense_template(rng, nv, uv)
    save_obj(str(tmp_path / "face.obj"), opdict, faces[None], uvcoords,
             uvfaces, dense_template=tmpl)

    coarse = (tmp_path / "face.obj").read_text().splitlines()
    assert coarse[0] == "mtllib face.mtl"
    assert sum(l.startswith("v ") for l in coarse) == nv
    assert sum(l.startswith("vt ") for l in coarse) == nuv
    f_lines = [l for l in coarse if l.startswith("f ")]
    assert len(f_lines) == nf and "/" in f_lines[0]
    assert "map_Kd face.png" in (tmp_path / "face.mtl").read_text()
    assert (tmp_path / "face.png").exists()
    assert (tmp_path / "face_normals.png").exists()

    detail = (tmp_path / "face_detail.obj").read_text().splitlines()
    v_lines = [l for l in detail if l.startswith("v ")]
    assert len(v_lines) == 40 and len(v_lines[0].split()) == 7  # colored
    assert sum(l.startswith("f ") for l in detail) == 30


def test_save_obj_without_dense_template(tmp_path):
    rng = np.random.default_rng(5)
    verts, faces = _mesh(rng)
    opdict = {
        "vertices": verts[None],
        "uv_texture_gt": rng.random((1, 8, 8, 3)).astype(np.float32),
        "uv_detail_normals": rng.uniform(-1, 1, (1, 8, 8, 3)).astype(
            np.float32),
    }
    uvcoords = rng.random((5, 2)).astype(np.float32)
    uvfaces = rng.integers(0, 5, faces.shape).astype(np.int64)
    save_obj(str(tmp_path / "face"), opdict, faces, uvcoords, uvfaces)
    assert (tmp_path / "face.obj").exists()
    assert not (tmp_path / "face_detail.obj").exists()


def test_save_ply_parses(tmp_path):
    rng = np.random.default_rng(6)
    verts, faces = _mesh(rng)
    save_ply(str(tmp_path / "face.ply"), {"vertices": verts[None]}, faces)
    lines = (tmp_path / "face.ply").read_text().splitlines()
    assert lines[0] == "ply" and "end_header" in lines
    assert f"element vertex {verts.shape[0]}" in lines
    assert f"element face {faces.shape[0]}" in lines
    body = lines[lines.index("end_header") + 1:]
    assert len([l for l in body if l]) == verts.shape[0] + faces.shape[0]
    assert all(l.startswith("3 ") for l in body[verts.shape[0]:] if l)


def test_resize_nearest_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(7)
    for hw, size in [(17, 24), (24, 17), (16, 16)]:
        batch = rng.random((2, hw, hw, 3)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(batch).permute(0, 3, 1, 2),
                            [size, size]).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(_resize_nearest(batch, size), ref)


def test_make_grid_layout():
    batch = np.arange(3 * 4 * 5 * 1, dtype=np.float32).reshape(3, 4, 5, 1)
    grid = _make_grid(batch, nrow=2, padding=2)
    # 2 rows x 2 cols of (4,5) cells with 2px top/left borders
    assert grid.shape == (2 + 2 * 6, 2 + 2 * 7, 1)
    np.testing.assert_array_equal(grid[2:6, 2:7, 0], batch[0, :, :, 0])
    np.testing.assert_array_equal(grid[2:6, 9:14, 0], batch[1, :, :, 0])
    np.testing.assert_array_equal(grid[8:12, 2:7, 0], batch[2, :, :, 0])
    assert (grid[:2] == 0).all() and (grid[:, :2] == 0).all()
    assert (grid[8:12, 9:14] == 0).all()          # empty cell


def test_visualize_grid():
    rng = np.random.default_rng(8)
    visdict = {
        "inputs": rng.random((3, 12, 12, 3)).astype(np.float32),
        "shape_images": rng.random((3, 8, 8, 3)).astype(np.float32),
    }
    out = visualize(visdict, size=10)
    # one 3-wide row per key (nrow=8 > batch), concatenated along width
    assert out.dtype == np.uint8
    assert out.shape == (2 + 12, 2 * (2 + 3 * 12), 3)
    # first cell of the first grid is the nearest-resize of inputs[0]
    expect = to_image_u8(_resize_nearest(visdict["inputs"], 10)[0])
    np.testing.assert_array_equal(out[2:12, 2:12], expect)
