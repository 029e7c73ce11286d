"""DECA shape visualization: TPU-native mesh rasterizer + flat shading.

JAX equivalent of the reference's `SRenderY.render_shape`
(`libs/DECA/decalib/utils/renderer.py:237-294`) and its pytorch3d
rasterizer front-end (`renderer.py:28-79`). The reference uses this path
only for visualization (`decalib/deca.py:186-189` inside `decode_deca`);
nothing on the training/inference compute path depends on it — but a user
of the reference gets shape-overlay renders, so the rebuild supplies them.

Design (TPU-first, no pytorch3d):

* The rasterizer is a `lax.scan` over fixed-size face chunks carrying a
  per-pixel (z-buffer, interpolated-attribute, coverage) state. Each chunk
  evaluates affine barycentric coordinates for all pixels against all
  chunk faces in one broadcasted VPU block, argmins the chunk's nearest
  hit per pixel, and merges into the carry with `where`. Static shapes
  throughout; batched via `vmap`.
* Semantics match pytorch3d with the reference's fixed settings
  (`renderer.py:40-47`: blur 0, faces_per_pixel 1, no perspective
  correction): a pixel is covered by a face iff all three barycentric
  coordinates are >= 0, depth is the barycentric interpolation of vertex
  z, the nearest (smallest z) face wins, attributes interpolate with the
  same weights, and uncovered pixels are zero with a coverage mask
  channel (`renderer.py:51-79`).
* Pixel centers: the reference negates x/y before handing pytorch3d its
  "+x left, +y up" NDC frame (`renderer.py:52-53`); composing the two
  flips, a vertex at (x, y) lands on pixel column (x+1)*S/2 - 0.5 and row
  (y+1)*S/2 - 0.5 — so we rasterize directly in the DECA screen frame
  with pixel-center coordinates 2*(i+0.5)/S - 1.

Mesh topology (faces) comes from the FLAME ``generic_model.pkl``
(`params["flame"]["faces"]`). UV-space (texture/detail) rendering — the
reference's `SRenderY.forward`/`world2uv`/`displacement2normal` path
(`renderer.py:121-206,331-340`, `decalib/deca.py:114-227`) — is implemented
below too; its topology assets (``head_template.obj`` UV coords,
``uv_face_eye_mask.png``, ``fixed_displacement_256.npy``) are user-supplied
downloads exactly like the model checkpoints, loaded by
`load_render_assets` (tests exercise the math on synthetic topologies, the
same pattern as `synthetic_flame_params`).

Everything is channel-last (NHWC) like the rest of the package.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

GRAY = 180.0 / 255.0  # shape-overlay albedo (`renderer.py:112-114`)

# five directional lights, intensity 1.7 (`renderer.py:243-254`)
DEFAULT_LIGHT_POSITIONS = (
    (-1.0, 1.0, 1.0),
    (1.0, 1.0, 1.0),
    (-1.0, -1.0, 1.0),
    (1.0, -1.0, 1.0),
    (0.0, 0.0, 1.0),
)
DEFAULT_LIGHT_INTENSITY = 1.7


def face_vertices(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex attributes (`decalib/utils/util.py:173-191`).

    vertices (B, V, D); faces (F, 3) int → (B, F, 3, D)."""
    return vertices[:, faces]


def vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals (`decalib/utils/util.py:193-224`):
    accumulate the face cross product at each of its three corners, then
    normalize. vertices (B, V, 3); faces (F, 3) → (B, V, 3)."""
    fv = vertices[:, faces]                               # (B, F, 3, 3)
    v0, v1, v2 = fv[:, :, 0], fv[:, :, 1], fv[:, :, 2]
    # the reference adds cross(c - b, a - b) at b, cross(a - c, b - c) at c,
    # cross(b - a, c - a) at a — all equal to the face normal
    n_at1 = jnp.cross(v2 - v1, v0 - v1)
    n_at2 = jnp.cross(v0 - v2, v1 - v2)
    n_at0 = jnp.cross(v1 - v0, v2 - v0)
    acc = jnp.zeros_like(vertices)
    acc = acc.at[:, faces[:, 1]].add(n_at1)
    acc = acc.at[:, faces[:, 2]].add(n_at2)
    acc = acc.at[:, faces[:, 0]].add(n_at0)
    norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.maximum(norm, 1e-6)


def _rasterize_single(verts: jnp.ndarray, faces: jnp.ndarray,
                      attributes: jnp.ndarray, image_size: int,
                      chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image. verts (V, 3) in the DECA screen frame ([-1, 1] across the
    image, +x right / +y down, +z away); faces (F, 3); attributes
    (F, 3, D). Returns (pixel_vals (S, S, D), coverage (S, S))."""
    n_faces = faces.shape[0]
    depth = attributes.shape[-1]
    size = image_size

    n_chunks = -(-n_faces // chunk)
    pad = n_chunks * chunk - n_faces
    fxyz = verts[faces]                                   # (F, 3, 3)
    fxyz = jnp.pad(fxyz, ((0, pad), (0, 0), (0, 0)))
    fattr = jnp.pad(attributes, ((0, pad), (0, 0), (0, 0)))
    fvalid = jnp.pad(jnp.ones((n_faces,), bool), (0, pad))

    fxyz = fxyz.reshape(n_chunks, chunk, 3, 3)
    fattr = fattr.reshape(n_chunks, chunk, 3, depth)
    fvalid = fvalid.reshape(n_chunks, chunk)

    coords = (2.0 * (jnp.arange(size, dtype=jnp.float32) + 0.5) / size) - 1.0
    px = coords[None, None, :]                            # (1, 1, S) cols → x
    py = coords[None, :, None]                            # (1, S, 1) rows → y

    big = jnp.float32(jnp.inf)

    def step(carry, chunk_data):
        zbuf, attr_buf, cover = carry
        cxyz, cattr, cvalid = chunk_data
        x = cxyz[:, :, 0]                                 # (C, 3)
        y = cxyz[:, :, 1]
        z = cxyz[:, :, 2]

        def edge(i, j):
            # signed area of (v_i, v_j, pixel), up to the common 1/2
            return ((x[:, i, None, None] - px) * (y[:, j, None, None] - py)
                    - (x[:, j, None, None] - px) * (y[:, i, None, None] - py))

        w0 = edge(1, 2)                                   # (C, S, S)
        w1 = edge(2, 0)
        w2 = edge(0, 1)
        area = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
                - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0]))  # (C,)
        ok = cvalid & (jnp.abs(area) > 1e-12)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)
        b0 = w0 * inv[:, None, None]
        b1 = w1 * inv[:, None, None]
        b2 = w2 * inv[:, None, None]
        inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
                  & ok[:, None, None])
        zi = (b0 * z[:, 0, None, None] + b1 * z[:, 1, None, None]
              + b2 * z[:, 2, None, None])
        zc = jnp.where(inside, zi, big)                   # (C, S, S)

        win = jnp.argmin(zc, axis=0)                      # (S, S)
        zwin = jnp.min(zc, axis=0)                        # (S, S)
        bary = jnp.stack([b0, b1, b2], axis=-1)           # (C, S, S, 3)
        bwin = jnp.take_along_axis(
            bary, win[None, :, :, None], axis=0)[0]       # (S, S, 3)
        vert_attr = cattr[win]                            # (S, S, 3, D)
        interp = jnp.einsum("ijk,ijkd->ijd", bwin, vert_attr)

        upd = zwin < zbuf                                 # inf never wins
        zbuf = jnp.where(upd, zwin, zbuf)
        attr_buf = jnp.where(upd[:, :, None], interp, attr_buf)
        cover = jnp.where(upd, 1.0, cover)
        return (zbuf, attr_buf, cover), None

    init = (jnp.full((size, size), big),
            jnp.zeros((size, size, depth), jnp.float32),
            jnp.zeros((size, size), jnp.float32))
    (zbuf, attr_buf, cover), _ = jax.lax.scan(step, init,
                                              (fxyz, fattr, fvalid))
    return attr_buf, cover


def rasterize(transformed_vertices: jnp.ndarray, faces: jnp.ndarray,
              attributes: jnp.ndarray, image_size: int = 224,
              chunk: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched z-buffer rasterization (`renderer.py:51-79`).

    transformed_vertices (B, V, 3) in the DECA screen frame; faces (F, 3)
    shared across the batch; attributes (B, F, 3, D) per face vertex.
    Returns (pixel_vals (B, S, S, D), coverage (B, S, S)) — uncovered
    pixels are zero, coverage is pytorch3d's `vismask`."""
    fn = lambda v, a: _rasterize_single(v, faces, a, image_size, chunk)
    return jax.vmap(fn)(transformed_vertices, attributes)


def default_lights(batch: int) -> jnp.ndarray:
    """(B, 5, 6) [direction | intensity] (`renderer.py:243-254`)."""
    pos = jnp.asarray(DEFAULT_LIGHT_POSITIONS, jnp.float32)
    lights = jnp.concatenate(
        [pos, jnp.full_like(pos, DEFAULT_LIGHT_INTENSITY)], axis=1)
    return jnp.broadcast_to(lights[None], (batch, 5, 6))


def add_directionlight(normals: jnp.ndarray, lights: jnp.ndarray
                       ) -> jnp.ndarray:
    """Directional lighting (`renderer.py:225-235`): mean over lights of
    clamp(n·l, 0, 1)·intensity. normals (B, N, 3); lights (B, L, 6) with
    [:, :, :3] the light *positions used as directions*."""
    direction = lights[:, :, :3]
    intensity = lights[:, :, 3:]
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    ndl = jnp.clip(jnp.einsum("bld,bnd->bln", direction, normals), 0.0, 1.0)
    shading = ndl[:, :, :, None] * intensity[:, :, None, :]   # (B, L, N, 3)
    return shading.mean(axis=1)


def render_shape(vertices: jnp.ndarray, transformed_vertices: jnp.ndarray,
                 faces: jnp.ndarray, images: Optional[jnp.ndarray] = None,
                 lights: Optional[jnp.ndarray] = None,
                 detail_normal_images: Optional[jnp.ndarray] = None,
                 image_size: int = 224, chunk: int = 256) -> jnp.ndarray:
    """Gray shaded-shape render, optionally composited over `images`
    (`renderer.py:237-294`).

    vertices (B, V, 3) world FLAME mesh; transformed_vertices (B, V, 3)
    after `batch_orth_proj` + y/z negation (NDC, *unscaled* — the
    reference's `decode_deca` frame, `decalib/deca.py:175`); faces (F, 3);
    images optional (B, S, S, 3) NHWC in [0, 1] range semantics of the
    caller; detail_normal_images optional (B, S, S, 3) replaces the
    rasterized normals before shading (`renderer.py:281-282`).
    Returns (B, S, S, 3)."""
    batch = vertices.shape[0]
    if lights is None:
        lights = default_lights(batch)
    tv = transformed_vertices.at[:, :, 2].add(10.0)       # `renderer.py:255`

    fv_world = face_vertices(vertices, faces)
    normals = vertex_normals(vertices, faces)
    face_normals = face_vertices(normals, faces)
    t_normals = vertex_normals(tv, faces)
    t_face_normals = face_vertices(t_normals, faces)
    colors = jnp.full_like(fv_world, GRAY)
    attributes = jnp.concatenate(
        [colors, t_face_normals, fv_world, face_normals], axis=-1)  # D=12

    rendering, cover = rasterize(tv, faces, attributes, image_size, chunk)

    albedo = rendering[..., 0:3]
    t_normal_map = rendering[..., 3:6]
    pos_mask = (t_normal_map[..., 2:3] < 0.15).astype(jnp.float32)
    normal_images = rendering[..., 9:12]
    if detail_normal_images is not None:
        normal_images = detail_normal_images

    shading = add_directionlight(
        normal_images.reshape(batch, -1, 3), lights)
    shading_images = shading.reshape(batch, image_size, image_size, 3)
    shaded = albedo * shading_images

    alpha = cover[..., None] * pos_mask
    if images is None:
        return shaded * alpha
    return shaded * alpha + images * (1.0 - alpha)


# ---------------------------------------------------------------------------
# UV-space texture / detail rendering (`renderer.py:121-206,331-340`)
# ---------------------------------------------------------------------------

# SH lighting constants (`renderer.py:114-119`)
_PI = 3.141592653589793
SH_CONSTANT_FACTOR = (
    1.0 / (4.0 * _PI) ** 0.5,
    ((2.0 * _PI) / 3.0) * (3.0 / (4.0 * _PI)) ** 0.5,
    ((2.0 * _PI) / 3.0) * (3.0 / (4.0 * _PI)) ** 0.5,
    ((2.0 * _PI) / 3.0) * (3.0 / (4.0 * _PI)) ** 0.5,
    (_PI / 4.0) * 3.0 * (5.0 / (12.0 * _PI)) ** 0.5,
    (_PI / 4.0) * 3.0 * (5.0 / (12.0 * _PI)) ** 0.5,
    (_PI / 4.0) * 3.0 * (5.0 / (12.0 * _PI)) ** 0.5,
    (_PI / 4.0) * 1.5 * (5.0 / (12.0 * _PI)) ** 0.5,
    (_PI / 4.0) * 0.5 * (5.0 / (4.0 * _PI)) ** 0.5,
)


def add_shlight(normal_images: jnp.ndarray, sh_coeff: jnp.ndarray
                ) -> jnp.ndarray:
    """9-band spherical-harmonic shading (`renderer.py:193-206`).

    normal_images (B, S, S, 3) NHWC; sh_coeff (B, 9, 3). Returns
    (B, S, S, 3) shading."""
    nx, ny, nz = (normal_images[..., 0], normal_images[..., 1],
                  normal_images[..., 2])
    basis = jnp.stack([
        jnp.ones_like(nx), nx, ny, nz, nx * ny, nx * nz, ny * nz,
        nx ** 2 - ny ** 2, 3.0 * nz ** 2 - 1.0,
    ], axis=-1)                                           # (B, S, S, 9)
    basis = basis * jnp.asarray(SH_CONSTANT_FACTOR, basis.dtype)
    return jnp.einsum("bijk,bkc->bijc", basis, sh_coeff)


def add_pointlight(vertices: jnp.ndarray, normals: jnp.ndarray,
                   lights: jnp.ndarray) -> jnp.ndarray:
    """Point lighting (`renderer.py:208-220`): mean over lights of
    (n·dir)·intensity — NOT clamped, unlike the directional variant.
    vertices/normals (B, N, 3); lights (B, L, 6)."""
    pos = lights[:, :, :3]
    intensity = lights[:, :, 3:]
    d = pos[:, :, None, :] - vertices[:, None, :, :]       # (B, L, N, 3)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    ndl = jnp.einsum("blnd,bnd->bln", d, normals)
    shading = ndl[:, :, :, None] * intensity[:, :, None, :]
    return shading.mean(axis=1)


def process_uvcoords(uvcoords: jnp.ndarray) -> jnp.ndarray:
    """Raw obj vt coords (V', 2) in [0, 1] → rasterizer frame (V', 3):
    append z=1, map to [-1, 1], negate y (`renderer.py:102-103`)."""
    uv = uvcoords * 2.0 - 1.0
    uv = uv.at[:, 1].multiply(-1.0)
    ones = jnp.ones((uvcoords.shape[0], 1), uvcoords.dtype)
    return jnp.concatenate([uv, ones], axis=-1)


def render_textured(vertices: jnp.ndarray, transformed_vertices: jnp.ndarray,
                    faces: jnp.ndarray, albedos: jnp.ndarray,
                    uvcoords: jnp.ndarray, uvfaces: jnp.ndarray,
                    lights: Optional[jnp.ndarray] = None,
                    light_type: str = "point", image_size: int = 224,
                    chunk: int = 256) -> Dict[str, jnp.ndarray]:
    """Textured render (`SRenderY.forward`, `renderer.py:121-191`).

    vertices (B, V, 3) world mesh (for shading normals);
    transformed_vertices (B, V, 3) projected NDC mesh; faces (F, 3);
    albedos (B, Ht, Wt, 3) NHWC UV texture map; uvcoords (V', 2) raw obj
    vt coords; uvfaces (F, 3) texture-index triple per face; lights
    (B, 9, 3) SH or (B, L, 6) point/directional. Returns the reference's
    output dict, all images NHWC."""
    batch = vertices.shape[0]
    tv = transformed_vertices.at[:, :, 2].add(10.0)       # `renderer.py:135`

    fv_world = face_vertices(vertices, faces)
    normals = vertex_normals(vertices, faces)
    face_normals = face_vertices(normals, faces)
    t_normals = vertex_normals(tv, faces)
    t_face_normals = face_vertices(t_normals, faces)

    f_uv = process_uvcoords(uvcoords)[uvfaces]             # (F, 3, 3)
    f_uv = jnp.broadcast_to(f_uv[None], (batch,) + f_uv.shape)
    attributes = jnp.concatenate(
        [f_uv, jax.lax.stop_gradient(t_face_normals),
         jax.lax.stop_gradient(fv_world), face_normals], axis=-1)  # D=12

    rendering, cover = rasterize(tv, faces, attributes, image_size, chunk)
    alpha = jax.lax.stop_gradient(cover[..., None])

    grid = rendering[..., 0:2]                             # uv (x, y)
    from ..nn import grid_sample
    albedo_images = grid_sample(albedos, grid, align_corners=False)

    t_normal_map = jax.lax.stop_gradient(rendering[..., 3:6])
    pos_mask = (t_normal_map[..., 2:3] < -0.05).astype(jnp.float32)

    normal_images = rendering[..., 9:12]
    if lights is None:
        images = albedo_images
        shading_images = jax.lax.stop_gradient(images) * 0.0
    else:
        if lights.shape[1] == 9:                           # SH coefficients
            shading_images = add_shlight(normal_images, lights)
        elif light_type == "point":
            vert_images = jax.lax.stop_gradient(
                rendering[..., 6:9]).reshape(batch, -1, 3)
            shading = add_pointlight(
                vert_images, normal_images.reshape(batch, -1, 3), lights)
            shading_images = shading.reshape(
                batch, image_size, image_size, 3)
        else:
            shading = add_directionlight(
                normal_images.reshape(batch, -1, 3), lights)
            shading_images = shading.reshape(
                batch, image_size, image_size, 3)
        images = albedo_images * shading_images

    return {
        "images": images * alpha,
        "albedo_images": albedo_images * alpha,
        "alpha_images": alpha,
        "pos_mask": pos_mask,
        "shading_images": shading_images,
        "grid": grid,
        "normals": normals,
        "normal_images": normal_images * alpha,
        "transformed_normals": t_normals,
    }


def world2uv(vertices: jnp.ndarray, faces: jnp.ndarray,
             uvcoords: jnp.ndarray, uvfaces: jnp.ndarray,
             uv_size: int = 256, chunk: int = 256) -> jnp.ndarray:
    """Rasterize per-vertex world positions into UV space
    (`renderer.py:331-340`): every UV texel covered by a face gets the
    barycentric interpolation of that face's world-space vertices.

    vertices (B, V, 3); faces (F, 3); uvcoords (V', 2) raw; uvfaces (F, 3).
    Returns (B, uv, uv, 3)."""
    batch = vertices.shape[0]
    fv = face_vertices(vertices, faces)                    # (B, F, 3, 3)
    uvc3 = process_uvcoords(uvcoords)
    uv_pos = jnp.broadcast_to(uvc3[None], (batch,) + uvc3.shape)
    out, _ = rasterize(uv_pos, uvfaces, fv, uv_size, chunk)
    return out


def generate_triangles(h: int, w: int, margin_x: int = 2,
                       margin_y: int = 5) -> np.ndarray:
    """Dense grid triangulation of a (h, w) UV map
    (`decalib/utils/util.py:155-170`), same winding (the reference builds
    two CCW quads then swaps columns [0,2,1]). Host-side numpy; the result
    is a static (F, 3) int array."""
    # x-major enumeration like the reference's nested loops (x outer)
    xs, ys = np.meshgrid(np.arange(margin_x, w - 1 - margin_x),
                         np.arange(margin_y, h - 1 - margin_y),
                         indexing="ij")
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    t0 = np.stack([ys * w + xs, ys * w + xs + 1, (ys + 1) * w + xs], axis=1)
    t1 = np.stack([ys * w + xs + 1, (ys + 1) * w + xs + 1,
                   (ys + 1) * w + xs], axis=1)
    tris = np.stack([t0, t1], axis=1).reshape(-1, 3)
    return tris[:, [0, 2, 1]].astype(np.int32)


def displacement2normal(uv_z: jnp.ndarray, coarse_verts: jnp.ndarray,
                        coarse_normals: jnp.ndarray, faces: jnp.ndarray,
                        assets: Params, chunk: int = 256) -> jnp.ndarray:
    """Displacement map → detail normal map (`decalib/deca.py:114-126`).

    uv_z (B, uv, uv, 1) from the detail decoder; coarse_verts/normals
    (B, V, 3); faces (F, 3); assets: `load_render_assets` dict. Returns
    (B, uv, uv, 3) detail normals."""
    dense_verts, dense_faces, uv = _displaced_uv_vertices(
        uv_z, coarse_verts, coarse_normals, faces, assets, chunk)
    n = vertex_normals(dense_verts, dense_faces)
    return n.reshape(uv_z.shape[0], uv, uv, 3)


def displacement2vertex(uv_z: jnp.ndarray, coarse_verts: jnp.ndarray,
                        coarse_normals: jnp.ndarray, faces: jnp.ndarray,
                        assets: Params, chunk: int = 256):
    """Displacement map → dense detail vertices + faces
    (`decalib/deca.py:128-141`)."""
    dense_verts, dense_faces, _ = _displaced_uv_vertices(
        uv_z, coarse_verts, coarse_normals, faces, assets, chunk)
    return dense_verts, dense_faces


def _displaced_uv_vertices(uv_z, coarse_verts, coarse_normals, faces,
                           assets, chunk):
    uv = uv_z.shape[1]
    uvcoords, uvfaces = assets["uvcoords"], assets["uvfaces"]
    uv_cv = jax.lax.stop_gradient(
        world2uv(coarse_verts, faces, uvcoords, uvfaces, uv, chunk))
    # the reference detaches uv_coarse_normals at creation
    # (`decalib/deca.py:119`): gradient flows ONLY through uv_z
    uv_cn = jax.lax.stop_gradient(
        world2uv(coarse_normals, faces, uvcoords, uvfaces, uv, chunk))
    uv_z = uv_z * assets["uv_face_eye_mask"]
    fixed = assets["fixed_uv_dis"][None, :, :, None]
    detail_verts = uv_cv + uv_z * uv_cn + fixed * uv_cn
    dense_faces = assets.get("dense_faces")
    if dense_faces is None:
        dense_faces = jnp.asarray(generate_triangles(uv, uv))
    return detail_verts.reshape(uv_z.shape[0], -1, 3), dense_faces, uv


def visofp(transformed_normals: jnp.ndarray, flame_params: Params
           ) -> jnp.ndarray:
    """68-landmark visibility from per-vertex normal direction
    (`decalib/deca.py:143-148` + `FLAME.seletec_3d68`)."""
    from .flame import vertices2landmarks
    n68 = vertices2landmarks(transformed_normals, flame_params["faces"],
                             flame_params["full_lmk_faces_idx"],
                             flame_params["full_lmk_bary_coords"])
    return (n68[:, :, 2:] < 0.1).astype(jnp.float32)


def load_render_assets(obj_path: str, uv_face_eye_mask_path: Optional[str]
                       = None, fixed_displacement_path: Optional[str] = None,
                       uv_size: int = 256) -> Params:
    """Load the user-downloaded UV topology assets the reference reads in
    `SRenderY.__init__`/`DECA.__init__` (`renderer.py:86-107`,
    `decalib/deca.py:53-65`): head_template.obj (vt/f lines),
    uv_face_eye_mask.png, fixed_displacement_256.npy. Missing optional
    files default to an all-ones mask / zero displacement."""
    uvcoords, uvfaces = load_obj_uv(obj_path)
    if uv_face_eye_mask_path is not None:
        from PIL import Image
        m = np.asarray(Image.open(uv_face_eye_mask_path).convert("L").resize(
            (uv_size, uv_size)), np.float32) / 255.0
        mask = (m > 0.5).astype(np.float32)[..., None]
    else:
        mask = np.ones((uv_size, uv_size, 1), np.float32)
    if fixed_displacement_path is not None:
        fixed = np.load(fixed_displacement_path).astype(np.float32)
    else:
        fixed = np.zeros((uv_size, uv_size), np.float32)
    return {
        "uvcoords": jnp.asarray(uvcoords),
        "uvfaces": jnp.asarray(uvfaces),
        "uv_face_eye_mask": jnp.asarray(mask),
        "fixed_uv_dis": jnp.asarray(fixed),
        "dense_faces": jnp.asarray(generate_triangles(uv_size, uv_size)),
    }


def synthetic_render_assets(key, n_faces: int, uv_size: int = 256,
                            n_uv_verts: int = 64) -> Params:
    """Random UV topology for tests (the real one comes from the
    user-downloaded ``head_template.obj`` via `load_render_assets`) — the
    same pattern as `flame.synthetic_flame_params`. uvfaces has one
    texture triple per mesh face."""
    k1, k2 = jax.random.split(key)
    return {
        "uvcoords": jax.random.uniform(k1, (n_uv_verts, 2), jnp.float32,
                                       0.05, 0.95),
        "uvfaces": jax.random.randint(k2, (n_faces, 3), 0, n_uv_verts
                                      ).astype(jnp.int32),
        "uv_face_eye_mask": jnp.ones((uv_size, uv_size, 1), jnp.float32),
        "fixed_uv_dis": jnp.zeros((uv_size, uv_size), jnp.float32),
        "dense_faces": jnp.asarray(generate_triangles(uv_size, uv_size)),
    }


def load_obj_uv(path: str):
    """Minimal Wavefront-obj UV reader (replaces pytorch3d `load_obj`,
    `renderer.py:86-89`): returns (uvcoords (V', 2) f32, uvfaces (F, 3)
    int32 0-based texture indices from the f v/vt[/vn] tuples). Polygonal
    faces are fan-triangulated like pytorch3d; faces without vt indices
    are an error (the renderer cannot texture them)."""
    uvcoords, uvfaces = [], []
    n_face_lines = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "vt":
                uvcoords.append([float(parts[1]), float(parts[2])])
            elif parts[0] == "f":
                n_face_lines += 1
                idx = []
                for vert in parts[1:]:
                    fields = vert.split("/")
                    if len(fields) > 1 and fields[1]:
                        idx.append(int(fields[1]) - 1)
                if 0 < len(idx) < 3:
                    raise ValueError(
                        f"{path}: face with fewer than 3 vt indices")
                for i in range(1, len(idx) - 1):       # fan triangulation
                    uvfaces.append([idx[0], idx[i], idx[i + 1]])
    if n_face_lines and not uvfaces:
        raise ValueError(f"{path}: faces carry no vt texture indices — "
                         "the obj has no UV atlas to render with")
    return (np.asarray(uvcoords, np.float32),
            np.asarray(uvfaces, np.int32))


def decode_deca(params: Params, codedict: Dict[str, jnp.ndarray],
                assets: Params, image_size: int = 224,
                uv_size: int = 256, use_tex: bool = False,
                draw_landmarks: bool = True, chunk: int = 256):
    """The reference's visualization decode (`decalib/deca.py:160-227`):
    FLAME decode → textured render + SH-lit detail normals → shape /
    shape-detail overlays → UV texture extraction.

    codedict: encode output {shape, tex, exp, pose, cam, light, detail,
    images} with images (B, S, S, 3) NHWC in [0, 1]. assets:
    `load_render_assets`. Returns (opdict, visdict) with the reference's
    keys, NHWC. draw_landmarks renders the landmark overlays on the host
    (`util.tensor_vis_landmarks`) — pass False to keep the function
    jit-traceable (visdict then carries the raw point arrays)."""
    from ...geometry.rotations import batch_orth_proj
    from ..nn import grid_sample
    from .deca import detail_generator_forward
    from .flame import flame_forward, flametex_forward

    images = codedict["images"]
    batch = images.shape[0]
    fl = params["flame"]

    verts, landmarks2d, landmarks3d = flame_forward(
        fl, codedict["shape"], codedict["exp"], codedict["pose"])
    uv_z = detail_generator_forward(
        params["d_detail"],
        jnp.concatenate([codedict["pose"][:, 3:], codedict["exp"],
                         codedict["detail"]], axis=1))
    if use_tex:
        albedo = flametex_forward(params["flametex"], codedict["tex"])
    else:
        albedo = jnp.zeros((batch, uv_size, uv_size, 3), jnp.float32)

    def project(pts, keep3d):
        p = batch_orth_proj(pts, codedict["cam"])
        p = p.at[:, :, 1:].multiply(-1.0)
        if not keep3d:
            p = p[:, :, :2]
        return p * (image_size / 2.0) + image_size / 2.0

    landmarks2d = project(landmarks2d, keep3d=False)
    landmarks3d = project(landmarks3d, keep3d=True)
    trans_verts = batch_orth_proj(verts, codedict["cam"])
    trans_verts = trans_verts.at[:, :, 1:].multiply(-1.0)

    ops = render_textured(verts, trans_verts, fl["faces"], albedo,
                          assets["uvcoords"], assets["uvfaces"],
                          lights=codedict["light"], image_size=image_size,
                          chunk=chunk)
    # the reference's SRenderY.forward / render_shape mutate trans_verts
    # IN PLACE (z += 10, `renderer.py:135,255`), so its decode_deca passes
    # an already-shifted tensor into each later call and returns z+30 in
    # opdict['transformed_vertices'] — replicate the accumulation (a
    # constant z offset never changes the rendered images, only the
    # returned vertex values)
    trans_verts = trans_verts.at[:, :, 2].add(10.0)
    uv_detail_normals = displacement2normal(uv_z, verts, ops["normals"],
                                            fl["faces"], assets, chunk)
    uv_shading = add_shlight(uv_detail_normals, codedict["light"])
    uv_texture = albedo * uv_shading

    lm3d_vis = visofp(ops["transformed_normals"], fl)
    landmarks3d = jnp.concatenate([landmarks3d, lm3d_vis], axis=2)

    shape_images = render_shape(verts, trans_verts, fl["faces"],
                                image_size=image_size, chunk=chunk)
    trans_verts = trans_verts.at[:, :, 2].add(10.0)
    detail_normal_images = grid_sample(
        uv_detail_normals, ops["grid"], align_corners=False
    ) * ops["alpha_images"]
    shape_detail_images = render_shape(
        verts, trans_verts, fl["faces"],
        detail_normal_images=detail_normal_images, image_size=image_size,
        chunk=chunk)
    trans_verts = trans_verts.at[:, :, 2].add(10.0)

    uv_pverts = world2uv(trans_verts, fl["faces"], assets["uvcoords"],
                         assets["uvfaces"], uv_size, chunk)
    uv_gt = grid_sample(images, uv_pverts[..., :2], align_corners=False)
    mask = assets["uv_face_eye_mask"]
    if use_tex:
        uv_texture_gt = uv_gt * mask + uv_texture * (1.0 - mask) * 0.7
    else:
        uv_texture_gt = uv_gt * mask + jnp.ones_like(uv_gt) * (1.0 - mask) * 0.7

    opdict = {
        "vertices": verts,
        "normals": ops["normals"],
        "transformed_vertices": trans_verts,
        "landmarks2d": landmarks2d,
        "landmarks3d": landmarks3d,
        "uv_detail_normals": uv_detail_normals,
        "uv_texture_gt": uv_texture_gt,
        "displacement_map": uv_z + assets["fixed_uv_dis"][None, :, :, None],
    }
    if use_tex:
        opdict["albedo"] = albedo
        opdict["uv_texture"] = uv_texture

    if draw_landmarks:
        from ...utils.visualization import vis_landmarks
        lm2d_vis = jnp.asarray(vis_landmarks(images, landmarks2d,
                                             is_scale=False))
        lm3d_vis_img = jnp.asarray(vis_landmarks(images, landmarks3d,
                                                 is_scale=False))
    else:
        lm2d_vis, lm3d_vis_img = landmarks2d, landmarks3d
    visdict = {
        "inputs": images,
        "landmarks2d": lm2d_vis,
        "landmarks3d": lm3d_vis_img,
        "shape_images": shape_images,
        "shape_detail_images": shape_detail_images,
    }
    if use_tex:
        visdict["rendered_images"] = ops["images"]
    return opdict, visdict


def shape_visualization(params: Params, codedict: Dict[str, jnp.ndarray],
                        images: Optional[jnp.ndarray] = None,
                        image_size: int = 224) -> jnp.ndarray:
    """`decode_deca`-style shape overlay (`decalib/deca.py:160-189`): FLAME
    decode → weak-perspective projection with y/z negation (kept in NDC) →
    `render_shape` over the input images.

    params: DECA param dict (needs `flame`); codedict: {shape, exp, pose,
    cam}; images optional (B, S, S, 3) NHWC. Returns (B, S, S, 3)."""
    from ...geometry.rotations import batch_orth_proj
    from .flame import flame_forward

    verts, _, _ = flame_forward(params["flame"], codedict["shape"],
                                codedict["exp"], codedict["pose"])
    tverts = batch_orth_proj(verts, codedict["cam"])
    tverts = tverts.at[:, :, 1:].multiply(-1.0)           # `deca.py:175`
    return render_shape(verts, tverts, params["flame"]["faces"],
                        images=images, image_size=image_size)
