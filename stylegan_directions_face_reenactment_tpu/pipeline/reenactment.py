"""Face reenactment: the full per-frame program, batched over frames.

TPU-first re-design of `run_inference.py:157-254` (reference). The
reference processes target frames in a sequential Python loop — preprocess,
DECA encode, Δp, A, synthesize, one frame at a time. Here the device-side
path (DECA → Δp → A → shifted synthesis) is ONE jitted program over a
*batch* of target frames; video length is handled by batching frames, not
looping, which is what makes the ≥500 fps/chip target reachable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.directions import DirectionsSpec, make_shift_vector
from ..models.deca.deca import calculate_shapemodel
from ..models.direction_matrix import direction_matrix_forward
from .synthesis import generate_image

Params = Dict[str, Any]


def align_for(fan_params: Optional[Params], s3fd_params: Optional[Params] = None,
              compute_dtype=None):
    """return_ok=True: `calculate_shapemodel` replicates the reference's
    detection-failure sentinel — zeroed coefficients + −180° angles
    (`estimate_DECA.py:33-51`; face_alignment returns None → bbox_type
    'error'). Only the SFD path can fail; 'fan_frame' is always ok."""
    if fan_params is None:
        return None
    from .alignment import make_fan_align
    return make_fan_align(fan_params, s3fd_params=s3fd_params,
                          compute_dtype=compute_dtype, return_ok=True)


def source_shape(deca_params: Params, source_img: jnp.ndarray,
                 fan_params: Optional[Params] = None,
                 s3fd_params: Optional[Params] = None):
    """DECA coefficients for the (1, 256, 256, 3) source image. With
    ``fan_params``, applies the reference's FAN-bbox → warp-224 DECA
    alignment (`decalib/datasets/datasets.py:57-86`) before encoding; with
    ``s3fd_params`` too, the FAN bbox comes from the faithful SFD-crop→FAN
    chain (`decalib/datasets/detectors.py:23-42`)."""
    return calculate_shapemodel(deca_params, source_img,
                                align_fn=align_for(fan_params, s3fd_params))


def reenact_batch(g_params: Params, a_params: Params, deca_params: Params,
                  spec: DirectionsSpec,
                  source_code: jnp.ndarray,
                  params_source: Dict[str, jnp.ndarray],
                  angles_source: jnp.ndarray,
                  target_imgs: jnp.ndarray, *,
                  truncation: float = 0.7,
                  truncation_latent: Optional[jnp.ndarray] = None,
                  num_layers_shift: int = 8,
                  compute_dtype=jnp.float32,
                  fan_params: Optional[Params] = None,
                  s3fd_params: Optional[Params] = None,
                  return_target_params: bool = False,
                  target_lms: Optional[jnp.ndarray] = None,
                  target_ok: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, ...]:
    """Reenact a batch of target frames onto one source identity.

    source_code: (1, n_latent, 512) W+ of the source;
    params_source/angles_source: DECA outputs for the source (batch 1);
    target_imgs: (T, 256, 256, 3) in [-1, 1].

    Returns (reenacted (T, 256, 256, 3), shifted latents (T, n_latent, 512));
    with ``return_target_params``, also (params_target, angles_target) — the
    target coefficients this function computes anyway, so metric consumers
    (the parity harness) don't pay a second alignment+encode pass.
    The whole function jits into a single XLA program
    (cf. reference per-frame loop `run_inference.py:170-195`).
    """
    t = target_imgs.shape[0]
    # bf16 serving: the alignment nets AND the DECA ResNet-50 trunk follow
    # the synthesis compute dtype (coefficients stay f32); f32 keeps exact
    # parity everywhere
    align_dtype = None if compute_dtype == jnp.float32 else compute_dtype
    if target_lms is not None:
        # single-detection mode: the caller's preprocessing landmarks
        # (mapped into crop coords) replace the in-alignment SFD+FAN pass
        from .alignment import landmark_align
        align_fn = lambda imgs01: landmark_align(imgs01, target_lms,
                                                 target_ok)
    else:
        align_fn = align_for(fan_params, s3fd_params,
                             compute_dtype=align_dtype)
    params_target, angles_target = calculate_shapemodel(
        deca_params, target_imgs, align_fn=align_fn,
        compute_dtype=align_dtype)

    ps = {k: jnp.broadcast_to(v, (t,) + v.shape[1:])
          for k, v in params_source.items()}
    angs = jnp.broadcast_to(angles_source, (t, 3))

    delta_p = make_shift_vector(spec, ps, params_target, angs, angles_target)
    shift = direction_matrix_forward(a_params, delta_p)      # (T, L, 512)

    codes = jnp.broadcast_to(source_code, (t,) + source_code.shape[1:])
    reenacted, shifted_latents = generate_image(
        g_params, codes, truncation=truncation,
        truncation_latent=truncation_latent, w_plus=True,
        num_layers_shift=num_layers_shift, shift_code=shift,
        input_is_latent=True, return_latents=True,
        compute_dtype=compute_dtype)
    if return_target_params:
        return reenacted, shifted_latents, params_target, angles_target
    return reenacted, shifted_latents


def make_reenact_program(g_params: Params, a_params: Params,
                         deca_params: Params, spec: DirectionsSpec, *,
                         truncation: float = 0.7,
                         truncation_latent: Optional[jnp.ndarray] = None,
                         num_layers_shift: int = 8,
                         compute_dtype=jnp.float32,
                         fan_params: Optional[Params] = None,
                         s3fd_params: Optional[Params] = None,
                         return_target_params: bool = False,
                         reuse_landmarks: bool = False):
    """The raw jitted reenactment program plus its weights argument.

    Returns ``(fn, weights)`` where ``fn(weights, source_code,
    params_source, angles_source, target_imgs, *extra)`` is the single
    jitted XLA program (weights ride as ARGUMENTS — baking 100s of MB of
    frozen constants into the HLO overflows compile pipelines) and
    ``weights`` is the array-only pytree to pass back in. The small
    static config dicts are closed over inside ``fn``. Used directly by
    :func:`make_reenact_fn` and by the AOT serving exporter
    (`serving.py`), which serializes ``fn`` via `jax.export` and ships
    ``weights`` alongside it."""
    from ..train.steps import merge_statics, strip_statics

    weights, statics = strip_statics((g_params, a_params, deca_params,
                                      fan_params, s3fd_params,
                                      truncation_latent))

    if reuse_landmarks:
        @jax.jit
        def _fn(weights, source_code, params_source, angles_source,
                target_imgs, target_lms, target_ok):
            g, a, deca, fan, sfd, trunc = merge_statics(weights, statics)
            return reenact_batch(
                g, a, deca, spec, source_code,
                params_source, angles_source, target_imgs,
                truncation=truncation, truncation_latent=trunc,
                num_layers_shift=num_layers_shift,
                compute_dtype=compute_dtype,
                fan_params=fan, s3fd_params=sfd,
                return_target_params=return_target_params,
                target_lms=target_lms, target_ok=target_ok)
    else:
        @jax.jit
        def _fn(weights, source_code, params_source, angles_source,
                target_imgs):
            g, a, deca, fan, sfd, trunc = merge_statics(weights, statics)
            return reenact_batch(
                g, a, deca, spec, source_code,
                params_source, angles_source, target_imgs,
                truncation=truncation, truncation_latent=trunc,
                num_layers_shift=num_layers_shift,
                compute_dtype=compute_dtype,
                fan_params=fan, s3fd_params=sfd,
                return_target_params=return_target_params)

    return _fn, weights


def reenact_raw_batch(g_params: Params, a_params: Params, deca_params: Params,
                      spec: DirectionsSpec, sfd_prep: Params, fan_prep: Params,
                      source_code: jnp.ndarray,
                      params_source: Dict[str, jnp.ndarray],
                      angles_source: jnp.ndarray,
                      raw_frames: jnp.ndarray, *,
                      crop_size: int = 256,
                      truncation: float = 0.7,
                      truncation_latent: Optional[jnp.ndarray] = None,
                      num_layers_shift: int = 8,
                      compute_dtype=jnp.float32,
                      fan_params: Optional[Params] = None,
                      s3fd_params: Optional[Params] = None,
                      reuse_landmarks: bool = False,
                      output_u8: bool = False,
                      outputs: str = "full"):
    """The WHOLE per-frame path as one program: raw frames in, reenacted
    faces out. Fuses the preprocessing stage (SFD detect → FAN landmarks →
    FFHQ crop, `utils_inference.py:61-82`) with the reenactment program
    (`run_inference.py:170-195`) so a video chunk is ONE device dispatch
    with no host round-trip between detection and synthesis (the unfused
    CLI path synced a 16-bool in-frame mask to the host between the two
    programs).

    raw_frames: (T, H, W, 3) uint8/float RGB at the detection resolution
    (the host only rescales to the detect width and uploads uint8).

    ``outputs`` selects what crosses the host link (the usual bottleneck
    on tunneled/thin links — PERF.md e2e-video analysis):
      * "full" — (reenacted (T, s, s, 3), latents, crops_u8
        (T, crop, crop, 3) uint8, ok (T,), in_frame (T,), landmarks
        (T, 68, 2));
      * "grid" — ([crop|reenacted] u8 grid (T, crop, 2·crop, 3), ok,
        in_frame, landmarks): the per-frame video-grid row composed ON
        DEVICE, ONE u8 download per chunk (the constant source cell is
        prepended host-side once); implies uint8;
      * "reenact" — (reenacted u8, ok, in_frame, landmarks): no crop
        download at all — halves the payload when only the reenacted
        frames are saved; implies uint8.

    ``in_frame`` is False where the FFHQ box leaves the frame — those
    crops are APPROXIMATE (edge-clamped resample instead of the
    reference's reflect-pad+blur+fade) and the caller re-runs them
    through the host path. ``output_u8``: return the reenacted images as
    uint8 in [0, 255] (4× smaller host downloads over thin links; saving
    to disk quantizes identically).
    """
    from ..models.face.cropping import ffhq_crop_device, landmarks_in_crop
    from ..models.face.landmarks import estimate_landmarks

    imgs = raw_frames.astype(jnp.float32)
    align_dtype = None if compute_dtype == jnp.float32 else compute_dtype
    pts, ok, _ = estimate_landmarks(sfd_prep, fan_prep, imgs,
                                    compute_dtype=align_dtype)
    crops, in_frame = ffhq_crop_device(imgs, pts, image_size=crop_size)
    crops_gan = crops / 127.5 - 1.0
    kw = dict(truncation=truncation, truncation_latent=truncation_latent,
              num_layers_shift=num_layers_shift, compute_dtype=compute_dtype)
    if reuse_landmarks:
        lms_crop, _ = landmarks_in_crop(pts, image_size=crop_size)
        reenacted, latents = reenact_batch(
            g_params, a_params, deca_params, spec, source_code,
            params_source, angles_source, crops_gan,
            target_lms=lms_crop, target_ok=ok, **kw)
    else:
        reenacted, latents = reenact_batch(
            g_params, a_params, deca_params, spec, source_code,
            params_source, angles_source, crops_gan,
            fan_params=fan_params, s3fd_params=s3fd_params, **kw)
    crops_u8 = crops.astype(jnp.uint8)   # already integer-valued [0,255]
    if output_u8 or outputs in ("grid", "reenact"):
        # round-half-up, the same inter-pass quantization as the device
        # crop (`cropping.py::q8`); the host float path truncates
        # (`tensor_to_image`) — ≤1 intensity-unit deviation, documented
        reenacted = jnp.floor(jnp.clip((reenacted + 1.0) * 127.5,
                                       0.0, 255.0) + 0.5).astype(jnp.uint8)
    if outputs == "grid":
        reen_cell = reenacted
        if reen_cell.shape[1:3] != crops_u8.shape[1:3]:
            # sub-256 test-scale generators: bilinear-resize the reenacted
            # cell to the crop size like the host grid (`generate_grid_image`)
            reen_cell = jnp.clip(jnp.round(jax.image.resize(
                reen_cell.astype(jnp.float32),
                (reen_cell.shape[0],) + crops_u8.shape[1:3] + (3,),
                "bilinear")), 0, 255).astype(jnp.uint8)
        grid = jnp.concatenate([crops_u8, reen_cell], axis=2)
        return grid, ok, in_frame, pts
    if outputs == "reenact":
        return reenacted, ok, in_frame, pts
    return reenacted, latents, crops_u8, ok, in_frame, pts


def make_fused_reenact_fn(g_params: Params, a_params: Params,
                          deca_params: Params, spec: DirectionsSpec,
                          sfd_prep: Params, fan_prep: Params, *,
                          crop_size: int = 256,
                          truncation: float = 0.7,
                          truncation_latent: Optional[jnp.ndarray] = None,
                          num_layers_shift: int = 8,
                          compute_dtype=jnp.float32,
                          fan_params: Optional[Params] = None,
                          s3fd_params: Optional[Params] = None,
                          reuse_landmarks: bool = False,
                          output_u8: bool = False, mesh=None,
                          outputs: str = "full"):
    """Jitted fused pipeline: (source_code, params_source, angles_source,
    raw_frames) → (reenacted, latents, crops_u8, ok, in_frame, landmarks)
    — or the reduced "grid"/"reenact" output sets (see
    :func:`reenact_raw_batch`). ``mesh`` shards the raw-frame batch on
    axis 0 (frame data parallelism) with the weights replicated."""
    from ..train.steps import merge_statics, strip_statics

    weights, statics = strip_statics(
        (g_params, a_params, deca_params, fan_params, s3fd_params,
         sfd_prep, fan_prep, truncation_latent))

    @jax.jit
    def _fn(weights, source_code, params_source, angles_source, raw_frames):
        g, a, deca, fan, sfd, sp, fp, trunc = merge_statics(weights, statics)
        return reenact_raw_batch(
            g, a, deca, spec, sp, fp, source_code, params_source,
            angles_source, raw_frames, crop_size=crop_size,
            truncation=truncation, truncation_latent=trunc,
            num_layers_shift=num_layers_shift, compute_dtype=compute_dtype,
            fan_params=fan, s3fd_params=sfd,
            reuse_landmarks=reuse_landmarks, output_u8=output_u8,
            outputs=outputs)

    place_batch = None
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch
        weights = replicate(mesh, weights)
        place_batch = lambda t: shard_batch(mesh, t)

    def fn(source_code, params_source, angles_source, raw_frames):
        if place_batch is not None:
            from ..parallel.mesh import replicate
            raw_frames = place_batch(jnp.asarray(raw_frames))
            source_code, params_source, angles_source = replicate(
                mesh, (jnp.asarray(source_code), params_source,
                       angles_source))
        return _fn(weights, source_code, params_source, angles_source,
                   raw_frames)

    return fn


def make_reenact_fn(g_params: Params, a_params: Params, deca_params: Params,
                    spec: DirectionsSpec, *, truncation: float = 0.7,
                    truncation_latent: Optional[jnp.ndarray] = None,
                    num_layers_shift: int = 8, compute_dtype=jnp.float32,
                    fan_params: Optional[Params] = None,
                    s3fd_params: Optional[Params] = None, mesh=None,
                    return_target_params: bool = False,
                    reuse_landmarks: bool = False):
    """Jitted reenactor: (source_code, params_source, angles_source,
    target_imgs) → (reenacted, latents). ``fan_params`` enables the
    reference's FAN-warp DECA alignment on the target frames;
    ``s3fd_params`` upgrades it to the faithful SFD-crop→FAN chain.

    ``mesh``: a `jax.sharding.Mesh` — the frozen weights are replicated
    over it and every target-frame batch is sharded on axis 0 (frame data
    parallelism; the frame batch must divide the mesh)."""
    _fn, weights = make_reenact_program(
        g_params, a_params, deca_params, spec, truncation=truncation,
        truncation_latent=truncation_latent,
        num_layers_shift=num_layers_shift, compute_dtype=compute_dtype,
        fan_params=fan_params, s3fd_params=s3fd_params,
        return_target_params=return_target_params,
        reuse_landmarks=reuse_landmarks)

    place_batch = None
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch
        weights = replicate(mesh, weights)
        place_batch = lambda t: shard_batch(mesh, t)

    def fn(source_code, params_source, angles_source, target_imgs, *extra):
        if place_batch is not None:
            from ..parallel.mesh import replicate
            target_imgs = place_batch(jnp.asarray(target_imgs))
            extra = tuple(place_batch(jnp.asarray(e)) for e in extra)
            source_code, params_source, angles_source = replicate(
                mesh, (jnp.asarray(source_code), params_source,
                       angles_source))
        return _fn(weights, source_code, params_source, angles_source,
                   target_imgs, *extra)

    return fn
