"""Jitted training steps for the three training methods.

TPU-first re-design of the loops in `libs/trainer.py:135-405` (reference):
each step — sample/load inputs, DECA both sides, Δp, A, shifted synthesis,
DECA with grad, loss, Adam on A — compiles into ONE XLA program. The deep
backward chain (loss → FLAME → ResNet50 → image → StyleGAN2 → A,
`SURVEY.md §3.4`) is plain jax.grad.

Optimizer matches torch Adam(lr, weight_decay=5e-4) (`trainer.py:144`):
weight decay is added to the gradient *before* the moment updates.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..configs.arguments import TrainingArguments
from ..geometry.directions import (DirectionsSpec, make_shift_vector,
                                   make_shift_vector_50)
from ..models.deca.deca import calculate_shapemodel
from ..models.stylegan2 import mapping, n_latent_for
from ..pipeline.synthesis import generate_image
from .losses_stack import calculate_losses, calculate_losses_paired

Params = Dict[str, Any]


class FrozenModels(NamedTuple):
    """The frozen model zoo closed over by the jitted steps.

    ``fan`` (optional) enables the reference's DECA preprocessing — FAN
    landmarks → bbox → similarity warp to 224
    (`decalib/datasets/datasets.py:57-86`) — on every shape-model call;
    ``s3fd`` (optional) upgrades the bbox to the faithful SFD-crop→FAN
    chain (`decalib/datasets/detectors.py:23-42`). When fan is None, DECA
    consumes a plain bilinear resize."""
    generator: Params
    deca: Params
    id_backbone: Params
    lpips: Params
    truncation_latent: jnp.ndarray
    fan: Optional[Params] = None
    s3fd: Optional[Params] = None


def make_align_fn(models: FrozenModels, args: TrainingArguments):
    """DECA alignment for the training/eval paths: the reference FAN-warps
    every image before DECA (`datasets.py:57-86`); `args.deca_alignment`
    picks 'fan' (default: the faithful SFD-crop→FAN bbox when models.s3fd
    is present, FAN-on-frame otherwise), 'fan_frame' (FAN on the full 256
    frame — no detector pass), or 'resize' (fast path)."""
    mode = getattr(args, "deca_alignment", "fan")
    if mode not in ("fan", "fan_frame"):
        return None
    if getattr(models, "fan", None) is None:
        return None
    from ..pipeline.alignment import make_fan_align
    sfd = getattr(models, "s3fd", None) if mode == "fan" else None
    # return_ok=True → calculate_shapemodel zeroes coefficients and writes
    # the −180° sentinel on failed SFD detections, exactly like the
    # reference's extract_DECA_params does in training AND inference
    # (estimate_DECA.py:33-51 via generic.calculate_shapemodel)
    return make_fan_align(models.fan, s3fd_params=sfd, return_ok=True)


def make_optimizer(args: TrainingArguments) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent."""
    return optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-args.lr),
    )


def _lambdas(args: TrainingArguments) -> Dict[str, float]:
    return {
        "lambda_identity": args.lambda_identity,
        "lambda_perceptual": args.lambda_perceptual,
        "lambda_pixel_wise": args.lambda_pixel_wise,
        "lambda_shape": args.lambda_shape,
        "lambda_mouth_shape": args.lambda_mouth_shape,
        "lambda_eye_shape": args.lambda_eye_shape,
        "lambda_w_reg": args.lambda_w_reg,
    }



_STATIC_KEYS = ("meta", "_meta")


def strip_statics(tree):
    """Split a params pytree into (array-only tree, statics) so it can ride
    through jit as an ARGUMENT (weights as runtime inputs keep the HLO small
    — baking 100s of MB of frozen weights as constants overflows the
    compile pipeline) while 'meta'/'_meta' config dicts stay static."""
    if isinstance(tree, dict):
        arrays, statics = {}, {}
        for k, v in tree.items():
            if k in _STATIC_KEYS:
                statics[k] = v
            else:
                a, st = strip_statics(v)
                arrays[k] = a
                if st:
                    statics[k] = st
        return arrays, statics
    if isinstance(tree, (list, tuple)):
        pairs = [strip_statics(v) for v in tree]
        arrays = [a for a, _ in pairs]
        statics = {i: st for i, (_, st) in enumerate(pairs) if st}
        if hasattr(tree, "_fields"):          # NamedTuple
            return type(tree)(*arrays), statics
        if isinstance(tree, tuple):
            return tuple(arrays), statics
        return arrays, statics
    return tree, {}


def merge_statics(tree, statics):
    """Inverse of :func:`strip_statics`."""
    if not statics:
        return tree
    if isinstance(tree, dict):
        out = dict(tree)
        for k, st in statics.items():
            if k in _STATIC_KEYS:
                out[k] = st
            else:
                out[k] = merge_statics(tree[k], st)
        return out
    if isinstance(tree, (list, tuple)):
        items = list(tree)
        for i, st in statics.items():
            items[i] = merge_statics(items[i], st)
        if hasattr(tree, "_fields"):
            return type(tree)(*items)
        if isinstance(tree, tuple):
            return tuple(items)
        return items
    return tree


def split_a(a_params: Params):
    """Separate the float-trainable leaves from the static metadata so
    jax.grad / optax never see integer leaves."""
    trainable = {k: v for k, v in a_params.items() if k != "meta"}
    meta = a_params.get("meta")

    def rebuild(t):
        return {**t, "meta": meta} if meta is not None else dict(t)

    return trainable, rebuild



def _a_apply(a_train: Params, delta_p: jnp.ndarray,
             args: TrainingArguments) -> jnp.ndarray:
    """direction_matrix_forward using static config (jit-safe: no int
    leaves ride through the traced pytree)."""
    x = delta_p.reshape(-1, args.learned_directions)
    out = jnp.dot(x, a_train["weight"].T, preferred_element_type=jnp.float32)
    if "bias" in a_train:
        out = out + a_train["bias"]
    if args.w_plus:
        out = out.reshape(x.shape[0], args.num_layers_shift, -1)
    return out


def _maybe_remat(args: TrainingArguments, fn):
    """`args.remat`: rematerialize this block in the backward pass
    (jax.checkpoint) instead of storing its activations — HBM for FLOPs.
    Measured 1.54× step time at 256²/batch 16 where memory is NOT the
    constraint (PERF.md training batch sweep), so it ships opt-in: its
    value is memory-constrained configs (1024 generators, big batches on
    smaller chips). Numerics are exactly the plain step's
    (`test_trainer_e2e.py::test_remat_step_matches_plain`)."""
    return jax.checkpoint(fn) if getattr(args, "remat", False) else fn


def _compute_dtype(args: TrainingArguments):
    return (jnp.bfloat16 if getattr(args, "train_compute_dtype", "float32")
            == "bfloat16" else jnp.float32)


def _shift_and_indices(spec, args, params_source, params_target,
                       angles_source, angles_target, rng):
    if args.disentanglement_50:
        return make_shift_vector_50(spec, params_source, params_target,
                                    angles_source, angles_target, rng)
    sv = make_shift_vector(spec, params_source, params_target,
                           angles_source, angles_target)
    return sv, jnp.zeros((angles_source.shape[0] // 2,), jnp.int32)


def _batch_constrainer(mesh):
    """Sharding constraint pinning axis 0 to the mesh's data axis — makes
    device-sampled batches (z draws) actually shard instead of relying on
    the propagation pass. Identity when no mesh is given."""
    if mesh is None:
        return lambda x: x
    from ..parallel.mesh import batch_sharding
    s = batch_sharding(mesh)  # all mesh axes: dp, or (dcn, dp) on a pod
    return lambda x: jax.lax.with_sharding_constraint(x, s)


def _loss_grads_update(tx, grads_only, loss_fn_t, trainable, opt_state):
    """Shared step tail: grads, then (unless ``grads_only``) the Adam
    update. ``grads_only`` returns ``(loss_dict, grads)`` for the
    accumulation wrapper; grad_norm is added at finalize there."""
    (loss, loss_dict), grads = jax.value_and_grad(
        loss_fn_t, has_aux=True)(trainable)
    if grads_only:
        return loss_dict, grads
    # gradient observability (the reference's wandb.watch,
    # `libs/trainer.py:123-133`): global L2 norm of the A-matrix grads
    loss_dict["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return trainable, opt_state, loss_dict


def make_synthetic_step(models: FrozenModels, spec: DirectionsSpec,
                        args: TrainingArguments,
                        tx: optax.GradientTransformation,
                        mesh=None, grads_only: bool = False) -> Callable:
    """`Trainer.train()` step (`trainer.py:151-189`): z-sampled source and
    target, losses vs the source image + gt-reenacted shape.

    ``grads_only``: return ``(loss_dict, grads)`` instead of applying the
    optimizer — the per-microbatch program of :func:`make_accum_step`."""
    lambdas = _lambdas(args)
    models_arrays, models_statics = strip_statics(models)
    constrain = _batch_constrainer(mesh)

    @jax.jit
    def _step(trainable: Params, opt_state, rng: jax.Array,
              models_arrays: FrozenModels):
        models = merge_statics(models_arrays, models_statics)
        align = make_align_fn(models, args)

        def shapemodel(imgs):
            return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                        image_size=args.deca_image_size)

        k_src, k_tgt, k_dir = jax.random.split(rng, 3)
        z_src = constrain(jax.random.normal(k_src,
                                            (args.batch_size, args.dim_z)))
        z_tgt = constrain(jax.random.normal(k_tgt,
                                            (args.batch_size, args.dim_z)))

        imgs_source, _ = generate_image(
            models.generator, z_src, truncation=args.truncation,
            truncation_latent=models.truncation_latent, return_latents=True,
            compute_dtype=_compute_dtype(args))
        imgs_source = jax.lax.stop_gradient(imgs_source)
        params_source, angles_source = shapemodel(imgs_source)

        imgs_target = jax.lax.stop_gradient(generate_image(
            models.generator, z_tgt, truncation=args.truncation,
            truncation_latent=models.truncation_latent,
            compute_dtype=_compute_dtype(args)))
        params_target, angles_target = shapemodel(imgs_target)

        params_source = jax.lax.stop_gradient(params_source)
        params_target = jax.lax.stop_gradient(params_target)
        angles_source = jax.lax.stop_gradient(angles_source)
        angles_target = jax.lax.stop_gradient(angles_target)

        shift_vector, target_indices = _shift_and_indices(
            spec, args, params_source, params_target, angles_source,
            angles_target, k_dir)

        def loss_fn_t(a_train):
            shift = _a_apply(a_train, shift_vector, args)

            def synth(shift):
                return generate_image(
                    models.generator, z_src, truncation=args.truncation,
                    truncation_latent=models.truncation_latent,
                    shift_code=shift, input_is_latent=False,
                    return_latents=True,
                    num_layers_shift=args.num_layers_shift,
                    w_plus=args.w_plus, compute_dtype=_compute_dtype(args))

            def shape_and_losses(imgs_shifted):
                params_shifted, _ = shapemodel(imgs_shifted)
                return calculate_losses(
                    models.deca, models.id_backbone, models.lpips, spec,
                    lambdas, params_source, angles_source, params_shifted,
                    params_target, shift_vector, target_indices,
                    imgs_source, imgs_shifted,
                    disentanglement_50=args.disentanglement_50)

            imgs_shifted, _ = _maybe_remat(args, synth)(shift)
            return _maybe_remat(args, shape_and_losses)(imgs_shifted)

        return _loss_grads_update(tx, grads_only, loss_fn_t, trainable,
                                  opt_state)

    if grads_only:
        def step(a_params: Params, rng, *extra):
            return _step(split_a(a_params)[0], None, rng, models_arrays,
                         *extra)
    else:
        def step(a_params: Params, opt_state, rng, *extra):
            trainable, rebuild = split_a(a_params)
            trainable, opt_state, loss_dict = _step(trainable, opt_state, rng,
                                                    models_arrays, *extra)
            return rebuild(trainable), opt_state, loss_dict

    return step


def make_real_step(models: FrozenModels, spec: DirectionsSpec,
                   args: TrainingArguments,
                   tx: optax.GradientTransformation,
                   synthetic_half: bool = False, mesh=None,
                   cached_shape: bool = False,
                   grads_only: bool = False) -> Callable:
    """`Trainer.train_real()` step (`trainer.py:247-308`): source = real
    inverted W+ codes (+ optional synthetic half for 'real_synthetic'),
    target = random z.

    ``cached_shape=True``: the real source frames' DECA coefficients ride
    in as step inputs (Trainer memoizes them — they are training
    invariants; see `make_paired_step`). The synthetic half (if any) and
    the z-sampled target still compute their passes in-step."""
    lambdas = _lambdas(args)
    models_arrays, models_statics = strip_statics(models)
    n_lat = n_latent_for(args.image_resolution)
    constrain = _batch_constrainer(mesh)

    def _step_body(trainable: Params, opt_state, rng: jax.Array,
                   models_arrays: FrozenModels,
                   source_w: jnp.ndarray, source_real_img: jnp.ndarray,
                   cached_src=None):
        models = merge_statics(models_arrays, models_statics)
        align = make_align_fn(models, args)

        def shapemodel(imgs):
            return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                        image_size=args.deca_image_size)

        k_tgt, k_dir, k_syn = jax.random.split(rng, 3)

        if synthetic_half:
            half = args.batch_size // 2
            z_syn = jax.random.normal(k_syn, (half, args.dim_z))
            w_syn = mapping(models.generator, z_syn)
            w_syn = jnp.repeat(w_syn[:, None, :], n_lat, axis=1)
            imgs_syn = jax.lax.stop_gradient(generate_image(
                models.generator, w_syn, truncation=args.truncation,
                truncation_latent=models.truncation_latent,
                input_is_latent=True, compute_dtype=_compute_dtype(args)))
            source_w = jnp.concatenate([source_w, w_syn], axis=0)
            source_real_img = jnp.concatenate([source_real_img, imgs_syn],
                                              axis=0)

        if cached_src is None:
            params_source, angles_source = jax.lax.stop_gradient(
                shapemodel(source_real_img))
        elif synthetic_half:
            # real half from the cache; synthetic half computed in-step
            p_real, ang_real = cached_src
            p_syn, ang_syn = jax.lax.stop_gradient(shapemodel(imgs_syn))
            params_source = {k: jnp.concatenate([p_real[k], p_syn[k]], axis=0)
                             for k in p_real}
            angles_source = jnp.concatenate([ang_real, ang_syn], axis=0)
        else:
            params_source, angles_source = cached_src

        z_tgt = constrain(jax.random.normal(k_tgt,
                                            (args.batch_size, args.dim_z)))
        imgs_target = jax.lax.stop_gradient(generate_image(
            models.generator, z_tgt, truncation=args.truncation,
            truncation_latent=models.truncation_latent,
            compute_dtype=_compute_dtype(args)))
        params_target, angles_target = jax.lax.stop_gradient(
            shapemodel(imgs_target))

        shift_vector, target_indices = _shift_and_indices(
            spec, args, params_source, params_target, angles_source,
            angles_target, k_dir)

        def loss_fn_t(a_train):
            shift = _a_apply(a_train, shift_vector, args)

            def synth(shift):
                return generate_image(
                    models.generator, source_w, truncation=args.truncation,
                    truncation_latent=models.truncation_latent,
                    shift_code=shift, input_is_latent=True,
                    return_latents=True,
                    num_layers_shift=args.num_layers_shift,
                    w_plus=args.w_plus, compute_dtype=_compute_dtype(args))

            def shape_and_losses(imgs_shifted):
                params_shifted, _ = shapemodel(imgs_shifted)
                return calculate_losses(
                    models.deca, models.id_backbone, models.lpips, spec,
                    lambdas, params_source, angles_source, params_shifted,
                    params_target, shift_vector, target_indices,
                    source_real_img, imgs_shifted,
                    disentanglement_50=args.disentanglement_50)

            imgs_shifted, _ = _maybe_remat(args, synth)(shift)
            return _maybe_remat(args, shape_and_losses)(imgs_shifted)

        return _loss_grads_update(tx, grads_only, loss_fn_t, trainable,
                                  opt_state)

    if cached_shape:
        @jax.jit
        def _step(trainable, opt_state, rng, models_arrays,
                  source_w, source_real_img, p_src, ang_src):
            return _step_body(trainable, opt_state, rng, models_arrays,
                              source_w, source_real_img, (p_src, ang_src))
    else:
        @jax.jit
        def _step(trainable, opt_state, rng, models_arrays,
                  source_w, source_real_img):
            return _step_body(trainable, opt_state, rng, models_arrays,
                              source_w, source_real_img)

    if grads_only:
        def step(a_params: Params, rng, *extra):
            return _step(split_a(a_params)[0], None, rng, models_arrays,
                         *extra)
    else:
        def step(a_params: Params, opt_state, rng, *extra):
            trainable, rebuild = split_a(a_params)
            trainable, opt_state, loss_dict = _step(trainable, opt_state, rng,
                                                    models_arrays, *extra)
            return rebuild(trainable), opt_state, loss_dict

    return step


def make_paired_step(models: FrozenModels, spec: DirectionsSpec,
                     args: TrainingArguments,
                     tx: optax.GradientTransformation, mesh=None,
                     cached_shape: bool = False,
                     grads_only: bool = False) -> Callable:
    """`Trainer.train_paired()` step (`trainer.py:349-397`): same-video
    source/target frame pairs; losses vs the real target frame.

    ``cached_shape=True`` builds the variant that takes the source/target
    DECA coefficients as step INPUTS instead of recomputing them: the
    reference re-runs its FAN-align + DECA-encode pass on the same fixed
    dataset frames every step (`trainer.py:361-365`), but those
    coefficients are training invariants (stop-gradient, deterministic
    per frame) — the Trainer memoizes them host-side (~1 KB/frame) and
    the step drops two of its three alignment+encode passes plus the
    source-image upload. The shifted image's pass (the one under grad)
    still runs in-step."""
    lambdas = _lambdas(args)
    models_arrays, models_statics = strip_statics(models)

    def _step_body(trainable, opt_state, models_arrays, source_w, target_w,
                   target_img, source_img=None, cached=None):
        """Shared body; exactly one of source_img (recompute the GT
        coefficients) or cached (take them as inputs) is set."""
        models = merge_statics(models_arrays, models_statics)
        align = make_align_fn(models, args)

        def shapemodel(imgs):
            return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                        image_size=args.deca_image_size)

        if cached is None:
            params_source, angles_source = jax.lax.stop_gradient(
                shapemodel(source_img))
            params_target, angles_target = jax.lax.stop_gradient(
                shapemodel(target_img))
        else:
            params_source, angles_source, params_target, angles_target = cached

        shift_vector = make_shift_vector(spec, params_source, params_target,
                                         angles_source, angles_target)

        def loss_fn_t(a_train):
            shift = _a_apply(a_train, shift_vector, args)

            def synth(shift):
                return generate_image(
                    models.generator, source_w, truncation=args.truncation,
                    truncation_latent=models.truncation_latent,
                    shift_code=shift, input_is_latent=True,
                    return_latents=True,
                    num_layers_shift=args.num_layers_shift,
                    w_plus=args.w_plus, compute_dtype=_compute_dtype(args))

            def shape_and_losses(imgs_shifted, shifted_latents):
                params_shifted, _ = shapemodel(imgs_shifted)
                return calculate_losses_paired(
                    models.deca, models.id_backbone, models.lpips, lambdas,
                    params_shifted, params_target, imgs_shifted, target_img,
                    shifted_latents, target_w)

            imgs_shifted, shifted_latents = _maybe_remat(args, synth)(shift)
            return _maybe_remat(args, shape_and_losses)(imgs_shifted,
                                                        shifted_latents)

        return _loss_grads_update(tx, grads_only, loss_fn_t, trainable,
                                  opt_state)

    if cached_shape:
        @jax.jit
        def inner(trainable, opt_state, rng, models_arrays,
                  source_w, target_w, target_img,
                  params_source, angles_source, params_target, angles_target):
            return _step_body(trainable, opt_state, models_arrays, source_w,
                              target_w, target_img,
                              cached=(params_source, angles_source,
                                      params_target, angles_target))
    else:
        @jax.jit
        def inner(trainable, opt_state, rng, models_arrays,
                  source_w, source_img, target_w, target_img):
            return _step_body(trainable, opt_state, models_arrays, source_w,
                              target_w, target_img, source_img=source_img)

    if grads_only:
        def step(a_params: Params, rng, *extra):
            return inner(split_a(a_params)[0], None, rng, models_arrays,
                         *extra)
    else:
        def step(a_params: Params, opt_state, rng, *extra):
            trainable, rebuild = split_a(a_params)
            trainable, opt_state, loss_dict = inner(trainable, opt_state, rng,
                                                    models_arrays, *extra)
            return rebuild(trainable), opt_state, loss_dict

    return step


def make_accum_step(builder: Callable, models: FrozenModels,
                    spec: DirectionsSpec, args: TrainingArguments,
                    tx: optax.GradientTransformation,
                    n_micro: Optional[int] = None, **builder_kw) -> Callable:
    """Gradient-accumulation microbatching around any step builder.

    Splits each batch into ``n_micro`` microbatches (default
    ``args.grad_accum``), runs the builder's grads-only program per
    microbatch, AVERAGES the grads, and applies ONE Adam update — the
    optimizer semantics are identical to the monolithic step because every
    loss in the stack is mean-reduced over the batch
    (`losses_stack.py`; mean of equal-size microbatch means == full-batch
    mean), pinned by `test_trainer_e2e.py::test_accum_step_matches_monolithic`.

    Every compiled program runs at MICROBATCH shape, which is how
    `run_trainer --batch_size 24/48` dodges the measured XLA:TPU runtime
    fault at those batch shapes (PERF.md training batch sweep;
    `tools/repro_batch24_fault.py` is the minimal upstream repro): 24 → 2×12,
    48 → 3×16 — both known-good shapes.

    In-step randomness (synthetic/real z draws, disentanglement-50
    direction picks) uses an independent fold of the step rng per
    microbatch — distributionally identical to the monolithic step, not
    bit-identical (the paired method has no in-step randomness and matches
    to float tolerance)."""
    import dataclasses

    n_micro = int(n_micro if n_micro is not None
                  else getattr(args, "grad_accum", 1))
    if n_micro <= 1:
        return builder(models, spec, args, tx, **builder_kw)
    if args.batch_size % n_micro:
        raise ValueError(f"grad_accum {n_micro} must divide batch_size "
                         f"{args.batch_size}")
    mesh = builder_kw.get("mesh")
    if mesh is not None and (args.batch_size // n_micro) % mesh.size:
        raise ValueError(
            f"microbatch {args.batch_size // n_micro} "
            f"(batch_size/grad_accum) must divide the {mesh.size}-device "
            "mesh for data-parallel training")
    mb_args = dataclasses.replace(args, batch_size=args.batch_size // n_micro,
                                  grad_accum=1)
    grad_step = builder(models, spec, mb_args, tx, grads_only=True,
                        **builder_kw)

    @jax.jit
    def _add(a, b):
        return jax.tree_util.tree_map(jnp.add, a, b)

    @jax.jit
    def _finalize(trainable, opt_state, gsum, ldsum):
        grads = jax.tree_util.tree_map(lambda x: x / n_micro, gsum)
        loss_dict = {k: v / n_micro for k, v in ldsum.items()}
        loss_dict["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss_dict

    def _slice(tree, i):
        def f(x):
            k, rem = divmod(x.shape[0], n_micro)
            if rem:
                raise ValueError(
                    f"batch axis {x.shape[0]} not divisible by grad_accum "
                    f"{n_micro}")
            return x[i * k:(i + 1) * k]
        return jax.tree_util.tree_map(f, tree)

    def step(a_params: Params, opt_state, rng, *extra):
        trainable, rebuild = split_a(a_params)
        keys = jax.random.split(rng, n_micro)
        gsum = ldsum = None
        for i in range(n_micro):
            ld, g = grad_step(a_params, keys[i], *_slice(extra, i))
            gsum = g if gsum is None else _add(gsum, g)
            ldsum = ld if ldsum is None else _add(ldsum, ld)
        trainable, opt_state, loss_dict = _finalize(trainable, opt_state,
                                                    gsum, ldsum)
        return rebuild(trainable), opt_state, loss_dict

    return step


def make_shape_program(models: FrozenModels, args: TrainingArguments):
    """One jitted alignment+DECA-encode pass over a batch of GAN-range
    images — the Trainer's cache-fill program for `cached_shape` training
    (same math as the in-step `shapemodel` closures above)."""
    models_arrays, models_statics = strip_statics(models)

    @jax.jit
    def _shape(models_arrays: FrozenModels, imgs: jnp.ndarray):
        models = merge_statics(models_arrays, models_statics)
        align = make_align_fn(models, args)
        return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                    image_size=args.deca_image_size)

    def shape(imgs):
        return _shape(models_arrays, imgs)

    return shape
