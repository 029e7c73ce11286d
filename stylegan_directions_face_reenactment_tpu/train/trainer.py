"""Host-side training orchestration (logging, eval, checkpoints, loops).

Equivalent of `libs/trainer.py` (reference `Trainer`): dispatches the
synthetic / real / real_synthetic / paired training methods, logs losses
every ``steps_per_log``, evaluates every ``steps_per_ev_log``, saves the
A-matrix bundle every ``steps_per_save``, and rebuilds the paired dataset
every epoch to resample pairs (`trainer.py:398-404`).

Device work happens in the jitted step functions (`train/steps.py`);
this class only moves host data and bookkeeping. Multi-chip scaling: pass
a `jax.sharding.Mesh` (see `parallel/mesh.py::make_mesh`) and the frozen
zoo, A, and optimizer state are replicated over it while every host batch
is sharded on axis 0; gradient reduction rides ICI via the psum XLA
inserts for the replicated grad out-sharding.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs.arguments import TrainingArguments
from ..data.datasets import (CustomDataset, CustomDatasetPaired,
                             CustomDatasetPairedValidation,
                             CustomDatasetTestsetReal,
                             CustomDatasetTestsetSynthetic, Loader)
from ..geometry.directions import DirectionsSpec, initialize_directions
from ..models.direction_matrix import init_direction_matrix
from ..parallel.mesh import replicate, shard_batch
from .checkpoints import save_a_matrix, start_from_checkpoint
from .eval import extract_evaluation_metrics
from .steps import (FrozenModels, make_accum_step, make_optimizer,
                    make_paired_step, make_real_step, make_synthetic_step)

Params = Dict[str, Any]


class Trainer:
    """Direction-matrix training driver."""

    def __init__(self, args: TrainingArguments, models: FrozenModels,
                 spec: Optional[DirectionsSpec] = None,
                 mesh=None, log_fn: Callable[[str], None] = print):
        self.args = args
        self.spec = spec or initialize_directions(
            args.dataset_type, args.learned_directions, args.shift_scale)
        self.mesh = mesh
        self.log_fn = log_fn
        if mesh is not None:
            if args.batch_size % mesh.size != 0:
                raise ValueError(
                    f"batch_size {args.batch_size} must divide the mesh "
                    f"({mesh.size} devices) for data-parallel training")
            models = type(models)(*replicate(mesh, tuple(models)))
        self.models = models

        self.output_path = args.experiment_path
        self.models_dir = os.path.join(self.output_path, "models")
        self.images_dir = os.path.join(self.output_path, "images")
        self.logs_dir = os.path.join(self.output_path, "logs")
        for d in (self.models_dir, self.images_dir, self.logs_dir):
            os.makedirs(d, exist_ok=True)
        with open(os.path.join(self.output_path, "arguments.json"), "w") as f:
            json.dump({k: v for k, v in vars(args).items()}, f, indent=2,
                      default=str)

        self.tx = make_optimizer(args)
        self.metrics_log: list = []
        n_micro = int(getattr(args, "grad_accum", 1) or 1)
        if n_micro > 1 and args.batch_size % n_micro:
            raise ValueError(f"grad_accum {n_micro} must divide batch_size "
                             f"{args.batch_size}")

    def _make_step(self, builder, **kw):
        """Build the method's step — through the gradient-accumulation
        wrapper when args.grad_accum > 1 (identical Adam semantics, every
        program at microbatch shape; steps.make_accum_step)."""
        n_micro = int(getattr(self.args, "grad_accum", 1) or 1)
        if n_micro > 1:
            return make_accum_step(builder, self.models, self.spec,
                                   self.args, self.tx, n_micro,
                                   mesh=self.mesh, **kw)
        return builder(self.models, self.spec, self.args, self.tx,
                       mesh=self.mesh, **kw)

    # ------------------------------------------------------------------
    def _init_a(self, rng) -> Params:
        step0, resumed = start_from_checkpoint(self.args.resume_training_model)
        if resumed is not None:
            self.log_fn(f"Resume training from step {step0}")
            return step0, resumed
        a = init_direction_matrix(
            rng, 512, self.args.learned_directions, w_plus=self.args.w_plus,
            num_layers=self.args.num_layers_shift)
        return 0, a

    # ---- multi-device placement --------------------------------------
    def _rep(self, tree):
        """Replicate a pytree over the mesh (identity when single-device)."""
        return replicate(self.mesh, tree) if self.mesh is not None else tree

    def _batch(self, x) -> jnp.ndarray:
        """Host batch → device: axis 0 sharded over the mesh when the
        size divides it, replicated otherwise (small eval remainders)."""
        if self.mesh is None:
            return jnp.asarray(x)
        arr = np.asarray(x)
        if arr.shape[0] % self.mesh.size == 0:
            return shard_batch(self.mesh, arr)
        return replicate(self.mesh, arr)

    def _log(self, step: int, loss_dict: Dict[str, jnp.ndarray],
             mean_loss: float, epoch: Optional[int] = None):
        if step % self.args.steps_per_log == 0:
            head = (f"[epoch {epoch:04d}, step {step}]" if epoch is not None
                    else f"[step {step}]")
            body = " | ".join(f"{k}: {float(v):.2f}"
                              for k, v in loss_dict.items())
            self.log_fn(f"{head} | {body} | Mean Loss {mean_loss:.2f}")
            # scalar stream (the reference's wandb.log equivalent,
            # `trainer.py:195-199`): one JSON line per log step
            rec = {"step": step, **{k: float(v) for k, v in loss_dict.items()}}
            if epoch is not None:
                rec["epoch"] = epoch
            with open(os.path.join(self.logs_dir, "train_log.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")
            if self.args.use_wandb:
                try:
                    import wandb
                    wandb.log(rec)
                except ImportError:
                    pass  # wandb not installed; jsonl stream stands in

    def _maybe_save(self, a_params: Params, step: int):
        if step % self.args.steps_per_save == 0 and step > 0:
            save_a_matrix(self.models_dir, a_params, step,
                          self.args.learned_directions, self.args.shift_scale,
                          self.args.w_plus, self.args.num_layers_shift)

    def _maybe_eval(self, a_params: Params, step: int):
        """Evaluation cadence (`utils_train.py:506-510`): every
        steps_per_ev_log when evaluation is enabled (incl. step 0, like the
        reference)."""
        if self.args.evaluation and step % self.args.steps_per_ev_log == 0:
            try:
                self.evaluate(a_params, step=step)
            except FileNotFoundError as e:
                self.log_fn(f"[eval step {step}] skipped: {e}")

    # ------------------------------------------------------------------
    def evaluate(self, a_params: Params, step: int = 0,
                 num_samples: Optional[int] = None,
                 save_figure: bool = True) -> Dict[str, float]:
        """Validation pass: CSIM / pose error / expression error over the
        method's test set, plus a source|target|reenacted grid
        (`utils_train.py:735-883` evaluate_model_reenactment)."""
        args = self.args
        num_samples = num_samples or args.validation_samples
        method = args.training_method

        from ..geometry.directions import make_shift_vector
        from ..models.deca.deca import calculate_shapemodel
        from ..models.stylegan2 import n_latent_for
        from ..pipeline.synthesis import generate_image
        from ..utils.image_utils import generate_grid_image
        from .steps import (_a_apply, make_align_fn, merge_statics,
                            strip_statics)
        from PIL import Image

        models_arrays, models_statics = strip_statics(self.models)
        # jitted eval programs are built once per Trainer (retracing them on
        # every evaluate() call would recompile each eval cadence), keyed by
        # every piece of config the closures capture — a mutated args
        # between calls gets fresh programs instead of stale closures
        eval_key = (method, args.deca_alignment, args.deca_image_size,
                    args.truncation, args.num_layers_shift, args.w_plus)
        cached = getattr(self, "_eval_fns", {}).get(eval_key)

        if method == "paired":
            ds = CustomDatasetPairedValidation(args.test_dataset_path,
                                               num_samples=num_samples,
                                               image_size=args.image_resolution)
        elif method in ("real", "real_synthetic"):
            ds = CustomDatasetTestsetReal(args.test_dataset_path,
                                          num_samples=num_samples)
        else:
            ds = CustomDatasetTestsetSynthetic(num_samples=num_samples)

        input_is_latent = method != "synthetic"
        target_is_latent = method == "paired"  # paired targets are W+ codes
        bs = min(args.test_batch_size, len(ds))
        loader = Loader(ds, bs, shuffle=False, drop_last=True)

        @jax.jit
        def eval_batch_paired(a_train, models_arr, source_w, source_img,
                              target_img):
            """Paired eval (`utils_train.py` evaluate_model_reenactment_video):
            DECA on the REAL frames; reenact from the source code; metrics vs
            the real target frame."""
            models = merge_statics(models_arr, models_statics)
            align = make_align_fn(models, args)

            def shapemodel(imgs):
                return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                            image_size=args.deca_image_size)

            params_source, angles_source = shapemodel(source_img)
            params_target, angles_target = shapemodel(target_img)
            sv = make_shift_vector(self.spec, params_source, params_target,
                                   angles_source, angles_target)
            shift = _a_apply(a_train, sv, args)
            imgs_shifted, _ = generate_image(
                models.generator, source_w, truncation=args.truncation,
                truncation_latent=models.truncation_latent,
                shift_code=shift, input_is_latent=True,
                return_latents=True, num_layers_shift=args.num_layers_shift,
                w_plus=args.w_plus)
            params_shifted, angles_shifted = shapemodel(imgs_shifted)
            csim, pose_err, exp_err = extract_evaluation_metrics(
                self.spec, models.id_backbone, params_shifted,
                params_target, angles_shifted, angles_target, imgs_shifted,
                source_img)
            return csim, pose_err, exp_err, source_img, target_img, imgs_shifted

        @jax.jit
        def eval_batch(a_train, models_arr, source_w, target_w):
            models = merge_statics(models_arr, models_statics)
            align = make_align_fn(models, args)

            def shapemodel(imgs):
                return calculate_shapemodel(models.deca, imgs, align_fn=align,
                                            image_size=args.deca_image_size)

            imgs_source, _ = generate_image(
                models.generator, source_w, truncation=args.truncation,
                truncation_latent=models.truncation_latent,
                input_is_latent=input_is_latent, return_latents=True)
            params_source, angles_source = shapemodel(imgs_source)
            imgs_target = generate_image(
                models.generator, target_w, truncation=args.truncation,
                truncation_latent=models.truncation_latent,
                input_is_latent=target_is_latent)
            params_target, angles_target = shapemodel(imgs_target)
            sv = make_shift_vector(self.spec, params_source, params_target,
                                   angles_source, angles_target)
            shift = _a_apply(a_train, sv, args)
            imgs_shifted, _ = generate_image(
                models.generator, source_w, truncation=args.truncation,
                truncation_latent=models.truncation_latent,
                shift_code=shift, input_is_latent=input_is_latent,
                return_latents=True, num_layers_shift=args.num_layers_shift,
                w_plus=args.w_plus)
            params_shifted, angles_shifted = shapemodel(imgs_shifted)
            csim, pose_err, exp_err = extract_evaluation_metrics(
                self.spec, models.id_backbone, params_shifted,
                params_target, angles_shifted, angles_target, imgs_shifted,
                imgs_source)
            return csim, pose_err, exp_err, imgs_source, imgs_target, imgs_shifted

        if cached is None:
            self._eval_fns = {**getattr(self, "_eval_fns", {}),
                              eval_key: (eval_batch_paired, eval_batch)}
        else:
            eval_batch_paired, eval_batch = cached

        from .steps import split_a
        a_train, _ = split_a(a_params)
        a_train = self._rep(a_train)
        csims, poses, exps = [], [], []
        fig = None
        for bi, batch in enumerate(loader):
            if method == "paired":
                # paired validation: real same-video frames + codes
                # (`dataloader_paired.py:151-275`); metrics vs the real
                # target frame like evaluate_model_reenactment_video
                csim, pe, ee, src, tgt, ren = eval_batch_paired(
                    a_train, models_arrays,
                    self._batch(batch["source_latent_code"]),
                    self._batch(batch["source_img"]),
                    self._batch(batch["target_img"]))
            else:
                sw = self._batch(batch["source_w"])
                tw = self._batch(batch["target_w"])
                csim, pe, ee, src, tgt, ren = eval_batch(a_train,
                                                         models_arrays, sw, tw)
            csims.append(float(csim))
            poses.append(float(pe))
            exps.append(float(ee))
            if save_figure and fig is None:
                n = min(args.num_pairs_log, src.shape[0])
                fig = generate_grid_image(np.asarray(src[:n]),
                                          np.asarray(tgt[:n]),
                                          np.asarray(ren[:n]))
        metrics = {"csim": float(np.mean(csims)) if csims else float("nan"),
                   "pose_error": float(np.mean(poses)) if poses else float("nan"),
                   "expression_error": float(np.mean(exps)) if exps else float("nan")}
        if save_figure and fig is not None:
            Image.fromarray(fig).save(
                os.path.join(self.images_dir, f"{step:04d}_reenactment.png"))
        gif_frames = None
        if self.args.gif:
            # per-direction interpolation GIF (`utils_train.py:648-693`
            # log_interpolation / `visualization.py:21-73`)
            from ..utils.visualization import make_interpolation_chart, save_gif
            from ..models.stylegan2 import mapping, n_latent_for
            z = jax.random.normal(jax.random.PRNGKey(0), (1, 512))
            w = mapping(self.models.generator, z)
            lat = jnp.repeat(w[:, None],
                             n_latent_for(args.image_resolution), axis=1)
            gif_frames = make_interpolation_chart(
                self.models.generator, a_params, lat,
                truncation=args.truncation,
                truncation_latent=self.models.truncation_latent,
                num_layers_shift=args.num_layers_shift,
                directions=list(range(min(4, args.learned_directions))),
                shift_scale=args.shift_scale, steps=2)
            save_gif(gif_frames, os.path.join(self.images_dir,
                                              f"{step:04d}_directions.gif"))
        self.metrics_log.append({"step": step, **metrics})
        with open(os.path.join(self.logs_dir, "eval_metrics.json"), "w") as f:
            json.dump(self.metrics_log, f, indent=2)
        if self.args.use_wandb:
            # scalar + image logging parity (`utils_train.py:790-794`
            # reenactment grid, `:865-869` interpolation frames)
            try:
                import wandb
                payload = {f"eval/{k}": v for k, v in metrics.items()}
                payload["step"] = step
                if self.args.log_images_wandb:
                    if fig is not None:
                        payload["eval/reenactment"] = wandb.Image(fig)
                    if gif_frames:
                        payload["eval/interpolation"] = [
                            wandb.Image(np.asarray(f)) for f in gif_frames]
                wandb.log(payload)
            except ImportError:
                pass  # wandb not installed; on-disk artifacts stand in
        self.log_fn(f"[eval step {step}] CSIM {metrics['csim']:.4f} | "
                    f"pose {metrics['pose_error']:.3f}° | "
                    f"exp {metrics['expression_error']:.4f}")
        return metrics

    # ------------------------------------------------------------------
    def train(self, rng: Optional[jax.Array] = None,
              n_steps: Optional[int] = None) -> Params:
        """Synthetic method (`trainer.py:135-199`)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng = self._rep(rng)
        rng, k_init = jax.random.split(rng)
        start_step, a_params = self._init_a(k_init)
        a_params = self._rep(a_params)
        from .steps import split_a
        opt_state = self.tx.init(split_a(a_params)[0])
        step_fn = self._make_step(make_synthetic_step)
        losses = []
        total = n_steps if n_steps is not None else self.args.n_steps
        for step in range(start_step, total):
            rng, k = jax.random.split(rng)
            a_params, opt_state, loss_dict = step_fn(a_params, opt_state, k)
            losses.append(float(loss_dict["loss"]))
            self._log(step, loss_dict, float(np.mean(losses)))
            if step % 500 == 0 and step > 0:
                losses = []
            self._maybe_save(a_params, step)
            self._maybe_eval(a_params, step)
        return a_params

    def train_real(self, rng: Optional[jax.Array] = None,
                   n_epochs: Optional[int] = None) -> Params:
        """Real / real_synthetic methods (`trainer.py:201-310`)."""
        args = self.args
        if args.train_dataset_path is None:
            raise ValueError("train_dataset_path required for method 'real'")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng = self._rep(rng)
        rng, k_init = jax.random.split(rng)
        start_step, a_params = self._init_a(k_init)
        a_params = self._rep(a_params)
        from .steps import split_a
        opt_state = self.tx.init(split_a(a_params)[0])

        synthetic_half = args.training_method == "real_synthetic"
        batch_local = args.batch_size // 2 if synthetic_half else args.batch_size
        use_cache = bool(getattr(args, "cache_gt_shape", True))
        step_fn = self._make_step(make_real_step,
                                  synthetic_half=synthetic_half,
                                  cached_shape=use_cache)
        if use_cache:
            from .steps import make_shape_program
            shape_fn = make_shape_program(self.models, args)
            shape_cache: Dict[str, Any] = {}

        dataset = CustomDataset(args.train_dataset_path,
                                image_size=args.image_resolution)
        loader = Loader(dataset, batch_local, shuffle=True, drop_last=True)
        n_img, n_ids, n_vid = dataset.get_length()
        self.log_fn(f"Training: {n_img} images {n_ids} ids {n_vid} videos")

        global_step = start_step
        losses = []
        epochs = n_epochs if n_epochs is not None else args.n_steps
        for epoch in range(epochs):
            for batch in loader:
                rng, k = jax.random.split(rng)
                if use_cache:
                    p_src, ang_src = self._gt_shape_for_real_batch(
                        shape_fn, shape_cache, batch)
                    a_params, opt_state, loss_dict = step_fn(
                        a_params, opt_state, k, self._batch(batch["w"]),
                        self._batch(batch["real_img"]), p_src, ang_src)
                else:
                    a_params, opt_state, loss_dict = step_fn(
                        a_params, opt_state, k, self._batch(batch["w"]),
                        self._batch(batch["real_img"]))
                losses.append(float(loss_dict["loss"]))
                self._log(global_step, loss_dict, float(np.mean(losses)), epoch)
                if global_step % 500 == 0 and global_step > 0:
                    losses = []
                self._maybe_save(a_params, global_step)
                self._maybe_eval(a_params, global_step)
                global_step += 1
        return a_params

    # ---- GT shape-coefficient cache (paired method) -------------------
    def _gt_shape_for_batch(self, shape_fn, cache: Dict[str, Any], batch):
        """Assemble the batch's source/target DECA coefficients from the
        host-side per-frame cache. Dataset frames are fixed, so their
        (stop-gradient) coefficients are training invariants — the
        reference recomputes them every step (`trainer.py:361-365`). On
        any miss the whole [source;target] stack runs through ONE
        fixed-shape fill program (first-epoch behavior); hits thereafter
        cost only a host stack (~1 KB/frame cached)."""
        keys = list(batch["source_path"]) + list(batch["target_path"])
        if any(k not in cache for k in keys):
            imgs = np.concatenate([np.asarray(batch["source_img"]),
                                   np.asarray(batch["target_img"])], axis=0)
            self._gt_shape_fill(shape_fn, cache, keys, imgs)
        p_src, a_src = self._gt_shape_stack(cache, batch["source_path"])
        p_tgt, a_tgt = self._gt_shape_stack(cache, batch["target_path"])
        return p_src, a_src, p_tgt, a_tgt

    @staticmethod
    def _gt_shape_fill(shape_fn, cache, keys, imgs):
        params, angles = shape_fn(jnp.asarray(imgs))
        params = {n: np.asarray(v) for n, v in params.items()}
        angles = np.asarray(angles)
        for i, k in enumerate(keys):
            cache[k] = ({n: v[i] for n, v in params.items()}, angles[i])

    def _gt_shape_stack(self, cache, keys):
        entries = [cache[k] for k in keys]
        pd = {n: np.stack([e[0][n] for e in entries]) for n in entries[0][0]}
        an = np.stack([e[1] for e in entries])
        return ({n: self._batch(v) for n, v in pd.items()}, self._batch(an))

    def _gt_shape_for_real_batch(self, shape_fn, cache, batch):
        """Single-sided variant for the real/real_synthetic methods: only
        the real source frames are fixed (targets are z-sampled in-step)."""
        keys = list(batch["path"])
        if any(k not in cache for k in keys):
            self._gt_shape_fill(shape_fn, cache, keys,
                                np.asarray(batch["real_img"]))
        return self._gt_shape_stack(cache, keys)

    def train_paired(self, rng: Optional[jax.Array] = None,
                     n_epochs: Optional[int] = None) -> Params:
        """Paired method — the primary one (`trainer.py:312-405`).

        With ``args.cache_gt_shape`` (default) the fixed dataset frames'
        DECA coefficients are computed once and memoized; the jitted step
        then runs only the shifted image's alignment+encode pass (the one
        under grad). Identical math, two of three shape passes and the
        source-image upload dropped (see `steps.make_paired_step`)."""
        args = self.args
        if args.train_dataset_path is None:
            raise ValueError("train_dataset_path required for method 'paired'")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng = self._rep(rng)
        rng, k_init = jax.random.split(rng)
        start_step, a_params = self._init_a(k_init)
        a_params = self._rep(a_params)
        from .steps import make_shape_program, split_a
        opt_state = self.tx.init(split_a(a_params)[0])
        use_cache = bool(getattr(args, "cache_gt_shape", True))
        step_fn = self._make_step(make_paired_step, cached_shape=use_cache)
        shape_fn = make_shape_program(self.models, args) if use_cache else None
        shape_cache: Dict[str, Any] = {}

        dataset = CustomDatasetPaired(args.train_dataset_path, max_pairs=2,
                                      image_size=args.image_resolution)
        n_img, n_ids, n_vid = dataset.get_length()
        self.log_fn(f"Training: {n_img} pairs {n_ids} ids {n_vid} videos")

        global_step = start_step
        losses = []
        epochs = n_epochs if n_epochs is not None else args.n_steps
        for epoch in range(epochs):
            loader = Loader(dataset, args.batch_size, shuffle=True,
                            drop_last=True, seed=epoch)
            for batch in loader:
                rng, k = jax.random.split(rng)
                if use_cache:
                    p_src, a_src, p_tgt, a_tgt = self._gt_shape_for_batch(
                        shape_fn, shape_cache, batch)
                    a_params, opt_state, loss_dict = step_fn(
                        a_params, opt_state, k,
                        self._batch(batch["source_latent_code"]),
                        self._batch(batch["target_latent_code"]),
                        self._batch(batch["target_img"]),
                        p_src, a_src, p_tgt, a_tgt)
                else:
                    a_params, opt_state, loss_dict = step_fn(
                        a_params, opt_state, k,
                        self._batch(batch["source_latent_code"]),
                        self._batch(batch["source_img"]),
                        self._batch(batch["target_latent_code"]),
                        self._batch(batch["target_img"]))
                losses.append(float(loss_dict["loss"]))
                self._log(global_step, loss_dict, float(np.mean(losses)), epoch)
                if global_step % 500 == 0 and global_step > 0:
                    losses = []
                self._maybe_save(a_params, global_step)
                self._maybe_eval(a_params, global_step)
                global_step += 1
            dataset.resample()  # re-pick pairs each epoch (`trainer.py:398-404`)
        return a_params
