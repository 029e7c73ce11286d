"""Minimal-repro bisection for the batch-24/48 XLA:TPU runtime fault.

PERF.md's training batch sweep found that the paired train step at batch
24 or 48 reproducibly faults the XLA:TPU runtime on v5e ("TPU device
error — often a kernel fault"; batches 16 and 32 run fine, so it is a
shape-specific backend fault, not memory). `run_trainer` now mitigates by
gradient-accumulation microbatching (`steps.make_accum_step`), but the
fault itself belongs upstream — this tool bisects the step into
progressively smaller programs at the faulting batch to find the smallest
one that still faults, producing a self-contained repro suitable for an
XLA bug report.

A fault poisons the TPU client, so every stage runs in its OWN
subprocess; the parent only orchestrates and summarizes.

BISECT RESULT (v5e, 2026-08-21, batch 24): full_step **FAULTS** ("TPU
worker process crashed or restarted ... kernel fault"); every sub-chain
is CLEAN — synthesis fwd and fwd+bwd, DECA encode fwd+bwd, the
ID+LPIPS+pixel loss stack fwd+bwd, synthesis→DECA fwd+bwd, and
synthesis→losses fwd+bwd all run ok at the same batch. The fault needs
the FULL composition (both DECA and loss-net branches off the
synthesized image, FLAME-decode shape losses, and the optimizer in one
program), so the minimal upstream repro IS the full step
(`python tools/repro_batch24_fault.py 24 full_step` — self-contained,
random weights); the stage table documents that no single sub-program
shape is responsible. Mitigation shipped: `run_trainer` auto-microbatches
24→2×12 / 48→3×16 (`steps.make_accum_step`).

  python tools/repro_batch24_fault.py [batch]          # bisect (default 24)
  python tools/repro_batch24_fault.py [batch] STAGE    # run one stage inline
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
STAGES = [
    # name, description — each is a fn(batch) built below in run_stage
    ("full_step", "the complete paired cached-shape train step (known fault)"),
    ("synth_grad", "StyleGAN2 256 synthesis fwd+bwd wrt the shift code"),
    ("synth_fwd", "StyleGAN2 256 synthesis forward only"),
    ("deca_grad", "DECA resize-align encode fwd+bwd wrt the input images"),
    ("losses_grad", "LPIPS+ID+pixel loss stack fwd+bwd wrt the images"),
    # composed chains (2026-08-21 bisect: every stage above EXCEPT
    # full_step is clean at batch 24 — the fault lives in a composition)
    ("synth_deca_grad", "synthesis -> DECA encode, fwd+bwd wrt the shift"),
    ("synth_losses_grad", "synthesis -> loss stack, fwd+bwd wrt the shift"),
]


def run_stage(stage: str, batch: int) -> None:
    """Run ONE stage inline (called in a subprocess). Exits 0 on success;
    a runtime fault kills the process with a nonzero status."""
    import jax
    import jax.numpy as jnp

    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from stylegan_directions_face_reenactment_tpu.utils.common import jit_build

    ks = jax.random.split(jax.random.PRNGKey(7), 12)

    if stage == "full_step":
        from stylegan_directions_face_reenactment_tpu.configs.arguments import (
            TrainingArguments)
        from stylegan_directions_face_reenactment_tpu.geometry import (
            initialize_directions)
        from stylegan_directions_face_reenactment_tpu.losses.lpips import (
            init_lpips_alex)
        from stylegan_directions_face_reenactment_tpu.models import (
            init_backbone, init_direction_matrix, init_generator, mean_latent,
            n_latent_for)
        from stylegan_directions_face_reenactment_tpu.models.deca import (
            init_deca, synthetic_flame_params)
        from stylegan_directions_face_reenactment_tpu.train.steps import (
            FrozenModels, make_optimizer, make_paired_step, split_a)

        g = jit_build(lambda k: init_generator(k, size=SIZE), ks[0])
        deca = jit_build(lambda k: init_deca(
            k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                      n_faces=9976), with_detail=False), ks[1])
        models = FrozenModels(
            g, deca, jit_build(init_backbone, ks[2]),
            jit_build(init_lpips_alex, ks[3]),
            mean_latent(g, ks[4], n_latent=4096))
        args = TrainingArguments(batch_size=batch, image_resolution=SIZE,
                                 deca_alignment="resize", evaluation=False,
                                 training_method="paired")
        spec = initialize_directions("voxceleb", 15, 6.0)
        tx = make_optimizer(args)
        step = make_paired_step(models, spec, args, tx, cached_shape=True)
        a = init_direction_matrix(ks[5], 512, 15, w_plus=True, num_layers=8)
        opt = tx.init(split_a(a)[0])
        n_lat = n_latent_for(SIZE)
        sw = jax.random.normal(ks[6], (batch, n_lat, 512))
        tw = jax.random.normal(ks[7], (batch, n_lat, 512))
        timg = jax.random.uniform(ks[8], (batch, SIZE, SIZE, 3),
                                  minval=-1.0, maxval=1.0)
        coeff = {"pose": 0.1 * jax.random.normal(ks[9], (batch, 6)),
                 "alpha_shp": 0.1 * jax.random.normal(ks[10], (batch, 100)),
                 "alpha_exp": 0.1 * jax.random.normal(ks[11], (batch, 50)),
                 "cam": jnp.tile(jnp.asarray([[8.0, 0.0, 0.0]]), (batch, 1))}
        ang = jnp.zeros((batch, 3))
        a, opt, ld = step(a, opt, ks[0], sw, tw, timg, coeff, ang, coeff, ang)
        print(f"full_step ok: loss {float(ld['loss']):.3f}")
        return

    if stage in ("synth_deca_grad", "synth_losses_grad"):
        from stylegan_directions_face_reenactment_tpu.models import (
            init_generator, mean_latent, n_latent_for)
        from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
            generate_image)

        g = jit_build(lambda k: init_generator(k, size=SIZE), ks[0])
        trunc = mean_latent(g, ks[4], n_latent=4096)
        n_lat = n_latent_for(SIZE)
        codes = jax.random.normal(ks[6], (batch, n_lat, 512))
        shift = 0.01 * jax.random.normal(ks[7], (batch, 8, 512))

        if stage == "synth_deca_grad":
            from stylegan_directions_face_reenactment_tpu.models.deca import (
                init_deca, synthetic_flame_params)
            from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
                calculate_shapemodel)
            deca = jit_build(lambda k: init_deca(
                k, synthetic_flame_params(jax.random.fold_in(k, 1),
                                          n_verts=5023, n_faces=9976),
                with_detail=False), ks[1])

            def loss(shift):
                img = generate_image(g, codes, truncation=0.7,
                                     truncation_latent=trunc,
                                     shift_code=shift, input_is_latent=True,
                                     num_layers_shift=8, w_plus=True)
                params, _ = calculate_shapemodel(deca, img)
                return sum(jnp.mean(jnp.square(v))
                           for v in params.values())
        else:
            from stylegan_directions_face_reenactment_tpu.losses import (
                init_lpips_alex, lpips)
            from stylegan_directions_face_reenactment_tpu.losses.id_loss import (
                id_loss)
            from stylegan_directions_face_reenactment_tpu.models.irse import (
                init_backbone)
            from stylegan_directions_face_reenactment_tpu.train.steps import (
                merge_statics, strip_statics)
            lp = jit_build(init_lpips_alex, ks[3])
            idb = jit_build(init_backbone, ks[2])
            tgt = jax.random.uniform(ks[8], (batch, SIZE, SIZE, 3),
                                     minval=-1.0, maxval=1.0)
            # weights ride as jit ARGUMENTS — closure constants overflow
            # the remote-compile payload (HTTP 413)
            w_arr, w_st = strip_statics((g, lp, idb))

            def loss_w(w_arr, shift):
                g_, lp_, idb_ = merge_statics(w_arr, w_st)
                img = generate_image(g_, codes, truncation=0.7,
                                     truncation_latent=trunc,
                                     shift_code=shift, input_is_latent=True,
                                     num_layers_shift=8, w_plus=True)
                return (10.0 * id_loss(idb_, img, tgt)
                        + 10.0 * lpips(lp_, img, tgt)
                        + jnp.mean(jnp.abs(img - tgt)))

            val, grad = jax.jit(jax.value_and_grad(loss_w, argnums=1))(
                w_arr, shift)
            print(f"{stage} ok: {float(val):.5f} "
                  f"|g| {float(jnp.linalg.norm(grad)):.4g}")
            return

        val, grad = jax.jit(jax.value_and_grad(loss))(shift)
        print(f"{stage} ok: {float(val):.5f} "
              f"|g| {float(jnp.linalg.norm(grad)):.4g}")
        return

    if stage in ("synth_grad", "synth_fwd"):
        from stylegan_directions_face_reenactment_tpu.models import (
            init_generator, mean_latent, n_latent_for)
        from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
            generate_image)

        g = jit_build(lambda k: init_generator(k, size=SIZE), ks[0])
        trunc = mean_latent(g, ks[4], n_latent=4096)
        n_lat = n_latent_for(SIZE)
        codes = jax.random.normal(ks[6], (batch, n_lat, 512))
        shift = 0.01 * jax.random.normal(ks[7], (batch, 8, 512))

        def synth(shift):
            img = generate_image(g, codes, truncation=0.7,
                                 truncation_latent=trunc, shift_code=shift,
                                 input_is_latent=True, num_layers_shift=8,
                                 w_plus=True)
            return jnp.mean(jnp.square(img))

        if stage == "synth_fwd":
            val = jax.jit(synth)(shift)
            print(f"synth_fwd ok: {float(val):.5f}")
        else:
            val, grad = jax.jit(jax.value_and_grad(synth))(shift)
            print(f"synth_grad ok: {float(val):.5f} "
                  f"|g| {float(jnp.linalg.norm(grad)):.4g}")
        return

    if stage == "deca_grad":
        from stylegan_directions_face_reenactment_tpu.models.deca import (
            init_deca, synthetic_flame_params)
        from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
            calculate_shapemodel)

        deca = jit_build(lambda k: init_deca(
            k, synthetic_flame_params(jax.random.fold_in(k, 1), n_verts=5023,
                                      n_faces=9976), with_detail=False), ks[1])
        imgs = jax.random.uniform(ks[6], (batch, SIZE, SIZE, 3),
                                  minval=-1.0, maxval=1.0)

        def enc(imgs):
            params, angles = calculate_shapemodel(deca, imgs)
            return sum(jnp.mean(jnp.square(v)) for v in params.values())

        val, grad = jax.jit(jax.value_and_grad(enc))(imgs)
        print(f"deca_grad ok: {float(val):.5f} "
              f"|g| {float(jnp.linalg.norm(grad)):.4g}")
        return

    if stage == "losses_grad":
        from stylegan_directions_face_reenactment_tpu.losses import (
            init_lpips_alex, lpips)
        from stylegan_directions_face_reenactment_tpu.losses.id_loss import (
            id_loss)
        from stylegan_directions_face_reenactment_tpu.models.irse import (
            init_backbone)

        lp = jit_build(init_lpips_alex, ks[3])
        idb = jit_build(init_backbone, ks[2])
        a_img = jax.random.uniform(ks[6], (batch, SIZE, SIZE, 3),
                                   minval=-1.0, maxval=1.0)
        b_img = jax.random.uniform(ks[7], (batch, SIZE, SIZE, 3),
                                   minval=-1.0, maxval=1.0)

        def loss(x):
            return (10.0 * id_loss(idb, x, b_img)
                    + 10.0 * lpips(lp, x, b_img)
                    + jnp.mean(jnp.abs(x - b_img)))

        val, grad = jax.jit(jax.value_and_grad(loss))(a_img)
        print(f"losses_grad ok: {float(val):.5f} "
              f"|g| {float(jnp.linalg.norm(grad)):.4g}")
        return

    raise SystemExit(f"unknown stage {stage!r}")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    if len(sys.argv) > 2:
        run_stage(sys.argv[2], batch)
        return

    results = {}
    for stage, desc in STAGES:
        print(f"--- {stage}: {desc} (batch {batch})", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(batch),
                 stage],
                capture_output=True, text=True, timeout=2700)
        except subprocess.TimeoutExpired:
            # cold tunnel compiles can exceed any budget — a timeout is
            # NOT a fault verdict
            results[stage] = "timeout (compile budget; re-run warm)"
            print(f"    -> {results[stage]}", flush=True)
            continue
        ok = p.returncode == 0
        results[stage] = "ok" if ok else f"FAULT rc={p.returncode}"
        tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
        for line in tail:
            print(f"    {line}", flush=True)
        print(f"    -> {results[stage]}", flush=True)
    print(json.dumps({"batch": batch, "results": results}))


if __name__ == "__main__":
    main()
