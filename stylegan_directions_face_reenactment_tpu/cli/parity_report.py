"""Quality-parity harness: the CSIM / pose / expression 1% gate.

One command turns downloaded checkpoints into a pass/fail parity report
(`BASELINE.md` north star: CSIM, pose error, expression error within 1% of
the PyTorch reference). Runs self-reenactment (source = first target frame,
the protocol of the reference's video eval,
`libs/utilities/utils_train.py:810-883`) — or cross-reenactment with an
explicit ``--source_path`` — over a target video/folder, computes the three
eval metrics exactly as `utils_train.py:695-732`, and writes
``PARITY_REPORT.json``.

Gating: pass ``--reference_metrics ref.json`` (``{"csim": .., "pose": ..,
"exp": ..}`` measured by running the PyTorch reference on the same inputs)
and the report carries a verdict at ``--tolerance`` (default 1%): CSIM may
not be more than tol worse (better always passes); pose/exp may not be more
than tol·reference higher. With ``--random_init`` the harness still runs
end-to-end (CI smoke) and labels the report unverified.

Usage:
  REENACT_PRETRAINED_ROOT=~/downloads python -m \
      stylegan_directions_face_reenactment_tpu.cli.parity_report \
      --target_path video.mp4 --output_path ./report
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CSIM/pose/exp parity report")
    p.add_argument("--target_path", required=True,
                   help="target pose source: image, folder, or video")
    p.add_argument("--source_path", default=None,
                   help="source identity image; default = first target "
                        "frame (self-reenactment)")
    p.add_argument("--output_path", required=True)
    p.add_argument("--dataset_type", default="voxceleb")
    p.add_argument("--image_resolution", type=int, default=None)
    p.add_argument("--frame_batch", type=int, default=16)
    p.add_argument("--video_stride", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--optimize_generator", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="PTI fine-tune on the source first (reference "
                        "inference default, `run_inference.py:309`)")
    p.add_argument("--random_init", action="store_true",
                   help="random-init all models: smoke-runs the harness "
                        "without checkpoints; report is labeled unverified")
    p.add_argument("--deca_alignment", default="fan",
                   choices=["fan", "fan_frame", "resize"])
    p.add_argument("--skip_preprocess", action="store_true",
                   help="inputs are already FFHQ-cropped 256 faces")
    p.add_argument("--device_crop", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="on-device FFHQ crop (--no-device_crop = PIL-exact "
                        "host path)")
    p.add_argument("--detect_width", type=int, default=None,
                   help="pre-detection rescale width (default: the "
                        "reference's 1000; 0 = native frame size)")
    p.add_argument("--reuse_landmarks", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="single-detection pipeline (see run_inference): "
                        "with real checkpoints this harness then QUANTIFIES "
                        "the deviation — compare the report against a "
                        "default-pipeline run on the same inputs")
    p.add_argument("--batch0_only", action="store_true",
                   help="replicate the reference's quirky eval semantics "
                        "bit-faithfully: pose/expression errors read only "
                        "index [0] of each batch (`utils_train.py:695-708`) "
                        "while CSIM still runs on the whole batch (`:729`). "
                        "Use when gating against metrics produced by the "
                        "reference's own evaluation loop")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype of the REENACT program under test "
                        "(the CLI's --compute_dtype); the metric programs "
                        "(DECA re-encode, ArcFace, pose/exp) always run "
                        "f32 so a bf16 run quantifies serving-dtype drift "
                        "against the same measuring stick")
    p.add_argument("--reference_metrics", default=None,
                   help="JSON file with the PyTorch reference's "
                        "{csim, pose, exp} on the same inputs; enables the "
                        "pass/fail gate")
    p.add_argument("--tolerance", type=float, default=0.01,
                   help="relative gate width (default 1%%)")
    return p


def _gate(ours: dict, ref: dict, tol: float) -> dict:
    """Within-tolerance verdict; 'better than reference' always passes
    (higher CSIM, lower pose/exp error)."""
    eps = 1e-8
    d_csim = (ref["csim"] - ours["csim"]) / max(abs(ref["csim"]), eps)
    d_pose = (ours["pose_error_deg"] - ref["pose"]) / max(abs(ref["pose"]), eps)
    d_exp = (ours["expression_error"] - ref["exp"]) / max(abs(ref["exp"]), eps)
    checks = {
        "csim": {"reference": ref["csim"], "ours": ours["csim"],
                 "rel_shortfall": d_csim, "pass": bool(d_csim <= tol)},
        "pose": {"reference": ref["pose"], "ours": ours["pose_error_deg"],
                 "rel_excess": d_pose, "pass": bool(d_pose <= tol)},
        "exp": {"reference": ref["exp"], "ours": ours["expression_error"],
                "rel_excess": d_exp, "pass": bool(d_exp <= tol)},
    }
    return {"tolerance": tol, "checks": checks,
            "pass": bool(all(c["pass"] for c in checks.values()))}


def main(argv=None):
    from ..utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_path, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..geometry import initialize_directions
    from ..losses.id_loss import extract_id_feats
    from ..models.deca import calculate_shapemodel
    from ..models.nn import resize_bilinear
    from ..pipeline import make_prep_fn, make_reenact_fn, setup_source
    from ..pipeline.reenactment import align_for
    from ..train.eval import expression_error, pose_error
    from ..train.steps import merge_statics, strip_statics
    from ..utils.image_utils import load_image
    from .model_loading import (compute_trunc, load_deca,
                                load_direction_matrix, load_e4e,
                                load_face_models, load_generator,
                                load_id_backbone, load_lpips)
    from .run_inference import _load_target_frames

    # --- models -----------------------------------------------------------
    g = load_generator(args.dataset_type, random_init=args.random_init,
                       resolution=args.image_resolution)
    e4e = load_e4e(args.dataset_type, random_init=args.random_init,
                   resolution=args.image_resolution)
    a = load_direction_matrix(args.dataset_type, random_init=args.random_init)
    deca = load_deca(random_init=args.random_init)
    idb = load_id_backbone(random_init=args.random_init)
    need_fan = args.deca_alignment in ("fan", "fan_frame")
    sfd = fan = None
    if not args.skip_preprocess or need_fan:
        sfd, fan = load_face_models(random_init=args.random_init)
    fan_deca = fan if need_fan else None
    sfd_deca = sfd if args.deca_alignment == "fan" else None
    spec = initialize_directions(args.dataset_type, 15, 6.0)
    trunc = compute_trunc(g)

    # the FFHQ crop is 256 regardless of the generator's size (see
    # pipeline/source_setup.py); only synthesis emits g.meta.size
    if args.reuse_landmarks and (args.skip_preprocess
                                 or args.deca_alignment == "resize"):
        raise ValueError("--reuse_landmarks needs the detection prep and a "
                         "bbox-based --deca_alignment (fan/fan_frame)")
    prep = make_prep_fn(sfd, fan, skip_preprocess=args.skip_preprocess,
                        device_crop=args.device_crop,
                        return_landmarks=args.reuse_landmarks,
                        detect_width=args.detect_width)

    # --- frames -----------------------------------------------------------
    frames = _load_target_frames(args.target_path, args.video_stride)
    if args.max_frames:
        frames = frames[:args.max_frames]
    self_reenactment = args.source_path is None
    src_raw = [frames[0]] if self_reenactment else [load_image(args.source_path)]

    lp = (load_lpips(random_init=args.random_init)
          if args.optimize_generator else None)
    (source_img, source_code, g_src, params_source,
     angles_source) = setup_source(
        g, e4e, deca, src_raw, prep, truncation_latent=trunc,
        optimize_generator=args.optimize_generator, lpips_params=lp,
        fan_params=fan_deca, s3fd_params=sfd_deca)

    # return_target_params: the reenact program computes the target
    # coefficients anyway — reusing them here saves the metric loop a
    # whole second alignment+encode pass per chunk
    reenact = make_reenact_fn(g_src, a, deca, spec, truncation=0.7,
                              truncation_latent=trunc, fan_params=fan_deca,
                              s3fd_params=sfd_deca,
                              compute_dtype=(jnp.bfloat16
                                             if args.compute_dtype
                                             == "bfloat16"
                                             else jnp.float32),
                              return_target_params=True,
                              reuse_landmarks=args.reuse_landmarks)

    # --- per-frame metric program (`utils_train.py:695-732`) --------------
    mweights, mstatics = strip_statics((deca, idb, fan_deca, sfd_deca))

    @jax.jit
    def _metrics(mweights, reenacted, p_t, a_t, source):
        deca_p, idb_p, fan_p, sfd_p = merge_statics(mweights, mstatics)
        align = align_for(fan_p, sfd_p)
        p_s, a_s = calculate_shapemodel(deca_p, reenacted, align_fn=align)
        # ArcFace's fixed face crop (x[:, 35:223, 32:220]) is defined on
        # 256 images. Production reenacted frames ARE 256 (generate_image
        # pools >256 outputs, `generic.py:148-151`); the resize covers
        # sub-256 test-scale generators only
        re256 = (reenacted if reenacted.shape[1] == source.shape[1]
                 else resize_bilinear(reenacted, source.shape[1:3]))
        f_src = extract_id_feats(idb_p, source)
        f_re = extract_id_feats(idb_p, re256)
        csim_pf = jnp.sum(f_src * f_re, axis=-1)       # per-frame cosine
        # frames whose in-graph SFD re-detection failed (on the target crop
        # inside the reenact program, or here on the reenacted frame) carry
        # the reference's -180° sentinel (`estimate_DECA.py:48-51`); their
        # zeroed coefficients would poison the averages the gate adjudicates
        valid = (jnp.any(a_s != -180.0, axis=-1)
                 & jnp.any(a_t != -180.0, axis=-1))
        return (csim_pf, pose_error(a_s, a_t),
                expression_error(spec, p_s, p_t), valid)

    bi = args.frame_batch
    csims, poses, exps, used, dropped = [], [], [], 0, 0
    from ..pipeline.source_setup import pad_batch as _pad

    for s in range(0, len(frames), bi):
        chunk = frames[s:s + bi]
        res = prep(chunk)
        tgt_batch, ok = res[0], res[1]
        pad = bi - len(chunk)
        tgt = _pad(tgt_batch, pad)
        if args.reuse_landmarks:
            reenacted, _, p_t, a_t = reenact(
                source_code, params_source, angles_source, jnp.asarray(tgt),
                jnp.asarray(_pad(res[2], pad)), jnp.asarray(_pad(ok, pad)))
        else:
            reenacted, _, p_t, a_t = reenact(source_code, params_source,
                                             angles_source, jnp.asarray(tgt))
        c, p, e, valid = _metrics(mweights, reenacted, p_t, a_t, source_img)
        # drop frames with no detected face — at preprocessing (ok) or in
        # the in-graph DECA re-detections (valid, the -180 sentinel)
        keep = np.asarray(ok) & np.asarray(valid)[:len(chunk)]
        csims.append(np.asarray(c)[:len(chunk)][keep])
        if args.batch0_only:
            # reference eval quirk: pose/exp from batch index [0] only
            # (`utils_train.py:695-708`); CSIM stays whole-batch (`:729`)
            b0 = keep.copy()
            b0[1:] = False
            poses.append(np.asarray(p)[:len(chunk)][b0])
            exps.append(np.asarray(e)[:len(chunk)][b0])
        else:
            poses.append(np.asarray(p)[:len(chunk)][keep])
            exps.append(np.asarray(e)[:len(chunk)][keep])
        used += int(keep.sum())
        dropped += len(chunk) - int(keep.sum())
        print(f"{min(s + bi, len(frames))}/{len(frames)} frames")

    if used == 0:
        raise RuntimeError("no target frame with a detected face")
    csims = np.concatenate(csims)
    poses = np.concatenate(poses)
    exps = np.concatenate(exps)
    if poses.size == 0:
        raise RuntimeError("batch0_only: no chunk had a detected face at "
                           "batch index [0]")
    metrics = {
        "csim": float(csims.mean()),
        "pose_error_deg": float(poses.mean()),
        "expression_error": float(exps.mean()),
    }

    report = {
        "metrics": metrics,
        "per_frame_std": {"csim": float(csims.std()),
                          "pose_error_deg": float(poses.std()),
                          "expression_error": float(exps.std())},
        "n_frames": used,
        "n_frames_dropped_no_detection": dropped,
        "self_reenactment": self_reenactment,
        "optimize_generator": bool(args.optimize_generator),
        "deca_alignment": args.deca_alignment,
        "reuse_landmarks": bool(args.reuse_landmarks),
        "compute_dtype": args.compute_dtype,
        "batch0_only": bool(args.batch0_only),
        "checkpoints": "random_init" if args.random_init else "real",
        "verified": not args.random_init,
        "gate": None,
    }
    if args.random_init:
        report["note"] = ("models are randomly initialized: metrics are NOT "
                          "meaningful; this run only validates the harness")
    if args.reference_metrics:
        with open(args.reference_metrics) as f:
            ref = json.load(f)
        report["gate"] = _gate(metrics, ref, args.tolerance)

    out = os.path.join(args.output_path, "PARITY_REPORT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["metrics"]))
    if report["gate"] is not None:
        print("gate:", "PASS" if report["gate"]["pass"] else "FAIL")
    print(f"saved {out}")
    return report


if __name__ == "__main__":
    main()
