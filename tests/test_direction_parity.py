"""Live-torch parity for the latent-side reenactment chain: direction
ranges → Δp construction → direction matrix A → latent shift → synthesis.

Every stage runs the REFERENCE's own code on CPU next to ours:

* `initialize_directions` lstsq a·x+b maps (`libs/utilities/generic.py:36-114`)
* training `make_shift_vector` (`libs/utilities/utils_train.py:127-174`)
* inference `make_shift` (`run_inference.py:201-254`)
* `get_shifted_latent_code` / `generate_image` (`generic.py:116-152`)
* `DirectionMatrix` (`libs/models/direction_matrix.py`) through our
  checkpoint converter

The reference functions are AST-extracted (their host modules import
torchvision/wandb/CUDA extensions unavailable here) and executed in place —
nothing is copied. The final test composes the whole chain into coefficient
dicts → reenacted pixels against the real reference `model.py` generator
(CPU via `ref_loader.install_op_stub`).
"""

import types

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from stylegan_directions_face_reenactment_tpu.geometry import (
    initialize_directions, make_shift_vector)
from stylegan_directions_face_reenactment_tpu.models.direction_matrix import (
    direction_matrix_forward)
from stylegan_directions_face_reenactment_tpu.models.stylegan2 import (
    n_latent_for)
from stylegan_directions_face_reenactment_tpu.pipeline.synthesis import (
    generate_image, get_shifted_latent_code)
from stylegan_directions_face_reenactment_tpu.weights.torch_convert import (
    convert_direction_matrix, convert_stylegan2_generator)

from ref_loader import (cuda_noop, extract_ref_function,
                        install_reference_path, load_generator_module)

REF = "/root/reference"


# ---------------------------------------------------------------------------
# Reference-side builders
# ---------------------------------------------------------------------------

def _ref_initialize_directions(dataset_type, learned_directions=15,
                               shift_scale=6.0):
    """The reference's `initialize_directions` with absolute ranges paths
    (the shipped dicts use CWD-relative ones, `config_directions.py:14,27`)."""
    install_reference_path()
    from libs.configs import config_directions as cd
    vox = dict(cd.voxceleb_dict,
               ranges_filepath=f"{REF}/libs/configs/ranges_voxceleb.npy")
    ffhq = dict(cd.ffhq_dict,
                ranges_filepath=f"{REF}/libs/configs/ranges_FFHQ.npy")
    from numpy import ones, vstack
    from numpy.linalg import lstsq
    fn = extract_ref_function(
        "libs/utilities/generic.py", "initialize_directions",
        namespace=dict(np=np, ones=ones, vstack=vstack, lstsq=lstsq,
                       get_direction_ranges=cd.get_direction_ranges,
                       voxceleb_dict=vox, ffhq_dict=ffhq))
    return fn(dataset_type, learned_directions, shift_scale)


def _ref_shift_self(dataset_type, batch_size, learned_directions=15,
                    shift_scale=6.0):
    """A stand-in `self` for the extracted Utilities_train / Inference
    methods, populated exactly like `utils_train.py:36-62`."""
    install_reference_path()
    from libs.configs import config_directions as cd
    d = cd.voxceleb_dict if dataset_type == "voxceleb" else cd.ffhq_dict
    (count_pose, num_expressions, directions_exp, jaw_dict, angle_scales,
     _angle_directions) = _ref_initialize_directions(
        dataset_type, learned_directions, shift_scale)
    return types.SimpleNamespace(
        params={"batch_size": batch_size,
                "learned_directions": learned_directions},
        shift_scale=shift_scale,
        learned_directions=learned_directions,
        yaw_direction=d["yaw_direction"],
        pitch_direction=d["pitch_direction"],
        roll_direction=d["roll_direction"],
        count_pose=count_pose, num_expressions=num_expressions,
        directions_exp=directions_exp, angle_scales=angle_scales,
        a_jaw=jaw_dict["a"], b_jaw=jaw_dict["b"],
        min_jaw=jaw_dict["min"], max_jaw=jaw_dict["max"])


def _rand_coeffs(rng, b):
    """params dict + angles in the shapes `calculate_shapemodel` emits."""
    params = {"pose": rng.normal(size=(b, 6)).astype(np.float32) * 0.3,
              "alpha_exp": rng.normal(size=(b, 50)).astype(np.float32)}
    angles = (rng.uniform(-30, 30, (b, 3))).astype(np.float32)
    return params, angles


def _torch_params(params):
    return {k: torch.from_numpy(v) for k, v in params.items()}


# ---------------------------------------------------------------------------
# initialize_directions: lstsq maps vs our exact two-point lines
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dataset", ["voxceleb", "ffhq"])
def test_initialize_directions_live_parity(dataset):
    (count_pose, num_expressions, directions_exp, jaw_dict, angle_scales,
     angle_directions) = _ref_initialize_directions(dataset)
    spec = initialize_directions(dataset, 15, 6.0)

    assert spec.count_pose == count_pose
    assert spec.num_expressions == num_expressions == len(directions_exp)
    assert spec.angle_scales == tuple(angle_scales)
    assert (spec.yaw_direction, spec.pitch_direction, spec.roll_direction) \
        == tuple(int(x) for x in angle_directions)
    np.testing.assert_allclose(spec.a_jaw, jaw_dict["a"], rtol=1e-6)
    np.testing.assert_allclose(spec.b_jaw, jaw_dict["b"], rtol=1e-6,
                               atol=1e-9)
    assert (spec.jaw_min, spec.jaw_max) == (jaw_dict["min"], jaw_dict["max"])
    for i, d in enumerate(directions_exp):
        assert spec.exp_components[i] == d["exp_component"]
        assert spec.exp_slot(i) == d["A_direction"]
        np.testing.assert_allclose(spec.exp_a[i], d["a"], rtol=1e-6)
        np.testing.assert_allclose(spec.exp_b[i], d["b"], rtol=1e-6,
                                   atol=1e-9)
        assert (spec.exp_min[i], spec.exp_max[i]) == (d["min_shift"],
                                                      d["max_shift"])


# ---------------------------------------------------------------------------
# Δp construction: training + inference variants vs ours
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dataset", ["voxceleb", "ffhq"])
def test_make_shift_vector_training_live_parity(dataset):
    """Batched training Δp (`utils_train.py:127-174`), incl. the FFHQ
    roll-less slot layout the reference realizes via `roll_direction=-1`."""
    b = 6
    fn = extract_ref_function("libs/utilities/utils_train.py",
                              "make_shift_vector",
                              class_name="Utilities_train")
    self_ = _ref_shift_self(dataset, b)
    rng = np.random.default_rng(3)
    ps, angs = _rand_coeffs(rng, b)
    pt, angt = _rand_coeffs(rng, b)
    with cuda_noop(), torch.no_grad():
        want = fn(self_, _torch_params(ps), _torch_params(pt),
                  torch.from_numpy(angs), torch.from_numpy(angt)).numpy()

    spec = initialize_directions(dataset, 15, 6.0)
    got = np.asarray(make_shift_vector(spec, ps, pt, jnp.asarray(angs),
                                       jnp.asarray(angt)))
    assert got.shape == want.shape == (b, 15)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    if dataset == "ffhq":
        # roll contributes nowhere; jaw sits at slot count_pose-1 == 2
        assert spec.roll_direction == -1 and spec.jaw_index == 2


def test_make_shift_inference_live_parity():
    """The inference-side Δp (`run_inference.py:201-254`) — a separate
    scalar-loop implementation in the reference; ours is the same
    `make_shift_vector` at batch 1."""
    fn = extract_ref_function("run_inference.py", "make_shift",
                              class_name="Inference")
    self_ = _ref_shift_self("voxceleb", 1)
    rng = np.random.default_rng(5)
    ps, angs = _rand_coeffs(rng, 1)
    pt, angt = _rand_coeffs(rng, 1)
    with cuda_noop(), torch.no_grad():
        want = fn(self_, torch.from_numpy(angs), torch.from_numpy(angt),
                  _torch_params(ps), _torch_params(pt)).numpy()

    spec = initialize_directions("voxceleb", 15, 6.0)
    got = np.asarray(make_shift_vector(spec, ps, pt, jnp.asarray(angs),
                                       jnp.asarray(angt)))
    assert got.shape == want.shape == (1, 15)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Latent-shift application (pure latent math; no generator forward)
# ---------------------------------------------------------------------------

def _ref_shift_code_fns():
    get_code = extract_ref_function("libs/utilities/generic.py",
                                    "get_shifted_latent_code")
    gen_img = extract_ref_function("libs/utilities/generic.py",
                                   "generate_image",
                                   namespace={"get_shifted_latent_code":
                                              get_code})
    return get_code, gen_img


@pytest.mark.parametrize("w_plus,num_layers", [(True, None), (False, None),
                                               (False, 8)])
def test_get_shifted_latent_code_live_parity(w_plus, num_layers):
    """All three shift-application branches (`generic.py:116-135`): W+
    per-layer shift, W shift broadcast to all rows, W shift on the first
    `num_layers` rows only."""
    get_code, _ = _ref_shift_code_fns()
    n_lat = n_latent_for(64)
    rng = np.random.default_rng(7)
    latent = rng.normal(size=(2, n_lat, 512)).astype(np.float32)
    shift = (rng.normal(size=(2, 8, 512)) if w_plus
             else rng.normal(size=(2, 512))).astype(np.float32) * 0.1

    g_stub = types.SimpleNamespace(n_latent=n_lat)  # only attr the ref reads
    with torch.no_grad():
        want = get_code(g_stub, torch.from_numpy(latent),
                        torch.from_numpy(shift), input_is_latent=True,
                        w_plus=w_plus, num_layers=num_layers).numpy()

    g_params = {"meta": {"size": 64}}  # only meta the jax side reads
    got = np.asarray(get_shifted_latent_code(
        g_params, jnp.asarray(latent), jnp.asarray(shift),
        input_is_latent=True, w_plus=w_plus, num_layers=num_layers))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_get_direction_info_live_parity():
    """Editing-sweep metadata for every direction
    (`config_directions.py:42-85`, imported live — numpy-only module):
    type label, start position, min/max shift, step."""
    from stylegan_directions_face_reenactment_tpu.geometry import (
        get_direction_info)
    install_reference_path()
    from libs.configs.config_directions import (
        get_direction_info as ref_info)
    (count_pose, _n_exp, directions_exp, jaw_dict, angle_scales,
     angle_directions) = _ref_initialize_directions("voxceleb")
    spec = initialize_directions("voxceleb", 15, 6.0)
    rng = np.random.default_rng(17)
    ps, angs = _rand_coeffs(rng, 1)
    tps = _torch_params(ps)
    tang = torch.from_numpy(angs)
    for direction in range(15):
        want = ref_info(direction, angle_directions, jaw_dict["a"],
                        jaw_dict["b"], directions_exp, 6.0, angle_scales,
                        count_pose, 10, tps, tang)
        got = get_direction_info(spec, direction, ps, angs, shifts_count=10)
        assert got[0] == want[0]                       # type label
        np.testing.assert_allclose(got[1:], [float(v) for v in want[1:]],
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Disentanglement-50 batch + ground-truth reenacted coefficients
# ---------------------------------------------------------------------------

class _TorchRandQueue:
    """torch proxy whose `rand` pops predetermined uniforms (the reference
    draws one `torch.rand(1, device='cuda')` per second-half sample,
    `utils_train.py:240-286`) — device kwarg ignored so it runs on CPU."""

    def __init__(self, values):
        self._q = [torch.tensor([float(v)]) for v in values]

    def __getattr__(self, name):
        return getattr(torch, name)

    def rand(self, *args, **kwargs):
        return self._q.pop(0)


def _fixed_draws(half=8):
    """Direction indices covering every branch (yaw/pitch/roll/jaw/exp) and
    their uniform shift positions."""
    idx = np.array([0, 1, 2, 3, 4, 9, 14, 7][:half])
    u = np.linspace(0.05, 0.95, half).astype(np.float32)
    return idx, u


def test_make_shift_vector_50_live_parity():
    """The disentanglement-50 batch (`utils_train.py:177-288`): first half
    full Δp, second half one random direction with a uniform shift inside
    [-shift_scale, shift_scale] of the source's current position. The
    reference's np.random.choice / torch.rand draws are injected so both
    sides construct from identical randomness."""
    from stylegan_directions_face_reenactment_tpu.geometry import (
        make_shift_vector_50_from)
    b = 16
    half = b // 2
    idx, u = _fixed_draws(half)

    np_proxy = types.SimpleNamespace(
        asarray=np.asarray,
        random=types.SimpleNamespace(choice=lambda arr, size: idx.copy()))
    fn = extract_ref_function(
        "libs/utilities/utils_train.py", "make_shift_vector_50",
        class_name="Utilities_train",
        namespace={"np": np_proxy, "torch": _TorchRandQueue(u)})
    self_ = _ref_shift_self("voxceleb", b)
    rng = np.random.default_rng(11)
    ps, angs = _rand_coeffs(rng, b)
    pt, angt = _rand_coeffs(rng, b)
    with cuda_noop(), torch.no_grad():
        want, want_idx = fn(self_, _torch_params(ps), _torch_params(pt),
                            torch.from_numpy(angs), torch.from_numpy(angt))

    spec = initialize_directions("voxceleb", 15, 6.0)
    got = np.asarray(make_shift_vector_50_from(
        spec, ps, pt, jnp.asarray(angs), jnp.asarray(angt),
        jnp.asarray(idx), jnp.asarray(u)))
    np.testing.assert_array_equal(np.asarray(want_idx), idx)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def _load_ref_rotation_converter():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_rotconv",
        f"{REF}/libs/DECA/decalib/utils/rotation_converter.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_get_params_gt_reenacted_live_parity():
    """Ground-truth FLAME coefficients for the single-direction half
    (`utils_train.py:291-374`), incl. the euler→axis conversion with the
    (x, y) → (y, −x) component swap, run with the reference's own rotation
    converters."""
    from stylegan_directions_face_reenactment_tpu.geometry import (
        get_params_gt_reenacted, make_shift_vector_50_from)
    rc = _load_ref_rotation_converter()
    b = 16
    half = b // 2
    idx, u = _fixed_draws(half)

    rng = np.random.default_rng(13)
    ps, angs = _rand_coeffs(rng, b)
    pt, angt = _rand_coeffs(rng, b)
    spec = initialize_directions("voxceleb", 15, 6.0)
    shift_vec = np.asarray(make_shift_vector_50_from(
        spec, ps, pt, jnp.asarray(angs), jnp.asarray(angt),
        jnp.asarray(idx), jnp.asarray(u)))

    fn = extract_ref_function(
        "libs/utilities/utils_train.py", "get_params_gt_reenacted",
        class_name="Utilities_train",
        namespace={"np": np, "batch_euler2axis": rc.batch_euler2axis,
                   "deg2rad": rc.deg2rad, "rad2deg": rc.rad2deg,
                   "batch_axis2euler": rc.batch_axis2euler})
    self_ = _ref_shift_self("voxceleb", b)
    self_.batch_size = b
    with cuda_noop(), torch.no_grad():
        want = fn(self_, _torch_params(ps), _torch_params(pt),
                  torch.from_numpy(shift_vec), idx,
                  torch.from_numpy(angs))

    jtree = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    got = get_params_gt_reenacted(spec, jtree(ps), jtree(pt),
                                  jnp.asarray(shift_vec),
                                  jnp.asarray(idx), jnp.asarray(angs))
    np.testing.assert_allclose(np.asarray(got["pose"]),
                               want["pose"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["exp"]),
                               want["exp"].numpy(), rtol=1e-4, atol=1e-5)


def test_extract_evaluation_metrics_live_parity():
    """The CSIM/pose/expression eval metrics (`utils_train.py:695-732`) —
    the numbers the BASELINE 1% gate adjudicates. The reference method runs
    extracted, with its ArcFace id loss stubbed to a constant (the backbone
    itself has separate live parity); pose and normalized-expression errors
    must match our `pose_error`/`expression_error` on the reference's
    batch-index-[0] protocol."""
    from stylegan_directions_face_reenactment_tpu.train.eval import (
        expression_error, pose_error)
    fn = extract_ref_function("libs/utilities/utils_train.py",
                              "extract_evaluation_metrics",
                              class_name="Utilities_train",
                              namespace={"np": np})
    self_ = _ref_shift_self("voxceleb", 1)
    self_.id_loss_ = lambda a, b: torch.tensor(0.25)
    rng = np.random.default_rng(19)
    ps, angs = _rand_coeffs(rng, 1)
    pt, angt = _rand_coeffs(rng, 1)
    with cuda_noop(), torch.no_grad():
        want_csim, want_pose, want_exp = fn(
            self_, _torch_params(ps), _torch_params(pt),
            torch.from_numpy(angs), torch.from_numpy(angt), None, None)
    assert want_csim == 0.75

    spec = initialize_directions("voxceleb", 15, 6.0)
    got_pose = float(pose_error(jnp.asarray(angs), jnp.asarray(angt))[0])
    got_exp = float(expression_error(spec, ps, pt)[0])
    np.testing.assert_allclose(got_pose, float(want_pose), rtol=1e-5)
    np.testing.assert_allclose(got_exp, float(want_exp), rtol=1e-4)


# ---------------------------------------------------------------------------
# Training loss composition (`utils_train.py:376-499`)
# ---------------------------------------------------------------------------

def _loss_self(lambdas, deca_params, id_params, lpips_params):
    """Stand-in `self` for the extracted calculate_losses[_paired]: the
    reference composition logic runs with wrappers around OUR components
    (each has its own live/golden parity) so the test isolates exactly the
    composition — λ weights, cam:=[8,0,0] override, coefficient routing,
    the paired [0,255] quirk, and .detach() placement."""
    install_reference_path()
    from libs.criteria.losses import Losses
    from stylegan_directions_face_reenactment_tpu.losses.id_loss import (
        id_loss as our_id)
    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        lpips as our_lpips)
    from stylegan_directions_face_reenactment_tpu.models.deca.deca import (
        calculate_shape as our_shape)

    def t2j(x):
        return jnp.asarray(x.detach().numpy())

    def calc_shape(coeffs):
        lm2, lm3, verts = our_shape(deca_params,
                                    {k: t2j(v) for k, v in coeffs.items()})
        return tuple(torch.from_numpy(np.asarray(v)) for v in (lm2, lm3,
                                                               verts))

    self_ = _ref_shift_self("voxceleb", 16)
    self_.params = dict(self_.params, **lambdas,
                        disentanglement_50=True)
    self_.deca = types.SimpleNamespace(calculate_shape=calc_shape)
    self_.losses = Losses()
    self_.id_loss_ = lambda a, b: torch.tensor(
        float(our_id(id_params, t2j(a), t2j(b))))
    self_.lpips_loss = lambda a, b: torch.tensor(
        float(our_lpips(lpips_params, t2j(a), t2j(b))))
    rc = _load_ref_rotation_converter()
    gt_fn = extract_ref_function(
        "libs/utilities/utils_train.py", "get_params_gt_reenacted",
        class_name="Utilities_train",
        namespace={"np": np, "batch_euler2axis": rc.batch_euler2axis,
                   "deg2rad": rc.deg2rad, "rad2deg": rc.rad2deg,
                   "batch_axis2euler": rc.batch_axis2euler})
    self_.get_params_gt_reenacted = types.MethodType(gt_fn, self_)
    self_.batch_size = 16
    return self_


@pytest.fixture(scope="module")
def loss_nets():
    import jax
    from stylegan_directions_face_reenactment_tpu.losses.lpips import (
        init_lpips_alex)
    from stylegan_directions_face_reenactment_tpu.models.deca import (
        init_deca, synthetic_flame_params)
    from stylegan_directions_face_reenactment_tpu.models.irse import (
        init_backbone)
    ks = jax.random.split(jax.random.PRNGKey(23), 3)
    deca = init_deca(ks[0], synthetic_flame_params(ks[0]), with_detail=False)
    idb = init_backbone(ks[1])
    lp = init_lpips_alex(ks[2])
    return deca, idb, lp


LAMBDAS = {"lambda_shape": 1.0, "lambda_mouth_shape": 1.0,
           "lambda_eye_shape": 1.0, "lambda_identity": 10.0,
           "lambda_perceptual": 10.0, "lambda_pixel_wise": 1.0,
           "lambda_w_reg": 0.1}


@pytest.mark.slow
def test_calculate_losses_live_parity(loss_nets):
    from stylegan_directions_face_reenactment_tpu.geometry import (
        make_shift_vector_50_from)
    from stylegan_directions_face_reenactment_tpu.train.losses_stack import (
        calculate_losses)
    deca_p, idb, lp = loss_nets
    b = 16
    rng = np.random.default_rng(29)
    ps, angs = _rand_coeffs(rng, b)
    pt, angt = _rand_coeffs(rng, b)
    shp = {"alpha_shp": rng.normal(size=(b, 100)).astype(np.float32),
           "cam": rng.normal(size=(b, 3)).astype(np.float32)}
    ps = {**ps, **shp}
    p_shift = {"pose": rng.normal(size=(b, 6)).astype(np.float32) * 0.3,
               "alpha_exp": rng.normal(size=(b, 50)).astype(np.float32),
               "alpha_shp": rng.normal(size=(b, 100)).astype(np.float32),
               "cam": rng.normal(size=(b, 3)).astype(np.float32)}
    idx, u = _fixed_draws(8)
    spec = initialize_directions("voxceleb", 15, 6.0)
    sv = np.asarray(make_shift_vector_50_from(
        spec, ps, pt, jnp.asarray(angs), jnp.asarray(angt),
        jnp.asarray(idx), jnp.asarray(u)))
    imgs_src = rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32)
    imgs_shift = rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32)

    fn = extract_ref_function("libs/utilities/utils_train.py",
                              "calculate_losses",
                              class_name="Utilities_train")
    self_ = _loss_self(LAMBDAS, deca_p, idb, lp)
    with cuda_noop(), torch.no_grad():
        want, want_dict = fn(
            self_, _torch_params(ps), torch.from_numpy(angs),
            _torch_params(p_shift), None, _torch_params(pt),
            torch.from_numpy(angt), torch.from_numpy(sv), idx,
            torch.from_numpy(imgs_src), torch.from_numpy(imgs_shift))

    jt = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    got, got_dict = calculate_losses(
        deca_p, idb, lp, spec, LAMBDAS, jt(ps), jnp.asarray(angs),
        jt(p_shift), jt(pt), jnp.asarray(sv), jnp.asarray(idx),
        jnp.asarray(imgs_src), jnp.asarray(imgs_shift),
        disentanglement_50=True)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    for k in ("loss_shape", "loss_eye", "loss_mouth", "loss_identity",
              "loss_perceptual"):
        np.testing.assert_allclose(float(got_dict[k]), want_dict[k],
                                   rtol=2e-4, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_calculate_losses_paired_live_parity(loss_nets):
    from stylegan_directions_face_reenactment_tpu.train.losses_stack import (
        calculate_losses_paired)
    deca_p, idb, lp = loss_nets
    b = 4
    rng = np.random.default_rng(31)
    mk = lambda: {"pose": rng.normal(size=(b, 6)).astype(np.float32) * 0.3,
                  "alpha_exp": rng.normal(size=(b, 50)).astype(np.float32),
                  "alpha_shp": rng.normal(size=(b, 100)).astype(np.float32),
                  "cam": rng.normal(size=(b, 3)).astype(np.float32)}
    p_shift, p_tgt = mk(), mk()
    imgs_shift = rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32)
    imgs_tgt = rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32)
    w_shift = rng.normal(size=(b, 14, 512)).astype(np.float32)
    w_tgt = rng.normal(size=(b, 14, 512)).astype(np.float32)

    ref_range = extract_ref_function("libs/utilities/image_utils.py",
                                     "torch_range_1_to_255")
    fn = extract_ref_function(
        "libs/utilities/utils_train.py", "calculate_losses_paired",
        class_name="Utilities_train",
        namespace={"torch_range_1_to_255": ref_range})
    self_ = _loss_self(LAMBDAS, deca_p, idb, lp)
    with cuda_noop(), torch.no_grad():
        want, want_dict = fn(
            self_, _torch_params(p_shift), _torch_params(p_tgt),
            torch.from_numpy(imgs_shift), torch.from_numpy(imgs_tgt),
            torch.from_numpy(w_shift), torch.from_numpy(w_tgt))

    jt = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    got, got_dict = calculate_losses_paired(
        deca_p, idb, lp, LAMBDAS, jt(p_shift), jt(p_tgt),
        jnp.asarray(imgs_shift), jnp.asarray(imgs_tgt),
        jnp.asarray(w_shift), jnp.asarray(w_tgt))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    for k in ("loss_shape", "loss_eye", "loss_mouth", "loss_identity",
              "loss_perceptual", "loss_pixel_wise", "loss_w_reg"):
        np.testing.assert_allclose(float(got_dict[k]), want_dict[k],
                                   rtol=2e-4, atol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# The composed chain: coefficients → Δp → A → shift → synthesis (pixels)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_latent_side_reenactment_chain_live_parity():
    """End-to-end latent-side reenactment against the live reference stack:
    the reference's own `make_shift` → `DirectionMatrix` →
    `generate_image(shift_code=...)` through the real `model.py` Generator
    on CPU, versus our `make_shift_vector` → converted A →
    `generate_image`. Coefficient extraction (DECA) has its own live
    parity; from coefficients to pixels this covers everything
    `run_inference.py:170-195` does per frame."""
    mod = load_generator_module()
    torch.manual_seed(51)
    g = mod.Generator(64, 512, 8, channel_multiplier=1).eval()
    g_params = convert_stylegan2_generator(g.state_dict(), size=64,
                                           channel_multiplier=1)

    install_reference_path()
    from libs.models.direction_matrix import DirectionMatrix
    a_ref = DirectionMatrix(shift_dim=512, input_dim=15, out_dim=512,
                            w_plus=True, num_layers=8).eval()
    a_params = convert_direction_matrix(
        {"A_matrix": a_ref.state_dict(), "w_plus": True,
         "num_layers_shift": 8})

    # truncation latent (deterministic): mean W over a fixed z batch
    torch.manual_seed(52)
    zt = torch.randn(128, 512)
    with torch.no_grad():
        trunc_t = g.style(zt).mean(0, keepdim=True)

    rng = np.random.default_rng(9)
    ps, angs = _rand_coeffs(rng, 1)
    pt, angt = _rand_coeffs(rng, 1)
    n_lat = n_latent_for(64)
    latent = rng.normal(size=(1, n_lat, 512)).astype(np.float32)

    # --- reference chain ---------------------------------------------------
    make_shift = extract_ref_function("run_inference.py", "make_shift",
                                      class_name="Inference")
    _, ref_generate = _ref_shift_code_fns()
    self_ = _ref_shift_self("voxceleb", 1)
    with cuda_noop(), torch.no_grad():
        dp_ref = make_shift(self_, torch.from_numpy(angs),
                            torch.from_numpy(angt), _torch_params(ps),
                            _torch_params(pt))
        shift_ref = a_ref(dp_ref)
        want = ref_generate(g, torch.from_numpy(latent), truncation=0.7,
                            trunc=trunc_t, w_plus=True, num_layers_shift=8,
                            shift_code=shift_ref,
                            input_is_latent=True).numpy()

    # --- ours ----------------------------------------------------------------
    spec = initialize_directions("voxceleb", 15, 6.0)
    dp = make_shift_vector(spec, ps, pt, jnp.asarray(angs),
                           jnp.asarray(angt))
    np.testing.assert_allclose(np.asarray(dp), dp_ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    shift = direction_matrix_forward(a_params, dp)
    np.testing.assert_allclose(np.asarray(shift), shift_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    got = generate_image(
        g_params, jnp.asarray(latent), truncation=0.7,
        truncation_latent=jnp.asarray(trunc_t.numpy()), w_plus=True,
        num_layers_shift=8, shift_code=shift, input_is_latent=True)
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-4)
