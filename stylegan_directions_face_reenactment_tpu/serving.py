"""AOT serving bundles: the reenactment program as a deployable artifact.

Production-deployment layer with no reference counterpart — the reference
rebuilds its torch graph from Python model code on every process start
(`run_inference.py:48-101` re-imports StyleGAN2/DECA/e4e and JIT-compiles
the CUDA ops). Here the COMPLETE per-frame program (DECA alignment →
encode → Δp → A → StyleGAN2 synthesis, `pipeline/reenactment.py`) is
exported ONCE via `jax.export` into a versioned StableHLO artifact; a
server process deserializes it and runs inference without importing any
model-building code, converting any checkpoints, or re-tracing Python.

Bundle layout (a directory):

- ``reenact.jaxexport`` — the serialized `jax.export.Exported` program
  (StableHLO + calling convention; carries jax.export's cross-version
  compatibility guarantees).
- ``weights.npz`` + ``weights_tree.json`` — the array-only weights
  pytree as a plain npz archive plus a JSON structure manifest, passed
  back to the program at call time (weights ride as arguments, not
  constants, so the artifact stays small and the weights stay swappable
  — e.g. a PTI fine-tuned generator per source identity reuses the same
  program). Deliberately NOT pickle: bundles are designed to ship
  between hosts, and every part of the artifact must be safe to load
  from disk (the StableHLO program already is; npz+JSON keeps the
  weights side equally inert).
- ``meta.json`` — format version, frame batch, shapes, dtypes, platforms.

The exported program has a FIXED frame batch (XLA static shapes);
:class:`ReenactServingProgram` serves arbitrary-length requests by
chunking and padding to that batch, which is exactly how the live
pipeline batches video frames too.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.directions import DirectionsSpec
from .models.stylegan2 import n_latent_for
from .pipeline.reenactment import make_reenact_program
from .pipeline.source_setup import CROP_SIZE

Params = Dict[str, Any]

FORMAT_VERSION = 2  # v1 stored weights as pickle; v2 is npz + JSON manifest
PROGRAM_FILE = "reenact.jaxexport"
WEIGHTS_FILE = "weights.npz"
WEIGHTS_TREE_FILE = "weights_tree.json"
META_FILE = "meta.json"


def _encode_tree(x, leaves: list):
    """Pytree → JSON-safe structure manifest; arrays appended to `leaves`.

    The weights pytree is array-only (``strip_statics`` output): nested
    dicts/tuples/lists/None over numpy-able leaves."""
    if x is None:
        return {"t": "none"}
    if isinstance(x, dict):
        return {"t": "dict", "items": {k: _encode_tree(v, leaves)
                                       for k, v in x.items()}}
    if isinstance(x, (list, tuple)):
        return {"t": "tuple" if isinstance(x, tuple) else "list",
                "items": [_encode_tree(v, leaves) for v in x]}
    leaves.append(np.asarray(x))
    return {"t": "leaf", "i": len(leaves) - 1}


def _decode_tree(node, leaves):
    t = node["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode_tree(v, leaves) for k, v in node["items"].items()}
    if t in ("tuple", "list"):
        seq = [_decode_tree(v, leaves) for v in node["items"]]
        return tuple(seq) if t == "tuple" else seq
    return leaves[node["i"]]

# DECA coefficient slots as returned by `calculate_shapemodel`
# (`models/deca/deca.py::PARAM_SPLIT`; pose 6 = 3 global + 3 jaw)
_SOURCE_PARAM_DIMS = (("pose", 6), ("alpha_shp", 100), ("alpha_exp", 50),
                      ("cam", 3))


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def reenact_arg_specs(weights, *, n_latent: int, frame_batch: int,
                      target_size: int = CROP_SIZE,
                      reuse_landmarks: bool = False) -> Tuple:
    """ShapeDtypeStruct tree matching `make_reenact_program`'s fn args."""
    w_spec = jax.tree_util.tree_map(
        lambda x: _spec(jnp.shape(x), jnp.asarray(x).dtype), weights)
    args = (w_spec,
            _spec((1, n_latent, 512)),
            {k: _spec((1, n)) for k, n in _SOURCE_PARAM_DIMS},
            _spec((1, 3)),
            _spec((frame_batch, target_size, target_size, 3)))
    if reuse_landmarks:
        args += (_spec((frame_batch, 68, 2)),
                 _spec((frame_batch,), jnp.bool_))
    return args


def export_reenact(g_params: Params, a_params: Params, deca_params: Params,
                   spec: DirectionsSpec, *, frame_batch: int = 16,
                   truncation: float = 0.7,
                   truncation_latent: Optional[jnp.ndarray] = None,
                   num_layers_shift: int = 8, compute_dtype=jnp.float32,
                   fan_params: Optional[Params] = None,
                   s3fd_params: Optional[Params] = None,
                   return_target_params: bool = False,
                   reuse_landmarks: bool = False,
                   target_size: int = CROP_SIZE,
                   platforms: Optional[Tuple[str, ...]] = None):
    """Export the reenactment program → (Exported, weights, meta).

    ``platforms``: lowering targets (e.g. ``("tpu",)`` or
    ``("tpu", "cpu")`` for one artifact that serves both); defaults to
    `jax.export.default_export_platform()`.
    """
    from jax import export as jexport

    fn, weights = make_reenact_program(
        g_params, a_params, deca_params, spec, truncation=truncation,
        truncation_latent=truncation_latent,
        num_layers_shift=num_layers_shift, compute_dtype=compute_dtype,
        fan_params=fan_params, s3fd_params=s3fd_params,
        return_target_params=return_target_params,
        reuse_landmarks=reuse_landmarks)

    size = g_params["meta"]["size"]
    n_latent = n_latent_for(size)
    if platforms is None:
        platforms = (jexport.default_export_platform(),)
    args = reenact_arg_specs(weights, n_latent=n_latent,
                             frame_batch=frame_batch,
                             target_size=target_size,
                             reuse_landmarks=reuse_landmarks)
    exported = jexport.export(fn, platforms=list(platforms))(*args)

    meta = {
        "format_version": FORMAT_VERSION,
        "frame_batch": frame_batch,
        "generator_size": int(size),
        "n_latent": int(n_latent),
        "target_size": int(target_size),
        "truncation": float(truncation),
        "num_layers_shift": int(num_layers_shift),
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "deca_alignment": ("fan" if s3fd_params is not None else
                           "fan_frame" if fan_params is not None else
                           "resize"),
        "return_target_params": bool(return_target_params),
        "reuse_landmarks": bool(reuse_landmarks),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    return exported, weights, meta


def save_reenact_bundle(path: str, exported, weights, meta: Dict[str, Any]
                        ) -> None:
    """Write a serving bundle directory (see module docstring)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, PROGRAM_FILE), "wb") as f:
        f.write(exported.serialize())
    leaves: list = []
    manifest = _encode_tree(weights, leaves)
    np.savez(os.path.join(path, WEIGHTS_FILE),
             **{f"w{i}": a for i, a in enumerate(leaves)})
    with open(os.path.join(path, WEIGHTS_TREE_FILE), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


class ReenactServingProgram:
    """A loaded bundle: callable like `make_reenact_fn`'s result.

    ``fn(source_code, params_source, angles_source, target_imgs[,
    target_lms, target_ok])`` with ANY number of target frames — requests
    are chunked/padded to the exported ``frame_batch`` (the pad frames are
    edge-repeats so the alignment nets see valid faces; their outputs are
    sliced away).
    """

    def __init__(self, exported, weights, meta: Dict[str, Any]):
        self.meta = meta
        self.frame_batch = int(meta["frame_batch"])
        self.weights = weights
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def platforms(self):
        return tuple(self.meta["platforms"])

    def with_generator(self, g_params: Params) -> "ReenactServingProgram":
        """Same program, swapped generator weights — the PTI serving
        pattern: one exported artifact, one fine-tuned generator per
        source identity (`pipeline/pti.py::optimize_g` output). The new
        params must have the exported generator's architecture."""
        from .train.steps import strip_statics
        g_arrays, _ = strip_statics(g_params)
        return ReenactServingProgram(
            self._exported, (g_arrays,) + tuple(self.weights[1:]), self.meta)

    def __call__(self, source_code, params_source, angles_source,
                 target_imgs, *extra):
        fb = self.frame_batch
        target_imgs = jnp.asarray(target_imgs)
        t = target_imgs.shape[0]
        outs = None
        for start in range(0, t, fb):
            chunk = [a[start:start + fb] for a in (target_imgs,) + extra]
            n = chunk[0].shape[0]
            if n < fb:
                chunk = [jnp.concatenate(
                    [c] + [c[-1:]] * (fb - n), axis=0) for c in chunk]
            res = self._call(self.weights, source_code, params_source,
                             angles_source, *chunk)
            # pytree ops: outputs may include dict leaves (params_target
            # when the bundle was exported with return_target_params)
            res = jax.tree_util.tree_map(lambda x: x[:n], res)
            outs = [res] if outs is None else outs + [res]
        if outs is None:
            raise ValueError("empty target batch")
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def load_reenact_bundle(path: str) -> ReenactServingProgram:
    """Deserialize a bundle directory into a callable serving program.

    Imports NO model code and converts no checkpoints — the program is
    the stored StableHLO; first call compiles it for the local backend
    (cached), later calls dispatch directly.
    """
    from jax import export as jexport

    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        extra = (" (v1 stored weights as pickle, which is unsafe to load "
                 "from untrusted sources; re-export the bundle)"
                 if meta.get("format_version") == 1 else "")
        raise ValueError(
            f"unsupported bundle format_version {meta.get('format_version')} "
            f"(this build reads {FORMAT_VERSION}){extra}")
    with open(os.path.join(path, PROGRAM_FILE), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    with np.load(os.path.join(path, WEIGHTS_FILE)) as z:
        leaves = [z[f"w{i}"] for i in range(len(z.files))]
    with open(os.path.join(path, WEIGHTS_TREE_FILE)) as f:
        weights = _decode_tree(json.load(f), leaves)
    # canonicalized backend name (`jax.default_backend()` says 'gpu' where
    # export platforms say 'cuda'/'rocm'; default_export_platform
    # canonicalizes) — jax.export's own call-time check is the backstop
    backend = jexport.default_export_platform()
    if backend not in meta["platforms"]:
        raise ValueError(
            f"bundle was exported for platforms {meta['platforms']} but the "
            f"local backend is '{backend}'; re-export with "
            f"--platforms {backend} (or multiple platforms)")
    return ReenactServingProgram(exported, weights, meta)
