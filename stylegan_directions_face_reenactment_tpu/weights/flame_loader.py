"""FLAME model-data loader: generic_model.pkl + landmark_embedding.npy.

The FLAME pickle contains chumpy arrays and scipy sparse matrices
(`libs/DECA/decalib/models/FLAME.py:43-91` decodes them with chumpy
installed). chumpy is not in this environment, so we unpickle with a stub
class whose __setstate__ captures the underlying numpy arrays.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

Params = Dict[str, Any]

N_SHAPE = 100
N_EXP = 50


class _ChumpyStub:
    """Stands in for chumpy.Ch / chumpy array types during unpickling."""

    def __init__(self, *args, **kwargs):
        self.__dict__["_data"] = None

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    @property
    def r(self):
        return self.to_np()

    def to_np(self):
        for key in ("x", "_data", "a"):
            v = self.__dict__.get(key)
            if v is not None:
                return np.asarray(v)
        raise ValueError("could not extract array from chumpy stub")


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if isinstance(x, _ChumpyStub):
        return x.to_np()
    if hasattr(x, "todense"):  # scipy sparse
        return np.asarray(x.todense())
    return np.asarray(x)


def load_flame_params(model_path: str, lmk_embedding_path: str,
                      n_shape: int = N_SHAPE, n_exp: int = N_EXP) -> Params:
    """generic_model.pkl + landmark_embedding.npy → FLAME pytree matching
    `models/deca/flame.py` (shapedirs sliced to [:n_shape] + [300:300+n_exp],
    posedirs reshaped to (36, V*3) — `FLAME.py:51-66`)."""
    with open(model_path, "rb") as f:
        ss = _StubUnpickler(f, encoding="latin1").load()

    def get(key):
        return _to_np(ss[key] if isinstance(ss, dict) else getattr(ss, key))

    v_template = get("v_template").astype(np.float32)
    shapedirs = get("shapedirs").astype(np.float32)
    shapedirs = np.concatenate([shapedirs[:, :, :n_shape],
                                shapedirs[:, :, 300:300 + n_exp]], axis=2)
    posedirs = get("posedirs").astype(np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    j_regressor = get("J_regressor").astype(np.float32)
    lbs_weights = get("weights").astype(np.float32)
    faces = get("f").astype(np.int32)

    lmk = np.load(lmk_embedding_path, allow_pickle=True, encoding="latin1")[()]

    def lk(key):
        v = lmk[key]
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    return {
        "v_template": jnp.asarray(v_template),
        "shapedirs": jnp.asarray(shapedirs),
        "posedirs": jnp.asarray(posedirs),
        "j_regressor": jnp.asarray(j_regressor),
        "lbs_weights": jnp.asarray(lbs_weights),
        "faces": jnp.asarray(faces),
        "lmk_faces_idx": jnp.asarray(lk("static_lmk_faces_idx").astype(np.int32)),
        "lmk_bary_coords": jnp.asarray(lk("static_lmk_bary_coords").astype(np.float32)),
        "dynamic_lmk_faces_idx": jnp.asarray(
            lk("dynamic_lmk_faces_idx").astype(np.int32)),
        "dynamic_lmk_bary_coords": jnp.asarray(
            lk("dynamic_lmk_bary_coords").astype(np.float32)),
        "full_lmk_faces_idx": jnp.asarray(
            lk("full_lmk_faces_idx").reshape(-1).astype(np.int32)),
        "full_lmk_bary_coords": jnp.asarray(
            lk("full_lmk_bary_coords").reshape(-1, 3).astype(np.float32)),
    }


def load_flame_tex(tex_path: str, tex_type: str = "BFM",
                   n_tex: int = 50) -> Params:
    """FLAME/BFM texture-space file → ``flametex_forward`` params
    (`FLAME.py:223-252`): BFM files carry MU/PC (199 components, raw
    0-255 scale), FLAME files carry mean/tex_dir (200 components,
    pre-divided by 255). Basis is truncated to the first ``n_tex``
    columns (DECA config ``n_tex=50``, `utils/config.py:30`)."""
    tex_space = np.load(tex_path)

    def basis_2d(arr, n_pc):
        # the reference reshapes to its hardcoded component count
        # (199 BFM / 200 FLAME); an already-2-D array keeps its own width
        # (identical for the real files, tolerant of truncated fixtures)
        arr = np.asarray(arr)
        return arr if arr.ndim == 2 else arr.reshape(-1, n_pc)

    if tex_type == "BFM":
        texture_mean = np.asarray(tex_space["MU"]).reshape(1, -1)
        texture_basis = basis_2d(tex_space["PC"], 199)
    elif tex_type == "FLAME":
        texture_mean = np.asarray(tex_space["mean"]).reshape(1, -1) / 255.0
        texture_basis = basis_2d(tex_space["tex_dir"], 200) / 255.0
    else:
        raise ValueError(f"unknown tex_type {tex_type!r} (BFM or FLAME)")
    return {
        "texture_mean": jnp.asarray(texture_mean, jnp.float32),
        "texture_basis": jnp.asarray(
            texture_basis[:, :n_tex], jnp.float32),
    }
