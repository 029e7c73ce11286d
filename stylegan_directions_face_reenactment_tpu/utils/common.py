"""Misc utilities (reference `libs/utilities/utils.py`)."""

from __future__ import annotations

import json
import os
from typing import List

import jax
import jax.numpy as jnp


def jit_build(build_fn, *args):
    """Run a model-building function as ONE jitted program.

    Random-init of a full model issues hundreds of tiny eager ops (one per
    leaf), each paying a dispatch+compile round-trip — ~2 min for the frozen
    zoo on a tunneled TPU or an 8-virtual-device CPU. Fusing the whole init
    into a single XLA program makes it one compile + one execution.

    Static 'meta'/'_meta' leaves (python ints/bools) must not become traced
    arrays, so they are stripped inside the trace (a trace-time side
    effect captures them) and re-merged onto the result.
    """
    from ..train.steps import merge_statics, strip_statics

    box = {}

    @jax.jit
    def _build(*a):
        arrays, statics = strip_statics(build_fn(*a))
        box["statics"] = statics
        return arrays

    arrays = _build(*args)
    return merge_statics(arrays, box["statics"])


def make_noise(key: jax.Array, batch: int, dim: int) -> jnp.ndarray:
    """Standard-normal z batch (`utils.py:54-60`; RNG is an explicit key)."""
    return jax.random.normal(key, (batch, dim))


def one_hot(dims: int, value: float, index: int) -> jnp.ndarray:
    """(1, dims) vector with `value` at `index` (`utils.py:62-65`)."""
    return jnp.zeros((1, dims), jnp.float32).at[0, index].set(value)


def make_path(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def save_arguments_json(args, save_path: str, filename: str = "arguments.json"):
    make_path(save_path)
    d = vars(args) if not isinstance(args, dict) else args
    with open(os.path.join(save_path, filename), "w") as f:
        json.dump(d, f, indent=2, default=str)


def get_image_files(path: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.lower().endswith(exts))
