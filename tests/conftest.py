"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip TPU hardware is unavailable in CI; sharding/pjit tests run
against a virtual 8-device CPU mesh (`xla_force_host_platform_device_count`).

Note: the environment's sitecustomize may import jax and register a TPU
backend at interpreter startup, so env-var-only platform selection is too
late here. The CPU backend still initializes lazily, so we set XLA_FLAGS
before touching it and then route everything to CPU via jax_default_device.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# Pin the platform via the CONFIG knob and drop any pre-initialized
# backends (same hermetic recipe as __graft_entry__.dryrun_multichip):
# the env var alone does NOT stop jax.devices() from initializing a
# sitecustomize-registered TPU backend, and when that backend's tunnel
# endpoint is down the init blocks forever — hanging every pytest run.
jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend
    jax.extend.backend.clear_backends()
except Exception:  # pragma: no cover - nothing initialized yet
    pass

try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except Exception:  # pragma: no cover - cpu backend always exists
    pass

# Persistent compilation cache: the big train-step graphs take minutes to
# compile on the single test CPU; cache them across pytest sessions. The
# directory is keyed by host CPU flags — XLA:CPU AOT artifacts are
# machine-specific and loading another machine's can SIGILL/hang
# (utils/jax_cache.py).
try:
    from stylegan_directions_face_reenactment_tpu.utils.jax_cache import (
        _machine_tag)
    _cache_dir = os.path.expanduser(
        f"~/.cache/reenact_tpu_xla_tests-{_machine_tag()}")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def cpu_devices():
    return jax.devices("cpu")
