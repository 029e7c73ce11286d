"""LPIPS perceptual loss (AlexNet backbone, v0.1 linear heads).

Functional equivalent of `libs/criteria/lpips/` (reference): z-score the
[-1, 1] inputs, run AlexNet features, tap after each of the 5 ReLUs,
unit-normalize per channel, square the difference, apply frozen 1x1 linear
heads, spatial-mean, and sum over layers+batch divided by batch
(`lpips.py:28-34` — note it is a *sum over layers*, not a mean).

Weights convert from torchvision alexnet + the richzhang linear heads via
:func:`convert_lpips_alex` (`weights/torch_convert.py` uses the same
helpers). Tests drive parity against torchvision directly.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nn import conv2d, max_pool2d, relu

Params = Dict[str, Any]

# torchvision alexnet.features layout: (out_ch, k, stride, pad) per conv
ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
              (256, 3, 1, 1), (256, 3, 1, 1))
# max-pool after conv index (0-based conv counter)
ALEX_POOL_AFTER = (0, 1, 4)
N_CHANNELS = (64, 192, 384, 256, 256)

# plain numpy: module import must not initialize a JAX backend
_MEAN = np.asarray([-0.030, -0.088, -0.188], np.float32)
_STD = np.asarray([0.458, 0.448, 0.450], np.float32)


def init_lpips_alex(key) -> Params:
    keys = jax.random.split(key, len(ALEX_CONVS) + len(N_CHANNELS))
    convs = []
    cin = 3
    for i, (cout, k, s, p) in enumerate(ALEX_CONVS):
        lim = 1.0 / jnp.sqrt(cin * k * k * 1.0)
        convs.append({"weight": jax.random.uniform(
            keys[i], (k, k, cin, cout), jnp.float32, -lim, lim),
            "bias": jnp.zeros((cout,), jnp.float32)})
        cin = cout
    lins = [jax.random.uniform(keys[len(ALEX_CONVS) + i], (1, 1, c, 1),
                               jnp.float32, 0.0, 2.0 / c)
            for i, c in enumerate(N_CHANNELS)]
    return {"convs": convs, "lins": lins}


def normalize_activation(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """x / (sqrt(sum_c x² + 1e-9) + eps) (`lpips/utils.py:6-12`)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-9)
    return x / (norm + eps)


def alex_features(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x (B, H, W, 3) in [-1, 1] → 5 unit-normalized feature taps."""
    x = (x - _MEAN.astype(x.dtype)) / _STD.astype(x.dtype)
    taps = []
    for i, ((cout, k, s, p), conv) in enumerate(zip(ALEX_CONVS, params["convs"])):
        x = relu(conv2d(x, conv["weight"], conv["bias"], stride=s, padding=p))
        taps.append(normalize_activation(x))
        if i in ALEX_POOL_AFTER:
            x = max_pool2d(x, 3, stride=2)
    return taps


def lpips(params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Scalar LPIPS distance summed over layers, averaged over batch."""
    fx = alex_features(params, x)
    fy = alex_features(params, y)
    total = 0.0
    for tx, ty, lin in zip(fx, fy, params["lins"]):
        d = jnp.square(tx - ty)
        r = conv2d(d, lin)                       # (B, H, W, 1)
        total = total + r.mean(axis=(1, 2, 3)).sum()
    return total / x.shape[0]


def convert_lpips_alex(alex_sd, lin_sd) -> Params:
    """torchvision alexnet.features state_dict + richzhang lin heads →
    pytree. alex keys: '{idx}.weight/bias' for idx in (0,3,6,8,10);
    lin keys: '{i}.1.weight' (after the reference's key renaming,
    `lpips/utils.py:26-33`)."""
    import numpy as np

    def cw(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(np.transpose(t, (2, 3, 1, 0)))

    def v(t):
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t)

    conv_ids = (0, 3, 6, 8, 10)
    convs = [{"weight": cw(alex_sd[f"{i}.weight"]),
              "bias": v(alex_sd[f"{i}.bias"])} for i in conv_ids]
    lins = [cw(lin_sd[f"{i}.1.weight"]) for i in range(5)]
    return {"convs": convs, "lins": lins}
