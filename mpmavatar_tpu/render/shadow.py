"""Quasi-shadow UNet in pure JAX (param-pytree functional module).

Port of ``ShadowUNet`` (/root/reference/scene/shadow.py:14-181) with the
Meta weight-normalized, untied-bias conv layers
(/root/reference/scene/network.py:277-481): maps (AO map − mean AO) to a
sigmoid shadow map in UV space.  Used with ``n_dims=4`` by the avatar
(/root/reference/scene/mesh_gaussian_model.py:113-120).

Note: up/down-sampling uses ``jax.image.resize`` (half-pixel-center
bilinear); the reference uses torch ``align_corners=True`` interpolation.
The nets are trained from scratch in this framework, so the convention
difference is absorbed by training.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d(x, w):
    """NCHW conv, 3x3, stride 1, SAME padding."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _wn(params, name):
    """Weight-normalized kernel: g * v / ||v|| (network.py:158-276)."""
    v = params[f"{name}_v"]
    g = params[f"{name}_g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3), keepdims=True) + 1e-12)
    return v * (g / norm)


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _resize(x, hw):
    n, c, _, _ = x.shape
    return jax.image.resize(x, (n, c, hw[0], hw[1]), method="bilinear")


def init_shadow_unet(key, ao_mean: np.ndarray, uv_size: int = 256,
                     shadow_size: int = 256, n_dims: int = 4,
                     lrelu_slope: float = 0.2, beta: float = 1.0) -> Dict:
    """Build the parameter pytree.  Initialization follows
    weights_initializer (network.py:1022-1041): Kaiming-uniform on v with
    the lrelu gain, g = ||v|| per output channel (torch weight_norm init),
    untied biases zero."""
    sizes = [shadow_size // (2 ** i) for i in range(4)]
    enc_dims = [(1, n_dims)] + [(n_dims, n_dims)] * 3
    dec_dims = [(n_dims, n_dims)] + [(n_dims * 2, n_dims)] * 3

    params = {"ao_mean": jnp.asarray(ao_mean, jnp.float32).reshape(
        1, 1, *np.asarray(ao_mean).shape[-2:]),
        "beta": jnp.float32(beta)}
    if params["ao_mean"].shape[-2:] != (shadow_size, shadow_size):
        params["ao_mean"] = _resize(params["ao_mean"],
                                    (shadow_size, shadow_size))

    def init_conv(key, name, n_in, n_out, size, gain_slope, untied_bias=True):
        k1, _ = jax.random.split(key)
        fan_in = n_in * 9
        gain = math.sqrt(2.0 / (1.0 + gain_slope ** 2))
        bound = gain * math.sqrt(3.0 / fan_in)
        v = jax.random.uniform(k1, (n_out, n_in, 3, 3), jnp.float32,
                               -bound, bound)
        params[f"{name}_v"] = v
        params[f"{name}_g"] = jnp.sqrt(
            jnp.sum(v * v, axis=(1, 2, 3), keepdims=True))
        if untied_bias:
            params[f"{name}_b"] = jnp.zeros((1, n_out, size, size),
                                            jnp.float32)
        else:
            params[f"{name}_b"] = jnp.zeros((1, n_out, 1, 1), jnp.float32)

    keys = jax.random.split(key, 16)
    for i, (n_in, n_out) in enumerate(enc_dims):
        init_conv(keys[i], f"enc{i}", n_in, n_out, sizes[i], lrelu_slope)
    for i, (n_in, n_out) in enumerate(dec_dims):
        init_conv(keys[4 + i], f"dec{i}", n_in, n_out, sizes[-i - 1],
                  lrelu_slope)
    init_conv(keys[8], "pred", n_dims, 1, sizes[0], 1.0, untied_bias=False)
    return params


def shadow_unet_apply(params: Dict, ao_map: jnp.ndarray,
                      lrelu_slope: float = 0.2,
                      uv_size: int = 256) -> Dict:
    """Forward pass (shadow.py:133-181).  ao_map: (B, 1, H, W).

    shadow_size is inferred from the stored mean-AO buffer (static under
    tracing)."""
    shadow_size = params["ao_mean"].shape[-1]
    sizes = [shadow_size // (2 ** i) for i in range(4)]

    if ao_map.shape[-2:] != (shadow_size, shadow_size):
        ao_map = _resize(ao_map, (shadow_size, shadow_size))
    x = ao_map - params["ao_mean"]

    enc_acts = []
    for i in range(4):
        x = _leaky(_conv2d(x, _wn(params, f"enc{i}")) + params[f"enc{i}_b"],
                   lrelu_slope)
        enc_acts.append(x)
        if i < 3:
            x = _resize(x, (sizes[i + 1], sizes[i + 1]))

    for i in range(4):
        if i > 0:
            x_prev = enc_acts[-i - 1]
            x = _resize(x, x_prev.shape[-2:])
            x = jnp.concatenate([x, x_prev], axis=1)
        x = _leaky(_conv2d(x, _wn(params, f"dec{i}")) + params[f"dec{i}_b"],
                   lrelu_slope)

    low = jax.nn.sigmoid(_conv2d(x, _wn(params, "pred")) + params["pred_b"]
                         + params["beta"])
    shadow_map = _resize(low, (uv_size, uv_size))
    return {"shadow_map": shadow_map, "ao_map": ao_map,
            "shadow_map_lowres": low}


def grid_sample_bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Minimal F.grid_sample(align_corners=False, bilinear, zeros-padding)
    equivalent for UV lookups (train_appearance.py:121,
    train_material_params.py:860).

    img: (C, H, W); uv: (N, 2) in [-1, 1].  Returns (N, C)."""
    c, h, w = img.shape
    x = ((uv[:, 0] + 1.0) * w - 1.0) * 0.5
    y = ((uv[:, 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        vals = img[:, iyc, ixc]            # (C, N)
        return jnp.where(inb[None, :], vals, 0.0)

    v = (tap(x0, y0) * ((1 - wx) * (1 - wy))[None]
         + tap(x0 + 1, y0) * (wx * (1 - wy))[None]
         + tap(x0, y0 + 1) * ((1 - wx) * wy)[None]
         + tap(x0 + 1, y0 + 1) * (wx * wy)[None])
    return v.T
