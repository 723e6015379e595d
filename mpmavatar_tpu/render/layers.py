"""Functional NN layer library (weight-norm / untied-bias / equalized-LR).

Compact JAX port of the Meta-origin layer zoo the reference carries
(/root/reference/scene/network.py:158-1054): weight-normalized linear and
conv layers, untied-bias variants, equalized-learning-rate layers, the
interpolating up-conv, antialiased downsample, glorot and Kaiming
initializers, and ``tile2d``.  Each layer is an (init, apply) pair over a
plain param dict — composable with optax without a framework dependency.
Only ``ShadowUNet`` consumes these in the shipped pipeline
(scene/shadow.py), but the full set is provided for parity.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform(key, shape, fan_in, gain):
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def lrelu_gain(slope=0.2):
    return math.sqrt(2.0 / (1.0 + slope ** 2))


def glorot(key, shape, fan_in, fan_out, gain=1.0):
    """network.py:606-... glorot-normal initializer."""
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, jnp.float32)


# ----------------------------------------------------------------------
# weight-normalized layers (network.py:158-481)
# ----------------------------------------------------------------------
def linear_wn_init(key, n_in, n_out, gain=1.0) -> Dict:
    v = _kaiming_uniform(key, (n_in, n_out), n_in, gain)
    return {"v": v,
            "g": jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)),
            "b": jnp.zeros((n_out,), jnp.float32)}


def linear_wn_apply(p: Dict, x):
    v, g = p["v"], p["g"]
    w = v * g / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
    return x @ w + p["b"]


def conv2d_wn_init(key, n_in, n_out, k=3, gain=1.0, height=None,
                   width=None) -> Dict:
    """Conv2dWN; pass height/width for the untied-bias (UB) variant
    (network.py:277-331)."""
    v = _kaiming_uniform(key, (n_out, n_in, k, k), n_in * k * k, gain)
    p = {"v": v, "g": jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3),
                                       keepdims=True))}
    if height is not None:
        p["b"] = jnp.zeros((1, n_out, height, width or height), jnp.float32)
    else:
        p["b"] = jnp.zeros((1, n_out, 1, 1), jnp.float32)
    return p


def conv2d_wn_apply(p: Dict, x, stride=1, padding="SAME",
                    transpose=False):
    v, g = p["v"], p["g"]
    w = v * g / jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3), keepdims=True)
                         + 1e-12)
    if transpose:
        y = jax.lax.conv_transpose(
            x, jnp.transpose(w, (2, 3, 1, 0)), (stride, stride), padding,
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
    else:
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"]


# ----------------------------------------------------------------------
# equalized-learning-rate layers (network.py:660-846)
# ----------------------------------------------------------------------
def linear_elr_init(key, n_in, n_out, gain=None) -> Dict:
    gain = gain if gain is not None else math.sqrt(2.0)
    return {"w": jax.random.normal(key, (n_in, n_out), jnp.float32),
            "b": jnp.zeros((n_out,), jnp.float32),
            "scale": jnp.float32(gain / math.sqrt(n_in))}


def linear_elr_apply(p: Dict, x):
    return x @ (p["w"] * p["scale"]) + p["b"]


def conv2d_elr_init(key, n_in, n_out, k=3, gain=None) -> Dict:
    gain = gain if gain is not None else math.sqrt(2.0)
    return {"w": jax.random.normal(key, (n_out, n_in, k, k), jnp.float32),
            "b": jnp.zeros((1, n_out, 1, 1), jnp.float32),
            "scale": jnp.float32(gain / math.sqrt(n_in * k * k))}


def conv2d_elr_apply(p: Dict, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"] * p["scale"], (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"]


# ----------------------------------------------------------------------
# resampling (network.py:548-552, 954-1020)
# ----------------------------------------------------------------------
def upconv2d(p: Dict, x, scale=2):
    """UpConv2d*: bilinear upsample then conv (network.py:548-552)."""
    n, c, h, w = x.shape
    up = jax.image.resize(x, (n, c, h * scale, w * scale),
                          method="bilinear")
    return conv2d_wn_apply(p, up)


_BLUR3 = np.outer([1.0, 2.0, 1.0], [1.0, 2.0, 1.0])
_BLUR3 = (_BLUR3 / _BLUR3.sum()).astype(np.float32)


def downsample_aa(x, factor=2):
    """Antialiased downsample: 3x3 binomial blur + stride
    (network.py:954-1020)."""
    c = x.shape[1]
    kern = jnp.broadcast_to(jnp.asarray(_BLUR3)[None, None], (c, 1, 3, 3))
    return jax.lax.conv_general_dilated(
        x, kern, (factor, factor), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)


def concat_pyramid(levels):
    """ConcatPyramid (network.py:847-953): upsample all levels to the
    finest resolution and concat on channels."""
    target = levels[0].shape[-2:]
    outs = [levels[0]]
    for lv in levels[1:]:
        n, c = lv.shape[:2]
        outs.append(jax.image.resize(lv, (n, c) + tuple(target),
                                     method="bilinear"))
    return jnp.concatenate(outs, axis=1)


def tile2d(x, size: int):
    """network.py:1043-...: tile a (N, C) code into a (N, C, size, size)
    feature map."""
    return jnp.broadcast_to(x[:, :, None, None],
                            x.shape + (size, size))
