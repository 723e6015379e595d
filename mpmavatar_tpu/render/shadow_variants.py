"""The remaining quasi-shadow network variants.

Functional JAX ports of the four shadow networks the reference defines
but does not use in its shipped pipeline (only ``ShadowUNet`` is wired
into the avatar, /root/reference/scene/mesh_gaussian_model.py:113):

* ``FloorShadowDecoder``  (/root/reference/scene/shadow.py:184-249) —
  strided conv encoder / transpose-conv decoder with additive skips,
  predicting a floor shadow from the AO map via
  ``(tanh(up5(x) + ao) + 1) / 2``.
* ``ShadowUNet_PoseCond``  (:251-420) — the ShadowUNet encoder/decoder
  with a root-pose code conv-encoded at the bottleneck (the reference
  also builds a ``pose_fc_block`` that its forward never uses; that
  dead branch is intentionally not carried).
* ``PoseToShadow``  (:422-464) — pose vector -> FC -> 5 transpose convs
  -> sigmoid shadow map (no AO input at all).
* ``DistMapShadowUNet``  (:467-622) — UNet over per-joint distance maps
  instead of AO, with a tied-/untied-bias switch on the prediction head.

Same conventions as ``render/shadow.py``: NCHW, weight-normalized convs
from ``render/layers.py``, ``jax.image.resize`` bilinear resampling (the
reference's align_corners variants differ by sub-pixel phase only; these
nets train from scratch here, so the convention is absorbed by training).
Each variant is an (init_*, apply_*) pair over a plain param dict.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (conv2d_wn_apply, conv2d_wn_init, linear_wn_apply,
                     linear_wn_init, lrelu_gain, tile2d)


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _resize(x, hw):
    n, c = x.shape[:2]
    return jax.image.resize(x, (n, c, hw[0], hw[1]), method="bilinear")


# ----------------------------------------------------------------------
# FloorShadowDecoder (shadow.py:184-249)
# ----------------------------------------------------------------------
def init_floor_shadow_decoder(key, uv_size: int = 512,
                              beta: float = 1.0) -> Dict:
    """Channel ladder 1-64-64-128-256-512 down, mirrored up, k=4 s=2
    (shadow.py:192-221); final layer gain 1.0, rest lrelu(0.2)."""
    downs = [(1, 64), (64, 64), (64, 128), (128, 256), (256, 512)]
    ups = [(512, 256), (256, 128), (128, 64), (64, 64), (64, 1)]
    keys = jax.random.split(key, 10)
    g = lrelu_gain(0.2)
    p: Dict = {"beta": jnp.float32(beta)}
    size = uv_size
    for i, (ci, co) in enumerate(downs):
        size //= 2
        p[f"down{i}"] = conv2d_wn_init(keys[i], ci, co, k=4, gain=g,
                                       height=size)
    for i, (ci, co) in enumerate(ups):
        size *= 2
        p[f"up{i}"] = conv2d_wn_init(keys[5 + i], ci, co, k=4,
                                     gain=(1.0 if i == 4 else g),
                                     height=size)
    return p


def apply_floor_shadow_decoder(p: Dict, ao_map: jnp.ndarray,
                               uv_size: int = 512) -> Dict:
    """shadow.py:229-249.  ao_map: (B, 1, H, W) -> shadow_map at
    uv_size (5 halvings down, 5 doublings back up)."""
    ao = ao_map
    if ao.shape[-2:] != (uv_size, uv_size):
        ao = _resize(ao, (uv_size, uv_size))
    acts = [None] * 5
    x = ao - 0.5
    for i in range(5):
        x = _leaky(conv2d_wn_apply(p[f"down{i}"], x, stride=2))
        acts[i] = x
    for i in range(4):
        x = _leaky(conv2d_wn_apply(p[f"up{i}"], x, stride=2,
                                   transpose=True))
        x = x + acts[3 - i]
    x = conv2d_wn_apply(p["up4"], x, stride=2, transpose=True)
    # final residual vs the (resized) input AO map (shadow.py:247)
    logits = (jnp.tanh(x + _resize(ao, x.shape[-2:])) + 1.0) / 2.0
    return {"shadow_map": logits}


# ----------------------------------------------------------------------
# ShadowUNet_PoseCond (shadow.py:251-420)
# ----------------------------------------------------------------------
def init_shadow_unet_posecond(key, ao_mean: np.ndarray,
                              uv_size: int = 256, shadow_size: int = 256,
                              n_dims: int = 64, n_pose_dims: int = 6,
                              n_pose_enc_dims: int = 32,
                              lrelu_slope: float = 0.2,
                              beta: float = 1.0) -> Dict:
    sizes = [shadow_size // (2 ** i) for i in range(4)]
    enc_dims = [(1, n_dims)] + [(n_dims, n_dims)] * 3
    dec_dims = [(n_dims + n_pose_enc_dims, n_dims)] + \
        [(n_dims * 2, n_dims)] * 3
    g = lrelu_gain(lrelu_slope)
    keys = jax.random.split(key, 10)
    p: Dict = {"beta": jnp.float32(beta),
               "ao_mean": jnp.asarray(ao_mean, jnp.float32).reshape(
                   1, 1, *np.asarray(ao_mean).shape[-2:])}
    for i, (ci, co) in enumerate(enc_dims):
        p[f"enc{i}"] = conv2d_wn_init(keys[i], ci, co, k=3, gain=g,
                                      height=sizes[i])
    for i, (ci, co) in enumerate(dec_dims):
        p[f"dec{i}"] = conv2d_wn_init(keys[4 + i], ci, co, k=3, gain=g,
                                      height=sizes[-i - 1])
    p["pose_conv"] = conv2d_wn_init(keys[8], n_pose_dims, n_pose_enc_dims,
                                    k=3, gain=g, height=sizes[-1])
    p["pred"] = conv2d_wn_init(keys[9], n_dims, 1, k=3, gain=1.0,
                               height=sizes[0])
    return p


def apply_shadow_unet_posecond(p: Dict, ao_map: jnp.ndarray,
                               pose_vec: jnp.ndarray,
                               lrelu_slope: float = 0.2,
                               uv_size: int = 256) -> Dict:
    """shadow.py:377-420.  ao_map (B, 1, H, W); pose_vec (B, n_pose)."""
    shadow_size = p["enc0"]["b"].shape[-1]
    sizes = [shadow_size // (2 ** i) for i in range(4)]
    x = ao_map - p["ao_mean"]
    if x.shape[-2:] != (shadow_size, shadow_size):
        x = _resize(x, (shadow_size, shadow_size))
    enc_acts = []
    for i in range(4):
        x = _leaky(conv2d_wn_apply(p[f"enc{i}"], x), lrelu_slope)
        enc_acts.append(x)
        if i < 3:
            x = _resize(x, (sizes[i + 1], sizes[i + 1]))
    pose_enc = conv2d_wn_apply(p["pose_conv"], tile2d(pose_vec, sizes[-1]))
    x = jnp.concatenate([x, pose_enc], axis=1)
    for i in range(4):
        if i > 0:
            prev = enc_acts[-i - 1]
            x = _resize(x, prev.shape[-2:])
            x = jnp.concatenate([x, prev], axis=1)
        x = _leaky(conv2d_wn_apply(p[f"dec{i}"], x), lrelu_slope)
    low = jax.nn.sigmoid(conv2d_wn_apply(p["pred"], x) + p["beta"])
    return {"shadow_map": _resize(low, (uv_size, uv_size)),
            "ao_map": ao_map}


# ----------------------------------------------------------------------
# PoseToShadow (shadow.py:422-464)
# ----------------------------------------------------------------------
def init_pose_to_shadow(key, n_pose_dims: int, uv_size: int = 256,
                        beta: float = 1.0) -> Dict:
    convs = [(256, 256), (256, 128), (128, 128), (128, 64), (64, 1)]
    g = lrelu_gain(0.2)
    keys = jax.random.split(key, 6)
    p: Dict = {"beta": jnp.float32(beta),
               "fc": linear_wn_init(keys[0], n_pose_dims, 256 * 4 * 4,
                                    gain=g)}
    size = 4
    for i, (ci, co) in enumerate(convs):
        size *= 2
        p[f"conv{i}"] = conv2d_wn_init(keys[1 + i], ci, co, k=4,
                                       gain=(1.0 if i == 4 else g),
                                       height=size)
    return p


def apply_pose_to_shadow(p: Dict, pose: jnp.ndarray,
                         uv_size: int = 256) -> Dict:
    """shadow.py:451-464.  pose: (B, n_pose_dims) -> 128² lowres,
    resized to uv_size."""
    x = _leaky(linear_wn_apply(p["fc"], pose)).reshape(-1, 256, 4, 4)
    for i in range(5):
        x = conv2d_wn_apply(p[f"conv{i}"], x, stride=2, transpose=True)
        if i < 4:
            x = _leaky(x)
    low = jax.nn.sigmoid(x + p["beta"])
    return {"shadow_map": _resize(low, (uv_size, uv_size))}


# ----------------------------------------------------------------------
# DistMapShadowUNet (shadow.py:467-622)
# ----------------------------------------------------------------------
def init_distmap_shadow_unet(key, n_dist_joints: int, uv_size: int = 256,
                             shadow_size: int = 256, n_dims: int = 64,
                             lrelu_slope: float = 0.2, beta: float = 1.0,
                             biases: bool = True) -> Dict:
    sizes = [shadow_size // (2 ** i) for i in range(4)]
    enc_dims = [(n_dist_joints, n_dims)] + [(n_dims, n_dims)] * 3
    dec_dims = [(n_dims, n_dims)] + [(n_dims * 2, n_dims)] * 3
    g = lrelu_gain(lrelu_slope)
    keys = jax.random.split(key, 9)
    p: Dict = {"beta": jnp.float32(beta)}
    for i, (ci, co) in enumerate(enc_dims):
        p[f"enc{i}"] = conv2d_wn_init(keys[i], ci, co, k=3, gain=g,
                                      height=sizes[i])
    for i, (ci, co) in enumerate(dec_dims):
        p[f"dec{i}"] = conv2d_wn_init(keys[4 + i], ci, co, k=3, gain=g,
                                      height=sizes[-i - 1])
    # biases=True -> untied-bias head (Conv2dWNUB); else tied (Conv2dWN)
    p["pred"] = conv2d_wn_init(keys[8], n_dims, 1, k=3, gain=1.0,
                               height=(sizes[0] if biases else None))
    return p


def apply_distmap_shadow_unet(p: Dict, dist_map: jnp.ndarray,
                              lrelu_slope: float = 0.2,
                              uv_size: int = 256) -> Dict:
    """shadow.py:577-622.  dist_map: (B, n_dist_joints, H, W)."""
    shadow_size = p["enc0"]["b"].shape[-1]
    sizes = [shadow_size // (2 ** i) for i in range(4)]
    x = dist_map
    if x.shape[-2:] != (shadow_size, shadow_size):
        x = _resize(x, (shadow_size, shadow_size))
    enc_acts = []
    for i in range(4):
        x = _leaky(conv2d_wn_apply(p[f"enc{i}"], x), lrelu_slope)
        enc_acts.append(x)
        if i < 3:
            x = _resize(x, (sizes[i + 1], sizes[i + 1]))
    for i in range(4):
        if i > 0:
            prev = enc_acts[-i - 1]
            x = _resize(x, prev.shape[-2:])
            x = jnp.concatenate([x, prev], axis=1)
        x = _leaky(conv2d_wn_apply(p[f"dec{i}"], x), lrelu_slope)
    low = jax.nn.sigmoid(conv2d_wn_apply(p["pred"], x) + p["beta"])
    return {"shadow_map": _resize(low, (uv_size, uv_size)),
            "shadow_map_lowres": low}
