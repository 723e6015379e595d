"""VPoser v1 body-pose prior decoder in JAX.

Port of the human_body_prior ``VPoser(512, 32, [3, 21])`` decoder used by
the reference for latent-space pose optimization
(/root/reference/utils/smplx_deformer.py:32-35,74-76; preprocess mesh
tracking :433-436).  Architecture: latent(32) -> fc(512) -> lrelu ->
fc(512) -> lrelu -> fc(21*6) -> continuous-6D -> rotation matrices.

Weights load from the official ``TR00_E096.pt`` checkpoint via
``load_vposer_torch`` (torch CPU is available in this environment).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_vposer(key, num_neurons=512, latent_dim=32, n_joints=21) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)

    def lin(k, i, o):
        bound = 1.0 / np.sqrt(i)
        return {"w": jax.random.uniform(k, (i, o), jnp.float32,
                                        -bound, bound),
                "b": jnp.zeros((o,), jnp.float32)}

    return {"fc1": lin(k1, latent_dim, num_neurons),
            "fc2": lin(k2, num_neurons, num_neurons),
            "out": lin(k3, num_neurons, n_joints * 6),
            "n_joints": n_joints}


_DECODER_SHAPES = {  # official VPoser(512, 32, [3, 21]) decoder
    "bodyprior_dec_fc1.weight": (512, 32),
    "bodyprior_dec_fc1.bias": (512,),
    "bodyprior_dec_fc2.weight": (512, 512),
    "bodyprior_dec_fc2.bias": (512,),
    "bodyprior_dec_out.weight": (126, 512),
    "bodyprior_dec_out.bias": (126,),
}


def load_vposer_torch(path: str) -> Dict:
    """Convert the official ``TR00_E096.pt`` checkpoint to our param dict.

    The file is a plain ``state_dict`` of the full VAE (encoder BN/fc
    layers + decoder) saved by human_body_prior; the reference loads it
    with ``VPoser(512, 32, [3, 21]).load_state_dict(torch.load(...))``
    (/root/reference/utils/smplx_deformer.py:32-35).  Only the decoder
    weights matter for pose decoding; encoder keys are ignored.  Fails
    loudly on missing or mis-shaped decoder keys, and tolerates a
    ``state_dict``/``vp_model.`` wrapping some re-exports use."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and not any(
            k.startswith("bodyprior_dec") for k in sd):
        sd = sd["state_dict"]
    sd = {k[len("vp_model."):] if k.startswith("vp_model.") else k: v
          for k, v in sd.items()}
    missing = [k for k in _DECODER_SHAPES if k not in sd]
    if missing:
        raise ValueError(
            f"VPoser checkpoint {path!r} lacks decoder keys {missing}; "
            f"found {sorted(sd)[:8]}...")
    bad = [f"{k}: {tuple(sd[k].shape)} != {s}"
           for k, s in _DECODER_SHAPES.items()
           if tuple(sd[k].shape) != s]
    if bad:
        raise ValueError(f"VPoser checkpoint {path!r} decoder shape "
                         f"mismatch: {bad}")
    get = lambda k: jnp.asarray(sd[k].numpy())
    return {
        "fc1": {"w": get("bodyprior_dec_fc1.weight").T,
                "b": get("bodyprior_dec_fc1.bias")},
        "fc2": {"w": get("bodyprior_dec_fc2.weight").T,
                "b": get("bodyprior_dec_fc2.bias")},
        "out": {"w": get("bodyprior_dec_out.weight").T,
                "b": get("bodyprior_dec_out.bias")},
        "n_joints": 21,
    }


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def rot6d_to_matrix(x):
    """Continuous 6D rotation representation -> (..., 3, 3).

    Matches human_body_prior's ``ContinousRotReprDecoder`` exactly (the
    module the official TR00_E096.pt decoder head was trained against):
    the 6 outputs per joint are ``view(-1, 3, 2)``, so the two raw basis
    vectors are the INTERLEAVED strides ``x[..., 0::2]`` / ``x[..., 1::2]``
    (not the contiguous halves), and the orthonormal frame is stacked as
    COLUMNS (``torch.stack([b1, b2, b3], dim=-1)``).  Using the
    contiguous-halves row convention with the official weights would
    decode transposed rotations from swapped bases."""
    a1 = x[..., 0::2]
    a2 = x[..., 1::2]
    # sqrt(sum^2 + eps^2) norms: jnp.linalg.norm has a NaN GRADIENT at
    # zero input (d||a||/da = a/||a||), and a zero 6D vector is exactly
    # what an untrained decoder head emits — the joint-SMPL-X tracking
    # fit differentiates through here (train/tracking.py step_joint).
    # Value change vs the clamped norm is O(eps) = O(1e-8).
    n1 = jnp.sqrt(jnp.sum(a1 * a1, -1, keepdims=True) + 1e-16)
    b1 = a1 / n1
    b2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    n2 = jnp.sqrt(jnp.sum(b2 * b2, -1, keepdims=True) + 1e-16)
    b2 = b2 / n2
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def vposer_decode(params: Dict, latent: jnp.ndarray) -> jnp.ndarray:
    """latent (B, 32) -> body-pose rotation matrices (B, 21, 3, 3)."""
    x = _leaky(latent @ params["fc1"]["w"] + params["fc1"]["b"])
    x = _leaky(x @ params["fc2"]["w"] + params["fc2"]["b"])
    x = x @ params["out"]["w"] + params["out"]["b"]
    # n_joints from the STATIC output-layer width, not the params dict's
    # "n_joints" int — under jit the whole dict is traced and an int leaf
    # becomes a tracer, which would make the reshape shape-dependent
    # (hit by MeshTracker.step_joint, which takes vposer as a jit arg)
    n = params["out"]["w"].shape[-1] // 6
    return rot6d_to_matrix(x.reshape(latent.shape[0], n, 6))


def matrix_to_axis_angle(r):
    """(..., 3, 3) -> (..., 3) rotation vectors (for smplx body_pose).

    atan2 formulation: arccos((trace-1)/2) has an INFINITE gradient at
    identity (cos -> 1), and identity rotations are routine (rest pose)
    — the joint tracking fit differentiates through this.  Values match
    arccos on [0, pi] (sin(theta) >= 0 there)."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    axis_raw = jnp.stack([r[..., 2, 1] - r[..., 1, 2],
                          r[..., 0, 2] - r[..., 2, 0],
                          r[..., 1, 0] - r[..., 0, 1]], -1)  # 2 sin * axis
    # grad-safe |sin|: sqrt(x + eps) never differentiates 1/sqrt(0)
    sin = 0.5 * jnp.sqrt(jnp.sum(axis_raw * axis_raw, -1) + 1e-16)
    angle = jnp.arctan2(sin, cos)
    safe = sin > 1e-6
    axis = jnp.where(safe[..., None],
                     axis_raw / jnp.where(safe, 2.0 * sin, 1.0)[..., None],
                     jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                      axis_raw.shape))
    return axis * angle[..., None]
