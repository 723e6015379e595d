"""Shape/finiteness/gradient tests for the four shadow-net variants
(/root/reference/scene/shadow.py:184-622)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmavatar_tpu.render.shadow_variants import (
    apply_distmap_shadow_unet, apply_floor_shadow_decoder,
    apply_pose_to_shadow, apply_shadow_unet_posecond,
    init_distmap_shadow_unet, init_floor_shadow_decoder,
    init_pose_to_shadow, init_shadow_unet_posecond)


def _finite_pytree(p):
    return all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util
               .tree_leaves(p) if jnp.issubdtype(x.dtype, jnp.floating))


def test_floor_shadow_decoder_shapes():
    key = jax.random.PRNGKey(0)
    uv = 64  # scaled-down 512 production size; pure conv ladder
    p = init_floor_shadow_decoder(key, uv_size=uv)
    ao = jax.random.uniform(key, (2, 1, 48, 48))  # triggers input resize
    out = apply_floor_shadow_decoder(p, ao, uv_size=uv)
    assert out["shadow_map"].shape == (2, 1, uv, uv)
    assert _finite_pytree(out)
    assert float(out["shadow_map"].min()) >= 0.0
    assert float(out["shadow_map"].max()) <= 1.0


def test_floor_shadow_decoder_grad_flows():
    key = jax.random.PRNGKey(1)
    p = init_floor_shadow_decoder(key, uv_size=32)
    ao = jax.random.uniform(key, (1, 1, 32, 32))

    def loss(p):
        return jnp.sum(apply_floor_shadow_decoder(p, ao, uv_size=32)
                       ["shadow_map"] ** 2)

    g = jax.grad(loss)(p)
    assert _finite_pytree(g)
    # every conv's v receives gradient (skip adds keep all paths live)
    for name in [f"down{i}" for i in range(5)] + [f"up{i}" for i in
                                                 range(5)]:
        assert float(jnp.abs(g[name]["v"]).max()) > 0, name


def test_posecond_unet_shapes_and_pose_sensitivity():
    key = jax.random.PRNGKey(2)
    ao_mean = np.full((32, 32), 0.5, np.float32)
    p = init_shadow_unet_posecond(key, ao_mean, uv_size=64,
                                  shadow_size=32, n_dims=4,
                                  n_pose_dims=6, n_pose_enc_dims=8)
    ao = jax.random.uniform(key, (1, 1, 32, 32))
    pose0 = jnp.zeros((1, 6))
    pose1 = jnp.ones((1, 6))
    out0 = apply_shadow_unet_posecond(p, ao, pose0, uv_size=64)
    out1 = apply_shadow_unet_posecond(p, ao, pose1, uv_size=64)
    assert out0["shadow_map"].shape == (1, 1, 64, 64)
    assert _finite_pytree(out0)
    # the pose code is concatenated at the bottleneck -> output depends
    # on it (shadow.py:401-404)
    assert float(jnp.abs(out0["shadow_map"]
                         - out1["shadow_map"]).max()) > 1e-7


def test_pose_to_shadow_shapes_and_grad():
    key = jax.random.PRNGKey(3)
    p = init_pose_to_shadow(key, n_pose_dims=6, uv_size=96)
    pose = jax.random.normal(key, (2, 6))
    out = apply_pose_to_shadow(p, pose, uv_size=96)
    # lowres ladder is fixed 4->128 (shadow.py:430-444), resized to uv
    assert out["shadow_map"].shape == (2, 1, 96, 96)
    assert _finite_pytree(out)

    def loss(p):
        return jnp.sum(apply_pose_to_shadow(p, pose, uv_size=96)
                       ["shadow_map"])

    g = jax.grad(loss)(p)
    assert _finite_pytree(g)
    assert float(jnp.abs(g["fc"]["v"]).max()) > 0


@pytest.mark.parametrize("biases", [True, False])
def test_distmap_unet_shapes(biases):
    key = jax.random.PRNGKey(4)
    p = init_distmap_shadow_unet(key, n_dist_joints=5, uv_size=64,
                                 shadow_size=32, n_dims=4, biases=biases)
    # tied vs untied prediction-head bias (shadow.py:584-596)
    assert p["pred"]["b"].shape == ((1, 1, 32, 32) if biases
                                    else (1, 1, 1, 1))
    dm = jax.random.uniform(key, (2, 5, 48, 48))
    out = apply_distmap_shadow_unet(p, dm, uv_size=64)
    assert out["shadow_map"].shape == (2, 1, 64, 64)
    assert out["shadow_map_lowres"].shape == (2, 1, 32, 32)
    assert _finite_pytree(out)
