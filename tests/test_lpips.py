"""LPIPS port validation without pretrained artifacts.

This environment has no network egress and no torchvision, so the
pretrained VGG16/linear weights cannot exist here.  Instead we validate
the PORT: the torch pipeline below transliterates the reference
lpipsPyTorch modules exactly (/root/reference/lpipsPyTorch/modules/
{lpips,networks,utils}.py — torchvision vgg16.features layer ordering,
1-based target_layers [4,9,16,23,30], z_score constants,
normalize_activation with additive eps, bias-free 1x1 linear heads,
mean((2,3)) + stage sum), and both sides are loaded with IDENTICAL
random weights.  Numerical agreement then validates utils.lpips_jax's
architecture and arithmetic independent of the weight values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mpmavatar_tpu.utils import lpips_jax

# torchvision vgg16.features: conv layer 0-based indices (the reference
# instantiates models.vgg16().features; this is its exact structure)
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_IDX = [4, 9, 16, 23, 30]
_CHANNELS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
_TARGET_LAYERS = [4, 9, 16, 23, 30]          # 1-based (networks.py:95)
_N_CH_LIST = [64, 128, 256, 512, 512]


def _make_random_weights(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    for ci, (cin, cout) in enumerate(_CHANNELS):
        params[f"conv{ci}_w"] = rng.normal(
            0, 0.3 / np.sqrt(cin * 9), (cout, cin, 3, 3)).astype(np.float32)
        params[f"conv{ci}_b"] = rng.normal(
            0, 0.05, (cout,)).astype(np.float32)
    for i, c in enumerate(_N_CH_LIST):
        params[f"lin{i}_w"] = np.abs(rng.normal(
            0, 0.1, (1, c, 1, 1))).astype(np.float32)
    return params


def _torch_vgg_features():
    """nn.Sequential with torchvision vgg16.features' exact layout."""
    import torch.nn as nn
    layers = []
    ci = 0
    for i in range(31):
        if i in _CONV_IDX:
            cin, cout = _CHANNELS[ci]
            layers.append(nn.Conv2d(cin, cout, 3, 1, 1))
            ci += 1
        elif i in _POOL_IDX:
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.ReLU(inplace=False))
    return nn.Sequential(*layers)


def _torch_lpips(params, x_np, y_np):
    """Reference LPIPS arithmetic (lpips.py:30-36, networks.py:52-62,
    utils.py:6-8) with the given weights."""
    import torch.nn.functional as F
    net = _torch_vgg_features()
    with torch.no_grad():
        ci = 0
        for i in _CONV_IDX:
            net[i].weight.copy_(torch.from_numpy(params[f"conv{ci}_w"]))
            net[i].bias.copy_(torch.from_numpy(params[f"conv{ci}_b"]))
            ci += 1
    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]

    def feats(img):
        x = (torch.from_numpy(img) - mean) / std
        out = []
        for i, layer in enumerate(net, 1):
            x = layer(x)
            if i in _TARGET_LAYERS:
                nf = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                out.append(x / (nf + 1e-10))
            if len(out) == len(_TARGET_LAYERS):
                break
        return out

    with torch.no_grad():
        fx, fy = feats(x_np), feats(y_np)
        res = []
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            w = torch.from_numpy(params[f"lin{i}_w"])
            res.append(F.conv2d(d, w).mean((2, 3), True))
        return float(torch.sum(torch.cat(res, 0), 0, True).mean())


def test_lpips_parity_with_reference_torch():
    # 16x16 images: XLA-CPU compile of the full VGG16 stack dominates
    # the runtime; the arithmetic parity is size-independent
    params = _make_random_weights()
    rng = np.random.default_rng(1)
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)

    ref = _torch_lpips(params, x, y)
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    fwd = jax.jit(lpips_jax.lpips)
    ours = float(fwd(jparams, jnp.asarray(x), jnp.asarray(y)))
    assert ref > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-4)

    # identity -> 0 (reuses the jitted forward, no recompile)
    same = float(fwd(jparams, jnp.asarray(x), jnp.asarray(x)))
    assert abs(same) < 1e-8


def test_export_weights_npz_roundtrip(tmp_path):
    """export_weights_npz consumes torch-style state dicts (torchvision
    features naming '<idx>.weight' + richzhang lin naming) and produces
    the layout make_lpips_fn loads."""
    params = _make_random_weights(seed=2)
    vgg_state = {}
    for ci, i in enumerate(_CONV_IDX):
        vgg_state[f"{i}.weight"] = torch.from_numpy(params[f"conv{ci}_w"])
        vgg_state[f"{i}.bias"] = torch.from_numpy(params[f"conv{ci}_b"])
    lin_state = {f"{i}.1.weight": torch.from_numpy(params[f"lin{i}_w"])
                 for i in range(5)}
    out = str(tmp_path / "lpips.npz")
    lpips_jax.export_weights_npz(out, vgg_state, lin_state)

    # array-level roundtrip (a forward pass here would recompile the
    # whole VGG stack; parity of the forward is covered above)
    loaded = lpips_jax.load_weights_npz(out)
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      params[k].reshape(loaded[k].shape))


def test_load_weights_npz_schema_validation(tmp_path):
    """A weights file with missing/extra keys or wrong shapes fails
    loudly at load time, not deep inside jit (VERDICT r3 item 7)."""
    params = _make_random_weights(seed=3)
    good = str(tmp_path / "good.npz")
    np.savez(good, **params)
    loaded = lpips_jax.load_weights_npz(good)   # full golden schema: ok
    assert set(loaded) == set(lpips_jax.expected_weight_schema())

    bad1 = dict(params)
    del bad1["lin4_w"]
    np.savez(str(tmp_path / "miss.npz"), **bad1)
    with pytest.raises(ValueError, match="missing=\\['lin4_w'\\]"):
        lpips_jax.load_weights_npz(str(tmp_path / "miss.npz"))

    bad2 = dict(params)
    bad2["conv0_w"] = np.zeros((64, 3, 5, 5), np.float32)
    np.savez(str(tmp_path / "shape.npz"), **bad2)
    with pytest.raises(ValueError, match="conv0_w"):
        lpips_jax.load_weights_npz(str(tmp_path / "shape.npz"))


@pytest.mark.slow
def test_make_lpips_fn_full_size_at_eval_resolution(tmp_path):
    """Synthetic FULL-SIZE weights npz -> make_lpips_fn -> evaluated at
    the masked-render eval resolution (the ActorsHQ 4x eval images are
    ~1500x1000; eval.py:58-98).  Proves the ingestion path end-to-end:
    only the weight VALUES differ from the real artifact."""
    params = _make_random_weights(seed=4)
    path = str(tmp_path / "lpips_full.npz")
    np.savez(path, **params)
    fn = lpips_jax.make_lpips_fn(path)
    assert fn is not None
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 3, 1000, 1500), np.float32))
    b = jnp.asarray(rng.random((1, 3, 1000, 1500), np.float32))
    d_ab = float(fn(a, b))
    d_aa = float(fn(a, a))
    assert np.isfinite(d_ab) and d_ab > 0.0
    assert abs(d_aa) < 1e-5


def test_make_lpips_fn_warns_without_weights():
    """The no-weights case must be loud (VERDICT r2 weak #4): a user
    following the reference recipe without weights gets a different
    objective."""
    with pytest.warns(UserWarning, match="DISABLED"):
        assert lpips_jax.make_lpips_fn(None) is None
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert lpips_jax.make_lpips_fn(None, quiet=True) is None
