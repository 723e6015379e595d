"""VPoser official-checkpoint ingestion round trip.

The real ``TR00_E096.pt`` cannot exist in this environment (no egress),
so this builds a checkpoint with the EXACT structure the official file
has — the full VAE state_dict of human_body_prior's
``VPoser(512, 32, [3, 21])`` (encoder batch-norm buffers included) as
loaded by the reference at /root/reference/utils/smplx_deformer.py:32-35
— saves it with torch.save, ingests it through
``load_vposer_torch``, and checks decode parity against an in-test
torch transliteration of the official ``VPoser.decode`` +
``ContinousRotReprDecoder`` semantics (leaky_relu 0.2, eval-mode
dropout, ``view(-1, 3, 2)`` interleaved 6D bases, column-stacked
frames).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mpmavatar_tpu.avatar.vposer import (load_vposer_torch,  # noqa: E402
                                         matrix_to_axis_angle,
                                         vposer_decode)


def _official_state_dict(rng):
    """Key/shape layout of the real TR00_E096.pt (VPoser v1 VAE)."""
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    sd = {}
    for name, feat in [("bodyprior_enc_bn1", 63), ("bodyprior_enc_bn2", 512)]:
        sd[f"{name}.weight"] = t(feat)
        sd[f"{name}.bias"] = t(feat)
        sd[f"{name}.running_mean"] = t(feat)
        sd[f"{name}.running_var"] = torch.ones(feat)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    for name, o, i in [("bodyprior_enc_fc1", 512, 63),
                       ("bodyprior_enc_fc2", 512, 512),
                       ("bodyprior_enc_mu", 32, 512),
                       ("bodyprior_enc_logvar", 32, 512),
                       ("bodyprior_dec_fc1", 512, 32),
                       ("bodyprior_dec_fc2", 512, 512),
                       ("bodyprior_dec_out", 126, 512)]:
        sd[f"{name}.weight"] = t(o, i) * 0.05
        sd[f"{name}.bias"] = t(o) * 0.05
    return sd


def _official_decode(sd, z):
    """Transliteration of VPoser.decode (human_body_prior v1,
    train/vposer_smpl.py) in eval mode: fc1 -> lrelu(.2) -> [dropout
    inactive] -> fc2 -> lrelu(.2) -> out -> ContinousRotReprDecoder."""
    lin = lambda n, x: torch.nn.functional.linear(
        x, sd[f"{n}.weight"], sd[f"{n}.bias"])
    x = torch.nn.functional.leaky_relu(lin("bodyprior_dec_fc1", z), 0.2)
    x = torch.nn.functional.leaky_relu(lin("bodyprior_dec_fc2", x), 0.2)
    x = lin("bodyprior_dec_out", x)
    # ContinousRotReprDecoder.forward
    r = x.reshape(-1, 3, 2)
    b1 = torch.nn.functional.normalize(r[:, :, 0], dim=1)
    dot = torch.sum(b1 * r[:, :, 1], dim=1, keepdim=True)
    b2 = torch.nn.functional.normalize(r[:, :, 1] - dot * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack([b1, b2, b3], dim=-1).reshape(z.shape[0], 21, 3, 3)


def test_official_checkpoint_round_trip(tmp_path):
    rng = np.random.default_rng(7)
    sd = _official_state_dict(rng)
    path = tmp_path / "TR00_E096.pt"
    torch.save(sd, path)

    params = load_vposer_torch(str(path))
    z = rng.standard_normal((4, 32)).astype(np.float32)
    ours = np.asarray(vposer_decode(params, z))
    official = _official_decode(sd, torch.tensor(z)).numpy()
    np.testing.assert_allclose(ours, official, atol=1e-5)

    # decoded frames are rotations, and the reference's downstream
    # matrix -> axis-angle conversion stays finite on them
    eye = np.einsum("bjki,bjkl->bjil", ours, ours)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    assert np.all(np.linalg.det(ours) > 0.99)
    aa = np.asarray(matrix_to_axis_angle(ours))
    assert np.isfinite(aa).all()


def test_loader_rejects_bad_checkpoints(tmp_path):
    rng = np.random.default_rng(3)
    sd = _official_state_dict(rng)

    incomplete = {k: v for k, v in sd.items()
                  if k != "bodyprior_dec_fc2.weight"}
    p1 = tmp_path / "missing.pt"
    torch.save(incomplete, p1)
    with pytest.raises(ValueError, match="lacks decoder keys"):
        load_vposer_torch(str(p1))

    wrong = dict(sd)
    wrong["bodyprior_dec_out.weight"] = torch.zeros(63, 512)
    p2 = tmp_path / "badshape.pt"
    torch.save(wrong, p2)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_vposer_torch(str(p2))


def test_loader_accepts_wrapped_state_dict(tmp_path):
    rng = np.random.default_rng(11)
    sd = _official_state_dict(rng)
    wrapped = {"state_dict": {f"vp_model.{k}": v for k, v in sd.items()}}
    p = tmp_path / "wrapped.pt"
    torch.save(wrapped, p)
    params = load_vposer_torch(str(p))
    z = np.zeros((1, 32), np.float32)
    ours = np.asarray(vposer_decode(params, z))
    official = _official_decode(sd, torch.tensor(z)).numpy()
    np.testing.assert_allclose(ours, official, atol=1e-5)
