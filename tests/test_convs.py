"""Parity of channels-last convs against torch.nn.functional (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from emojivoice_tpu.ops.convs import conv1d, conv_transpose1d, fold_weight_norm


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil",
    [
        (8, 16, 3, 1, 1, 1),
        (16, 16, 5, 1, 2, 1),
        (8, 8, 3, 2, 1, 1),  # Downsample1D
        (8, 8, 3, 1, 3, 3),  # dilated (HiFi-GAN MRF)
        (4, 12, 1, 1, 0, 1),  # 1x1 projection
        (8, 8, 7, 1, 3, 1),
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, dil):
    x = rng.normal(size=(2, cin, 37)).astype(np.float32)
    w = rng.normal(size=(cout, cin, k)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=pad, dilation=dil).numpy()

    # ours: channels-last input, (k, in, out) weights
    got = conv1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 1, 0)),
        jnp.asarray(b),
        stride=stride, padding=pad, dilation=dil,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [
        (8, 4, 16, 8, 4),  # HiFi-GAN up stage
        (8, 8, 4, 2, 1),   # U-Net Upsample1D
        (6, 6, 4, 4, 0),
    ],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, k, stride, pad):
    x = rng.normal(size=(2, cin, 19)).astype(np.float32)
    w = rng.normal(size=(cin, cout, k)).astype(np.float32)  # torch layout (in, out, k)
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                             stride=stride, padding=pad).numpy()

    got = conv_transpose1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 0, 1)),  # (k, in, out)
        jnp.asarray(b),
        stride=stride, padding=pad,
    )
    assert got.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=2e-4, rtol=1e-4)


def test_fold_weight_norm_matches_torch(rng):
    cout, cin, k = 6, 4, 3
    conv = torch.nn.Conv1d(cin, cout, k)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_g.copy_(torch.from_numpy(rng.normal(size=(cout, 1, 1)).astype(np.float32)))
        conv.weight_v.copy_(torch.from_numpy(rng.normal(size=(cout, cin, k)).astype(np.float32)))
    g = conv.weight_g.detach().numpy()
    v = conv.weight_v.detach().numpy()
    torch.nn.utils.remove_weight_norm(conv)
    ref = conv.weight.detach().numpy()

    # our layout: (k, in, out); g broadcast shape (1, 1, out)
    got = fold_weight_norm(jnp.asarray(g.transpose(2, 1, 0)), jnp.asarray(v.transpose(2, 1, 0)))
    np.testing.assert_allclose(np.asarray(got).transpose(2, 1, 0), ref, atol=1e-5, rtol=1e-5)
