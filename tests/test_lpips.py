"""Golden parity of the real LPIPS metric vs a torch mirror.

The reference's metric is pyiqa's learned LPIPS v0.1
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:17,44).
With zero egress we pin architecture + converter against a
randomly-initialized torch mirror of Zhang et al.'s network (scaling layer →
AlexNet/VGG16 tower → unit-normalize → squared diff → non-negative 1x1 lins
→ spatial mean → stage sum); if the Flax model reproduces the torch mirror
through ``convert_lpips``, the official checkpoints convert identically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from srsem.eval.lpips import (  # noqa: E402
    ALEX_CHANNELS,
    VGG16_CHANNELS,
    LPIPS,
    convert_lpips,
    make_lpips,
)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_alexnet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
    )


def _torch_vgg16_features():
    layers, cin = [], 3
    for ch, n in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
        if layers:
            layers.append(tnn.MaxPool2d(2, 2))
        for _ in range(n):
            layers += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.ReLU(inplace=True)]
            cin = ch
    layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


_TAP_IDX = {  # post-ReLU indices inside the Sequential, in tap order
    "alex": (1, 4, 7, 9, 11),
    "vgg": (3, 8, 15, 22, 29),
}


@torch.no_grad()
def _torch_lpips(features, lins, x0, x1, net):
    """Reference forward: richzhang/PerceptualSimilarity lpips.LPIPS."""
    outs = []
    for x in (x0, x1):
        h = (2.0 * x - 1.0 - _SHIFT) / _SCALE
        taps, cur = [], h
        for i, layer in enumerate(features):
            cur = layer(cur)
            if i in _TAP_IDX[net]:
                taps.append(cur)
        outs.append(taps)
    total = 0.0
    for f0, f1, lin in zip(outs[0], outs[1], lins):
        n0 = f0 / torch.sqrt((f0 * f0).sum(1, keepdim=True) + 1e-10)
        n1 = f1 / torch.sqrt((f1 * f1).sum(1, keepdim=True) + 1e-10)
        d = lin((n0 - n1) ** 2)
        total = total + d.mean(dim=(2, 3))
    return total[:, 0]


@pytest.mark.parametrize("net,chans", [("alex", ALEX_CHANNELS),
                                       ("vgg", VGG16_CHANNELS)])
def test_lpips_parity(net, chans):
    torch.manual_seed(0)
    features = (_torch_alexnet_features() if net == "alex"
                else _torch_vgg16_features()).eval()
    lins = [tnn.Conv2d(ch, 1, 1, bias=False) for ch in chans]
    for lin in lins:
        with torch.no_grad():
            lin.weight.abs_()  # lpips lins are non-negative

    lin_sd = {f"lin{k}.model.1.weight": lin.weight
              for k, lin in enumerate(lins)}
    tower_sd = {f"features.{i}.{p}": getattr(m, p)
                for i, m in enumerate(features)
                if isinstance(m, tnn.Conv2d) for p in ("weight", "bias")}
    params = convert_lpips(lin_sd, tower_sd, net=net)

    size = 64
    x0 = torch.rand(2, 3, size, size)
    x1 = torch.rand(2, 3, size, size)
    want = _torch_lpips(features, lins, x0, x1, net).numpy()

    fn = make_lpips(net=net, params=params, image_size=size)
    got = np.asarray(fn(
        jnp.asarray(x0.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(x1.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_lpips_identical_pair_is_zero():
    fn = make_lpips(image_size=64)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    d = np.asarray(fn(x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_lpips_spatial_map_shape():
    import jax

    model = LPIPS(net="alex", spatial=True)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3), np.float32))
    y = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3), np.float32))
    m = np.asarray(model.apply(variables, x, y))
    assert m.shape == (2, 64, 64)
    assert np.all(np.isfinite(m))
