"""TranSalNet saliency model + loss tests
(reference: additional_approaches/src/transalnet/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.explain.saliency import (
    DenseNet161Features,
    TranSalNetDense,
    loss_cc,
    loss_kldiv,
    loss_nss,
    loss_similarity,
    saliency_loss,
)


def test_densenet_tap_channels(rng):
    """Tap channels must match the reference's TransEncoder in_channels:
    768 / 2112 / 2208 (TranSalNet_Dense.py:93-95)."""
    model = DenseNet161Features()
    x = jnp.zeros((1, 96, 128, 3))
    (x3, x4, x5), _ = model.init_with_output(rng, x, train=False)
    assert x3.shape[-1] == 768 and x3.shape[1:3] == (12, 16)
    assert x4.shape[-1] == 2112 and x4.shape[1:3] == (6, 8)
    assert x5.shape[-1] == 2208 and x5.shape[1:3] == (3, 4)


@pytest.mark.slow
def test_transalnet_output_map(rng):
    model = TranSalNetDense()
    x = jnp.zeros((1, 96, 128, 3))
    out, _ = model.init_with_output(rng, x, train=False)
    assert out.shape == (1, 96, 128)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_saliency_losses(np_rng):
    a = np_rng.uniform(0.1, 1.0, (2, 16, 16)).astype(np.float32)
    # Perfect correlation with itself.
    assert float(np.mean(np.asarray(loss_cc(a, a)))) == pytest.approx(1.0, abs=1e-5)
    # KL of identical distributions ~ 0.
    assert float(np.mean(np.asarray(loss_kldiv(a, a)))) == pytest.approx(0.0, abs=1e-4)
    # SIM of identical maps ~ 1.
    assert float(np.mean(np.asarray(loss_similarity(a, a)))) == pytest.approx(1.0, abs=1e-3)
    # NSS: prediction z-scored at fixations; uniform fixations → ~0.
    fix = (np_rng.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)
    val = float(np.asarray(saliency_loss(a, fix, "nss")))
    assert np.isfinite(val)
    # dispatcher
    assert float(np.asarray(saliency_loss(a, a, "cc"))) == pytest.approx(1.0, abs=1e-5)


# ---------------- converter parity vs a torch mirror ---------------------

class _TorchMirror:
    """Namespace for the torch TranSalNet mirror (built lazily so the
    module imports without torch)."""

    @staticmethod
    def build():
        import torch
        import torch.nn as tnn

        class DenseLayer(tnn.Module):
            # reference utils/densenet.py:22-49 (norm1/conv1/norm2/conv2,
            # bn_size=4, growth 48)
            def __init__(self, in_ch, growth=48, bn_size=4):
                super().__init__()
                self.norm1 = tnn.BatchNorm2d(in_ch)
                self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1,
                                        bias=False)
                self.norm2 = tnn.BatchNorm2d(bn_size * growth)
                self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3,
                                        padding=1, bias=False)

            def forward(self, x):
                h = self.conv1(tnn.functional.relu(self.norm1(x)))
                h = self.conv2(tnn.functional.relu(self.norm2(h)))
                return torch.cat([x, h], dim=1)

        class DenseBlock(tnn.Module):
            # reference utils/densenet.py:93-113
            def __init__(self, n_layers, in_ch, growth=48):
                super().__init__()
                for i in range(n_layers):
                    self.add_module(f"denselayer{i + 1}",
                                    DenseLayer(in_ch + i * growth, growth))

            def forward(self, x):
                for m in self.children():
                    x = m(x)
                return x

        class Transition(tnn.Sequential):
            # reference utils/densenet.py:116-123
            def __init__(self, in_ch, out_ch):
                super().__init__()
                self.add_module("norm", tnn.BatchNorm2d(in_ch))
                self.add_module("relu", tnn.ReLU(inplace=True))
                self.add_module("conv", tnn.Conv2d(in_ch, out_ch, 1,
                                                   bias=False))
                self.add_module("pool", tnn.AvgPool2d(2, 2))

        class Encoder(tnn.Module):
            # reference TranSalNet_Dense.py:57-70 — densenet161 features
            # children [:-1] as a ModuleList, taps after indices 6/8/10
            def __init__(self):
                super().__init__()
                g = 48
                self.encoder = tnn.ModuleList([
                    tnn.Conv2d(3, 96, 7, 2, 3, bias=False),      # 0 conv0
                    tnn.BatchNorm2d(96),                          # 1 norm0
                    tnn.ReLU(inplace=True),                       # 2 relu0
                    tnn.MaxPool2d(3, 2, 1),                       # 3 pool0
                    DenseBlock(6, 96, g),                         # 4 → 384
                    Transition(384, 192),                         # 5
                    DenseBlock(12, 192, g),                       # 6 → 768
                    Transition(768, 384),                         # 7
                    DenseBlock(36, 384, g),                       # 8 → 2112
                    Transition(2112, 1056),                       # 9
                    DenseBlock(24, 1056, g),                      # 10 → 2208
                ])

            def forward(self, x):
                taps = []
                for i, layer in enumerate(self.encoder):
                    x = layer(x)
                    if i in {6, 8, 10}:
                        taps.append(x)
                return taps

        class Attention(tnn.Module):
            # reference utils/TransformerEncoder.py:25-70
            def __init__(self, hidden, heads):
                super().__init__()
                self.heads, self.hd = heads, hidden // heads
                self.query = tnn.Linear(hidden, hidden)
                self.key = tnn.Linear(hidden, hidden)
                self.value = tnn.Linear(hidden, hidden)
                self.out = tnn.Linear(hidden, hidden)

            def _split(self, x):
                b, t, _ = x.shape
                return x.view(b, t, self.heads, self.hd).permute(0, 2, 1, 3)

            def forward(self, x):
                q, k, v = (self._split(m(x))
                           for m in (self.query, self.key, self.value))
                a = torch.softmax(q @ k.transpose(-1, -2) / self.hd ** 0.5,
                                  dim=-1)
                h = (a @ v).permute(0, 2, 1, 3).reshape(x.shape)
                return self.out(h)

        class Mlp(tnn.Module):
            # reference utils/TransformerEncoder.py:74-96 (exact gelu)
            def __init__(self, hidden):
                super().__init__()
                self.fc1 = tnn.Linear(hidden, 4 * hidden)
                self.fc2 = tnn.Linear(4 * hidden, hidden)

            def forward(self, x):
                return self.fc2(tnn.functional.gelu(self.fc1(x)))

        class Block(tnn.Module):
            # reference utils/TransformerEncoder.py:99-118 (pre-norm)
            def __init__(self, hidden, heads):
                super().__init__()
                self.attention_norm = tnn.LayerNorm(hidden, eps=1e-6)
                self.attn = Attention(hidden, heads)
                self.ffn_norm = tnn.LayerNorm(hidden, eps=1e-6)
                self.ffn = Mlp(hidden)

            def forward(self, x):
                x = x + self.attn(self.attention_norm(x))
                return x + self.ffn(self.ffn_norm(x))

        class TransformerEncoder(tnn.Module):
            # reference utils/TransformerEncoder.py:120-135
            def __init__(self, hidden, heads, layers=2):
                super().__init__()
                self.layer = tnn.ModuleList(
                    [Block(hidden, heads) for _ in range(layers)])
                self.encoder_norm = tnn.LayerNorm(hidden, eps=1e-6)

            def forward(self, x):
                for blk in self.layer:
                    x = blk(x)
                return self.encoder_norm(x)

        class TransEncoder(tnn.Module):
            # reference TranSalNet_Dense.py:146-169
            def __init__(self, in_ch, spatial, hidden, heads):
                super().__init__()
                self.patch_embeddings = tnn.Conv2d(in_ch, hidden, 1)
                self.position_embeddings = tnn.Parameter(
                    torch.zeros(1, spatial, hidden))
                self.transformer_encoder = TransformerEncoder(hidden, heads)

            def forward(self, x):
                b, _, a, w = x.shape
                t = self.patch_embeddings(x).flatten(2).transpose(-1, -2)
                t = self.transformer_encoder(t + self.position_embeddings)
                return t.permute(0, 2, 1).reshape(b, -1, a, w)

        class Decoder(tnn.Module):
            # reference TranSalNet_Dense.py:73-143
            def __init__(self, hw5):
                super().__init__()
                chans = (768, 768, 512, 256, 128, 64, 32, 1)
                for k in range(1, 8):
                    self.add_module(
                        f"conv{k}",
                        tnn.Conv2d(chans[k - 1], chans[k], 3, padding=1))
                for k, c in enumerate((768, 512, 256, 128, 64, 32), 1):
                    self.add_module(f"batchnorm{k}", tnn.BatchNorm2d(c))
                h5, w5 = hw5
                self.TransEncoder1 = TransEncoder(2208, h5 * w5, 768, 12)
                self.TransEncoder2 = TransEncoder(2112, 4 * h5 * w5, 768, 12)
                self.TransEncoder3 = TransEncoder(768, 16 * h5 * w5, 512, 8)
                self.up = tnn.Upsample(scale_factor=2, mode="nearest")
                self.relu = tnn.ReLU(True)

            def forward(self, taps):
                x3, x4, x5 = taps
                h = self.up(self.relu(self.batchnorm1(
                    self.conv1(self.TransEncoder1(x5)))))
                h = self.relu(h * self.TransEncoder2(x4))
                h = self.up(self.relu(self.batchnorm2(self.conv2(h))))
                h = self.relu(h * self.TransEncoder3(x3))
                h = self.up(self.relu(self.batchnorm3(self.conv3(h))))
                h = self.up(self.relu(self.batchnorm4(self.conv4(h))))
                h = self.up(self.relu(self.batchnorm5(self.conv5(h))))
                h = self.relu(self.batchnorm6(self.conv6(h)))
                return torch.sigmoid(self.conv7(h))

        class TorchTranSalNet(tnn.Module):
            # reference TranSalNet_Dense.py:44-54
            def __init__(self, hw5=(3, 4)):
                super().__init__()
                self.encoder = Encoder()
                self.decoder = Decoder(hw5)

            def forward(self, x):
                return self.decoder(self.encoder(x))

        return TorchTranSalNet


@pytest.mark.slow
def test_transalnet_converter_parity(np_rng):
    """convert_transalnet: randomized torch TranSalNet mirror → flax trees;
    eval-mode saliency maps match to fp32 tolerance end to end (DenseNet
    encoder, 3 transformer encoders with fused qkv, multiplicative
    decoder).  This is the zero-egress contingency for the SaliencyMaps
    overlap metrics (reference compute_metrics.py:130-134)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from srsem.utils.convert import convert_transalnet

    torch.manual_seed(7)
    tmodel = _TorchMirror.build()((3, 4)).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.7, 1.3)
                m.bias.normal_(0, 0.2)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.7, 1.4)
            elif isinstance(m, tnn.LayerNorm):
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.05)
        for k in (1, 2, 3):
            getattr(tmodel.decoder,
                    f"TransEncoder{k}").position_embeddings.normal_(0, 0.02)

    x = np_rng.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()[:, 0]

    tree = convert_transalnet(tmodel.state_dict())
    model = TranSalNetDense()
    got = np.asarray(model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_generate_saliency_maps_keeps_dotted_stems(tmp_path):
    """'a.v1.jpg' → 'a.v1.npy' (rsplit), matching what
    srsem.eval.approaches.saliency_path_for looks up; split('.')[0] used
    to collide dotted names onto one file via skip-existing (review r4)."""
    import jax.numpy as jnp
    from PIL import Image

    from srsem.explain.saliency import generate_saliency_maps

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for name in ("a.v1.jpg", "a.v2.jpg"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(imgs / name)
    out = tmp_path / "SaliencyMaps"

    def fake_apply(variables, x):
        return jnp.zeros(x.shape[:3])

    n = generate_saliency_maps(fake_apply, {}, str(imgs), str(out),
                               image_size=(8, 8))
    assert n == 2
    assert sorted(p.name for p in out.iterdir()
                  if p.suffix == ".npy") == ["a.v1.npy", "a.v2.npy"]

    from srsem.eval.approaches import saliency_path_for

    # the consumer's lookup convention lands on the written filename
    assert saliency_path_for(str(imgs / "a.v1.jpg")).endswith("a.v1.npy")


# ---------------- data_process geometry (pad / crop-back) ----------------

def _ref_preprocess(img, shape_r=288, shape_c=384):
    """The reference's preprocess_img verbatim, on an in-memory array
    (reference: additional_approaches/src/transalnet/utils/
    data_process.py:9-41; cv2.imread swapped for the array arg)."""
    import cv2

    channels = 1 if img.ndim == 2 else img.shape[2]
    if channels == 1:
        img_padded = np.zeros((shape_r, shape_c), dtype=np.uint8)
    else:
        img_padded = np.ones((shape_r, shape_c, channels), dtype=np.uint8)
    original_shape = img.shape
    rows_rate = original_shape[0] / shape_r
    cols_rate = original_shape[1] / shape_c
    if rows_rate > cols_rate:
        new_cols = (original_shape[1] * shape_r) // original_shape[0]
        img = cv2.resize(img, (new_cols, shape_r))
        if new_cols > shape_c:
            new_cols = shape_c
        left = (img_padded.shape[1] - new_cols) // 2
        img_padded[:, left:left + new_cols] = img
    else:
        new_rows = (original_shape[0] * shape_c) // original_shape[1]
        img = cv2.resize(img, (shape_c, new_rows))
        if new_rows > shape_r:
            new_rows = shape_r
        top = (img_padded.shape[0] - new_rows) // 2
        img_padded[top:top + new_rows, :] = img
    return img_padded


def _ref_postprocess(pred, org_shape):
    """postprocess_img verbatim on arrays (reference data_process.py:43-80)."""
    import cv2

    pred = np.array(pred)
    shape_r, shape_c = org_shape
    predictions_shape = pred.shape
    rows_rate = shape_r / predictions_shape[0]
    cols_rate = shape_c / predictions_shape[1]
    if rows_rate > cols_rate:
        new_cols = (predictions_shape[1] * shape_r) // predictions_shape[0]
        pred = cv2.resize(pred, (new_cols, shape_r))
        return pred[:, ((pred.shape[1] - shape_c) // 2):
                       ((pred.shape[1] - shape_c) // 2 + shape_c)]
    new_rows = (predictions_shape[0] * shape_c) // predictions_shape[1]
    pred = cv2.resize(pred, (shape_c, new_rows))
    return pred[((pred.shape[0] - shape_r) // 2):
                ((pred.shape[0] - shape_r) // 2 + shape_r), :]


@pytest.mark.parametrize("hw", [(500, 200), (200, 500), (768, 1024),
                                (100, 1000), (289, 384)])
def test_preprocess_pad_matches_reference(hw, np_rng):
    """Aspect-preserving pad parity on non-4:3 inputs: identical pad
    bands/placement, resized content within cv2's fixed-point LSB."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841 (reference mirror only)
    from srsem.explain.saliency import preprocess_pad

    # content ≥8 so the pad value 1 is unambiguous (bilinear of ≥8 stays ≥8)
    img = np_rng.integers(8, 256, hw + (3,), dtype=np.uint8)
    want = _ref_preprocess(img)
    got = preprocess_pad(img)
    assert got.shape == want.shape == (288, 384, 3)
    # geometry: pad bands (value 1) in exactly the same places
    np.testing.assert_array_equal(got == 1, want == 1)
    # content: cv2 resizes in 11-bit fixed point, srsem in f32+rint —
    # ±2 LSB, and almost everywhere ±1.
    diff = got.astype(np.int16) - want.astype(np.int16)
    assert np.abs(diff).max() <= 2
    assert (np.abs(diff) <= 1).mean() > 0.99


def test_preprocess_pad_single_channel(np_rng):
    """1-channel maps pad with ZEROS (reference data_process.py:19-20)."""
    pytest.importorskip("cv2")
    from srsem.explain.saliency import preprocess_pad

    img = np_rng.integers(8, 256, (120, 500), dtype=np.uint8)
    want = _ref_preprocess(img)
    got = preprocess_pad(img)
    assert got.shape == want.shape == (288, 384)
    np.testing.assert_array_equal(got == 0, want == 0)
    assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 2


def test_preprocess_pad_trailing_singleton_channel(np_rng):
    """(H, W, 1) is grayscale: the reference's channels=1 arrays are 2-D
    (cv2.imread(path, 0) → zero pad bands), so a trailing singleton
    channel must NOT ride the 3-channel value-1 pad path."""
    from srsem.explain.saliency import preprocess_pad

    img2d = np_rng.integers(8, 256, (120, 500), dtype=np.uint8)
    got = preprocess_pad(img2d[..., None])
    want = preprocess_pad(img2d)
    assert got.shape == (288, 384)  # squeezed to the reference's 2-D form
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 0  # zero pad bands, not value-1


@pytest.mark.parametrize("hw", [(500, 200), (200, 500), (768, 1024)])
def test_postprocess_crop_matches_reference(hw, np_rng):
    """Crop-back parity: the predicted 288×384 map lands on the SOURCE
    resolution with the reference's exact crop arithmetic; float path, so
    values agree to f32 tolerance."""
    pytest.importorskip("cv2")
    from srsem.explain.saliency import postprocess_crop

    # smooth map: bilinear resamplers agree away from aliasing
    yy, xx = np.mgrid[0:288, 0:384].astype(np.float32)
    pred = (np.sin(yy / 31.0) * np.cos(xx / 47.0) * 0.5 + 0.5)
    want = _ref_postprocess(pred, hw)
    got = postprocess_crop(pred, hw)
    assert got.shape == want.shape == hw
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pad_crop_roundtrip_identity_region(np_rng):
    """cv2-free structural check: a map constant over the padded frame
    crops back to that constant at the source resolution, and the
    roundtrip output shape always equals the source shape."""
    from srsem.explain.saliency import postprocess_crop, preprocess_pad

    for hw in ((123, 456), (456, 123), (288, 384)):
        img = np_rng.integers(0, 256, hw + (3,), dtype=np.uint8)
        padded = preprocess_pad(img)
        assert padded.shape == (288, 384, 3)
        out = postprocess_crop(np.full((288, 384), 0.25, np.float32), hw)
        assert out.shape == hw
        np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_generate_saliency_maps_pad_geometry(tmp_path, np_rng):
    """The folder job's default geometry: the network sees the
    aspect-preserved pad (bands at exactly 1/255) and the saved .npy is at
    the SOURCE resolution, not 288×384 (round-4 verdict missing #1)."""
    import jax.numpy as jnp
    from PIL import Image

    from srsem.explain.saliency import generate_saliency_maps

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    src = np_rng.integers(64, 256, (200, 500, 3), dtype=np.uint8)
    Image.fromarray(src).save(imgs / "wide.png")
    out = tmp_path / "SaliencyMaps"

    seen = {}

    def fake_apply(variables, x):
        seen["input"] = np.asarray(x)
        return jnp.asarray(x)[..., 0] * 0.0 + 0.5

    n = generate_saliency_maps(fake_apply, {}, str(imgs), str(out))
    assert n == 1
    net_in = seen["input"][0]
    assert net_in.shape == (288, 384, 3)
    # 200×500 source → content rows = 500*? no: width binds (200/288 <
    # 500/384) → new_rows = 200*384//500 = 153, top band = (288-153)//2
    top = (288 - 153) // 2
    np.testing.assert_allclose(net_in[:top], 1.0 / 255.0, atol=1e-7)
    np.testing.assert_allclose(net_in[top + 153:], 1.0 / 255.0, atol=1e-7)
    assert net_in[top:top + 153].std() > 0.05  # real content rows

    sal = np.load(out / "wide.npy")
    assert sal.shape == (200, 500)
    np.testing.assert_allclose(sal, 0.5, atol=1e-6)


def test_generate_saliency_maps_resize_geometry(tmp_path, np_rng):
    """geometry='resize' keeps the pre-round-5 behavior: a distorting
    bicubic resize into image_size, map saved at image_size (not the
    source resolution)."""
    import jax.numpy as jnp
    from PIL import Image

    from srsem.explain.saliency import generate_saliency_maps

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    src = np_rng.integers(0, 256, (200, 500, 3), dtype=np.uint8)
    Image.fromarray(src).save(imgs / "wide.png")
    out = tmp_path / "SaliencyMaps"

    seen = {}

    def fake_apply(variables, x):
        seen["input"] = np.asarray(x)
        return jnp.zeros(x.shape[:3]) + 0.5

    n = generate_saliency_maps(fake_apply, {}, str(imgs), str(out),
                               geometry="resize")
    assert n == 1
    assert seen["input"].shape == (1, 288, 384, 3)
    # no pad bands — the whole frame is (distorted) content
    assert seen["input"][0, :4].std() > 0.05
    assert np.load(out / "wide.npy").shape == (288, 384)

    with pytest.raises(ValueError, match="geometry"):
        generate_saliency_maps(fake_apply, {}, str(imgs),
                               str(tmp_path / "x"), geometry="stretch")


def test_generate_saliency_maps_channel_order(tmp_path, np_rng):
    """channel_order='bgr' (default, the reference's cv2.imread
    convention) flips the channel axis relative to 'rgb'."""
    import jax.numpy as jnp
    from PIL import Image

    from srsem.explain.saliency import generate_saliency_maps

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    arr = np.zeros((40, 40, 3), np.uint8)
    arr[..., 0] = 200  # strongly red in RGB
    Image.fromarray(arr).save(imgs / "red.png")

    def mean_first_channel(order, out_name):
        got = {}

        def fake_apply(variables, x):
            got["c0"] = float(np.asarray(x)[0, ..., 0].mean())
            return jnp.zeros(x.shape[:3])

        generate_saliency_maps(fake_apply, {}, str(imgs),
                               str(tmp_path / out_name),
                               channel_order=order)
        return got["c0"]

    bgr = mean_first_channel("bgr", "out_bgr")
    rgb = mean_first_channel("rgb", "out_rgb")
    assert rgb > 0.5 > bgr  # red channel leads in rgb, trails in bgr


def test_generate_saliency_maps_resume_guard(tmp_path, np_rng):
    """Skip-existing resume must not mix geometries in one tree: the
    .srsem_saliency_meta.json marker pins the flags a tree was built
    with, same-flag resume skips existing maps, different flags fail."""
    import jax.numpy as jnp
    from PIL import Image

    from srsem.explain.saliency import generate_saliency_maps

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.fromarray(np_rng.integers(
        0, 256, (60, 90, 3), dtype=np.uint8)).save(imgs / "a.png")
    out = tmp_path / "SaliencyMaps"

    def fake_apply(variables, x):
        return jnp.zeros(x.shape[:3]) + 0.5

    assert generate_saliency_maps(fake_apply, {}, str(imgs), str(out)) == 1
    assert (out / ".srsem_saliency_meta.json").exists()
    # same flags: clean resume, existing map skipped
    Image.fromarray(np_rng.integers(
        0, 256, (60, 90, 3), dtype=np.uint8)).save(imgs / "b.png")
    assert generate_saliency_maps(fake_apply, {}, str(imgs), str(out)) == 1
    # different flags: fail fast instead of writing a mixed tree
    with pytest.raises(ValueError, match="mix"):
        generate_saliency_maps(fake_apply, {}, str(imgs), str(out),
                               geometry="resize")
    with pytest.raises(ValueError, match="mix"):
        generate_saliency_maps(fake_apply, {}, str(imgs), str(out),
                               channel_order="rgb")
