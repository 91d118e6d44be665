"""Parity: reference TRAINED-checkpoint converters.

The reference ships its trained models as ``save_model`` state dicts —
``w_layers`` for the global heads (reference:
models/global_eval_models.py:419-429) and ``decoder`` for CLU (reference:
models/local_eval_models.py:160-171).  These tests build randomly
initialized torch mirrors of those exact formats, convert with
srsem.utils.convert.{convert_global_head, convert_clu_decoder}, and pin
output parity between the torch reference math and the srsem modules.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from srsem.models.global_models import (
    ConvHeadAggregator,
    MlpHead,
    TokenHeadAggregator,
)
from srsem.utils.convert import convert_clu_decoder, convert_global_head

ATOL = 2e-5


def _conv_head_torch(w_layers, diffs_nchw):
    """Reference aggregation: per-layer 1x1 conv → spatial mean → layer
    mean → ReLU (reference: models/global_eval_models.py:379-395)."""
    scores = [conv(d).mean(dim=(1, 2, 3)) for conv, d in
              zip(w_layers, diffs_nchw)]
    return torch.relu(torch.stack(scores, 0).mean(0))


def test_convert_global_head_conv_matches_torch():
    torch.manual_seed(0)
    chans = [512, 1024, 2048]
    w_layers = tnn.ModuleList(
        [tnn.Conv2d(c, 1, kernel_size=1) for c in chans])
    sd = w_layers.state_dict()  # the save_model format: {j}.weight/.bias

    rng = np.random.default_rng(1)
    diffs = [rng.uniform(0, 1, (3, 8 // (2 ** i), 8 // (2 ** i), c))
             .astype(np.float32) for i, c in enumerate(chans)]
    with torch.no_grad():
        want = _conv_head_torch(
            w_layers,
            [torch.from_numpy(d).permute(0, 3, 1, 2) for d in diffs]
        ).numpy()

    head = convert_global_head(sd)
    got = np.asarray(ConvHeadAggregator(len(chans)).apply(
        {"params": head["aggregator"]}, [jnp.asarray(d) for d in diffs]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=ATOL)


def test_convert_global_head_linear_and_shared():
    """ViT per-layer Linear heads and the singleLin shared w_layer."""
    torch.manual_seed(2)
    width, tokens, n = 96, 10, 4
    w_layers = tnn.ModuleList([tnn.Linear(width, 1) for _ in range(3)])
    rng = np.random.default_rng(3)
    diffs = [rng.uniform(0, 1, (n, tokens, width)).astype(np.float32)
             for _ in range(3)]
    with torch.no_grad():
        scores = [lin(torch.from_numpy(d)).mean(dim=(1, 2))
                  for lin, d in zip(w_layers, diffs)]
        want = torch.relu(torch.stack(scores, 0).mean(0)).numpy()

    head = convert_global_head(w_layers.state_dict())
    got = np.asarray(TokenHeadAggregator(3).apply(
        {"params": head["aggregator"]}, [jnp.asarray(d) for d in diffs]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=ATOL)

    # singleLin: ONE Linear in a Sequential under ``w_layer``
    # (reference: models/global_eval_models.py:29-31) — full-model sd form.
    shared = tnn.Sequential(tnn.Linear(width, 1))
    sd_full = {f"w_layer.{k}": v for k, v in shared.state_dict().items()}
    with torch.no_grad():
        scores = [shared(torch.from_numpy(d)).mean(dim=(1, 2))
                  for d in diffs]
        want = torch.relu(torch.stack(scores, 0).mean(0)).numpy()
    head = convert_global_head(sd_full, shared=True)
    got = np.asarray(TokenHeadAggregator(3, shared=True).apply(
        {"params": head["aggregator"]}, [jnp.asarray(d) for d in diffs]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=ATOL)


def test_convert_global_head_full_sd_and_mlp():
    """Full (enc_ft-style) state dicts: w_layers.-prefixed keys are
    filtered out; fin_lin MLP entries map onto MlpHead."""
    torch.manual_seed(4)
    conv = tnn.Conv2d(64, 1, kernel_size=1)
    sd_full = {"clip.some.weight": torch.zeros(3),
               "w_layers.0.weight": conv.weight.data,
               "w_layers.0.bias": conv.bias.data}
    head = convert_global_head(sd_full)
    assert list(head["aggregator"]) == ["w_layers.0"]
    np.testing.assert_allclose(
        head["aggregator"]["w_layers.0"]["kernel"][:, 0],
        conv.weight.data[0, :, 0, 0].numpy())

    # MLP form (reference fin_lin: Linear+ReLU chain with the final ReLU
    # inside the Sequential — models/global_eval_models.py:594-601).
    mlp = tnn.Sequential(tnn.Linear(32, 16), tnn.ReLU(),
                         tnn.Linear(16, 8), tnn.ReLU(),
                         tnn.Linear(8, 1), tnn.ReLU())
    sd = {f"fin_lin.{k}": v for k, v in mlp.state_dict().items()}
    rng = np.random.default_rng(5)
    x = rng.normal(size=(6, 32)).astype(np.float32)
    with torch.no_grad():
        want = mlp(torch.from_numpy(x)).squeeze(-1).numpy()
    head = convert_global_head(sd)
    got = np.asarray(MlpHead((16, 8, 1)).apply(
        {"params": head["aggregator"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=ATOL)


def test_convert_clu_decoder_rejects_lora_dicts():
    """LoRA checkpoints are full state dicts; extracting the decoder
    alone would silently drop the adapted backbone."""
    sd = {"decoder.0.0.weight": torch.zeros(1),
          "clip.stages.0.0.conv1.lora_A": torch.zeros(1)}
    with pytest.raises(ValueError, match="LoRA"):
        convert_clu_decoder(sd)


def _torch_clu_decoder():
    """The reference decoder ModuleList verbatim
    (reference: models/local_eval_models.py:38-82)."""
    return tnn.ModuleList([
        tnn.Sequential(tnn.Conv2d(256 + 64, 64, 3, padding="same"),
                       tnn.BatchNorm2d(64), tnn.ReLU(),
                       tnn.Conv2d(64, 1, 1, padding="same"), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(256 + 512, 256, 3, padding="same"),
                       tnn.BatchNorm2d(256), tnn.ReLU(),
                       tnn.Conv2d(256, 256, 3, padding="same"),
                       tnn.BatchNorm2d(256), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(512 + 1024, 512, 3, padding="same"),
                       tnn.BatchNorm2d(512), tnn.ReLU(),
                       tnn.Conv2d(512, 512, 3, padding="same"),
                       tnn.BatchNorm2d(512), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(1024 + 2048, 1024, 3, padding="same"),
                       tnn.BatchNorm2d(1024), tnn.ReLU(),
                       tnn.Conv2d(1024, 1024, 3, padding="same"),
                       tnn.BatchNorm2d(1024), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(2048, 2048, 3, padding="same"),
                       tnn.BatchNorm2d(2048), tnn.ReLU(),
                       tnn.Conv2d(2048, 2048, 3, padding="same"),
                       tnn.BatchNorm2d(2048), tnn.ReLU()),
    ])


@pytest.mark.slow
def test_convert_clu_decoder_matches_torch():
    """Reference decode loop (torch, eval-mode BN with randomized running
    stats) == CluUnet.decode_from_diffs with the converted checkpoint."""
    from srsem.models.local_models import CluUnet

    torch.manual_seed(6)
    dec = _torch_clu_decoder()
    # Non-trivial BN running stats so the conversion is exercised.
    for m in dec.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.2)
    dec.eval()

    size, n = 64, 2
    rng = np.random.default_rng(7)
    chans = (64, 256, 512, 1024, 2048)
    diffs = [rng.uniform(0, 0.5, (n, size // (2 ** (i + 1)),
                                  size // (2 ** (i + 1)), c))
             .astype(np.float32) ** 2 for i, c in enumerate(chans)]

    up = tnn.UpsamplingBilinear2d(scale_factor=2)
    with torch.no_grad():
        t = [torch.from_numpy(d).permute(0, 3, 1, 2) for d in diffs]
        h = up(dec[-1](t[-1]))
        for j in range(2, len(t) + 1):  # reference :117-124
            h = up(dec[-j](torch.cat((t[-j], h), dim=1)))
        want = torch.sigmoid(h)[:, 0].numpy()

    model = CluUnet(backbone_kind="resnet50_clip", image_size=size,
                    compute_dtype=jnp.float32, decoder_dtype=jnp.float32)
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
    ckpt = convert_clu_decoder(dec.state_dict())
    variables = {
        "params": {**variables["params"], **ckpt["params"]},
        "batch_stats": ckpt["batch_stats"],
    }
    got = np.asarray(model.apply(
        variables, [jnp.asarray(d) for d in diffs], None, False,
        method=CluUnet.decode_from_diffs))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_convert_trained_cli_roundtrip(tmp_path):
    """`srsem convert --kind global_head/clu_decoder` emits checkpoint
    directories that `score --checkpoint` / GroupedMapScorer load."""
    from PIL import Image

    from srsem.cli.main import main

    torch.manual_seed(8)
    # depth=1 stages_cnn head on the ImageNet backbone: stages 2,3 →
    # channels 1024, 2048 (reference: global_eval_models.py:701).
    w_layers = tnn.ModuleList([tnn.Conv2d(c, 1, 1) for c in (1024, 2048)])
    head_pt = tmp_path / "head.pt"
    torch.save(w_layers.state_dict(), head_pt)
    head_dir = tmp_path / "head_ckpt"
    rc = main(["convert", str(head_pt), "--kind", "global_head",
               "--out", str(head_dir)])
    assert rc == 0

    rng = np.random.default_rng(9)
    csv = tmp_path / "pairs.csv"
    rows = ["img_a_pth,img_b_pth"]
    for i in range(2):
        a, b = tmp_path / f"g{i}.png", tmp_path / f"s{i}.png"
        Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                     dtype=np.uint8)).save(a)
        Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                     dtype=np.uint8)).save(b)
        rows.append(f"{a},{b}")
    csv.write_text("\n".join(rows) + "\n")
    out = tmp_path / "scores.csv"
    rc = main(["score", str(csv), "--backbone", "resnet50",
               "--checkpoint", str(head_dir), "--batch-size", "2",
               "--set", "depth=1",
               "--set", "backbone.image_size=48",
               "--set", "backbone.compute_dtype=float32",
               "--out", str(out)])
    assert rc == 0
    import pandas as pd

    assert np.isfinite(pd.read_csv(out)["score"]).all()

    # CLU decoder checkpoint: convert, then restore through the same
    # loader the CLI/serve paths use.
    dec = _torch_clu_decoder()
    dec_pt = tmp_path / "dec.pt"
    torch.save(dec.state_dict(), dec_pt)
    dec_dir = tmp_path / "dec_ckpt"
    rc = main(["convert", str(dec_pt), "--kind", "clu_decoder",
               "--out", str(dec_dir)])
    assert rc == 0
    from srsem.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(str(dec_dir))
    assert "batch_stats" in restored
    assert sorted(restored["trainable"]) == [f"decoder.{i}" for i in
                                             range(5)]
    assert restored["trainable"]["decoder.1"]["conv1"]["kernel"].shape == \
        (3, 3, 768, 256)
