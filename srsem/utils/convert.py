"""Torch-checkpoint → Flax-param converters for the two ResNet-50 towers.

The reference's accuracy hinges on pretrained backbones
(``timm.create_model(..., pretrained=True)`` —
reference: models/global_eval_models.py:315,695).  This environment has no
network, so pretrained weights arrive as torch state dicts supplied by the
user; these converters map them into our NHWC param trees:

* conv kernels: OIHW → HWIO transpose;
* linear weights: (out, in) → (in, out) transpose;
* BatchNorm: weight/bias/running_mean/running_var → scale/bias/mean/var of
  FrozenBatchNorm.

Supported layouts: torchvision/timm ``resnet50`` (conv1, bn1,
layer{1..4}.{b}.conv{1..3}/bn{1..3}/downsample.{0,1}) and OpenAI CLIP's
``visual`` tower (stem conv1-3/bn1-3, layer{1..4}.{b} with
avgpool-downsample ("-1"/0/1 keys collapse to 0/1 in state dicts), attnpool
q/k/v/c_proj + positional_embedding).

Tested against randomly-initialized torch mirror models
(tests/test_torch_parity.py) — golden-activation parity without a network.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np
from flax import traverse_util


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # Always COPY: ``np.asarray`` on an already-float32 torch buffer returns
    # a VIEW of torch's storage, so a later in-place torch mutation (an
    # optimizer step, a BatchNorm running-stat update) would silently change
    # the "converted" jax-side init — exactly the aliasing that broke the
    # train-parity harness (tests/test_train_parity.py).
    return np.array(v, np.float32, copy=True)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _bn(flat: Dict, path: tuple, sd: Mapping, prefix: str) -> None:
    flat[path + ("scale",)] = _np(sd[f"{prefix}.weight"])
    flat[path + ("bias",)] = _np(sd[f"{prefix}.bias"])
    flat[path + ("mean",)] = _np(sd[f"{prefix}.running_mean"])
    flat[path + ("var",)] = _np(sd[f"{prefix}.running_var"])


def convert_torch_resnet50(sd: Mapping[str, Any]) -> Dict:
    """torchvision/timm ``resnet50`` state dict → ImageNetResNet50 params."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    flat: Dict[tuple, np.ndarray] = {}
    flat[("conv1", "kernel")] = _conv(sd["conv1.weight"])
    _bn(flat, ("bn1",), sd, "bn1")
    blocks = (3, 4, 6, 3)
    for s, n in enumerate(blocks, start=1):
        for b in range(n):
            tp = f"layer{s}.{b}"
            jp = f"layer{s}.{b}"
            for c in (1, 2, 3):
                flat[(jp, f"conv{c}", "kernel")] = _conv(sd[f"{tp}.conv{c}.weight"])
                _bn(flat, (jp, f"bn{c}"), sd, f"{tp}.bn{c}")
            if f"{tp}.downsample.0.weight" in sd:
                flat[(jp, "downsample_conv", "kernel")] = _conv(
                    sd[f"{tp}.downsample.0.weight"])
                _bn(flat, (jp, "downsample_bn"), sd, f"{tp}.downsample.1")
    return traverse_util.unflatten_dict(flat)


def convert_clip_resnet50(sd: Mapping[str, Any],
                          image_size: int = 224) -> Dict:
    """OpenAI CLIP ``visual`` tower state dict → ClipResNet50 params.

    Accepts keys with or without a ``visual.`` prefix.  CLIP's stem convs
    are named conv1/bn1..conv3/bn3; ours are stem.conv1/stem.bn1... Blocks
    ``layer{s}.{b}`` map to ``stages.{s-1}.{b}``; CLIP downsample keys are
    ``downsample.0`` (conv, after the avgpool "-1") and ``downsample.1``
    (bn).
    """
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in sd.items()}
    flat: Dict[tuple, np.ndarray] = {}
    for i in (1, 2, 3):
        flat[(f"stem.conv{i}", "kernel")] = _conv(sd[f"conv{i}.weight"])
        _bn(flat, (f"stem.bn{i}",), sd, f"bn{i}")
    blocks = (3, 4, 6, 3)
    for s, n in enumerate(blocks, start=1):
        for b in range(n):
            tp = f"layer{s}.{b}"
            jp = f"stages.{s - 1}.{b}"
            for c in (1, 2, 3):
                flat[(jp, f"conv{c}", "kernel")] = _conv(sd[f"{tp}.conv{c}.weight"])
                _bn(flat, (jp, f"bn{c}"), sd, f"{tp}.bn{c}")
            if f"{tp}.downsample.0.weight" in sd:
                flat[(jp, "downsample_conv", "kernel")] = _conv(
                    sd[f"{tp}.downsample.0.weight"])
                _bn(flat, (jp, "downsample_bn"), sd, f"{tp}.downsample.1")
    # Attention pool.
    flat[("attnpool", "positional_embedding")] = _np(
        sd["attnpool.positional_embedding"])
    for proj in ("q_proj", "k_proj", "v_proj"):
        flat[("attnpool", proj, "kernel")] = _np(sd[f"attnpool.{proj}.weight"]).T
        flat[("attnpool", proj, "bias")] = _np(sd[f"attnpool.{proj}.bias"])
    flat[("attnpool", "out_proj", "kernel")] = _np(sd["attnpool.c_proj.weight"]).T
    flat[("attnpool", "out_proj", "bias")] = _np(sd["attnpool.c_proj.bias"])
    return traverse_util.unflatten_dict(flat)


def convert_clip_vit(sd: Mapping[str, Any]) -> Dict:
    """timm ``vit_base_patch16_clip_224``-layout state dict → ClipViT params.

    Expected keys: patch_embed.proj.{weight,bias}, cls_token, pos_embed,
    norm_pre.*, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}.*,
    norm.*.  LayerScale (ls1/ls2) params are identity for CLIP ViTs and are
    ignored if present.
    """
    flat: Dict[tuple, np.ndarray] = {}
    flat[("patch_embed", "kernel")] = _conv(sd["patch_embed.proj.weight"])
    flat[("patch_embed", "bias")] = _np(sd["patch_embed.proj.bias"])
    flat[("cls_token",)] = _np(sd["cls_token"]).reshape(1, 1, -1)
    flat[("pos_embed",)] = _np(sd["pos_embed"]).reshape(
        1, -1, _np(sd["cls_token"]).shape[-1])
    for ln_t, ln_j in (("norm_pre", "norm_pre"), ("norm", "norm")):
        flat[(ln_j, "scale")] = _np(sd[f"{ln_t}.weight"])
        flat[(ln_j, "bias")] = _np(sd[f"{ln_t}.bias"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k)))
    for l in range(n_layers):
        tp = f"blocks.{l}"
        jp = f"blocks.{l}"
        for ln in ("norm1", "norm2"):
            flat[(jp, ln, "scale")] = _np(sd[f"{tp}.{ln}.weight"])
            flat[(jp, ln, "bias")] = _np(sd[f"{tp}.{ln}.bias"])
        for lin_t, lin_j in (("attn.qkv", "attn.qkv"),
                             ("attn.proj", "attn.proj"),
                             ("mlp.fc1", "mlp.fc1"), ("mlp.fc2", "mlp.fc2")):
            flat[(jp, lin_j, "kernel")] = _np(sd[f"{tp}.{lin_t}.weight"]).T
            flat[(jp, lin_j, "bias")] = _np(sd[f"{tp}.{lin_t}.bias"])
    return traverse_util.unflatten_dict(flat)


def convert_hf_clip_text(sd: Mapping[str, Any]) -> Dict:
    """HF ``CLIPTextModel(WithProjection)`` state dict → ClipTextEncoder
    params.  HF stores q/k/v projections separately; ours fuses them into
    one qkv matrix (concat along the output dim).  Accepts keys with or
    without the ``text_model.`` prefix."""
    sd = {k[len("text_model."):] if k.startswith("text_model.") else k: v
          for k, v in sd.items()}
    flat: Dict[tuple, np.ndarray] = {}
    flat[("token_embedding", "embedding")] = _np(
        sd["embeddings.token_embedding.weight"])
    flat[("positional_embedding",)] = _np(
        sd["embeddings.position_embedding.weight"])
    if "text_projection.weight" in sd:
        flat[("text_projection",)] = _np(sd["text_projection.weight"]).T
    flat[("ln_final", "scale")] = _np(sd["final_layer_norm.weight"])
    flat[("ln_final", "bias")] = _np(sd["final_layer_norm.bias"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    for l in range(n_layers):
        tp = f"encoder.layers.{l}"
        jp = f"resblocks.{l}"
        qkv_w = np.concatenate([
            _np(sd[f"{tp}.self_attn.{p}_proj.weight"]) for p in "qkv"], axis=0)
        qkv_b = np.concatenate([
            _np(sd[f"{tp}.self_attn.{p}_proj.bias"]) for p in "qkv"], axis=0)
        flat[(jp, "attn.qkv", "kernel")] = qkv_w.T
        flat[(jp, "attn.qkv", "bias")] = qkv_b
        flat[(jp, "attn.out_proj", "kernel")] = _np(
            sd[f"{tp}.self_attn.out_proj.weight"]).T
        flat[(jp, "attn.out_proj", "bias")] = _np(
            sd[f"{tp}.self_attn.out_proj.bias"])
        for hf_ln, j_ln in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2")):
            flat[(jp, j_ln, "scale")] = _np(sd[f"{tp}.{hf_ln}.weight"])
            flat[(jp, j_ln, "bias")] = _np(sd[f"{tp}.{hf_ln}.bias"])
        for hf_fc, j_fc in (("fc1", "c_fc"), ("fc2", "c_proj")):
            flat[(jp, f"mlp.{j_fc}", "kernel")] = _np(
                sd[f"{tp}.mlp.{hf_fc}.weight"]).T
            flat[(jp, f"mlp.{j_fc}", "bias")] = _np(sd[f"{tp}.mlp.{hf_fc}.bias"])
    return traverse_util.unflatten_dict(flat)


def convert_hf_clip_vit(sd: Mapping[str, Any]) -> Dict:
    """HF ``CLIPVisionModel`` state dict → ClipViT params (construct the
    model with act="quick_gelu" for OpenAI checkpoints).  HF names:
    vision_model.embeddings.{class_embedding, patch_embedding.weight,
    position_embedding.weight}, pre_layrnorm, encoder.layers.N.*,
    post_layernorm.  The patch conv has no bias in HF → zero bias."""
    sd = {k[len("vision_model."):] if k.startswith("vision_model.") else k: v
          for k, v in sd.items()}
    flat: Dict[tuple, np.ndarray] = {}
    patch_w = _conv(sd["embeddings.patch_embedding.weight"])
    flat[("patch_embed", "kernel")] = patch_w
    flat[("patch_embed", "bias")] = np.zeros(patch_w.shape[-1], np.float32)
    width = patch_w.shape[-1]
    flat[("cls_token",)] = _np(sd["embeddings.class_embedding"]).reshape(1, 1, width)
    flat[("pos_embed",)] = _np(
        sd["embeddings.position_embedding.weight"]).reshape(1, -1, width)
    # HF's (sic) "pre_layrnorm" / post_layernorm → our norm_pre / norm.
    pre_key = "pre_layrnorm" if "pre_layrnorm.weight" in sd else "pre_layernorm"
    flat[("norm_pre", "scale")] = _np(sd[f"{pre_key}.weight"])
    flat[("norm_pre", "bias")] = _np(sd[f"{pre_key}.bias"])
    flat[("norm", "scale")] = _np(sd["post_layernorm.weight"])
    flat[("norm", "bias")] = _np(sd["post_layernorm.bias"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    for l in range(n_layers):
        tp = f"encoder.layers.{l}"
        jp = f"blocks.{l}"
        qkv_w = np.concatenate([
            _np(sd[f"{tp}.self_attn.{p}_proj.weight"]) for p in "qkv"], axis=0)
        qkv_b = np.concatenate([
            _np(sd[f"{tp}.self_attn.{p}_proj.bias"]) for p in "qkv"], axis=0)
        flat[(jp, "attn.qkv", "kernel")] = qkv_w.T
        flat[(jp, "attn.qkv", "bias")] = qkv_b
        flat[(jp, "attn.proj", "kernel")] = _np(
            sd[f"{tp}.self_attn.out_proj.weight"]).T
        flat[(jp, "attn.proj", "bias")] = _np(sd[f"{tp}.self_attn.out_proj.bias"])
        for hf_ln, j_ln in (("layer_norm1", "norm1"), ("layer_norm2", "norm2")):
            flat[(jp, j_ln, "scale")] = _np(sd[f"{tp}.{hf_ln}.weight"])
            flat[(jp, j_ln, "bias")] = _np(sd[f"{tp}.{hf_ln}.bias"])
        for fc in ("fc1", "fc2"):
            flat[(jp, f"mlp.{fc}", "kernel")] = _np(sd[f"{tp}.mlp.{fc}.weight"]).T
            flat[(jp, f"mlp.{fc}", "bias")] = _np(sd[f"{tp}.mlp.{fc}.bias"])
    return traverse_util.unflatten_dict(flat)


def convert_slip(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Meta SLIP checkpoint → parts for SlipDualEncoder.

    SLIP's CLIP class (reference: additional_approaches/src/slip/models.py:
    66-101) pairs a timm ViT under ``visual.`` with an OpenAI-style text
    transformer (token_embedding / positional_embedding /
    transformer.resblocks.N / ln_final) plus separate ``image_projection``
    and ``text_projection`` matrices — so this is a composition of the
    timm-ViT and OpenAI-text converters.

    Returns {"vit": ClipViT params, "image_projection": (vw, embed),
             "text": ClipTextEncoder params (text_projection included)}.
    """
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    visual = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    text_keys = {k: v for k, v in sd.items()
                 if k.startswith(("token_embedding", "positional_embedding",
                                  "transformer.", "ln_final",
                                  "text_projection"))}
    return {
        "vit": convert_clip_vit(visual),
        "image_projection": _np(sd["image_projection"]),
        "text": convert_clip_text(text_keys),
    }


def convert_clip_text(sd: Mapping[str, Any]) -> Dict:
    """OpenAI CLIP text transformer state dict → ClipTextEncoder params.

    Expects the standard keys: token_embedding.weight,
    positional_embedding, transformer.resblocks.N.{attn.in_proj_weight/
    in_proj_bias/out_proj.*, ln_1.*, ln_2.*, mlp.c_fc.*, mlp.c_proj.*},
    ln_final.*, text_projection.
    """
    flat: Dict[tuple, np.ndarray] = {}
    flat[("token_embedding", "embedding")] = _np(sd["token_embedding.weight"])
    flat[("positional_embedding",)] = _np(sd["positional_embedding"])
    flat[("text_projection",)] = _np(sd["text_projection"])
    flat[("ln_final", "scale")] = _np(sd["ln_final.weight"])
    flat[("ln_final", "bias")] = _np(sd["ln_final.bias"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k)))
    for l in range(n_layers):
        tp = f"transformer.resblocks.{l}"
        jp = f"resblocks.{l}"
        flat[(jp, "attn.qkv", "kernel")] = _np(sd[f"{tp}.attn.in_proj_weight"]).T
        flat[(jp, "attn.qkv", "bias")] = _np(sd[f"{tp}.attn.in_proj_bias"])
        flat[(jp, "attn.out_proj", "kernel")] = _np(
            sd[f"{tp}.attn.out_proj.weight"]).T
        flat[(jp, "attn.out_proj", "bias")] = _np(sd[f"{tp}.attn.out_proj.bias"])
        for ln in ("ln_1", "ln_2"):
            flat[(jp, ln, "scale")] = _np(sd[f"{tp}.{ln}.weight"])
            flat[(jp, ln, "bias")] = _np(sd[f"{tp}.{ln}.bias"])
        for mlp in ("c_fc", "c_proj"):
            flat[(jp, f"mlp.{mlp}", "kernel")] = _np(sd[f"{tp}.mlp.{mlp}.weight"]).T
            flat[(jp, f"mlp.{mlp}", "bias")] = _np(sd[f"{tp}.mlp.{mlp}.bias"])
    return traverse_util.unflatten_dict(flat)


def _strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_global_head(sd: Mapping[str, Any], shared: bool = False) -> Dict:
    """Reference TRAINED-head checkpoint → GlobalPairScorer head params.

    The reference's ``save_model`` writes ``self.w_layers.state_dict()``
    (reference: models/global_eval_models.py:419-429, 795-801) — keys
    ``"{j}.weight"``/``"{j}.bias"`` where weight is a ``(1, C, 1, 1)``
    Conv2d kernel (stages_cnn / clsbckb / wperlay_cnn) or a ``(1, W)``
    Linear (the ViT heads' identical ModuleList — those classes ship
    without save_model, but the state-dict layout is the same).  With
    ``enc_ft`` the reference saves the FULL model state dict instead
    (:420-421); both forms are accepted — full dicts are filtered on the
    ``w_layers.`` / ``w_layer.`` / ``fin_lin.`` prefix (use the backbone
    converters for the ``clip.`` subtree of an enc_ft checkpoint).

    ``shared=True`` selects the singleLin head: ONE Linear inside a
    Sequential, saved under ``w_layer`` (reference :29-31) → the
    ``w_layer`` param of TokenHeadAggregator(shared=True).

    The MLP variants' own ``save_model`` is broken in the reference (it
    saves a nonexistent ``self.w_layers`` — :554, :670), so their trained
    weights only exist inside enc_ft-style full dicts; ``fin_lin.{i}``
    Linear entries (torch Sequential indices 0/2/4/6) map to MlpHead's
    ``fin_lin.{j}``.

    Returns ``{"aggregator": {...}}`` — merge into GlobalPairScorer params
    with srsem.train.partition.merge_params, or save as the ``trainable``
    tree of an srsem checkpoint (``srsem convert --kind global_head``).
    """
    if any(k.startswith(("w_layers.", "w_layer.", "fin_lin."))
           for k in sd):
        lin = _strip_prefix(sd, "fin_lin.")
        if lin:
            idxs = sorted({int(k.split(".")[0]) for k in lin})
            head = {
                f"fin_lin.{j}": {
                    "kernel": _np(lin[f"{i}.weight"]).T,
                    "bias": _np(lin[f"{i}.bias"]),
                }
                for j, i in enumerate(idxs)
            }
            return {"aggregator": head}
        sd = (_strip_prefix(sd, "w_layer.") if shared
              else _strip_prefix(sd, "w_layers."))
        if not sd:
            raise ValueError(
                "no head keys survived the prefix filter — a 'w_layer.'-"
                "prefixed (singleLin) checkpoint needs shared=True "
                "(CLI: --shared-head); a 'w_layers.' one needs shared=False")
    idxs = sorted({int(k.split(".")[0]) for k in sd if "." in k})
    if not idxs:
        raise ValueError(
            f"no '{{index}}.weight' head entries found (keys: "
            f"{sorted(sd)[:6]}...) — is this really a save_model head "
            "state dict?")
    heads = {}
    for j in idxs:
        w = _np(sd[f"{j}.weight"])
        if w.ndim == 4:  # (1, C, 1, 1) Conv2d → Dense (C, 1)
            kernel = w[0, :, 0, 0][:, None]
        else:  # (1, W) Linear → Dense (W, 1)
            kernel = w.T
        heads[f"w_layers.{j}"] = {"kernel": kernel,
                                  "bias": _np(sd[f"{j}.bias"])}
    if shared:
        if len(idxs) != 1:
            raise ValueError(
                f"shared head expects ONE linear, got indices {idxs}")
        heads = {"w_layer": heads["w_layers.0"]}
    return {"aggregator": heads}


def convert_clu_decoder(sd: Mapping[str, Any]) -> Dict:
    """Reference trained CLU decoder checkpoint → CluUnet decoder trees.

    The reference's ``save_model`` writes ``self.decoder.state_dict()``
    unless LoRA (reference: models/local_eval_models.py:160-171) — keys
    ``"{lvl}.{i}.*"`` over a ModuleList of Sequentials ordered shallow→deep
    (:38-82): index 0 = Conv3x3, 1 = BatchNorm, 3 = second Conv (1x1 at
    level 0), 4 = second BatchNorm (absent at level 0).  Full state dicts
    (LoRA / the global UNet copy saved via its own decoder-only
    save_model, global_eval_models.py:1064-1068) are accepted too —
    filtered on the ``decoder.`` prefix.

    Returns ``{"params": {"decoder.{lvl}": ...}, "batch_stats":
    {"decoder.{lvl}": ...}}`` matching CluUnet's DecoderBlock layout
    (conv1/bn1/conv2/bn2) — the split-conv serving decoder keeps the
    concat-form kernel layout exactly, so converted checkpoints run
    unchanged (srsem/models/local_models.py::_ConcatConv).
    """
    if any("lora" in k.lower() for k in sd):
        # LoRA checkpoints are FULL state dicts (reference
        # local_eval_models.py:160-163); extracting just the decoder would
        # silently drop the adapted backbone and change every map.
        raise ValueError(
            "state dict contains LoRA weights — convert the backbone "
            "subtree with convert_clip_resnet50/convert_torch_resnet50 "
            "(LoRA factors follow pytora's layout and need the lora_a/"
            "lora_b mapping) instead of dropping it")
    if any(k.startswith("decoder.") for k in sd):
        sd = _strip_prefix(sd, "decoder.")
    lvls = sorted({int(k.split(".")[0]) for k in sd if "." in k})
    params: Dict[str, Dict] = {}
    stats: Dict[str, Dict] = {}
    for lvl in lvls:
        block = {
            "conv1": {"kernel": _conv(sd[f"{lvl}.0.weight"]),
                      "bias": _np(sd[f"{lvl}.0.bias"])},
            "bn1": {"scale": _np(sd[f"{lvl}.1.weight"]),
                    "bias": _np(sd[f"{lvl}.1.bias"])},
            "conv2": {"kernel": _conv(sd[f"{lvl}.3.weight"]),
                      "bias": _np(sd[f"{lvl}.3.bias"])},
        }
        bstats = {
            "bn1": {"mean": _np(sd[f"{lvl}.1.running_mean"]),
                    "var": _np(sd[f"{lvl}.1.running_var"])},
        }
        if f"{lvl}.4.weight" in sd:  # level 0 has no second BN
            block["bn2"] = {"scale": _np(sd[f"{lvl}.4.weight"]),
                            "bias": _np(sd[f"{lvl}.4.bias"])}
            bstats["bn2"] = {"mean": _np(sd[f"{lvl}.4.running_mean"]),
                             "var": _np(sd[f"{lvl}.4.running_var"])}
        params[f"decoder.{lvl}"] = block
        stats[f"decoder.{lvl}"] = bstats
    return {"params": params, "batch_stats": stats}


def _bn_split(params: Dict, stats: Dict, path: tuple, sd: Mapping,
              prefix: str) -> None:
    """BatchNorm with trainable running stats (TorchBatchNorm layout):
    weight/bias → params, running stats → the batch_stats collection."""
    params[path + ("scale",)] = _np(sd[f"{prefix}.weight"])
    params[path + ("bias",)] = _np(sd[f"{prefix}.bias"])
    stats[path + ("mean",)] = _np(sd[f"{prefix}.running_mean"])
    stats[path + ("var",)] = _np(sd[f"{prefix}.running_var"])


def _linear(params: Dict, path: tuple, sd: Mapping, prefix: str) -> None:
    params[path + ("kernel",)] = _np(sd[f"{prefix}.weight"]).T
    params[path + ("bias",)] = _np(sd[f"{prefix}.bias"])


def _layernorm(params: Dict, path: tuple, sd: Mapping, prefix: str) -> None:
    params[path + ("scale",)] = _np(sd[f"{prefix}.weight"])
    params[path + ("bias",)] = _np(sd[f"{prefix}.bias"])


def convert_transalnet(sd: Mapping[str, Any]) -> Dict:
    """Reference TranSalNet-Dense checkpoint → TranSalNetDense trees.

    Maps the reference's full ``TranSalNet().state_dict()`` (reference:
    additional_approaches/src/transalnet/TranSalNet_Dense.py:44-143,
    utils/densenet.py, utils/TransformerEncoder.py) onto
    srsem.explain.saliency.TranSalNetDense:

    * ``encoder.encoder.{i}`` — the densenet161 ``features`` children
      minus the final norm5 (TranSalNet_Dense.py:57-70): ModuleList index
      0 = conv0, 1 = norm0, 4/6/8/10 = denseblock1-4 (each
      ``denselayer{n}.{norm1,conv1,norm2,conv2}``), 5/7/9 =
      transition1-3 (``norm``/``conv``);
    * ``decoder.conv{k}``/``decoder.batchnorm{k}`` → ``d{k}_conv`` /
      ``d{k}_bn`` (k = 1..6; conv7 → d7_conv, no BN);
    * ``decoder.TransEncoder{k}`` → ``TransEncoder{k}``: 1×1
      patch_embeddings conv, (1, T, hidden) position_embeddings, and
      2 transformer blocks whose separate query/key/value Linears fuse
      into the flax ``attn_qkv`` kernel (concat along the output axis in
      q,k,v order — the (3, heads, head_dim) reshape in
      srsem/explain/saliency.py::SaliencyTransBlock reads it back in the
      same layout torch's ``transpose_for_scores`` uses).

    Returns ``{"params": ..., "batch_stats": ...}`` — batch_stats carries
    every BatchNorm's running stats (the model trains BN in train mode,
    TranSalNet_Dense.py fine-tuning; srsem/ops/batchnorm.py).
    """
    params: Dict[tuple, np.ndarray] = {}
    stats: Dict[tuple, np.ndarray] = {}

    # --- DenseNet-161 encoder (ModuleList indices → named modules) ---
    enc = "encoder.encoder"
    params[("encoder", "conv0", "kernel")] = _conv(sd[f"{enc}.0.weight"])
    _bn_split(params, stats, ("encoder", "norm0"), sd, f"{enc}.1")
    block_layers = {1: 6, 2: 12, 3: 36, 4: 24}
    for b, idx in ((1, 4), (2, 6), (3, 8), (4, 10)):
        for n in range(1, block_layers[b] + 1):
            tp = f"{enc}.{idx}.denselayer{n}"
            jp = ("encoder", f"denseblock{b}", f"denselayer{n}")
            _bn_split(params, stats, jp + ("norm1",), sd, f"{tp}.norm1")
            params[jp + ("conv1", "kernel")] = _conv(sd[f"{tp}.conv1.weight"])
            _bn_split(params, stats, jp + ("norm2",), sd, f"{tp}.norm2")
            params[jp + ("conv2", "kernel")] = _conv(sd[f"{tp}.conv2.weight"])
    for t, idx in ((1, 5), (2, 7), (3, 9)):
        tp = f"{enc}.{idx}"
        jp = ("encoder", f"transition{t}")
        _bn_split(params, stats, jp + ("norm",), sd, f"{tp}.norm")
        params[jp + ("conv", "kernel")] = _conv(sd[f"{tp}.conv.weight"])

    # --- Transformer encoders ---
    for k in (1, 2, 3):
        tp = f"decoder.TransEncoder{k}"
        jp = (f"TransEncoder{k}",)
        params[jp + ("patch_embeddings", "kernel")] = _conv(
            sd[f"{tp}.patch_embeddings.weight"])
        params[jp + ("patch_embeddings", "bias")] = _np(
            sd[f"{tp}.patch_embeddings.bias"])
        params[jp + ("position_embeddings",)] = _np(
            sd[f"{tp}.position_embeddings"])
        for i in range(2):
            lp = f"{tp}.transformer_encoder.layer.{i}"
            ljp = jp + (f"layer{i}",)
            _layernorm(params, ljp + ("attention_norm",), sd,
                       f"{lp}.attention_norm")
            qkv_w = np.concatenate(
                [_np(sd[f"{lp}.attn.{m}.weight"]).T
                 for m in ("query", "key", "value")], axis=1)
            qkv_b = np.concatenate(
                [_np(sd[f"{lp}.attn.{m}.bias"])
                 for m in ("query", "key", "value")])
            params[ljp + ("attn_qkv", "kernel")] = qkv_w
            params[ljp + ("attn_qkv", "bias")] = qkv_b
            _linear(params, ljp + ("attn_out",), sd, f"{lp}.attn.out")
            _layernorm(params, ljp + ("ffn_norm",), sd, f"{lp}.ffn_norm")
            _linear(params, ljp + ("ffn_fc1",), sd, f"{lp}.ffn.fc1")
            _linear(params, ljp + ("ffn_fc2",), sd, f"{lp}.ffn.fc2")
        _layernorm(params, jp + ("encoder_norm",), sd,
                   f"{tp}.transformer_encoder.encoder_norm")

    # --- Decoder convs + BNs ---
    for k in range(1, 7):
        params[(f"d{k}_conv", "kernel")] = _conv(sd[f"decoder.conv{k}.weight"])
        params[(f"d{k}_conv", "bias")] = _np(sd[f"decoder.conv{k}.bias"])
        _bn_split(params, stats, (f"d{k}_bn",), sd, f"decoder.batchnorm{k}")
    params[("d7_conv", "kernel")] = _conv(sd["decoder.conv7.weight"])
    params[("d7_conv", "bias")] = _np(sd["decoder.conv7.bias"])

    return {"params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(stats)}


def convert_albef(sd: Mapping[str, Any], image_size: int = 384,
                  patch: int = 16) -> Dict:
    """ALBEF retrieval/grounding checkpoint → srsem ALBEF tower trees.

    Maps the reference's full ALBEF state dict (reference:
    additional_approaches/src/albef/model_wrapper.py:57-72 — keys
    ``visual_encoder.*`` (deit-style timm ViT, fused qkv, no pre-norm),
    ``text_encoder[.bert].*`` (BERT-base whose upper layers also carry
    cross-attention), ``vision_proj.*`` / ``text_proj.*``) onto:

    * ``vit`` — ClipViT(use_norm_pre=False, ln_eps=1e-6) params, with the
      checkpoint positional embedding BICUBIC-interpolated to the
      ``image_size`` grid at load time, exactly like the reference's
      ``interpolate_pos_embed`` (albef/vit.py:178-202, wrapper :58-60);
    * ``vision_proj`` / ``text_proj`` — {"kernel", "bias"} for the biased
      joint-space Linears (wrapper :97, :110);
    * ``text`` — MiniLMEncoder(hidden=768, layers=12, pool="cls") params.
      Cross-attention weights are dropped here — ALBEF's text mode skips
      them (xbert mode='text'); convert the fusion stack separately with
      srsem.explain.fusion.convert_albef_fusion.

    Momentum-distilled copies (``*_m``, ``*_m.*``) and the queue buffers
    are ignored.  Returns ``{"vit", "vision_proj", "text", "text_proj"}``
    — feed to AlbefDualEncoder (srsem/explain/dual_encoders.py).
    """
    vit_sd = _strip_prefix(sd, "visual_encoder.")
    flat: Dict[tuple, np.ndarray] = {}
    flat[("patch_embed", "kernel")] = _conv(vit_sd["patch_embed.proj.weight"])
    flat[("patch_embed", "bias")] = _np(vit_sd["patch_embed.proj.bias"])
    width = _np(vit_sd["cls_token"]).shape[-1]
    flat[("cls_token",)] = _np(vit_sd["cls_token"]).reshape(1, 1, -1)

    pos = _np(vit_sd["pos_embed"]).reshape(1, -1, width)
    new_side = image_size // patch
    old_side = int(round(float(pos.shape[1] - 1) ** 0.5))
    if old_side != new_side:
        # Reference load-time interpolation: bicubic, align_corners=False
        # (albef/vit.py:193-196).  torch's bicubic kernel (a=-0.75)
        # differs from jax.image.resize's (a=-0.5), so reuse torch — it
        # is always importable where a torch checkpoint is being read.
        import torch
        import torch.nn.functional as F

        grid = torch.from_numpy(
            pos[:, 1:].reshape(1, old_side, old_side, width)).permute(
                0, 3, 1, 2)
        grid = F.interpolate(grid, size=(new_side, new_side),
                             mode="bicubic", align_corners=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, new_side * new_side,
                                                width).numpy()
        pos = np.concatenate([pos[:, :1], grid], axis=1)
    flat[("pos_embed",)] = pos

    flat[("norm", "scale")] = _np(vit_sd["norm.weight"])
    flat[("norm", "bias")] = _np(vit_sd["norm.bias"])
    n_layers = 1 + max(int(m.group(1)) for k in vit_sd
                       if (m := re.match(r"blocks\.(\d+)\.", k)))
    for l in range(n_layers):
        tp = f"blocks.{l}"
        for ln in ("norm1", "norm2"):
            flat[(tp, ln, "scale")] = _np(vit_sd[f"{tp}.{ln}.weight"])
            flat[(tp, ln, "bias")] = _np(vit_sd[f"{tp}.{ln}.bias"])
        for lin in ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2"):
            flat[(tp, lin, "kernel")] = _np(vit_sd[f"{tp}.{lin}.weight"]).T
            flat[(tp, lin, "bias")] = _np(vit_sd[f"{tp}.{lin}.bias"])
    vit_params = traverse_util.unflatten_dict(flat)

    out: Dict[str, Any] = {"vit": vit_params}
    for proj in ("vision_proj", "text_proj"):
        if f"{proj}.weight" in sd:
            out[proj] = {"kernel": _np(sd[f"{proj}.weight"]).T,
                         "bias": _np(sd[f"{proj}.bias"])}

    text_sd = {k: v for k, v in _strip_prefix(sd, "text_encoder.").items()
               if "crossattention" not in k}
    text_sd = {(k[len("bert."):] if k.startswith("bert.") else k): v
               for k, v in text_sd.items()}
    if text_sd:
        from srsem.pseudo.text_embed import convert_hf_minilm

        out["text"] = convert_hf_minilm(
            {k: _np(v) for k, v in text_sd.items()
             if not k.startswith("cls.")})
    return out
