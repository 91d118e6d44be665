"""``python -m srsem`` — one entry point with subcommands.

Replaces the reference's run-the-script workflow
(``python CLIPLPIPS_REG_training_sweep_example.py`` etc.) with:

* ``score``          — batch-score GT/SR pairs from a CSV or folder pair
  (the serving path; BASELINE config #1/#5);
* ``train-global``   — train a global regressor
  (reference: CLIPLPIPS_REG_training_sweep_example.py);
* ``train-clu``      — train a CLU map model
  (reference: CLU_training_sweep_example.py);
* ``sweep-global`` / ``sweep-clu`` — the reference's wandb grids as
  config products (srsem.train.sweep);
* ``pseudo-c2c``     — caption-pair cosine CSV
  (reference: qwen_caps_embedding_script.py);
* ``folder-metrics`` — SSIM/PSNR/LPIPS metrics.csv per SR folder
  (reference: 1_compute_image_metrics.py).

Every config field is overridable with ``--set path.to.field=value``.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
from typing import Any, Dict, List


def _parse_sets(pairs: List[str]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        try:
            out[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            out[key] = raw
    return out


def _load_param_tree(path: str) -> Dict[str, Any]:
    """Read a flax-msgpack param tree (the ``convert`` subcommand's output)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _with_backbone(variables: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Replace ``variables["params"]["backbone"]`` with a converted
    pretrained tower (``srsem convert``) — the serving-time analogue of the
    reference's ``timm.create_model(..., pretrained=True)``
    (reference: models/global_eval_models.py:315)."""
    if not path:
        return variables
    tree = _load_param_tree(path)
    return {**variables,
            "params": {**variables["params"], "backbone": tree}}


def _maybe_backbone_params(args):
    """--backbone-checkpoint → converted tower param tree (or None)."""
    path = getattr(args, "backbone_checkpoint", None)
    return _load_param_tree(path) if path else None


def cmd_convert(args) -> int:
    """Convert torch pretrained checkpoints to srsem param trees.

    Wraps the parity-tested converters (srsem/utils/convert.py,
    srsem/pseudo/text_embed.py, srsem/eval/lpips.py); output is a flax
    msgpack file consumed by ``--backbone-checkpoint`` / the embedding
    stacks.  Keeps the zero-egress contingency ready: the moment official
    weights are available, ``srsem convert`` + ``eval-global`` reproduces
    the reference README numbers (reference: README.md:98-105)."""
    import jax
    import torch
    from flax import serialization

    from srsem.utils import convert as cv

    def load_sd(path):
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
            sd = sd["model"]
        return sd

    image_size = getattr(args, "image_size", None)
    if image_size is not None and image_size <= 0:
        raise SystemExit(f"--image-size must be positive, got {image_size}")

    sd = load_sd(args.input)
    kind = args.kind
    if kind == "resnet50":
        tree = cv.convert_torch_resnet50(sd)
    elif kind == "resnet50_clip":
        tree = cv.convert_clip_resnet50(
            sd, image_size=image_size if image_size else 224)
    elif kind == "clip_vit":
        tree = cv.convert_clip_vit(sd)
    elif kind == "hf_clip_text":
        tree = cv.convert_hf_clip_text(sd)
    elif kind == "hf_clip_vit":
        tree = cv.convert_hf_clip_vit(sd)
    elif kind == "clip_text":
        tree = cv.convert_clip_text(sd)
    elif kind == "slip":
        tree = cv.convert_slip(sd)
    elif kind == "albef":
        # Full ALBEF retrieval/grounding checkpoint → {"vit",
        # "vision_proj", "text", "text_proj"} trees for AlbefDualEncoder
        # (reference: albef/model_wrapper.py:57-72; pos-embed
        # bicubic-interpolated to the --image-size grid, default 384,
        # at the checkpoint's --patch granularity).
        tree = cv.convert_albef(
            sd, image_size=image_size if image_size else 384,
            patch=getattr(args, "patch", 16))
    elif kind == "albef_fusion":
        # ALBEF text_encoder (cross-attention fusion stack) + itm_head →
        # AlbefFusionEncoder params; accepts the full retrieval checkpoint
        # (itm_head picked up from the same dict when present).
        from srsem.explain.fusion import convert_albef_fusion

        itm = ({k: v for k, v in sd.items() if k.startswith("itm_head.")}
               or None)
        tree = convert_albef_fusion(sd, itm_sd=itm)
    elif kind == "transalnet":
        # Full TranSalNet-Dense checkpoint → {"params", "batch_stats"}
        # trees for srsem.explain.saliency.TranSalNetDense (reference:
        # additional_approaches/src/transalnet/TranSalNet_Dense.py).
        tree = cv.convert_transalnet(sd)
    elif kind == "minilm":
        from srsem.pseudo.text_embed import convert_hf_minilm

        tree = convert_hf_minilm(sd)
    elif kind == "lpips":
        from srsem.eval.lpips import convert_lpips

        if not args.tower:
            raise SystemExit("--tower (AlexNet/VGG16 feature sd) is "
                             "required for kind=lpips")
        tree = convert_lpips(sd, load_sd(args.tower), net=args.lpips_net)
    elif kind in ("global_head", "clu_decoder"):
        # Reference TRAINED checkpoints (save_model output) → an srsem
        # checkpoint DIRECTORY loadable via --checkpoint on
        # score/score-groups/serve (global_head) and score-maps-groups/
        # serve --with-maps (clu_decoder).  Reference formats:
        # models/global_eval_models.py:419-429 (w_layers state dict),
        # models/local_eval_models.py:160-171 (decoder state dict).
        from srsem.train.checkpoint import save_checkpoint

        if kind == "global_head":
            ckpt = {"trainable": cv.convert_global_head(
                sd, shared=args.shared_head)}
        else:
            dec = cv.convert_clu_decoder(sd)
            ckpt = {"trainable": dec["params"],
                    "batch_stats": dec["batch_stats"]}
        path = save_checkpoint(args.out, 0, ckpt)
        print(json.dumps({"kind": kind, "out": args.out, "ckpt": path,
                          "n_arrays": len(jax.tree.leaves(ckpt))}))
        return 0
    else:
        raise SystemExit(f"unknown kind {kind!r}")
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))
    print(json.dumps({"kind": kind, "out": args.out,
                      "n_arrays": len(jax.tree.leaves(tree))}))
    return 0


def cmd_score(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from srsem.core.config import BackboneConfig, GlobalModelConfig, override
    from srsem.eval.scorer import PairScorer
    from srsem.models.global_models import make_global_model
    from srsem.train.checkpoint import restore_checkpoint

    cfg = override(
        GlobalModelConfig(backbone=BackboneConfig(kind=args.backbone)),
        _parse_sets(args.set))
    model = make_global_model(cfg)
    size = cfg.backbone.image_size
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z)
    variables = _with_backbone(variables, args.backbone_checkpoint)
    if args.checkpoint:
        restored = restore_checkpoint(args.checkpoint)  # raw nested dict
        from srsem.train.partition import merge_params

        variables = {"params": merge_params(
            restored["trainable"], variables["params"])}

    df = pd.read_csv(args.pairs_csv)
    pairs = list(zip(df[args.col_a], df[args.col_b]))
    scorer = PairScorer(cfg, variables, batch_size=args.batch_size,
                        fused_tower=args.fused_tower,
                        fast_jpeg=args.fast_jpeg)
    scores = scorer.score_paths(pairs)
    df["score"] = scores
    df.to_csv(args.out, index=False)
    print(json.dumps({"pairs": len(pairs),
                      "nan": int(np.isnan(scores).sum()),
                      "out": args.out}))
    return 0


def cmd_train_global(args) -> int:
    from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                   TrainConfig, override)
    from srsem.data.datasets import Subset, UserStudyScores, seeded_split
    from srsem.data.loader import Loader
    from srsem.data.preprocess import Preprocess
    from srsem.train.loop import train_global

    cfg = override(
        GlobalModelConfig(backbone=BackboneConfig(kind=args.backbone)),
        _parse_sets(args.set))
    tcfg = override(TrainConfig(checkpoint_dir=args.checkpoint_dir),
                    _parse_sets(args.train_set))
    pre = Preprocess.for_backbone(cfg.backbone.kind, cfg.backbone.image_size)
    ds = UserStudyScores(args.csv, args.root, pre)
    train_idx, val_idx = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
    train_loader = Loader(Subset(ds, train_idx), tcfg.batch_size, shuffle=True,
                          seed=tcfg.seed)
    val_loader = Loader(Subset(ds, val_idx), tcfg.batch_size)
    result = train_global(cfg, tcfg, train_loader, val_loader,
                          backbone_params=_maybe_backbone_params(args))
    print(json.dumps({"val_metrics": result.val_metrics, "steps": result.step}))
    return 0


def cmd_eval_global(args) -> int:
    """SRCC/MSE of a (trained) global regressor against the user-study CSV
    — the reference's README table numbers (reference: README.md:98-105)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srsem.core.config import BackboneConfig, GlobalModelConfig, override
    from srsem.data.datasets import UserStudyScores, seeded_split
    from srsem.data.preprocess import Preprocess
    from srsem.eval.scorer import PairScorer
    from srsem.models.global_models import make_global_model
    from srsem.train.checkpoint import restore_checkpoint
    from srsem.train.metrics import mse, srcc
    from srsem.train.partition import merge_params

    cfg = override(
        GlobalModelConfig(backbone=BackboneConfig(kind=args.backbone)),
        _parse_sets(args.set))
    model = make_global_model(cfg)
    size = cfg.backbone.image_size
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z)
    variables = _with_backbone(variables, args.backbone_checkpoint)
    if args.checkpoint:
        restored = restore_checkpoint(args.checkpoint)
        variables = {"params": merge_params(
            restored["trainable"], variables["params"])}

    pre = Preprocess.for_backbone(cfg.backbone.kind, size)
    ds = UserStudyScores(args.csv, args.root, pre)
    idx = list(range(len(ds)))
    if args.val_only:
        # Evaluate on the held-out 20% of the seeded split (reference
        # convention: split seed 42).
        _, val_idx = seeded_split(len(ds), 0.2, args.seed)
        idx = [int(i) for i in val_idx]
    pairs = [ds.paths(i) for i in idx]
    labels = np.array([ds.label(i) for i in idx])

    scorer = PairScorer(cfg, variables, batch_size=args.batch_size)
    scores = scorer.score_paths(pairs)
    valid = ~np.isnan(scores)
    out = {"n": int(valid.sum()),
           "srcc": srcc(scores[valid], labels[valid]),
           "mse": mse(scores[valid], labels[valid])}
    print(json.dumps(out))
    return 0


def cmd_train_clu(args) -> int:
    from srsem.core.config import (BackboneConfig, LocalModelConfig,
                                   TrainConfig, override)
    from srsem.data.datasets import KoniqPairsMapsDataset, Subset, seeded_split
    from srsem.data.loader import Loader
    from srsem.data.preprocess import Preprocess
    from srsem.train.loop import train_local

    cfg = override(
        LocalModelConfig(backbone=BackboneConfig(kind=args.backbone)),
        _parse_sets(args.set))
    tcfg = override(
        TrainConfig(batch_size=80, epochs=60, checkpoint_dir=args.checkpoint_dir),
        _parse_sets(args.train_set))
    pre = Preprocess.for_backbone(cfg.backbone.kind, cfg.backbone.image_size)
    thresholds = None
    if getattr(args, "thresholds", None):
        thresholds = [None if t.lower() in ("none", "null") else float(t)
                      for t in args.thresholds]
    ds = KoniqPairsMapsDataset(args.csv, pre, only_hq=args.only_hq,
                               imgamincaps=args.min_caps,
                               threshold=tcfg.map_threshold,
                               thresholds=thresholds)
    train_idx, val_idx = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
    train_loader = Loader(Subset(ds, train_idx), tcfg.batch_size, shuffle=True,
                          seed=tcfg.seed)
    val_loader = Loader(Subset(ds, val_idx), tcfg.batch_size)
    if thresholds is not None:
        if args.cached_diffs:
            raise SystemExit("--thresholds and --cached-diffs are separate "
                             "fast paths; pick one")
        # The reference grid's threshold axis in ONE run: one tower+decode
        # stream trains a decoder per binarization point
        # (srsem/train/multisweep.py::train_local_sweep_shared_tower).
        from srsem.train.checkpoint import save_checkpoint
        from srsem.train.multisweep import train_local_sweep_shared_tower

        results = train_local_sweep_shared_tower(
            thresholds, cfg, tcfg, train_loader, val_loader,
            backbone_params=_maybe_backbone_params(args))
        if tcfg.checkpoint_dir:
            for r in results:
                save_checkpoint(
                    os.path.join(tcfg.checkpoint_dir, r["name"]),
                    tcfg.epochs,
                    {"trainable": r["trainable"],
                     "batch_stats": r["batch_stats"]})
        print(json.dumps([{k: r[k] for k in
                           ("name", "train_loss", "val_mse")}
                          for r in results]))
        return 0
    if args.cached_diffs:
        # Decoder-only fast path: the frozen tower runs ONCE over the
        # dataset; epochs train the decoder on the device-resident diff
        # cache (srsem/train/diffcache.py).
        from srsem.train.checkpoint import save_checkpoint
        from srsem.train.diffcache import train_local_cached_diffs

        result = train_local_cached_diffs(
            cfg, tcfg, train_loader, val_loader,
            backbone_params=_maybe_backbone_params(args))
        if tcfg.checkpoint_dir:
            save_checkpoint(tcfg.checkpoint_dir, tcfg.epochs, {
                "trainable": result["trainable"],
                "batch_stats": result["batch_stats"],
            })
        print(json.dumps({"val_metrics": {"mse": result["val_mse"]},
                          "train_loss": result["train_loss"]}))
        return 0
    result = train_local(cfg, tcfg, train_loader, val_loader,
                         backbone_params=_maybe_backbone_params(args))
    print(json.dumps({"val_metrics": result.val_metrics, "steps": result.step}))
    return 0


def cmd_sweep_global(args) -> int:
    if (args.shared_tower or args.cached_diffs or args.cached_stats
            or args.closed_form):
        # Shared-tower: all depth-grid points train on ONE frozen-tower
        # stream per batch (srsem/train/multisweep.py) — ~3x cheaper.
        # Cached-diffs: the tower runs ONCE over the dataset, every epoch
        # trains heads on the device-resident diff cache
        # (srsem/train/diffcache.py) — epochs 2..E at head speed.
        # Cached-stats: like cached-diffs, but only the head's sufficient
        # statistic (per-layer spatial-mean diffs, ~15 KB/pair) is cached
        # (srsem/train/statcache.py) — exact for conv heads, fits the full
        # 10k-pair SR dataset on device.
        from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                       TrainConfig)
        from srsem.data.datasets import Subset, UserStudyScores, seeded_split
        from srsem.data.loader import Loader
        from srsem.data.preprocess import Preprocess
        from srsem.train.multisweep import (depth_grid,
                                            train_global_sweep_shared_tower)

        tcfg = TrainConfig()
        cfg = GlobalModelConfig(
            backbone=BackboneConfig(kind=args.backbone),
            head="stages_cnn", depth=3)
        pre = Preprocess.for_backbone(args.backbone, cfg.backbone.image_size)
        ds = UserStudyScores(args.csv, args.root, pre)
        tr, va = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
        train_loader = Loader(Subset(ds, tr), tcfg.batch_size, shuffle=True,
                              seed=tcfg.seed)
        val_loader = Loader(Subset(ds, va), tcfg.batch_size)
        if args.closed_form:
            # Closed-form: the conv head is linear in its params up to the
            # outer ReLU, so each grid point is ONE ridge solve from the
            # stat cache (srsem/train/statcache.py) — no epochs at all.
            from srsem.train.statcache import solve_global_sweep_closed_form

            results = solve_global_sweep_closed_form(
                depth_grid(), cfg, tcfg, train_loader, val_loader,
                l2=args.l2,
                backbone_params=_maybe_backbone_params(args))
        elif args.cached_stats:
            from srsem.train.statcache import train_global_sweep_cached_stats

            results = train_global_sweep_cached_stats(
                depth_grid(), cfg, tcfg, train_loader, val_loader,
                backbone_params=_maybe_backbone_params(args))
        elif args.cached_diffs:
            from srsem.train.diffcache import train_global_sweep_cached_diffs

            results = train_global_sweep_cached_diffs(
                depth_grid(), cfg, tcfg, train_loader, val_loader,
                backbone_params=_maybe_backbone_params(args))
        else:
            results = train_global_sweep_shared_tower(
                depth_grid(), cfg, tcfg, train_loader, val_loader,
                backbone_params=_maybe_backbone_params(args))
        print(json.dumps([{"name": r["name"], "val_srcc": r["val_srcc"],
                           "val_mse": r["val_mse"]} for r in results]))
        return 0

    from srsem.train.sweep import GLOBAL_SWEEP, make_global_train_fn, run_sweep

    results = run_sweep(
        make_global_train_fn(args.csv, args.root, backbone=args.backbone,
                             backbone_params=_maybe_backbone_params(args)),
        GLOBAL_SWEEP, summary_path=args.summary)
    print(json.dumps([{"name": r["name"],
                       "val_srcc": r.get("srcc"),
                       "val_mse": r.get("mse")} for r in results]))
    return 0


def cmd_sweep_clu(args) -> int:
    from srsem.train.sweep import CLU_SWEEP, run_clu_sweep

    axes = dict(CLU_SWEEP)
    if args.limit_axis:
        # e.g. --limit-axis lora_rank=None restricts an axis for quick runs
        for spec in args.limit_axis:
            key, _, raw = spec.partition("=")
            axes[key] = [ast.literal_eval(raw) if raw != "None" else None]
    results = run_clu_sweep(args.csv, axes, summary_path=args.summary,
                            shared_thresholds=args.shared_thresholds,
                            backbone_params=_maybe_backbone_params(args))
    print(json.dumps({"points": len(results)}))
    return 0


def cmd_pseudo_c2c(args) -> int:
    import os

    import pandas as pd

    from srsem.pseudo.captions import (default_folders, enumerate_pairs,
                                       merge_caption_dicts, parse_caption_file)
    from srsem.pseudo.scoring import score_caption_pairs

    folders = default_folders(args.root)
    listings = {f: sorted(os.listdir(f)) for f in folders if os.path.isdir(f)}
    dicts = [parse_caption_file(os.path.join(f, args.captions_name))
             for f in folders if os.path.isdir(f)]
    captions = merge_caption_dicts(dicts, [f for f in folders if os.path.isdir(f)])
    pairs = enumerate_pairs([f for f in folders if os.path.isdir(f)], listings)

    embedder = _make_embedder(args.embedder)
    cosines = score_caption_pairs(captions, pairs, embedder)
    df = pd.DataFrame(pairs, columns=["img_a_pth", "img_b_pth"])
    df["cosine"] = cosines
    out = args.out or os.path.join(args.root, "wholeim_pairs_cosines.csv")
    df.to_csv(out, index=False)
    print(json.dumps({"pairs": len(pairs), "out": out}))
    return 0


def _make_embedder(kind: str):
    if kind == "hashing":
        from srsem.pseudo.text_embed import HashingTextEmbedder

        return HashingTextEmbedder()
    if kind.startswith("minilm:"):
        # minilm:<torch_ckpt_path>:<tokenizer_dir>
        import torch

        from srsem.pseudo.text_embed import MiniLMEmbedder, convert_hf_minilm

        _, ckpt, tok_dir = kind.split(":", 2)
        from transformers import AutoTokenizer

        params = convert_hf_minilm(torch.load(ckpt, map_location="cpu"))
        tokenizer = AutoTokenizer.from_pretrained(tok_dir)
        return MiniLMEmbedder(params, tokenizer)
    raise ValueError(f"unknown embedder {kind!r}")


def cmd_pseudo_captions(args) -> int:
    """Whole-image captioning over the KonIQ folder layout
    (reference driver: 1_qwen_koniq_captions_run.py:131-144)."""
    import os

    from srsem.pseudo.captions import default_folders
    from srsem.pseudo.vlm import StaticCaptioner, TransformersCaptioner, caption_folder_batch

    if args.backend == "static":
        captioner = StaticCaptioner()
    elif args.backend.startswith("transformers:"):
        captioner = TransformersCaptioner(args.backend.split(":", 1)[1])
    else:
        raise SystemExit(f"unknown captioner backend {args.backend!r}")
    counts = {}
    for folder in default_folders(args.root):
        if os.path.isdir(folder):
            counts[folder] = caption_folder_batch(
                captioner, folder, batch_size=args.batch_size)
    print(json.dumps(counts))
    return 0


def cmd_maps_build(args) -> int:
    """Assemble per-pair cosine maps + filt_refs.csv from panoptic pickles
    and per-region caption files (the reference's missing stage 3 —
    srsem/maps/cosmap.py)."""
    import os
    import pickle

    import pandas as pd

    from srsem.maps.cosmap import read_region_captions, write_cosine_map_dataset
    from srsem.maps.panoptic import panoptic_to_masks

    pairs = pd.read_csv(args.pairs_csv)
    records = []
    for _, row in pairs.iterrows():
        a, b = row["img_a_pth"], row["img_b_pth"]
        stem_a = os.path.splitext(os.path.basename(a))[0]
        stem_b = os.path.splitext(os.path.basename(b))[0]
        pan_dir_a = os.path.join(os.path.dirname(a), "general_panoptic")
        pan_dir_b = os.path.join(os.path.dirname(b), "general_panoptic")
        with open(os.path.join(pan_dir_a, stem_a + ".pkl"), "rb") as f:
            panoptic = pickle.load(f)
        ids = list(panoptic_to_masks(panoptic))
        caps_a = read_region_captions(
            os.path.join(pan_dir_a, stem_a + ".txt"), ids)
        caps_b = read_region_captions(
            os.path.join(pan_dir_b, stem_b + ".txt"), ids)
        records.append((a, b, panoptic, caps_a, caps_b))

    embedder = _make_embedder(args.embedder)
    write_cosine_map_dataset(records, embedder, args.out_dir, args.out_csv)
    print(json.dumps({"pairs": len(records), "csv": args.out_csv}))
    return 0


def cmd_sweep_dataset(args) -> int:
    """Global scores + CLU maps over GT/SR folders with one shared backbone
    pass (BASELINE config #5; srsem/eval/dataset_sweep.py)."""
    import jax
    import jax.numpy as jnp

    from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                   LocalModelConfig)
    from srsem.eval.dataset_sweep import DualScorer
    from srsem.models.global_models import make_global_model
    from srsem.models.local_models import make_local_model

    bb = BackboneConfig(kind=args.backbone)
    gcfg = GlobalModelConfig(backbone=bb, head="stages_cnn", depth=3)
    lcfg = LocalModelConfig(backbone=bb)
    size = bb.image_size
    z = jnp.zeros((1, size, size, 3))
    gvars = make_global_model(gcfg).init(jax.random.PRNGKey(0), z, z)
    lvars = make_local_model(lcfg).init(jax.random.PRNGKey(1), z, z, train=False)
    scorer = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=args.batch_size,
                        fused_tower=args.fused_tower,
                        fused_decoder=args.fused_decoder,
                        fast_jpeg=args.fast_jpeg)
    summary = {}
    for sr_folder in args.sr_folders:
        df = scorer.score_folders(args.gt_folder, sr_folder)
        out = args.out_template.format(folder=sr_folder.rstrip("/").split("/")[-1])
        df.to_csv(out, index=False)
        summary[sr_folder] = {"pairs": len(df), "out": out}
    print(json.dumps(summary))
    return 0


def cmd_score_groups(args) -> int:
    """Grouped GT-vs-K-SR scoring: one shared GT tower pass per group —
    the fast path for the 10k-pair sweep workload (srsem/eval/grouped.py)."""
    import jax
    import jax.numpy as jnp

    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.eval.grouped import GroupedPairScorer
    from srsem.models.global_models import make_global_model

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind=args.backbone,
                                image_size=args.image_size,
                                compute_dtype=args.dtype),
        head="stages_cnn", depth=args.depth)
    model = make_global_model(cfg)
    size = cfg.backbone.image_size
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z)
    variables = _with_backbone(variables, args.backbone_checkpoint)
    if args.checkpoint:
        from srsem.train.checkpoint import restore_checkpoint
        from srsem.train.partition import merge_params

        restored = restore_checkpoint(args.checkpoint)
        variables = {"params": merge_params(
            restored["trainable"], variables["params"])}
    scorer = GroupedPairScorer(cfg, variables, k=len(args.sr_folders),
                               batch_size=args.batch_size,
                               fused_tower=args.fused_tower,
                               fast_jpeg=args.fast_jpeg)
    df = scorer.score_folder_set(args.gt_folder, args.sr_folders)
    df.to_csv(args.out, index=False)
    print(json.dumps({"groups": len(df), "sr_models": len(args.sr_folders),
                      "out": args.out}))
    return 0


def cmd_score_maps_groups(args) -> int:
    """Grouped GT-vs-K-SR CLU map scoring: one shared GT tower pass per
    group (srsem/eval/grouped.py::GroupedMapScorer)."""
    import jax
    import jax.numpy as jnp

    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.eval.grouped import GroupedMapScorer
    from srsem.models.local_models import make_local_model

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind=args.backbone,
                                image_size=args.image_size,
                                compute_dtype=args.dtype),
        v2=args.v2)
    model = make_local_model(cfg)
    size = cfg.backbone.image_size
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
    variables = _with_backbone(variables, args.backbone_checkpoint)
    if args.checkpoint:
        from srsem.train.checkpoint import restore_checkpoint
        from srsem.train.partition import merge_params

        restored = restore_checkpoint(args.checkpoint)
        variables = {"params": merge_params(
            restored["trainable"], variables["params"]),
            **({"batch_stats": restored["batch_stats"]}
               if "batch_stats" in restored else
               {"batch_stats": variables.get("batch_stats", {})})}
    scorer = GroupedMapScorer(cfg, variables, k=len(args.sr_folders),
                              batch_size=args.batch_size,
                              fused_tower=args.fused_tower,
                              fused_decoder=args.fused_decoder,
                              fast_jpeg=args.fast_jpeg)
    df = scorer.score_folder_set(args.gt_folder, args.sr_folders,
                                 maps_dir=args.maps_dir)
    df.to_csv(args.out, index=False)
    print(json.dumps({"groups": len(df), "sr_models": len(args.sr_folders),
                      "out": args.out, "maps_dir": args.maps_dir}))
    return 0


def cmd_folder_metrics(args) -> int:
    from srsem.eval.folder_metrics import ImageQualityMetrics, run_folder_sweep

    lpips_params = None
    if getattr(args, "lpips_checkpoint", None):
        import torch

        from srsem.eval.lpips import convert_lpips

        lin_sd = torch.load(args.lpips_checkpoint, map_location="cpu")
        tower_sd = (torch.load(args.lpips_tower, map_location="cpu")
                    if args.lpips_tower else None)
        lpips_params = convert_lpips(lin_sd, tower_sd, net=args.lpips_net)
    koniqpp = None
    if getattr(args, "koniqpp_checkpoint", None):
        from srsem.eval.nr_iqa import NrIqaScorer
        from srsem.train.nr_iqa import load_nr_iqa_head

        variables = load_nr_iqa_head(args.koniqpp_checkpoint)
        koniqpp = NrIqaScorer(variables)
    calc = ImageQualityMetrics(batch_size=args.batch_size,
                               lpips_net=args.lpips_net,
                               lpips_params=lpips_params,
                               koniqpp=koniqpp)
    results = run_folder_sweep(args.gt_folder, args.eval_folders, calc)
    print(json.dumps({f: len(df) for f, df in results.items()}))
    return 0


def cmd_train_nr_iqa(args) -> int:
    from pathlib import Path

    import numpy as np

    from srsem.eval.folder_metrics import IMG_EXTENSIONS
    from srsem.train.nr_iqa import train_nr_iqa

    paths = sorted(p for p in Path(args.image_folder).iterdir()
                   if p.suffix.lower() in IMG_EXTENSIONS)
    if args.limit:
        paths = paths[: args.limit]
    from PIL import Image

    imgs = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize(
            (args.image_size, args.image_size), Image.BICUBIC), np.float32)
        / 255.0 for p in paths])
    result = train_nr_iqa(imgs, epochs=args.epochs,
                          batch_size=args.batch_size, lr=args.lr,
                          checkpoint_dir=args.checkpoint_dir)
    print(json.dumps({"images": len(imgs), "steps": len(result.losses),
                      "final_loss": result.losses[-1],
                      "val_mse": result.val_mse}))
    return 0


def cmd_serve(args) -> int:
    """Persistent scoring service (srsem/cli/serve.py)."""
    from srsem.cli.serve import run_serve

    return run_serve(args)


def cmd_info(args) -> int:
    """Deployment diagnostic: versions, host, native decoder, env knobs.

    Headless by default — nothing here creates a JAX device client (on the
    deployment host the default backend is the single axon-relayed TPU,
    one claim at a time), so ``srsem info`` is safe to run next to a live
    ``serve``.  ``--devices`` opts into probing the real backend;
    ``--native`` additionally builds/loads the C++ decoder (compiles the
    shared library on first use).  One JSON object on stdout."""
    import platform

    from importlib import metadata

    def _version(dist: str) -> str:
        try:
            return metadata.version(dist)
        except metadata.PackageNotFoundError:
            return "not-installed"

    import jax  # version attrs only — no backend/client initialization

    import srsem

    out: Dict[str, Any] = {
        "srsem": getattr(srsem, "__version__", _version("srsem")),
        "python": platform.python_version(),
        "platform": platform.platform(),
        "cpu_count": os.cpu_count(),
        "versions": {d: _version(d)
                     for d in ("jaxlib", "flax", "optax", "orbax-checkpoint",
                               "numpy", "torch")},
        "jax": jax.__version__,
        "env": {k: os.environ.get(k)
                for k in ("JAX_PLATFORMS", "XLA_FLAGS",
                          "JAX_COMPILATION_CACHE_DIR", "SRSEM_BENCH_ONLY")
                if k in os.environ},
    }
    # The axon-relay knob decides which backend serve/bench will claim —
    # surface presence + pool size, not the addresses themselves.
    pool = os.environ.get("PALLAS_AXON_POOL_IPS")
    if pool is not None:
        out["env"]["PALLAS_AXON_POOL_IPS"] = (
            f"<set: {len([p for p in pool.split(',') if p.strip()])} addrs>")
    if args.native:
        from srsem import native

        out["native_decoder"] = {"available": native.available(),
                                 "build_error": native.build_error()}
    if args.devices:
        # THIS claims the default backend (the TPU on the serving host).
        devs = jax.devices()
        out["backend"] = {
            "default": jax.default_backend(),
            "device_count": len(devs),
            "devices": [f"{d.platform}:{d.device_kind}" for d in devs],
        }
    print(json.dumps(out))
    return 0


def cmd_saliency(args) -> int:
    """Generate the ``SaliencyMaps/`` .npy tree for an image folder.

    The reference computes TranSalNet saliency maps offline and its
    overlap metrics read them from a parallel SaliencyMaps directory
    (reference: additional_approaches/src/eval_utils/compute_metrics.py:
    130-134; srsem.eval.approaches.load_saliency).  Weights come from
    ``srsem convert --kind transalnet`` — random init is allowed only
    behind ``--random-init`` (shape/smoke runs; random saliency carries
    no signal).  Skip-existing resumable like every srsem folder job."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from srsem.explain.saliency import (TranSalNetDense,
                                        generate_saliency_maps)

    model = TranSalNetDense()
    if args.checkpoint:
        with open(args.checkpoint, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
    elif args.random_init:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.height, args.width, 3)), train=False)
    else:
        raise SystemExit(
            "saliency needs --checkpoint (srsem convert --kind "
            "transalnet) or an explicit --random-init for smoke runs")

    apply_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    n = generate_saliency_maps(apply_fn, variables, args.images, args.out,
                               image_size=(args.height, args.width),
                               geometry=args.geometry,
                               channel_order=args.channel_order)
    print(json.dumps({"images_dir": args.images, "out": args.out,
                      "written": n}))
    return 0


def cmd_visualize(args) -> int:
    """Render scoring artifacts to image files — the reference's notebook
    plotting surface (additional_approaches/src/visual_utils.py:9-219) as a
    CLI over srsem/explain/visual.py.  Kinds:

    * ``overlay`` — blend a fidelity/cosine map (.npy from ``serve``/
      ``score-maps-groups``, or a cosine-map .pkl) onto its image;
    * ``grid``    — tile images (e.g. GT + the K SR outputs) into one PNG;
    * ``heatmap`` — a similarity-matrix .npy/.pkl as an annotated heatmap;
    * ``splice``  — SpLiCE word-weight bars from a {word: weight} JSON
      (``srsem.decompose.splice.weights2words`` output).

    Headless by construction (matplotlib Agg) and device-free: nothing on
    this path imports jax, so the command never claims the TPU behind a
    running serve/bench (the map resize is pure numpy,
    srsem/explain/visual.py:_resize_bilinear_np)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from PIL import Image

    from srsem.explain.visual import (overlay_cam, plot_image_grid,
                                      plot_similarity_heatmap,
                                      plot_splice_weights)

    def _need(name: str) -> None:
        if getattr(args, name.replace("-", "_"), None) in (None, []):
            raise SystemExit(
                f"visualize {args.kind}: --{name} is required")

    def _load01(path: str) -> np.ndarray:
        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0

    def _load_array(path: str) -> np.ndarray:
        """.npy or .pkl → float32 array (maps and similarity matrices are
        emitted in both formats by the pipelines)."""
        if path.endswith(".pkl"):
            import pickle

            with open(path, "rb") as f:
                return np.asarray(pickle.load(f), np.float32)
        if path.endswith(".npy"):
            return np.asarray(np.load(path), np.float32)
        raise SystemExit(f"{path}: unsupported extension (expected .npy "
                         f"or .pkl)")

    def _load_map(path: str) -> np.ndarray:
        m = np.squeeze(_load_array(path))
        if m.ndim != 2:
            raise SystemExit(f"map {path}: expected a 2-D map, got "
                             f"shape {m.shape}")
        lo, hi = float(m.min()), float(m.max())
        if args.normalize:
            return ((m - lo) / (hi - lo) if hi > lo else np.zeros_like(m))
        # Tiny float overshoots (e.g. a sigmoid map saved as 1.0000001)
        # are clipped, not rescaled — a silent min-max remap would change
        # the rendered contrast of an effectively-[0,1] map.
        if -1e-3 <= lo and hi <= 1.0 + 1e-3:
            return np.clip(m, 0.0, 1.0)
        print(f"visualize: map {path} has range [{lo:g}, {hi:g}] — "
              f"min-max rescaling to [0,1] (pass --normalize to silence)",
              file=sys.stderr)
        return ((m - lo) / (hi - lo) if hi > lo else np.zeros_like(m))

    if args.kind == "overlay":
        _need("image"), _need("map")
        arr = overlay_cam(_load01(args.image), _load_map(args.map),
                          alpha=args.alpha)
        Image.fromarray(arr).save(args.out)
    elif args.kind == "grid":
        _need("images")
        fig = plot_image_grid([_load01(p) for p in args.images],
                              titles=args.titles, cols=args.cols)
        fig.savefig(args.out, dpi=150)
        plt.close(fig)
    elif args.kind == "heatmap":
        _need("matrix")
        mat = np.atleast_2d(_load_array(args.matrix))
        ax = plot_similarity_heatmap(mat, labels=args.labels,
                                     title=args.title,
                                     annotate=mat.size <= 400)
        ax.figure.savefig(args.out, dpi=150, bbox_inches="tight")
        plt.close(ax.figure)
    else:  # splice
        _need("json")
        with open(args.json) as f:
            weights = json.load(f)
        items = (list(weights.items()) if isinstance(weights, dict)
                 else [tuple(kv) for kv in weights])
        items.sort(key=lambda kv: -abs(float(kv[1])))
        items = items[: args.top]
        ax = plot_splice_weights([w for w, _ in items],
                                 [float(s) for _, s in items],
                                 title=args.title or "SpLiCE decomposition")
        ax.figure.savefig(args.out, dpi=150, bbox_inches="tight")
        plt.close(ax.figure)
    print(json.dumps({"kind": args.kind, "out": args.out}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="srsem")
    parser.add_argument(
        "--compile-cache", default=None, metavar="DIR",
        help="persistent XLA compilation cache directory (goes BEFORE the "
             "subcommand): repeat invocations of the same serving/training "
             "config skip the 20-40s TPU cold compile. Keyed on HLO + "
             "compile options + jaxlib version — a stale entry is a miss, "
             "never a wrong program.")
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler device trace of the subcommand into "
             "DIR (TensorBoard/XProf format; goes BEFORE the subcommand)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("score", help="batch-score GT/SR pairs from a CSV")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "load into params['backbone']")
    p.add_argument("pairs_csv")
    p.add_argument("--col-a", default="img_a_pth")
    p.add_argument("--col-b", default="img_b_pth")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--checkpoint")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--fused-tower", action="store_true",
                   help="EXPERIMENT: frozen ResNet tower via the Pallas "
                        "bottleneck kernel — measured SLOWER than the "
                        "XLA tower on-chip (BENCH_NOTES.md r3)")
    p.add_argument("--fast-jpeg", action="store_true",
                   help="DCT-scaled JPEG decode (PIL draft semantics): "
                        "decode at the largest M/8 downscale that still "
                        "covers the resize target — big host-decode "
                        "speedup on large SR images, ~LSB-scale pixel "
                        "differences vs the full decode")
    p.add_argument("--out", default="scores.csv")
    p.add_argument("--set", action="append", default=[])
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("train-global")
    p.add_argument("csv")
    p.add_argument("root")
    p.add_argument("--backbone", default="resnet50_clip")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "train the heads on (params['backbone'])")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--train-set", action="append", default=[])
    p.set_defaults(fn=cmd_train_global)

    p = sub.add_parser("eval-global",
                       help="SRCC/MSE vs the user-study labels")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "load into params['backbone']")
    p.add_argument("csv")
    p.add_argument("root")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--checkpoint")
    p.add_argument("--val-only", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--set", action="append", default=[])
    p.set_defaults(fn=cmd_eval_global)

    p = sub.add_parser("train-clu")
    p.add_argument("csv")
    p.add_argument("--backbone", default="resnet50_clip")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "train the decoder on (params['backbone'])")
    p.add_argument("--only-hq", action="store_true")
    p.add_argument("--min-caps", type=int, default=2)
    p.add_argument("--checkpoint-dir")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--train-set", action="append", default=[])
    p.add_argument("--cached-diffs", action="store_true",
                   help="decoder-only fast path: run the frozen tower once "
                        "over the dataset, train epochs on the cached diff "
                        "pyramids (srsem/train/diffcache.py)")
    p.add_argument("--thresholds", nargs="+", metavar="T",
                   help="train the reference grid's whole threshold axis "
                        "in ONE run (e.g. `--thresholds none 0.4 0.9`): one "
                        "tower+decode stream, one decoder per binarization "
                        "point (srsem/train/multisweep.py); checkpoints "
                        "land under checkpoint_dir/threshold-T/")
    p.set_defaults(fn=cmd_train_clu)

    p = sub.add_parser("sweep-global")
    p.add_argument("csv")
    p.add_argument("root")
    p.add_argument("--backbone", default="resnet50_clip")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) shared "
                        "by every grid point")
    p.add_argument("--summary", default="sweep_global.jsonl")
    p.add_argument("--shared-tower", action="store_true",
                   help="train all depth points on one frozen-tower stream")
    p.add_argument("--cached-diffs", action="store_true",
                   help="precompute the frozen tower once; train every "
                        "epoch of every point on the device-resident diff "
                        "cache (srsem/train/diffcache.py)")
    p.add_argument("--cached-stats", action="store_true",
                   help="precompute the frozen tower once and cache only "
                        "the conv head's sufficient statistic (~15 KB/pair; "
                        "exact — srsem/train/statcache.py)")
    p.add_argument("--closed-form", action="store_true",
                   help="solve each grid point exactly instead of training "
                        "it: one ridge solve over the stat cache per point "
                        "(the pre-ReLU least-squares optimum — "
                        "srsem/train/statcache.py)")
    p.add_argument("--l2", type=float, default=1e-6,
                   help="ridge penalty for --closed-form (weights only)")
    p.set_defaults(fn=cmd_sweep_global)

    p = sub.add_parser("sweep-clu")
    p.add_argument("csv")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) shared "
                        "by every frozen-tower grid cell")
    p.add_argument("--summary", default="sweep_clu.jsonl")
    p.add_argument("--limit-axis", action="append", default=[])
    p.add_argument("--shared-thresholds", action="store_true",
                   help="train each frozen-tower cell's whole threshold "
                        "axis in ONE run (shared tower + decode stream, "
                        "one decoder per binarization point — "
                        "srsem/train/sweep.py::run_clu_sweep); LoRA/full "
                        "cells fall back to standalone runs")
    p.set_defaults(fn=cmd_sweep_clu)

    p = sub.add_parser("pseudo-c2c")
    p.add_argument("root")
    p.add_argument("--captions-name", default="wholeim_captions_batch.txt")
    p.add_argument("--embedder", default="hashing")
    p.add_argument("--out")
    p.set_defaults(fn=cmd_pseudo_c2c)

    p = sub.add_parser("folder-metrics")
    p.add_argument("gt_folder")
    p.add_argument("eval_folders", nargs="+")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lpips-net", default="alex", choices=["alex", "vgg"])
    p.add_argument("--lpips-checkpoint", default=None,
                   help="official lpips lin-weights .pth (convert_lpips)")
    p.add_argument("--lpips-tower", default=None,
                   help="torchvision alexnet/vgg16 state dict for the tower")
    p.add_argument("--koniqpp-checkpoint", default=None,
                   help="NR-IQA head checkpoint dir (srsem train-nr-iqa)")
    p.set_defaults(fn=cmd_folder_metrics)

    p = sub.add_parser("train-nr-iqa", help="train the KonIQ++-equivalent "
                       "NR-IQA head on synthetic degradations of a folder")
    p.add_argument("image_folder")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--limit", type=int, default=0,
                   help="cap the number of images (0 = all)")
    p.set_defaults(fn=cmd_train_nr_iqa)

    p = sub.add_parser("pseudo-captions")
    p.add_argument("root")
    p.add_argument("--backend", default="static",
                   help='"static" or "transformers:<model-name>"')
    p.add_argument("--batch-size", type=int, default=10)
    p.set_defaults(fn=cmd_pseudo_captions)

    p = sub.add_parser("maps-build")
    p.add_argument("pairs_csv")
    p.add_argument("--out-dir", default="cosine_maps")
    p.add_argument("--out-csv", default="filt_refs.csv")
    p.add_argument("--embedder", default="hashing")
    p.set_defaults(fn=cmd_maps_build)

    p = sub.add_parser("score-groups", help="score each GT against K SR "
                       "folders with one shared GT tower pass per group")
    p.add_argument("gt_folder")
    p.add_argument("sr_folders", nargs="+")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--checkpoint")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="tower compute dtype — bfloat16 serves fastest; "
                        "float32 for bit-level reproducibility (squared "
                        "tap-diffs of near-identical pairs amplify bf16 "
                        "rounding)")
    p.add_argument("--fused-tower", action="store_true",
                   help="EXPERIMENT: frozen ResNet tower via the "
                        "VMEM-resident Pallas bottleneck kernel "
                        "(srsem/backbones/fused_resnet.py) — measured "
                        "SLOWER than the XLA tower on-chip "
                        "(BENCH_NOTES.md r3)")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "load into params['backbone']")
    p.add_argument("--fast-jpeg", action="store_true",
                   help="DCT-scaled JPEG decode (PIL draft semantics): "
                        "decode at the largest M/8 downscale that still "
                        "covers the resize target — big host-decode "
                        "speedup on large SR images, ~LSB-scale pixel "
                        "differences vs the full decode")
    p.add_argument("--out", default="group_scores.csv")
    p.set_defaults(fn=cmd_score_groups)

    p = sub.add_parser(
        "serve", help="persistent scoring service: JSONL requests over "
        "stdio (or --http PORT) against a once-compiled model — see "
        "srsem/cli/serve.py for the protocol")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--head", default="stages_cnn",
                   choices=["stages_cnn", "wperlay_cnn", "single_lin_vit",
                            "stages_vit", "wperlay_vit"],
                   help="any grouped-scorable head (ViT heads need "
                        "--backbone vit_clip)")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--checkpoint")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "load into params['backbone']")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--group-batch", type=int, default=8,
                   help="fixed device group batch G: requests are padded "
                        "to (G, K) so nothing recompiles at request time "
                        "(G=8 measured fastest on-chip, BENCH_NOTES.md)")
    p.add_argument("--num-workers", type=int, default=16,
                   help="host decode thread pool size")
    p.add_argument("--decode-cache", type=int, default=256,
                   help="decoded-image LRU entries (repeat GTs skip host "
                        "decode — the serving bottleneck; keyed on "
                        "path+mtime; 0 disables)")
    p.add_argument("--linger-ms", type=float, default=None,
                   help="micro-batch collection window: wait up to this "
                        "long for more same-K requests before the device "
                        "call (0 = score whatever is already queued; "
                        "default 0 for stdio, 2ms for the HTTP batcher)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve an embedded HTTP endpoint (POST /, same "
                        "JSON schema) instead of stdio")
    p.add_argument("--fast-jpeg", action="store_true",
                   help="DCT-scaled JPEG decode for large SR outputs")
    p.add_argument("--with-maps", action="store_true",
                   help="also serve CLU fidelity-map requests "
                        '({"maps": true[, "maps_dir": DIR]} in the '
                        "request: map mean/min summaries, full maps as "
                        ".npy under maps_dir)")
    p.add_argument("--clu-backbone", default="resnet50_clip",
                   choices=["resnet50_clip", "resnet50"],
                   help="CLU backbone for --with-maps")
    p.add_argument("--clu-checkpoint", default=None,
                   help="trained CLU decoder checkpoint for --with-maps")
    p.add_argument("--warmup-k", type=int, nargs="*", default=[1],
                   help="compile the (G, K) programs for these K values "
                        "before accepting requests (prints a ready line "
                        "on stderr)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("score-maps-groups", help="CLU fidelity maps for "
                       "each GT against K SR folders with one shared GT "
                       "tower pass per group")
    p.add_argument("gt_folder")
    p.add_argument("sr_folders", nargs="+")
    p.add_argument("--backbone", default="resnet50_clip",
                   choices=["resnet50_clip", "resnet50"])
    p.add_argument("--v2", action="store_true",
                   help="pixel-diff channel variant")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--maps-dir", default=None,
                   help="save full per-pair maps as .npy here")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="tower compute dtype — bfloat16 serves fastest; "
                        "float32 for bit-level reproducibility")
    p.add_argument("--fused-tower", action="store_true",
                   help="EXPERIMENT: frozen ResNet tower via the "
                        "VMEM-resident Pallas bottleneck kernel "
                        "(srsem/backbones/fused_resnet.py) — measured "
                        "SLOWER than the XLA tower on-chip "
                        "(BENCH_NOTES.md r3)")
    p.add_argument("--fused-decoder", action="store_true",
                   help="EXPERIMENT: UNet decoder via the fused Pallas "
                        "level kernels, serving BN folded into conv "
                        "weights (srsem/ops/fused_decoder.py) — measured "
                        "no faster than the XLA decoder on-chip "
                        "(BENCH_NOTES.md r3)")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="converted pretrained tower (srsem convert) to "
                        "load into params['backbone']")
    p.add_argument("--fast-jpeg", action="store_true",
                   help="DCT-scaled JPEG decode (PIL draft semantics): "
                        "decode at the largest M/8 downscale that still "
                        "covers the resize target — big host-decode "
                        "speedup on large SR images, ~LSB-scale pixel "
                        "differences vs the full decode")
    p.add_argument("--out", default="group_map_scores.csv")
    p.set_defaults(fn=cmd_score_maps_groups)

    p = sub.add_parser("convert", help="convert torch pretrained "
                       "checkpoints to srsem param trees (flax msgpack)")
    p.add_argument("input", help="torch .pt/.pth state dict")
    p.add_argument("--kind", required=True,
                   choices=["resnet50", "resnet50_clip", "clip_vit",
                            "hf_clip_text", "hf_clip_vit", "clip_text",
                            "slip", "minilm", "lpips", "transalnet",
                            "albef", "albef_fusion",
                            "global_head", "clu_decoder"])
    p.add_argument("--shared-head", action="store_true",
                   help="for global_head: the checkpoint is the singleLin "
                        "shared ViT head (w_layer Sequential) rather than "
                        "a per-layer w_layers ModuleList")
    p.add_argument("--image-size", type=int, default=None,
                   help="for resnet50_clip: attnpool grid size (default "
                        "224); for albef: the pos-embed target resolution "
                        "(default 384)")
    p.add_argument("--patch", type=int, default=16,
                   help="for albef: the ViT patch size the checkpoint was "
                        "trained with (pos-embed grid = image-size/patch; "
                        "default 16, the reference's deit-base/16)")
    p.add_argument("--tower", default=None,
                   help="for lpips: the AlexNet/VGG16 feature state dict")
    p.add_argument("--lpips-net", default="alex", choices=["alex", "vgg"])
    p.add_argument("--out", default="converted.msgpack")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("saliency", help="write the SaliencyMaps .npy tree "
                       "for an image folder (TranSalNet-Dense; reference "
                       "compute_metrics.py:130-134)")
    p.add_argument("--images", required=True, help="input image folder")
    p.add_argument("--out", required=True, help="output SaliencyMaps dir")
    p.add_argument("--checkpoint", default=None,
                   help="converted TranSalNet msgpack (srsem convert "
                        "--kind transalnet)")
    p.add_argument("--random-init", action="store_true",
                   help="allow random-init weights (smoke/shape runs only)")
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--geometry", choices=("pad", "resize"), default="pad",
                   help="'pad' (default) = reference data_process.py "
                        "aspect-preserving pad + crop-back to source "
                        "resolution; 'resize' = distorting bicubic, maps "
                        "saved at height×width")
    p.add_argument("--channel-order", choices=("bgr", "rgb"), default="bgr",
                   help="'bgr' matches the reference's cv2.imread input "
                        "(upstream TranSalNet checkpoints)")
    p.set_defaults(fn=cmd_saliency)

    p = sub.add_parser("sweep-dataset")
    p.add_argument("gt_folder")
    p.add_argument("sr_folders", nargs="+")
    p.add_argument("--backbone", default="resnet50_clip")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--fused-tower", action="store_true",
                   help="EXPERIMENT: frozen ResNet tower via the Pallas "
                        "bottleneck kernel — measured SLOWER than the "
                        "XLA tower on-chip (BENCH_NOTES.md r3)")
    p.add_argument("--fused-decoder", action="store_true",
                   help="EXPERIMENT: UNet decoder via the fused Pallas "
                        "level kernels (srsem/ops/fused_decoder.py) — "
                        "measured no faster than XLA on-chip "
                        "(BENCH_NOTES.md r3)")
    p.add_argument("--fast-jpeg", action="store_true",
                   help="DCT-scaled JPEG decode (PIL draft semantics): "
                        "decode at the largest M/8 downscale that still "
                        "covers the resize target — big host-decode "
                        "speedup on large SR images, ~LSB-scale pixel "
                        "differences vs the full decode")
    p.add_argument("--out-template", default="scores_{folder}.csv")
    p.set_defaults(fn=cmd_sweep_dataset)

    p = sub.add_parser(
        "info", help="environment diagnostic: versions, host, native "
                     "decoder, env knobs (headless unless --devices)")
    p.add_argument("--devices", action="store_true",
                   help="probe the JAX backend (claims the device — avoid "
                        "next to a live serve on single-chip hosts)")
    p.add_argument("--native", action="store_true",
                   help="build/load the C++ decoder and report its status")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser(
        "visualize",
        help="render artifacts: map overlays, image grids, similarity "
             "heatmaps, SpLiCE weight bars (reference: visual_utils.py)")
    p.add_argument("kind", choices=["overlay", "grid", "heatmap", "splice"])
    p.add_argument("--out", required=True, help="output image path")
    p.add_argument("--image", help="overlay: the image under the map")
    p.add_argument("--map", help="overlay: .npy fidelity map or .pkl "
                                 "cosine map")
    p.add_argument("--alpha", type=float, default=0.5,
                   help="overlay: heatmap blend weight")
    p.add_argument("--normalize", action="store_true",
                   help="overlay: min-max rescale the map to [0,1] "
                        "(automatic when values fall outside [0,1])")
    p.add_argument("--images", nargs="+", help="grid: image paths")
    p.add_argument("--titles", nargs="+", help="grid: per-cell titles")
    p.add_argument("--cols", type=int, default=4)
    p.add_argument("--matrix", help="heatmap: .npy similarity matrix")
    p.add_argument("--labels", nargs="+", help="heatmap: axis labels")
    p.add_argument("--title", default="")
    p.add_argument("--json", help="splice: {word: weight} JSON")
    p.add_argument("--top", type=int, default=20,
                   help="splice: keep the top-N |weight| words")
    p.set_defaults(fn=cmd_visualize)

    args = parser.parse_args(argv)
    if args.compile_cache:
        # Persistent XLA compilation cache (same mechanism as the multichip
        # dryrun's .jax_dryrun_cache): set before any jit compiles so every
        # serving/training program below is cached across invocations.
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if args.profile:
        # Device trace of the whole subcommand for TensorBoard/XProf
        # (srsem/utils/profiling.py) — the reference has no profiling at
        # all (SURVEY.md §5).
        from srsem.utils.profiling import capture_trace

        with capture_trace(args.profile):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
