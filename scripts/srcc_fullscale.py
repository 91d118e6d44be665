"""Production-scale SRCC rehearsal on the real chip, unsaturated signal.

Round-4 verdict item #1: the 64px CPU rehearsal (tests/test_srcc_rehearsal.py)
proved the ≤0.005 north-star methodology but on a SATURATED planted signal
(both pipelines at SRCC 0.9993, where ranking ties are nearly free).  This
script re-runs the same torch-vs-srsem methodology at the REFERENCE config —
224px, depth 3, batch 5, Adam 1e-4, 30 epochs, 150 pairs split 80/20
(reference: CLIPLPIPS_REG_training_sweep_example.py:107-114,169-175) — with
the planted signal tuned into README's own contested band (reference:
README.md:98-105 reports 0.72–0.78), so mid-range ranking noise dominates
and any Adam/BN/feature drift between the pipelines would actually move the
rank order.

Signal design: each SR blends GT with a permuted image at strength ``alpha``
(the visible distortion), but the regression TARGET is ``alpha`` corrupted
with Gaussian label noise — exactly the user-study situation (human scores
are a noisy monotone function of fidelity).  A perfect alpha-predictor then
tops out at SRCC == spearman(alpha, y) ~= 0.78 (printed as ``ceiling``), so
both pipelines land mid-band and the torch-vs-srsem delta is measured where
ranking is contested, not saturated.

Pipelines (identical batches, converter-identical init, fixed batch order):

* torch — the reference loop's numerics: frozen CLIP-RN50 mirror
  (tests/test_torch_parity.py) + per-stage 1x1-conv heads, Adam 1e-4, MSE.
  The frozen eval-mode tower is deterministic per input, so its per-stage
  squared diffs are precomputed ONCE per pair and the 30 epochs train the
  head on the cached diffs — bit-identical dynamics to the reference's
  recompute-every-step loop (asserted: cached-head forward == full-model
  forward on a probe batch), ~50x less single-core CPU time.
* srsem — the PRODUCT path on the real TPU: srsem.train.loop.run_training
  over a 1-chip mesh, f32 tower (apples-to-apples with torch) and a second
  run with the production bfloat16 tower.

Writes artifacts/srcc_fullscale.json and prints one summary line per run.
Run standalone (claims the TPU): ``python scripts/srcc_fullscale.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SIZE, DEPTH, BATCH, EPOCHS, LR = 224, 3, 5, 30, 1e-4
N_TRAIN, N_VAL = 120, 30          # the reference's 150-pair set, 80/20
LABEL_NOISE = 0.20                # tunes spearman(alpha, y) into ~0.78


def _make_dataset(np_rng, n):
    """(gt, sr, y) with a planted monotone signal + label noise."""
    gts, srs, alphas = [], [], []
    for _ in range(n):
        gt = np_rng.uniform(0, 1, (SIZE, SIZE, 3)).astype(np.float32)
        alpha = np_rng.uniform(0.05, 0.95)
        perm = np_rng.permutation(gt.reshape(-1, 3)).reshape(gt.shape)
        sr = np.clip((1 - alpha) * gt + alpha * perm
                     + 0.02 * np_rng.standard_normal(gt.shape), 0, 1)
        gts.append(gt)
        srs.append(sr.astype(np.float32))
        alphas.append(alpha)
    alphas = np.asarray(alphas, np.float32)
    y = np.clip(alphas + LABEL_NOISE
                * np_rng.standard_normal(n).astype(np.float32), 0, 1)
    return np.stack(gts), np.stack(srs), y, alphas


def _batches(gt, sr, y, batch):
    out = []
    for i in range(0, len(y) - batch + 1, batch):
        sl = slice(i, i + batch)
        out.append((((gt[sl], sr[sl]), y[sl]),
                    np.ones((batch,), np.float32)))
    return out


def main() -> None:
    import torch
    import torch.nn as tnn

    from test_torch_parity import (TorchClipResNet50, TorchStagesCnnHead,
                                   _nchw, _randomize_bn)

    t_start = time.monotonic()

    def mark(msg):
        print(f"srcc_fullscale: [{time.monotonic() - t_start:7.1f}s] {msg}",
              flush=True)

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    np_rng = np.random.default_rng(5)

    from srsem.train.metrics import srcc

    gt_tr, sr_tr, y_tr, a_tr = _make_dataset(np_rng, N_TRAIN)
    gt_va, sr_va, y_va, a_va = _make_dataset(np_rng, N_VAL)
    train_batches = _batches(gt_tr, sr_tr, y_tr, BATCH)
    val_batches = _batches(gt_va, sr_va, y_va, BATCH)
    ceiling = float(srcc(a_va, y_va))
    mark(f"dataset ready: {N_TRAIN}+{N_VAL} pairs @ {SIZE}px, "
         f"signal ceiling (perfect-alpha SRCC) = {ceiling:.4f}")

    # ---- shared init ----------------------------------------------------
    torch.manual_seed(17)
    tbb = TorchClipResNet50(image_size=SIZE).eval()
    _randomize_bn(tbb)
    tmodel = TorchStagesCnnHead(tbb, depth=DEPTH)
    with torch.no_grad():
        for conv in tmodel.w_layers:
            conv.bias.uniform_(0.05, 0.15)  # keep the final ReLU live

    # ---- torch pipeline: cache frozen per-stage diffs, train the head ---
    names = [f"stages.{s}.2.act" for s in range(3 - DEPTH, 4)]

    def stage_diffs(gt, sr):
        """Per-pair squared tap diffs, computed exactly as the reference
        forward does (frozen no_grad eval tower -> (a-b)**2 per stage)."""
        out = [[] for _ in names]
        with torch.no_grad():
            for i in range(len(gt)):
                _, ta = tbb(_nchw(gt[i: i + 1]))
                _, tb = tbb(_nchw(sr[i: i + 1]))
                for j, nm in enumerate(names):
                    out[j].append((ta[nm] - tb[nm]) ** 2)
        return [torch.cat(x) for x in out]

    diffs_tr = stage_diffs(gt_tr, sr_tr)
    mark("torch: train diffs cached "
         f"({sum(d.numel() for d in diffs_tr) * 4 / 2**20:.0f} MiB)")
    diffs_va = stage_diffs(gt_va, sr_va)
    mark("torch: val diffs cached")

    def head_forward(batch_diffs):
        scores = []
        for conv, d in zip(tmodel.w_layers, batch_diffs):
            scores.append(conv(d).squeeze(1).mean(dim=(-1, -2)))
        return torch.relu(torch.stack(scores).mean(dim=0))

    # Cached-head forward must equal the full reference forward bit-for-bit
    # (same frozen tower, same op order) — this pins the caching shortcut.
    with torch.no_grad():
        probe_full = tmodel(_nchw(gt_tr[:2]), _nchw(sr_tr[:2]))
        probe_cached = head_forward([d[:2] for d in diffs_tr])
    np.testing.assert_allclose(probe_cached.numpy(), probe_full.numpy(),
                               rtol=1e-6, atol=1e-7)
    mark("torch: cached-diff head == full reference forward (probe ok)")

    topt = torch.optim.Adam(tmodel.w_layers.parameters(), lr=LR)
    slices = [slice(i, i + BATCH)
              for i in range(0, N_TRAIN - BATCH + 1, BATCH)]
    for epoch in range(EPOCHS):
        for sl in slices:
            pred = head_forward([d[sl] for d in diffs_tr])
            loss = tnn.functional.mse_loss(
                pred, torch.from_numpy(y_tr[sl]))
            topt.zero_grad()
            loss.backward()
            topt.step()
    with torch.no_grad():
        t_preds = np.concatenate([
            head_forward([d[slice(i, i + BATCH)] for d in diffs_va]).numpy()
            for i in range(0, N_VAL - BATCH + 1, BATCH)])
    srcc_torch = float(srcc(t_preds, y_va[: len(t_preds)]))
    mark(f"torch: trained {EPOCHS} epochs, val SRCC = {srcc_torch:.4f}")

    # ---- srsem pipeline on the real chip --------------------------------
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                   MeshConfig, TrainConfig)
    from srsem.core.meshes import create_mesh
    from srsem.models.global_models import make_global_model
    from srsem.train.loop import run_training
    from srsem.train.partition import trainable_predicate
    from srsem.utils.convert import convert_clip_resnet50

    dev = jax.devices()[0]
    mark(f"jax backend: {jax.default_backend()} ({dev.platform})")
    mesh = create_mesh(1, 1, devices=[dev])

    # Rebuild the PRE-TRAINING shared init: the torch head was trained in
    # place above, so clone the seed-17 model again for the converter.
    torch.manual_seed(17)
    tbb0 = TorchClipResNet50(image_size=SIZE).eval()
    _randomize_bn(tbb0)
    tmodel0 = TorchStagesCnnHead(tbb0, depth=DEPTH)
    with torch.no_grad():
        for conv in tmodel0.w_layers:
            conv.bias.uniform_(0.05, 0.15)
    head_flat = {}
    for j, conv in enumerate(tmodel0.w_layers):
        head_flat[(f"w_layers.{j}", "kernel")] = jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(-1, 1))
        head_flat[(f"w_layers.{j}", "bias")] = jnp.asarray(
            conv.bias.detach().numpy())
    # The re-seeded clone must reproduce the ORIGINAL weights exactly —
    # the tower was never trained, so every tensor must be bit-identical
    # (pins that the RNG consumption order above really was replayed).
    for (pa, va), (pb, vb) in zip(tbb0.state_dict().items(),
                                  tbb.state_dict().items()):
        assert pa == pb and torch.equal(va, vb), f"init clone drift at {pa}"

    variables = {"params": {
        "backbone": convert_clip_resnet50(tbb0.state_dict(), image_size=SIZE),
        "aggregator": traverse_util.unflatten_dict(head_flat)}}

    # run_training donates its variables buffers — keep a HOST copy and
    # stage a fresh device tree per run.
    variables_host = jax.device_get(variables)

    # f32 @ "float32" matmul precision is the parity arm: TPU's default
    # precision runs f32 convs as one bf16 MXU pass, and that tower drift
    # alone moves val SRCC by ~0.005 in the contested band (measured:
    # default-precision f32 delta 0.0053).  The faithful-f32 algorithm is
    # the apples-to-apples against the torch CPU reference; bf16 at
    # default precision is the PRODUCTION mode, reported alongside.
    results = {}
    for tag, dtype, precision in (("f32", "float32", "float32"),
                                  ("bf16", "bfloat16", "default")):
        cfg = GlobalModelConfig(
            backbone=BackboneConfig(kind="resnet50_clip", image_size=SIZE,
                                    compute_dtype=dtype),
            head="stages_cnn", depth=DEPTH)
        tcfg = TrainConfig(lr=LR, batch_size=BATCH, epochs=EPOCHS,
                           mesh=MeshConfig(data_axis=1, model_axis=1),
                           checkpoint_dir=None, log_every=10 ** 6)
        model = make_global_model(cfg)
        mark(f"srsem[{tag}]: training starts (compile included, "
             f"matmul precision={precision})")
        t0 = time.monotonic()
        with jax.default_matmul_precision(precision):
            result = run_training(model, False, train_batches, val_batches,
                                  tcfg, trainable_predicate(enc_ft=False),
                                  mesh=mesh,
                                  variables=jax.tree.map(jnp.asarray,
                                                         variables_host))
        dt = time.monotonic() - t0
        s = float(result.val_metrics["srcc"])
        results[tag] = {"srcc": s, "delta": abs(s - srcc_torch),
                        "precision": precision, "train_seconds": round(dt, 1)}
        mark(f"srsem[{tag}]: val SRCC = {s:.4f} "
             f"(delta vs torch {abs(s - srcc_torch):.4f}, {dt:.0f}s)")

    out = {
        "config": {"size": SIZE, "depth": DEPTH, "batch": BATCH,
                   "epochs": EPOCHS, "lr": LR, "n_train": N_TRAIN,
                   "n_val": N_VAL, "label_noise": LABEL_NOISE},
        "signal_ceiling_srcc": round(ceiling, 4),
        "torch_srcc": round(srcc_torch, 4),
        "srsem": {k: {"srcc": round(v["srcc"], 4),
                      "delta_vs_torch": round(v["delta"], 4),
                      "matmul_precision": v["precision"],
                      "train_seconds": v["train_seconds"]}
                  for k, v in results.items()},
        "backend": jax.default_backend(),
        "north_star_delta": 0.005,
        # The parity criterion is judged on the faithful-f32 arm; the bf16
        # arm documents the production numerics, not the methodology claim.
        "pass": results["f32"]["delta"] <= 0.005,
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "srcc_fullscale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    mark(f"artifact written: {path}")


if __name__ == "__main__":
    main()
