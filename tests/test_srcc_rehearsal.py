"""End-to-end SRCC rehearsal: the ≤0.005 north-star methodology, offline.

The reference's headline claim is user-study SRCC of a TRAINED model
(reference: README.md:98-105).  Zero egress blocks the real-weights run,
so this rehearses the full methodology on synthetic data with a planted
monotone fidelity signal:

* dataset — GT textures; each SR candidate blends the GT with a permuted
  image at strength ``alpha`` (+ pixel noise); planted score = alpha (the
  semantic-difference direction the LPIPS-style head measures);
* torch pipeline — the reference train loop verbatim (frozen CLIP-RN50
  mirror + stages_cnn head, Adam 1e-4, MSE —
  CLIPLPIPS_REG_training_sweep_example.py:48-100) + scipy-free SRCC;
* srsem pipeline — the PRODUCT path: srsem.train.loop.train_global over a
  1-device mesh from the converter-identical init, eval via
  srsem.train.loop.evaluate (SRCC from srsem.train.metrics).

Both pipelines train to convergence on identical batches; the test
asserts each learns the planted signal (val SRCC > 0.9) and that the two
SRCCs agree within the 0.005 north star (BASELINE.md).  Measured result
is recorded in BENCH_NOTES.md (round 4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SIZE, DEPTH = 64, 2
N_TRAIN, N_VAL, BATCH, EPOCHS = 40, 16, 8, 30  # reference epochs=30


def _make_dataset(np_rng, n):
    """(gt, sr, score) triples with a monotone planted signal."""
    gts, srs, ys = [], [], []
    for i in range(n):
        gt = np_rng.uniform(0, 1, (SIZE, SIZE, 3)).astype(np.float32)
        alpha = np_rng.uniform(0.05, 0.95)
        perm = np_rng.permutation(gt.reshape(-1, 3)).reshape(gt.shape)
        sr = np.clip((1 - alpha) * gt + alpha * perm
                     + 0.02 * np_rng.standard_normal(gt.shape), 0, 1)
        gts.append(gt)
        srs.append(sr.astype(np.float32))
        ys.append(alpha)
    return (np.stack(gts), np.stack(srs),
            np.asarray(ys, np.float32))


def _batches(gt, sr, y, batch):
    """srsem loader protocol: (((a, b), y), mask) full batches."""
    out = []
    for i in range(0, len(y) - batch + 1, batch):
        sl = slice(i, i + batch)
        out.append((((gt[sl], sr[sl]), y[sl]),
                    np.ones((batch,), np.float32)))
    return out


@pytest.mark.slow
def test_srcc_rehearsal_end_to_end(np_rng):
    from flax import traverse_util

    from test_torch_parity import (TorchClipResNet50, TorchStagesCnnHead,
                                   _nchw, _randomize_bn)

    from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                   MeshConfig, TrainConfig)
    from srsem.core.meshes import create_mesh
    from srsem.train.loop import evaluate, run_training
    from srsem.train.metrics import srcc
    from srsem.train.partition import trainable_predicate
    from srsem.train.steps import build_step_fns
    from srsem.models.global_models import make_global_model
    from srsem.utils.convert import convert_clip_resnet50

    import optax

    # ---- shared data + identical init --------------------------------
    gt_tr, sr_tr, y_tr = _make_dataset(np_rng, N_TRAIN)
    gt_va, sr_va, y_va = _make_dataset(np_rng, N_VAL)
    train_batches = _batches(gt_tr, sr_tr, y_tr, BATCH)
    val_batches = _batches(gt_va, sr_va, y_va, BATCH)

    torch.manual_seed(17)
    tbb = TorchClipResNet50(image_size=SIZE).eval()
    _randomize_bn(tbb)
    tmodel = TorchStagesCnnHead(tbb, depth=DEPTH)
    with torch.no_grad():
        for conv in tmodel.w_layers:
            conv.bias.uniform_(0.05, 0.15)  # keep the final ReLU live

    head_flat = {}
    for j, conv in enumerate(tmodel.w_layers):
        head_flat[(f"w_layers.{j}", "kernel")] = jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(-1, 1))
        head_flat[(f"w_layers.{j}", "bias")] = jnp.asarray(
            conv.bias.detach().numpy())
    variables = {"params": {
        "backbone": convert_clip_resnet50(tbb.state_dict(), image_size=SIZE),
        "aggregator": traverse_util.unflatten_dict(head_flat)}}

    # ---- torch pipeline: the reference loop --------------------------
    topt = torch.optim.Adam(tmodel.w_layers.parameters(), lr=1e-4)
    for _ in range(EPOCHS):
        for ((a, b), y), _mask in train_batches:
            pred = tmodel(_nchw(a), _nchw(b))
            loss = tnn.functional.mse_loss(pred, torch.from_numpy(y))
            topt.zero_grad()
            loss.backward()
            topt.step()
    with torch.no_grad():
        t_preds = np.concatenate([
            tmodel(_nchw(a), _nchw(b)).numpy()
            for ((a, b), _y), _m in val_batches])
    t_targets = np.concatenate([y for ((_ab), y), _m in val_batches])
    srcc_torch = srcc(t_preds, t_targets)

    # ---- srsem pipeline: the product train-global path ---------------
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=SIZE,
                                compute_dtype="float32"),
        head="stages_cnn", depth=DEPTH)
    tcfg = TrainConfig(lr=1e-4, batch_size=BATCH, epochs=EPOCHS,
                       mesh=MeshConfig(data_axis=1, model_axis=1),
                       checkpoint_dir=None, log_every=10 ** 6)
    mesh = create_mesh(1, 1, devices=jax.devices("cpu")[:1])
    model = make_global_model(cfg)
    result = run_training(model, False, train_batches, val_batches, tcfg,
                          trainable_predicate(enc_ft=False), mesh=mesh,
                          variables=variables)
    # evaluate() already computed val SRCC on the final state
    srcc_srsem = result.val_metrics["srcc"]

    # sanity: re-derive through evaluate() to pin the product eval path
    steps = build_step_fns(model, optax.adam(tcfg.lr), mesh,
                           is_map_model=False)
    again = evaluate(steps, result.trainable, result.frozen,
                     result.batch_stats, val_batches, mesh, False)
    assert abs(again["srcc"] - srcc_srsem) < 1e-12

    delta = abs(srcc_srsem - srcc_torch)
    print(f"SRCC rehearsal: torch={srcc_torch:.4f} "
          f"srsem={srcc_srsem:.4f} delta={delta:.4f}")
    # Both pipelines must LEARN the planted monotone signal...
    assert srcc_torch > 0.9, f"torch pipeline failed to learn: {srcc_torch}"
    assert srcc_srsem > 0.9, f"srsem pipeline failed to learn: {srcc_srsem}"
    # ...and agree within the reference-parity north star.
    assert delta <= 0.005, (
        f"SRCC delta {delta:.4f} exceeds the 0.005 north star "
        f"(torch {srcc_torch:.4f} vs srsem {srcc_srsem:.4f})")
