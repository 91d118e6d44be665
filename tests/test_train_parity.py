"""TRAINING-dynamics parity vs torch: Adam semantics + BatchNorm evolution.

Forward numerics and converters are pinned by tests/test_torch_parity.py
and tests/test_convert_trained.py; these tests pin the remaining layer
under the SRCC ≤0.005 north star — that N optimizer steps from the same
init on the same batches produce the same trained model:

* optax.adam vs torch.optim.Adam (bias correction, eps placement) on the
  flagship global head — mirroring ``train_contrastive`` (reference:
  CLIPLPIPS_REG_training_sweep_example.py:48-100, Adam lr 1e-4 + MSELoss),
  driven through the PRODUCT path (srsem.train.steps.build_step_fns).
* Flax-vs-torch BatchNorm training semantics on the CLU decoder —
  normalization with biased batch variance, running_mean update, and
  torch's Bessel-corrected running_var update
  (srsem/ops/batchnorm.py::TorchBatchNorm), mirroring the CLU loop
  (reference: CLU_training_sweep_example.py:25-72).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from srsem.ops.batchnorm import TorchBatchNorm  # noqa: E402


def _cpu1_mesh():
    from srsem.core.meshes import create_mesh

    return create_mesh(data=1, model=1, devices=jax.devices("cpu")[:1])


def test_torch_batchnorm_matches_torch_bn2d(np_rng):
    """N train steps + an eval step: outputs, running_mean AND running_var
    (the Bessel-corrected update flax lacks) all match torch.nn.BatchNorm2d.
    """
    feats = 5
    tbn = tnn.BatchNorm2d(feats, momentum=0.1, eps=1e-5)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
    jbn = TorchBatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5)
    x0 = np_rng.standard_normal((3, 4, 6, feats)).astype(np.float32)
    variables = jbn.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    params = {"scale": jnp.asarray(tbn.weight.detach().numpy()),
              "bias": jnp.asarray(tbn.bias.detach().numpy())}
    stats = variables["batch_stats"]

    tbn.train()
    for step in range(4):
        x = (np_rng.standard_normal((3, 4, 6, feats)) * (1 + step)
             + 0.3 * step).astype(np.float32)
        with torch.no_grad():
            want = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got, upd = jbn.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), mutable=["batch_stats"])
        stats = upd["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(),
                               rtol=1e-6, atol=1e-7)

    tbn.eval()
    xe = np_rng.standard_normal((2, 4, 6, feats)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.from_numpy(xe.transpose(0, 3, 1, 2)))
    jbn_eval = TorchBatchNorm(use_running_average=True, momentum=0.9,
                              epsilon=1e-5)
    got = jbn_eval.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(xe))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_adam_matches_torch_on_linear_regression(np_rng):
    """optax.adam(1e-4) == torch.optim.Adam(lr=1e-4) step for step: same
    bias correction and eps-outside-sqrt placement, pinned on 20 steps of
    least squares where any semantic drift compounds visibly."""
    w0 = np_rng.standard_normal((6, 1)).astype(np.float32)
    x = np_rng.standard_normal((32, 6)).astype(np.float32)
    y = np_rng.standard_normal((32, 1)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-4)
    for _ in range(20):
        loss = ((torch.from_numpy(x) @ tw - torch.from_numpy(y)) ** 2).mean()
        topt.zero_grad()
        loss.backward()
        topt.step()

    tx = optax.adam(1e-4)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    loss_fn = jax.jit(jax.grad(
        lambda w: jnp.mean((jnp.asarray(x) @ w - jnp.asarray(y)) ** 2)))
    for _ in range(20):
        grads = loss_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_global_head_training_matches_torch(np_rng):
    """The reference global train loop (frozen CLIP tower + stages_cnn
    head, Adam 1e-4, MSE — CLIPLPIPS_REG_training_sweep_example.py:48-100)
    vs srsem's jitted product path (build_step_fns + partition): after 5
    steps from identical init on identical batches, the trained head
    params and the post-training predictions agree."""
    from flax import traverse_util

    from test_torch_parity import (TorchClipResNet50, TorchStagesCnnHead,
                                   _nchw, _randomize_bn)

    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.models.global_models import make_global_model
    from srsem.train.partition import partition_params, trainable_predicate
    from srsem.train.steps import build_step_fns
    from srsem.utils.convert import convert_clip_resnet50

    depth, size, bs, n_steps = 2, 64, 4, 5
    torch.manual_seed(11)
    tbb = TorchClipResNet50(image_size=size).eval()
    _randomize_bn(tbb)
    tmodel = TorchStagesCnnHead(tbb, depth=depth)
    with torch.no_grad():
        for conv in tmodel.w_layers:  # keep the final ReLU active
            conv.bias.uniform_(0.05, 0.15)

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=size,
                                compute_dtype="float32"),
        head="stages_cnn", depth=depth)
    jmodel = make_global_model(cfg)
    head_flat = {}
    for j, conv in enumerate(tmodel.w_layers):
        head_flat[(f"w_layers.{j}", "kernel")] = jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(-1, 1))
        head_flat[(f"w_layers.{j}", "bias")] = jnp.asarray(
            conv.bias.detach().numpy())
    params = {"backbone": convert_clip_resnet50(tbb.state_dict(),
                                                image_size=size),
              "aggregator": traverse_util.unflatten_dict(head_flat)}
    trainable, frozen = partition_params(
        params, trainable_predicate(enc_ft=False))
    assert list(trainable) == ["aggregator"]

    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)
    steps = build_step_fns(jmodel, tx, _cpu1_mesh())
    topt = torch.optim.Adam(tmodel.w_layers.parameters(), lr=1e-4)

    batches = []
    for _ in range(n_steps):
        a = np_rng.standard_normal((bs, size, size, 3)).astype(np.float32)
        b = (a + 0.3 * np_rng.standard_normal(a.shape)).astype(np.float32)
        y = np_rng.uniform(0.0, 1.0, (bs,)).astype(np.float32)
        batches.append((a, b, y))

    t_losses = []
    for a, b, y in batches:
        pred = tmodel(_nchw(a), _nchw(b))
        loss = tnn.functional.mse_loss(pred, torch.from_numpy(y))
        topt.zero_grad()
        loss.backward()
        topt.step()
        t_losses.append(float(loss.detach()))

    mask = jnp.ones((bs,), jnp.float32)
    j_losses = []
    batch_stats = {}
    for a, b, y in batches:
        trainable, opt_state, batch_stats, loss = steps.train_step(
            trainable, opt_state, frozen, batch_stats,
            (jnp.asarray(a), jnp.asarray(b)), jnp.asarray(y), mask)
        j_losses.append(float(loss))
    # Tolerance = the FORWARD-noise budget of the randomized-BN CLIP tower
    # (tests/test_torch_parity.py pins its taps at atol 1e-4, embeddings at
    # 1e-3): the frozen-tower features the two heads train on differ at
    # that level, so their losses inherit it.  The tight dynamics pins are
    # test_adam_matches_torch_on_linear_regression (optimizer semantics,
    # rtol 1e-5) and test_clu_decoder_training_matches_torch (BN training
    # + step-0 gradients); this asserts the PRODUCT path (build_step_fns +
    # partition + masked MSE over a frozen tower) wires them like the
    # reference loop — losses must track step for step, not drift.
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-3, atol=1e-5)

    # Trained head params: movement ≤ n_steps·lr per element, and the
    # tap-level forward noise can flip near-zero gradient signs, so the
    # honest ceiling is 2·n_steps·lr (see the CLU test's analysis).
    got = traverse_util.flatten_dict(jax.device_get(trainable["aggregator"]))
    for j, conv in enumerate(tmodel.w_layers):
        np.testing.assert_allclose(
            got[(f"w_layers.{j}", "kernel")][:, 0],
            conv.weight.detach().numpy()[0, :, 0, 0],
            rtol=1e-3, atol=2 * n_steps * 1e-4)
        np.testing.assert_allclose(
            got[(f"w_layers.{j}", "bias")],
            conv.bias.detach().numpy(), rtol=1e-3, atol=2 * n_steps * 1e-4)

    # Post-training predictions on a held-out batch (forward-noise budget).
    a, b, _ = batches[0]
    with torch.no_grad():
        want = tmodel(_nchw(a), _nchw(b)).numpy()
    pred, _ = steps.eval_step(trainable, frozen, batch_stats,
                              (jnp.asarray(a), jnp.asarray(b)),
                              jnp.zeros((bs,)), mask)
    np.testing.assert_allclose(np.asarray(pred), want, rtol=3e-3, atol=1e-3)


def _torch_scaled_clu_decoder(ch, skip):
    """The reference decoder ModuleList (models/local_eval_models.py:38-82)
    with every channel width scaled — same structure, BN placement, and
    kernel sizes, small enough to Adam-train on this host."""
    return tnn.ModuleList([
        tnn.Sequential(tnn.Conv2d(ch[1] + skip[0], ch[0], 3, padding="same"),
                       tnn.BatchNorm2d(ch[0]), tnn.ReLU(),
                       tnn.Conv2d(ch[0], 1, 1, padding="same"), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(ch[2] + skip[1], ch[1], 3, padding="same"),
                       tnn.BatchNorm2d(ch[1]), tnn.ReLU(),
                       tnn.Conv2d(ch[1], ch[1], 3, padding="same"),
                       tnn.BatchNorm2d(ch[1]), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(ch[3] + skip[2], ch[2], 3, padding="same"),
                       tnn.BatchNorm2d(ch[2]), tnn.ReLU(),
                       tnn.Conv2d(ch[2], ch[2], 3, padding="same"),
                       tnn.BatchNorm2d(ch[2]), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(ch[4] + skip[3], ch[3], 3, padding="same"),
                       tnn.BatchNorm2d(ch[3]), tnn.ReLU(),
                       tnn.Conv2d(ch[3], ch[3], 3, padding="same"),
                       tnn.BatchNorm2d(ch[3]), tnn.ReLU()),
        tnn.Sequential(tnn.Conv2d(skip[4], ch[4], 3, padding="same"),
                       tnn.BatchNorm2d(ch[4]), tnn.ReLU(),
                       tnn.Conv2d(ch[4], ch[4], 3, padding="same"),
                       tnn.BatchNorm2d(ch[4]), tnn.ReLU()),
    ])


def _torch_decode(dec, diffs_nhwc):
    """Reference decode loop (models/local_eval_models.py:117-124)."""
    up = tnn.UpsamplingBilinear2d(scale_factor=2)
    t = [torch.from_numpy(d).permute(0, 3, 1, 2) for d in diffs_nhwc]
    h = up(dec[-1](t[-1]))
    for j in range(2, len(t) + 1):
        h = up(dec[-j](torch.cat((t[-j], h), dim=1)))
    return torch.sigmoid(h)[:, 0]


@pytest.mark.slow
def test_clu_decoder_training_matches_torch(np_rng):
    """The CLU train loop's decoder dynamics (reference:
    CLU_training_sweep_example.py:25-72 — Adam 1e-4, MSE against cosine
    maps, train-mode BatchNorm) vs srsem's CluUnet decoder: after 3 Adam
    steps from identical init on identical diff pyramids, trained params,
    BatchNorm batch_stats (running_mean AND Bessel-corrected running_var),
    and eval-mode maps all agree."""
    from flax import traverse_util

    from srsem.models.local_models import CluUnet
    from srsem.train.steps import masked_mse
    from srsem.utils.convert import convert_clu_decoder

    size, n, n_steps = 32, 2, 3
    wm = 0.125  # width_mult: scaled(64,256,512,1024,2048) = ch below
    ch = (8, 32, 64, 128, 256)
    skip = ch  # synthetic diffs reuse the scaled channel plan

    torch.manual_seed(13)
    dec = _torch_scaled_clu_decoder(ch, skip)
    for m in dec.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.1)
    model = CluUnet(backbone_kind="resnet50_clip", image_size=size,
                    compute_dtype=jnp.float32, decoder_dtype=jnp.float32,
                    width_mult=wm)

    def make_diffs():
        return [np_rng.uniform(0, 0.6, (n, size // 2 ** (i + 1),
                                        size // 2 ** (i + 1), c))
                .astype(np.float32) ** 2 for i, c in enumerate(skip)]

    ckpt = convert_clu_decoder(dec.state_dict())
    params = ckpt["params"]
    stats = ckpt["batch_stats"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    mask = jnp.ones((n,), jnp.float32)

    @jax.jit
    def train_step(params, opt_state, stats, diffs, y):
        def loss_fn(p):
            pred, upd = model.apply(
                {"params": p, "batch_stats": stats}, diffs, None, True,
                method=CluUnet.decode_from_diffs, mutable=["batch_stats"])
            return masked_mse(pred, y, mask), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_stats, loss

    dec.train()
    topt = torch.optim.Adam(dec.parameters(), lr=1e-4)
    batches = [(make_diffs(),
                np_rng.uniform(0, 1, (n, size, size)).astype(np.float32))
               for _ in range(n_steps)]

    @jax.jit
    def grad_step(params, stats, diffs, y):
        def loss_fn(p):
            pred, _ = model.apply(
                {"params": p, "batch_stats": stats}, diffs, None, True,
                method=CluUnet.decode_from_diffs, mutable=["batch_stats"])
            return masked_mse(pred, y, mask)

        return jax.grad(loss_fn)(params)

    # Step-0 GRADIENT parity — the tight semantic pin (BN backward through
    # biased batch variance, MSE reduction, decode structure).  Trained
    # PARAMS cannot be pinned this tightly: a conv bias feeding a
    # BatchNorm has mathematically ZERO gradient (BN subtracts the mean),
    # so its fp32 gradient is pure noise whose SIGN torch and XLA disagree
    # on — and Adam's normalized first step turns a sign flip into a
    # full ±lr divergence.  Gradients, by contrast, must agree to fp32
    # accuracy relative to each leaf's own scale.
    import copy

    diffs0, y0 = batches[0]
    dec0 = copy.deepcopy(dec)  # train-mode forward mutates running stats
    pred0 = _torch_decode(dec0, diffs0)
    loss0 = tnn.functional.mse_loss(pred0, torch.from_numpy(y0))
    loss0.backward()
    tg_sd = dict(dec0.state_dict())
    tg_sd.update({nm: p.grad.detach().clone()
                  for nm, p in dec0.named_parameters()})
    want_g = traverse_util.flatten_dict(
        convert_clu_decoder(tg_sd)["params"])
    got_g = traverse_util.flatten_dict(jax.device_get(grad_step(
        params, stats, [jnp.asarray(d) for d in diffs0],
        jnp.asarray(y0))))
    gmax = max(float(np.abs(tg).max()) for tg in want_g.values())
    for key, tg in want_g.items():
        # atol floored by the GLOBAL gradient scale: a zero-gradient leaf
        # (bias before BN) is fp32 noise at ~1e-9 on both sides — its own
        # max is noise, not a scale.
        scale = float(np.abs(tg).max())
        np.testing.assert_allclose(
            got_g[key], tg, rtol=0,
            atol=max(1e-4 * scale, 3e-6 * gmax),
            err_msg=f"grad mismatch at {'/'.join(key)}")

    t_losses = []
    for diffs, y in batches:
        pred = _torch_decode(dec, diffs)
        loss = tnn.functional.mse_loss(pred, torch.from_numpy(y))
        topt.zero_grad()
        loss.backward()
        topt.step()
        t_losses.append(float(loss.detach()))

    j_losses = []
    for diffs, y in batches:
        params, opt_state, stats, loss = train_step(
            params, opt_state, stats, [jnp.asarray(d) for d in diffs],
            jnp.asarray(y))
        j_losses.append(float(loss))
    # Per-step losses are the dynamics pin: step k's loss sees the params
    # AND batch_stats produced by steps 0..k-1, so a momentum / Bessel /
    # bias-correction bug compounds here.
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-4, atol=1e-6)

    # Trained params track torch within the Adam sign-noise ceiling:
    # every element's total movement is ≤ n_steps·lr (Adam's normalized
    # step is ≤ lr), so two runs whose noise-sign elements saturate in
    # opposite directions can differ by at most 2·n_steps·lr.  The
    # semantic weight is carried by the gradient/loss/stats assertions;
    # this one catches gross bugs (lr scaling, update direction).
    want = convert_clu_decoder(dec.state_dict())
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-4, atol=2 * n_steps * 1e-4),
        jax.device_get(params), want["params"])
    # BN running stats: mean/var drift only via the ±lr param noise above
    # feeding later batches' activations — tolerance scales with that.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-3, atol=1e-4),
        jax.device_get(stats), want["batch_stats"])

    # Eval-mode maps (running stats) on held-out diffs.
    dec.eval()
    diffs = make_diffs()
    with torch.no_grad():
        want_map = _torch_decode(dec, diffs).numpy()
    got_map = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(d) for d in diffs], None, False,
        method=CluUnet.decode_from_diffs))
    np.testing.assert_allclose(got_map, want_map, rtol=1e-4, atol=1e-5)
