"""CLI smoke tests (argument wiring; heavy paths exercised elsewhere)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from srsem.cli.main import main


def test_cli_requires_subcommand(capsys):
    with pytest.raises(SystemExit):
        main([])


def test_pseudo_c2c_end_to_end(tmp_path):
    """Full C2C pipeline on a synthetic koniq-style tree with the hashing
    embedder — caption files → pair enumeration → cosine CSV
    (reference flow: qwen_caps_embedding_script.py)."""
    from srsem.pseudo.captions import default_folders, write_caption_file

    root = str(tmp_path / "koniq-10k_sr")
    folders = default_folders(root)[:3]  # HQ + 2 SR folders
    rng = np.random.default_rng(0)
    for f in folders:
        os.makedirs(f)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                os.path.join(f, f"{i}.jpg"))
        write_caption_file(
            os.path.join(f, "wholeim_captions_batch.txt"),
            {str(i): f" photo {i} from {os.path.basename(f)}" for i in range(2)},
            append=False)

    out = str(tmp_path / "cosines.csv")
    rc = main(["pseudo-c2c", root, "--embedder", "hashing", "--out", out])
    assert rc == 0
    df = pd.read_csv(out)
    # 3 folders × 2 images HQ-pairs + per-HQ SR×SR combinations C(3,2)=3 ×2
    assert len(df) == 12
    assert df["cosine"].between(-1.0 - 1e-5, 1.0 + 1e-5).all()


def test_folder_metrics_cli(tmp_path):
    rng = np.random.default_rng(1)
    gt = tmp_path / "HQ"
    ev = tmp_path / "sr_out"
    gt.mkdir()
    ev.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.jpg")
        noisy = np.clip(arr + rng.integers(-20, 20, arr.shape), 0, 255)
        Image.fromarray(noisy.astype(np.uint8)).save(ev / f"{i}.png")
    rc = main(["folder-metrics", str(gt), str(ev), "--batch-size", "2"])
    assert rc == 0
    df = pd.read_csv(ev / "metrics.csv")
    assert len(df) == 3
    assert df["SSIM"].notna().all()
    assert (df["SSIM"] < 1.0).all() and (df["SSIM"] > 0.0).all()


def test_score_groups_cli(tmp_path):
    rng = np.random.default_rng(3)
    gt = tmp_path / "HQ"
    gt.mkdir()
    srs = []
    for m in range(2):
        d = tmp_path / f"model{m}"
        d.mkdir()
        srs.append(str(d))
    for i in range(2):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.png")
        for m in range(2):
            Image.fromarray(
                np.clip(arr + rng.integers(-15, 15, arr.shape), 0, 255)
                .astype(np.uint8)).save(tmp_path / f"model{m}" / f"{i}.png")
    out = str(tmp_path / "groups.csv")
    rc = main(["score-groups", str(gt), *srs, "--batch-size", "2",
               "--image-size", "64", "--out", out])
    assert rc == 0
    df = pd.read_csv(out)
    assert len(df) == 2
    assert {"model0", "model1"} <= set(df.columns)

    # --fused-tower plumbing: same folders through the Pallas fused tower
    # (auto-interprets off-TPU) must score within FP-order tolerance.
    # Both runs at --dtype float32: with bf16 towers the squared tap-diffs
    # of near-identical pairs amplify per-conv rounding, so bf16 fused vs
    # bf16 dense legitimately diverge (measured ~45% on ±15-noise pairs);
    # f32 pins the math itself.
    out_d = str(tmp_path / "groups_f32.csv")
    rc = main(["score-groups", str(gt), *srs, "--batch-size", "2",
               "--image-size", "64", "--dtype", "float32", "--out", out_d])
    assert rc == 0
    out_f = str(tmp_path / "groups_fused.csv")
    rc = main(["score-groups", str(gt), *srs, "--batch-size", "2",
               "--image-size", "64", "--dtype", "float32", "--fused-tower",
               "--out", out_f])
    assert rc == 0
    df_d = pd.read_csv(out_d)
    df_f = pd.read_csv(out_f)
    np.testing.assert_allclose(df_f[["model0", "model1"]].to_numpy(),
                               df_d[["model0", "model1"]].to_numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_score_maps_groups_cli(tmp_path):
    rng = np.random.default_rng(4)
    gt = tmp_path / "HQ"
    gt.mkdir()
    srs = []
    for m in range(2):
        d = tmp_path / f"model{m}"
        d.mkdir()
        srs.append(str(d))
    for i in range(2):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.png")
        for m in range(2):
            Image.fromarray(
                np.clip(arr + rng.integers(-15, 15, arr.shape), 0, 255)
                .astype(np.uint8)).save(tmp_path / f"model{m}" / f"{i}.png")
    out = str(tmp_path / "map_groups.csv")
    maps_dir = str(tmp_path / "maps")
    rc = main(["score-maps-groups", str(gt), *srs, "--batch-size", "2",
               "--image-size", "64", "--maps-dir", maps_dir, "--out", out])
    assert rc == 0
    df = pd.read_csv(out)
    assert len(df) == 2
    assert {"model0_map_mean", "model1_map_min"} <= set(df.columns)
    assert df[["model0_map_mean", "model1_map_mean"]].notna().all().all()
    m = np.load(os.path.join(maps_dir, "0__model0.npy"))
    assert m.shape == (64, 64) and np.isfinite(m).all()


@pytest.mark.slow
def test_convert_cli_and_backbone_checkpoint(tmp_path):
    """``srsem convert`` (torch sd → flax msgpack) round-trips numerically,
    and ``score --backbone-checkpoint`` loads the converted tower — the
    ready-to-run path for official pretrained weights (reference:
    models/global_eval_models.py:315 timm pretrained towers)."""
    torch = pytest.importorskip("torch")
    import test_torch_parity as ttp
    from flax import serialization

    from srsem.backbones.resnet import ImageNetResNet50

    tm = ttp.TorchResNet50().eval()
    ttp._randomize_bn(tm)
    pt = str(tmp_path / "rn50.pt")
    torch.save(tm.state_dict(), pt)
    out = str(tmp_path / "rn50.msgpack")
    assert main(["convert", pt, "--kind", "resnet50", "--out", out]) == 0

    with open(out, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    pooled, _ = ImageNetResNet50(dtype=np.float32).apply({"params": params}, x)
    with torch.no_grad():
        t_pooled, _ = tm(ttp._nchw(x))
    np.testing.assert_allclose(np.asarray(pooled), t_pooled.numpy(),
                               rtol=1e-4, atol=1e-4)

    imgs = []
    for i in range(2):
        for side in "ab":
            p = str(tmp_path / f"{i}{side}.png")
            Image.fromarray(rng.integers(0, 256, (64, 64, 3),
                                         dtype=np.uint8)).save(p)
            imgs.append(p)
    csv = str(tmp_path / "pairs.csv")
    pd.DataFrame({"img_a_pth": imgs[::2],
                  "img_b_pth": imgs[1::2]}).to_csv(csv, index=False)
    scores_csv = str(tmp_path / "scores.csv")
    rc = main(["score", csv, "--backbone-checkpoint", out,
               "--set", "backbone.image_size=64",
               "--set", "backbone.compute_dtype=float32",
               "--batch-size", "2", "--out", scores_csv])
    assert rc == 0
    df = pd.read_csv(scores_csv)
    assert np.isfinite(df["score"]).all()


def test_profile_flag_captures_trace(tmp_path):
    """--profile wraps the subcommand in a jax.profiler trace (SURVEY §5:
    the reference has no profiling; srsem/utils/profiling.py)."""
    rng = np.random.default_rng(3)
    csv = tmp_path / "pairs.csv"
    rows = ["img_a_pth,img_b_pth"]
    for i in range(2):
        a = tmp_path / f"g{i}.png"
        b = tmp_path / f"s{i}.png"
        arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(a)
        Image.fromarray(arr).save(b)
        rows.append(f"{a},{b}")
    csv.write_text("\n".join(rows) + "\n")
    trace_dir = tmp_path / "trace"
    out = str(tmp_path / "scores.csv")
    rc = main(["--profile", str(trace_dir),
               "score", str(csv), "--batch-size", "2",
               "--set", "backbone.image_size=48",
               "--set", "backbone.compute_dtype=float32", "--out", out])
    assert rc == 0
    assert any(trace_dir.rglob("*"))  # trace files written


def test_compile_cache_and_fast_jpeg_flags(tmp_path):
    """--compile-cache populates a persistent XLA cache; --fast-jpeg plumbs
    through to the grouped scorer (no-op at these sizes: the JPEG scale
    selector keeps 8/8 when the image is already near the resize target)."""
    rng = np.random.default_rng(9)
    gt = tmp_path / "HQ"
    gt.mkdir()
    d = tmp_path / "model0"
    d.mkdir()
    for i in range(2):
        arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.jpg")
        Image.fromarray(
            np.clip(arr + rng.integers(-15, 15, arr.shape), 0, 255)
            .astype(np.uint8)).save(d / f"{i}.jpg")
    cache = tmp_path / "xla_cache"
    out1 = str(tmp_path / "g1.csv")
    rc = main(["--compile-cache", str(cache),
               "score-groups", str(gt), str(d), "--batch-size", "2",
               "--image-size", "64", "--dtype", "float32",
               "--fast-jpeg", "--out", out1])
    assert rc == 0
    assert any(cache.iterdir())  # compiled programs persisted
    out2 = str(tmp_path / "g2.csv")
    rc = main(["--compile-cache", str(cache),
               "score-groups", str(gt), str(d), "--batch-size", "2",
               "--image-size", "64", "--dtype", "float32", "--out", out2])
    assert rc == 0
    df1 = pd.read_csv(out1)
    df2 = pd.read_csv(out2)
    np.testing.assert_allclose(df1["model0"].to_numpy(),
                               df2["model0"].to_numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_clu_thresholds_cli(tmp_path):
    """`train-clu --thresholds none 0.5`: the threshold axis trained in
    one run — per-point checkpoints land under
    checkpoint_dir/threshold-T/ and restore through the standard loader
    (srsem/train/multisweep.py::train_local_sweep_shared_tower)."""
    import pickle

    rng = np.random.default_rng(6)
    rows = ["img_a_pth,img_b_pth,out_paths,ima_ncaps"]
    for i in range(8):
        a = tmp_path / f"hq_{i}.png"
        b = tmp_path / f"sr_{i}.png"
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(a)
        Image.fromarray(np.clip(arr + rng.integers(-20, 20, arr.shape),
                                0, 255).astype(np.uint8)).save(b)
        pkl = tmp_path / f"map_{i}.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(rng.uniform(size=(32, 32)).astype(np.float32), f)
        rows.append(f"{a},{b},{pkl},4")
    csv = tmp_path / "pairs.csv"
    csv.write_text("\n".join(rows) + "\n")

    ckpt_dir = tmp_path / "ckpts"
    rc = main(["train-clu", str(csv), "--thresholds", "none", "0.5",
               "--checkpoint-dir", str(ckpt_dir),
               "--set", "backbone.image_size=64",
               "--set", "backbone.compute_dtype=float32",
               "--train-set", "epochs=1", "--train-set", "batch_size=8"])
    assert rc == 0

    from srsem.train.checkpoint import restore_checkpoint

    for name in ("threshold-None", "threshold-0.5"):
        restored = restore_checkpoint(str(ckpt_dir / name))
        assert "batch_stats" in restored
        assert "decoder.0" in restored["trainable"]

    # conflicting fast paths rejected
    with pytest.raises(SystemExit):
        main(["train-clu", str(csv), "--thresholds", "none",
              "--cached-diffs"])


def test_visualize_cli(tmp_path):
    """All four `visualize` kinds render files headlessly: map overlay
    (.npy and .pkl, out-of-range maps auto-normalized), image grid,
    similarity heatmap, SpLiCE weight bars; missing per-kind args exit
    with a message (reference surface: visual_utils.py:9-219)."""
    import pickle

    rng = np.random.default_rng(7)
    img = tmp_path / "sr.png"
    Image.fromarray(
        rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(img)

    fmap = tmp_path / "map.npy"
    np.save(fmap, rng.random((8, 12), dtype=np.float32))
    out = tmp_path / "overlay.png"
    assert main(["visualize", "overlay", "--image", str(img),
                 "--map", str(fmap), "--out", str(out)]) == 0
    arr = np.asarray(Image.open(out))
    assert arr.shape == (32, 48, 3)  # map resized onto the image

    # cosine-map pickle with out-of-[0,1] values -> auto min-max rescale
    pmap = tmp_path / "cos.pkl"
    with open(pmap, "wb") as f:
        pickle.dump(rng.normal(size=(1, 8, 12)).astype(np.float32), f)
    out2 = tmp_path / "overlay2.png"
    assert main(["visualize", "overlay", "--image", str(img),
                 "--map", str(pmap), "--out", str(out2)]) == 0

    grid = tmp_path / "grid.png"
    assert main(["visualize", "grid", "--images", str(img), str(img),
                 str(img), "--titles", "GT", "SR-a", "SR-b",
                 "--cols", "3", "--out", str(grid)]) == 0
    assert grid.stat().st_size > 0

    mat = tmp_path / "sim.npy"
    np.save(mat, rng.random((3, 3), dtype=np.float32))
    heat = tmp_path / "heat.png"
    assert main(["visualize", "heatmap", "--matrix", str(mat),
                 "--labels", "a", "b", "c", "--title", "sim",
                 "--out", str(heat)]) == 0
    assert heat.stat().st_size > 0

    wjson = tmp_path / "w.json"
    wjson.write_text(json.dumps({"dog": 0.5, "cat": -0.2, "sky": 0.9}))
    bars = tmp_path / "bars.png"
    assert main(["visualize", "splice", "--json", str(wjson),
                 "--top", "2", "--out", str(bars)]) == 0
    assert bars.stat().st_size > 0

    with pytest.raises(SystemExit):
        main(["visualize", "overlay", "--image", str(img),
              "--out", str(tmp_path / "x.png")])  # --map missing

    # heatmap accepts .pkl matrices too (some reference pipelines pickle
    # their similarity matrices); unknown extensions exit with a message.
    pmat = tmp_path / "sim.pkl"
    with open(pmat, "wb") as f:
        pickle.dump(rng.random((3, 3)).astype(np.float32), f)
    heat2 = tmp_path / "heat2.png"
    assert main(["visualize", "heatmap", "--matrix", str(pmat),
                 "--out", str(heat2)]) == 0
    assert heat2.stat().st_size > 0
    with pytest.raises(SystemExit, match="unsupported extension"):
        main(["visualize", "heatmap", "--matrix", str(tmp_path / "sim.csv"),
              "--out", str(tmp_path / "x.png")])


def test_visualize_map_overshoot_clips_not_rescales(tmp_path, capsys):
    """A map with a tiny float overshoot (max 1.0000001) is CLIPPED to
    [0,1], not silently min-max rescaled — rescaling would remap the whole
    dynamic range and change the rendered contrast; substantially
    out-of-range maps still auto-normalize with a stderr notice."""
    from srsem.explain.visual import overlay_cam

    img = tmp_path / "im.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)

    base = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(8, 8)
    overshoot = base.copy()
    overshoot[-1, -1] = 1.0 + 1e-6
    exact, shot = tmp_path / "exact.npy", tmp_path / "shot.npy"
    np.save(exact, base)
    np.save(shot, overshoot)
    out_a, out_b = tmp_path / "a.png", tmp_path / "b.png"
    assert main(["visualize", "overlay", "--image", str(img),
                 "--map", str(exact), "--out", str(out_a)]) == 0
    assert main(["visualize", "overlay", "--image", str(img),
                 "--map", str(shot), "--out", str(out_b)]) == 0
    np.testing.assert_array_equal(np.asarray(Image.open(out_a)),
                                  np.asarray(Image.open(out_b)))
    assert "rescaling" not in capsys.readouterr().err

    big = tmp_path / "big.npy"
    np.save(big, base * 7.0 - 2.0)
    assert main(["visualize", "overlay", "--image", str(img),
                 "--map", str(big), "--out", str(tmp_path / "c.png")]) == 0
    assert "min-max rescaling" in capsys.readouterr().err
    # Auto-rescale reproduces the in-range render for an affine map.
    want = overlay_cam(np.zeros((8, 8, 3), np.float32), base)
    np.testing.assert_array_equal(np.asarray(Image.open(tmp_path / "c.png")),
                                  want)


def test_visualize_overlay_never_touches_a_device(tmp_path):
    """`visualize` stays device-free end-to-end: the overlay resize is
    pure numpy (srsem/explain/visual.py:_resize_bilinear_np), so the
    plotting CLI can never claim the TPU behind a running serve/bench
    (deployment host: one chip, one claim at a time).  jax itself is
    pre-imported by a site hook in this image, so the contract is "no
    XLA backend initialized", not "jax unimported"."""
    import subprocess
    import sys as _sys

    img = tmp_path / "im.png"
    Image.fromarray(
        np.random.default_rng(0).integers(
            0, 255, (16, 16, 3), dtype=np.uint8)).save(img)
    fmap = tmp_path / "m.npy"
    np.save(fmap, np.random.default_rng(1).random((4, 4),
                                                  dtype=np.float32))
    code = (
        "import sys\n"
        "from srsem.cli.main import main\n"
        f"rc = main(['visualize', 'overlay', '--image', {str(img)!r},"
        f" '--map', {str(fmap)!r}, '--out',"
        f" {str(tmp_path / 'o.png')!r}])\n"
        "assert rc == 0\n"
        "if 'jax' in sys.modules:\n"
        "    import jax._src.xla_bridge as xb\n"
        "    assert not xb._backends, 'visualize initialized a backend'\n"
    )
    r = subprocess.run([_sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_saliency_cli(tmp_path):
    """`srsem saliency` writes the SaliencyMaps .npy tree (reference
    compute_metrics.py:130-134), is skip-existing resumable, and refuses
    to run without weights unless --random-init is explicit."""
    rng = np.random.default_rng(0)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for name in ("a.png", "b.jpg"):
        Image.fromarray(rng.integers(0, 255, (40, 52, 3),
                                     dtype=np.uint8)).save(imgs / name)
    out = tmp_path / "SaliencyMaps"

    with pytest.raises(SystemExit, match="random-init"):
        main(["saliency", "--images", str(imgs), "--out", str(out)])

    rc = main(["saliency", "--images", str(imgs), "--out", str(out),
               "--random-init", "--height", "64", "--width", "64"])
    assert rc == 0
    m = np.load(out / "a.npy")
    # default geometry="pad": the map is cropped back to SOURCE resolution
    # (reference data_process.py:43-80), not saved at height×width
    assert m.shape == (40, 52)
    assert 0.0 <= float(m.min()) and float(m.max()) <= 1.0
    assert (out / "b.npy").exists()

    # resumable: second run writes nothing new
    before = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
    rc = main(["saliency", "--images", str(imgs), "--out", str(out),
               "--random-init", "--height", "64", "--width", "64"])
    assert rc == 0
    assert {p.name: p.stat().st_mtime_ns for p in out.iterdir()} == before


def test_convert_rejects_nonpositive_image_size(tmp_path):
    """--image-size 0/negative is an argument error, not a silent fall
    back to the per-kind default (review r4)."""
    for bad in ("0", "-16"):
        with pytest.raises(SystemExit, match="image-size"):
            main(["convert", str(tmp_path / "missing.pt"), "--kind",
                  "albef", "--image-size", bad,
                  "--out", str(tmp_path / "o.msgpack")])


def test_info_cli(capsys):
    """`srsem info` is headless JSON: versions + host facts, native decoder
    status behind --native, no device probing unless --devices."""
    rc = main(["info", "--native"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["jax"] and out["cpu_count"] >= 1
    assert "flax" in out["versions"] and "jaxlib" in out["versions"]
    assert isinstance(out["native_decoder"]["available"], bool)
    assert "backend" not in out  # headless by default


def test_info_cli_devices(capsys):
    """--devices probes the backend (safe in-suite: conftest pins cpu)."""
    rc = main(["info", "--devices"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["backend"]["default"] == "cpu"
    assert out["backend"]["device_count"] >= 1
