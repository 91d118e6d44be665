"""End-to-end pipeline CLI tests: captioning, cosine-map build."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from srsem.cli.main import main
from srsem.pseudo.captions import parse_caption_file


def test_pseudo_captions_static_backend(tmp_path, capsys):
    root = tmp_path / "koniq-10k_sr"
    hq = root / "HQ"
    hq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)).save(
            hq / f"{i}.jpg")
    rc = main(["pseudo-captions", str(root), "--backend", "static"])
    assert rc == 0
    caps = parse_caption_file(str(hq / "wholeim_captions_batch.txt"))
    assert len(caps) == 3
    # Resumable: second run captions nothing new.
    rc = main(["pseudo-captions", str(root), "--backend", "static"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(v == 0 for v in out.values())
    assert len(parse_caption_file(str(hq / "wholeim_captions_batch.txt"))) == 3


def test_maps_build_end_to_end(tmp_path):
    # Two folders with panoptic pickles + region caption txts.
    fa = tmp_path / "HQ"
    fb = tmp_path / "sr_out"
    for f in (fa, fb):
        (f / "general_panoptic").mkdir(parents=True)
    rng = np.random.default_rng(0)
    panoptic = np.zeros((12, 12), np.int64)
    panoptic[:, 6:] = 1

    rows = []
    for i in range(2):
        for folder, name in ((fa, f"{i}.jpg"), (fb, f"{i}.png")):
            Image.fromarray(
                rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)).save(
                folder / name)
            stem = name.split(".")[0]
            with open(folder / "general_panoptic" / f"{stem}.pkl", "wb") as fh:
                pickle.dump(panoptic, fh)
            with open(folder / "general_panoptic" / f"{stem}.txt", "w") as fh:
                fh.write("a sky region\n" if folder is fa
                         else "a cloudy sky region\n")
                fh.write("a grassy field\n")
        rows.append({"img_a_pth": str(fa / f"{i}.jpg"),
                     "img_b_pth": str(fb / f"{i}.png")})
    pairs_csv = tmp_path / "pairs.csv"
    pd.DataFrame(rows).to_csv(pairs_csv, index=False)

    out_dir = str(tmp_path / "cosine_maps")
    out_csv = str(tmp_path / "filt_refs.csv")
    rc = main(["maps-build", str(pairs_csv), "--out-dir", out_dir,
               "--out-csv", out_csv, "--embedder", "hashing"])
    assert rc == 0

    refs = pd.read_csv(out_csv)
    assert len(refs) == 2
    assert (refs["ima_ncaps"] == 2).all()
    with open(refs.iloc[0]["out_paths"], "rb") as fh:
        cosmap = pickle.load(fh)
    assert cosmap.shape == (12, 12)
    # left region: differing captions → cosine < 1; right: identical → ~1
    assert cosmap[0, 0] < 0.999
    assert cosmap[0, 11] == pytest.approx(1.0, abs=1e-5)


@pytest.mark.slow
def test_score_cli_end_to_end(tmp_path, capsys):
    """score subcommand: CSV of pairs → scores.csv with NaN for bad rows."""
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        a = tmp_path / f"a{i}.png"
        b = tmp_path / f"b{i}.jpg"
        arr = rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
        Image.fromarray(arr).save(a)
        Image.fromarray(np.clip(arr + 8, 0, 255).astype(np.uint8)).save(b)
        rows.append({"img_a_pth": str(a), "img_b_pth": str(b)})
    rows.append({"img_a_pth": rows[0]["img_a_pth"],
                 "img_b_pth": str(tmp_path / "missing.png")})
    csv = tmp_path / "pairs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    out = str(tmp_path / "scores.csv")
    rc = main(["score", str(csv), "--backbone", "resnet50",
               "--set", "backbone.image_size=64",
               "--set", "backbone.compute_dtype=float32",
               "--batch-size", "4", "--out", out])
    assert rc == 0
    df = pd.read_csv(out)
    assert len(df) == 4
    assert df["score"].notna().sum() == 3
    assert df["score"][:3].ge(0).all()


@pytest.mark.slow
def test_eval_global_cli(tmp_path, capsys):
    """eval-global: SRCC/MSE vs user-study labels through the CLI."""
    rng = np.random.default_rng(0)
    root = tmp_path / "150_clip+koniq_set"
    (root / "SR").mkdir(parents=True)
    (root / "HQ").mkdir()
    rows = []
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)).save(
            root / "HQ" / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)).save(
            root / "SR" / f"m_{i}.png")
        rows.append({"Super Resolution Image": f"m_{i}.png",
                     "Answer": "Yes" if i % 2 else "No"})
    csv = tmp_path / "study.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    rc = main(["eval-global", str(csv), str(root), "--backbone", "resnet50",
               "--set", "backbone.image_size=64",
               "--set", "backbone.compute_dtype=float32",
               "--batch-size", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 6
    assert np.isfinite(out["mse"])
