"""CLI end-to-end: train → artifact → classify → info (SURVEY.md C15)."""

import os

import numpy as np
import pytest

from bnn_pynq_tpu import cli


def test_info_lists_networks(capsys):
    cli.main(["info"])
    out = capsys.readouterr().out
    assert "cnv-w1a1" in out and "lfc-w1a2" in out


def test_info_plan(capsys):
    cli.main(["info", "cnv-w2a2"])
    out = capsys.readouterr().out
    assert "W2A2" in out and "conv_int8" in out


def test_train_compile_classify_roundtrip(tmp_path, capsys, monkeypatch):
    # tiny synthetic run through the real CLI paths
    monkeypatch.setenv("BNN_DATA_DIR", str(tmp_path / "nodata"))
    out_dir = str(tmp_path / "artifacts")
    cli.main(["train", "sfc-w1a1", "--epochs", "1", "--batch-size", "256",
              "--out", out_dir])
    captured = capsys.readouterr().out
    assert "artifact:" in captured
    artifact = os.path.join(out_dir, "sfc-w1a1.npz")
    assert os.path.exists(artifact)
    assert os.path.exists(os.path.join(out_dir, "sfc-w1a1-checkpoint.npz"))

    # compile from the checkpoint path too
    cli.main(["compile", os.path.join(out_dir, "sfc-w1a1-checkpoint.npz"),
              "--network", "sfc-w1a1", "--out", str(tmp_path / "c2.npz")])
    assert os.path.exists(tmp_path / "c2.npz")

    imgs = np.random.default_rng(0).integers(
        0, 256, size=(3, 28, 28, 1)).astype(np.uint8)
    img_path = str(tmp_path / "imgs.npy")
    np.save(img_path, imgs)
    cli.main(["classify", artifact, img_path, "--runtime", "ref"])
    out = capsys.readouterr().out
    assert "usecPerImage" in out
