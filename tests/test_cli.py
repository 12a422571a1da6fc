"""CLI end-to-end: prepare_data → train → evaluate on a tiny synthetic set,
through the same ``main()`` entry points a user invokes."""
import numpy as np
import pytest

from dstagnn_drought_tpu.cli import evaluate, prepare_data, train


def test_cli_pipeline(toy_project, capsys):
    root = toy_project
    prepare_data.main(["--config", str(root / "TOY.conf")])
    assert (root / "TOY_r1_d0_w0_dstagnn.npz").exists()

    result = train.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
    ])
    assert result["best_epoch"] >= 0
    out = capsys.readouterr().out
    assert "horizon" in out and "all" in out

    report = evaluate.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
    ])
    assert len(report["per_horizon"]) == 12
    # training on a random-walk toy should at least beat wild predictions
    assert report["overall"]["rmse"] < 50


def test_train_resume_flag(toy_project):
    root = toy_project
    result = train.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
        "--resume", "--epochs", "3",
    ])
    assert result["best_epoch"] >= 0
