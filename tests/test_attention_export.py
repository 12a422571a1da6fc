"""Attention-map export (the reference's legacy spatial-attention dump,
lib/utils.py:552-589 — stale against its own model there, working here):
Trainer.attention_maps shapes and the evaluate CLI --export-attention files."""
import os

import numpy as np


def test_evaluate_cli_exports_attention(toy_project):
    from dstagnn_drought_tpu.cli import evaluate, prepare_data, train

    root = toy_project
    exp = str(root / "exp_att")
    prepare_data.main(["--config", str(root / "TOY.conf")])
    train.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", exp, "--epochs", "1",
    ])
    evaluate.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", exp,
        "--export-attention", "--attention-sample", "3",
    ])
    run_dirs = [
        os.path.join(exp, "TOY", d) for d in os.listdir(os.path.join(exp, "TOY"))
    ]
    run_dir = run_dirs[0]
    npz = np.load(os.path.join(run_dir, "attention_test.npz"))
    # nb_block=2 blocks, each (K=2, N=12, N=12) raw spatial scores
    assert set(npz.files) == {"block_0", "block_1"}
    assert npz["block_0"].shape == (2, 12, 12)
    assert np.all(np.isfinite(npz["block_0"]))
    csv = np.loadtxt(os.path.join(run_dir, "attention_test.csv"), delimiter=",")
    np.testing.assert_allclose(csv, npz["block_0"][0], rtol=1e-6)
    assert os.path.exists(os.path.join(run_dir, "attention_test.png"))
