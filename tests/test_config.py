"""Config loader vs the reference INI files (verbatim compatibility)."""
import pytest

from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig, load_config


def test_load_reference_pems04_conf(reference_path):
    cfg = load_config(f"{reference_path}/configurations/PEMS04_dstagnn.conf")
    assert cfg.data.num_of_vertices == 307
    assert cfg.data.len_input == 12
    assert cfg.training.K == 3
    assert cfg.training.d_model == 512
    assert cfg.training.d_v == 32  # defaults to d_k (train_DSTAGNN_my.py:102)
    assert cfg.training.graph == "AG"
    assert cfg.training.learning_rate == pytest.approx(1e-4)
    assert cfg.num_of_d == 1


def test_missing_graph_key_defaults(reference_path):
    """PEMS03/07/08 confs lack the 'graph' key and crash the reference
    (train_DSTAGNN_my.py:81); we default to 'G'."""
    cfg = load_config(f"{reference_path}/configurations/PEMS08_dstagnn.conf")
    assert cfg.training.graph == "G"
    assert cfg.training.batch_size == 64


def test_gambia_conf_parses_with_unused_keys(reference_path):
    cfg = load_config(f"{reference_path}/configurations/GAMBIA_dstagnn.conf")
    assert cfg.data.num_of_vertices == 2139
    assert cfg.data.len_input == 144
    assert cfg.training.in_channels == 4
    assert cfg.training.nb_block == 2


def test_validation_errors():
    with pytest.raises(ValueError):
        Config(DataConfig(num_of_vertices=0), TrainingConfig()).validate()
    with pytest.raises(ValueError):
        Config(
            DataConfig(num_of_vertices=4, len_input=12),
            TrainingConfig(graph="X"),
        ).validate()
    with pytest.raises(ValueError):
        Config(
            DataConfig(num_of_vertices=4, len_input=3),
            TrainingConfig(),
        ).validate()


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/path.conf")


def test_uppercase_keys_parse(tmp_path):
    """configparser lowercases option names; uppercase fields like K must
    still bind (regression: 'K = 2' silently fell back to the default)."""
    p = tmp_path / "k.conf"
    p.write_text(
        "[Data]\nnum_of_vertices = 4\nlen_input = 12\n"
        "[Training]\nK = 2\nepochs = 1\n"
    )
    cfg = load_config(str(p))
    assert cfg.training.K == 2
