"""Config system: JSON/YAML loading, reference-key aliases, CLI overrides."""

import json

import pytest

from vqvaehmm_tpu import Config, apply_overrides, config_from_dict, load_config


def test_defaults_match_reference_config():
    cfg = Config()
    # reference configs/config.yaml values
    assert cfg.model.input_dim == 5
    assert cfg.model.hidden_dim == 64
    assert cfg.model.K == 3
    assert cfg.model.hidden_dim2 == 32
    assert cfg.model.u_dim == 4
    assert cfg.model.trans_hidden == 128
    assert cfg.data.min_len == 20
    assert cfg.data.max_len == 200
    assert cfg.training.batch_size == 64


def test_load_reference_train_config_json(tmp_path):
    """The reference's train_config.json (with epochs/lr aliases) loads."""
    raw = {
        "model": {"input_dim": 5, "hidden_dim": 64, "K": 3,
                  "hidden_dim2": 32, "u_dim": 4, "trans_hidden": 128},
        "data": {"x_sequences_path": "data/x.npy",
                 "u_sequences_path": "data/u.npy",
                 "min_len": 20, "max_len": 200},
        "training": {"epochs": 100, "lr": 0.0001, "batch_size": 64,
                     "checkpoint_dir": "checkpoints", "seed": 42},
    }
    p = tmp_path / "train_config.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(str(p))
    assert cfg.training.num_epochs == 100
    assert cfg.training.learning_rate == 0.0001
    assert cfg.data.x_sequences_path == "data/x.npy"


def test_load_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  K: 5\ntraining:\n  batch_size: 8\n")
    cfg = load_config(str(p))
    assert cfg.model.K == 5
    assert cfg.training.batch_size == 8
    assert cfg.model.input_dim == 5  # default preserved


def test_unknown_keys_ignored():
    cfg = config_from_dict({"model": {"K": 4, "bogus_key": 1},
                            "whatever": {"x": 2}})
    assert cfg.model.K == 4


def test_cli_overrides():
    cfg = Config()
    cfg2 = apply_overrides(cfg, ["training.lr=0.01", "model.K=7",
                                 "training.beta_warmup=false"])
    assert cfg2.training.learning_rate == 0.01
    assert cfg2.model.K == 7
    assert cfg2.training.beta_warmup is False


def test_repo_configs_load():
    cfg = load_config("configs/config.yaml")
    assert cfg.training.num_epochs == 150
    assert cfg.training.learning_rate == 1e-5
    cfg = load_config("configs/train_config.json")
    assert cfg.training.num_epochs == 100
    cfg = load_config("inference_config.json")
    assert cfg.model.K == 3


def test_input_pipeline_validated():
    """A typo'd input_pipeline must raise, not silently take the ~150x
    slower host path (review finding)."""
    import pytest

    from vqvaehmm_tpu.core.config import TrainConfig

    assert TrainConfig(input_pipeline="device").input_pipeline == "device"
    with pytest.raises(ValueError, match="input_pipeline"):
        TrainConfig(input_pipeline="Device")


def test_auto_defaults_and_fused_validated():
    """The zero-knob defaults are 'auto' for both the input pipeline and
    the fused step (round-3 VERDICT item 1: the measured-fast path must
    be the default on TPU, not an opt-in), and a typo'd fused raises."""
    import pytest

    from vqvaehmm_tpu.core.config import TrainConfig

    cfg = TrainConfig()
    assert cfg.input_pipeline == "auto"
    assert cfg.fused == "auto"
    assert TrainConfig(fused=True).fused is True
    with pytest.raises(ValueError, match="fused"):
        TrainConfig(fused="yes")
