"""CLI: print_config, overrides, fit/test/predict subcommands."""

import json

import pytest
import yaml

from xfmr_rec_tpu.data.prepare import prepare_movielens
from xfmr_rec_tpu.data.synthetic import generate_movielens
from xfmr_rec_tpu.training.cli import default_config, main, parse_overrides

TINY_ARGS = [
    "--model.hidden_size", "32",
    "--model.num_hidden_layers", "1",
    "--model.num_attention_heads", "4",
    "--model.intermediate_size", "32",
    "--model.vocab_size", "500",
    "--model.max_position_embeddings", "32",
    "--model.max_length", "16",
    "--model.compute_dtype", "float32",
    "--data.vocab_size", "500",
    "--data.max_length", "16",
    "--data.batch_size", "8",
    "--trainer.max_steps", "2",
    "--trainer.limit_val_batches", "1",
]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("clidata")
    generate_movielens(
        path, num_users=30, num_movies=80, num_ratings=700, seed=3
    )
    prepare_movielens(str(path), overwrite=True)
    return str(path)


class TestConfig:
    def test_print_config(self, capsys):
        main(["fit", "--print_config"])
        out = yaml.safe_load(capsys.readouterr().out)
        assert out["model"]["train_loss"] == "PairwiseHingeLoss"
        assert out["model"]["hidden_size"] == 32
        assert out["data"]["batch_size"] == 32
        assert out["trainer"]["max_epochs"] == 1

    def test_overrides(self):
        config = default_config()
        parse_overrides(
            config,
            ["--model.learning_rate", "0.01", "--data.batch_size=64",
             "--trainer.max_epochs", "3"],
        )
        assert config["model"]["learning_rate"] == 0.01
        assert config["data"]["batch_size"] == 64
        assert config["trainer"]["max_epochs"] == 3

    def test_unknown_option_rejected(self):
        with pytest.raises(SystemExit):
            parse_overrides(default_config(), ["--model.nonexistent", "1"])

    def test_config_file_layered_with_overrides(self, tmp_path, capsys):
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(yaml.safe_dump({"model": {"sigma": 5.0}}))
        main(["fit", "--config", str(cfg), "--print_config",
              "--model.margin", "0.5"])
        out = yaml.safe_load(capsys.readouterr().out)
        assert out["model"]["sigma"] == 5.0
        assert out["model"]["margin"] == 0.5


class TestSubcommands:
    def test_fit_and_test(self, data_dir, tmp_path):
        metrics = main(
            ["fit", "--data.data_dir", data_dir,
             "--trainer.log_dir", str(tmp_path / "runs"),
             *TINY_ARGS]
        )
        assert "val/RetrievalNormalizedDCG" in metrics

    def test_predict_prints_recommendations(self, data_dir, tmp_path, capsys):
        main(
            ["predict", "--data.data_dir", data_dir, "--user_id", "1",
             "--trainer.log_dir", str(tmp_path / "runs"),
             *TINY_ARGS]
        )
        recs = json.loads(capsys.readouterr().out)
        assert len(recs) == 20  # TOP_K default
        assert {"movie_id", "score"} <= set(recs[0])


class TestSchemaDrivenCoercion:
    """Overrides parse against declared field types, not default-value
    sniffing (VERDICT r2 hygiene: None defaults previously fell back to
    json.loads luck)."""

    def _parse(self, *args):
        from xfmr_rec_tpu.training.cli import default_config, parse_overrides

        return parse_overrides(default_config(), list(args))

    def test_optional_int_parses(self):
        cfg = self._parse("--trainer.max_steps", "100")
        assert cfg["trainer"]["max_steps"] == 100
        assert isinstance(cfg["trainer"]["max_steps"], int)

    def test_optional_union_float_int(self):
        cfg = self._parse("--trainer.limit_train_batches", "0.5")
        assert cfg["trainer"]["limit_train_batches"] == 0.5
        assert isinstance(cfg["trainer"]["limit_train_batches"], float)
        cfg = self._parse("--trainer.limit_train_batches", "7")
        # int member wins for an integral literal
        assert cfg["trainer"]["limit_train_batches"] == 7

    def test_null_maps_to_none(self):
        cfg = self._parse("--trainer.max_time_s", "null")
        assert cfg["trainer"]["max_time_s"] is None
        cfg = self._parse("--data.max_positives", "none")
        assert cfg["data"]["max_positives"] is None

    def test_literal_validated(self):
        cfg = self._parse("--model.compute_dtype", "float32")
        assert cfg["model"]["compute_dtype"] == "float32"
        with pytest.raises(SystemExit, match="not one of"):
            self._parse("--model.compute_dtype", "fp8")

    def test_bool_strict(self):
        cfg = self._parse("--model.use_logq_correction", "true")
        assert cfg["model"]["use_logq_correction"] is True
        with pytest.raises(SystemExit, match="bool"):
            self._parse("--model.use_logq_correction", "maybe")

    def test_optional_float_init_range(self):
        cfg = self._parse("--model.initializer_range", "null")
        assert cfg["model"]["initializer_range"] is None
        cfg = self._parse("--model.initializer_range", "0.05")
        assert cfg["model"]["initializer_range"] == 0.05
