"""Training CLI: fit / validate / test / predict with layered config.

Ergonomics parity with the reference LightningCLI
(/root/reference/xfmr_rec/lightning.py:365-415): subcommands, a YAML
config file, dotted `--model.x / --data.y / --trainer.z` overrides, and
`--print_config` introspection (the reference CI's healthcheck). Backed by
pydantic validation at each boundary (TrainConfig / DataConfig) plus the
TrainerConfig dataclass.

Examples:
    python -m xfmr_rec_tpu.training.cli fit --print_config
    python -m xfmr_rec_tpu.training.cli fit --config run.yaml \\
        --model.train_loss InfomationNoiseContrastiveEstimationLoss \\
        --model.learning_rate 0.001 --data.batch_size 64 \\
        --trainer.max_epochs 2
    python -m xfmr_rec_tpu.training.cli test --ckpt runs/<run>/ckpt/best
    python -m xfmr_rec_tpu.training.cli predict --ckpt ... --user_id 1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from typing import Any

import yaml

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.training.module import TrainConfig
from xfmr_rec_tpu.training.trainer import Trainer, TrainerConfig

logger = logging.getLogger(__name__)

SECTIONS = ("model", "data", "trainer")


def default_config() -> dict[str, dict[str, Any]]:
    return {
        "model": TrainConfig().model_dump(),
        "data": DataConfig().model_dump(),
        "trainer": dataclasses.asdict(TrainerConfig()),
    }


def _coerce(raw: str, current: Any) -> Any:
    """Parse a CLI string against the type of the current default."""
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(float(raw))
    if isinstance(current, float):
        return float(raw)
    if current is None or isinstance(current, (list, dict)):
        try:
            return json.loads(raw)
        except json.JSONDecodeError:
            return raw
    return raw


def parse_overrides(
    config: dict[str, dict[str, Any]], argv: list[str]
) -> dict[str, dict[str, Any]]:
    """Apply `--section.key value` overrides in place."""
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--") or "." not in arg:
            msg = f"unrecognized argument: {arg}"
            raise SystemExit(msg)
        key = arg[2:]
        if "=" in key:
            key, raw = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                msg = f"missing value for {arg}"
                raise SystemExit(msg)
            raw = argv[i + 1]
            i += 2
        section, _, field = key.partition(".")
        if section not in config or field not in config[section]:
            msg = (
                f"unknown option --{key}; valid sections: {SECTIONS}; "
                f"see --print_config"
            )
            raise SystemExit(msg)
        config[section][field] = _coerce(raw, config[section][field])
    return config


def build_trainer(config: dict[str, dict[str, Any]]) -> Trainer:
    return Trainer(
        TrainConfig.model_validate(config["model"]),
        data=RecDataModule(DataConfig.model_validate(config["data"])),
        trainer_config=TrainerConfig(**config["trainer"]),
    )


def main(argv: list[str] | None = None) -> dict[str, float] | None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)

    parser = argparse.ArgumentParser(
        prog="xfmr_rec_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "subcommand", choices=["fit", "validate", "test", "predict"]
    )
    parser.add_argument("--config", help="YAML/JSON config file")
    parser.add_argument(
        "--print_config", action="store_true",
        help="print the resolved config and exit",
    )
    parser.add_argument("--ckpt", help="checkpoint path/name to restore")
    parser.add_argument(
        "--user_id",
        type=int,
        help="(predict) recommend for this one user id; omit to run the "
        "full is_predict cohort to parquet",
    )
    parser.add_argument(
        "--output",
        help="(predict) parquet path for full-cohort predictions "
        "(default <run log dir>/predictions.parquet)",
    )
    parser.add_argument(
        "--save_artifact", help="(fit) write serving artifact here after fit"
    )
    args, rest = parser.parse_known_args(argv)

    config = default_config()
    if args.config:
        with open(args.config) as f:
            loaded = yaml.safe_load(f) or {}
        for section in SECTIONS:
            config[section].update(loaded.get(section, {}))
    parse_overrides(config, rest)

    if args.print_config:
        yaml.safe_dump(config, sys.stdout, sort_keys=False)
        return None

    trainer = build_trainer(config)
    if args.ckpt:
        trainer.restore_checkpoint(args.ckpt)
    else:
        trainer.setup()

    if args.subcommand == "fit":
        metrics = trainer.fit()
        logger.info("final: %s", metrics)
        if args.save_artifact:
            trainer.save(args.save_artifact)
        return metrics
    if args.subcommand == "validate":
        metrics = trainer.validate()
        logger.info("validate: %s", metrics)
        return metrics
    if args.subcommand == "test":
        metrics = trainer.test()
        logger.info("test: %s", metrics)
        return metrics
    # predict: full is_predict cohort to parquet (reference
    # data/lightning.py:469-471), or one user when --user_id is given
    if args.user_id is None:
        output = args.output or str(
            trainer.logger.log_dir / "predictions.parquet"
        )
        frame = trainer.predict(output)
        logger.info("predict: %d users -> %s", len(frame), output)
        return None
    trainer.build_index()
    user_id = args.user_id
    upos_list = [
        i for i, uid in enumerate(trainer.data.user_ids) if uid == user_id
    ]
    if not upos_list:
        msg = f"unknown user_id {user_id}"
        raise SystemExit(msg)
    upos = upos_list[0]
    history = trainer.data._train_items_by_user.get(upos, [])
    exclude = [int(trainer.data.item_ids[p]) for p in history]
    recs = trainer.recommend(
        [trainer.data.user_texts[upos]], exclude_ids=[exclude]
    )[0]
    print(json.dumps(recs, indent=2))
    return None


if __name__ == "__main__":
    main()
