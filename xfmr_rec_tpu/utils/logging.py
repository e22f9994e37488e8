"""Experiment logging: TensorBoard + JSONL + stdout.

Observability parity with the reference's dual TensorBoard + MLflow
loggers (/root/reference/xfmr_rec/lightning.py:358-397): every metric dict
is written to TensorBoard (when tensorboardX is available), an append-only
`metrics.jsonl` (the greppable/MLflow-style record), and the module logger.
Hyperparameters are archived as `config.json` next to the run, like the
reference's config-artifact upload (lightning.py:331-355).
"""

from __future__ import annotations

import json
import logging
import pathlib
import time
from typing import Any

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, log_dir: str | pathlib.Path, run_name: str = "run") -> None:
        self.log_dir = pathlib.Path(log_dir) / run_name
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = (self.log_dir / "metrics.jsonl").open("a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(self.log_dir))
        except ImportError:
            logger.info("tensorboardX unavailable; TB logging disabled")
        # optional MLflow sink, mirroring the reference's dual
        # TensorBoard+MLflow loggers (lightning.py:358-397); active only
        # when mlflow is installed — it is not baked into this image
        self._mlflow = None
        try:
            import mlflow

            mlflow.set_experiment(str(pathlib.Path(log_dir).name))
            # end any run a previous logger left active (multi-Trainer
            # processes, e.g. HPO sweeps, would otherwise hit "run
            # already active" and silently lose every later trial)
            if mlflow.active_run() is not None:
                mlflow.end_run()
            self._mlflow_run = mlflow.start_run(run_name=run_name)
            self._mlflow = mlflow
        except ImportError:
            pass
        except Exception:  # noqa: BLE001 — tracking server issues
            logger.warning("mlflow present but start_run failed", exc_info=True)
        self._start = time.time()

    def log_hyperparams(self, params: dict[str, Any]) -> None:
        (self.log_dir / "config.json").write_text(
            json.dumps(params, indent=2, default=str)
        )
        if self._mlflow is not None:
            # non-dict sections keep the bare section name (a trailing-dot
            # key like 'section.' is rejected by some tracking backends)
            flat = {}
            for section, sub in params.items():
                if isinstance(sub, dict):
                    for key, value in sub.items():
                        flat[f"{section}.{key}"] = value
                else:
                    flat[section] = sub
            self._mlflow.log_params(flat)
            # archive the config like the reference's
            # LoggerSaveConfigCallback (lightning.py:331-355)
            self._mlflow.log_artifact(str(self.log_dir / "config.json"))

    def log_metrics(self, metrics: dict[str, Any], step: int) -> None:
        scalars = {
            key: float(value) for key, value in metrics.items()
        }
        record = {
            "step": step,
            "time": round(time.time() - self._start, 3),
            **scalars,
        }
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(key, value, step)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {k.replace("/", "_"): v for k, v in scalars.items()}, step
            )

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._mlflow is not None:
            self._mlflow.end_run()
