"""Concurrent trial execution across device-pinned worker processes.

Capability parity with the reference's Ray Tune driver
(/root/reference/xfmr_rec/ray.py:105-191), which runs trials in
parallel across TorchTrainer workers. Here each trial runs in a worker
*process* pinned to a disjoint device subset via environment variables
set before the worker's first `jax` import:

- cpu platform: every worker gets its own virtual device mesh
  (``--xla_force_host_platform_device_count=K``) — this is how the
  framework's multi-chip story is validated everywhere else, and it
  makes ``--workers 4`` on an 8-core host behave like 4 trial workers
  with 2 devices each.
- tpu platform: workers are pinned to disjoint chip subsets with
  ``TPU_VISIBLE_DEVICES`` + single-process topology bounds (the same
  mechanism Ray's TPU workers use). Worker count clamps to the chips
  actually present (a worker pinned to a missing chip would fail every
  trial), so a single-chip host degenerates to ``workers=1`` — the
  scheduler still works, trials just serialize. Hosts that reach their
  chip through a remote relay (e.g. this bench host's axon proxy) have
  no local libtpu for workers to open: use the sequential loop or cpu
  workers there.

The executor is rung-synchronous: `hpo.tune` dispatches every trial of
one successive-halving rung concurrently, waits, ranks, and promotes —
so results at fixed seeds are identical to the sequential loop (config
proposal happens in the parent; evaluation is per-config
deterministic), only wall-clock changes. Trial failures are data
points, never crashes, matching the sequential loop's contract.

Implementation note: one single-process pool per worker (not one shared
pool) because each worker needs a *different* initializer environment
(its own device subset). Jobs are scheduled onto whichever worker frees
up first.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from concurrent.futures import FIRST_COMPLETED, Future, ProcessPoolExecutor, wait
from typing import Any

logger = logging.getLogger(__name__)


def worker_device_env(
    worker_id: int,
    n_workers: int,
    *,
    platform: str = "cpu",
    devices_per_worker: int = 1,
) -> dict[str, str]:
    """Environment pinning worker `worker_id` to a disjoint device subset.

    Returned vars must be set before the worker process first imports
    jax (the pool initializer does this; trial payloads import jax only
    at execution time, after the initializer has run).
    """
    if platform == "cpu":
        return {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (
                f"--xla_force_host_platform_device_count={devices_per_worker}"
            ),
        }
    if platform == "tpu":
        chips = range(
            worker_id * devices_per_worker,
            (worker_id + 1) * devices_per_worker,
        )
        return {
            "JAX_PLATFORMS": "tpu",
            # pin this process to its chip subset; bounds declare a
            # standalone (non-pod) topology per worker so libtpu does
            # not wait for the other workers to rendezvous.
            "TPU_VISIBLE_DEVICES": ",".join(str(c) for c in chips),
            "TPU_PROCESS_BOUNDS": "1,1,1",
            "TPU_CHIPS_PER_PROCESS_BOUNDS": f"{len(list(chips)) or 1},1,1",
            "ALLOW_MULTIPLE_LIBTPU_LOAD": "1",
        }
    msg = f"unknown platform {platform!r}; expected 'cpu' or 'tpu'"
    raise ValueError(msg)


def _worker_init(env: dict[str, str]) -> None:
    """Pool initializer: pin devices before any jax *backend* init.

    Env vars alone are not enough on hosts whose sitecustomize imports
    jax at interpreter startup (jax reads JAX_PLATFORMS/XLA_FLAGS at
    import/backend-init time). As long as no backend has initialized
    yet — true in a fresh spawn worker — forcing the live config still
    works, mirroring tests/conftest.py.
    """
    os.environ.update(env)
    platform = env.get("JAX_PLATFORMS")
    if platform:
        try:
            import jax

            jax.config.update("jax_platforms", platform)
            if platform == "cpu":
                flags = env.get("XLA_FLAGS", "")
                marker = "--xla_force_host_platform_device_count="
                if marker in flags:
                    count = int(flags.split(marker)[1].split()[0])
                    jax.config.update("jax_num_cpu_devices", count)
        except Exception:  # noqa: BLE001 — env vars already set; best effort
            logger.debug("jax config pinning skipped", exc_info=True)


def _run_trial(
    spec: dict[str, Any], trial_id: int, config: dict[str, Any], resource: float
) -> tuple[dict[str, float], float, int]:
    """Execute one trial in the worker; returns (metrics, seconds, pid).

    Module-level (picklable) and defensive: an exception inside the
    trial returns empty metrics — the parent treats it exactly like the
    sequential loop treats a raising `evaluate`.
    """
    t0 = time.time()
    try:
        evaluate = _evaluator_from_spec(spec, trial_id)
        metrics = dict(evaluate(config, resource))
    except Exception:  # noqa: BLE001 — a failing trial is a data point
        logger.exception("trial %d failed in worker", trial_id)
        metrics = {}
    return metrics, time.time() - t0, os.getpid()


def _evaluator_from_spec(spec: dict[str, Any], trial_id: int):
    """Rebuild the evaluate callable inside the worker process.

    Closures don't pickle, so the parent ships a declarative spec:
    - {"kind": "trainer", base_model/base_data/base_trainer}: the real
      Trainer evaluator (hpo.make_trainer_evaluator). Each trial gets a
      unique run_name so concurrent workers never share a log dir.
    - {"kind": "import", "path": "module:function"}: a module-level
      callable, used by tests and custom objectives.
    """
    kind = spec.get("kind")
    if kind == "trainer":
        from xfmr_rec_tpu.tuning.hpo import make_trainer_evaluator

        base_trainer = dict(spec.get("base_trainer") or {})
        if not base_trainer.get("run_name"):
            base_trainer["run_name"] = f"trial-{trial_id:04d}"
        return make_trainer_evaluator(
            base_model=spec.get("base_model"),
            base_data=spec.get("base_data"),
            base_trainer=base_trainer,
        )
    if kind == "import":
        import importlib

        mod_name, _, fn_name = spec["path"].partition(":")
        return getattr(importlib.import_module(mod_name), fn_name)
    msg = f"unknown evaluator spec kind {kind!r}"
    raise ValueError(msg)


@dataclasses.dataclass
class TrialOutcome:
    metrics: dict[str, float]
    seconds: float
    worker_pid: int


class TrialExecutor:
    """N device-pinned worker processes evaluating trials concurrently.

    Use as a context manager (workers are real OS processes):

        spec = {"kind": "trainer", "base_data": {...}}
        with TrialExecutor(spec, workers=4) as ex:
            result = tune(None, executor=ex, ...)
    """

    def __init__(
        self,
        spec: dict[str, Any],
        *,
        workers: int = 1,
        platform: str = "cpu",
        devices_per_worker: int = 1,
        env_overrides: dict[str, str] | None = None,
    ) -> None:
        if workers < 1:
            msg = f"workers must be >= 1, got {workers}"
            raise ValueError(msg)
        if platform == "tpu":
            # a worker pinned to a chip the host doesn't have would fail
            # every trial it receives (the subprocess can't init jax) —
            # clamp to the chips actually present so a single-chip host
            # degenerates to workers=1 rather than failing half the rung
            import jax

            n_chips = len(jax.devices())
            fit = max(1, n_chips // max(devices_per_worker, 1))
            if workers > fit:
                logger.warning(
                    "clamping workers %d -> %d (%d chip(s) present, "
                    "%d per worker)",
                    workers, fit, n_chips, devices_per_worker,
                )
                workers = fit
        self.spec = spec
        self.workers = workers
        import multiprocessing

        ctx = multiprocessing.get_context("spawn")
        self._pools = []
        for wid in range(workers):
            env = worker_device_env(
                wid, workers, platform=platform,
                devices_per_worker=devices_per_worker,
            )
            env.update(env_overrides or {})
            self._pools.append(
                ProcessPoolExecutor(
                    max_workers=1,
                    mp_context=ctx,
                    initializer=_worker_init,
                    initargs=(env,),
                )
            )

    def run(
        self, jobs: list[tuple[int, dict[str, Any], float]]
    ) -> list[TrialOutcome]:
        """Evaluate (trial_id, config, resource) jobs; results in job order.

        Greedy scheduling: each job goes to the first worker that frees
        up, so a rung larger than the pool keeps every device subset
        busy until the rung drains.
        """
        results: list[TrialOutcome | None] = [None] * len(jobs)
        pending: dict[Future, tuple[int, int]] = {}  # future -> (job_idx, pool)
        free = list(range(len(self._pools)))
        next_job = 0
        while next_job < len(jobs) or pending:
            while free and next_job < len(jobs):
                pool_idx = free.pop()
                trial_id, config, resource = jobs[next_job]
                fut = self._pools[pool_idx].submit(
                    _run_trial, self.spec, trial_id, config, resource
                )
                pending[fut] = (next_job, pool_idx)
                next_job += 1
            if not pending:
                break
            done, _ = wait(pending, return_when=FIRST_COMPLETED)
            for fut in done:
                job_idx, pool_idx = pending.pop(fut)
                free.append(pool_idx)
                try:
                    metrics, seconds, pid = fut.result()
                except Exception:  # noqa: BLE001 — dead worker = failed trial
                    logger.exception(
                        "trial %d worker died", jobs[job_idx][0]
                    )
                    metrics, seconds, pid = {}, 0.0, -1
                results[job_idx] = TrialOutcome(metrics, seconds, pid)
        return [r for r in results if r is not None]

    def shutdown(self) -> None:
        for pool in self._pools:
            pool.shutdown(wait=True, cancel_futures=True)

    def __enter__(self) -> TrialExecutor:
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
