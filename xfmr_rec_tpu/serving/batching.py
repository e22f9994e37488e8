"""Adaptive request micro-batching for the serving hot path.

The reference serves through BentoML, whose runners coalesce concurrent
requests into batched model calls (adaptive batching) — the property
that makes a GPU/TPU-backed service throughput-efficient under
concurrency. This is the TPU-native equivalent for the stdlib HTTP
stack: concurrent `search_items`-class requests enqueue into a
`MicroBatcher`, a collector thread drains up to `max_batch` requests
(waiting at most `max_wait_ms` after the first), and ONE batched
tokenize -> encode -> exclusion-search dispatch serves them all.

Batch shapes are padded to powers of two so the jit cache sees a
bounded set of shapes regardless of arrival patterns. Per-request
top_k values are served from one search at max(top_k) and sliced.

Opt-in: RecService(engine, micro_batch=...) or engine-level use via
`MicroBatcher(engine).search_items(...)`. Single-request latency adds
at most `max_wait_ms`; concurrent throughput approaches the batched
engine rate instead of batch-1 dispatch rate.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    text: str
    exclude_item_ids: list[int]
    top_k: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Exception | None = None


def _round_up_pow2(value: int, floor: int = 1) -> int:
    value = max(value, floor)
    return 1 << (value - 1).bit_length()


class MicroBatcher:
    """Coalesces concurrent item-search requests into batched dispatches."""

    def __init__(
        self,
        engine,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
    ) -> None:
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: queue.Queue[_Request] = queue.Queue()
        self._closed = False
        # submit/close ordering: any request accepted under the lock is
        # enqueued BEFORE close()'s None sentinel (FIFO), so the worker
        # either serves it or the post-loop drain fails it — an accepted
        # caller can get a shutdown error, but can never hang
        self._submit_lock = threading.Lock()
        # observability: how many device dispatches served how many
        # requests (exported by the service /metrics)
        self.requests_served = 0
        self.batches_dispatched = 0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- public API --------------------------------------------------------
    def search_items(
        self,
        text: str,
        *,
        exclude_item_ids: list[int] | None = None,
        top_k: int,
    ):
        """Blocking per-request call; batched under the hood."""
        request = _Request(text, list(exclude_item_ids or []), top_k)
        with self._submit_lock:
            if self._closed:
                msg = "MicroBatcher is closed"
                raise RuntimeError(msg)
            self._queue.put(request)
        request.done.wait()
        if request.error is not None:
            raise request.error
        return request.result

    def close(self) -> None:
        with self._submit_lock:
            self._closed = True
            self._queue.put(None)  # wake the worker

    # -- worker --------------------------------------------------------
    def _collect(self) -> list[_Request]:
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        end = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = end - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._closed:
            batch = self._collect()
            if not batch:
                continue
            try:
                self._dispatch(batch)
            except Exception as exc:  # noqa: BLE001 — per-batch boundary
                for request in batch:
                    # a request _dispatch already completed holds a
                    # valid result — don't overwrite it with the batch
                    # error another row raised
                    if not request.done.is_set():
                        request.error = exc
                        request.done.set()
        # drain: fail whatever is still queued (accepted-but-unserved
        # requests from the final batches) so no caller hangs forever
        # on done.wait()
        while True:
            try:
                request = self._queue.get_nowait()
            except queue.Empty:
                return
            if request is not None:
                request.error = RuntimeError("MicroBatcher is closed")
                request.done.set()

    def _dispatch(self, batch: list[_Request]) -> None:
        from xfmr_rec_tpu.serving.schemas import ItemCandidate

        engine = self.engine
        texts = [r.text for r in batch]
        k_max = max(r.top_k for r in batch)
        # pow2 padding bounds the jit shape set under arbitrary arrival
        # patterns (padding rows repeat the first request's query)
        width = min(_round_up_pow2(len(batch)), self.max_batch)
        while len(texts) < width:
            texts.append(batch[0].text)
        excl = [r.exclude_item_ids for r in batch]
        excl += [[] for _ in range(width - len(batch))]
        embeds = engine.embed(texts)
        scores, item_ids = engine.index.search(
            embeds, top_k=k_max, exclude_ids=excl
        )
        for row, request in enumerate(batch):
            request.result = [
                ItemCandidate(
                    movie_id=int(item_id),
                    movie_text=str(
                        engine.index.get_id(int(item_id)).get(
                            "movie_text", ""
                        )
                    ),
                    score=float(score),
                )
                for score, item_id in zip(
                    scores[row][: request.top_k],
                    item_ids[row][: request.top_k],
                )
                if int(item_id) != -1
            ]
            request.done.set()
        self.requests_served += len(batch)
        self.batches_dispatched += 1
