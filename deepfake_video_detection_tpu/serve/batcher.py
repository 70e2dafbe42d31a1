"""Dynamic request micro-batching for serving.

The reference serves strictly one request at a time (gunicorn
``--workers 1 --threads 1``, ``Procfile:1``; a 1-worker executor,
``app.py:125-129``), so its throughput ceiling is one batch-1 forward per
model latency. On TPU the economics invert: a batch-16 forward costs almost
the same wall-clock as batch-1 (the dispatch dominates — docs/performance.md
measures the chip >90 % idle at the single-stream rate), so concurrent
requests should ride ONE device program.

``MicroBatcher`` coalesces concurrent single-item calls into a single
batched call:

* callers block in :meth:`call` until their slice of the batched output is
  ready (plain threads — the WSGI request/job threads already exist);
* items are grouped by ``(fn, shape, dtype)`` so only same-program,
  same-shape work coalesces (XLA needs static shapes);
* a batch launches when ``max_batch`` items are waiting or the oldest item
  has waited ``max_wait_s`` — the classic dynamic-batching window
  (≤ a few ms, invisible next to the ~30 ms device dispatch);
* batches are padded up to a power-of-two bucket by repeating the last item
  so each bucket size compiles exactly once.

TPU-native by design: this is the serving-side analogue of the training
loader's fixed-shape batches — it converts request concurrency into the
large, static-shape device steps the MXU wants.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _bucket(n: int, max_batch: int, multiple: int = 1) -> int:
    """Smallest ``multiple * 2^k`` ≥ n, capped at ``max_batch``.

    ``multiple`` > 1 serves data-parallel inference: every launched batch is
    divisible by the mesh's ``data`` axis so ``in_shardings`` can split it.
    """
    b = max(1, multiple)
    while b < n:
        b *= 2
    return min(b, max_batch)


class _Entry:
    __slots__ = ("item", "event", "result", "error")

    def __init__(self, item: np.ndarray):
        self.item = item
        self.event = threading.Event()
        self.result: Any = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesce concurrent single-item calls into batched device steps.

    ``call(fn, item, out_axes)`` stacks ``item`` with other pending items of
    the same ``fn``/shape/dtype along a new leading axis, invokes
    ``fn(stacked)`` once, and returns this item's slice of each output.
    ``out_axes`` is a tuple with one element per output of ``fn``: the batch
    axis of that output, or ``None`` if the output itself may be ``None`` /
    should be passed through unsliced.
    """

    def __init__(self, max_batch: int = 16, max_wait_s: float = 0.004,
                 bucket_multiple: int = 1):
        self.bucket_multiple = max(1, int(bucket_multiple))
        # cap stays a multiple of bucket_multiple so a full batch still
        # shards evenly over the data axis
        max_batch = max(1, int(max_batch))
        if self.bucket_multiple > 1:
            max_batch = max(self.bucket_multiple,
                            (max_batch // self.bucket_multiple)
                            * self.bucket_multiple)
        self.max_batch = max_batch
        self.max_wait_s = float(max_wait_s)
        self._cond = threading.Condition()
        # key -> (fn, out_axes, first_arrival_ts, [entries])
        self._pending: Dict[Tuple, List] = {}
        self._worker: Optional[threading.Thread] = None
        self._closed = False
        # visible for tests / metrics
        self.batches_run = 0
        self.items_run = 0

    # ------------------------------------------------------------------

    def call(self, fn: Callable[[Any], Tuple], item: Any,
             out_axes: Sequence[Optional[int]]) -> Tuple:
        entry = _Entry(item)
        key = (id(fn), tuple(np.shape(item)), str(np.asarray(item).dtype),
               tuple(out_axes))
        if self._closed:
            # a replaced/shutting-down batcher still serves in-flight
            # callers: run the item as its own (bucket-multiple-padded)
            # batch instead of failing the request
            return self._call_direct(fn, item, tuple(out_axes))
        with self._cond:
            if self._closed:
                return self._call_direct(fn, item, tuple(out_axes))
            if key not in self._pending:
                self._pending[key] = [fn, tuple(out_axes), time.monotonic(),
                                      [entry]]
            else:
                self._pending[key][3].append(entry)
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(target=self._run,
                                                name="microbatcher",
                                                daemon=True)
                self._worker.start()
            self._cond.notify_all()
        entry.event.wait()
        if entry.error is not None:
            raise entry.error
        return entry.result

    def _call_direct(self, fn, item, out_axes):
        b = self.bucket_multiple
        outputs = fn(np.stack([np.asarray(item)] * b))
        if not isinstance(outputs, tuple):
            outputs = (outputs,)
        outputs = tuple(None if o is None else np.asarray(o) for o in outputs)
        return tuple(
            None if out is None else (out if ax is None else _slice(out, ax, 0))
            for out, ax in zip(outputs, out_axes))

    def bucket_sizes(self) -> List[int]:
        """Every distinct padded batch size ``_execute`` can produce —
        the single source of truth for warmup pre-compilation."""
        return sorted({_bucket(n, self.max_batch, self.bucket_multiple)
                       for n in range(1, self.max_batch + 1)})

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()

    # ------------------------------------------------------------------

    def _run(self) -> None:
        while True:
            with self._cond:
                batch = self._take_ready_locked()
                while batch is None:
                    if self._closed and not self._pending:
                        return
                    timeout = self._next_deadline_locked()
                    self._cond.wait(timeout=timeout)
                    batch = self._take_ready_locked()
            fn, out_axes, entries = batch
            self._execute(fn, out_axes, entries)

    def _next_deadline_locked(self) -> Optional[float]:
        if not self._pending:
            return None
        now = time.monotonic()
        soonest = min(v[2] for v in self._pending.values())
        return max(0.0, soonest + self.max_wait_s - now)

    def _take_ready_locked(self):
        """Pop the pending group that is full or past its window, if any."""
        now = time.monotonic()
        best_key = None
        for key, (fn, axes, ts, entries) in self._pending.items():
            if len(entries) >= self.max_batch or \
                    now >= ts + self.max_wait_s or self._closed:
                if best_key is None or \
                        len(entries) > len(self._pending[best_key][3]):
                    best_key = key
        if best_key is None:
            return None
        fn, axes, ts, entries = self._pending.pop(best_key)
        take, rest = entries[:self.max_batch], entries[self.max_batch:]
        if rest:
            # keep the group's original window: overflow entries arrived
            # during it, so under sustained load their queueing latency
            # stays bounded by max_wait_s instead of resetting every burst
            self._pending[best_key] = [fn, axes, ts, rest]
        return fn, axes, take

    def _execute(self, fn, out_axes, entries: List[_Entry]) -> None:
        try:
            n = len(entries)
            b = _bucket(n, self.max_batch, self.bucket_multiple)
            items = [e.item for e in entries]
            items += [items[-1]] * (b - n)  # repeat-pad to the bucket
            stacked = np.stack([np.asarray(x) for x in items])
            outputs = fn(stacked)
            if not isinstance(outputs, tuple):
                outputs = (outputs,)
            # materialize ONCE per batch: slicing device arrays would
            # dispatch (and later fetch) one tiny device op per item per
            # output — measured 4x slower than the serial path through the
            # TPU relay. One host fetch per output amortizes over the batch.
            outputs = tuple(None if o is None else np.asarray(o)
                            for o in outputs)
            self.batches_run += 1
            self.items_run += n
            for i, e in enumerate(entries):
                e.result = tuple(
                    None if out is None
                    else (out if ax is None else _slice(out, ax, i))
                    for out, ax in zip(outputs, out_axes))
                e.event.set()
        except BaseException as exc:  # propagate to every still-waiting
            for e in entries:         # caller (never clobber a result that
                if not e.event.is_set():  # was already handed out)
                    # fresh instance per waiter: multiple request threads
                    # re-raising ONE shared exception object mutate its
                    # traceback concurrently → interleaved server logs
                    try:
                        err: BaseException = type(exc)(*exc.args)
                    except Exception:
                        err = RuntimeError(f"batched forward failed: {exc!r}")
                    err.__cause__ = exc
                    e.error = err
                    e.event.set()


def _slice(x: Any, axis: int, i: int) -> Any:
    """Take item ``i``'s length-1 slice along ``axis`` (keeps the dim so
    downstream ``[0]`` indexing matches the unbatched path)."""
    idx = [slice(None)] * np.ndim(x)
    idx[axis] = slice(i, i + 1)
    return x[tuple(idx)]
