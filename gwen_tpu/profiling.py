"""Profiling and performance observability.

The reference has no profiling subsystem (SURVEY §5: closest artifact is a
leftover ``CUDA_LAUNCH_BLOCKING=1``). Here:

* :func:`timeit` — wall-clock timing of jitted fns with a readback barrier
  (trustworthy on remote runtimes where ``block_until_ready`` is not).
* :class:`StepTimer` — rolling per-step stats with derived throughput
  (steps/s, edges/s, items/s).
* :func:`trace` / :func:`start_server` — ``jax.profiler`` integration (view
  with TensorBoard / xprof).
* :func:`device_memory_stats` — per-device HBM usage when the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Callable, Iterator, Optional

import jax


def timeit(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    chain: Optional[Callable] = None,
) -> dict:
    """Time ``fn(*args)`` with a concrete device readback as the barrier.

    Two rules learned on the remote (axon) TPU runtime — both are harmless on
    local backends, so they are applied unconditionally:

    * ``jax.block_until_ready`` can return before remote execution completes;
      the only trustworthy barrier is fetching bytes. The final output's first
      scalar is read back through a pre-compiled probe (4-byte transfer).
    * Identical (executable, args) dispatches may be deduped/replayed. Pass
      ``chain`` (``output -> next args tuple``) to make every iteration's
      input depend on the previous output; without it, repeated-call timings
      of a pure ``fn`` on fixed args are a lower bound only.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*(chain(out) if chain is not None else args))
    _fetch_scalar(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}


@jax.jit
def _probe_first(a):
    return a.ravel()[0].astype("float32")


def _fetch_scalar(out) -> float:
    """Force full execution of ``out``'s dependency chain by reading back one
    scalar from each array leaf (pre-compiled probe; 4 bytes per leaf)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            total += float(_probe_first(leaf))
        elif isinstance(leaf, (int, float)):
            total += float(leaf)
    return total


class StepTimer:
    """Rolling window of training-step durations + throughput metrics."""

    def __init__(self, window: int = 50, edges_per_step: int = 0, items_per_step: int = 0):
        self.durations: deque[float] = deque(maxlen=window)
        self.edges_per_step = edges_per_step
        self.items_per_step = items_per_step
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._t0 is not None
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def mean_step_s(self) -> float:
        return sum(self.durations) / len(self.durations) if self.durations else float("nan")

    def stats(self) -> dict:
        mean = self.mean_step_s
        out = {"step_time_s": mean, "steps_per_s": (1.0 / mean if mean > 0 else 0.0)}
        if self.edges_per_step:
            out["edges_per_s"] = self.edges_per_step / mean
        if self.items_per_step:
            out["items_per_s"] = self.items_per_step / mean
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gwen_trace") -> Iterator[None]:
    """Capture a jax.profiler trace around a code block."""
    with jax.profiler.trace(log_dir):
        yield


def start_server(port: int = 9999) -> None:
    """Start the profiler server for live capture (jax.profiler UI)."""
    jax.profiler.start_server(port)


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return out
