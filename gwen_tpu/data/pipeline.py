"""Device input pipeline: sharded transfer + double-buffered prefetch.

Replaces the reference's ``DataLoader(num_workers=16, pin_memory=True)`` +
``DistributedSampler`` (models_cnn.py:496-506) with a JAX-native pattern: a
background thread stages the next host batch while the device computes, and
``jax.device_put`` places each batch with a ``NamedSharding`` so per-device
shards go straight to their chips (no gather/scatter on device).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def shard_batches(
    batches: Iterable,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Transfer each (pytree of) numpy batch to device with ``sharding``."""
    for batch in batches:
        if sharding is None:
            yield jax.tree_util.tree_map(jax.device_put, batch)
        else:
            yield jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), batch
            )


def prefetch(batches: Iterable, size: int = 2) -> Iterator:
    """Double-buffered prefetch on a background thread.

    ``size=2`` keeps one batch in flight while the previous one computes —
    enough to hide host staging behind device step time.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def producer() -> None:
        try:
            for b in batches:
                q.put(b)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is sentinel:
            if err:
                raise err[0]
            return
        yield b


def device_pipeline(
    make_batches: Callable[[], Iterable],
    sharding: Optional[jax.sharding.Sharding] = None,
    prefetch_size: int = 2,
) -> Iterator:
    """Compose: host batches → sharded device_put → prefetch."""
    return prefetch(shard_batches(make_batches(), sharding), prefetch_size)
