"""Host->device prefetching.

The reference overlaps host data work with GPU compute via torch DataLoader
worker processes (train_parsenet.py:111-121). TPU-native equivalent: a
background thread drains the numpy generator while the device computes, and
batches are `jax.device_put` ahead of time (double buffering) with the
desired sharding so the H2D copy overlaps the previous step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


def prefetch_to_device(it: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Wrap a host batch iterator with a device-put prefetch queue."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in it:
                if sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: None if x is None
                        else jax.device_put(x, sharding), batch)
                else:
                    batch = jax.tree_util.tree_map(
                        lambda x: None if x is None else jax.device_put(x),
                        batch)
                q.put(batch)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item


def lookahead(it: Iterator, size: int = 2) -> Iterator:
    """Host-side lookahead: run the (augmentation/canonicalization-heavy)
    generator in a background thread so batch prep overlaps device steps."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in it:
                q.put(batch)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
