"""Device synchronization helpers.

On some experimental platforms (the axon TPU tunnel used for development)
``jax.block_until_ready`` does not actually block, which silently breaks
wall-clock timing (see PERF.md "async-dispatch trap"). ``sync`` forces real
completion by fetching a single element per leaf — one scalar of D2H, not
the whole array.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def sync(tree: Any) -> Any:
    """Block until every array in ``tree`` has materialized on device.

    Returns the tree unchanged. Cost: one-element fetch per leaf.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return tree


def timed(fn, *args, iters: int = 10):
    """Wall-clock a jitted function honestly: dispatch ``iters`` calls and
    force completion of the last output chain. Returns (ms_per_call, out)."""
    import time

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


def prefetch_iter(iterable, place_fn, lookahead: int = 1):
    """Iterate ``iterable`` with ``place_fn`` (e.g. jax.device_put) applied in
    a background thread one item ahead — overlaps host->device transfers
    with downstream compute (transfers can be synchronous on slow links)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=lookahead)
    stop = threading.Event()

    def put_stop_aware(msg) -> None:
        # The sentinel puts must honor stop too: if the consumer leaves
        # early (exception mid-loop) with the queue full, a bare put()
        # blocks this daemon forever, pinning device-placed batches
        # (same hazard data/loader.py fixed for its producer).
        while not stop.is_set():
            try:
                q.put(msg, timeout=0.5)
                return
            except queue.Full:
                continue

    def produce():
        try:
            for item in iterable:
                placed = place_fn(item)
                put_stop_aware(("ok", placed))
                if stop.is_set():
                    return
            put_stop_aware(("done", None))
        except Exception as e:
            put_stop_aware(("err", e))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            kind, value = q.get()
            if kind == "ok":
                yield value
            elif kind == "err":
                raise value
            else:
                return
    finally:
        stop.set()
        while True:  # drain so a blocked producer put() can observe stop
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
