"""Slope-based device timing: immune to the axon tunnel's ~37 ms RTT.

``block_until_ready`` is a no-op on the axon platform and a synced fetch
pays a ~37 ms tunnel round-trip (PERF.md), so single-call timings are
inflated by RTT/iters. The fix: run the op chained in a ``lax.scan`` at two
lengths and report the slope

    t_op = (T(long) - T(short)) / (long - short)

which cancels the RTT, the dispatch cost, and any fixed per-call overhead.
Every number in PERF.md's roofline uses this.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_slope(fn, x0, *rest, short=2, long=22, reps=5, name="", flops=0.0,
               bytes_moved=0.0, verbose=True):
    """Median slope timing of ``x0 -> fn(x0, *rest)`` chained in a scan.

    fn's output must have the same shape/dtype as x0 (the carry); if not,
    wrap it so the carry is nudged by a cheap reduction of the output.
    """

    def make(length):
        @jax.jit
        def chained(x0, rest):
            def body(carry, _):
                out = fn(carry, *rest)
                if out.shape == x0.shape and out.dtype == x0.dtype:
                    return out, ()
                nudge = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
                return carry + nudge, ()

            final, _ = jax.lax.scan(body, x0, (), length=length)
            return jnp.sum(final.astype(jnp.float32))

        return chained

    f_short, f_long = make(short), make(long)
    float(f_short(x0, rest))
    float(f_long(x0, rest))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f_short(x0, rest))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_long(x0, rest))
        tl = time.perf_counter() - t0
        slopes.append((tl - ts) / (long - short))
    t = sorted(slopes)[len(slopes) // 2]
    if verbose:
        eff = f"{flops / t / 1e12:7.1f} TFLOPS" if flops else ""
        bw = f"{bytes_moved / t / 1e9:6.0f} GB/s" if bytes_moved else ""
        print(f"{name:46s} {t * 1e3:8.3f} ms {eff}{bw}", flush=True)
    return t
