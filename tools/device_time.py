"""True per-program DEVICE time via in-program chaining.

Through the remote-TPU tunnel, `block_until_ready()` returns before the
remote execution finishes and a value fetch pays a ~28 ms round trip, so
the usual `for _ in range(N): f(x); block_until_ready` loop measures
dispatch cost for sub-RTT programs (we "measured" a 170-GFLOP resnet
forward at 3x the chip's peak FLOP/s that way). Throughput loops on
device-bound programs (bench.py, bench_eval.py) are still valid — the
device queue is the bottleneck — but attributing time WITHIN a step
needs this: run the program once vs. R+1 times inside ONE jitted
fori_loop (each iteration's input tied to the previous output so XLA
cannot parallelize or elide), fetch a scalar, and divide the difference.

Usage:
    from tools.device_time import device_time_ms
    ms = device_time_ms(lambda x: model.apply(v, x).sum(), x0)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def device_time_ms(fn, *args, reps: int = 50, outer: int = 3) -> float:
    """Steady-state device ms of `fn(*args)`.

    fn's first argument must be a float array (it gets an epsilon bump
    per chained iteration); fn returns a scalar or a pytree whose first
    leaf is reduced to a scalar. reps*device_time should comfortably
    exceed the ~28 ms tunnel round trip, or noise dominates — raise
    `reps` for sub-ms programs."""

    def scalarize(out):
        leaf = jax.tree.leaves(out)[0]
        return jnp.sum(leaf).astype(jnp.float32)

    def chained(n):
        def run(*a):
            def body(_, carry):
                bump, acc = carry
                out = fn(a[0] + bump * 1e-20, *a[1:])
                s = scalarize(out)
                return (bump + s * 0.0 + 1.0, acc + s)

            _, acc = jax.lax.fori_loop(
                0, n, body, (jnp.float32(0), jnp.float32(0))
            )
            return acc

        return jax.jit(run)

    f1, fr = chained(1), chained(reps + 1)
    float(f1(*args))
    float(fr(*args))
    t0 = time.time()
    for _ in range(outer):
        float(f1(*args))
    t1 = (time.time() - t0) / outer
    t0 = time.time()
    for _ in range(outer):
        float(fr(*args))
    tr = (time.time() - t0) / outer
    return (tr - t1) / reps * 1000.0
