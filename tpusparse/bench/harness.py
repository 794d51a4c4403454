"""Honest timing harness.

The axon/remote TPU path makes ``block_until_ready`` unreliable (it returns
before device completion) and repeated identical calls can be elided, so the
reference's warm-up + repeat-loop methodology (code_generator.cc:582-601) is
implemented here as a *dependency chain inside one jit*: each iteration's
input depends on the previous output through a value the compiler cannot
constant-fold, and the final result is forced to host.  Per-call time =
total / iters, overhead amortized.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn: Callable, iters: int):
    @jax.jit
    def loop(x):
        def body(carry, _):
            y = fn(carry)
            # data dependency the compiler cannot fold away: min(|y00|, 0) == 0
            eps = jnp.minimum(jnp.abs(y[(0,) * y.ndim].astype(jnp.float32)), 0.0)
            nxt = carry + eps.astype(carry.dtype)
            return nxt, y[(0,) * y.ndim]
        final, lasts = jax.lax.scan(body, x, None, length=iters)
        return final[(0,) * final.ndim], lasts[-1]

    return loop


def time_fn(fn: Callable, x, *, iters: int = 20, warmup: int = 2) -> float:
    """Per-call seconds for ``fn(x)``, slope-based: time chains of N and 2N
    iterations and divide the difference — this cancels the fixed host
    round-trip (~ms on the remote TPU path) that would otherwise floor every
    measurement."""
    short = _chain(fn, iters)
    long = _chain(fn, 2 * iters)
    jax.device_get(short(x))  # compile + warm
    jax.device_get(long(x))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(short(x))
        t1 = time.perf_counter()
        jax.device_get(long(x))
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / iters)
    sec = float(np.median(samples))
    return max(sec, 1e-9)


def gflops(nnz: int, k: int, seconds: float, float_rate: float = 2.0) -> float:
    """Reference GFLOP formula: FLOAT_RATE * nnz * K / time
    (code_generator.cc:622-629)."""
    return float_rate * nnz * k / seconds / 1e9


def measured_stream_bandwidth_gbs(nbytes: int = 1 << 30) -> float:
    """Empirical HBM stream bandwidth (read+write) for the roofline."""
    n = nbytes // 4
    rows = max(n // 8192, 8)
    a = jnp.ones((rows, 8192), jnp.float32)
    f = lambda x: x * 1.0000001
    sec = time_fn(jax.jit(f), a, iters=10, warmup=1)
    return 2 * a.size * 4 / sec / 1e9
