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

import itertools
import time
from typing import Callable

_salt = itertools.count(1)

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn: Callable, iters: int):
    @jax.jit
    def loop(x):
        def body(carry, _):
            y = fn(carry)
            # consume the WHOLE output: a single-element dependency lets XLA
            # slice through sliceable ops (a dense matmul collapses to one
            # row); the mean forces full materialization, and * 1e-30 keeps
            # the carry drift negligible without being provably zero
            eps = jnp.mean(y.astype(jnp.float32)) * jnp.float32(1e-30)
            nxt = carry + eps.astype(carry.dtype)
            return nxt, eps
        final, lasts = jax.lax.scan(body, x, None, length=iters)
        return final[(0,) * final.ndim], lasts[-1]

    return loop


def time_fn(fn: Callable, x, *, iters: int = 20, warmup: int = 2) -> float:
    """Per-call seconds for ``fn(x)``, slope-based: time chains of N and 2N
    iterations and divide the difference — this cancels the fixed host
    round-trip (~ms on the remote TPU path) that would otherwise floor every
    measurement.  Every timed call gets a *distinct* input: the remote path
    memoizes repeated identical (executable, args) calls, which would
    otherwise collapse samples to the round-trip time."""
    short = _chain(fn, iters)
    long = _chain(fn, 2 * iters)

    def perturb(i):
        # globally unique inputs: repeated time_fn calls in one process must
        # never reuse an (executable, args) pair, or the remote path serves
        # a cached result and the sample collapses to the round-trip time
        salt = next(_salt)
        return (x + jnp.asarray(i * 1e-6 + salt * 1e-5, x.dtype)).block_until_ready()

    try:
        try:
            jax.device_get(short(perturb(0)))  # compile + warm
            jax.device_get(long(perturb(0)))
        except Exception:
            # chain jit re-traces fn, embedding closed-over arrays as HLO
            # constants; huge formats overflow the remote-compile payload.
            # Fall back to loop timing with overhead subtraction.
            return _time_loop(fn, x, iters=max(iters, 8))
        samples = []
        for i in range(1, 4):
            xi = perturb(i)
            t0 = time.perf_counter()
            jax.device_get(short(xi))
            t1 = time.perf_counter()
            jax.device_get(long(xi))
            t2 = time.perf_counter()
            samples.append(((t2 - t1) - (t1 - t0)) / iters)
        sec = float(np.median(samples))
        # fast kernels drown in round-trip jitter: retry once with enough
        # iterations that the slope spans >= ~4ms of device time
        if sec * iters < 2e-3 and iters < 256:
            want_iters = int(min(max(4e-3 / max(sec, 2e-6), 2 * iters), 256))
            return time_fn(fn, x, iters=want_iters, warmup=0)
        return max(sec, 1e-9)
    finally:
        # The chain jit bakes fn's closed-over arrays (packed formats) into
        # the executable as device constants, and the global pjit cache
        # holds them: a multi-hour benchmark process accumulates GBs of
        # dead format constants in HBM until the backend reports
        # RESOURCE_EXHAUSTED (observed in the round-3 suite run).  Each
        # chain is single-use — drop its executables now.
        for chained in (short, long):
            try:
                chained.clear_cache()
            except Exception:
                pass


def _time_loop(fn: Callable, x, *, iters: int) -> float:
    """Loop timing: pipeline `iters` calls on distinct inputs, block once,
    subtract the dispatch/transfer overhead measured with an identity fn."""
    base = next(_salt) * 1e-5
    xs = [(x + jnp.asarray(base + i * 1e-6, x.dtype)) for i in range(iters)]
    jax.block_until_ready(xs)
    ident = jax.jit(lambda v: v * 1.0000001)

    def run(f):
        # device_get, not block_until_ready: the remote path's
        # block_until_ready returns before device completion.  In-order
        # execution means fetching the last result fences the whole batch;
        # the fetch cost is shared with the identity run and subtracts out.
        jax.device_get(f(xs[0]))  # warm
        t0 = time.perf_counter()
        ys = [f(xi) for xi in xs]
        jax.device_get(ys[-1])
        return (time.perf_counter() - t0) / iters

    overhead = run(ident)
    total = run(fn)
    return max(total - overhead, 1e-9)


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
