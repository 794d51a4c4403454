"""Timing-harness regression tests.

The round-3 suite run died RESOURCE_EXHAUSTED mid-session: time_fn's chain
jit bakes each plan's closed-over format arrays into the executable as
device constants, and the global pjit cache pinned every single-use chain
executable for the life of the process (PROGRESS.md round 3).  The fix
drops the chain caches in time_fn's finally block; this test pins it
(VERDICT r3 #8)."""

import gc

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.bench.harness import time_fn


def _live_bytes() -> int:
    gc.collect()
    return sum(a.nbytes for a in jax.live_arrays())


def test_time_fn_drops_chain_executables():
    x = jnp.ones((8, 128), jnp.float32)
    # warm one round so the measurement loop below sees steady state
    big0 = jnp.zeros((512, 1024), jnp.float32)
    time_fn(jax.jit(lambda v, b=big0: v + b[:8, :128] * 1.0000001), x, iters=4)
    del big0
    base = _live_bytes()
    one = 4 * 1024 * 1024  # each closed-over constant is 4 MB
    for i in range(4):
        big = jnp.asarray(
            np.random.default_rng(i).standard_normal((1024, 1024)),
            jnp.float32)
        fn = jax.jit(lambda v, b=big: v + b[:8, :128] * 1.0000001)
        time_fn(fn, x, iters=4)
        del fn, big
    # with the leak, each round pins >= 4 MB of chain-executable constants
    # (observed: the r3 suite accumulated GBs); fixed, live bytes are flat
    growth = _live_bytes() - base
    assert growth < one, f"chain executables leaked {growth/2**20:.1f} MB"
