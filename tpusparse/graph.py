"""Graph algorithms over semiring SpMV (reference graph mode).

The reference carries config hooks ``PERFORMANCE_FLAG=graph``, ``Semiring``,
``Graph_Algorithm`` (bfs|pr|cc), ``GRAPH_MAX_ITER`` and prepares matrices for
them in its loader (struct.cc:53-75: transpose for BFS/PageRank push
traversal, value-drop + dedup for CC) but leaves the kernels unwired
(SURVEY §3.4).  Here the full path works: semiring SpMV on device + the
three iterative drivers, jit-compiled with ``lax.while_loop`` so traversal
runs entirely on-chip.

Semirings (combine, reduce):
  plus_times  (*, +)       numeric SpMV
  or_and      (&, |)       frontier propagation (BFS)
  min_plus    (+, min)     shortest paths / label propagation (CC uses
                           (second, min): neighbor label min)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.config import get_config
from tpusparse.io.mtx import CooMatrix

SEMIRINGS = ("plus_times", "min_plus", "or_and")

_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("semiring", "m"))
def _semiring_spmv(rows, cols, vals, x, *, semiring, m):
    xc = jnp.take(x, cols, axis=0)
    if semiring == "plus_times":
        return jax.ops.segment_sum(vals * xc, rows, num_segments=m)
    if semiring == "min_plus":
        return jax.ops.segment_min(vals + xc, rows, num_segments=m)
    if semiring == "or_and":
        hit = jnp.logical_and(vals != 0, xc).astype(jnp.int32)
        # empty segments fill with INT_MIN, so test > 0 rather than casting
        return jax.ops.segment_max(hit, rows, num_segments=m) > 0
    raise ValueError(f"unknown semiring {semiring!r}")


def semiring_spmv(mat: CooMatrix, x, semiring: str | None = None):
    """y[M] = A (combine) x reduced per row under the semiring."""
    if semiring is None:
        semiring = get_config().semiring
    assert semiring in SEMIRINGS, semiring
    rows = jnp.asarray(mat.rows, jnp.int32)
    cols = jnp.asarray(mat.cols, jnp.int32)
    if semiring == "or_and":
        vals = jnp.asarray(mat.vals != 0)
        x = jnp.asarray(x, bool)
    else:
        vals = jnp.asarray(mat.vals, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
    return _semiring_spmv(rows, cols, vals, x, semiring=semiring, m=mat.shape[0])


def matvec_plan(mat: CooMatrix, semiring: str = "plus_times",
                vals: np.ndarray | None = None):
    """Packed repeated-matvec plan for the iterative drivers.

    Runs CalculationMethodChooseOperator so ``calculation_method`` lives in
    the metadata set (the reference's semiring hook,
    operator/calculation_method_choose_operator.cc) and the plan is chosen
    FROM the metadata, then packs the matrix ONCE:

      plus_times  radix kt=1 kernel (the SpMV champion) when the packed x
                  fits VMEM — pack cost amortizes over the iterations
      or_and      plus_times on 0/1 values + a >0 threshold (counts and
                  boolean OR agree for non-negative values; exact in f32
                  below 2^24 per row)
      min_plus    XLA segment_min (the MXU's dot cannot implement min)

    Returns ``fn(x[N] f32) -> y[M] f32`` usable inside lax.while_loop."""
    from tpusparse.levels import Level
    from tpusparse.meta.set import create_init_metadata_set
    from tpusparse.ops import CalculationMethodChooseOperator, OperatorExecutor

    assert semiring in SEMIRINGS, semiring
    m, n = mat.shape
    use_vals = np.asarray(mat.vals if vals is None else vals, np.float32)
    ms = create_init_metadata_set(mat)
    ex = OperatorExecutor(ms)
    ex.add_and_run(CalculationMethodChooseOperator(
        0, method="plus_times" if semiring == "plus_times" else
        ("or_and" if semiring == "or_and" else "min_plus")))
    method_code = int(ms.get(Level.GLOBAL, "calculation_method", 0))

    if method_code in (0, 2) and n * 4 <= 6 * 1024 * 1024:  # plus_times | or_and
        from tpusparse.kernels.dg_gather import dg_spmv, pack_dg

        v = (use_vals != 0).astype(np.float32) if method_code == 2 else use_vals
        # dg kt=1 is the SpMV champion (2.1 vs radix's 1.25 Gnnz/s); config
        # mirrors spmv.py's 'dg' method
        rb = 4096 if m >= 4096 else max(64, 64 * (-(-m // 64)))
        fmt = pack_dg(CooMatrix(mat.rows, mat.cols, v, mat.shape),
                      rb=rb, ns=4, g=2048 if mat.nnz > 1 << 20 else 512,
                      kt=1, mode="fp32x2")

        if method_code == 2:
            def fn(x):
                y = dg_spmv(fmt, x)
                return (y > 0).astype(jnp.float32)
        else:
            def fn(x):
                return dg_spmv(fmt, x)

        fn.meta = {"method": "dg", "calculation_method": method_code,
                   "padding_rate": fmt.padding_rate}
        return fn

    rows = jnp.asarray(mat.rows, jnp.int32)
    cols = jnp.asarray(mat.cols, jnp.int32)
    v = jnp.asarray(use_vals)

    def fn(x):
        if method_code == 2:
            y = _semiring_spmv(rows, cols, (v != 0).astype(jnp.float32), x,
                               semiring="plus_times", m=m)
            return (y > 0).astype(jnp.float32)
        return _semiring_spmv(
            rows, cols, v, x,
            semiring="plus_times" if method_code == 0 else "min_plus", m=m)

    fn.meta = {"method": "segment", "calculation_method": method_code}
    return fn


def bfs(mat: CooMatrix, source: int, max_iter: int | None = None) -> np.ndarray:
    """Level array (-1 = unreachable) by frontier propagation with or_and.

    ``mat`` should be the *push* orientation: entry (u, v) means edge v->u,
    i.e. the transposed adjacency that ``read_mtx(graph_mode='bfs')``
    produces (struct.cc graph loader).
    """
    level, _ = bfs_fn(mat, max_iter=max_iter)(source)
    return np.asarray(level)


def bfs_fn(mat: CooMatrix, max_iter: int | None = None):
    """Jitted ``run(source) -> (level, n_iters)`` for repeated BFS over one
    packed matrix (the pack and the compile both amortize)."""
    n = mat.shape[0]
    assert mat.shape[0] == mat.shape[1], "BFS needs a square adjacency"
    if max_iter is None:
        max_iter = min(get_config().graph_max_iter, n)
    # packed or_and matvec: the format packs once, every frontier step is
    # the tuned-kernel path (VERDICT r1 #6 — iteration amortizes the pack)
    fn = matvec_plan(mat, semiring="or_and")

    def cond(state):
        level, frontier, it = state
        return jnp.logical_and(frontier.any(), it < max_iter)

    def body(state):
        level, frontier, it = state
        nxt = jnp.logical_and(fn(frontier) > 0, level < 0)
        level = jnp.where(nxt, it + 1, level)
        return level, nxt.astype(jnp.float32), it + 1

    @jax.jit
    def run(source):
        level0 = jnp.full((n,), -1, jnp.int32).at[source].set(0)
        frontier0 = jnp.zeros((n,), jnp.float32).at[source].set(1.0)
        level, _, it = jax.lax.while_loop(
            cond, body, (level0, frontier0, jnp.int32(0)))
        return level, it

    return run


def sssp(mat: CooMatrix, source: int, max_iter: int | None = None) -> np.ndarray:
    """Single-source shortest-path distances (+inf = unreachable) by
    Bellman-Ford-style min_plus relaxation over the semiring matvec.

    ``mat`` in push orientation (entry (u, v) = nonneg edge weight v->u):
    each step relaxes d[u] = min(d[u], min_v(w(u,v) + d[v])).  The
    reference carries only the semiring config hook
    (global_config.json.bak Semiring); this wires it to an algorithm."""
    d, _ = sssp_fn(mat, max_iter=max_iter)(source)
    return np.asarray(d)


def sssp_fn(mat: CooMatrix, max_iter: int | None = None):
    """Jitted ``run(source) -> (dist, n_iters)`` for repeated SSSP over one
    matrix (min_plus semiring path — XLA segment_min; the MXU dot cannot
    implement min, see matvec_plan)."""
    n = mat.shape[0]
    assert mat.shape[0] == mat.shape[1], "SSSP needs a square adjacency"
    if max_iter is None:
        max_iter = min(get_config().graph_max_iter, n)
    fn = matvec_plan(mat, semiring="min_plus")

    def cond(state):
        d, changed, it = state
        return jnp.logical_and(changed, it < max_iter)

    def body(state):
        d, _, it = state
        nxt = jnp.minimum(d, fn(d))
        return nxt, (nxt < d).any(), it + 1

    @jax.jit
    def run(source):
        d0 = jnp.full((n,), jnp.inf, jnp.float32).at[source].set(0.0)
        d, _, it = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True),
                                                   jnp.int32(0)))
        return d, it

    return run


def pagerank(
    mat: CooMatrix,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int | None = None,
) -> np.ndarray:
    """Power iteration.  ``mat`` in push orientation (entry (u, v) = edge
    v->u); dangling mass is redistributed uniformly."""
    r, _ = pagerank_fn(mat, damping=damping, tol=tol, max_iter=max_iter)()
    return np.asarray(r)


def pagerank_fn(
    mat: CooMatrix,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int | None = None,
):
    """Jitted ``run() -> (rank, n_iters)`` for repeated PageRank over one
    packed matrix."""
    n = mat.shape[0]
    assert mat.shape[0] == mat.shape[1]
    if max_iter is None:
        max_iter = get_config().graph_max_iter
    # out-degree of v = number of entries with col v (push orientation)
    deg = np.bincount(mat.cols, minlength=n).astype(np.float32)
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    # transition weights packed ONCE into the plus_times matvec plan; each
    # power iteration runs the tuned kernel path
    fn = matvec_plan(mat, semiring="plus_times",
                     vals=np.ones(mat.nnz, np.float32) * inv_deg[mat.cols])
    dangling = jnp.asarray(deg == 0)

    def cond(state):
        r, delta, it = state
        return jnp.logical_and(delta > tol, it < max_iter)

    def body(state):
        r, _, it = state
        spread = fn(r)
        dangle = jnp.where(dangling, r, 0.0).sum() / n
        nxt = (1.0 - damping) / n + damping * (spread + dangle)
        return nxt, jnp.abs(nxt - r).sum(), it + 1

    @jax.jit
    def run(r0):
        r, _, it = jax.lax.while_loop(
            cond, body, (r0, jnp.float32(jnp.inf), jnp.int32(0)))
        return r, it

    def runner(r0=None):
        if r0 is None:
            r0 = jnp.full((n,), 1.0 / n, jnp.float32)
        return run(jnp.asarray(r0, jnp.float32))

    return runner


def connected_components(mat: CooMatrix, max_iter: int | None = None) -> np.ndarray:
    """Component label per vertex (= min vertex id in its component) by min
    label propagation; edges treated as undirected (matrix symmetrized).
    ``read_mtx(graph_mode='cc')`` provides the value-dropped dedup input."""
    n = mat.shape[0]
    assert mat.shape[0] == mat.shape[1]
    if max_iter is None:
        max_iter = min(get_config().graph_max_iter, n)
    rows_np = np.concatenate([mat.rows, mat.cols])
    cols_np = np.concatenate([mat.cols, mat.rows])
    rows = jnp.asarray(rows_np, jnp.int32)
    cols = jnp.asarray(cols_np, jnp.int32)

    def cond(state):
        label, changed, it = state
        return jnp.logical_and(changed, it < max_iter)

    def body(state):
        label, _, it = state
        neigh = jax.ops.segment_min(
            jnp.take(label, cols), rows, num_segments=n,
            indices_are_sorted=False,
        )
        nxt = jnp.minimum(label, neigh)
        return nxt, (nxt != label).any(), it + 1

    label0 = jnp.arange(n, dtype=jnp.int32)
    label, _, _ = jax.lax.while_loop(cond, body, (label0, jnp.bool_(True), jnp.int32(0)))
    return np.asarray(label)
