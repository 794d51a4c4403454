"""Autotuner (reference L6 driver).

The reference enumerates operator pipelines (thread-total, warp-total,
warp-bitmap, thread-bitmap, warp-segment, block-total, block-bitmap), runs
each end-to-end, keeps the min time (token_test.cc:1625-1847), and leaves the
per-candidate artifacts under data_source/<id>/ for later re-use
(obtain_result.py).  tpusparse mirrors that: enumerate Schedule candidates,
verify each against the oracle, time with the chained harness, keep the min,
persist the winner per matrix signature under the config cache_dir, and
append every measurement to results.jsonl.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Sequence

import numpy as np

from tpusparse.config import get_config
from tpusparse.generator import SpmmPlan
from tpusparse.io.mtx import CooMatrix
from tpusparse.schedule import Schedule, build_plan


def matrix_signature(mat: CooMatrix) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(mat.shape, dtype=np.int64).tobytes())
    h.update(np.int64(mat.nnz).tobytes())
    h.update(np.ascontiguousarray(mat.rows[:4096]).tobytes())
    h.update(np.ascontiguousarray(mat.cols[:4096]).tobytes())
    return h.hexdigest()[:16]


def _span_configs(density: float) -> list[tuple[int, int, int]]:
    """Density-adaptive (rb, ct, g) for the span family: a G-chunk of
    column-sorted nz spans ~G/(density*RB) columns, so the window needs
    CT*RB ~ 1.3*G/density; minimizing MXU cost (CT+RB) puts both near the
    square root.  Emit a few spread candidates for the tuner to time."""
    density = max(density, 1e-8)

    import math

    def pow2(v, lo, hi, up=False):
        f = math.ceil if up else round
        return int(min(max(2 ** f(math.log2(max(v, 1))), lo), hi))

    out = []
    for g in (512, 256):
        prod = min(max(1.3 * g / density, 512 * 512), 2048 * 4096)
        side = prod ** 0.5
        rb = pow2(side, 256, 2048)
        ct = pow2(prod / rb, 256, 4096, up=True)  # window must cover the span
        for cand in ((rb, ct, g), (max(rb // 2, 256), ct, g)):
            if cand not in out:
                out.append(cand)
    return out[:4]


def _radix_configs(density: float, kt: int) -> list[tuple[int, int, int]]:
    """(rb, S, g) candidates for the radix family: the window W = S*spr
    should cover a G-chunk's column span ~g/(density*rb); S = W/spr capped
    to [32, 512] sublanes."""
    import math

    spr = 64 // kt  # fp32x2 geometry
    density = max(density, 1e-8)
    out = []
    # bigger chunks amortize per-chunk fixed costs (measured +30% at K=8,
    # +55% at kt=1 for g=1024); tiny kt gets the largest grids
    cfgs = (((2048, 1024), (1024, 1024), (1024, 512)) if kt <= 2
            else ((1024, 1024), (1024, 512), (768, 512)))
    for rb, g in cfgs:
        # window sized to JUST hold a G-chunk's expected column span:
        # slack multiplies the gather contraction (measured: S=256 loses
        # 28% to S=128 at the same g when the window already fits), so
        # round S to the NEAREST power of two, not up
        W = min(max(1.0 * g / (density * rb), 256), 64 * 1024)
        S = int(min(max(2 ** round(math.log2(max(W / spr, 1))), 32), 512))
        if (rb, S, g) not in out:
            out.append((rb, S, g))
    return out[:3]


def default_candidates(mat: CooMatrix, k: int, *, full: bool = False) -> list[Schedule]:
    """Heuristic candidate set (the reference's 7 pipelines + param grid,
    pruned by matrix statistics).  ``full=True`` sweeps the parameter grid
    the reference's commented-out schedules cover — unroll / precision /
    denser (rb, S|ct, g) points and the skew families unconditionally
    (token_test.cc:1625-1847).

    Promotion rule (VERDICT r4 #9; the measurement protocol's own "not
    narrated as a win" standard applied to this list): a config enters the
    DEFAULT (non-full) candidate set only with (a) two independent
    supporting runs — separate sessions / machine windows — or (b) one
    win whose interleaved ranges are separated from the incumbent's.
    Single-run medians with overlapping ranges go in the ``full`` sweep
    until a second run supports them.  Each non-obvious entry cites its
    evidence inline."""
    from tpusparse.kernels.radix_gather import choose_kt

    lengths = mat.row_lengths()
    max_len = int(lengths.max()) if lengths.size else 0
    avg_len = float(lengths.mean()) if lengths.size else 0.0
    skewed = max_len > 32 * max(avg_len, 1.0)
    cands: list[Schedule] = []
    # dynamic-gather family — the champion at K <= 32 (VPU lane-gather
    # replaces the gather/collapse MXU dots; see kernels/dg_gather.py).
    # x3 is (N+W)*kt*4 bytes per resident K-tile: same VMEM gate as radix.
    from tpusparse.kernels.dg_gather import choose_kt_dg

    kt_dg = choose_kt_dg(k)
    if k <= 128 and mat.shape[1] * kt_dg * 4 <= 6 * 1024 * 1024:
        import math

        density = max(mat.density, 1e-8)
        if kt_dg == 1:
            dg_cfgs = [(4096, 4, 2048), (4096, 4, 1024), (1024, 8, 512)]
        else:
            dg_cfgs = []
            for rb, g in ((1024, 512), (512, 512), (1024, 1024)):
                W = min(max(1.0 * g / (density * rb), 256), 16 * 1024)
                ns = int(min(max(2 ** round(math.log2(max(W / 128, 2))), 2), 32))
                if (rb, ns, g) not in dg_cfgs:
                    dg_cfgs.append((rb, ns, g))
        if full and kt_dg > 1:
            dg_cfgs = list(dict.fromkeys(
                dg_cfgs + [(rb, ns, g) for rb in (512, 1024, 2048)
                           for ns in (4, 8, 16) for g in (512, 1024)]))
        # at K > kt the grid re-streams the chunk planes per K-tile, so the
        # largest kt (choose_kt_dg already picks 32 for K > 16) usually wins
        # at K >= 64 (measured: kt=32 57-59 GF/s vs kt=16's 48 at K=64/128);
        # the kt=8 alternative trades a 4x smaller scatter contraction
        kts_dg = [kt_dg] if (kt_dg <= 8 or kt_dg == 1) else \
            list(dict.fromkeys([kt_dg, 8]))
        for kt_c in kts_dg:
            for rb, ns, g in (dg_cfgs if kt_c == kt_dg else dg_cfgs[:1]):
                if kt_c == 1 and rb % 64:
                    continue
                for u in ((4, 8, 16) if full else (8,)):
                    cands.append(Schedule(family="dg_span", rb=rb, ns=ns,
                                          g=g, unroll=u, ktile=kt_c))
                if full and kt_c >= 8:
                    cands.append(Schedule(family="dg_span", rb=rb, ns=ns,
                                          g=g, unroll=8, ktile=kt_c,
                                          precision="bf16"))
    # dgt: tile-pair windows + static-residue scatter + virtual-row splits
    # (kernels/dgt_gather.py) — competitive with dg at K <= 32 with ~1.5x
    # less padding; the min-time loop picks per matrix
    if 2 <= kt_dg <= 32 and k <= 128 and \
            mat.shape[1] * max(kt_dg, 8) * 4 <= 6 * 1024 * 1024:
        from tpusparse.kernels.dgt_gather import auto_rb_dgt, dgt_geometry

        _, ngrp_dgt = dgt_geometry(max(kt_dg, 8), "fp32x2")
        rb_auto = auto_rb_dgt(mat.shape[0], mat.shape[1], mat.nnz,
                              ngrp=ngrp_dgt)
        # round-4: the multi-open-tile walk (pack default) converts nw=8 /
        # rb=512 into the lowest-padding config (1.42 -> 1.13 on the 32k
        # headline, BENCH_AB_r04); scatter stays 'select' (fullrow / repmul
        # / wide all carry measured or compiler refutations, PERF.md r4)
        dgt_cfgs = [(True, 512, 8, 512, 8, False),
                    (True, 256, 4, 512, 8, False),
                    (False, 256, 8, 512, 8, False),
                    # g=1024 u=16: two independent supporting runs per the
                    # promotion rule — BENCH_AB_r04 Run C2 (led the medians)
                    # and the r4 driver session (0.621 ms vs the g=512 u=8
                    # sibling's 0.790 ms, separated — BENCH_r04.json tail)
                    (True, 512, 8, 1024, 16, False),
                    # C4 int8 scatter one-hot (FORMULATIONS_r05, bit-exact
                    # on v5e): promoted per the rule — BENCH_AB_r05 run 2
                    # (nw4: 0.488 vs 0.779 ms, separated) and run 3
                    # (interleaved medians: i8 ahead at both configs with
                    # tighter ranges); run 1 was a nw4 tie / nw8 win
                    (True, 256, 4, 512, 8, True),
                    (True, 512, 8, 512, 8, True)]
        if rb_auto > 512:
            # sparse per-window regimes need bigger programs for tile fill
            dgt_cfgs.insert(0, (True, rb_auto, 4, 512, 8, False))
        if full:
            dgt_cfgs += [(True, 512, 4, 512, 8, False),
                         (True, 256, 8, 512, 8, False),
                         (False, 512, 8, 512, 8, False),
                         (True, 1024, 2, 512, 8, False),
                         (True, 512, 8, 512, 16, False),
                         (True, 512, 8, 1024, 8, False),
                         (True, 512, 8, 1024, 16, True)]
        for resid, rb, nw, g_c, u_c, i8 in dgt_cfgs:
            cands.append(Schedule(family="dgt_span", rb=rb, nw=nw,
                                  resid=resid, g=g_c, unroll=u_c,
                                  ktile=max(kt_dg, 8), rowhot_i8=i8))
    # radix lane-packed one-hot — champion at K <= 32 (3-dot decomposition)
    kt_r = choose_kt(k)
    if k <= 128 and mat.shape[1] * kt_r * 4 <= 6 * 1024 * 1024:
        # larger kt shrinks the window (spr = 64/kt) and grows the scatter
        # (rbs = rb * kt / 64); smaller kt runs more K-tiles on the grid —
        # which side wins depends on the matrix, so offer both and let the
        # min-time loop decide
        kts = [kt_r] if kt_r <= 8 else list(dict.fromkeys([kt_r, 8]))
        for kt_c in kts:
            radix_cfgs = _radix_configs(mat.density, kt_c)
            if not full and kt_c != kt_r:
                radix_cfgs = radix_cfgs[:1]
            if full:
                radix_cfgs = list(dict.fromkeys(
                    radix_cfgs + [(rb, S, g) for rb in (512, 1024, 2048)
                                  for S in (64, 128, 256) for g in (256, 512)]))
            for rb, S, g in radix_cfgs:
                for u in ((2, 4, 8) if full else (4,)):
                    cands.append(Schedule(family="radix_span", rb=rb,
                                          sublanes=S, g=g, unroll=u,
                                          ktile=kt_c))
                if full:
                    cands.append(Schedule(family="radix_span", rb=rb,
                                          sublanes=S, g=g, unroll=4,
                                          ktile=kt_c, precision="bf16"))
        if k <= 32 or full:
            # the reference's interleaved brick-ELL layout through the same
            # kernel — measured per matrix, the tuner decides (it loses on
            # scattered columns, see MICROBENCH/PERF.md)
            cands.append(Schedule(family="brick_ell", sort=True, rb=1024,
                                  sublanes=256, g=512, unroll=4, ktile=kt_r))
    # span-chunked one-hot — dominant up to K~128 (dynamic windows, ~1.1 pad)
    # needs X resident in VMEM: gate on N * xwidth(bf16 hi+lo) footprint;
    # above the limit, the column-split variant sums per-range sub-plans
    x_bytes = mat.shape[1] * 2 * min(k, 128) * 2
    if k <= 128:
        if x_bytes <= 6 * 1024 * 1024:
            span_cfgs = _span_configs(mat.density)
            unrolls = (2, 4, 8) if full else (4,)
            precisions = ("fp32x2", "bf16") if full else ("fp32x2",)
            for rb, ct, g in span_cfgs:
                for u in unrolls:
                    for p in precisions:
                        cands.append(Schedule(family="span_onehot", rb=rb,
                                              ct=ct, g=g, unroll=u, precision=p))
        else:
            s = -(-x_bytes // (4 * 1024 * 1024))
            for rb, ct, g in _span_configs(mat.density)[:2]:
                cands.append(Schedule(family="span_colsplit", col_split=s,
                                      rb=rb, ct=ct, g=g, unroll=4))
    # MXU one-hot family — primary throughput path at larger K
    tile_cfgs = ((1024, 1024, 512), (1024, 512, 256), (512, 1024, 256))
    for rb, ct, g in tile_cfgs:
        for kt in ((None, 64, 128) if full and k > 128 else (None,)):
            cands.append(Schedule(family="tile_onehot", rb=rb, ct=ct, g=g,
                                  unroll=4, ktile=kt))
    # stripe total family (thread/warp/block_total analogues)
    for work in ((512, 1024, 2048, 4096) if full else (512, 2048)):
        cands.append(Schedule(family="stripe_total", blocking="merge_path",
                              work_per_block=work, unroll=8))
    if full:
        cands.append(Schedule(family="stripe_total", blocking="balanced",
                              work_per_block=1024, unroll=8))
        cands.append(Schedule(family="stripe_total", blocking="fixed_rows",
                              row_interval=256, unroll=8))
        # two-level TBLOCK⊃WARP nesting with parent-relative indices
        cands.append(Schedule(family="stripe_nested", work_per_block=4096,
                              unroll=8))
    # nnz-direction + segment combine (bitmap/segment analogues) — wins on
    # extreme skew where row-aligned stripes pad badly
    if skewed or full:
        if k <= 128:
            cands.append(Schedule(family="segment_span", work_per_block=4096,
                                  ct=512, g=256, unroll=4))
        cands.append(Schedule(family="nnz_segment", work_per_block=2048, unroll=8))
        cands.append(Schedule(family="bucketed", bucket_bounds=(max(int(8 * avg_len), 32),)))
    # hot-column hybrid — when a small set of columns carries a large nnz
    # share (web-graph class), a dense (M, C) MXU panel over the hot
    # columns + a sparse remainder beats the pure one-hot path (the panel
    # needs no gather at all); gate on measured column concentration
    m, n = mat.shape
    if mat.nnz and n > 256:
        ccounts = np.bincount(mat.cols, minlength=n)
        top = np.sort(ccounts)[-128:]
        share128 = float(top.sum()) / mat.nnz
        # skew = concentration relative to the uniform expectation 128/n
        if share128 > max(0.25, 2.5 * 128 / n) or full:
            hyb = []
            kt_h = choose_kt(k) if k <= 128 else None
            for C in dict.fromkeys((2048, 512, max(128, (n // 8) & ~127))):
                if 128 <= C < n and m * C * 4 <= 512 * 1024 * 1024:
                    # bf16 panel first: halves the panel HBM read, which is
                    # the hybrid's dominant cost (32k col-skew measured:
                    # bf16 C=2048 13.7 GF/s vs fp32 C=512 6.2, radix 6.7)
                    hyb.append(Schedule(family="hybrid_cols", hot_cols=C,
                                        unroll=4, ktile=kt_h,
                                        precision="bf16"))
                    if full:
                        hyb.append(Schedule(family="hybrid_cols", hot_cols=C,
                                            unroll=4, ktile=kt_h))
            if share128 > 0.6 and not full:
                # extreme concentration: the panel is the likely winner —
                # rank it ahead so a small budget still times it
                cands = hyb + cands
            else:
                cands.extend(hyb)
    # dense MXU matmul — wins at high density or large K where the one-hot
    # gather exceeds the dense product's FLOPs; gate on densified HBM size
    # (densification happens on device for large A)
    if m * n * 2 <= 4 * 1024 ** 3 and (mat.density > 0.02 or k >= 256 or full):
        cands.append(Schedule(family="dense", precision="bf16"))
    # block-ELL MXU path — candidate when nz cluster into dense 128-blocks
    br = mat.rows >> 7
    bc = mat.cols >> 7
    blocks = np.unique(br * (-(-n // 128)) + bc).size
    if blocks and (mat.nnz / (blocks * 128 * 128) > 0.25
                   or (full and m * n * 2 <= 4 * 1024 ** 3)):
        cands.append(Schedule(family="block_ell", precision="bf16", row_interval=128))
    return cands


@dataclasses.dataclass
class TuneResult:
    best: SpmmPlan
    best_schedule: Schedule
    best_seconds: float
    table: list[dict]

    @property
    def gflops(self):
        return self.table and max(r.get("gflops", 0.0) for r in self.table)


def tune(
    mat: CooMatrix,
    x,
    *,
    candidates: Sequence[Schedule] | None = None,
    validate: bool = True,
    rtol: float | None = None,
    iters: int = 10,
    results_path: str | None = None,
    use_cache: bool = True,
    interpret: bool | None = None,
    full: bool = False,
    budget: int | None = None,
) -> TuneResult:
    """Enumerate + time candidates, keep the min (token_test.cc min-time).

    ``full=True`` sweeps the exhaustive parameter grid; ``budget`` caps the
    number of candidates tried (cached winner first, so re-tuning under a
    small budget re-validates the known winner and a few challengers)."""
    from tpusparse.bench.harness import gflops as _gflops, time_fn
    from tpusparse.oracle import check_result, spmm_reference

    import jax.numpy as jnp

    cfg = get_config()
    x = jnp.asarray(x)
    k = x.shape[1]
    sig = matrix_signature(mat)
    cache_file = os.path.join(cfg.cache_dir, f"tune_{sig}_k{k}.json")

    if candidates is None:
        candidates = default_candidates(mat, k, full=full)
        if use_cache and os.path.exists(cache_file):
            try:
                with open(cache_file) as f:
                    cached = Schedule(**json.load(f)["schedule"])
                candidates = [cached] + [c for c in candidates if c != cached]
            except Exception:
                pass
    if budget is not None:
        candidates = list(candidates)[:max(budget, 1)]

    want = spmm_reference(mat, np.asarray(x, dtype=np.float64)) if validate else None
    bf16_scale = None

    def _bf16_scale():
        # bf16 candidates are judged with a condition-aware denominator
        # |A|·|x|: rounding A (and x) to bf16 carries an irreducible error
        # ~eps·Σ|terms| per output that every bf16 method shares (measured
        # up to ~5e-2 pure-relative on cancellation-heavy outputs) — the
        # oracle should catch kernel bugs, not re-litigate the precision
        # choice (the reference sidesteps the same issue by checking with
        # all-ones values, kernel_lib.hpp:859-921)
        nonlocal bf16_scale
        if bf16_scale is None:
            mat_abs = CooMatrix(mat.rows, mat.cols,
                                np.abs(np.asarray(mat.vals, np.float64)),
                                mat.shape)
            bf16_scale = spmm_reference(mat_abs,
                                        np.abs(np.asarray(x, np.float64)))
        return bf16_scale
    try:
        from tpusparse.bench.microbench import roofline_bandwidth_gbs

        bw = roofline_bandwidth_gbs()
    except Exception:
        bw = 0.0
    table: list[dict] = []
    best = None
    for sched in candidates:
        row = {"schedule": sched.describe(), "matrix": sig, "k": k}
        try:
            t_pack = time.time()
            plan = build_plan(mat, sched, interpret=interpret)
            row["pack_seconds"] = round(time.time() - t_pack, 4)
            if validate:
                y = np.asarray(plan(x))
                tol = rtol
                ref = want
                if tol is None:
                    tol = 2e-3 if sched.precision == "fp32x2" else (
                        cfg.tol_bf16 if sched.precision == "bf16" else cfg.tol_fp32
                    )
                scale = (_bf16_scale()
                         if rtol is None and sched.precision == "bf16"
                         else None)
                check_result(y, ref, rtol=tol, scale=scale)
            if plan.meta["padding_rate"] > cfg.padding_rate_up_bound:
                raise RuntimeError(
                    f"padding rate {plan.meta['padding_rate']:.2f} exceeds bound"
                )
            sec = time_fn(plan.fn, x, iters=iters, warmup=1)
            g = _gflops(mat.nnz, k, sec, cfg.float_rate)
            # plausibility guards (executor.cc:51-55): counted GF/s above
            # the MXU physical peak, or a timing under the dispatch floor,
            # is a measurement artifact, not a result
            if g > cfg.gflops_up_bound:
                raise RuntimeError(f"implausible {g:.1f} GFLOP/s > bound")
            if 0 < sec < cfg.seconds_floor:
                raise RuntimeError(
                    f"implausible timing {sec:.2e}s under dispatch floor")
            fmt_bytes = int(plan.meta.get("format_bytes", 0))
            for f in plan.formats:
                mb = getattr(f, "memory_bytes", 0)
                fmt_bytes += mb() if callable(mb) else mb
            row.update(seconds=sec, gflops=g, padding_rate=plan.meta["padding_rate"],
                       format_bytes=fmt_bytes, ok=True)
            if bw:
                m_, n_ = mat.shape
                traffic = fmt_bytes + (n_ * k + m_ * k) * 4
                row["pct_roofline"] = round(100 * traffic / sec / 1e9 / bw, 1)
            if best is None or sec < best[1]:
                best = (plan, sec, sched)
        except Exception as e:
            row.update(ok=False, error=f"{type(e).__name__}: {e}")
        row["ts"] = time.time()
        table.append(row)

    if results_path is None:
        os.makedirs(cfg.cache_dir, exist_ok=True)
        results_path = os.path.join(cfg.cache_dir, "results.jsonl")
    with open(results_path, "a") as f:
        for row in table:
            f.write(json.dumps(row) + "\n")

    if best is None:
        raise RuntimeError(f"no schedule candidate succeeded: {table}")
    plan, sec, sched = best
    if use_cache:
        os.makedirs(cfg.cache_dir, exist_ok=True)
        with open(cache_file, "w") as f:
            json.dump({"schedule": sched.describe(), "seconds": sec}, f)
        # persist the winner's packed formats (data_source/<id> analogue)
        try:
            from tpusparse.artifacts import save_plan_artifact

            save_plan_artifact(
                sig, sched.describe(), plan.formats,
                perf={"seconds": sec, "gflops": _gflops(mat.nnz, k, sec), "k": k},
            )
        except Exception:
            pass  # artifact persistence is best-effort
    return TuneResult(best=plan, best_schedule=sched, best_seconds=sec, table=table)
