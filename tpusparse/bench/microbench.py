"""On-chip microbenchmarks: the measured numbers behind PERF.md.

Round-1 review (VERDICT.md) flagged that the roofline used the 819 GB/s
spec sheet and a paper "20 cyc / MXU tile" model that was never measured.
This module measures, on the attached chip:

  hbm_stream_gbs      elementwise-copy stream bandwidth (read+write), the
                      roofline denominator for format-bound kernels
  hbm_reduce_gbs      read-dominated reduction bandwidth
  mxu_bf16_tflops     dense bf16 matmul peak
  chunk cost rows     measured us per (P, NC) chunk loop for the span and
                      radix kernels on synthetic uniform formats, sweeping
                      the structural parameters — this is the empirical
                      cost model (cyc/nz at the nominal 940 MHz v5e clock)

``python -m tpusparse.bench.microbench`` appends JSON rows to
MICROBENCH.jsonl.  ``roofline_bandwidth_gbs()`` measures once per machine
and caches under config.cache_dir for the suite's pct_roofline columns.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

V5E_CLOCK_HZ = 940e6  # nominal; used only to express us/chunk as cycles


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_hbm(nbytes: int = 1 << 29) -> dict:
    import jax
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn

    n = nbytes // 4
    rows = max(n // 8192, 8)
    a = jnp.asarray(np.random.default_rng(0).standard_normal((rows, 8192)),
                    jnp.float32)
    copy = jax.jit(lambda x: x * 1.0000001)
    sec = time_fn(copy, a, iters=10, warmup=1)
    stream = 2 * a.size * 4 / sec / 1e9
    red = jax.jit(lambda x: jnp.sum(x, axis=0) * 1.0000001)
    sec_r = time_fn(red, a, iters=10, warmup=1)
    reduce_bw = a.size * 4 / sec_r / 1e9
    return {"metric": "hbm", "stream_gbs": round(stream, 1),
            "reduce_gbs": round(reduce_bw, 1), "nbytes": nbytes}


def measure_vpu(rows: int = 512, lanes: int = 512, outer: int = 256,
                chain: int = 32) -> dict:
    """VPU vector-fma rate (Gvreg-fma/s): a (rows, lanes) fp32 value run
    through outer*chain chained y = y*c + x steps, with the `chain` inner
    steps Python-unrolled so XLA fuses them into ONE elementwise kernel
    per sweep — the value stays in registers between fmas instead of
    round-tripping the loop carry through VMEM (a bare fori_loop of
    single fmas measured 0.39 Gops on chip, pure carry traffic).  Each
    sweep still touches rows/8 * lanes/128 independent vregs, so issue is
    ILP-saturated.  This is the probe for the VPU axis the gather kernels
    are bound by (bench/sol.py); the session probe records it so
    VPU-bound headlines are normalized by the axis that actually limits
    them (VERDICT r4 weak #3)."""
    import jax
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn

    a = jnp.asarray(np.random.default_rng(3).standard_normal((rows, lanes)),
                    jnp.float32)

    @jax.jit
    def f(x):
        c = jnp.float32(0.9999997)

        def body(_, y):
            for _k in range(chain):
                y = y * c + x
            return y

        return jax.lax.fori_loop(0, outer, body, x * jnp.float32(1e-3))

    # outer=256 -> ~0.8 ms/call; iters=32 -> ~25/50 ms slope.  At the
    # first outer=64 (~0.2 ms/call) readings swung 2.28-3.28 in one
    # session — the same round-trip-jitter-on-a-short-slope failure the
    # MXU probe had before its iters bump.
    sec = time_fn(f, a, iters=32, warmup=1)
    vregs = outer * chain * (rows // 8) * (lanes // 128)
    return {"metric": "vpu_vfma",
            "gops": round(vregs / sec / 1e9, 2),
            "shape": [rows, lanes], "outer": outer, "chain": chain}


def measure_mxu(m: int = 4096, k: int = 4096, n: int = 4096,
                iters: int = 32) -> dict:
    import jax
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn

    a = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(2).standard_normal((k, n)),
                    jnp.bfloat16)

    @jax.jit
    def mm(x):
        return jax.lax.dot_general(
            x, b, dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)

    # iters=32 (not 10): one mm is ~0.73 ms, and the remote path's ~1-2 ms
    # round-trip jitter on a 7 ms slope produced 110-378 "TF/s" swings in
    # one round-5 session; a ~23/47 ms slope cuts that to ~5%.
    sec = time_fn(mm, a, iters=iters, warmup=1)
    return {"metric": "mxu_bf16", "tflops": round(2 * m * k * n / sec / 1e12, 1),
            "shape": [m, k, n]}


def _synthetic_span(p, nc, g, rb, ct, n, seed=0):
    """Uniform full chunks: every cost is structural, none is padding."""
    import jax.numpy as jnp

    from tpusparse.kernels.span_gather import SpanFormat

    rng = np.random.default_rng(seed)
    c0 = (rng.integers(0, max((n - ct) // 8, 1), (p, 1, nc)) * 8).astype(np.int32)
    cols = rng.integers(0, ct, (p, nc, g)).astype(np.int32)
    lrow = rng.integers(0, rb, (p, nc, g)).astype(np.int32)
    vals = rng.standard_normal((p, nc, g)).astype(np.float32)
    return SpanFormat(
        c0=jnp.asarray(c0), cols=jnp.asarray(cols), lrow=jnp.asarray(lrow),
        vals=jnp.asarray(vals),
        slot_of_origrow=jnp.arange(p * rb, dtype=jnp.int32),
        n_programs=p, n_chunks=nc, chunk_g=g, rb=rb, ct=ct,
        shape=(p * rb, n), nnz_real=p * nc * g)


def _synthetic_radix(p, nc, g, rb, S, kt, mode, n, seed=0):
    import jax.numpy as jnp

    from tpusparse.kernels.radix_gather import RadixFormat, radix_geometry

    spr, _, ngrp = radix_geometry(kt, mode)
    align = 8 * spr
    W = S * spr
    rng = np.random.default_rng(seed)
    c0 = (rng.integers(0, max((n - W) // align, 1), (p, 1, nc)) * align).astype(np.int32)
    cols = rng.integers(0, W, (p, nc, g)).astype(np.int32)
    lrow = rng.integers(0, rb, (p, nc, g)).astype(np.int32)
    vals = rng.standard_normal((p, nc, g)).astype(np.float32)
    return RadixFormat(
        c0=jnp.asarray(c0), cols=jnp.asarray(cols), lrow=jnp.asarray(lrow),
        vals=jnp.asarray(vals),
        nc_p=jnp.full((p, 1, 1), nc, dtype=jnp.int32),
        slot_of_origrow=jnp.arange(p * rb, dtype=jnp.int32),
        n_programs=p, n_chunks=nc, chunk_g=g, rb=rb, S=S, kt=kt, mode=mode,
        shape=(p * rb, n), nnz_real=p * nc * g)


def _synthetic_dgt(p, nc, g, rb, kt, mode, nw, n, seed=0, resid=True):
    """Uniform full dgt chunks (timing only; vals random)."""
    import jax.numpy as jnp

    from tpusparse.kernels.dgt_gather import DgtFormat, dgt_geometry

    nhl, ngrp = dgt_geometry(kt, mode)
    rbs = rb // ngrp
    T = g // 128
    rng = np.random.default_rng(seed)
    nwin = n // 128
    wins = rng.integers(0, max(nwin - nw, 1), (p, nc, T)).astype(np.int32)
    sel = rng.integers(0, nw, (p, nc, g))
    lane = rng.integers(0, 128, (p, nc, g))
    cols = (lane | (sel << 7)).astype(np.int32)
    lrw = rng.integers(0, rbs if resid else rb, (p, nc, g)).astype(np.int32)
    vals = rng.standard_normal((p, nc, g)).astype(np.float32)
    return DgtFormat(
        wins=jnp.asarray(wins), cols=jnp.asarray(cols), lrw=jnp.asarray(lrw),
        vals=jnp.asarray(vals),
        nc_p=jnp.full((p, 1, 1), nc, dtype=jnp.int32),
        slot_of_origrow=jnp.arange(p * rb, dtype=jnp.int32),
        n_programs=p, n_chunks=nc, chunk_g=g, rb=rb, kt=kt, mode=mode,
        resid=resid, nw=nw, shape=(p * rb, n), nnz_real=p * nc * g)


def measure_chunk_costs(quick: bool = False,
                        sections=("span", "radix", "dgt", "v4")) -> list[dict]:
    """Time the span / radix / dgt chunk loops on synthetic uniform formats.
    us/chunk isolates the structural per-chunk cost (the padding factor is
    exactly 1 here).  The dgt rows include the streamed-rowhot variant
    (VERDICT r2 #1 option (i)): scatter planes DMA'd instead of rebuilt."""
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn
    from tpusparse.kernels.dgt_gather import dgt_spmm, pack_rowhot
    from tpusparse.kernels.radix_gather import radix_spmm
    from tpusparse.kernels.span_gather import span_spmm

    n = 32768
    p, nc = 64, 32
    rows = []
    span_cfgs = [(512, 1024, 512, 8), (512, 512, 512, 8), (256, 1024, 512, 8)]
    radix_cfgs = [(1024, 128, 512, 8), (512, 128, 512, 8), (1024, 64, 512, 8),
                  (1024, 128, 512, 1)]
    if quick:
        span_cfgs, radix_cfgs = span_cfgs[:1], radix_cfgs[:2]
    if "span" not in sections:
        span_cfgs = []
    if "radix" not in sections:
        radix_cfgs = []
    for rb, ct, g, kt in span_cfgs:
        fmt = _synthetic_span(p, nc, g, rb, ct, n)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((n, kt)),
                        jnp.float32)
        sec = time_fn(lambda xv: span_spmm(fmt, xv), x, iters=10)
        us = sec / (p * nc) * 1e6
        rows.append({
            "metric": "chunk_cost", "kernel": "span", "rb": rb, "ct": ct,
            "g": g, "kt": kt, "us_per_chunk": round(us, 3),
            "cyc_per_nz": round(us * 1e-6 * V5E_CLOCK_HZ / g, 3),
        })
        _log(rows[-1])
    for rb, S, g, kt in radix_cfgs:
        fmt = _synthetic_radix(p, nc, g, rb, S, kt, "fp32x2", n)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((n, kt)),
                        jnp.float32)
        sec = time_fn(lambda xv: radix_spmm(fmt, xv), x, iters=10)
        us = sec / (p * nc) * 1e6
        rows.append({
            "metric": "chunk_cost", "kernel": "radix", "rb": rb, "S": S,
            "g": g, "kt": kt, "us_per_chunk": round(us, 3),
            "cyc_per_nz": round(us * 1e-6 * V5E_CLOCK_HZ / g, 3),
        })
        _log(rows[-1])
    dgt_cfgs = [(256, 512, 8, 4, False), (256, 512, 8, 4, True),
                (512, 512, 8, 4, False), (256, 512, 8, 8, False)]
    if quick:
        dgt_cfgs = dgt_cfgs[:2]
    if "dgt" not in sections:
        dgt_cfgs = []
    for rb, g, kt, nw, stream in dgt_cfgs:
        fmt = _synthetic_dgt(p, nc, g, rb, kt, "fp32x2", nw, n)
        rh = pack_rowhot(fmt) if stream else None
        x = jnp.asarray(np.random.default_rng(2).standard_normal((n, kt)),
                        jnp.float32)
        sec = time_fn(lambda xv: dgt_spmm(fmt, xv, rowhot=rh, unroll=8,
                                          fold=False),
                      x, iters=10)
        us = sec / (p * nc) * 1e6
        rows.append({
            "metric": "chunk_cost", "kernel": "dgt", "rb": rb, "g": g,
            "kt": kt, "nw": nw, "stream_rowhot": stream,
            "us_per_chunk": round(us, 3),
            "cyc_per_nz": round(us * 1e-6 * V5E_CLOCK_HZ / g, 3),
        })
        _log(rows[-1])
    # round-4 variants (VERDICT r3 #2): in-kernel fold + the fullrow
    # scatter (psel option (c)).  Options (a) streamed-rowhot and (b)
    # repmul/pltpu.repeat are refuted — (a) by measurement (0.30 vs 0.18
    # cyc/nz above), (b) by the Mosaic compiler (pltpu.repeat of the
    # (2kt, G) bf16 c2 crashes tpu_compile_helper on v5e; the wide-span
    # single gather likewise dies in _gather_lowering_rule — see
    # kernels/dgt_gather._dgt_fill docstring).
    v4_cfgs = [
        # (rb, g, kt, nw, resid, scatter, fold, rowhot_i8)
        (256, 512, 8, 4, True, "select", True, False),   # in-kernel fold
        (256, 512, 8, 8, True, "select", True, False),   # fold at nw=8
        (256, 512, 8, 4, True, "fullrow", True, False),  # psel option (c)
        (512, 512, 8, 8, False, "fullrow", True, False),
        (256, 512, 8, 8, False, "fullrow", True, False),
        (256, 512, 8, 4, False, "fullrow", True, False),
        # round-5 C4 (bench/formulations.py): int8 scatter one-hot — the
        # only formulation-table candidate that survived to a build
        (256, 512, 8, 4, True, "select", True, True),
        (256, 512, 8, 8, True, "select", True, True),
    ]
    if quick:
        v4_cfgs = v4_cfgs[:3]
    if "v4" not in sections:
        v4_cfgs = []
    for rb, g, kt, nw, resid, scatter, fold, ri8 in v4_cfgs:
        fmt = _synthetic_dgt(p, nc, g, rb, kt, "fp32x2", nw, n, resid=resid)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((n, kt)),
                        jnp.float32)
        row = {
            "metric": "chunk_cost", "kernel": "dgt", "rb": rb, "g": g,
            "kt": kt, "nw": nw, "resid": resid,
            "scatter": scatter, "fold": fold,
        }
        if ri8:
            row["rowhot_i8"] = True
        try:
            sec = time_fn(lambda xv: dgt_spmm(fmt, xv, unroll=8,
                                              scatter=scatter, fold=fold,
                                              rowhot_i8=ri8),
                          x, iters=10)
            us = sec / (p * nc) * 1e6
            row.update(us_per_chunk=round(us, 3),
                       cyc_per_nz=round(us * 1e-6 * V5E_CLOCK_HZ / g, 3))
        except Exception as e:  # a variant a compiler rejects is a DATUM
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        rows.append(row)
        _log(rows[-1])
    return rows


def measure_index_compression(size: int = 8192) -> list[dict]:
    """Model-driven index compression on/off (reference arr_optimization):
    a uniform matrix's stripe lrow array follows a closed form
    (cycle_increase), so the kernel can compute the row index instead of
    loading it from SMEM.  Times both paths on the same format — the
    measured answer to whether compression ever fires and helps
    (VERDICT r1 weak #9)."""
    import jax.numpy as jnp

    from tpusparse.bench.harness import gflops, time_fn
    from tpusparse.config import config_override
    from tpusparse.generator import build_stripe_plan
    from tpusparse.io import builder
    from tpusparse.transforms.compress import detect_compression

    mat = builder.uniform_coo(size, size, nnz_per_row=16, seed=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((size, 8)),
                    jnp.float32)
    rows = []
    for on in (True, False):
        with config_override(model_driven_index_compress=on):
            plan = build_stripe_plan(mat, work_per_stripe=1024, unroll=8)
            lrow = np.asarray(plan.formats[0].lrow)[0, 0]
            kind = detect_compression(lrow).kind
            np.asarray(plan(x))
            sec = time_fn(plan.fn, x, iters=10)
        rows.append({
            "metric": "index_compression", "enabled": on,
            "detected": kind if on else None,
            "gflops": round(gflops(mat.nnz, 8, sec), 3),
            "seconds": sec,
        })
        _log(rows[-1])
    return rows


# The window the round-2/3 narrative numbers were measured in (MICROBENCH
# r2 rows): the anchor for cross-session normalization.  Chosen once and
# frozen — normalized numbers answer "what would this run have measured in
# the round-2 window", making round-over-round headlines comparable.
# vpu_vfma_gops was first probed in round 5 (no r2 measurement exists);
# its anchor is the median of the 9 readings of the first clean round-5
# chip session (2026-08-20: 2.10-3.04, median 2.60 Gvreg-fma/s ~ 2.8
# vregs/cyc at 940 MHz — consistent with sol.py's fitted effective rate
# 1.8-2.2 under real kernel conditions and a ~4/cyc physical peak).
REF_WINDOW = {"stream_gbs": 454.6, "mxu_tflops": 187.2,
              "vpu_vfma_gops": 2.60}

# Physical plausibility bounds for probe readings (VERDICT r4 weak #1: the
# round-4 flagship artifact shipped an MXU reading of 328 TF/s — above the
# v5e bf16 peak of ~197 — and the broken norm poisoned the committed
# headline).  The reference rejects implausible measurements outright
# (GFLOPS_UP_BOUND, executor.cc:51-55); we do the same at the calibration
# layer: a reading outside its bound triggers a median-of-3 remeasure, and
# if the median is still implausible the probe is flagged and NO norm is
# emitted for that axis (an honest raw number beats a poisoned normalized
# one).  Upper MXU bound = v5e bf16 peak ~197 TF/s.  VPU unit is
# Gvreg-fma/s: measured ~2.6 (~2.8 vregs/cyc at 940 MHz); physical peak
# ~4/cyc ~ 3.8, upper bound 8 is comfortably beyond it; readings under
# 1.0 mean the probe degenerated to loop-carry VMEM traffic (the bare
# fori_loop formulation measured 0.39 on chip).
PROBE_BOUNDS = {
    "stream_gbs": (100.0, 600.0),   # spec sheet 819 never measured >530
    "mxu_tflops": (50.0, 200.0),    # physical bf16 peak ~197
    "vpu_vfma_gops": (1.0, 8.0),
}


def _guarded(name: str, measure, extract,
             min_reads: int = 1) -> tuple[float, dict]:
    """Run ``measure`` ``min_reads`` times (default once); if the filtered
    median falls outside PROBE_BOUNDS[name], remeasure up to 3 total
    readings and re-take the median.  Readings ABOVE the upper bound are
    physically impossible (faster than the hardware peak — a timing-slope
    misfire, the round-4 328 TF/s failure) and are dropped before the
    median; readings below the lower bound could in principle be real
    throttling, so they are kept and can only be outvoted.  Returns
    (value, info) where info records any violation and, for
    ``min_reads > 1``, the raw readings.

    ``min_reads=3`` exists for the VPU axis: its single readings swung
    1.9–3.1 Gvreg-fma/s between back-to-back in-bounds sessions (r5 grid
    run), so one reading is not a usable normalizer even when plausible —
    the median of 3 is taken ALWAYS, not just on bound violation."""
    lo, hi = PROBE_BOUNDS[name]
    row = measure()
    readings = [float(extract(row))]
    for _ in range(min_reads - 1):
        try:
            readings.append(float(extract(measure())))
        except Exception as e:  # a failed read is itself a datum
            _log(f"probe read {name} failed: {type(e).__name__}: {e}")
    first = readings[0]
    sane = [r for r in readings if r <= hi]
    val = float(np.median(sane if sane else readings))
    info: dict = {"row": row}
    if min_reads > 1:
        info["readings"] = list(readings)
    if lo <= val <= hi and len(sane) == len(readings):
        return val, info
    while len(readings) < 3:
        try:
            readings.append(float(extract(measure())))
        except Exception as e:  # a failed remeasure is itself a datum
            _log(f"probe remeasure {name} failed: {type(e).__name__}: {e}")
    sane = [r for r in readings if r <= hi]
    med = float(np.median(sane if sane else readings))
    info["violation"] = {"first": first, "readings": readings,
                         "bounds": [lo, hi]}
    if min_reads > 1:
        info["readings"] = list(readings)
    if lo <= med <= hi:
        _log(f"probe {name}: reading(s) outside [{lo},{hi}], "
             f"filtered median {med} of {readings} accepted")
        return med, info
    _log(f"probe {name}: IMPLAUSIBLE after retry (median {med} of "
         f"{readings}) — axis flagged, no norm emitted")
    info["implausible"] = True
    return med, info


def session_probe() -> dict:
    """~15 s HBM-stream + MXU + VPU probe recorded at the top of every
    bench session (VERDICT r3 #3): identical configs measured 0.38 ->
    0.67 ms in machine windows hours apart, so absolute GF/s numbers are
    meaningless across sessions without a same-session calibration.

    Every reading is plausibility-gated (PROBE_BOUNDS): out-of-bounds
    readings are remeasured (median of 3) and, if still implausible, the
    axis is flagged and its norm omitted rather than recorded broken
    (VERDICT r4 #1; reference GFLOPS_UP_BOUND, executor.cc:51-55).

    Returns the measured numbers plus per-axis normalization factors to
    the frozen REF_WINDOW: ``norm`` (MXU axis — compute-bound kernels),
    ``norm_stream`` (HBM axis — bandwidth-bound), ``norm_vpu`` (VPU axis
    — what bench/sol.py says binds the gather families).  Callers pick
    the axis matching the measured kernel's bound (bench.py does this per
    winner family)."""
    import jax

    if jax.default_backend() != "tpu":
        return {"backend": jax.default_backend(), "norm": 1.0}
    out = {"metric": "session_probe"}
    implausible = []

    stream, s_info = _guarded("stream_gbs", measure_hbm,
                              lambda r: r["stream_gbs"])
    out["stream_gbs"] = stream
    out["reduce_gbs"] = float(s_info["row"].get("reduce_gbs", 0.0))
    tflops, m_info = _guarded("mxu_tflops", measure_mxu,
                              lambda r: r["tflops"])
    out["mxu_tflops"] = tflops
    # VPU: median-of-3 ALWAYS — in-bounds single readings swung 1.9-3.1
    # between back-to-back r5 sessions, too noisy to normalize by alone
    vpu, v_info = _guarded("vpu_vfma_gops", measure_vpu,
                           lambda r: r["gops"], min_reads=3)
    out["vpu_vfma_gops"] = vpu
    if "readings" in v_info:
        out["vpu_readings"] = [round(r, 3) for r in v_info["readings"]]
    out["ref_window"] = dict(REF_WINDOW)
    for name, val, info, norm_key, ref in (
            ("stream_gbs", stream, s_info, "norm_stream",
             REF_WINDOW["stream_gbs"]),
            ("mxu_tflops", tflops, m_info, "norm",
             REF_WINDOW["mxu_tflops"]),
            ("vpu_vfma_gops", vpu, v_info, "norm_vpu",
             REF_WINDOW.get("vpu_vfma_gops"))):
        if info.get("implausible"):
            implausible.append(name)
            out[norm_key] = None
        elif ref:
            out[norm_key] = round(ref / max(val, 1e-9), 4)
        else:
            out[norm_key] = None  # axis has no frozen anchor yet
        if "violation" in info:
            out.setdefault("violations", {})[name] = info["violation"]
    if implausible:
        out["implausible"] = implausible
    return out


def roofline_bandwidth_gbs(refresh: bool = False) -> float:
    """Measured stream bandwidth, cached per machine under cache_dir.
    Used by the suite to report pct_roofline against real numbers instead
    of the spec sheet."""
    from tpusparse.config import get_config

    cfg = get_config()
    path = os.path.join(cfg.cache_dir, "microbench.json")
    if not refresh and os.path.exists(path):
        try:
            with open(path) as f:
                return float(json.load(f)["stream_gbs"])
        except Exception:
            pass
    import jax

    if jax.default_backend() != "tpu":
        return 0.0  # CPU CI: no meaningful roofline
    row = measure_hbm()
    os.makedirs(cfg.cache_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(row, f)
    return float(row["stream_gbs"])


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="MICROBENCH.jsonl")
    args = ap.parse_args(argv)

    rows = [measure_hbm(), measure_mxu(), measure_vpu()]
    for r in rows:
        _log(r)
    rows += measure_chunk_costs(quick=args.quick)
    import time as _t

    with open(args.out, "a") as f:
        for r in rows:
            r["ts"] = _t.time()
            f.write(json.dumps(r) + "\n")
    # refresh the cached roofline number alongside
    from tpusparse.config import get_config

    cfg = get_config()
    os.makedirs(cfg.cache_dir, exist_ok=True)
    with open(os.path.join(cfg.cache_dir, "microbench.json"), "w") as f:
        json.dump(rows[0], f)
    print(json.dumps({"wrote": args.out, "rows": len(rows)}))


if __name__ == "__main__":
    main()
