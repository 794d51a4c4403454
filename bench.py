"""Headline benchmark (driver-run on real TPU hardware).

Config #1 of BASELINE.json: SpMM fp32, IG5-18-class sparse matrix x dense
N=8 — plus a small schedule sweep (the reference tuner's min-time selection,
token_test.cc:1625-1847).  Baseline = jax.experimental.sparse BCOO matmul
(the stock JAX sparse path, our cuSPARSE analogue on TPU).

Prints ONE JSON line: {"metric", "value" (GFLOP/s), "unit", "vs_baseline"}.
Detail goes to stderr.
"""

import json
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _supervised() -> int:
    """Run the real bench in a CHILD process and watch its output: the axon
    tunnel intermittently WEDGES a process's first RPC (the call never
    returns, no error — observed 3x on 2026-08-19/20: microbench, a scratch
    runner, and bench.py itself all stuck >25 min with ~0 CPU while fresh
    processes worked).  The parent kills a child that goes silent and
    retries with a fresh connection; the child's last stdout line (the JSON
    row) is forwarded."""
    import subprocess
    import time as _t

    stall_s = float(os.environ.get("TPUSPARSE_BENCH_STALL_S", "420"))
    tries = int(os.environ.get("TPUSPARSE_BENCH_TRIES", "3"))
    env = dict(os.environ, TPUSPARSE_BENCH_CHILD="1")
    last_json = None
    for attempt in range(1, tries + 1):
        log(f"[supervisor] attempt {attempt}/{tries}")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        os.set_blocking(child.stdout.fileno(), False)
        os.set_blocking(child.stderr.fileno(), False)

        def _drain(stream):
            try:
                return stream.read() or b""
            except (BlockingIOError, ValueError):
                return b""

        buf = b""
        last_progress = _t.monotonic()
        while True:
            chunk = _drain(child.stdout)
            if chunk:
                buf += chunk
                last_progress = _t.monotonic()
            err = _drain(child.stderr)
            if err:
                sys.stderr.buffer.write(err)
                sys.stderr.flush()
                last_progress = _t.monotonic()
            if child.poll() is not None:
                buf += _drain(child.stdout)
                sys.stderr.buffer.write(_drain(child.stderr))
                sys.stderr.flush()
                break
            if _t.monotonic() - last_progress > stall_s:
                log(f"[supervisor] child silent {stall_s:.0f}s — killing")
                child.kill()
                child.wait()
                break
            _t.sleep(2)
        for line in buf.decode("utf-8", "replace").splitlines():
            line = line.strip()
            if line.startswith("{"):
                last_json = line
        if child.returncode == 0 and last_json:
            print(last_json, flush=True)
            return 0
    if last_json:
        print(last_json, flush=True)
        return 0
    print(json.dumps({
        "metric": "spmm_fp32_powerlaw32k_k8_gflops", "value": 0.0,
        "unit": "GFLOP/s", "vs_baseline": 0.0,
        "error": "bench child stalled/failed on every attempt "
                 "(axon tunnel wedge)",
    }), flush=True)
    return 1


def _backend_reachable(timeout: float = 240.0) -> bool:
    """Probe the device backend in a subprocess: during an axon tunnel
    outage jax.devices() hangs *forever* (no error), which would hang the
    whole bench run.  The child is killed on timeout."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _backend_reachable():
        log("device backend unreachable (tunnel outage?) — emitting error row")
        print(json.dumps({
            "metric": "spmm_fp32_powerlaw32k_k8_gflops", "value": 0.0,
            "unit": "GFLOP/s", "vs_baseline": 0.0,
            "error": "TPU backend unreachable (jax.devices() probe timed out)",
        }))
        return

    import jax
    import jax.numpy as jnp

    from tpusparse.bench.baselines import bcoo_spmm_fn
    from tpusparse.bench.harness import gflops, time_fn
    from tpusparse.io import builder
    from tpusparse.oracle import check_result, spmm_reference

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    # per-session machine-window calibration (VERDICT r3 #3): recorded in
    # the output row so round-over-round headlines are comparable
    from tpusparse.bench.microbench import session_probe

    probe = session_probe()
    log(f"session probe: {probe}")

    # IG5-18-class workload: power-law graph matrix, K=8 fp32
    M = N = 32768
    K = 8
    mat = builder.power_law_coo(M, N, avg_nnz_per_row=32.0, alpha=1.8, seed=42)
    nnz = mat.nnz
    log(f"matrix: {M}x{N}, nnz={nnz} ({mat.density*100:.3f}% dense), K={K}")
    x = np.random.default_rng(0).standard_normal((N, K)).astype(np.float32)
    xd = jnp.asarray(x)

    # correctness oracle on a row sample
    want = spmm_reference(mat, x.astype(np.float64))

    # mini-tune over schedule candidates (reference: min-time over schedules)
    from tpusparse.generator import build_tile_plan

    from tpusparse.schedule import Schedule, build_plan
    from tpusparse.tune import _span_configs

    from tpusparse.tune import _radix_configs

    candidates = []
    for rb, ns, g, u in ((256, 8, 256, 8), (512, 8, 512, 8), (256, 8, 512, 8)):
        candidates.append((
            f"dg rb={rb} ns={ns} g={g} u={u}",
            lambda rb=rb, ns=ns, g=g, u=u: build_plan(
                mat, Schedule(family="dg_span", rb=rb, ns=ns, g=g,
                              unroll=u, ktile=8)
            ),
        ))
    # round-4: multi-open-tile walk (padding 1.42 -> 1.13 at rb=512 nw=8);
    # fullrow/repmul/wide scatter variants are refuted (PERF.md round 4);
    # g=1024 u=16 led run C2's medians (single run, overlapping ranges —
    # BENCH_AB_r04 Run C): a candidate for the min-time loop, not a claim
    # r5: the i8 twins are the promoted C4 formulation (BENCH_AB_r05:
    # run-2 separated win at nw4 + run-3 interleaved medians)
    for resid, rb, nw, g_c, u_c, i8 in ((True, 512, 8, 512, 8, False),
                                        (True, 512, 8, 1024, 16, False),
                                        (True, 256, 4, 512, 8, False),
                                        (True, 256, 8, 512, 8, False),
                                        (True, 256, 4, 512, 8, True),
                                        (True, 512, 8, 512, 8, True)):
        candidates.append((
            f"dgt resid={int(resid)} rb={rb} nw={nw} g={g_c} u={u_c} multi"
            + (" i8" if i8 else ""),
            lambda resid=resid, rb=rb, nw=nw, g_c=g_c, u_c=u_c, i8=i8:
            build_plan(
                mat, Schedule(family="dgt_span", rb=rb, nw=nw, resid=resid,
                              g=g_c, unroll=u_c, ktile=8, rowhot_i8=i8)
            ),
        ))
    for rb, S, g in _radix_configs(mat.density, 8)[:1] + [(1024, 128, 1024)]:
        name = f"radix rb={rb} S={S} g={g}"
        if any(n == name for n, _ in candidates):
            continue
        candidates.append((
            name,
            lambda rb=rb, S=S, g=g: build_plan(
                mat, Schedule(family="radix_span", rb=rb, sublanes=S, g=g,
                              unroll=4, ktile=8)
            ),
        ))
    for rb, ct, g in _span_configs(mat.density)[:1]:
        candidates.append((
            f"span rb={rb} ct={ct} g={g}",
            lambda rb=rb, ct=ct, g=g: build_plan(
                mat, Schedule(family="span_onehot", rb=rb, ct=ct, g=g, unroll=4)
            ),
        ))
    for rb, ct, g, u in ((1024, 1024, 512, 4),):
        candidates.append((
            f"tile rb={rb} ct={ct} g={g} u={u}",
            lambda rb=rb, ct=ct, g=g, u=u: build_tile_plan(
                mat, rb=rb, ct=ct, g=g, precision="fp32x2"
            ),
        ))
    best = None
    for name, make in candidates:
        try:
            plan = make()
            y = np.asarray(plan(xd))
            check_result(y, want, rtol=2e-3)
            sec = time_fn(plan.fn, xd, iters=10, warmup=1)
            g = gflops(nnz, K, sec)
            log(f"{name}: {sec*1e3:.3f} ms, {g:.2f} GFLOP/s, "
                f"pad={plan.meta['padding_rate']:.2f}")
            if best is None or sec < best[1]:
                best = (name, sec, g)
        except Exception as e:  # schedule candidates may be invalid; skip
            log(f"{name}: FAILED {type(e).__name__}: {e}")
    if best is None:
        print(json.dumps({"metric": "spmm_gflops", "value": 0.0, "unit": "GFLOP/s", "vs_baseline": 0.0}))
        return

    # baseline: BCOO
    try:
        bfn = bcoo_spmm_fn(mat)
        yb = np.asarray(bfn(xd))
        check_result(yb, want, rtol=1e-3)
        bsec = time_fn(bfn, xd, iters=10, warmup=1)
        bg = gflops(nnz, K, bsec)
        log(f"BCOO baseline: {bsec*1e3:.3f} ms, {bg:.2f} GFLOP/s")
    except Exception as e:
        log(f"BCOO baseline failed: {type(e).__name__}: {e}")
        bsec, bg = float("inf"), 0.0

    work, sec, g = best
    vs = sec and (bsec / sec if np.isfinite(bsec) else float("nan"))
    log(f"best: work={work} {g:.2f} GFLOP/s, speedup vs BCOO: {vs:.2f}x")
    out = {
        "metric": "spmm_fp32_powerlaw32k_k8_gflops",
        "value": round(g, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs, 3) if np.isfinite(vs) else None,
        "winner": work,
    }
    if probe.get("metric") == "session_probe":
        out["probe"] = {k: probe.get(k) for k in
                        ("stream_gbs", "mxu_tflops", "vpu_vfma_gops",
                         "norm", "norm_stream", "norm_vpu")}
        if probe.get("implausible"):
            out["probe"]["implausible"] = probe["implausible"]
        # normalize by the axis that bounds the WINNER family (sol.py
        # BOUND_AXIS): a VPU-bound gather headline must not be scaled by
        # an MXU window swing (VERDICT r4 weak #3).  If that axis has no
        # plausible reading or no frozen anchor, fall back down the
        # axis chain and record which axis was used; if nothing
        # plausible, omit the normalized value entirely — an honest raw
        # number beats a poisoned normalized one (VERDICT r4 weak #1).
        from tpusparse.bench.sol import bound_axis_for

        axis = bound_axis_for(work)
        key_of = {"vpu": "norm_vpu", "mxu": "norm", "stream": "norm_stream"}
        for ax in (axis, "stream", "mxu"):
            norm = probe.get(key_of[ax])
            if norm:
                out["norm_axis"] = ax if ax == axis else f"{ax} (fallback)"
                out["value_window_normalized"] = round(g * norm, 3)
                break
        else:
            out["normalized_omitted"] = "no plausible probe axis"
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("TPUSPARSE_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervised())
