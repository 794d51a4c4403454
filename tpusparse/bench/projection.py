"""Multi-chip scaling PROJECTION from single-chip measurements (VERDICT
r4 #5 / BASELINE.md config #5).

Real multi-chip runs are environment-impossible here (one v5e behind the
axon tunnel), so the honest config-#5 deliverable is a clearly-labeled
model built from quantities this environment CAN measure:

  T_bucket(d)   on-chip time of one (device, ring-chunk) bucket kernel of
                the dgt halo ring at d devices.  Every bucket is padded to
                the identical [P, NC, G] shape, and Mosaic kernel time is
                shape-driven, so ONE bucket timing gives the per-step
                compute of every step (the greedy deal balances real nnz;
                padding_rate already prices the imbalance).
  T1            single-chip dgt kernel time on the same matrix (the
                denominator of scaling efficiency).

and one assumption bracket:

  ICI_GBS       v5e inter-chip one-way link bandwidth.  Public figures
                for the v5e 2D torus cluster around ~45 GB/s per link
                direction; we bracket with 45 (conservative) and 90
                (optimistic, 2-link striping) and label both.
  STEP_LAT_US   per-step ppermute launch/latency overhead (~3 us).

Ring model (dist/overlap._build_ring): d steps; at each step a device
computes one bucket while ppermuting its X chunk ((n/d) * kt * 4 bytes):

  T(d)   = d * max(T_bucket(d), chunk_bytes / ICI + L)
  eff(d) = nnz/s(d) / (d * nnz/s(1)) = T1 / (d * T(d))

The same bucket harness times scatter='select' (resid=True pack) vs
'fullrow' (resid=False) on real ring-bucket shapes — the measurement
behind the ring's scatter choice (VERDICT r4 weak #6), which round 4
asserted from padding alone.

Run on the real chip: python -m tpusparse.bench.projection [--quick]
Appends measurement + projection rows to MULTICHIP_SCALING.json.
"""

from __future__ import annotations

import json
import sys

import numpy as np

ICI_GBS_BRACKET = (45.0, 90.0)
STEP_LAT_US = 3.0


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_ring_bucket(fmt, x_chunk, *, scatter: str, unroll: int = 8,
                     device: int = 0, chunk: int = 0, reps: int = 3) -> float:
    """Seconds for ONE (device, ring-chunk) bucket kernel of a
    HaloDgtFormat on the attached chip — the per-step compute of the ring
    (all buckets share the padded shape, so any index works).

    Guarded like the session probe (the same slope-misfire mode put a
    literal 0.0 us bucket time into this harness's third driver run):
    readings below a physical floor (0.02 cyc per padded slot — several
    times faster than any measured kernel) are discarded, and the result
    is the median of ``reps`` plausible readings."""
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn
    from tpusparse.kernels.dgt_gather import _dgt_call

    subs = [jnp.asarray(np.asarray(a)[device, chunk])
            for a in (fmt.wins, fmt.cols, fmt.lrw, fmt.vals)]

    def call(xv):
        return _dgt_call(
            subs[0], subs[1], subs[2], subs[3], xv,
            P=fmt.programs_per_device, nc=fmt.n_chunks, g=fmt.chunk_g,
            rb=fmt.rb, kt=fmt.kt, mode=fmt.mode, resid=fmt.resid,
            nw=fmt.nw, unroll=unroll, scatter=scatter, fold=True,
            interpret=False,
        )

    slots = fmt.programs_per_device * fmt.n_chunks * fmt.chunk_g
    lo = slots * 0.02 / 940e6
    vals = []
    for _ in range(2 * reps):
        sec = time_fn(call, x_chunk, iters=64)
        if sec >= lo:
            vals.append(sec)
            if len(vals) >= reps:
                break
        else:
            _log(f"bucket timing misfire ({sec*1e6:.2f} us < floor "
                 f"{lo*1e6:.2f} us) — discarded")
    if not vals:
        raise RuntimeError(
            f"all bucket timings below the {lo*1e6:.2f} us physical floor")
    return float(np.median(vals))


def project(d: int, t_bucket_s: float, t1_s: float, n: int, kt: int,
            ici_gbs: float, step_lat_us: float = STEP_LAT_US) -> dict:
    """The ring model: T(d) = d * max(compute, comm), eff = T1/(d*T(d))."""
    chunk_bytes = (n // d) * kt * 4
    t_comm = chunk_bytes / (ici_gbs * 1e9) + step_lat_us * 1e-6
    t_step = max(t_bucket_s, t_comm)
    t_total = d * t_step
    return {
        "devices": d,
        "ici_gbs_assumed": ici_gbs,
        "t_bucket_us": round(t_bucket_s * 1e6, 2),
        "t_comm_us": round(t_comm * 1e6, 2),
        "bound": "compute" if t_bucket_s >= t_comm else "comm",
        "t_total_us": round(t_total * 1e6, 2),
        "projected_efficiency": round(t1_s / (d * t_total), 4),
        "projected_speedup": round(t1_s / t_total, 3),
    }


def run(quick: bool = False, m: int = 32768, avg: float = 32.0,
        label: str = "powerlaw32k") -> dict:
    import jax
    import jax.numpy as jnp

    from tpusparse.bench.harness import time_fn
    from tpusparse.bench.microbench import session_probe
    from tpusparse.dist.overlap import pack_halo_dgt
    from tpusparse.io import builder
    from tpusparse.kernels.dgt_gather import dgt_spmm, pack_dgt

    probe = session_probe()
    _log(f"probe: {probe}")

    # default: the headline workload (BASELINE config #1 class); --big
    # doubles the per-bucket nnz population 8x to show how much of the
    # efficiency loss is walk fill at small buckets
    n = m
    kt = 8
    mat = builder.power_law_coo(m, n, avg_nnz_per_row=avg, alpha=1.8,
                                seed=42)
    x = np.random.default_rng(0).standard_normal((n, kt)).astype(np.float32)
    xd = jnp.asarray(x)

    # T1 reference: the standalone single-chip dgt plan (different pack
    # geometry — reported for context only, NOT the efficiency
    # denominator: mixing geometries produced a nonsense superlinear
    # eff(2)=1.21 in the first driver run of this harness)
    fmt1 = pack_dgt(mat, rb=512, g=512, kt=kt, nw=8, resid=True,
                    walk="multi")
    t1_spmm = time_fn(lambda xv: dgt_spmm(fmt1, xv, unroll=8), xd, iters=16)
    _log(f"single-chip dgt_spmm: {t1_spmm*1e3:.3f} ms (pad "
         f"{fmt1.padding_rate:.2f})")

    # T1 denominator: the d=1 ring pack's one bucket — same kernel, same
    # g/rb geometry as every other d, so eff(d) is internally consistent
    fmt_1 = pack_halo_dgt(mat, 1, rows_per_program=512, g=256, kt=kt,
                          resid=True, nw=8, walk="multi")
    xc1 = jnp.asarray(np.pad(x, ((0, fmt_1.n_chunk_rows - n), (0, 0))))
    t1 = time_ring_bucket(fmt_1, xc1, scatter="select")
    _log(f"T1 (d=1 ring bucket, select): {t1*1e6:.2f} us (pad "
         f"{fmt_1.padding_rate:.3f})")

    d_list = (2, 4, 8) if not quick else (8,)
    out_rows = []
    ab_rows = []
    for d in d_list:
        tbs = {}
        for resid, scatter in ((False, "fullrow"), (True, "select")):
            fmt = pack_halo_dgt(mat, d, rows_per_program=512, g=256, kt=kt,
                                resid=resid, nw=8, walk="multi")
            xc = jnp.asarray(
                np.pad(x, ((0, fmt.n_chunk_rows * d - n), (0, 0)))
                [:fmt.n_chunk_rows])
            # t_bucket already includes padded slots (NC scales with the
            # pack's padding), so it is the honest per-step time; do NOT
            # multiply by padding_rate again
            tb = time_ring_bucket(fmt, xc, scatter=scatter)
            ab_rows.append({
                "metric": "ring_bucket_ab", "devices": d,
                "scatter": scatter, "resid": resid,
                "t_bucket_us": round(tb * 1e6, 2),
                "padding_rate": round(fmt.padding_rate, 3),
            })
            _log(ab_rows[-1])
            tbs[scatter] = tb
        best = min(tbs, key=tbs.get)
        for ici in ICI_GBS_BRACKET:
            row = project(d, tbs[best], t1, n, kt, ici)
            row["scatter"] = best
            out_rows.append(row)
            _log(row)
    return {"workload": {"label": label, "m": m, "avg_nnz_per_row": avg,
                        "nnz": mat.nnz},
            "probe": {k: probe.get(k) for k in
                      ("stream_gbs", "mxu_tflops", "vpu_vfma_gops",
                       "norm", "norm_stream", "norm_vpu")},
            "t1_d1_ring_bucket_us": round(t1 * 1e6, 2),
            "t1_single_chip_dgt_spmm_us": round(t1_spmm * 1e6, 2),
            "ring_bucket_ab": ab_rows,
            "projection": out_rows}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--big", action="store_true",
                    help="65536^2 avg-40 workload (8x bucket population)")
    ap.add_argument("--out", default="MULTICHIP_SCALING.json")
    args = ap.parse_args(argv)
    if args.big:
        res = run(quick=args.quick, m=65536, avg=40.0, label="powerlaw65k")
    else:
        res = run(quick=args.quick)

    # merge into MULTICHIP_SCALING.json: keep the CPU-interpret regression
    # rows but rename their perf-shaped field (VERDICT r4 weak #7)
    try:
        with open(args.out) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    for rows in doc.get("rings", {}).values():
        for r in rows:
            if "efficiency" in r:
                r["wallclock_ratio_cpu_interpret_NOT_PERF"] = r.pop(
                    "efficiency")
    doc["note"] = (
        "rings = correctness + overlap-shape regression on 8 VIRTUAL CPU "
        "devices; wallclock_ratio_cpu_interpret_NOT_PERF is interpreter "
        "wall-clock, NOT a performance number.  projection = the config-#5 "
        "scaling MODEL from real-chip bucket timings at the labeled ICI "
        "assumptions (see bench/projection.py; single physical chip in "
        "this environment).  Each efficiency divides two +-10%-noise "
        "timings, so values within ~0.9-1.1 of a round number are "
        "indistinguishable from it; a projected_efficiency slightly above "
        "1.0 means the d-device walk packed tighter than the d=1 walk, "
        "not free speedup.")
    import time as _t

    doc["projection_ts"] = _t.time()
    if args.big:
        doc["projection_big"] = res
    else:
        doc.update(res)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"wrote": args.out,
                      "projection": res["projection"],
                      "ring_bucket_ab": res["ring_bucket_ab"]}))


if __name__ == "__main__":
    main()
