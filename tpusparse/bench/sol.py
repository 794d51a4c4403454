"""Per-family speed-of-light table (VERDICT r3 #7).

For each gather family this module counts, from the kernel's actual dot
shapes and vector ops per chunk:

  mxu_macs   multiply-accumulates issued to the MXU per chunk (dot shapes
             as lowered: out_rows x out_lanes x contraction, operands
             padded to the 8x128 register tile)
  vpu_vregs  32-bit-equivalent vector registers touched per chunk by the
             non-dot work (one-hot compares, selects, gathers, converts,
             concats) — bf16 values count half a register per (8,128)

and converts them to a cyc/nz floor two ways:

  mxu floor  mxu_macs / MXU_MACS_PER_CYC (from the MEASURED 187 TF/s at
             the nominal 940 MHz convention every chunk-cost row uses:
             187e12/2 MACs/s / 940e6 cyc/s ~ 99.5k MACs/cyc)
  vpu floor  vpu_vregs / VPU_VREGS_PER_CYC, with the issue rate FITTED
             once from the measured select-scatter dgt row (the only free
             parameter; everything else is counted, not fitted)

The bigger floor is the family's speed of light; measured/floor says how
much headroom a better schedule of the same math could still find, and
comparing floors across families says which family can win before
building it.  Run: python -m tpusparse.bench.sol [--microbench path]
"""

from __future__ import annotations

import dataclasses
import json

MXU_TFLOPS_MEASURED = 187.0
CYC_HZ = 940e6  # the repo-wide cyc/nz convention (microbench.py)
MXU_MACS_PER_CYC = MXU_TFLOPS_MEASURED * 1e12 / 2 / CYC_HZ


def _vregs(rows: int, lanes: int, *, bits: int = 32) -> float:
    """Vector registers touched by one op over a (rows, lanes) value."""
    reg_rows = 8 * 32 // bits  # f32: 8 sublanes; bf16: 16; i32: 8
    return max(rows / reg_rows, 1.0) * max(-(-lanes // 128), 1)


@dataclasses.dataclass
class Cost:
    mxu_macs: float
    vpu_vregs: float
    note: str = ""


def dgt_cost(g=512, rb=256, kt=8, nw=4, ngrp=8, nhl=2, scatter="select",
             fold=True) -> Cost:
    """Per-chunk counts for the dgt kernel variants (kernels/dgt_gather)."""
    T = g // 128
    q = nhl * kt
    rbs = rb // ngrp
    v = 0.0
    # col plane decode: broadcast colw (1,G)->(8,G), mask+shift
    v += 3 * _vregs(8, g)
    # gathers: per tile nw take_along_axis (kt,128) + (nw-1) selects + se cmp
    v += T * (nw * _vregs(kt, 128) + (nw - 1) * 2 * _vregs(kt, 128))
    v += T * _vregs(kt, 128)  # concat parts -> (kt, G) writes
    # product + fp32x2 split
    v += _vregs(kt, g)                       # xg * v
    v += 3 * _vregs(kt, g) * (nhl - 1)       # split_bf16 (mask,sub,cast)
    v += _vregs(q, g, bits=16)               # c2 concat write
    mxu = 0.0
    if scatter == "fullrow":
        # lrow reconstruct (1,G)*2 + (rb,G) compare + select-to-bf16
        v += 2 * _vregs(8, g)
        v += _vregs(rb, g) + _vregs(rb, g, bits=16)
        mxu += rb * q * g                    # (rb,G)x(q,G) -> (rb,q)
        if fold and nhl == 2:
            mxu += rb * kt * q               # E2 fold (HIGHEST ~6 passes)
    else:
        # psel: concat replicate (128,G) bf16 + masked select
        v += 2 * _vregs(128, g, bits=16)
        # rowhot compare (rbs,G) i32 + to bf16
        v += _vregs(rbs, g) + _vregs(rbs, g, bits=16)
        mxu += rbs * 128 * g                 # (rbs,G)x(128,G) -> (rbs,128)
        if fold and nhl == 2:
            mxu += rbs * (ngrp * kt) * 128 * 6  # f32 HIGHEST fold, 6 passes
    return Cost(mxu, v)


def dg_cost(g=512, rb=256, kt=8, ns=8, ngrp=8, nhl=2) -> Cost:
    """dg_gather: ns-window select tree + dynamic (128,G) group mask."""
    T = g // 128
    q = nhl * kt
    rbs = rb // ngrp
    v = 3 * _vregs(8, g)
    v += T * (ns * _vregs(kt, 128) + (ns - 1) * 2 * _vregs(kt, 128))
    v += T * _vregs(kt, 128)
    v += _vregs(kt, g) + 3 * _vregs(kt, g) * (nhl - 1) + _vregs(q, g, bits=16)
    # psel concat + DYNAMIC group mask compare + select
    v += _vregs(128, g) + 2 * _vregs(128, g, bits=16)
    v += _vregs(rbs, g) + _vregs(rbs, g, bits=16)
    return Cost(rbs * 128 * g, v)


def radix_cost(g=512, rb=1024, kt=8, S=128, ngrp=8, spr=8) -> Cost:
    """radix_gather: lane-packed X; three full-lane dots per chunk."""
    rbs = rb // ngrp
    v = 0.0
    v += 3 * _vregs(8, g)                    # col decode
    v += _vregs(S, g, bits=16)               # gather one-hot build (S,G)
    v += _vregs(g, 128, bits=16)             # collapse/select plane
    v += _vregs(rbs, g) + _vregs(rbs, g, bits=16)  # scatter one-hot
    mxu = S * kt * 2 * g                     # gather dot (S,G)x(2kt? approx)
    mxu += 128 * g * 2 * kt                  # fixed collapse
    mxu += rbs * 128 * g                     # scatter dot
    return Cost(mxu, v)


def span_cost(g=512, rb=512, ct=1024, kt=8) -> Cost:
    """span_onehot: (CT,G) column one-hot + (RB,G) row one-hot dots."""
    v = _vregs(ct, g) + _vregs(ct, g, bits=16)   # colhot compare+cast
    v += _vregs(rb, g) + _vregs(rb, g, bits=16)  # rowhot
    v += 2 * _vregs(2 * kt, g)                   # product + split
    mxu = ct * g * 2 * kt + rb * g * 2 * kt
    return Cost(mxu, v)


FAMILIES = {
    "dgt(select,fold,nw4)": lambda: dgt_cost(scatter="select", nw=4),
    "dgt(select,fold,nw8)": lambda: dgt_cost(scatter="select", nw=8),
    "dgt(fullrow,nw4)": lambda: dgt_cost(scatter="fullrow", nw=4),
    "dgt(fullrow,rb512,nw8)": lambda: dgt_cost(scatter="fullrow", rb=512, nw=8),
    "dg(ns8)": lambda: dg_cost(),
    "radix(S128)": lambda: radix_cost(),
    "span(ct1024)": lambda: span_cost(),
}

# Which probed hardware axis binds each schedule family (from the floor
# table: every gather family except radix has vpu_floor > mxu_floor).
# bench.py uses this to pick the window-normalization axis for the winner
# (VERDICT r4 weak #3: normalizing a VPU-bound kernel by the MXU probe
# lets a legitimate MXU window swing distort a headline that barely uses
# the MXU).  Keys are the schedule-family prefixes as they appear in
# candidate/winner names.
BOUND_AXIS = {
    "dg": "vpu", "dgt": "vpu", "span": "vpu", "stripe": "vpu",
    "segment": "vpu", "bucketed": "vpu", "nested": "vpu",
    "radix": "mxu", "tile": "mxu", "dense": "mxu", "nm": "mxu",
    "block_ell": "mxu", "bcoo": "stream",
}


def bound_axis_for(winner_name: str) -> str:
    """Map a candidate/winner label (e.g. 'dg rb=512 ns=8 ...') to the
    hardware axis that bounds it: 'vpu' | 'mxu' | 'stream'."""
    head = winner_name.split()[0].split("_")[0].lower()
    return BOUND_AXIS.get(head, "mxu")


def fit_vpu_rate_lsq(meas: dict[str, float], g: int = 512,
                     families: list[str] | None = None) -> dict:
    """Least-squares fit of the VPU vreg issue rate over every measured
    VPU-bound row (VERDICT r4 weak #4: the single-anchor fit hung the
    whole floor table on one noisy measurement).

    Serial model per row: measured_cyc = mxu_cyc + vregs / rate, i.e.
    y_i = (1/rate) * v_i with y_i = meas_i*g - mxu_cyc_i.  The slope
    b = 1/rate minimizing sum((y_i - b v_i)^2) is sum(v y)/sum(v^2); the
    slope's standard error gives a rate interval, and per-row residuals
    (plus each row's implied rate) are reported so a bad row is visible
    instead of silently absorbed."""
    if families is None:
        families = [f for f in FAMILIES
                    if f in meas and (f.startswith(("dgt", "dg(", "span")))]
    ys, vs, used = [], [], []
    for name in families:
        if name not in meas:
            continue
        c = FAMILIES[name]()
        y = meas[name] * g - c.mxu_macs / MXU_MACS_PER_CYC
        if y <= 0:
            continue
        ys.append(y)
        vs.append(c.vpu_vregs)
        used.append(name)
    if len(used) < 2:
        return {"ok": False, "n_rows": len(used)}
    svv = sum(v * v for v in vs)
    b = sum(v * y for v, y in zip(vs, ys)) / svv
    resid = [y - b * v for v, y in zip(vs, ys)]
    dof = max(len(used) - 1, 1)
    se_b = (sum(r * r for r in resid) / dof / svv) ** 0.5
    rate = 1.0 / b
    lo = 1.0 / (b + se_b)
    hi = 1.0 / max(b - se_b, 1e-12)
    rows = [{
        "family": n,
        "implied_rate": round(v / y, 3),
        "rel_residual": round(r / y, 3),
    } for n, v, y, r in zip(used, vs, ys, resid)]
    return {"ok": True, "n_rows": len(used), "rate": round(rate, 3),
            "rate_lo": round(lo, 3), "rate_hi": round(hi, 3),
            "slope_se_rel": round(se_b / b, 3), "rows": rows}


def table(vpu_vregs_per_cyc: float | None = None,
          measured: dict[str, float] | None = None, g: int = 512,
          rate_bounds: tuple[float, float] | None = None,
          families: dict | None = None):
    """Rows of (family, mxu_floor, vpu_floor, floor, measured, ratio).
    ``measured`` maps family -> measured cyc/nz.  ``rate_bounds``
    (rate_lo, rate_hi) from the least-squares fit turns every VPU floor
    into an interval — the fit uncertainty carried into the table instead
    of dropped (VERDICT r4 #6)."""
    measured = measured or {}
    rows = []
    for name, fn in (families or FAMILIES).items():
        c = fn()
        mxu_f = c.mxu_macs / MXU_MACS_PER_CYC / g
        vpu_f = (c.vpu_vregs / vpu_vregs_per_cyc / g
                 if vpu_vregs_per_cyc else None)
        floor = max(mxu_f, vpu_f or 0.0)
        got = measured.get(name)
        row = {
            "family": name,
            "mxu_macs_per_chunk": int(c.mxu_macs),
            "vpu_vregs_per_chunk": round(c.vpu_vregs, 1),
            "mxu_floor_cyc_nz": round(mxu_f, 4),
            "vpu_floor_cyc_nz": round(vpu_f, 4) if vpu_f else None,
            "floor_cyc_nz": round(floor, 4),
            "measured_cyc_nz": got,
            "measured_over_floor": round(got / floor, 2) if got and floor else None,
        }
        if rate_bounds and vpu_vregs_per_cyc:
            # higher rate -> lower floor, so lo/hi swap through the inverse
            f_lo = max(mxu_f, c.vpu_vregs / rate_bounds[1] / g)
            f_hi = max(mxu_f, c.vpu_vregs / rate_bounds[0] / g)
            row["floor_cyc_nz_lo"] = round(f_lo, 4)
            row["floor_cyc_nz_hi"] = round(f_hi, 4)
        rows.append(row)
    return rows


def fit_vpu_rate(measured_cyc_nz: float,
                 family: str = "dgt(select,fold,nw4)",
                 g: int = 512) -> float:
    """Fit the one free parameter (VPU vreg issue rate) from one measured
    row: rate = vregs / (measured cycles - mxu cycles)."""
    c = FAMILIES[family]()
    mxu_cyc = c.mxu_macs / MXU_MACS_PER_CYC
    vpu_cyc = measured_cyc_nz * g - mxu_cyc
    return c.vpu_vregs / max(vpu_cyc, 1e-9)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--microbench", default="MICROBENCH.jsonl")
    ap.add_argument("--fit-family", default="dgt(select,fold,nw4)")
    args = ap.parse_args(argv)

    # min measured chunk cost per family from the jsonl (the repo's
    # min-time convention; cross-window rows make min the honest pick)
    meas: dict[str, float] = {}

    def put(key, r):
        if "cyc_per_nz" in r:
            meas[key] = min(meas.get(key, 1e9), r["cyc_per_nz"])

    try:
        with open(args.microbench) as f:
            for line in f:
                r = json.loads(line)
                if r.get("metric") != "chunk_cost":
                    continue
                k = r.get("kernel")
                if k == "dgt" and r.get("scatter") == "select" and r.get("fold"):
                    put(f"dgt(select,fold,nw{r.get('nw')})", r)
                elif (k == "dgt" and r.get("scatter") == "fullrow"
                      and r.get("rb") == 256 and r.get("nw") == 4):
                    put("dgt(fullrow,nw4)", r)
                elif (k == "dgt" and r.get("scatter") == "fullrow"
                      and r.get("rb") == 512):
                    put("dgt(fullrow,rb512,nw8)", r)
                elif k == "radix" and r.get("S") == 128 and r.get("kt") == 8 \
                        and r.get("rb") == 1024:
                    put("radix(S128)", r)
                elif k == "span" and r.get("ct") == 1024 and r.get("rb") == 512:
                    put("span(ct1024)", r)
    except FileNotFoundError:
        pass
    # multi-row least-squares fit (r5); single-anchor fallback if <2 rows
    lsq = fit_vpu_rate_lsq(meas)
    if lsq.get("ok"):
        rate = lsq["rate"]
        bounds = (lsq["rate_lo"], lsq["rate_hi"])
        anchor = f"lsq over {lsq['n_rows']} rows"
    else:
        rate = (fit_vpu_rate(meas[args.fit_family], args.fit_family)
                if args.fit_family in meas else None)
        bounds = None
        anchor = args.fit_family
    rows = table(rate, meas, rate_bounds=bounds)
    out = {"vpu_vregs_per_cyc_fitted": round(rate, 3) if rate else None,
           "fit_anchor": anchor, "fit": lsq if lsq.get("ok") else None,
           "mxu_macs_per_cyc": round(MXU_MACS_PER_CYC, 0), "rows": rows}
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
