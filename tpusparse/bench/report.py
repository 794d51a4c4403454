"""Evidence-grid reporter: JSONL rows -> the PERF.md markdown tables.

The reference's ``obtain_result.py`` (lines 1-85) closes its loop by
walking raw per-run artifacts and printing the best row per workload; the
round-over-round analogue here is regenerating the PERF.md sweep/zoo
tables from BENCH_SUITE.jsonl / BENCH_ZOO.jsonl so the committed tables
are always a mechanical function of the committed evidence rows — no
hand-transcription drift (the r4 verdict's "two headlines in one round"
failure mode, applied to the grids).

For every (bench, K) cell the LATEST row wins (rows are append-only; a
re-run supersedes).  Cells carry ``raw/norm`` when the row has a
window-normalized twin (``gflops_norm``, emitted by suite/zoo under the
plausibility-gated session probe) and are starred when the row is newer
than ``fresh_after``.

Run: python -m tpusparse.bench.report [--fresh-after TS]
"""

from __future__ import annotations

import json
import sys

SWEEP_WORKLOADS = ("powerlaw", "uniform", "banded")
SWEEP_KS = (8, 32, 128)
ZOO_KS = (8, 64)


def latest_rows(path, keyfn):
    """Latest row per key; keyfn returns None to skip a row."""
    out = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = keyfn(r)
                if k is None:
                    continue
                if k not in out or r.get("ts", 0) >= out[k].get("ts", 0):
                    out[k] = r
    except FileNotFoundError:
        pass
    return out


def _cell(r, fresh_after, value_key="gflops"):
    if not r:
        return "—"
    star = "*" if r.get("ts", 0) >= fresh_after else ""
    v = r.get(value_key)
    if v is None:
        return "—"
    n = r.get(value_key + "_norm")
    return f"{v:.1f}{'/' + format(n, '.1f') if n is not None else ''}{star}"


def sweep_table(path="BENCH_SUITE.jsonl", fresh_after=float("inf")):
    """SuiteSparse-class sweep table (PERF.md 'SuiteSparse-class sweep')."""
    rows = latest_rows(path, lambda r: (r["bench"].split("/", 1)[1], r.get("k"))
                       if r.get("bench", "").startswith("suite/") else None)
    lines = ["| workload | K=8 | K=32 | K=128 | winner (8/32/128) | vs BCOO | pct_roofline |",
             "|---|---|---|---|---|---|---|"]
    for w in SWEEP_WORKLOADS:
        cells, winners, vsb, pr = [], [], [], []
        for k in SWEEP_KS:
            r = rows.get((w, k))
            cells.append(_cell(r, fresh_after))
            if r:
                winners.append(str(r.get("schedule", "?")).replace("_span", ""))
                if r.get("vs_bcoo") is not None:
                    vsb.append(r["vs_bcoo"])
                if r.get("pct_roofline") is not None:
                    pr.append(r["pct_roofline"])
        vs = f"{min(vsb):.1f}–{max(vsb):.1f}x" if vsb else "—"
        roof = f"{min(pr)}–{max(pr)}%" if pr else "—"
        lines.append(f"| {w} | {cells[0]} | {cells[1]} | {cells[2]} | "
                     f"{'/'.join(winners)} | {vs} | {roof} |")
    return "\n".join(lines)


def zoo_table(path="BENCH_ZOO.jsonl", fresh_after=float("inf")):
    """Robustness-grid table (PERF.md 'Robustness grid')."""
    rows = latest_rows(path, lambda r: (r["case"], r.get("k"))
                       if r.get("case") else None)
    cases = sorted({c for (c, _k) in rows})
    lines = ["| case | K=8 | K=64 | winner (8 / 64) |", "|---|---|---|---|"]
    for c in cases:
        cell, win = [], []
        for k in ZOO_KS:
            r = rows.get((c, k))
            cell.append(_cell(r, fresh_after))
            win.append(str(r.get("schedule", "?")).replace("_span", "")
                       if r else "—")
        lines.append(f"| {c} | {cell[0]} | {cell[1]} | {win[0]} / {win[1]} |")
    return "\n".join(lines)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    fresh = float("inf")
    if "--fresh-after" in argv:
        fresh = float(argv[argv.index("--fresh-after") + 1])
    print("## SuiteSparse-class sweep (latest rows; cell = raw/normalized"
          " GF/s, * = fresh)")
    print(sweep_table(fresh_after=fresh))
    print()
    print("## Robustness grid (latest rows)")
    print(zoo_table(fresh_after=fresh))


if __name__ == "__main__":
    main()
