"""bench.report: evidence JSONL -> markdown grid regeneration."""

import json

from tpusparse.bench.report import latest_rows, sweep_table, zoo_table


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_latest_row_wins_and_bad_lines_skipped(tmp_path):
    p = tmp_path / "s.jsonl"
    _write(p, [
        {"bench": "suite/powerlaw", "k": 8, "gflops": 10.0, "ts": 1.0},
        {"bench": "suite/powerlaw", "k": 8, "gflops": 20.0, "ts": 2.0},
        {"metric": "session_probe", "ts": 3.0},
    ])
    with open(p, "a") as f:
        f.write("not json\n")
    rows = latest_rows(p, lambda r: (r["bench"], r["k"])
                       if r.get("bench") else None)
    assert rows[("suite/powerlaw", 8)]["gflops"] == 20.0
    assert len(rows) == 1


def test_sweep_table_cells(tmp_path):
    p = tmp_path / "s.jsonl"
    _write(p, [
        {"bench": "suite/powerlaw", "k": 8, "gflops": 31.5,
         "gflops_norm": 26.4, "schedule": "dg_span", "vs_bcoo": 21.7,
         "pct_roofline": 7.1, "ts": 100.0},
        {"bench": "suite/banded", "k": 128, "gflops": 123.9,
         "schedule": "dgt_span", "vs_bcoo": 5.0, "pct_roofline": 5.4,
         "ts": 5.0},
    ])
    md = sweep_table(path=p, fresh_after=50.0)
    assert "31.5/26.4*" in md          # normalized twin + fresh star
    assert "123.9" in md and "123.9*" not in md   # stale row unstarred
    assert "| uniform | — | — | — |" in md        # missing cells render


def test_zoo_table(tmp_path):
    p = tmp_path / "z.jsonl"
    _write(p, [
        {"case": "blocky", "k": 8, "gflops": 103.0, "schedule": "dgt_span",
         "ts": 1.0},
        {"case": "blocky", "k": 64, "gflops": 150.0, "schedule": "dgt_span",
         "ts": 1.0},
    ])
    md = zoo_table(path=p)
    assert "| blocky | 103.0 | 150.0 | dgt / dgt |" in md


def test_tables_run_on_committed_evidence(monkeypatch):
    """The committed evidence files themselves parse and render."""
    monkeypatch.chdir("/root/repo")
    assert "powerlaw" in sweep_table()
    assert "blocky" in zoo_table()
