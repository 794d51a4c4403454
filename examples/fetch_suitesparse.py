"""Fetch the reference's canonical SuiteSparse matrices (needs network).

The GeneralSparse reference names IG5-18 and in-2004 as its example inputs
(matrix_example/README.md; fixtures data_source/IG5-18.mtx.coo in its
tests).  This build environment has NO network egress (DNS resolution
fails — evidence in PERF.md "real workloads"), so the matrices cannot be
committed as fixtures here; run this script on a machine with egress, then
point the suite at the downloaded files:

    python examples/fetch_suitesparse.py --dest ./matrices
    python -m tpusparse --matrix ./matrices/IG5-18/IG5-18.mtx --k 8
    TPUSPARSE_REAL_MTX_DIR=./matrices python -m tpusparse.bench.suite --only real
"""

from __future__ import annotations

import argparse
import io
import os
import tarfile
import urllib.request

# (group, name, nnz) — the reference's canonical class: IG5-18 from its own
# README, in-2004 from its test fixtures, plus two >=1M-nnz staples of the
# SpMM literature
MATRICES = [
    ("JGD_Groebner", "IG5-18", 1_790_490),
    ("LAW", "in-2004", 16_917_053),
    ("SNAP", "web-Google", 5_105_039),
    ("Williams", "cant", 4_007_383),
]
URL = "https://suitesparse-collection-website.herokuapp.com/MM/{group}/{name}.tar.gz"


def fetch(dest: str):
    os.makedirs(dest, exist_ok=True)
    for group, name, nnz in MATRICES:
        out = os.path.join(dest, name)
        if os.path.exists(os.path.join(out, f"{name}.mtx")):
            print(f"{name}: already present")
            continue
        url = URL.format(group=group, name=name)
        print(f"fetching {url} (~{nnz:,} nnz)")
        with urllib.request.urlopen(url, timeout=120) as r:
            buf = io.BytesIO(r.read())
        with tarfile.open(fileobj=buf, mode="r:gz") as tf:
            tf.extractall(dest, filter="data")
        print(f"{name}: extracted to {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="./matrices")
    args = ap.parse_args()
    fetch(args.dest)
