"""Forward formulation search below dgt-select's floor (VERDICT r4 #3).

The round-4 SoL table says the dgt select-scatter headline is VPU-bound
(floor 0.146-0.19 cyc/nz at the single-anchor rate; the MXU is half
idle), so the only route past its ~55 GF/s ceiling is a formulation with
a LOWER counted VPU floor at comparable padding.  This module enumerates
the candidates ON PAPER — vreg counts from the kernel's actual op
sequence (kernels/dgt_gather.py build()), same counting conventions as
bench/sol.py — and, for the one candidate whose viability hinges on
padding, simulates the pack walk host-side so the decision needs no
kernel build.

The select scatter's per-chunk budget (g=512, kt=8, fp32x2, nw=4,
rb=256): decode 12 + gathers 40 + concat 4 + product/split 20 + psel
replication 64 + rowhot 24 = 164 vregs.  The scatter side (psel+rowhot,
88) dominates; candidates attack it:

C1 dgt-band   static row scatter: each 128-lane tile pinned to one band
              of ngrp consecutive vrows (class = row-in-band), scatter
              becomes a tiny static-mask dot + dynamic-sublane RMW.
              VPU ~88 vregs BUT the (band x window) fill population on
              the 32k headline is ~0.95 nz per (band, window): a tile
              needs 128 nz from nw windows of ONE band -> fill ~ nw/128.
              Counted pad ~17 at nw=8.  REFUTED ON PAPER.

C2 class-block64  classes CONTIGUOUS in 64-lane blocks (slot = cls*64
              + pos instead of cls + ngrp*pos): psel replication
              VANISHES — the scatter dot per class contracts rowhot and
              c2 over the class's static 64-lane slice (8 dots of
              (rbs,64)x(q,64); MXU 573K macs, still idle).  Block b's
              class is static (b % ngrp) so accumulators are static too.
              COUNTED RESULT: the psel saving is exactly repaid by
              accumulator lane granularity — 8 accumulators of (rbs, q)
              each burn full vregs for q=16 of 128 lanes (64 vregs, the
              same 64 psel cost), the gathers double (the paired-class
              tiles halve the fill population, forcing nw 4 -> 8), and
              the simulated walk pad is 1.25 vs the incumbent's 1.18
              under the identical split/deal.  Every algebraic repair
              (one blocked-diagonal dot, zero-padded per-class rhs,
              lane-slice accumulator writes) re-materializes a
              (128, G)-lane bf16 plane at ~64 vregs: for q < 128 — i.e.
              K < 64 at fp32x2 — the scatter side of ANY one-hot dot
              factorization costs >= ~64 replication/accumulator vregs
              plus the rowhot compare.  select IS that floor.  REFUTED
              (simulation + counting; no kernel build needed).

C3 mxu-gather-fused  (VERDICT r4 option a) replace the per-tile VPU
              gather tree with a radix-style one-hot gather dot over the
              tile's nw*128-column span: the one-hot build alone is a
              (nw*128, 128) i32 compare + bf16 cast per tile ~ 96 vregs
              x T = 384/chunk — 10x the 40 it replaces (and the wide
              single-gather variant is already Mosaic-refuted,
              _dgt_fill docstring).  REFUTED ON PAPER.

C4 int8-rowhot  (VERDICT r4 option b) int8 one-hot planes: Mosaic
              rejects int8 vector compares (CLAUDE.md), so the compare
              stays i32 and only the cast narrows (bf16 16 -> i8 8
              vregs at rb=512).  The i8 x bf16 dot with f32 acc was
              DRIVEN ON CHIP and accepted, bit-exact (2026-08-20) — the
              one candidate that survived to a build: ~3-5% counted win,
              shipped as dgt_spmm(rowhot_i8=True), A/B'd in
              microbench's v4 rows.

Also considered and excluded without a table row: a hot-column dense
panel (hybrid_cols) — the headline's skew is in ROW lengths
(builder.power_law_coo draws zipf row lengths, uniform columns), so
there are no hot columns to split off; the family already exists for
matrices that have them.

CONCLUSION: for K=8 fp32x2 on v5e, the select scatter sits at the
structural vreg floor of the one-hot-dot formulation class; the
measured ~55 GF/s ceiling binds the CLASS, not just the incumbent
schedule.  The remaining levers are padding (walk quality) and the
1.25-1.5x measured-over-floor issue-rate residual — not formulation.

Run: python -m tpusparse.bench.formulations  (host-only; ~30 s)
"""

from __future__ import annotations

import json
import sys

import numpy as np

from tpusparse.bench.sol import MXU_MACS_PER_CYC, Cost, _vregs


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- costs

def select_cost(g=512, rb=256, kt=8, nw=4, ngrp=8, nhl=2) -> Cost:
    """Incumbent (mirrors sol.dgt_cost select path; repeated here so the
    candidate table is self-contained)."""
    from tpusparse.bench.sol import dgt_cost

    return dgt_cost(g=g, rb=rb, kt=kt, nw=nw, ngrp=ngrp, nhl=nhl,
                    scatter="select")


def class_block_cost(g=512, rb=512, kt=8, nw=8, ngrp=8, nhl=2) -> Cost:
    """C2: contiguous 64-lane class blocks, static per-block class.

    Same decode/gather/product pipeline as select; scatter side:
      - rowhot compare (rbs, G) i32 + bf16 cast (unchanged)
      - NO psel: ngrp dots contract static slices c2[:, b*64:(b+1)*64]
        with rowhot[:, same] -> (rbs, q) each, into ngrp static
        accumulators (one (rbs, q) add each)
    """
    T = g // 128
    q = nhl * kt
    rbs = rb // ngrp
    v = 3 * _vregs(8, g)                                   # decode
    v += T * (nw * _vregs(kt, 128) + (nw - 1) * 2 * _vregs(kt, 128))
    v += T * _vregs(kt, 128)                               # concat
    v += _vregs(kt, g) + 3 * _vregs(kt, g) * (nhl - 1)     # product+split
    v += _vregs(q, g, bits=16)                             # c2 write
    v += _vregs(rbs, g) + _vregs(rbs, g, bits=16)          # rowhot
    v += ngrp * _vregs(rbs, q)                             # acc adds
    mxu = ngrp * rbs * q * (g // ngrp)                     # blocked dots
    mxu += rbs * kt * q * 6                                # fold (as select)
    return Cost(mxu, v, note="class-block64")


def band_cost(g=512, rb=512, kt=8, nw=8, ngrp=8, nhl=2) -> Cost:
    """C1: fully static row scatter (tile pinned to one ngrp-row band)."""
    T = g // 128
    q = nhl * kt
    v = 3 * _vregs(8, g)
    v += T * (nw * _vregs(kt, 128) + (nw - 1) * 2 * _vregs(kt, 128))
    v += T * _vregs(kt, 128)
    v += _vregs(kt, g) + 3 * _vregs(kt, g) * (nhl - 1)
    v += _vregs(q, g, bits=16)
    v += T * 3 * _vregs(ngrp, q)            # dynamic-sublane RMW per tile
    mxu = T * ngrp * q * 128                # per-tile class-collapse dot
    return Cost(mxu, v, note="dgt-band")


def mxu_gather_cost(g=512, rb=256, kt=8, nw=4, ngrp=8, nhl=2) -> Cost:
    """C3: gather via one-hot MXU dot over the tile's nw*128-col span."""
    base = select_cost(g, rb, kt, nw, ngrp, nhl)
    T = g // 128
    # remove the VPU gather tree, add the per-tile one-hot build
    gathers = T * (nw * _vregs(kt, 128) + (nw - 1) * 2 * _vregs(kt, 128))
    onehot = T * (_vregs(nw * 128, 128) + _vregs(nw * 128, 128, bits=16))
    mxu = base.mxu_macs + T * (nw * 128) * kt * 128
    return Cost(mxu, base.vpu_vregs - gathers + onehot, note="mxu-gather")


def int8_rowhot_cost(g=512, rb=512, kt=8, nw=8, ngrp=8, nhl=2) -> Cost:
    """C4: rowhot cast narrows bf16 -> int8 (compare must stay i32)."""
    base = select_cost(g, rb, kt, nw, ngrp, nhl)
    rbs = rb // ngrp
    saved = _vregs(rbs, g, bits=16) - _vregs(rbs, g, bits=8)
    return Cost(base.mxu_macs, base.vpu_vregs - saved, note="int8-rowhot")


# ------------------------------------------------------- pad simulation

def _count_tiles(run_b, run_win, cnt, *, cap, nw, n_buckets, max_open=8):
    """Tiles per bucket under the multi-open walk (counting-only version
    of kernels/dgt_gather._dgt_walk_multi's fallback loop)."""
    tot = np.zeros(n_buckets, dtype=np.int64)
    cur_b, ntiles = -1, 0
    opens: list = []
    for r in range(len(run_b)):
        b, w = int(run_b[r]), int(run_win[r])
        if b != cur_b:
            if cur_b >= 0:
                tot[cur_b] = ntiles
            cur_b, ntiles, opens = b, 0, []
        left = cnt[r].copy()
        opens = [o for o in opens if o[0] > w - nw and int(o[2].sum()) > 0]
        for o in opens:
            if not left.any():
                break
            t = np.minimum(o[2], left)
            if not t.any():
                continue
            o[2] -= t
            left -= t
        lmax = int(left.max())
        if lmax > 0:
            n_new = -(-lmax // cap)
            for j in range(n_new):
                room = np.full(cnt.shape[1], cap, dtype=np.int64)
                room -= np.minimum(np.maximum(left - j * cap, 0), cap)
                opens.append([w, ntiles + j, room])
            ntiles += n_new
            if len(opens) > max_open:
                opens = opens[-max_open:]
    if cur_b >= 0:
        tot[cur_b] = ntiles
    return tot


def _split_and_deal(mat, rb: int, ngrp: int):
    """Mirror pack_dgt's vrow split + length deal closely enough for a
    padding estimate: heavy rows split into <=8 power-of-two pieces of
    <= 8x mean length; vrows length-dealt (longest first, least-loaded
    program with room).  Returns per-nz (program, vrow-in-program)."""
    rows = mat.rows.astype(np.int64)
    cols = mat.cols.astype(np.int64)
    m = mat.shape[0]
    lengths = np.bincount(rows, minlength=m)
    mean = max(lengths[lengths > 0].mean() if (lengths > 0).any() else 1, 1)
    split = max(int(8 * mean), 1)
    pieces = np.minimum(
        2 ** np.ceil(np.log2(np.maximum(-(-lengths // split), 1))), 8
    ).astype(np.int64)
    # vrow of each nz: row's base vrow + (rank within row) % pieces
    base = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(pieces, out=base[1:])
    order = np.argsort(rows, kind="stable")
    rank = np.arange(len(rows)) - np.searchsorted(rows[order],
                                                  rows[order])[0]
    rank = np.empty(len(rows), dtype=np.int64)
    starts = np.searchsorted(rows[order], np.arange(m))
    rank[order] = np.arange(len(rows)) - starts[rows[order]]
    vrow = base[rows] + rank % pieces[rows]
    n_vrows = int(base[m])
    vlen = np.bincount(vrow, minlength=n_vrows)
    # greedy length deal
    P = -(-n_vrows // rb)
    load = np.zeros(P, dtype=np.int64)
    room = np.full(P, rb, dtype=np.int64)
    prog_of = np.zeros(n_vrows, dtype=np.int64)
    slot_of = np.zeros(n_vrows, dtype=np.int64)
    for v in np.argsort(-vlen, kind="stable"):
        cand = np.flatnonzero(room > 0)
        p = cand[np.argmin(load[cand])]
        prog_of[v] = p
        slot_of[v] = rb - room[p]
        room[p] -= 1
        load[p] += vlen[v]
    return prog_of[vrow], slot_of[vrow], cols, P


def simulate_pads(mat, *, rb=512, g=512, nw=8, ngrp=8, max_open=8):
    """Padding of (a) the incumbent any-class tile walk and (b) the
    class-block64 paired-class walk, under the SAME split/deal, so the
    comparison isolates the layout."""
    prog, vslot, cols, P = _split_and_deal(mat, rb, ngrp)
    win = cols // 128
    nwin = int(win.max()) + 1
    T = g // 128
    klass = vslot % ngrp
    out = {}

    # incumbent: bucket = program, ncls = ngrp, cap = 128//ngrp
    key = prog * nwin + win
    order = np.argsort(key, kind="stable")
    uniq, inv = np.unique(key[order], return_inverse=True)
    cnt = np.bincount(inv * ngrp + klass[order],
                      minlength=len(uniq) * ngrp).reshape(-1, ngrp)
    tiles = _count_tiles(uniq // nwin, uniq % nwin, cnt,
                         cap=128 // ngrp, nw=nw, n_buckets=P,
                         max_open=max_open)
    nc = int(np.ceil(tiles / T).max())
    out["incumbent"] = {"nc": nc, "pad": P * nc * g / len(cols)}

    # class-block64: bucket = (program, pair), ncls = 2, cap = 64;
    # pair p hosts classes {2p, 2p+1}; chunk slot t = pair, so
    # NC = max over programs of the max pair tile count
    npair = ngrp // 2
    pair = klass // 2
    bucket = prog * npair + pair
    key = bucket * nwin + win
    order = np.argsort(key, kind="stable")
    uniq, inv = np.unique(key[order], return_inverse=True)
    cnt = np.bincount(inv * 2 + (klass[order] % 2),
                      minlength=len(uniq) * 2).reshape(-1, 2)
    tiles = _count_tiles(uniq // nwin, uniq % nwin, cnt,
                         cap=64, nw=nw, n_buckets=P * npair,
                         max_open=max_open)
    nc = int(tiles.reshape(P, npair).max())
    out["class_block64"] = {"nc": nc, "pad": P * nc * npair * 128 * (
        g // (npair * 128)) / len(cols)}
    # each chunk = npair tiles of 128... for g=512, T=4=npair: chunk
    # holds one tile per pair; pad = P * nc * g / nnz
    out["class_block64"]["pad"] = P * nc * g / len(cols)
    return out


def candidates_table(rate: float, rate_bounds=None, pads=None) -> list[dict]:
    pads = pads or {}
    cands = {
        "select(nw4,rb256) [incumbent]": (select_cost(nw=4, rb=256),
                                          pads.get("select_nw4", 1.42)),
        "select(nw8,rb512) [incumbent]": (select_cost(nw=8, rb=512),
                                          pads.get("incumbent", 1.13)),
        "C1 dgt-band(nw8)": (band_cost(), pads.get("band", 17.0)),
        "C2 class-block64(nw8,rb512)": (class_block_cost(),
                                        pads.get("class_block64")),
        "C3 mxu-gather(nw4)": (mxu_gather_cost(), pads.get("mxu_gather",
                                                           1.42)),
        "C4 int8-rowhot(nw8,rb512)": (int8_rowhot_cost(),
                                      pads.get("incumbent", 1.13)),
    }
    rows = []
    for name, (c, pad) in cands.items():
        g = 512
        mxu_f = c.mxu_macs / MXU_MACS_PER_CYC / g
        vpu_f = c.vpu_vregs / rate / g
        floor = max(mxu_f, vpu_f)
        row = {"candidate": name, "vpu_vregs": round(c.vpu_vregs, 1),
               "mxu_macs": int(c.mxu_macs),
               "floor_cyc_nz": round(floor, 4),
               "pad": round(pad, 3) if pad else None,
               "floor_x_pad": round(floor * pad, 4) if pad else None}
        if rate_bounds:
            row["floor_lo"] = round(max(mxu_f, c.vpu_vregs /
                                        rate_bounds[1] / g), 4)
            row["floor_hi"] = round(max(mxu_f, c.vpu_vregs /
                                        rate_bounds[0] / g), 4)
        rows.append(row)
    return rows


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="FORMULATIONS_r05.json")
    args = ap.parse_args(argv)

    from tpusparse.io import builder

    mat = builder.power_law_coo(32768, 32768, avg_nnz_per_row=32.0,
                                alpha=1.8, seed=42)
    _log("simulating walks on the 32k headline matrix ...")
    pads = simulate_pads(mat)
    _log(f"pads: {pads}")

    # real pack pad for calibration of the simulator's split/deal
    from tpusparse.kernels.dgt_gather import pack_dgt

    real = pack_dgt(mat, rb=512, g=512, kt=8, nw=8, resid=True,
                    walk="multi")
    pads["real_pack_incumbent"] = {"pad": real.padding_rate}
    _log(f"real pack_dgt pad: {real.padding_rate:.3f} "
         f"(simulated incumbent {pads['incumbent']['pad']:.3f})")

    rate, bounds = 1.804, (1.578, 2.105)  # r5 least-squares fit (sol.py)
    rows = candidates_table(rate, bounds,
                            {"incumbent": pads["incumbent"]["pad"],
                             "class_block64": pads["class_block64"]["pad"]})
    out = {"rate": rate, "rate_bounds": bounds,
           "sim_calibration": {
               "real_pack_pad": real.padding_rate,
               "simulated_incumbent_pad": pads["incumbent"]["pad"]},
           "candidates": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
