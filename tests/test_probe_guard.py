"""Probe plausibility guard + SoL multi-row fit (VERDICT r4 #1, #6).

Round 4 shipped a physically impossible MXU probe reading (328 TF/s on a
v5e whose bf16 peak is ~197) into the committed flagship artifact; the
probe had no bound and no retry.  These tests pin the guard: out-of-bound
readings trigger a median-of-3 remeasure, and a still-implausible median
flags the axis instead of emitting a broken norm.  Reference analogue:
GFLOPS_UP_BOUND rejection, executor.cc:51-55.
"""

import numpy as np
import pytest

from tpusparse.bench import microbench as mb
from tpusparse.bench.sol import (FAMILIES, MXU_MACS_PER_CYC, bound_axis_for,
                                 fit_vpu_rate_lsq)


def _meas_seq(values):
    it = iter(values)

    def measure():
        return {"tflops": next(it)}

    return measure


def test_guarded_accepts_in_bounds_first_reading():
    val, info = mb._guarded("mxu_tflops", _meas_seq([180.0]),
                            lambda r: r["tflops"])
    assert val == 180.0
    assert "violation" not in info and "implausible" not in info


def test_guarded_remeasures_on_violation_and_takes_median():
    # first reading is the round-4 failure mode (328 > 200): physically
    # impossible readings are dropped before the median -> med([185,183])
    val, info = mb._guarded("mxu_tflops", _meas_seq([328.0, 185.0, 183.0]),
                            lambda r: r["tflops"])
    assert val == 184.0
    assert info["violation"]["first"] == 328.0
    assert "implausible" not in info


def test_guarded_filters_above_peak_but_keeps_low_readings():
    # two above-peak misfires + one sane reading: the sane one wins
    # (above-peak is impossible; a naive median would land at 250)
    val, info = mb._guarded("mxu_tflops", _meas_seq([250.0, 300.0, 170.0]),
                            lambda r: r["tflops"])
    assert val == 170.0
    assert "implausible" not in info
    # below-bound readings are NOT filtered (could be real throttling,
    # may only be outvoted): all-low stays implausible
    val, info = mb._guarded("mxu_tflops", _meas_seq([20.0, 25.0, 22.0]),
                            lambda r: r["tflops"])
    assert info.get("implausible") is True


def test_guarded_flags_persistent_implausibility():
    val, info = mb._guarded("mxu_tflops", _meas_seq([328.0, 330.0, 320.0]),
                            lambda r: r["tflops"])
    assert info.get("implausible") is True
    assert info["violation"]["bounds"] == [50.0, 200.0]


def test_guarded_survives_failing_remeasure():
    def measure_then_raise():
        calls = {"n": 0}

        def m():
            calls["n"] += 1
            if calls["n"] == 1:
                return {"tflops": 328.0}
            raise RuntimeError("tunnel wedge")

        return m

    val, info = mb._guarded("mxu_tflops", measure_then_raise(),
                            lambda r: r["tflops"])
    # only one reading collected -> median is the implausible one -> flag
    assert info.get("implausible") is True


def test_session_probe_guard_integration(monkeypatch):
    """End-to-end: a wild MXU probe is retried; the emitted norm uses the
    median, and a persistently wild VPU axis yields norm_vpu=None plus an
    implausible flag."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mb, "measure_hbm",
                        _wrap({"stream_gbs": 450.0, "reduce_gbs": 300.0}))
    mxu_vals = iter([328.0, 187.0, 185.0])
    monkeypatch.setattr(mb, "measure_mxu",
                        lambda: {"tflops": next(mxu_vals)})
    monkeypatch.setattr(mb, "measure_vpu", lambda: {"gops": 20000.0})
    monkeypatch.setattr(mb, "REF_WINDOW",
                        {"stream_gbs": 454.6, "mxu_tflops": 187.2,
                         "vpu_vfma_gops": 2.6})
    probe = mb.session_probe()
    assert probe["mxu_tflops"] == 186.0  # filtered median of [187, 185]
    assert probe["norm"] == pytest.approx(187.2 / 186.0, rel=1e-3)
    assert probe["norm_vpu"] is None
    assert probe["implausible"] == ["vpu_vfma_gops"]
    assert "mxu_tflops" in probe["violations"]


def _wrap(row):
    return lambda: dict(row)


def test_bound_axis_mapping():
    assert bound_axis_for("dg rb=512 ns=8 g=512 u=8") == "vpu"
    assert bound_axis_for("dgt resid=1 rb=512 nw=8 g=512 u=8 multi") == "vpu"
    assert bound_axis_for("radix rb=1024 S=128 g=1024") == "mxu"
    assert bound_axis_for("tile rb=1024 ct=1024 g=512 u=4") == "mxu"
    assert bound_axis_for("span rb=1024 ct=1024 g=512") == "vpu"
    assert bound_axis_for("unknown_family x=1") == "mxu"


def test_fit_vpu_rate_lsq_recovers_exact_rate():
    """Synthesize measured cyc/nz from the serial model at a known rate;
    the least-squares fit must recover it with ~zero residuals."""
    g, rate = 512, 2.0
    meas = {}
    for name in ("dgt(select,fold,nw4)", "dgt(select,fold,nw8)",
                 "dgt(fullrow,nw4)", "span(ct1024)"):
        c = FAMILIES[name]()
        meas[name] = (c.mxu_macs / MXU_MACS_PER_CYC + c.vpu_vregs / rate) / g
    fit = fit_vpu_rate_lsq(meas)
    assert fit["ok"] and fit["n_rows"] == 4
    assert fit["rate"] == pytest.approx(rate, rel=1e-3)
    assert all(abs(r["rel_residual"]) < 1e-6 for r in fit["rows"])
    assert fit["rate_lo"] <= rate <= fit["rate_hi"]


def test_fit_vpu_rate_lsq_reports_spread_on_noisy_rows():
    g = 512
    meas = {}
    for name, rate_i in (("dgt(select,fold,nw4)", 1.8),
                         ("dgt(select,fold,nw8)", 2.2),
                         ("dgt(fullrow,nw4)", 1.5),
                         ("span(ct1024)", 2.5)):
        c = FAMILIES[name]()
        meas[name] = (c.mxu_macs / MXU_MACS_PER_CYC
                      + c.vpu_vregs / rate_i) / g
    fit = fit_vpu_rate_lsq(meas)
    assert fit["ok"]
    assert fit["rate_lo"] < fit["rate"] < fit["rate_hi"]
    implied = [r["implied_rate"] for r in fit["rows"]]
    assert min(implied) < 1.9 and max(implied) > 2.1  # spread visible
    assert fit["rate_hi"] - fit["rate_lo"] > 0.01


def test_fit_vpu_rate_lsq_needs_two_rows():
    assert fit_vpu_rate_lsq({})["ok"] is False
    one = {"span(ct1024)": 1.3}
    assert fit_vpu_rate_lsq(one)["ok"] is False
