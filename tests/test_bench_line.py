"""The driver captures only the LAST ~2000 chars of stdout; rounds 3 and 4
lost their headline record because bench.py's one JSON line outgrew that
window (VERDICT r4 missing #1).  These tests pin the artifact contract:
the final line stays under bench.COMPACT_LINE_BUDGET (1500) in the worst
case — every config erroring with a full-length truncated message — and in
the degraded no-backend case."""

import json

import pytest

import bench


def _worst_headline():
    return {
        "metric": "batched_fft_gflops_n1024_fp32",
        "value": 99999.99,
        "unit": "GFLOP/s",
        "vs_baseline": 11764.705,
        "platform": "unavailable",
        "max_rel_err": 9.99e-05,
        "error_budget_ok": False,
        "budget_fail": "accuracy",
        "pct_mxu_n32768": 100.0,
        "pct_mxu_n65536": 100.0,
        "backend_lost_at": "range_doppler_cfar_64x4096",
        "detail_file": bench.DETAIL_FILE,
    }


def test_budget_all_configs_erroring():
    # worst case: every runner fails with the longest message main() stores
    names = [name for name, _ in bench._runners()]
    assert len(names) >= 25  # the r4 inventory; guards accidental shrink
    compact = {n: "err:" + "x" * 40 for n in names}
    line = bench.compose_line(_worst_headline(), compact)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)  # stays valid JSON after trimming
    assert parsed["metric"] == "batched_fft_gflops_n1024_fp32"


def test_budget_full_numeric_run():
    # the happy path: every config records a 4-significant-digit scalar
    names = [name for name, _ in bench._runners()]
    compact = {n: bench._compact(12345.6789) for n in names}
    line = bench.compose_line(_worst_headline(), compact)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)
    # the full numeric run must fit WITHOUT dropping any config
    assert "_dropped" not in parsed["configs"]
    assert len(parsed["configs"]) == len(names)


def test_budget_backend_lost_mid_run():
    names = [name for name, _ in bench._runners()]
    compact = {}
    for i, n in enumerate(names):
        compact[n] = bench._compact(123.456) if i < 6 else "lost"
    line = bench.compose_line(_worst_headline(), compact)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    json.loads(line)


def test_budget_unavailable_line():
    # the exact degraded line main() prints when the probe fails
    line = json.dumps({
        "metric": "batched_fft_gflops_n1024_fp32",
        "value": 0.0, "unit": "GFLOP/s", "vs_baseline": 0.0,
        "platform": "unavailable",
        "tpu_error": "e" * 120,
        "max_rel_err": None, "error_budget_ok": False, "configs": {},
    })
    assert len(line) <= bench.COMPACT_LINE_BUDGET


def test_compact_scalars():
    assert bench._compact(123456.789) == 123500.0  # 4 sig figs
    assert bench._compact(1.23456e-7) == 1.235e-7
    assert bench._compact(float("nan")) is None  # NaN is not valid JSON
    assert bench._compact(True) is True
    assert bench._compact("lost") == "lost"


def test_backend_error_classifier():
    assert bench._is_backend_error("UNIMPLEMENTED: TPU backend error")
    assert bench._is_backend_error("UNAVAILABLE: socket closed")
    assert not bench._is_backend_error("ValueError: bad n_fft")


def test_compose_line_drops_tail_first():
    # priority order: when trimming, the FIRST configs must survive
    headline = _worst_headline()
    compact = {f"cfg{i:03d}": "err:" + "y" * 40 for i in range(60)}
    line = bench.compose_line(headline, compact)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)
    kept = [k for k in parsed["configs"] if k != "_dropped"]
    assert kept == [f"cfg{i:03d}" for i in range(len(kept))]
    assert parsed["configs"]["_dropped"] == 60 - len(kept)
