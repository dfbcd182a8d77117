"""Driver reporting contract for bench.py (VERDICT r2 #1).

The driver captures only a bounded tail of stdout and parses the LAST line
as JSON; r2 lost its headline because the full detail dict outgrew that
buffer. These tests pin the compact-line contract without running the
benchmark itself.
"""

import importlib.util
import json
import sys

_spec = importlib.util.spec_from_file_location(
    "bench_entry", __file__.rsplit("/tests/", 1)[0] + "/bench.py"
)
bench_entry = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_entry", bench_entry)
_spec.loader.exec_module(bench_entry)


def _fake_result(detail_pad: int = 0) -> dict:
    detail = {
        "rtf_sustained_batched": 4500.12,
        "rtf_e2e_streaming": 120.5,
        "rtf_e2e_streaming_single": 101.3,
        "rtf_e2e_streaming_single_complement": 130.9,
        "mfu_bf16": 0.24,
        "link_mb_s": 36.5,
        "presets": {f"p{i}": {"x": i} for i in range(detail_pad)},
        "stems_dtype": "int16",
    }
    return {
        "metric": "RTF audio-sec/sec/chip (dsd100 4-stem fused separation)",
        "value": 4500.12,
        "unit": "x realtime",
        "vs_baseline": 45.001,
        "detail": detail,
    }


def test_compact_line_is_short_and_parseable():
    line = bench_entry.compact_line(_fake_result(detail_pad=500))
    assert len(line) <= 1500
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["value"] == 4500.12
    assert parsed["vs_baseline"] == 45.001
    assert parsed["detail_file"] == "BENCH_DETAIL.json"
    # the hoisted scalars made it
    assert parsed["rtf_e2e_streaming_single"] == 101.3
    assert parsed["link_mb_s"] == 36.5
    # but the giant detail dict did NOT
    assert "detail" not in parsed and "presets" not in parsed


def test_compact_line_skips_non_numeric_detail():
    r = _fake_result()
    r["detail"]["rtf_e2e_streaming_single"] = "failed: TimeoutError"
    parsed = json.loads(bench_entry.compact_line(r))
    assert "rtf_e2e_streaming_single" not in parsed


def test_compact_line_falls_back_when_metric_huge():
    r = _fake_result()
    r["metric"] = "x" * 2000  # pathological: even the quadruple is long
    line = bench_entry.compact_line(r, max_len=100)
    parsed = json.loads(line)
    # fallback keeps the driver-required quadruple only
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline", "detail_file"}
