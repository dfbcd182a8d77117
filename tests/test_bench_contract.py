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


def test_compact_line_carries_error_field():
    """A failed run's compact line must still parse AND carry the error
    (VERDICT r3 #1c: the driver headline may never be lost to a crash)."""
    r = _fake_result()
    r["error"] = "JaxRuntimeError: RESOURCE_EXHAUSTED: TPU backend error"
    parsed = json.loads(bench_entry.compact_line(r))
    assert parsed["error"].startswith("JaxRuntimeError")
    assert parsed["value"] == 4500.12  # best-known headline survives
    # error survives even the fallback truncation path
    r["metric"] = "x" * 2000
    parsed = json.loads(bench_entry.compact_line(r, max_len=400))
    assert "error" in parsed


def test_retry_does_not_retry_deterministic_errors():
    """OOM and shape errors must re-raise immediately (ADVICE r3 /
    VERDICT r3 weak-#3) — only transport flakes get the 3×20 s retries."""
    from convsep_tpu.benchmark import _is_transient, _retry

    class FakeOOM(Exception):
        pass

    calls = {"n": 0}

    def oom():
        calls["n"] += 1
        raise FakeOOM("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)")

    import pytest

    with pytest.raises(FakeOOM):
        _retry(oom, attempts=3, sleep_s=0.0)
    assert calls["n"] == 1  # no retries

    with pytest.raises(ValueError):
        _retry(lambda: (_ for _ in ()).throw(ValueError("bad shape")), sleep_s=0.0)

    # transport flakes ARE retried
    assert _is_transient(RuntimeError("response body closed before all bytes"))
    assert not _is_transient(RuntimeError("RESOURCE_EXHAUSTED: oom"))
    assert not _is_transient(ValueError("UNAVAILABLE"))  # type beats message

    flaky = {"n": 0}

    def transient():
        flaky["n"] += 1
        if flaky["n"] < 3:
            raise RuntimeError("connection reset by peer")
        return "ok"

    assert _retry(transient, attempts=3, sleep_s=0.0) == "ok"


def _iter_strings(node, path=""):
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _iter_strings(v, f"{path}.{k}")
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            yield from _iter_strings(v, f"{path}[{i}]")
    elif isinstance(node, str):
        yield path, node


def test_committed_bench_detail_is_clean():
    """The committed BENCH_DETAIL.json must be generated from HEAD and
    carry NO error rows (VERDICT r3 #2: the r3 artifact shipped a stale
    AttributeError in its train section). 'skipped: …' values are allowed
    (time-budget / hbm-preflight skips are honest outcomes, not failures).
    """
    import os

    path = __file__.rsplit("/tests/", 1)[0] + "/BENCH_DETAIL.json"
    if not os.path.exists(path):
        import pytest

        pytest.skip("no committed BENCH_DETAIL.json")
    with open(path) as f:
        detail = json.load(f)
    status = detail.pop("bench_status", "complete")
    if status.startswith("in-progress"):
        import pytest

        pytest.skip(f"live bench snapshot on disk ({status}); the COMMITTED "
                    "artifact must be complete — do not commit this state")
    assert status == "complete", f"committed artifact from a failed run: {status}"
    bad = [
        (p, s)
        for p, s in _iter_strings(detail)
        if (s.startswith("failed:") or p.endswith(".error") or ".section_errors." in p)
        # the watermark's WHOLE JOB is recording the batch size that fails —
        # its 'failed:' entry is the measurement, not an error
        and ".hbm_watermark." not in p
    ]
    assert not bad, f"committed BENCH_DETAIL.json carries failures: {bad}"
    det = detail.get("detail", detail)
    # the r3 regressions, pinned: train rows incl. the bf16-state variant,
    # and per-preset b32 rows (or an explicit skip) must exist
    assert "b32_state_bf16" in det.get("train", {}), "train.b32_state_bf16 missing"
    presets = det.get("presets", {})
    assert presets, "preset matrix missing"
    # every mono preset row carries its b32 figure (or is an honest skip);
    # bach10 in particular — the row whose unguarded init killed the r3 run
    for name in ("ikala", "highres4096", "multires4096", "bach10"):
        row = presets.get(name)
        assert row is not None, f"{name} row missing"
        if isinstance(row, str):
            assert row.startswith("skipped:"), f"{name}: {row}"
        else:
            assert "rtf_batched_b32" in row, f"{name}: no b32 row"
            assert "decoder" in row, f"{name}: decoder impl not recorded"
