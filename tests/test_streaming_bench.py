"""Streaming throughput floor (round-5 task 4): the full CdcPipeline
(snapshot → micro-batched MERGE → DLQ) must sustain at least the
reference's steady-state envelope of 100 events / 2 s = 50 events/s
(BASELINE.md §streaming, mongodb.go:697-699) on the fixed seeded
event mix bench_streaming.py publishes as BENCH_streaming.json."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_streaming import MIX, build_log, run  # noqa: E402


def test_event_mix_is_deterministic(tmp_path):
    c1 = build_log(str(tmp_path / "a"), 3, 100)
    c2 = build_log(str(tmp_path / "b"), 3, 100)
    assert c1 == c2
    assert sum(c1.values()) == 300
    # every op class present — the bench exercises the full surface
    assert all(c1[k] > 0 for k in MIX)
    f1 = sorted(p.name for p in (tmp_path / "a").iterdir())
    assert len(f1) == 3
    assert (tmp_path / "a" / f1[0]).read_bytes() == (tmp_path / "b" / f1[0]).read_bytes()


def test_sustained_throughput_beats_reference_envelope(spark, tmp_path):
    result = run(8, 250, str(tmp_path / "w"))
    assert result["dlq_rows"] > 0, "mix must exercise the DLQ leg"
    assert result["target_rows"] > 1000, "merges must land on the snapshot"
    sustained = result["events_per_sec_sustained"]
    assert sustained is not None and sustained >= 50, result
