"""Smoke test for bench.py: both measurement paths run end to end (tiny
sizes, CPU) and the JSON line has the required schema."""

import json
import os
import sys
import subprocess

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_wait_for_tpu(monkeypatch):
    """The pre-bench TPU probe: budget 0 skips entirely; a dead backend
    burns the budget then proceeds (honest failure downstream); a live
    backend returns immediately."""
    sys.path.insert(0, ROOT)
    import bench
    import types

    calls = []

    def fake_run(args, capture_output=True, timeout=None):
        calls.append(1)
        return types.SimpleNamespace(returncode=fake_run.rc)

    # wait_for_tpu imports subprocess locally, so patch the real module
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    monkeypatch.setenv("BENCH_TPU_WAIT_S", "0")
    fake_run.rc = 1
    assert bench.wait_for_tpu() is True      # disabled: no probe at all
    assert calls == []

    monkeypatch.setenv("BENCH_TPU_WAIT_S", "0.01")
    assert bench.wait_for_tpu() is False     # dead backend: probes, times out
    assert len(calls) >= 1

    calls.clear()
    fake_run.rc = 0
    monkeypatch.setenv("BENCH_TPU_WAIT_S", "600")
    assert bench.wait_for_tpu() is True      # live backend: first probe wins
    assert calls == [1]


def test_last_bench_stale_fallback(monkeypatch, tmp_path):
    """A run launched into a tunnel outage reports the last persisted
    on-chip record, explicitly flagged stale — never silently fresh."""
    sys.path.insert(0, ROOT)
    import bench

    path = tmp_path / "last_bench.json"
    monkeypatch.setattr(bench, "LAST_BENCH_PATH", str(path))

    # nothing persisted yet -> no fallback
    assert bench.load_last_bench("outage") is None

    record = {"metric": "explained_clips_per_sec_e2e", "value": 123.0,
              "unit": "clips/s", "vs_baseline": 45.0}
    bench.save_last_bench(record)
    assert "stale" not in record             # original record untouched

    rec = bench.load_last_bench("tunnel down")
    assert rec["value"] == 123.0
    assert rec["stale"] is True
    assert rec["stale_reason"] == "tunnel down"
    assert rec["measured_commit"]            # provenance stamped on save
    assert rec["measured_at_utc"]

    # corrupt file -> no fallback rather than a crash
    path.write_text("{not json")
    assert bench.load_last_bench("outage") is None


def test_main_persist_guard(monkeypatch, tmp_path, capsys):
    """main() persists the record only for production runs: kernel-strategy
    experiment runs (DRSA_* env flags) and BENCH_PERSIST=0 must not replace
    the production last_bench.json."""
    sys.path.insert(0, ROOT)
    import bench

    path = tmp_path / "last_bench.json"
    monkeypatch.setattr(bench, "LAST_BENCH_PATH", str(path))
    monkeypatch.setattr(bench, "wait_for_tpu", lambda: True)
    monkeypatch.setattr(bench, "build_model", lambda: (None, None, None))
    monkeypatch.setattr(bench, "cpu_reference_clips_per_sec",
                        lambda *a: 10.0)
    monkeypatch.setattr(bench, "tpu_clips_per_sec",
                        lambda *a, **k: (1000.0, {"mfu": 0.1}))

    monkeypatch.setenv("DRSA_FIRST_LAYER_MMTAPS", "1")
    bench.main()
    out = json.loads(capsys.readouterr().out)
    assert out["value"] == 1000.0
    assert not path.exists()                 # experiment run: not persisted

    monkeypatch.delenv("DRSA_FIRST_LAYER_MMTAPS")
    monkeypatch.setenv("BENCH_PERSIST", "0")
    bench.main()
    assert not path.exists()                 # explicit opt-out

    monkeypatch.delenv("BENCH_PERSIST")
    monkeypatch.setenv("BENCH_TPU_BATCH", "512")
    bench.main()
    assert not path.exists()                 # operating-point sweep

    monkeypatch.delenv("BENCH_TPU_BATCH")
    bench.main()
    assert json.loads(path.read_text())["value"] == 1000.0

    # a mid-flight failure falls back to the (now persisted) stale record
    def boom(*a, **k):
        raise RuntimeError("tunnel dropped")
    monkeypatch.setattr(bench, "tpu_clips_per_sec", boom)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stale"] is True and "tunnel dropped" in out["stale_reason"]


def test_bench_functions_tiny():
    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import bench

    bench.TPU_BATCH = 2
    bench.TPU_ITERS = 1
    bench.CPU_BATCH = 1
    bench.CPU_ITERS = 1
    # smoke-sized chain points (ADVICE r4: the defaults run ~25 explain
    # iterations on this 1-core host) — the slope math is identical
    bench.CHAIN_N_LO = 1
    bench.CHAIN_N_HI = 2
    bench.CHAIN_REPS = 1
    bench.CPU_RATE_PINNED = None  # exercise the real torch-CPU path

    cfg, specs, params = bench.build_model()
    cpu_rate = bench.cpu_reference_clips_per_sec(specs, params)
    assert cpu_rate > 0
    tpu_rate, extras = bench.tpu_clips_per_sec(specs, params)
    assert tpu_rate > 0
    assert isinstance(extras, dict)
    assert "mfu" in extras or "mfu_error" in extras
    # every fresh record must carry its methodology (VERDICT r4 #1: the
    # judge distinguishes chained-slope records from stale/loop ones by it)
    assert extras.get("timing_method") in ("chained-slope",
                                           "chain-total-fallback")

    line = json.dumps({
        "metric": bench.METRIC_NAME,
        "value": round(tpu_rate, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    })
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline"}
