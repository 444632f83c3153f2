"""bench.py orchestrator failure paths.

The driver records bench.py's stdout as the round's perf artifact; round 3
lost its artifact to an unhandled backend-init traceback, and the first
flake-proofed version lost it again to a str+bytes TypeError inside the
TimeoutExpired handler. These tests pin every failure path to a parsable
JSON line and rc 0, without touching a real backend (all subprocess calls
are monkeypatched).
"""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _parse_only_json_line(capsys):
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    objs = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(objs) == 1
    return objs[0]


def test_run_timeout_carries_bytes(monkeypatch):
    """TimeoutExpired.stdout/stderr are BYTES even under text=True."""

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(
            cmd, kw.get("timeout"), output=b"partial out", stderr=b"partial err"
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rc, out, err = bench._run(["x"], 1)
    assert rc == -9
    assert out == "partial out"
    assert "partial err" in err and "[timeout 1s]" in err


def test_probe_failure_emits_stale_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "PROBE_ATTEMPTS", 2)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench, "_run", lambda cmd, t: (-9, "", "hang\n[timeout 1s]")
    )
    assert bench.orchestrate() == 0
    obj = _parse_only_json_line(capsys)
    assert obj["metric"] == bench.METRIC
    assert obj["stale"] is True
    assert obj["value"] == bench.LAST_GOOD_VALUE
    assert "probe failed" in obj["error"]


def test_worker_failure_emits_stale_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "WORKER_ATTEMPTS", 2)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(cmd, timeout_s):
        if "-c" in cmd:  # probe
            return 0, "PROBE_OK 1 tpu", ""
        return 1, "", "Traceback: boom"

    monkeypatch.setattr(bench, "_run", fake_run)
    assert bench.orchestrate() == 0
    obj = _parse_only_json_line(capsys)
    assert obj["stale"] is True
    assert "worker attempt 2/2" in obj["error"]


def test_worker_success_passes_through(monkeypatch, capsys):
    good = {
        "metric": bench.METRIC,
        "value": 1234.5,
        "unit": bench.UNIT,
        "vs_baseline": 1.453,
    }

    def fake_run(cmd, timeout_s):
        if "-c" in cmd:
            return 0, "PROBE_OK 1 tpu", ""
        return 0, "warmup noise\n" + json.dumps(good), ""

    monkeypatch.setattr(bench, "_run", fake_run)
    assert bench.orchestrate() == 0
    obj = _parse_only_json_line(capsys)
    assert obj == good and "stale" not in obj


def test_orchestrator_crash_still_emits_json(monkeypatch, capsys):
    """main()'s catch-all: any orchestrator exception → stale JSON, rc 0."""

    def boom():
        raise RuntimeError("boom")

    monkeypatch.setattr(bench, "orchestrate", boom)
    assert bench.main([]) == 0
    obj = _parse_only_json_line(capsys)
    assert obj["stale"] is True
    assert "RuntimeError: boom" in obj["error"]


def test_stale_json_shape():
    obj = json.loads(bench._stale_json("why"))
    required = {
        "metric", "value", "unit", "vs_baseline", "stale",
        "fresh_measurement", "last_good_from", "error",
    }
    # probe_cadence appears only when the round's probe log exists
    assert required <= set(obj) <= required | {"probe_cadence"}
    assert obj["error"] == "why"
    assert obj["stale"] is True and obj["fresh_measurement"] is False
