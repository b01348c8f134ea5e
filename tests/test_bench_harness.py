"""bench.py orchestrator logic (no device, no subprocess spawns).

The bench harness is the round's driver artifact; its loss modes are the
expensive ones to discover on chip, so the recovery paths are locked here:
last-JSON-line-wins parsing, and TimeoutExpired partial-stdout recovery
(extras that print cumulative lines per leg keep their measured points
when the budget timeout kills them mid-run).
"""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


def _fake_run(stdout_lines, returncode=0):
    def run(cmd, capture_output=True, text=True, timeout=None):
        return types.SimpleNamespace(stdout="\n".join(stdout_lines),
                                     returncode=returncode, stderr="")
    return run


def test_last_json_line_wins(monkeypatch):
    lines = ["noise",
             json.dumps({"multistream_b_sweep_fps": {"s2": 1.0}}),
             json.dumps({"multistream_b_sweep_fps": {"s2": 1.0, "s4": 2.0}})]
    monkeypatch.setattr(subprocess, "run", _fake_run(lines))
    out = bench.run_extra_subprocess("multistream_b_sweep", "baseline_base",
                                     timeout_s=5.0)
    assert out == {"multistream_b_sweep_fps": {"s2": 1.0, "s4": 2.0}}


def test_timeout_keeps_partial_points(monkeypatch):
    partial = json.dumps({"multistream_b_sweep_fps": {"s2": 1.0}})

    def run(cmd, capture_output=True, text=True, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout,
                                        output="warmup\n" + partial + "\n")

    monkeypatch.setattr(subprocess, "run", run)
    out = bench.run_extra_subprocess("multistream_b_sweep", "baseline_base",
                                     timeout_s=5.0)
    # recovered partials are tagged so the round artifact can't read a
    # truncated sweep as a completed one
    assert out == {"multistream_b_sweep_fps": {"s2": 1.0},
                   "multistream_b_sweep_timeout": True}


def test_timeout_bytes_stdout_and_empty(monkeypatch):
    # TimeoutExpired.stdout is bytes unless text-mode captured both phases
    partial = json.dumps({"k": 1}).encode()

    def run(cmd, capture_output=True, text=True, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout, output=partial)

    monkeypatch.setattr(subprocess, "run", run)
    assert bench.run_extra_subprocess("primary", "baseline_base", 5.0) == {
        "k": 1, "primary_timeout": True}

    def run_none(cmd, capture_output=True, text=True, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", run_none)
    with pytest.raises(RuntimeError, match="rc=timeout"):
        bench.run_extra_subprocess("primary", "baseline_base", 5.0)


def test_no_json_raises_with_stderr_tail(monkeypatch):
    def run(cmd, capture_output=True, text=True, timeout=None):
        return types.SimpleNamespace(stdout="no json here", returncode=3,
                                     stderr="trace\nRuntimeError: boom")

    monkeypatch.setattr(subprocess, "run", run)
    with pytest.raises(RuntimeError, match="boom"):
        bench.run_extra_subprocess("primary", "baseline_base", 5.0)


def test_orchestrator_extra_names_registered():
    # the orchestrator's hardcoded order must only name registered extras
    src = open(bench.__file__).read()
    start = src.index("for name in (")
    names = src[start:src.index("):", start)]
    for extra in ("nlbbox_mode", "uvltrack_l", "multistream8_l",
                  "quant_int8", "multistream_b_sweep", "train_step"):
        assert extra in names and extra in bench.SUBPROCESS_EXTRAS
