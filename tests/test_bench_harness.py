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
    # the orchestrator's order must only name registered extras, and
    # train_step must run BEFORE the (slowest) sweep so it can't be
    # starved again (VERDICT r4 #4: never appeared in a driver artifact)
    for extra in ("nlbbox_mode", "uvltrack_l", "multistream8_l",
                  "quant_int8", "multistream_b_sweep", "train_step"):
        assert extra in bench.EXTRA_ORDER and extra in bench.SUBPROCESS_EXTRAS
    assert (bench.EXTRA_ORDER.index("train_step")
            < bench.EXTRA_ORDER.index("multistream_b_sweep"))


def test_nonzero_rc_with_json_is_tagged_partial(monkeypatch):
    # ADVICE r4: a child that crashes AFTER printing cumulative per-leg
    # JSON must not read as a completed extra in the round artifact
    lines = [json.dumps({"multistream_b_sweep_fps": {"s2": 1.0}})]
    monkeypatch.setattr(subprocess, "run", _fake_run(lines, returncode=9))
    out = bench.run_extra_subprocess("multistream_b_sweep", "baseline_base",
                                     timeout_s=5.0)
    assert out == {"multistream_b_sweep_fps": {"s2": 1.0},
                   "multistream_b_sweep_partial_rc": 9}


class _FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_hanging_extra_does_not_starve_the_rest():
    """Round-4 failure mode: ONE extra hangs for its whole timeout. With
    per-extra caps + probe-gated retry the rest must still land."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        # caps, not the whole budget: a hung child may burn at most its cap
        # (3x on the healthy-tunnel retry — the cold-compile escalation)
        assert timeout_s <= 3 * bench.EXTRA_CAP_S.get(
            name, bench.DEFAULT_EXTRA_CAP_S)
        if name == "nlbbox_mode":  # hangs: burns its full cap, no JSON
            clock.t += timeout_s
            raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")
        clock.t += 50.0
        return {name: 1.0}

    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=1200.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    # nlbbox was attempted twice (capped), every other extra completed
    assert [c[0] for c in calls].count("nlbbox_mode") == 2
    for name in bench.EXTRA_ORDER:
        if name != "nlbbox_mode":
            assert extra[name] == 1.0


def test_dead_tunnel_probes_then_skips_cheaply():
    """When the tunnel never answers, the budget drains in probe slices
    (not inside opaque hung children) and the phase exits promptly."""
    clock = _FakeClock()
    probes = []

    def runner(name, config, timeout_s):
        clock.t += timeout_s  # every child hangs to its cap
        raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")

    def prober():
        probes.append(clock.t)
        clock.t += 75.0  # probe itself times out
        return False

    def sleep(s):
        clock.t += s

    bench.run_extras_phase(
        "baseline_base", {}, budget=1200.0, runner=runner,
        prober=prober, sleep=sleep, clock=clock)
    # the probe loop ran and stopped once the budget dropped below its
    # floor — the phase never slept out the budget inside one child
    assert probes and clock.t < 1200.0 + bench.EXTRA_CAP_S[
        "multistream_b_sweep"]


def test_recovery_mid_blip_resumes_extras():
    """A ~4-probe tunnel blip during the first extra: the retry fires the
    moment the probe answers and the remaining extras all complete."""
    clock = _FakeClock()
    state = {"probes": 0}

    def runner(name, config, timeout_s):
        if name == "uvltrack_l" and state["probes"] < 4:
            clock.t += min(timeout_s, 330.0)
            raise bench.ExtraTimeoutError("no JSON (rc=timeout)")
        clock.t += 40.0
        return {name: 2.0}

    def prober():
        state["probes"] += 1
        clock.t += 15.0
        return state["probes"] >= 4

    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=1600.0, runner=runner,
        prober=prober, sleep=lambda s: None, clock=clock)
    assert state["probes"] == 4
    for name in bench.EXTRA_ORDER:
        assert extra[name] == 2.0


def test_cold_compile_timeout_escalates_retry_cap():
    """Round-5 cold-workspace failure mode: the child TIMES OUT because of
    a long cold compile while the tunnel probes healthy. The retry must
    run with an escalated (3x) cap so the compile can actually finish and
    seed the persistent cache — same-cap retries time out forever."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        if name == "uvltrack_l" and timeout_s < 500.0:
            clock.t += timeout_s  # cold compile outlives the base cap
            raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")
        clock.t += 50.0
        return {name: 3.0}

    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=2400.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    l_calls = [t for n, t in calls if n == "uvltrack_l"]
    assert len(l_calls) == 2 and l_calls[1] == pytest.approx(
        3 * bench.DEFAULT_EXTRA_CAP_S)
    assert extra["uvltrack_l"] == 3.0
    # a CRASH (non-timeout) retry keeps the base cap: escalation is
    # reserved for the healthy-tunnel timeout signature
    calls.clear()

    def crash_runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        if name == "nlbbox_mode" and len(calls) == 1:
            clock.t += 10.0
            raise RuntimeError("no JSON from extra subprocess (rc=1)")
        clock.t += 10.0
        return {name: 4.0}

    clock.t = 0.0
    bench.run_extras_phase(
        "baseline_base", {}, budget=2400.0, runner=crash_runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    nl_calls = [t for n, t in calls if n == "nlbbox_mode"]
    assert len(nl_calls) == 2 and nl_calls[0] == nl_calls[1]


def test_crash_mentioning_timeout_does_not_escalate():
    """A child that CRASHES fast with 'socket.timeout' in its stderr tail
    must not trigger the 3x cold-compile escalation — escalation keys on
    the typed ExtraTimeoutError, not on message text."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        if name == "nlbbox_mode" and len(
                [c for c in calls if c[0] == name]) == 1:
            clock.t += 5.0
            raise RuntimeError("no JSON from extra subprocess (rc=1): "
                               "socket.timeout: timed out")
        clock.t += 10.0
        return {name: 5.0}

    bench.run_extras_phase(
        "baseline_base", {}, budget=2400.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    nl = [t for n, t in calls if n == "nlbbox_mode"]
    assert len(nl) == 2 and nl[0] == nl[1]  # same cap, no escalation


def test_retry_bounded_by_pending_reserve():
    """A retry (escalated or not) is bounded by remaining budget minus a
    60s-per-pending-extra reserve, so one hung child's retry can never
    starve the queue behind it."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        if name == "nlbbox_mode":  # first extra hangs on BOTH attempts
            clock.t += timeout_s
            raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")
        clock.t += 50.0
        return {name: 6.0}

    # budget 800: attempt 1 burns its 330 cap; the retry must be bounded
    # by remaining (470) minus 5 pending x 60s (300) = 170, NOT run at the
    # full base cap (which would leave 140s for 5 extras)
    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=800.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    nl = [t for n, t in calls if n == "nlbbox_mode"]
    assert len(nl) == 2
    assert nl[1] <= 800.0 - nl[0] - 60.0 * (len(bench.EXTRA_ORDER) - 1)
    # every pending extra still landed inside the reserve it was promised
    for name in bench.EXTRA_ORDER:
        if name != "nlbbox_mode":
            assert extra[name] == 6.0


def test_hopeless_retry_window_is_skipped():
    """When remaining-minus-reserve leaves under 60s, the retry is skipped
    outright instead of burning the pending extras' reserve."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        if name == "nlbbox_mode":
            clock.t += timeout_s
            raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")
        clock.t += 40.0
        return {name: 7.0}

    # budget 680: after the 330s first attempt, remaining=350 and the
    # 5-pending reserve is 300 -> 50s window < 60s floor -> skip retry
    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=680.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    nl = [t for n, t in calls if n == "nlbbox_mode"]
    assert len(nl) == 1  # no second attempt
    for name in bench.EXTRA_ORDER:
        if name != "nlbbox_mode":
            assert extra[name] == 7.0


def test_escalation_is_one_shot_until_it_pays_off():
    """Mid-run tunnel degradation (DEVNOTES mode b): every child hangs to
    its timeout while the probe answers. The FIRST healthy-probe timeout
    earns the 3x cold-compile escalation; once that escalated retry ALSO
    times out, the hypothesis is falsified and later extras retry at base
    cap only — no repeated 990s burns into a stalled tunnel."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        clock.t += timeout_s
        raise bench.ExtraTimeoutError(
            "no JSON from extra subprocess (rc=timeout)")

    bench.run_extras_phase(
        "baseline_base", {}, budget=6000.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    # exactly ONE escalated (>base-cap) retry across the whole phase
    escalated = [
        (n, t) for n, t in calls
        if t > bench.EXTRA_CAP_S.get(n, bench.DEFAULT_EXTRA_CAP_S) + 1e-6]
    assert len(escalated) == 1, calls


def test_escalation_rearms_after_a_successful_escalated_retry():
    """Cold-workspace mode: escalated retries SUCCEED (long compiles seed
    the cache). Each success re-arms escalation for the next extra."""
    clock = _FakeClock()
    calls = []

    def runner(name, config, timeout_s):
        calls.append((name, timeout_s))
        base = bench.EXTRA_CAP_S.get(name, bench.DEFAULT_EXTRA_CAP_S)
        if timeout_s <= base:  # first attempt: cold compile outlives cap
            clock.t += timeout_s
            raise bench.ExtraTimeoutError(
                "no JSON from extra subprocess (rc=timeout)")
        clock.t += base + 30.0  # escalated retry finishes past base cap
        return {name: 9.0}

    extra = bench.run_extras_phase(
        "baseline_base", {}, budget=9000.0, runner=runner,
        prober=lambda: True, sleep=lambda s: None, clock=clock)
    # every extra eventually landed via an escalated retry
    for name in bench.EXTRA_ORDER:
        assert extra[name] == 9.0
    escalated = [
        (n, t) for n, t in calls
        if t > bench.EXTRA_CAP_S.get(n, bench.DEFAULT_EXTRA_CAP_S) + 1e-6]
    assert len(escalated) == len(bench.EXTRA_ORDER), calls
