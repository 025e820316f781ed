"""Pure-Python tests for bench.py's scaling retry logic: the stall
classifier must flag exactly the documented external-tenancy signatures
(BASELINE.md forensics), and the retry loop must stop at the first attempt
with clean forensics — it selects for measurement conditions, never for a
favorable efficiency ratio."""

import importlib.util
import json
import os


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_host_stalled_signatures():
    bench = _load_bench()
    # the r4 degraded-phase reading: loadavg 41.3 at 99.9% idle -> stalled
    assert bench._host_stalled(
        {"load1": 41.3, "idle_pct": 99.9, "steal_pct": 0.0})
    # hypervisor steal alone -> stalled
    assert bench._host_stalled(
        {"load1": 1.0, "idle_pct": 60.0, "steal_pct": 11.6})
    # quiet box -> clean
    assert not bench._host_stalled(
        {"load1": 0.9, "idle_pct": 99.9, "steal_pct": 0.1})
    # busy box doing OUR work (high load, low idle, no steal) -> clean
    assert not bench._host_stalled(
        {"load1": 30.0, "idle_pct": 5.0, "steal_pct": 0.0})


def test_leg_stalled_signatures():
    bench = _load_bench()
    # healthy 8-CPU leg on a 32-CPU box: ~75% idle, nothing blocked
    assert not bench._leg_stalled(
        {"idle_med": 75.0, "iowait_med": 0.5, "steal_med": 0.2,
         "blocked_med": 0})
    # healthy saturated 32-CPU leg
    assert not bench._leg_stalled(
        {"idle_med": 8.0, "iowait_med": 1.0, "steal_med": 0.0,
         "blocked_med": 1})
    # hypervisor steal during the leg -> stalled
    assert bench._leg_stalled(
        {"idle_med": 40.0, "iowait_med": 1.0, "steal_med": 11.0,
         "blocked_med": 0})
    # D-state pileup while the CPU idles (the r4 signature) -> stalled
    assert bench._leg_stalled(
        {"idle_med": 95.0, "iowait_med": 2.0, "steal_med": 0.0,
         "blocked_med": 12})
    # sustained iowait -> stalled
    assert bench._leg_stalled(
        {"idle_med": 30.0, "iowait_med": 25.0, "steal_med": 0.0,
         "blocked_med": 2})


def test_retry_until_clean_stops_at_first_clean(monkeypatch, capsys):
    bench = _load_bench()
    # efficiencies deliberately DECREASE across attempts: the loop must
    # stop at the first clean attempt (the worse 0.5), proving selection
    # is on forensics, not on the ratio
    seq = [
        {"scaling_efficiency": 0.9, "sec_8cpu": 1.0, "sec_32cpu": 1.0,
         "host_pre": {"load1": 40.0, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_post": {"load1": 40.0, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_clean": False},
        {"scaling_efficiency": 0.5, "sec_8cpu": 1.0, "sec_32cpu": 1.0,
         "host_pre": {"load1": 0.5, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_post": {"load1": 0.5, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_clean": True},
        {"scaling_efficiency": 1.0, "sec_8cpu": 1.0, "sec_32cpu": 1.0,
         "host_pre": {"load1": 0.5, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_post": {"load1": 0.5, "idle_pct": 99.0, "steal_pct": 0.0},
         "host_clean": True},
    ]
    calls = {"n": 0}

    def fake_once():
        rec = seq[calls["n"]]
        calls["n"] += 1
        return rec

    monkeypatch.setattr(bench, "_scaling_once", fake_once)
    monkeypatch.setattr(bench, "_settle", lambda *a, **k: None)
    bench.scaling(retries=3)
    out = json.loads(capsys.readouterr().out.strip())
    assert calls["n"] == 2, "must stop at the FIRST clean attempt"
    assert out["scaling_efficiency"] == 0.5
    assert out["host_clean"] is True
    assert len(out["attempts"]) == 2
    assert [a["host_clean"] for a in out["attempts"]] == [False, True]


def test_retry_exhaustion_reports_last_attempt(monkeypatch, capsys):
    bench = _load_bench()
    dirty = {"scaling_efficiency": 0.7, "sec_8cpu": 1.0, "sec_32cpu": 1.0,
             "host_pre": {"load1": 40.0, "idle_pct": 99.0,
                          "steal_pct": 0.0},
             "host_post": {"load1": 40.0, "idle_pct": 99.0,
                           "steal_pct": 0.0},
             "host_clean": False}
    monkeypatch.setattr(bench, "_scaling_once", lambda: dict(dirty))
    monkeypatch.setattr(bench, "_settle", lambda *a, **k: None)
    bench.scaling(retries=3)
    out = json.loads(capsys.readouterr().out.strip())
    assert out["host_clean"] is False
    assert len(out["attempts"]) == 3
