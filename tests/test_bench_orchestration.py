"""Unit tests of bench.py's PARENT process: the budget/stall/retry
orchestration that decides whether the driver banks a number at all.

The measurement stages themselves are exercised on real hardware; what broke
in round 2 (BENCH_r02.json rc=124, no number recorded) was the orchestration
around them. These tests drive ``_spawn``/``main`` against a scripted fake
child (``bench.__file__`` pointed at a stub that behaves per BENCH_FAKE_MODE)
so the stall detector, the JSON banking, the adaptive deadline extension and
the headline→fallback retry loop are all covered on CPU in milliseconds.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import textwrap
import time

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fake_child(tmp_path):
    """A stand-in for ``bench.py --stage``: behavior keyed off
    BENCH_FAKE_MODE, so _spawn's real subprocess machinery runs unchanged."""
    script = tmp_path / "fake_bench_child.py"
    script.write_text(textwrap.dedent("""
        import json, os, sys, time
        mode = os.environ.get("BENCH_FAKE_MODE", "ok")
        stage = sys.argv[sys.argv.index("--stage") + 1]
        if mode == "hang":
            time.sleep(120)
        elif mode == "ok":
            print("host ingest: 1.0s", flush=True)
            print(json.dumps({"value": 700.0, "stage": stage}), flush=True)
            print(json.dumps({"value": 700.0, "stage": stage,
                              "extras": {"serving": 5000.0}}), flush=True)
        elif mode == "hang-after-json":
            print(json.dumps({"value": 700.0, "stage": stage}), flush=True)
            time.sleep(120)
        elif mode == "fallback-only":
            if stage == "headline":
                time.sleep(120)
            print(json.dumps({"value": 500.0, "stage": stage}), flush=True)
        elif mode == "headline-second-try":
            # headline hangs on its FIRST attempt only (flag file marks it);
            # models a transient relay stall window
            flag = os.environ["BENCH_FAKE_FLAG"]
            if stage == "headline":
                if not os.path.exists(flag):
                    open(flag, "w").close()
                    time.sleep(120)
                print(json.dumps({"value": 700.0, "stage": stage}), flush=True)
            else:
                print(json.dumps({"value": 500.0, "stage": stage}), flush=True)
    """))
    return str(script)


def _point_at(bench, monkeypatch, fake_child, mode):
    monkeypatch.setattr(bench, "__file__", fake_child)
    monkeypatch.setenv("BENCH_FAKE_MODE", mode)


def test_spawn_banks_last_json_line(bench, monkeypatch, fake_child):
    _point_at(bench, monkeypatch, fake_child, "ok")
    out = bench._spawn("headline", timeout=30, deadline=time.monotonic() + 60)
    assert out == {"value": 700.0, "stage": "headline",
                   "extras": {"serving": 5000.0}}


def test_spawn_stall_detector_kills_silent_child(bench, monkeypatch,
                                                 fake_child):
    _point_at(bench, monkeypatch, fake_child, "hang")
    monkeypatch.setenv("BENCH_STALL", "1")
    t0 = time.monotonic()
    out = bench._spawn("headline", timeout=60, deadline=time.monotonic() + 90)
    # killed by the 1 s stall detector, NOT the 60 s stage timeout
    assert out is None and time.monotonic() - t0 < 30


def test_spawn_keeps_banked_json_if_child_later_hangs(bench, monkeypatch,
                                                      fake_child):
    """The adaptive-deadline path: once the train JSON is printed, a later
    hang (e.g. the serving extras' executable load) must not lose it."""
    _point_at(bench, monkeypatch, fake_child, "hang-after-json")
    # generous stall window: interpreter startup on this 1-core host can
    # take seconds when the full suite runs concurrently
    monkeypatch.setenv("BENCH_STALL", "10")
    out = bench._spawn("headline", timeout=90, deadline=time.monotonic() + 120)
    assert out == {"value": 700.0, "stage": "headline"}


def test_main_falls_back_when_headline_stalls(bench, monkeypatch, fake_child,
                                              capsys):
    _point_at(bench, monkeypatch, fake_child, "fallback-only")
    monkeypatch.setenv("BENCH_STALL", "10")
    monkeypatch.setenv("BENCH_BUDGET", "90")
    monkeypatch.setenv("BENCH_FALLBACK_RESERVE", "30")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench.main() == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == {"value": 500.0, "stage": "fallback"}


def test_main_upgrades_fallback_to_headline(bench, monkeypatch, fake_child,
                                            tmp_path, capsys):
    """A banked fallback number is NOT final: remaining budget retries the
    headline stage, whose number replaces it (the relay-stall-window case
    measured in round 4: fallback banked 538/s while the headline would
    have delivered ~744/s on its next attempt)."""
    _point_at(bench, monkeypatch, fake_child, "headline-second-try")
    monkeypatch.setenv("BENCH_FAKE_FLAG", str(tmp_path / "first_try"))
    monkeypatch.setenv("BENCH_STALL", "10")
    monkeypatch.setenv("BENCH_BUDGET", "90")
    monkeypatch.setenv("BENCH_FALLBACK_RESERVE", "30")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench.main() == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == {"value": 700.0, "stage": "headline"}


def test_main_rc_nonzero_when_everything_fails(bench, monkeypatch, fake_child,
                                               capsys):
    _point_at(bench, monkeypatch, fake_child, "hang")
    monkeypatch.setenv("BENCH_STALL", "2")
    monkeypatch.setenv("BENCH_BUDGET", "70")
    monkeypatch.setenv("BENCH_FALLBACK_RESERVE", "5")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench.main() == 1
    assert capsys.readouterr().out.strip() == ""  # no bogus JSON emitted
