"""Driver-facing contract of bench.py's supervisor (no device needed).

Round 3 lost ALL perf evidence to a single hang because the old bench
printed its one JSON line only at the very end (VERDICT r3 weak #1).
The supervisor's contract — the driver parses the LAST parseable line
of stdout — is what these tests pin down: every emit() must be a
complete, parseable line; phase results/failures must degrade the
extras, never the parseability; and the headline `value` must stay the
round-1/2 per-chunk convention (VERDICT r3 item 2).

bench.py imports only stdlib at module level, so these tests are safe
on any platform (no jax, no device).
"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_headline_value_is_per_chunk_bunny_rate(bench):
    bunny = {"steps_per_sec": 1470.0, "steps_per_sec_steady_probe": 5100.0,
             "max_rel_err": 2.1e-5}
    d = json.loads(bench.assemble_line(bunny, {"train_steps_per_sec": 43.5}))
    assert d["metric"] == "bunny_multigrid_train_steps_per_sec"
    assert d["unit"] == "steps/s"
    # Continuity: value is the per-chunk number, NOT the chained probe.
    assert d["value"] == 1470.0
    assert d["vs_baseline"] == round(1470.0 / (2000.0 / 85.0), 2)
    # The probe is present but clearly labeled as a separate convention.
    assert (d["extra"]["bunny_steps_per_sec_steady_chained_probe"]
            == 5100.0)
    assert "convention" in d["extra"]


def test_missing_phases_degrade_to_labeled_errors(bench):
    d = json.loads(bench.assemble_line(None, None))
    assert d["value"] == 0.0
    assert "error" in d["extra"]
    assert d["extra"]["cloud_300k"] == {"error": "no result"}
    # Still a fully parseable driver line even with zero evidence.
    assert d["metric"] == "bunny_multigrid_train_steps_per_sec"


def test_xl_phase_is_optional_extra(bench):
    bunny = {"steps_per_sec": 1500.0}
    xl = {"n": 1_000_000, "train_steps_per_sec": 9.7, "step_mfu": 0.2}
    with_xl = json.loads(bench.assemble_line(bunny, None, xl=xl))
    without = json.loads(bench.assemble_line(bunny, None, xl=None))
    skipped = json.loads(
        bench.assemble_line(bunny, None, xl={"skipped": "no .cache_1m"}))
    assert with_xl["extra"]["cloud_1m_training"]["step_mfu"] == 0.2
    assert "cloud_1m_training" not in without["extra"]
    assert skipped["extra"]["cloud_1m_training"] == {
        "skipped": "no .cache_1m"}
    # The optional phase never changes the headline.
    assert with_xl["value"] == without["value"] == 1500.0


def test_emit_prints_one_parseable_line_per_call(bench, tmp_path, capsys,
                                                 monkeypatch):
    """emit() reads whatever phase files exist and always prints a full
    JSON line — the provisional-then-overwrite pattern the driver's
    last-parseable-line parser relies on."""
    monkeypatch.setattr(bench, "OUT_DIR", str(tmp_path))
    bench.emit(note="provisional: before optional 1M phase")
    bench.write_json(str(tmp_path / "bunny.json"),
                     {"steps_per_sec": 1400.0})
    bench.write_json(str(tmp_path / "xl.json"), {"train_steps_per_sec": 9.0})
    bench.emit()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    parsed = [json.loads(ln) for ln in lines]  # every line parseable
    assert len(parsed) == 2
    assert parsed[0]["value"] == 0.0
    assert parsed[0]["extra"]["note"].startswith("provisional")
    # Last parseable line wins: enriched result replaces the provisional.
    assert parsed[-1]["value"] == 1400.0
    assert parsed[-1]["extra"]["cloud_1m_training"][
        "train_steps_per_sec"] == 9.0


def test_write_json_is_atomic_and_readable_back(bench, tmp_path):
    p = str(tmp_path / "phase.json")
    bench.write_json(p, {"a": 1})
    assert bench.read_json(p) == {"a": 1}
    assert bench.read_json(str(tmp_path / "missing.json")) is None


def test_run_phase_caps_init_retries(bench, tmp_path, monkeypatch):
    """A child that keeps failing TPU init (rc=3/4) is retried — outage
    windows open and close — but only up to the soft cap, so a
    deterministic init failure cannot starve later phases of the whole
    deadline (review r5)."""
    import time as _time

    launches = []

    class FakeProc:
        def wait(self, timeout=None):
            return bench.RC_INIT_ERROR

        def kill(self):
            pass

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: launches.append(1) or FakeProc())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok = bench.run_phase("bunny", str(tmp_path / "bunny.json"),
                         budget_s=100, deadline=_time.monotonic() + 10_000)
    assert ok is False
    assert len(launches) == 10  # soft cap, not deadline exhaustion
