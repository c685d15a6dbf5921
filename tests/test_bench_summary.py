"""bench.py delivery-layer unit tests (VERDICT r4 item 1a).

The driver records only the LAST 2000 chars of bench stdout; r4's rich
cumulative line outgrew that window and the scoreboard parsed null. These
tests pin the contract: the compact summary (printed as the very last line
after every mode) stays under 1500 bytes in every regime, including the
worst case where all 10 modes error with long messages.
"""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_compact_summary_all_errors_fits_tail():
    modes = {
        m: {"error": "TimeoutExpired: Command '['/opt/venv/bin/python', "
                     "'/root/repo/bench.py']' timed out after "
                     "314.5259326128121 seconds of budget exhaustion " + "x" * 100}
        for m, _ in bench._ALL_MODES
    }
    line = bench._compact_summary(modes)
    assert len(line.encode()) < 1500, len(line)
    d = json.loads(line)
    assert len(d["extra"]["modes"]) == len(bench._ALL_MODES)
    for e in d["extra"]["modes"].values():
        assert len(e["error"]) <= 60


def test_compact_summary_realistic_run_fits_tail():
    long_unit = ("collectives/step (0 => communication-free => linear "
                 "scaling across every chip)")
    modes = {}
    for m, _ in bench._ALL_MODES:
        modes[m] = {
            "metric": f"some very long metric name for mode {m} on a chip",
            "value": 21097046.123456,
            "unit": long_unit,
            "vs_baseline": 21.097,
            "compile_s": 123.4,
            "cache_new": 17,
            "latency_matrix": {"big": "stuff that must NOT be carried"},
            "wall_s": 1234.5,
        }
    line = bench._compact_summary(modes)
    assert len(line.encode()) < 1500, len(line)
    d = json.loads(line)
    pts = d["extra"]["modes"]["points"]
    assert pts["value"] == 21097046.123456
    assert pts["compile_s"] == 123.4
    assert len(pts["unit"]) <= 28
    assert "latency_matrix" not in pts
    # headline block mirrors the points mode
    assert d["value"] == 21097046.123456


def test_compact_summary_mixed_skip_and_success():
    modes = {
        "points": {"value": 2.1e7, "unit": "points/s", "vs_baseline": 21.0,
                   "metric": "points/s/chip"},
        "dino": {"skipped": "budget"},
        "exact": {"error": "x" * 500},
    }
    line = bench._compact_summary(modes)
    assert len(line.encode()) < 1500
    d = json.loads(line)
    assert d["extra"]["modes"]["dino"] == {"skipped": "budget"}
    assert d["vs_baseline"] == 21.0


def test_cache_entry_counts_shape(tmp_path, monkeypatch):
    monkeypatch.setenv("ELEV_TPU_CACHE_ROOT", str(tmp_path))
    (tmp_path / "jax").mkdir()
    (tmp_path / "jax" / "a").write_bytes(b"1")
    out = bench._cache_entry_counts()
    assert out == {"jax": 1, "jax-cpu": 0}


def test_budget_planner_gives_first_cold_mode_the_slack():
    """The slot formula (run_all_modes): remaining minus later modes' warm
    reservations — the first mode of a cold 1320 s run gets a slot several
    times its warm cost, and every later mode keeps at least min_slot."""
    budget = 1320.0
    min_slot = 75.0
    mode_cap = 1200.0
    remaining = budget
    slots = []
    for mi, (m, _) in enumerate(bench._ALL_MODES):
        reserve = sum(bench._EXPECTED_WARM_S.get(mm, 80)
                      for mm, _ in bench._ALL_MODES[mi + 1:])
        slot = min(mode_cap, remaining, max(min_slot, remaining - reserve))
        slots.append(slot)
        remaining -= bench._EXPECTED_WARM_S[m]  # mode finishes warm
    # first mode may take the whole slack beyond everyone else's warm needs
    assert slots[0] >= 500
    # and no mode is ever starved below the minimum useful slot
    assert min(slots) >= min_slot


def test_orchestrator_end_to_end_last_line_is_compact(tmp_path):
    """Drive the REAL run_all_modes subprocess plumbing (the delivery layer
    that lost the r4 scoreboard): a success mode and a crashing mode via
    the BENCH_MODES hook. The LAST stdout line must be the compact
    scoreboard — parseable, <1500 bytes, both modes present, the failure
    as a truncated error — and every mode line must carry cache_new."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update({
        "BENCH_MODES": "_noop,_noop_err",
        "BENCH_ATTACH_CAP": "0",          # no device touch in tests
        "BENCH_TOTAL_BUDGET": "120",
        "BENCH_MIN_SLOT": "1",
        "ELEV_TPU_CACHE_ROOT": str(tmp_path),
    })
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert p.returncode == 0, p.stderr[-500:]
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    last = json.loads(lines[-1])
    assert len(lines[-1].encode()) < 1500
    m = last["extra"]["modes"]
    assert m["_noop"]["value"] == 1.0
    assert "error" in m["_noop_err"] and len(m["_noop_err"]["error"]) <= 60
    # per-mode lines carry the cache telemetry
    mode_lines = [json.loads(l) for l in lines if '"mode"' in l[:12]]
    assert {d["mode"] for d in mode_lines} == {"_noop", "_noop_err"}
    assert all("cache_new" in d for d in mode_lines)
    # and the compact line is printed after every mode, so ANY tail cut
    # still ends in a parseable scoreboard: the line before the last mode
    # block is also a compact summary
    compacts = [l for l in lines if l.startswith('{"metric"') and "modes" in l]
    assert len(compacts) >= 4  # rich + compact per mode, compact last
