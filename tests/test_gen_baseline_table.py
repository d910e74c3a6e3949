"""tools/gen_baseline_table.py --from: the offline aggregation path the
round-5 BASELINE table was built with (the relay can wedge a live 3-run
sitting, so captured per-run JSON lines must keep regenerating the same
median-first table)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_from_mode_aggregates_captures(tmp_path):
    runs = sorted(
        os.path.join(REPO, "docs", "bench_runs", f)
        for f in os.listdir(os.path.join(REPO, "docs", "bench_runs"))
        if f.endswith(".jsonl"))
    assert len(runs) >= 3  # the archived round-5 captures
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_baseline_table.py"),
         "--from", *runs],
        capture_output=True, text=True, timeout=60, check=True)
    out = proc.stdout
    assert f"over {len(runs)} full bench runs" in out
    # every table row the BASELINE doc carries must regenerate
    for label in ("PCM 2ch/16/48k", "MLP stereo", "host-complete",
                  "Non-uniform MLP"):
        assert label in out, label
    assert "headline runs (value):" in out


def test_from_mode_tolerates_stderr_first_capture(tmp_path):
    """A `cmd > f 2>&1` capture interleaves the stderr `full results:`
    line BEFORE the stdout JSON — load_captured must still fold it in
    (review r5: this ordering crashed with got=None)."""
    src = os.path.join(REPO, "docs", "bench_runs")
    name = sorted(f for f in os.listdir(src) if f.endswith(".jsonl"))[0]
    lines = open(os.path.join(src, name)).read().strip().splitlines()
    assert len(lines) >= 2  # stdout JSON + full-results detail
    flipped = tmp_path / "flipped.jsonl"
    flipped.write_text("\n".join(reversed(lines)) + "\n")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_baseline_table.py"),
         "--from", str(flipped)],
        capture_output=True, text=True, timeout=60, check=True)
    assert "over 1 full bench runs" in proc.stdout
    assert "PCM 2ch/16/48k" in proc.stdout
