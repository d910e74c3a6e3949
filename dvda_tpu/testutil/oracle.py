"""Run the reference decoder as a golden-output oracle.

The reference binaries are built out-of-tree into ``.refbuild/`` by
``tools/build_reference_oracle.sh`` (see SURVEY §4: golden-file parity is
the only viable test strategy since no real discs are available).
"""

from __future__ import annotations

import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ORACLE_DIR = os.path.join(_REPO, ".refbuild")
DVDA2WAV = os.path.join(ORACLE_DIR, "dvda2wav")
DEBUG_INFO = os.path.join(ORACLE_DIR, "dvda-debug-info")


def ensure_built() -> bool:
    if os.path.exists(DVDA2WAV):
        return True
    script = os.path.join(_REPO, "tools", "build_reference_oracle.sh")
    try:
        subprocess.run([script], check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        return False
    return os.path.exists(DVDA2WAV)


def run_dvda2wav(audio_ts: str, out_dir: str, title: int | None = None,
                 track: int | None = None) -> dict[str, bytes]:
    """Run the oracle extractor; returns {filename: wav_bytes}."""
    os.makedirs(out_dir, exist_ok=True)
    cmd = [DVDA2WAV, "-A", audio_ts, "-d", out_dir]
    if title is not None:
        cmd += ["-T", str(title)]
    if track is not None:
        cmd += ["-t", str(track)]
    subprocess.run(cmd, check=True, capture_output=True)
    out = {}
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".wav"):
            with open(os.path.join(out_dir, name), "rb") as f:
                out[name] = f.read()
    return out


def run_debug_info(audio_ts: str) -> str:
    res = subprocess.run([DEBUG_INFO, "-A", audio_ts], check=True,
                         capture_output=True, text=True)
    return res.stdout
