"""Case-insensitive AUDIO_TS directory resolution.

Reference analog: src/audio_ts.c:38-73 (find_audio_ts_file) — DVD-Audio
filesystems may surface as upper- or lower-case names depending on how the
disc is mounted, so every file lookup scans the directory case-insensitively.
"""

from __future__ import annotations

import os

__all__ = ["find_audio_ts_file"]


def find_audio_ts_file(audio_ts_path: str | os.PathLike, filename: str) -> str | None:
    """Return the full path of ``filename`` inside ``audio_ts_path``,
    matching case-insensitively, or ``None`` if absent."""
    try:
        entries = os.listdir(audio_ts_path)
    except OSError:
        return None
    want = filename.upper()
    for entry in entries:
        if entry.upper() == want:
            return os.path.join(os.fspath(audio_ts_path), entry)
    return None
