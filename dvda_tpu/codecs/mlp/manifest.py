"""Track manifest: mid-track resume points for MLP streams.

Reference analog: the reference has no decoder-state checkpointing — its
only random access is track-granularity sector seek + re-probe to the next
major sync (aob_reader_seek, aob.c:181, used at dvd-audio.c:616; TODO
notes 63-79 describe major syncs as the natural resume points).  The
rebuild makes that structure a first-class artifact (SURVEY §5
checkpoint/resume): a **manifest** of the frames where decode can start
bit-exactly, enabling sample-accurate partial decode and parallel decode
starts without replaying the prefix.

A frame is a *resume point* when

* it begins with a **major sync** (the decoder's probe anchor — feeding
  the stream suffix from here parses identically to a track that starts
  here), and
* every substream emits a **restart header** in the frame's first block
  (IIR filter state and the rematrix noise seed reload there), and
* no post-restart block carries FIR state (``fir_across_restart`` quirk,
  spec.py) — FIR taps are the only state that survives a restart.

Frame 0 is always a resume point.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .probe import MAJOR_SYNC_PATTERN

__all__ = ["ResumePoint", "TrackManifest", "build_manifest"]


@dataclass(frozen=True)
class ResumePoint:
    frame: int       # frame index within the track
    byte_offset: int  # offset of the frame in the assembled MLP stream
    pcm_frame: int   # first PCM frame this frame decodes to


@dataclass(frozen=True)
class TrackManifest:
    points: tuple[ResumePoint, ...]
    total_frames: int
    total_pcm_frames: int

    def resume_for_pcm_frame(self, pcm_frame: int) -> ResumePoint:
        """Latest resume point at or before ``pcm_frame``."""
        best = self.points[0]
        for p in self.points:
            if p.pcm_frame > pcm_frame:
                break
            best = p
        return best


def build_manifest(stream: bytes, parse, F: int) -> TrackManifest:
    """Build the resume manifest from a native parse (host.NativeParse)
    limited to the first ``F`` frames (the track's frame cut)."""
    frame_end = np.asarray(parse.frame_end[:F], dtype=np.int64)
    frame_len = np.asarray(parse.frame_len[:F], dtype=np.int64)
    starts = np.concatenate([[0], frame_end[:-1]]) if F else frame_end
    pcm_at = np.concatenate([[0], np.cumsum(frame_len)[:-1]]) if F else frame_len

    # per-substream: frame's first block index, restart + FIR-coupling flags
    clean = np.ones(F, dtype=bool)
    for s in range(parse.substream_count):
        sub = parse.sub[s]
        nb = np.asarray(sub["fr_nblocks"][:F], dtype=np.int64)
        first_blk = np.concatenate([[0], np.cumsum(nb)[:-1]]) if F else nb
        restart = np.asarray(sub["restart"])
        rc_fir = np.asarray(sub["rc_fir"])
        has_blocks = nb > 0
        blk = np.minimum(first_blk, max(0, restart.shape[0] - 1))
        starts_restart = has_blocks & restart[blk]
        fir_free = ~rc_fir[blk].any(axis=(1, 2))
        clean &= starts_restart & fir_free
    clean[0:1] = True  # stream start is always decodable

    points = []
    for i in np.nonzero(clean)[0]:
        off = int(starts[i])
        if i and stream[off + 4 : off + 8] != MAJOR_SYNC_PATTERN:
            continue  # no major sync: the probe could not anchor here
        points.append(ResumePoint(int(i), off, int(pcm_at[i])))
    total_pcm = int(frame_len.sum()) if F else 0
    return TrackManifest(tuple(points), F, total_pcm)
