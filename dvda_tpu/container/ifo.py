"""IFO (table-of-contents) parsers for DVD-Audio discs.

Reference analogs:
* AUDIO_TS.IFO titleset count — get_titleset_count, dvd-audio.c:824-858
  (magic ``DVDAUDIO-AMG``, titleset count at the documented offset).
* ATS_XX_0.IFO title/track/index tables — parse_ats_XX_0_ifo and
  parse_ats_XX_0_ifo_title, dvd-audio.c:860-950 (magic ``DVDAUDIO-ATS``,
  title table at sector 1, per-title track + sector-pointer tables).
* Track sector-range resolution (first/last sector, including the
  next-title/next-track lookahead) — dvda_open_title, dvd-audio.c:437-502.

These are pure host-side parsers producing plain dataclasses; they are cheap,
run once per disc, and feed the decode planner with flat sector ranges.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bitstream import BitReader, BitstreamError

__all__ = [
    "IfoError",
    "AtsTrack",
    "AtsIndex",
    "AtsTitle",
    "AtsIfo",
    "TrackSpan",
    "TitleToc",
    "parse_audio_ts_ifo",
    "parse_ats_ifo",
    "resolve_title_toc",
]

SECTOR_SIZE = 2048
AMG_MAGIC = b"DVDAUDIO-AMG"
ATS_MAGIC = b"DVDAUDIO-ATS"


class IfoError(ValueError):
    """Raised when an IFO file is missing its magic or otherwise malformed."""


def parse_audio_ts_ifo(data: bytes) -> int:
    """Parse AUDIO_TS.IFO and return the titleset count.

    Field layout per dvd-audio.c:840-847: 12-byte magic, then the packed
    header; the titleset count is a single byte 63 bytes into the file.
    """
    r = BitReader(data)
    try:
        magic, count = r.parse("12b 32p 12P 32p 16p 4P 16p 16p 8p 4P 8p 32p 10P 8p 8u")
    except BitstreamError as exc:
        raise IfoError("truncated AUDIO_TS.IFO") from exc
    if magic != AMG_MAGIC:
        raise IfoError("AUDIO_TS.IFO magic mismatch")
    return count


@dataclass
class AtsTrack:
    index_number: int
    pts_index: int
    pts_length: int


@dataclass
class AtsIndex:
    first_sector: int
    last_sector: int


@dataclass
class AtsTitle:
    track_count: int
    index_count: int
    pts_length: int
    tracks: list[AtsTrack] = field(default_factory=list)
    indexes: list[AtsIndex] = field(default_factory=list)


@dataclass
class AtsIfo:
    title_count: int
    titles: list[AtsTitle] = field(default_factory=list)


def parse_ats_ifo(data: bytes) -> AtsIfo:
    """Parse an ATS_XX_0.IFO file (dvd-audio.c:860-950)."""
    r = BitReader(data)
    try:
        if r.read_bytes(12) != ATS_MAGIC:
            raise IfoError("ATS_XX_0.IFO magic mismatch")
        r.seek_bytes(SECTOR_SIZE)
        (title_count,) = r.parse("16u 16p 32p")
        ifo = AtsIfo(title_count=title_count)
        for _ in range(title_count):
            _title_number, table_offset = r.parse("8u 24p 32u")
            saved = r.getpos()
            r.seek_bytes(SECTOR_SIZE + table_offset)
            ifo.titles.append(_parse_title(r, table_offset))
            r.setpos(saved)
        return ifo
    except BitstreamError as exc:
        raise IfoError("truncated ATS_XX_0.IFO") from exc


def _parse_title(r: BitReader, table_offset: int) -> AtsTitle:
    """Per-title table (parse_ats_XX_0_ifo_title, dvd-audio.c:916-950)."""
    track_count, index_count, pts_length, sector_pointers_offset = r.parse(
        "16p 8u 8u 32u 32p 16u 16p"
    )
    title = AtsTitle(track_count=track_count, index_count=index_count, pts_length=pts_length)
    for _ in range(track_count):
        index_number, pts_index, pts_len = r.parse("32p 8u 8p 32u 32u 48p")
        title.tracks.append(AtsTrack(index_number, pts_index, pts_len))
    r.seek_bytes(SECTOR_SIZE + table_offset + sector_pointers_offset)
    for _ in range(index_count):
        _index_id, first, last = r.parse("32u 32u 32u")
        title.indexes.append(AtsIndex(first, last))
    return title


@dataclass
class TrackSpan:
    """A track's resolved position: PTS timing plus sector range."""

    pts_index: int
    pts_length: int
    first_sector: int
    last_sector: int


@dataclass
class TitleToc:
    title_number: int
    pts_length: int
    tracks: list[TrackSpan]


def resolve_title_toc(ifo: AtsIfo, title_number: int) -> TitleToc:
    """Resolve a title's track sector spans (dvda_open_title, dvd-audio.c:437-502).

    A track's last sector is normally one before the next track's first
    sector; the final track of a non-final title extends to
    ``max(next_title_first - 1, own_index_last)``; the final track of the
    final title uses its own index's last sector.
    """
    if title_number < 1 or title_number > ifo.title_count:
        raise IfoError(f"title {title_number} out of range")
    t = ifo.titles[title_number - 1]
    tracks: list[TrackSpan] = []
    for i, tr in enumerate(t.tracks):
        idx = t.indexes[tr.index_number - 1]
        first = idx.first_sector
        last_track = i + 1 == t.track_count
        if not last_track:
            nxt = t.tracks[i + 1]
            last = t.indexes[nxt.index_number - 1].first_sector - 1
        else:
            last_title = title_number == ifo.title_count
            if last_title:
                last = idx.last_sector
            else:
                next_title = ifo.titles[title_number]
                if next_title.track_count:
                    nxt = next_title.tracks[0]
                    next_first = next_title.indexes[nxt.index_number - 1].first_sector
                    last = max(next_first - 1, idx.last_sector)
                else:
                    last = idx.last_sector
        tracks.append(TrackSpan(tr.pts_index, tr.pts_length, first, last))
    return TitleToc(title_number=title_number, pts_length=t.pts_length, tracks=tracks)
