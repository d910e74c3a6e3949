"""Synthetic DVD-Audio disc builder for tests and benchmarks.

The reference ships no test data (SURVEY §4), so golden-parity testing
requires synthesising AUDIO_TS images that both this framework and the
reference ``dvda2wav`` (built as an oracle from /root/reference) accept.

Formats produced here mirror the layouts the parsers expect:
* AUDIO_TS.IFO — magic + titleset count at byte 63 (dvd-audio.c:824-858);
* ATS_XX_0.IFO — title/track/index tables (dvd-audio.c:860-950);
* AOB sectors — MPEG-2 pack header + audio packet (+ 0xBE padding packet
  filling the sector exactly, since a short tail would abort the demux,
  packet.c:91-115);
* audio packets — PES sub-header, then for PCM the 9-byte stream
  parameters + byte-swizzled chunk data (pcm.c:79-166), for MLP the raw
  frame stream (frames may span packets).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import BitWriter
from ..codecs.params import (
    PCM_CODEC_ID,
    MLP_CODEC_ID,
    PTS_PER_SECOND,
    unpack_channel_count,
)
from ..codecs.pcm import chunk_size

SECTOR_SIZE = 2048

__all__ = ["PcmTrackSpec", "MlpTrackSpec", "build_disc", "SECTOR_SIZE"]

# packed-field encodings (inverse of dvd-audio.c:1423-1457)
RATE_CODE = {48000: 0, 96000: 1, 192000: 2, 44100: 8, 88200: 9, 176400: 10}
BPS_CODE = {16: 0, 20: 1, 24: 2}


@dataclass
class PcmTrackSpec:
    """A synthetic PCM track: random bytes decoded deterministically."""

    pcm_frames: int  # should make pts_length integral (mult. of 32 is safe)
    sample_rate: int = 48000
    bits_per_sample: int = 16
    channel_assignment: int = 1
    seed: int = 0

    @property
    def channels(self) -> int:
        return unpack_channel_count(self.channel_assignment)

    @property
    def pts_length(self) -> int:
        pts = self.pcm_frames * PTS_PER_SECOND / self.sample_rate
        assert pts == int(pts), "pick pcm_frames so the PTS length is integral"
        return int(pts)


@dataclass
class MlpTrackSpec:
    """A synthetic MLP track carrying a pre-built MLP frame stream."""

    mlp_stream: bytes
    pcm_frames: int
    sample_rate: int = 48000
    channel_assignment: int = 1

    @property
    def channels(self) -> int:
        return unpack_channel_count(self.channel_assignment)

    @property
    def pts_length(self) -> int:
        return int(round(self.pcm_frames * PTS_PER_SECOND / self.sample_rate))


def _pack_header() -> bytes:
    """A valid MPEG-2 pack header, 14 bytes, no stuffing (packet.c:137-188)."""
    w = BitWriter()
    w.write(32, 0x000001BA)
    w.write(2, 1)      # MPEG-2 marker '01'
    w.write(3, 0)      # PTS high
    w.write(1, 1)
    w.write(15, 0)     # PTS mid
    w.write(1, 1)
    w.write(15, 0)     # PTS low
    w.write(1, 1)
    w.write(9, 0)      # SCR extension
    w.write(1, 1)
    w.write(22, 0)     # bitrate
    w.write(2, 3)
    w.write(5, 0x1F)   # reserved
    w.write(3, 0)      # stuffing count
    return w.getvalue()


def _packet(stream_id: int, payload: bytes) -> bytes:
    return b"\x00\x00\x01" + bytes([stream_id]) + len(payload).to_bytes(2, "big") + payload


def _audio_payload_header(codec_id: int, pad_2: bytes) -> bytes:
    """PES flags (2B) + pad-1 size (0) + codec header + pad-2 region
    (read_audio_packet_header, dvd-audio.c:1238-1248)."""
    return bytes([0x81, 0x80, 0x00, codec_id, 0x00, 0x00, len(pad_2)]) + pad_2


def _pcm_params_block(spec: PcmTrackSpec) -> bytes:
    """The 9-byte PCM stream-parameter block (pcm.c:79-96)."""
    w = BitWriter()
    w.write(16, 1)  # first_audio_frame
    w.write(8, 0)
    w.write(4, BPS_CODE[spec.bits_per_sample])
    w.write(4, 0xF)  # group 1 bps (unused channel group)
    w.write(4, RATE_CODE[spec.sample_rate])
    w.write(4, 0xF)  # group 1 rate
    w.write(8, 0)
    w.write(8, spec.channel_assignment)
    w.write(8, 0)
    w.write(8, 0)  # crc (not validated by the decoder)
    return w.getvalue()


def _sector(payload_packets: list[bytes]) -> bytes:
    """Assemble one 2048-byte sector, padding with a 0xBE packet."""
    body = _pack_header() + b"".join(payload_packets)
    rem = SECTOR_SIZE - len(body)
    assert rem == 0 or rem >= 6, f"sector layout leaves unfillable gap of {rem}"
    if rem:
        body += _packet(0xBE, b"\xff" * (rem - 6))
    assert len(body) == SECTOR_SIZE
    return body


def _pcm_track_sectors(spec: PcmTrackSpec) -> list[bytes]:
    """Sectorise one PCM track.  Every packet restates the stream
    parameters (decode_pcm_audio re-validates them, dvd-audio.c:1049-1056)
    and carries a whole number of chunks (pcm.c:147)."""
    rng = np.random.default_rng(spec.seed)
    csize = chunk_size(spec.bits_per_sample, spec.channels)
    assert spec.pcm_frames % 2 == 0
    n_chunks = spec.pcm_frames // 2
    data = rng.integers(0, 256, size=n_chunks * csize, dtype=np.uint8).tobytes()

    params = _pcm_params_block(spec)
    # capacity for chunk data per sector:
    #   2048 - 14 (pack) - 6 (pkt hdr) - 7 (payload hdr) - 9 (params)
    cap = SECTOR_SIZE - 14 - 6 - 7 - len(params)
    chunks_per_sector = cap // csize
    # the 0xBE filler packet needs 0 or >=6 spare bytes in the sector
    while chunks_per_sector > 1 and 0 < cap - chunks_per_sector * csize < 6:
        chunks_per_sector -= 1
    sectors = []
    for off in range(0, len(data), chunks_per_sector * csize):
        part = data[off : off + chunks_per_sector * csize]
        payload = _audio_payload_header(PCM_CODEC_ID, params) + part
        sectors.append(_sector([_packet(0xBD, payload)]))
    return sectors


def _mlp_track_sectors(spec: MlpTrackSpec) -> list[bytes]:
    """Sectorise one MLP track; frames may span packets (mlp.c:344-354)."""
    data = spec.mlp_stream
    cap = SECTOR_SIZE - 14 - 6 - 7  # pad_2_size = 0
    sectors = []
    for off in range(0, len(data), cap):
        part = data[off : off + cap]
        payload = _audio_payload_header(MLP_CODEC_ID, b"") + part
        sectors.append(_sector([_packet(0xBD, payload)]))
    return sectors


def _audio_ts_ifo(titleset_count: int) -> bytes:
    out = bytearray(SECTOR_SIZE)
    out[0:12] = b"DVDAUDIO-AMG"
    out[63] = titleset_count
    return bytes(out)


def _ats_ifo(titles: list[list]) -> bytes:
    """Build ATS_XX_0.IFO for a list of titles, each a list of specs with
    resolved ``first_sector``/``last_sector``/``pts_index`` attributes."""
    n_titles = len(titles)
    out = bytearray(SECTOR_SIZE)  # sector 0: magic only
    out[0:12] = b"DVDAUDIO-ATS"
    body = bytearray()
    body += n_titles.to_bytes(2, "big") + b"\x00" * 6
    # title pointer table: 8 bytes per title
    table_offsets = []
    pos = 8 + 8 * n_titles
    for i, tracks in enumerate(titles):
        table_offsets.append(pos)
        pos += 16 + 20 * len(tracks) + 12 * len(tracks)
    for i, tracks in enumerate(titles):
        body += bytes([i + 1]) + b"\x00" * 3 + table_offsets[i].to_bytes(4, "big")
    for i, tracks in enumerate(titles):
        assert len(body) == table_offsets[i]
        pts_total = sum(t.spec.pts_length for t in tracks)
        spo = 16 + 20 * len(tracks)  # sector pointers right after track table
        body += b"\x00\x00"
        body += bytes([len(tracks), len(tracks)])
        body += pts_total.to_bytes(4, "big")
        body += b"\x00" * 4
        body += spo.to_bytes(2, "big")
        body += b"\x00\x00"
        for j, t in enumerate(tracks):
            body += b"\x00" * 4
            body += bytes([j + 1])  # index_number
            body += b"\x00"
            body += t.pts_index.to_bytes(4, "big")
            body += t.spec.pts_length.to_bytes(4, "big")
            body += b"\x00" * 6
        for t in tracks:
            body += b"\x01\x00\x00\x00"
            body += t.first_sector.to_bytes(4, "big")
            body += t.last_sector.to_bytes(4, "big")
    return bytes(out) + bytes(body)


@dataclass
class _PlacedTrack:
    spec: object
    first_sector: int = 0
    last_sector: int = 0
    pts_index: int = 0


@dataclass
class DiscLayout:
    path: str
    titles: list[list[_PlacedTrack]] = field(default_factory=list)


def build_disc(
    audio_ts_dir: str,
    titles: list[list[PcmTrackSpec | MlpTrackSpec]],
    aob_split_sectors: int | None = None,
    lowercase: bool = False,
) -> DiscLayout:
    """Write a complete synthetic AUDIO_TS directory.

    ``titles`` is a list of titles, each a list of track specs.
    ``aob_split_sectors`` splits the sector stream into multiple
    ``ATS_01_N.AOB`` files of that many sectors (tests aob.c chaining);
    ``lowercase`` writes lower-case filenames (tests audio_ts.c matching).
    """
    layouts = build_disc_multi(audio_ts_dir, [titles], aob_split_sectors,
                               lowercase)
    return layouts[0]


def build_disc_multi(
    audio_ts_dir: str,
    titlesets: list[list[list[PcmTrackSpec | MlpTrackSpec]]],
    aob_split_sectors: int | None = None,
    lowercase: bool = False,
) -> list[DiscLayout]:
    """Write a synthetic AUDIO_TS with several titlesets (``ATS_XX`` sets
    and an AUDIO_TS.IFO carrying the count; dvd-audio.c:824-858).  The
    reference CLI tools hardcode titleset 1 but the library API
    (``dvda_open_titleset``) addresses any — this exercises N > 1.
    Returns one :class:`DiscLayout` per titleset (all share ``path``)."""
    import os

    os.makedirs(audio_ts_dir, exist_ok=True)

    def name(n: str) -> str:
        return os.path.join(audio_ts_dir, n.lower() if lowercase else n)

    with open(name("AUDIO_TS.IFO"), "wb") as f:
        f.write(_audio_ts_ifo(len(titlesets)))

    layouts = []
    for ts_num, titles in enumerate(titlesets, start=1):
        layout = DiscLayout(path=audio_ts_dir)
        all_sectors: list[bytes] = []
        pts_cursor = 0
        for title_specs in titles:
            placed = []
            for spec in title_specs:
                if isinstance(spec, PcmTrackSpec):
                    sectors = _pcm_track_sectors(spec)
                else:
                    sectors = _mlp_track_sectors(spec)
                first = len(all_sectors)
                all_sectors.extend(sectors)
                placed.append(
                    _PlacedTrack(
                        spec=spec,
                        first_sector=first,
                        last_sector=len(all_sectors) - 1,
                        pts_index=pts_cursor,
                    )
                )
                pts_cursor += spec.pts_length
            layout.titles.append(placed)

        with open(name(f"ATS_{ts_num:02d}_0.IFO"), "wb") as f:
            f.write(_ats_ifo(layout.titles))

        blob = b"".join(all_sectors)
        if aob_split_sectors is None:
            with open(name(f"ATS_{ts_num:02d}_1.AOB"), "wb") as f:
                f.write(blob)
        else:
            step = aob_split_sectors * SECTOR_SIZE
            parts = [blob[i : i + step] for i in range(0, len(blob), step)]
            assert len(parts) <= 9
            for i, part in enumerate(parts):
                with open(name(f"ATS_{ts_num:02d}_{i + 1}.AOB"), "wb") as f:
                    f.write(part)
        layouts.append(layout)
    return layouts
