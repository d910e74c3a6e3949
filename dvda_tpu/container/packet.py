"""MPEG-2 program-stream demux for AOB sectors.

Reference analog: src/packet.c.  Sector layout (packet.c:60-188):

* each 2048-byte sector starts with a pack header — sync ``0x000001BA``,
  MPEG-2 marker bits, SCR (33-bit PTS split 3/15/15), SCR extension,
  bitrate, then ``stuffing_count`` stuffing bytes (read_pack_header,
  packet.c:137-188);
* the remainder of the sector is a series of packets, each
  ``{24u start_code==0x000001, 8u stream_id, 16u length}`` + payload
  (packet.c:97-107); audio is stream id 0xBD (packet.c:22).

Packets never span sectors (the reference would abort the substream read and
treat it as end-of-stream, packet.c:91-115), so demuxing is per-sector and
embarrassingly parallel.  The bulk :func:`demux_audio_packets` is the batch
planner's path; :class:`PacketReader` preserves the reference's pull
semantics for the streaming façade.

A malformed pack sync or packet start code terminates the stream — matching
the reference returning NULL from packet_reader_next_packet (packet.c:84,
101-104) — it is not skipped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..bitstream import BitReader, BitstreamError
from .aob import AOBReader

__all__ = [
    "AUDIO_STREAM_ID",
    "PACK_SYNC",
    "Packet",
    "PackHeader",
    "read_pack_header",
    "read_audio_packet_header",
    "demux_sector",
    "demux_audio_packets",
    "PacketReader",
]

AUDIO_STREAM_ID = 0xBD
PACK_SYNC = 0x000001BA


@dataclass
class PackHeader:
    pts: int
    scr_extension: int
    bitrate: int


@dataclass
class Packet:
    sector: int  # flat sector index this packet came from
    stream_id: int
    payload: bytes


def read_pack_header(r: BitReader) -> PackHeader | None:
    """Parse the 14+-byte pack header; ``None`` on any mismatch
    (read_pack_header, packet.c:137-188)."""
    try:
        (
            sync,
            m0,
            pts_high,
            m1,
            pts_mid,
            m2,
            pts_low,
            m3,
            scr_ext,
            m4,
            bitrate,
            m5,
            stuffing_count,
        ) = r.parse("32u 2u 3u 1u 15u 1u 15u 1u 9u 1u 22u 2u 5p 3u")
        r.skip_bytes(stuffing_count)
    except BitstreamError:
        return None
    if sync != PACK_SYNC:
        return None
    if not (m0 == 1 and m1 == 1 and m2 == 1 and m3 == 1 and m4 == 1 and m5 == 3):
        return None
    return PackHeader((pts_high << 30) | (pts_mid << 15) | pts_low, scr_ext, bitrate)


def read_audio_packet_header(r: BitReader) -> tuple[int, int]:
    """Read the audio packet's sub-header, returning (codec_id, pad_2_size).

    Layout per read_audio_packet_header (dvd-audio.c:1238-1248): 2 bytes of
    PES flags, 1-byte pad-1 size, pad-1 bytes, then codec id, 2 pad bytes
    and the pad-2 size.  The caller is left positioned at the start of the
    pad-2 region (which for PCM begins with the 9-byte stream parameters).
    """
    (pad_1_size,) = r.parse("16p 8u")
    r.skip_bytes(pad_1_size)
    codec_id, pad_2_size = r.parse("8u 8p 8p 8u")
    return codec_id, pad_2_size


def demux_sector(sector_index: int, sector: bytes | np.ndarray) -> Iterator[Packet]:
    """Yield the packets of one sector; stops at the first malformed header."""
    r = BitReader(sector)
    if read_pack_header(r) is None:
        return
    while r.size() >= 6:
        try:
            start_code, stream_id, length = r.parse("24u 8u 16u")
        except BitstreamError:
            return
        if start_code != 0x000001:
            return
        try:
            payload = r.substream(length)
        except BitstreamError:
            return
        yield Packet(sector_index, stream_id, payload.data)


def demux_audio_packets(
    sectors: np.ndarray, first_sector_index: int = 0
) -> Iterator[Packet | None]:
    """Bulk demux: yield audio (0xBD) packets from a batch of sectors.

    A malformed sector terminates the stream permanently, like the pull
    reader (see module docstring); this is signalled by yielding a final
    ``None`` so callers can distinguish "stream corrupt — stop" from
    "batch exhausted — fetch more sectors".
    """
    for i in range(len(sectors)):
        sector = sectors[i]
        r = BitReader(sector)
        if read_pack_header(r) is None:
            yield None
            return
        while r.size() >= 6:
            try:
                start_code, stream_id, length = r.parse("24u 8u 16u")
            except BitstreamError:
                yield None
                return
            if start_code != 0x000001:
                yield None
                return
            try:
                payload = r.substream(length)
            except BitstreamError:
                yield None
                return
            if stream_id == AUDIO_STREAM_ID:
                yield Packet(first_sector_index + i, stream_id, payload.data)
        if r.size() != 0:
            # 1-5 trailing bytes cannot hold a packet header; the reference's
            # queue-based reader aborts here (packet.c:91-115) — hard stop.
            yield None
            return


class PacketReader:
    """Pull-based packet reader over an :class:`AOBReader`.

    Matches packet_reader_next_packet / next_audio_packet (packet.c:60-135):
    one sector is demuxed at a time; the reported sector number is the one
    the packet came from (aob tell − 1, packet.c:88).
    """

    def __init__(self, aob_reader: AOBReader):
        self.aob = aob_reader
        self._pending: list[Packet] = []

    def next_packet(self) -> Packet | None:
        while not self._pending:
            sector_index = self.aob.tell()
            sector = self.aob.read()
            if sector is None:
                return None
            self._pending = list(demux_sector(sector_index, sector))
            if not self._pending:
                return None  # malformed sector ends the stream
        return self._pending.pop(0)

    def next_audio_packet(self) -> Packet | None:
        while True:
            pkt = self.next_packet()
            if pkt is None:
                return None
            if pkt.stream_id == AUDIO_STREAM_ID:
                return pkt

    def close(self) -> None:
        self.aob.close()
