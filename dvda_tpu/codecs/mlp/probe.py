"""MLP stream probing: locate the first major sync and stream parameters.

Reference analogs: find_major_sync (dvd-audio.c:1250-1286),
enqueue_mlp_packet (:1288-1316), locate_mlp_parameters (:1318-1365).

MLP tracks need not start on frame — or even packet — boundaries
(/root/reference TODO:63-79), so the reader scans byte-by-byte for the
major sync pattern (bytes 4..7 of a frame = F8 72 6F BB), discarding the
partial leading frame, then reads the packed stream parameters from the
major sync body.
"""

from __future__ import annotations

from ...bitstream import BitReader, BitstreamError
from ...container.aob import AOBReader
from ...container.packet import demux_audio_packets, read_audio_packet_header
from ..params import MLP_CODEC_ID, StreamParameters

__all__ = [
    "MAJOR_SYNC_PATTERN",
    "find_major_sync",
    "parse_major_sync_parameters",
    "iter_mlp_payloads",
    "probe_parameters",
]

# An MLP frame's major sync: 4-byte frame-size header then F8 72 6F BB
# (sync words + stream type, mlp.c:636-638).
MAJOR_SYNC_PATTERN = bytes([0xF8, 0x72, 0x6F, 0xBB])


def find_major_sync(buf: bytes, start: int = 0) -> int:
    """Return the offset of the first frame whose major sync matches, or -1.

    The reference advances one byte at a time checking bytes [4..8) of each
    candidate frame start (find_major_sync, dvd-audio.c:1253-1282); that is
    equivalent to searching for the 4-byte pattern at offset ≥ start+4 —
    the pattern being fully inside the buffer guarantees the candidate has
    the ≥8 readable bytes the reference requires.
    """
    idx = buf.find(MAJOR_SYNC_PATTERN, start + 4)
    return idx - 4 if idx >= 0 else -1


def parse_major_sync_parameters(frame: bytes, offset: int = 0) -> StreamParameters:
    """Extract packed stream parameters from a frame at ``offset``
    (locate_mlp_parameters' field layout, dvd-audio.c:1351-1359)."""
    r = BitReader(frame[offset : offset + 18])
    g0b, g1b, g0r, g1r, chan = r.parse("4p 12p 16p 24p 8p 4u 4u 4u 4u 11p 5u")
    return StreamParameters(g0b, g1b, g0r, g1r, chan)


def iter_mlp_payloads(aob: AOBReader, first_sector: int, batch: int = 4096):
    """Yield ``(sector, mlp_bytes)`` for each audio packet from
    ``first_sector`` on, with the packet sub-header and pad-2 region
    stripped.  Non-MLP packets are skipped during iteration (matching
    enqueue_mlp_packet, dvd-audio.c:1303-1306); a malformed packet or
    non-MLP codec id yields a final ``None`` terminator."""
    sector = first_sector
    while True:
        sectors = aob.read_sectors(sector, batch)
        if sectors.shape[0] == 0:
            return
        for pkt in demux_audio_packets(sectors, sector):
            if pkt is None:
                yield None
                return
            r = BitReader(pkt.payload)
            try:
                codec_id, pad_2_size = read_audio_packet_header(r)
                if codec_id != MLP_CODEC_ID:
                    yield (pkt.sector, None)  # codec mismatch marker
                    continue
                r.skip_bytes(pad_2_size)
                payload = r.read_bytes(r.size())
            except BitstreamError:
                yield None
                return
            yield (pkt.sector, payload)
        if sectors.shape[0] < batch:
            return
        sector += sectors.shape[0]


def probe_parameters(aob: AOBReader, span) -> StreamParameters:
    """Find the first major sync at/after the track start and return the
    stream parameters (locate_mlp_parameters, dvd-audio.c:1318-1365)."""
    buf = bytearray()
    for item in iter_mlp_payloads(aob, span.first_sector):
        if item is None:
            break
        _sector, payload = item
        if payload is None:
            continue  # non-MLP packet skipped during probing
        buf += payload
        off = find_major_sync(bytes(buf))
        if off >= 0 and len(buf) - off >= 18:
            return parse_major_sync_parameters(bytes(buf), off)
    raise ValueError("no MLP major sync found in track")
