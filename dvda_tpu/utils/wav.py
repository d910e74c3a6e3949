"""RIFF WAVE output, byte-identical to the reference ``dvda2wav`` tool.

Reference analog: write_wave_header (utils/dvda2wav.c:352-397) — a
WAVEFORMATEXTENSIBLE (0xFFFE) header with a 40-byte fmt chunk and a
back-patched data size — and the per-sample little-endian ``write_signed``
loop (dvda2wav.c:326-334).

The reference writes each sample as a ``bits_per_sample``-wide little-endian
signed field through its LE bit writer.  For 16/24-bit that is plain packed
little-endian bytes (vectorised here with numpy); for 20-bit it is genuine
LSB-first bit packing (2.5 bytes/sample), reproduced exactly by
:func:`pack_samples_le`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["wave_header", "pack_samples_le", "write_wav"]

_SUB_FORMAT = bytes([1, 0, 0, 0, 0, 0, 16, 0, 128, 0, 0, 170, 0, 56, 155, 113])


def wave_header(
    sample_rate: int,
    channel_count: int,
    channel_mask: int,
    bits_per_sample: int,
    total_pcm_frames: int,
) -> bytes:
    """Build the 60-byte header exactly as dvda2wav.c:352-397 does.

    Note the RIFF size field includes a ``data_size % 2`` pad byte that the
    tool never actually writes — reproduced faithfully.
    """
    bytes_per_sample = bits_per_sample // 8
    avg_bytes_per_second = sample_rate * channel_count * bytes_per_sample
    block_align = channel_count * bytes_per_sample
    data_size = bytes_per_sample * channel_count * total_pcm_frames
    fmt_size = 40
    # The reference's size field is 12 + 40 + 8 + data + pad — it omits the
    # 8-byte fmt chunk header and does not subtract the bytes before the
    # field (dvda2wav.c:376-383).  Reproduced verbatim for byte parity.
    riff_size_field = 12 + fmt_size + 8 + data_size + (data_size % 2)

    out = bytearray()
    out += b"RIFF"
    out += int(riff_size_field).to_bytes(4, "little")
    out += b"WAVE"
    out += b"fmt "
    out += int(fmt_size).to_bytes(4, "little")
    out += int(0xFFFE).to_bytes(2, "little")  # WAVEFORMATEXTENSIBLE
    out += int(channel_count).to_bytes(2, "little")
    out += int(sample_rate).to_bytes(4, "little")
    out += int(avg_bytes_per_second).to_bytes(4, "little")
    out += int(block_align).to_bytes(2, "little")
    out += int(bits_per_sample).to_bytes(2, "little")
    out += int(22).to_bytes(2, "little")  # cbSize
    out += int(bits_per_sample).to_bytes(2, "little")  # valid bits
    out += int(channel_mask).to_bytes(4, "little")
    out += _SUB_FORMAT
    out += b"data"
    out += int(data_size).to_bytes(4, "little")
    return bytes(out)


def pack_samples_le(samples: np.ndarray, bits_per_sample: int) -> bytes:
    """Pack interleaved int32 samples as ``bits_per_sample``-wide
    little-endian signed fields (dvda2wav.c:330-333)."""
    flat = np.ascontiguousarray(samples, dtype=np.int32).reshape(-1)
    if bits_per_sample == 16:
        return flat.astype("<i2").tobytes()
    if bits_per_sample == 24:
        b = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(b[:, :3]).tobytes()
    # generic LSB-first bit packing (20-bit path)
    out = bytearray()
    acc = 0
    nacc = 0
    mask = (1 << bits_per_sample) - 1
    for v in flat.tolist():
        acc |= (v & mask) << nacc
        nacc += bits_per_sample
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    # the reference's writer leaves a trailing partial byte unflushed
    return bytes(out)


def write_wav(
    path: str,
    samples: np.ndarray,
    sample_rate: int,
    channel_mask: int,
    bits_per_sample: int,
) -> None:
    """Write a complete WAV file; ``samples`` is ``[frames, channels]``."""
    frames, channels = samples.shape
    header = wave_header(sample_rate, channels, channel_mask, bits_per_sample, frames)
    with open(path, "wb") as f:
        f.write(header)
        f.write(pack_samples_le(samples, bits_per_sample))
