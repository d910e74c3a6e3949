"""CPPM Media Key Block processing.

Reference analogs: the embedded device-key table (cppm.c:149-186), MKB
file loading (``cppm_get_mkb``, cppm.c:279-305) and record-walk media-key
derivation (``cppm_process_mkb``, cppm.c:351-430).

The MKB lives in the disc's ``DVDAUDIO.MKB`` file: a 12-byte signature,
a 4-byte big-endian size, then typed records ``{type u8, length u24}``.
Types: 0x01 calculate-media-key, 0x81 verify (carries
``0xDEADBEEF``-prefixed verification data), 0x82 conditionally-calculate
(payload first decrypted with the current media key), 0x02 end of media
key record.  Device keys are tried per column until the derived media key
verifies.
"""

from __future__ import annotations

from dataclasses import dataclass

from .c2 import c2_dec

__all__ = ["DeviceKey", "DEVICE_KEYS", "load_mkb", "process_mkb"]


@dataclass(frozen=True)
class DeviceKey:
    col: int
    row: int
    key: int


# Published CPPM device keys (cppm.c:149-186).
DEVICE_KEYS: tuple[DeviceKey, ...] = tuple(
    DeviceKey(c, r, k)
    for c, r, k in [
        (0x00, 0x5F58, 0x53E173BEEC3B8C),
        (0x00, 0x4821, 0x6D05086B755C81),
        (0x01, 0x091C, 0x97ACE18DD26973),
        (0x02, 0x012A, 0xFEFC0A25A38D42),
        (0x03, 0x469B, 0x0780491970DB2C),
        (0x04, 0x0F9B, 0x0BEDD116D43484),
        (0x05, 0x59B2, 0x566936BCEBE294),
        (0x06, 0x5FC8, 0xDC610F649B1FC0),
        (0x07, 0x11DE, 0x6EE01D3872C2D9),
        (0x08, 0x52B6, 0xD0132C376E439B),
        (0x09, 0x135F, 0x800FAA66206922),
        (0x0A, 0x3806, 0x9D1AA1460885C2),
        (0x0B, 0x2DA2, 0x9833F21818BA33),
        (0x0C, 0x113F, 0xD50AA7D022045A),
        (0x0D, 0x11EC, 0x88ABEE7BB83A32),
        (0x0E, 0x071B, 0x9B45EEA4E7D140),
        (0x0F, 0x5C55, 0x5A49F860CCA5CF),
        (0x00, 0x0375, 0x1A12793404C279),
        (0x01, 0x4307, 0x61418B44CEA550),
        (0x02, 0x1F70, 0x52BDE5B73ADCDA),
        (0x03, 0x1BBC, 0x70A031AE493159),
        (0x04, 0x1F9D, 0x0A570636AEDB61),
        (0x05, 0x4E7B, 0xC313563E7883E9),
        (0x06, 0x07C4, 0x32C55F7BC42D45),
        (0x07, 0x4216, 0x4F854DF6C1D721),
        (0x08, 0x11C5, 0xC0E3F0F3DF33CC),
        (0x09, 0x0486, 0xBFCA7754DB5DE6),
        (0x0A, 0x2F82, 0xA964FC061AF87C),
        (0x0B, 0x236A, 0xB96D68856C45D5),
        (0x0C, 0x5BEB, 0xD2CA3CBB7D13CC),
        (0x0D, 0x3DB6, 0x58CF827FF3C540),
        (0x0E, 0x4B22, 0xBB4037442A869C),
        (0x0F, 0x59B5, 0x3A83E0DDF37A6E),
    ]
)

_VERIFY = 0xDEADBEEF00000000
_M56 = 0x00FFFFFFFFFFFFFF


def load_mkb(path: str) -> bytes | None:
    """Read DVDAUDIO.MKB (cppm_get_mkb, cppm.c:279-305)."""
    try:
        with open(path, "rb") as f:
            if f.read(12) != b"DVDAUDIO.MKB":
                return None
            size = int.from_bytes(f.read(4), "big")
            data = f.read(size)
            return data if len(data) == size else None
    except OSError:
        return None


def process_mkb(mkb: bytes,
                device_keys: tuple[DeviceKey, ...] = DEVICE_KEYS) -> int | None:
    """Derive the media key, or None (cppm_process_mkb, cppm.c:351-430).

    Device keys are iterated; for each, the record list is walked:
    verification data is remembered (0x81), candidate media keys are
    derived from the key row of 0x01/0x82 records (0x82's row is first
    decrypted with the current media key) and checked against the
    verification data.
    """
    i_dev = 0
    media_key = 0
    verification = 0
    no_more_keys = False
    while not no_more_keys:
        pos = 0
        advanced = False
        while pos + 4 <= len(mkb):
            rtype = mkb[pos]
            length = int.from_bytes(mkb[pos : pos + 4], "big") & 0x00FFFFFF
            if length < 4:
                length = 4
            buffer = None
            if length >= 12 and pos + 12 <= len(mkb):
                buffer = int.from_bytes(mkb[pos + 4 : pos + 12], "big")
            if rtype in (0x01, 0x82):
                ok = buffer is not None
                column = None
                if rtype == 0x82 and ok:
                    dec = c2_dec(buffer, media_key)
                    ok = (dec & 0xFFFFFFFF00000000) == _VERIFY
                    # the reference byteswaps the decrypted value back to
                    # storage order and reads payload byte 4 (cppm.c:384-391):
                    # byte 4 of bswap64(dec) = bits 24..31 of dec
                    column = (dec >> 24) & 0xFF
                elif rtype == 0x01:
                    # byte 4 of the raw big-endian payload (cppm.c:386)
                    column = mkb[pos + 8] if pos + 8 < len(mkb) else None
                if ok and column is not None:
                    # look up a device key for this column starting at the
                    # current key index; a miss marks no_more_keys but only
                    # skips THIS record — the walk continues, and a later
                    # record may still derive the key (cppm.c:392-403)
                    dk = None
                    no_more_keys = True
                    for j in range(i_dev, len(device_keys)):
                        if device_keys[j].col == column:
                            dk = device_keys[j]
                            i_dev = j
                            no_more_keys = False
                            break
                    row_off = pos + 12 + (dk.row * 8 if dk else 0)
                    if (dk is not None and row_off + 8 <= pos + length
                            and row_off + 8 <= len(mkb)):
                        kd = int.from_bytes(mkb[row_off : row_off + 8], "big")
                        if rtype == 0x82:
                            kd = c2_dec(kd, media_key)
                        media_key = (c2_dec(kd, dk.key) & _M56) ^ (
                            (column << 32) | dk.row)
                        check = c2_dec(verification, media_key)
                        if (check & 0xFFFFFFFF00000000) == _VERIFY:
                            return media_key
            elif rtype == 0x02:
                break
            elif rtype == 0x81 and buffer is not None:
                verification = buffer
            pos += length
            advanced = True
        if not advanced:
            return None
        i_dev += 1
        if i_dev > len(device_keys):
            # no 0x01/0x82 record performed a lookup this pass (the
            # reference would spin forever on such an MKB) — give up
            return None
    return None
