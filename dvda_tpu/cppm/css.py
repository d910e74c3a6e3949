"""CSS-style drive authentication for CPPM disc-key access.

Reference analogs: src/cppm/dvd_css.c (GetBusKey :41-137, CryptKey
:139-334, GetASF :344-355) and the multi-OS ioctl layer src/cppm/ioctl.c.

DVD-Audio discs expose the *album ID* only through an authenticated drive
read: host and drive run a challenge/response handshake built on the CSS
40-bit stream cipher (two LFSRs + table-driven mangling, the published
DeCSS algorithm; constants in css_tables.py), agree on a *bus key*, and
the drive then returns the disc-key block XOR-obscured with that bus key.

Design differences from the reference:

* The six unrolled mangle blocks of the reference's CryptKey are one
  parameterised round function here (they differ only in keystream window
  and whether a tab0 substitution follows).
* Drive I/O is a pluggable :class:`DriveBackend` instead of the
  reference's ~2000-line per-OS ``#ifdef`` ioctl file: a Linux backend
  (``fcntl.ioctl`` on the DVD_AUTH interface) and a :class:`MockDrive`
  that implements the logical-unit side of the handshake with the same
  cipher, which is how the protocol is tested without hardware (no drive
  exists in CI; SURVEY §4).
"""

from __future__ import annotations

import fcntl
import os
import struct

from .css_tables import CRYPT_TAB0, CRYPT_TAB1, CRYPT_TAB2, CRYPT_TAB3

__all__ = [
    "crypt_key",
    "DriveBackend",
    "LinuxDrive",
    "MockDrive",
    "authenticate_bus_key",
    "read_disc_key",
    "read_album_id",
    "DVD_DISCKEY_SIZE",
]

KEY_SIZE = 5
DVD_DISCKEY_SIZE = 2048

_PERM_CHALLENGE = (
    (1, 3, 0, 7, 5, 2, 9, 6, 4, 8),
    (6, 1, 9, 3, 8, 5, 7, 4, 0, 2),
    (4, 0, 3, 5, 7, 2, 8, 6, 1, 9),
)
_PERM_VARIANT = (
    (0x0A, 0x08, 0x0E, 0x0C, 0x0B, 0x09, 0x0F, 0x0D,
     0x1A, 0x18, 0x1E, 0x1C, 0x1B, 0x19, 0x1F, 0x1D,
     0x02, 0x00, 0x06, 0x04, 0x03, 0x01, 0x07, 0x05,
     0x12, 0x10, 0x16, 0x14, 0x13, 0x11, 0x17, 0x15),
    (0x12, 0x1A, 0x16, 0x1E, 0x02, 0x0A, 0x06, 0x0E,
     0x10, 0x18, 0x14, 0x1C, 0x00, 0x08, 0x04, 0x0C,
     0x13, 0x1B, 0x17, 0x1F, 0x03, 0x0B, 0x07, 0x0F,
     0x11, 0x19, 0x15, 0x1D, 0x01, 0x09, 0x05, 0x0D),
)
_VARIANTS = (0xB7, 0x74, 0x85, 0xD0, 0xCC, 0xDB, 0xCA, 0x73,
             0x03, 0xFE, 0x31, 0x03, 0x52, 0xE0, 0xB7, 0x42,
             0x63, 0x16, 0xF2, 0x2A, 0x79, 0x52, 0xFF, 0x1B,
             0x7A, 0x11, 0xCA, 0x1A, 0x9B, 0x40, 0xAD, 0x01)
_SECRET = (0x55, 0xD6, 0xC4, 0xC5, 0x28)


def _keystream(seed: bytes) -> bytes:
    """30 bytes of CSS keystream from a 5-byte seed: a degree-25 and a
    degree-17 LFSR, outputs inverted and added with carry."""
    lfsr0 = (seed[0] << 17) | (seed[1] << 9) | ((seed[2] & ~7) << 1) | 8 | (seed[2] & 7)
    lfsr1 = (seed[3] << 9) | 0x100 | seed[4]
    out = bytearray(30)
    carry = 0
    for index in range(29, -1, -1):
        val = 0
        for bit in range(8):
            o0 = ((lfsr0 >> 24) ^ (lfsr0 >> 21) ^ (lfsr0 >> 20) ^ (lfsr0 >> 12)) & 1
            lfsr0 = ((lfsr0 << 1) | o0) & 0x1FFFFFF
            o1 = ((lfsr1 >> 16) ^ (lfsr1 >> 2)) & 1
            lfsr1 = ((lfsr1 << 1) | o1) & 0x1FFFF
            combined = (1 - o1) + carry + (1 - o0)
            carry = (combined >> 1) & 1
            val |= (combined & 1) << bit
        out[index] = val
    return bytes(out)


def crypt_key(key_type: int, variant: int, challenge: bytes) -> bytes:
    """The CSS key-mangling function (CryptKey, dvd_css.c:139-334).

    key_type: 0 = key1, 1 = key2, 2 = bus key; variant in [0, 32).
    ``challenge`` is 10 bytes; returns a 5-byte key.
    """
    scratch = bytes(challenge[_PERM_CHALLENGE[key_type][i]] for i in range(10))
    css_variant = variant if key_type == 0 else _PERM_VARIANT[key_type - 1][variant]

    seed = bytes(scratch[5 + i] ^ _SECRET[i] ^ CRYPT_TAB2[i] for i in range(5))
    bits = _keystream(seed)
    cse = _VARIANTS[css_variant] ^ CRYPT_TAB2[css_variant]

    def mangle(data: bytes, window: int, through_tab0: bool) -> bytes:
        out = [0] * 5
        term = 0
        for i in range(4, -1, -1):
            index = bits[window + i] ^ data[i]
            index = CRYPT_TAB1[index] ^ (~CRYPT_TAB2[index] & 0xFF) ^ cse
            if through_tab0:
                index = CRYPT_TAB2[index] ^ CRYPT_TAB3[index] ^ term
                out[i] = CRYPT_TAB0[index] ^ CRYPT_TAB2[index]
            else:
                out[i] = CRYPT_TAB2[index] ^ CRYPT_TAB3[index] ^ term
            term = data[i]
        out[4] ^= out[0]
        return bytes(out)

    # six rounds over sliding keystream windows; rounds 3 and 4 add the
    # tab0 substitution (dvd_css.c:273-334)
    data = scratch[:5]
    for rnd, (window, tab0) in enumerate(
            [(25, False), (20, False), (15, True), (10, True), (5, False)]):
        data = mangle(data, window, tab0)
    # final round emits the key without the out[4] ^= out[0] feedback
    out = [0] * 5
    term = 0
    for i in range(4, -1, -1):
        index = bits[i] ^ data[i]
        index = CRYPT_TAB1[index] ^ (~CRYPT_TAB2[index] & 0xFF) ^ cse
        out[i] = CRYPT_TAB2[index] ^ CRYPT_TAB3[index] ^ term
        term = data[i]
    return bytes(out)


# ---------------------------------------------------------------- backends

class DriveBackend:
    """The logical-unit side of the authentication handshake."""

    def report_agid(self) -> int:
        raise NotImplementedError

    def invalidate_agid(self, agid: int) -> None:
        pass

    def send_challenge(self, agid: int, challenge: bytes) -> None:
        raise NotImplementedError

    def report_key1(self, agid: int) -> bytes:
        raise NotImplementedError

    def report_challenge(self, agid: int) -> bytes:
        raise NotImplementedError

    def send_key2(self, agid: int, key2: bytes) -> None:
        raise NotImplementedError

    def report_asf(self) -> int:
        raise NotImplementedError

    def read_disc_key(self, agid: int) -> bytes:
        raise NotImplementedError

    def read_copyright(self) -> int:
        raise NotImplementedError


class MockDrive(DriveBackend):
    """A software logical unit implementing the drive's half of the
    handshake with the same cipher — the hardware-free test double."""

    def __init__(self, variant: int = 7, disc_key_block: bytes | None = None,
                 copyright_protection: int = 1):
        assert 0 <= variant < 32
        self.variant = variant
        self.disc_key_block = disc_key_block or bytes(DVD_DISCKEY_SIZE)
        self.copyright_protection = copyright_protection
        self._host_challenge: bytes | None = None
        self._drive_challenge = bytes(range(17, 27))
        self._key1: bytes | None = None
        self._authed = False

    def report_agid(self) -> int:
        return 0

    def send_challenge(self, agid: int, challenge: bytes) -> None:
        # bus order is reversed on the wire (dvd_css.c:75-77)
        self._host_challenge = bytes(challenge[9 - i] for i in range(10))

    def report_key1(self, agid: int) -> bytes:
        self._key1 = crypt_key(0, self.variant, self._host_challenge)
        return bytes(self._key1[4 - i] for i in range(5))

    def report_challenge(self, agid: int) -> bytes:
        return bytes(self._drive_challenge[9 - i] for i in range(10))

    def send_key2(self, agid: int, key2_wire: bytes) -> None:
        key2 = bytes(key2_wire[4 - i] for i in range(5))
        expect = crypt_key(1, self.variant, self._drive_challenge)
        if key2 != expect:
            raise IOError("authentication failed: bad key2")
        self._key2 = key2
        self._authed = True

    def report_asf(self) -> int:
        return 1 if self._authed else 0

    def read_disc_key(self, agid: int) -> bytes:
        if not self._authed:
            raise IOError("not authenticated")
        bus_key = crypt_key(2, self.variant, self._key1 + self._key2)
        return bytes(
            b ^ bus_key[4 - (i % KEY_SIZE)]
            for i, b in enumerate(self.disc_key_block)
        )

    def read_copyright(self) -> int:
        return self.copyright_protection


class LinuxDrive(DriveBackend):
    """Linux DVD_AUTH ioctl backend (reference: ioctl.c Linux paths).

    Struct layouts follow <linux/cdrom.h>: dvd_authinfo is a union of
    fixed-size records selected by a leading type byte.
    """

    DVD_AUTH = 0x5392
    DVD_READ_STRUCT = 0x5390
    LU_SEND_AGID = 0
    HOST_SEND_CHALLENGE = 1
    LU_SEND_KEY1 = 2
    LU_SEND_CHALLENGE = 3
    HOST_SEND_KEY2 = 4
    LU_SEND_ASF = 8
    INVALIDATE_AGID = 9
    _AUTH_SIZE = 28

    def __init__(self, device: str):
        self.fd = os.open(device, os.O_RDONLY | getattr(os, "O_NONBLOCK", 0))

    def close(self) -> None:
        os.close(self.fd)

    def _auth(self, payload: bytes) -> bytes:
        buf = bytearray(payload.ljust(self._AUTH_SIZE, b"\x00"))
        fcntl.ioctl(self.fd, self.DVD_AUTH, buf)
        return bytes(buf)

    def report_agid(self) -> int:
        out = self._auth(struct.pack("=BB", self.LU_SEND_AGID, 0))
        return out[1] >> 6

    def invalidate_agid(self, agid: int) -> None:
        self._auth(struct.pack("=BB", self.INVALIDATE_AGID, agid << 6))

    def send_challenge(self, agid: int, challenge: bytes) -> None:
        self._auth(struct.pack("=BB10s", self.HOST_SEND_CHALLENGE,
                               agid << 6, challenge))

    def report_key1(self, agid: int) -> bytes:
        out = self._auth(struct.pack("=BB", self.LU_SEND_KEY1, agid << 6))
        return out[2:7]

    def report_challenge(self, agid: int) -> bytes:
        out = self._auth(struct.pack("=BB", self.LU_SEND_CHALLENGE, agid << 6))
        return out[2:12]

    def send_key2(self, agid: int, key2: bytes) -> None:
        self._auth(struct.pack("=BB5s", self.HOST_SEND_KEY2, agid << 6, key2))

    def report_asf(self) -> int:
        out = self._auth(struct.pack("=BB", self.LU_SEND_ASF, 0))
        return out[2] & 1

    def read_disc_key(self, agid: int) -> bytes:
        # dvd_struct type DVD_STRUCT_DISCKEY = 0x02 with 2048-byte payload
        buf = bytearray(struct.pack("=BxxxI", 0x02, agid << 6).ljust(
            8 + DVD_DISCKEY_SIZE, b"\x00"))
        fcntl.ioctl(self.fd, self.DVD_READ_STRUCT, buf)
        return bytes(buf[8 : 8 + DVD_DISCKEY_SIZE])

    def read_copyright(self) -> int:
        # dvd_struct type DVD_STRUCT_COPYRIGHT = 0x04
        buf = bytearray(struct.pack("=BxB", 0x04, 0).ljust(8, b"\x00"))
        fcntl.ioctl(self.fd, self.DVD_READ_STRUCT, buf)
        return buf[2]


# ---------------------------------------------------------------- protocol

def authenticate_bus_key(drive: DriveBackend) -> tuple[int, bytes]:
    """Run the handshake; returns (agid, 5-byte bus key)
    (GetBusKey, dvd_css.c:41-137)."""
    agid = drive.report_agid()

    challenge = bytes(range(10))
    drive.send_challenge(agid, bytes(challenge[9 - i] for i in range(10)))

    key1_wire = drive.report_key1(agid)
    key1 = bytes(key1_wire[4 - i] for i in range(5))
    for variant in range(32):
        if crypt_key(0, variant, challenge) == key1:
            break
    else:
        drive.invalidate_agid(agid)
        raise IOError("no matching CSS variant")

    drive_challenge_wire = drive.report_challenge(agid)
    drive_challenge = bytes(drive_challenge_wire[9 - i] for i in range(10))
    key2 = crypt_key(1, variant, drive_challenge)
    drive.send_key2(agid, bytes(key2[4 - i] for i in range(5)))

    bus_key = crypt_key(2, variant, key1 + key2)
    return agid, bus_key


def read_disc_key(drive: DriveBackend) -> bytes:
    """Authenticate and return the de-obscured 2048-byte disc-key block
    (cppm_set_id_album, cppm.c:254-277)."""
    agid, bus_key = authenticate_bus_key(drive)
    block = drive.read_disc_key(agid)
    if drive.report_asf() != 1:
        drive.invalidate_agid(agid)
        raise IOError("authentication success flag not set")
    return bytes(
        b ^ bus_key[4 - (i % KEY_SIZE)] for i, b in enumerate(block)
    )


def read_album_id(drive: DriveBackend) -> int:
    """The 64-bit album ID lives at bytes 80..88 of the disc-key block
    (cppm.c:273-275)."""
    block = read_disc_key(drive)
    return int.from_bytes(block[80:88], "big")
