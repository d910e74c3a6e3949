"""External byte-source backends for sector input.

Reference analog: src/func_io.{h,c} — a buffered adapter that turns user
read/seek callbacks into byte sources for the bitstream layer (it also
powered the reference's upstream Python bindings, bitstream.h:34).

The rebuild's equivalent seam is at the *sector* level: anything that can
serve 2048-byte sectors can feed the whole pipeline.  This module provides
:class:`SectorSource` (the protocol), :class:`FileSectorSource` (plain
files), :class:`CallableSectorSource` (user callbacks — e.g. network disc
images, archives) and :func:`aob_reader_from_sources`, which builds an
AOBReader-compatible object over arbitrary sources.
"""

from __future__ import annotations

from typing import Callable, Protocol

import numpy as np

from .aob import SECTOR_SIZE

__all__ = [
    "SectorSource",
    "FileSectorSource",
    "CallableSectorSource",
    "SourceAOBReader",
]


class SectorSource(Protocol):
    """Anything that can serve a contiguous range of 2048-byte sectors."""

    @property
    def total_sectors(self) -> int: ...

    def read_sectors(self, first: int, count: int) -> np.ndarray: ...


class FileSectorSource:
    """Sectors from a regular file (memory-mapped)."""

    def __init__(self, path: str):
        size = __import__("os").path.getsize(path)
        self._total = size // SECTOR_SIZE
        self._map = np.memmap(path, dtype=np.uint8, mode="r",
                              shape=(self._total, SECTOR_SIZE))

    @property
    def total_sectors(self) -> int:
        return self._total

    def read_sectors(self, first: int, count: int) -> np.ndarray:
        return np.asarray(self._map[first : first + count])


class CallableSectorSource:
    """Sectors from a user callback ``read(first, count) -> bytes``.

    The callback returns ``count * 2048`` bytes (short at the end).  This
    is the func_io analog: any transport (HTTP ranges, archives, custom
    drivers) plugs in here.
    """

    def __init__(self, total_sectors: int,
                 read: Callable[[int, int], bytes]):
        self._total = total_sectors
        self._read = read

    @property
    def total_sectors(self) -> int:
        return self._total

    def read_sectors(self, first: int, count: int) -> np.ndarray:
        data = self._read(first, count)
        n = len(data) // SECTOR_SIZE
        return np.frombuffer(data, dtype=np.uint8,
                             count=n * SECTOR_SIZE).reshape(n, SECTOR_SIZE)


class SourceAOBReader:
    """AOBReader-compatible view over a chain of :class:`SectorSource`s
    (same interface as container.aob.AOBReader; usable anywhere a track
    decoder expects one)."""

    def __init__(self, sources: list, decrypt=None):
        self._sources = list(sources)
        self._counts = [s.total_sectors for s in self._sources]
        self._offsets = np.cumsum([0] + self._counts)
        self._pos = 0
        self._decrypt = decrypt

    @property
    def total_sectors(self) -> int:
        return int(self._offsets[-1])

    def read_sectors(self, first: int, count: int) -> np.ndarray:
        first = max(0, first)
        count = max(0, min(count, self.total_sectors - first))
        parts = []
        pos, need = first, count
        for i, s in enumerate(self._sources):
            lo, hi = int(self._offsets[i]), int(self._offsets[i + 1])
            if pos >= hi or need == 0:
                continue
            take = min(hi - pos, need)
            parts.append(s.read_sectors(pos - lo, take))
            pos += take
            need -= take
        if not parts:
            return np.empty((0, SECTOR_SIZE), dtype=np.uint8)
        out = parts[0].copy() if len(parts) == 1 else np.concatenate(parts)
        if self._decrypt is not None:
            out = self._decrypt(out)
        return out

    # scalar pull interface
    def seek(self, sector: int) -> bool:
        if sector >= self.total_sectors:
            return False
        self._pos = sector
        return True

    def tell(self) -> int:
        return self._pos

    def read(self):
        if self._pos >= self.total_sectors:
            return None
        out = self.read_sectors(self._pos, 1)
        self._pos += 1
        return out[0]

    def close(self) -> None:
        self._sources.clear()
