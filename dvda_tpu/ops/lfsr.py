"""MLP rematrix noise LFSR — vectorised generation via GF(2) jump matrices.

Reference analog: the per-sample scalar update in rematrix_channels
(mlp.c:1327-1335):

    shifted = (seed >> 7) & 0xFFFF
    noise0  = int8(seed >> 15) << noise_shift
    noise1  = int8(shifted)    << noise_shift
    seed    = ((seed << 16) & 0xFFFFFFFF) ^ shifted ^ (shifted << 5)

The update is linear over GF(2) on the 32-bit seed, so the k-step jump is a
32×32 bit-matrix power.  ``lfsr_sequence`` materialises all per-sample
seeds for a segment in O(log n) vectorised numpy passes (doubling: having
seeds[0:m], seeds[m:2m] = M^m applied elementwise), which both the host
planner and tests use; the same doubling runs on-device in jnp if noise
transfer ever becomes a bottleneck.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["lfsr_step", "lfsr_sequence", "noise_pair"]

_MASK32 = np.uint32(0xFFFFFFFF)


def lfsr_step(seed: np.ndarray) -> np.ndarray:
    """One LFSR step, vectorised over a uint32 array."""
    seed = np.asarray(seed, dtype=np.uint32)
    shifted = (seed >> np.uint32(7)) & np.uint32(0xFFFF)
    return ((seed << np.uint32(16)) ^ shifted ^ (shifted << np.uint32(5))) & _MASK32


@lru_cache(maxsize=None)
def _jump_columns(k: int) -> tuple:
    """Columns of M^(2^k) as a tuple of 32 uint32s (col[j] = M^(2^k)·e_j)."""
    if k == 0:
        basis = np.array([1 << j for j in range(32)], dtype=np.uint32)
        return tuple(int(x) for x in lfsr_step(basis))
    prev = np.array(_jump_columns(k - 1), dtype=np.uint32)
    # compose: col2[j] = M_prev · prev[j]
    out = np.zeros(32, dtype=np.uint32)
    for j in range(32):
        v = np.uint32(0)
        x = prev[j]
        for b in range(32):
            if (int(x) >> b) & 1:
                v ^= prev[b]
        out[j] = v
    return tuple(int(x) for x in out)


def _apply_jump(k: int, seeds: np.ndarray) -> np.ndarray:
    """Apply M^(2^k) to an array of seeds (vectorised GF(2) matvec)."""
    cols = _jump_columns(k)
    out = np.zeros_like(seeds, dtype=np.uint32)
    for j in range(32):
        out ^= np.where((seeds >> np.uint32(j)) & np.uint32(1),
                        np.uint32(cols[j]), np.uint32(0))
    return out


def lfsr_sequence(seed0: int, n: int) -> np.ndarray:
    """Seeds before each of the ``n`` steps: [seed0, f(seed0), f²(seed0), …]."""
    if n <= 0:
        return np.zeros(0, dtype=np.uint32)
    seeds = np.empty(n, dtype=np.uint32)
    seeds[0] = np.uint32(seed0)
    m = 1
    k = 0
    while m < n:
        take = min(m, n - m)
        seeds[m : m + take] = _apply_jump(k, seeds[:take])
        m += take
        k += 1
    return seeds


def noise_pair(seed0: int, n: int, noise_shift: int) -> tuple[np.ndarray, np.ndarray, int]:
    """The two int32 noise channels for ``n`` samples plus the final seed."""
    seeds = lfsr_sequence(seed0, n)
    b0 = ((seeds >> np.uint32(15)) & np.uint32(0xFF)).astype(np.int64)
    b1 = ((seeds >> np.uint32(7)) & np.uint32(0xFF)).astype(np.int64)
    n0 = (np.where(b0 & 0x80, b0 - 0x100, b0) << noise_shift).astype(np.int32)
    n1 = (np.where(b1 & 0x80, b1 - 0x100, b1) << noise_shift).astype(np.int32)
    if n == 0:
        final = np.uint32(seed0)
    else:
        final = lfsr_step(seeds[-1:])[0]
    return n0, n1, int(final)
