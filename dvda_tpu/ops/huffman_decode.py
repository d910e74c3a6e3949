"""On-device MLP Huffman residual decode — VERDICT r1 #3.

Reference analog: ``decode_residual_data`` (mlp.c:1122-1241), a per-sample
host loop over Huffman codes + LSB fields.  Device formulation: the host
parser's *skip-values* mode (host/src/mlp_parse.cc) walks residual bits
length-only and emits per-block decode tables; this kernel then re-decodes
the values from the **raw bitstream** in parallel across blocks — each
block's start bit offset is known, so blocks are independent lanes and
only the ≤ S0·(n_ch+bypass) symbols *within* a block decode sequentially
(a ``lax.scan``).  What ships to the device is the bitstream plus small
tables instead of materialised residual arrays, and the host never touches
residual values at all — removing the dominant term of the host parse
(the ~97×/core ceiling named in BASELINE.md).

Bit reads use the 512-entry 9-bit peek LUTs from codecs/mlp/codebooks.py
(the jump-table design of the reference, bitstream.h:133-142, flattened
for gather instead of a byte state machine).

Symbol schedule: sample-major; within a sample, position ``j`` decodes the
``j``-th bypassed-LSB bit while ``j < nbyp[lane]`` and channel
``j - nbyp[lane]``'s code otherwise — per-lane masks make the shared
schedule correct for lanes with different bypass counts.

Sub-lane split (VERDICT r2 #2): the scan's sequential axis is the real
cost — ~S0·J steps of small gathers.  The host skip-values parser can
emit every k-th sample's bit offset (``sub_every``), so each block splits
into ``nsub = ceil(S0/k)`` *independent* lanes of ≤k samples: lanes
multiply by nsub and the scan shrinks to ``k·J`` steps.  ``bitpos0`` then
arrives as [L, nsub] (one start bit per sub-lane); pass nsub=1 with
k=S0 for the unsplit behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_residuals_device", "decode_residuals_numpy"]


@partial(jax.jit, static_argnums=(9, 10, 11))
def decode_residuals_device(
    words,      # uint32 [W]      big-endian 32-bit words of the stream
    bitpos0,    # int32  [L, nsub]  per-sub-lane absolute start bit
    codebook,   # int32  [L, C]   0 = no Huffman MSB
    lsb_bits,   # int32  [L, C]   0..24
    offset,     # int32  [L, C]   signed huffman offset (precombined)
    quant,      # int32  [L, C]   left-shift applied to the sum
    nbyp,       # int32  [L]      bypassed-LSB bits per sample
    lut_vals,   # int32  [2048]   4 codebooks × 512-entry peek LUT
    lut_lens,   # int32  [2048]
    S0: int,    # samples per block (static)
    J: int,     # symbols per sample incl. bypass slots (static)
    k: int,     # samples per sub-lane (static); nsub*k >= S0
):
    """Returns (residuals int32 [L, C, S0], byp_bits int32 [L, S0, J])."""
    L, C = codebook.shape
    nsub = bitpos0.shape[1]
    u32 = jnp.uint32

    # One packed LUT gather per symbol: length in the top byte, 24-bit
    # signed value below (MSB values span a few dozen at most).
    lut = (lut_lens << 24) | (lut_vals & 0xFFFFFF)

    # Per-(lane, j) parameters hoisted OUT of the scan — the schedule only
    # depends on j, so the per-step xs carry pre-selected rows and the
    # in-scan gathers reduce to the 3 stream words + 1 LUT entry.
    j_syms = jnp.arange(J, dtype=jnp.int32)             # [J]
    ch_j = j_syms[None, :] - nbyp[:, None]              # [L, J]
    is_byp_j = j_syms[None, :] < nbyp[:, None]
    ch_ok_j = (ch_j >= 0) & (ch_j < C)
    chc = jnp.clip(ch_j, 0, C - 1)
    cbk_j = jnp.take_along_axis(codebook, chc, 1)       # [L, J]
    lbb_j = jnp.take_along_axis(lsb_bits, chc, 1)
    off_j = jnp.take_along_axis(offset, chc, 1)
    qq_j = jnp.take_along_axis(quant, chc, 1)
    use_cb_j = ch_ok_j & ~is_byp_j & (cbk_j > 0)
    lbase_j = jnp.where(use_cb_j, cbk_j * 512, 0)

    def step(bitpos, xs):
        is_byp, ch_ok, use_cb, lbase, lbb, off, qq = xs  # [L] each

        idx = (bitpos >> 5).astype(jnp.int32)
        w0 = jnp.take(words, idx, axis=0)
        w1 = jnp.take(words, idx + 1, axis=0)
        w2 = jnp.take(words, idx + 2, axis=0)
        b = (bitpos & 31).astype(u32)
        inv = (u32(32) - b) & u32(31)
        hi = (w0 << b) | jnp.where(b > 0, w1 >> inv, u32(0))

        lidx = lbase + (hi >> u32(23)).astype(jnp.int32)
        ent = jnp.take(lut, lidx, axis=0)
        nb = jnp.where(use_cb, ent >> 24, 0)
        msb = jnp.where(use_cb, (ent & 0xFFFFFF) - ((ent & 0x800000) << 1), 0)

        # LSB window at bitpos + nb, from the same three words
        p2 = bitpos + nb
        shift_word = (p2 >> 5) - idx                    # 0 or 1
        wa = jnp.where(shift_word == 0, w0, w1)
        wb = jnp.where(shift_word == 0, w1, w2)
        b2 = (p2 & 31).astype(u32)
        inv2 = (u32(32) - b2) & u32(31)
        hib = (wa << b2) | jnp.where(b2 > 0, wb >> inv2, u32(0))
        sa = (u32(32) - lbb.astype(u32)) & u32(31)
        lsb = jnp.where(lbb > 0, (hib >> sa).astype(jnp.int32), 0)

        val = ((msb << lbb) + lsb + off) << qq
        val = jnp.where(ch_ok & ~is_byp, val, 0)
        bypbit = jnp.where(is_byp, (hi >> u32(31)).astype(jnp.int32), 0)
        adv = jnp.where(is_byp, 1, jnp.where(ch_ok, nb + lbb, 0))
        return bitpos + adv, (val, bypbit)

    def tile(x):  # [L, J] → [k*J, L*nsub]: repeat over samples & sub-lanes
        rep = jnp.tile(x.T[:, :, None], (k, 1, nsub))   # [k*J, L, nsub]
        return rep.reshape(k * J, L * nsub)

    xs = (tile(is_byp_j), tile(ch_ok_j), tile(use_cb_j), tile(lbase_j),
          tile(lbb_j), tile(off_j), tile(qq_j))
    _, (vals, byps) = jax.lax.scan(
        step, bitpos0.reshape(L * nsub), xs)            # [k*J, L*nsub] each

    # step (i, j) of sub-lane u is sample u*k+i's j-th symbol: a plain
    # reshape recovers the [L, sample, J] layout (trailing sub-lane
    # overrun rows beyond S0 are sliced off)
    samp = vals.T.reshape(L, nsub * k, J)[:, :S0]       # [L, S0, J]
    byp = byps.T.reshape(L, nsub * k, J)[:, :S0]        # [L, S0, J]
    # residual of channel c sits at symbol slot nbyp + c
    cidx = jnp.broadcast_to(
        nbyp[:, None, None] + jnp.arange(C, dtype=jnp.int32)[None, None, :],
        (L, S0, C))
    res = jnp.take_along_axis(samp, cidx, axis=2)       # [L, S0, C]
    return res.transpose(0, 2, 1), byp                  # [L, C, S0]


def decode_residuals_numpy(stream: bytes, sub: dict, lut_vals: np.ndarray,
                           lut_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Executable numpy specification of the device kernel over a whole
    skip-values substream table (uniform block sizes); returns
    (residuals [NB, n_ch, S0], byp [NB, S0, 6]).  Test oracle only."""
    NB = sub["NB"]
    n_ch = sub["codebook"].shape[1]
    S0 = int(sub["len"][0])
    data = np.frombuffer(bytes(stream) + b"\0" * 8, np.uint8)

    def bits(pos, n):
        if n == 0:
            return 0
        w = int.from_bytes(bytes(data[pos >> 3 : (pos >> 3) + 8]), "big")
        return (w >> (64 - (pos & 7) - n)) & ((1 << n) - 1)

    res = np.zeros((NB, n_ch, S0), np.int32)
    byp = np.zeros((NB, S0, 6), np.int32)
    for b in range(NB):
        pos = int(sub["res_bitpos"][b])
        mask = int(sub["byp_mask"][b])
        slots = [m for m in range(6) if (mask >> m) & 1]
        for i in range(S0):
            for m in slots:
                byp[b, i, m] = bits(pos, 1)
                pos += 1
            for ci in range(n_ch):
                cb = int(sub["codebook"][b, ci])
                lb = int(sub["lsb_bits"][b, ci])
                off = int(sub["res_offset"][b, ci])
                q = int(sub["quant"][b, ci])
                msb = 0
                if cb:
                    p9 = bits(pos, 9)
                    msb = int(lut_vals[cb * 512 + p9])
                    pos += int(lut_lens[cb * 512 + p9])
                lsb = bits(pos, lb)
                pos += lb
                vv = (((msb << lb) + lsb + off) << q) & 0xFFFFFFFF
                res[b, ci, i] = vv - (1 << 32) if vv >= (1 << 31) else vv
    return res, byp
