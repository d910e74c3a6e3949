"""On-device MLP Huffman residual decode — gather-free formulation.

Reference analog: ``decode_residual_data`` (mlp.c:1122-1241), a per-sample
host loop over Huffman codes + LSB fields.  Device formulation: the host
parser's *skip-values* mode (host/src/mlp_parse.cc) walks residual bits
length-only and emits per-block decode tables plus every k-th sample's
bit offset; this kernel then re-decodes the values from the **raw
bitstream** in parallel — each k-sample run is an independent lane, so
only the ``k·J`` symbols inside a run decode sequentially (``lax.scan``).

The round-2 kernel spent its whole budget on gathers: ~13.4 ns/element
on v5e for `jnp.take` at these shapes, invariant to lane/step trade-offs
(measured; the no-gather scan body costs ~0.2 ms).  This version removes
every in-scan gather:

* **window fetch** — each lane's bit span is covered by two NW-word
  *aligned* rows of the chunk window (`words.reshape(-1, NW)`), fetched
  once per chunk by row gather (contiguous minor-dim slices, which XLA
  vectorises, unlike element gathers);
* **in-scan word access** — a log2(2·NW)-level select tree over the
  lane's private 2·NW-word window (pure `where`s);
* **codebook decode** — the three MLP codebooks are unary-structured
  (codebooks.py), so (value, length) is computed *arithmetically* from
  the 9-bit peek: bit-length via 9 compares, the "01 0^m 1" mid-class
  via the bit-length of the low 7 bits, plus two short-prefix specials
  per codebook.  Validated exhaustively against the peek LUTs for every
  valid 9-bit peek (tests/test_huffman_device.py).

Symbol schedule: sample-major; within a sample, position ``j`` decodes
the ``j``-th bypassed-LSB bit while ``j < nbyp[lane]`` and channel
``j - nbyp[lane]``'s code otherwise — per-lane masks make the shared
schedule correct for lanes with different bypass counts.  Per-(lane, j)
parameters live in [J, L'] arrays dynamic-indexed by the scan step's
``j`` (a traced scalar → vector load, not a gather).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_residuals_device", "decode_residuals_numpy",
           "codebook_arith_decode"]


def codebook_arith_decode(cb_is1, cb_is2, cb_is3, p):
    """(msb_value, code_length) for the 9-bit peek ``p`` under the
    codebook selected by the boolean masks (exactly one true for lanes
    with a codebook; all false → (0, 0) is handled by the caller's
    ``use_cb`` mask).  Pure vector arithmetic — see module docstring."""
    def bitlen9(x):
        bl = jnp.zeros_like(x)
        for t in range(9):
            bl = bl + (x >= (1 << t)).astype(jnp.int32)
        return bl

    m = 9 - bitlen9(p)                   # leading zeros of the 9-bit peek
    m01 = 7 - bitlen9(p & 0x7F)          # zeros after a "01" prefix
    top1 = p >> 8
    top2 = p >> 7
    mid = top2 == 1                      # "01 0^m01 1" class (all books)
    # codebook 1: 1xx→top3+3 (len 3) | 01…→11+m01 | 00…→8-m (len m+1)
    v1 = jnp.where(top1 == 1, (p >> 6) + 3, jnp.where(mid, 11 + m01, 8 - m))
    n1 = jnp.where(top1 == 1, 3, jnp.where(mid, 3 + m01, m + 1))
    # codebook 2: 11→8, 10→7 (len 2) | 01…→9+m01 | 00…→8-m
    v2 = jnp.where(top2 == 3, 8, jnp.where(top2 == 2, 7,
                                           jnp.where(mid, 9 + m01, 8 - m)))
    n2 = jnp.where(top2 >= 2, 2, jnp.where(mid, 3 + m01, m + 1))
    # codebook 3: 1→7 (len 1) | 01…→8+m01 | 00…→8-m
    v3 = jnp.where(top1 == 1, 7, jnp.where(mid, 8 + m01, 8 - m))
    n3 = jnp.where(top1 == 1, 1, jnp.where(mid, 3 + m01, m + 1))
    val = jnp.where(cb_is1, v1, jnp.where(cb_is2, v2, v3))
    nb = jnp.where(cb_is1, n1, jnp.where(cb_is2, n2, n3))
    return val, nb


@partial(jax.jit, static_argnums=(7, 8, 9, 10))
def decode_residuals_device(
    words,      # uint32 [W]      chunk window, W a multiple of NW (+guard)
    bitpos0,    # int32  [L, nsub]  per-sub-lane absolute start bit
    codebook,   # int32  [L, C]   0 = no Huffman MSB
    lsb_bits,   # int32  [L, C]   0..24
    offset,     # int32  [L, C]   signed huffman offset (precombined)
    quant,      # int32  [L, C]   left-shift applied to the sum
    nbyp,       # int32  [L]      bypassed-LSB bits per sample
    S0: int,    # samples per block (static)
    J: int,     # symbols per sample incl. bypass slots (static)
    k: int,     # samples per sub-lane (static); nsub*k >= S0
    NW: int,    # window row words (static, power of two); a sub-lane's
                # span + 64-bit guard must fit in NW*32 bits
):
    """Returns (residuals int32 [L, C, S0], byp_bits int32 [L, S0, J])."""
    L, C = codebook.shape
    nsub = bitpos0.shape[1]
    Lp = L * nsub
    u32 = jnp.uint32
    LOG = NW.bit_length() - 1

    # ---- per-lane aligned windows: two NW-word rows per sub-lane -------
    words2d = words.reshape(-1, NW)
    flat_bp = bitpos0.reshape(Lp)
    row = (flat_bp >> (5 + LOG)).astype(jnp.int32)
    win = jnp.concatenate(
        [jnp.take(words2d, row, axis=0),
         jnp.take(words2d, row + 1, axis=0)], axis=1)      # [Lp, 2*NW]
    local0 = flat_bp - (row << (5 + LOG))                   # [0, 2*NW*32)

    def sel(i):  # win[:, i] via a select tree (no gather); i int32 [Lp]
        w = win
        for lev in reversed(range(LOG + 1)):
            half = 1 << lev
            w = jnp.where(((i >> lev) & 1).astype(bool)[:, None],
                          jax.lax.slice_in_dim(w, half, 2 * half, axis=1),
                          jax.lax.slice_in_dim(w, 0, half, axis=1))
        return w[:, 0]

    # ---- per-(lane, j) parameters, [J, L'] dynamic-indexed by step ----
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

    def bysub(x):  # [L, J] → [J, L*nsub] (broadcast across sub-lanes)
        return jnp.broadcast_to(x.T[:, :, None], (J, L, nsub)).reshape(J, Lp)

    P = {
        "is_byp": bysub(is_byp_j), "ch_ok": bysub(ch_ok_j),
        "cb1": bysub(use_cb_j & (cbk_j == 1)),
        "cb2": bysub(use_cb_j & (cbk_j == 2)),
        "cb3": bysub(use_cb_j & (cbk_j == 3)),
        "use_cb": bysub(use_cb_j), "lbb": bysub(lbb_j),
        "off": bysub(off_j), "qq": bysub(qq_j),
    }

    def step(bitpos, jj):
        row = {n: jax.lax.dynamic_index_in_dim(a, jj, 0, keepdims=False)
               for n, a in P.items()}
        idx = bitpos >> 5
        w0 = sel(idx)
        w1 = sel(idx + 1)
        w2 = sel(idx + 2)
        b = (bitpos & 31).astype(u32)
        inv = (u32(32) - b) & u32(31)
        hi = (w0 << b) | jnp.where(b > 0, w1 >> inv, u32(0))

        p9 = (hi >> u32(23)).astype(jnp.int32)
        msb, nb = codebook_arith_decode(row["cb1"], row["cb2"], row["cb3"],
                                        p9)
        nb = jnp.where(row["use_cb"], nb, 0)
        msb = jnp.where(row["use_cb"], msb, 0)

        # LSB window at bitpos + nb, from the same three words
        lbb = row["lbb"]
        p2 = bitpos + nb
        shift_word = (p2 >> 5) - idx                    # 0 or 1
        wa = jnp.where(shift_word == 0, w0, w1)
        wb = jnp.where(shift_word == 0, w1, w2)
        b2 = (p2 & 31).astype(u32)
        inv2 = (u32(32) - b2) & u32(31)
        hib = (wa << b2) | jnp.where(b2 > 0, wb >> inv2, u32(0))
        sa = (u32(32) - lbb.astype(u32)) & u32(31)
        lsb = jnp.where(lbb > 0, (hib >> sa).astype(jnp.int32), 0)

        val = ((msb << lbb) + lsb + row["off"]) << row["qq"]
        val = jnp.where(row["ch_ok"] & ~row["is_byp"], val, 0)
        # one fused output: bypass slots carry their bit, channel slots
        # their value (slot classes are disjoint, so the extraction masks
        # below separate them) — halves the scan's HBM output traffic
        out = jnp.where(row["is_byp"], (hi >> u32(31)).astype(jnp.int32),
                        val)
        adv = jnp.where(row["is_byp"], 1,
                        jnp.where(row["ch_ok"], nb + lbb, 0))
        return bitpos + adv, out

    steps_j = jnp.tile(j_syms, k)                       # [k*J]
    _, outs = jax.lax.scan(step, local0, steps_j)

    # step (i, j) of sub-lane u is sample u*k+i's j-th symbol: a plain
    # reshape recovers the [L, sample, J] layout (trailing sub-lane
    # overrun rows beyond S0 are sliced off)
    samp = outs.T.reshape(L, nsub * k, J)[:, :S0]       # [L, S0, J]
    # bypass bits live in slots j < nbyp; channel values elsewhere
    byp = samp * (j_syms[None, :] < nbyp[:, None])[:, None, :]
    # residual of channel c sits at symbol slot nbyp + c — extracted by
    # masked sum over the tiny J axis (a take_along_axis here costs
    # ~13 ns/element on v5e, ~27 ms/chunk; the masked sum is ~free)
    cols = []
    for c in range(C):
        m = ((nbyp + c)[:, None] == j_syms[None, :]).astype(jnp.int32)
        cols.append((samp * m[:, None, :]).sum(axis=2))  # [L, S0]
    return jnp.stack(cols, axis=1), byp                  # [L, C, S0]


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
