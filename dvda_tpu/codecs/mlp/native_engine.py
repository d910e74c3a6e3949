"""Production MLP decode path: native parse → one fused device pipeline.

The native host library (dvda_tpu/host, C++) parses the assembled track
stream in one pass — framing, parameter state machine, Huffman residuals,
noise.  This module packs its flat arrays into bucketed kernel inputs with
fully vectorised numpy (no per-sample or per-block Python), then runs a
**single jitted program** on device:

    filter (batched AR scan over restart-chain × channel lanes)
      → per-channel series gather (precomputed indices)
      → frame gather → rematrix (6 masked matrix applications)
      → output shifts + WAVE permutation → [T, C_out] flatten

Keeping every intermediate on device avoids host round-trips; all shapes
are bucketed to powers of two so XLA programs are reused across tracks.

Reference-semantics notes:

* the *packet-boundary cut* reproduces dvda_read's termination on a packet
  that completes zero frames (dvd-audio.c:766-775): frames are kept up to
  the first post-probe packet interval containing no frame end;
* chain construction matches the Python engine: restart segments merge
  when the first post-restart block uses FIR taps (the reference carries
  FIR state across restarts, see spec.py).

Returns ``None`` when the native library is unavailable or reports a
construct outside the fast path; callers fall back to the Python engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import host
from ..params import WAVE_CHANNEL, StreamParameters

__all__ = ["decode_native"]


def _bucket(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _frame_cut(frame_end: np.ndarray, boundaries: np.ndarray, probe_end: int) -> int:
    """Number of frames to keep under the zero-frame-packet rule."""
    if boundaries.size == 0:
        return frame_end.shape[0]
    marks = np.concatenate([[probe_end], boundaries])
    idx = np.searchsorted(frame_end, marks, side="right")
    per_packet = np.diff(idx)
    zero = np.nonzero(per_packet == 0)[0]
    if zero.size == 0:
        return frame_end.shape[0]
    return int(idx[zero[0]])


def _padded_residuals(sub, nb_keep: int, S: int) -> np.ndarray:
    """Ragged (block, ch, sample) residuals → [nb_keep, n_ch, S]."""
    lens = sub["len"][:nb_keep]
    n_ch = sub["shift"].shape[1]
    rows = np.repeat(lens, n_ch)
    total = int(rows.sum())
    out = np.zeros((nb_keep * n_ch, S), dtype=np.int32)
    mask = np.arange(S)[None, :] < rows[:, None]
    out[mask] = sub["residuals"][:total]
    return out.reshape(nb_keep, n_ch, S)


@jax.jit
def _pipeline(residuals, rc_fir, rc_iir, shift, quant, iir_reset, iir_init,
              block_len, state0, series_idx, frame_idx, flat_idx,
              noise, mat_coeff, mat_noise, mat_out, mat_active, mat_quant,
              bypassed, out_shift, wave_perm):
    from ...ops.mlp_filter import mlp_filter_blocks
    from ...ops.rematrix import apply_output_stage, rematrix_frames

    # initial filter states are explicit arguments: constants captured in
    # the trace get hoisted as hidden executable parameters by XLA and can
    # be dropped on jit cache hits (observed as "supplied 20 buffers but
    # compiled program expected 21" on jax 0.9 CPU)
    out, _, _ = mlp_filter_blocks(
        residuals, rc_fir, rc_iir, shift, quant, iir_reset, iir_init,
        block_len, state0, state0,
    )
    flat = out.reshape(-1)
    series = jnp.take(flat, series_idx, axis=0)          # [8, Tb]
    channels = jnp.take(series, frame_idx, axis=1)       # [8, Fb, L]
    channels = channels.transpose(1, 2, 0)               # [Fb, L, 8]
    channels = rematrix_frames(channels, noise, mat_coeff, mat_noise,
                               mat_out, mat_active, mat_quant, bypassed)
    staged = apply_output_stage(channels, out_shift, wave_perm)
    flat_out = staged.reshape(-1, staged.shape[-1])
    return jnp.take(flat_out, flat_idx, axis=0)          # [Tb, C_out]


def decode_native(stream: bytes, boundaries: np.ndarray, probe_end: int,
                  parameters: StreamParameters) -> np.ndarray | None:
    if not host.available():
        return None
    parse = host.parse_mlp_stream(stream)
    if parse is None or parse.status != 0:
        return None
    out_ch = parameters.channel_count
    if parse.F == 0:
        return np.zeros((0, out_ch), dtype=np.int32)

    F = _frame_cut(parse.frame_end, np.asarray(boundaries, dtype=np.int64),
                   probe_end)
    if F == 0:
        return np.zeros((0, out_ch), dtype=np.int32)
    frame_len = parse.frame_len[:F]
    T = int(frame_len.sum())

    # ---------------- per-substream chain packing (vectorised) -----------
    per_sub = []
    lane_total = 0
    NB_need = 1
    S_need = 8
    for s in range(parse.substream_count):
        sub = parse.sub[s]
        nb_keep = int(sub["fr_nblocks"][:F].sum())
        lens = sub["len"][:nb_keep]
        restart = sub["restart"][:nb_keep]
        n_ch = sub["shift"].shape[1]
        restarts = np.nonzero(restart)[0]
        coupled = sub["rc_fir"][restarts].any(axis=(1, 2))
        starts = [0] + [int(r) for i, r in enumerate(restarts)
                        if r != 0 and not coupled[i]] + [nb_keep]
        chain_start = np.asarray(starts[:-1], dtype=np.int64)
        chain_len = np.diff(np.asarray(starts, dtype=np.int64))
        per_sub.append((sub, nb_keep, lens, chain_start, chain_len, n_ch,
                        lane_total))
        lane_total += len(chain_start) * n_ch
        if chain_len.size:
            NB_need = max(NB_need, int(chain_len.max()))
        if lens.size:
            S_need = max(S_need, int(lens.max()))

    NB = _bucket(NB_need)
    S = _bucket(S_need)
    B = _bucket(lane_total)

    residuals = np.zeros((B, NB, S), dtype=np.int32)
    rc_fir = np.zeros((B, NB, 8), dtype=np.int32)
    rc_iir = np.zeros((B, NB, 8), dtype=np.int32)
    shift = np.zeros((B, NB), dtype=np.int32)
    quant = np.zeros((B, NB), dtype=np.int32)
    iir_reset = np.zeros((B, NB), dtype=bool)
    iir_init = np.zeros((B, NB, 8), dtype=np.int32)
    block_len = np.zeros((B, NB), dtype=np.int32)
    series_idx = np.zeros((8, _bucket(T)), dtype=np.int32)

    for (sub, nb_keep, lens, chain_start, chain_len, n_ch, lane0) in per_sub:
        n_chains = chain_start.shape[0]
        if n_chains == 0:
            continue
        S_sub = int(lens.max()) if lens.size else 8
        res = _padded_residuals(sub, nb_keep, S_sub)
        # block index per (chain, position), clamped; mask marks real blocks
        pos = np.arange(NB, dtype=np.int64)[None, :]
        bidx = np.minimum(chain_start[:, None] + pos, max(nb_keep - 1, 0))
        bmask = pos < chain_len[:, None]                       # [n_chains, NB]

        def pack(x):  # [nb_keep, n_ch, ...] -> [n_chains*n_ch, NB, ...]
            g = x[bidx]                                        # [n_chains, NB, n_ch, ...]
            g = np.moveaxis(g, 2, 1)                           # [n_chains, n_ch, NB, ...]
            return g.reshape((n_chains * n_ch,) + g.shape[2:])

        rows = slice(lane0, lane0 + n_chains * n_ch)
        residuals[rows, :, :S_sub] = pack(res)
        rc_fir[rows] = pack(sub["rc_fir"][:nb_keep])
        rc_iir[rows] = pack(sub["rc_iir"][:nb_keep])
        shift[rows] = pack(sub["shift"][:nb_keep])
        quant[rows] = pack(sub["quant"][:nb_keep])
        iir_init[rows] = pack(sub["iir_init"][:nb_keep])
        mask_l = np.repeat(bmask[:, None, :], n_ch, axis=1).reshape(
            n_chains * n_ch, NB)
        iir_reset[rows] = pack(sub["iir_reset"][:nb_keep]) & mask_l
        block_len[rows] = np.where(mask_l, lens[bidx][:, None, :]
                                   .repeat(n_ch, 1).reshape(n_chains * n_ch, NB), 0)

        # series gather indices: t → flat filter-output index for channel 0
        # of this substream; channel c adds (c · NB · S) within the lane row
        chain_of_block = np.repeat(np.arange(n_chains), chain_len)  # [nb_keep]
        pos_of_block = np.arange(nb_keep) - chain_start[chain_of_block]
        # per-sample: block id and offset
        blk_of_t = np.repeat(np.arange(nb_keep), lens)
        off_in_blk = np.arange(int(lens.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        lane_row = lane0 + chain_of_block[blk_of_t] * n_ch
        base = (lane_row * NB + pos_of_block[blk_of_t]) * S + off_in_blk
        lo = sub["min_ch"]
        for c in range(n_ch):
            series_idx[lo + c, :base.shape[0]] = base + c * NB * S

    # ---------------- frame stage inputs ---------------------------------
    Fb = _bucket(F)
    L = _bucket(int(frame_len.max()))
    Tb = series_idx.shape[1]
    t0 = np.concatenate([[0], np.cumsum(frame_len)]).astype(np.int64)
    starts = np.concatenate([t0[:-1], np.zeros(Fb - F, np.int64)])
    frame_idx = np.minimum(starts[:, None] + np.arange(L)[None, :],
                           Tb - 1).astype(np.int32)
    # inverse map t → (frame, offset) for the final flatten
    f_of_t = np.repeat(np.arange(F, dtype=np.int64), frame_len)
    l_of_t = np.arange(T, dtype=np.int64) - t0[f_of_t]
    flat_idx = np.zeros(Tb, dtype=np.int32)
    flat_idx[:T] = (f_of_t * L + l_of_t).astype(np.int32)

    noise = np.zeros((Fb, L, 2), dtype=np.int32)
    byp_t = np.zeros((Fb, 6, L), dtype=np.int32)
    valid = np.arange(L)[None, :] < np.concatenate(
        [frame_len, np.zeros(Fb - F, np.int32)])[:, None]
    gather_t = np.minimum(frame_idx, max(T - 1, 0))
    n2 = np.stack([parse.noise0[:T], parse.noise1[:T]], axis=1)
    noise[valid] = n2[gather_t[valid]]
    byp_full = parse.bypassed[:T]  # [T, 6]
    byp_g = np.where(valid[:, :, None], byp_full[gather_t], 0)
    byp_t = np.ascontiguousarray(byp_g.transpose(0, 2, 1))

    def padF(x):
        pad = [(0, Fb - F)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x[:F], pad)

    out = _pipeline(
        jnp.asarray(residuals), jnp.asarray(rc_fir), jnp.asarray(rc_iir),
        jnp.asarray(shift), jnp.asarray(quant), jnp.asarray(iir_reset),
        jnp.asarray(iir_init), jnp.asarray(block_len),
        jnp.zeros((B, 8), jnp.int32),
        jnp.asarray(series_idx), jnp.asarray(frame_idx),
        jnp.asarray(flat_idx), jnp.asarray(noise),
        jnp.asarray(padF(parse.mat_coeff)), jnp.asarray(padF(parse.mat_noise)),
        jnp.asarray(padF(parse.mat_out)), jnp.asarray(padF(parse.mat_active)),
        jnp.asarray(padF(parse.mat_quant)), jnp.asarray(byp_t),
        jnp.asarray(padF(parse.out_shift)), jnp.asarray(_wave_perm(parse, out_ch)),
    )
    return np.asarray(out)[:T]


def _wave_perm(parse, out_ch: int) -> np.ndarray:
    mapping = WAVE_CHANNEL[parse.assignment]
    perm = np.zeros(out_ch, dtype=np.int32)
    for c in range(out_ch):
        perm[mapping[c]] = c
    return perm
