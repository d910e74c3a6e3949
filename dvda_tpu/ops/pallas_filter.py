"""MLP AR reconstruction filter as a Pallas TPU kernel.

Same computation as ops/mlp_filter.py (filter_channel, mlp.c:1243-1306 —
see there for semantics), laid out for the TPU register file instead of a
lax.scan:

* lanes live on the **last (128-wide) axis**: inputs arrive transposed as
  ``[NB, S, B]`` tiles so every per-sample operation is an (8, 128)-shaped
  VPU op across 128 lanes at once;
* the 8-tap FIR/IIR states sit on the **sublane axis** of an ``[8, 128]``
  VMEM scratch buffer, so the tap dot product is an elementwise multiply
  plus a sublane-axis reduction, and the state shift is a roll;
* the whole time recursion (NB blocks × S samples) runs inside one kernel
  invocation per 128-lane tile — no per-step XLA while-loop overhead, no
  HBM round-trips for the carried state;
* arithmetic is the same exact int64-via-int32 limb decomposition
  (ops/exact_int.py docstring) — products of 17-bit coefficients with
  8-bit state limbs, carry-propagated truncating shift.

``mlp_filter_blocks_pallas`` matches ``mlp_filter_blocks`` bit-for-bit
(tested in interpreter mode on CPU and compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["mlp_filter_blocks_pallas"]

LANES = 128


def _kernel(res_ref, fir_ref, iir_ref, shift_ref, quant_ref, irst_ref,
            init_ref, blen_ref, out_ref, fir_state, iir_state):
    _, NB, S, L = res_ref.shape

    zero8 = jnp.zeros((8, L), jnp.int32)
    fir_state[:, :] = zero8
    iir_state[:, :] = zero8

    def limb_sum(coeff, state):
        # Σ coeff·state over the 8 taps (sublane axis) as 4 int32 limb sums
        b0 = state & 0xFF
        b1 = (state >> 8) & 0xFF
        b2 = (state >> 16) & 0xFF
        b3 = state >> 24
        s0 = jnp.sum(coeff * b0, axis=0, keepdims=True)
        s1 = jnp.sum(coeff * b1, axis=0, keepdims=True)
        s2 = jnp.sum(coeff * b2, axis=0, keepdims=True)
        s3 = jnp.sum(coeff * b3, axis=0, keepdims=True)
        return s0, s1, s2, s3

    def block_body(b, _):
        fir_c = fir_ref[0, b]      # [8, L]
        iir_c = iir_ref[0, b]
        shift = shift_ref[0, b]    # [1, L] (stored with a leading unit dim)
        quant = quant_ref[0, b]
        blen = blen_ref[0, b]

        # IIR state injection at reset blocks (mlp.c:1098-1108)
        irst = irst_ref[0, b]      # [1, L] nonzero = reset
        iir_state[:, :] = jnp.where(irst != 0, init_ref[0, b],
                                    iir_state[:, :])

        def sample_body(i, _):
            f0, f1, f2, f3 = limb_sum(fir_c, fir_state[:, :])
            g0, g1, g2, g3 = limb_sum(iir_c, iir_state[:, :])
            s0 = f0 + g0
            c0 = s0 >> 8
            r0 = s0 & 0xFF
            t1 = f1 + g1 + c0
            c1 = t1 >> 8
            r1 = t1 & 0xFF
            t2 = f2 + g2 + c1
            c2 = t2 >> 8
            r2 = t2 & 0xFF
            t3 = f3 + g3 + c2
            low = (r2 << 16) | (r1 << 8) | r0
            shifted = (t3 << (24 - shift)) + (low >> shift)  # [1, L]
            res = res_ref[0, b, i][None, :]
            value = (((shifted + res) >> quant) << quant)
            valid = i < blen                                 # [1, L]
            # roll the tap history up one sublane and append; lanes past
            # their block length keep their state frozen
            rolled_fir = jnp.concatenate([fir_state[1:, :], value], axis=0)
            rolled_iir = jnp.concatenate(
                [iir_state[1:, :], value - shifted], axis=0)
            fir_state[:, :] = jnp.where(valid, rolled_fir, fir_state[:, :])
            iir_state[:, :] = jnp.where(valid, rolled_iir, iir_state[:, :])
            out_ref[0, b, i] = value[0]
            return 0

        jax.lax.fori_loop(0, S, sample_body, 0)
        return 0

    jax.lax.fori_loop(0, NB, block_body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def mlp_filter_blocks_pallas(
    residuals,   # int32 [B, NB, S]
    rc_fir,      # int32 [B, NB, 8]
    rc_iir,      # int32 [B, NB, 8]
    shift,       # int32 [B, NB]
    quant,       # int32 [B, NB]
    iir_reset,   # bool  [B, NB]
    iir_init,    # int32 [B, NB, 8]
    block_len,   # int32 [B, NB]
    interpret: bool = False,
):
    """Pallas variant of ops.mlp_filter.mlp_filter_blocks (zero initial
    states); returns out [B, NB, S]."""
    from jax.experimental.pallas import tpu as pltpu

    B, NB, S = residuals.shape
    assert B % LANES == 0, "lane count must be a multiple of 128"
    G = B // LANES

    # lanes-last layouts
    res_t = residuals.reshape(G, LANES, NB, S).transpose(0, 2, 3, 1)
    fir_t = rc_fir.reshape(G, LANES, NB, 8).transpose(0, 2, 3, 1)
    iir_t = rc_iir.reshape(G, LANES, NB, 8).transpose(0, 2, 3, 1)
    init_t = iir_init.reshape(G, LANES, NB, 8).transpose(0, 2, 3, 1)
    shift_t = shift.reshape(G, LANES, NB).transpose(0, 2, 1)[:, :, None, :]
    quant_t = quant.reshape(G, LANES, NB).transpose(0, 2, 1)[:, :, None, :]
    irst_t = iir_reset.astype(jnp.int32).reshape(G, LANES, NB) \
        .transpose(0, 2, 1)[:, :, None, :]
    blen_t = block_len.reshape(G, LANES, NB).transpose(0, 2, 1)[:, :, None, :]

    grid = (G,)

    # one 128-lane tile per grid step; everything VMEM-resident
    def spec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((G, NB, S, LANES), jnp.int32),
        grid=grid,
        in_specs=[
            spec((NB, S, LANES)), spec((NB, 8, LANES)), spec((NB, 8, LANES)),
            spec((NB, 1, LANES)), spec((NB, 1, LANES)), spec((NB, 1, LANES)),
            spec((NB, 8, LANES)), spec((NB, 1, LANES)),
        ],
        out_specs=spec((NB, S, LANES)),
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(res_t, fir_t, iir_t, shift_t, quant_t, irst_t, init_t, blen_t)

    # back to [B, NB, S]
    return out.transpose(0, 3, 1, 2).reshape(B, NB, S)
