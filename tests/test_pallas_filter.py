"""Pallas MLP filter kernel vs the lax.scan kernel (interpret mode on CPU;
the compiled TPU path is exercised by bench/production)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvda_tpu.ops.mlp_filter import mlp_filter_blocks
from dvda_tpu.ops.pallas_filter import mlp_filter_blocks_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_scan(seed):
    rng = np.random.default_rng(seed)
    B, NB, S = 128, 4, 16
    res = rng.integers(-3000, 3000, (B, NB, S)).astype(np.int32)
    fir = rng.integers(-900, 900, (B, NB, 8)).astype(np.int32)
    iir = rng.integers(-900, 900, (B, NB, 8)).astype(np.int32)
    shift = rng.integers(8, 13, (B, NB)).astype(np.int32)
    quant = rng.integers(0, 3, (B, NB)).astype(np.int32)
    irst = rng.random((B, NB)) < 0.3
    init = rng.integers(-5000, 5000, (B, NB, 8)).astype(np.int32)
    blen = np.where(rng.random((B, NB)) < 0.2, S // 2, S).astype(np.int32)
    args = tuple(map(jnp.asarray,
                     (res, fir, iir, shift, quant, irst, init, blen)))
    ref, _, _ = mlp_filter_blocks(*args, jnp.zeros((B, 8), jnp.int32),
                                  jnp.zeros((B, 8), jnp.int32))
    got = mlp_filter_blocks_pallas(*args, interpret=True)
    mask = np.arange(S)[None, None, :] < blen[:, :, None]
    assert np.array_equal(np.asarray(ref)[mask], np.asarray(got)[mask])


def test_pallas_extreme_values():
    """Limb arithmetic must stay exact for pathological int32 inputs."""
    rng = np.random.default_rng(9)
    B, NB, S = 128, 2, 8
    res = rng.integers(-2**31, 2**31 - 1, (B, NB, S)).astype(np.int32)
    fir = rng.integers(-2**15, 2**15, (B, NB, 8)).astype(np.int32)
    iir = rng.integers(-2**15, 2**15, (B, NB, 8)).astype(np.int32)
    shift = rng.integers(0, 16, (B, NB)).astype(np.int32)
    quant = rng.integers(0, 16, (B, NB)).astype(np.int32)
    irst = rng.random((B, NB)) < 0.5
    init = rng.integers(-2**28, 2**28, (B, NB, 8)).astype(np.int32)
    blen = np.full((B, NB), S, dtype=np.int32)
    args = tuple(map(jnp.asarray,
                     (res, fir, iir, shift, quant, irst, init, blen)))
    ref, _, _ = mlp_filter_blocks(*args, jnp.zeros((B, 8), jnp.int32),
                                  jnp.zeros((B, 8), jnp.int32))
    got = mlp_filter_blocks_pallas(*args, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_pipeline_with_pallas_filter_bit_exact():
    """filter_kernel="pallas" routes the uniform pipeline through the
    Pallas kernel (interpreted off-TPU) with identical output."""
    import numpy as np

    from dvda_tpu.codecs.mlp.native_engine import decode_native
    from dvda_tpu.config import DecodeConfig
    from dvda_tpu.codecs.params import StreamParameters
    from dvda_tpu.testutil.mlp_synth import MlpSynthConfig, synth_mlp_stream
    from dvda_tpu.testutil.synth import BPS_CODE, RATE_CODE
    from dvda_tpu import host

    if not host.available():
        pytest.skip("native host library unavailable")
    cfg = MlpSynthConfig(channel_assignment=17, substream_count=2,
                         n_frames=32, restart_every=2, major_sync_every=2,
                         seed=8, fir_across_restart=False,
                         params_update_prob=0.0)
    stream = synth_mlp_stream(cfg)
    params = StreamParameters(BPS_CODE[cfg.bits_per_sample], 0xF,
                              RATE_CODE[cfg.sample_rate], 0xF,
                              cfg.channel_assignment)
    bnd = np.zeros(0, np.int64)
    a = decode_native(stream, bnd, len(stream), params,
                      config=DecodeConfig())
    b = decode_native(stream, bnd, len(stream), params,
                      config=DecodeConfig(filter_kernel="pallas"))
    assert a is not None and b is not None
    assert np.array_equal(a, b)
