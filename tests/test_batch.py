"""Full-disc batch decode (BASELINE config 5) + device C2 kernel tests."""

import os

import numpy as np
import pytest

from dvda_tpu.batch import decode_disc, disc_to_wavs
from dvda_tpu.cppm.c2 import c2_g
from dvda_tpu.cppm.decrypt import CppmDecryptor, encrypt_sectors
from dvda_tpu.testutil.mlp_synth import MlpSynthConfig, synth_mlp_stream
from dvda_tpu.testutil.synth import MlpTrackSpec, PcmTrackSpec, build_disc


def _disc(tmp_path):
    mlp = MlpSynthConfig(channel_assignment=1, n_frames=16, seed=2,
                         bits_per_sample=24, sample_rate=96000)
    return build_disc(str(tmp_path / "AUDIO_TS"), [
        [PcmTrackSpec(pcm_frames=960, seed=1),
         MlpTrackSpec(mlp_stream=synth_mlp_stream(mlp),
                      pcm_frames=mlp.total_pcm_frames,
                      sample_rate=96000, channel_assignment=1)],
        [PcmTrackSpec(pcm_frames=480, seed=9)],
    ])


def test_decode_disc_yields_all_tracks(tmp_path):
    layout = _disc(tmp_path)
    results = list(decode_disc(layout.path, use_device=False))
    assert [(r.title, r.track, r.codec) for r in results] == [
        (1, 1, "PCM"), (1, 2, "MLP"), (2, 1, "PCM")]
    assert results[0].samples.shape == (960, 2)
    assert results[1].samples.shape == (16 * 32, 2)


def test_disc_to_wavs_matches_oracle(tmp_path, ref_oracle):
    layout = _disc(tmp_path)
    golden = ref_oracle.run_dvda2wav(layout.path, str(tmp_path / "gold"))
    written = disc_to_wavs(layout.path, str(tmp_path / "ours"),
                           use_device=False)
    assert sorted(os.path.basename(p) for p in written) == sorted(golden)
    for p in written:
        with open(p, "rb") as f:
            assert f.read() == golden[os.path.basename(p)], p


def test_device_c2_matches_numpy(tmp_path):
    import jax.numpy as jnp

    from dvda_tpu.container.aob import AOBReader
    from dvda_tpu.ops.c2_decrypt import dcbc_dec_device

    layout = _disc(tmp_path)
    sectors = AOBReader(layout.path, 1).read_sectors(0, 4).copy()
    mk, album = 0x00A5A5A5A5A5A5A5, 0x0F0E0D0C0B0A0908
    enc = encrypt_sectors(sectors, mk, album)
    ref = CppmDecryptor(mk, album, preserve_cci=True,
                        use_device=False).decrypt_sectors(enc)
    dev = CppmDecryptor(mk, album, preserve_cci=True,
                        use_device=True).decrypt_sectors(enc)
    assert np.array_equal(ref, dev)
