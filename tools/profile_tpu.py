#!/usr/bin/env python
"""TPU tunnel + decode-path microprofile.

Measures, on the real device:
  1. raw tunnel characteristics (RTT, h2d / d2h bandwidth, trivial-jit
     dispatch overhead, whether dispatch blocks);
  2. per-stage cost of one steady-state 30 s MLP 5.1 decode, with the
     stage timer reset after warm-up so numbers are per-run;
  3. device-compute-only time of the chunk program (device-resident
     inputs, block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def p(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    p(f"devices: {jax.devices()}")
    dev = jax.devices()[0]

    # ---- raw tunnel probes ------------------------------------------------
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        jax.block_until_ready(f(x))
    p(f"tiny jit round-trip (blocking): {(time.perf_counter()-t0)/N*1000:.1f} ms")

    t0 = time.perf_counter()
    for _ in range(N):
        f(x)
    p(f"tiny jit dispatch (non-blocking): {(time.perf_counter()-t0)/N*1000:.2f} ms")
    jax.block_until_ready(f(x))

    big = np.zeros(32 * 1024 * 1024, np.uint8)  # 32 MB
    t0 = time.perf_counter()
    d = jax.device_put(big, dev)
    mid = time.perf_counter()
    jax.block_until_ready(d)
    t1 = time.perf_counter()
    p(f"h2d 32MB: device_put returned in {(mid-t0)*1000:.1f} ms, "
      f"ready in {(t1-t0)*1000:.1f} ms = {32/(t1-t0):.0f} MB/s")

    t0 = time.perf_counter()
    _ = np.asarray(d)
    t1 = time.perf_counter()
    p(f"d2h 32MB: {(t1-t0)*1000:.0f} ms = {32/(t1-t0):.1f} MB/s")

    d.copy_to_host_async()
    t0 = time.perf_counter()
    _ = np.asarray(d)
    p(f"d2h 32MB after copy_to_host_async already-drained: {(time.perf_counter()-t0)*1000:.0f} ms")

    # ---- build the bench stream ------------------------------------------
    from dvda_tpu.testutil.mlp_synth import MlpSynthConfig, synth_mlp_stream
    from dvda_tpu.testutil.synth import BPS_CODE, RATE_CODE
    from dvda_tpu.codecs.params import StreamParameters
    from dvda_tpu.codecs.mlp.native_engine import decode_native
    from dvda_tpu.utils.profiling import global_timer

    RATE = 96000
    frames_per = 2 * 40
    n_frames = 30 * RATE // frames_per
    cfg = MlpSynthConfig(channel_assignment=17, substream_count=2,
                         bits_per_sample=24, sample_rate=RATE,
                         n_frames=n_frames, blocks_per_frame=2, block_size=40,
                         major_sync_every=8, restart_every=8, seed=7,
                         fir_across_restart=False, params_update_prob=0.0)
    t0 = time.perf_counter()
    stream = synth_mlp_stream(cfg)
    p(f"synth: {len(stream)/1e6:.1f} MB stream in {time.perf_counter()-t0:.1f}s")
    params = StreamParameters(BPS_CODE[24], 0xF, RATE_CODE[RATE], 0xF, 17)
    bnd = np.zeros(0, np.int64)

    t0 = time.perf_counter()
    out = decode_native(stream, bnd, len(stream), params, want_packed=True)
    p(f"warm-up decode: {time.perf_counter()-t0:.1f}s, out {out.shape} {out.dtype}")

    for run in range(3):
        global_timer.reset() if hasattr(global_timer, "reset") else None
        t0 = time.perf_counter()
        out = decode_native(stream, bnd, len(stream), params, want_packed=True)
        dt = time.perf_counter() - t0
        p(f"steady run {run}: {dt*1000:.0f} ms = {30/dt:.1f}x realtime")
        p(global_timer.summary())

    # ---- device-compute-only: time the chunk program with resident inputs -
    from dvda_tpu.codecs.mlp import native_engine as ne
    from dvda_tpu import host

    parse = host.parse_mlp_stream(stream)
    F = ne._frame_cut(parse.frame_end, bnd, len(stream))
    frame_len = parse.frame_len[:F]
    T = int(frame_len.sum())
    L0 = int(frame_len[0])
    subs_info = []
    for s_idx in range(parse.substream_count):
        sub = parse.sub[s_idx]
        nb_keep = int(sub["fr_nblocks"][:F].sum())
        lens = sub["len"][:nb_keep]
        S0 = int(lens[0])
        restart = sub["restart"][:nb_keep]
        restarts = np.nonzero(restart)[0]
        coupled = sub["rc_fir"][restarts].any(axis=(1, 2))
        chain_starts = np.asarray(
            [0] + [int(r) for i, r in enumerate(restarts)
                   if r != 0 and not coupled[i]], dtype=np.int64)
        chain_lens = np.diff(np.concatenate([chain_starts, [nb_keep]]))
        NB0 = int(chain_lens[0])
        subs_info.append((sub, 0, S0, NB0))
        n_chains = nb_keep // NB0
        period = NB0 * S0
    p(f"n_chains={n_chains} period={period} T={T}")

    CHUNK = 512
    # stage one chunk's arenas on device, then time pure execution
    import dvda_tpu.codecs.mlp.native_engine as neng
    b = neng._ArenaBuilder()
    # reuse internal dispatch to get arenas: monkeypatch pipeline to capture
    captured = {}
    orig = neng._uniform_arena_pipeline

    def capture(a4, a2, a1, spec):
        captured["args"] = (a4, a2, a1, spec)
        return orig(a4, a2, a1, spec)

    neng._uniform_arena_pipeline = capture
    neng._dispatch_uniform_chunk(parse, subs_info, 0, CHUNK, CHUNK,
                                 period, L0, 6, pack24=True)
    neng._uniform_arena_pipeline = orig
    a4, a2, a1, spec = captured["args"]
    da4, da2, da1 = (jax.device_put(a, dev) for a in (a4, a2, a1))
    jax.block_until_ready((da4, da2, da1))
    r = orig(da4, da2, da1, spec)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    REPS = 10
    for _ in range(REPS):
        r = orig(da4, da2, da1, spec)
        jax.block_until_ready(r)
    per = (time.perf_counter() - t0) / REPS
    audio_per_chunk = CHUNK * period / RATE
    n_chunks = (n_chains + CHUNK - 1) // CHUNK
    p(f"chunk exec+RTT (blocking): {per*1000:.1f} ms for {audio_per_chunk:.2f}s audio")
    # amortized: dispatch all reps, block once (hides RTT)
    t0 = time.perf_counter()
    rs = [orig(da4, da2, da1, spec) for _ in range(REPS)]
    jax.block_until_ready(rs)
    per_amort = (time.perf_counter() - t0) / REPS
    p(f"chunk exec amortized: {per_amort*1000:.1f} ms "
      f"=> device-compute {audio_per_chunk/per_amort:.0f}x realtime "
      f"({n_chunks} chunks/track)")
    # h2d staging cost of one chunk (async device_put, then ready)
    t0 = time.perf_counter()
    eb4, eb2, eb1 = (jax.device_put(a, dev) for a in (a4, a2, a1))
    mid = time.perf_counter()
    jax.block_until_ready((eb4, eb2, eb1))
    t1 = time.perf_counter()
    mb = (a4.nbytes + a2.nbytes + a1.nbytes) / 1e6
    p(f"chunk arenas {mb:.1f} MB: device_put {(mid-t0)*1000:.1f} ms, "
      f"ready {(t1-t0)*1000:.1f} ms")
    # d2h of one chunk's output
    t0 = time.perf_counter()
    _ = np.asarray(r)
    t1 = time.perf_counter()
    p(f"chunk output {r.nbytes/1e6:.1f} MB d2h: {(t1-t0)*1000:.0f} ms")
    parse.close()


if __name__ == "__main__":
    main()
