"""Device-Huffman residual-kernel ablation on real TPU.

Captures the per-substream kernel arguments at the bench's MLP 5.1/96k
chunk shapes, then times `decode_residuals_device` variants with scan
stages stubbed (the kernel's private ``_ablate`` hook) using the same
forced-data-dependency ramp methodology as `bench_device_compute`
(cli/bench.py — through this environment's relay, naive timing measures
enqueue cost, not compute).

Usage:  python tools/devhuff_ablate.py [variant ...]
Variants default to: full nosel noarith nosel,noarith
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dvda_tpu.cli import bench as B
from dvda_tpu.codecs.mlp import native_engine as ne
from dvda_tpu.ops import huffman_decode as hd


def capture_kernel_args():
    """Kernel (args, static) per substream at the bench 5.1 shapes.

    Captures the chunk arenas via the bench harness, then re-runs the
    arena pipeline *eagerly* with a spy on the kernel so the spy sees
    concrete arrays (inside the harness the pipeline may run jitted)."""
    cfg, out_ch = B._devcompute_cases()["mlp_51_96k"]
    cap = B._capture_chunk_args(cfg, out_ch, device_huffman=True)
    assert cap is not None, "capture failed"
    (a4, a2, a1, spec, words), audio = cap

    calls = []
    orig = hd.decode_residuals_device

    def spy(words, bp, cb, lsbb, off, quant, nbyp, S0, J, k, NW, NB0=0,
            _ablate="", word_base=None):
        calls.append((tuple(np.asarray(a) for a in
                            (words, bp, cb, lsbb, off, quant, nbyp)),
                      (S0, J, k, NW, NB0),
                      None if word_base is None else np.asarray(word_base)))
        return orig(words, bp, cb, lsbb, off, quant, nbyp, S0, J, k, NW,
                    NB0, word_base=word_base)

    # native_engine imports the symbol inside the function body, so
    # patching the ops module is sufficient
    hd.decode_residuals_device = spy
    try:
        # the pipeline is jitted (and already traced during capture) —
        # run the unwrapped function so the spy actually executes
        ne._uniform_arena_pipeline.__wrapped__(a4, a2, a1, spec, words)
    finally:
        hd.decode_residuals_device = orig
    assert calls, "kernel not reached (device_huffman path not taken?)"
    return calls, audio


def ramp(fn, variants):
    jax.block_until_ready(variants)
    np.asarray(fn(*variants[0]))  # warm/compile

    def run(n):
        t0 = time.perf_counter()
        last = None
        for i in range(n):
            last = fn(*variants[i % len(variants)])
        np.asarray(last)
        return time.perf_counter() - t0

    return min((run(45) - run(5)) / 40 for _ in range(2))


def pipeline_times(audio):
    """Ramp the full devhuff chunk pipeline and the same pipeline with
    the residual kernel stubbed (same output shapes, trivial compute) —
    the difference is the kernel + the layout cost of consuming its
    output, which the standalone kernel timing (whose final reshape/sum
    fuses away) does not see."""
    cfg, out_ch = B._devcompute_cases()["mlp_51_96k"]
    cap = B._capture_chunk_args(cfg, out_ch, device_huffman=True)
    (a4, a2, a1, spec, words_dev), _ = cap

    def _res_shape(cb, S0, NB0):
        L, C = cb.shape
        return (NB0, S0, C * (L // NB0)) if NB0 > 0 else (C, L, S0)

    def stub(words, bp, cb, lsbb, off, quant, nbyp, S0, J, k, NW, NB0=0,
             _ablate="", word_base=None):
        L, C = cb.shape
        dep = (bp[0, 0] + words[0].astype(jnp.int32))
        res = jnp.broadcast_to(dep, _res_shape(cb, S0, NB0))
        byp = jnp.broadcast_to(dep & 1, (L, S0))
        return res.astype(jnp.int32), byp.astype(jnp.int32)

    def konly(words, bp, cb, lsbb, off, quant, nbyp, S0, J, k, NW, NB0=0,
              _ablate="", word_base=None):
        # real kernel, output reduced to a scalar then re-broadcast:
        # downstream layout folds to broadcasts, so konly - stub is the
        # kernel-in-context cost and full - konly the cost of actually
        # consuming its output layout
        res, byp = hd_orig(words, bp, cb, lsbb, off, quant, nbyp,
                           S0, J, k, NW, NB0, word_base=word_base)
        L, C = cb.shape
        dep = res.sum() + byp.sum()
        res2 = jnp.broadcast_to(dep, _res_shape(cb, S0, NB0))
        byp2 = jnp.broadcast_to(dep & 1, (L, S0))
        return res2, byp2

    def resonly(words, bp, cb, lsbb, off, quant, nbyp, S0, J, k, NW,
                NB0=0, _ablate="", word_base=None):
        # real residuals, bypass field zeroed: full - resonly is the
        # bypass-consumption cost (rows shifts + rematrix byp adds)
        res, byp = hd_orig(words, bp, cb, lsbb, off, quant, nbyp,
                           S0, J, k, NW, NB0, word_base=word_base)
        return res, jnp.zeros_like(byp)

    hd_orig = hd.decode_residuals_device
    for name, patch in (("pipe-full", None), ("pipe-stub", stub),
                        ("pipe-konly", konly), ("pipe-resonly", resonly)):
        orig = hd.decode_residuals_device
        if patch is not None:
            hd.decode_residuals_device = patch
        try:
            inner = ne._uniform_arena_pipeline.__wrapped__
            fn = jax.jit(lambda x4, x2, x1:
                         inner(x4, x2, x1, spec, words_dev)
                         .astype(jnp.int32).sum())
            dev = jax.devices()[0]
            rng = np.random.default_rng(1)
            var = []
            for v in range(8):
                v4 = a4.copy()
                idx = rng.integers(0, v4.size, size=4096)
                v4[idx] ^= np.int32(v + 1)
                var.append(tuple(jax.device_put(x, dev)
                                 for x in (v4, a2, a1)))
            dt = ramp(fn, var)
            print(f"  {name:>16s}: {dt * 1e3:8.3f} ms "
                  f"({audio / dt:7.0f}x realtime)")
        finally:
            hd.decode_residuals_device = orig


def main():
    variants_req = sys.argv[1:] or ["full", "nosel", "noarith",
                                    "nosel,noarith"]
    pipe = [v for v in variants_req if v.startswith("pipe")]
    variants_req = [v for v in variants_req if not v.startswith("pipe")]
    calls, audio = capture_kernel_args()
    if pipe:
        pipeline_times(audio)
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} audio/chunk={audio:.2f}s")
    for ci, (args, static) in enumerate(calls):
        S0, J, k, NW, NB0 = static
        L, C = args[2].shape
        nsub = args[1].shape[1]
        print(f"substream {ci}: L={L} C={C} nsub={nsub} "
              f"S0={S0} J={J} k={k} NW={NW} NB0={NB0} "
              f"slots={L * nsub * k * J}")

    rng = np.random.default_rng(0)
    for ab in variants_req:
        ab_arg = "" if ab == "full" else ab
        total = 0.0
        for ci, (args, static) in enumerate(calls):
            S0, J, k, NW, NB0 = static
            # 8 perturbed word-buffer variants (distinct inputs so the
            # relay cannot elide identical executions)
            var = []
            for v in range(8):
                w = args[0].copy()
                idx = rng.integers(0, w.size, size=256)
                w[idx] ^= np.uint32(v + 1)
                var.append(tuple(jax.device_put(x, dev)
                                 for x in (w,) + args[1:]))

            def fn(*a, _st=static, _ab=ab_arg):
                res, byp = hd.decode_residuals_device(
                    *a, _st[0], _st[1], _st[2], _st[3], _st[4], _ab)
                return res.astype(jnp.int32).sum() + byp.sum()

            jfn = jax.jit(fn)
            dt = ramp(jfn, var)
            total += dt
            print(f"  {ab:>16s} sub{ci}: {dt * 1e3:8.3f} ms")
        print(f"  {ab:>16s} TOTAL: {total * 1e3:8.3f} ms "
              f"({audio / total:7.0f}x realtime)")


if __name__ == "__main__":
    main()
