// PCM chunk → WAV byte repack.
//
// A DVD-Audio PCM chunk holds 2 frames of byte-swapped samples
// (AOB_BYTE_SWAP, pcm.c:125-166 in the reference); the WAV payload wants
// the same bytes little-endian frame-major.  Both the unswap scatter and
// the LE sample pack are pure byte permutations, so they compose into ONE
// gather table per (bps, channels) shape: out byte j of a chunk comes
// from chunk byte table[j] (or is 0 when the format leaves it undefined —
// the reference's zero-initialised unswapped[] semantics).  This replaces
// the numpy unpack-to-int32 + repack-to-bytes round trip (two full-array
// integer passes plus temporaries) with a single memcpy-speed sweep; the
// numpy path remains as the executable spec and the int32 (read_all)
// path.
//
// table: int32 [out_per_chunk], entries in [0, csize) or -1 → 0.
// Writes min(n * out_per_chunk, max_bytes) bytes to dst (max_bytes cuts
// the trailing partial frame at the track's PTS-derived total).
#include <cstdint>

extern "C" void mp_pcm_repack(const uint8_t* chunks, int64_t n,
                              int32_t csize, const int32_t* table,
                              int32_t out_per_chunk, uint8_t* dst,
                              int64_t max_bytes) {
  if (n <= 0 || csize <= 0 || out_per_chunk <= 0 || max_bytes <= 0) return;
  int64_t written = 0;
  const int64_t full = max_bytes / out_per_chunk;
  const int64_t nc = full < n ? full : n;
  for (int64_t i = 0; i < nc; i++) {
    const uint8_t* src = chunks + i * csize;
    uint8_t* d = dst + i * out_per_chunk;
    for (int32_t j = 0; j < out_per_chunk; j++) {
      const int32_t t = table[j];
      d[j] = t >= 0 ? src[t] : 0;
    }
    written += out_per_chunk;
  }
  // trailing partial chunk (the PTS cut lands mid-chunk)
  if (nc < n && written < max_bytes) {
    const uint8_t* src = chunks + nc * csize;
    uint8_t* d = dst + written;
    const int32_t lim = int32_t(max_bytes - written);
    for (int32_t j = 0; j < lim && j < out_per_chunk; j++) {
      const int32_t t = table[j];
      d[j] = t >= 0 ? src[t] : 0;
    }
  }
}
