// Standalone micro-bench for the raw decode hot loop: times hsr_raw_decode
// end-to-end plus (via #include of the TU) the internal decode_groups
// kernels on a pre-padded stream, so per-call overheads (pad_words copy,
// u32 widening, table build) are separable from the kernel rate.
//
//   g++ -O3 -march=native -std=c++20 -fno-exceptions -fno-rtti \
//       micro_decode.cpp -o /tmp/micro_decode -lpthread && /tmp/micro_decode
#include "hsrans_codec.cpp"

#include <chrono>
#include <cstdio>
#include <random>

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

template <class F>
static double best_of(int reps, F f) {
  double t = 1e9;
  for (int i = 0; i < reps; i++) {
    const double t0 = now_s();
    f();
    t = std::min(t, now_s() - t0);
  }
  return t;
}

int main(int argc, char **argv) {
  const uint64_t size = argc > 1 ? strtoull(argv[1], nullptr, 10) : (12ull << 20);
  const uint32_t bits = 12;
  // zipf-ish synthetic bytes (decode rate depends mildly on renorm density)
  std::vector<uint8_t> data(size);
  std::mt19937 rng(42);
  std::geometric_distribution<int> gd(0.08);
  for (auto &b : data) b = (uint8_t)std::min(gd(rng), 255);

  std::vector<uint8_t> blob(size + (size >> 2) + (1 << 20));
  std::vector<uint8_t> out(size + 64);
  const double mb = (double)size / (1 << 20);

  for (uint32_t n : {64u, 32u, 16u}) {
    const int64_t esz =
        hsr_raw_encode(data.data(), size, blob.data(), blob.size(), bits, n);
    if (esz < 0) { printf("encode failed\n"); return 1; }

    const double td = best_of(9, [&] {
      hsr_raw_decode(blob.data(), (uint64_t)esz, out.data(), out.size(), bits, n);
    });
    if (memcmp(out.data(), data.data(), size)) { printf("MISMATCH x%u\n", n); return 1; }

    // kernel-only: pre-build table once, time decode_span directly on the
    // wire bytes (padded=false) vs forced tail-copy (padded path on a
    // manual padded buffer)
    const uint64_t off = 16 + 512 + 4ull * n;
    uint16_t freq[256];
    memcpy(freq, blob.data() + 16, 512);
    DecTable t;
    build_dec_table(freq, bits, &t);
    const uint16_t *stream = (const uint16_t *)(blob.data() + off);
    const uint64_t nwords = (esz - off) / 2;
    std::vector<uint16_t> words(nwords + 2 * n + 8, 0);
    memcpy(words.data(), stream, nwords * 2);
    const uint64_t full = size + 1 > n ? (size - n + 1 + n - 1) / n : 0;
    Coder co0;
    init_coder(&co0, n);
    memcpy(co0.states, blob.data() + 16 + 512, 4ull * n);

    const double tdirect = best_of(9, [&] {
      Coder co = co0;
      decode_span(&co, &t, stream, nwords, 0, out.data(), 0, full, full * n, size, false);
    });
    const double tpadded = best_of(9, [&] {
      Coder co = co0;
      decode_span(&co, &t, words.data(), nwords, 0, out.data(), 0, full, full * n, size, true);
    });
    printf("x%u: e2e %7.1f | span direct %7.1f prepadded %7.1f MiB/s\n",
           n, mb / td, mb / tdirect, mb / tpadded);
  }
  return 0;
}
