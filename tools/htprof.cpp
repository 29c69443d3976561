// Standalone HT decode profiler: replays /tmp/t1p/{htblob,htmeta}.bin
// through tic_ht_decode_block_strided single-threaded. Build:
//   c++ -O3 -march=native -std=c++17 tools/htprof.cpp \
//       nvimagecodec_tpu/native/j2k_ht.cpp -o /tmp/htprof
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>

extern "C" int tic_ht_decode_block_strided(
    const uint8_t* cup, int32_t lcup, const uint8_t* ref, int32_t lref,
    int32_t num_passes, int32_t w, int32_t h, int32_t B, int32_t Ucap,
    int32_t* out, int64_t stride);

static std::vector<uint8_t> slurp(const char* p) {
  FILE* f = fopen(p, "rb");
  if (!f) { perror(p); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> v(n);
  if (fread(v.data(), 1, n, f) != (size_t)n) exit(1);
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  int reps = argc > 1 ? atoi(argv[1]) : 10;
  auto blob = slurp("/tmp/t1p/htblob.bin");
  auto metab = slurp("/tmp/t1p/htmeta.bin");
  const int32_t* meta = (const int32_t*)metab.data();
  int n = (int)(metab.size() / (10 * sizeof(int32_t)));
  printf("blocks=%d reps=%d\n", n, reps);
  std::vector<int32_t> out(64 * 1024);
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; r++)
    for (int i = 0; i < n; i++) {
      const int32_t* m = meta + 10 * i;
      std::memset(out.data(), 0, sizeof(int32_t) * m[5] * m[6]);
      const uint8_t* ref = m[3] ? blob.data() + m[2] : nullptr;
      int rc = tic_ht_decode_block_strided(blob.data() + m[0], m[1], ref,
                                           m[3], m[4], m[5], m[6], m[7],
                                           m[8], out.data(), m[5]);
      if (rc) { printf("rc=%d block %d\n", rc, i); return 1; }
    }
  double dt = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  printf("per image: %.1f ms\n", 1e3 * dt / reps);
#ifdef HT_SECTION_PROF
  extern unsigned long long g_ht_sec[4];
  double ghz = 2.1e9;
  printf("sections ms/img: vlc %.1f  uvlc %.1f  magsgn %.1f\n",
         1e3 * g_ht_sec[0] / ghz / reps, 1e3 * g_ht_sec[1] / ghz / reps,
         1e3 * g_ht_sec[2] / ghz / reps);
#endif
  return 0;
}
