// Standalone T1 decode profiler: replays a dumped block workload
// (/tmp/t1p/{blob,meta}.bin from the bench stream) through the native T1
// decoder single-threaded, with per-pass wall attribution. Build:
//   c++ -O3 -march=native -std=c++17 tools/t1prof.cpp -o /tmp/t1prof
#define T1_PROFILE 1
#include "../nvimagecodec_tpu/native/j2k_t1.cpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

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
  int reps = argc > 1 ? atoi(argv[1]) : 8;
  long fstride = argc > 2 ? atol(argv[2]) : 0;  // 0 = compact (stride=w)
  auto blob = slurp("/tmp/t1p/blob.bin");
  auto metab = slurp("/tmp/t1p/meta.bin");
  const int32_t* meta = (const int32_t*)metab.data();
  int n = (int)(metab.size() / (8 * sizeof(int32_t)));
  printf("blocks=%d reps=%d\n", n, reps);
  // output scratch sized to the largest block
  size_t maxwh = 0;
  long total_passes = 0;
  for (int i = 0; i < n; i++) {
    const int32_t* m = meta + 8 * i;
    size_t wh = (size_t)m[2] * m[3];
    if (wh > maxwh) maxwh = wh;
    total_passes += m[6];
  }
  printf("total passes=%ld avg seg=%.0fB\n", total_passes,
         blob.size() / (double)n);
  std::vector<int32_t> out(maxwh * 16);  // room for strided experiments
  double t_spp = 0, t_mrp = 0, t_cln = 0, t_other = 0;
  long long n_spp = 0, n_mrp = 0, n_cln = 0;
  auto now = [] { return std::chrono::steady_clock::now(); };
  auto t0 = now();
  for (int r = 0; r < reps; r++) {
    for (int i = 0; i < n; i++) {
      const int32_t* m = meta + 8 * i;
      int w = m[2], h = m[3], band = m[4], nbps = m[5], npasses = m[6];
      long stride = fstride > w ? fstride : w;
      std::fill(out.begin(), out.begin() + (size_t)stride * h, 0);
      static thread_local T1Decoder t;
      auto p0 = now();
      t.reset(w, h, band);
      t.mstride = stride;
      t.mag = out.data();
      t.mq.init(blob.data() + m[0], m[1]);
      t_other += std::chrono::duration<double>(now() - p0).count();
      int pass = 0;
      for (int bp = nbps - 1; bp >= 0 && pass < npasses; bp--) {
        if (bp == nbps - 1) {
          auto a = now();
          long long c0 = g_mq_count;
          t.cleanup_pass(bp);
          n_cln += g_mq_count - c0;
          t_cln += std::chrono::duration<double>(now() - a).count();
          pass++;
        } else {
          if (pass < npasses) {
            auto a = now();
            long long c0 = g_mq_count;
            t.sig_prop_pass(bp);
            n_spp += g_mq_count - c0;
            t_spp += std::chrono::duration<double>(now() - a).count();
            pass++;
          }
          if (pass < npasses) {
            auto a = now();
            long long c0 = g_mq_count;
            t.mag_ref_pass(bp);
            n_mrp += g_mq_count - c0;
            t_mrp += std::chrono::duration<double>(now() - a).count();
            pass++;
          }
          if (pass < npasses) {
            auto a = now();
            long long c0 = g_mq_count;
            t.cleanup_pass(bp);
            n_cln += g_mq_count - c0;
            t_cln += std::chrono::duration<double>(now() - a).count();
            pass++;
          }
        }
      }
    }
  }
  double total = std::chrono::duration<double>(now() - t0).count();
  printf("per image: total %.1f ms  spp %.1f  mrp %.1f  cln %.1f  "
         "setup %.1f ms\n",
         1e3 * total / reps, 1e3 * t_spp / reps, 1e3 * t_mrp / reps,
         1e3 * t_cln / reps, 1e3 * t_other / reps);
  printf("mq decisions/img: spp %lld (%.1f ns/dec)  mrp %lld (%.1f)  "
         "cln %lld (%.1f)\n",
         n_spp / reps, 1e9 * t_spp / n_spp, n_mrp / reps,
         1e9 * t_mrp / n_mrp, n_cln / reps, 1e9 * t_cln / n_cln);
  return 0;
}
