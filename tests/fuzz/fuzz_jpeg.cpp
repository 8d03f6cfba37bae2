// Deterministic mutational fuzzer for the native JPEG entropy coders,
// built with ASan+UBSan (`make fuzz`). g++ has no libFuzzer driver, so this
// is a self-contained harness: for each corpus file it replays the exact
// call discipline the Python bindings use (info → size buffers → decode in
// all three output forms → re-encode round-trip), then loops seeded random
// mutations (bit flips, byte stomps, truncations, extensions) until the
// time budget expires. Any sanitizer report aborts with a nonzero exit.
//
// Usage: fuzz_jpeg <corpus_dir> <seconds>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" {
int rcv_jpeg_info(const uint8_t*, long, int*, int*, int*, int*, int*, int*,
                  int*);
int rcv_jpeg_coeffs(const uint8_t*, long, int16_t*, int16_t*, int16_t*,
                    uint16_t*, uint16_t*, uint16_t*);
int rcv_jpeg_coeffs_packed(const uint8_t*, long, int32_t*, int16_t*, long,
                           uint16_t*, uint16_t*, uint16_t*, long*);
int rcv_jpeg_coeffs_blockpacked(const uint8_t*, long, uint8_t*, int16_t*, int,
                                int32_t*, int16_t*, long, uint16_t*,
                                uint16_t*, uint16_t*, long*);
long rcv_jpeg_entropy_encode(const int16_t*, const int16_t*, const int16_t*,
                             int, const int*, const int*, const int*,
                             const int*, int, int, const uint16_t*,
                             const uint16_t*, uint8_t*, long);
long rcv_jpeg_entropy_encode_packed(const uint8_t*, const int16_t*, int,
                                    const int32_t*, const int16_t*, int,
                                    int, const int*, const int*, const int*,
                                    const int*, int, int, const uint16_t*,
                                    const uint16_t*, uint8_t*, long);
}

namespace {

uint64_t g_rng = 0x243F6A8885A308D3ull;  // fixed seed: runs are reproducible

uint64_t rng() {
  g_rng ^= g_rng << 13;
  g_rng ^= g_rng >> 7;
  g_rng ^= g_rng << 17;
  return g_rng;
}

// Geometry bound: mutated headers can promise absurd dimensions; the REAL
// bindings allocate from the parsed info the same way, so the bound only
// keeps the fuzzer's memory sane, not the target honest.
constexpr long kMaxBlocks = 1 << 20;

void run_one(const uint8_t* data, long len) {
  int w, h, ncomp, hs[3], vs[3], bw[3], bh[3];
  if (rcv_jpeg_info(data, len, &w, &h, &ncomp, hs, vs, bw, bh) != 0) return;
  long total = 0;
  for (int c = 0; c < ncomp; ++c) {
    long nb = (long)bw[c] * bh[c];
    if (nb < 0 || nb > kMaxBlocks) return;
    total += nb;
  }
  if (total <= 0 || total > kMaxBlocks) return;

  std::vector<int16_t> dense(total * 64);
  uint16_t q0[64], q1[64], q2[64];
  int16_t* outs[3] = {nullptr, nullptr, nullptr};
  long off = 0;
  for (int c = 0; c < ncomp; ++c) {
    outs[c] = dense.data() + off;
    off += (long)bw[c] * bh[c] * 64;
  }
  int rc = rcv_jpeg_coeffs(data, len, outs[0], outs[1], outs[2], q0, q1, q2);

  std::vector<int32_t> pos(total * 8);
  std::vector<int16_t> val(total * 8);
  long nnz = 0;
  rcv_jpeg_coeffs_packed(data, len, pos.data(), val.data(), (long)pos.size(),
                         q0, q1, q2, &nnz);

  const int k = 10;
  long dcap = total / 4 + 16;
  std::vector<uint8_t> bidx(total * k);
  std::vector<int16_t> bval(total * k);
  std::vector<int32_t> dids(dcap);
  std::vector<int16_t> drows(dcap * 64);
  long dn = 0;
  int rc_bp = rcv_jpeg_coeffs_blockpacked(
      data, len, bidx.data(), bval.data(), k, dids.data(), drows.data(), dcap,
      q0, q1, q2, &dn);

  if (rc == 0 && (ncomp == 1 || ncomp == 3)) {
    // Round-trip the dense grids through both encoders.
    std::vector<uint8_t> out(4096 + total * 64 * 8);
    rcv_jpeg_entropy_encode(outs[0], outs[1], outs[2], ncomp, bw, bh, hs, vs,
                            w, h, q0, q1, out.data(), (long)out.size());
    if (rc_bp == 0 && dn <= dcap) {
      for (long i = dn; i < dcap; ++i) dids[i] = (int32_t)total;
      rcv_jpeg_entropy_encode_packed(bidx.data(), bval.data(), k, dids.data(),
                                     drows.data(), (int)dcap, ncomp, bw, bh,
                                     hs, vs, w, h, q0, q1, out.data(),
                                     (long)out.size());
    }
  }
}

void mutate(std::vector<uint8_t>& buf) {
  if (buf.empty()) return;
  int n = 1 + (int)(rng() % 8);
  for (int i = 0; i < n; ++i) {
    switch (rng() % 10) {
      case 0:  // truncate
        buf.resize(1 + rng() % buf.size());
        break;
      case 1: {  // extend with junk
        size_t add = 1 + rng() % 64;
        for (size_t j = 0; j < add; ++j) buf.push_back((uint8_t)rng());
        break;
      }
      case 2:  // stomp a marker-looking pair
        if (buf.size() >= 2) {
          size_t p = rng() % (buf.size() - 1);
          buf[p] = 0xFF;
          buf[p + 1] = (uint8_t)(0xC0 + rng() % 0x40);
        }
        break;
      default: {  // byte stomp / bit flip
        size_t p = rng() % buf.size();
        if (rng() & 1)
          buf[p] = (uint8_t)rng();
        else
          buf[p] ^= (uint8_t)(1u << (rng() % 8));
      }
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <corpus_dir> <seconds>\n", argv[0]);
    return 2;
  }
  std::vector<std::vector<uint8_t>> corpus;
  DIR* d = opendir(argv[1]);
  if (!d) {
    std::fprintf(stderr, "cannot open corpus dir %s\n", argv[1]);
    return 2;
  }
  while (dirent* e = readdir(d)) {
    if (e->d_name[0] == '.') continue;
    std::string path = std::string(argv[1]) + "/" + e->d_name;
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) continue;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(sz > 0 ? sz : 0);
    if (sz > 0 && std::fread(buf.data(), 1, sz, f) != (size_t)sz) buf.clear();
    std::fclose(f);
    if (!buf.empty()) corpus.push_back(std::move(buf));
  }
  closedir(d);
  if (corpus.empty()) {
    std::fprintf(stderr, "empty corpus\n");
    return 2;
  }

  // Pass 1: every corpus file unmutated (regression check).
  for (const auto& c : corpus) run_one(c.data(), (long)c.size());

  // Pass 2: seeded mutations until the budget expires.
  double budget = std::atof(argv[2]);
  std::clock_t t0 = std::clock();
  long iters = 0;
  while ((double)(std::clock() - t0) / CLOCKS_PER_SEC < budget) {
    std::vector<uint8_t> buf = corpus[rng() % corpus.size()];
    mutate(buf);
    run_one(buf.data(), (long)buf.size());
    ++iters;
  }
  std::printf("fuzz_jpeg: %ld corpus files, %ld mutated runs, clean\n",
              (long)corpus.size(), iters);
  return 0;
}
