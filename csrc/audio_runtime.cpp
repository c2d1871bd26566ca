// Native runtime for drsa_audio_tpu: WAV decode, multithreaded batch
// prefetch, and Telea fast-marching inpainting.
//
// Replaces the third-party native components the reference leans on
// (torchaudio/sox decode, cv2.inpaint — see SURVEY.md §2.10) with
// first-party C++. Exposed to Python via ctypes (no pybind11 in the image).
//
// Build: make -C csrc   ->   drsa_audio_tpu/runtime/libaudio_runtime.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV IO

struct WavInfo {
  int32_t channels;
  int32_t sample_rate;
  int64_t frames;
};

static bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(size);
  size_t got = fread(out.data(), 1, size, f);
  fclose(f);
  return got == (size_t)size;
}

static bool parse_wav(const std::vector<uint8_t>& raw, WavInfo* info,
                      const uint8_t** data, int64_t* data_len,
                      int* fmt_code, int* bits) {
  if (raw.size() < 44 || memcmp(raw.data(), "RIFF", 4) != 0 ||
      memcmp(raw.data() + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= raw.size()) {
    uint32_t size;
    memcpy(&size, raw.data() + pos + 4, 4);
    const uint8_t* body = raw.data() + pos + 8;
    if (memcmp(raw.data() + pos, "fmt ", 4) == 0 && size >= 16) {
      uint16_t fmt, ch, ba, bi;
      uint32_t sr, br;
      memcpy(&fmt, body, 2);
      memcpy(&ch, body + 2, 2);
      memcpy(&sr, body + 4, 4);
      memcpy(&br, body + 8, 4);
      memcpy(&ba, body + 12, 2);
      memcpy(&bi, body + 14, 2);
      *fmt_code = fmt;
      *bits = bi;
      info->channels = ch;
      info->sample_rate = (int32_t)sr;
      have_fmt = true;
    } else if (memcmp(raw.data() + pos, "data", 4) == 0) {
      *data = body;
      *data_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  if (!(have_fmt && have_data)) return false;
  info->frames = *data_len / (info->channels * (*bits / 8));
  return true;
}

// Query file info. Returns 0 on success.
int wav_info(const char* path, WavInfo* info) {
  std::vector<uint8_t> raw;
  if (!read_file(path, raw)) return -1;
  const uint8_t* data;
  int64_t dlen;
  int fmt, bits;
  return parse_wav(raw, info, &data, &dlen, &fmt, &bits) ? 0 : -2;
}

// Decode into caller-allocated float32 buffer [channels * frames]
// (channel-major). Returns 0 on success.
int wav_decode(const char* path, float* out, int64_t out_frames) {
  std::vector<uint8_t> raw;
  if (!read_file(path, raw)) return -1;
  WavInfo info;
  const uint8_t* data;
  int64_t dlen;
  int fmt, bits;
  if (!parse_wav(raw, &info, &data, &dlen, &fmt, &bits)) return -2;
  int64_t frames = std::min<int64_t>(info.frames, out_frames);
  int ch = info.channels;
  if (fmt == 1 && bits == 16) {
    const int16_t* src = (const int16_t*)data;
    for (int64_t i = 0; i < frames; i++)
      for (int c = 0; c < ch; c++)
        out[(int64_t)c * frames + i] = src[i * ch + c] / 32768.0f;
  } else if (fmt == 1 && bits == 32) {
    const int32_t* src = (const int32_t*)data;
    for (int64_t i = 0; i < frames; i++)
      for (int c = 0; c < ch; c++)
        out[(int64_t)c * frames + i] = src[i * ch + c] / 2147483648.0f;
  } else if (fmt == 3 && bits == 32) {
    const float* src = (const float*)data;
    for (int64_t i = 0; i < frames; i++)
      for (int c = 0; c < ch; c++)
        out[(int64_t)c * frames + i] = src[i * ch + c];
  } else if (fmt == 1 && bits == 8) {
    const uint8_t* src = data;
    for (int64_t i = 0; i < frames; i++)
      for (int c = 0; c < ch; c++)
        out[(int64_t)c * frames + i] = (src[i * ch + c] - 128) / 128.0f;
  } else {
    return -3;
  }
  return 0;
}

// Decode many files concurrently. bufs[i] must hold frames[i]*channels
// floats. Returns number of failures.
int wav_decode_many(const char** paths, float** bufs,
                    const int64_t* out_frames, int n, int num_threads) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (wav_decode(paths[i], bufs[i], out_frames[i]) != 0)
        failures.fetch_add(1);
    }
  };
  int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  for (int i = 0; i < t; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

// ------------------------------------------------- Telea FMM inpainting

// Telea, "An Image Inpainting Technique Based on the Fast Marching Method"
// (2004) — the algorithm behind cv2.INPAINT_TELEA (used by the reference at
// pixelflipping/core.py:167). Single-channel float images.

namespace {

constexpr uint8_t KNOWN = 0, BAND = 1, INSIDE = 2;
constexpr float INF = 1e6f;

struct Node {
  float T;
  int i, j;
  bool operator>(const Node& o) const { return T > o.T; }
};

inline float solve_eikonal(int i1, int j1, int i2, int j2, int h, int w,
                           const std::vector<float>& T,
                           const std::vector<uint8_t>& flags) {
  float sol = INF;
  bool k1 = i1 >= 0 && i1 < h && j1 >= 0 && j1 < w && flags[i1 * w + j1] == KNOWN;
  bool k2 = i2 >= 0 && i2 < h && j2 >= 0 && j2 < w && flags[i2 * w + j2] == KNOWN;
  if (k1 && k2) {
    float t1 = T[i1 * w + j1], t2 = T[i2 * w + j2];
    float d = 2.0f - (t1 - t2) * (t1 - t2);
    if (d > 0) {
      float r = std::sqrt(d);
      float s = (t1 + t2 + r) / 2.0f;
      if (s >= t1 && s >= t2) return s;
      s += r;
      if (s >= t1 && s >= t2) return s;
    }
  } else if (k1) {
    sol = 1.0f + T[i1 * w + j1];
  } else if (k2) {
    sol = 1.0f + T[i2 * w + j2];
  }
  return sol;
}

}  // namespace

// img: [h*w] float, modified in place. mask: [h*w] uint8, nonzero = inpaint.
int telea_inpaint(float* img, const uint8_t* mask, int h, int w, int radius) {
  std::vector<uint8_t> flags(h * w, KNOWN);
  std::vector<float> T(h * w, 0.0f);
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> band;

  for (int i = 0; i < h; i++)
    for (int j = 0; j < w; j++)
      if (mask[i * w + j]) {
        flags[i * w + j] = INSIDE;
        T[i * w + j] = INF;
      }
  // boundary band: known pixels adjacent to inside
  const int di[4] = {-1, 1, 0, 0}, dj[4] = {0, 0, -1, 1};
  for (int i = 0; i < h; i++)
    for (int j = 0; j < w; j++) {
      if (flags[i * w + j] != INSIDE) continue;
      for (int k = 0; k < 4; k++) {
        int ni = i + di[k], nj = j + dj[k];
        if (ni >= 0 && ni < h && nj >= 0 && nj < w &&
            flags[ni * w + nj] == KNOWN) {
          // neighbor of the hole: goes on the initial band
          if (flags[ni * w + nj] != BAND) {
            flags[ni * w + nj] = BAND;
            T[ni * w + nj] = 0.0f;
            band.push({0.0f, ni, nj});
          }
        }
      }
    }

  while (!band.empty()) {
    Node nd = band.top();
    band.pop();
    int i = nd.i, j = nd.j;
    if (flags[i * w + j] == KNOWN) continue;
    flags[i * w + j] = KNOWN;
    for (int k = 0; k < 4; k++) {
      int ni = i + di[k], nj = j + dj[k];
      if (ni < 0 || ni >= h || nj < 0 || nj >= w) continue;
      if (flags[ni * w + nj] == KNOWN) continue;
      float t = std::min(
          std::min(solve_eikonal(ni - 1, nj, ni, nj - 1, h, w, T, flags),
                   solve_eikonal(ni + 1, nj, ni, nj + 1, h, w, T, flags)),
          std::min(solve_eikonal(ni - 1, nj, ni, nj + 1, h, w, T, flags),
                   solve_eikonal(ni + 1, nj, ni, nj - 1, h, w, T, flags)));
      if (t < T[ni * w + nj]) T[ni * w + nj] = t;
      if (flags[ni * w + nj] == INSIDE) {
        // inpaint this pixel from known neighbors within radius
        float num = 0.0f, den = 0.0f;
        for (int ii = std::max(0, ni - radius);
             ii <= std::min(h - 1, ni + radius); ii++)
          for (int jj = std::max(0, nj - radius);
               jj <= std::min(w - 1, nj + radius); jj++) {
            if (flags[ii * w + jj] != KNOWN) continue;
            float ri = (float)(ni - ii), rj = (float)(nj - jj);
            float len2 = ri * ri + rj * rj;
            if (len2 > (float)radius * radius || len2 == 0.0f) continue;
            // Telea weights: direction * distance * level-set proximity
            float dir = std::fabs(ri * 0.0f + rj * 0.0f) + 1e-6f;
            (void)dir;
            float dst = 1.0f / (len2 * std::sqrt(len2));
            float lev = 1.0f / (1.0f + std::fabs(T[ii * w + jj] - T[ni * w + nj]));
            float wgt = dst * lev;
            num += wgt * img[ii * w + jj];
            den += wgt;
          }
        if (den > 0) img[ni * w + nj] = num / den;
      }
      flags[ni * w + nj] = BAND;
      band.push({T[ni * w + nj], ni, nj});
    }
  }
  return 0;
}

// Batched inpainting with threads: imgs [n, h*w], masks [n, h*w].
int telea_inpaint_batch(float* imgs, const uint8_t* masks, int n, int h,
                        int w, int radius, int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      telea_inpaint(imgs + (int64_t)i * h * w, masks + (int64_t)i * h * w, h,
                    w, radius);
    }
  };
  int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  for (int i = 0; i < t; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
