// ThreadSanitizer stress driver for the native runtime's thread pools
// (wav_decode_many, telea_inpaint_batch). Build + run via `make -C csrc
// stress`; exercised in CI-style by tests/test_runtime.py (subprocess).
//
// Several OUTER threads each drive a whole pool of INNER worker threads at
// once, over shared read-only inputs and disjoint outputs — the usage
// pattern of runtime/native.py under a multi-threaded caller.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int wav_decode_many(const char** paths, float** bufs, const int64_t* frames,
                    int n, int num_threads);
int telea_inpaint_batch(float* imgs, const uint8_t* masks, int n, int h,
                        int w, int radius, int num_threads);
}

static void write_wav(const std::string& path, const std::vector<int16_t>& pcm,
                      int sr) {
  FILE* f = fopen(path.c_str(), "wb");
  uint32_t data_bytes = (uint32_t)(pcm.size() * 2);
  uint32_t riff = 36 + data_bytes;
  uint16_t fmt = 1, ch = 1, bits = 16, block = 2;
  uint32_t byterate = (uint32_t)sr * block;
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f); fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  uint32_t fmtlen = 16;
  fwrite(&fmtlen, 4, 1, f); fwrite(&fmt, 2, 1, f); fwrite(&ch, 2, 1, f);
  fwrite(&sr, 4, 1, f); fwrite(&byterate, 4, 1, f); fwrite(&block, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
  fwrite(pcm.data(), 2, pcm.size(), f);
  fclose(f);
}

int main() {
  const int n_files = 8, frames = 4000, sr = 16000;
  const int h = 32, w = 32, n_imgs = 6;
  std::vector<std::string> paths;
  for (int i = 0; i < n_files; i++) {
    std::vector<int16_t> pcm(frames);
    for (int j = 0; j < frames; j++)
      pcm[j] = (int16_t)(((j * 2654435761u + i * 97) % 20000) - 10000);
    std::string p = "/tmp/tsan_stress_" + std::to_string(i) + ".wav";
    write_wav(p, pcm, sr);
    paths.push_back(p);
  }

  std::vector<float> base_img(n_imgs * h * w);
  std::vector<uint8_t> mask(n_imgs * h * w, 0);
  for (size_t i = 0; i < base_img.size(); i++)
    base_img[i] = (float)((i * 2654435761u % 1000) / 1000.0);
  for (int k = 0; k < n_imgs; k++)
    for (int i = 10; i < 20; i++)
      for (int j = 10; j < 20; j++) mask[(size_t)k * h * w + i * w + j] = 1;

  std::atomic<int> failures(0);
  auto decode_outer = [&]() {
    std::vector<const char*> cpaths;
    for (auto& p : paths) cpaths.push_back(p.c_str());
    std::vector<std::vector<float>> bufs(n_files,
                                         std::vector<float>(frames));
    std::vector<float*> bufp;
    std::vector<int64_t> fr(n_files, frames);
    for (auto& b : bufs) bufp.push_back(b.data());
    for (int rep = 0; rep < 6; rep++)
      failures += wav_decode_many(cpaths.data(), bufp.data(), fr.data(),
                                  n_files, 8);
  };
  auto inpaint_outer = [&]() {
    for (int rep = 0; rep < 6; rep++) {
      std::vector<float> imgs = base_img;  // private copy, shared mask
      failures += telea_inpaint_batch(imgs.data(), mask.data(), n_imgs, h, w,
                                      8, 8);
    }
  };

  std::vector<std::thread> outer;
  for (int i = 0; i < 3; i++) outer.emplace_back(decode_outer);
  for (int i = 0; i < 3; i++) outer.emplace_back(inpaint_outer);
  for (auto& t : outer) t.join();

  for (auto& p : paths) remove(p.c_str());
  if (failures.load() != 0) {
    fprintf(stderr, "FAIL: %d pool failures\n", failures.load());
    return 1;
  }
  printf("stress OK\n");
  return 0;
}
