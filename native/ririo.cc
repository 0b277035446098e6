// ririo — native RIR corpus ingest: wav decode + resample + batch loader.
//
// The reference loads every wav through librosa on one Python thread
// (/root/reference/preprocess.py:51-57 inside the dataset.py:123-182 walk)
// — the one-time corpus build is host-bound there. This library decodes a
// whole corpus in parallel C++ threads straight into a caller-provided
// float32 batch buffer shaped (n_files, n_samples), ready for a single
// host->HBM transfer and the on-device featurize kernel.
//
// Contract per file (matching data/wav_io.read_wav):
//   * RIFF/WAVE with PCM 8/16/24/32-bit int or 32/64-bit float samples
//   * channels mixed to mono (mean)
//   * linear resample to target_rate when the file rate differs
//   * trimmed / zero-padded to exactly n_samples
//   * DC (mean) removed
//
// C ABI (see data/native_loader.py for the ctypes binding). Errors are
// fixed negative codes (-1 open/-2 header/parse or short write,
// -3 decode), NOT errno values:
//   rir_read_wav(path, out, n_samples, target_rate)          -> 0 | -k
//   rir_read_wav_batch(paths, n, out, n_samples, rate, thr)  -> #failures
//   rir_write_wav(path, data, n_samples, rate)               -> 0 | -k
//   rir_write_wav_batch(paths, n, data, n_samples, rate, thr)-> #failures
//   rir_version()                                            -> int
//
// Writes emit mono IEEE-float32 WAVs byte-identical to
// scipy.io.wavfile.write with a float32 array (the reference's writer,
// postprocess.py:149): RIFF/WAVE, 18-byte fmt chunk (format 3, cbSize=0),
// "fact" chunk (frame count), then data — pinned by a byte-identity test.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libririo.so ririo.cc -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kVersion = 1;

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  // Walk chunks until both fmt and data are found.
  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) return false;
      memcpy(&info->format, buf + 0, 2);
      memcpy(&info->channels, buf + 2, 2);
      memcpy(&info->sample_rate, buf + 4, 4);
      memcpy(&info->bits, buf + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return have_fmt && info->channels > 0 && info->sample_rate > 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  return false;
}

// Decode interleaved samples to mono float32 in [-1, 1].
bool decode_mono(FILE* f, const WavInfo& info, std::vector<float>* mono) {
  const int bytes_per = info.bits / 8;
  if (bytes_per < 1 || bytes_per > 8) return false;
  const uint64_t frame_bytes = uint64_t(bytes_per) * info.channels;
  const uint64_t n_frames = frame_bytes ? info.data_bytes / frame_bytes : 0;
  mono->resize(n_frames);

  std::vector<uint8_t> raw(info.data_bytes);
  fseek(f, info.data_offset, SEEK_SET);
  if (fread(raw.data(), 1, info.data_bytes, f) != info.data_bytes) return false;

  const float inv_channels = 1.0f / float(info.channels);
  for (uint64_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    const uint8_t* p = raw.data() + i * frame_bytes;
    for (int c = 0; c < info.channels; ++c, p += bytes_per) {
      float v = 0.0f;
      if (info.format == 3 && info.bits == 32) {
        float tmp;
        memcpy(&tmp, p, 4);
        v = tmp;
      } else if (info.format == 3 && info.bits == 64) {
        double tmp;
        memcpy(&tmp, p, 8);
        v = float(tmp);
      } else if (info.bits == 16) {
        int16_t tmp;
        memcpy(&tmp, p, 2);
        v = float(tmp) / 32768.0f;
      } else if (info.bits == 32) {
        int32_t tmp;
        memcpy(&tmp, p, 4);
        v = float(double(tmp) / 2147483648.0);
      } else if (info.bits == 24) {
        int32_t tmp = (int32_t(p[0]) << 8) | (int32_t(p[1]) << 16) |
                      (int32_t(p[2]) << 24);
        v = float(double(tmp >> 8) / 8388608.0);
      } else if (info.bits == 8) {
        v = (float(p[0]) - 128.0f) / 128.0f;
      } else {
        return false;
      }
      acc += v;
    }
    (*mono)[i] = acc * inv_channels;
  }
  return true;
}

}  // namespace

extern "C" {

int rir_version() { return kVersion; }

// Decode one wav into out[0..n_samples) at target_rate; returns 0 on success.
int rir_read_wav(const char* path, float* out, int n_samples, int target_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  std::vector<float> mono;
  if (!decode_mono(f, info, &mono)) {
    fclose(f);
    return -3;
  }
  fclose(f);

  // Resample (linear) when rates differ.
  std::vector<float> res;
  const float* src = mono.data();
  size_t src_len = mono.size();
  if (int(info.sample_rate) != target_rate && src_len > 1) {
    const double ratio = double(info.sample_rate) / double(target_rate);
    const size_t out_len =
        size_t(double(src_len) * double(target_rate) / double(info.sample_rate));
    res.resize(out_len);
    for (size_t i = 0; i < out_len; ++i) {
      const double t = double(i) * ratio;
      const size_t i0 = size_t(t);
      const size_t i1 = i0 + 1 < src_len ? i0 + 1 : src_len - 1;
      const float frac = float(t - double(i0));
      res[i] = mono[i0] * (1.0f - frac) + mono[i1] * frac;
    }
    src = res.data();
    src_len = res.size();
  }

  // Trim / zero-pad to n_samples, then remove DC.
  const size_t copy = src_len < size_t(n_samples) ? src_len : size_t(n_samples);
  memcpy(out, src, copy * sizeof(float));
  if (copy < size_t(n_samples)) {
    memset(out + copy, 0, (n_samples - copy) * sizeof(float));
  }
  double mean = 0.0;
  for (int i = 0; i < n_samples; ++i) mean += out[i];
  const float m = float(mean / n_samples);
  for (int i = 0; i < n_samples; ++i) out[i] -= m;
  return 0;
}

// Decode n files in parallel into out (n, n_samples); returns failure count.
// Failed rows are zero-filled.
int rir_read_wav_batch(const char** paths, int n, float* out, int n_samples,
                       int target_rate, int n_threads) {
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      float* row = out + size_t(i) * n_samples;
      if (rir_read_wav(paths[i], row, n_samples, target_rate) != 0) {
        memset(row, 0, size_t(n_samples) * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  const int k = n < n_threads ? (n > 0 ? n : 1) : n_threads;
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Write one mono float32 wav; returns 0 on success.
int rir_write_wav(const char* path, const float* data, int n_samples,
                  int rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  // IEEE-float layout exactly as scipy.io.wavfile.write emits it: 18-byte
  // fmt chunk (cbSize=0) + "fact" chunk (frame count) + data chunk.
  const uint32_t dsize = uint32_t(n_samples) * 4u;
  const uint32_t riff_size = 4u + (8u + 18u) + (8u + 4u) + (8u + dsize);
  const uint16_t fmt3 = 3, mono = 1, block = 4, bits = 32, cb = 0;
  const uint32_t byte_rate = uint32_t(rate) * 4u;
  const uint32_t fmt_size = 18, fact_size = 4;
  const uint32_t n_frames = uint32_t(n_samples);
  bool ok = fwrite("RIFF", 1, 4, f) == 4 && fwrite(&riff_size, 4, 1, f) == 1 &&
            fwrite("WAVE", 1, 4, f) == 4 && fwrite("fmt ", 1, 4, f) == 4 &&
            fwrite(&fmt_size, 4, 1, f) == 1 && fwrite(&fmt3, 2, 1, f) == 1 &&
            fwrite(&mono, 2, 1, f) == 1 && fwrite(&rate, 4, 1, f) == 1 &&
            fwrite(&byte_rate, 4, 1, f) == 1 && fwrite(&block, 2, 1, f) == 1 &&
            fwrite(&bits, 2, 1, f) == 1 && fwrite(&cb, 2, 1, f) == 1 &&
            fwrite("fact", 1, 4, f) == 4 && fwrite(&fact_size, 4, 1, f) == 1 &&
            fwrite(&n_frames, 4, 1, f) == 1 && fwrite("data", 1, 4, f) == 4 &&
            fwrite(&dsize, 4, 1, f) == 1 &&
            fwrite(data, 4, size_t(n_samples), f) == size_t(n_samples);
  return fclose(f) == 0 && ok ? 0 : -2;
}

// Write n wavs in parallel from data (n, n_samples); returns failure count.
int rir_write_wav_batch(const char** paths, int n, const float* data,
                        int n_samples, int rate, int n_threads) {
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const float* row = data + size_t(i) * n_samples;
      if (rir_write_wav(paths[i], row, n_samples, rate) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  const int k = n < n_threads ? (n > 0 ? n : 1) : n_threads;
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
