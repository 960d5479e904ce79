// Native audio IO fast path: WAV decode + mono mixdown + polyphase resample.
//
// The reference loads and resamples every file through librosa on the Python
// side, one file at a time (`Voice digit recogniton/
// extract_features_construct_dataset.py:27`, SURVEY.md §3.1 HOT LOOP #1).
// Here the per-file work is plain C++ called via ctypes; the Python wrapper
// (asr_using_robust_nn_tpu/utils/native.py) fans files out over a thread pool
// (these calls release the GIL), feeding device batches to the fused TPU
// frontend kernels.
//
// Filter design stays in Python (utils/audio_io.design_resample_filter) and
// is passed in, so the numpy and native paths produce identical output.
//
// Build: make -C native   (produces ../asr_using_robust_nn_tpu/utils/_libasrnative.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavData {
  std::vector<float> mono;  // mixed down, [-1, 1] (empty on header-only)
  size_t n_frames = 0;      // mono frame count, valid on every parse
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

// Returns 0 on success; fills `out`. decode_samples=false parses headers
// only (asr_wav_info path — no per-sample work, no second full decode).
int parse_wav(const uint8_t* data, size_t len, WavData* out,
              bool decode_samples = true) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  size_t pos = 12;
  int audio_format = 0, n_channels = 0, bits = 0, sample_rate = 0;
  const uint8_t* raw = nullptr;
  size_t raw_len = 0;
  while (pos + 8 <= len) {
    const uint8_t* cid = data + pos;
    uint32_t csz = rd_u32(data + pos + 4);
    if (pos + 8 + csz > len) csz = (uint32_t)(len - pos - 8);
    const uint8_t* body = data + pos + 8;
    if (memcmp(cid, "fmt ", 4) == 0 && csz >= 16) {
      audio_format = rd_u16(body);
      n_channels = rd_u16(body + 2);
      sample_rate = (int)rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (audio_format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: real code = first 2 bytes of SubFormat
        audio_format = (csz >= 26) ? rd_u16(body + 24) : 1;
      }
    } else if (memcmp(cid, "data", 4) == 0) {
      raw = body;
      raw_len = csz;
    }
    pos += 8 + csz + (csz & 1);
  }
  if (!raw || n_channels <= 0 || sample_rate <= 0) return -2;

  size_t bytes_per = (size_t)bits / 8;
  if (bytes_per == 0) return -3;
  size_t n_frames = raw_len / (bytes_per * n_channels);
  out->sample_rate = sample_rate;
  out->n_frames = n_frames;
  if (!decode_samples) {
    return 0;  // header-only: no O(n) allocation just to carry a count
  }
  out->mono.assign(n_frames, 0.0f);
  const float inv_ch = 1.0f / (float)n_channels;

  for (size_t i = 0; i < n_frames; i++) {
    float acc = 0.0f;
    for (int c = 0; c < n_channels; c++) {
      const uint8_t* p = raw + (i * n_channels + c) * bytes_per;
      float v;
      if (audio_format == 1) {
        switch (bits) {
          case 8:
            v = ((int)p[0] - 128) * (1.0f / 128.0f);
            break;
          case 16:
            v = (float)(int16_t)rd_u16(p) * (1.0f / 32768.0f);
            break;
          case 24: {
            int32_t s = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
            if (s & 0x800000) s -= 0x1000000;
            v = (float)s * (1.0f / 8388608.0f);
            break;
          }
          case 32:
            v = (float)(int32_t)rd_u32(p) * (1.0f / 2147483648.0f);
            break;
          default:
            return -4;
        }
      } else if (audio_format == 3 && bits == 32) {
        float f;
        memcpy(&f, p, 4);
        v = f;
      } else if (audio_format == 3 && bits == 64) {
        double d;
        memcpy(&d, p, 8);
        v = (float)d;
      } else {
        return -5;
      }
      acc += v;
    }
    out->mono[i] = acc * inv_ch;
  }
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 0) {
    fclose(f);
    return -1;
  }
  buf->resize((size_t)sz);
  size_t got = fread(buf->data(), 1, (size_t)sz, f);
  fclose(f);
  return got == (size_t)sz ? 0 : -1;
}

}  // namespace

extern "C" {

// Fill (sample_rate, n_samples_mono). Returns 0 on success.
int asr_wav_info(const char* path, int* sample_rate, int64_t* n_samples) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -1;
  WavData w;
  int rc = parse_wav(buf.data(), buf.size(), &w, /*decode_samples=*/false);
  if (rc != 0) return rc;
  *sample_rate = w.sample_rate;
  *n_samples = (int64_t)w.n_frames;
  return 0;
}

// Decode + mixdown into caller buffer of capacity `cap`. Returns n written
// (truncated to cap) or <0 on error; sets *sample_rate.
int64_t asr_wav_decode(const char* path, float* out, int64_t cap, int* sample_rate) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -1;
  WavData w;
  int rc = parse_wav(buf.data(), buf.size(), &w);
  if (rc != 0) return rc;
  int64_t n = (int64_t)w.mono.size();
  if (n > cap) n = cap;
  memcpy(out, w.mono.data(), (size_t)n * sizeof(float));
  *sample_rate = w.sample_rate;
  return n;
}

// Polyphase resample y = (conv(zero_stuff(x, up), taps) >> (n_taps-1)/2)[::down],
// exactly matching utils/audio_io.resample. Returns n_out.
int64_t asr_resample_poly(const float* x, int64_t n, int up, int down,
                          const double* taps, int64_t n_taps, float* out,
                          int64_t out_cap) {
  if (n <= 0 || up <= 0 || down <= 0) return -1;
  const int64_t half = (n_taps - 1) / 2;
  int64_t n_out = (n * up + down - 1) / down;  // ceil
  if (n_out > out_cap) n_out = out_cap;
  for (int64_t m = 0; m < n_out; m++) {
    const int64_t base = m * (int64_t)down + half;
    int64_t u_min = (base - (n_taps - 1) + up - 1) / up;  // ceil
    if (u_min < 0) u_min = 0;
    int64_t u_max = base / up;
    if (u_max > n - 1) u_max = n - 1;
    double acc = 0.0;
    for (int64_t u = u_min; u <= u_max; u++) {
      acc += (double)x[u] * taps[base - u * (int64_t)up];
    }
    out[m] = (float)acc;
  }
  return n_out;
}

}  // extern "C"
