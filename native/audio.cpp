// Native audio loader: WAV decode + windowed-sinc resampling.
//
// Host-side data-path replacement for the reference's torchaudio loader
// (reference: utils/audio.py:59-74, vocoders/vocos/dataset.py:40-48), used by
// the training dataloaders so audio IO never bottlenecks the device.
//
// Formats: RIFF/WAVE with PCM16, PCM24, PCM32 or IEEE float32, any channel
// count (channel 0 is taken, matching the reference's mono conversion).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

bool parse_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::fread(&riff_size, 4, 1, f) != 1 || std::fread(wave, 1, 4, f) != 4 ||
      std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool got_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t n = size < sizeof(buf) ? size : sizeof(buf);
      if (std::fread(buf, 1, n, f) != n) break;
      if (size > n) std::fseek(f, size - n, SEEK_CUR);
      format = buf[0] | (buf[1] << 8);
      channels = buf[2] | (buf[3] << 8);
      std::memcpy(&sample_rate, buf + 4, 4);
      bits = buf[14] | (buf[15] << 8);
      if (format == 0xFFFE && size >= 40) std::memcpy(&format, buf + 24, 2);
      got_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0 && got_fmt) {
      // validate the fmt fields before any arithmetic: a malformed header
      // with channels==0 or bits<8 would otherwise divide by zero (SIGFPE
      // kills the process, bypassing the Python-side failure fallback)
      if (channels == 0 || (bits != 8 && bits != 16 && bits != 24 && bits != 32)) {
        std::fclose(f);
        return false;
      }
      // clamp a corrupt chunk size to the bytes actually left in the file so
      // `raw(size)` can't throw bad_alloc through the extern-C boundary
      const long data_pos = std::ftell(f);
      std::fseek(f, 0, SEEK_END);
      const long file_end = std::ftell(f);
      std::fseek(f, data_pos, SEEK_SET);
      if (data_pos < 0 || file_end < data_pos) {
        std::fclose(f);
        return false;
      }
      const uint64_t avail = static_cast<uint64_t>(file_end - data_pos);
      const uint64_t data_size = size < avail ? size : avail;
      const uint32_t bytes_per = bits / 8;
      const uint64_t n_frames = data_size / (bytes_per * channels);
      std::vector<uint8_t> raw(n_frames * bytes_per * channels);
      if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) break;
      out->samples.resize(n_frames);
      out->sample_rate = static_cast<int>(sample_rate);
      const uint8_t* p = raw.data();
      for (uint64_t i = 0; i < n_frames; ++i, p += bytes_per * channels) {
        float v = 0.0f;
        if (format == 1 && bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.0f;
        } else if (format == 1 && bits == 24) {
          // assemble in unsigned then convert: `p[2] << 24` on a promoted int
          // is signed-overflow UB whenever the sample is negative
          const uint32_t u = (static_cast<uint32_t>(p[0]) << 8) |
                             (static_cast<uint32_t>(p[1]) << 16) |
                             (static_cast<uint32_t>(p[2]) << 24);
          const int32_t s = static_cast<int32_t>(u);
          v = (s >> 8) / 8388608.0f;
        } else if (format == 1 && bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = s / 2147483648.0f;
        } else if (format == 3 && bits == 32) {
          std::memcpy(&v, p, 4);
        } else {
          std::fclose(f);
          return false;
        }
        out->samples[i] = v;
      }
      std::fclose(f);
      return true;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return false;
}

// Windowed-sinc resampler (Hann window, half-width 16 output-rate zero
// crossings) — comparable quality to torchaudio's kaiser resampler.
void resample_sinc(const std::vector<float>& in, int sr_in, int sr_out,
                   std::vector<float>* out) {
  if (sr_in == sr_out) {
    *out = in;
    return;
  }
  const double ratio = static_cast<double>(sr_out) / sr_in;
  const double cutoff = ratio < 1.0 ? ratio : 1.0;  // anti-alias for downsample
  const int kZeros = 16;
  const double half_width = kZeros / cutoff;  // in input samples
  const int64_t n_out = static_cast<int64_t>(in.size() * ratio);
  out->assign(n_out, 0.0f);
  const int64_t n_in = static_cast<int64_t>(in.size());
  for (int64_t j = 0; j < n_out; ++j) {
    const double t = j / ratio;  // position in input samples
    const int64_t lo = static_cast<int64_t>(std::ceil(t - half_width));
    const int64_t hi = static_cast<int64_t>(std::floor(t + half_width));
    double acc = 0.0;
    for (int64_t i = std::max<int64_t>(lo, 0); i <= std::min(hi, n_in - 1); ++i) {
      const double d = (i - t) * cutoff;
      double w;
      if (d == 0.0) {
        w = 1.0;
      } else {
        const double pd = M_PI * d;
        w = std::sin(pd) / pd;
      }
      const double win = 0.5 + 0.5 * std::cos(M_PI * (i - t) / half_width);
      acc += in[i] * w * win;
    }
    (*out)[j] = static_cast<float>(acc * cutoff);
  }
}

}  // namespace

extern "C" {

// Load + mono + resample. Returns the number of samples written (<= max_len),
// 0 on failure. `out_sr` receives the source sample rate.
int64_t stabletts_load_wav(const char* path, int target_sr, float* out,
                           int64_t max_len, int* out_sr) {
  WavData wav;
  if (!parse_wav(path, &wav)) return 0;
  if (out_sr) *out_sr = wav.sample_rate;
  std::vector<float> res;
  if (wav.sample_rate != target_sr) {
    resample_sinc(wav.samples, wav.sample_rate, target_sr, &res);
  } else {
    res = std::move(wav.samples);
  }
  const int64_t n = std::min<int64_t>(res.size(), max_len);
  std::memcpy(out, res.data(), n * sizeof(float));
  return n;
}

// Query length after resample without copying (for two-phase loading).
int64_t stabletts_wav_length(const char* path, int target_sr) {
  WavData wav;
  if (!parse_wav(path, &wav)) return 0;
  if (wav.sample_rate == target_sr) return static_cast<int64_t>(wav.samples.size());
  return static_cast<int64_t>(wav.samples.size() *
                              (static_cast<double>(target_sr) / wav.sample_rate));
}

// Random-crop segment loader for the vocoder dataloader: loads, resamples,
// zero-pads to segment_len if short, and crops at start_frac in [0, 1).
int stabletts_load_segment(const char* path, int target_sr, int64_t segment_len,
                           double start_frac, float* out) {
  WavData wav;
  if (!parse_wav(path, &wav)) return 0;
  std::vector<float> res;
  if (wav.sample_rate != target_sr) {
    resample_sinc(wav.samples, wav.sample_rate, target_sr, &res);
  } else {
    res = std::move(wav.samples);
  }
  if (static_cast<int64_t>(res.size()) < segment_len) {
    res.resize(segment_len, 0.0f);
  }
  const int64_t max_start = static_cast<int64_t>(res.size()) - segment_len;
  const int64_t start = static_cast<int64_t>(start_frac * (max_start + 1));
  std::memcpy(out, res.data() + std::min(start, max_start), segment_len * sizeof(float));
  return 1;
}

}  // extern "C"
