// Native host-side mel-spectrogram frontend for bulk dataset ingest.
//
// The reference eagerly converts the ENTIRE corpus audio->mel at dataset
// init through librosa (reference src/data/dataset.py:168-196,
// src/utils/audio.py:45-98) — the #1 host-side hot loop. This module is
// the C++ replacement for that path: an exact re-implementation of the
// framework's NumPy pipeline (m2tts_tpu/frontend/audio.py:223-242):
//
//   centered STFT (reflect pad, periodic Hann, win zero-padded to n_fft)
//   -> power spectrum -> Slaney mel filterbank (librosa defaults)
//   -> power_to_db(ref=max, amin=1e-10, top_db=80)
//   -> per-utterance min-max normalization to [-1, 1].
//
// All math in double precision (matching the NumPy path), C ABI only —
// bound from Python via ctypes (m2tts_tpu/frontend/native.py). Calls
// release the GIL inside ctypes, so Python-side thread pools scale the
// batch path across cores without any C++ threading.
//
// Build: make native   (g++ -O3 -fPIC -shared; no -ffast-math — parity
// with the NumPy reference matters more than the last 10%).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Iterative radix-2 complex FFT (double). n must be a power of two.
// ---------------------------------------------------------------------------
struct FFTPlan {
  int n = 0;
  std::vector<int> rev;        // bit-reversal permutation
  std::vector<double> wr, wi;  // twiddles per stage, packed

  void init(int size) {
    n = size;
    rev.assign(n, 0);
    int log2n = 0;
    while ((1 << log2n) < n) ++log2n;
    for (int i = 0; i < n; ++i) {
      int r = 0;
      for (int b = 0; b < log2n; ++b)
        if (i & (1 << b)) r |= 1 << (log2n - 1 - b);
      rev[i] = r;
    }
    wr.clear();
    wi.clear();
    for (int len = 2; len <= n; len <<= 1) {
      for (int j = 0; j < len / 2; ++j) {
        double ang = -2.0 * kPi * j / len;
        wr.push_back(std::cos(ang));
        wi.push_back(std::sin(ang));
      }
    }
  }

  // in-place on interleaved re/im pairs
  void run(double* re, double* im) const {
    for (int i = 0; i < n; ++i) {
      int r = rev[i];
      if (i < r) {
        std::swap(re[i], re[r]);
        std::swap(im[i], im[r]);
      }
    }
    size_t tw = 0;
    for (int len = 2; len <= n; len <<= 1) {
      int half = len / 2;
      for (int start = 0; start < n; start += len) {
        for (int j = 0; j < half; ++j) {
          double cr = wr[tw + j], ci = wi[tw + j];
          int a = start + j, b = a + half;
          double tr = re[b] * cr - im[b] * ci;
          double ti = re[b] * ci + im[b] * cr;
          re[b] = re[a] - tr;
          im[b] = im[a] - ti;
          re[a] += tr;
          im[a] += ti;
        }
      }
      tw += half;
    }
  }
};

// Real-input FFT of size N via one complex FFT of size N/2 (the classic
// even/odd packing), ~2x the throughput of running the full complex FFT
// on a zero imaginary part. Emits the power spectrum |X[k]|^2 for
// k = 0..N/2 directly.
struct RFFTPlan {
  int n = 0;  // full (real) size
  FFTPlan half;
  std::vector<double> twr, twi;  // e^{-2*pi*i*k/N}, k = 0..N/4

  void init(int size) {
    n = size;
    half.init(n / 2);
    twr.assign(n / 4 + 1, 0.0);
    twi.assign(n / 4 + 1, 0.0);
    for (int k = 0; k <= n / 4; ++k) {
      double ang = -2.0 * kPi * k / n;
      twr[k] = std::cos(ang);
      twi[k] = std::sin(ang);
    }
  }

  // x: n real samples (destroyed); power: n/2+1 outputs
  void power_spectrum(double* x, double* scratch_im, double* power) const {
    int h = n / 2;
    // pack even/odd into re/im in place: re[j] = x[2j], im[j] = x[2j+1]
    double* re = x;
    double* im = scratch_im;
    for (int j = 0; j < h; ++j) {
      re[j] = x[2 * j];
      im[j] = x[2 * j + 1];
    }
    half.run(re, im);
    // unpack: X[k] = E[k] + W^k O[k], E/O from Z[k], conj(Z[h-k])
    // k = 0: X0 = Re0+Im0 (DC), X_{h} = Re0-Im0 (Nyquist of half? no —
    // X[n/2] = E[0] - O[0] with W^{n/2? handled below)
    power[0] = (re[0] + im[0]) * (re[0] + im[0]);
    power[h] = (re[0] - im[0]) * (re[0] - im[0]);
    for (int k = 1; k <= h / 2; ++k) {
      double ar = re[k], ai = im[k];
      double br = re[h - k], bi = im[h - k];
      // E = (Z[k] + conj(Z[h-k]))/2 ; O = (Z[k] - conj(Z[h-k]))/(2i)
      double er = 0.5 * (ar + br), ei = 0.5 * (ai - bi);
      double or_ = 0.5 * (ai + bi), oi = -0.5 * (ar - br);
      double cr = twr[k], ci = twi[k];
      double tr = or_ * cr - oi * ci;
      double ti = or_ * ci + oi * cr;
      double xr = er + tr, xi = ei + ti;
      power[k] = xr * xr + xi * xi;
      // X[h-k] = conj(E[k]) + W^{h-k} conj-ish — use symmetry:
      // X[h-k] = Ebar - Wbar*Obar where bar denotes the k-indexed values
      double xr2 = er - tr;        // real part of E - W O at mirrored bin
      double xi2 = -(ei - ti);     // X[h-k] = conj(E[k] - W^k O[k])
      power[h - k] = xr2 * xr2 + xi2 * xi2;
    }
  }
};

// Frame-blocked variant: runs W frames through the half-size complex FFT
// simultaneously with data laid out [bin][frame] so every butterfly is a
// vertical SIMD op across frames — an order of magnitude fewer dependent
// scalar chains than one-frame-at-a-time.
template <int W>
struct BlockRFFT {
  const RFFTPlan& plan;
  std::vector<double> re, im;  // [n/2][W]

  explicit BlockRFFT(const RFFTPlan& p)
      : plan(p), re(static_cast<size_t>(p.n / 2) * W),
        im(static_cast<size_t>(p.n / 2) * W) {}

  // frames: W pointers to n windowed samples; power: [W][n/2+1] rows with
  // row stride `stride`.
  void power_spectrum(const double* const* frames, double* power,
                      int64_t stride) {
    const int h = plan.n / 2;
    const auto& rev = plan.half.rev;
    // pack even/odd with bit-reversal applied up front
    for (int j = 0; j < h; ++j) {
      int r = rev[j];
      double* rrow = re.data() + static_cast<size_t>(r) * W;
      double* irow = im.data() + static_cast<size_t>(r) * W;
      for (int w = 0; w < W; ++w) {
        rrow[w] = frames[w][2 * j];
        irow[w] = frames[w][2 * j + 1];
      }
    }
    size_t tw = 0;
    for (int len = 2; len <= h; len <<= 1) {
      int half = len / 2;
      for (int start = 0; start < h; start += len) {
        for (int j = 0; j < half; ++j) {
          double cr = plan.half.wr[tw + j], ci = plan.half.wi[tw + j];
          double* ra = re.data() + static_cast<size_t>(start + j) * W;
          double* ia = im.data() + static_cast<size_t>(start + j) * W;
          double* rb = ra + static_cast<size_t>(half) * W;
          double* ib = ia + static_cast<size_t>(half) * W;
          for (int w = 0; w < W; ++w) {
            double trr = rb[w] * cr - ib[w] * ci;
            double tii = rb[w] * ci + ib[w] * cr;
            rb[w] = ra[w] - trr;
            ib[w] = ia[w] - tii;
            ra[w] += trr;
            ia[w] += tii;
          }
        }
      }
      tw += half;
    }
    // unpack to power bins
    const double* r0 = re.data();
    const double* i0 = im.data();
    for (int w = 0; w < W; ++w) {
      double s = r0[w] + i0[w], d = r0[w] - i0[w];
      power[w * stride + 0] = s * s;
      power[w * stride + h] = d * d;
    }
    for (int k = 1; k <= h / 2; ++k) {
      const double* ra = re.data() + static_cast<size_t>(k) * W;
      const double* ia = im.data() + static_cast<size_t>(k) * W;
      const double* rb = re.data() + static_cast<size_t>(h - k) * W;
      const double* ib = im.data() + static_cast<size_t>(h - k) * W;
      double cr = plan.twr[k], ci = plan.twi[k];
      for (int w = 0; w < W; ++w) {
        double er = 0.5 * (ra[w] + rb[w]), ei = 0.5 * (ia[w] - ib[w]);
        double or_ = 0.5 * (ia[w] + ib[w]), oi = -0.5 * (ra[w] - rb[w]);
        double tr = or_ * cr - oi * ci;
        double ti = or_ * ci + oi * cr;
        double xr = er + tr, xi = ei + ti;
        power[w * stride + k] = xr * xr + xi * xi;
        double xr2 = er - tr, xi2 = -(ei - ti);
        power[w * stride + (h - k)] = xr2 * xr2 + xi2 * xi2;
      }
    }
  }
};

// ---------------------------------------------------------------------------
// Slaney mel scale (librosa htk=False) — mirrors frontend/audio.py:160-200
// ---------------------------------------------------------------------------
double hz_to_mel(double f) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (f >= min_log_hz)
    return min_log_mel + std::log(std::max(f, 1e-10) / min_log_hz) / logstep;
  return f / f_sp;
}

double mel_to_hz(double m) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (m >= min_log_mel) return min_log_hz * std::exp(logstep * (m - min_log_mel));
  return m * f_sp;
}

// [n_mels, n_bins] Slaney-normalized triangular filterbank
std::vector<double> mel_filterbank(int sr, int n_fft, int n_mels, double fmin,
                                   double fmax) {
  int n_bins = 1 + n_fft / 2;
  std::vector<double> fftfreqs(n_bins);
  for (int i = 0; i < n_bins; ++i)
    fftfreqs[i] = 0.5 * sr * i / (n_bins - 1);
  std::vector<double> mel_pts(n_mels + 2);
  double m_lo = hz_to_mel(fmin), m_hi = hz_to_mel(fmax);
  for (int i = 0; i < n_mels + 2; ++i)
    mel_pts[i] = mel_to_hz(m_lo + (m_hi - m_lo) * i / (n_mels + 1));
  std::vector<double> w(static_cast<size_t>(n_mels) * n_bins, 0.0);
  for (int m = 0; m < n_mels; ++m) {
    double f0 = mel_pts[m], f1 = mel_pts[m + 1], f2 = mel_pts[m + 2];
    double enorm = 2.0 / (f2 - f0);
    for (int k = 0; k < n_bins; ++k) {
      double lower = (fftfreqs[k] - f0) / (f1 - f0);
      double upper = (f2 - fftfreqs[k]) / (f2 - f1);
      double v = std::min(lower, upper);
      if (v > 0.0) w[static_cast<size_t>(m) * n_bins + k] = v * enorm;
    }
  }
  return w;
}

}  // namespace

extern "C" {

// Number of STFT frames for n_samples with centered framing.
int64_t mf_num_frames(int64_t n_samples, int n_fft, int hop) {
  int64_t padded = n_samples + 2 * (n_fft / 2);
  if (padded < n_fft) return 0;
  return 1 + (padded - n_fft) / hop;
}

// audio [n_samples] float32 -> out [n_mels * n_frames] float32 (row-major
// [n_mels, n_frames], the layout compute_mel_spectrogram returns).
// Returns 0 on success, negative error code otherwise.
int mf_mel(const float* audio, int64_t n_samples, int sr, int n_fft, int hop,
           int win_length, int n_mels, double fmin, double fmax, float* out) {
  if ((n_fft & (n_fft - 1)) != 0 || n_fft <= 0) return -1;  // pow2 only
  // single-reflection padding only (NumPy multi-bounces below this; real
  // utterances are always longer than half a window)
  if (win_length > n_fft || n_samples <= n_fft / 2) return -2;
  if (fmax <= 0.0) fmax = 0.5 * sr;
  int64_t n_frames = mf_num_frames(n_samples, n_fft, hop);
  if (n_frames <= 0) return -3;
  int n_bins = 1 + n_fft / 2;
  int pad = n_fft / 2;

  // reflect-padded signal (librosa center=True)
  std::vector<double> sig(n_samples + 2 * pad);
  for (int64_t i = 0; i < n_samples; ++i) sig[pad + i] = audio[i];
  for (int i = 0; i < pad; ++i) {
    sig[pad - 1 - i] = audio[i + 1];                        // reflect left
    sig[pad + n_samples + i] = audio[n_samples - 2 - i];    // reflect right
  }

  // periodic Hann on win_length, centered into n_fft
  std::vector<double> window(n_fft, 0.0);
  int lpad = (n_fft - win_length) / 2;
  for (int i = 0; i < win_length; ++i)
    window[lpad + i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / win_length);

  RFFTPlan plan;
  plan.init(n_fft);
  std::vector<double> fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax);

  std::vector<double> power(static_cast<size_t>(n_frames) * n_bins);
  constexpr int W = 8;
  {
    BlockRFFT<W> block(plan);
    std::vector<double> wbuf(static_cast<size_t>(W) * n_fft);
    const double* ptrs[W];
    int64_t f = 0;
    for (; f + W <= n_frames; f += W) {
      for (int w = 0; w < W; ++w) {
        const double* frame = sig.data() + (f + w) * hop;
        double* dst = wbuf.data() + static_cast<size_t>(w) * n_fft;
        for (int i = 0; i < n_fft; ++i) dst[i] = frame[i] * window[i];
        ptrs[w] = dst;
      }
      block.power_spectrum(ptrs, power.data() + f * n_bins, n_bins);
    }
    std::vector<double> buf(n_fft), scratch(n_fft / 2);
    for (; f < n_frames; ++f) {
      const double* frame = sig.data() + f * hop;
      for (int i = 0; i < n_fft; ++i) buf[i] = frame[i] * window[i];
      plan.power_spectrum(buf.data(), scratch.data(),
                          power.data() + f * n_bins);
    }
  }

  // mel = fb @ power^T  -> [n_mels, n_frames], then power_to_db + min-max.
  // Each triangular mel filter touches only a narrow band of FFT bins
  // (~3% of the row), so the "matmul" is banded: precompute each row's
  // support [k0, k1) and dot only that slice — ~30x fewer MACs than the
  // dense product. Frame-outer order keeps the power row in L1.
  const double amin = 1e-10;
  std::vector<int> band_lo(n_mels), band_hi(n_mels);
  for (int m = 0; m < n_mels; ++m) {
    const double* frow = fb.data() + static_cast<size_t>(m) * n_bins;
    int k0 = 0, k1 = n_bins;
    while (k0 < n_bins && frow[k0] == 0.0) ++k0;
    while (k1 > k0 && frow[k1 - 1] == 0.0) --k1;
    band_lo[m] = k0;
    band_hi[m] = k1;
  }
  std::vector<double> mel(static_cast<size_t>(n_mels) * n_frames);
  double peak = amin;
  for (int64_t f = 0; f < n_frames; ++f) {
    const double* prow = power.data() + f * n_bins;
    for (int m = 0; m < n_mels; ++m) {
      const double* frow = fb.data() + static_cast<size_t>(m) * n_bins;
      double acc = 0.0;
      for (int k = band_lo[m]; k < band_hi[m]; ++k)
        acc += frow[k] * prow[k];
      mel[static_cast<size_t>(m) * n_frames + f] = acc;
      if (acc > peak) peak = acc;
    }
  }
  double ref_db = 10.0 * std::log10(std::max(amin, peak));
  double lo = 1e300, hi = -1e300;
  for (auto& v : mel) {
    v = 10.0 * std::log10(std::max(amin, v)) - ref_db;
    if (v < -80.0) v = -80.0;  // top_db=80 (max of log_spec is 0 at ref=max)
    if (v < lo) lo = v;
    if (v > hi) hi = v;
  }
  if (hi - lo < 1e-8) {
    std::memset(out, 0, sizeof(float) * n_mels * n_frames);
    return 0;
  }
  for (size_t i = 0; i < mel.size(); ++i)
    out[i] = static_cast<float>(2.0 * (mel[i] - lo) / (hi - lo) - 1.0);
  return 0;
}

}  // extern "C"
