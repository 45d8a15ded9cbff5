// f5c-tpu native host runtime.
//
// The TPU runs the numeric DPs (ABEA band fill, profile-HMM); this library
// is everything hot that stays on the host CPU: raw-signal event detection,
// method-of-moments scaling, k-mer ranking, batch assembly into the padded
// device layouts, post-alignment + recalibration, and CpG-group collection.
// The reference implements these in C/C++ inside its core (src/events.c,
// src/align.c:58-106/561-773, src/meth.c:23-190/473-567); the semantics
// (including float32/float64 mixing) are kept bit-faithful to the NumPy
// oracles in f5c_tpu/ops/*_ref.py, which are themselves validated against
// the reference's debug-dump fixtures.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC (see f5c_tpu/native/__init__.py).
// ABI: plain C functions over caller-allocated NumPy buffers (ctypes).

#include <algorithm>
#include <cctype>
#include <cfloat>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <unistd.h>

// lightweight phase profiling for the hot native entry points, enabled
// by F5C_NATIVE_PROF=1 (read once); accumulators drained by
// f5c_prof_get.  Slots: 0=viterbi fill+backtrace, 1=decode/commit,
// 2=closest-event/segment setup, 3=whole realign call.
static bool prof_on() {
  static const bool on = [] {
    const char* e = getenv("F5C_NATIVE_PROF");
    return e && e[0] == '1';
  }();
  return on;
}
static thread_local double g_prof[8] = {0};
static inline double prof_now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

#if defined(__AVX512F__)
#include <immintrin.h>
#endif
#if defined(__AVX512F__) && defined(__AVX512BW__)
#define F5C_KCHAIN_AVX512 1
#endif

extern "C" {
int64_t f5c_events_from_peaks(const double* sums, const double* sumsqs,
                              int64_t n, const int64_t* peaks,
                              int64_t np_, int64_t* ev_start,
                              float* ev_length, float* ev_mean,
                              float* ev_stdv);
int64_t f5c_detect_events(const float* sig, int64_t n, int rna,
                          int64_t* ev_start, float* ev_length,
                          float* ev_mean, float* ev_stdv);
void f5c_adc_to_pa(const int16_t* raw, int64_t n, float digitisation,
                   float offset, float range, float* out);
int64_t f5c_kmer_ranks(const char* seq, int64_t n, int k, int meth,
                       int32_t* out);
void f5c_mom_scalings(const float* event_means, int64_t n_events,
                      const int32_t* ranks, int64_t n_kmers,
                      const float* level_mean, float* shift_out,
                      float* scale_out);

// ---------------------------------------------------------------------------
// Event detection (reference src/events.c; oracle ops/events_ref.py)
// ---------------------------------------------------------------------------

struct DetectorParams {
  int win1, win2;
  float thresh1, thresh2;
  float peak_height;
};

static inline float tstat_at(const double* sums, const double* sumsqs,
                             int64_t i, int w, float wf) {
  // pure element-wise IEEE arithmetic; auto-vectorises (every op is
  // value-preserving: no reassociation, fp-contract off)
  double sum1 = sums[i] - sums[i - w];
  double sumsq1 = sumsqs[i] - sumsqs[i - w];
  float sum2 = (float)(sums[i + w] - sums[i]);
  float sumsq2 = (float)(sumsqs[i + w] - sumsqs[i]);
  float mean1 = (float)(sum1 / (double)wf);
  float mean2 = sum2 / wf;
  double cv = sumsq1 / (double)wf - (double)(mean1 * mean1) +
              (double)(sumsq2 / wf) - (double)(mean2 * mean2);
  float combined_var = (float)cv;
  combined_var = combined_var < FLT_MIN ? FLT_MIN : combined_var;
  float delta_mean = mean2 - mean1;
  float sq = sqrtf(combined_var / wf);
  double t = fabs((double)delta_mean) / (double)sq;
  return (float)t;
}

// Vectorised span [i0, i1) of the t-stat track: 8 elements per step,
// every operation the same element-wise IEEE op (same order, same
// float/double mixing) as tstat_at — bit-identical by construction.
static void tstat_span(const double* sums, const double* sumsqs,
                       int64_t i0, int64_t i1, int w, float wf,
                       float* tstat) {
  int64_t i = i0;
#if defined(__AVX512F__)
  const __m512d wfd = _mm512_set1_pd((double)wf);
  const __m256 wfs = _mm256_set1_ps(wf);
  const __m256 fmin = _mm256_set1_ps(FLT_MIN);
  const __m512d absmask = _mm512_castsi512_pd(
      _mm512_set1_epi64(0x7fffffffffffffffLL));
  for (; i + 8 <= i1; i += 8) {
    __m512d s_c = _mm512_loadu_pd(sums + i);
    __m512d s_l = _mm512_loadu_pd(sums + i - w);
    __m512d s_r = _mm512_loadu_pd(sums + i + w);
    __m512d q_c = _mm512_loadu_pd(sumsqs + i);
    __m512d q_l = _mm512_loadu_pd(sumsqs + i - w);
    __m512d q_r = _mm512_loadu_pd(sumsqs + i + w);
    __m512d sum1 = _mm512_sub_pd(s_c, s_l);
    __m512d sumsq1 = _mm512_sub_pd(q_c, q_l);
    __m256 sum2 = _mm512_cvtpd_ps(_mm512_sub_pd(s_r, s_c));
    __m256 sumsq2 = _mm512_cvtpd_ps(_mm512_sub_pd(q_r, q_c));
    __m256 mean1 = _mm512_cvtpd_ps(_mm512_div_pd(sum1, wfd));
    __m256 mean2 = _mm256_div_ps(sum2, wfs);
    // cv = sumsq1/wf - (double)(mean1*mean1)
    //      + (double)(sumsq2/wf) - (double)(mean2*mean2)
    __m512d cv = _mm512_sub_pd(_mm512_div_pd(sumsq1, wfd),
                               _mm512_cvtps_pd(_mm256_mul_ps(mean1,
                                                             mean1)));
    cv = _mm512_add_pd(cv, _mm512_cvtps_pd(_mm256_div_ps(sumsq2, wfs)));
    cv = _mm512_sub_pd(cv, _mm512_cvtps_pd(_mm256_mul_ps(mean2, mean2)));
    // (cv < FLT_MIN ? FLT_MIN : cv) incl. the NaN-passthrough:
    // maxps returns the SECOND operand when unordered
    __m256 cvf = _mm256_max_ps(fmin, _mm512_cvtpd_ps(cv));
    __m256 delta = _mm256_sub_ps(mean2, mean1);
    __m256 sq = _mm256_sqrt_ps(_mm256_div_ps(cvf, wfs));
    __m512d t = _mm512_div_pd(
        _mm512_and_pd(_mm512_cvtps_pd(delta), absmask),
        _mm512_cvtps_pd(sq));
    _mm256_storeu_ps(tstat + i, _mm512_cvtpd_ps(t));
  }
#endif
  for (; i < i1; i++) tstat[i] = tstat_at(sums, sumsqs, i, w, wf);
}

static void compute_tstat(const double* sums, const double* sumsqs,
                          int64_t n, int w, float* tstat) {
  if (n < 2 * (int64_t)w || w < 2) {
    for (int64_t i = 0; i < n; i++) tstat[i] = 0.0f;
    return;
  }
  // only the edges stay zero; [w, n-w) is written below
  for (int64_t i = 0; i < w; i++) tstat[i] = 0.0f;
  for (int64_t i = n - w; i < n; i++) tstat[i] = 0.0f;
  const float wf = (float)w;
  tstat_span(sums, sumsqs, w, n - w, w, wf, tstat);
}

// Both t-stat tracks in one pass over the prefix arrays (w1 < w2): the
// sums/sumsqs streams are read once instead of twice.  Identical
// per-element arithmetic to compute_tstat.
static void compute_tstat_pair(const double* sums, const double* sumsqs,
                               int64_t n, int w1, int w2,
                               float* t1, float* t2) {
  if (n < 2 * (int64_t)w2 || w1 < 2) {
    compute_tstat(sums, sumsqs, n, w1, t1);
    compute_tstat(sums, sumsqs, n, w2, t2);
    return;
  }
  const float wf1 = (float)w1, wf2 = (float)w2;
  for (int64_t i = 0; i < w1; i++) t1[i] = 0.0f;
  for (int64_t i = n - w1; i < n; i++) t1[i] = 0.0f;
  for (int64_t i = 0; i < w2; i++) t2[i] = 0.0f;
  for (int64_t i = n - w2; i < n; i++) t2[i] = 0.0f;
  for (int64_t i = w1; i < w2; i++)
    t1[i] = tstat_at(sums, sumsqs, i, w1, wf1);
  for (int64_t i = n - w2; i < n - w1; i++)
    t1[i] = tstat_at(sums, sumsqs, i, w1, wf1);
  tstat_span(sums, sumsqs, w2, n - w2, w1, wf1, t1);
  tstat_span(sums, sumsqs, w2, n - w2, w2, wf2, t2);
}

// Two coupled peak detectors over the t-stat tracks (events.c:380-452).
//
// The coupling is one-directional: the short-window detector resets and
// masks the long one, never the reverse.  So the interleaved per-sample
// loop of the reference is split into two single-detector passes with a
// recorded reset/mask timeline — exactly equivalent (each short-detector
// trigger resets the long detector's state, so only the LAST trigger
// sample of a contiguous trigger run determines the state the long
// detector resumes with), and ~2x faster: each pass is a tight
// 4-branch scan instead of an 8-branch two-detector interleave.
static int64_t peak_detector(const float* t1, const float* t2, int64_t n,
                             const DetectorParams& p, int64_t* peaks) {
  struct Emit { int64_t i, pos; };
  struct Run {
    int64_t start, end, masked_to;
    float last_unmasked;
    bool has_unmasked;
  };
  static thread_local std::vector<Emit> e0, e1;
  static thread_local std::vector<Run> runs;
  e0.clear();
  e1.clear();
  runs.clear();
  {
    // pass 0: short-window detector (index 0); i == 0 is masked by the
    // initial masked_to == 0.  The state machine is split into per-mode
    // segmented loops (min-tracking / max-tracking / triggered) so each
    // inner loop carries only the comparisons its mode can act on —
    // `peak_value` is monotone non-decreasing in tracking mode, so the
    // `> thresh1` test hoists out of the pre-trigger loop entirely.
    int64_t peak_pos = -1;
    float peak_value = FLT_MAX;
    bool valid = false;
    const float ph = p.peak_height, th1 = p.thresh1;
    const int64_t hw = p.win1 / 2;
    int64_t i = 1;
    while (i < n) {
      // ---- looking for a peak: track the running minimum ----
      for (; i < n; i++) {
        float v = t1[i];
        if (v < peak_value) peak_value = v;
        else if (v - peak_value > ph) {
          peak_value = v;
          peak_pos = i;
          i++;
          goto p0_track;
        }
      }
      break;
    p0_track:
      // ---- tracking, not yet over thresh1: only the max matters ----
      for (; i < n; i++) {
        float v = t1[i];
        if (v > peak_value) {
          peak_value = v;
          peak_pos = i;
        }
        if (peak_value > th1) goto p0_trig;
      }
      break;
    p0_trig:
      // ---- over thresh1: every sample is a trigger (masks det 1) ----
      {
        bool in_run = false;
        for (; i < n; i++) {
          float v = t1[i];
          if (v > peak_value) {
            peak_value = v;
            peak_pos = i;
          }
          int64_t mt = peak_pos + p.win1;
          if (!in_run) {
            runs.push_back({i, i, mt, 0.f, false});
            in_run = true;
          }
          Run& R = runs.back();
          R.end = i;
          R.masked_to = mt;
          if (mt < i) {
            R.last_unmasked = t2[i];
            R.has_unmasked = true;
          } else {
            R.has_unmasked = false;
          }
          if (peak_value - v > ph) valid = true;
          if (valid && i - peak_pos > hw) {
            e0.push_back({i, peak_pos});
            peak_pos = -1;
            peak_value = v;
            valid = false;
            i++;
            break;
          }
        }
      }
    }
  }
  {
    // pass 1: long-window detector, replaying the reset/mask timeline.
    // Segmented like pass 0; masked stretches are skipped with a direct
    // jump (i = masked_to + 1) instead of per-sample `continue`, and the
    // next run-start boundary is carried in `next_run` so the inner loops
    // compare against one register instead of re-reading the vector.
    int64_t peak_pos = -1;
    float peak_value = FLT_MAX;
    bool valid = false;
    int64_t masked_to = 0;
    size_t ri = 0;
    const float ph = p.peak_height, th2 = p.thresh2;
    const int64_t hw = p.win2 / 2;
    int64_t next_run = runs.empty() ? n : runs[0].start;
    int64_t i = 1;
    while (i < n) {
      if (i == next_run) {
        peak_pos = -1;
        valid = false;
        peak_value = runs[ri].has_unmasked ? runs[ri].last_unmasked
                                           : FLT_MAX;
        masked_to = runs[ri].masked_to;
        i = runs[ri].end + 1;   // the whole trigger run is summarised
        ri++;
        next_run = ri < runs.size() ? runs[ri].start : n;
      }
      if (masked_to >= i) {
        // skip the masked stretch, but never past the next run boundary
        int64_t j = masked_to + 1;
        i = j < next_run ? j : next_run;
        continue;
      }
      if (peak_pos == -1) {
        // ---- looking for a peak ----
        for (; i < n && i != next_run; i++) {
          float v = t2[i];
          if (v < peak_value) peak_value = v;
          else if (v - peak_value > ph) {
            peak_value = v;
            peak_pos = i;
            i++;
            break;
          }
        }
        continue;
      }
      // ---- tracking ----
      for (; i < n && i != next_run; i++) {
        float v = t2[i];
        if (v > peak_value) {
          peak_value = v;
          peak_pos = i;
        }
        if (peak_value - v > ph && peak_value > th2) valid = true;
        if (valid && i - peak_pos > hw) {
          e1.push_back({i, peak_pos});
          peak_pos = -1;
          peak_value = v;
          valid = false;
          i++;
          break;
        }
      }
    }
  }
  // merge emissions by sample index (short detector first on ties, as
  // in the reference's k-ordered inner loop)
  size_t a = 0, b = 0;
  int64_t np_ = 0;
  while (a < e0.size() || b < e1.size()) {
    bool takeA = b >= e1.size()
                 || (a < e0.size() && e0[a].i <= e1[b].i);
    peaks[np_++] = takeA ? e0[a++].pos : e1[b++].pos;
  }
  return np_;
}

// Detect events over a pA-scaled f32 signal. Outputs must hold n+1 entries.
// Returns the number of events.
int64_t f5c_detect_events(const float* sig, int64_t n, int rna,
                          int64_t* ev_start, float* ev_length,
                          float* ev_mean, float* ev_stdv) {
  DetectorParams p;
  if (rna) {
    p = {7, 14, 2.5f, 9.0f, 1.0f};
  } else {
    p = {3, 6, 1.4f, 9.0f, 0.2f};
  }
  // exclusive prefix sums, f64 accumulators, f32 squares (events.c:302-312).
  // Scratch buffers are thread-local and grow-only: the per-call
  // allocation + page-fault cost (~45 MB of fresh pages per batch)
  // dominated the arithmetic otherwise.
  static thread_local std::vector<double> sums, sumsqs;
  static thread_local std::vector<float> t1, t2;
  static thread_local std::vector<int64_t> peaks;
  if ((int64_t)sums.size() < n + 1) {
    sums.resize(n + 1);
    sumsqs.resize(n + 1);
    t1.resize(n);
    t2.resize(n);
    peaks.resize(n + 2);
  }
  sums[0] = 0.0;
  sumsqs[0] = 0.0;
  for (int64_t i = 0; i < n; i++) {
    float v = sig[i];
    sums[i + 1] = sums[i] + (double)v;
    sumsqs[i + 1] = sumsqs[i] + (double)(v * v);
  }
  compute_tstat_pair(sums.data(), sumsqs.data(), n, p.win1, p.win2,
                     t1.data(), t2.data());
  int64_t np_ = peak_detector(t1.data(), t2.data(), n, p, peaks.data());
  return f5c_events_from_peaks(sums.data(), sumsqs.data(), n,
                               peaks.data(), np_, ev_start, ev_length,
                               ev_mean, ev_stdv);
}

// events between consecutive valid peaks (events.c:466-513); shared by
// the per-read and lane-parallel detectors
int64_t f5c_events_from_peaks(const double* sums, const double* sumsqs,
                              int64_t n, const int64_t* peaks,
                              int64_t np_, int64_t* ev_start,
                              float* ev_length, float* ev_mean,
                              float* ev_stdv) {
  static thread_local std::vector<int64_t> bounds;
  if ((int64_t)bounds.size() < np_ + 2) bounds.resize(np_ + 2);
  int64_t nb = 0;
  bounds[nb++] = 0;
  int64_t pi = 0;
#if defined(__AVX512F__)
  {
    const __m512i vzero = _mm512_setzero_si512();
    const __m512i vn = _mm512_set1_epi64(n);
    for (; pi + 8 <= np_; pi += 8) {
      __m512i v = _mm512_loadu_si512(peaks + pi);
      __mmask8 m = _mm512_cmpgt_epi64_mask(v, vzero)
                   & _mm512_cmpgt_epi64_mask(vn, v);
      _mm512_mask_compressstoreu_epi64(bounds.data() + nb, m, v);
      nb += __builtin_popcount((unsigned)m);
    }
  }
#endif
  for (; pi < np_; pi++) {
    if (peaks[pi] > 0 && peaks[pi] < n) bounds[nb++] = peaks[pi];
  }
  bounds[nb++] = n;
  int64_t n_events = nb - 1;
  int64_t i = 0;
#if defined(__AVX512F__)
  // 8 events per step: start/end prefix values gathered once (an event's
  // end bound is the next event's start), element-wise IEEE arithmetic —
  // bit-identical to the scalar tail
  for (; i + 8 <= n_events; i += 8) {
    __m512i vs = _mm512_loadu_si512(bounds.data() + i);
    __m512i ve = _mm512_loadu_si512(bounds.data() + i + 1);
    __m512d sum_s = _mm512_i64gather_pd(vs, sums, 8);
    __m512d sum_e = _mm512_i64gather_pd(ve, sums, 8);
    __m512d sq_s = _mm512_i64gather_pd(vs, sumsqs, 8);
    __m512d sq_e = _mm512_i64gather_pd(ve, sumsqs, 8);
    __m256 len = _mm512_cvtepi64_ps(_mm512_sub_epi64(ve, vs));
    __m256 mean = _mm256_div_ps(
        _mm512_cvtpd_ps(_mm512_sub_pd(sum_e, sum_s)), len);
    __m256 dsq = _mm512_cvtpd_ps(_mm512_sub_pd(sq_e, sq_s));
    __m256 var = _mm256_sub_ps(_mm256_div_ps(dsq, len),
                               _mm256_mul_ps(mean, mean));
    // max(var, 0): maxps returns the second operand on NaN, matching
    // the scalar (var > 0 ? var : 0) including the NaN -> 0 case
    __m256 stdv = _mm256_sqrt_ps(_mm256_max_ps(var,
                                               _mm256_setzero_ps()));
    _mm512_storeu_si512(ev_start + i, vs);
    _mm256_storeu_ps(ev_length + i, len);
    _mm256_storeu_ps(ev_mean + i, mean);
    _mm256_storeu_ps(ev_stdv + i, stdv);
  }
#endif
  for (; i < n_events; i++) {
    int64_t s = bounds[i], e = bounds[i + 1];
    float length = (float)(e - s);
    float mean = (float)(sums[e] - sums[s]) / length;
    float deltasqr = (float)(sumsqs[e] - sumsqs[s]);
    float var = deltasqr / length - mean * mean;
    ev_start[i] = s;
    ev_length[i] = length;
    ev_mean[i] = mean;
    ev_stdv[i] = sqrtf(var > 0.0f ? var : 0.0f);
  }
  return n_events;
}

#if defined(__AVX512F__)
// 16x16 f32 transpose: out[e][lane] = rows[lane][e] for one tile.
static inline void transpose16x16(const __m512 r[16], __m512 o[16]) {
  __m512 t[16], u[16];
  for (int g = 0; g < 4; g++) {
    const __m512 a = r[4 * g], b = r[4 * g + 1];
    const __m512 c = r[4 * g + 2], d = r[4 * g + 3];
    t[4 * g + 0] = _mm512_unpacklo_ps(a, b);
    t[4 * g + 1] = _mm512_unpackhi_ps(a, b);
    t[4 * g + 2] = _mm512_unpacklo_ps(c, d);
    t[4 * g + 3] = _mm512_unpackhi_ps(c, d);
    u[4 * g + 0] = _mm512_shuffle_ps(t[4 * g], t[4 * g + 2], 0x44);
    u[4 * g + 1] = _mm512_shuffle_ps(t[4 * g], t[4 * g + 2], 0xEE);
    u[4 * g + 2] = _mm512_shuffle_ps(t[4 * g + 1], t[4 * g + 3], 0x44);
    u[4 * g + 3] = _mm512_shuffle_ps(t[4 * g + 1], t[4 * g + 3], 0xEE);
  }
  // u[g*4+j] sublane s = {rows[4g..4g+3] element 4s+j}
  for (int j = 0; j < 4; j++) {
    __m512 q0 = _mm512_shuffle_f32x4(u[0 * 4 + j], u[1 * 4 + j], 0x88);
    __m512 q1 = _mm512_shuffle_f32x4(u[2 * 4 + j], u[3 * 4 + j], 0x88);
    __m512 p0 = _mm512_shuffle_f32x4(u[0 * 4 + j], u[1 * 4 + j], 0xDD);
    __m512 p1 = _mm512_shuffle_f32x4(u[2 * 4 + j], u[3 * 4 + j], 0xDD);
    o[0 + j] = _mm512_shuffle_f32x4(q0, q1, 0x88);
    o[8 + j] = _mm512_shuffle_f32x4(q0, q1, 0xDD);
    o[4 + j] = _mm512_shuffle_f32x4(p0, p1, 0x88);
    o[12 + j] = _mm512_shuffle_f32x4(p0, p1, 0xDD);
  }
}

// Lane-parallel two-detector peak scan: 16 reads advance in lockstep,
// one AVX-512 lane per read, branch-free per-sample state updates that
// mirror the oracle's per-sample logic exactly (events_ref.py
// short_long_peak_detector / events.c:380-452).  Emissions stream to a
// shared (pos, lane) buffer via compress-stores; a stable counting
// sort by lane afterwards reproduces each read's (sample, detector)
// peak order bit-exactly.
static int64_t peak_scan16(const float* T1, const float* T2,
                           const int32_t* ns32, int64_t max_n,
                           const DetectorParams& p,
                           int32_t* out_pos, int32_t* out_lane) {
  const __m512 ph = _mm512_set1_ps(p.peak_height);
  const __m512 th0 = _mm512_set1_ps(p.thresh1);
  const __m512 th1 = _mm512_set1_ps(p.thresh2);
  const __m512 fmax = _mm512_set1_ps(FLT_MAX);
  const __m512i neg1 = _mm512_set1_epi32(-1);
  const __m512i w0v = _mm512_set1_epi32(p.win1);
  const __m512i hw0 = _mm512_set1_epi32(p.win1 / 2);
  const __m512i hw1 = _mm512_set1_epi32(p.win2 / 2);
  const __m512i nvec = _mm512_loadu_si512(ns32);
  const __m512i lane_iota = _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8,
                                              9, 10, 11, 12, 13, 14, 15);
  __m512 pv0 = fmax, pv1 = fmax;
  __m512i pos0 = neg1, pos1 = neg1;
  __mmask16 valid0 = 0, valid1 = 0;
  __m512i masked1 = _mm512_setzero_si512();
  int64_t cnt = 0;
  for (int64_t i = 1; i < max_n; i++) {
    const __m512i iv = _mm512_set1_epi32((int32_t)i);
    const __mmask16 act = _mm512_cmplt_epi32_mask(iv, nvec);
    // ---- detector 0 (its masked_to only ever skips sample 0) ----
    {
      const __m512 v = _mm512_loadu_ps(T1 + i * 16);
      const __mmask16 look =
          act & _mm512_cmpeq_epi32_mask(pos0, neg1);
      const __mmask16 trk = act & ~look;
      const __mmask16 lt = _mm512_cmp_ps_mask(v, pv0, _CMP_LT_OQ);
      const __mmask16 enter =
          look & ~lt &
          _mm512_cmp_ps_mask(_mm512_sub_ps(v, pv0), ph, _CMP_GT_OQ);
      pv0 = _mm512_mask_mov_ps(pv0, (__mmask16)((look & lt) | enter), v);
      pos0 = _mm512_mask_mov_epi32(pos0, enter, iv);
      const __mmask16 gt =
          trk & _mm512_cmp_ps_mask(v, pv0, _CMP_GT_OQ);
      pv0 = _mm512_mask_mov_ps(pv0, gt, v);
      pos0 = _mm512_mask_mov_epi32(pos0, gt, iv);
      // over-threshold: mask + reset detector 1 (events.c:419-425)
      const __mmask16 m_th =
          _mm512_cmp_ps_mask(pv0, th0, _CMP_GT_OQ);
      const __mmask16 hot = trk & m_th;
      masked1 = _mm512_mask_mov_epi32(masked1, hot,
                                      _mm512_add_epi32(pos0, w0v));
      pos1 = _mm512_mask_mov_epi32(pos1, hot, neg1);
      pv1 = _mm512_mask_mov_ps(pv1, hot, fmax);
      valid1 = (__mmask16)(valid1 & ~hot);
      valid0 = (__mmask16)(valid0 |
          (trk & m_th &
           _mm512_cmp_ps_mask(_mm512_sub_ps(pv0, v), ph, _CMP_GT_OQ)));
      const __mmask16 em =
          valid0 & trk &
          _mm512_cmpgt_epi32_mask(_mm512_sub_epi32(iv, pos0), hw0);
      if (em) {
        _mm512_mask_compressstoreu_epi32(out_pos + cnt, em, pos0);
        _mm512_mask_compressstoreu_epi32(out_lane + cnt, em, lane_iota);
        cnt += __builtin_popcount((unsigned)em);
        pos0 = _mm512_mask_mov_epi32(pos0, em, neg1);
        pv0 = _mm512_mask_mov_ps(pv0, em, v);
        valid0 = (__mmask16)(valid0 & ~em);
      }
    }
    // ---- detector 1 (maskable by detector 0) ----
    {
      const __mmask16 act1 =
          act & _mm512_cmplt_epi32_mask(masked1, iv);
      const __m512 v = _mm512_loadu_ps(T2 + i * 16);
      const __mmask16 look =
          act1 & _mm512_cmpeq_epi32_mask(pos1, neg1);
      const __mmask16 trk = act1 & ~look;
      const __mmask16 lt = _mm512_cmp_ps_mask(v, pv1, _CMP_LT_OQ);
      const __mmask16 enter =
          look & ~lt &
          _mm512_cmp_ps_mask(_mm512_sub_ps(v, pv1), ph, _CMP_GT_OQ);
      pv1 = _mm512_mask_mov_ps(pv1, (__mmask16)((look & lt) | enter), v);
      pos1 = _mm512_mask_mov_epi32(pos1, enter, iv);
      const __mmask16 gt =
          trk & _mm512_cmp_ps_mask(v, pv1, _CMP_GT_OQ);
      pv1 = _mm512_mask_mov_ps(pv1, gt, v);
      pos1 = _mm512_mask_mov_epi32(pos1, gt, iv);
      valid1 = (__mmask16)(valid1 |
          (trk &
           _mm512_cmp_ps_mask(_mm512_sub_ps(pv1, v), ph, _CMP_GT_OQ) &
           _mm512_cmp_ps_mask(pv1, th1, _CMP_GT_OQ)));
      const __mmask16 em =
          valid1 & trk &
          _mm512_cmpgt_epi32_mask(_mm512_sub_epi32(iv, pos1), hw1);
      if (em) {
        _mm512_mask_compressstoreu_epi32(out_pos + cnt, em, pos1);
        _mm512_mask_compressstoreu_epi32(out_lane + cnt, em, lane_iota);
        cnt += __builtin_popcount((unsigned)em);
        pos1 = _mm512_mask_mov_epi32(pos1, em, neg1);
        pv1 = _mm512_mask_mov_ps(pv1, em, v);
        valid1 = (__mmask16)(valid1 & ~em);
      }
    }
  }
  return cnt;
}
#endif  // __AVX512F__

// Lane-parallel event detection over a batch of reads: per-read prefix
// sums + t-stat tracks (vectorised spans), then the two-detector peak
// scan runs 16 reads per AVX-512 register instead of one branchy
// scalar state machine per read (~12x on the scan, the largest single
// component of the host detect).  Bit-identical to per-read
// f5c_detect_events; falls back to it without AVX-512.
void f5c_detect_events_many(
    int64_t nb, const float* const* pas, const int64_t* ns, int rna,
    int64_t* const* ev_start, float* const* ev_length,
    float* const* ev_mean, float* const* ev_stdv, int64_t* n_events) {
#if !defined(__AVX512F__)
  for (int64_t r = 0; r < nb; r++)
    n_events[r] = f5c_detect_events(pas[r], ns[r], rna, ev_start[r],
                                    ev_length[r], ev_mean[r], ev_stdv[r]);
#else
  DetectorParams p;
  if (rna) {
    p = {7, 14, 2.5f, 9.0f, 1.0f};
  } else {
    p = {3, 6, 1.4f, 9.0f, 0.2f};
  }
  static thread_local std::vector<double> sums[16], sumsqs[16];
  static thread_local std::vector<float> t1l[16], t2l[16];
  static thread_local std::vector<float> T1, T2;
  static thread_local std::vector<int32_t> epos, elane;
  static thread_local std::vector<int64_t> pk;
  for (int64_t g0 = 0; g0 < nb; g0 += 16) {
    const int nl = (int)std::min<int64_t>(16, nb - g0);
    int64_t max_n = 0;
    for (int j = 0; j < nl; j++)
      max_n = std::max(max_n, ns[g0 + j]);
    const int64_t maxp = (max_n + 15) / 16 * 16;
    int32_t ns32[16] = {0};
    for (int j = 0; j < nl; j++) {
      const int64_t n = ns[g0 + j];
      ns32[j] = (int32_t)n;
      if ((int64_t)sums[j].size() < n + 1) {
        sums[j].resize(n + 1);
        sumsqs[j].resize(n + 1);
      }
      if ((int64_t)t1l[j].size() < maxp) {
        t1l[j].resize(maxp);
        t2l[j].resize(maxp);
      }
      sums[j][0] = 0.0;
      sumsqs[j][0] = 0.0;
    }
    // prefix sums 4 reads at a time: each read's chain is serial (FP
    // add latency bound), but 8 chains across 4 reads fill the adder
    // ports — same per-read add order, bit-identical
    for (int q0 = 0; q0 < nl; q0 += 4) {
      const int qn = std::min(4, nl - q0);
      if (qn == 4) {
        const float* sg[4];
        double* so[4];
        double* qo[4];
        int64_t nmin = INT64_MAX;
        for (int l = 0; l < 4; l++) {
          sg[l] = pas[g0 + q0 + l];
          so[l] = sums[q0 + l].data();
          qo[l] = sumsqs[q0 + l].data();
          nmin = std::min(nmin, ns[g0 + q0 + l]);
        }
        double s0 = 0, s1 = 0, s2 = 0, s3 = 0;
        double t0 = 0, t1 = 0, t2 = 0, t3 = 0;
        for (int64_t i = 0; i < nmin; i++) {
          float v0 = sg[0][i], v1 = sg[1][i];
          float v2 = sg[2][i], v3 = sg[3][i];
          s0 += (double)v0; t0 += (double)(v0 * v0);
          s1 += (double)v1; t1 += (double)(v1 * v1);
          s2 += (double)v2; t2 += (double)(v2 * v2);
          s3 += (double)v3; t3 += (double)(v3 * v3);
          so[0][i + 1] = s0; qo[0][i + 1] = t0;
          so[1][i + 1] = s1; qo[1][i + 1] = t1;
          so[2][i + 1] = s2; qo[2][i + 1] = t2;
          so[3][i + 1] = s3; qo[3][i + 1] = t3;
        }
        for (int l = 0; l < 4; l++) {
          for (int64_t i = nmin; i < ns[g0 + q0 + l]; i++) {
            float v = sg[l][i];
            so[l][i + 1] = so[l][i] + (double)v;
            qo[l][i + 1] = qo[l][i] + (double)(v * v);
          }
        }
      } else {
        for (int l = 0; l < qn; l++) {
          const float* sig = pas[g0 + q0 + l];
          double* so = sums[q0 + l].data();
          double* qo = sumsqs[q0 + l].data();
          for (int64_t i = 0; i < ns[g0 + q0 + l]; i++) {
            float v = sig[i];
            so[i + 1] = so[i] + (double)v;
            qo[i + 1] = qo[i] + (double)(v * v);
          }
        }
      }
    }
    for (int j = 0; j < nl; j++) {
      const int64_t n = ns[g0 + j];
      compute_tstat_pair(sums[j].data(), sumsqs[j].data(), n, p.win1,
                         p.win2, t1l[j].data(), t2l[j].data());
      memset(t1l[j].data() + n, 0, (maxp - n) * sizeof(float));
      memset(t2l[j].data() + n, 0, (maxp - n) * sizeof(float));
    }
    for (int j = nl; j < 16; j++) {
      if ((int64_t)t1l[j].size() < maxp) {
        t1l[j].resize(maxp);
        t2l[j].resize(maxp);
      }
      memset(t1l[j].data(), 0, maxp * sizeof(float));
      memset(t2l[j].data(), 0, maxp * sizeof(float));
    }
    if ((int64_t)T1.size() < maxp * 16) {
      T1.resize(maxp * 16);
      T2.resize(maxp * 16);
    }
    __m512 rows[16], cols[16];
    for (int64_t i0 = 0; i0 < maxp; i0 += 16) {
      for (int j = 0; j < 16; j++)
        rows[j] = _mm512_loadu_ps(t1l[j].data() + i0);
      transpose16x16(rows, cols);
      for (int e = 0; e < 16; e++)
        _mm512_storeu_ps(T1.data() + (i0 + e) * 16, cols[e]);
      for (int j = 0; j < 16; j++)
        rows[j] = _mm512_loadu_ps(t2l[j].data() + i0);
      transpose16x16(rows, cols);
      for (int e = 0; e < 16; e++)
        _mm512_storeu_ps(T2.data() + (i0 + e) * 16, cols[e]);
    }
    int64_t sum_n = 0;
    for (int j = 0; j < nl; j++) sum_n += ns[g0 + j];
    if ((int64_t)epos.size() < sum_n * 2 + 64) {
      epos.resize(sum_n * 2 + 64);
      elane.resize(sum_n * 2 + 64);
    }
    const int64_t cnt = peak_scan16(T1.data(), T2.data(), ns32, max_n,
                                    p, epos.data(), elane.data());
    // stable counting sort by lane -> per-read peak sequences
    int64_t lc[17] = {0};
    for (int64_t e = 0; e < cnt; e++) lc[elane[e] + 1]++;
    for (int j = 0; j < 16; j++) lc[j + 1] += lc[j];
    if ((int64_t)pk.size() < cnt + 16) pk.resize(cnt + 16);
    int64_t cur[16];
    memcpy(cur, lc, sizeof(cur));
    for (int64_t e = 0; e < cnt; e++)
      pk[cur[elane[e]]++] = epos[e];
    for (int j = 0; j < nl; j++) {
      n_events[g0 + j] = f5c_events_from_peaks(
          sums[j].data(), sumsqs[j].data(), ns[g0 + j],
          pk.data() + lc[j], lc[j + 1] - lc[j], ev_start[g0 + j],
          ev_length[g0 + j], ev_mean[g0 + j], ev_stdv[g0 + j]);
    }
  }
#endif
}

// Whole event_single stage for a batch in ONE call: ADC->pA +
// lane-parallel detect + k-mer ranks + MoM per read (f5c.c:691-745).
// ptrs arrays carry raw int16 / seq / output buffer addresses; pa_ptrs
// entries may be 0 (pA kept in grow-only scratch).
void f5c_prep_reads_many(
    int64_t nb, const uint64_t* raw_ptrs, const int64_t* n_samples,
    const float* digs, const float* offs, const float* rngs, int rna,
    const uint64_t* seq_ptrs, const int64_t* seq_lens, int k,
    const float* level_mean,
    const uint64_t* pa_ptrs,
    const uint64_t* ev_start_ptrs, const uint64_t* ev_len_ptrs,
    const uint64_t* ev_mean_ptrs, const uint64_t* ev_stdv_ptrs,
    const uint64_t* ranks_ptrs, int64_t* n_kmers_out,
    int64_t* n_events_out, float* shifts, float* scales) {
  static thread_local std::vector<float> pa_pool;
  static thread_local std::vector<uint64_t> pav;
  int64_t total = 0;
  for (int64_t r = 0; r < nb; r++)
    if (!pa_ptrs[r]) total += n_samples[r];
  if ((int64_t)pa_pool.size() < total) pa_pool.resize(total);
  if ((int64_t)pav.size() < nb) pav.resize(nb);
  int64_t off = 0;
  for (int64_t r = 0; r < nb; r++) {
    float* pa = pa_ptrs[r] ? (float*)pa_ptrs[r] : pa_pool.data() + off;
    if (!pa_ptrs[r]) off += n_samples[r];
    f5c_adc_to_pa((const int16_t*)raw_ptrs[r], n_samples[r], digs[r],
                  offs[r], rngs[r], pa);
    pav[r] = (uint64_t)pa;
  }
  f5c_detect_events_many(
      nb, (const float* const*)pav.data(), n_samples, rna,
      (int64_t* const*)ev_start_ptrs, (float* const*)ev_len_ptrs,
      (float* const*)ev_mean_ptrs, (float* const*)ev_stdv_ptrs,
      n_events_out);
  for (int64_t r = 0; r < nb; r++) {
    int64_t nk = f5c_kmer_ranks((const char*)seq_ptrs[r], seq_lens[r],
                                k, 0, (int32_t*)ranks_ptrs[r]);
    n_kmers_out[r] = nk;
    if (n_events_out[r] > 0 && nk > 0)
      f5c_mom_scalings((const float*)ev_mean_ptrs[r], n_events_out[r],
                       (const int32_t*)ranks_ptrs[r], nk, level_mean,
                       shifts + r, scales + r);
    else {
      shifts[r] = 0.0f;
      scales[r] = 1.0f;
    }
  }
}

// ADC to pA: (raw + offset) * range / digitisation (f5c.c:693-696).
void f5c_adc_to_pa(const int16_t* raw, int64_t n, float digitisation,
                   float offset, float range, float* out) {
  float s = range / digitisation;
  for (int64_t i = 0; i < n; i++) out[i] = ((float)raw[i] + offset) * s;
}

// ---------------------------------------------------------------------------
// k-mer ranks (align.c:36-47 2-bit DNA; hmm.c:30-61 base-5 ACGMT)
// ---------------------------------------------------------------------------

static inline int dna_code(char c) {
  switch (c) {
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return 0;  // A and anything else
  }
}

static inline int meth_code(char c) {
  switch (c) {
    case 'C': return 1;
    case 'G': return 2;
    case 'M': return 3;
    case 'T': return 4;
    default: return 0;
  }
}

// ranks for every k-mer; out must hold max(n-k+1, 0). Returns count.
int64_t f5c_kmer_ranks(const char* seq, int64_t n, int k, int meth,
                       int32_t* out) {
  int64_t nk = n - k + 1;
  if (nk <= 0) return 0;
  if (meth) {
    for (int64_t i = 0; i < nk; i++) {
      int32_t r = 0;
      for (int j = 0; j < k; j++) r = r * 5 + meth_code(seq[i + j]);
      out[i] = r;
    }
  } else {
    // rolling 2-bit rank
    int32_t mask = (1 << (2 * k)) - 1;
    int32_t r = 0;
    for (int j = 0; j < k - 1; j++) r = (r << 2) | dna_code(seq[j]);
    for (int64_t i = 0; i < nk; i++) {
      r = ((r << 2) | dna_code(seq[i + k - 1])) & mask;
      out[i] = r;
    }
  }
  return nk;
}

// ---------------------------------------------------------------------------
// Method-of-moments scaling (align.c:58-106; oracle abea_ref.py:51-84)
// ---------------------------------------------------------------------------

void f5c_mom_scalings(const float* event_means, int64_t n_events,
                      const int32_t* ranks, int64_t n_kmers,
                      const float* level_mean, float* shift_out,
                      float* scale_out) {
  double event_sum = 0.0;
  for (int64_t i = 0; i < n_events; i++) event_sum += (double)event_means[i];
  double kmer_sum = 0.0, kmer_sq_sum = 0.0;
  for (int64_t i = 0; i < n_kmers; i++) {
    double l = (double)level_mean[ranks[i]];
    kmer_sum += l;
    kmer_sq_sum += l * l;
  }
  double shift = event_sum / n_events - kmer_sum / n_kmers;
  double event_sq_sum = 0.0;
  for (int64_t i = 0; i < n_events; i++) {
    double d = (double)event_means[i] - shift;
    event_sq_sum += d * d;
  }
  double scale = (event_sq_sum / n_events) / (kmer_sq_sum / n_kmers);
  *shift_out = (float)shift;
  *scale_out = (float)scale;
}

// One-call read preparation: ADC->pA + event detection + k-mer ranks +
// MoM scaling (the whole f5c event_single stage, f5c.c:691-745) — a
// single ctypes crossing per read instead of four (the per-call ctypes
// argument-marshalling cost is ~20us on this host, x4 wrappers x K reads
// per batch).  pa_out may be null when the caller does not keep raw pA.
int64_t f5c_prep_read(const int16_t* raw, int64_t n_samples,
                      float digitisation, float offset, float range,
                      int rna, const char* seq, int64_t seq_len, int k,
                      const float* level_mean,
                      float* pa_out,
                      int64_t* ev_start, float* ev_length,
                      float* ev_mean, float* ev_stdv,
                      int32_t* ranks_out, int64_t* n_kmers_out,
                      float* shift_out, float* scale_out) {
  static thread_local std::vector<float> pa_buf;
  float* pa = pa_out;
  if (!pa) {
    if ((int64_t)pa_buf.size() < n_samples) pa_buf.resize(n_samples);
    pa = pa_buf.data();
  }
  f5c_adc_to_pa(raw, n_samples, digitisation, offset, range, pa);
  int64_t ne = f5c_detect_events(pa, n_samples, rna, ev_start, ev_length,
                                 ev_mean, ev_stdv);
  int64_t nk = f5c_kmer_ranks(seq, seq_len, k, 0, ranks_out);
  *n_kmers_out = nk;
  if (ne > 0 && nk > 0)
    f5c_mom_scalings(ev_mean, ne, ranks_out, nk, level_mean, shift_out,
                     scale_out);
  else {
    *shift_out = 0.0f;
    *scale_out = 1.0f;
  }
  return ne;
}

// ---------------------------------------------------------------------------
// ABEA batch assembly: fill the padded device arrays for B reads.
// Layout matches ops/abea.py make_batch: rows padded by PAD on both sides.
// ---------------------------------------------------------------------------

void f5c_abea_assemble(
    int64_t B, int64_t E, int64_t K, int64_t PAD,
    const float* ev_concat, const int64_t* ev_off, const int64_t* ev_len,
    const int32_t* rank_concat, const int64_t* rk_off, const int64_t* rk_len,
    const float* level_mean, const float* level_stdv,
    const float* level_log_stdv,
    const float* scale_in, const float* shift_in,
    // outputs (pre-zeroed by caller; ks pre-ones)
    float* ev, float* km, float* ks, float* kl,
    int32_t* n_ev, int32_t* n_km,
    float* scale, float* shift, float* lp_stay, float* lp_step) {
  const double eps = 1e-10;  // p_skip (align.c:210)
  int64_t EW = E + 2 * PAD, KW = K + 2 * PAD;
  for (int64_t b = 0; b < B; b++) {
    const float* e = ev_concat + ev_off[b];
    const int32_t* kr = rank_concat + rk_off[b];
    int64_t ne = ev_len[b], nk = rk_len[b];
    memcpy(ev + b * EW + PAD, e, ne * sizeof(float));
    float* kmr = km + b * KW + PAD;
    float* ksr = ks + b * KW + PAD;
    float* klr = kl + b * KW + PAD;
    for (int64_t i = 0; i < nk; i++) {
      int32_t r = kr[i];
      kmr[i] = level_mean[r];
      ksr[i] = level_stdv[r];
      klr[i] = level_log_stdv[r];
    }
    n_ev[b] = (int32_t)ne;
    n_km[b] = (int32_t)nk;
    scale[b] = scale_in[b];
    shift[b] = shift_in[b];
    double epk = (double)ne / (double)nk;
    double p_stay = 1.0 - 1.0 / (epk + 1.0);
    lp_stay[b] = (float)log(p_stay);
    lp_step[b] = (float)log(1.0 - eps - p_stay);
  }
}

// ---------------------------------------------------------------------------
// postalign + recalibrate (align.c:561-773; oracle abea_ref.py postalign /
// recalibrate_model). Per read. Returns 1 if calibration succeeded.
// ---------------------------------------------------------------------------

int f5c_postalign_recalibrate(
    const int32_t* pair_k, const int32_t* pair_e, int64_t n_pairs,
    const int32_t* ranks, int64_t n_kmers,
    const float* event_means,
    const float* level_mean, const float* level_stdv,
    int64_t min_num_events_to_rescale,
    int32_t* b2e_start, int32_t* b2e_stop,  // [n_kmers], caller-allocated
    double* events_per_base, float* shift_out, float* scale_out,
    float* var_out) {
  for (int64_t i = 0; i < n_kmers; i++) {
    b2e_start[i] = -1;
    b2e_stop[i] = -1;
  }
  int64_t max_event = 0, min_event = INT32_MAX;
  int32_t prev_event = -1;
  for (int64_t i = 0; i < n_pairs; i++) {
    int32_t ki = pair_k[i], ei = pair_e[i];
    if (ei != prev_event) {
      if (b2e_start[ki] == -1) b2e_start[ki] = ei;
      b2e_stop[ki] = ei;
    }
    if (ei > max_event) max_event = ei;
    if (ei < min_event) min_event = ei;
    prev_event = ei;
  }
  *events_per_base = (double)(max_event - min_event) / (double)n_kmers;

  // weighted least squares over 'M'-state calibration records
  double A00 = 0, A01 = 0, A11 = 0, b0 = 0, b1 = 0;
  int64_t num_m = 0;
  int32_t prev_rank = -1;
  // two passes over records: accumulate normal equations, then residuals
  for (int64_t ki = 0; ki < n_kmers; ki++) {
    if (b2e_start[ki] == -1) continue;
    int32_t rank = ranks[ki];
    for (int32_t ei = b2e_start[ki]; ei <= b2e_stop[ki]; ei++) {
      bool is_m = (prev_rank != rank);
      prev_rank = rank;
      if (!is_m) continue;
      num_m++;
      double e = (double)event_means[ei];
      double mu = (double)level_mean[rank];
      double sd = (double)level_stdv[rank];
      double iv = 1.0 / (sd * sd);
      A00 += iv;
      A01 += mu * iv;
      A11 += mu * mu * iv;
      b0 += e * iv;
      b1 += mu * e * iv;
    }
  }
  if (num_m < min_num_events_to_rescale) return 0;
  double div = A00 * A11 - A01 * A01;
  double shift = -(A01 * b1 - A11 * b0) / div;
  double scale = (A00 * b1 - A01 * b0) / div;
  double ss = 0.0;
  prev_rank = -1;
  for (int64_t ki = 0; ki < n_kmers; ki++) {
    if (b2e_start[ki] == -1) continue;
    int32_t rank = ranks[ki];
    for (int32_t ei = b2e_start[ki]; ei <= b2e_stop[ki]; ei++) {
      bool is_m = (prev_rank != rank);
      prev_rank = rank;
      if (!is_m) continue;
      double e = (double)event_means[ei];
      double mu = (double)level_mean[rank];
      double sd = (double)level_stdv[rank];
      double yi = e - shift - scale * mu;
      ss += yi * yi / (sd * sd);
    }
  }
  double var = sqrt(ss / (double)num_m);
  *shift_out = (float)shift;
  *scale_out = (float)scale;
  *var_out = (float)var;
  return 1;
}

// ---------------------------------------------------------------------------
// CpG group collection (meth.c:23-190, 473-567; oracle
// pipeline/methylation.py collect_meth_groups)
// ---------------------------------------------------------------------------

static const int METH_MIN_SEPARATION = 10;
static const int METH_MAX_GROUP_SPAN = 200;

static inline char disamb(char c) {
  // IUPAC -> first symbol (meth.c:225-310); lowercase folded to upper
  if (c >= 'a' && c <= 'z') c = (char)(c - 'a' + 'A');
  switch (c) {
    case 'A': case 'C': case 'G': case 'T': return c;
    case 'S': case 'Y': case 'B': return 'C';
    case 'K': return 'G';
    default: return 'A';  // M R W V H D N and anything else
  }
}

void f5c_disambiguate(const char* seq, int64_t n, char* out) {
  for (int64_t i = 0; i < n; i++) out[i] = disamb(seq[i]);
}

// CIGAR ops (htslib encoding)
enum { CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT = 4,
       CHARD = 5, CPAD_OP = 6, CEQ = 7, CDIFF = 8 };

// closest_event_to (meth.c:100-125): nearest kmer within +-1000 that has
// an event; scan down first, then up.
static int64_t closest_event_to(int64_t k_idx, const int32_t* b2e_start,
                                int64_t n) {
  int64_t lo = k_idx - 1000;
  if (lo < 0) lo = 0;
  int64_t hi = k_idx + 1000;
  if (hi > n - 1) hi = n - 1;
  for (int64_t i = k_idx; i > lo; i--) {
    if (i >= 0 && i < n && b2e_start[i] != -1) return b2e_start[i];
  }
  for (int64_t i = k_idx; i < hi; i++) {
    if (i >= 0 && i < n && b2e_start[i] != -1) return b2e_start[i];
  }
  return -1;
}

// Collect all scoreable CpG groups of one read.
// ref_seq must be pre-disambiguated (f5c_disambiguate).
// Group outputs are caller-allocated with capacity >= number of CpG sites.
// Returns the number of groups emitted.
int64_t f5c_collect_meth_groups(
    const char* ref_seq, int64_t ref_len, int64_t ref_start_pos,
    const int32_t* cigar_ops, const int32_t* cigar_lens, int64_t n_cigar,
    int is_reverse, int64_t read_length,
    const int32_t* b2e_start, int64_t n_kmers_read, int k,
    int64_t* g_start_pos, int64_t* g_end_pos, int32_t* g_n_cpg,
    int64_t* g_sub_start, int64_t* g_sub_end, int64_t* g_e1, int64_t* g_e2) {
  // CpG sites
  std::vector<int64_t> sites;
  for (int64_t i = 0; i + 1 < ref_len; i++) {
    if (ref_seq[i] == 'C' && ref_seq[i + 1] == 'G') sites.push_back(i);
  }
  if (sites.empty()) return 0;

  // event-alignment record: (ref_pos, event_idx) per aligned base
  // (meth.c:132-189), built from the CIGAR walk
  std::vector<int64_t> rec_ref, rec_ev;
  {
    int64_t read_pos = 0, ref_pos = ref_start_pos;
    for (int64_t c = 0; c < n_cigar; c++) {
      int op = cigar_ops[c];
      int64_t ln = cigar_lens[c];
      if (op == CMATCH || op == CEQ || op == CDIFF) {
        for (int64_t j = 0; j < ln; j++) {
          int64_t rp = read_pos + j;
          int64_t gp = ref_pos + j;
          if (rp < k || rp + k >= read_length) continue;
          int64_t kmer_pos = is_reverse ? (read_length - rp - k) : rp;
          int64_t ev = closest_event_to(kmer_pos, b2e_start, n_kmers_read);
          rec_ref.push_back(gp);
          rec_ev.push_back(ev);
        }
        read_pos += ln;
        ref_pos += ln;
      } else if (op == CDEL || op == CREF_SKIP) {
        ref_pos += ln;
      } else if (op == CINS || op == CSOFT) {
        read_pos += ln;
      }  // CHARD, CPAD: nothing
    }
  }
  int64_t nrec = (int64_t)rec_ref.size();
  if (nrec == 0) return 0;
  if (rec_ev[0] == rec_ev[nrec - 1]) return 0;  // degenerate

  int64_t n_groups = 0;
  size_t curr = 0;
  while (curr < sites.size()) {
    size_t end = curr + 1;
    while (end < sites.size() &&
           sites[end] - sites[end - 1] <= METH_MIN_SEPARATION) {
      end++;
    }
    int64_t first = sites[curr];
    int64_t last = sites[end - 1];
    int64_t n_cpg = (int64_t)(end - curr);
    curr = end;

    int64_t sub_start = first - METH_MIN_SEPARATION;
    int64_t sub_end = last + METH_MIN_SEPARATION;
    int64_t span = last - first;
    if (sub_start <= METH_MIN_SEPARATION || span > METH_MAX_GROUP_SPAN) {
      continue;
    }
    int64_t calling_start = sub_start + ref_start_pos;
    int64_t calling_end = sub_end + ref_start_pos;

    // find_by_ref_bounds (meth.c:425-470): binary search over rec_ref
    int64_t start_i = std::lower_bound(rec_ref.begin(), rec_ref.end(),
                                       calling_start) - rec_ref.begin();
    int64_t stop_i = std::lower_bound(rec_ref.begin(), rec_ref.end(),
                                      calling_end) - rec_ref.begin();
    if (start_i == nrec || stop_i == nrec) continue;
    bool left_bounded =
        rec_ref[start_i] <= calling_start ||
        (start_i != 0 && rec_ref[start_i - 1] <= calling_start);
    bool right_bounded =
        rec_ref[stop_i] >= calling_end ||
        (stop_i != nrec && stop_i + 1 < nrec &&
         rec_ref[stop_i + 1] >= calling_start);
    if (!left_bounded || !right_bounded) continue;
    int64_t e1 = rec_ev[start_i], e2 = rec_ev[stop_i];
    // NB: reference computes the ratio with a negative denominator
    // (meth.c:551) so this QC never fires; reproduced for parity.
    double ratio = std::abs((double)(e2 - e1)) /
                   (double)(calling_start - calling_end);
    if (std::abs(e2 - e1) <= 10 || ratio > 20.0) continue;

    g_start_pos[n_groups] = first + ref_start_pos;
    g_end_pos[n_groups] = last + ref_start_pos;
    g_n_cpg[n_groups] = (int32_t)n_cpg;
    g_sub_start[n_groups] = sub_start;
    g_sub_end[n_groups] = sub_end;
    g_e1[n_groups] = e1;
    g_e2[n_groups] = e2;
    n_groups++;
  }
  return n_groups;
}

// ---------------------------------------------------------------------------
// HMM batch assembly: fill the padded [N, pad_k] / [N, pad_e] device arrays
// for one scoring bucket (pipeline/runner.py meth_batch; oracle
// ops/hmm_ref.py window_kmer_ranks + ops/hmm.py make_hmm_batch).
// ---------------------------------------------------------------------------

static const double HMM_P_SKIP = 0.0025;
static const double HMM_P_BAD = 0.001;

static inline char comp(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    default: return 'T';  // matches the Python fallback
  }
}

// methylate: CG -> MG (meth.c:362-385)
static void methylate_buf(char* s, int64_t n) {
  for (int64_t i = 0; i + 1 < n; i++) {
    if (s[i] == 'C' && s[i + 1] == 'G') s[i] = 'M';
  }
}

// meth-aware reverse complement (meth.c:390-423)
static void revcomp_meth(const char* s, int64_t n, char* out) {
  int64_t i = 0, j = n - 1;
  while (i < n) {
    if (s[i] == 'M' && i + 1 < n && s[i + 1] == 'G') {
      out[j] = 'G';
      out[j - 1] = 'M';
      i += 2;
      j -= 2;
    } else {
      out[j] = comp(s[i]);
      i += 1;
      j -= 1;
    }
  }
}

// Assemble one HMM bucket of n_items work items.
//
// Per item i: the window sequence is ref_concat[ref_off[it_read[i]] +
// it_sub_start[i] .. +it_sub_end[i]] (inclusive, pre-disambiguated);
// methylated (CG->MG) when it_meth[i]. Events are
// ev_concat[ev_off[it_read[i]] + ...] walked from it_e1 to it_e2.
// Outputs are row-major [N, pad_k] / [N, pad_e], pre-zeroed except gp_inv
// (pre-ones).
void f5c_hmm_assemble(
    int64_t n_items, int64_t pad_k, int64_t pad_e, int k,
    const char* ref_concat, const int64_t* ref_off,
    const float* ev_concat, const int64_t* ev_off,
    const int32_t* it_read, const int64_t* it_sub_start,
    const int64_t* it_sub_end, const uint8_t* it_meth,
    const int64_t* it_e1, const int64_t* it_e2, const uint8_t* read_rc,
    const float* read_scale, const float* read_shift, const float* read_var,
    const float* read_epb,
    const float* level_mean, const float* level_stdv,
    const float* level_log_stdv,
    float* gp_mean, float* gp_inv, float* gp_log, float* ev_out,
    int32_t* n_km, int32_t* n_ev, float* lp_stay, float* lp_step) {
  std::vector<char> buf, rcbuf;
  for (int64_t i = 0; i < n_items; i++) {
    int32_t rd = it_read[i];
    const char* ref = ref_concat + ref_off[rd];
    int64_t L = it_sub_end[i] - it_sub_start[i] + 1;
    buf.assign(ref + it_sub_start[i], ref + it_sub_start[i] + L);
    if (it_meth[i]) methylate_buf(buf.data(), L);
    int64_t nk = L - k + 1;
    if (nk < 0) nk = 0;
    bool rc = read_rc[rd] != 0;

    float scale = read_scale[rd];
    float shift = read_shift[rd];
    float var = read_var[rd];
    float log_var = logf(var);

    float* gm = gp_mean + i * pad_k;
    float* gi = gp_inv + i * pad_k;
    float* gl = gp_log + i * pad_k;
    if (!rc) {
      for (int64_t ki = 0; ki < nk; ki++) {
        int32_t r = 0;
        for (int j = 0; j < k; j++) r = r * 5 + meth_code(buf[ki + j]);
        gm[ki] = scale * level_mean[r] + shift;
        float sd = level_stdv[r] * var;
        gi[ki] = 1.0f / sd;
        gl[ki] = level_log_stdv[r] + log_var;
      }
    } else {
      // hmm.c:384-401: reverse strand reads the rc sequence from the back
      rcbuf.resize(L);
      revcomp_meth(buf.data(), L, rcbuf.data());
      for (int64_t ki = 0; ki < nk; ki++) {
        int64_t off = L - ki - k;
        int32_t r = 0;
        for (int j = 0; j < k; j++) r = r * 5 + meth_code(rcbuf[off + j]);
        gm[ki] = scale * level_mean[r] + shift;
        float sd = level_stdv[r] * var;
        gi[ki] = 1.0f / sd;
        gl[ki] = level_log_stdv[r] + log_var;
      }
    }
    n_km[i] = (int32_t)nk;

    int64_t e1 = it_e1[i], e2 = it_e2[i];
    int64_t ne = (e2 >= e1 ? e2 - e1 : e1 - e2) + 1;
    int stride = e2 >= e1 ? 1 : -1;
    const float* evs = ev_concat + ev_off[rd];
    float* er = ev_out + i * pad_e;
    for (int64_t j = 0; j < ne; j++) er[j] = evs[e1 + j * stride];
    n_ev[i] = (int32_t)ne;

    double epb = (double)read_epb[rd];
    double p_stay = 1.0 - 1.0 / epb;
    lp_stay[i] = (float)log(p_stay);
    lp_step[i] = (float)log(1.0 - p_stay - HMM_P_SKIP - HMM_P_BAD);
  }
}

// ---------------------------------------------------------------------------
// eventalign TSV emitter (reference src/eventalign.c:2038-2176).
// String formatting of millions of rows is host-bound; this renders one
// read's records into a caller-provided buffer.  Returns bytes written,
// or -1 if the buffer is too small (caller grows and retries).
// ---------------------------------------------------------------------------

static inline char comp_dna(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    default: return 'A';
  }
}

// fast itoa / fixed-point float formatting for the TSV emitter: the
// generic printf path costs ~2us/row (~2.5s on the 112-read set).
// Rounding matches printf for every value whose scaled double is exact
// at a decimal tie (round-half-even); values within ~1 ulp of a tie
// may differ in the last digit — far inside the reference's own
// tolerance (scripts/test.awk: 0.1*|x|+0.02).
static inline int fmt_i64(char* o, long long v) {
  if (v < 0) { *o = '-'; return 1 + fmt_i64(o + 1, -v); }
  char tmp[24];
  int n = 0;
  do { tmp[n++] = (char)('0' + v % 10); v /= 10; } while (v);
  for (int i = 0; i < n; i++) o[i] = tmp[n - 1 - i];
  return n;
}

static inline int fmt_fixed(char* o, double v, int prec) {
  static const double P[6] = {1, 10, 100, 1000, 10000, 100000};
  // v * P[prec] must stay below 2^63 for the integer fast path
  const double lim = 9e18 / P[prec];
  if (!std::isfinite(v) || v >= lim || v <= -lim) {
    char f[8] = {'%', '.', (char)('0' + prec), 'f', 0};
    return sprintf(o, f, v);
  }
  int n = 0;
  if (std::signbit(v)) { o[n++] = '-'; v = -v; }
  double s = v * P[prec];
  unsigned long long ip = (unsigned long long)s;
  double frac = s - (double)ip;
  if (frac > 0.5 || (frac == 0.5 && (ip & 1ULL))) ip++;
  unsigned long long pw = (unsigned long long)P[prec];
  n += fmt_i64(o + n, (long long)(ip / pw));
  o[n++] = '.';
  unsigned long long dec = ip % pw;
  for (int i = prec - 1; i >= 0; i--) {
    o[n + i] = (char)('0' + dec % 10);
    dec /= 10;
  }
  return n + prec;
}

int64_t f5c_emit_eventalign_tsv(
    // records (forward order)
    const int64_t* ref_position, const int64_t* event_idx,
    const uint8_t* state, int64_t n_records, int rc,
    // read event table
    const int64_t* ev_starts, const float* ev_lengths,
    const float* ev_means, const float* ev_stdvs,
    const float* raw_pa,  // may be NULL unless collapse/samples
    // reference segment (disambiguated) + coords
    const char* ref_disamb, int64_t ref_offset,
    // naming
    const char* contig, const char* name_field,
    // model + scaling
    int k, const float* level_mean, const float* level_stdv,
    float scale, float shift, float var, float sample_rate,
    // flags
    int scale_events, int write_signal_index, int collapse,
    int write_samples,
    // output
    char* out, int64_t cap) {
  int64_t len = 0;
  float sqrt_var = sqrtf(var);
  char ref_kmer[16], model_kmer[16];
  if (k <= 0 || k > 9) return -2;  // MAX_KMER_SIZE contract (f5c.h:30)
  const int64_t cl0 = (int64_t)strlen(contig);
  const int64_t nl0 = (int64_t)strlen(name_field);
  int64_t i = 0;
  while (i < n_records) {
    // worst-case row length guard: fixed fields are < 512 bytes, plus
    // the caller-supplied contig/read names (BAM QNAMEs can be 254
    // bytes and contig names are unbounded)
    if (len + 512 + cl0 + nl0 > cap) return -1;
    int64_t e_i = event_idx[i];
    int64_t rp = ref_position[i];
    const char* rk = ref_disamb + (rp - ref_offset);
    memcpy(ref_kmer, rk, k);
    ref_kmer[k] = 0;
    int is_b = state[i] == 1;
    if (is_b) {
      for (int j = 0; j < k; j++) model_kmer[j] = 'N';
    } else if (rc) {
      for (int j = 0; j < k; j++) model_kmer[j] = comp_dna(rk[k - 1 - j]);
    } else {
      memcpy(model_kmer, rk, k);
    }
    model_kmer[k] = 0;

    float event_mean = ev_means[e_i];
    float event_stdv = ev_stdvs[e_i];
    float event_duration = ev_lengths[e_i] / sample_rate;
    int64_t start_idx = ev_starts[e_i];
    int64_t end_idx = start_idx + (int64_t)ev_lengths[e_i];

    int64_t n_collapse = 1;
    if (collapse) {
      while (i + n_collapse < n_records &&
             rp == ref_position[i + n_collapse]) {
        n_collapse++;
      }
      if (n_collapse > 1 && raw_pa) {
        int64_t e_j = event_idx[i + n_collapse - 1];
        int64_t s2 = ev_starts[e_j];
        int64_t e2 = s2 + (int64_t)ev_lengths[e_j];
        if (s2 < start_idx) start_idx = s2;
        if (e2 > end_idx) end_idx = e2;
        double m = 0;
        int64_t ns = end_idx - start_idx;
        for (int64_t j = start_idx; j < end_idx; j++) m += raw_pa[j];
        // reference accumulates in float; difference is negligible and
        // inside the output precision (%.2f)
        event_mean = (float)(m / ns);
        double v = 0;
        for (int64_t j = start_idx; j < end_idx; j++) {
          double d = raw_pa[j] - event_mean;
          v += d * d;
        }
        event_stdv = (float)sqrt(v / ns);
        event_duration = (float)ns / sample_rate;
      }
    }

    // rank of the model kmer (2-bit)
    int32_t rank = 0;
    for (int j = 0; j < k; j++) rank = (rank << 2) | dna_code(model_kmer[j]);
    float model_mean = 0.0f, model_stdv = 0.0f;
    if (scale_events) {
      event_mean = (event_mean - shift) / scale;
      if (!is_b) {
        model_mean = level_mean[rank];
        model_stdv = level_stdv[rank];
      }
    } else if (!is_b) {
      model_mean = scale * level_mean[rank] + shift;
      model_stdv = level_stdv[rank] * var;
    }
    float standard_level = (event_mean - model_mean)
                           / (sqrt_var * model_stdv);

    {
      char* o = out + len;
      memcpy(o, contig, cl0); o += cl0; *o++ = '\t';
      o += fmt_i64(o, rp); *o++ = '\t';
      memcpy(o, ref_kmer, k); o += k; *o++ = '\t';
      memcpy(o, name_field, nl0); o += nl0;
      *o++ = '\t'; *o++ = 't'; *o++ = '\t';
      o += fmt_i64(o, e_i); *o++ = '\t';
      o += fmt_fixed(o, event_mean, 2); *o++ = '\t';
      o += fmt_fixed(o, event_stdv, 3); *o++ = '\t';
      o += fmt_fixed(o, event_duration, 5); *o++ = '\t';
      memcpy(o, model_kmer, k); o += k; *o++ = '\t';
      o += fmt_fixed(o, model_mean, 2); *o++ = '\t';
      o += fmt_fixed(o, model_stdv, 2); *o++ = '\t';
      o += fmt_fixed(o, standard_level, 2);
      if (write_signal_index) {
        *o++ = '\t';
        o += fmt_i64(o, start_idx); *o++ = '\t';
        o += fmt_i64(o, end_idx);
      }
      len = o - out;
    }
    if (write_samples && raw_pa) {
      if (len + 16 * (end_idx - start_idx) + 16 > cap) return -1;
      out[len++] = '\t';
      for (int64_t j = start_idx; j < end_idx; j++) {
        float s = (raw_pa[j] - shift) / scale;
        len += sprintf(out + len, "%g", s);
        if (j + 1 < end_idx) out[len++] = ',';
      }
    }
    out[len++] = '\n';
    i += n_collapse;
  }
  return len;
}

// ---------------------------------------------------------------------------
// StreamVByte zigzag-delta codec — the SLOW5/BLOW5 signal compression
// (slow5lib slow5_press.c ptr_compress_svb_zd / ptr_depress_svb_zd +
// thirdparty/streamvbyte, scalar variant).  Layout: u32 count-of-u32s,
// then ceil(N/4) 2-bit-key control bytes, then variable-length data.
// ---------------------------------------------------------------------------

static inline uint32_t zigzag_enc(int32_t v) {
  return ((uint32_t)(v + v)) ^ ((uint32_t)(v >> 31));
}
static inline int32_t zigzag_dec(uint32_t v) {
  return (int32_t)(v >> 1) ^ -(int32_t)(v & 1);
}

#if defined(__SSSE3__)
// Per-control-byte shuffle masks for the 4-values-at-a-time decode: for
// key byte k (2-bit codes c0..c3, lengths ci+1), mask[k] gathers the
// packed little-endian bytes into 4 zero-extended u32 lanes; len[k] is
// the total packed length (the classic streamvbyte decode shuffle).
struct SvbTables {
  alignas(16) int8_t mask[256][16];
  uint8_t len[256];
  SvbTables() {
    for (int k = 0; k < 256; k++) {
      int pos = 0;
      for (int lane = 0; lane < 4; lane++) {
        int L = ((k >> (2 * lane)) & 3) + 1;
        for (int b = 0; b < 4; b++)
          mask[k][4 * lane + b] = (b < L) ? (int8_t)(pos + b) : (int8_t)-1;
        pos += L;
      }
      len[k] = (uint8_t)pos;
    }
  }
};
static const SvbTables svb_tables;
#endif

// Decode an svb-zd blob into int16 samples; returns N (or -1 on overflow).
int64_t f5c_svb_zd_decode(const uint8_t* in, int64_t n_bytes,
                          int16_t* out, int64_t max_out) {
  if (n_bytes < 4) return 0;
  uint32_t count;
  memcpy(&count, in, 4);
  if ((int64_t)count > max_out) return -1;
  // truncated/garbled blob: the control-byte region must fit before we
  // walk it (the count prefix is attacker/corruption-controlled)
  if (4 + (int64_t)((count + 3) / 4) > n_bytes) return -2;
  const uint8_t* key = in + 4;
  const uint8_t* data = key + ((count + 3) / 4);
  const uint8_t* end = in + n_bytes;
  int32_t prev = 0;
  uint32_t c = 0;
#if defined(__SSSE3__)
  // 4 samples per control byte: shuffle-expand to u32, zigzag, in-register
  // prefix sum (exact integer ops — bitwise identical to the scalar tail)
  const __m128i zero = _mm_setzero_si128();
  const __m128i one = _mm_set1_epi32(1);
  const __m128i pack16 = _mm_setr_epi8(0, 1, 4, 5, 8, 9, 12, 13,
                                       -1, -1, -1, -1, -1, -1, -1, -1);
  __m128i vprev = _mm_set1_epi32(0);
  while (c + 4 <= count && data + 16 <= end) {
    uint8_t k = *key++;
    __m128i raw = _mm_loadu_si128((const __m128i*)data);
    data += svb_tables.len[k];
    __m128i v = _mm_shuffle_epi8(
        raw, _mm_load_si128((const __m128i*)svb_tables.mask[k]));
    // zigzag: (v >> 1) ^ -(v & 1)
    __m128i d = _mm_xor_si128(_mm_srli_epi32(v, 1),
                              _mm_sub_epi32(zero, _mm_and_si128(v, one)));
    // inclusive prefix sum over 4 lanes + carried prev
    d = _mm_add_epi32(d, _mm_slli_si128(d, 4));
    d = _mm_add_epi32(d, _mm_slli_si128(d, 8));
    vprev = _mm_add_epi32(d, vprev);
    // low 16 bits of each lane (wrapping, as the scalar (int16_t) cast)
    _mm_storel_epi64((__m128i*)(out + c),
                     _mm_shuffle_epi8(vprev, pack16));
    vprev = _mm_shuffle_epi32(vprev, _MM_SHUFFLE(3, 3, 3, 3));
    c += 4;
  }
  prev = (int32_t)_mm_cvtsi128_si32(vprev);
#endif
  // scalar tail (also the full path without SSSE3); the SIMD loop always
  // stops on a control-byte boundary (c % 4 == 0), so shift restarts at 0
  int shift = 0;
  uint8_t k = (c < count) ? *key++ : 0;
  for (; c < count; c++) {
    if (shift == 8) {
      shift = 0;
      k = *key++;
    }
    int code = (k >> shift) & 3;
    uint32_t val = 0;
    if (data + code + 1 > end) return -2;  // truncated data region
    memcpy(&val, data, code + 1);  // little-endian
    data += code + 1;
    shift += 2;
    int32_t d = zigzag_dec(val);
    prev += d;
    out[c] = (int16_t)prev;
  }
  return (int64_t)count;
}

// Encode int16 samples as svb-zd; out capacity must be >= 4 + ceil(N/4)
// + 4*N.  Returns total bytes written.
int64_t f5c_svb_zd_encode(const int16_t* in, int64_t n, uint8_t* out) {
  uint32_t count = (uint32_t)n;
  memcpy(out, &count, 4);
  uint8_t* key = out + 4;
  int64_t key_len = (n + 3) / 4;
  memset(key, 0, key_len);
  uint8_t* data = key + key_len;
  int32_t prev = 0;
  for (int64_t i = 0; i < n; i++) {
    int32_t v = (int32_t)in[i];
    uint32_t val = zigzag_enc(v - prev);
    prev = v;
    int code;
    if (val < (1u << 8)) {
      *data = (uint8_t)val;
      data += 1;
      code = 0;
    } else if (val < (1u << 16)) {
      memcpy(data, &val, 2);
      data += 2;
      code = 1;
    } else if (val < (1u << 24)) {
      memcpy(data, &val, 3);
      data += 3;
      code = 2;
    } else {
      memcpy(data, &val, 4);
      data += 4;
      code = 3;
    }
    key[i / 4] |= (uint8_t)(code << ((i % 4) * 2));
  }
  return (int64_t)(data - out);
}

// ---------------------------------------------------------------------------
// Chunk Viterbi for eventalign (reference src/hmm.c:313-533 with the
// ProfileHMMViterbiOutputR9 policy + src/eventalign.c:625-920 backtrace).
// The device kernel (ops/hmm.py hmm_viterbi_rounds) is the batched path;
// this host version serves lockstep rounds with few active reads, where
// the tunnelled chip's dispatch latency exceeds the compute.
// Movements are emitted in walk order (same contract as the device).
// ---------------------------------------------------------------------------

enum { VHMT_SAME_M = 0, VHMT_PREV_M, VHMT_SAME_B, VHMT_PREV_B,
       VHMT_PREV_K, VHMT_SOFT };
enum { VPS_K = 0, VPS_B = 1, VPS_M = 2 };

int64_t f5c_viterbi_chunk(
    const int32_t* ranks, int64_t rank_stride, int64_t n_kmers,
    const float* ev_pool, int64_t e_start, int stride, int64_t n_events,
    float scale, float shift, float var, double events_per_base,
    const float* level_mean, const float* level_stdv,
    const float* level_log_stdv,
    uint8_t* movements_out) {
  if (n_kmers < 1 || n_events < 1) return 0;  // nothing to align
  const float NEGINF = -INFINITY;
  int64_t n_rows = n_events + 1;
  int64_t nb = n_kmers + 2;   // blocks incl. terminal 0 and n_kmers+1

  // block transitions (hmm.c:237-307), identical for every block
  float p_stay = (float)(1.0 - (1.0 / events_per_base));
  float p_skip = 0.0025f, p_bad = 0.001f, p_skip_self = 0.3f;
  float lp_mk = logf(p_skip);
  float lp_mb = logf(p_bad);
  float lp_mm_self = logf(p_stay);
  float lp_mm_next = logf(1.0f - p_stay - p_skip - p_bad);
  float lp_bb = logf(p_bad);
  float lp_b3 = logf((1.0f - p_bad) / 3);
  float lp_kk = logf(p_skip_self);
  float lp_km = logf(1.0f - p_skip_self);
  const float LOG_INV_SQRT_2PI = -0.918938f;
  float log_var = logf(var);
  const float pre0 = logf(0.5f);  // pre_flank[0] = log(1 - 0.5)

  // per-kmer scaled gaussians (division like the reference, not
  // reciprocal-multiply, for exact emission parity); buffers are
  // thread-local and grow-only — the whole-read realign loop calls this
  // ~200x per read and a full-plane -inf fill would cost more than the
  // DP itself (only row 0 and each row's block-0 column are ever read
  // without first being written)
  static thread_local std::vector<float> gm, gs, gl, em, M, B, K;
  static thread_local std::vector<uint8_t> bmM, bmB, bmK;
  if ((int64_t)gm.size() < n_kmers) {
    gm.resize(n_kmers); gs.resize(n_kmers); gl.resize(n_kmers);
    em.resize(n_kmers);
  }
  for (int64_t ki = 0; ki < n_kmers; ki++) {
    int32_t r = ranks[ki * rank_stride];
    gm[ki] = scale * level_mean[r] + shift;
    gs[ki] = level_stdv[r] * var;
    gl[ki] = level_log_stdv[r] + log_var;
  }

  // state PLANES (struct-of-arrays): the M/B pass over blocks is then
  // data-parallel and auto-vectorizes; only the K chain stays scalar
  if ((int64_t)M.size() < n_rows * nb) {
    M.resize(n_rows * nb); B.resize(n_rows * nb); K.resize(n_rows * nb);
    bmM.resize(n_rows * nb); bmB.resize(n_rows * nb);
    bmK.resize(n_rows * nb);
  }
  for (int64_t blk = 0; blk < nb; blk++) {
    M[blk] = NEGINF; B[blk] = NEGINF; K[blk] = NEGINF;
    bmM[blk] = 0; bmB[blk] = 0; bmK[blk] = 0;
  }

  for (int64_t row = 1; row < n_rows; row++) {
    float* __restrict Mc = M.data() + row * nb;
    float* __restrict Bc = B.data() + row * nb;
    float* __restrict Kc = K.data() + row * nb;
    const float* __restrict Mp = M.data() + (row - 1) * nb;
    const float* __restrict Bp = B.data() + (row - 1) * nb;
    const float* __restrict Kp = K.data() + (row - 1) * nb;
    uint8_t* bM = bmM.data() + row * nb;
    uint8_t* bB = bmB.data() + row * nb;
    uint8_t* bK = bmK.data() + row * nb;
    Mc[0] = NEGINF; Bc[0] = NEGINF; Kc[0] = NEGINF;
    bM[0] = 0; bB[0] = 0; bK[0] = 0;
    float e = ev_pool[e_start + (row - 1) * stride];

    for (int64_t ki = 0; ki < n_kmers; ki++) {
      float a = (e - gm[ki]) / gs[ki];
      em[ki] = LOG_INV_SQRT_2PI - gl[ki] + (-0.5f * a * a);
    }

    // MATCH + BAD_EVENT: branch-free so the loop vectorizes over
    // blocks (prev-row deps only).  The running-max tie rule ("last
    // equal index wins", hmm.c update_cell) is equivalent to "last
    // index equal to the FINAL max": any later candidate that ties its
    // own running max either equals or exceeds every earlier one.
    const float* __restrict emv = em.data();
#pragma GCC ivdep
    for (int64_t ki = 0; ki < n_kmers; ki++) {
      int64_t blk = ki + 1;
      float s0 = lp_mm_self + Mp[blk];
      float s1 = lp_mm_next + Mp[blk - 1];
      float s2 = lp_b3 + Bp[blk];
      float s3 = lp_b3 + Bp[blk - 1];
      float s4 = lp_km + Kp[blk - 1];
      float mx01 = s1 > s0 ? s1 : s0;
      float mx23 = s3 > s2 ? s3 : s2;
      float mx = mx01 > mx23 ? mx01 : mx23;
      mx = s4 > mx ? s4 : mx;
      int32_t frm = 0;
      frm = (s1 == mx) ? 1 : frm;
      frm = (s2 == mx) ? 2 : frm;
      frm = (s3 == mx) ? 3 : frm;
      frm = (s4 == mx) ? 4 : frm;
      Mc[blk] = mx + emv[ki];
      bM[blk] = (uint8_t)frm;

      float b_m = lp_mb + Mp[blk];
      float b_b = lp_bb + Bp[blk];
      Bc[blk] = b_b >= b_m ? b_b : b_m;
      bB[blk] = (uint8_t)(b_b >= b_m ? VHMT_SAME_B : VHMT_SAME_M);
    }
    if (row == 1) {   // soft start into kmer 0 (HMT_FROM_SOFT, index 5)
      float s5 = pre0;
      // recompute block 1's MATCH including the soft term
      float s0 = lp_mm_self + Mp[1];
      float s1 = lp_mm_next + Mp[0];
      float s2 = lp_b3 + Bp[1];
      float s3 = lp_b3 + Bp[0];
      float s4 = lp_km + Kp[0];
      float mx = s0;
      uint8_t frm = 0;
      mx = s1 > mx ? s1 : mx; frm = mx == s1 ? (uint8_t)1 : frm;
      mx = s2 > mx ? s2 : mx; frm = mx == s2 ? (uint8_t)2 : frm;
      mx = s3 > mx ? s3 : mx; frm = mx == s3 ? (uint8_t)3 : frm;
      mx = s4 > mx ? s4 : mx; frm = mx == s4 ? (uint8_t)4 : frm;
      mx = s5 > mx ? s5 : mx; frm = mx == s5 ? (uint8_t)5 : frm;
      Mc[1] = mx + em[0];
      bM[1] = frm;
    }

    // KMER_SKIP chain in closed d-space form (the same max-plus
    // reformulation the device kernel uses, ops/hmm.py:434-450):
    //   c_blk = max(lp_mk + M_{blk-1}, lp_b3 + B_{blk-1})
    //   d_blk = c_blk - (blk-1)*lp_kk ; K_blk = (blk-1)*lp_kk +
    //   prefix_max(d) — prefix max is exactly associative, so the SIMD
    //   block scan below is bit-identical to the scalar tail.  Ties:
    //   chain (PREV_K) wins when the running max predates the column;
    //   PREV_B beats PREV_M on equal c.
#if F5C_KCHAIN_AVX512
    {
      const float g = lp_kk;
      const __m512 ninf = _mm512_set1_ps(-INFINITY);
      const __m512 vmk = _mm512_set1_ps(lp_mk);
      const __m512 vb3 = _mm512_set1_ps(lp_b3);
      const __m512 vg = _mm512_set1_ps(g);
      const __m512i b15 = _mm512_set1_epi32(15);
      const __m512i mfrm = _mm512_set1_epi32(VHMT_PREV_M);
      const __m512i bfrm = _mm512_set1_epi32(VHMT_PREV_B);
      const __m512i kfrm = _mm512_set1_epi32(VHMT_PREV_K);
      const __m512 idx0 = _mm512_cvtepi32_ps(_mm512_setr_epi32(
          0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15));
      __m512 carry = ninf;
      int64_t blk = 1;
      for (; blk + 16 <= n_kmers + 1; blk += 16) {
        __m512 m = _mm512_loadu_ps(Mc + blk - 1);
        __m512 b = _mm512_loadu_ps(Bc + blk - 1);
        __m512 c2 = _mm512_add_ps(vb3, b);
        __m512 c = _mm512_max_ps(_mm512_add_ps(vmk, m), c2);
        __m512 ig = _mm512_mul_ps(_mm512_add_ps(
            idx0, _mm512_set1_ps((float)(blk - 1))), vg);
        __m512 d = _mm512_sub_ps(c, ig);
        __m512 x = d, t;
        t = _mm512_castsi512_ps(_mm512_alignr_epi32(
            _mm512_castps_si512(x), _mm512_castps_si512(ninf), 15));
        x = _mm512_max_ps(x, t);
        t = _mm512_castsi512_ps(_mm512_alignr_epi32(
            _mm512_castps_si512(x), _mm512_castps_si512(ninf), 14));
        x = _mm512_max_ps(x, t);
        t = _mm512_castsi512_ps(_mm512_alignr_epi32(
            _mm512_castps_si512(x), _mm512_castps_si512(ninf), 12));
        x = _mm512_max_ps(x, t);
        t = _mm512_castsi512_ps(_mm512_alignr_epi32(
            _mm512_castps_si512(x), _mm512_castps_si512(ninf), 8));
        x = _mm512_max_ps(x, t);
        x = _mm512_max_ps(x, carry);
        __m512 xprev = _mm512_castsi512_ps(_mm512_alignr_epi32(
            _mm512_castps_si512(x), _mm512_castps_si512(ninf), 15));
        xprev = _mm512_mask_mov_ps(xprev, 1, carry);
        carry = _mm512_permutexvar_ps(b15, x);
        _mm512_storeu_ps(Kc + blk, _mm512_add_ps(ig, x));
        __mmask16 chain = _mm512_cmp_ps_mask(xprev, d, _CMP_GE_OQ);
        __mmask16 fromb = _mm512_cmp_ps_mask(c2, c, _CMP_EQ_OQ);
        __m512i f = _mm512_mask_blend_epi32(fromb, mfrm, bfrm);
        f = _mm512_mask_blend_epi32(chain, f, kfrm);
        _mm_storeu_si128((__m128i*)(bK + blk), _mm512_cvtepi32_epi8(f));
      }
      float cp = _mm512_cvtss_f32(carry);
      for (; blk <= n_kmers; blk++) {
        float c2 = lp_b3 + Bc[blk - 1];
        float c1 = lp_mk + Mc[blk - 1];
        float c = c1 > c2 ? c1 : c2;
        float ig = (float)(blk - 1) * g;
        float d = c - ig;
        float mr = d > cp ? d : cp;
        Kc[blk] = ig + mr;
        bK[blk] = (cp >= d) ? VHMT_PREV_K
                  : (c2 == c) ? VHMT_PREV_B : VHMT_PREV_M;
        cp = mr;
      }
    }
#else
    {
      const float g = lp_kk;
      float cp = -INFINITY;                 // running prefix max of d
      for (int64_t blk = 1; blk <= n_kmers; blk++) {
        float c2 = lp_b3 + Bc[blk - 1];
        float c1 = lp_mk + Mc[blk - 1];
        float c = c1 > c2 ? c1 : c2;
        float ig = (float)(blk - 1) * g;
        float d = c - ig;
        float mr = d > cp ? d : cp;
        Kc[blk] = ig + mr;
        bK[blk] = (cp >= d) ? VHMT_PREV_K
                  : (c2 == c) ? VHMT_PREV_B : VHMT_PREV_M;
        cp = mr;
      }
    }
#endif
  }

  // backtrace from (last row, MATCH of last kmer block)
  int64_t n = 0;
  int64_t row = n_rows - 1;
  int64_t blk = n_kmers;
  int ps = VPS_M;
  while (row > 0) {
    int64_t kmer_idx = blk - 1;
    uint8_t mv = ps == VPS_M ? bmM[row * nb + blk]
                 : ps == VPS_B ? bmB[row * nb + blk]
                 : bmK[row * nb + blk];
    movements_out[n++] = mv;
    if (mv == VHMT_SOFT) break;
    if (mv == VHMT_PREV_M || mv == VHMT_PREV_B || mv == VHMT_PREV_K) {
      kmer_idx -= 1;
    }
    int next_ps = (mv == VHMT_SAME_M || mv == VHMT_PREV_M) ? VPS_M
                  : (mv == VHMT_SAME_B || mv == VHMT_PREV_B) ? VPS_B
                  : VPS_K;
    if (ps != VPS_K) row -= 1;
    blk = kmer_idx + 1;
    ps = next_ps;
  }
  return n;
}

// Decode a packed 2-bit backtrace walk (4 direction codes per byte,
// little-endian within the byte; 0=diag, 1=up, 2=left) into ascending
// aligned pairs, then postalign + recalibrate in the same pass.  This is
// the host half of the compact ABEA output contract: the device ships the
// walk (n/4 bytes) instead of the pairs (8n bytes).
// pairs_k/pairs_e are caller-allocated with capacity n.
int f5c_decode_postalign(
    const uint8_t* packed_dirs, int64_t n, int64_t start_event,
    const int32_t* ranks, int64_t n_kmers,
    const float* event_means,
    const float* level_mean, const float* level_stdv,
    int64_t min_num_events_to_rescale,
    int32_t* pairs_k, int32_t* pairs_e,
    int32_t* b2e_start, int32_t* b2e_stop,
    double* events_per_base, float* shift_out, float* scale_out,
    float* var_out) {
  int64_t k = n_kmers - 1, e = start_event;
  for (int64_t i = 0; i < n; i++) {
    // a corrupt walk (device/transfer fault) would drive k or e
    // negative and turn the b2e scatter into an OOB write — bail
    if (k < 0 || e < 0) return -1;
    // walk order is reverse path order; fill ascending from the back
    pairs_k[n - 1 - i] = (int32_t)k;
    pairs_e[n - 1 - i] = (int32_t)e;
    // branch-free decode (0=FROM_D: k-1,e-1; 1=FROM_U: e-1; 2=FROM_L:
    // k-1) — the direction stream mispredicts branches constantly
    int d = (packed_dirs[i >> 2] >> ((i & 3) * 2)) & 3;
    k -= d != 1;
    e -= d < 2;
  }
  return f5c_postalign_recalibrate(
      pairs_k, pairs_e, n, ranks, n_kmers, event_means, level_mean,
      level_stdv, min_num_events_to_rescale, b2e_start, b2e_stop,
      events_per_base, shift_out, scale_out, var_out);
}

// Decode + QC + postalign in one pass: the host half of the event-ring
// ABEA contract (ops/abea_ring.py), where the device ships ONLY the
// packed walk + pair count and the alignment QC of src/align.c:526-543
// (avg log emission / spanned / max gap) is evaluated here, bit-equal
// to the NumPy oracle (f32 arithmetic, walk-order accumulation,
// -ffp-contract=off).  *failed_out reports the QC verdict; postalign +
// recalibration only run when QC passes.
int f5c_decode_qc_postalign(
    const uint8_t* packed_dirs, int64_t n, int64_t start_event,
    const int32_t* ranks, int64_t n_kmers,
    const float* event_means,
    const float* level_mean, const float* level_stdv,
    const float* level_log_stdv,
    float scale, float shift,
    float min_avg_log_emission, int32_t max_gap_threshold,
    int64_t min_num_events_to_rescale,
    int32_t* pairs_k, int32_t* pairs_e,
    int32_t* b2e_start, int32_t* b2e_stop,
    double* events_per_base, float* shift_out, float* scale_out,
    float* var_out, float* sum_em_out, int32_t* max_gap_out,
    int32_t* failed_out) {
  const float log_inv_sqrt_2pi = -0.918938f;
  int64_t k = n_kmers - 1, e = start_event;
  int32_t gap = 0, max_gap = 0;
  int64_t last_k = -1;
  *sum_em_out = 0.0f;
  *max_gap_out = 0;
  // pass 1: serial walk — pairs + gap tracking only (the (k,e) chain is
  // inherently sequential, but stripped of the emission math it runs at
  // ~5 ops/step)
  for (int64_t i = 0; i < n; i++) {
    if (k < 0 || e < 0) {  // corrupt walk: fail the read, never scatter
      *failed_out = 1;
      return 0;
    }
    pairs_k[n - 1 - i] = (int32_t)k;
    pairs_e[n - 1 - i] = (int32_t)e;
    last_k = k;
    // branch-free: the direction stream flips every few steps, so
    // data-dependent branches mispredict constantly (0=step: k-1,e-1;
    // 1=stay: e-1; 2=skip: k-1, gap run)
    int d = (packed_dirs[i >> 2] >> ((i & 3) * 2)) & 3;
    int is_skip = d >= 2;      // (3 is invalid; grouped with skip as
    k -= d != 1;               // the branchy original's else did)
    e -= d < 2;
    gap = (gap + 1) & -is_skip;
    max_gap = gap > max_gap ? gap : max_gap;
  }
  // pass 2: per-pair Gaussian log emission, element-exact and freely
  // vectorisable (gathers); the ACCUMULATION stays a separate serial
  // f32 loop in walk order (i ascending = pair index descending) so
  // sum_em is bit-identical to the fused original
  static thread_local std::vector<float> em_buf;
  if ((int64_t)em_buf.size() < n) em_buf.resize(n);
  float* em = em_buf.data();
  int64_t j = 0;
#if defined(__AVX512F__)
  {
    const __m512 vscale = _mm512_set1_ps(scale);
    const __m512 vshift = _mm512_set1_ps(shift);
    const __m512 vc = _mm512_set1_ps(log_inv_sqrt_2pi);
    const __m512 vmh = _mm512_set1_ps(-0.5f);
    for (; j + 16 <= n; j += 16) {
      __m512i vk = _mm512_loadu_si512(pairs_k + j);
      __m512i ve = _mm512_loadu_si512(pairs_e + j);
      __m512i vrk = _mm512_i32gather_epi32(vk, ranks, 4);
      __m512 lm = _mm512_i32gather_ps(vrk, level_mean, 4);
      __m512 ls = _mm512_i32gather_ps(vrk, level_stdv, 4);
      __m512 ll = _mm512_i32gather_ps(vrk, level_log_stdv, 4);
      __m512 evm = _mm512_i32gather_ps(ve, event_means, 4);
      // a = (ev - (scale*lm + shift)) / ls   — no FMA (fp-contract off)
      __m512 pred = _mm512_add_ps(_mm512_mul_ps(vscale, lm), vshift);
      __m512 a = _mm512_div_ps(_mm512_sub_ps(evm, pred), ls);
      // em = (c - ll) + (-0.5f * a * a)
      __m512 t = _mm512_mul_ps(vmh, _mm512_mul_ps(a, a));
      _mm512_storeu_ps(em + j, _mm512_add_ps(_mm512_sub_ps(vc, ll), t));
    }
  }
#endif
  for (; j < n; j++) {
    int32_t rk = ranks[pairs_k[j]];
    float a = (event_means[pairs_e[j]] - (scale * level_mean[rk] + shift))
              / level_stdv[rk];
    em[j] = (log_inv_sqrt_2pi - level_log_stdv[rk]) + (-0.5f * a * a);
  }
  float sum_em = 0.0f;
  for (int64_t i = 0; i < n; i++) sum_em += em[n - 1 - i];
  float avg = sum_em / (n > 0 ? (float)n : 1.0f);
  int spanned = (n > 0) && (last_k == 0);
  *sum_em_out = sum_em;
  *max_gap_out = max_gap;
  *failed_out = (avg < min_avg_log_emission) || !spanned
                || (max_gap > max_gap_threshold) || (n == 0);
  if (*failed_out) return 0;
  return f5c_postalign_recalibrate(
      pairs_k, pairs_e, n, ranks, n_kmers, event_means, level_mean,
      level_stdv, min_num_events_to_rescale, b2e_start, b2e_stop,
      events_per_base, shift_out, scale_out, var_out);
}

// ---------------------------------------------------------------------------
// Whole-read eventalign re-alignment: the full chunk loop of
// src/eventalign.c:1267-1531 (align_read_to_ref) in one native call —
// segment iteration, ~100-ref-base chunk cursor, per-chunk Viterbi
// (f5c_viterbi_chunk), movement decode, OUTPUT_STRIDE-capped commit.
// The Python lockstep engine (pipeline/eventalign.py) carries identical
// cursor logic and serves as the oracle + the device-round path; this
// entry removes ~200us of per-chunk Python/ctypes overhead on the
// single-CPU host (21k chunks on the 112-read set).
// ---------------------------------------------------------------------------

static const int EA_ALIGN_STRIDE = 100;   // eventalign.c:1338
static const int EA_OUTPUT_STRIDE = 50;   // eventalign.c:1339

// closest-event lookup with the reference's scan bounds
// (eventalign.c:971-996): nearest filled b2e_start entry, down-scan
// first with exclusive stop, then up-scan
struct EaClosest {
  const int32_t* b2e;
  std::vector<int64_t> back, fwd;
  int64_t n;
  void init(const int32_t* b, int64_t nk) {
    b2e = b;
    n = nk;
    back.resize(nk);
    fwd.resize(nk);
    int64_t last = -1;
    for (int64_t i = 0; i < nk; i++) {
      if (b2e[i] != -1) last = i;
      back[i] = last;
    }
    int64_t nxt = nk + 10;
    for (int64_t i = nk - 1; i >= 0; i--) {
      if (b2e[i] != -1) nxt = i;
      fwd[i] = nxt;
    }
  }
  int64_t operator()(int64_t k) const {
    if (k >= 1) {
      int64_t b = back[k < n ? k : n - 1];
      int64_t stop = k - 1000 > 0 ? k - 1000 : 0;
      if (b > stop) return b2e[b];
    }
    int64_t stop_after = (k + 1000 < n - 1) ? k + 1000 : n - 1;
    int64_t f = k < n ? fwd[k] : n + 10;
    if (f < stop_after) return b2e[f];
    return -1;
  }
};

static int64_t ea_end_pair(const int64_t* ref_pos, int64_t n_pairs,
                           int64_t ref_pos_max, int64_t from) {
  // first index after `from` whose ref exceeds max, minus one
  // (eventalign.c:928-938); binary search on the ascending ref column
  int64_t lo = from, hi = n_pairs;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (ref_pos[mid] <= ref_pos_max) lo = mid + 1; else hi = mid;
  }
  if (lo >= n_pairs) return n_pairs - 1;
  return lo - 1;
}

int64_t f5c_realign_read(
    const int32_t* fwd_ranks, const int32_t* rc_ranks, int64_t n_ref,
    int64_t ref_offset,
    int k, int64_t read_len, int rc,
    const float* ev_means, int64_t n_events,
    const int32_t* b2e_start, int64_t n_read_kmers,
    // segments: concatenated (ref, read) pair columns + offsets
    const int64_t* seg_ref, const int64_t* seg_read,
    const int64_t* seg_off, int64_t n_segs,
    float scale, float shift, float var, double events_per_base,
    const float* level_mean, const float* level_stdv,
    const float* level_log_stdv,
    int64_t* out_ref, int64_t* out_ev, uint8_t* out_state,
    int64_t cap) {
  EaClosest closest;
  closest.init(b2e_start, n_read_kmers);
  int64_t n_out = 0;
  int64_t L = n_ref;  // ref_disamb length == n_ref (ranks arrays have
                      // L-k+1 entries; callers pass L)
  std::vector<uint8_t> movs;
  movs.resize(4096);

  for (int64_t si = 0; si < n_segs; si++) {
    const int64_t* pr = seg_ref + seg_off[si];
    const int64_t* pq = seg_read + seg_off[si];
    int64_t np = seg_off[si + 1] - seg_off[si];
    // trim to max kmer index (eventalign.c:956-966)
    int64_t max_kmer_idx = read_len - k;
    while (np > 0 && pq[np - 1] > max_kmer_idx) np--;
    if (np == 0) return n_out;   // reference returns early
    int64_t ks = pq[0], ke = pq[np - 1];
    if (rc) {
      ks = read_len - ks - k;
      ke = read_len - ke - k;
    }
    int64_t first_event = closest(ks);
    int64_t last_event = closest(ke);
    int fwdd = first_event < last_event;
    int64_t curr_start_event = first_event;
    int64_t curr_start_ref = pr[0];
    int64_t curr_pair_idx = 0;

    for (;;) {
      if (!((fwdd && curr_start_event < last_event)
            || (!fwdd && curr_start_event > last_event)))
        break;
      int64_t end_pair_idx = ea_end_pair(
          pr, np, curr_start_ref + EA_ALIGN_STRIDE, curr_pair_idx);
      int64_t curr_end_ref = pr[end_pair_idx];
      int64_t curr_end_read = pq[end_pair_idx];
      if (rc) curr_end_read = read_len - curr_end_read - k;
      int64_t s = curr_start_ref - ref_offset;
      int64_t l = curr_end_ref - curr_start_ref + 1;
      if (l < 2 * k) break;
      int64_t e_stop = closest(curr_end_read);
      int64_t diff = curr_start_event - e_stop;
      if (diff < 0) diff = -diff;
      if (diff < 2) break;
      int stride = curr_start_event < e_stop ? 1 : -1;
      int64_t n_kmers = l - k + 1;
      int64_t n_ev = diff + 1;
      const int32_t* rks;
      int64_t rstride;
      if (!rc) {
        rks = fwd_ranks + s;
        rstride = 1;
      } else {
        rks = rc_ranks + (L - s - k);
        rstride = -1;
      }
      if ((int64_t)movs.size() < n_ev + n_kmers + 4)
        movs.resize(n_ev + n_kmers + 4);
      double tv = prof_on() ? prof_now() : 0.0;
      int64_t n_mv = f5c_viterbi_chunk(
          rks, rstride, n_kmers, ev_means, curr_start_event, stride,
          n_ev, scale, shift, var, events_per_base, level_mean,
          level_stdv, level_log_stdv, movs.data());
      if (prof_on()) {
        double t1 = prof_now();
        g_prof[0] += t1 - tv;
        tv = t1;
      }

      // decode movements (walk order = reverse path) + commit with the
      // OUTPUT_STRIDE cap (eventalign.c:1424-1521)
      int last_section = end_pair_idx == np - 1;
      // reconstruct (event, kmer, state) in FORWARD order and emit
      // rows where state != K and event != e_start
      int64_t row = n_ev, kmer = n_kmers - 1;
      int ps = 2;  // M
      // first pass: walk to collect states in reverse; emit forward
      // by replaying from the end of a temporary stack
      static thread_local std::vector<int64_t> t_ev, t_km;
      static thread_local std::vector<uint8_t> t_ps;
      t_ev.clear(); t_km.clear(); t_ps.clear();
      for (int64_t i = 0; i < n_mv; i++) {
        t_ev.push_back(curr_start_event + (row - 1) * stride);
        t_km.push_back(kmer);
        t_ps.push_back((uint8_t)ps);
        int mv = movs[i];
        if (mv == 1 || mv == 3 || mv == 4) kmer--;   // PREV_* moves
        if (ps != 0) row--;                          // K is silent
        static const int next_ps[6] = {2, 2, 1, 1, 0, 0};
        ps = next_ps[mv];
      }
      // forward order = reversed walk; apply emit mask + stride cap
      int64_t emitted = 0;
      int64_t last_event_output = -1, last_ref_kmer_output = -1;
      for (int64_t i = (int64_t)t_ev.size() - 1; i >= 0; i--) {
        uint8_t st = t_ps[i];
        int64_t ev = t_ev[i];
        if (st == 0 || ev == curr_start_event) continue;
        if (!last_section && emitted >= EA_OUTPUT_STRIDE) break;
        if (n_out >= cap) return -1;
        out_ref[n_out] = curr_start_ref + t_km[i];
        out_ev[n_out] = ev;
        out_state[n_out] = st;
        n_out++;
        emitted++;
        last_event_output = ev;
        last_ref_kmer_output = curr_start_ref + t_km[i];
      }
      if (prof_on()) g_prof[1] += prof_now() - tv;
      if (emitted == 0) break;
      curr_start_event = last_event_output;
      curr_start_ref = last_ref_kmer_output;
      curr_pair_idx = ea_end_pair(pr, np, curr_start_ref, curr_pair_idx);
    }
  }
  return n_out;
}

void f5c_prof_get(double* out) {
  for (int i = 0; i < 8; i++) {
    out[i] = g_prof[i];
    g_prof[i] = 0.0;
  }
}

// Render one read's methylation TSV rows (f5c.c:1030-1062 format) in a
// single call.  strand: 0 -> v1 layout (no strand column), '+'/'-' ->
// v2.  llr = llm - llu computed in double, matching the Python float
// property; the fast fixed-point formatter (fm_f2 below, same
// certainty-window scheme as the freq-merge emitter) and Python's :.2f
// are both correctly-rounded decimal conversions, so rows stay
// byte-identical to the Python renderer.
static char* fm_itoa(long long v, char* p);
static char* fm_f2(double d, char* p);

int64_t f5c_format_meth_rows(
    const char* contig, const char* qname, int strand,
    int64_t n_rows,
    const int64_t* starts, const int64_t* ends,
    const double* llm, const double* llu,
    const int32_t* strands_scored, const int32_t* n_cpg,
    const char* seq_concat, const int64_t* seq_off,
    char* out, int64_t cap) {
  size_t cl = strlen(contig), ql = strlen(qname);
  int64_t w = 0;
  for (int64_t i = 0; i < n_rows; i++) {
    int64_t sl = seq_off[i + 1] - seq_off[i];
    if (cap - w < (int64_t)(cl + ql + sl) + 192) return -1;
    char* p = out + w;
    memcpy(p, contig, cl);
    p += cl;
    *p++ = '\t';
    if (strand != 0) {
      *p++ = (char)strand;
      *p++ = '\t';
    }
    p = fm_itoa((long long)starts[i], p);
    *p++ = '\t';
    p = fm_itoa((long long)ends[i], p);
    *p++ = '\t';
    memcpy(p, qname, ql);
    p += ql;
    *p++ = '\t';
    p = fm_f2(llm[i] - llu[i], p);
    *p++ = '\t';
    p = fm_f2(llm[i], p);
    *p++ = '\t';
    p = fm_f2(llu[i], p);
    *p++ = '\t';
    p = fm_itoa(strands_scored[i], p);
    *p++ = '\t';
    p = fm_itoa(n_cpg[i], p);
    *p++ = '\t';
    memcpy(p, seq_concat + seq_off[i], (size_t)sl);
    p += sl;
    *p++ = '\n';
    w = p - out;
  }
  return w;
}

// Slim variant of f5c_hmm_assemble for device-side assembly: only the
// per-item kmer ranks (padded [N, pad_k] row-major, int16 when the model
// fits) and window kmer counts. The device gathers the model tables and
// builds event windows itself, so the host->device transfer is compact.
void f5c_hmm_window_ranks(
    int64_t n_items, int64_t pad_k, int k,
    const char* ref_concat, const int64_t* ref_off,
    const int32_t* it_read, const int64_t* it_sub_start,
    const int64_t* it_sub_end, const uint8_t* it_meth,
    const uint8_t* read_rc,
    int use_i16, void* ranks_out, int32_t* n_km) {
  std::vector<char> buf, rcbuf;
  int16_t* r16 = (int16_t*)ranks_out;
  int32_t* r32 = (int32_t*)ranks_out;
  for (int64_t i = 0; i < n_items; i++) {
    int32_t rd = it_read[i];
    const char* ref = ref_concat + ref_off[rd];
    int64_t L = it_sub_end[i] - it_sub_start[i] + 1;
    buf.assign(ref + it_sub_start[i], ref + it_sub_start[i] + L);
    if (it_meth[i]) methylate_buf(buf.data(), L);
    int64_t nk = L - k + 1;
    if (nk < 0) nk = 0;
    const char* s = buf.data();
    int64_t base = i * pad_k;
    if (read_rc[rd]) {
      rcbuf.resize(L);
      revcomp_meth(buf.data(), L, rcbuf.data());
      for (int64_t ki = 0; ki < nk; ki++) {
        int64_t off = L - ki - k;
        int32_t r = 0;
        for (int j = 0; j < k; j++) r = r * 5 + meth_code(rcbuf[off + j]);
        if (use_i16) r16[base + ki] = (int16_t)r; else r32[base + ki] = r;
      }
    } else {
      for (int64_t ki = 0; ki < nk; ki++) {
        int32_t r = 0;
        for (int j = 0; j < k; j++) r = r * 5 + meth_code(s[ki + j]);
        if (use_i16) r16[base + ki] = (int16_t)r; else r32[base + ki] = r;
      }
    }
    n_km[i] = (int32_t)nk;
  }
}

// Struct-of-arrays variant: scores arrive as the device f32 arrays
// (promoted to double exactly like the Python float() the legacy path
// used), sequences as [seq_start, seq_end) byte ranges into the
// disambiguated reference segment, and strands_scored is the constant
// 1 of the single-strand caller (f5c.c:1030-1062 rows).  Rows are
// byte-identical to f5c_format_meth_rows / the Python renderer.
int64_t f5c_format_meth_rows_soa(
    const char* contig, const char* qname, int strand,
    int64_t n_rows,
    const int64_t* starts, const int64_t* ends,
    const float* llm, const float* llu, const int32_t* n_cpg,
    const char* dis, int64_t dis_len,
    const int64_t* seq_start, const int64_t* seq_end,
    char* out, int64_t cap) {
  size_t cl = strlen(contig), ql = strlen(qname);
  int64_t w = 0;
  for (int64_t i = 0; i < n_rows; i++) {
    int64_t s0 = seq_start[i] < 0 ? 0 : seq_start[i];
    int64_t s1 = seq_end[i] > dis_len ? dis_len : seq_end[i];
    int64_t sl = s1 > s0 ? s1 - s0 : 0;
    if (cap - w < (int64_t)(cl + ql) + sl + 192) return -1;
    char* p = out + w;
    memcpy(p, contig, cl);
    p += cl;
    *p++ = '\t';
    if (strand != 0) {
      *p++ = (char)strand;
      *p++ = '\t';
    }
    p = fm_itoa((long long)starts[i], p);
    *p++ = '\t';
    p = fm_itoa((long long)ends[i], p);
    *p++ = '\t';
    memcpy(p, qname, ql);
    p += ql;
    *p++ = '\t';
    double m = (double)llm[i], u = (double)llu[i];
    p = fm_f2(m - u, p);
    *p++ = '\t';
    p = fm_f2(m, p);
    *p++ = '\t';
    p = fm_f2(u, p);
    *p++ = '\t';
    *p++ = '1';
    *p++ = '\t';
    p = fm_itoa(n_cpg[i], p);
    *p++ = '\t';
    memcpy(p, dis + s0, (size_t)sl);
    p += sl;
    *p++ = '\n';
    w = p - out;
  }
  return w;
}

// ---------------------------------------------------------------------------
// meth-freq aggregation (reference src/freq.c; oracle pipeline/freq.py).
// Stateful accumulator: the Python driver streams the TSV body through
// f5c_freq_accumulate in large chunks; lines the strict parser is not
// certain about (anything Python's int()/float() might treat differently)
// are handed back verbatim via f5c_freq_rejects so the Python engine can
// apply its exact semantics (including raising the located malformed-line
// error).  Decisions (|llr| >= threshold, llr > 0) are double-precision,
// matching the Python engine bit for bit.
// ---------------------------------------------------------------------------

struct FreqSite {
  int32_t group_size;
  int64_t num_reads, called, meth;
  std::string seq;
};

struct FreqKey {
  int32_t chrom;
  int64_t s, e;
  bool operator==(const FreqKey& o) const {
    return chrom == o.chrom && s == o.s && e == o.e;
  }
};

struct FreqKeyHash {
  size_t operator()(const FreqKey& k) const {
    uint64_t h = (uint64_t)(uint32_t)k.chrom;
    h = (h ^ (uint64_t)k.s) * 0x9E3779B97F4A7C15ull;
    h = (h ^ (h >> 29) ^ (uint64_t)k.e) * 0xBF58476D1CE4E5B9ull;
    return (size_t)(h ^ (h >> 32));
  }
};

struct FreqState {
  int version = 1;
  int split_groups = 0;
  double thresh = 2.5;
  int64_t next_lineno = 2;  // body starts after the header line
  std::vector<std::string> chroms;
  std::unordered_map<std::string, int32_t> chrom_ids;
  std::unordered_map<FreqKey, FreqSite, FreqKeyHash> sites;
  std::string rejects;               // '\n'-terminated verbatim lines
  std::vector<int64_t> reject_lines; // absolute 1-based line numbers
  std::string out;                   // emit buffer
  int32_t last_chrom_id = -1;
  std::string last_chrom;
};

// strict int64 field parse mirroring Python int(): optional surrounding
// whitespace and sign, decimal digits only; anything else (underscores,
// hex, overflow past 18 digits) is "uncertain" -> caller rejects the line
// to the Python engine.
static bool freq_i64(const char* b, const char* e, int64_t* v) {
  while (b < e && isspace((unsigned char)*b)) b++;
  bool neg = false;
  if (b < e && (*b == '+' || *b == '-')) neg = (*b++ == '-');
  if (b >= e || !isdigit((unsigned char)*b)) return false;
  uint64_t x = 0;
  int nd = 0;
  while (b < e && isdigit((unsigned char)*b)) {
    if (++nd > 18) return false;
    x = x * 10 + (uint64_t)(*b++ - '0');
  }
  while (b < e && isspace((unsigned char)*b)) b++;
  if (b != e) return false;
  *v = neg ? -(int64_t)x : (int64_t)x;
  return true;
}

static bool freq_f64(const char* b, const char* e, double* v) {
  size_t n = (size_t)(e - b);
  char tmp[64];
  if (n == 0 || n >= sizeof(tmp)) return false;
  // strtod accepts hex floats ("0x1p3"); Python float() does not
  for (size_t i = 0; i < n; i++) {
    if (b[i] == 'x' || b[i] == 'X' || b[i] == '_') return false;
    tmp[i] = b[i];
  }
  tmp[n] = 0;
  char* end = nullptr;
  double x = strtod(tmp, &end);
  if (end == tmp) return false;
  while (*end && isspace((unsigned char)*end)) end++;
  if (*end) return false;
  *v = x;
  return true;
}

static int32_t freq_chrom_id(FreqState* S, const char* b, const char* e) {
  size_t n = (size_t)(e - b);
  if (S->last_chrom_id >= 0 && S->last_chrom.size() == n &&
      memcmp(S->last_chrom.data(), b, n) == 0)
    return S->last_chrom_id;
  std::string s(b, e);
  auto it = S->chrom_ids.find(s);
  int32_t id;
  if (it == S->chrom_ids.end()) {
    id = (int32_t)S->chroms.size();
    S->chroms.push_back(s);
    S->chrom_ids.emplace(std::move(s), id);
  } else {
    id = it->second;
  }
  S->last_chrom = S->chroms[(size_t)id];
  S->last_chrom_id = id;
  return id;
}

static void freq_site_update(FreqState* S, int32_t cid, int64_t s, int64_t e,
                             int32_t gsz, const char* seq, size_t seq_len,
                             int64_t called_inc, int64_t meth_inc) {
  FreqKey k{cid, s, e};
  auto it = S->sites.find(k);
  if (it == S->sites.end())
    it = S->sites
             .emplace(k, FreqSite{gsz, 0, 0, 0, std::string(seq, seq_len)})
             .first;
  it->second.num_reads += 1;
  it->second.called += called_inc;
  it->second.meth += meth_inc;
}

// One body line (without its '\n'; one trailing '\r' already stripped by
// the caller to match Python universal newlines).  Returns false when the
// line must be re-processed by the Python engine.
static bool freq_line(FreqState* S, const char* b, const char* e) {
  const char* p = b;
  while (p < e && isspace((unsigned char)*p)) p++;
  if (p == e) return true;  // blank line: skipped (freq.py:46)
  const char* fs[12];
  const char* fe[12];
  int nf = 0;
  p = b;
  while (nf < 12) {
    const char* t = (const char*)memchr(p, '\t', (size_t)(e - p));
    fs[nf] = p;
    fe[nf] = t ? t : e;
    nf++;
    if (!t) break;
    p = t + 1;
  }
  int ic, is_, ie_, il, in_, iq;
  if (S->version == 2) {
    ic = 0; is_ = 2; ie_ = 3; il = 5; in_ = 9; iq = 10;
  } else {
    ic = 0; is_ = 1; ie_ = 2; il = 4; in_ = 8; iq = 9;
  }
  if (nf <= iq) return false;  // too few columns: Python raises
  int64_t start, end2, num64;
  double llr;
  if (!freq_i64(fs[is_], fe[is_], &start)) return false;
  if (!freq_i64(fs[ie_], fe[ie_], &end2)) return false;
  if (!freq_f64(fs[il], fe[il], &llr)) return false;
  if (!freq_i64(fs[in_], fe[in_], &num64)) return false;
  if (num64 < 0 || num64 > INT32_MAX) return false;
  if (fabs(llr) < S->thresh) return true;  // below call threshold
  int64_t meth1 = llr > 0 ? 1 : 0;
  int32_t cid = freq_chrom_id(S, fs[ic], fe[ic]);
  const char* sq = fs[iq];
  const char* sqe = fe[iq];
  if (S->split_groups && num64 > 1) {
    long first = -1;
    for (const char* q = sq; q + 1 < sqe; q++)
      if (q[0] == 'C' && q[1] == 'G') {
        first = (long)(q - sq);
        break;
      }
    if (first >= 0) {
      for (const char* q = sq + first; q + 1 < sqe; q++) {
        if (q[0] == 'C' && q[1] == 'G') {
          int64_t pos = start + (q - sq) - first;
          freq_site_update(S, cid, pos, pos, 1, "split-group", 11, 1, meth1);
        }
      }
    }
  } else {
    freq_site_update(S, cid, start, end2, (int32_t)num64, sq,
                     (size_t)(sqe - sq), num64, meth1 ? num64 : 0);
  }
  return true;
}

void* f5c_freq_new(int version, int split_groups, double thresh) {
  FreqState* S = new FreqState();
  S->version = version;
  S->split_groups = split_groups;
  S->thresh = thresh;
  return S;
}

// Consumes complete lines from buf; returns bytes consumed (the caller
// carries any trailing partial line into the next chunk).
int64_t f5c_freq_accumulate(void* stv, const char* buf, int64_t n) {
  FreqState* S = (FreqState*)stv;
  int64_t pos = 0;
  while (pos < n) {
    const char* nl = (const char*)memchr(buf + pos, '\n', (size_t)(n - pos));
    if (!nl) break;
    int64_t len = nl - (buf + pos);
    int64_t body = len;
    if (body > 0 && buf[pos + body - 1] == '\r') body--;  // CRLF
    if (!freq_line(S, buf + pos, buf + pos + body)) {
      S->rejects.append(buf + pos, (size_t)body);
      S->rejects.push_back('\n');
      S->reject_lines.push_back(S->next_lineno);
    }
    S->next_lineno++;
    pos = (nl - buf) + 1;
  }
  return pos;
}

// Lines the strict parser handed back; the Python engine re-processes
// them with exact CPython number semantics (or raises the located error).
int64_t f5c_freq_rejects(void* stv, const char** data, int64_t* data_len,
                         const int64_t** linenos) {
  FreqState* S = (FreqState*)stv;
  *data = S->rejects.data();
  *data_len = (int64_t)S->rejects.size();
  *linenos = S->reject_lines.data();
  return (int64_t)S->reject_lines.size();
}

// Direct site update, used by the Python engine for reject lines.
void f5c_freq_update(void* stv, const char* chrom, int64_t chrom_len,
                     int64_t start, int64_t end, int32_t group_size,
                     const char* seq, int64_t seq_len, int64_t called_inc,
                     int64_t meth_inc) {
  FreqState* S = (FreqState*)stv;
  int32_t cid = freq_chrom_id(S, chrom, chrom + chrom_len);
  freq_site_update(S, cid, start, end, group_size, seq, (size_t)seq_len,
                   called_inc, meth_inc);
}

// Sorted (chrom bytes, start, end) table, header included; the returned
// pointer stays valid until f5c_freq_free.
int64_t f5c_freq_emit(void* stv, const char* motif_word, const char** data) {
  FreqState* S = (FreqState*)stv;
  struct Row {
    const std::string* cn;
    FreqKey k;
    const FreqSite* st;
  };
  std::vector<Row> rows;
  rows.reserve(S->sites.size());
  for (auto& kv : S->sites)
    rows.push_back(Row{&S->chroms[(size_t)kv.first.chrom], kv.first,
                       &kv.second});
  std::sort(rows.begin(), rows.end(), [](const Row& a, const Row& b) {
    int c = a.cn->compare(*b.cn);
    if (c) return c < 0;
    if (a.k.s != b.k.s) return a.k.s < b.k.s;
    return a.k.e < b.k.e;
  });
  std::string& o = S->out;
  o.clear();
  o += "chromosome\tstart\tend\tnum_";
  o += motif_word;
  o += "_in_group\tcalled_sites\tcalled_sites_methylated\t"
       "methylated_frequency\tgroup_sequence\n";
  char tmp[96];
  for (auto& r : rows) {
    if (r.st->called <= 0) continue;
    double f = (double)r.st->meth / (double)r.st->called;
    o += *r.cn;
    int h = snprintf(tmp, sizeof tmp, "\t%lld\t%lld\t%d\t%lld\t%lld\t%.3f\t",
                     (long long)r.k.s, (long long)r.k.e,
                     (int)r.st->group_size, (long long)r.st->called,
                     (long long)r.st->meth, f);
    o.append(tmp, (size_t)h);
    o += r.st->seq;
    o += '\n';
  }
  *data = o.data();
  return (int64_t)o.size();
}

void f5c_freq_free(void* stv) { delete (FreqState*)stv; }

// ---------------------------------------------------------------------------
// freq-merge: k-way merge of sorted frequency tables (reference
// src/freq_merge.c; oracle pipeline/freq.py freq_merge).  Same pick-the-
// smallest-head algorithm as heapq.merge (ties to the lowest file index),
// so output bytes match the Python engine for any input, sorted or not.
// Only called/methylated/frequency are rewritten; all other bytes of the
// surviving (first-encountered) row pass through verbatim.
// ---------------------------------------------------------------------------

// CPython-compatible int(): surrounding whitespace, sign, decimal digits
// with single underscores strictly between digits.
static bool fm_py_i64(const char* b, const char* e, int64_t* v) {
  while (b < e && isspace((unsigned char)*b)) b++;
  while (e > b && isspace((unsigned char)e[-1])) e--;
  bool neg = false;
  if (b < e && (*b == '+' || *b == '-')) neg = (*b++ == '-');
  uint64_t x = 0;
  int nd = 0;
  bool last_us = true;
  for (const char* p = b; p < e; p++) {
    if (*p == '_') {
      if (last_us) return false;
      last_us = true;
      continue;
    }
    if (!isdigit((unsigned char)*p)) return false;
    if (++nd > 18) return false;
    x = x * 10 + (uint64_t)(*p - '0');
    last_us = false;
  }
  if (last_us) return false;  // no digits, or trailing underscore
  *v = neg ? -(int64_t)x : (int64_t)x;
  return true;
}

struct FMFile {
  FILE* f = nullptr;
  char* lp = nullptr;
  size_t lcap = 0;
  int64_t lineno = 1;  // header consumed as line 1
  bool has = false;
  // current row: verbatim slices + parsed numbers; the chromosome is
  // prefix[0:chrom_len] (field 0), no separate copy
  std::string prefix, suffix;
  size_t chrom_len = 0;
  int64_t s = 0, e = 0, called = 0, meth = 0;
};

// Advance to the next non-blank row; false at EOF.  *bad set on a row the
// Python engine would also fail on (field count < 8 or non-int numbers).
static bool fm_next(FMFile* F, bool* bad) {
  *bad = false;
  for (;;) {
    ssize_t n = getline(&F->lp, &F->lcap, F->f);
    if (n < 0) {
      F->has = false;
      return false;
    }
    F->lineno++;
    while (n > 0 && (F->lp[n - 1] == '\n')) n--;
    if (n > 0 && F->lp[n - 1] == '\r') n--;  // universal newlines
    const char* b = F->lp;
    const char* e = F->lp + n;
    const char* p = b;
    while (p < e && isspace((unsigned char)*p)) p++;
    if (p == e) continue;  // blank line: skipped
    const char* fs[9];
    const char* fe[9];
    int nf = 0;
    p = b;
    while (nf < 9) {
      const char* t = (const char*)memchr(p, '\t', (size_t)(e - p));
      fs[nf] = p;
      fe[nf] = t ? t : e;
      nf++;
      if (!t) break;
      p = t + 1;
    }
    if (nf < 8 || !fm_py_i64(fs[1], fe[1], &F->s) ||
        !fm_py_i64(fs[2], fe[2], &F->e) ||
        !fm_py_i64(fs[4], fe[4], &F->called) ||
        !fm_py_i64(fs[5], fe[5], &F->meth)) {
      *bad = true;
      F->has = false;
      return false;
    }
    F->chrom_len = (size_t)(fe[0] - fs[0]);
    F->prefix.assign(b, fe[3]);          // fields 0..3 verbatim
    F->suffix.assign(fs[7], e);          // fields 7.. verbatim
    F->has = true;
    return true;
  }
}

static int fm_key_cmp(const char* ca, size_t na, int64_t sa, int64_t ea,
                      const char* cb, size_t nb, int64_t sb, int64_t eb) {
  int c = memcmp(ca, cb, na < nb ? na : nb);
  if (c) return c;
  if (na != nb) return na < nb ? -1 : 1;
  if (sa != sb) return sa < sb ? -1 : 1;
  if (ea != eb) return ea < eb ? -1 : 1;
  return 0;
}

static char* fm_itoa(long long v, char* p) {
  if (v < 0) {
    *p++ = '-';
    v = -v;
  }
  char t[24];
  int k = 0;
  do {
    t[k++] = (char)('0' + v % 10);
    v /= 10;
  } while (v);
  while (k) *p++ = t[--k];
  return p;
}

// %.3f with printf's exact rounding: the fast path handles the certain
// cases (multiply error << distance from the .0005 boundary); exact-tie
// neighbourhoods and negatives/huge values go through sprintf itself.
static char* fm_f3(double d, char* p) {
  if (!(d >= 0) || d >= 9.2e15) return p + sprintf(p, "%.3f", d);
  double t = d * 1000.0;
  long long n = (long long)t;
  double frac = t - (double)n;
  long long digit;
  if (frac > 0.5 + 1e-9)
    digit = n + 1;
  else if (frac < 0.5 - 1e-9)
    digit = n;
  else
    return p + sprintf(p, "%.3f", d);
  p = fm_itoa(digit / 1000, p);
  long long r = digit % 1000;
  *p++ = '.';
  *p++ = (char)('0' + r / 100);
  *p++ = (char)('0' + (r / 10) % 10);
  *p++ = (char)('0' + r % 10);
  return p;
}

// %.2f with printf's exact rounding (same certainty-window scheme as
// fm_f3); negatives route through the sign so -0.00 matches printf.
static char* fm_f2(double d, char* p) {
  if (d != d) return p + sprintf(p, "%.2f", d);
  if (std::signbit(d)) {
    *p++ = '-';
    d = -d;
  }
  if (d >= 9.2e15) return p + sprintf(p, "%.2f", d);
  double t = d * 100.0;
  long long n = (long long)t;
  double frac = t - (double)n;
  long long digit;
  if (frac > 0.5 + 1e-9)
    digit = n + 1;
  else if (frac < 0.5 - 1e-9)
    digit = n;
  else
    return p + sprintf(p, "%.2f", d);
  p = fm_itoa(digit / 100, p);
  long long r = digit % 100;
  *p++ = '.';
  *p++ = (char)('0' + r / 10);
  *p++ = (char)('0' + r % 10);
  return p;
}

struct FMOut {
  FILE* f;
  std::vector<char> buf;
  size_t len = 0;
  explicit FMOut(FILE* out) : f(out), buf((1 << 20) + 4096) {}
  void put(const char* d, size_t n) {
    if (len + n > buf.size()) {
      flush();
      if (n > buf.size()) {  // oversized row piece: write through
        fwrite_unlocked(d, 1, n, f);
        return;
      }
    }
    memcpy(buf.data() + len, d, n);
    len += n;
  }
  void flush() {
    if (len) fwrite_unlocked(buf.data(), 1, len, f);
    len = 0;
  }
};

static void fm_emit(FMOut* out, const std::string& prefix, int64_t called,
                    int64_t meth, const std::string& suffix) {
  double f = called ? (double)meth / (double)called : 0.0;
  char mid[96];
  char* mp = mid;
  *mp++ = '\t';
  mp = fm_itoa(called, mp);
  *mp++ = '\t';
  mp = fm_itoa(meth, mp);
  *mp++ = '\t';
  mp = fm_f3(f, mp);
  *mp++ = '\t';
  out->put(prefix.data(), prefix.size());
  out->put(mid, (size_t)(mp - mid));
  out->put(suffix.data(), suffix.size());
  out->put("\n", 1);
}

// Returns 0 ok; 1 differing headers; 2 malformed row (*err_file 0-based,
// *err_line 1-based); 3 open/read failure (*err_file).  Writes the merged
// table (header included) to a dup of out_fd.
int64_t f5c_freq_merge(const char* const* paths, int64_t n_paths,
                       int out_fd, int64_t* err_file, int64_t* err_line) {
  std::vector<FMFile> files((size_t)n_paths);
  FILE* out = nullptr;
  FMOut* fmout = nullptr;
  int64_t rc = 0;
  std::string header;
  *err_file = -1;
  *err_line = -1;
  for (int64_t i = 0; i < n_paths; i++) {
    files[(size_t)i].f = fopen(paths[i], "rb");
    if (!files[(size_t)i].f) {
      *err_file = i;
      rc = 3;
      goto done;
    }
    setvbuf(files[(size_t)i].f, nullptr, _IOFBF, 1 << 20);
    ssize_t n = getline(&files[(size_t)i].lp, &files[(size_t)i].lcap,
                        files[(size_t)i].f);
    if (n < 0) {
      *err_file = i;
      rc = 3;
      goto done;
    }
    while (n > 0 && files[(size_t)i].lp[n - 1] == '\n') n--;
    if (n > 0 && files[(size_t)i].lp[n - 1] == '\r') n--;
    std::string h(files[(size_t)i].lp, (size_t)n);
    if (i == 0) {
      header = h;
    } else if (h != header) {
      rc = 1;
      goto done;
    }
  }
  out = fdopen(dup(out_fd), "w");
  if (!out) {
    rc = 3;
    goto done;
  }
  fwrite(header.data(), 1, header.size(), out);
  fputc('\n', out);
  fmout = new FMOut(out);
  {
    bool bad = false;
    for (int64_t i = 0; i < n_paths; i++) {
      if (!fm_next(&files[(size_t)i], &bad) && bad) {
        *err_file = i;
        *err_line = files[(size_t)i].lineno;
        rc = 2;
        goto done;
      }
    }
    bool have_pend = false;
    std::string p_prefix, p_suffix;
    size_t p_clen = 0;
    int64_t p_s = 0, p_e = 0, p_called = 0, p_meth = 0;
    for (;;) {
      int64_t mi = -1;
      for (int64_t i = 0; i < n_paths; i++) {
        FMFile& F = files[(size_t)i];
        if (!F.has) continue;
        if (mi < 0 ||
            fm_key_cmp(F.prefix.data(), F.chrom_len, F.s, F.e,
                       files[(size_t)mi].prefix.data(),
                       files[(size_t)mi].chrom_len, files[(size_t)mi].s,
                       files[(size_t)mi].e) < 0)
          mi = i;
      }
      if (mi < 0) break;
      FMFile& F = files[(size_t)mi];
      if (have_pend &&
          fm_key_cmp(p_prefix.data(), p_clen, p_s, p_e, F.prefix.data(),
                     F.chrom_len, F.s, F.e) == 0) {
        p_called += F.called;
        p_meth += F.meth;
      } else {
        if (have_pend) fm_emit(fmout, p_prefix, p_called, p_meth, p_suffix);
        have_pend = true;
        p_clen = F.chrom_len;
        p_s = F.s;
        p_e = F.e;
        p_called = F.called;
        p_meth = F.meth;
        p_prefix.swap(F.prefix);   // fm_next refills F's buffers; the
        p_suffix.swap(F.suffix);   // swap recycles allocations both ways
      }
      if (!fm_next(&F, &bad) && bad) {
        *err_file = mi;
        *err_line = F.lineno;
        rc = 2;
        goto done;
      }
    }
    if (have_pend) fm_emit(fmout, p_prefix, p_called, p_meth, p_suffix);
  }
done:
  if (fmout) {
    fmout->flush();
    delete fmout;
  }
  if (out) fclose(out);
  for (auto& F : files) {
    if (F.f) fclose(F.f);
    free(F.lp);
  }
  return rc;
}

// resquiggle TSV rows (reference src/resquiggle.c:317-443; oracle: the
// Python loop in pipeline/resquiggle.py _emit_read): per-kmer signal
// start/end, '.' where unaligned.  Caller passes the (already
// RNA-flipped) base-to-event map.  Returns bytes written, -1 on a full
// buffer.
int64_t f5c_emit_resquiggle_tsv(
    const char* qname, int64_t n_kmers, int rna,
    const int32_t* b2e_start, const int32_t* b2e_stop, int64_t n_events,
    const int64_t* ev_start, const float* ev_len,
    char* out, int64_t cap) {
  size_t ql = strlen(qname);
  char* p = out;
  char* end = out + cap;
  for (int64_t j = 0; j < n_kmers; j++) {
    if (end - p < (int64_t)ql + 72) return -1;
    memcpy(p, qname, ql);
    p += ql;
    *p++ = '\t';
    p = fm_itoa(rna ? (n_kmers - j - 1) : j, p);
    *p++ = '\t';
    long long sig_s = -1, sig_e = -1;
    int32_t se = b2e_start[j];
    if (se != -1) {
      // python-oracle indexing: negatives wrap (numpy), out-of-range is
      // an error (-2) rather than a wild read
      long long si = se < 0 ? se + n_events : se;
      long long ei = b2e_stop[j];
      if (ei < 0) ei += n_events;
      if (si < 0 || si >= n_events || ei < 0 || ei >= n_events) return -2;
      sig_s = (long long)ev_start[si];
      sig_e = (long long)ev_start[ei] + (long long)ev_len[ei];
    }
    if (sig_s < 0) *p++ = '.'; else p = fm_itoa(sig_s, p);
    *p++ = '\t';
    if (sig_e < 0) *p++ = '.'; else p = fm_itoa(sig_e, p);
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
