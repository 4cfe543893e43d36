// Native (C++) fast path for the joint-refit variant descent
// (core/notes.py refit_gains_variants_host stages 1+2).
//
// The reference delegates all native work to numpy/PyTorch internals
// (SURVEY.md §2.1: Python throughout); this framework's device compute
// rides XLA/Pallas, and THIS file is the native equivalent for the one
// hot HOST path: per-note emission refinement, measured at ~15.7 ms per
// 10-s clip in pure numpy (docs/PERFORMANCE.md "Host emission budget")
// — a Python-level loop of sweeps x notes x variants tiny gathers that
// BLAS cannot amortize.  The semantics here mirror the numpy
// implementation op-for-op; discrete decisions (instrument, duration)
// compare mantissa-truncated f32 values exactly like the Python path
// (DECISION_DROP_BITS), so decisions are identical; the continuous
// gains may differ from numpy's BLAS accumulation order in last ulps —
// both the TPU and golden paths call THIS SAME implementation, so MIDI
// parity between them is unaffected (see core/notes.py dispatch).
//
// Built on demand by amt_saga_tpu/native/__init__.py with g++ -O2 into
// a content-addressed .so; loaded via ctypes.  No Python.h dependency.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

constexpr int kDropBits = 13;  // == core/notes._DECISION_DROP_BITS

// Mirror of _quantize_decisions_f32: f64 -> f32 (round to nearest),
// view as int32, drop the low mantissa bits, view back.
inline float quantize(double x) {
  float f = static_cast<float>(x);
  int32_t i;
  std::memcpy(&i, &f, sizeof(i));
  i &= ~((int32_t(1) << kDropBits) - 1);
  std::memcpy(&f, &i, sizeof(f));
  return f;
}

// One variant-comparing descent stage (the `descend` closure in
// core/notes.py refit_gains_variants_host); shared by the exported
// per-lane entry and the batch driver below.  Scratch buffers
// (gaa_all[n*V], g_v[V], obj_q[V]) are caller-provided so the batch
// driver allocates once.
static void descend_core(const int64_t* t, const int64_t* qd_var,
                         const int64_t* d_var, const int64_t* i_var,
                         const double* d0, const uint8_t* allowed,
                         const float* gram, int64_t qd_n, int64_t tmax,
                         int64_t n, int64_t V, int64_t n_pitches,
                         int64_t n_durations, int64_t sweeps,
                         const int64_t* p, int64_t* prog, int64_t* dsel,
                         double* h, int64_t* qb, double* gaa_all,
                         double* g_v, float* obj_q) {
  const float kNegInfF = -std::numeric_limits<float>::infinity();
  const int64_t band = 2 * tmax - 1;
  // gaa depends only on the static variant set (hoisted, like numpy).
  const float* g_center = gram + (tmax - 1) * qd_n * qd_n;
  for (int64_t a = 0; a < n; ++a)
    for (int64_t v = 0; v < V; ++v) {
      int64_t q = qd_var[a * V + v];
      double gaa = static_cast<double>(g_center[q * qd_n + q]);
      gaa_all[a * V + v] = gaa > 1e-12 ? gaa : 1e-12;
    }
  for (int64_t s = 0; s < sweeps; ++s) {
    for (int64_t a = 0; a < n; ++a) {
      const int64_t ta = t[a];
      const int64_t* qv = qd_var + a * V;
      // s_v = sum_b gram[t_b - t_a][qv, qb[b]] * h[b]  (minus self)
      for (int64_t v = 0; v < V; ++v) {
        double acc = 0.0;
        const int64_t qa = qv[v];
        for (int64_t b = 0; b < n; ++b) {
          int64_t dt = t[b] - ta;
          if (dt <= -tmax || dt >= tmax) continue;
          int64_t k = dt + tmax - 1;
          if (k < 0) k = 0;
          if (k >= band) k = band - 1;
          acc += static_cast<double>(
                     gram[(k * qd_n + qa) * qd_n + qb[b]]) *
                 h[b];
        }
        // exclude self (dt = 0 term with b == a)
        acc -= static_cast<double>(
                   g_center[qa * qd_n + qb[a]]) *
               h[a];
        double gaa = gaa_all[a * V + v];
        double g = (d0[a * V + v] - acc) / gaa;
        if (g < 0.0) g = 0.0;
        g_v[v] = g;
        obj_q[v] = quantize(g * g * gaa);
      }
      // incumbent: first v with qd_var == qb[a] (argmax of bool array)
      int64_t inc = 0;
      for (int64_t v = 0; v < V; ++v)
        if (qv[v] == qb[a]) { inc = v; break; }
      if (allowed != nullptr) {
        float inc_q = obj_q[inc];
        for (int64_t v = 0; v < V; ++v)
          if (!allowed[a * V + v]) obj_q[v] = kNegInfF;
        obj_q[inc] = inc_q;
      }
      // first-max argmax
      int64_t best = 0;
      for (int64_t v = 1; v < V; ++v)
        if (obj_q[v] > obj_q[best]) best = v;
      if (obj_q[best] == obj_q[inc]) best = inc;
      prog[a] = i_var[a * V + best];
      dsel[a] = d_var[a * V + best];
      h[a] = g_v[best];
      qb[a] = (prog[a] * n_pitches + p[a]) * n_durations + dsel[a];
    }
  }
}

}  // namespace

extern "C" {

// One variant-comparing descent stage.  Arrays:
//   t[n]            onset frames
//   qd_var[n*V]     per-note variant atom indices
//   d_var[n*V]      per-note variant duration indices
//   i_var[n*V]      per-note variant instrument indices
//   d0[n*V]         <spec^2, W_var^2> power dots
//   allowed[n*V]    0/1 mask (may be null: all allowed)
//   gram[(2*tmax-1)*qd_n*qd_n]  f32 squared-atom Gram
//   prog[n], dsel[n], h[n]      state, updated in place
//   qb[n]           current atom index per note, updated in place
void refit_descend(const int64_t* t, const int64_t* qd_var,
                   const int64_t* d_var, const int64_t* i_var,
                   const double* d0, const uint8_t* allowed,
                   const float* gram, int64_t qd_n, int64_t tmax,
                   int64_t n, int64_t V, int64_t n_pitches,
                   int64_t n_durations, int64_t sweeps,
                   const int64_t* p, int64_t* prog, int64_t* dsel,
                   double* h, int64_t* qb) {
  double* gaa_all = new double[n * V];
  double* g_v = new double[V];
  float* obj_q = new float[V];
  descend_core(t, qd_var, d_var, i_var, d0, allowed, gram, qd_n, tmax,
               n, V, n_pitches, n_durations, sweeps, p, prog, dsel, h,
               qb, gaa_all, g_v, obj_q);
  delete[] gaa_all;
  delete[] g_v;
  delete[] obj_q;
}

// Whole-batch joint refit: stages 1 (instrument re-selection) + 2
// (duration-neighbor re-selection) of core/notes.py
// refit_gains_variants_host for EVERY lane in one call — the per-lane
// Python orchestration (variant construction + two ctypes crossings
// per lane) was a measured emission hot spot at 768 lanes/batch.  The
// stage-3 context vote is NOT implemented here; the Python caller uses
// this entry only when that stage is inactive (single-instrument
// config or context_frames == 0).
//
// Packed arrays, lane-major:
//   t/p/d_orig[B*cap] int64; counts[B] int64 (valid rows per lane)
//   prog/dsel[B*cap]  int64, updated in place
//   h[B*cap]          f64 squared gains, updated in place
//   d0_all[B*cap*I*3] f64 variant power dots (variant order i*3+dd+1)
//   grid_sec[n_durations] f64; max_step: DURATION_RESELECT_MAX_STEP
//   changed[B*cap]    u8 out: dsel != d_orig
// Per-lane arithmetic is EXACTLY the per-lane entry's: same descent
// core, same variant sets, same allowed-mask formula — gains and
// decisions are bit-identical to looping refit_descend from Python.
void refit_variants_batch(const int64_t* t, const int64_t* p,
                          const int64_t* d_orig, const int64_t* counts,
                          const double* d0_all, const float* gram,
                          int64_t qd_n, int64_t tmax, int64_t B,
                          int64_t cap, int64_t n_i, int64_t n_pitches,
                          int64_t n_durations, int64_t sweeps,
                          const double* grid_sec, double max_step,
                          int64_t* prog, int64_t* dsel, double* h,
                          uint8_t* changed) {
  const int64_t Vmax = n_i > 3 ? n_i : 3;
  double* gaa_all = new double[cap * Vmax];
  double* g_v = new double[Vmax];
  float* obj_q = new float[Vmax];
  int64_t* qb = new int64_t[cap];
  int64_t* qd_var = new int64_t[cap * Vmax];
  int64_t* d_var = new int64_t[cap * Vmax];
  int64_t* i_var = new int64_t[cap * Vmax];
  double* d0 = new double[cap * Vmax];
  uint8_t* allowed = new uint8_t[cap * 3];
  for (int64_t lane = 0; lane < B; ++lane) {
    const int64_t n = counts[lane];
    if (n <= 0) continue;
    const int64_t off = lane * cap;
    const int64_t* tl = t + off;
    const int64_t* pl = p + off;
    const int64_t* dol = d_orig + off;
    const double* d0l = d0_all + off * n_i * 3;
    int64_t* progl = prog + off;
    int64_t* dsell = dsel + off;
    double* hl = h + off;
    // Stage 1: instruments (dd = 0 columns of d0), duration fixed.
    for (int64_t a = 0; a < n; ++a) {
      qb[a] = (progl[a] * n_pitches + pl[a]) * n_durations + dsell[a];
      for (int64_t v = 0; v < n_i; ++v) {
        i_var[a * n_i + v] = v;
        d_var[a * n_i + v] = dsell[a];
        qd_var[a * n_i + v] =
            (v * n_pitches + pl[a]) * n_durations + dsell[a];
        d0[a * n_i + v] = d0l[a * n_i * 3 + v * 3 + 1];
      }
    }
    descend_core(tl, qd_var, d_var, i_var, d0, nullptr, gram, qd_n,
                 tmax, n, n_i, n_pitches, n_durations, sweeps, pl,
                 progl, dsell, hl, qb, gaa_all, g_v, obj_q);
    // Stage 2: duration neighbors at the chosen instrument.
    for (int64_t a = 0; a < n; ++a) {
      qb[a] = (progl[a] * n_pitches + pl[a]) * n_durations + dsell[a];
      const double gb = grid_sec[dol[a]];
      for (int64_t j = 0; j < 3; ++j) {
        int64_t dv = dol[a] + j - 1;
        if (dv < 0) dv = 0;
        if (dv > n_durations - 1) dv = n_durations - 1;
        d_var[a * 3 + j] = dv;
        i_var[a * 3 + j] = progl[a];
        qd_var[a * 3 + j] =
            (progl[a] * n_pitches + pl[a]) * n_durations + dv;
        d0[a * 3 + j] = d0l[a * n_i * 3 + progl[a] * 3 + j];
        const double ga = grid_sec[dv];
        const double hi_g = ga > gb ? ga : gb;
        double lo_g = ga < gb ? ga : gb;
        if (lo_g < 1e-12) lo_g = 1e-12;
        allowed[a * 3 + j] = (hi_g / lo_g) <= max_step ? 1 : 0;
      }
    }
    descend_core(tl, qd_var, d_var, i_var, d0, allowed, gram, qd_n,
                 tmax, n, 3, n_pitches, n_durations, sweeps, pl, progl,
                 dsell, hl, qb, gaa_all, g_v, obj_q);
    for (int64_t a = 0; a < n; ++a)
      changed[off + a] = dsell[a] != dol[a] ? 1 : 0;
  }
  delete[] gaa_all;
  delete[] g_v;
  delete[] obj_q;
  delete[] qb;
  delete[] qd_var;
  delete[] d_var;
  delete[] i_var;
  delete[] d0;
  delete[] allowed;
}

// Plain cyclic coordinate descent (core/notes.py refit_gains_host inner
// sweeps): G is the dense [n, n] gathered Gram, diag pre-clamped.
void refit_gains(const double* G, const double* diag, const double* d0,
                 double* g, int64_t n, int64_t sweeps) {
  for (int64_t s = 0; s < sweeps; ++s) {
    for (int64_t a = 0; a < n; ++a) {
      double acc = 0.0;
      const double* Ga = G + a * n;
      for (int64_t b = 0; b < n; ++b) acc += Ga[b] * g[b];
      acc -= Ga[a] * g[a];
      double num = d0[a] - acc;
      double v = num / diag[a];
      g[a] = v > 0.0 ? v : 0.0;
    }
  }
}

}  // extern "C"
