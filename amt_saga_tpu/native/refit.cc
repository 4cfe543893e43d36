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

}  // namespace

extern "C" {

// One variant-comparing descent stage (the `descend` closure in
// core/notes.py refit_gains_variants_host).  Arrays:
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
  const double kNegInf = -std::numeric_limits<double>::infinity();
  const float kNegInfF = -std::numeric_limits<float>::infinity();
  const int64_t band = 2 * tmax - 1;
  // gaa depends only on the static variant set (hoisted, like numpy).
  double* gaa_all = new double[n * V];
  const float* g_center = gram + (tmax - 1) * qd_n * qd_n;
  for (int64_t a = 0; a < n; ++a)
    for (int64_t v = 0; v < V; ++v) {
      int64_t q = qd_var[a * V + v];
      double gaa = static_cast<double>(g_center[q * qd_n + q]);
      gaa_all[a * V + v] = gaa > 1e-12 ? gaa : 1e-12;
    }
  double* g_v = new double[V];
  float* obj_q = new float[V];
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
      (void)kNegInf;
    }
  }
  delete[] gaa_all;
  delete[] g_v;
  delete[] obj_q;
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
