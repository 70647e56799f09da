// McMurchie-Davidson electron-repulsion integrals (C++ engine).
//
// Native acceleration for the O(n^4) ERI loop of the host-side chemistry
// front end (the role PySCF's C core plays for the reference,
// /root/reference/src/hamiltonians/molecular.py:945-1003).  The Python
// implementation in flow_guided_krylov_tpu/chem/integrals.py is the
// reference/fallback; this engine must agree to ~1e-12.
//
// Supports s and p shells (l <= 1 per Cartesian direction; recurrences are
// general up to the fixed LMAX below).  Parallelized with OpenMP over
// contracted quartets using 8-fold permutational symmetry.
//
// Build:  g++ -O3 -march=native -fopenmp -shared -fPIC integrals.cpp -o libfgk_integrals.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <array>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int LMAX = 2;              // max angular momentum per direction
constexpr int TMAX = 4 * LMAX + 1;   // max Hermite order in ERIs

// ---------------------------------------------------------------------------
// Boys function F_0..F_n(T), downward recursion (stable)
// ---------------------------------------------------------------------------
void boys(int n_max, double T, double* F) {
  if (T < 1e-13) {
    for (int n = 0; n <= n_max; ++n) F[n] = 1.0 / (2.0 * n + 1.0);
    return;
  }
  if (T > 35.0) {
    F[0] = 0.5 * std::sqrt(M_PI / T);
    for (int n = 1; n <= n_max; ++n) F[n] = F[n - 1] * (2.0 * n - 1.0) / (2.0 * T);
    return;
  }
  // series for F_{n_max}, then downward
  double expT = std::exp(-T);
  double term = 1.0 / (2.0 * n_max + 1.0);
  double sum = term;
  for (int i = 1; i < 200; ++i) {
    term *= 2.0 * T / (2.0 * n_max + 2.0 * i + 1.0);
    sum += term;
    if (term < 1e-17 * sum) break;
  }
  F[n_max] = expT * sum;
  for (int n = n_max; n > 0; --n)
    F[n - 1] = (2.0 * T * F[n] + expT) / (2.0 * n - 1.0);
}

// ---------------------------------------------------------------------------
// Hermite expansion coefficients E_t^{ij} for one dimension
// ---------------------------------------------------------------------------
struct ETable {
  // E[i][j][t]
  double v[LMAX + 1][LMAX + 1][2 * LMAX + 1];
};

void build_E(int imax, int jmax, double Q, double a, double b, ETable& E) {
  const double p = a + b;
  const double q = a * b / p;
  std::memset(E.v, 0, sizeof(E.v));
  E.v[0][0][0] = std::exp(-q * Q * Q);
  for (int i = 1; i <= imax; ++i) {
    for (int t = 0; t <= i; ++t) {
      double val = 0.0;
      if (t - 1 >= 0) val += E.v[i - 1][0][t - 1] / (2.0 * p);
      val += -(q * Q / a) * E.v[i - 1][0][t];
      if (t + 1 <= i - 1) val += (t + 1) * E.v[i - 1][0][t + 1];
      E.v[i][0][t] = val;
    }
  }
  for (int j = 1; j <= jmax; ++j) {
    for (int i = 0; i <= imax; ++i) {
      for (int t = 0; t <= i + j; ++t) {
        double val = 0.0;
        if (t - 1 >= 0) val += E.v[i][j - 1][t - 1] / (2.0 * p);
        val += (q * Q / b) * E.v[i][j - 1][t];
        if (t + 1 <= i + j - 1) val += (t + 1) * E.v[i][j - 1][t + 1];
        E.v[i][j][t] = val;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Hermite Coulomb tensor R^0_{tuv}
// ---------------------------------------------------------------------------
struct RTable {
  double v[TMAX][TMAX][TMAX];
};

void build_R(int tmax, int umax, int vmax, double p, const double* PC,
             RTable& out) {
  const int L = tmax + umax + vmax;
  double F[4 * LMAX + 2];
  boys(L, p * (PC[0] * PC[0] + PC[1] * PC[1] + PC[2] * PC[2]), F);
  // Rn[n][t][u][v] built by recursion over n (only n <= L - t - u - v needed)
  static thread_local std::vector<double> buf;
  const int dim = (tmax + 1) * (umax + 1) * (vmax + 1);
  buf.assign((size_t)(L + 1) * dim, 0.0);
  auto idx = [&](int n, int t, int u, int v) {
    return ((size_t)n * dim) + ((size_t)t * (umax + 1) + u) * (vmax + 1) + v;
  };
  double m2p = 1.0;
  for (int n = 0; n <= L; ++n) {
    buf[idx(n, 0, 0, 0)] = m2p * F[n];
    m2p *= -2.0 * p;
  }
  for (int total = 1; total <= L; ++total) {
    for (int t = 0; t <= std::min(total, tmax); ++t) {
      for (int u = 0; u <= std::min(total - t, umax); ++u) {
        int v = total - t - u;
        if (v < 0 || v > vmax) continue;
        for (int n = 0; n + total <= L; ++n) {
          double val = 0.0;
          if (t >= 1) {
            if (t >= 2) val += (t - 1) * buf[idx(n + 1, t - 2, u, v)];
            val += PC[0] * buf[idx(n + 1, t - 1, u, v)];
          } else if (u >= 1) {
            if (u >= 2) val += (u - 1) * buf[idx(n + 1, t, u - 2, v)];
            val += PC[1] * buf[idx(n + 1, t, u - 1, v)];
          } else {
            if (v >= 2) val += (v - 1) * buf[idx(n + 1, t, u, v - 2)];
            val += PC[2] * buf[idx(n + 1, t, u, v - 1)];
          }
          buf[idx(n, t, u, v)] = val;
        }
      }
    }
  }
  for (int t = 0; t <= tmax; ++t)
    for (int u = 0; u <= umax; ++u)
      for (int v = 0; v <= vmax; ++v)
        out.v[t][u][v] = buf[idx(0, t, u, v)];
}

struct Func {
  int lmn[3];
  double center[3];
  int prim_start, prim_count;
};

// primitive ERI via MD
double eri_prim(const Func& f1, double a, const Func& f2, double b,
                const Func& f3, double c, const Func& f4, double d) {
  const double p = a + b, q = c + d;
  const double alpha = p * q / (p + q);
  double P[3], Q[3], PQ[3];
  for (int x = 0; x < 3; ++x) {
    P[x] = (a * f1.center[x] + b * f2.center[x]) / p;
    Q[x] = (c * f3.center[x] + d * f4.center[x]) / q;
    PQ[x] = P[x] - Q[x];
  }
  ETable E1[3], E2[3];
  for (int x = 0; x < 3; ++x) {
    build_E(f1.lmn[x], f2.lmn[x], f1.center[x] - f2.center[x], a, b, E1[x]);
    build_E(f3.lmn[x], f4.lmn[x], f3.center[x] - f4.center[x], c, d, E2[x]);
  }
  const int l12 = f1.lmn[0] + f2.lmn[0], m12 = f1.lmn[1] + f2.lmn[1],
            n12 = f1.lmn[2] + f2.lmn[2];
  const int l34 = f3.lmn[0] + f4.lmn[0], m34 = f3.lmn[1] + f4.lmn[1],
            n34 = f3.lmn[2] + f4.lmn[2];
  RTable R;
  build_R(l12 + l34, m12 + m34, n12 + n34, alpha, PQ, R);

  double val = 0.0;
  for (int t = 0; t <= l12; ++t) {
    const double e1x = E1[0].v[f1.lmn[0]][f2.lmn[0]][t];
    if (e1x == 0.0) continue;
    for (int u = 0; u <= m12; ++u) {
      const double e1y = E1[1].v[f1.lmn[1]][f2.lmn[1]][u];
      if (e1y == 0.0) continue;
      for (int v = 0; v <= n12; ++v) {
        const double e1 = e1x * e1y * E1[2].v[f1.lmn[2]][f2.lmn[2]][v];
        if (e1 == 0.0) continue;
        for (int tt = 0; tt <= l34; ++tt) {
          const double e2x = E2[0].v[f3.lmn[0]][f4.lmn[0]][tt];
          if (e2x == 0.0) continue;
          for (int uu = 0; uu <= m34; ++uu) {
            const double e2y = E2[1].v[f3.lmn[1]][f4.lmn[1]][uu];
            if (e2y == 0.0) continue;
            for (int vv = 0; vv <= n34; ++vv) {
              const double e2 =
                  e2x * e2y * E2[2].v[f3.lmn[2]][f4.lmn[2]][vv];
              if (e2 == 0.0) continue;
              const double sign = ((tt + uu + vv) & 1) ? -1.0 : 1.0;
              val += e1 * e2 * sign * R.v[t + tt][u + uu][v + vv];
            }
          }
        }
      }
    }
  }
  return val * 2.0 * std::pow(M_PI, 2.5) / (p * q * std::sqrt(p + q));
}

double eri_contracted(const Func& f1, const Func& f2, const Func& f3,
                      const Func& f4, const double* exps,
                      const double* coefs) {
  double v = 0.0;
  for (int i = 0; i < f1.prim_count; ++i) {
    const double a = exps[f1.prim_start + i];
    const double ca = coefs[f1.prim_start + i];
    for (int j = 0; j < f2.prim_count; ++j) {
      const double b = exps[f2.prim_start + j];
      const double cb = ca * coefs[f2.prim_start + j];
      for (int k = 0; k < f3.prim_count; ++k) {
        const double c = exps[f3.prim_start + k];
        const double cc = cb * coefs[f3.prim_start + k];
        for (int l = 0; l < f4.prim_count; ++l) {
          const double d = exps[f4.prim_start + l];
          v += cc * coefs[f4.prim_start + l] *
               eri_prim(f1, a, f2, b, f3, c, f4, d);
        }
      }
    }
  }
  return v;
}

}  // namespace

extern "C" {

// eri: output buffer (n^4), chemist notation (ij|kl)
void fgk_eri_tensor(int n_funcs, const int32_t* lmn, const double* centers,
                    const int32_t* prim_offsets, const double* exps,
                    const double* coefs, double* eri) {
  std::vector<Func> funcs(n_funcs);
  for (int i = 0; i < n_funcs; ++i) {
    for (int x = 0; x < 3; ++x) {
      funcs[i].lmn[x] = lmn[3 * i + x];
      funcs[i].center[x] = centers[3 * i + x];
    }
    funcs[i].prim_start = prim_offsets[i];
    funcs[i].prim_count = prim_offsets[i + 1] - prim_offsets[i];
  }
  const int64_t n = n_funcs;
  // enumerate unique quartets (i>=j, k>=l, (ij)>=(kl))
  std::vector<std::array<int, 4>> quartets;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j <= i; ++j)
      for (int k = 0; k <= i; ++k) {
        const int lmaxq = (k == i) ? j : k;
        for (int l = 0; l <= lmaxq; ++l)
          quartets.push_back({i, j, k, l});
      }

#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t qi = 0; qi < (int64_t)quartets.size(); ++qi) {
    const auto [i, j, k, l] = quartets[qi];
    const double v = eri_contracted(funcs[i], funcs[j], funcs[k], funcs[l],
                                    exps, coefs);
    auto set = [&](int a, int b, int c, int d) {
      eri[((int64_t)a * n + b) * n * n + (int64_t)c * n + d] = v;
    };
    set(i, j, k, l); set(j, i, k, l); set(i, j, l, k); set(j, i, l, k);
    set(k, l, i, j); set(l, k, i, j); set(k, l, j, i); set(l, k, j, i);
  }
}

}  // extern "C"
