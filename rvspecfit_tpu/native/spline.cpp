// Natural cubic spline: construction + evaluation on uniform
// (linear or log) knot grids.  CPU-native counterpart of the JAX
// kernel in ops/spline.py (role of the reference's single native
// component; this is an independent implementation using the
// standard second-derivative formulation and Horner evaluation).
//
// Build: see build.py (g++ -O3 -shared -fPIC).  ABI: plain C.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Build spline state from knot positions xs (size n) and values ys.
// Outputs: y2 (size n) second derivatives (natural boundary: 0 at
// both ends).  Returns 0 on success, -1 on bad input.
int rvst_spline_construct(const double* xs, const double* ys,
                          int64_t n, double* y2) {
  if (n < 4) return -1;
  std::vector<double> diag(n - 2), rhs(n - 2), off(n - 2);
  for (int64_t i = 0; i < n - 2; ++i) {
    const double h0 = xs[i + 1] - xs[i];
    const double h1 = xs[i + 2] - xs[i + 1];
    if (h0 <= 0 || h1 <= 0) return -1;
    diag[i] = 2.0 * (h0 + h1);
    off[i] = h1;
    rhs[i] = 6.0 * ((ys[i + 2] - ys[i + 1]) / h1 -
                    (ys[i + 1] - ys[i]) / h0);
  }
  // symmetric tridiagonal forward elimination
  for (int64_t i = 1; i < n - 2; ++i) {
    const double m = off[i - 1] / diag[i - 1];
    diag[i] -= m * off[i - 1];
    rhs[i] -= m * rhs[i - 1];
  }
  y2[0] = 0.0;
  y2[n - 1] = 0.0;
  y2[n - 2] = rhs[n - 3] / diag[n - 3];
  for (int64_t i = n - 4; i >= 0; --i) {
    y2[i + 1] = (rhs[i] - off[i] * y2[i + 2]) / diag[i];
  }
  return 0;
}

// Evaluate at query points q (size m) assuming uniformly spaced
// knots: log-uniform when logstep != 0 (step = ln(xs[1]/xs[0])),
// linear otherwise.  Out-of-range queries are clamped to the edge
// intervals and flagged 0 in inrange.  Returns 0, or -2 when the
// grid is not uniform to 1e-8 relative.
int rvst_spline_eval(const double* xs, const double* ys,
                     const double* y2, int64_t n, int logstep,
                     const double* q, int64_t m, double* out,
                     uint8_t* inrange) {
  const double x0 = xs[0];
  const double xlast = xs[n - 1];
  double step, logx0 = 0.0;
  if (logstep) {
    step = std::log(xs[1] / xs[0]);
    const double step2 = std::log(xs[2] / xs[1]);
    if (std::fabs(step - step2) > 1e-8 * std::fabs(step)) return -2;
    logx0 = std::log(x0);
  } else {
    step = xs[1] - xs[0];
    const double step2 = xs[2] - xs[1];
    if (std::fabs(step - step2) > 1e-8 * std::fabs(step)) return -2;
  }
  for (int64_t k = 0; k < m; ++k) {
    const double x = q[k];
    int64_t i;
    if (logstep) {
      i = (int64_t)((std::log(x) - logx0) / step);
    } else {
      i = (int64_t)((x - x0) / step);
    }
    uint8_t ok = (x >= x0) && (x < xlast);
    if (i < 0) i = 0;
    if (i > n - 2) i = n - 2;
    const double h = xs[i + 1] - xs[i];
    const double a = (xs[i + 1] - x) / h;
    const double b = (x - xs[i]) / h;
    out[k] = a * ys[i] + b * ys[i + 1] +
             ((a * a * a - a) * y2[i] + (b * b * b - b) * y2[i + 1]) *
                 (h * h) / 6.0;
    inrange[k] = ok;
  }
  return 0;
}

}  // extern "C"
