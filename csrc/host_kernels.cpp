// Native host-side kernels for convex_dim_red_tpu.
//
// The reference's only native tier is Numba-compiled CPU kernels
// (SURVEY.md §2: simplex projection, per-row simplex QPs, FurthestSum);
// numba is not available in this image.  This library provides those
// hot host-side kernels in C++ (exposed through ctypes,
// convex_dim_red_tpu/utils/native.py): an exact sort-threshold simplex
// projection, the batched exact-line-search simplex-QP solver (same
// algorithm as solvers/spg.py:quad_spg), and the FurthestSum greedy.
// They serve as a fast CPU fallback when no TPU is attached and as an
// independent native check of the JAX implementations.
//
// Build: make -C csrc  (or utils/native.py builds it on demand).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Project each row of x (n x k, row-major, modified in place) onto the
// probability simplex.  Exact sort-and-threshold algorithm.
void simplex_project_rows(double* x, int64_t n, int64_t k) {
    std::vector<double> buf(k);
    for (int64_t i = 0; i < n; ++i) {
        double* row = x + i * k;
        std::copy(row, row + k, buf.begin());
        std::sort(buf.begin(), buf.end(), std::greater<double>());
        double css = 0.0, tau = 0.0;
        int64_t rho = 0;
        for (int64_t j = 0; j < k; ++j) {
            css += buf[j];
            double t = (css - 1.0) / (j + 1);
            if (buf[j] - t > 0.0) {
                rho = j + 1;
                tau = t;
            }
        }
        (void)rho;
        for (int64_t j = 0; j < k; ++j)
            row[j] = std::max(row[j] - tau, 0.0);
    }
}

// Solve n simplex QPs  min 1/2 x'Ax + b'x  sharing the k x k Hessian A.
// X (n x k) holds the initial guesses and receives the solutions.
// Projected spectral gradient with Barzilai-Borwein steps and the
// closed-form exact line minimizer (one Hessian matvec per iteration),
// matching solvers/spg.py:quad_spg.
void quad_simplex_spg_batch(const double* A, const double* B, double* X,
                            int64_t n, int64_t k, int64_t max_iterations,
                            double alpha_min, double alpha_max,
                            double epsilon_one, double epsilon_two) {
    std::vector<double> g(k), d(k), Ad(k), Ax(k), xbuf(k);
    const double progress_eps = 32.0 * 2.220446049250313e-16;

    for (int64_t t = 0; t < n; ++t) {
        double* x = X + t * k;
        const double* b = B + t * k;

        simplex_project_rows(x, 1, k);
        for (int64_t i = 0; i < k; ++i) {
            double s = 0.0;
            for (int64_t j = 0; j < k; ++j) s += A[i * k + j] * x[j];
            Ax[i] = s;
        }

        // First step size from the unit projected-gradient residual.
        for (int64_t i = 0; i < k; ++i) xbuf[i] = x[i] - (Ax[i] + b[i]);
        simplex_project_rows(xbuf.data(), 1, k);
        double ainv = 0.0;
        for (int64_t i = 0; i < k; ++i)
            ainv = std::max(ainv, std::fabs(xbuf[i] - x[i]));
        if (ainv < 1e-12) ainv = 1.0;
        double alpha = std::min(std::max(1.0 / ainv, alpha_min), alpha_max);

        int stall = 0;
        for (int64_t it = 0; it < max_iterations; ++it) {
            for (int64_t i = 0; i < k; ++i) g[i] = Ax[i] + b[i];
            for (int64_t i = 0; i < k; ++i) xbuf[i] = x[i] - alpha * g[i];
            simplex_project_rows(xbuf.data(), 1, k);
            for (int64_t i = 0; i < k; ++i) d[i] = xbuf[i] - x[i];

            for (int64_t i = 0; i < k; ++i) {
                double s = 0.0;
                for (int64_t j = 0; j < k; ++j) s += A[i * k + j] * d[j];
                Ad[i] = s;
            }

            double delta = 0.0, q = 0.0, dd = 0.0;
            for (int64_t i = 0; i < k; ++i) {
                delta += d[i] * g[i];
                q += d[i] * Ad[i];
                dd += d[i] * d[i];
            }
            double lam = q > 0.0
                ? std::min(std::max(-delta / q, 0.0), 1.0) : 1.0;

            for (int64_t i = 0; i < k; ++i) {
                x[i] += lam * d[i];
                Ax[i] += lam * Ad[i];
            }
            alpha = q > 0.0
                ? std::min(std::max(dd / q, alpha_min), alpha_max)
                : alpha_max;

            // Residual convergence (alpha = 1 projected gradient).
            for (int64_t i = 0; i < k; ++i)
                xbuf[i] = x[i] - (Ax[i] + b[i]);
            simplex_project_rows(xbuf.data(), 1, k);
            double res2 = 0.0, resinf = 0.0;
            for (int64_t i = 0; i < k; ++i) {
                double r = xbuf[i] - x[i];
                res2 += r * r;
                resinf = std::max(resinf, std::fabs(r));
            }

            double decrease = -(lam * delta + 0.5 * lam * lam * q);
            double fval = 0.0;
            for (int64_t i = 0; i < k; ++i)
                fval += 0.5 * x[i] * Ax[i] + x[i] * b[i];
            stall = decrease <= progress_eps * std::fabs(fval) ? stall + 1
                                                               : 0;

            if (std::sqrt(res2) < epsilon_two || resinf < epsilon_one ||
                stall >= 3)
                break;
        }
    }
}

// FurthestSum greedy selection (dense distance-sum formulation,
// matching ops/furthest_sum.py).  d: n x n dissimilarities; out:
// n_components selected indices.
void furthest_sum(const double* d, int64_t n, int64_t n_components,
                  int64_t start_index, int64_t extra_steps,
                  const int64_t* exclude, int64_t n_exclude,
                  int64_t* out) {
    if (n_components == 0) return;
    std::vector<char> active(n, 1);
    std::vector<double> sums(n);
    for (int64_t e = 0; e < n_exclude; ++e) active[exclude[e]] = 0;
    active[start_index] = 0;
    for (int64_t i = 0; i < n; ++i) sums[i] = d[i * n + start_index];

    std::vector<int64_t> selected(n_components, start_index);

    auto pick = [&]() -> int64_t {
        int64_t best = -1;
        double best_v = -1e300;
        for (int64_t i = 0; i < n; ++i)
            if (active[i] && sums[i] > best_v) {
                best_v = sums[i];
                best = i;
            }
        active[best] = 0;
        for (int64_t i = 0; i < n; ++i) sums[i] += d[i * n + best];
        return best;
    };

    for (int64_t c = 1; c < n_components; ++c) selected[c] = pick();

    for (int64_t step = 0; step < extra_steps; ++step) {
        int64_t u = step % n_components;
        int64_t r = selected[u];
        for (int64_t i = 0; i < n; ++i) sums[i] -= d[i * n + r];
        double rs = 0.0;
        for (int64_t c = 0; c < n_components; ++c)
            if (selected[c] != r) rs += d[r * n + selected[c]];
        sums[r] = rs;
        active[r] = 1;
        selected[u] = pick();
    }

    std::copy(selected.begin(), selected.end(), out);
}

}  // extern "C"
