// Independent dense KKT oracle (float64) for validating the on-device
// solvers.  The reference's only native code was third-party Ipopt's
// interior-point internals reached through cyipopt; here the TPU-native
// solve path is JAX/Pallas, and this small C++ library plays the
// independent-oracle role in the test suite: it solves the same condensed
// KKT system
//
//     [ W + diag(Sigma) + dw*I   A^T    ] [dx  ]   [ -r_tilde ]
//     [ A                        -dc*I  ] [dlam] = [ -r_p     ]
//
// in double precision with partially-pivoted Gaussian elimination, with no
// dependency on JAX, scipy, or BLAS, so a bug in our Python/XLA linear
// algebra cannot hide in both implementations.
//
// Build: g++ -O2 -shared -fPIC -o libkkt_oracle.so kkt_oracle.cpp
// (driven automatically by pyneuralempc_tpu/utils/native.py).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Solve N x N dense system in place; returns 0 on success, 1 if singular.
int lu_solve(std::vector<double>& K, std::vector<double>& rhs, int N) {
    std::vector<int> piv(N);
    for (int i = 0; i < N; ++i) piv[i] = i;

    for (int col = 0; col < N; ++col) {
        // partial pivot
        int best = col;
        double best_val = std::fabs(K[col * N + col]);
        for (int r = col + 1; r < N; ++r) {
            double v = std::fabs(K[r * N + col]);
            if (v > best_val) { best = r; best_val = v; }
        }
        if (best_val < 1e-300) return 1;
        if (best != col) {
            for (int j = 0; j < N; ++j)
                std::swap(K[col * N + j], K[best * N + j]);
            std::swap(rhs[col], rhs[best]);
        }
        const double pivot = K[col * N + col];
        for (int r = col + 1; r < N; ++r) {
            const double f = K[r * N + col] / pivot;
            if (f == 0.0) continue;
            K[r * N + col] = 0.0;
            for (int j = col + 1; j < N; ++j)
                K[r * N + j] -= f * K[col * N + j];
            rhs[r] -= f * rhs[col];
        }
    }
    // back substitution
    for (int r = N - 1; r >= 0; --r) {
        double acc = rhs[r];
        for (int j = r + 1; j < N; ++j) acc -= K[r * N + j] * rhs[j];
        rhs[r] = acc / K[r * N + r];
    }
    return 0;
}

}  // namespace

extern "C" {

// All matrices row-major.  W: n*n, Sigma: n, A: m*n, r_tilde: n, r_p: m.
// Outputs dw: n, dlam: m (double).  Returns 0 on success.
int solve_kkt(int n, int m, const float* W, const float* Sigma,
              const float* A, const float* r_tilde, const float* r_p,
              double delta_w, double delta_c, double* dw, double* dlam) {
    const int N = n + m;
    std::vector<double> K(static_cast<size_t>(N) * N, 0.0);
    std::vector<double> rhs(N, 0.0);

    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j)
            K[i * N + j] = static_cast<double>(W[i * n + j]);
        K[i * N + i] += static_cast<double>(Sigma[i]) + delta_w;
    }
    for (int r = 0; r < m; ++r) {
        for (int j = 0; j < n; ++j) {
            const double a = static_cast<double>(A[r * n + j]);
            K[(n + r) * N + j] = a;      // A block
            K[j * N + (n + r)] = a;      // A^T block
        }
        K[(n + r) * N + (n + r)] = -delta_c;
    }
    for (int i = 0; i < n; ++i) rhs[i] = -static_cast<double>(r_tilde[i]);
    for (int r = 0; r < m; ++r) rhs[n + r] = -static_cast<double>(r_p[r]);

    const int status = lu_solve(K, rhs, N);
    if (status != 0) return status;
    for (int i = 0; i < n; ++i) dw[i] = rhs[i];
    for (int r = 0; r < m; ++r) dlam[r] = rhs[n + r];
    return 0;
}

// Batched variant: inputs stacked along the leading axis.
int solve_kkt_batch(int batch, int n, int m, const float* W,
                    const float* Sigma, const float* A,
                    const float* r_tilde, const float* r_p,
                    double delta_w, double delta_c,
                    double* dw, double* dlam) {
    int rc = 0;
    for (int b = 0; b < batch; ++b) {
        const int r = solve_kkt(
            n, m, W + static_cast<size_t>(b) * n * n, Sigma + b * n,
            A + static_cast<size_t>(b) * m * n, r_tilde + b * n,
            r_p + b * m, delta_w, delta_c, dw + b * n, dlam + b * m);
        if (r != 0) rc = r;
    }
    return rc;
}

}  // extern "C"
