// Independent C++ reference solver for the box-constrained LTV-MPC QP.
//
// BASELINE.md parity check: the TPU framework's control sequences must match
// a reference C++ solve to <=1e-4.  This oracle follows the reference's own
// recipes — condensed QP assembly and a primal-dual interior-point solve in
// scalar double-precision C++ (the construction of mat_are_solver.hpp /
// quadratic_programs.hpp / mehrotra_method.hpp:269, re-implemented fresh) —
// sharing no code or numerical shortcuts with the JAX path, so agreement is
// evidence of correctness rather than of common bugs.
//
// I/O: little-endian binary.
//   input : int64 H, n, m
//           A (H*n*n), B (H*n*m), c (H*n), x0 (n),
//           Q (n*n), QN (n*n), R (m*m), lb (m), ub (m)     all float64
//   output: u (H*m) float64
// Build: g++ -O2 -std=c++17 mpc_oracle.cpp -o mpc_oracle
// Usage: mpc_oracle <in.bin> <out.bin>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

using std::vector;
typedef vector<double> Vec;

// dense column-major-free helpers (row-major throughout)
static void matmul(const double* A, const double* B, double* C, int n, int k,
                   int m) {  // C(n,m) = A(n,k) B(k,m)
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < m; ++j) {
      double s = 0;
      for (int t = 0; t < k; ++t) s += A[i * k + t] * B[t * m + j];
      C[i * m + j] = s;
    }
}

static void matvec(const double* A, const double* x, double* y, int n, int m) {
  for (int i = 0; i < n; ++i) {
    double s = 0;
    for (int j = 0; j < m; ++j) s += A[i * m + j] * x[j];
    y[i] = s;
  }
}

// Cholesky solve in place: A (N,N) SPD, b (N) -> x
static bool chol_solve(Vec A, Vec& b, int N) {
  for (int j = 0; j < N; ++j) {
    double d = A[j * N + j];
    for (int k = 0; k < j; ++k) d -= A[j * N + k] * A[j * N + k];
    if (d <= 0) return false;
    d = std::sqrt(d);
    A[j * N + j] = d;
    for (int i = j + 1; i < N; ++i) {
      double s = A[i * N + j];
      for (int k = 0; k < j; ++k) s -= A[i * N + k] * A[j * N + k];
      A[i * N + j] = s / d;
    }
  }
  for (int i = 0; i < N; ++i) {  // forward
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * N + k] * b[k];
    b[i] = s / A[i * N + i];
  }
  for (int i = N - 1; i >= 0; --i) {  // backward (L^T)
    double s = b[i];
    for (int k = i + 1; k < N; ++k) s -= A[k * N + i] * b[k];
    b[i] = s / A[i * N + i];
  }
  return true;
}

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s in.bin out.bin\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  int64_t H, n, m;
  if (std::fread(&H, 8, 1, f) != 1 || std::fread(&n, 8, 1, f) != 1 ||
      std::fread(&m, 8, 1, f) != 1)
    return 2;
  auto rd = [&](int64_t cnt) {
    Vec v(cnt);
    if (std::fread(v.data(), 8, (size_t)cnt, f) != (size_t)cnt) std::exit(2);
    return v;
  };
  Vec A = rd(H * n * n), B = rd(H * n * m), c = rd(H * n), x0 = rd(n);
  Vec Q = rd(n * n), QN = rd(n * n), R = rd(m * m), lb = rd(m), ub = rd(m);
  std::fclose(f);

  const int64_t N = H * m;

  // ---- condense:  x_{t+1} = Phi_t x0 + sum_j S[t][j] u_j + d_t
  // Su[(t)*H + j] is the (n, m) block dx_{t+1}/du_j  (j <= t)
  vector<Vec> Su((size_t)(H * H), Vec((size_t)(n * m), 0.0));
  Vec Phi(n * n), d((size_t)(H * n), 0.0), tmp(n * n), tv(n);
  // t = 0
  for (int64_t i = 0; i < n * m; ++i) Su[0][i] = B[i];
  matvec(&A[0], x0.data(), tv.data(), n, n);
  for (int64_t i = 0; i < n; ++i) d[i] = tv[i] + c[i];
  Vec xlin((size_t)(H * n));  // affine part of the state trajectory
  for (int64_t i = 0; i < n; ++i) xlin[i] = d[i];
  for (int64_t t = 1; t < H; ++t) {
    const double* At = &A[t * n * n];
    // propagate previous blocks
    for (int64_t j = 0; j < t; ++j) {
      matmul(At, Su[(t - 1) * H + j].data(), Su[t * H + j].data(), n, n, m);
    }
    // new block
    for (int64_t i = 0; i < n * m; ++i) Su[t * H + t][i] = B[t * n * m + i];
    // affine
    matvec(At, &xlin[(t - 1) * n], tv.data(), n, n);
    for (int64_t i = 0; i < n; ++i) xlin[t * n + i] = tv[i] + c[t * n + i];
  }

  // ---- condensed QP via the flat sensitivity matrix Sfull (H*n, N):
  //      x = Sfull u + xlin,  H_qp = Sfull^T W Sfull + I_H (x) R,
  //      g = Sfull^T W xlin           (W = blockdiag(Q..Q, QN))
  Vec Hqp((size_t)(N * N), 0.0), g((size_t)N, 0.0);
  Vec Sfull((size_t)(H * n) * N, 0.0);
  for (int64_t t = 0; t < H; ++t)
    for (int64_t j = 0; j <= t; ++j)
      for (int64_t i = 0; i < n; ++i)
        for (int64_t r = 0; r < m; ++r)
          Sfull[(t * n + i) * N + j * m + r] = Su[t * H + j][i * m + r];
  Vec WS((size_t)(H * n) * N, 0.0);
  for (int64_t t = 0; t < H; ++t) {
    const double* W = (t == H - 1) ? QN.data() : Q.data();
    for (int64_t i = 0; i < n; ++i)
      for (int64_t col = 0; col < N; ++col) {
        double s = 0;
        for (int64_t k = 0; k < n; ++k)
          s += W[i * n + k] * Sfull[(t * n + k) * N + col];
        WS[(t * n + i) * N + col] = s;
      }
  }
  for (int64_t r = 0; r < N; ++r)
    for (int64_t col = r; col < N; ++col) {
      double s = 0;
      for (int64_t i = 0; i < H * n; ++i)
        s += Sfull[i * N + r] * WS[i * N + col];
      Hqp[r * N + col] = s;
      Hqp[col * N + r] = s;
    }
  for (int64_t t = 0; t < H; ++t)
    for (int64_t r = 0; r < m; ++r)
      for (int64_t s2 = 0; s2 < m; ++s2)
        Hqp[(t * m + r) * N + t * m + s2] += R[r * m + s2];
  for (int64_t col = 0; col < N; ++col) {
    double s = 0;
    for (int64_t t = 0; t < H; ++t) {
      const double* W = (t == H - 1) ? QN.data() : Q.data();
      for (int64_t i = 0; i < n; ++i) {
        double wx = 0;
        for (int64_t k = 0; k < n; ++k) wx += W[i * n + k] * xlin[t * n + k];
        s += Sfull[(t * n + i) * N + col] * wx;
      }
    }
    g[col] = s;
  }

  // ---- primal-dual interior point on  min 1/2 u^T Hqp u + g^T u,
  //      lb <= u_t <= ub  (long-step Mehrotra-free path following)
  Vec u((size_t)N), LB((size_t)N), UB((size_t)N);
  for (int64_t t = 0; t < H; ++t)
    for (int64_t r = 0; r < m; ++r) {
      LB[t * m + r] = lb[r];
      UB[t * m + r] = ub[r];
      u[t * m + r] = 0.5 * (lb[r] + ub[r]);
    }
  Vec zl((size_t)N, 1.0), zu((size_t)N, 1.0);
  for (int iter = 0; iter < 60; ++iter) {
    Vec sl((size_t)N), su((size_t)N), grad((size_t)N);
    matvec(Hqp.data(), u.data(), grad.data(), (int)N, (int)N);
    double mu = 0;
    for (int64_t i = 0; i < N; ++i) {
      grad[i] += g[i];
      // floor the slacks: near convergence an active coordinate's slack can
      // underflow to exactly 0 after a unit step, and 1/sl would poison the
      // next KKT system with inf/NaN
      sl[i] = std::fmax(u[i] - LB[i], 1e-14);
      su[i] = std::fmax(UB[i] - u[i], 1e-14);
      mu += sl[i] * zl[i] + su[i] * zu[i];
    }
    mu /= (2.0 * N);
    if (mu < 1e-13) break;  // converged: complementarity at solver precision
    double sigma = 0.1;
    // KKT: (Hqp + Zl/Sl + Zu/Su) du = -(grad - zl + zu)
    //       + (sigma mu)(1/sl - 1/su)
    Vec M = Hqp, rhs((size_t)N);
    for (int64_t i = 0; i < N; ++i) {
      M[i * N + i] += zl[i] / sl[i] + zu[i] / su[i];
      rhs[i] = -(grad[i] - zl[i] + zu[i]) + sigma * mu * (1.0 / sl[i] - 1.0 / su[i]);
    }
    Vec du = rhs;
    if (!chol_solve(M, du, (int)N)) return 3;
    Vec dzl((size_t)N), dzu((size_t)N);
    for (int64_t i = 0; i < N; ++i) {
      dzl[i] = (sigma * mu - zl[i] * du[i]) / sl[i] - zl[i];
      dzu[i] = (sigma * mu + zu[i] * du[i]) / su[i] - zu[i];
    }
    double ap = 1.0, ad = 1.0;
    for (int64_t i = 0; i < N; ++i) {
      if (du[i] < 0) ap = std::fmin(ap, -0.995 * sl[i] / du[i]);
      if (du[i] > 0) ap = std::fmin(ap, 0.995 * su[i] / du[i]);
      if (dzl[i] < 0) ad = std::fmin(ad, -0.995 * zl[i] / dzl[i]);
      if (dzu[i] < 0) ad = std::fmin(ad, -0.995 * zu[i] / dzu[i]);
    }
    double step_norm = 0;
    for (int64_t i = 0; i < N; ++i) {
      u[i] += ap * du[i];
      zl[i] += ad * dzl[i];
      zu[i] += ad * dzu[i];
      step_norm = std::fmax(step_norm, std::fabs(ap * du[i]));
    }
    if (mu < 1e-14 && step_norm < 1e-12) break;
  }

  FILE* fo = std::fopen(argv[2], "wb");
  if (!fo) return 2;
  std::fwrite(u.data(), 8, (size_t)N, fo);
  std::fclose(fo);
  return 0;
}
