// CPU baseline: OpenMP DIRECT7 Magnusson NDT, the ndt_omp-class workload
// the BASELINE ">= 20x on one TPU core vs 8-thread ndt_omp" target is
// measured against.
//
// Faithful to the reference's configuration of pclomp::NormalDistributions-
// Transform (scanmatcher_component.cpp:103-113): setResolution(res),
// DIRECT7 neighborhood (voxel + 6 face neighbors), transformation epsilon on
// the SE(3) increment norm, per-point OpenMP parallelism (ndt_num_threads).
// The target model is PCL VoxelGridCovariance semantics: per-voxel mean +
// covariance from >= min_points points, eigenvalue-inflated (lambda_i :=
// max(lambda_i, 0.01 * lambda_max)) before inversion.
//
// The iteration math is intentionally IDENTICAL to the TPU path
// (lidarslam_ros2_tpu/ops/ndt.py + models/registration.py): Magnusson
// mixture score d1*exp(-d2/2 * x^T S x), left-SE(3) perturbation Jacobian
// J = [I | -skew(q)], damped-Newton step from the Gauss-Newton Hessian.
// This is a LOWER bound on real ndt_omp per-iteration cost (which adds
// More-Thuente line-search score evaluations and trigonometric pose-angle
// derivative chains), so the reported speedup is conservative.
//
// Build: native/build.sh. C ABI for ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kMinPointsDefault = 6;

inline uint64_t pack_key(int32_t x, int32_t y, int32_t z) {
  // 21-bit biased packing per axis (same domain as the TPU hash grid)
  const uint64_t b = 1u << 20;
  return ((uint64_t)(uint32_t)(x + b) & 0x1FFFFF) |
         (((uint64_t)(uint32_t)(y + b) & 0x1FFFFF) << 21) |
         (((uint64_t)(uint32_t)(z + b) & 0x1FFFFF) << 42);
}

// Jacobi eigendecomposition of a symmetric 3x3 (a is row-major, modified).
// Returns eigenvalues in w, eigenvectors in columns of v.
void eig_sym3(double a[9], double w[3], double v[9]) {
  for (int i = 0; i < 9; ++i) v[i] = 0.0;
  v[0] = v[4] = v[8] = 1.0;
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = std::fabs(a[1]) + std::fabs(a[2]) + std::fabs(a[5]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        double apq = a[p * 3 + q];
        if (std::fabs(apq) < 1e-18) continue;
        double app = a[p * 3 + p], aqq = a[q * 3 + q];
        double theta = 0.5 * (aqq - app) / apq;
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k * 3 + p], akq = a[k * 3 + q];
          a[k * 3 + p] = c * akp - s * akq;
          a[k * 3 + q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p * 3 + k], aqk = a[q * 3 + k];
          a[p * 3 + k] = c * apk - s * aqk;
          a[q * 3 + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k * 3 + p], vkq = v[k * 3 + q];
          v[k * 3 + p] = c * vkp - s * vkq;
          v[k * 3 + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  w[0] = a[0]; w[1] = a[4]; w[2] = a[8];
}

struct NdtGrid {
  double resolution;
  double d1, d2;
  std::unordered_map<uint64_t, int32_t> index;
  // SoA leaf data
  std::vector<double> mu;    // [V*3]
  std::vector<double> icov;  // [V*6] upper-triangular symmetric
};

// solve (H + lam*scale*I) x = -g, 6x6 Cholesky. H upper given as full 36.
bool solve6(const double H[36], const double g[6], double lam_scaled,
            double x[6]) {
  double A[36];
  std::memcpy(A, H, sizeof(A));
  for (int i = 0; i < 6; ++i) A[i * 6 + i] += lam_scaled;
  double L[36] = {0};
  for (int j = 0; j < 6; ++j) {
    double d = A[j * 6 + j];
    for (int k = 0; k < j; ++k) d -= L[j * 6 + k] * L[j * 6 + k];
    if (d <= 1e-20) return false;
    double Ljj = std::sqrt(d);
    L[j * 6 + j] = Ljj;
    for (int i = j + 1; i < 6; ++i) {
      double off = A[i * 6 + j];
      for (int k = 0; k < j; ++k) off -= L[i * 6 + k] * L[j * 6 + k];
      L[i * 6 + j] = off / Ljj;
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double acc = -g[i];
    for (int k = 0; k < i; ++k) acc -= L[i * 6 + k] * y[k];
    y[i] = acc / L[i * 6 + i];
  }
  for (int i = 5; i >= 0; --i) {
    double acc = y[i];
    for (int k = i + 1; k < 6; ++k) acc -= L[k * 6 + i] * x[k];
    x[i] = acc / L[i * 6 + i];
  }
  return true;
}

// T <- Exp([rho, omega]) * T   (left SE(3) perturbation, row-major 4x4)
void se3_exp_left(const double d[6], double T[16]) {
  const double wx = d[3], wy = d[4], wz = d[5];
  const double th2 = wx * wx + wy * wy + wz * wz;
  const double th = std::sqrt(th2);
  double A, B, C;
  if (th < 1e-8) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
    C = 1.0 / 6.0 - th2 / 120.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
    C = (1.0 - A) / th2;
  }
  const double W[9] = {0, -wz, wy, wz, 0, -wx, -wy, wx, 0};
  double W2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      W2[i * 3 + j] = s;
    }
  double R[9], V[9];
  for (int i = 0; i < 9; ++i) {
    R[i] = (i % 4 == 0 ? 1.0 : 0.0) + A * W[i] + B * W2[i];
    V[i] = (i % 4 == 0 ? 1.0 : 0.0) + B * W[i] + C * W2[i];
  }
  double t[3];
  for (int i = 0; i < 3; ++i)
    t[i] = V[i * 3] * d[0] + V[i * 3 + 1] * d[1] + V[i * 3 + 2] * d[2];
  double Tn[16];
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += R[i * 3 + k] * T[k * 4 + j];
      Tn[i * 4 + j] = s;
    }
    Tn[i * 4 + 3] += t[i];
  }
  Tn[12] = 0; Tn[13] = 0; Tn[14] = 0; Tn[15] = 1;
  std::memcpy(T, Tn, sizeof(Tn));
}

}  // namespace

extern "C" {

// Build the NDT target model (PCL VoxelGridCovariance semantics).
void* ndt_cpu_create(const float* pts, int64_t n, double resolution,
                     int32_t min_points, double outlier_ratio) {
  auto* g = new NdtGrid();
  g->resolution = resolution;
  // Magnusson mixture constants — identical formulas to gauss_constants()
  const double c1 = 10.0 * (1.0 - outlier_ratio);
  const double c2 = outlier_ratio / (resolution * resolution * resolution);
  const double d3 = -std::log(c2);
  g->d1 = -std::log(c1 + c2) - d3;
  g->d2 = -2.0 * std::log((-std::log(c1 * std::exp(-0.5) + c2) - d3) / g->d1);

  struct Acc { double s[3] = {0,0,0}; double ss[6] = {0,0,0,0,0,0}; int64_t n = 0; };
  std::unordered_map<uint64_t, Acc> acc;
  const double inv = 1.0 / resolution;
  for (int64_t i = 0; i < n; ++i) {
    const double x = pts[i * 3], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    auto& a = acc[pack_key((int32_t)std::floor(x * inv),
                           (int32_t)std::floor(y * inv),
                           (int32_t)std::floor(z * inv))];
    a.s[0] += x; a.s[1] += y; a.s[2] += z;
    a.ss[0] += x * x; a.ss[1] += x * y; a.ss[2] += x * z;
    a.ss[3] += y * y; a.ss[4] += y * z; a.ss[5] += z * z;
    a.n++;
  }
  if (min_points <= 0) min_points = kMinPointsDefault;
  for (auto& kv : acc) {
    const Acc& a = kv.second;
    if (a.n < min_points) continue;
    const double m = 1.0 / (double)a.n;
    double mu[3] = {a.s[0] * m, a.s[1] * m, a.s[2] * m};
    // unbiased covariance, like pcl::VoxelGridCovariance
    const double um = 1.0 / (double)(a.n - 1);
    double cov[9] = {
        (a.ss[0] - a.s[0] * mu[0]) * um, (a.ss[1] - a.s[0] * mu[1]) * um,
        (a.ss[2] - a.s[0] * mu[2]) * um, 0, (a.ss[3] - a.s[1] * mu[1]) * um,
        (a.ss[4] - a.s[1] * mu[2]) * um, 0, 0, (a.ss[5] - a.s[2] * mu[2]) * um};
    cov[3] = cov[1]; cov[6] = cov[2]; cov[7] = cov[5];
    // eigenvalue inflation: lambda_i >= 0.01 * lambda_max
    double w[3], v[9], tmp[9];
    std::memcpy(tmp, cov, sizeof(cov));
    eig_sym3(tmp, w, v);
    double wmax = std::fmax(w[0], std::fmax(w[1], w[2]));
    if (wmax <= 0) continue;
    for (int k = 0; k < 3; ++k) w[k] = std::fmax(w[k], 0.01 * wmax);
    // inv_cov = V diag(1/w) V^T
    double ic[6];
    {
      double iv[9];
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) iv[i * 3 + j] = v[i * 3 + j] / w[j];
      int idx = 0;
      for (int i = 0; i < 3; ++i)
        for (int j = i; j < 3; ++j) {
          double s = 0;
          for (int k = 0; k < 3; ++k) s += iv[i * 3 + k] * v[j * 3 + k];
          ic[idx++] = s;
        }
    }
    int32_t id = (int32_t)(g->mu.size() / 3);
    g->index.emplace(kv.first, id);
    g->mu.insert(g->mu.end(), mu, mu + 3);
    g->icov.insert(g->icov.end(), ic, ic + 6);
  }
  return g;
}

int64_t ndt_cpu_num_leaves(void* h) {
  return (int64_t)(((NdtGrid*)h)->mu.size() / 3);
}

void ndt_cpu_destroy(void* h) { delete (NdtGrid*)h; }

// Run `max_iter` damped-Newton iterations of DIRECT7 NDT; `pose` is a
// row-major 4x4 (in: guess, out: result). epsilon==0 forces exactly
// max_iter iterations (the timing configuration). Returns iterations run.
int32_t ndt_cpu_align(void* h, const float* src, int64_t n, double* pose,
                      int32_t max_iter, double epsilon, int32_t n_threads,
                      double* out_score) {
  NdtGrid* g = (NdtGrid*)h;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#endif
  static const int32_t OFF[7][3] = {{0, 0, 0}, {1, 0, 0}, {-1, 0, 0},
                                    {0, 1, 0}, {0, -1, 0}, {0, 0, 1},
                                    {0, 0, -1}};
  const double inv = 1.0 / g->resolution;
  const double d1 = g->d1, d2 = g->d2;
  double T[16];
  std::memcpy(T, pose, sizeof(T));
  double lam = 1e-4, prev_score = 1e300;
  int32_t it = 0;
  for (; it < max_iter; ++it) {
    // acc: [score, g0..g5, H upper 21] = 28 doubles
    double A[28] = {0};
#pragma omp parallel for reduction(+ : A[:28]) schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const double px = src[i * 3], py = src[i * 3 + 1], pz = src[i * 3 + 2];
      if (!std::isfinite(px)) continue;
      const double qx = T[0] * px + T[1] * py + T[2] * pz + T[3];
      const double qy = T[4] * px + T[5] * py + T[6] * pz + T[7];
      const double qz = T[8] * px + T[9] * py + T[10] * pz + T[11];
      const int32_t cx = (int32_t)std::floor(qx * inv);
      const int32_t cy = (int32_t)std::floor(qy * inv);
      const int32_t cz = (int32_t)std::floor(qz * inv);
      for (int k = 0; k < 7; ++k) {
        auto itr = g->index.find(
            pack_key(cx + OFF[k][0], cy + OFF[k][1], cz + OFF[k][2]));
        if (itr == g->index.end()) continue;
        const int32_t vi = itr->second;
        const double* mu = &g->mu[vi * 3];
        const double* S = &g->icov[vi * 6];
        const double xx = qx - mu[0], xy = qy - mu[1], xz = qz - mu[2];
        const double ax = S[0] * xx + S[1] * xy + S[2] * xz;
        const double ay = S[1] * xx + S[3] * xy + S[4] * xz;
        const double az = S[2] * xx + S[4] * xy + S[5] * xz;
        const double m = xx * ax + xy * ay + xz * az;
        const double e = std::exp(-0.5 * d2 * m);
        A[0] += d1 * e;
        const double c = -d1 * d2 * e;
        // grad += c * J^T a,  J = [I | -skew(q)]
        A[1] += c * ax;
        A[2] += c * ay;
        A[3] += c * az;
        A[4] += c * (qy * az - qz * ay);
        A[5] += c * (qz * ax - qx * az);
        A[6] += c * (qx * ay - qy * ax);
        // H += c * J^T S J  (GN part), B = S*skew(q)
        const double b00 = S[1] * qz - S[2] * qy;
        const double b10 = S[3] * qz - S[4] * qy;
        const double b20 = S[4] * qz - S[5] * qy;
        const double b01 = S[2] * qx - S[0] * qz;
        const double b11 = S[4] * qx - S[1] * qz;
        const double b21 = S[5] * qx - S[2] * qz;
        const double b02 = S[0] * qy - S[1] * qx;
        const double b12 = S[1] * qy - S[3] * qx;
        const double b22 = S[2] * qy - S[4] * qx;
        A[7] += c * S[0];  A[8] += c * S[1];  A[9] += c * S[2];
        A[10] -= c * b00;  A[11] -= c * b01;  A[12] -= c * b02;
        A[13] += c * S[3]; A[14] += c * S[4];
        A[15] -= c * b10;  A[16] -= c * b11;  A[17] -= c * b12;
        A[18] += c * S[5];
        A[19] -= c * b20;  A[20] -= c * b21;  A[21] -= c * b22;
        A[22] += c * (qz * b10 - qy * b20);
        A[23] += c * (qz * b11 - qy * b21);
        A[24] += c * (qz * b12 - qy * b22);
        A[25] += c * (qx * b21 - qz * b01);
        A[26] += c * (qx * b22 - qz * b02);
        A[27] += c * (qy * b02 - qx * b12);
      }
    }
    const double score = A[0];
    double H[36];
    const double* u = A + 7;
    const int map6[6][6] = {{0, 1, 2, 3, 4, 5},    {1, 6, 7, 8, 9, 10},
                            {2, 7, 11, 12, 13, 14}, {3, 8, 12, 15, 16, 17},
                            {4, 9, 13, 16, 18, 19}, {5, 10, 14, 17, 19, 20}};
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) H[i * 6 + j] = u[map6[i][j]];
    double trace = 0;
    for (int i = 0; i < 6; ++i) trace += H[i * 6 + i];
    double delta[6];
    if (!solve6(H, A + 1, lam * (trace / 6.0 + 1e-12), delta)) break;
    se3_exp_left(delta, T);
    if (score < prev_score) lam = std::fmax(lam * 0.2, 1e-10);
    else lam = std::fmin(lam * 10.0, 1e5);
    prev_score = score;
    if (epsilon > 0) {
      double dn = 0;
      for (int k = 0; k < 6; ++k) dn += delta[k] * delta[k];
      if (std::sqrt(dn) < epsilon) { ++it; break; }
    }
  }
  std::memcpy(pose, T, sizeof(T));
  if (out_score) *out_score = prev_score;
  return it;
}

int32_t ndt_cpu_max_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
