// Native host-side batch loader: npy read + subsample + augmentation.
//
// TPU-native equivalent of the reference's DataLoader worker processes
// (modelnet/train.py:25, num_workers=8): where the reference parallelizes
// python __getitem__ bodies (np.load + np.random.choice + numpy
// augmentation, modelnet_shrec_loader.py:193-245) across forked workers,
// this runs the whole per-item pipeline in C++ worker threads inside one
// shared library call — no fork, no GIL, no numpy temporaries.  The
// Python wrapper (sonet_tpu/data/native_loader.py) hands a batch of file
// paths + per-item seeds and receives fully collated (B, n, 3) arrays.
//
// Augmentation parity (data/augmentation.py:16-144 in the reference,
// sonet_tpu/data/augmentation.py here): identical transforms and
// parameter ranges — uniform y-rotation applied to pc+sn+som, clipped
// 3-axis gaussian perturbation rotation, gaussian jitter (sigma .01 clip
// .05; som .04/.1), scale U(0.8,1.2), shift U(-0.1,0.1).  The RNG STREAM
// differs from numpy's (std::mt19937_64 vs PCG64) — draws match in
// distribution, not bitwise; determinism per (seed, mode, epoch, index)
// is preserved because Python derives one 64-bit seed per item from the
// same SeedSequence tuple the numpy path uses (documented in PARITY.md).
//
// npy format: v1.0/2.0 headers, little-endian '<f4', C-order, 2-D.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Npy {
  std::vector<float> data;
  int64_t rows = 0, cols = 0;
};

// minimal .npy reader: magic, version, header dict, raw f32 payload
bool read_npy_f32(const char* path, Npy* out, std::string* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { *err = std::string("cannot open ") + path; return false; }
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    *err = std::string("bad npy magic: ") + path; std::fclose(f); return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { *err = "truncated header"; std::fclose(f); return false; }
    hlen = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { *err = "truncated header"; std::fclose(f); return false; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string hdr(hlen, '\0');
  if (std::fread(&hdr[0], 1, hlen, f) != hlen) {
    *err = "truncated header"; std::fclose(f); return false;
  }
  if (hdr.find("'<f4'") == std::string::npos &&
      hdr.find("\"<f4\"") == std::string::npos) {
    *err = std::string("npy dtype is not <f4: ") + path; std::fclose(f); return false;
  }
  if (hdr.find("'fortran_order': True") != std::string::npos) {
    *err = std::string("fortran order unsupported: ") + path; std::fclose(f); return false;
  }
  size_t sp = hdr.find("'shape':");
  if (sp == std::string::npos) { *err = "no shape in header"; std::fclose(f); return false; }
  size_t lp = hdr.find('(', sp), rp = hdr.find(')', sp);
  if (lp == std::string::npos || rp == std::string::npos) {
    *err = "bad shape"; std::fclose(f); return false;
  }
  std::string shape = hdr.substr(lp + 1, rp - lp - 1);
  int64_t dims[4] = {0, 0, 0, 0};
  int nd = 0;
  const char* p = shape.c_str();
  while (*p && nd < 4) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    char* end = nullptr;
    long long v = std::strtoll(p, &end, 10);
    if (end == p) break;
    dims[nd++] = v;
    p = end;
  }
  if (nd == 1) { dims[1] = 1; nd = 2; }
  if (nd != 2) { *err = std::string("npy is not 2-D: ") + path; std::fclose(f); return false; }
  out->rows = dims[0];
  out->cols = dims[1];
  out->data.resize(size_t(dims[0]) * dims[1]);
  size_t want = out->data.size();
  if (std::fread(out->data.data(), 4, want, f) != want) {
    *err = std::string("truncated payload: ") + path; std::fclose(f); return false;
  }
  std::fclose(f);
  return true;
}

struct Mat3 {
  double m[9];
  void apply(float* v) const {  // row-vector convention: v' = v @ M
    double x = v[0], y = v[1], z = v[2];
    v[0] = float(x * m[0] + y * m[3] + z * m[6]);
    v[1] = float(x * m[1] + y * m[4] + z * m[7]);
    v[2] = float(x * m[2] + y * m[5] + z * m[8]);
  }
};

Mat3 rot_y(double a) {
  double c = std::cos(a), s = std::sin(a);
  return Mat3{{c, 0, s, 0, 1, 0, -s, 0, c}};
}

Mat3 matmul(const Mat3& A, const Mat3& B) {  // A @ B
  Mat3 r{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += A.m[i * 3 + k] * B.m[k * 3 + j];
      r.m[i * 3 + j] = s;
    }
  return r;
}

// small 3-axis rotation Rz @ Ry @ Rx with clipped gaussian angles
// (augmentation.py _perturbation_matrix)
Mat3 perturbation_matrix(std::mt19937_64& rng, double sigma, double clip) {
  std::normal_distribution<double> gauss(0.0, 1.0);
  double a[3];
  for (double& ai : a) {
    ai = sigma * gauss(rng);
    if (ai > clip) ai = clip;
    if (ai < -clip) ai = -clip;
  }
  double cx = std::cos(a[0]), sx = std::sin(a[0]);
  double cy = std::cos(a[1]), sy = std::sin(a[1]);
  double cz = std::cos(a[2]), sz = std::sin(a[2]);
  Mat3 Rx{{1, 0, 0, 0, cx, -sx, 0, sx, cx}};
  Mat3 Ry{{cy, 0, sy, 0, 1, 0, -sy, 0, cy}};
  Mat3 Rz{{cz, -sz, 0, sz, cz, 0, 0, 0, 1}};
  return matmul(matmul(Rz, Ry), Rx);
}

void jitter(float* v, int64_t n, std::mt19937_64& rng, double sigma,
            double clip) {
  std::normal_distribution<double> gauss(0.0, 1.0);
  for (int64_t i = 0; i < n; i++) {
    double d = sigma * gauss(rng);
    if (d > clip) d = clip;
    if (d < -clip) d = -clip;
    v[i] += float(d);
  }
}

struct Args {
  const char** pc_paths;
  const char** som_paths;
  int64_t n_items, n_points, n_nodes;
  const uint64_t* item_seeds;
  int augment, rot_horizontal, rot_perturbation, translation_perturbation;
  float *pc_out, *sn_out, *node_out;
};

bool load_one(const Args& a, int64_t i, std::string* err) {
  Npy raw, som;
  if (!read_npy_f32(a.pc_paths[i], &raw, err)) return false;
  if (!read_npy_f32(a.som_paths[i], &som, err)) return false;
  if (raw.cols < 3) { *err = "pc npy has <3 columns"; return false; }
  bool has_sn = raw.cols >= 6;
  if (som.rows != a.n_nodes || som.cols != 3) {
    *err = "som npy shape mismatch";
    return false;
  }
  if (raw.rows < a.n_points) { *err = "fewer points than n_points"; return false; }

  std::mt19937_64 rng(a.item_seeds[i]);

  // distinct random subsample (np.random.choice replace=False semantics,
  // modelnet_shrec_loader.py:198): partial Fisher-Yates over row indices
  int64_t N = raw.rows;
  std::vector<int32_t> idx(N);
  for (int64_t j = 0; j < N; j++) idx[j] = int32_t(j);
  for (int64_t j = 0; j < a.n_points; j++) {
    std::uniform_int_distribution<int64_t> pick(j, N - 1);
    std::swap(idx[j], idx[pick(rng)]);
  }

  float* pc = a.pc_out + i * a.n_points * 3;
  float* sn = a.sn_out + i * a.n_points * 3;
  float* node = a.node_out + i * a.n_nodes * 3;
  for (int64_t j = 0; j < a.n_points; j++) {
    const float* row = raw.data.data() + size_t(idx[j]) * raw.cols;
    pc[j * 3 + 0] = row[0];
    pc[j * 3 + 1] = row[1];
    pc[j * 3 + 2] = row[2];
    if (has_sn) {
      sn[j * 3 + 0] = row[3];
      sn[j * 3 + 1] = row[4];
      sn[j * 3 + 2] = row[5];
    } else {
      sn[j * 3 + 0] = sn[j * 3 + 1] = sn[j * 3 + 2] = 0.0f;
    }
  }
  std::memcpy(node, som.data.data(), size_t(a.n_nodes) * 3 * sizeof(float));

  if (!a.augment) return true;

  // train_augment stack, in the reference's draw order
  // (modelnet_shrec_loader.py:219-245)
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  if (a.rot_horizontal) {
    Mat3 R = rot_y(uni(rng) * 2.0 * M_PI);
    for (int64_t j = 0; j < a.n_points; j++) R.apply(pc + j * 3);
    for (int64_t j = 0; j < a.n_points; j++) R.apply(sn + j * 3);
    for (int64_t j = 0; j < a.n_nodes; j++) R.apply(node + j * 3);
  }
  if (a.rot_perturbation) {
    Mat3 R = perturbation_matrix(rng, 0.06, 0.18);
    for (int64_t j = 0; j < a.n_points; j++) R.apply(pc + j * 3);
    for (int64_t j = 0; j < a.n_points; j++) R.apply(sn + j * 3);
    for (int64_t j = 0; j < a.n_nodes; j++) R.apply(node + j * 3);
  }
  jitter(pc, a.n_points * 3, rng, 0.01, 0.05);
  jitter(sn, a.n_points * 3, rng, 0.01, 0.05);
  jitter(node, a.n_nodes * 3, rng, 0.04, 0.10);
  double scale = 0.8 + 0.4 * uni(rng);
  for (int64_t j = 0; j < a.n_points * 3; j++) pc[j] *= float(scale);
  for (int64_t j = 0; j < a.n_points * 3; j++) sn[j] *= float(scale);
  for (int64_t j = 0; j < a.n_nodes * 3; j++) node[j] *= float(scale);
  if (a.translation_perturbation) {
    float shift[3];
    for (float& s : shift) s = float(-0.1 + 0.2 * uni(rng));
    for (int64_t j = 0; j < a.n_points; j++)
      for (int c = 0; c < 3; c++) pc[j * 3 + c] += shift[c];
    for (int64_t j = 0; j < a.n_nodes; j++)
      for (int c = 0; c < 3; c++) node[j * 3 + c] += shift[c];
  }
  return true;
}

thread_local std::string g_err;

}  // namespace

extern "C" {

const char* sonet_loader_error() { return g_err.c_str(); }

// Returns 0 on success, -1 on error (message via sonet_loader_error,
// from the calling thread).
int sonet_load_batch(const char** pc_paths, const char** som_paths,
                     int64_t n_items, int64_t n_points, int64_t n_nodes,
                     const uint64_t* item_seeds, int augment,
                     int rot_horizontal, int rot_perturbation,
                     int translation_perturbation, int64_t n_threads,
                     float* pc_out, float* sn_out, float* node_out) {
  Args a{pc_paths, som_paths, n_items, n_points, n_nodes, item_seeds,
         augment, rot_horizontal, rot_perturbation, translation_perturbation,
         pc_out, sn_out, node_out};
  if (n_threads <= 1 || n_items <= 1) {
    for (int64_t i = 0; i < n_items; i++) {
      std::string err;
      if (!load_one(a, i, &err)) { g_err = err; return -1; }
    }
    return 0;
  }
  int64_t T = std::min<int64_t>(n_threads, n_items);
  std::atomic<int64_t> next(0);
  std::vector<std::string> errs;
  errs.resize(size_t(T));
  std::vector<std::thread> threads;
  for (int64_t t = 0; t < T; t++) {
    threads.emplace_back([&, t]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n_items) break;
        std::string err;
        if (!load_one(a, i, &err)) { errs[size_t(t)] = err; break; }
      }
    });
  }
  for (auto& th : threads) th.join();
  for (auto& e : errs)
    if (!e.empty()) { g_err = e; return -1; }
  return 0;
}

}  // extern "C"
