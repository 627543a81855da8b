// Native ETL hot loop: velodyne point-cloud -> sparse depth map projection.
//
// The reference does this in numpy per frame (reference:
// kitti_eval/depth_evaluation_utils.py::generate_depth_map); at ETL scale
// (tens of thousands of frames x ~120k points) the numpy pipeline
// allocates several intermediate arrays per frame. This single-pass C++
// version projects and z-buffers in one scan with no allocations, and
// exposes a batched entry point that threads across frames (no GIL).
//
// Built by supervised_dispnet_tpu/native/__init__.py with g++ -O3 at first
// use; loaded via ctypes. Parity-tested against the numpy path.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// points: (n, 4) float32 [x, y, z, reflectance]; P: (3, 4) float64
// row-major; depth_out: (H, W) float32, zero-initialized by the caller.
// Nearest point wins on pixel collisions (z-buffer).
void project_velodyne(const float* points, int64_t n_points, const double* P,
                      int64_t H, int64_t W, float* depth_out) {
  for (int64_t i = 0; i < n_points; ++i) {
    const float x = points[i * 4 + 0];
    const float y = points[i * 4 + 1];
    const float z = points[i * 4 + 2];
    if (x < 1e-3f) continue;  // behind / beside the sensor
    const double px = P[0] * x + P[1] * y + P[2] * z + P[3];
    const double py = P[4] * x + P[5] * y + P[6] * z + P[7];
    const double pz = P[8] * x + P[9] * y + P[10] * z + P[11];
    if (pz <= 0.0) continue;
    const int64_t u = (int64_t)std::llround(px / pz);
    const int64_t v = (int64_t)std::llround(py / pz);
    if (u < 0 || u >= W || v < 0 || v >= H) continue;
    float* cell = depth_out + v * W + u;
    const float d = (float)pz;
    if (*cell == 0.0f || d < *cell) *cell = d;
  }
}

// Batched, multi-threaded variant: frames are independent.
// points_flat: concatenation of all frames' (n_i, 4) points;
// offsets: (n_frames + 1,) int64 prefix offsets into points_flat (in points);
// Ps: (n_frames, 12) float64; depths_out: (n_frames, H, W) float32 zeroed.
void project_velodyne_batch(const float* points_flat, const int64_t* offsets,
                            const double* Ps, int64_t n_frames, int64_t H,
                            int64_t W, float* depths_out, int64_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  workers.reserve((size_t)n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int64_t f = t; f < n_frames; f += n_threads) {
        const float* pts = points_flat + offsets[f] * 4;
        const int64_t n = offsets[f + 1] - offsets[f];
        project_velodyne(pts, n, Ps + f * 12, H, W, depths_out + f * H * W);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
