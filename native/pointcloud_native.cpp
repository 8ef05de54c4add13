// Native host-side point-cloud codec for lidarslam_ros2_tpu.
//
// The reference's ingestion path is C++ (rclcpp + pcl::fromROSMsg); this is
// the equivalent native layer for our runtime: bulk extraction of XYZI from
// PointCloud2 payloads (arbitrary field offsets/types, strided point_step)
// and binary PCD block IO. Exposed with a plain C ABI for ctypes — no
// pybind11 dependency in the image.
//
// Build: native/build.sh (g++ -O3 -shared), loaded lazily by
// lidarslam_ros2_tpu/io/native.py with a pure-numpy fallback.

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

// sensor_msgs/PointField datatype codes
enum FieldType : int32_t {
  INT8 = 1, UINT8 = 2, INT16 = 3, UINT16 = 4,
  INT32 = 5, UINT32 = 6, FLOAT32 = 7, FLOAT64 = 8,
};

inline float load_field(const uint8_t* p, int32_t type) {
  switch (type) {
    case FLOAT32: { float v; std::memcpy(&v, p, 4); return v; }
    case FLOAT64: { double v; std::memcpy(&v, p, 8); return static_cast<float>(v); }
    case UINT8:   { return static_cast<float>(*p); }
    case INT8:    { int8_t v; std::memcpy(&v, p, 1); return static_cast<float>(v); }
    case UINT16:  { uint16_t v; std::memcpy(&v, p, 2); return static_cast<float>(v); }
    case INT16:   { int16_t v; std::memcpy(&v, p, 2); return static_cast<float>(v); }
    case UINT32:  { uint32_t v; std::memcpy(&v, p, 4); return static_cast<float>(v); }
    case INT32:   { int32_t v; std::memcpy(&v, p, 4); return static_cast<float>(v); }
    default:      { return 0.0f; }
  }
}

}  // namespace

extern "C" {

// Decode a PointCloud2 data blob into a dense (n, 4) float32 XYZI array,
// dropping non-finite points. Returns the number of valid points written.
// off_i < 0 means "no intensity field" (zero-filled).
int64_t pc2_decode_xyzi(const uint8_t* data, int64_t n, int32_t point_step,
                        int32_t off_x, int32_t off_y, int32_t off_z,
                        int32_t off_i, int32_t type_xyz, int32_t type_i,
                        float* out) {
  int64_t m = 0;
  const bool fast = (type_xyz == FLOAT32);
  for (int64_t k = 0; k < n; ++k) {
    const uint8_t* p = data + k * point_step;
    float x, y, z;
    if (fast) {
      std::memcpy(&x, p + off_x, 4);
      std::memcpy(&y, p + off_y, 4);
      std::memcpy(&z, p + off_z, 4);
    } else {
      x = load_field(p + off_x, type_xyz);
      y = load_field(p + off_y, type_xyz);
      z = load_field(p + off_z, type_xyz);
    }
    if (!(std::isfinite(x) && std::isfinite(y) && std::isfinite(z))) continue;
    float inten = 0.0f;
    if (off_i >= 0) inten = load_field(p + off_i, type_i);
    float* o = out + m * 4;
    o[0] = x; o[1] = y; o[2] = z; o[3] = inten;
    ++m;
  }
  return m;
}

// Cylindrical min/max range mask over an (n, 4) XYZI array -> compacted
// in place (the reference's use_min_max_filter, done at ingestion rate).
int64_t range_filter_xyzi(float* inout, int64_t n, float min_range,
                          float max_range) {
  const float min2 = min_range * min_range;
  const float max2 = max_range * max_range;
  int64_t m = 0;
  for (int64_t k = 0; k < n; ++k) {
    const float* p = inout + k * 4;
    const float r2 = p[0] * p[0] + p[1] * p[1];
    if (r2 > min2 && r2 < max2) {
      if (m != k) std::memcpy(inout + m * 4, p, 16);
      ++m;
    }
  }
  return m;
}

// Rigid transform of an (n, 4) XYZI array in place (row-major 4x4 T).
void transform_xyzi(float* inout, int64_t n, const float* T) {
  const float r00 = T[0], r01 = T[1], r02 = T[2], tx = T[3];
  const float r10 = T[4], r11 = T[5], r12 = T[6], ty = T[7];
  const float r20 = T[8], r21 = T[9], r22 = T[10], tz = T[11];
  for (int64_t k = 0; k < n; ++k) {
    float* p = inout + k * 4;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = r00 * x + r01 * y + r02 * z + tx;
    p[1] = r10 * x + r11 * y + r12 * z + ty;
    p[2] = r20 * x + r21 * y + r22 * z + tz;
  }
}

int32_t native_abi_version() { return 1; }

}  // extern "C"
