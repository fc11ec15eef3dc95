// Native host-side runtime: scan quantization/packing and PLY IO.
//
// The reference delegates its host hot loops to C++ (gtsam_points point ops,
// preprocessing passes); in this framework the device does the math, but the
// per-scan host work that remains — quantizing raw f64 sensor points into the
// int16 upload buffer, and bulk PLY file IO — is memory-bandwidth bound and
// benefits from a tight native loop over numpy's generic ufunc machinery.
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>

extern "C" {

// Quantize n points (f64 xyz, optional f64 times) into an int16 (cap, 4)
// buffer: [x, y, z, t] at pt_scale / t_scale per LSB. Returns n clamped to
// cap. The buffer must be zero-initialized by the caller (padding lanes).
int pack_scan_i16(const double* pts, const double* times, long n, long cap,
                  double pt_scale, double t_scale, int16_t* out) {
  if (n > cap) n = cap;
  const double inv_p = 1.0 / pt_scale;
  const double inv_t = t_scale > 0 ? 1.0 / t_scale : 0.0;
  for (long i = 0; i < n; ++i) {
    const double* p = pts + 3 * i;
    int16_t* o = out + 4 * i;
    for (int k = 0; k < 3; ++k) {
      double v = p[k] * inv_p;
      if (!(v > -32767.0)) v = -32767.0;   // also catches NaN -> clamp
      if (v > 32767.0) v = 32767.0;
      o[k] = (int16_t)llround(v);
    }
    if (times) {
      double t = times[i] * inv_t;
      if (!(t > 0.0)) t = 0.0;
      if (t > 32767.0) t = 32767.0;
      o[3] = (int16_t)llround(t);
    }
  }
  return (int)n;
}

// Count vertices of a binary_little_endian PLY with float x/y/z leading
// properties. Returns -1 on parse failure.
long ply_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long count = -1;
  while (fgets(line, sizeof(line), f)) {
    if (strncmp(line, "element vertex", 14) == 0) {
      sscanf(line, "element vertex %ld", &count);
    }
    if (strncmp(line, "end_header", 10) == 0) break;
  }
  fclose(f);
  return count;
}

// Read up to max_n xyz float32 vertices into out (max_n * 3). Assumes the
// vertex element leads with float x, y, z; extra per-vertex bytes are skipped
// via stride. Returns vertices read or -1.
long ply_read_xyz(const char* path, long max_n, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long count = -1;
  int stride = 0;
  bool in_vertex = false;
  while (fgets(line, sizeof(line), f)) {
    if (strncmp(line, "element vertex", 14) == 0) {
      sscanf(line, "element vertex %ld", &count);
      in_vertex = true;
      stride = 0;
    } else if (strncmp(line, "element", 7) == 0) {
      in_vertex = false;
    } else if (in_vertex && strncmp(line, "property", 8) == 0) {
      if (strstr(line, "double")) stride += 8;
      else if (strstr(line, "float")) stride += 4;
      else if (strstr(line, "uchar") || strstr(line, "char")) stride += 1;
      else if (strstr(line, "ushort") || strstr(line, "short")) stride += 2;
      else stride += 4;
    }
    if (strncmp(line, "end_header", 10) == 0) break;
  }
  if (count < 0 || stride < 12) { fclose(f); return -1; }
  if (count > max_n) count = max_n;
  const int skip = stride - 12;
  for (long i = 0; i < count; ++i) {
    if (fread(out + 3 * i, 4, 3, f) != 3) { fclose(f); return i; }
    if (skip > 0 && fseek(f, skip, SEEK_CUR) != 0) { fclose(f); return i + 1; }
  }
  fclose(f);
  return count;
}

// Write a binary_little_endian xyz PLY. Returns 0 on success.
int ply_write_xyz(const char* path, const float* pts, long n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %ld\n"
          "property float x\nproperty float y\nproperty float z\nend_header\n",
          n);
  size_t written = fwrite(pts, 12, n, f);
  fclose(f);
  return written == (size_t)n ? 0 : -1;
}

}  // extern "C"
