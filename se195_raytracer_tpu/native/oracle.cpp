// Native CPU reference engine for the se195 TPU ray-tracing framework.
//
// Role: the framework's native "CPU twin" — the same role smallptCPU.cpp
// (reference: smallptgpu-v1.6/smallptCPU.cpp:77-132) and the scalar kernel
// port raytracer_non_OpenCL.c play for the reference's OpenCL kernels.
// This is an independent implementation written against the reference's
// *semantics* (geomfunc.h:167-483, simplernd.h:34-48, Raytracer3.2.03/
// raytracer_kernel.cl:89-382), not a copy of its code: SoA scene tables,
// index-based loops, float3 helpers — no shared structure with the
// originals beyond the math itself.
//
// Built as liboracle.so (see Makefile); consumed via ctypes from
// se195_raytracer_tpu/native/bindings.py. OpenMP-parallel over pixels
// (deterministic: every pixel owns its RNG stream and output).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 v3(float x, float y, float z) { return V3{x, y, z}; }
inline V3 operator+(V3 a, V3 b) { return v3(a.x + b.x, a.y + b.y, a.z + b.z); }
inline V3 operator-(V3 a, V3 b) { return v3(a.x - b.x, a.y - b.y, a.z - b.z); }
inline V3 operator*(float k, V3 a) { return v3(k * a.x, k * a.y, k * a.z); }
inline V3 hadamard(V3 a, V3 b) { return v3(a.x * b.x, a.y * b.y, a.z * b.z); }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
  return v3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x);
}
inline V3 normalized(V3 a) {
  float inv = 1.0f / std::sqrt(dot(a, a));
  return inv * a;
}

constexpr float kEps = 0.01f;  // smallpt family epsilon (geom.h:29)
constexpr float kPi = 3.14159265358979323846f;

// Scene table view (SoA, matches the Python Scene pytree layout).
struct SceneView {
  const float* center;    // [n][3]
  const float* radius;    // [n]
  const float* emission;  // [n][3]
  const float* color;     // [n][3]
  const int32_t* refl;    // [n] 0=DIFF 1=SPEC 2=REFR
  int n;

  V3 c(int i) const { return v3(center[3 * i], center[3 * i + 1], center[3 * i + 2]); }
  V3 e(int i) const { return v3(emission[3 * i], emission[3 * i + 1], emission[3 * i + 2]); }
  V3 col(int i) const { return v3(color[3 * i], color[3 * i + 1], color[3 * i + 2]); }
};

// Two-stream MWC generator, bit-compatible with simplernd.h:34-48.
struct Rng {
  uint32_t a, b;
  float next() {
    a = 36969u * (a & 0xffffu) + (a >> 16);
    b = 18000u * (b & 0xffffu) + (b >> 16);
    uint32_t bits = (((a << 16) + b) & 0x007fffffu) | 0x40000000u;
    float f;
    std::memcpy(&f, &bits, 4);
    return (f - 2.0f) * 0.5f;
  }
};

// Quadratic sphere test, near-root-over-epsilon selection
// (semantics of geomfunc.h:32-59).
inline float hit_sphere(const SceneView& s, int i, V3 o, V3 d) {
  V3 oc = s.c(i) - o;
  float b = dot(oc, d);
  float det = b * b - dot(oc, oc) + s.radius[i] * s.radius[i];
  if (det < 0.0f) return 0.0f;
  float sq = std::sqrt(det);
  float t = b - sq;
  if (t > kEps) return t;
  t = b + sq;
  return t > kEps ? t : 0.0f;
}

// Nearest hit, descending index with strict improvement so ties go to the
// larger index (semantics of geomfunc.h:71-92).
inline bool nearest_hit(const SceneView& s, V3 o, V3 d, float* t_out,
                        int* id_out) {
  float best = 1e20f;
  int id = 0;
  for (int i = s.n - 1; i >= 0; --i) {
    float t = hit_sphere(s, i, o, d);
    if (t != 0.0f && t < best) {
      best = t;
      id = i;
    }
  }
  *t_out = best;
  *id_out = id;
  return best < 1e20f;
}

inline bool blocked(const SceneView& s, V3 o, V3 d, float max_t) {
  for (int i = s.n - 1; i >= 0; --i) {
    float t = hit_sphere(s, i, o, d);
    if (t != 0.0f && t < max_t) return true;
  }
  return false;
}

// The reference's emissive test replicates the viszero macro exactly,
// including its bug: y is never examined (vec.h:44).
inline bool is_emitter(V3 e) { return e.x != 0.0f || e.z != 0.0f; }

// Next-event estimation over all emitters in index order, two RNG draws
// per emitter before any rejection (semantics of geomfunc.h:112-165).
inline V3 direct_light(const SceneView& s, Rng& rng, V3 p, V3 nl) {
  V3 sum = v3(0, 0, 0);
  for (int i = 0; i < s.n; ++i) {
    V3 le = s.e(i);
    if (!is_emitter(le)) continue;
    // Match the reference binaries: gcc/MSVC evaluate the two GetRandom
    // arguments of UniformSampleSphere right-to-left (geomfunc.h:138), so
    // the first stream draw feeds phi (u2) and the second feeds zz (u1).
    float u2 = rng.next();
    float u1 = rng.next();
    float zz = 1.0f - 2.0f * u1;
    float rr = std::sqrt(std::fmax(0.0f, 1.0f - zz * zz));
    float phi = 2.0f * kPi * u2;
    V3 sph = v3(rr * std::cos(phi), rr * std::sin(phi), zz);
    V3 target = s.radius[i] * sph + s.c(i);
    V3 sd = target - p;
    float len = std::sqrt(dot(sd, sd));
    sd = (1.0f / len) * sd;
    float wo = dot(sd, sph);
    if (wo > 0.0f) continue;  // far hemisphere of the light
    float wi = dot(sd, nl);
    if (wi > 0.0f && !blocked(s, p, sd, len - kEps)) {
      float scale =
          (4.0f * kPi * s.radius[i] * s.radius[i]) * wi * (-wo) / (len * len);
      sum = sum + scale * le;
    }
  }
  return sum;
}

// Iterative bounce loop with throughput and the specular-bounce emission
// gate (semantics of geomfunc.h:167-483). direct_only reproduces
// RadianceDirectLighting's diffuse termination.
V3 trace(const SceneView& s, V3 o, V3 d, Rng& rng, bool direct_only,
         int max_depth) {
  V3 acc = v3(0, 0, 0);
  V3 tput = v3(1, 1, 1);
  bool was_specular = true;
  for (int depth = 0; depth < max_depth; ++depth) {
    float t;
    int id;
    if (!nearest_hit(s, o, d, &t, &id)) return acc;
    V3 hp = o + t * d;
    V3 n = normalized(hp - s.c(id));
    float facing = dot(n, d);
    // sign(0) == -1 in the reference macro (vec.h:59)
    V3 nl = (facing > 0.0f ? -1.0f : 1.0f) * n;
    V3 le = s.e(id);
    if (is_emitter(le)) {
      if (was_specular) acc = acc + hadamard(std::fabs(facing) * tput, le);
      return acc;
    }
    int mat = s.refl[id];
    if (mat == 0) {  // diffuse
      was_specular = false;
      tput = hadamard(tput, s.col(id));
      acc = acc + hadamard(tput, direct_light(s, rng, hp, nl));
      if (direct_only) return acc;
      float ang = 2.0f * kPi * rng.next();
      float r2 = rng.next();
      float r2s = std::sqrt(r2);
      V3 w = nl;
      V3 axis = std::fabs(w.x) > 0.1f ? v3(0, 1, 0) : v3(1, 0, 0);
      V3 u = normalized(cross(axis, w));
      V3 v = cross(w, u);
      d = (std::cos(ang) * r2s) * u + (std::sin(ang) * r2s) * v +
          std::sqrt(1.0f - r2) * w;
      o = hp;
    } else if (mat == 1) {  // mirror
      was_specular = true;
      tput = hadamard(tput, s.col(id));
      d = d - (2.0f * facing) * n;
      o = hp;
    } else {  // dielectric
      was_specular = true;
      V3 refl_dir = d - (2.0f * facing) * n;
      bool entering = dot(n, nl) > 0.0f;
      float eta = entering ? (1.0f / 1.5f) : 1.5f;
      float ddn = dot(d, nl);
      float cos2t = 1.0f - eta * eta * (1.0f - ddn * ddn);
      if (cos2t < 0.0f) {  // total internal reflection
        tput = hadamard(tput, s.col(id));
        d = refl_dir;
        o = hp;
        continue;
      }
      float k = (entering ? 1.0f : -1.0f) * (ddn * eta + std::sqrt(cos2t));
      V3 tdir = normalized(eta * d - k * n);
      float r0 = 0.25f / 6.25f;  // ((1.5-1)/(1.5+1))^2
      float c1 = 1.0f - (entering ? -ddn : dot(tdir, n));
      float fres = r0 + (1.0f - r0) * c1 * c1 * c1 * c1 * c1;
      float pick = 0.25f + 0.5f * fres;
      if (rng.next() < pick) {
        tput = hadamard((fres / pick) * tput, s.col(id));
        d = refl_dir;
      } else {
        tput = hadamard(((1.0f - fres) / (1.0f - pick)) * tput, s.col(id));
        d = tdir;
      }
      o = hp;
    }
  }
  return acc;
}

}  // namespace

extern "C" {

// Camera basis from orig/target (semantics of displayfunc.cpp:182-195).
void se195_camera_basis(const float* orig, const float* target, int width,
                        int height, float* basis_out /* 12 floats */) {
  V3 o = v3(orig[0], orig[1], orig[2]);
  V3 tg = v3(target[0], target[1], target[2]);
  V3 dir = normalized(tg - o);
  float fov = (kPi / 180.0f) * 45.0f;
  V3 cx = (float(width) * fov / float(height)) * normalized(cross(dir, v3(0, 1, 0)));
  V3 cy = fov * normalized(cross(cx, dir));
  float vals[12] = {o.x, o.y, o.z, dir.x, dir.y, dir.z,
                    cx.x, cx.y, cx.z, cy.x, cy.y, cy.z};
  std::memcpy(basis_out, vals, sizeof(vals));
}

// Progressive render: spp passes of (jittered camera ray + radiance) with
// running-mean accumulation (semantics of smallptCPU.cpp:77-132 /
// rendering_kernel.cl:29-96). Framebuffer row 0 is the image top; the
// camera y for row r is height-1-r. seeds is uint32[h*w*2] (in/out);
// out is float[h*w*3] (in/out accumulator); sample_start is the pass
// counter already accumulated into out.
void se195_pt_render(const float* center, const float* radius,
                     const float* emission, const float* color,
                     const int32_t* refl, int n_spheres, const float* cam_orig,
                     const float* cam_target, int width, int height, int spp,
                     int sample_start, int direct_only, int max_depth,
                     uint32_t* seeds, float* out) {
  SceneView s{center, radius, emission, color, refl, n_spheres};
  float basis[12];
  se195_camera_basis(cam_orig, cam_target, width, height, basis);
  V3 corig = v3(basis[0], basis[1], basis[2]);
  V3 cdir = v3(basis[3], basis[4], basis[5]);
  V3 cx = v3(basis[6], basis[7], basis[8]);
  V3 cy = v3(basis[9], basis[10], basis[11]);
  float inv_w = 1.0f / float(width);
  float inv_h = 1.0f / float(height);

#pragma omp parallel for schedule(dynamic, 8)
  for (int row = 0; row < height; ++row) {
    for (int col = 0; col < width; ++col) {
      int pix = row * width + col;
      Rng rng{seeds[2 * pix], seeds[2 * pix + 1]};
      int y = height - 1 - row;
      for (int pass = 0; pass < spp; ++pass) {
        float jx = rng.next() - 0.5f;
        float jy = rng.next() - 0.5f;
        float kcx = (float(col) + jx) * inv_w - 0.5f;
        float kcy = (float(y) + jy) * inv_h - 0.5f;
        V3 rd = v3(cx.x * kcx + cy.x * kcy + cdir.x,
                   cx.y * kcx + cy.y * kcy + cdir.y,
                   cx.z * kcx + cy.z * kcy + cdir.z);
        V3 ro = 0.1f * rd + corig;
        rd = normalized(rd);
        V3 r = trace(s, ro, rd, rng, direct_only != 0, max_depth);
        int sample = sample_start + pass;
        if (sample == 0) {
          out[3 * pix] = r.x;
          out[3 * pix + 1] = r.y;
          out[3 * pix + 2] = r.z;
        } else {
          float k1 = float(sample);
          float k2 = 1.0f / (k1 + 1.0f);
          out[3 * pix] = (out[3 * pix] * k1 + r.x) * k2;
          out[3 * pix + 1] = (out[3 * pix + 1] * k1 + r.y) * k2;
          out[3 * pix + 2] = (out[3 * pix + 2] * k1 + r.z) * k2;
        }
      }
      seeds[2 * pix] = rng.a;
      seeds[2 * pix + 1] = rng.b;
    }
  }
}

// 24-bpp bottom-up BMP with 4-byte row padding (semantics of the
// reference's hand-built writer, Raytracer3.2.03/bitmap.c:8-75).
// img is uint8[h*w*3] RGB with row 0 at the image top. Returns the number
// of bytes written into buf (caller allocates >= 54 + h*(3w+3)).
int se195_bmp_encode(const uint8_t* img, int width, int height,
                     uint8_t* buf) {
  int row_bytes = width * 3;
  int pad = (4 - row_bytes % 4) % 4;
  int image_size = (row_bytes + pad) * height;
  int file_size = 54 + image_size;
  std::memset(buf, 0, 54);
  buf[0] = 'B';
  buf[1] = 'M';
  auto put32 = [&](int off, uint32_t v) {
    buf[off] = v & 0xff;
    buf[off + 1] = (v >> 8) & 0xff;
    buf[off + 2] = (v >> 16) & 0xff;
    buf[off + 3] = (v >> 24) & 0xff;
  };
  put32(2, file_size);
  put32(10, 54);
  put32(14, 40);
  put32(18, width);
  put32(22, height);
  buf[26] = 1;
  buf[28] = 24;
  put32(34, image_size);
  int off = 54;
  for (int row = height - 1; row >= 0; --row) {
    for (int col = 0; col < width; ++col) {
      const uint8_t* px = img + 3 * (row * width + col);
      buf[off++] = px[2];
      buf[off++] = px[1];
      buf[off++] = px[0];
    }
    for (int p = 0; p < pad; ++p) buf[off++] = 0;
  }
  return off;
}

}  // extern "C"
