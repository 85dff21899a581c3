// vulkan-forge TPU build: native host runtime core.
//
// The reference keeps its host runtime in native code (Rust: grid meshing
// src/terrain/mesh.rs, DEM statistics src/lib.rs:905-932 /
// src/terrain_stats.rs, PNG encode via the image crate). This C++ core is
// the TPU build's equivalent for the CPU-side hot paths; the compute path
// (rasterization/shading) lives on the TPU in JAX/Pallas.
//
// Exposed through ctypes (see vulkan_forge/_native/__init__.py); every entry
// point has a NumPy fallback, so this library is a fast path, not a hard
// dependency.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

#include <zlib.h>

extern "C" {

// Centered grid mesh, parity with make_grid (src/terrain/mesh.rs:35-90):
// xy[i] = (x*dx - cx, y*dy - cy), uv in [0,1]^2, CCW cell indices
// [i0, i1, i2, i2, i1, i3]. Output buffers are caller-allocated:
// xy/uv: nx*nz*2 floats, idx: (nx-1)*(nz-1)*6 uint32.
void vf_grid_generate(int32_t nx, int32_t nz, float dx, float dy,
                      float* xy, float* uv, uint32_t* idx) {
    const float cx = (static_cast<float>(nx) - 1.0f) * 0.5f * dx;
    const float cy = (static_cast<float>(nz) - 1.0f) * 0.5f * dy;
    // True f32 division (not reciprocal-multiply): keeps UVs bit-identical
    // to the reference's `x as f32 / (w as f32 - 1.0)` and the NumPy path.
    const float den_w = static_cast<float>(nx - 1);
    const float den_h = static_cast<float>(nz - 1);
    for (int32_t y = 0; y < nz; ++y) {
        const float wy = static_cast<float>(y) * dy - cy;
        const float v = static_cast<float>(y) / den_h;
        float* xyrow = xy + static_cast<int64_t>(y) * nx * 2;
        float* uvrow = uv + static_cast<int64_t>(y) * nx * 2;
        for (int32_t x = 0; x < nx; ++x) {
            xyrow[2 * x + 0] = static_cast<float>(x) * dx - cx;
            xyrow[2 * x + 1] = wy;
            uvrow[2 * x + 0] = static_cast<float>(x) / den_w;
            uvrow[2 * x + 1] = v;
        }
    }
    uint32_t* p = idx;
    for (int32_t y = 0; y < nz - 1; ++y) {
        const uint32_t row = static_cast<uint32_t>(y) * nx;
        for (int32_t x = 0; x < nx - 1; ++x) {
            const uint32_t i0 = row + x;
            const uint32_t i1 = row + x + 1;
            const uint32_t i2 = row + x + nx;
            const uint32_t i3 = row + x + nx + 1;
            *p++ = i0; *p++ = i1; *p++ = i2;
            *p++ = i2; *p++ = i1; *p++ = i3;
        }
    }
}

// Single-pass f32 min/max/mean + two-pass population std, matching
// dem_stats_from_slice (src/lib.rs:905-932). out = {min, max, mean, std}.
void vf_dem_stats(const float* h, int64_t n, float* out) {
    if (n <= 0) { out[0] = out[1] = out[2] = out[3] = 0.0f; return; }
    float mn = h[0], mx = h[0];
    double sum = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const float v = h[i];
        mn = std::min(mn, v);
        mx = std::max(mx, v);
        sum += v;
    }
    const float mean = static_cast<float>(sum / static_cast<double>(n));
    double var = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const double d = static_cast<double>(h[i]) - mean;
        var += d * d;
    }
    out[0] = mn;
    out[1] = mx;
    out[2] = mean;
    out[3] = static_cast<float>(std::sqrt(var / static_cast<double>(n)));
}

namespace {

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(static_cast<uint8_t>(x >> 24));
    v.push_back(static_cast<uint8_t>(x >> 16));
    v.push_back(static_cast<uint8_t>(x >> 8));
    v.push_back(static_cast<uint8_t>(x));
}

void put_chunk(std::vector<uint8_t>& v, const char type[4],
               const uint8_t* data, size_t len) {
    put_be32(v, static_cast<uint32_t>(len));
    const size_t start = v.size();
    v.insert(v.end(), type, type + 4);
    if (len) v.insert(v.end(), data, data + len);
    const uint32_t crc = crc32(0L, v.data() + start,
                               static_cast<uInt>(len + 4));
    put_be32(v, crc);
}

}  // namespace

// Deterministic RGBA8 PNG encode (8-bit, color type 6, zlib level 6,
// filter 0 rows). Returns bytes written, or -1 if out_cap is too small /
// compression failed. The analog of image::RgbaImage::save in the reference
// (src/lib.rs:330-333).
int64_t vf_png_encode_rgba(const uint8_t* rgba, int32_t width, int32_t height,
                           uint8_t* out, int64_t out_cap) {
    const int64_t stride = static_cast<int64_t>(width) * 4;
    std::vector<uint8_t> raw;
    raw.reserve(static_cast<size_t>((stride + 1) * height));
    for (int32_t y = 0; y < height; ++y) {
        raw.push_back(0);  // filter type 0 (None)
        const uint8_t* row = rgba + static_cast<int64_t>(y) * stride;
        raw.insert(raw.end(), row, row + stride);
    }

    uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
    std::vector<uint8_t> comp(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(),
                  static_cast<uLong>(raw.size()), 6) != Z_OK) {
        return -1;
    }
    comp.resize(comp_cap);

    std::vector<uint8_t> png;
    png.reserve(comp.size() + 128);
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    png.insert(png.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = static_cast<uint8_t>(width >> 24);
    ihdr[1] = static_cast<uint8_t>(width >> 16);
    ihdr[2] = static_cast<uint8_t>(width >> 8);
    ihdr[3] = static_cast<uint8_t>(width);
    ihdr[4] = static_cast<uint8_t>(height >> 24);
    ihdr[5] = static_cast<uint8_t>(height >> 16);
    ihdr[6] = static_cast<uint8_t>(height >> 8);
    ihdr[7] = static_cast<uint8_t>(height);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 6;   // color type RGBA
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter
    ihdr[12] = 0;  // interlace
    put_chunk(png, "IHDR", ihdr, 13);
    put_chunk(png, "IDAT", comp.data(), comp.size());
    put_chunk(png, "IEND", nullptr, 0);

    if (static_cast<int64_t>(png.size()) > out_cap) return -1;
    std::memcpy(out, png.data(), png.size());
    return static_cast<int64_t>(png.size());
}

}  // extern "C"
