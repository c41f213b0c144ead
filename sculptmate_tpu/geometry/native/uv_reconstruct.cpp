// Host-side reconstruction of the SF3D per-corner atlas UVs from the
// compact unwrap wire (atlas_index u8/face + 12 per-slice rotation angles).
//
// C++ twin of uv_unwrap_device.reconstruct_uvs_host (the numpy reference
// implementation, kept for tests): mirrors uv_unwrap_device._unwrap_core's
// uv math — box projection, slice rotation, atlas placement — in f32 with
// the same operation order. The face's axis pick rides the wire as
// atlas % 6 (class = atlas / 6), so nothing normal-dependent is recomputed
// here; all cross-face reductions are min/max, which are accumulation-order
// independent, so results agree with the device program to fp ulps; the
// order-dependent tangent means arrive precomputed as ca6/sa6. Replaces a
// 12 B/face D2H section (~9.4 MB at 786K faces on a 14-115 MB/s tunneled
// link) with ~10 ms of host work.
//
// Reference provenance: the atlas layout/rules follow the reference
// sf3d/uv_unwrapper/unwrap.py:86-116,384-503 (see geometry/uv_unwrap.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// per cube face: (projection axis, sign, u axis, u sign, v axis, v sign)
static const int RULES[6][6] = {
    {0, +1, 1, +1, 2, -1},  // +x
    {0, -1, 1, +1, 2, -1},  // -x
    {1, +1, 0, +1, 2, -1},  // +y
    {1, -1, 0, +1, 2, -1},  // -y
    {2, +1, 0, +1, 1, +1},  // +z
    {2, -1, 0, +1, 1, -1},  // -z
};

static inline float clip01(float v) {
  return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
}

}  // namespace

extern "C" void reconstruct_uvs(
    const float* rp,       // (nv, 3) dequantized rotated positions
    const int32_t* faces,  // (nf, 3)
    const uint8_t* atlas,  // (nf,) atlas_index = axis pick + 6 * class, 0..17
    const float* ca6,      // (6,) per-slice rotation cos
    const float* sa6,      // (6,) per-slice rotation sin
    int64_t nv, int64_t nf, float pad,
    float* out)            // (nf, 3, 2) per-corner uv
{
  if (nf <= 0) return;

  // bbox of the rotated vertices -> vp normalization (min/max: order-free)
  float bb_min[3] = {INFINITY, INFINITY, INFINITY};
  float bb_max[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (int64_t i = 0; i < nv; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = rp[3 * i + d];
      if (v < bb_min[d]) bb_min[d] = v;
      if (v > bb_max[d]) bb_max[d] = v;
    }
  }
  float rng[3];
  for (int d = 0; d < 3; ++d) {
    float r = bb_max[d] - bb_min[d];
    rng[d] = r > 1e-12f ? r : 1e-12f;
  }

  std::vector<uint8_t> index(nf);
  std::vector<float> pick_ax(3 * nf), pick_ua(3 * nf), pick_va(3 * nf);

  // pass 1: box projection per face (axis pick from the wire) + mdd
  // (per-corner-slot max of |axis|)
  float mdd[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (int64_t f = 0; f < nf; ++f) {
    float tri[3][3];  // [corner][axis] normalized coords
    for (int c = 0; c < 3; ++c) {
      int32_t vi = faces[3 * f + c];
      for (int d = 0; d < 3; ++d)
        tri[c][d] = 2.0f * (rp[3 * vi + d] - bb_min[d]) / rng[d] - 1.0f;
    }
    int best = atlas[f] % 6;  // the device's argmax, shipped in the wire
    index[f] = (uint8_t)best;
    const int* r = RULES[best];
    for (int c = 0; c < 3; ++c) {
      float pax = tri[c][r[0]];
      float pua = tri[c][r[2]];
      float pva = tri[c][r[4]];
      pick_ax[3 * f + c] = pax;
      pick_ua[3 * f + c] = pua;
      pick_va[3 * f + c] = pva;
      float a = std::fabs(pax);
      if (a > mdd[c]) mdd[c] = a;
    }
  }

  // pass 2: uv projection + slice rotation; per-slice lo/hi of ru+rv
  std::vector<float> ru(3 * nf), rv(3 * nf);
  float lo6[6], hi6[6];
  for (int g = 0; g < 6; ++g) { lo6[g] = INFINITY; hi6[g] = -INFINITY; }
  for (int64_t f = 0; f < nf; ++f) {
    int g = index[f];
    const int* r = RULES[g];
    float us = (float)r[3], vs = (float)r[5];
    float ca = ca6[g], sa = sa6[g];
    for (int c = 0; c < 3; ++c) {
      float uc = clip01((us * pick_ua[3 * f + c] / mdd[c] + 1.0f) * 0.5f);
      float vc = clip01((vs * pick_va[3 * f + c] / mdd[c] + 1.0f) * 0.5f);
      float cu = uc * 2.0f - 1.0f;
      float cv = vc * 2.0f - 1.0f;
      float u = ca * cu - sa * cv;
      float v = sa * cu + ca * cv;
      ru[3 * f + c] = u;
      rv[3 * f + c] = v;
      if (u < lo6[g]) lo6[g] = u;
      if (u > hi6[g]) hi6[g] = u;
      if (v < lo6[g]) lo6[g] = v;
      if (v > hi6[g]) hi6[g] = v;
    }
  }

  // pass 3: per-slice normalize; overlap-slice (6..11) bounds over uc/vc
  float olo_u[12], ohi_u[12], olo_v[12], ohi_v[12];
  for (int i = 0; i < 12; ++i) {
    olo_u[i] = INFINITY; ohi_u[i] = -INFINITY;
    olo_v[i] = INFINITY; ohi_v[i] = -INFINITY;
  }
  int64_t n_rem = 0;
  for (int64_t f = 0; f < nf; ++f) {
    int g = index[f];
    float lo = lo6[g];
    float sc = hi6[g] - lo;
    if (sc < 1e-12f) sc = 1e-12f;
    int ai = atlas[f];
    if (ai >= 12) ++n_rem;
    for (int c = 0; c < 3; ++c) {
      float u = (ru[3 * f + c] - lo) / sc;
      float v = (rv[3 * f + c] - lo) / sc;
      ru[3 * f + c] = u;
      rv[3 * f + c] = v;
      if (ai >= 6 && ai < 12) {
        if (u < olo_u[ai]) olo_u[ai] = u;
        if (u > ohi_u[ai]) ohi_u[ai] = u;
        if (v < olo_v[ai]) olo_v[ai] = v;
        if (v > ohi_v[ai]) ohi_v[ai] = v;
      }
    }
  }

  // individual-square pool layout (atlas >= 12)
  const float ratio = 0.5f * (1.0f / 3.0f);
  float mult = std::sqrt((float)(n_rem > 0 ? n_rem : 1) / ratio);
  int64_t nw = (int64_t)std::ceil(0.5f * mult);
  if (nw < 1) nw = 1;
  int64_t nh = n_rem > 0 ? (n_rem + nw - 1) / nw : 1;
  if (nh < 1) nh = 1;
  float width = 1.0f / (float)nw;
  float height = 1.0f / (float)nh;
  float clip_val = (width < height ? width : height) * 1.5f;
  float nwf = (float)nw, nhf = (float)nh;

  const float off = 1.0f / 3.0f;
  const float dupl_off = 1.0f / 6.0f;
  const float x_vals[6] = {0, 1, 2, 0, 1, 2};
  const float y_vals[6] = {0, 0, 0, 1, 1, 1};

  // pass 4: overlap rescale + pad clip + placement + final atlas transform
  int64_t rem_id = 0;
  for (int64_t f = 0; f < nf; ++f) {
    int ai = atlas[f];
    float uc[3], vc[3];
    for (int c = 0; c < 3; ++c) {
      float u = ru[3 * f + c];
      float v = rv[3 * f + c];
      if (ai >= 6 && ai < 12) {
        float du = ohi_u[ai] - olo_u[ai];
        float dv = ohi_v[ai] - olo_v[ai];
        u = (u - olo_u[ai]) / (du > 0.5f ? du : 0.5f);
        v = (v - olo_v[ai]) / (dv > 0.5f ? dv : 0.5f);
      }
      uc[c] = clip01(u * (1.0f - 2.0f * pad) + pad);
      vc[c] = clip01(v * (1.0f - 2.0f * pad) + pad);
    }
    float off_x, off_y, div_x, div_y;
    int block = ai / 6;
    // pool faces (class 2) carry their axis pick in ai % 6 — their cell
    // offset is the fixed pool quadrant, not a per-slice cell
    float xv = ai >= 12 ? 0.0f : x_vals[ai % 6];
    float yv = ai >= 12 ? 0.0f : y_vals[ai % 6];
    if (block == 0) {
      off_x = off * xv;
      off_y = off * yv;
    } else {
      int mb = block - 1;
      if (mb > 1) mb = 1;
      off_x = dupl_off * xv + (float)mb * 0.5f;
      off_y = dupl_off * yv + off * 2.0f;
    }
    div_x = ai >= 12 ? 2.0f : (ai >= 6 ? 6.0f : 3.0f);
    div_y = ai >= 12 ? 3.0f : (ai >= 6 ? 6.0f : 3.0f);

    if (ai >= 12) {
      float ulo = uc[0] < uc[1] ? uc[0] : uc[1]; if (uc[2] < ulo) ulo = uc[2];
      float uhi = uc[0] > uc[1] ? uc[0] : uc[1]; if (uc[2] > uhi) uhi = uc[2];
      float vlo = vc[0] < vc[1] ? vc[0] : vc[1]; if (vc[2] < vlo) vlo = vc[2];
      float vhi = vc[0] > vc[1] ? vc[0] : vc[1]; if (vc[2] > vhi) vhi = vc[2];
      float idf = (float)rem_id;
      float col = std::fmod(idf, nwf) * width;
      float row = std::floor(idf / nwf) * height;
      ++rem_id;
      for (int c = 0; c < 3; ++c) {
        float du = uhi - ulo;
        float r = (uc[c] - ulo) / (du > clip_val ? du : clip_val);
        r = clip01(r * (1.0f - pad * nwf * 0.5f) + pad * nwf * 0.25f);
        r = r * width + col;
        uc[c] = clip01(r * (1.0f - pad) + pad * 0.5f);
        float dv = vhi - vlo;
        float s = (vc[c] - vlo) / (dv > clip_val ? dv : clip_val);
        s = clip01(s * (1.0f - pad * nhf * 0.5f) + pad * nhf * 0.25f);
        s = s * height + row;
        vc[c] = clip01(s * (1.0f - pad) + pad * 0.5f);
      }
    }
    for (int c = 0; c < 3; ++c) {
      out[6 * f + 2 * c + 0] = uc[c] / div_x + off_x;
      out[6 * f + 2 * c + 1] = vc[c] / div_y + off_y;
    }
  }
}
