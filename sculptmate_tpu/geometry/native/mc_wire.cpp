// Host-side reconstruction of the marching-cubes wire format.
//
// The device ships (see geometry/marching_cubes.py:mc_wire_device): the
// occupancy bitmask (z-minor, little-endian bits in bytes), per-cut-edge
// interpolation t as uint16, and uint8 vertex colors — ~6 MB at 256^3 vs
// ~35 MB for the full packed f32 mesh, because the tunneled D2H link
// (14-115 MB/s) is the extraction bottleneck. Faces and vertex ids are pure
// table logic on the occupancy field, reconstructed here bit-parallel:
//
//   - cut-edge words: one XOR per 64 lattice edges
//   - vertex ids: popcount prefix sums per 64-edge word
//   - cells: a 64-cell activity word (any corner pair differs) is built from
//     8 corner words; only set bits are visited (ctz loop), so cost is
//     proportional to the *surface*, not the volume
//
// Conventions mirror marching_cubes.py exactly: x-major flat layout
// (lin = (i*RY + j)*RZ + k), vid order = concat(x-cuts, y-cuts, z-cuts) each
// in flat order, cells valid iff i<RX-1 & j<RY-1 & k<RZ-1, vertex positions
// in lattice index coordinates, faces wound away from the inside.
// Tables (256-case tri table, edge axis/offset) are passed in from Python
// (geometry/mc_tables.py) so this file holds no generated data.
//
// Build: scripts/build_native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Grid {
    int RX, RY, RZ;
    int vxlim;                    // x-cut edges / cells valid at i < vxlim
    int nw;                       // 64-bit words per z-row (ceil(RZ/64))
    std::vector<uint64_t> occ;    // (RX*RY*nw) occupancy
    std::vector<uint64_t> cut[3]; // per-axis cut-edge words
    std::vector<uint32_t> pre[3]; // exclusive vid prefix per word, per axis

    inline size_t w(int i, int j, int z) const {
        return ((size_t)i * RY + j) * nw + z;
    }
};

// unpack the byte-packed occupancy into zero-padded 64-bit words
static void load_occ(Grid &g, const uint8_t *occ_bytes) {
    const int row_bytes = g.RZ / 8;
    g.occ.assign((size_t)g.RX * g.RY * g.nw, 0);
    for (int i = 0; i < g.RX; ++i)
        for (int j = 0; j < g.RY; ++j) {
            const uint8_t *src =
                occ_bytes + ((size_t)i * g.RY + j) * row_bytes;
            std::memcpy(&g.occ[g.w(i, j, 0)], src, row_bytes);
        }
}

// bit k of shifted(c) = bit k+1 of the row (occ at z = k+1)
static inline uint64_t shifted(const uint64_t *row, int z, int nw) {
    uint64_t v = row[z] >> 1;
    if (z + 1 < nw) v |= row[z + 1] << 63;
    return v;
}

static void build_cuts(Grid &g) {
    const int RX = g.RX, RY = g.RY, RZ = g.RZ, nw = g.nw;
    for (int a = 0; a < 3; ++a) g.cut[a].assign(g.occ.size(), 0);
    // mask of valid z bits within a word, for z-cuts (k < RZ-1)
    auto zmask = [&](int z, int lim) -> uint64_t {
        long rem = (long)lim - (long)z * 64;
        if (rem <= 0) return 0;
        if (rem >= 64) return ~0ull;
        return (~0ull) >> (64 - rem);
    };
    for (int i = 0; i < RX; ++i)
        for (int j = 0; j < RY; ++j) {
            const uint64_t *row = &g.occ[g.w(i, j, 0)];
            for (int z = 0; z < nw; ++z) {
                uint64_t self = row[z];
                uint64_t km = zmask(z, RZ); // k < RZ (row payload)
                if (i < g.vxlim) // x-cuts valid at i < valid_x_limit
                    g.cut[0][g.w(i, j, z)] =
                        (self ^ g.occ[g.w(i + 1, j, z)]) & km;
                if (j + 1 < RY)
                    g.cut[1][g.w(i, j, z)] =
                        (self ^ g.occ[g.w(i, j + 1, z)]) & km;
                g.cut[2][g.w(i, j, z)] =
                    (self ^ shifted(row, z, nw)) & zmask(z, RZ - 1);
            }
        }
}

static uint32_t build_prefix(Grid &g) {
    uint32_t run = 0;
    for (int a = 0; a < 3; ++a) {
        g.pre[a].resize(g.cut[a].size());
        for (size_t w = 0; w < g.cut[a].size(); ++w) {
            g.pre[a][w] = run;
            run += (uint32_t)__builtin_popcountll(g.cut[a][w]);
        }
    }
    return run; // total vertex count
}

static inline uint32_t vid_of(const Grid &g, int axis, int i, int j, int k) {
    size_t w = g.w(i, j, k >> 6);
    uint64_t below = g.cut[axis][w] & ((1ull << (k & 63)) - 1);
    return g.pre[axis][w] + (uint32_t)__builtin_popcountll(below);
}

} // namespace

extern "C" {

// Count reconstructed faces. ``valid_x_limit``: cells (and x-cut edges)
// only at x < valid_x_limit — pass RX-1 for a full grid, or the shard's
// slab width for grid-axis-sharded (SP) extraction (mirrors the device's
// ``valid_x`` mask). Returns -1 on bad arguments.
long long mc_wire_count_faces(const uint8_t *occ_bytes, int RX, int RY,
                              int RZ, int valid_x_limit,
                              const int32_t *tri_count /*(256,)*/) {
    if (RZ % 8 != 0 || RX < 2 || RY < 2 || RZ < 2) return -1;
    if (valid_x_limit < 0 || valid_x_limit > RX - 1) return -1;
    Grid g;
    g.RX = RX; g.RY = RY; g.RZ = RZ; g.nw = (RZ + 63) / 64;
    g.vxlim = valid_x_limit;
    load_occ(g, occ_bytes);

    long long nf = 0;
    const int nw = g.nw;
    auto cellmask = [&](int z) -> uint64_t {
        long rem = (long)(RZ - 1) - (long)z * 64;
        if (rem <= 0) return 0;
        if (rem >= 64) return ~0ull;
        return (~0ull) >> (64 - rem);
    };
    for (int i = 0; i < valid_x_limit; ++i)
        for (int j = 0; j < RY - 1; ++j) {
            const uint64_t *r00 = &g.occ[g.w(i, j, 0)];
            const uint64_t *r10 = &g.occ[g.w(i + 1, j, 0)];
            const uint64_t *r01 = &g.occ[g.w(i, j + 1, 0)];
            const uint64_t *r11 = &g.occ[g.w(i + 1, j + 1, 0)];
            for (int z = 0; z < nw; ++z) {
                uint64_t c00 = r00[z], c10 = r10[z];
                uint64_t c01 = r01[z], c11 = r11[z];
                uint64_t s00 = shifted(r00, z, nw), s10 = shifted(r10, z, nw);
                uint64_t s01 = shifted(r01, z, nw), s11 = shifted(r11, z, nw);
                uint64_t any = c00 | c10 | c01 | c11 | s00 | s10 | s01 | s11;
                uint64_t all = c00 & c10 & c01 & c11 & s00 & s10 & s01 & s11;
                uint64_t active = (any & ~all) & cellmask(z);
                while (active) {
                    int k = __builtin_ctzll(active);
                    active &= active - 1;
                    int cs = (int)((c00 >> k) & 1) | (int)((c10 >> k) & 1) << 1 |
                             (int)((c01 >> k) & 1) << 2 | (int)((c11 >> k) & 1) << 3 |
                             (int)((s00 >> k) & 1) << 4 | (int)((s10 >> k) & 1) << 5 |
                             (int)((s01 >> k) & 1) << 6 | (int)((s11 >> k) & 1) << 7;
                    nf += tri_count[cs];
                }
            }
        }
    return nf;
}

// Rebuild the mesh. out_verts (nv*3 f32, lattice coords), out_colors
// (nv*3 f32 in [0,1]), out_faces (max_out_faces*3 i32). Returns the number
// of faces written, or -1 on bad arguments / -2 on vertex-count mismatch.
long long mc_wire_build(
    const uint8_t *occ_bytes, int RX, int RY, int RZ, int valid_x_limit,
    const uint8_t *t_lo, const uint8_t *t_hi,
    const uint8_t *cr, const uint8_t *cg, const uint8_t *cb,
    long long nv,
    const int32_t *tri_table /*(256*5*3)*/, const int32_t *tri_count /*(256,)*/,
    const int32_t *edge_axis /*(12,)*/, const int32_t *edge_offset /*(12*3)*/,
    int max_tri, long long max_out_faces,
    float *out_verts, float *out_colors, int32_t *out_faces) {
    if (RZ % 8 != 0 || RX < 2 || RY < 2 || RZ < 2) return -1;
    if (valid_x_limit < 0 || valid_x_limit > RX - 1) return -1;
    Grid g;
    g.RX = RX; g.RY = RY; g.RZ = RZ; g.nw = (RZ + 63) / 64;
    g.vxlim = valid_x_limit;
    load_occ(g, occ_bytes);
    build_cuts(g);
    if ((long long)build_prefix(g) != nv) return -2;

    // -- vertices: iterate cut bits in vid order ------------------------
    long long v = 0;
    for (int a = 0; a < 3; ++a) {
        const float dx = a == 0 ? 1.f : 0.f;
        const float dy = a == 1 ? 1.f : 0.f;
        const float dz = a == 2 ? 1.f : 0.f;
        for (int i = 0; i < RX; ++i)
            for (int j = 0; j < RY; ++j)
                for (int z = 0; z < g.nw; ++z) {
                    uint64_t bits = g.cut[a][g.w(i, j, z)];
                    while (bits) {
                        int b = __builtin_ctzll(bits);
                        bits &= bits - 1;
                        int k = z * 64 + b;
                        float t =
                            (float)(t_lo[v] | (t_hi[v] << 8)) / 65535.0f;
                        out_verts[3 * v + 0] = (float)i + t * dx;
                        out_verts[3 * v + 1] = (float)j + t * dy;
                        out_verts[3 * v + 2] = (float)k + t * dz;
                        out_colors[3 * v + 0] = (float)cr[v] / 255.0f;
                        out_colors[3 * v + 1] = (float)cg[v] / 255.0f;
                        out_colors[3 * v + 2] = (float)cb[v] / 255.0f;
                        ++v;
                    }
                }
    }
    if (v != nv) return -2;

    // -- faces: visit active cells only ----------------------------------
    long long nf = 0;
    const int nw = g.nw;
    auto cellmask = [&](int z) -> uint64_t {
        long rem = (long)(RZ - 1) - (long)z * 64;
        if (rem <= 0) return 0;
        if (rem >= 64) return ~0ull;
        return (~0ull) >> (64 - rem);
    };
    for (int i = 0; i < valid_x_limit; ++i)
        for (int j = 0; j < RY - 1; ++j) {
            const uint64_t *r00 = &g.occ[g.w(i, j, 0)];
            const uint64_t *r10 = &g.occ[g.w(i + 1, j, 0)];
            const uint64_t *r01 = &g.occ[g.w(i, j + 1, 0)];
            const uint64_t *r11 = &g.occ[g.w(i + 1, j + 1, 0)];
            for (int z = 0; z < nw; ++z) {
                uint64_t c00 = r00[z], c10 = r10[z];
                uint64_t c01 = r01[z], c11 = r11[z];
                uint64_t s00 = shifted(r00, z, nw), s10 = shifted(r10, z, nw);
                uint64_t s01 = shifted(r01, z, nw), s11 = shifted(r11, z, nw);
                uint64_t any = c00 | c10 | c01 | c11 | s00 | s10 | s01 | s11;
                uint64_t all = c00 & c10 & c01 & c11 & s00 & s10 & s01 & s11;
                uint64_t active = (any & ~all) & cellmask(z);
                while (active) {
                    int b = __builtin_ctzll(active);
                    active &= active - 1;
                    int k = z * 64 + b;
                    int cs = (int)((c00 >> b) & 1) | (int)((c10 >> b) & 1) << 1 |
                             (int)((c01 >> b) & 1) << 2 | (int)((c11 >> b) & 1) << 3 |
                             (int)((s00 >> b) & 1) << 4 | (int)((s10 >> b) & 1) << 5 |
                             (int)((s01 >> b) & 1) << 6 | (int)((s11 >> b) & 1) << 7;
                    int nt = tri_count[cs];
                    for (int s = 0; s < nt; ++s) {
                        if (nf >= max_out_faces) return -3;
                        for (int c = 0; c < 3; ++c) {
                            int le = tri_table[(cs * max_tri + s) * 3 + c];
                            int ax = edge_axis[le];
                            int ei = i + edge_offset[3 * le + 0];
                            int ej = j + edge_offset[3 * le + 1];
                            int ek = k + edge_offset[3 * le + 2];
                            out_faces[3 * nf + c] =
                                (int32_t)vid_of(g, ax, ei, ej, ek);
                        }
                        ++nf;
                    }
                }
            }
        }
    return nf;
}

} // extern "C"
