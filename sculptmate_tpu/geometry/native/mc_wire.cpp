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
// (lin = (i*RY + j)*RZ + k), vid order = BLOCK-MAJOR (order version 2):
// concat over axes (x-cuts, y-cuts, z-cuts), within an axis by 8^3 block id
// (bi, bj, bk), within a block by (ox, oy, oz). This matches the device's
// ``_vertex_side_wire`` — which numbers ids from per-block prefixes so it
// never materializes a full-grid id field — and costs this decoder one
// extra per-8-bit-segment prefix array. Cells valid iff i<RX-1 & j<RY-1 &
// k<RZ-1, vertex positions in lattice index coordinates, faces wound away
// from the inside. Tables (256-case tri table, edge axis/offset) are passed
// in from Python (geometry/mc_tables.py) so this file holds no generated
// data. ``mc_wire_order_version`` lets the Python side reject a stale
// binary whose numbering would silently scramble every vertex.
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
    int ns;                       // 8-bit segments per z-row (RZ/8)
    std::vector<uint64_t> occ;    // (RX*RY*nw) occupancy
    std::vector<uint64_t> cut[3]; // per-axis cut-edge words
    // exclusive vid prefix per 8-z byte segment, scanned in BLOCK-MAJOR
    // order (axis, block bi/bj/bk, in-block ox/oy; one segment per bk)
    std::vector<uint32_t> pre8[3];

    inline size_t w(int i, int j, int z) const {
        return ((size_t)i * RY + j) * nw + z;
    }
    inline size_t seg(int i, int j, int s) const {
        return ((size_t)i * RY + j) * ns + s;
    }
    inline uint8_t cut_byte(int a, int i, int j, int s) const {
        return (uint8_t)(cut[a][w(i, j, s >> 3)] >> ((s & 7) * 8));
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
    // block-major scan: (axis, block bi/bj/bk, in-block ox/oy); each 8^3
    // block spans exactly one 8-bit z segment per (ox, oy) row
    const int nbx = g.RX / 8, nby = g.RY / 8, nbz = g.RZ / 8;
    uint32_t run = 0;
    for (int a = 0; a < 3; ++a) {
        g.pre8[a].resize((size_t)g.RX * g.RY * g.ns);
        for (int bi = 0; bi < nbx; ++bi)
            for (int bj = 0; bj < nby; ++bj)
                for (int bk = 0; bk < nbz; ++bk)
                    for (int ox = 0; ox < 8; ++ox)
                        for (int oy = 0; oy < 8; ++oy) {
                            const int i = bi * 8 + ox, j = bj * 8 + oy;
                            g.pre8[a][g.seg(i, j, bk)] = run;
                            run += (uint32_t)__builtin_popcount(
                                g.cut_byte(a, i, j, bk));
                        }
    }
    return run; // total vertex count
}

static inline uint32_t vid_of(const Grid &g, int axis, int i, int j, int k) {
    const int s = k >> 3;
    uint8_t below = g.cut_byte(axis, i, j, s) & (uint8_t)((1u << (k & 7)) - 1);
    return g.pre8[axis][g.seg(i, j, s)] + (uint32_t)__builtin_popcount(below);
}

} // namespace

extern "C" {

// Vertex-numbering convention of this binary (must match the device wire
// packer): 1 = flat z-order, 2 = block-major. Python refuses to use a
// binary whose order version differs from its own.
int mc_wire_order_version(void) { return 2; }

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
    g.RX = RX; g.RY = RY; g.RZ = RZ; g.nw = (RZ + 63) / 64; g.ns = RZ / 8;
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
    // block-major numbering needs every dim 8-aligned (the device packer
    // already guarantees this: mc_wire_device asserts dims % 8 == 0)
    if (RX % 8 != 0 || RY % 8 != 0 || RZ % 8 != 0) return -1;
    if (RX < 2 || RY < 2 || RZ < 2) return -1;
    if (valid_x_limit < 0 || valid_x_limit > RX - 1) return -1;
    Grid g;
    g.RX = RX; g.RY = RY; g.RZ = RZ; g.nw = (RZ + 63) / 64; g.ns = RZ / 8;
    g.vxlim = valid_x_limit;
    load_occ(g, occ_bytes);
    build_cuts(g);
    if ((long long)build_prefix(g) != nv) return -2;

    // -- vertices: iterate cut bits in BLOCK-MAJOR vid order --------------
    long long v = 0;
    const int nbx = RX / 8, nby = RY / 8, nbz = RZ / 8;
    for (int a = 0; a < 3; ++a) {
        const float dx = a == 0 ? 1.f : 0.f;
        const float dy = a == 1 ? 1.f : 0.f;
        const float dz = a == 2 ? 1.f : 0.f;
        for (int bi = 0; bi < nbx; ++bi)
            for (int bj = 0; bj < nby; ++bj)
                for (int bk = 0; bk < nbz; ++bk)
                    for (int ox = 0; ox < 8; ++ox)
                        for (int oy = 0; oy < 8; ++oy) {
                            const int i = bi * 8 + ox, j = bj * 8 + oy;
                            uint8_t bits = g.cut_byte(a, i, j, bk);
                            while (bits) {
                                int b = __builtin_ctz(bits);
                                bits &= (uint8_t)(bits - 1);
                                int k = bk * 8 + b;
                                float t = (float)(t_lo[v] | (t_hi[v] << 8)) /
                                          65535.0f;
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
