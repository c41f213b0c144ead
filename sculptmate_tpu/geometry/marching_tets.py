"""Device marching tetrahedra with learned vertex deformation, SoA layout.

TPU-native counterpart of the reference's ``MarchingTetrahedraHelper``
(``sf3d/models/isosurface.py:24-229``): same math — sign-change edges emit one
vertex each at the sdf-weighted interpolation of the two (deformed) endpoints,
per-tet 4-bit cases emit 1-2 triangles — but on the regular Freudenthal
lattice (``mt_tables.py``) so edge identification is arithmetic (7 dense edge
grids + cumsum) instead of ``torch.unique`` over a tet soup.

v2 — active-block compaction (same scheme as ``marching_cubes.py``): the v1
implementation ran ``jnp.nonzero`` over the 7·N^3 (~29M at res 160) edge set
and the 12·res^3 (~49M) triangle-slot set — ~0.5 s per scan regardless of
surface size. Now:

1. Cut masks / tet cases stay cheap fused elementwise passes; the vertex-id
   field is one cumsum.
2. The (padded) lattice is tiled into 8^3 blocks; only blocks containing cut
   edges / emitting cubes survive a tiny block-level compaction.
3. Per-surviving-block data is row-gathered and scatter-compacted over the
   active set. Emitting cubes are compacted first (each emits 1-12 faces),
   then expanded to 12 triangle slots mapped back to (tet, slot) by a 6-tet
   prefix sum — never a full-grid nonzero.

Deformation follows ``normalize_grid_deformation``
(``isosurface.py:106-113``): lattice vertex v moves by (1/res) * tanh(offset).

Everything is flat (N,) structure-of-arrays — see marching_cubes.py for why
(N, 3) arrays are catastrophic under TPU tiled layouts.

Outputs are fixed-capacity with exact counts; ``num_active_vblocks`` /
``num_active_fblocks`` / ``num_active_cubes`` let callers detect capacity
overflow per block set and retry (never silently truncate).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.geometry.mt_tables import EDGE_DIRS, build_tet_tables

BS = 8  # block side (shared convention with marching_cubes)


class MTResult(NamedTuple):
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    fa: jnp.ndarray
    fb: jnp.ndarray
    fc: jnp.ndarray
    num_verts: jnp.ndarray
    num_faces: jnp.ndarray
    # the two block sets have DIFFERENT capacities (vert blocks span a
    # 7-class domain); collapsing them into one max hid cube-block-only
    # overflows behind the larger vertex capacity (silent face corruption)
    num_active_vblocks: jnp.ndarray  # () int32, active vertex blocks
    num_active_fblocks: jnp.ndarray  # () int32, active cube (face) blocks
    num_active_cubes: jnp.ndarray  # () int32, cubes emitting >= 1 triangle


def lattice_size(resolution: int) -> int:
    """Number of lattice points per axis: resolution cubes -> res+1 points."""
    return resolution + 1


def default_block_capacity(resolution: int, kind: str) -> int:
    """Default active-block capacity. A surface crosses O((R/8)^2) of the
    (R/8)^3 blocks; vertices live in a 7-class domain (7x), cubes in 1x."""
    nb1 = -(-lattice_size(resolution) // BS)
    per_axis = nb1 * nb1
    mult = 84 if kind == "verts" else 12
    total = (7 if kind == "verts" else 1) * nb1**3
    return int(min(total, max(2048, mult * per_axis)))


def _block_local_offsets(Np: int) -> np.ndarray:
    oi, oj, ok = np.meshgrid(np.arange(BS), np.arange(BS), np.arange(BS), indexing="ij")
    off = ((oi * Np + oj) * Np + ok).reshape(-1).astype(np.int32)
    # scatter_compact_rows encodes (offset + 1) as f32 in its MXU branch;
    # keep it in the exact-integer range (see marching_cubes._block_local_offsets)
    assert int(off.max()) + 1 < 2**24, f"block offsets exceed exact-f32 range: Np={Np}"
    return off


def _block_bases(Np: int) -> np.ndarray:
    nb = Np // BS
    bi, bj, bk = np.meshgrid(np.arange(nb), np.arange(nb), np.arange(nb), indexing="ij")
    return (((bi * Np + bj) * Np + bk).reshape(-1).astype(np.int64) * BS).astype(
        np.int32
    )


def _mt_vertex_side(
    sdf: jnp.ndarray,
    deform_x: Optional[jnp.ndarray],
    deform_y: Optional[jnp.ndarray],
    deform_z: Optional[jnp.ndarray],
    resolution: int,
    max_verts: int,
    vert_block_capacity: int,
    snap_eps: float = 0.0,
):
    """Cut-edge detection + deformed vertex positions, block-compacted.

    Returns (vx, vy, vz, valid_v, vid (7 n3p,), occ3, num_verts, n_vblocks).
    Shared by ``marching_tets`` (full device MT) and ``mt_wire_device``.

    ``snap_eps`` > 0 snaps the interpolation parameter t to {0, 1} within
    eps, so vertices land EXACTLY on the (deformed) lattice endpoint shared
    by every incident edge — the decoder can then weld them by quantized
    position and drop the resulting degenerate sliver triangles
    (``mt_wire.decode_wire(weld=True)``). Geometric displacement is bounded
    by eps * edge_len <= eps * sqrt(3)/res lattice units.
    """
    N = lattice_size(resolution)
    n3 = N * N * N
    assert sdf.shape == (n3,)
    Np = -(-N // BS) * BS
    n3p = Np * Np * Np
    nb1 = Np // BS
    NB = nb1**3

    local_off = jnp.asarray(_block_local_offsets(Np))  # (512,)
    block_base = jnp.asarray(_block_bases(Np))  # (NB,)

    # pad the lattice fields into the blocked layout (outside = not occupied)
    def pad3(a, fill=0.0):
        a = a.reshape(N, N, N)
        p = Np - N
        return jnp.pad(a, ((0, p),) * 3, constant_values=fill)

    sdf3 = pad3(sdf, -1.0)
    occ3 = sdf3 > 0
    sdf_flat = sdf3.ravel()

    if deform_x is not None:
        scale = 1.0 / resolution  # half-tet-size normalization (isosurface.py:106)
        dxp = scale * jnp.tanh(pad3(deform_x)).ravel()
        dyp = scale * jnp.tanh(pad3(deform_y)).ravel()
        dzp = scale * jnp.tanh(pad3(deform_z)).ravel()
    else:
        dxp = dyp = dzp = None

    ar = jnp.arange(Np)
    # -- cut masks for the 7 edge classes (anchor p cut iff occ[p]!=occ[p+d],
    #    both endpoints inside the real N^3 lattice) ------------------------
    def cut_mask(d: int) -> jnp.ndarray:
        dx, dy, dz = (int(v) for v in EDGE_DIRS[d])
        m = occ3 != jnp.roll(occ3, (-dx, -dy, -dz), (0, 1, 2))
        dom = (
            (ar[:, None, None] < N - dx)
            & (ar[None, :, None] < N - dy)
            & (ar[None, None, :] < N - dz)
        )
        return m & dom

    masks = [cut_mask(d) for d in range(7)]

    # vid = global cumsum over the class-major flat masks, computed as
    # per-z-row cumsums + a row-base prefix (the single 7 n3p scan is
    # latency-bound on TPU — see marching_cubes._vertex_side)
    row_tot = jnp.concatenate(
        [m.sum(axis=2, dtype=jnp.int32).ravel() for m in masks]
    )  # (7 Np Np,)
    row_base = jnp.cumsum(row_tot) - row_tot
    num_verts = row_base[-1] + row_tot[-1]
    vid3 = [
        row_base[c * Np * Np : (c + 1) * Np * Np].reshape(Np, Np, 1)
        + jnp.cumsum(m, axis=2, dtype=jnp.int32)
        - 1
        for c, m in enumerate(masks)
    ]
    vid = jnp.concatenate([v.ravel() for v in vid3])  # (7 n3p,)

    # -- active vertex blocks ---------------------------------------------
    def block_any(m):
        return m.reshape(nb1, BS, nb1, BS, nb1, BS).any(axis=(1, 3, 5)).ravel()

    vblock_mask = jnp.concatenate([block_any(m) for m in masks])  # (7 NB,)
    n_vblocks = jnp.sum(vblock_mask.astype(jnp.int32))

    (vblk_ids,) = jnp.nonzero(
        vblock_mask, size=vert_block_capacity, fill_value=7 * NB
    )
    vblk_valid = vblk_ids < 7 * NB
    vb_safe = jnp.where(vblk_valid, vblk_ids, 0)
    vb_cls = vb_safe // NB
    vb_base = block_base[vb_safe % NB]

    # block-major re-tiling first, then contiguous row gathers (element
    # gathers are ~6x slower on TPU — see marching_cubes._vertex_side; the
    # streamed transpose avoids the 16x tiled-layout blowup of a one-shot 6D
    # transpose)
    from sculptmate_tpu.geometry.marching_cubes import to_blocked_rows as to_blocked

    mask_b = jnp.concatenate([to_blocked(m) for m in masks], axis=0)  # (7NB, 512)
    vid_b = jnp.concatenate([to_blocked(v) for v in vid3], axis=0)
    gmask = mask_b[vb_safe] & vblk_valid[:, None]
    gvid = vid_b[vb_safe]
    gidx = vb_cls[:, None] * n3p + vb_base[:, None] + local_off[None, :]

    sink = max_verts
    dst = jnp.where(gmask, gvid, sink)
    edge_idx = (
        jnp.full((max_verts,), 7 * n3p, jnp.int32)
        .at[dst.ravel()]
        .set(gidx.ravel().astype(jnp.int32), mode="drop")
    )

    vx, vy, vz, valid_v = _mt_positions(
        sdf_flat, dxp, dyp, dzp, edge_idx, resolution, Np, snap_eps
    )
    return vx, vy, vz, valid_v, vid, occ3, num_verts, n_vblocks


def _mt_positions(sdf_flat, dxp, dyp, dzp, edge_idx, resolution, Np, snap_eps):
    """(max_verts,) compacted flat edge ids (class * n3p + anchor) ->
    deformed, sdf-interpolated vertex positions. Shared position tail of
    ``_mt_vertex_side`` (z-order ids) and ``_mt_vertex_side_wire``
    (block-major ids) — the id ORDER differs, the per-edge math does not.

    The positions are computed FULL-GRID per edge class (pure bandwidth:
    ~21 shifted elementwise passes over the padded grid, a few ms) and then
    fetched with ONE row-stacked (3, 7 n3p) take at the compacted ids —
    element gathers run at ~40 M elem/s on v5e, so the previous per-edge
    formulation (8 gathers x max_verts: s0/s1 + 3 deform components x 2
    endpoints) cost ~72 ms at the SF3D capacity; the stacked take is ~3x a
    single gather. Rolls wrap at the padded far boundary, which is never a
    valid edge anchor (the cut-mask domain test excludes the last N-d rows,
    and the pad is >= 1), so wrap-around values only reach masked slots."""
    n3p = Np * Np * Np
    valid_v = edge_idx < 7 * n3p
    safe = jnp.where(valid_v, edge_idx, 0)

    inv_res = 1.0 / resolution
    s3 = sdf_flat.reshape(Np, Np, Np)
    ax = jnp.arange(Np, dtype=jnp.float32) * inv_res
    p0 = []
    for comp, d in ((0, dxp), (1, dyp), (2, dzp)):
        if comp == 0:
            base = ax[:, None, None]
        elif comp == 1:
            base = ax[None, :, None]
        else:
            base = ax[None, None, :]
        b3 = jnp.broadcast_to(base, (Np, Np, Np))
        p0.append(b3 + d.reshape(Np, Np, Np) if d is not None else b3)

    per_class = []  # [class][component] (Np, Np, Np)
    for dcls in range(7):
        ddx, ddy, ddz = (int(v) for v in EDGE_DIRS[dcls])
        sh = (-ddx, -ddy, -ddz)
        s1 = jnp.roll(s3, sh, (0, 1, 2))
        denom = s3 - s1
        t = jnp.clip(s3 / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)
        # snap_eps may be a TRACED scalar: 0.0 is an exact no-op (t is
        # clipped to [0, 1], so t < 0 and t > 1 never hold) — one compiled
        # program serves every eps
        t = jnp.where(
            t < snap_eps, 0.0, jnp.where(t > 1.0 - snap_eps, 1.0, t)
        )
        per_class.append(
            [c + t * (jnp.roll(c, sh, (0, 1, 2)) - c) for c in p0]
        )

    V = jnp.stack(
        [
            jnp.concatenate([per_class[d][c].ravel() for d in range(7)])
            for c in range(3)
        ]
    )  # (3, 7 n3p)
    vs = jnp.take(V, safe, axis=1)  # ONE stacked take
    vx = jnp.where(valid_v, vs[0], 0.0)
    vy = jnp.where(valid_v, vs[1], 0.0)
    vz = jnp.where(valid_v, vs[2], 0.0)
    return vx, vy, vz, valid_v


def _mt_vertex_side_wire(
    sdf: jnp.ndarray,
    deform_x: Optional[jnp.ndarray],
    deform_y: Optional[jnp.ndarray],
    deform_z: Optional[jnp.ndarray],
    resolution: int,
    max_verts: int,
    vert_block_capacity: int,
    snap_eps: float = 0.0,
):
    """Wire-format variant of ``_mt_vertex_side``: BLOCK-MAJOR vertex
    numbering (class, 8^3 block, in-block x/y/z) — the order the native
    decoder re-derives from the occupancy bits (``native/mt_wire.cpp``
    order version 2) — so the full-grid z-order vid field (7 z-cumsums,
    7 i32 re-tilings, and an i32 row gather) drops out, and the compaction
    scatter runs through ``marching_cubes.scatter_compact_rows``'s hybrid
    (one-hot contraction + (A, K) scatter: at the SF3D r160 noise capacity
    of ~107 K rows the direct scatter's 55 M update slots were ~60% of the
    extraction program). Returns (vx, vy, vz, valid_v, occ3, num_verts,
    n_vblocks)."""
    from sculptmate_tpu.geometry.marching_cubes import (
        scatter_compact_rows,
        to_blocked_rows as to_blocked,
    )

    N = lattice_size(resolution)
    n3 = N * N * N
    assert sdf.shape == (n3,)
    Np = -(-N // BS) * BS
    n3p = Np * Np * Np
    nb1 = Np // BS
    NB = nb1**3

    local_off = jnp.asarray(_block_local_offsets(Np))  # (512,)
    block_base = jnp.asarray(_block_bases(Np))  # (NB,)

    def pad3(a, fill=0.0):
        a = a.reshape(N, N, N)
        p = Np - N
        return jnp.pad(a, ((0, p),) * 3, constant_values=fill)

    sdf3 = pad3(sdf, -1.0)
    occ3 = sdf3 > 0
    sdf_flat = sdf3.ravel()

    if deform_x is not None:
        scale = 1.0 / resolution
        dxp = scale * jnp.tanh(pad3(deform_x)).ravel()
        dyp = scale * jnp.tanh(pad3(deform_y)).ravel()
        dzp = scale * jnp.tanh(pad3(deform_z)).ravel()
    else:
        dxp = dyp = dzp = None

    ar = jnp.arange(Np)

    def cut_mask(d: int) -> jnp.ndarray:
        dx, dy, dz = (int(v) for v in EDGE_DIRS[d])
        m = occ3 != jnp.roll(occ3, (-dx, -dy, -dz), (0, 1, 2))
        dom = (
            (ar[:, None, None] < N - dx)
            & (ar[None, :, None] < N - dy)
            & (ar[None, None, :] < N - dz)
        )
        return m & dom

    masks = [cut_mask(d) for d in range(7)]

    def block_cnt(m):
        return (
            m.reshape(nb1, BS, nb1, BS, nb1, BS)
            .sum(axis=(1, 3, 5), dtype=jnp.int32)
            .ravel()
        )

    vcnt = jnp.concatenate([block_cnt(m) for m in masks])  # (7 NB,)
    num_verts = jnp.sum(vcnt)
    vblock_mask = vcnt > 0
    n_vblocks = jnp.sum(vblock_mask.astype(jnp.int32))
    vbase = jnp.cumsum(vcnt) - vcnt  # exclusive block-major vid base

    (vblk_ids,) = jnp.nonzero(
        vblock_mask, size=vert_block_capacity, fill_value=7 * NB
    )
    vblk_valid = vblk_ids < 7 * NB
    vb_safe = jnp.where(vblk_valid, vblk_ids, 0)
    vb_cls = vb_safe // NB
    vb_base = block_base[vb_safe % NB]

    mask_b = jnp.concatenate([to_blocked(m) for m in masks], axis=0)
    gmask = mask_b[vb_safe] & vblk_valid[:, None]  # (A, 512)
    # k=32: MT block rows average ~5.5 cuts (one EDGE CLASS per row, vs the
    # MC rows' ~9) — halving the per-row compaction width halves both the
    # one-hot contraction traffic and the (A, K) scatter's update slots,
    # the two largest terms of the extraction program; >32-cut rows flow
    # through the overflow tail / direct fallback exactly as before
    edge_idx = scatter_compact_rows(
        gmask, vbase[vb_safe], vb_cls * n3p + vb_base, local_off,
        max_verts, 7 * n3p, k=32,
    )

    vx, vy, vz, valid_v = _mt_positions(
        sdf_flat, dxp, dyp, dzp, edge_idx, resolution, Np, snap_eps
    )
    return vx, vy, vz, valid_v, occ3, num_verts, n_vblocks


def mt_wire_device(
    sdf: jnp.ndarray,
    deform_x: Optional[jnp.ndarray],
    deform_y: Optional[jnp.ndarray],
    deform_z: Optional[jnp.ndarray],
    resolution: int,
    max_verts: int,
    vert_block_capacity: int = 0,
    extra_counts: Tuple = (),
    snap_eps: float = 0.0,
) -> jnp.ndarray:
    """Compact wire-format MT extraction (see ``geometry/mt_wire.py``).

    Ships the PADDED occupancy bitmask + per-cut-edge deformed positions as
    3x uint16 over [-1/res, 1 + 1/res] (the learned offsets make positions
    non-recomputable from occupancy, unlike MC's scalar t), as ONE uint8
    buffer:

        [occ bits n3p/8][px lo][px hi][py lo][py hi][pz lo][pz hi  mv each]
        [counts: num_verts, n_vblocks, extra... 4 B each LE]

    ~4.3 MB at res 160 vs ~22 MB for the packed f32 mesh; faces and vertex
    ids are rebuilt by ``native/mt_wire.cpp``, and the device-side face
    machinery drops off the hot path entirely.

    Vertex order (the order of the position entries) is BLOCK-MAJOR —
    (edge class, 8^3 block, in-block x/y/z) — see ``_mt_vertex_side_wire``;
    the decoders re-derive the same order from the occupancy bits (order
    version 2, checked via ``mt_wire_order_version``).
    """
    from sculptmate_tpu.geometry.marching_cubes import pack_bits_u8

    if vert_block_capacity <= 0:
        vert_block_capacity = default_block_capacity(resolution, "verts")

    vx, vy, vz, valid_v, occ3, num_verts, n_vblocks = _mt_vertex_side_wire(
        sdf, deform_x, deform_y, deform_z, resolution, max_verts,
        vert_block_capacity, snap_eps=snap_eps,
    )

    occ_bytes = pack_bits_u8(occ3.ravel())

    lo = -1.0 / resolution
    rng = 1.0 + 2.0 / resolution

    def q16(v):
        q = jnp.clip(jnp.round((v - lo) / rng * 65535.0), 0, 65535).astype(
            jnp.int32
        )
        q = jnp.where(valid_v, q, 0)
        return (q & 0xFF).astype(jnp.uint8), (q >> 8).astype(jnp.uint8)

    px = q16(vx)
    py = q16(vy)
    pz = q16(vz)

    counts = jnp.stack([num_verts, n_vblocks, *extra_counts]).astype(jnp.uint32)
    count_bytes = jnp.stack(
        [(counts >> (8 * b)) & 0xFF for b in range(4)], axis=1
    ).reshape(-1).astype(jnp.uint8)

    return jnp.concatenate(
        [occ_bytes, px[0], px[1], py[0], py[1], pz[0], pz[1], count_bytes]
    )


def marching_tets(
    sdf: jnp.ndarray,
    deform_x: Optional[jnp.ndarray],
    deform_y: Optional[jnp.ndarray],
    deform_z: Optional[jnp.ndarray],
    resolution: int,
    max_verts: int,
    max_faces: int,
    vert_block_capacity: int = 0,
    cube_block_capacity: int = 0,
    cube_capacity: int = 0,
) -> MTResult:
    """sdf: flat (N^3,) over the (res+1)^3 lattice (x-major: lin = (i*N+j)*N+k);
    deform_*: optional flat (N^3,) raw offsets (tanh-normalized here).
    Vertices returned in [0, 1]^3 lattice coordinate space.
    """
    N = lattice_size(resolution)
    n3 = N * N * N
    Np = -(-N // BS) * BS
    n3p = Np * Np * Np
    nb1 = Np // BS
    NB = nb1**3
    if vert_block_capacity <= 0:
        vert_block_capacity = default_block_capacity(resolution, "verts")
    if cube_block_capacity <= 0:
        cube_block_capacity = default_block_capacity(resolution, "cubes")
    if cube_capacity <= 0:
        cube_capacity = max(1, max_faces // 3)

    edge_class_np, edge_anchor_np, tri_table_np, tri_count_np, tet_corners = (
        build_tet_tables()
    )
    local_off = jnp.asarray(_block_local_offsets(Np))  # (512,)
    block_base = jnp.asarray(_block_bases(Np))  # (NB,)

    vx, vy, vz, valid_v, vid, occ3, num_verts, n_vblocks = _mt_vertex_side(
        sdf, deform_x, deform_y, deform_z, resolution, max_verts,
        vert_block_capacity,
    )
    ar = jnp.arange(Np)
    from sculptmate_tpu.geometry.marching_cubes import to_blocked_rows as to_blocked

    # -- triangles: per-cube per-tet 4-bit cases ----------------------------
    # cube grid lives in the same padded Np^3 layout (cube i,j,k anchored at
    # lattice i,j,k); only cubes with all corners < N are real.
    tet_corners = build_tet_tables()[4]
    occ_i = occ3.astype(jnp.int32)

    cases = []
    for tnum in range(6):
        tc = tet_corners[tnum]  # (4, 3) corner offsets
        case_t = jnp.zeros((Np, Np, Np), jnp.int32)
        for vbit in range(4):
            ox, oy, oz = (int(v) for v in tc[vbit])
            case_t = case_t + (jnp.roll(occ_i, (-ox, -oy, -oz), (0, 1, 2)) << vbit)
        cases.append(case_t.ravel())
    case_all = jnp.stack(cases, axis=1).reshape(-1)  # (n3p*6,) cube-major

    cube_valid = (
        (ar[:, None, None] < N - 1)
        & (ar[None, :, None] < N - 1)
        & (ar[None, None, :] < N - 1)
    )

    tri_count_tab = jnp.asarray(tri_count_np)  # (6, 16)
    cnt_by_tet = [
        jnp.where(
            cube_valid.ravel(), tri_count_tab[tnum][cases[tnum]], 0
        )
        for tnum in range(6)
    ]
    ntri_cube = sum(cnt_by_tet)  # (n3p,)

    tri_in_block = (
        ntri_cube.reshape(nb1, BS, nb1, BS, nb1, BS).sum(axis=(1, 3, 5)).ravel()
    )
    num_faces = jnp.sum(tri_in_block)
    fblock_mask = tri_in_block > 0
    n_fblocks = jnp.sum(fblock_mask.astype(jnp.int32))

    (fblk_ids,) = jnp.nonzero(fblock_mask, size=cube_block_capacity, fill_value=NB)
    fblk_valid = fblk_ids < NB
    fb_safe = jnp.where(fblk_valid, fblk_ids, 0)

    block_face_off = jnp.cumsum(tri_in_block) - tri_in_block  # (NB,)
    fb_off = block_face_off[fb_safe]
    fb_base = block_base[fb_safe]

    cidx = fb_base[:, None] + local_off[None, :]  # (A, 512) cube flat idx
    ccnt = (
        to_blocked(ntri_cube.reshape(Np, Np, Np))[fb_safe] * fblk_valid[:, None]
    )  # (A, 512) contiguous row gather
    local_rank = jnp.cumsum(ccnt, axis=1) - ccnt
    first_face = fb_off[:, None] + local_rank  # (A, 512)

    # compact emitting cubes (each emits 1-12 faces)
    active_cube = ccnt > 0
    cube_rank_local = jnp.cumsum(active_cube, axis=1) - active_cube
    cubes_per_block = active_cube.sum(axis=1)
    cube_base_off = jnp.cumsum(cubes_per_block) - cubes_per_block
    num_active_cubes = cubes_per_block.sum()
    cdst = jnp.where(
        active_cube, cube_base_off[:, None] + cube_rank_local, cube_capacity
    )
    cube_idx_c = (
        jnp.full((cube_capacity,), -1, jnp.int32)
        .at[cdst.ravel()]
        .set(cidx.ravel().astype(jnp.int32), mode="drop")
    )
    first_face_c = (
        jnp.zeros((cube_capacity,), jnp.int32)
        .at[cdst.ravel()]
        .set(first_face.ravel().astype(jnp.int32), mode="drop")
    )

    cvalid = cube_idx_c >= 0
    ccube = jnp.where(cvalid, cube_idx_c, 0)  # (C,) cube flat idx

    # per compacted cube: 6 tet cases -> counts -> exclusive prefix
    case6 = case_all[ccube[:, None] * 6 + jnp.arange(6)[None, :]]  # (C, 6)
    cnt6 = jnp.where(
        cvalid[:, None],
        tri_count_tab[jnp.arange(6)[None, :], case6],
        0,
    )  # (C, 6)
    prefix6 = jnp.cumsum(cnt6, axis=1) - cnt6  # (C, 6) exclusive
    total_c = cnt6.sum(axis=1)  # (C,)

    # expand 12 slots per cube; map slot -> (tet, slot_in_tet)
    slots = jnp.arange(12, dtype=jnp.int32)  # (12,)
    tet_of_slot = (
        jnp.sum(slots[:, None, None] >= prefix6.T[None, :, :], axis=1) - 1
    ).astype(jnp.int32)  # (12, C): how many tet prefixes <= slot, minus one
    # guard empty tets: a tet with cnt 0 shares its prefix with the next; the
    # >= count lands on the LAST tet with that prefix, which is the emitting
    # one only if nonzero... resolve by clamping and validity below.
    tet_of_slot = jnp.clip(tet_of_slot, 0, 5).T  # (C, 12)
    slot_valid = (slots[None, :] < total_c[:, None]) & cvalid[:, None]
    slot_in_tet = slots[None, :] - jnp.take_along_axis(prefix6, tet_of_slot, axis=1)

    case_slot = jnp.take_along_axis(case6, tet_of_slot, axis=1)  # (C, 12)

    fsink = max_faces
    fdst = jnp.where(slot_valid, first_face_c[:, None] + slots[None, :], fsink)
    # packed key: ((cube_lin * 6 + tet) * 2 + slot_in_tet)
    fsrc = ((ccube[:, None] * 6 + tet_of_slot) * 2 + slot_in_tet).astype(jnp.int32)
    tri_key = (
        jnp.full((max_faces,), -1, jnp.int32)
        .at[fdst.ravel()]
        .set(fsrc.ravel(), mode="drop")
    )

    valid_f = tri_key >= 0
    tk = jnp.where(valid_f, tri_key, 0)
    slot_f = tk % 2
    tet_f = (tk // 2) % 6
    cube_f = tk // 12
    ci = cube_f // (Np * Np)
    cj = (cube_f // Np) % Np
    ck = cube_f % Np
    case_f = case_all[cube_f * 6 + tet_f]

    # per-corner flattened tables indexed by tet*16*2*3 + case*2*3 + slot*3 + c
    tri_flat = jnp.asarray(tri_table_np.reshape(-1))
    edge_class = jnp.asarray(edge_class_np)  # (6, 6)
    edge_anchor = [jnp.asarray(edge_anchor_np[:, :, d]) for d in range(3)]

    def face_corner(c: int) -> jnp.ndarray:
        slot_edge = tri_flat[((tet_f * 16 + case_f) * 2 + slot_f) * 3 + c]
        se = jnp.maximum(slot_edge, 0)
        dc = edge_class[tet_f, se]
        ax = ci + edge_anchor[0][tet_f, se]
        ay = cj + edge_anchor[1][tet_f, se]
        az = ck + edge_anchor[2][tet_f, se]
        gedge = dc * n3p + (ax * Np + ay) * Np + az
        return jnp.where(valid_f, vid[gedge], 0).astype(jnp.int32)

    fa, fb, fc = face_corner(0), face_corner(1), face_corner(2)

    return MTResult(
        vx, vy, vz, fa, fb, fc, num_verts, num_faces, n_vblocks, n_fblocks,
        num_active_cubes,
    )


def marching_tets_host(
    sdf: np.ndarray,
    deform: Optional[np.ndarray],
    resolution: int,
    max_verts: int = 0,
    max_faces: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: sdf (N^3,), deform (N^3, 3) or None. Returns verts in
    [0,1] and faces, sliced to true counts. Retries on any capacity overflow
    (verts, faces, active blocks, active cubes) — never truncates."""
    import jax

    N = lattice_size(resolution)
    if max_verts <= 0:
        max_verts = 32 * N * N
    if max_faces <= 0:
        max_faces = 64 * N * N

    dx = dy = dz = None
    if deform is not None:
        dx = jnp.asarray(deform[:, 0])
        dy = jnp.asarray(deform[:, 1])
        dz = jnp.asarray(deform[:, 2])

    mt_jit = jax.jit(marching_tets, static_argnums=(4, 5, 6, 7, 8, 9))
    vb_cap = default_block_capacity(resolution, "verts")
    cb_cap = default_block_capacity(resolution, "cubes")
    cube_cap = max(1, max_faces // 3)
    while True:
        res = mt_jit(
            jnp.asarray(sdf), dx, dy, dz, resolution, max_verts, max_faces,
            vb_cap, cb_cap, cube_cap,
        )
        nv, nf = int(res.num_verts), int(res.num_faces)
        nvb, nfb = int(res.num_active_vblocks), int(res.num_active_fblocks)
        ncube = int(res.num_active_cubes)
        if nvb > vb_cap or nfb > cb_cap:
            vb_cap = max(vb_cap, 2 * nvb)
            cb_cap = max(cb_cap, 2 * nfb)
            continue
        if ncube > cube_cap:
            cube_cap = 2 * max(cube_cap, ncube)
            continue
        if nv <= max_verts and nf <= max_faces:
            break
        max_verts = max(2 * max_verts, nv)
        max_faces = max(2 * max_faces, nf)
        cube_cap = max(cube_cap, max_faces // 3)

    verts = np.stack(
        [np.asarray(res.vx[:nv]), np.asarray(res.vy[:nv]), np.asarray(res.vz[:nv])], -1
    )
    faces = np.stack(
        [np.asarray(res.fa[:nf]), np.asarray(res.fb[:nf]), np.asarray(res.fc[:nf])], -1
    )
    return verts, faces
