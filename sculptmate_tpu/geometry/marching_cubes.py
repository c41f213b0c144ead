"""Device marching cubes, active-block formulation with fixed-capacity outputs.

Replaces the reference's host skimage path (``tsr/models/isosurface.py:41-54``,
GPU->CPU roundtrip of the full 256^3 grid) with an on-device XLA program.

Structure (v2 — compaction cost proportional to the *surface*, not volume):

1. Cut-edge masks and cell case ids are cheap fused elementwise passes over
   the full grid; the global vertex-id field is one cumsum (~40 ms at 256^3).
2. The grid is tiled into 8^3 blocks. Only blocks that contain cut edges /
   emitting cells survive a tiny block-level compaction (32^3 entries).
3. Per-surviving-block element data (masks, vids, tri slots) is row-gathered
   and compacted with scatters over the ~4M-element active set instead of
   jnp.nonzero over the 50-83M-element full set — the v1 bottleneck
   (2 x ~0.5 s of nonzero scans at 256^3, regardless of surface size).

Everything large stays structure-of-arrays ((N,) flat buffers) — TPU tiled
layouts pad (N, 3) arrays 42x (the original 18 GB OOM).

Outputs are fixed-capacity (``max_verts`` / ``max_faces``) with exact counts;
``marching_cubes_host`` slices on the host and retries on overflow (capacity
overflow is detected, never silently truncated).

The domain may be rectangular (Rx, Ry, Rz) — each dim a multiple of 8. The
optional ``valid_x`` data argument masks which x-cells may emit geometry
(default: all but the +x boundary), which is what lets the grid-axis-sharded
(SP) extraction run this same program per x-slab with a one-plane halo
(``parallel/farm.py:sharded_extract``).

Conventions: ``level > 0`` is inside; vertices are in lattice index coords
(divide by R-1 for the reference's [0, 1] range); faces are wound so normals
point away from the inside (toward decreasing level).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.geometry.mc_tables import EDGE_AXIS, EDGE_OFFSET, build_tables

BS = 8  # block side


def default_block_capacity(R: int, max_verts: int) -> int:
    # a surface crosses O((R/8)^2) of the (R/8)^3 blocks, times 3 edge axes;
    # x12 covers convoluted fields, and callers retry on overflow. Every
    # capacity unit costs 512 gathered/scattered elements downstream - keep
    # it tight. Vertex blocks live in a 3*NB domain (one per edge axis).
    NB = (R // BS) ** 3
    return int(min(3 * NB, max(2048, 36 * (R // BS) ** 2)))


class MCResult(NamedTuple):
    # structure-of-arrays: (max_verts,) / (max_faces,) flat components
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    fa: jnp.ndarray
    fb: jnp.ndarray
    fc: jnp.ndarray
    num_verts: jnp.ndarray  # () int32
    num_faces: jnp.ndarray  # () int32
    num_active_blocks: jnp.ndarray  # () int32 (overflow check vs block cap)
    num_active_cells: jnp.ndarray  # () int32 (overflow check vs max_faces//2)

    @property
    def verts(self):
        return jnp.stack([self.vx, self.vy, self.vz], axis=-1)

    @property
    def faces(self):
        return jnp.stack([self.fa, self.fb, self.fc], axis=-1)


def _block_local_offsets(RY: int, RZ: int) -> np.ndarray:
    """Flat offsets of the 8^3 block cells within the (RX,RY,RZ) flat layout."""
    oi, oj, ok = np.meshgrid(np.arange(BS), np.arange(BS), np.arange(BS), indexing="ij")
    off = (oi * (RY * RZ) + oj * RZ + ok).reshape(-1).astype(np.int32)
    # scatter_compact_rows' MXU branch encodes (offset + 1) as f32; it must
    # stay exact or vertex ids silently corrupt (grids with RY*RZ > ~2.4M,
    # e.g. 2048^2 z-planes, would exceed the f32 integer range)
    assert int(off.max()) + 1 < 2**24, (
        f"block offsets exceed exact-f32 range: RY*RZ={RY * RZ}"
    )
    return off


def _block_bases(RX: int, RY: int, RZ: int) -> np.ndarray:
    """Flat base index of each block, ordered by block id."""
    nbx, nby, nbz = RX // BS, RY // BS, RZ // BS
    bi, bj, bk = np.meshgrid(np.arange(nbx), np.arange(nby), np.arange(nbz), indexing="ij")
    return (
        (bi * (RY * RZ) + bj * RZ + bk * 1).reshape(-1).astype(np.int64) * BS
    ).astype(np.int32)


def to_blocked_rows(x3: jnp.ndarray) -> jnp.ndarray:
    """(RX, RY, RZ) -> (NB, 512) block-major rows (block order bx,by,bz;
    within-block ox,oy,oz — matching ``_block_bases``/``_block_local_offsets``).

    Streamed over bx with ``lax.map``: a single 6D transpose materializes
    under a T(8,128) tiled layout that pads the (nbz, 8) minor dims 16x —
    25.7 GB at 512^3 (observed OOM). Per-slab the padded intermediate is
    ~16x of 8 MB instead.
    """
    RX, RY, RZ = x3.shape
    nbx, nby, nbz = RX // BS, RY // BS, RZ // BS

    def slab(xs):  # (BS, RY, RZ)
        y = xs.reshape(BS, nby, BS, nbz, BS)  # (ox, by, oy, bz, oz)
        y = y.transpose(1, 3, 0, 2, 4)  # (by, bz, ox, oy, oz)
        return y.reshape(nby * nbz, BS * BS * BS)

    out = jax.lax.map(slab, x3.reshape(nbx, BS, RY, RZ))
    return out.reshape(nbx * nby * nbz, BS * BS * BS)


def _compact_blocks(block_mask_flat: jnp.ndarray, cap: int):
    """Tiny compaction over the block grid. Returns (ids (cap,), count)."""
    n = block_mask_flat.shape[0]
    (ids,) = jnp.nonzero(block_mask_flat, size=cap, fill_value=n)
    count = jnp.sum(block_mask_flat.astype(jnp.int32))
    return ids, count


def _cut_masks(inside: jnp.ndarray, valid_x: jnp.ndarray):
    """Per-axis cut-edge masks (elementwise passes over the full grid)."""
    RX, RY, RZ = inside.shape

    def cut_mask(axis: int) -> jnp.ndarray:
        m = jnp.zeros((RX, RY, RZ), bool)
        if axis == 0:
            m = m.at[: RX - 1].set(inside[:-1] != inside[1:])
            m = m & valid_x[:, None, None]
        elif axis == 1:
            m = m.at[:, : RY - 1].set(inside[:, :-1] != inside[:, 1:])
        else:
            m = m.at[:, :, : RZ - 1].set(inside[:, :, :-1] != inside[:, :, 1:])
        return m

    return [cut_mask(a) for a in range(3)]


def _compacted_positions(level: jnp.ndarray, edge_idx: jnp.ndarray):
    """(max_verts,) compacted flat edge ids -> per-vertex positions + t.

    The interpolation parameter is computed FULL-GRID elementwise (three
    shifted ratios, pure bandwidth: ~0.5 ms at 256^3) and gathered ONCE at
    the compacted edges — element gathers run at ~40 M elem/s on TPU, so
    two per-edge level gathers (l0, l1) would cost ~40 ms here."""
    RX, RY, RZ = level.shape
    n3 = RX * RY * RZ
    syz = RY * RZ
    valid_v = edge_idx < 3 * n3
    safe_idx = jnp.where(valid_v, edge_idx, 0)
    axis = safe_idx // n3
    lin = safe_idx % n3
    i = lin // syz
    j = (lin // RZ) % RY
    k = lin % RZ

    def t_axis(a: int) -> jnp.ndarray:
        if a == 0:
            l1 = jnp.concatenate([level[1:], level[-1:]], axis=0)
        elif a == 1:
            l1 = jnp.concatenate([level[:, 1:], level[:, -1:]], axis=1)
        else:
            l1 = jnp.concatenate([level[:, :, 1:], level[:, :, -1:]], axis=2)
        denom = level - l1
        return jnp.clip(
            level / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0
        ).ravel()

    t_all = jnp.concatenate([t_axis(a) for a in range(3)])  # (3 n3,)
    t = t_all[safe_idx]

    vx = jnp.where(valid_v, i.astype(jnp.float32) + t * (axis == 0), 0.0)
    vy = jnp.where(valid_v, j.astype(jnp.float32) + t * (axis == 1), 0.0)
    vz = jnp.where(valid_v, k.astype(jnp.float32) + t * (axis == 2), 0.0)
    return vx, vy, vz, t, valid_v


def _vertex_side(
    level: jnp.ndarray,
    inside: jnp.ndarray,
    valid_x: jnp.ndarray,
    max_verts: int,
    block_capacity: int,
    dense: bool,
):
    """Cut-edge detection + vid field + compaction + vertex positions.

    Used by ``marching_cubes`` (full device MC — its face table gathers the
    full-grid z-order vid field per face corner). Returns
    (vx, vy, vz, t, valid_v, vid, num_verts, n_vblocks, masks).
    """
    RX, RY, RZ = level.shape
    n3 = RX * RY * RZ
    nbx, nby, nbz = RX // BS, RY // BS, RZ // BS
    NB = nbx * nby * nbz
    local_off = jnp.asarray(_block_local_offsets(RY, RZ))
    block_base = jnp.asarray(_block_bases(RX, RY, RZ))

    masks = _cut_masks(inside, valid_x)

    # -- global vertex ids -------------------------------------------------
    # same values as cumsum(mask_flat) - 1 over the concatenated flat masks,
    # but computed as per-z-row cumsums (parallel over 3R^2 rows) + a tiny
    # row-base prefix: the single 3R^3-element scan is latency-bound on TPU
    # (~330 ms at 512^3 vs ~30 ms this way)
    row_tot = jnp.concatenate(
        [m.sum(axis=2, dtype=jnp.int32).ravel() for m in masks]
    )  # (3 RX RY,)
    row_base = jnp.cumsum(row_tot) - row_tot
    num_verts = row_base[-1] + row_tot[-1]
    vid3 = [
        row_base[a * RX * RY : (a + 1) * RX * RY].reshape(RX, RY, 1)
        + jnp.cumsum(m, axis=2, dtype=jnp.int32)
        - 1
        for a, m in enumerate(masks)
    ]
    vid = jnp.concatenate([v.ravel() for v in vid3])  # (3 n3,)
    mask_flat = jnp.concatenate([m.ravel() for m in masks])  # (3 n3,)

    # -- active vertex blocks: (3, NB) any-reduce -------------------------
    def block_any(m):
        return m.reshape(nbx, BS, nby, BS, nbz, BS).any(axis=(1, 3, 5)).ravel()

    vblock_mask = jnp.concatenate([block_any(m) for m in masks])  # (3 NB,)
    n_vblocks = jnp.sum(vblock_mask.astype(jnp.int32))

    sink = max_verts
    if dense:
        dst = jnp.where(mask_flat, vid, sink)
        src = jax.lax.broadcasted_iota(jnp.int32, (3 * n3, 1), 0)[:, 0]
        edge_idx = (
            jnp.full((max_verts,), 3 * n3, jnp.int32).at[dst].set(src, mode="drop")
        )
    else:
        vblk_ids, _ = _compact_blocks(vblock_mask, block_capacity)
        vblk_valid = vblk_ids < 3 * NB
        vb_safe = jnp.where(vblk_valid, vblk_ids, 0)
        vb_axis = vb_safe // NB
        vb_base = block_base[vb_safe % NB]

        # re-tile mask/vid into block-major (3NB, 512) rows FIRST (a regular
        # streamed transpose, bandwidth-bound), then gather whole contiguous
        # rows: arbitrary-index element gathers lower to ~40M elem/s on TPU
        # (measured ~530 ms for the same data at 256^3), contiguous row
        # gathers to ~85 ms
        mask_b = jnp.concatenate([to_blocked_rows(m) for m in masks], axis=0)
        vid_b = jnp.concatenate(
            [to_blocked_rows(v) for v in vid3], axis=0
        )
        gmask = mask_b[vb_safe] & vblk_valid[:, None]
        gvid = vid_b[vb_safe]
        # global flat edge ids are arithmetic off the block id (no gather)
        gidx = vb_axis[:, None] * n3 + vb_base[:, None] + local_off[None, :]

        # scatter-compact the cut-edge indices into the vertex buffer
        dst = jnp.where(gmask, gvid, sink)
        edge_idx = (
            jnp.full((max_verts,), 3 * n3, jnp.int32)
            .at[dst.ravel()]
            .set(gidx.ravel().astype(jnp.int32), mode="drop")
        )

    vx, vy, vz, t, valid_v = _compacted_positions(level, edge_idx)
    return vx, vy, vz, t, valid_v, vid, num_verts, n_vblocks, masks


def _vertex_side_wire(
    level: jnp.ndarray,
    inside: jnp.ndarray,
    valid_x: jnp.ndarray,
    max_verts: int,
    block_capacity: int,
):
    """Cut-edge detection + BLOCK-MAJOR vertex numbering + compaction.

    Wire-format variant of ``_vertex_side``: vertices are numbered in
    (axis, block, in-block ox/oy/oz) order — the exact order the native
    decoder (``native/mc_wire.cpp:build_prefix``) re-derives from the
    occupancy bits — so the global z-order vertex-id field drops out
    entirely: no three full-grid z-cumsums, no three i32 block re-tilings,
    and no (block_capacity, 512) i32 vid row gather. The id is the block's
    exclusive cut-count prefix (a (3 NB,) cumsum) plus an in-row exclusive
    prefix of the already-gathered mask rows. At the noise-surface block
    capacity bench.py runs at (~82 K rows = 42 M gathered elements) this
    removes roughly half the compaction traffic.
    """
    RX, RY, RZ = level.shape
    n3 = RX * RY * RZ
    nbx, nby, nbz = RX // BS, RY // BS, RZ // BS
    NB = nbx * nby * nbz
    local_off = jnp.asarray(_block_local_offsets(RY, RZ))
    block_base = jnp.asarray(_block_bases(RX, RY, RZ))

    masks = _cut_masks(inside, valid_x)

    def block_cnt(m):
        return (
            m.reshape(nbx, BS, nby, BS, nbz, BS)
            .sum(axis=(1, 3, 5), dtype=jnp.int32)
            .ravel()
        )

    vcnt = jnp.concatenate([block_cnt(m) for m in masks])  # (3 NB,)
    num_verts = jnp.sum(vcnt)
    vblock_mask = vcnt > 0
    n_vblocks = jnp.sum(vblock_mask.astype(jnp.int32))
    vbase = jnp.cumsum(vcnt) - vcnt  # exclusive block-major vid base

    vblk_ids, _ = _compact_blocks(vblock_mask, block_capacity)
    vblk_valid = vblk_ids < 3 * NB
    vb_safe = jnp.where(vblk_valid, vblk_ids, 0)
    vb_axis = vb_safe // NB
    vb_base = block_base[vb_safe % NB]

    # ONE (block_capacity, 512) bool row gather (vs mask + i32 vid in the
    # z-order path); ids come from arithmetic + an in-row prefix instead
    mask_b = jnp.concatenate([to_blocked_rows(m) for m in masks], axis=0)
    gmask = mask_b[vb_safe] & vblk_valid[:, None]  # (A, 512)
    row_src_base = vb_axis * n3 + vb_base  # flat id of each row's slot 0
    edge_idx = scatter_compact_rows(
        gmask, vbase[vb_safe], row_src_base, local_off, max_verts, 3 * n3
    )

    vx, vy, vz, t, valid_v = _compacted_positions(level, edge_idx)
    return vx, vy, vz, t, valid_v, num_verts, n_vblocks


def scatter_compact_rows(
    gmask: jnp.ndarray,
    vrow_base: jnp.ndarray,
    row_src_base: jnp.ndarray,
    local_off: jnp.ndarray,
    max_verts: int,
    domain: int,
    k: int = 64,
):
    """(A, 512) gathered cut-mask rows -> (max_verts,) compacted flat edge
    ids (fill = ``domain`` for empty slots), vertices numbered block-major:
    row b's cut edges land at [vrow_base[b], vrow_base[b] + count_b), each
    carrying ``row_src_base[b] + local_off[slot]``.

    Shared by the MC and MT wire paths. Two strategies, picked per input at
    run time (scatter-set costs ~6 ms per MILLION update slots on v5e, even
    dropped ones — measured):

    - direct: one update slot per gathered element (A x 512). Right when A
      is small (ordinary objects: the surface touches a few thousand
      blocks); pathological on noise-dense fields (bench.py's random-weight
      256^3 surface: A ~ 82 K -> 42 M slots ~ 200 ms — was the whole lean
      path's bottleneck).
    - hybrid: a one-hot contraction on the vector units packs each row's
      <= K cut edges into K slots (out[b, r] = sum_s [within==r][mask] *
      payload[s], bandwidth-bound, ~13 ms for 82 K rows), then ONE (A, K)
      scatter — 8x fewer update slots. Rows with more than K cuts (smooth
      pockets: a plane through an 8^3 block cuts 64-200 edges) are block-
      compacted into an (O_CAP, 512) overflow tail and direct-scattered —
      a full-width masked scatter would cost the whole A x 512 again.
    """
    A = int(gmask.shape[0])
    gm_i = gmask.astype(jnp.int32)
    within = jnp.cumsum(gm_i, axis=1) - gm_i
    cnt = within[:, -1] + gm_i[:, -1]  # (A,) cut edges per block row
    sink = max_verts
    # per-row compaction width (MC noise surfaces avg ~9 cuts/block row;
    # MT rows — one edge class each — avg ~5.5 and pass k=32)
    K = k
    O_CAP = max(256, A // 8)

    def scatter_direct(_):
        dst = jnp.where(gmask, vrow_base[:, None] + within, sink)
        gidx = row_src_base[:, None] + local_off[None, :]
        return (
            jnp.full((max_verts,), domain, jnp.int32)
            .at[dst.ravel()]
            .set(gidx.ravel().astype(jnp.int32), mode="drop")
        )

    def scatter_mxu(_):
        r = jnp.arange(K, dtype=jnp.int32)
        # payload = in-block flat offset + 1 (0 = empty slot); < 2^24 so
        # f32-exact (bf16 cannot represent every offset)
        payload = (local_off + 1).astype(jnp.float32)
        # row slab: the (C, 512, K) one-hot is 256 MB as bool and up to
        # 1 GiB if XLA materializes the f32 cast — budgeted against 16 GB
        # HBM even with two 512^3 extractions in flight
        C = 8192
        Ap = -(-A // C) * C
        wp = jnp.pad(within, ((0, Ap - A), (0, 0)))
        mp = jnp.pad(gmask, ((0, Ap - A), (0, 0)))

        def slab(args):
            wc, mc = args  # (C, 512)
            sel = (
                (wc[:, :, None] == r[None, None, :]) & mc[:, :, None]
            ).astype(jnp.float32)
            return jax.lax.dot_general(
                jnp.broadcast_to(payload[None, None, :], (C, 1, 512)),
                sel,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]

        loc = jax.lax.map(
            slab, (wp.reshape(-1, C, 512), mp.reshape(-1, C, 512))
        ).reshape(Ap, K)[:A]
        local = jnp.round(loc).astype(jnp.int32) - 1  # (A, K) slot in block
        valid = r[None, :] < cnt[:, None]
        dst = jnp.where(valid, vrow_base[:, None] + r[None, :], sink)
        src = row_src_base[:, None] + jnp.maximum(local, 0)
        edge_idx = (
            jnp.full((max_verts,), domain, jnp.int32)
            .at[dst.ravel()]
            .set(src.ravel().astype(jnp.int32), mode="drop")
        )

        # overflow tail (rows with cnt > K), block-compacted first
        (orow,) = jnp.nonzero(cnt > K, size=O_CAP, fill_value=A)
        ovalid = orow < A
        osafe = jnp.where(ovalid, orow, 0)
        om = gmask[osafe] & ovalid[:, None] & (within[osafe] >= K)
        odst = jnp.where(om, vrow_base[osafe][:, None] + within[osafe], sink)
        osrc = row_src_base[osafe][:, None] + local_off[None, :]
        return edge_idx.at[odst.ravel()].set(
            osrc.ravel().astype(jnp.int32), mode="drop"
        )

    # beyond O_CAP overflow rows the field is smooth-dense everywhere —
    # exactly where A is small and the direct scatter is already cheap
    return jax.lax.cond(
        jnp.sum((cnt > K).astype(jnp.int32)) > O_CAP,
        scatter_direct,
        scatter_mxu,
        operand=None,
    )


def pack_bits_u8(flags: jnp.ndarray) -> jnp.ndarray:
    """(M,) bool with M % 8 == 0 -> (M/8,) uint8, bit b = element 8*i + b
    (little-endian within the byte, matching the C++ wire reader)."""
    m = flags.reshape(-1, 8).astype(jnp.uint8)
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(m * w[None, :], axis=1, dtype=jnp.uint8)


def mc_wire_device(
    level: jnp.ndarray,
    max_verts: int,
    block_capacity: int = 0,
    valid_x: Optional[jnp.ndarray] = None,
    color_fn=None,
    extra_counts: Tuple = (),
    split_colors: bool = False,
) -> jnp.ndarray:
    """Compact wire-format extraction: everything the HOST needs to rebuild
    the mesh, in minimum bytes, as ONE uint8 buffer.

    The tunneled D2H link is the lean path's bottleneck (~14-115 MB/s, large
    per-round-trip latency): the full packed f32 mesh at 256^3 is ~35 MB.
    Faces are pure table logic on the occupancy field, so we ship

        [occupancy bits  n3/8 B][t lo  mv B][t hi  mv B][r][g][b  mv B each]
        [counts: num_verts, n_vblocks, extra...  4 B each little-endian]

    (~6 MB at 256^3) and rebuild faces + positions in native code
    (``native/mc_wire.cpp``) from the same tables. Positions reconstruct to
    |err| <= 2^-16 lattice units (t is uint16); colors are uint8.

    Vertex order (the order of the t/color entries) is BLOCK-MAJOR —
    (axis, 8^3 block, in-block x/y/z) — NOT flat z-order: it lets the device
    derive ids from per-block prefixes instead of full-grid cumsums + an i32
    row gather (see ``_vertex_side_wire``), and the decoders re-derive the
    same order from the occupancy bits (order version 2, checked via
    ``mc_wire_order_version``).

    ``color_fn``: optional trace-time callback ``(vx, vy, vz, valid_v) ->
    (r, g, b)`` float rows in [0, 1] (e.g. a color-MLP query at the vertex
    positions, which are in lattice index coordinates).

    Returns the (W,) uint8 wire buffer — or, with ``split_colors=True`` and
    a color_fn, a tuple ``(wire_without_color_rows, colors (3*max_verts,)
    u8)`` so the host can fetch the geometry sections first and decode faces
    while the color bytes are still in flight (``copy_to_host_async``).
    """
    RX, RY, RZ = level.shape
    assert RX % BS == 0 and RY % BS == 0 and RZ % BS == 0, level.shape
    n3 = RX * RY * RZ
    assert n3 % 8 == 0
    if block_capacity <= 0:
        block_capacity = default_block_capacity(max(RX, RY, RZ), max_verts)

    inside = level > 0
    if valid_x is None:
        valid_x = jnp.arange(RX) < RX - 1

    vx, vy, vz, t, valid_v, num_verts, n_vblocks = _vertex_side_wire(
        level, inside, valid_x, max_verts, block_capacity
    )

    occ_bytes = pack_bits_u8(inside.ravel())  # (n3/8,)

    t16 = jnp.where(
        valid_v, jnp.round(t * 65535.0).astype(jnp.int32), 0
    )
    t_lo = (t16 & 0xFF).astype(jnp.uint8)
    t_hi = (t16 >> 8).astype(jnp.uint8)

    if color_fn is not None:
        to_u8 = lambda c: jnp.clip(
            jnp.round(c * 255.0), 0, 255
        ).astype(jnp.uint8)
        rgb = [to_u8(c) for c in color_fn(vx, vy, vz, valid_v)]
    else:
        rgb = []  # color rows are omitted entirely (fewer D2H bytes)

    counts = jnp.stack(
        [num_verts, n_vblocks, *extra_counts]
    ).astype(jnp.uint32)
    count_bytes = jnp.stack(
        [(counts >> (8 * b)) & 0xFF for b in range(4)], axis=1
    ).reshape(-1).astype(jnp.uint8)

    if split_colors and rgb:
        wire = jnp.concatenate([occ_bytes, t_lo, t_hi, count_bytes])
        return wire, jnp.concatenate(rgb)
    wire = jnp.concatenate([occ_bytes, t_lo, t_hi, *rgb, count_bytes])
    return wire


def marching_cubes(
    level: jnp.ndarray,
    max_verts: int,
    max_faces: int,
    block_capacity: int = 0,
    dense: bool = False,
    valid_x: Optional[jnp.ndarray] = None,
) -> MCResult:
    """level: (RX, RY, RZ) float32, each dim divisible by 8. Jittable, static
    shapes.

    ``dense=True`` compacts with direct full-grid scatters instead of the
    active-block gather+scatter — faster when a large fraction (>~20%) of
    blocks is active (noise-like fields); the block path wins on ordinary
    objects where the surface touches a few percent of blocks.

    ``valid_x``: optional (RX,) bool — cells (and x-cut edges) at x rows where
    it is False emit nothing. Defaults to ``x < RX - 1``. y/z cut edges are
    never x-masked (cells reference y/z edges on their +x face plane).
    """
    RX, RY, RZ = level.shape
    assert RX % BS == 0 and RY % BS == 0 and RZ % BS == 0, level.shape
    n3 = RX * RY * RZ
    syz = RY * RZ
    nbx, nby, nbz = RX // BS, RY // BS, RZ // BS
    NB = nbx * nby * nbz
    if block_capacity <= 0:
        block_capacity = default_block_capacity(max(RX, RY, RZ), max_verts)

    tri_table_np, tri_count_np, maxtri = build_tables()
    corner_tables = [jnp.asarray(tri_table_np[:, :, c].reshape(-1)) for c in range(3)]
    tri_count_tab = jnp.asarray(tri_count_np)
    edge_axis = jnp.asarray(EDGE_AXIS)
    edge_off = [jnp.asarray(EDGE_OFFSET[:, d]) for d in range(3)]
    local_off = jnp.asarray(_block_local_offsets(RY, RZ))  # (512,)
    block_base = jnp.asarray(_block_bases(RX, RY, RZ))  # (NB,)

    inside = level > 0
    if valid_x is None:
        valid_x = jnp.arange(RX) < RX - 1

    vs = _vertex_side(level, inside, valid_x, max_verts, block_capacity, dense)
    (vx, vy, vz, _t, valid_v, vid, num_verts, n_vblocks, masks) = vs

    # -- cell cases (elementwise over the cell grid, padded to R^3) --------
    ins = inside.astype(jnp.int32)
    pad = jnp.pad(ins, ((0, 1), (0, 1), (0, 1)))  # +boundary cells see outside 0
    case = jnp.zeros((RX, RY, RZ), jnp.int32)
    for c in range(8):
        ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        case = case + (pad[ox : ox + RX, oy : oy + RY, oz : oz + RZ] << c)
    # cells on the +boundary (or masked x rows) are invalid: tri count -> 0
    cell_valid = (
        valid_x[:, None, None]
        & (jnp.arange(RY)[None, :, None] < RY - 1)
        & (jnp.arange(RZ)[None, None, :] < RZ - 1)
    )
    ntri = jnp.where(cell_valid, tri_count_tab[case], 0)  # (RX, RY, RZ)
    ntri_flat = ntri.ravel()
    case_flat = case.ravel()

    # block-level cumulative face offsets
    tri_in_block = ntri.reshape(nbx, BS, nby, BS, nbz, BS).sum(axis=(1, 3, 5)).ravel()
    num_faces = jnp.sum(tri_in_block)
    fblock_mask = tri_in_block > 0
    n_fblocks = jnp.sum(fblock_mask.astype(jnp.int32))

    cell_cap = max(1, max_faces // 2)
    if dense:
        # direct full-grid compaction of emitting cells
        first_face_all = jnp.cumsum(ntri_flat) - ntri_flat  # (n3,)
        active_cell_f = ntri_flat > 0
        cell_rank = jnp.cumsum(active_cell_f.astype(jnp.int32)) - active_cell_f
        num_active_cells = jnp.sum(active_cell_f.astype(jnp.int32))
        cdst = jnp.where(active_cell_f, cell_rank, cell_cap)
        csrc = jax.lax.broadcasted_iota(jnp.int32, (n3, 1), 0)[:, 0]
        cell_idx_c = (
            jnp.full((cell_cap,), -1, jnp.int32).at[cdst].set(csrc, mode="drop")
        )
        first_face_c = (
            jnp.zeros((cell_cap,), jnp.int32)
            .at[cdst]
            .set(first_face_all.astype(jnp.int32), mode="drop")
        )
    else:
        fblk_ids, _ = _compact_blocks(fblock_mask, block_capacity)
        fblk_valid = fblk_ids < NB
        fb_safe = jnp.where(fblk_valid, fblk_ids, 0)

        # exclusive cumsum of faces per block, then gather per active block
        block_face_off = jnp.cumsum(tri_in_block) - tri_in_block  # (NB,)
        fb_off = block_face_off[fb_safe]  # (A,)
        fb_base = block_base[fb_safe]

        cidx = fb_base[:, None] + local_off[None, :]  # (A, 512) cell flat idx
        # contiguous row gather from the block-major re-tiling (see the
        # vertex side: element gathers are ~6x slower on TPU)
        cnt = to_blocked_rows(ntri)[fb_safe] * fblk_valid[:, None]  # (A, 512)
        # rank of each cell's first face within its block
        local_rank = jnp.cumsum(cnt.reshape(cnt.shape[0], -1), axis=1) - cnt
        first_face = fb_off[:, None] + local_rank  # (A, 512)

        # two-stage face compaction: (1) compact ACTIVE CELLS (cells emitting
        # >= 1 tri, <= num_faces of them), (2) expand <= maxtri slots per
        # active cell. A one-stage scatter over (A, 512, maxtri) slots costs
        # 5x the memory traffic for nothing - most slots are empty.
        active_cell = cnt > 0  # (A, 512)
        cell_rank_local = (
            jnp.cumsum(active_cell.reshape(active_cell.shape[0], -1), axis=1)
            - active_cell
        )
        cells_per_block = active_cell.sum(axis=1)  # (A,)
        cell_base = jnp.cumsum(cells_per_block) - cells_per_block
        num_active_cells = cells_per_block.sum()
        cdst = jnp.where(active_cell, cell_base[:, None] + cell_rank_local, cell_cap)
        cell_idx_c = (
            jnp.full((cell_cap,), -1, jnp.int32)
            .at[cdst.ravel()]
            .set(cidx.ravel().astype(jnp.int32), mode="drop")
        )
        first_face_c = (
            jnp.zeros((cell_cap,), jnp.int32)
            .at[cdst.ravel()]
            .set(first_face.ravel().astype(jnp.int32), mode="drop")
        )

    cvalid = cell_idx_c >= 0
    ccell = jnp.where(cvalid, cell_idx_c, 0)
    ccnt = jnp.where(cvalid, ntri_flat[ccell], 0)  # (cell_cap,)

    fsink = max_faces
    slot_ids = jnp.arange(maxtri, dtype=jnp.int32)
    fdst = jnp.where(
        slot_ids[None, :] < ccnt[:, None],
        first_face_c[:, None] + slot_ids[None, :],
        fsink,
    )  # (cell_cap, maxtri)
    fsrc = (ccell[:, None] * maxtri + slot_ids[None, :]).astype(jnp.int32)
    tri_key = (
        jnp.full((max_faces,), -1, jnp.int32)
        .at[fdst.ravel()]
        .set(fsrc.ravel(), mode="drop")
    )

    valid_f = tri_key >= 0
    tk = jnp.where(valid_f, tri_key, 0)
    cell = tk // maxtri
    slot = tk % maxtri
    ci = cell // syz
    cj = (cell // RZ) % RY
    ck = cell % RZ
    tkey = case_flat[cell] * maxtri + slot

    def face_corner(c: int) -> jnp.ndarray:
        le = jnp.maximum(corner_tables[c][tkey], 0)
        ax = edge_axis[le]
        gi = ci + edge_off[0][le]
        gj = cj + edge_off[1][le]
        gk = ck + edge_off[2][le]
        gedge = ax * n3 + (gi * RY + gj) * RZ + gk
        return jnp.where(valid_f, vid[gedge], 0).astype(jnp.int32)

    fa, fb, fc = face_corner(0), face_corner(1), face_corner(2)

    n_blocks = jnp.maximum(n_vblocks, n_fblocks)
    return MCResult(
        vx, vy, vz, fa, fb, fc, num_verts, num_faces, n_blocks, num_active_cells
    )


def marching_cubes_host(
    level, max_verts: int = 0, max_faces: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: run on device, slice to true counts on host,
    retrying with doubled capacities (verts/faces/blocks) on overflow."""
    import jax

    level = jnp.asarray(level)
    pads = [(-int(s)) % BS for s in level.shape]
    if any(pads):
        level = jnp.pad(
            level, tuple((0, p) for p in pads), constant_values=-1.0
        )
    R = int(max(level.shape))
    if max_verts <= 0:
        max_verts = 32 * R * R
    if max_faces <= 0:
        max_faces = 64 * R * R

    mc_jit = jax.jit(marching_cubes, static_argnums=(1, 2, 3))
    block_cap = default_block_capacity(R, max_verts)
    while True:
        res = mc_jit(level, max_verts, max_faces, block_cap)
        nv = int(res.num_verts)
        nf = int(res.num_faces)
        nblk = int(res.num_active_blocks)
        if nblk > block_cap:
            block_cap = 2 * max(block_cap, nblk)
            continue
        if int(res.num_active_cells) > max_faces // 2:
            max_faces *= 2
            continue
        if nv <= max_verts and nf <= max_faces:
            break
        max_verts = max(max_verts * 2, nv)
        max_faces = max(max_faces * 2, nf)

    verts = np.stack(
        [np.asarray(res.vx[:nv]), np.asarray(res.vy[:nv]), np.asarray(res.vz[:nv])],
        axis=-1,
    )
    faces = np.stack(
        [np.asarray(res.fa[:nf]), np.asarray(res.fb[:nf]), np.asarray(res.fc[:nf])],
        axis=-1,
    )
    return verts, faces
