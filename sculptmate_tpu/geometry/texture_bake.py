"""Texture baking: UV rasterization + attribute interpolation + island padding.

Device (XLA) replacement for the reference's C++ ``texture_baker.dll``
(``sf3d/texture_baker/baker.py:12-141``), following the *vectorized* spec the
reference ships alongside the DLL (``texture_baker/common.py:144-211``): for
every texel, barycentric point-in-triangle tests against candidate faces; the
lowest-index covering face wins; output is barycentrics + face id. That
formulation is embarrassingly parallel per texel — exactly what the TPU wants
— where the DLL's BVH walk is not.

Layout notes: the rasterization buffer is kept channels-first (4, res, res)
on device; face data enters as flat SoA arrays. Pixels map to UV like the
reference: pixel (y, x) -> (x/res, 1 - y/res)... the torch spec uses
linspace(0,1) pixel centers at cell corners; we follow the torch version
(linspace over [0, 1]).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rasterize_core(u0, v0, u1, v1, u2, v2, resolution: int, row_chunk: int):
    """SoA triangle corner UVs (F,) each -> (4, res, res) [bu, bv, bw, tid].

    Double-chunked: lax.map over pixel-row chunks, fori_loop over face
    chunks with a running lowest-face-id merge — peak intermediate is
    (row_chunk, res, face_chunk), never O(res^2 * F) (the dense version
    tried to allocate 64 GB at 512^2 x 65K faces).
    """
    F = u0.shape[0]
    FACE_CHUNK = min(F, 8192)
    # sort faces by their min-v so each pixel-row chunk only visits the face
    # chunks whose v-range overlaps it (winner selection is by min original
    # face id, so processing order does not change the result)
    vmin_f = jnp.minimum(jnp.minimum(v0, v1), v2)
    vmax_f = jnp.maximum(jnp.maximum(v0, v1), v2)
    order = jnp.argsort(vmin_f)
    fid_sorted = order.astype(jnp.int32)
    u0, v0, u1, v1, u2, v2, vmin_f, vmax_f = (
        a[order] for a in (u0, v0, u1, v1, u2, v2, vmin_f, vmax_f)
    )

    # pad faces to a chunk multiple with degenerates that never overlap
    Fp = -(-F // FACE_CHUNK) * FACE_CHUNK
    padf = lambda a: jnp.pad(a, (0, Fp - F))
    u0p, v0p, u1p, v1p, u2p, v2p = map(padf, (u0, v0, u1, v1, u2, v2))
    fid_p = jnp.pad(fid_sorted, (0, Fp - F), constant_values=2**30)
    vmin_p = jnp.pad(vmin_f, (0, Fp - F), constant_values=jnp.inf)
    vmax_p = jnp.pad(vmax_f, (0, Fp - F), constant_values=-jnp.inf)
    n_fchunks = Fp // FACE_CHUNK
    chunk_vlo = vmin_p.reshape(n_fchunks, FACE_CHUNK).min(axis=1)
    chunk_vhi = vmax_p.reshape(n_fchunks, FACE_CHUNK).max(axis=1)

    px = jnp.linspace(0.0, 1.0, resolution)
    py_full = jnp.linspace(0.0, 1.0, resolution)

    def do_rows(y0):
        py = jax.lax.dynamic_slice(py_full, (y0 * row_chunk,), (row_chunk,))
        gx = px[None, :, None]
        gy = py[:, None, None]
        row_v0 = py[0]
        row_v1 = py[-1]

        def face_block_body(ci, state):
            best_id, best_bu, best_bv, best_bw = state
            sl = lambda a: jax.lax.dynamic_slice(a, (ci * FACE_CHUNK,), (FACE_CHUNK,))
            fu0, fv0, fu1, fv1, fu2, fv2 = map(sl, (u0p, v0p, u1p, v1p, u2p, v2p))
            fid_chunk = sl(fid_p)
            e1u, e1v = fu1 - fu0, fv1 - fv0
            e2u, e2v = fu2 - fu0, fv2 - fv0
            d00 = e1u * e1u + e1v * e1v
            d01 = e1u * e2u + e1v * e2v
            d11 = e2u * e2u + e2v * e2v
            denom = d00 * d11 - d01 * d01
            denom_safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)

            pu = gx - fu0[None, None, :]  # (rows, res, FACE_CHUNK)
            pv = gy - fv0[None, None, :]
            d20 = pu * e1u + pv * e1v
            d21 = pu * e2u + pv * e2v
            bv = (d11 * d20 - d01 * d21) / denom_safe
            bw = (d00 * d21 - d01 * d20) / denom_safe
            bu = 1.0 - bv - bw
            fid = fid_chunk[None, None, :]
            inside = (
                (bu >= 0) & (bv >= 0) & (bw >= 0)
                & (jnp.abs(denom) >= 1e-12)
                & (fid < F)
            )
            cand = jnp.where(inside, fid, jnp.int32(2**30))
            loc = jnp.argmin(cand, axis=-1)  # first covering face in chunk
            take = lambda arr: jnp.take_along_axis(arr, loc[..., None], -1)[..., 0]
            cid = take(cand)
            better = cid < best_id
            return (
                jnp.where(better, cid, best_id),
                jnp.where(better, take(bu), best_bu),
                jnp.where(better, take(bv), best_bv),
                jnp.where(better, take(bw), best_bw),
            )

        eps = 1.0 / resolution

        def face_block(ci, state):
            overlap = (chunk_vlo[ci] <= row_v1 + eps) & (chunk_vhi[ci] >= row_v0 - eps)
            return jax.lax.cond(
                overlap, lambda s: face_block_body(ci, s), lambda s: s, state
            )

        init = (
            jnp.full((row_chunk, resolution), 2**30, jnp.int32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
        )
        best_id, bu, bv, bw = jax.lax.fori_loop(0, n_fchunks, face_block, init)
        hit = best_id < 2**30
        out = jnp.stack(
            [
                jnp.where(hit, bu, 0.0),
                jnp.where(hit, bv, 0.0),
                jnp.where(hit, bw, 0.0),
                jnp.where(hit, best_id.astype(jnp.float32), -1.0),
            ]
        )
        return out  # (4, rows, res)

    n_chunks = resolution // row_chunk
    rows = jax.lax.map(do_rows, jnp.arange(n_chunks))  # (n, 4, rows, res)
    return jnp.transpose(rows, (1, 0, 2, 3)).reshape(4, resolution, resolution)


TILE = 4  # fine-tier tile side (texels)
TILE2 = 64  # coarse-tier tile side for oversized faces
# max fine-tier span: 2 keeps the per-face slot expansion at 4 entries — the
# pair-compaction scatter costs ~40M updates/s on TPU, and S2=16 made it the
# rasterizer's dominant term (0.8 s at 741K faces); bigger faces just take
# the coarse tier.
# TILE=4 over 8: the scatter-min tests tile^2 texels per pair while typical
# atlas faces cover ~1 texel, so updates/pair drops 4x for ~27% more pairs —
# measured 624 -> 443 ms at 786K faces/1024^2 on v5e, winners bit-identical
# at margin=0 (3/1M texel diff at margin=0.05, all epsilon-borderline halo
# texels). Faces with 9-16-texel bboxes demote to the coarse tier now;
# production coarse counters stay tiny (they're counted and retried anyway).
MAX_TSPAN = 2
_PAIR_CHUNK = 8192
_PAIR2_CHUNK = 128  # coarse pairs test 64x64 texels each


def _face_tile_pairs(
    xlo, xhi, ylo, yhi, eligible, tile, max_span, T, pair_capacity,
    multi_capacity,
):
    """Scatter-compact (face, tile) pairs for one tier.

    Scatter updates cost ~40M/s on TPU, so a flat (F, S2) slot expansion is
    the dominant term (S2=64 on the coarse tier). Instead: one F-sized
    scatter writes every emitting face's FIRST pair; faces spanning > 1 tile
    (rare for atlas geometry) are rank-compacted into a ``multi_capacity``
    list and only that small list expands the remaining S2-1 slots.

    Returns (pair_fid, pair_tid, n_pairs_clamped, total_pairs_true,
    n_multi) — callers must retry when totals exceed the capacities (never
    silently truncate).
    """
    F = xlo.shape[0]
    txlo, txhi = xlo // tile, xhi // tile
    tylo, tyhi = ylo // tile, yhi // tile
    sx = jnp.clip(txhi - txlo + 1, 0, T)
    sy = jnp.clip(tyhi - tylo + 1, 0, T)
    sx = jnp.where(eligible, sx, 0)
    sy = jnp.where(eligible, sy, 0)
    total_true = jnp.sum(sx * sy)
    sxc = jnp.minimum(sx, max_span)
    syc = jnp.minimum(sy, max_span)
    npairs = sxc * syc
    off = jnp.cumsum(npairs) - npairs
    iota = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)[:, 0]

    # slot 0 for every emitting face: one F-sized scatter pair
    emit = npairs >= 1
    dst0 = jnp.where(emit, off, pair_capacity)
    tid0 = tylo * T + txlo
    pair_fid = (
        jnp.full((pair_capacity,), F, jnp.int32)
        .at[dst0]
        .set(iota, mode="drop")
    )
    pair_tid = (
        jnp.zeros((pair_capacity,), jnp.int32)
        .at[dst0]
        .set(tid0.astype(jnp.int32), mode="drop")
    )

    # compact the multi-tile faces, then expand only those
    multi = npairs >= 2
    n_multi = jnp.sum(multi.astype(jnp.int32))
    rank = jnp.cumsum(multi.astype(jnp.int32)) - multi
    mdst = jnp.where(multi, rank, multi_capacity)
    mid = (
        jnp.full((multi_capacity,), F, jnp.int32)
        .at[mdst]
        .set(iota, mode="drop")
    )  # face ids of multi-tile faces
    mvalid = mid < F
    msafe = jnp.where(mvalid, mid, 0)

    S2 = max_span * max_span
    k = jnp.arange(1, S2, dtype=jnp.int32)[None, :]  # slots 1..S2-1
    m_np = npairs[msafe][:, None]
    kvalid = (k < m_np) & mvalid[:, None]
    sx_safe = jnp.maximum(sxc[msafe], 1)[:, None]
    dx = k % sx_safe
    dy = k // sx_safe
    tid = (tylo[msafe][:, None] + dy) * T + (txlo[msafe][:, None] + dx)
    dst = jnp.where(kvalid, off[msafe][:, None] + k, pair_capacity)
    fid_src = jnp.broadcast_to(msafe[:, None], (multi_capacity, S2 - 1))
    pair_fid = pair_fid.at[dst.ravel()].set(fid_src.ravel(), mode="drop")
    pair_tid = pair_tid.at[dst.ravel()].set(
        tid.ravel().astype(jnp.int32), mode="drop"
    )
    return pair_fid, pair_tid, jnp.sum(npairs), total_true, n_multi


WINNER_SINK = jnp.int32(2**31 - 1)  # empty-texel key (scatter-min identity)


def binned_winner(
    u0, v0, u1, v1, u2, v2, key_f, resolution: int, pair_capacity: int,
    pair2_capacity: int, multi_capacity: int = 65536, margin: float = 0.0,
):
    """Two-tier binned scatter-min winner pass — O(surface), not O(res^2*F).

    1. Each face gets a texel bbox -> tile bbox. Normal atlas faces (bbox <=
       MAX_TSPAN 8x8-texel tiles) go to the FINE tier; oversized faces (e.g.
       big flat slice faces) go to a COARSE tier of 64x64-texel tiles whose
       span covers the whole atlas — no face is ever unroutable. Sub-texel
       faces covering no texel center emit nothing.
    2. (face, tile) pairs are scatter-compacted into fixed capacities (exact
       totals returned; callers retry on overflow — never silently
       truncated, same invariant as marching_cubes).
    3. Pair chunks run barycentric tests (64 or 4096 texels per pair), then a
       scatter-min of the face's KEY into the shared per-texel winner buffer.
       min is commutative, so tiers compose. ``key_f``: (F,) int32 per-face
       key strictly below WINNER_SINK — face ids for the bake rasterizer
       (winner = lowest covering id, the reference rule), negated sortable
       depths for the unwrap visibility pass (winner = deepest face).

    ``margin``: barycentric slack (0 = exact coverage; the host unwrap
    visibility test uses 0.05 like the reference's conservative raster).

    Returns (winner (res*res,) i32 = min key or WINNER_SINK, total_fine,
    total_coarse, n_multi_fine); valid when the totals fit their capacities
    AND n_multi_fine <= multi_capacity.
    """
    F = u0.shape[0]
    assert resolution % TILE2 == 0, resolution
    T = resolution // TILE
    T2 = resolution // TILE2
    s = float(resolution - 1)  # texel x center at u = x / (res-1)

    # -- face -> texel bbox ------------------------------------------------
    umin = jnp.minimum(jnp.minimum(u0, u1), u2) * s
    umax = jnp.maximum(jnp.maximum(u0, u1), u2) * s
    vmin = jnp.minimum(jnp.minimum(v0, v1), v2) * s
    vmax = jnp.maximum(jnp.maximum(v0, v1), v2) * s
    e1u, e1v = u1 - u0, v1 - v0
    e2u, e2v = u2 - u0, v2 - v0

    # barycentric slack `margin` admits texels OUTSIDE the exact triangle
    # (w in [-margin, 1+margin]); widen the bbox by the margin-induced
    # texel-space extent so those texels are actually enumerated, matching
    # the per-texel test below (0 when margin == 0)
    if float(margin) > 0.0:
        slack = float(margin) * s * (
            jnp.sqrt(e1u * e1u + e1v * e1v) + jnp.sqrt(e2u * e2u + e2v * e2v)
        )
    else:
        slack = 0.0
    xlo = jnp.clip(
        jnp.ceil(umin - slack - 1e-3).astype(jnp.int32), 0, resolution - 1
    )
    xhi = jnp.clip(
        jnp.floor(umax + slack + 1e-3).astype(jnp.int32), -1, resolution - 1
    )
    ylo = jnp.clip(
        jnp.ceil(vmin - slack - 1e-3).astype(jnp.int32), 0, resolution - 1
    )
    yhi = jnp.clip(
        jnp.floor(vmax + slack + 1e-3).astype(jnp.int32), -1, resolution - 1
    )
    denom = (e1u * e1u + e1v * e1v) * (e2u * e2u + e2v * e2v) - (
        e1u * e2u + e1v * e2v
    ) ** 2
    degenerate = jnp.abs(denom) < 1e-12

    covers = (xhi >= xlo) & (yhi >= ylo) & ~degenerate
    big = (
        ((xhi // TILE - xlo // TILE) >= MAX_TSPAN)
        | ((yhi // TILE - ylo // TILE) >= MAX_TSPAN)
    ) & covers

    # the fine multi-list is deliberately small (multi-tile atlas faces are
    # rare) with its own overflow signal; the coarse multi-list is bounded by
    # pair2_capacity (a big face emits >= 1 coarse pair), so an overflow
    # there already trips the total_coarse retry
    pair_fid, pair_tid, n_fine, total_fine, n_multi = _face_tile_pairs(
        xlo, xhi, ylo, yhi, covers & ~big, TILE, MAX_TSPAN, T, pair_capacity,
        multi_capacity,
    )

    # the coarse tier's pair compaction costs ~3 F-sized scatters (~47 ms
    # each at 786K faces on v5e) even when ZERO faces are big — the common
    # case for decimated atlas geometry. Branch it out: total_coarse is
    # exact in both branches (0 pairs when no face is big), so the
    # overflow-retry invariant is unchanged.
    def _build_coarse(_):
        fid2, tid2, n2, tot2, _ = _face_tile_pairs(
            xlo, xhi, ylo, yhi, big, TILE2, T2, T2, pair2_capacity,
            pair2_capacity,
        )
        return fid2, tid2, n2, tot2

    def _empty_coarse(_):
        return (
            jnp.full((pair2_capacity,), F, jnp.int32),
            jnp.zeros((pair2_capacity,), jnp.int32),
            jnp.int32(0),
            jnp.asarray(0, total_fine.dtype),
        )

    pair2_fid, pair2_tid, n_coarse, total_coarse = jax.lax.cond(
        jnp.any(big), _build_coarse, _empty_coarse, None
    )

    # -- chunked pair tests + scatter-min winner ----------------------------
    mg = float(margin)
    # one (6, F) take per chunk instead of 6 row gathers (row-stacked takes
    # measured ~3x faster than per-row element gathers on v5e)
    uv_rows = jnp.stack([u0, v0, u1, v1, u2, v2])

    def make_chunk_body(p_fid, p_tid, tile, chunk, Tt):
        oy, ox = jnp.meshgrid(
            jnp.arange(tile, dtype=jnp.int32),
            jnp.arange(tile, dtype=jnp.int32),
            indexing="ij",
        )
        oy = oy.ravel()[None, :]
        ox = ox.ravel()[None, :]

        def chunk_body(ci, winner):
            fid = jax.lax.dynamic_slice(p_fid, (ci * chunk,), (chunk,))
            tidc = jax.lax.dynamic_slice(p_tid, (ci * chunk,), (chunk,))
            fsafe = jnp.minimum(fid, F - 1)
            fuv = jnp.take(uv_rows, fsafe, axis=1)[..., None]  # (6, PC, 1)
            fu0, fv0, fu1, fv1, fu2, fv2 = (fuv[i] for i in range(6))
            fkey = key_f[fsafe][:, None]
            tx = (tidc % Tt)[:, None]
            ty = (tidc // Tt)[:, None]
            gx = (tx * tile + ox).astype(jnp.float32) / s  # (PC, npx)
            gy = (ty * tile + oy).astype(jnp.float32) / s

            e1u, e1v = fu1 - fu0, fv1 - fv0
            e2u, e2v = fu2 - fu0, fv2 - fv0
            d00 = e1u * e1u + e1v * e1v
            d01 = e1u * e2u + e1v * e2v
            d11 = e2u * e2u + e2v * e2v
            den = d00 * d11 - d01 * d01
            den_safe = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
            pu = gx - fu0
            pv = gy - fv0
            d20 = pu * e1u + pv * e1v
            d21 = pu * e2u + pv * e2v
            bv = (d11 * d20 - d01 * d21) / den_safe
            bw = (d00 * d21 - d01 * d20) / den_safe
            bu = 1.0 - bv - bw
            inside = (
                (bu >= -mg) & (bv >= -mg) & (bw >= -mg)
                & (jnp.abs(den) >= 1e-12)
                & (fid[:, None] < F)
            )
            key = jnp.where(inside, fkey, WINNER_SINK)
            texel = (ty * tile + oy) * resolution + (tx * tile + ox)
            texel = jnp.where(inside, texel, resolution * resolution)
            return winner.at[texel.ravel()].min(key.ravel(), mode="drop")

        return chunk_body

    winner = jnp.full((resolution * resolution,), WINNER_SINK, jnp.int32)
    # trip counts are TRACED (actual pairs, not capacity): capacities are
    # generous, and fori_loop handles dynamic bounds fine
    nc_fine = jnp.minimum(
        (n_fine + _PAIR_CHUNK - 1) // _PAIR_CHUNK, pair_capacity // _PAIR_CHUNK
    )
    winner = jax.lax.fori_loop(
        0, nc_fine, make_chunk_body(pair_fid, pair_tid, TILE, _PAIR_CHUNK, T),
        winner,
    )
    nc_coarse = jnp.minimum(
        (n_coarse + _PAIR2_CHUNK - 1) // _PAIR2_CHUNK,
        pair2_capacity // _PAIR2_CHUNK,
    )
    winner = jax.lax.fori_loop(
        0,
        nc_coarse,
        make_chunk_body(pair2_fid, pair2_tid, TILE2, _PAIR2_CHUNK, T2),
        winner,
    )
    return winner, total_fine, total_coarse, n_multi


def _rasterize_binned_core(
    u0, v0, u1, v1, u2, v2, resolution: int, pair_capacity: int,
    pair2_capacity: int, multi_capacity: int = 65536,
):
    """Binned rasterizer: ``binned_winner`` with face-id keys (winner =
    lowest covering face id, the reference rule, ``common.py:144-211``) +
    a cheap per-texel recovery pass recomputing the winner's barycentrics.

    Returns (rast (4, res, res), total_fine, total_coarse, n_multi) — valid
    when the totals fit their capacities and n_multi <= multi_capacity.
    """
    F = u0.shape[0]
    s = float(resolution - 1)
    winner, total_fine, total_coarse, n_multi = binned_winner(
        u0, v0, u1, v1, u2, v2, jnp.arange(F, dtype=jnp.int32), resolution,
        pair_capacity, pair2_capacity, multi_capacity,
    )

    # -- recovery: barycentrics of the winning face per texel ---------------
    hit = winner < WINNER_SINK
    wf = jnp.where(hit, winner, 0)
    wuv = jnp.take(
        jnp.stack([u0, v0, u1, v1, u2, v2]), wf, axis=1
    )  # one (6, res^2) take, ~3x a per-row gather
    fu0, fv0, fu1, fv1, fu2, fv2 = (wuv[i] for i in range(6))
    xs = (jnp.arange(resolution * resolution, dtype=jnp.int32) % resolution).astype(
        jnp.float32
    ) / s
    ys = (jnp.arange(resolution * resolution, dtype=jnp.int32) // resolution).astype(
        jnp.float32
    ) / s
    e1u, e1v = fu1 - fu0, fv1 - fv0
    e2u, e2v = fu2 - fu0, fv2 - fv0
    d00 = e1u * e1u + e1v * e1v
    d01 = e1u * e2u + e1v * e2v
    d11 = e2u * e2u + e2v * e2v
    den = d00 * d11 - d01 * d01
    den_safe = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    pu = xs - fu0
    pv = ys - fv0
    d20 = pu * e1u + pv * e1v
    d21 = pu * e2u + pv * e2v
    bv = (d11 * d20 - d01 * d21) / den_safe
    bw = (d00 * d21 - d01 * d20) / den_safe
    bu = 1.0 - bv - bw
    rast = jnp.stack(
        [
            jnp.where(hit, bu, 0.0),
            jnp.where(hit, bv, 0.0),
            jnp.where(hit, bw, 0.0),
            jnp.where(hit, wf.astype(jnp.float32), -1.0),
        ]
    ).reshape(4, resolution, resolution)
    return rast, total_fine, total_coarse, n_multi


def default_pair_capacity(n_faces: int) -> int:
    """Generous default: atlas faces are tiny (mostly 0-1 tiles each).
    Power-of-two bucketed so per-mesh face counts reuse compiled programs
    (the pair loop's trip count is traced, so slack costs nothing)."""
    return 1 << max(16, int(4 * max(n_faces, 1) - 1).bit_length())


def default_pair2_capacity(resolution: int) -> int:
    """Coarse-tier capacity: oversized faces are rare (bbox > 32 texels);
    sized off the atlas, not the face count."""
    return 1 << max(13, (2 * (resolution // TILE2) ** 2 - 1).bit_length())


def default_multi_capacity(pair_capacity: int) -> int:
    """Fine-tier multi-tile face list: small on purpose (the slot expansion
    scales with it); overflow is signalled and retried."""
    return max(65536, pair_capacity // 64)


_rasterize_jit = jax.jit(_rasterize_core, static_argnums=(6, 7))
_rasterize_binned_jit = jax.jit(_rasterize_binned_core, static_argnums=(6, 7, 8, 9))


def _pick_row_chunk(resolution: int, n_faces: int) -> int:
    # bound the (rows, res, face_chunk) intermediate to ~64M elements
    fc = min(max(n_faces, 1), 8192)
    rc = max(1, min(64, (64 * 1024 * 1024) // (resolution * fc)))
    while resolution % rc:
        rc -= 1
    return rc


def rasterize_device(
    u0, v0, u1, v1, u2, v2, resolution: int, pair_capacity: int = 0,
    pair2_capacity: int = 0, multi_capacity: int = 0,
):
    """Trace-friendly rasterize: SoA per-corner UVs already on device.

    With ``pair_capacity > 0`` uses the two-tier binned path and returns
    (rast, total_pairs_fine, total_pairs_coarse, n_multi_fine) for host-side
    overflow checks; with 0 the brute-force path and trivially-satisfied
    indicators.
    """
    F = u0.shape[0]
    if pair_capacity > 0:
        if pair2_capacity <= 0:
            pair2_capacity = default_pair2_capacity(resolution)
        if multi_capacity <= 0:
            multi_capacity = default_multi_capacity(pair_capacity)
        return _rasterize_binned_core(
            u0, v0, u1, v1, u2, v2, resolution, pair_capacity, pair2_capacity,
            multi_capacity,
        )
    row_chunk = _pick_row_chunk(resolution, F)
    rast = _rasterize_core(u0, v0, u1, v1, u2, v2, resolution, row_chunk)
    return rast, jnp.int32(0), jnp.int32(0), jnp.int32(0)


def interpolate_device(attr_cf: jnp.ndarray, rast: jnp.ndarray, fa, fb, fc) -> jnp.ndarray:
    """Trace-friendly interpolate: attr (K, Nv) channels-first on device,
    face corner ids as flat arrays. Returns (K, res, res)."""
    res = rast.shape[-1]
    tid = jnp.maximum(rast[3].astype(jnp.int32), 0).ravel()
    valid = (rast[3] >= 0).ravel()
    out = (
        attr_cf[:, fa[tid]] * rast[0].ravel()[None, :]
        + attr_cf[:, fb[tid]] * rast[1].ravel()[None, :]
        + attr_cf[:, fc[tid]] * rast[2].ravel()[None, :]
    )
    out = jnp.where(valid[None, :], out, 0.0)
    return out.reshape(-1, res, res)


def rasterize(uv: np.ndarray, faces: np.ndarray, resolution: int) -> jnp.ndarray:
    """uv (Nv, 2), faces (F, 3) -> (4, res, res) device array.

    Prefers the two-tier binned path (retrying on pair-capacity overflow);
    the brute-force path only serves non-tile-aligned resolutions."""
    uv = np.asarray(uv, np.float32)
    faces = np.asarray(faces)
    tri = uv[faces]  # (F, 3, 2)
    corners = tuple(
        jnp.asarray(tri[:, c, d]) for c in range(3) for d in range(2)
    )
    u0, v0, u1, v1, u2, v2 = corners

    if resolution % TILE2 == 0:
        cap = default_pair_capacity(len(faces))
        cap2 = default_pair2_capacity(resolution)
        mcap = default_multi_capacity(cap)
        while True:
            rast, fine, coarse, nmulti = _rasterize_binned_jit(
                u0, v0, u1, v1, u2, v2, resolution, cap, cap2, mcap
            )
            fine, coarse, nmulti = int(fine), int(coarse), int(nmulti)
            if fine <= cap and coarse <= cap2 and nmulti <= mcap:
                return rast
            if fine > cap:
                cap = -(-2 * max(cap, fine) // _PAIR_CHUNK) * _PAIR_CHUNK
            if coarse > cap2:
                cap2 = -(-2 * max(cap2, coarse) // _PAIR2_CHUNK) * _PAIR2_CHUNK
            if nmulti > mcap:
                mcap = 2 * max(mcap, nmulti)

    row_chunk = _pick_row_chunk(resolution, len(faces))
    return _rasterize_jit(u0, v0, u1, v1, u2, v2, resolution, row_chunk)


def get_mask(rast: jnp.ndarray) -> jnp.ndarray:
    """(res, res) bool: texels covered by any face (``baker.py:59-69``)."""
    return rast[3] >= 0


def interpolate(attr: np.ndarray, rast: jnp.ndarray, faces: np.ndarray) -> jnp.ndarray:
    """Interpolate per-vertex attributes into the atlas.

    attr (Nv, K), faces (F, 3), rast (4, res, res) -> (K, res, res)
    channels-first device array; invalid texels are 0.
    """
    attr = jnp.asarray(np.asarray(attr, np.float32))
    fa = jnp.asarray(np.asarray(faces[:, 0], np.int32))
    fb = jnp.asarray(np.asarray(faces[:, 1], np.int32))
    fc = jnp.asarray(np.asarray(faces[:, 2], np.int32))

    @jax.jit
    def run(attr, rast, fa, fb, fc):
        res = rast.shape[-1]
        tid = jnp.maximum(rast[3].astype(jnp.int32), 0).ravel()
        valid = (rast[3] >= 0).ravel()
        out = (
            attr[fa[tid]] * rast[0].ravel()[:, None]
            + attr[fb[tid]] * rast[1].ravel()[:, None]
            + attr[fc[tid]] * rast[2].ravel()[:, None]
        )
        out = jnp.where(valid[:, None], out, 0.0)
        return jnp.transpose(out, (1, 0)).reshape(-1, res, res)

    return run(attr, rast, fa, fb, fc)


def dilate_fill(img: jnp.ndarray, mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """UV island edge padding (``sf3d/models/utils.py:96-133``): iteratively
    propagate valid border colors outward into the empty region.

    img: (K, res, res), mask: (res, res) bool valid. Returns (K, res, res).
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(img, mask, iterations):
        def body(_, state):
            img, mask = state
            m = mask.astype(img.dtype)[None]
            # 3x3 neighborhood sum of valid colors / counts
            k = jnp.ones((3, 3), img.dtype)

            def conv2(x):
                return jax.lax.conv_general_dilated(
                    x[:, None],  # (K, 1, H, W)
                    k[None, None],
                    (1, 1),
                    "SAME",
                )[:, 0]

            neigh_sum = conv2(img * m)
            neigh_cnt = conv2(jnp.broadcast_to(m, img.shape))
            fill = neigh_sum / jnp.maximum(neigh_cnt, 1.0)
            new_mask = neigh_cnt[0] > 0
            img = jnp.where(mask[None], img, fill)
            return img, mask | new_mask

        img, mask = jax.lax.fori_loop(0, iterations, body, (img, mask))
        return img

    return run(img, mask, max(int(iterations), 1))


def float32_to_uint8(
    arr: np.ndarray, dither: bool = True, dither_mask: np.ndarray | None = None, seed: int = 0
) -> np.ndarray:
    """Quantize [0,1] float image to uint8 with optional dithering
    (``sf3d/models/utils.py:136-149``)."""
    arr = np.clip(np.asarray(arr, np.float32), 0.0, 1.0)
    if dither:
        rng = np.random.default_rng(seed)
        noise = (rng.random(arr.shape, dtype=np.float32) - 0.5) / 255.0
        if dither_mask is not None:
            noise = noise * (1.0 - dither_mask)
        arr = np.clip(arr + noise, 0.0, 1.0)
    return (arr * 255.0 + 0.5).astype(np.uint8)
