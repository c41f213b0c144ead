"""Cube-projection UV unwrap on the TPU.

Device counterpart of ``uv_unwrap.py`` (which mirrors the reference
``sf3d/uv_unwrapper/unwrap.py:643-697``): the per-face math — box
assignment, slice rotation, overlap resolution, atlas packing — is
embarrassingly parallel over faces, exactly what the single weak host core
is worst at (measured 4-12 s at 741K faces, run-to-run noisy) and the TPU
is best at. One H2D upload (positions only — the box-assignment normal is
the geometric cross product of the corner positions), ONE jit, one compact
u16 D2H download; the host keeps only the 3x3 PCA rotation and the final
UV dedup sort.

The reference's closed-source overlap DLL is replaced by a depth-buffer
visibility test like the host path, built on the bake rasterizer's
``binned_winner`` scatter-min pass with *negated sortable-depth* keys
(winner = deepest face); the 6 cube-face slices raster in one 1024^2 pass,
each inset into a cell of a 4x4 grid so barycentric margins cannot bleed
across slices. Atlas semantics track ``unwrap.py:384-503`` (same offsets,
1/3-1/6 grid, individual-square pool); results differ from the host path
only through raster resolution and fp (same 13-way index domain).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.geometry.texture_bake import (
    WINNER_SINK,
    binned_winner,
    default_multi_capacity,
    default_pair2_capacity,
)
from sculptmate_tpu.geometry.uv_unwrap import _FACE_RULES

RASTER_RES = 1024  # 4x4 grid of slice cells, 256^2 each
_CELL_INSET = 0.05  # keep bary-margin coverage inside each slice cell

INT_MIN = jnp.int32(-(2**31))


def _sortable(d):
    """f32 -> int32, monotonic in the float ordering."""
    i = jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32)
    return jnp.where(i >= 0, i, INT_MIN - i - 1)


def _unsortable(s):
    i = jnp.where(s >= 0, s, INT_MIN - s - 1)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _depth_round(
    uc, vc, slice_of, depth, participate, pair_caps
):
    """One visibility round: raster all participating faces into the 4x4
    slice grid (winner = max depth via scatter-min of ~sortable(depth)),
    then test each face at its own centroid texel with a per-slice depth
    tolerance. ``uc``/``vc`` are per-corner lists of 3 flat (F,) arrays —
    SoA, like every uv in this module: an (F, 3, 2) stack would inherit a
    (8, 128)-tiled HBM layout padding its minor dims ~170x. Returns
    (visible (F,) bool, fine, coarse, n_multi)."""
    cell = 1.0 / 4.0
    gx = (slice_of % 4).astype(jnp.float32)
    gy = (slice_of // 4).astype(jnp.float32)
    span = 1.0 - 2.0 * _CELL_INSET

    def warp(c, g):
        return (jnp.clip(c, 0.0, 1.0) * span + _CELL_INSET + g) * cell

    u = [warp(uc[c], gx) for c in range(3)]
    v = [warp(vc[c], gy) for c in range(3)]

    # degenerate-at-origin for non-participants: covers nothing
    u = [jnp.where(participate, c, 0.0) for c in u]
    v = [jnp.where(participate, c, 0.0) for c in v]

    key = ~_sortable(depth)  # scatter-MIN of ~s == max depth
    key = jnp.where(participate, key, WINNER_SINK - 1)

    pair_cap, pair2_cap, multi_cap = pair_caps
    winner, fine, coarse, n_multi = binned_winner(
        u[0], v[0], u[1], v[1], u[2], v[2], key, RASTER_RES,
        pair_cap, pair2_cap, multi_cap, margin=0.05,
    )

    # per-slice depth tolerance over this round's participants
    eps_slice = []
    for g in range(6):
        m = participate & (slice_of == g)
        dmax = jnp.max(jnp.where(m, depth, -jnp.inf))
        dmin = jnp.min(jnp.where(m, depth, jnp.inf))
        eps_slice.append(0.02 * jnp.maximum(dmax - dmin, 1e-6))
    oh = (
        slice_of[:, None] == jnp.arange(6, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    eps = oh @ jnp.stack(eps_slice)  # exact one-hot lookup, no gather

    cen_u = warp((uc[0] + uc[1] + uc[2]) / 3.0, gx)
    cen_v = warp((vc[0] + vc[1] + vc[2]) / 3.0, gy)
    s = float(RASTER_RES - 1)
    cx = jnp.clip(jnp.round(cen_u * s).astype(jnp.int32), 0, RASTER_RES - 1)
    cy = jnp.clip(jnp.round(cen_v * s).astype(jnp.int32), 0, RASTER_RES - 1)
    wkey = winner[cy * RASTER_RES + cx]
    covered = wkey < WINNER_SINK - 1
    wdepth = _unsortable(~wkey)
    visible = ~covered | (wdepth <= depth + eps)
    return visible, fine, coarse, n_multi


def _unwrap_core(
    px, py, pz, fa, fb, fc, n_verts, n_faces, island_padding,
    pair_caps,
):
    """All per-face unwrap math on device. Inputs are padded/bucketed flat
    rows; n_verts/n_faces are the real (traced) counts. Returns
    (uv6 (6, F) uint16 — rows [u0, v0, u1, v1, u2, v2], one per corner
    component — atlas_index (F,), counters, angles (2, 6) f32 = per-slice
    rotation cos/sin rows: with them (plus atlas_index) the HOST can rebuild
    the per-corner UVs bit-comparably from the same quantized POSITIONS
    (``reconstruct_uvs_host``) — atlas_index carries the face's axis pick
    (``index = atlas_index % 6``) so the host never re-derives it (no
    fp-tie hazard on the argmax), every reduction the host replays is a
    min/max (order-independent, so numpy reproduces it exactly), and the
    two order-dependent mean-of-tangents sums ship as the angles.

    Vertex NORMALS are not consumed: the box-assignment normal is the
    geometric cross product of the (dequantized) corner positions — saving
    the 3 normal rows of the u16 upload (~20% of its bytes) and the 3
    per-corner normal takes (element gathers are the program's costliest
    op class) vs the corner-averaged vertex-normal estimator. The axis
    pick differs only for faces whose averaged and geometric normals
    straddle a diagonal — a measure-zero band where either choice is
    equally arbitrary.

    Everything per-face lives in flat (F,) SoA arrays (per-corner lists):
    an (F, 3) f32 array inherits a (8, 128)-tiled HBM layout — a 42x pad
    (170x for (F, 3, 2)) that costs both HBM footprint (12.8 GB/array at a
    degenerate 25M-face retry capacity — an OOM) and padded-lane bandwidth
    on every materialized elementwise op. The (6, F) output row matrix pads
    only 8/6 = 1.33x."""
    F = fa.shape[0]
    fvalid = jnp.arange(F) < n_faces
    vvalid = jnp.arange(px.shape[0]) < n_verts

    # -- box assignment (uv_unwrap._box_assign) -------------------------
    def vmin(c):
        return jnp.min(jnp.where(vvalid, c, jnp.inf))

    def vmax(c):
        return jnp.max(jnp.where(vvalid, c, -jnp.inf))

    bb_min = jnp.stack([vmin(px), vmin(py), vmin(pz)])
    bb_max = jnp.stack([vmax(px), vmax(py), vmax(pz)])
    rngs = jnp.maximum(bb_max - bb_min, 1e-12)
    vp = [
        2.0 * (c - bb_min[i]) / rngs[i] - 1.0
        for i, c in enumerate((px, py, pz))
    ]  # normalized per-vertex coords, 3 x (Nv,)

    # one (3, Nv) take per corner instead of 9+9 per-row element gathers
    # (row-stacked takes measured ~3x faster on v5e)
    st_p = jnp.stack(vp)  # (3, Nv)
    tri_st = [jnp.take(st_p, f, axis=1) for f in (fa, fb, fc)]  # 3 x (3, F)
    tri = [
        [tri_st[c][d] for d in range(3)] for c in range(3)
    ]  # [corner][axis] -> (F,)
    # geometric face normal from the already-gathered corners: vp is an
    # anisotropic rescale of the rotated positions, so recover raw-space
    # edge vectors (d_raw = d_vp * rng / 2 — linear) before the cross
    half_rng = [rngs[d] * 0.5 for d in range(3)]
    e1 = [(tri[1][d] - tri[0][d]) * half_rng[d] for d in range(3)]
    e2 = [(tri[2][d] - tri[0][d]) * half_rng[d] for d in range(3)]
    # e1 x e2 is the OUTWARD normal under this repo's winding (MC/MT
    # "normals away from the inside", Mesh._compute_vertex_normal) — valid
    # because _main_axis_rotation guarantees a PROPER rotation (det +1)
    face_n = [
        e1[1] * e2[2] - e1[2] * e2[1],
        e1[2] * e2[0] - e1[0] * e2[2],
        e1[0] * e2[1] - e1[1] * e2[0],
    ]
    fn_len = jnp.sqrt(sum(c * c for c in face_n))
    face_n = [c / jnp.maximum(fn_len, 1e-12) for c in face_n]

    # argmax over the 6 signed axes
    scores = jnp.stack(
        [face_n[0], -face_n[0], face_n[1], -face_n[1], face_n[2], -face_n[2]]
    )  # (6, F)
    index = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (F,)

    # ALL per-face table lookups are one-hot f32 matmuls (EXACT: a one-hot
    # row has a single 1.0, so the contraction has one nonzero term — no
    # summation-order effects), and corner-component picks are 3-way selects:
    # an element gather of (F,) costs ~20 ms at 786K faces on v5e (the
    # take_along_axis/table-index formulation spent ~250 ms here — it was
    # the entire unwrap core's hot spot), while the select/one-hot forms are
    # pure vector-unit bandwidth.
    onehot6 = (
        index[:, None] == jnp.arange(6, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # (F, 6), reused by every per-face lookup below
    rules_f = jnp.asarray(np.asarray(_FACE_RULES, np.float32))  # (6, 6)
    rlv = onehot6 @ rules_f  # (F, 6) exact small ints
    ax_f = rlv[:, 0].astype(jnp.int32)
    sgn_f = rlv[:, 1]
    ua_f = rlv[:, 2].astype(jnp.int32)
    us_f = rlv[:, 3]
    va_f = rlv[:, 4].astype(jnp.int32)
    vs_f = rlv[:, 5]

    def pick(corner, axis_idx):
        t = tri_st[corner]  # (3, F) — rows are views, selects are free
        return jnp.where(
            axis_idx == 0, t[0], jnp.where(axis_idx == 1, t[1], t[2])
        )

    # reference quirk: normalize by the per-corner-slot max over ALL faces
    mdd = [
        jnp.max(jnp.where(fvalid, jnp.abs(pick(c, ax_f)), -jnp.inf))
        for c in range(3)
    ]
    uc = [
        jnp.clip((us_f * pick(c, ua_f) / mdd[c] + 1.0) * 0.5, 0.0, 1.0)
        for c in range(3)
    ]  # 3 x (F,) — SoA throughout, see docstring
    vc = [
        jnp.clip((vs_f * pick(c, va_f) / mdd[c] + 1.0) * 0.5, 0.0, 1.0)
        for c in range(3)
    ]

    # -- slice rotation (uv_unwrap._rotate_slices) ----------------------
    # per-vertex accumulated tangents from the uv gradient
    du1, dv1 = uc[1] - uc[0], vc[1] - vc[0]
    du2, dv2 = uc[2] - uc[0], vc[2] - vc[0]
    dpos = [
        [tri[1][d] - tri[0][d] for d in range(3)],
        [tri[2][d] - tri[0][d] for d in range(3)],
    ]
    denom_t = jnp.clip(du1 * dv2 - dv1 * du2, 1e-6, None)
    tang = [
        (dpos[0][d] * dv2 - dpos[1][d] * dv1) / denom_t
        for d in range(3)
    ]  # (F,) per axis — NOTE host computes in world coords; here vp coords
    tang = [jnp.where(fvalid, t, 0.0) for t in tang]

    # per-FACE tangents, Gram-Schmidt vs the face normal. (The host path
    # accumulates per-vertex tangents first; for the per-slice rotation
    # AGGREGATE below the face-level estimator is equivalent in practice and
    # skips ~12M scatter updates, the device's slowest op.)
    tlen = jnp.sqrt(sum(t * t for t in tang))
    tv_f = [t / jnp.maximum(tlen, 1e-12) for t in tang]
    ndot = sum(t * c for t, c in zip(tv_f, face_n))
    tv_f = [t - ndot * c for t, c in zip(tv_f, face_n)]
    tlen = jnp.sqrt(sum(t * t for t in tv_f))
    tv_f = [t / jnp.maximum(tlen, 1e-12) for t in tv_f]

    # expected tangent: cross(n, cross(pos_rot, n)) with pos_rot=(-y, x, 0),
    # evaluated per CORNER with the face normal (the per-vertex-normal field
    # needed a third (3, F) corner take; corner raw positions recover
    # linearly from the vp gathers already in hand)
    def expected_tangent(corner):
        praw = [
            (tri[corner][d] + 1.0) * half_rng[d] + bb_min[d] for d in range(3)
        ]
        prx, pry = -praw[1], praw[0]  # pos_rot z component is 0
        nx_, ny_, nz_ = face_n
        cx_ = pry * nz_
        cy_ = -prx * nz_
        cz_ = prx * ny_ - pry * nx_
        ex = ny_ * cz_ - nz_ * cy_
        ey = nz_ * cx_ - nx_ * cz_
        ez = nx_ * cy_ - ny_ * cx_
        elen = jnp.sqrt(ex * ex + ey * ey + ez * ez)
        return [c / jnp.maximum(elen, 1e-12) for c in (ex, ey, ez)]

    e_c = [expected_tangent(c) for c in range(3)]  # [corner][axis] -> (F,)

    # per-slice mean of actual (face-level) / expected (corner-mean) tangents
    def slice_mean(vals):  # (F,) -> (6,)
        outs = []
        for g in range(6):
            m = fvalid & (index == g)
            w = m.astype(jnp.float32)
            outs.append(jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1e-12))
        return jnp.stack(outs)

    am = [slice_mean(t) for t in tv_f]  # 3 x (6,)
    em = [
        slice_mean((e_c[0][d] + e_c[1][d] + e_c[2][d]) / 3.0) for d in range(3)
    ]
    dot = sum(a * e for a, e in zip(am, em))
    cross2 = am[0] * em[1] - am[1] * em[0]
    ang = jnp.arctan2(cross2, dot)  # (6,)
    ca, sa = jnp.cos(ang), jnp.sin(ang)

    casa = onehot6 @ jnp.stack([ca, sa], axis=1)  # (F, 2) exact lookup
    ca_f, sa_f = casa[:, 0], casa[:, 1]
    cu = [c * 2.0 - 1.0 for c in uc]
    cv = [c * 2.0 - 1.0 for c in vc]
    ru = [ca_f * cu[c] - sa_f * cv[c] for c in range(3)]
    rv = [sa_f * cu[c] + ca_f * cv[c] for c in range(3)]

    # per-slice global min/max over BOTH uv components (host: cur.min())
    lo6, hi6 = [], []
    for g in range(6):
        m = fvalid & (index == g)
        lo6.append(
            jnp.min(
                jnp.stack(
                    [jnp.min(jnp.where(m, c, jnp.inf)) for c in ru + rv]
                )
            )
        )
        hi6.append(
            jnp.max(
                jnp.stack(
                    [jnp.max(jnp.where(m, c, -jnp.inf)) for c in ru + rv]
                )
            )
        )
    lohi = onehot6 @ jnp.stack(
        [jnp.stack(lo6), jnp.stack(hi6)], axis=1
    )  # (F, 2) exact lookup
    lo_f, hi_f = lohi[:, 0], lohi[:, 1]
    scale = jnp.maximum(hi_f - lo_f, 1e-12)
    uc = [(ru[c] - lo_f) / scale for c in range(3)]
    vc = [(rv[c] - lo_f) / scale for c in range(3)]

    # -- overlap resolution (2 depth rounds) ----------------------------
    depth = sgn_f * (pick(0, ax_f) + pick(1, ax_f) + pick(2, ax_f)) / 3.0

    vis1, fine1, coarse1, nm1 = _depth_round(
        uc, vc, index, depth, fvalid, pair_caps
    )
    demoted = fvalid & ~vis1
    vis2, fine2, coarse2, nm2 = _depth_round(
        uc, vc, index, depth, demoted, pair_caps
    )
    # atlas byte = index + 6 * visibility class (0 = first round, 1 = second,
    # 2 = individual-square pool): the HOST decodes the axis pick as
    # atlas % 6 instead of re-deriving the face-normal argmax — pool faces
    # (class 2) need their index for the box projection too, and shipping it
    # removes the only cross-implementation fp-tie hazard
    atlas_index = jnp.where(
        vis1, index, jnp.where(vis2, index + 6, index + 12)
    )
    atlas_index = jnp.where(fvalid, atlas_index, 0)

    # -- placement (uv_unwrap._find_slice_offset_and_scale + handlers) --
    off = 1.0 / 3.0
    dupl_off = 1.0 / 6.0
    x_vals = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.float32)
    y_vals = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32)
    block = atlas_index // 6
    # pool faces (class 2) keep their index in atlas % 6 now — their cell
    # offset is the fixed pool quadrant, not a per-slice cell. atlas % 6 ==
    # index by construction, so the onehot6 lookup applies (exact, no gather)
    xyv = onehot6 @ jnp.stack([x_vals, y_vals], axis=1)  # (F, 2)
    xv = jnp.where(atlas_index >= 12, 0.0, xyv[:, 0])
    yv = jnp.where(atlas_index >= 12, 0.0, xyv[:, 1])
    offset_x = jnp.where(
        block == 0, off * xv,
        dupl_off * xv + jnp.minimum(block - 1, 1).astype(jnp.float32) * 0.5,
    )
    offset_y = jnp.where(block == 0, off * yv, dupl_off * yv + off * 2)
    div_x = jnp.where(atlas_index >= 12, 2.0, jnp.where(atlas_index >= 6, 6.0, 3.0))
    div_y = jnp.where(atlas_index >= 12, 3.0, jnp.where(atlas_index >= 6, 6.0, 3.0))

    # overlap slices 6..11: rescale to fill their patch, capped at 2x
    for i in range(6, 12):
        m = fvalid & (atlas_index == i)
        any_m = jnp.any(m)
        ulo = jnp.min(
            jnp.stack([jnp.min(jnp.where(m, c, jnp.inf)) for c in uc])
        )
        uhi = jnp.max(
            jnp.stack([jnp.max(jnp.where(m, c, -jnp.inf)) for c in uc])
        )
        vlo = jnp.min(
            jnp.stack([jnp.min(jnp.where(m, c, jnp.inf)) for c in vc])
        )
        vhi = jnp.max(
            jnp.stack([jnp.max(jnp.where(m, c, -jnp.inf)) for c in vc])
        )
        uc = [
            jnp.where(m & any_m, (c - ulo) / jnp.maximum(uhi - ulo, 0.5), c)
            for c in uc
        ]
        vc = [
            jnp.where(m & any_m, (c - vlo) / jnp.maximum(vhi - vlo, 0.5), c)
            for c in vc
        ]
    pad = island_padding
    uc = [jnp.clip(c * (1 - 2 * pad) + pad, 0.0, 1.0) for c in uc]
    vc = [jnp.clip(c * (1 - 2 * pad) + pad, 0.0, 1.0) for c in vc]

    # individual squares (index >= 12), reference pool layout
    rem = fvalid & (atlas_index >= 12)
    n_rem = jnp.sum(rem.astype(jnp.int32))
    ratio = 0.5 * (1.0 / 3.0)
    mult = jnp.sqrt(jnp.maximum(n_rem.astype(jnp.float32), 1.0) / ratio)
    nw = jnp.ceil(0.5 * mult).astype(jnp.int32)
    nw = jnp.maximum(nw, 1)
    nh = jnp.maximum(-(-n_rem // nw), 1)
    width = 1.0 / nw.astype(jnp.float32)
    height = 1.0 / nh.astype(jnp.float32)
    clip_val = jnp.minimum(width, height) * 1.5

    ulo = jnp.minimum(jnp.minimum(uc[0], uc[1]), uc[2])  # per-face
    uhi = jnp.maximum(jnp.maximum(uc[0], uc[1]), uc[2])
    vlo = jnp.minimum(jnp.minimum(vc[0], vc[1]), vc[2])
    vhi = jnp.maximum(jnp.maximum(vc[0], vc[1]), vc[2])
    nwf = nw.astype(jnp.float32)
    nhf = nh.astype(jnp.float32)
    ids = (jnp.cumsum(rem.astype(jnp.int32)) - 1).astype(jnp.float32)
    col = (ids % nwf) * width
    row = jnp.floor(ids / nwf) * height

    def place(c, lo, hi, cval, nf_, w, cell_off):
        r = (c - lo) / jnp.maximum(hi - lo, cval)
        r = jnp.clip(r * (1 - pad * nf_ * 0.5) + pad * nf_ * 0.25, 0.0, 1.0)
        r = r * w + cell_off
        return jnp.clip(r * (1 - pad) + pad * 0.5, 0.0, 1.0)

    uc = [
        jnp.where(rem, place(c, ulo, uhi, clip_val, nwf, width, col), c)
        for c in uc
    ]
    vc = [
        jnp.where(rem, place(c, vlo, vhi, clip_val, nhf, height, row), c)
        for c in vc
    ]

    rows = []
    for c in range(3):
        fu = uc[c] / div_x + offset_x
        fv = vc[c] / div_y + offset_y
        rows.append(fu)
        rows.append(fv)
    uv6 = jnp.clip(
        jnp.round(jnp.stack(rows) * 65535.0), 0, 65535
    ).astype(jnp.uint16)  # (6, F): rows [u0, v0, u1, v1, u2, v2]

    counters = jnp.stack(
        [fine1 + fine2, coarse1 + coarse2, jnp.maximum(nm1, nm2)]
    )
    angles = jnp.stack([ca, sa]).astype(jnp.float32)  # (2, 6)
    return uv6, atlas_index, counters, angles


_unwrap_jit = jax.jit(
    _unwrap_core, static_argnums=(8, 9),
)


def _load_reconstruct():
    """lib with ``reconstruct_uvs`` (native/uv_reconstruct.cpp), or None
    (pure-numpy fallback below — the tested reference implementation)."""
    from sculptmate_tpu.geometry.native import load_native

    return load_native("uv_reconstruct")


def reconstruct_uvs_host(
    rp: np.ndarray,
    faces: np.ndarray,
    atlas_index: np.ndarray,
    ca6: np.ndarray,
    sa6: np.ndarray,
    island_padding: float,
) -> np.ndarray:
    """Rebuild the per-corner atlas UVs from the compact unwrap wire.

    Numpy mirror of ``_unwrap_core``'s uv math (same op order, f32
    throughout): the face's axis pick AND visibility class arrive as
    ``atlas_index`` (``index = atlas % 6``, class = ``atlas // 6`` — the
    host re-derives NOTHING normal-dependent) and the two order-dependent
    tangent-mean reductions as ``ca6``/``sa6``; every other reduction is a
    min/max, which numpy reproduces exactly from the same inputs. ``rp``
    must be the DEQUANTIZED (Nv, 3) rotated positions — bit-identical f32
    values to what the device program decoded from the u16 upload — so the
    reconstruction lands within ~1 ulp-chain of the device's pre-quantized
    uvs (far below both the wire's former u16 quantization step 1/65535 and
    a 512^2 bake texel). Returns (F, 3, 2) float32.
    """
    rp = np.asarray(rp, np.float32)
    faces = np.asarray(faces)
    atlas_index = np.asarray(atlas_index, np.int32)
    F = len(faces)
    if F == 0:
        return np.zeros((0, 3, 2), np.float32)

    lib = _load_reconstruct()
    if lib is not None:
        import ctypes

        out = np.empty((F, 3, 2), np.float32)
        rp_c = np.ascontiguousarray(rp, np.float32)
        f_c = np.ascontiguousarray(faces, np.int32)
        a_c = np.ascontiguousarray(atlas_index, np.uint8)
        ca_c = np.ascontiguousarray(ca6, np.float32)
        sa_c = np.ascontiguousarray(sa6, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.reconstruct_uvs(
            rp_c.ctypes.data_as(fp),
            f_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ca_c.ctypes.data_as(fp),
            sa_c.ctypes.data_as(fp),
            ctypes.c_int64(len(rp_c)),
            ctypes.c_int64(F),
            ctypes.c_float(island_padding),
            out.ctypes.data_as(fp),
        )
        return out
    return reconstruct_uvs_numpy(
        rp, faces, atlas_index, ca6, sa6, island_padding
    )


def reconstruct_uvs_numpy(
    rp, faces, atlas_index, ca6, sa6, island_padding
):
    """Pure-numpy reference for ``reconstruct_uvs_host`` (tests compare the
    native kernel against this)."""
    F = len(faces)
    one = np.float32(1.0)
    half = np.float32(0.5)

    # -- box assignment (mirrors _unwrap_core) ---------------------------
    bb_min = rp.min(axis=0)
    bb_max = rp.max(axis=0)
    rngs = np.maximum(bb_max - bb_min, np.float32(1e-12))
    vp = np.float32(2.0) * (rp - bb_min) / rngs - one  # (Nv, 3)

    tri = vp[faces]  # (F, 3corner, 3axis)
    # the axis pick rides the wire (atlas % 6) — nothing normal-dependent
    # is recomputed here
    index = (atlas_index % 6).astype(np.int32)

    rules = np.asarray(_FACE_RULES, np.int32)
    ax_f = rules[index, 0]
    ua_f = rules[index, 2]
    us_f = rules[index, 3].astype(np.float32)
    va_f = rules[index, 4]
    vs_f = rules[index, 5].astype(np.float32)

    ar = np.arange(F)

    def pick(corner, axis_idx):
        return tri[ar, corner, axis_idx]

    mdd = [np.abs(pick(c, ax_f)).max() for c in range(3)]
    uc = [
        np.clip((us_f * pick(c, ua_f) / mdd[c] + one) * half, 0.0, 1.0)
        for c in range(3)
    ]
    vc = [
        np.clip((vs_f * pick(c, va_f) / mdd[c] + one) * half, 0.0, 1.0)
        for c in range(3)
    ]

    # -- slice rotation with the device's shipped angles -----------------
    idx6 = np.clip(index, 0, 5)
    ca_f = np.asarray(ca6, np.float32)[idx6]
    sa_f = np.asarray(sa6, np.float32)[idx6]
    cu = [c * np.float32(2.0) - one for c in uc]
    cv = [c * np.float32(2.0) - one for c in vc]
    ru = [ca_f * cu[c] - sa_f * cv[c] for c in range(3)]
    rv = [sa_f * cu[c] + ca_f * cv[c] for c in range(3)]

    lo6, hi6 = [], []
    for g in range(6):
        m = index == g
        vals = [np.where(m, c, np.float32(np.inf)) for c in ru + rv]
        lo6.append(np.min([v.min() for v in vals]))
        vals = [np.where(m, c, np.float32(-np.inf)) for c in ru + rv]
        hi6.append(np.max([v.max() for v in vals]))
    lo_f = np.asarray(lo6, np.float32)[idx6]
    hi_f = np.asarray(hi6, np.float32)[idx6]
    scale = np.maximum(hi_f - lo_f, np.float32(1e-12))
    uc = [(ru[c] - lo_f) / scale for c in range(3)]
    vc = [(rv[c] - lo_f) / scale for c in range(3)]

    # -- placement (atlas_index from the wire) ---------------------------
    off = np.float32(1.0 / 3.0)
    dupl_off = np.float32(1.0 / 6.0)
    x_vals = np.asarray([0, 1, 2, 0, 1, 2], np.float32)
    y_vals = np.asarray([0, 0, 0, 1, 1, 1], np.float32)
    block = atlas_index // 6
    xv = np.where(atlas_index >= 12, np.float32(0.0), x_vals[atlas_index % 6])
    yv = np.where(atlas_index >= 12, np.float32(0.0), y_vals[atlas_index % 6])
    offset_x = np.where(
        block == 0, off * xv,
        dupl_off * xv + np.minimum(block - 1, 1).astype(np.float32) * np.float32(0.5),
    ).astype(np.float32)
    offset_y = np.where(block == 0, off * yv, dupl_off * yv + off * 2).astype(
        np.float32
    )
    div_x = np.where(
        atlas_index >= 12, 2.0, np.where(atlas_index >= 6, 6.0, 3.0)
    ).astype(np.float32)
    div_y = np.where(
        atlas_index >= 12, 3.0, np.where(atlas_index >= 6, 6.0, 3.0)
    ).astype(np.float32)

    for i in range(6, 12):
        m = atlas_index == i
        any_m = m.any()
        ulo = np.min([np.where(m, c, np.float32(np.inf)).min() for c in uc])
        uhi = np.max([np.where(m, c, np.float32(-np.inf)).max() for c in uc])
        vlo = np.min([np.where(m, c, np.float32(np.inf)).min() for c in vc])
        vhi = np.max([np.where(m, c, np.float32(-np.inf)).max() for c in vc])
        uc = [
            np.where(
                m & any_m, (c - ulo) / np.maximum(uhi - ulo, np.float32(0.5)), c
            ).astype(np.float32)
            for c in uc
        ]
        vc = [
            np.where(
                m & any_m, (c - vlo) / np.maximum(vhi - vlo, np.float32(0.5)), c
            ).astype(np.float32)
            for c in vc
        ]
    pad = np.float32(island_padding)
    uc = [np.clip(c * (one - 2 * pad) + pad, 0.0, 1.0) for c in uc]
    vc = [np.clip(c * (one - 2 * pad) + pad, 0.0, 1.0) for c in vc]

    rem = atlas_index >= 12
    n_rem = int(rem.sum())
    ratio = 0.5 * (1.0 / 3.0)
    mult = np.sqrt(np.float32(max(n_rem, 1)) / np.float32(ratio))
    nw = max(int(np.ceil(np.float32(0.5) * mult)), 1)
    nh = max(-(-n_rem // nw), 1)
    width = np.float32(1.0) / np.float32(nw)
    height = np.float32(1.0) / np.float32(nh)
    clip_val = np.minimum(width, height) * np.float32(1.5)

    ulo = np.minimum(np.minimum(uc[0], uc[1]), uc[2])
    uhi = np.maximum(np.maximum(uc[0], uc[1]), uc[2])
    vlo = np.minimum(np.minimum(vc[0], vc[1]), vc[2])
    vhi = np.maximum(np.maximum(vc[0], vc[1]), vc[2])
    nwf = np.float32(nw)
    nhf = np.float32(nh)
    ids = (np.cumsum(rem.astype(np.int32)) - 1).astype(np.float32)
    col = (ids % nwf) * width
    row = np.floor(ids / nwf) * height

    def place(c, lo, hi, cval, nf_, w, cell_off):
        r = (c - lo) / np.maximum(hi - lo, cval)
        r = np.clip(r * (one - pad * nf_ * half) + pad * nf_ * np.float32(0.25), 0.0, 1.0)
        r = r * w + cell_off
        return np.clip(r * (one - pad) + pad * half, 0.0, 1.0)

    uc = [
        np.where(rem, place(c, ulo, uhi, clip_val, nwf, width, col), c)
        for c in uc
    ]
    vc = [
        np.where(rem, place(c, vlo, vhi, clip_val, nhf, height, row), c)
        for c in vc
    ]

    out = np.empty((F, 3, 2), np.float32)
    for c in range(3):
        out[:, c, 0] = uc[c] / div_x + offset_x
        out[:, c, 1] = vc[c] / div_y + offset_y
    return out


def _bucket(n: int, lo: int = 4096) -> int:
    from sculptmate_tpu.ops import size_bucket

    return size_bucket(n, lo)


def unwrap_device(
    v_pos: np.ndarray,
    faces: np.ndarray,
    island_padding: float = 0.02,
    return_flat: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device unwrap. Same contract as ``uv_unwrap.unwrap`` (which also
    takes vertex normals — the device path derives geometric face normals
    from the positions instead, see ``_unwrap_core``): returns
    (unique_uv (U, 2) f32, vtex_idx (F, 3)).

    ``return_flat=True`` skips the UV dedup (a 3F-element host sort, the
    slowest remaining host step) and returns the per-corner UVs directly as
    (F, 3, 2) f32 — what ``Mesh.unwrap_uv`` actually consumes."""
    from sculptmate_tpu.geometry.texture_bake import (
        _PAIR2_CHUNK,
        _PAIR_CHUNK,
    )

    v_pos = np.asarray(v_pos, np.float32)
    faces = np.asarray(faces, np.int64)

    # host: PCA rotation only (3x3), applied before upload
    from sculptmate_tpu.geometry.uv_unwrap import _main_axis_rotation

    v_pos = v_pos @ _main_axis_rotation(v_pos).T

    Nv, F = len(v_pos), len(faces)
    nb, fb_ = _bucket(Nv), _bucket(F)
    pos = np.zeros((3, nb), np.float32)
    pos[:, :Nv] = v_pos.T
    pos[:, Nv:] = v_pos[0][:, None] if Nv else 0.0
    fcomp = np.zeros((3, fb_), np.int32)
    fcomp[:, :F] = faces.T

    pair_cap = 1 << max(16, int(4 * fb_ - 1).bit_length())
    pair2_cap = default_pair2_capacity(RASTER_RES)
    multi_cap = default_multi_capacity(pair_cap)

    while True:
        uv_q, atlas_index, counters, _angles = _unwrap_jit(
            *(jnp.asarray(pos[c]) for c in range(3)),
            jnp.asarray(fcomp[0]), jnp.asarray(fcomp[1]), jnp.asarray(fcomp[2]),
            Nv, F, float(island_padding),
            (pair_cap, pair2_cap, multi_cap),
        )
        fine, coarse, nmulti = (int(x) for x in np.asarray(counters))
        if fine <= pair_cap and coarse <= pair2_cap and nmulti <= multi_cap:
            break
        # capacity overflow: retry, never truncate
        if fine > pair_cap:
            pair_cap = -(-2 * max(pair_cap, fine) // _PAIR_CHUNK) * _PAIR_CHUNK
        if coarse > pair2_cap:
            pair2_cap = (
                -(-2 * max(pair2_cap, coarse) // _PAIR2_CHUNK) * _PAIR2_CHUNK
            )
        if nmulti > multi_cap:
            multi_cap = 2 * max(multi_cap, nmulti)

    # ONE compact (6, Fb) u16 download; host reassembles (F, 3, 2)
    uv16 = np.ascontiguousarray(np.asarray(uv_q).T.reshape(-1, 3, 2)[:F])
    if return_flat:
        return uv16.astype(np.float32) / 65535.0, None
    if F == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 3), np.int64)
    flat = uv16.reshape(-1, 2).astype(np.uint32)
    packed = (flat[:, 0] << np.uint32(16)) | flat[:, 1]
    order = np.argsort(packed, kind="stable")
    sp = packed[order]
    new = np.empty(len(sp), bool)
    new[0] = True
    np.not_equal(sp[1:], sp[:-1], out=new[1:])
    gid = np.cumsum(new) - 1
    unique_idx = np.empty(len(sp), np.int64)
    unique_idx[order] = gid
    unique_uv = (uv16.reshape(-1, 2)[order[new]].astype(np.float32)) / 65535.0
    return unique_uv, unique_idx.reshape(-1, 3)
