"""Device marching tetrahedra with learned vertex deformation, SoA layout.

TPU-native counterpart of the reference's ``MarchingTetrahedraHelper``
(``sf3d/models/isosurface.py:24-229``): same math — sign-change edges emit one
vertex each at the sdf-weighted interpolation of the two (deformed) endpoints,
per-tet 4-bit cases emit 1-2 triangles — but on the regular Freudenthal
lattice (``mt_tables.py``) so edge identification is arithmetic (7 dense edge
grids + cumsum) instead of ``torch.unique`` over a tet soup.

Deformation follows ``normalize_grid_deformation``
(``isosurface.py:106-113``): lattice vertex v moves by (1/res) * tanh(offset).

Everything is flat (N,) structure-of-arrays — see marching_cubes.py for why
(N, 3) arrays are catastrophic under TPU tiled layouts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.geometry.mt_tables import EDGE_DIRS, build_tet_tables


class MTResult(NamedTuple):
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    fa: jnp.ndarray
    fb: jnp.ndarray
    fc: jnp.ndarray
    num_verts: jnp.ndarray
    num_faces: jnp.ndarray


def lattice_size(resolution: int) -> int:
    """Number of lattice points per axis: resolution cubes -> res+1 points."""
    return resolution + 1


def marching_tets(
    sdf: jnp.ndarray,
    deform_x: Optional[jnp.ndarray],
    deform_y: Optional[jnp.ndarray],
    deform_z: Optional[jnp.ndarray],
    resolution: int,
    max_verts: int,
    max_faces: int,
) -> MTResult:
    """sdf: flat (N^3,) over the (res+1)^3 lattice (x-major: lin = (i*N+j)*N+k);
    deform_*: optional flat (N^3,) raw offsets (tanh-normalized here).
    Vertices returned in [0, 1]^3 lattice coordinate space.
    """
    N = lattice_size(resolution)
    n3 = N * N * N
    assert sdf.shape == (n3,)

    edge_class_np, edge_anchor_np, tri_table_np, tri_count_np, _ = build_tet_tables()

    occ = sdf > 0

    # deformed lattice positions (flat per component, unit [0,1] coords)
    idx = jnp.arange(n3, dtype=jnp.int32)
    li = (idx // (N * N)).astype(jnp.float32)
    lj = ((idx // N) % N).astype(jnp.float32)
    lk = (idx % N).astype(jnp.float32)
    scale = 1.0 / resolution  # half-tet-size normalization (isosurface.py:106)
    px = li / resolution
    py = lj / resolution
    pz = lk / resolution
    if deform_x is not None:
        px = px + scale * jnp.tanh(deform_x)
        py = py + scale * jnp.tanh(deform_y)
        pz = pz + scale * jnp.tanh(deform_z)

    # -- cut masks for the 7 edge classes --------------------------------
    occ3 = occ.reshape(N, N, N)

    def cut_mask(d: int) -> jnp.ndarray:
        dx, dy, dz = (int(v) for v in EDGE_DIRS[d])
        m = jnp.zeros((N, N, N), bool)
        a = occ3[: N - dx or N, : N - dy or N, : N - dz or N]
        b = occ3[dx:, dy:, dz:]
        return m.at[: N - dx or N, : N - dy or N, : N - dz or N].set(a != b).ravel()

    masks = [cut_mask(d) for d in range(7)]
    mask_flat = jnp.concatenate(masks)  # (7 * N^3,)

    vid = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    num_verts = vid[-1] + 1

    (edge_idx,) = jnp.nonzero(mask_flat, size=max_verts, fill_value=7 * n3)
    valid_v = edge_idx < 7 * n3
    safe = jnp.where(valid_v, edge_idx, 0)
    dcls = safe // n3
    lin = safe % n3

    dir_step = jnp.asarray(
        (EDGE_DIRS[:, 0] * N + EDGE_DIRS[:, 1]) * N + EDGE_DIRS[:, 2], jnp.int32
    )
    lin2 = jnp.minimum(lin + dir_step[dcls], n3 - 1)

    s0 = sdf[lin]
    s1 = sdf[lin2]
    denom = s0 - s1
    t = s0 / jnp.where(denom == 0, 1.0, denom)
    t = jnp.clip(t, 0.0, 1.0)

    vx = jnp.where(valid_v, px[lin] + t * (px[lin2] - px[lin]), 0.0)
    vy = jnp.where(valid_v, py[lin] + t * (py[lin2] - py[lin]), 0.0)
    vz = jnp.where(valid_v, pz[lin] + t * (pz[lin2] - pz[lin]), 0.0)

    # -- triangles --------------------------------------------------------
    Rc = N - 1  # cubes per axis == resolution
    nc = Rc * Rc * Rc

    # per-cube per-tet 4-bit case: occupancy of the tet's 4 corners
    tet_corners = build_tet_tables()[4]
    cases = []
    for tnum in range(6):
        tc = tet_corners[tnum]  # (4, 3) corner offsets
        case_t = jnp.zeros((Rc, Rc, Rc), jnp.int32)
        for vbit in range(4):
            ox, oy, oz = (int(v) for v in tc[vbit])
            occ_c = occ3[ox : ox + Rc, oy : oy + Rc, oz : oz + Rc].astype(jnp.int32)
            case_t = case_t + (occ_c << vbit)
        cases.append(case_t.ravel())
    case_all = jnp.stack(cases, axis=1).reshape(-1)  # (nc*6,) cube-major, tet-minor

    tri_count = jnp.asarray(tri_count_np.reshape(-1))  # (6*16,)
    ntri = tri_count[
        (jnp.arange(nc * 6, dtype=jnp.int32) % 6) * 16 + case_all
    ]  # (nc*6,)
    slot_mask = (
        jnp.arange(2, dtype=jnp.int32)[None, :] < ntri[:, None]
    ).ravel()  # (nc*6*2,)
    num_faces = jnp.sum(slot_mask.astype(jnp.int32))

    (tri_idx,) = jnp.nonzero(slot_mask, size=max_faces, fill_value=slot_mask.size)
    valid_f = tri_idx < slot_mask.size
    st = jnp.where(valid_f, tri_idx, 0)
    slot = st % 2
    tet = (st // 2) % 6
    cube = st // 12
    ci = cube // (Rc * Rc)
    cj = (cube // Rc) % Rc
    ck = cube % Rc
    case_f = case_all[jnp.where(valid_f, tri_idx // 2, 0)]

    # per-corner flattened tables indexed by tet*16*2*3 + case*2*3 + slot*3 + corner
    tri_flat = jnp.asarray(tri_table_np.reshape(-1))
    edge_class = jnp.asarray(edge_class_np)  # (6, 6)
    edge_anchor = [jnp.asarray(edge_anchor_np[:, :, d]) for d in range(3)]  # (6,6) each

    def face_corner(c: int) -> jnp.ndarray:
        slot_edge = tri_flat[((tet * 16 + case_f) * 2 + slot) * 3 + c]
        se = jnp.maximum(slot_edge, 0)
        dc = edge_class[tet, se]
        ax = ci + edge_anchor[0][tet, se]
        ay = cj + edge_anchor[1][tet, se]
        az = ck + edge_anchor[2][tet, se]
        gedge = dc * n3 + (ax * N + ay) * N + az
        return jnp.where(valid_f, vid[gedge], 0).astype(jnp.int32)

    fa, fb, fc = face_corner(0), face_corner(1), face_corner(2)

    return MTResult(vx, vy, vz, fa, fb, fc, num_verts, num_faces)


def marching_tets_host(
    sdf: np.ndarray,
    deform: Optional[np.ndarray],
    resolution: int,
    max_verts: int = 0,
    max_faces: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: sdf (N^3,), deform (N^3, 3) or None. Returns verts in
    [0,1] and faces, sliced to true counts."""
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

    mt_jit = jax.jit(marching_tets, static_argnums=(4, 5, 6))
    while True:
        res = mt_jit(jnp.asarray(sdf), dx, dy, dz, resolution, max_verts, max_faces)
        nv, nf = int(res.num_verts), int(res.num_faces)
        if nv <= max_verts and nf <= max_faces:
            break
        max_verts = max(2 * max_verts, nv)
        max_faces = max(2 * max_faces, nf)

    verts = np.stack(
        [np.asarray(res.vx[:nv]), np.asarray(res.vy[:nv]), np.asarray(res.vz[:nv])], -1
    )
    faces = np.stack(
        [np.asarray(res.fa[:nf]), np.asarray(res.fb[:nf]), np.asarray(res.fc[:nf])], -1
    )
    return verts, faces
