"""Device marching cubes with fixed-capacity outputs.

Replaces the reference's host skimage path (``tsr/models/isosurface.py:41-54``,
GPU->CPU roundtrip of the full 256^3 grid) with an on-device XLA program:

- every lattice edge with a sign change of ``level`` emits exactly one vertex
  (linear interpolation along the edge) — vertex existence is a vectorized
  sign test over three (R,R,R) edge grids, compacted with size-bounded
  ``jnp.nonzero``;
- vertex ids come from a cumsum over the cut mask;
- each cell looks its 8-bit corner-sign case up in the generated tables
  (``mc_tables.py``) and emits up to ``maxtri`` triangles whose local edge
  ids are converted to global edge ids arithmetically (no neighbor walks).

TPU layout note: every large intermediate is a flat (N,) array — structure of
arrays, one per vertex/triangle component. TPU tiles the last two dims to
(8, 128), so a (N, 3) int32 array is physically padded to (N, 128): 42x the
memory. The first version shipped that way and a 256^3 extraction tried to
allocate 18.4 GB; SoA brings it to the expected few hundred MB.

Outputs are fixed-capacity (``max_verts`` / ``max_faces``) with counts, so the
whole thing jits with static shapes; ``marching_cubes_host`` slices to the
true sizes on the host. Capacity overflow is reported, not silently truncated.

Conventions: ``level > 0`` is inside; vertices are in lattice index coords
(divide by R-1 for the reference's [0, 1] range); faces are wound so normals
point away from the inside (toward decreasing level).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.geometry.mc_tables import EDGE_AXIS, EDGE_OFFSET, build_tables


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

    @property
    def verts(self):
        return jnp.stack([self.vx, self.vy, self.vz], axis=-1)

    @property
    def faces(self):
        return jnp.stack([self.fa, self.fb, self.fc], axis=-1)


def marching_cubes(level: jnp.ndarray, max_verts: int, max_faces: int) -> MCResult:
    """level: (R, R, R) float32. Jittable, static output shapes."""
    R = level.shape[0]
    n3 = R * R * R
    tri_table_np, tri_count_np, maxtri = build_tables()
    # per-corner tables: (256 * maxtri,) each, indexed by case * maxtri + slot
    corner_tables = [
        jnp.asarray(tri_table_np[:, :, c].reshape(-1)) for c in range(3)
    ]
    tri_count = jnp.asarray(tri_count_np)
    edge_axis = jnp.asarray(EDGE_AXIS)
    edge_off = [jnp.asarray(EDGE_OFFSET[:, d]) for d in range(3)]

    inside = level > 0

    # -- cut-edge masks (flat, one per axis) ------------------------------
    def cut_mask(axis: int) -> jnp.ndarray:
        m = jnp.zeros((R, R, R), bool)
        if axis == 0:
            m = m.at[: R - 1].set(inside[:-1] != inside[1:])
        elif axis == 1:
            m = m.at[:, : R - 1].set(inside[:, :-1] != inside[:, 1:])
        else:
            m = m.at[:, :, : R - 1].set(inside[:, :, :-1] != inside[:, :, 1:])
        return m.ravel()

    mask_flat = jnp.concatenate([cut_mask(0), cut_mask(1), cut_mask(2)])

    # -- vertices ---------------------------------------------------------
    vid = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    num_verts = vid[-1] + 1

    (edge_idx,) = jnp.nonzero(mask_flat, size=max_verts, fill_value=3 * n3)
    valid_v = edge_idx < 3 * n3
    safe_idx = jnp.where(valid_v, edge_idx, 0)
    axis = safe_idx // n3
    lin = safe_idx % n3
    i = lin // (R * R)
    j = (lin // R) % R
    k = lin % R

    level_flat = level.ravel()
    l0 = level_flat[lin]
    step = jnp.where(axis == 0, R * R, jnp.where(axis == 1, R, 1))
    l1 = level_flat[jnp.minimum(lin + step, n3 - 1)]
    denom = l0 - l1
    t = l0 / jnp.where(denom == 0, 1.0, denom)
    t = jnp.clip(t, 0.0, 1.0)

    fi = i.astype(jnp.float32)
    fj = j.astype(jnp.float32)
    fk = k.astype(jnp.float32)
    vx = jnp.where(valid_v, fi + t * (axis == 0), 0.0)
    vy = jnp.where(valid_v, fj + t * (axis == 1), 0.0)
    vz = jnp.where(valid_v, fk + t * (axis == 2), 0.0)

    # -- faces ------------------------------------------------------------
    Rc = R - 1
    ins = inside.astype(jnp.int32)
    case = jnp.zeros((Rc, Rc, Rc), jnp.int32)
    for c in range(8):
        ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        case = case + (ins[ox : ox + Rc, oy : oy + Rc, oz : oz + Rc] << c)
    case_flat = case.ravel()

    ntri = tri_count[case_flat]
    slot_ids = jnp.arange(maxtri, dtype=jnp.int32)
    slot_mask = (slot_ids[None, :] < ntri[:, None]).ravel()
    num_faces = jnp.sum(slot_mask.astype(jnp.int32))

    (tri_idx,) = jnp.nonzero(slot_mask, size=max_faces, fill_value=slot_mask.size)
    valid_f = tri_idx < slot_mask.size
    safe_tri = jnp.where(valid_f, tri_idx, 0)
    cell = safe_tri // maxtri
    slot = safe_tri % maxtri

    ci = cell // (Rc * Rc)
    cj = (cell // Rc) % Rc
    ck = cell % Rc
    tkey = case_flat[cell] * maxtri + slot  # (max_faces,)

    def face_corner(c: int) -> jnp.ndarray:
        le = jnp.maximum(corner_tables[c][tkey], 0)  # local edge id 0..11
        ax = edge_axis[le]
        gi = ci + edge_off[0][le]
        gj = cj + edge_off[1][le]
        gk = ck + edge_off[2][le]
        gedge = ax * n3 + (gi * R + gj) * R + gk
        return jnp.where(valid_f, vid[gedge], 0).astype(jnp.int32)

    fa, fb, fc = face_corner(0), face_corner(1), face_corner(2)

    return MCResult(vx, vy, vz, fa, fb, fc, num_verts, num_faces)


def marching_cubes_host(
    level, max_verts: int = 0, max_faces: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: run on device, slice to true counts on host.

    Default capacities scale with the expected O(R^2) surface size; if the
    surface overflows, the call retries with doubled capacity.
    """
    import jax

    R = int(level.shape[0])
    if max_verts <= 0:
        max_verts = 32 * R * R
    if max_faces <= 0:
        max_faces = 64 * R * R

    mc_jit = jax.jit(marching_cubes, static_argnums=(1, 2))
    while True:
        res = mc_jit(level, max_verts, max_faces)
        nv = int(res.num_verts)
        nf = int(res.num_faces)
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
