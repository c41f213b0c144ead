"""Fused triplane NeRF density-grid evaluation.

Replaces the reference's hot loop #2 — 2 048 serial 8 192-point chunks of
``grid_sample`` + 10-layer MLP over the 256^3 marching-cubes lattice
(``tsr/utils.py:152-216``, ``tsr/models/nerf_renderer.py:41-91``) — with a
single XLA program built around two TPU-first observations:

1. **The lattice is separable.** Sampling plane p at every lattice point only
   ever uses R distinct coordinates per axis, so the bilinear gather becomes
   two tiny dense interpolation matmuls per plane
   (``ops/grid_sample.py:sample_triplane_regular_grid``). Zero gathers.

2. **The first MLP layer factorizes.** With features
   f(i,j,k) = concat(Fxy[j,i], Fxz[k,i], Fyz[k,j]), the first linear layer
   splits as W1 = [W1a; W1b; W1c] and

       h1[i,j,k] = (Fxy W1a)[i,j] + (Fxz W1b)[i,k] + (Fyz W1c)[j,k] + b1

   i.e. three R^2 x 40 x 64 matmuls + a broadcast add, instead of an
   R^3 x 120 x 64 matmul. The remaining 9 hidden layers run as batched
   64x64 matmuls over z-slabs via ``lax.map`` (static trip count).

The arbitrary-point path (``query_triplane_points``) keeps the reference's
gather semantics for mesh-vertex color queries.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.activations import get_activation
from sculptmate_tpu.ops.grid_sample import sample_triplane, sample_triplane_regular_grid


def mlp_weights_from_params(params: Dict) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Extract [(kernel, bias), ...] in layer order from an MLPStack param tree."""
    layers = params
    n_hidden = sum(1 for k in layers if k.startswith("dense_") and k != "dense_out")
    order = [f"dense_{i}" for i in range(n_hidden)] + ["dense_out"]
    return [(layers[k]["kernel"], layers[k]["bias"]) for k in order]


@dataclasses.dataclass(frozen=True)
class DensityGridSpec:
    resolution: int = 256
    radius: float = 0.87
    density_activation: str = "exp"
    density_bias: float = -1.0
    activation: str = "silu"
    align_corners: bool = False
    slab: int = 8  # z-slices evaluated per lax.map step
    compute_dtype: jnp.dtype = jnp.float32


def lattice_coords(resolution: int) -> jnp.ndarray:
    """Normalized [-1, 1] coords of the reference MC lattice.

    grid_vertices are linspace(0, 1, R) (``tsr/models/isosurface.py:26-39``),
    scaled to (-radius, radius) then divided by radius inside query_triplane —
    the radius cancels: g_i = 2 i/(R-1) - 1.
    """
    return 2.0 * jnp.arange(resolution, dtype=jnp.float32) / (resolution - 1) - 1.0


def _run_hidden(h, weights, act, compute_dtype):
    """Apply hidden layers 1..n-1 and the output layer to (..., 64) input."""
    for W, b in weights[1:-1]:
        h = act(h @ W.astype(compute_dtype) + b.astype(compute_dtype))
    W, b = weights[-1]
    return h @ W.astype(compute_dtype) + b.astype(compute_dtype)


def _blockdiag(mats: List[jnp.ndarray]) -> jnp.ndarray:
    """Stack matrices on the diagonal: [(m_i, n_i)] -> (sum m, sum n)."""
    rows = []
    n_total = sum(m.shape[1] for m in mats)
    col = 0
    for m in mats:
        left = jnp.zeros((m.shape[0], col), m.dtype)
        right = jnp.zeros((m.shape[0], n_total - col - m.shape[1]), m.dtype)
        rows.append(jnp.concatenate([left, m, right], axis=1))
        col += m.shape[1]
    return jnp.concatenate(rows, axis=0)


def _pack_weights(weight_lists: List[List[Tuple[jnp.ndarray, jnp.ndarray]]]):
    """Pack N equal-depth MLPs into ONE whose hidden/output layers are
    block-diagonal and whose first layer is a plain column concat.

    Why: the 64-neuron NeRF/Material MLPs drive at most (64/128)^2 = 25% of
    the 128x128 MXU (measured 25.5% on v5e — the roofline's "shape
    ceiling"). Running two independent 64-wide streams through one 128-wide
    block-diagonal matmul fills the array: half the MACs multiply structural
    zeros, but the tile issues at full rate, so useful throughput doubles
    (~50% MFU ceiling). The first layer concatenates along the OUTPUT axis
    only (all streams read the same input features), which is dense — no
    waste there. Activations are elementwise, so channels never mix across
    the diagonal blocks and the packed MLP is bit-identical in f32 (same
    adds/mults, plus additions of exact zeros).

    Returns (packed [(W, b)] list, [(out_offset, out_width)] per input MLP).
    Callers slice the packed output back apart. All lists must share depth;
    widths may differ per layer.
    """
    depth = len(weight_lists[0])
    assert all(len(w) == depth for w in weight_lists)
    packed = []
    for layer in range(depth):
        Ws = [w[layer][0] for w in weight_lists]
        bs = [w[layer][1] for w in weight_lists]
        if layer == 0:
            W = jnp.concatenate(Ws, axis=1)
        else:
            W = _blockdiag(Ws)
        packed.append((W, jnp.concatenate(bs)))
    offs = []
    off = 0
    for w in weight_lists:
        k = w[-1][0].shape[1]
        offs.append((off, k))
        off += k
    return packed, offs


def query_density_grid(
    triplane: jnp.ndarray,
    weights: List[Tuple[jnp.ndarray, jnp.ndarray]],
    spec: DensityGridSpec,
    x_coords: jnp.ndarray = None,
) -> jnp.ndarray:
    """Evaluate activated density on the full R^3 lattice.

    triplane: (3, C, H, W). Returns (R, R, R) float32, indexed [x, y, z] to
    match the reference's ``verts.reshape(R, R, R)`` ordering
    (meshgrid indexing="ij", x outermost).

    ``x_coords``: optional normalized [-1,1] coords replacing the full
    lattice along x — evaluates an (len(x_coords), R, R) x-slab, the
    building block of the grid-axis-sharded (SP) extraction
    (``parallel/farm.py:sharded_extract``).
    """
    R = spec.resolution
    cd = spec.compute_dtype
    act = get_activation(spec.activation)
    density_act = get_activation(spec.density_activation)

    coords = lattice_coords(R)
    cx = coords if x_coords is None else x_coords
    RX = cx.shape[0]
    Fxy, Fxz, Fyz = sample_triplane_regular_grid(
        triplane, cx, coords, coords, spec.align_corners
    )  # (C, Nv, Nu): Fxy[c, j, i], Fxz[c, k, i], Fyz[c, k, j]

    W1, b1 = weights[0]
    C = triplane.shape[1]
    W1a, W1b, W1c = W1[:C], W1[C : 2 * C], W1[2 * C :]

    # First-layer partial sums, laid out for z-slab streaming.
    A = jnp.einsum("cji,cn->ijn", Fxy.astype(cd), W1a.astype(cd))  # (R_i, R_j, 64)
    Bm = jnp.einsum("cki,cn->kin", Fxz.astype(cd), W1b.astype(cd))  # (R_k, R_i, 64)
    Cm = jnp.einsum("ckj,cn->kjn", Fyz.astype(cd), W1c.astype(cd))  # (R_k, R_j, 64)
    A = A + b1.astype(cd)

    slab = spec.slab
    assert R % slab == 0, f"resolution {R} must be divisible by slab {slab}"
    nslab = R // slab
    K = weights[-1][0].shape[1]

    if slab % 2 == 0 and len(weights) >= 3:
        # MXU shape-ceiling fix: run TWO z-slabs as one 128-wide stream
        # through block-diagonal hidden/output layers (see _pack_weights) —
        # the 64-wide MLP alone caps at 25% MXU; packed pairs reach ~50%.
        # The paired slab is HALVED so the per-map-step activation tensor
        # keeps the unpaired footprint (a full-width (slab, R, R, 128)
        # intermediate spills VMEM and turned the win into a 35% loss).
        slab = slab // 2
        nslab = R // slab
        H = A.shape[-1]
        packed, _ = _pack_weights([weights, weights])
        A2 = jnp.concatenate([A, A], axis=-1)  # z-independent term
        pair = lambda M, n: (
            M.reshape(nslab // 2, 2, slab, n, H)
            .transpose(0, 2, 3, 1, 4)
            .reshape(nslab // 2, slab, n, 2 * H)
        )
        Bp, Cp = pair(Bm, RX), pair(Cm, R)

        def do_pair(args):
            b_s, c_s = args  # (slab, RX, 128) / (slab, R, 128)
            h = act(A2[None] + b_s[:, :, None, :] + c_s[:, None, :, :])
            out = _run_hidden(h, packed, act, cd)  # (slab, RX, R, 2K)
            return (
                out[..., 0].astype(jnp.float32),
                out[..., K].astype(jnp.float32),
            )

        d0, d1 = jax.lax.map(do_pair, (Bp, Cp))
        dens = jnp.stack([d0, d1], axis=1).reshape(R, RX, R)  # [z, x, y]
    else:
        Bm = Bm.reshape(nslab, slab, RX, -1)
        Cm = Cm.reshape(nslab, slab, R, -1)

        def do_slab(args):
            b_s, c_s = args  # (slab, RX, 64) / (slab, R, 64)
            # h1[i, j, z] = A[i, j] + b_s[z, i] + c_s[z, j]
            h = (
                A[None, :, :, :]
                + b_s[:, :, None, :]
                + c_s[:, None, :, :]
            )  # (slab, R_i, R_j, 64)
            h = act(h)
            out = _run_hidden(h, weights, act, cd)  # (slab, R, R, 4)
            return out[..., 0].astype(jnp.float32)  # density channel

        dens = jax.lax.map(do_slab, (Bm, Cm))  # (R//slab, slab, R_i, R_j)
        dens = dens.reshape(R, RX, R)  # [z, x, y]
    dens = jnp.transpose(dens, (1, 2, 0))  # [x, y, z]
    return density_act(dens + spec.density_bias)


def lattice_coords_tets(resolution: int) -> jnp.ndarray:
    """Normalized [-1, 1] coords of the (res+1)-point marching-tets lattice:
    points at i/res in [0, 1] scaled to the bbox then /radius -> 2 i/res - 1."""
    return 2.0 * jnp.arange(resolution + 1, dtype=jnp.float32) / resolution - 1.0


def query_grid_multihead(
    triplane: jnp.ndarray,
    head_weights: Dict[str, List[Tuple[jnp.ndarray, jnp.ndarray]]],
    coords: jnp.ndarray,
    spec: DensityGridSpec,
) -> Dict[str, List[jnp.ndarray]]:
    """Multi-head fused lattice query (SF3D MaterialMLP over the tet lattice,
    ``sf3d/system.py:141-168``): same separable-sampling + factorized-first-
    layer scheme as ``query_density_grid``, shared across heads (the plane
    resampling is done once), one independent MLP per head.

    Returns {head: [flat (R^3,) array per output channel]} in x-major order
    (lin = (i*R + j)*R + k), matching ``marching_tets``'s input convention.
    Outputs are raw (no output activation, no bias) — callers apply those.
    """
    R = coords.shape[0]
    cd = spec.compute_dtype
    act = get_activation(spec.activation)

    Fxy, Fxz, Fyz = sample_triplane_regular_grid(
        triplane, coords, coords, coords, spec.align_corners
    )
    C = triplane.shape[1]

    slab = spec.slab
    assert R % slab == 0, f"lattice size {R} not divisible by slab {slab}"

    names = list(head_weights)
    depths = {len(w) for w in head_weights.values()}
    if len(names) >= 2 and len(depths) == 1 and next(iter(depths)) >= 3:
        # equal-depth heads (extraction: density+vertex_offset, both 2
        # hidden; bake: features+perturb_normal, both 3) run as ONE packed
        # MLP: first layer is a dense output-axis concat, hidden/output
        # layers block-diagonal — two 64-wide heads fill the 128-lane MXU
        # (2x the 25% shape ceiling, see _pack_weights) and the plane
        # einsums + slab broadcasts are built once instead of per head.
        packed, offs = _pack_weights([head_weights[n] for n in names])
        W1, b1 = packed[0]
        A = jnp.einsum("cji,cn->ijn", Fxy.astype(cd), W1[:C].astype(cd)) + b1.astype(cd)
        Bm = jnp.einsum("cki,cn->kin", Fxz.astype(cd), W1[C : 2 * C].astype(cd))
        Cm = jnp.einsum("ckj,cn->kjn", Fyz.astype(cd), W1[2 * C :].astype(cd))
        Bm = Bm.reshape(R // slab, slab, R, -1)
        Cm = Cm.reshape(R // slab, slab, R, -1)

        def do_slab_packed(args):
            b_s, c_s = args
            h = act(A[None] + b_s[:, :, None, :] + c_s[:, None, :, :])
            return _run_hidden(h, packed, act, cd).astype(jnp.float32)

        arr = jax.lax.map(do_slab_packed, (Bm, Cm))  # (R//slab, slab, Ri, Rj, Ksum)
        Ksum = arr.shape[-1]
        arr = arr.reshape(R, R, R, Ksum)
        arr = jnp.transpose(arr, (1, 2, 0, 3))  # (x, y, z, Ksum)
        return {
            name: [arr[..., off + k].ravel() for k in range(kw)]
            for name, (off, kw) in zip(names, offs)
        }

    partials = {}
    for name, weights in head_weights.items():
        W1, b1 = weights[0]
        A = jnp.einsum("cji,cn->ijn", Fxy.astype(cd), W1[:C].astype(cd)) + b1.astype(cd)
        Bm = jnp.einsum("cki,cn->kin", Fxz.astype(cd), W1[C : 2 * C].astype(cd))
        Cm = jnp.einsum("ckj,cn->kjn", Fyz.astype(cd), W1[2 * C :].astype(cd))
        partials[name] = (
            A,
            Bm.reshape(R // slab, slab, R, -1),
            Cm.reshape(R // slab, slab, R, -1),
        )

    def do_slab(slabs):
        outs = {}
        for name, weights in head_weights.items():
            A, b_s, c_s = partials[name][0], slabs[name][0], slabs[name][1]
            h = act(A[None] + b_s[:, :, None, :] + c_s[:, None, :, :])
            out = _run_hidden(h, weights, act, cd)  # (slab, R, R, K)
            outs[name] = out.astype(jnp.float32)
        return outs

    slab_in = {n: (p[1], p[2]) for n, p in partials.items()}
    res = jax.lax.map(do_slab, slab_in)  # {name: (R//slab, slab, Ri, Rj, K)}

    out: Dict[str, List[jnp.ndarray]] = {}
    for name, arr in res.items():
        K = arr.shape[-1]
        # (z, x, y, K) -> x-major flat per channel
        arr = arr.reshape(R, R, R, K)
        arr = jnp.transpose(arr, (1, 2, 0, 3))  # (x, y, z, K)
        out[name] = [arr[..., k].ravel() for k in range(K)]
    return out


def query_points_multihead(
    triplane: jnp.ndarray,
    head_weights: Dict[str, List[Tuple[jnp.ndarray, jnp.ndarray]]],
    px: jnp.ndarray,
    py: jnp.ndarray,
    pz: jnp.ndarray,
    spec: DensityGridSpec,
) -> Dict[str, jnp.ndarray]:
    """Scattered multi-head query (texture bake: ``sf3d/system.py:375-377``).
    Returns {head: (K, N)} channels-first raw outputs."""
    cd = spec.compute_dtype
    act = get_activation(spec.activation)
    r = spec.radius
    # cast the planes BEFORE the scattered sample: the bilinear taps are the
    # bandwidth-bound step, so gathering cd-width elements halves it at bf16
    # (the tap weights stay f32; the product upcasts, then re-narrows)
    feats = sample_triplane(
        triplane.astype(cd), px / r, py / r, pz / r, spec.align_corners
    ).astype(cd)  # (3C, N)
    names = list(head_weights)
    depths = {len(w) for w in head_weights.values()}
    if len(names) >= 2 and len(depths) == 1:
        # equal-depth heads as one packed MLP (128-wide hidden layers fill
        # the MXU instead of two 25%-ceiling 64-wide streams; _pack_weights)
        packed, offs = _pack_weights([head_weights[n] for n in names])
        h = feats
        for W, b in packed[:-1]:
            h = act(W.astype(cd).T @ h + b.astype(cd)[:, None])
        W, b = packed[-1]
        o = (W.astype(cd).T @ h + b.astype(cd)[:, None]).astype(jnp.float32)
        return {
            name: o[off : off + kw] for name, (off, kw) in zip(names, offs)
        }
    out = {}
    for name, weights in head_weights.items():
        h = feats
        for W, b in weights[:-1]:
            h = act(W.astype(cd).T @ h + b.astype(cd)[:, None])
        W, b = weights[-1]
        out[name] = (W.astype(cd).T @ h + b.astype(cd)[:, None]).astype(jnp.float32)
    return out


def query_triplane_points(
    triplane: jnp.ndarray,
    weights: List[Tuple[jnp.ndarray, jnp.ndarray]],
    px: jnp.ndarray,
    py: jnp.ndarray,
    pz: jnp.ndarray,
    spec: DensityGridSpec,
) -> Dict[str, jnp.ndarray]:
    """Arbitrary-point query (mesh-vertex colors): coords are flat (N,)
    arrays in (-radius, radius) — SoA to avoid TPU (N, 3) tile padding.

    Channels-first throughout: returns density/density_act (N,) and
    color (3, N).
    """
    cd = spec.compute_dtype
    act = get_activation(spec.activation)
    r = spec.radius
    feats = sample_triplane(
        triplane, px / r, py / r, pz / r, spec.align_corners
    ).astype(cd)  # (3C, N)
    h = feats
    for W, b in weights[:-1]:
        h = act(W.astype(cd).T @ h + b.astype(cd)[:, None])
    W, b = weights[-1]
    out = (W.astype(cd).T @ h + b.astype(cd)[:, None]).astype(jnp.float32)  # (4, N)
    density = out[0]
    return {
        "density": density,
        "density_act": get_activation(spec.density_activation)(density + spec.density_bias),
        "color": jax.nn.sigmoid(out[1:4]),
    }
