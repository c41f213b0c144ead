"""Pallas TPU kernel: fused NeRF-MLP hidden-layer chain.

The XLA path of ``ops/density_grid.query_density_grid`` streams (N, 64)
activations through HBM between each of the 9 hidden layers + output
(~40 GB of traffic at 256^3). This kernel runs the whole chain per point
block inside VMEM: grid over flat point chunks, 10 back-to-back MXU matmuls,
density-only writeback.

The factorized first layer (h1 = A[i,j] + B[k,i] + C[k,j]) stays in XLA —
one fused broadcast-add writing h1 once (~2 GB bf16 at 256^3) — because
Mosaic currently miscompiles the in-kernel (1,B,H)->(B,1,H) broadcasts.
Activations are evaluated in f32 (Mosaic rejects f32->bf16 broadcast inside
transcendentals); matmul operands stay in the compute dtype.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, w_ref, bias_ref, wd_ref, out_ref, *, n_hidden, act):
    dtype = h_ref.dtype
    h = act(h_ref[:, :].astype(jnp.float32))
    for layer in range(n_hidden):
        z = jnp.dot(
            h.astype(dtype), w_ref[layer], preferred_element_type=jnp.float32
        )
        h = act(z + bias_ref[layer][None, :].astype(jnp.float32))
    d = jnp.dot(h.astype(dtype), wd_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[:] = d[:, 0].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "block", "interpret"))
def fused_mlp_density(
    h1: jnp.ndarray,  # (N, H) pre-activation first-layer output
    Whid: jnp.ndarray,  # (n_hidden, H, H)
    bhid: jnp.ndarray,  # (n_hidden, H)
    wd: jnp.ndarray,  # (H, 1) density output column (bias added by caller)
    activation: str = "silu",
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns raw density (N,) float32 (no output bias/activation)."""
    from sculptmate_tpu.ops.activations import get_activation

    act = get_activation(activation)
    N, H = h1.shape
    assert N % block == 0, (N, block)
    n_hidden = Whid.shape[0]
    kernel = functools.partial(_kernel, n_hidden=n_hidden, act=act)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h1, Whid, bhid, wd)


def density_grid_pallas(
    triplane: jnp.ndarray,
    weights: List[Tuple[jnp.ndarray, jnp.ndarray]],
    spec,
) -> jnp.ndarray:
    """Drop-in fused-kernel version of ``query_density_grid``: same inputs,
    returns the activated (R, R, R) density indexed [x, y, z]."""
    from sculptmate_tpu.ops.activations import get_activation
    from sculptmate_tpu.ops.grid_sample import sample_triplane_regular_grid
    from sculptmate_tpu.ops.density_grid import lattice_coords

    R = spec.resolution
    cd = spec.compute_dtype
    coords = lattice_coords(R)
    Fxy, Fxz, Fyz = sample_triplane_regular_grid(
        triplane, coords, coords, coords, spec.align_corners
    )
    W1, b1 = weights[0]
    C = triplane.shape[1]
    A = jnp.einsum("cji,cn->ijn", Fxy.astype(cd), W1[:C].astype(cd)) + b1.astype(cd)
    Bm = jnp.einsum("cki,cn->kin", Fxz.astype(cd), W1[C : 2 * C].astype(cd))
    Cm = jnp.einsum("ckj,cn->kjn", Fyz.astype(cd), W1[2 * C :].astype(cd))

    # h1[k, i, j] — one fused broadcast-add materialization
    h1 = (
        A[None, :, :, :] + Bm[:, :, None, :] + Cm[:, None, :, :]
    ).reshape(R * R * R, -1)

    Whid = jnp.stack([w for w, _ in weights[1:-1]]).astype(cd)
    bhid = jnp.stack([b for _, b in weights[1:-1]]).astype(cd)
    Wout, bout = weights[-1]
    wd = Wout[:, 0:1].astype(cd)

    interpret = jax.devices()[0].platform != "tpu"
    dens = fused_mlp_density(
        h1, Whid, bhid, wd, activation=spec.activation, interpret=interpret
    ).reshape(R, R, R)
    dens = jnp.transpose(dens, (1, 2, 0))  # [k,i,j] -> [x,y,z]
    density_act = get_activation(spec.density_activation)
    return density_act(dens + bout[0] + spec.density_bias)
