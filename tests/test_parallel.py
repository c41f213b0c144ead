"""Multi-chip shardings on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sculptmate_tpu.parallel.mesh import factor2, make_mesh
from sculptmate_tpu.parallel.farm import AssetFarm, sharded_density_grid


def test_factor2():
    assert factor2(8) == (2, 4)
    assert factor2(4) == (2, 2)
    assert factor2(7) == (1, 7)
    assert factor2(1) == (1, 1)


@pytest.fixture(scope="module")
def tiny_tsr():
    from sculptmate_tpu.systems.tsr import TSR, TSRConfig

    cfg = TSRConfig(
        cond_image_size=32,
        plane_size=8,
        num_channels=64,
        num_attention_heads=4,
        attention_head_dim=16,
        num_layers=1,
    )
    return TSR(cfg, dtype=jnp.float32)


def test_asset_farm_dp8(tiny_tsr, rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh((8,), ("dp",))
    farm = AssetFarm(tiny_tsr, mesh)
    images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    res = farm.generate_batch(images, resolution=16, threshold=0.36, mode="packed")
    assert res.num_verts.shape == (8,)
    # every asset produced a bounded mesh
    assert (res.num_verts >= 0).all()
    assert int(res.num_verts.max()) <= 8 * 16 * 16


def test_asset_farm_wire_matches_packed(tiny_tsr, rng):
    """The farm's default wire path must reproduce the packed MCResult path
    per asset: same counts, same topology, positions within u16-t
    quantization."""
    mesh = make_mesh((8,), ("dp",))
    farm = AssetFarm(tiny_tsr, mesh)
    images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    packed = farm.generate_batch(
        images, resolution=16, threshold=0.36, mode="packed"
    )
    wire = farm.generate_batch(
        images, resolution=16, threshold=0.36, has_vertex_color=True
    )
    assert len(wire) == 8
    scale = 2 * farm.tsr.config.radius / (16 - 1.0)
    for b in range(8):
        verts, faces, colors = wire[b]
        nv = int(packed.num_verts[b])
        nf = int(packed.num_faces[b])
        # wire-path counts must equal the device MCResult counts exactly
        assert len(verts) == nv, (b, len(verts), nv)
        assert len(faces) == nf, (b, len(faces), nf)
        if nv == 0:
            continue
        assert colors is not None and colors.shape == (nv, 3)
        pv = np.stack(
            [
                np.asarray(packed.vx[b][:nv]),
                np.asarray(packed.vy[b][:nv]),
                np.asarray(packed.vz[b][:nv]),
            ],
            axis=-1,
        ) * scale - farm.tsr.config.radius
        pf = np.stack(
            [
                np.asarray(packed.fa[b][:nf]),
                np.asarray(packed.fb[b][:nf]),
                np.asarray(packed.fc[b][:nf]),
            ],
            axis=-1,
        )
        # same geometry/topology under the wire's block-major vertex
        # numbering (packed stays z-order): match vertices by position
        # (verified unique bijection), then faces must be identical after
        # the remap — both paths emit faces in z-cell order
        d = np.linalg.norm(verts[:, None, :] - pv[None, :, :], axis=-1)
        perm = d.argmin(axis=1)
        assert d[np.arange(nv), perm].max() < 2e-4 * scale * 16
        assert len(np.unique(perm)) == nv
        inv = np.empty(nv, np.int64)
        inv[perm] = np.arange(nv)
        np.testing.assert_array_equal(
            np.asarray(faces, np.int64), inv[np.asarray(pf, np.int64)]
        )


def test_asset_farm_full_pipeline_rgba(tiny_tsr, rng):
    mesh = make_mesh((8,), ("dp",))
    farm = AssetFarm(tiny_tsr, mesh)
    rgba = np.zeros((8, 64, 64, 4), np.float32)
    rgba[:, 16:48, 20:44, :3] = rng.random((8, 32, 24, 3))
    rgba[:, 16:48, 20:44, 3] = 1.0
    meshes = farm.generate_batch_rgba(
        jnp.asarray(rgba), matting=None, resolution=16, threshold=0.36
    )
    assert len(meshes) == 8
    for verts, faces, colors in meshes:
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert faces.ndim == 2 and faces.shape[1] == 3
        if len(faces):
            assert faces.max() < len(verts)

    # chunked pipelined serving (2 dp-sharded chunks in flight) must
    # produce asset-for-asset identical meshes to the one-shot batch
    mesh2 = make_mesh((2,), ("dp",), devices=jax.devices()[:2])
    farm2 = AssetFarm(tiny_tsr, mesh2)
    meshes2 = farm2.generate_batch_rgba(
        jnp.asarray(rgba), matting=None, resolution=16, threshold=0.36
    )  # default chunk = dp size 2 -> 4 chunks, pipelined
    assert len(meshes2) == 8
    for (v, f, _), (v2, f2, _) in zip(meshes, meshes2):
        np.testing.assert_allclose(v, v2, atol=2e-5)
        np.testing.assert_array_equal(f, f2)


def test_sharded_density_grid_sp(tiny_tsr, rng):
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    mesh = make_mesh((8,), ("sp",))
    tri = jnp.asarray(rng.standard_normal((3, 40, 16, 16)), jnp.float32)
    weights = mlp_weights_from_params(tiny_tsr.params["decoder"]["layers"])
    spec = tiny_tsr.grid_spec(16, slab=4)
    sharded = sharded_density_grid(mesh, tri, weights, spec, sp_axis="sp")
    dense = query_density_grid(tri, weights, spec)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), rtol=1e-5, atol=1e-6
    )


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (params, images) = ge.entry()
    out_shape = jax.eval_shape(fn, params, images)
    assert out_shape.shape == (1, 3, 40, 64, 64)


def test_tp_backbone_matches_unsharded(tiny_tsr, rng):
    """Megatron-style TP (heads/hidden sharded via in-module constraints)
    must not change the encode result (up to fp reassociation)."""
    mesh = make_mesh((2, 4), ("dp", "tp"))
    farm_plain = AssetFarm(tiny_tsr, mesh, dp_axis="dp")
    farm_tp = AssetFarm(tiny_tsr, mesh, dp_axis="dp", tp_axis="tp")
    images = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    import jax as _jax

    imgs = _jax.device_put(
        images, _jax.sharding.NamedSharding(mesh, _jax.sharding.PartitionSpec("dp"))
    )
    a = np.asarray(farm_plain._encode(farm_plain.params, imgs))
    b = np.asarray(farm_tp._encode(farm_tp.params, imgs))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_sf3d_pair():
    from sculptmate_tpu.systems.sf3d import SF3D, SF3DConfig

    cfg = SF3DConfig(
        cond_image_size=56,
        isosurface_resolution=14,
        plane_size=8,
        num_channels=64,
        num_attention_heads=4,
        attention_head_dim=16,
        num_latents=32,
        num_blocks=1,
        num_basic_blocks=1,
        upsample_scale_factor=2,
        upsample_conv_layers=2,
        dinov2_hidden_size=64,
        dinov2_num_layers=2,
        dinov2_num_heads=4,
        dinov2_intermediate_size=128,
        clip_width=64,
        clip_layers=2,
        clip_heads=4,
    )
    plain = SF3D(cfg, dtype=jnp.float32)
    tp = SF3D(cfg, params=plain.params, dtype=jnp.float32, tp_axis="tp")
    return plain, tp


def test_tp_sf3d_encode_matches_unsharded(tiny_sf3d_pair, rng, monkeypatch):
    """TP-sharded SF3D encode (heads/hidden column-sharded in the two-stream
    backbone, chunked attention via the ``allow_flash=tp_axis is None``
    switch) must reproduce the unsharded encode. _FUSED_LIMIT is pinned low
    so the TP module really runs the chunked fallback, not the fused path."""
    from sculptmate_tpu.ops import attention as attn_mod

    plain, tp = tiny_sf3d_pair
    mesh = make_mesh((2, 4), ("dp", "tp"))
    assert tp.module.tp_axis == "tp"
    rgb = jnp.asarray(rng.random((2, 56, 56, 3)), jnp.float32)

    codes_a, direct_a = plain.get_scene_codes(rgb)

    monkeypatch.setattr(attn_mod, "_FUSED_LIMIT", 1)
    rgb_sharded = jax.device_put(
        rgb, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    )
    with jax.sharding.set_mesh(mesh):
        codes_b, direct_b = tp.get_scene_codes(rgb_sharded)

    np.testing.assert_allclose(
        np.asarray(codes_a), np.asarray(codes_b), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(direct_a), np.asarray(direct_b), rtol=2e-4, atol=2e-5
    )


def test_sf3d_farm_matches_run_image(tiny_sf3d_pair, rng):
    """SF3DFarm (dp-sharded prepare+encode+estimator, one batched MT-wire
    fetch, round-robined decimate/unwrap+bake) must reproduce the per-asset
    ``run_image`` pipeline asset-for-asset on the 8-device dp mesh."""
    from sculptmate_tpu.parallel.sf3d_farm import SF3DFarm

    plain, _tp = tiny_sf3d_pair
    mesh = make_mesh((8,), ("dp",))
    farm = SF3DFarm(plain, mesh)
    imgs = np.asarray(rng.random((8, 56, 56, 4)), np.float32)

    # mean-level threshold on asset 0 (same recipe as test_sf3d_system)
    from sculptmate_tpu.ops.density_grid import (
        lattice_coords_tets,
        query_grid_multihead,
    )

    codes0, _ = plain.get_scene_codes(
        plain.prepare_image(jnp.asarray(imgs[:1]))[1]
    )
    g = query_grid_multihead(
        codes0[0],
        plain._head_weights(["density"]),
        lattice_coords_tets(plain.config.isosurface_resolution),
        plain.grid_spec(slab=1),
    )
    thr = float(np.exp(np.asarray(g["density"][0]) - 1.0).mean())

    outs = farm.generate_batch(
        jnp.asarray(imgs), bake_resolution=64, threshold=thr
    )
    assert len(outs) == 8
    n_ok = 0
    refs = []
    for i, out in enumerate(outs):
        ref = plain.run_image(
            jnp.asarray(imgs[i : i + 1]), bake_resolution=64, threshold=thr,
            fused=True,
        )
        refs.append(ref)
        if out is None:
            assert ref is None
            continue
        n_ok += 1
        assert ref is not None
        assert len(out["verts"]) == len(ref["verts"]), i
        # topology must match exactly. Positions may drift: the farm's
        # vmapped+dp-sharded program fuses differently from run_image's
        # per-asset one, and the MT edge interpolation t = a/(a-b)
        # amplifies last-ulp density differences without bound on
        # near-degenerate edges (though never past the edge itself, one
        # cell). Require the bulk tight and the worst case under a cell.
        cell = 2 * plain.config.radius / plain.config.isosurface_resolution
        err = np.abs(out["verts"] - ref["verts"]).max(axis=1)
        assert np.quantile(err, 0.99) < 1e-4, np.quantile(err, 0.99)
        assert err.max() < cell, err.max()
        np.testing.assert_array_equal(out["faces"], ref["faces"])
        # Atlas LAYOUT equality is NOT a stable invariant across the two
        # programs: the unwrap resolves chart-overlap by depth, ties break
        # on last-ulp drift, and ONE flipped face relocates every later
        # island in the overflow pool (``uv_unwrap_device._unwrap_core``'s
        # ids = cumsum(rem)) — measured 25-57% of UVs shifting from a
        # 3e-5 vertex drift. Both layouts are valid; what must hold is
        # that the UVs form a valid atlas (render equivalence is checked
        # via texture sampling below).
        assert np.all(out["uvs"] >= -1e-6) and np.all(out["uvs"] <= 1 + 1e-6)
        assert set(out["texture_pngs"]) == {
            "baseColor", "normal", "metallicRoughness",
        }
        assert abs(out["roughness"] - ref["roughness"]) < 2e-4
        assert abs(out["metallic"] - ref["metallic"]) < 2e-4
    assert n_ok >= 2

    # render-equivalence + ROUTING: asset i's baked albedo, sampled on its
    # own atlas at its own (vertex-matched) UVs, must agree with run_image's
    # asset i far better than with ANY other asset — catches batched
    # scene-code/estimator mis-indexing that the layout-tolerant checks
    # above cannot. Empirical margins (f32, this fixture): identity mean
    # error <= 0.041, cross >= 0.080.
    def _sample(tex, uvs):
        h, w = tex.shape[:2]
        x = np.clip((uvs[:, 0] * w).astype(int), 0, w - 1)
        y = np.clip((uvs[:, 1] * h).astype(int), 0, h - 1)
        return np.asarray(tex, np.float32)[y, x]

    for i, out in enumerate(outs):
        if out is None:
            continue
        a = _sample(out["textures"]["albedo"], out["uvs"])
        errs = {}
        for j, ref in enumerate(refs):
            if ref is None:
                continue
            b = _sample(ref["textures"]["albedo"], ref["uvs"])
            m = min(len(a), len(b))
            errs[j] = float(np.abs(a[:m] - b[:m]).mean())
        # identity bound: layout differences between the two programs
        # (tie flips + the per-slice rotation angles now deriving from
        # u16-QUANTIZED positions, whose last-ulp drift differs between the
        # farm's vmapped program and run_image's) add nearest-texel sampling
        # noise on island borders — observed up to ~0.066 mean. The ROUTING
        # guarantee is the relative check below.
        assert errs[i] < 0.075, (i, errs[i])
        cross = [e for j, e in errs.items() if j != i]
        if cross:
            assert errs[i] < 0.75 * min(cross), (i, errs)


def test_sf3d_farm_no_texture(tiny_sf3d_pair, rng):
    """Texture-less farm batches still produce unwrapped, decimated meshes."""
    from sculptmate_tpu.parallel.sf3d_farm import SF3DFarm

    plain, _tp = tiny_sf3d_pair
    mesh = make_mesh((8,), ("dp",))
    farm = SF3DFarm(plain, mesh)
    imgs = jnp.asarray(rng.random((8, 56, 56, 4)), jnp.float32)
    outs = farm.generate_batch(
        imgs, bake_resolution=64, enable_texture=False, threshold=0.37
    )
    assert len(outs) == 8
    for out in outs:
        if out is None:
            continue
        assert out["texture_pngs"] is None
        nv = len(out["verts"])
        assert out["faces"].max() < nv
        assert out["uvs"].shape == (nv, 2)


def test_sharded_extract_matches_single_device(tiny_tsr, rng):
    """SP extraction (8 x-slabs, slab-local density + per-shard MC + host
    weld) must produce the identical mesh to single-device extraction."""
    from sculptmate_tpu.geometry.marching_cubes import marching_cubes_host
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )
    from sculptmate_tpu.parallel.farm import sharded_extract

    mesh = make_mesh((8,), ("sp",))
    R = 64
    code = tiny_tsr.scene_codes(jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32))[0]
    weights = mlp_weights_from_params(tiny_tsr.params["decoder"]["layers"])
    spec = tiny_tsr.grid_spec(R)

    dens = np.asarray(query_density_grid(code, weights, spec))
    thr = float(np.quantile(dens, 0.99))

    sv, sf = marching_cubes_host(jnp.asarray(dens) - thr)
    pv, pf = sharded_extract(mesh, code, weights, spec, threshold=thr)
    assert len(pv) > 100, "surface too small to be a meaningful test"

    # Seam welding relies on bit-identical halo recomputation ACROSS SHARDS
    # (same SPMD program) — vs the single-device mesh the interpolation t
    # differs by fp reassociation (different matmul shapes), so compare
    # topology exactly and positions with tolerance.
    def refed(verts, faces):
        used = np.zeros(len(verts), bool)
        used[faces.ravel()] = True
        remap = np.cumsum(used) - 1
        return verts[used], remap[faces]

    sv, sf = refed(sv, sf)
    assert len(sv) == len(pv), (len(sv), len(pv))
    assert len(sf) == len(pf), (len(sf), len(pf))

    def edge_stats(faces):
        e = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        fwd = set(map(tuple, e))
        unpaired = sum((b, a) not in fwd for a, b in fwd)
        return len(fwd), unpaired

    # a failed seam weld would leave duplicated vertices -> unpaired edges
    assert edge_stats(sf) == edge_stats(pf)

    # geometric match: both meshes cut the SAME lattice edges (one vertex
    # per cut edge), and per-edge positions agree except where the density
    # gradient across the edge is tiny (t = l0/(l0-l1) amplifies fp noise
    # unboundedly there)
    def edge_keyed(v):
        fr = v - np.floor(v)
        axis = np.argmax(fr, axis=1)
        base = np.floor(v + 1e-6).astype(np.int64)
        key = ((axis * 1000 + base[:, 0]) * 1000 + base[:, 1]) * 1000 + base[:, 2]
        order = np.argsort(key)
        return key[order], v[order]

    k1, sv_o = edge_keyed(sv)
    k2, pv_o = edge_keyed(pv)
    np.testing.assert_array_equal(k1, k2)
    d = np.abs(sv_o - pv_o).max(axis=1)
    assert (d <= 1.0).all()  # same edge
    assert np.quantile(d, 0.99) < 1e-2, np.quantile(d, 0.99)


def test_sharded_extract_wire_matches_sharded_extract(tiny_tsr, rng):
    """The wire-format SP extraction must reproduce the packed SP extraction
    (same per-shard valid_x semantics, same exact seam welds) up to uint16
    t quantization of vertex positions."""
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )
    from sculptmate_tpu.parallel.farm import sharded_extract, sharded_extract_wire

    mesh = make_mesh((8,), ("sp",))
    R = 64
    code = tiny_tsr.scene_codes(jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32))[0]
    weights = mlp_weights_from_params(tiny_tsr.params["decoder"]["layers"])
    spec = tiny_tsr.grid_spec(R)

    dens = np.asarray(query_density_grid(code, weights, spec))
    thr = float(np.quantile(dens, 0.99))

    pv, pf = sharded_extract(mesh, code, weights, spec, threshold=thr)
    wv, wf = sharded_extract_wire(mesh, code, weights, spec, threshold=thr)
    assert len(wv) > 100

    assert len(wv) == len(pv)
    assert len(wf) == len(pf)

    # same welded topology and near-identical positions (u16 t quantization)
    def canon(verts, faces):
        order = np.lexsort((verts[:, 2], verts[:, 1], verts[:, 0]))
        remap = np.empty(len(verts), np.int64)
        remap[order] = np.arange(len(verts))
        f = remap[faces]
        k = np.argmin(f, axis=1)
        rows = np.arange(len(f))[:, None]
        rot = np.stack([f[rows[:, 0], (k + s) % 3] for s in range(3)], axis=1)
        return verts[order], rot[np.lexsort((rot[:, 2], rot[:, 1], rot[:, 0]))]

    pvc, pfc = canon(pv, pf)
    wvc, wfc = canon(wv, wf)
    assert np.max(np.abs(pvc - wvc)) < 2e-4
    assert np.array_equal(pfc, wfc)
