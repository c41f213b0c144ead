"""Host quadric-decimator benchmark on a synthetic ~1M-face mesh.

Builds a subdivided icosahedron with radial noise (single closed component,
MT-like vertex density), runs geometry/native decimate at the SF3D vertex
budgets, and reports wall clock — the stage the <3 s SF3D budget needs under
0.3 s. Run on the idle host (no concurrent TPU job: one core).
"""

import sys
import time

import numpy as np


def icosphere(subdiv: int):
    t = (1.0 + 5**0.5) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float32,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    from sculptmate_tpu.geometry.mesh import Mesh

    m = Mesh(v, f)
    m = m.subdivide(subdiv)
    v = m.v_pos / np.maximum(np.linalg.norm(m.v_pos, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(0)
    r = 1.0 + 0.08 * rng.standard_normal(len(v)).astype(np.float32)
    return (v * r[:, None]).astype(np.float32), m.t_pos_idx


def main():
    from sculptmate_tpu.geometry.decimate import decimate

    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 0.75
    if len(sys.argv) > 1 and sys.argv[1].endswith(".npz"):
        d = np.load(sys.argv[1])
        v, f = d["verts"].astype(np.float32), d["faces"].astype(np.int64)
    else:
        subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 6
        v, f = icosphere(subdiv)
    print(f"mesh: {len(v)} verts {len(f)} faces, target ratio {ratio}")
    # warmup (loads/builds the .so)
    decimate(v[: 3 * 64].copy(), f[:64].copy() % (3 * 64), 0.5)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        ov, of = decimate(v, f, target_ratio=ratio)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(
        f"decimate -> {len(ov)} verts {len(of)} faces: "
        f"median {times[2]*1e3:.0f} ms (min {times[0]*1e3:.0f}, max {times[-1]*1e3:.0f})"
    )

    # quality gates: watertight in == watertight out, bounded Hausdorff
    def unpaired_edges(faces):
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        fwd = set(map(tuple, e.tolist()))
        return sum((b, a) not in fwd for a, b in fwd)

    print(f"unpaired edges: in {unpaired_edges(f)} out {unpaired_edges(of)}")
    from scipy.spatial import cKDTree

    d = cKDTree(v).query(ov, k=1)[0]
    print(f"one-sided Hausdorff out->in: max {d.max():.4f} p99 {np.quantile(d, 0.99):.4f}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
