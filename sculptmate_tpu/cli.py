"""Command-line surface: image in, mesh out.

The reference's user surface is a Blender panel (``GUIPanel.py``); outside
Blender this CLI is the equivalent one-shot driver:

    sculptmate generate input.png -o out.glb --model lean --resolution 256
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cmd_generate(args: argparse.Namespace) -> int:
    import numpy as np
    from PIL import Image, ImageOps
    import jax.numpy as jnp

    from sculptmate_tpu.io import write_glb, write_obj

    t0 = time.time()
    # EXIF re-orientation at decode (fix_image_orientation, bg.py:128-138):
    # idempotent with the one inside remove() — the tag is stripped there
    img = ImageOps.exif_transpose(Image.open(args.image)).convert("RGBA")

    # reference ratios: 0.75 lean / 0.85 + alpha for fast (GUIPanel.py:158-160)
    ratio = args.ratio if args.ratio is not None else (0.85 if args.model == "fast" else 0.75)
    if args.remove_bg:
        from sculptmate_tpu.frontend import preprocess_image

        processed = preprocess_image(img, ratio=ratio, use_alpha=args.model == "fast")
        if processed is None:
            print("[sculptmate] foreground too small after matting", file=sys.stderr)
            return 1
    else:
        processed = img.convert("RGBA" if args.model == "fast" else "RGB")

    arr = np.asarray(processed, dtype=np.float32)[None] / 255.0
    if args.model == "lean":
        arr = arr[..., :3]
        from sculptmate_tpu.systems.tsr import TSR

        tsr = TSR(seed=args.seed)
        codes = tsr.scene_codes(jnp.asarray(arr))
        t1 = time.time()
        meshes = tsr.extract_mesh(
            codes,
            has_vertex_color=args.texture,
            resolution=args.resolution,
            threshold=args.threshold,
        )
        verts, faces, colors = meshes[0]
        if args.simplify_faces and len(faces) > args.simplify_faces:
            from sculptmate_tpu.geometry.decimate import decimate

            ratio = args.simplify_faces / len(faces)
            verts, faces = decimate(verts, faces, target_ratio=ratio)
            colors = None  # vertex mapping changed; re-query would be needed
        t2 = time.time()
    else:
        from sculptmate_tpu.systems.sf3d import SF3D

        sf3d = SF3D(seed=args.seed)
        t1 = time.time()
        mesh = sf3d.run_image(
            jnp.asarray(arr),
            bake_resolution=args.bake_resolution,
            estimate_illumination=False,
            vertex_simplification_factor=args.vertex_simplification,
            enable_texture=args.texture,
            threshold=args.threshold if args.threshold != 25.0 else None,
        )
        if mesh is None:
            print("[sculptmate] empty mesh (no density above threshold)", file=sys.stderr)
            return 2
        t2 = time.time()
        out = args.output
        from sculptmate_tpu.io import write_glb, write_obj

        if out.endswith(".obj"):
            write_obj(out, mesh["verts"], mesh["faces"], uvs=mesh["uvs"])
        else:
            write_glb(
                out,
                mesh["verts"],
                mesh["faces"],
                normals=mesh["normals"],
                uvs=mesh["uvs"],
                textures=mesh["texture_pngs"],
            )
        print(
            json.dumps(
                {
                    "output": out,
                    "verts": int(len(mesh["verts"])),
                    "faces": int(len(mesh["faces"])),
                    "roughness": mesh["roughness"],
                    "metallic": mesh["metallic"],
                    "encode_s": round(t1 - t0, 3),
                    "extract_s": round(t2 - t1, 3),
                    "total_s": round(time.time() - t0, 3),
                }
            )
        )
        return 0

    if len(verts) == 0:
        print("[sculptmate] empty mesh (no density above threshold)", file=sys.stderr)
        return 2

    out = args.output
    if out.endswith(".obj"):
        write_obj(out, verts, faces, vertex_colors=colors)
    else:
        write_glb(out, verts, faces, vertex_colors=colors)
    t3 = time.time()
    print(
        json.dumps(
            {
                "output": out,
                "verts": int(len(verts)),
                "faces": int(len(faces)),
                "encode_s": round(t1 - t0, 3),
                "extract_s": round(t2 - t1, 3),
                "total_s": round(t3 - t0, 3),
            }
        )
    )
    return 0


def _cmd_decimate(args: argparse.Namespace) -> int:
    """Standalone quadric decimation (the reference's ``mesh_simplify.py``
    offline tool, minus the hardcoded paths)."""
    import numpy as np

    from sculptmate_tpu.geometry.decimate import decimate
    from sculptmate_tpu.io import read_obj, write_obj

    t0 = time.time()
    verts, faces = read_obj(args.input)
    v2, f2 = decimate(
        verts, faces, target_ratio=args.ratio, aggressiveness=args.aggressiveness
    )
    write_obj(args.output, v2, f2)
    print(
        json.dumps(
            {
                "input_faces": int(len(faces)),
                "output_faces": int(len(f2)),
                "removed_pct": round(100 * (1 - len(f2) / max(len(faces), 1)), 1),
                "seconds": round(time.time() - t0, 2),
            }
        )
    )
    return 0


def _cmd_render(args: argparse.Namespace) -> int:
    """Render spherical novel views of a generated scene (the reference's
    dormant volume-render path, nerf_renderer.py:93-172)."""
    import numpy as np
    from PIL import Image, ImageOps
    import jax.numpy as jnp

    from sculptmate_tpu.systems.tsr import TSR

    img = ImageOps.exif_transpose(Image.open(args.image)).convert("RGB")
    arr = np.asarray(img, dtype=np.float32)[None] / 255.0
    tsr = TSR(seed=args.seed)
    codes = tsr.scene_codes(jnp.asarray(arr))
    views = tsr.render_views(
        codes, n_views=args.n_views, height=args.size, width=args.size
    )[0]
    for i, view in enumerate(views):
        out = args.output.replace("{}", str(i))
        Image.fromarray((np.clip(view, 0, 1) * 255).astype(np.uint8)).save(out)
    print(json.dumps({"views": len(views), "pattern": args.output}))
    return 0


def _cmd_convert(args: argparse.Namespace) -> int:
    """Convert reference checkpoints (torch/ONNX) to native orbax trees."""
    from sculptmate_tpu.runtime import checkpoint as ck

    src = args.input
    if src.endswith(".ckpt"):
        tree = ck.load_tsr_checkpoint(src)
    elif src.endswith(".safetensors"):
        tree = ck.load_sf3d_checkpoint(src)
    elif src.endswith(".onnx"):
        tree = ck.convert_u2net_onnx(src)
        if tree is None:
            print("[sculptmate] onnx package unavailable", file=sys.stderr)
            return 1
    else:
        print(f"[sculptmate] unknown checkpoint format: {src}", file=sys.stderr)
        return 1
    ck.save_native(args.output, tree)
    print(json.dumps({"input": src, "output": args.output}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sculptmate", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="image -> 3D mesh")
    g.add_argument("image")
    g.add_argument("-o", "--output", default="mesh.glb", help=".glb or .obj")
    g.add_argument("--model", choices=["lean", "fast"], default="lean")
    g.add_argument("--resolution", type=int, default=256, help="marching cubes resolution")
    g.add_argument("--threshold", type=float, default=25.0)
    g.add_argument("--ratio", type=float, default=None, help="foreground framing ratio (default 0.75 lean / 0.85 fast)")
    g.add_argument("--texture", action="store_true", help="vertex colors (lean) / baked textures (fast)")
    g.add_argument("--bake-resolution", type=int, default=512)
    g.add_argument(
        "--simplify-faces", type=int, default=0,
        help="decimate the lean mesh to ~N faces (e.g. 20000)",
    )
    g.add_argument("--vertex-simplification", default="high", choices=["high", "medium", "low"])
    g.add_argument("--no-remove-bg", dest="remove_bg", action="store_false")
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(func=_cmd_generate)

    d = sub.add_parser("decimate", help="quadric mesh decimation (OBJ in/out)")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--ratio", type=float, default=0.5, help="target face ratio")
    d.add_argument("--aggressiveness", type=float, default=7.0)
    d.set_defaults(func=_cmd_decimate)

    r = sub.add_parser("render", help="render spherical novel views (lean model)")
    r.add_argument("image")
    r.add_argument("-o", "--output", default="view_{}.png", help="pattern with {}")
    r.add_argument("--n-views", type=int, default=8)
    r.add_argument("--size", type=int, default=256)
    r.add_argument("--seed", type=int, default=0)
    r.set_defaults(func=_cmd_render)

    c = sub.add_parser("convert", help="torch/onnx checkpoint -> native orbax")
    c.add_argument("input", help="model.ckpt | model.safetensors | u2net.onnx")
    c.add_argument("output", help="output checkpoint directory")
    c.set_defaults(func=_cmd_convert)

    args = p.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
