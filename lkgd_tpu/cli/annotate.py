"""Pseudo-label generation CLI — `annotate/annotate_segmentation.py` analog.

The reference labels training frames with external models (OneFormer segmentation,
Depth-Anything depth; `annotate/configs/annotate_spatial.yaml`). Those checkpoints are
external; this CLI runs any processor registered in utils.control_preprocess (classical
ones ship built-in: canny/softedge/tile; flow maps come from our UniMatch via
--annotation flow; model-based ones — depth (Intel/dpt-large, the reference's
transformers depth-estimation pipeline default), depth_anything, depth_midas
(DPT-hybrid), openpose (CMU body), lineart_anime (Anime2Sketch) — take --weights
pointing at the ported external checkpoint) over a folder of videos/images and writes
label maps alongside.

  python -m lkgd_tpu.cli.annotate --input data/videos --annotation canny --output labels/
  python -m lkgd_tpu.cli.annotate --input data/videos --annotation flow --output labels/
  python -m lkgd_tpu.cli.annotate --input imgs --annotation openpose \\
      --weights body_pose_model.npz --output labels/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--annotation", default="canny")
    p.add_argument("--max-frames", type=int, default=64)
    p.add_argument("--weights", default=None,
                   help="checkpoint for model-based annotators (depth: HF "
                        "depth-anything-small safetensors/npz state dict)")
    p.add_argument("--model-size", default="small", choices=("small", "base"))
    p.add_argument("--grid-size", type=int, default=16,
                   help="tracks: query grid side (reference get_points_on_a_grid, "
                        "utils/util.py:441-483)")
    p.add_argument("--fb-thresh", type=float, default=2.0,
                   help="tracks: forward-backward cycle visibility threshold (px)")
    args = p.parse_args()

    from lkgd_tpu.data.video_io import load_input, write_video
    from lkgd_tpu.utils import control_preprocess as cp

    if args.annotation == "flow":
        import jax
        import jax.numpy as jnp

        from lkgd_tpu.models.unimatch import UniMatch, UniMatchConfig
        from lkgd_tpu.utils.flow_codec import flow_to_image_naive
        from lkgd_tpu.utils.optical_flow import make_flow_fn

        model = UniMatch(UniMatchConfig.lkgd(), dtype=jnp.float32)
        flow_fns = {}

        def flow_processor_video(frames: np.ndarray) -> np.ndarray:
            hw = frames.shape[1:3]
            if hw not in flow_fns:
                ph = -(-hw[0] // 16) * 16
                pw = -(-hw[1] // 16) * 16
                params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ph, pw, 3)),
                                    jnp.zeros((1, ph, pw, 3)))
                flow_fns[hw] = make_flow_fn(model, params, hw)
            flow = flow_fns[hw](jnp.asarray(frames))
            img = np.asarray(flow_to_image_naive(flow))
            return np.concatenate([img, img[-1:]], axis=0)  # last frame repeats

    if args.annotation == "depth":
        # reference parity: transformers.pipeline('depth-estimation') default =
        # Intel/dpt-large (utils/controlnet_utils.py:103-117)
        from lkgd_tpu.models.midas import make_depth_processor

        if not args.weights:
            raise SystemExit("--annotation depth needs --weights (HF Intel/dpt-large "
                             "state dict; external, egress-gated)")
        cp.register_processor("depth", make_depth_processor(args.weights))

    if args.annotation == "depth_anything":
        from lkgd_tpu.models.depth_anything import (
            DepthAnythingConfig, load_state_dict, make_depth_processor, port_depth_anything)

        if not args.weights:
            raise SystemExit("--annotation depth_anything needs --weights (HF "
                             "depth-anything state dict; external, egress-gated)")
        cfg = getattr(DepthAnythingConfig, args.model_size)()
        params = port_depth_anything(load_state_dict(args.weights), cfg)
        cp.register_processor("depth_anything", make_depth_processor(params, cfg))

    if args.annotation == "lineart_anime":
        from lkgd_tpu.utils.porting import load_state_dict
        from lkgd_tpu.models.lineart_anime import (
            LineartAnimeConfig, make_lineart_anime_processor, port_lineart_anime)

        if not args.weights:
            raise SystemExit("--annotation lineart_anime needs --weights (Anime2Sketch "
                             "netG state dict; external, egress-gated)")
        cfg = LineartAnimeConfig()
        params = port_lineart_anime(load_state_dict(args.weights), cfg)
        cp.register_processor("lineart_anime",
                              make_lineart_anime_processor(params, cfg))

    if args.annotation == "depth_midas":
        from lkgd_tpu.models.midas import make_midas_processor

        if not args.weights:
            raise SystemExit("--annotation depth_midas needs --weights "
                             "(isl-org dpt_hybrid-midas-501f0c75.pt; external, "
                             "egress-gated)")
        cp.register_processor("depth_midas", make_midas_processor(args.weights))

    if args.annotation in ("lineart", "lineart_coarse"):
        from lkgd_tpu.models.lineart import make_lineart_processor

        if not args.weights:
            raise SystemExit(f"--annotation {args.annotation} needs --weights "
                             "(Informative-Drawings sk_model.pth fine / sk_model2.pth "
                             "coarse; external, egress-gated)")
        cp.register_processor(args.annotation, make_lineart_processor(args.weights))

    if args.annotation in ("softedge_pidinet", "softedge_pidsafe", "scribble_pidinet"):
        # the reference's softedge DEFAULT is pidsafe (controlnet_utils.py:99-101)
        from lkgd_tpu.models.pidinet import make_pidinet_processor

        if not args.weights:
            raise SystemExit(f"--annotation {args.annotation} needs --weights "
                             "(lllyasviel Annotators table5_pidinet.pth; external, "
                             "egress-gated)")
        cp.register_processor(args.annotation, make_pidinet_processor(
            args.weights, safe=args.annotation.endswith("pidsafe"),
            scribble=args.annotation.startswith("scribble")))

    if args.annotation in ("softedge_hed", "scribble_hed", "softedge_hedsafe",
                           "scribble_hedsafe"):
        from lkgd_tpu.models.hed import make_hed_processor

        if not args.weights:
            raise SystemExit(f"--annotation {args.annotation} needs --weights "
                             "(lllyasviel Annotators ControlNetHED.pth; external, "
                             "egress-gated)")
        cp.register_processor(args.annotation, make_hed_processor(
            args.weights, scribble=args.annotation.startswith("scribble"),
            safe=args.annotation.endswith("hedsafe")))

    if args.annotation == "segmentation":
        import jax

        from lkgd_tpu.utils.porting import load_state_dict
        from lkgd_tpu.models.segformer import (
            SegformerConfig, SegformerForSemanticSegmentation,
            make_segmentation_processor, port_segformer)

        if not args.weights:
            raise SystemExit("--annotation segmentation needs --weights (HF SegFormer "
                             "ADE20K state dict; external, egress-gated; the reference "
                             "delegates to an external OneFormer repo the same way)")
        import jax.numpy as jnp

        cfg = (SegformerConfig.b0_ade() if args.model_size == "small"
               else SegformerConfig.b4_ade())
        model = SegformerForSemanticSegmentation(cfg)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
        params = port_segformer(load_state_dict(args.weights), shapes)
        cp.register_processor("segmentation", make_segmentation_processor(params, cfg))

    if args.annotation == "openpose":
        from lkgd_tpu.utils.porting import load_state_dict
        from lkgd_tpu.models.openpose import (
            OpenPoseConfig, make_openpose_processor, port_openpose_body)

        if not args.weights:
            raise SystemExit("--annotation openpose needs --weights (controlnet_aux "
                             "body_pose_model state dict; external, egress-gated)")
        cfg = OpenPoseConfig()
        params = port_openpose_body(load_state_dict(args.weights), cfg)
        cp.register_processor("openpose", make_openpose_processor(params, cfg))

    if args.annotation == "tracks":
        # point-track pseudo-labels for TrackDataset (reference: CoTracker at
        # annotation time, utils/util.py:441-504; here: chained RAFT flow —
        # utils/point_tracker.py). Writes <name>.npz with tracks/visibility.
        import jax
        import jax.numpy as jnp

        from lkgd_tpu.models.raft import RAFT, RAFTConfig
        from lkgd_tpu.utils.point_tracker import track_video

        model = RAFT(RAFTConfig(), dtype=jnp.float32)
        shapes = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))))
        if args.weights:
            from lkgd_tpu.utils.porting import load_state_dict, port_raft

            params = port_raft(load_state_dict(args.weights), shapes)
        else:
            raise SystemExit("--annotation tracks needs --weights (torchvision "
                             "raft_large state dict; external, egress-gated)")
        files = sorted(sum([glob.glob(os.path.join(args.input, e))
                            for e in ("*.mp4", "*.gif")], []))
        os.makedirs(args.output, exist_ok=True)
        for f in files:
            frames = load_input(f, max_frames=args.max_frames)
            tracks, vis = track_video(model, params, frames,
                                      grid_size=args.grid_size,
                                      fb_thresh=args.fb_thresh)
            name = os.path.splitext(os.path.basename(f))[0]
            out = os.path.join(args.output, f"{name}.npz")
            np.savez(out, tracks=tracks, visibility=vis)
            print(f"{f} -> {out}: tracks {tracks.shape}, "
                  f"{float(vis.mean()) * 100:.0f}% visible")
        return

    files = sorted(sum([glob.glob(os.path.join(args.input, e))
                        for e in ("*.mp4", "*.gif", "*.png", "*.jpg")], []))
    os.makedirs(args.output, exist_ok=True)
    for f in files:
        frames = load_input(f, max_frames=args.max_frames)
        if args.annotation == "flow":
            labels = flow_processor_video(frames)
        else:
            labels = cp.control_preprocess(frames, args.annotation)
        name = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.output, f"{name}_{args.annotation}.gif")
        write_video(out, labels, fps=7)
        print(f"{f} -> {out}")


if __name__ == "__main__":
    main()
