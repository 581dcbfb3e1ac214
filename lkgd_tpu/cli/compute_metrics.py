"""Offline evaluation CLI — `gradios/compute_metrics.py` / `eval.sh` analog.

Compares generated media against references: PSNR/SSIM per pair, CLIP-FID and CLIP score
over the sets (CLIP features from our encoder; with --weights pointing at ported CLIP
weights the scores are meaningful, otherwise they are smoke numbers), and depth metrics
when --pred-depth/--gt-depth are given.

  python -m lkgd_tpu.cli.compute_metrics --generated outdir/ --reference refdir/ \
      [--weights ckpts/] [--pred-depth d1/ --gt-depth d2/]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _load_state_dict(path: str) -> dict:
    from lkgd_tpu.utils.porting import load_state_dict

    return load_state_dict(path)


def _load_dir(path: str, max_items: int):
    from lkgd_tpu.data.video_io import load_input

    files = sorted(sum([glob.glob(os.path.join(path, e))
                        for e in ("*.png", "*.jpg", "*.gif", "*.mp4")], []))[:max_items]
    return [load_input(f) for f in files]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generated", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--weights", help="dir with image_encoder.safetensors for real CLIP feats")
    p.add_argument("--inception-weights",
                   help="pytorch-fid InceptionV3 state dict (.pth/.pt/.safetensors) -> real FID")
    p.add_argument("--i3d-weights",
                   help="pytorch-i3d Kinetics-400 state dict -> real FVD")
    p.add_argument("--pred-depth")
    p.add_argument("--gt-depth")
    p.add_argument("--max-items", type=int, default=256)
    p.add_argument("--output", default="metrics.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lkgd_tpu.eval import metrics as M

    gen = _load_dir(args.generated, args.max_items)
    ref = _load_dir(args.reference, args.max_items)
    results = {}

    # paired pixel metrics on the overlap
    pairs = min(len(gen), len(ref))
    if pairs and gen[0].shape == ref[0].shape:
        ps, ss = [], []
        for g, r in zip(gen[:pairs], ref[:pairs]):
            ps.append(float(M.psnr(jnp.asarray(g), jnp.asarray(r))))
            ss.append(float(M.ssim(jnp.asarray(g), jnp.asarray(r))))
        results["psnr"] = float(np.mean(ps))
        results["ssim"] = float(np.mean(ss))

    # CLIP features -> FID (frames) + FVD (per-video mean feature)
    from lkgd_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection

    clip = CLIPVisionModelWithProjection(CLIPVisionConfig(), dtype=jnp.float32)
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    if args.weights:
        path = os.path.join(args.weights, "image_encoder.safetensors")
        if os.path.exists(path):
            from lkgd_tpu.utils import porting

            params = porting.port_clip_vision(porting.load_safetensors(path), params,
                                              strict=False)
    extract = M.make_clip_feature_extractor(clip, params)

    def feats(videos):
        frame_feats, video_feats = [], []
        for v in videos:
            f = np.asarray(extract(jnp.asarray(v)))
            frame_feats.append(f)
            video_feats.append(f.mean(0))
        return np.concatenate(frame_feats), np.stack(video_feats)

    if gen and ref:
        gf, gv = feats(gen)
        rf, rv = feats(ref)
        results["clip_fid"] = M.fid_from_features(rf, gf)
        if len(gv) > 1 and len(rv) > 1:
            results["clip_fvd"] = M.fvd_from_features(rv, gv)

    # real (published-comparable) FID / FVD, given ported extractor weights
    if gen and ref and args.inception_weights:
        from lkgd_tpu.eval import fid_inception

        ip = fid_inception.port_torch_state_dict(_load_state_dict(args.inception_weights))
        ex = fid_inception.make_fid_feature_extractor(ip)
        gf = np.concatenate([np.asarray(ex(jnp.asarray(v))) for v in gen])
        rf = np.concatenate([np.asarray(ex(jnp.asarray(v))) for v in ref])
        results["fid"] = M.fid_from_features(rf, gf)
    if gen and ref and args.i3d_weights and len(gen) > 1 and len(ref) > 1:
        from lkgd_tpu.eval import i3d as i3d_mod
        from lkgd_tpu.ops.resize import resize_with_antialiasing

        ip = i3d_mod.port_torch_state_dict(_load_state_dict(args.i3d_weights))
        ex = i3d_mod.make_fvd_feature_extractor(ip)

        def vfeat(v):
            x = jnp.asarray(v)[None]  # (1, T, H, W, 3)
            x = resize_with_antialiasing(
                x.reshape((-1,) + x.shape[2:]), (224, 224)).reshape(
                x.shape[:2] + (224, 224, 3))
            return np.asarray(ex(x))[0]

        gv = np.stack([vfeat(v) for v in gen])
        rv = np.stack([vfeat(v) for v in ref])
        results["fvd"] = M.fvd_from_features(rv, gv)

    if args.pred_depth and args.gt_depth:
        import jax.numpy as jnp

        pred = np.stack([np.mean(x[0], -1) for x in _load_dir(args.pred_depth, args.max_items)])
        gt = np.stack([np.mean(x[0], -1) for x in _load_dir(args.gt_depth, args.max_items)])
        results.update(M.depth_metrics(jnp.asarray(pred), jnp.asarray(gt)))

    print(json.dumps(results, indent=2))
    with open(args.output, "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
