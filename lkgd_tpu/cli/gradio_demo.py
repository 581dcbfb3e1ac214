"""Gradio demos — `gradios/gradio_svd_trans*.py` analog.

Launches an interactive UI over the trans/base pipelines. Gradio is an optional
dependency (not in the TPU image); without it the demo falls back to the
dependency-free stdlib server in :mod:`lkgd_tpu.cli.web_demo` (same controls, same
pipeline adapter), so the demo component works in every environment.

  python -m lkgd_tpu.cli.gradio_demo --weights ckpts/ [--mode trans]
"""

from __future__ import annotations

import argparse


def build_demo(pipe, params, mode: str):
    import gradio as gr
    import jax
    import numpy as np

    from lkgd_tpu.data.video_io import process_frames, write_video

    def generate(image, end_image, seed, motion_bucket_id, fps):
        img = process_frames(np.asarray(image, np.float32)[None] / 255.0,
                             pipe.config.height, pipe.config.width)[0]
        rng = jax.random.PRNGKey(int(seed))
        if mode == "trans" and end_image is not None:
            eimg = process_frames(np.asarray(end_image, np.float32)[None] / 255.0,
                                  pipe.config.height, pipe.config.width)[0]
            video = pipe(params, img, eimg, rng=rng)[0]
        else:
            video = pipe(params, img[None], rng=rng)[0]
        out = "/tmp/gradio_out.mp4"
        write_video(out, video, fps=int(fps))
        return out

    inputs = [gr.Image(label="start frame"),
              gr.Image(label="end frame (trans mode)", visible=(mode == "trans")),
              gr.Number(value=23123134, label="seed"),
              gr.Slider(1, 255, value=127, label="motion bucket"),
              gr.Slider(1, 30, value=7, label="fps")]
    return gr.Interface(fn=generate, inputs=inputs, outputs=gr.Video(),
                        title=f"LKGD-TPU {mode}")


def build_cli_config(args):
    """The inference-CLI config both demo front-ends build their pipeline from."""

    class A:  # reuse the inference CLI's builders
        mode = args.mode
        num_frames = args.num_frames
        height, width = args.height, args.width
        num_inference_steps = 25
        min_guidance_scale, max_guidance_scale = 1.0, 3.0
        fps, motion_bucket_id, noise_aug_strength = 7, 127, 0.02
        decode_chunk_size = 2
        joint_mask, post_joint = "0,1,0,1", "conv"
        flip = temporal = nospatial = False
        lora_rank = 0
        knowledge_fusion = False
        weights = args.weights
        seed = 23123134

    return A


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["base", "trans"], default="base")
    p.add_argument("--weights")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    try:
        import gradio  # noqa: F401
        have_gradio = True
    except ImportError:
        print("gradio not installed — serving the stdlib web demo instead")
        have_gradio = False

    from lkgd_tpu.cli.run_inference_svd import build_pipeline, load_params

    cfg = build_cli_config(args)
    pipe = build_pipeline(cfg)
    params = load_params(pipe, cfg)
    if have_gradio:
        build_demo(pipe, params, args.mode).launch(server_port=args.port)
    else:
        from lkgd_tpu.cli import web_demo

        web_demo.serve(web_demo.build_generate_fn(pipe, params, args.mode),
                       args.mode, args.port)


if __name__ == "__main__":
    main()
