"""Corpus-wrangling walkthrough — `CogVideo-main/video_process.ipynb` analog.

The reference notebook explores a video corpus before training: globbing clips,
reading shapes/fps, windowing long videos into training clips, grouping by
resolution. The same flow with the in-tree data stack:

  1. index a folder of videos into fixed-length windows (`data/datasets.py`
     VideoClipIndex / WindowedClipDataset — the torchvision VideoClips analog);
  2. print corpus statistics (clips per video, resolutions, fps);
  3. demonstrate bucketed loading (one jit compile per resolution bucket).

  python examples/video_process.py --input data/videos
  python examples/video_process.py                 # synthetic corpus in /tmp
"""

from __future__ import annotations

import argparse
import collections
import os


def _make_synthetic_corpus(root, n=3):
    import numpy as np

    from lkgd_tpu.data.video_io import write_video

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i, (h, w, t) in enumerate([(64, 64, 20), (64, 96, 14), (64, 64, 30)][:n]):
        frames = rng.uniform(size=(t, h, w, 3)).astype("float32")
        write_video(os.path.join(root, f"clip{i}.mp4"), frames, fps=8)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="folder of .mp4; synthetic corpus if absent")
    p.add_argument("--frames-per-clip", type=int, default=8)
    p.add_argument("--stride", type=int, default=4)
    args = p.parse_args()

    import glob

    from lkgd_tpu.data.datasets import VideoClipIndex, WindowedClipDataset
    from lkgd_tpu.data.video_io import read_video_frames

    root = args.input or _make_synthetic_corpus("/tmp/lkgd_example_corpus")
    paths = sorted(glob.glob(os.path.join(root, "*.mp4")))

    # ---- 1. windowed clip index (the torchvision VideoClips analog; probes each
    # video once, caches metadata to JSON like VideoClips' .cache)
    index = VideoClipIndex(paths, clip_length=args.frames_per_clip,
                           frames_between_clips=args.stride,
                           cache_path=os.path.join(root, ".clip_index.json"))
    print(f"corpus: {len(paths)} videos -> {index.num_clips()} "
          f"{args.frames_per_clip}-frame windows (stride {args.stride})")

    # ---- 2. statistics
    shapes = collections.Counter()
    for v in paths:
        frames, fps = read_video_frames(v)
        shapes[(frames.shape[1], frames.shape[2])] += 1
        print(f"  {os.path.basename(v)}: {frames.shape[0]}f "
              f"{frames.shape[1]}x{frames.shape[2]} @ {fps:.0f} fps")
    print("resolution histogram:", dict(shapes))

    # ---- 3. windowed dataset sample (what the trainers consume)
    ds = WindowedClipDataset(paths, sample_size=(64, 64),
                             sample_n_frames=args.frames_per_clip,
                             frames_between_clips=args.stride)
    sample = ds[0]
    pv = sample["pixel_values"]
    print(f"dataset[0]: pixel_values {pv.shape} in "
          f"[{float(pv.min()):.2f}, {float(pv.max()):.2f}], "
          f"caption={sample['caption']!r}")


if __name__ == "__main__":
    main()
