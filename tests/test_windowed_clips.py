"""Windowed clip corpus loader (torchvision VideoClips analog) — synthetic-corpus
tests incl. corrupt-file tolerance and the decode-failure retry loop.

Reference parity targets: Panda `/root/reference/utils/dataset.py:497-669` (windows of
sample_n_frames+1 every 32 frames, sibling .txt captions) and MSRVTT `:747-867`
(16-frame windows at stride 1 on a 7 fps resampled timeline, json captions)."""

import json
import os

import numpy as np
import pytest

from lkgd_tpu.data.datasets import VideoClipIndex, WindowedClipDataset, panda_dataset
from lkgd_tpu.data.video_io import probe_video, write_video


def _make_video(path, n_frames, h=24, w=32, fps=14):
    """Each frame filled with a distinct intensity so window starts are checkable
    through the lossy codec (levels 50 apart >> mp4v noise)."""
    levels = (np.arange(n_frames) % 5) * 0.2 + 0.1
    frames = np.broadcast_to(levels[:, None, None, None], (n_frames, h, w, 3))
    write_video(path, frames.astype(np.float32), fps=fps)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    _make_video(str(root / "a.mp4"), 48)
    _make_video(str(root / "b.mp4"), 20)
    _make_video(str(root / "c.mp4"), 6)  # shorter than one window -> zero clips
    (root / "bad.mp4").write_bytes(b"not a video at all")  # corrupt -> zero clips
    (root / "a.txt").write_text("a caption about video a")
    (root / "b.txt").write_text("b caption")
    paths = [str(root / n) for n in ("a.mp4", "b.mp4", "c.mp4", "bad.mp4")]
    (root / "video_files.json").write_text(json.dumps(paths))
    return root, paths


class TestVideoClipIndex:
    def test_enumeration_and_corrupt_tolerance(self, corpus):
        root, paths = corpus
        idx = VideoClipIndex(paths, clip_length=15, frames_between_clips=32)
        # a: starts 0, 32 (48-15=33 >= 32); b: start 0; c/bad: none
        assert idx.num_clips() == 3
        assert idx.frames[2] == 6 and idx.frames[3] == 0

    def test_get_clip_window_content(self, corpus):
        root, paths = corpus
        idx = VideoClipIndex(paths, clip_length=15, frames_between_clips=32)
        frames, info, vi = idx.get_clip(1)  # video a, start 32
        assert frames.shape == (15, 24, 32, 3)
        assert vi == 0 and info["video_fps"] == pytest.approx(14.0)
        # frame 32 has level (32 % 5)*0.2+0.1 = 0.5; frame 33 -> 0.7
        assert abs(frames[0].mean() - 0.5) < 0.06
        assert abs(frames[1].mean() - 0.7) < 0.06

    def test_metadata_cache_roundtrip(self, corpus, tmp_path):
        root, paths = corpus
        cache = str(tmp_path / "clips.json")
        idx1 = VideoClipIndex(paths, 15, 32, cache_path=cache)
        assert os.path.exists(cache)
        # poison the probe: a cache hit must not re-probe
        import lkgd_tpu.data.video_io as vio

        orig = vio.probe_video
        try:
            vio.probe_video = lambda p: (_ for _ in ()).throw(RuntimeError("re-probed"))
            idx2 = VideoClipIndex(paths, 15, 32, cache_path=cache)
        finally:
            vio.probe_video = orig
        assert idx2.num_clips() == idx1.num_clips()
        assert idx2.frames == idx1.frames

    def test_frame_rate_resampling(self, corpus):
        root, paths = corpus
        idx = VideoClipIndex(paths[:1], clip_length=16, frames_between_clips=1,
                             frame_rate=7.0)
        # 48 native frames at 14 fps -> 24 resampled frames -> 9 windows of 16
        assert idx.num_clips() == 9
        frames, info, _ = idx.get_clip(0)
        assert frames.shape[0] == 16
        assert info["video_fps"] == pytest.approx(7.0)
        # resampled frame 1 reads original frame floor(1*14/7) = 2 -> level 0.5
        assert abs(frames[1].mean() - 0.5) < 0.06


class TestWindowedClipDataset:
    def test_panda_style_sample(self, corpus):
        root, paths = corpus
        ds = panda_dataset(str(root), sample_size=16, sample_n_frames=14,
                           cache_path=None)
        assert len(ds) == 3
        s = ds[0]
        assert s["pixel_values"].shape == (15, 16, 16, 3)
        assert s["pixel_values"].min() >= -1.0 and s["pixel_values"].max() <= 1.0
        assert s["caption"] == "a caption about video a"
        assert float(s["fps"]) == pytest.approx(14.0)

    def test_decode_failure_retries_another_clip(self, corpus, monkeypatch):
        root, paths = corpus
        ds = WindowedClipDataset(paths, sample_size=16, sample_n_frames=14,
                                 frames_between_clips=32, flip=False)
        calls = []
        orig = VideoClipIndex.get_clip

        def flaky(self, idx):
            calls.append(idx)
            if len(calls) < 3:
                raise ValueError("transient decode failure")
            return orig(self, idx)

        monkeypatch.setattr(VideoClipIndex, "get_clip", flaky)
        s = ds[0]
        assert len(calls) == 3  # two failures, then a successful retry
        assert s["pixel_values"].shape == (15, 16, 16, 3)

    def test_msrvtt_style_captions(self, corpus, tmp_path):
        root, paths = corpus
        cap = tmp_path / "caps.json"
        cap.write_text(json.dumps({"a": "json caption A", "b": "json caption B"}))
        ds = WindowedClipDataset(paths[:2], sample_size=16, sample_n_frames=16,
                                 frames_between_clips=1, frame_rate=7.0,
                                 caption_file=str(cap), extra_frames=0)
        s = ds[0]
        assert s["caption"] == "json caption A"
        assert s["pixel_values"].shape == (16, 16, 16, 3)


def test_probe_video_matches_written_count(corpus):
    root, paths = corpus
    n, fps = probe_video(paths[1])
    assert n == 20 and fps == pytest.approx(14.0)
