"""Training datasets — host-side numpy pipelines feeding the device via PrefetchLoader.

Re-implements the reference's dataset zoo (`/root/reference/utils/dataset.py`):
  * MiniDataset (:687-744) — the LKGD fine-tune loader: every mp4 in a folder cached in
    RAM x repeat_num, random frame interval/start, [-1,1] normalize, random h-flip
  * WebVidCSV (:203-358) — CSV-indexed clips with fps-targeted intervals + retry loop
  * FramesFlowDataset (DAVIS, :360-472) — frame folders + precomputed .flo flow with
    flow-derived motion buckets
  * JsonVideoDataset (PandaN, :869-995) — json-indexed clips
  * MixDataset (:671-685) — round-robin concatenation
  * CaptionedClipDataset (MSRVTT, :747-867) — captioned clips

Everything returns numpy dicts; batching/prefetch/device-put happens in PrefetchLoader
(the accelerate DataLoader analog, with a background thread instead of worker processes —
decode cost here is small because clips are RAM-cached like the reference's MiniDataset).
"""

from __future__ import annotations

import csv
import glob
import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from lkgd_tpu.data.video_io import process_frames, read_flo, read_image, read_video_frames


class MiniDataset:
    """All mp4s in a folder, RAM-cached (reference :687-744)."""

    def __init__(self, video_folder: str, repeat_num: int = 10, sample_size=512,
                 sample_n_frames: int = 25):
        files = sorted(glob.glob(os.path.join(video_folder, "*.mp4")))
        if not files:
            raise FileNotFoundError(f"no mp4 files in {video_folder}")
        self.clips: List[Tuple[np.ndarray, float]] = []
        for f in files:
            frames, fps = read_video_frames(f)
            self.clips.append((frames, fps))
        self.clips = self.clips * repeat_num
        self.sample_size = (sample_size, sample_size) if isinstance(sample_size, int) \
            else tuple(sample_size)
        self.sample_n_frames = sample_n_frames

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng()
        frames, fps = self.clips[idx]
        frame_len = len(frames)
        sample_len = self.sample_n_frames + 1
        if frame_len < sample_len:
            raise ValueError(f"need {sample_len} frames, clip has {frame_len}")
        interval = int(rng.integers(1, max(frame_len // sample_len, 1) + 1))
        fps = fps / interval
        start = int(rng.integers(0, max(frame_len - sample_len * interval, 0) + 1))
        sel = frames[start:start + sample_len * interval:interval]
        pixel_values = process_frames(sel, *self.sample_size)
        if rng.random() < 0.5:
            pixel_values = pixel_values[:, :, ::-1].copy()
        return {"pixel_values": pixel_values * 2.0 - 1.0, "fps": np.float32(fps)}


class WebVidCSV:
    """CSV-indexed video clips with retry-on-bad-sample (reference :203-358)."""

    def __init__(self, csv_path: str, video_folder: str, sample_size=512,
                 sample_n_frames: int = 14, target_fps: float = 7.0):
        with open(csv_path) as f:
            self.rows = list(csv.DictReader(f))
        self.video_folder = video_folder
        self.sample_size = (sample_size, sample_size) if isinstance(sample_size, int) \
            else tuple(sample_size)
        self.sample_n_frames = sample_n_frames
        self.target_fps = target_fps

    def __len__(self) -> int:
        return len(self.rows)

    def _load(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.rows[idx]
        rel = row.get("path") or os.path.join(str(row.get("page_dir", "")),
                                              f"{row['videoid']}.mp4")
        frames, fps = read_video_frames(os.path.join(self.video_folder, rel))
        interval = max(int(round(fps / self.target_fps)), 1)
        rng = np.random.default_rng()
        need = self.sample_n_frames * interval
        if len(frames) < need:
            interval = max(len(frames) // self.sample_n_frames, 1)
            need = self.sample_n_frames * interval
        start = int(rng.integers(0, max(len(frames) - need, 0) + 1))
        sel = frames[start:start + need:interval][: self.sample_n_frames]
        pixel_values = process_frames(sel, *self.sample_size)
        out = {"pixel_values": pixel_values * 2.0 - 1.0,
               "fps": np.float32(fps / interval)}
        if "name" in row:
            out["caption"] = row["name"]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        for attempt in range(8):  # retry loop (reference :257-271)
            try:
                return self._load((idx + attempt) % len(self))
            except Exception:
                continue
        raise RuntimeError(f"failed to load any sample near index {idx}")


class FramesFlowDataset:
    """Frame folders + precomputed .flo flow (DAVIS-style, reference :360-472)."""

    def __init__(self, root: str, flow_root: Optional[str] = None, sample_size=512,
                 sample_n_frames: int = 14):
        self.seqs = sorted(d for d in glob.glob(os.path.join(root, "*")) if os.path.isdir(d))
        if not self.seqs:
            raise FileNotFoundError(f"no sequence dirs in {root}")
        self.flow_root = flow_root
        self.sample_size = (sample_size, sample_size) if isinstance(sample_size, int) \
            else tuple(sample_size)
        self.sample_n_frames = sample_n_frames

    def __len__(self) -> int:
        return len(self.seqs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        seq = self.seqs[idx]
        files = sorted(glob.glob(os.path.join(seq, "*.jpg"))
                       + glob.glob(os.path.join(seq, "*.png")))
        rng = np.random.default_rng()
        start = int(rng.integers(0, max(len(files) - self.sample_n_frames, 0) + 1))
        files = files[start:start + self.sample_n_frames]
        frames = np.stack([read_image(f) for f in files])
        pixel_values = process_frames(frames, *self.sample_size)
        out = {"pixel_values": pixel_values * 2.0 - 1.0, "fps": np.float32(7.0)}
        if self.flow_root is not None:
            name = os.path.basename(seq)
            flo_files = sorted(glob.glob(os.path.join(self.flow_root, name, "*.flo")))
            flo_files = flo_files[start:start + self.sample_n_frames - 1]
            if flo_files:
                flows = np.stack([read_flo(f) for f in flo_files])
                out["flow"] = flows
                # flow-derived motion bucket (reference :35-39)
                strength = float(np.linalg.norm(flows, axis=-1).mean())
                out["motion_bucket_id"] = np.int32(min(300, int((1 + strength / 3.5) * 127)))
        return out


class JsonVideoDataset:
    """json-indexed clips: [{"path": ..., "caption": ...}, ...] (PandaN-style, :869-995)."""

    def __init__(self, json_path: str, video_folder: str = "", sample_size=512,
                 sample_n_frames: int = 14):
        with open(json_path) as f:
            self.items = json.load(f)
        self.video_folder = video_folder
        self.sample_size = (sample_size, sample_size) if isinstance(sample_size, int) \
            else tuple(sample_size)
        self.sample_n_frames = sample_n_frames

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.items[idx]
        frames, fps = read_video_frames(os.path.join(self.video_folder, item["path"]))
        rng = np.random.default_rng()
        start = int(rng.integers(0, max(len(frames) - self.sample_n_frames, 0) + 1))
        sel = frames[start:start + self.sample_n_frames]
        out = {"pixel_values": process_frames(sel, *self.sample_size) * 2.0 - 1.0,
               "fps": np.float32(fps)}
        if "caption" in item:
            out["caption"] = item["caption"]
        return out


CaptionedClipDataset = JsonVideoDataset  # MSRVTT-style usage is json/csv + captions


class VideoClipIndex:
    """torchvision ``VideoClips`` analog: a precomputed per-video frame index that
    enumerates every fixed-length clip window across a corpus (reference Panda/MSRVTT,
    `utils/dataset.py:514-527,764-771`).

    Each video is probed ONCE (frame count + fps, thread-pooled); the metadata caches
    to ``cache_path`` as JSON so re-runs over a multi-thousand-video corpus skip the
    probe (the reference torch.save's VideoClips.metadata to .cache/). Videos that
    fail to probe, or are shorter than one window, contribute zero clips (corrupt-file
    tolerance — the reference's retry loop analog at index-build time).

    ``frame_rate``: when set, each video's timeline is resampled to that rate before
    windowing (VideoClips semantics: resampled index i reads original frame
    floor(i * native_fps / frame_rate)), so every clip has uniform temporal density.
    """

    def __init__(self, video_paths: Sequence[str], clip_length: int,
                 frames_between_clips: int = 1, frame_rate: Optional[float] = None,
                 cache_path: Optional[str] = None, num_workers: int = 16):
        from lkgd_tpu.data.video_io import probe_video

        self.video_paths = list(video_paths)
        self.clip_length = clip_length
        self.stride = frames_between_clips
        self.frame_rate = frame_rate

        meta: Optional[Dict[str, List]] = None
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                cached = json.load(f)
            if cached.get("paths") == self.video_paths:
                meta = cached
        if meta is None:
            from concurrent.futures import ThreadPoolExecutor

            def probe(p):
                try:
                    return probe_video(p)
                except Exception:
                    return (0, 0.0)  # corrupt/unreadable -> zero clips

            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                results = list(pool.map(probe, self.video_paths))
            meta = {"paths": self.video_paths,
                    "frames": [r[0] for r in results],
                    "fps": [r[1] for r in results]}
            if cache_path:
                os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
                with open(cache_path, "w") as f:
                    json.dump(meta, f)
        self.frames = list(meta["frames"])
        self.fps = list(meta["fps"])

        # flat clip table: (video_idx, start_frame-in-resampled-timeline)
        self._clips: List[Tuple[int, int]] = []
        for vi, n in enumerate(self.frames):
            eff = n if frame_rate is None or self.fps[vi] <= 0 else int(
                n * frame_rate / self.fps[vi])
            for s in range(0, eff - clip_length + 1, self.stride):
                self._clips.append((vi, s))

    def num_clips(self) -> int:
        return len(self._clips)

    def __len__(self) -> int:
        return len(self._clips)

    def get_clip(self, idx: int) -> Tuple[np.ndarray, Dict[str, float], int]:
        """(frames (L, H, W, 3) [0,1], info {"video_fps"}, video_idx)."""
        from lkgd_tpu.data.video_io import read_video_range

        vi, s = self._clips[idx]
        path = self.video_paths[vi]
        native = self.fps[vi]
        if self.frame_rate is None:
            frames = read_video_range(path, s, s + self.clip_length)
            fps = native
        else:
            # resampled timeline -> original frame indices
            idxs = np.floor((s + np.arange(self.clip_length))
                            * native / self.frame_rate).astype(int)
            idxs = np.minimum(idxs, self.frames[vi] - 1)
            lo, hi = int(idxs[0]), int(idxs[-1]) + 1
            block = read_video_range(path, lo, hi)
            frames = block[np.minimum(idxs - lo, len(block) - 1)]
            fps = self.frame_rate
        return frames, {"video_fps": fps}, vi


class WindowedClipDataset:
    """Windowed corpus loader (reference Panda `utils/dataset.py:497-669` / MSRVTT
    `:747-867`): every ``sample_n_frames(+1)``-frame window across the corpus is one
    sample, with the sibling-file or json caption attached.

    ``caption_file``: json {video_basename: caption} (MSRVTT style); None reads a
    ``.txt`` next to each video (Panda style). Decode failures retry a different clip
    (the reference's while-loop), bounded at 8 attempts."""

    def __init__(self, video_paths: Sequence[str], sample_size=512,
                 sample_n_frames: int = 14, frames_between_clips: int = 32,
                 frame_rate: Optional[float] = None,
                 caption_file: Optional[str] = None,
                 cache_path: Optional[str] = None, flip: bool = True,
                 extra_frames: int = 1):
        self.index = VideoClipIndex(video_paths, sample_n_frames + extra_frames,
                                    frames_between_clips, frame_rate, cache_path)
        self.sample_size = (sample_size, sample_size) if isinstance(sample_size, int) \
            else tuple(sample_size)
        self.sample_n_frames = sample_n_frames
        self.flip = flip
        self.captions = None
        if caption_file:
            with open(caption_file) as f:
                self.captions = json.load(f)

    def __len__(self) -> int:
        return self.index.num_clips()

    def _caption(self, video_idx: int) -> str:
        path = self.index.video_paths[video_idx]
        if self.captions is not None:
            key = os.path.splitext(os.path.basename(path))[0]
            return self.captions.get(key, "")
        txt = os.path.splitext(path)[0] + ".txt"
        if os.path.exists(txt):
            with open(txt) as f:
                return f.read()
        return ""

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng()
        for _attempt in range(8):
            try:
                frames, info, vi = self.index.get_clip(idx)
                break
            except Exception:
                idx = int(rng.integers(0, len(self.index)))
        else:
            raise RuntimeError("8 consecutive clip decode failures")
        pixel_values = process_frames(frames, *self.sample_size)
        if self.flip and rng.random() < 0.5:
            pixel_values = pixel_values[:, :, ::-1].copy()
        return {"pixel_values": pixel_values * 2.0 - 1.0,
                "fps": np.float32(info["video_fps"]),
                "caption": self._caption(vi)}


def panda_dataset(video_folder: str, sample_size=512, sample_n_frames: int = 14,
                  cache_path: Optional[str] = ".cache/panda.clips.json"):
    """Panda-70M loader (reference :497-669): video_files.json list, (n+1)-frame
    windows every 32 frames, caption in the sibling .txt."""
    with open(os.path.join(video_folder, "video_files.json")) as f:
        paths = json.load(f)
    return WindowedClipDataset(paths, sample_size, sample_n_frames,
                               frames_between_clips=32, cache_path=cache_path)


def msrvtt_dataset(video_folder: str, caption_file: str, sample_size=512,
                   clip_length: int = 16,
                   cache_path: Optional[str] = ".cache/msrvtt.clips.json"):
    """MSRVTT loader (reference :747-867): every mp4 in the folder, 16-frame windows
    at stride 1 on a 7 fps resampled timeline, captions from the json file."""
    paths = sorted(glob.glob(os.path.join(video_folder, "*.mp4")))
    return WindowedClipDataset(paths, sample_size, clip_length,
                               frames_between_clips=1, frame_rate=7.0,
                               caption_file=caption_file, cache_path=cache_path,
                               extra_frames=0)


class MixDataset:
    """Round-robin concat (reference :671-685)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx: int):
        d = self.datasets[idx % len(self.datasets)]
        return d[(idx // len(self.datasets)) % len(d)]


class PrefetchLoader:
    """Shuffled, batched, background-prefetched loader -> device arrays.

    The accelerate-DataLoader analog: one decode thread keeps ``prefetch`` batches queued;
    batches are stacked numpy dicts optionally device_put with a sharding."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 2, sharding=None, drop_keys: Sequence[str] = ("caption",)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.sharding = sharding
        self.drop_keys = set(drop_keys)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        n = (len(idx) // self.batch_size) * self.batch_size
        return idx[:n].reshape(-1, self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import jax

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = 0
            while not stop.is_set():
                for batch_idx in self._epoch_indices(epoch):
                    if stop.is_set():
                        return
                    samples = [self.dataset[int(i)] for i in batch_idx]
                    batch = {}
                    for k in samples[0]:
                        if k in self.drop_keys:
                            batch[k] = [s[k] for s in samples]
                        else:
                            batch[k] = np.stack([np.asarray(s[k]) for s in samples])
                    q.put(batch)
                epoch += 1
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if self.sharding is not None:
                    batch = {k: (jax.device_put(v, self.sharding)
                                 if isinstance(v, np.ndarray) else v)
                             for k, v in batch.items()}
                yield batch
        finally:
            stop.set()


class BucketedLoader:
    """Resolution-bucketed batching (reference CogVideo
    `finetune/datasets/bucket_sampler.py:10-60`): samples are grouped by their
    pixel_values shape so every emitted batch is shape-homogeneous — under jit each bucket
    compiles once and is reused (the TPU-native reading of bucketed sampling).

    Wraps any dataset; batches are emitted when a bucket fills.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 key: str = "pixel_values", drop_keys: Sequence[str] = ("caption",)):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.key = key
        self.drop_keys = set(drop_keys)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(len(self.dataset))
        epoch = 0
        buckets: Dict[tuple, list] = {}
        while True:
            order = idx.copy()
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(order)
            for i in order:
                sample = self.dataset[int(i)]
                shape = tuple(np.asarray(sample[self.key]).shape)
                buckets.setdefault(shape, []).append(sample)
                if len(buckets[shape]) == self.batch_size:
                    samples = buckets.pop(shape)
                    batch = {}
                    for k in samples[0]:
                        if k in self.drop_keys:
                            batch[k] = [s[k] for s in samples]
                        else:
                            batch[k] = np.stack([np.asarray(s[k]) for s in samples])
                    yield batch
            epoch += 1
