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
