"""OpenPose body estimator — the ``openpose`` ControlNet preprocessor.

The reference's ``openpose_prepreocess`` (`/root/reference/utils/controlnet_utils.py:93-97`)
runs ``controlnet_aux`` OpenposeDetector: the CMU 2-branch CPM (``bodypose_model``) that
emits 38 part-affinity-field channels + 19 keypoint heatmaps, followed by numpy peak
finding, PAF-scored limb matching, and skeleton rendering. Checkpoint weights
(``body_pose_model.pth``) are external; this module is the TPU-native architecture + a
porter keyed to the exact controlnet_aux state-dict naming
(``model0.conv1_1 ... model6_2.Mconv7_stage6_L2``), so real weights drop straight in.

TPU design: channels-last NHWC convs (XLA MXU path, static shapes), one jitted forward
for the whole 6-stage cascade; the host-side decoding (peaks/matching/drawing) is
classical numpy, mirroring the reference's CPU post-pass.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels, kernel, use_relu) per backbone layer; pools are "pool"
_BACKBONE: Tuple = (
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), "pool",
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), "pool",
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3), ("conv3_4", 256, 3),
    "pool",
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
)

# 18 COCO keypoints; limb sequence + the PAF channel pair scoring each limb
# (controlnet_aux util.py limbSeq/mapIdx, 1-indexed there — 0-indexed here)
LIMB_SEQ = ((1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
            (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
            (2, 16), (5, 17))
MAP_IDX = ((12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1), (2, 3),
           (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35), (32, 33),
           (36, 37), (18, 19), (26, 27))
_COLORS = ((255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
           (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
           (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
           (255, 0, 255), (255, 0, 170), (255, 0, 85))


@dataclasses.dataclass(frozen=True)
class OpenPoseConfig:
    stages: int = 6
    paf_channels: int = 38
    heatmap_channels: int = 19
    stride: int = 8  # 3 pools -> heatmaps at 1/8 resolution


class BodyPoseModel(nn.Module):
    """(B, H, W, 3) in [-0.5, 0.5] (pixel/256 - 0.5) -> (pafs (B,h,w,38),
    heatmaps (B,h,w,19)) at stride 8 — controlnet_aux ``bodypose_model``."""

    config: OpenPoseConfig = OpenPoseConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        for spec in _BACKBONE:
            if spec == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                name, ch, k = spec
                x = nn.relu(nn.Conv(ch, (k, k), padding=k // 2, dtype=self.dtype,
                                    name=f"model0_{name}")(x))
        feats = x

        def branch(h, stage: int, l_idx: int, out_ch: int):
            scope = f"model{stage}_{l_idx}"
            if stage == 1:
                for i in (1, 2, 3):
                    h = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                                        name=f"{scope}_conv5_{i}_CPM_L{l_idx}")(h))
                h = nn.relu(nn.Conv(512, (1, 1), dtype=self.dtype,
                                    name=f"{scope}_conv5_4_CPM_L{l_idx}")(h))
                return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                               name=f"{scope}_conv5_5_CPM_L{l_idx}")(h)
            for i in (1, 2, 3, 4, 5):
                h = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                                    name=f"{scope}_Mconv{i}_stage{stage}_L{l_idx}")(h))
            h = nn.relu(nn.Conv(128, (1, 1), dtype=self.dtype,
                                name=f"{scope}_Mconv6_stage{stage}_L{l_idx}")(h))
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           name=f"{scope}_Mconv7_stage{stage}_L{l_idx}")(h)

        paf = branch(feats, 1, 1, cfg.paf_channels)
        heat = branch(feats, 1, 2, cfg.heatmap_channels)
        for stage in range(2, cfg.stages + 1):
            h_in = jnp.concatenate([paf, heat, feats], axis=-1)
            paf = branch(h_in, stage, 1, cfg.paf_channels)
            heat = branch(h_in, stage, 2, cfg.heatmap_channels)
        return paf, heat


def port_openpose_body(state_dict, config: OpenPoseConfig = OpenPoseConfig()) -> dict:
    """controlnet_aux ``body_pose_model.pth`` state dict (numpy, keys like
    ``model1_1.conv5_1_CPM_L1.weight``) -> flax params. Conv (O,I,kh,kw)->(kh,kw,I,O)."""
    params: Dict[str, dict] = {}
    for key, w in state_dict.items():
        module, pname, leaf = key.split(".")  # e.g. model0 . conv1_1 . weight
        w = np.asarray(w, np.float32)
        flax_name = f"{module}_{pname}"
        entry = params.setdefault(flax_name, {})
        if leaf == "weight":
            entry["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        else:
            entry["bias"] = jnp.asarray(w)
    return {"params": params}


# ------------------------------------------------------------------ host decoding
def find_peaks(heatmaps: np.ndarray, threshold: float = 0.1) -> List[List[Tuple]]:
    """Per-channel local maxima above threshold on gaussian-smoothed (H, W, 19) maps.
    Returns, per part channel (18, background dropped), a list of
    (x, y, score, global_peak_id)."""
    import cv2

    all_peaks: List[List[Tuple]] = []
    peak_id = 0
    for part in range(heatmaps.shape[-1] - 1):
        m = cv2.GaussianBlur(heatmaps[..., part], (0, 0), 3)
        up = np.zeros_like(m); up[1:, :] = m[:-1, :]
        down = np.zeros_like(m); down[:-1, :] = m[1:, :]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        is_peak = ((m >= up) & (m >= down) & (m >= left) & (m >= right)
                   & (m > threshold))
        ys, xs = np.nonzero(is_peak)
        peaks = []
        for x, y in zip(xs, ys):
            peaks.append((int(x), int(y), float(heatmaps[y, x, part]), peak_id))
            peak_id += 1
        all_peaks.append(peaks)
    return all_peaks


def match_limbs(pafs: np.ndarray, all_peaks: List[List[Tuple]], image_h: int,
                n_samples: int = 10, score_threshold: float = 0.05):
    """Greedy PAF line-integral matching (controlnet_aux util.py:78-141). Returns
    ``connection_all``: per limb a list of (peak_id_a, peak_id_b, score, ia, ib)."""
    connection_all = []
    for limb, (ka, kb) in enumerate(LIMB_SEQ):
        paf_xy = pafs[..., list(MAP_IDX[limb])]
        cand_a, cand_b = all_peaks[ka], all_peaks[kb]
        if not cand_a or not cand_b:
            connection_all.append([])
            continue
        candidates = []
        for ia, a in enumerate(cand_a):
            for ib, b in enumerate(cand_b):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float32)
                norm = max(float(np.linalg.norm(vec)), 1e-4)
                vec = vec / norm
                xs = np.round(np.linspace(a[0], b[0], n_samples)).astype(int)
                ys = np.round(np.linspace(a[1], b[1], n_samples)).astype(int)
                scores = (pafs[ys, xs, MAP_IDX[limb][0]] * vec[0]
                          + pafs[ys, xs, MAP_IDX[limb][1]] * vec[1])
                # distance prior: long limbs need stronger support
                prior = min(0.5 * image_h / norm - 1, 0.0)
                mean_score = float(scores.mean()) + prior
                if (scores > score_threshold).sum() > 0.8 * n_samples and mean_score > 0:
                    candidates.append((ia, ib, mean_score,
                                       mean_score + a[2] + b[2]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        used_a, used_b, conns = set(), set(), []
        for ia, ib, score, _total in candidates:
            if ia not in used_a and ib not in used_b:
                conns.append((cand_a[ia][3], cand_b[ib][3], score, ia, ib))
                used_a.add(ia); used_b.add(ib)
                if len(conns) >= min(len(cand_a), len(cand_b)):
                    break
        connection_all.append(conns)
    return connection_all


def assemble_people(all_peaks, connection_all):
    """Group limb connections into per-person keypoint sets (18 slots of peak ids,
    -1 = missing) — the reference's subset-merging pass."""
    candidate = np.array([p for peaks in all_peaks for p in peaks], np.float32)
    subsets: List[np.ndarray] = []  # each: 18 peak ids + [score, n_parts]
    for limb, conns in enumerate(connection_all):
        ka, kb = LIMB_SEQ[limb]
        for pid_a, pid_b, score, _ia, _ib in conns:
            found = [s for s in subsets if s[ka] == pid_a or s[kb] == pid_b]
            if len(found) == 1:
                s = found[0]
                if s[kb] != pid_b:
                    s[kb] = pid_b
                    s[19] += 1
                    s[18] += candidate[int(pid_b), 2] + score
                elif s[ka] != pid_a:
                    s[ka] = pid_a
                    s[19] += 1
                    s[18] += candidate[int(pid_a), 2] + score
            elif len(found) == 2:  # merge disjoint halves of one person
                s1, s2 = found
                if not np.any((s1[:18] >= 0) & (s2[:18] >= 0)):
                    s1[:18] = np.where(s2[:18] >= 0, s2[:18], s1[:18])
                    s1[18:] += s2[18:]
                    s1[18] += score
                    subsets.remove(s2)
                else:
                    s1[kb] = pid_b
                    s1[19] += 1
                    s1[18] += candidate[int(pid_b), 2] + score
            else:
                s = np.full(20, -1.0)
                s[ka], s[kb] = pid_a, pid_b
                s[19] = 2
                s[18] = candidate[int(pid_a), 2] + candidate[int(pid_b), 2] + score
            if len(found) == 0:
                subsets.append(s)
    # drop weak/small subsets (reference thresholds)
    subsets = [s for s in subsets if s[19] >= 4 and s[18] / s[19] >= 0.4]
    return candidate, subsets


def draw_bodypose(h: int, w: int, candidate: np.ndarray,
                  subsets: Sequence[np.ndarray]) -> np.ndarray:
    """Render the ControlNet-style skeleton: colored limb ellipses + joint dots on
    black, [0,1] (H, W, 3)."""
    import cv2

    canvas = np.zeros((h, w, 3), np.uint8)
    for limb in range(17):
        ka, kb = LIMB_SEQ[limb]
        for s in subsets:
            if s[ka] < 0 or s[kb] < 0:
                continue
            xa, ya = candidate[int(s[ka]), :2]
            xb, yb = candidate[int(s[kb]), :2]
            mx, my = (xa + xb) / 2, (ya + yb) / 2
            length = float(np.hypot(xa - xb, ya - yb))
            angle = float(np.degrees(np.arctan2(ya - yb, xa - xb)))
            poly = cv2.ellipse2Poly((int(mx), int(my)), (int(length / 2), 4), int(angle),
                                    0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, _COLORS[limb])
    canvas = (canvas * 0.6).astype(np.uint8)
    for part in range(18):
        for s in subsets:
            if s[part] < 0:
                continue
            x, y = candidate[int(s[part]), :2]
            cv2.circle(canvas, (int(x), int(y)), 4, _COLORS[part], thickness=-1)
    return canvas.astype(np.float32) / 255.0


def make_openpose_processor(params, config: OpenPoseConfig = OpenPoseConfig(),
                            detect_resolution: int = 368):
    """[0,1] (H, W, 3) -> [0,1] (H, W, 3) skeleton control map for the
    control_preprocess registry (reference ``openpose_prepreocess``)."""
    import cv2

    model = BodyPoseModel(config)

    @jax.jit
    def run(x):
        return model.apply(params, x)

    def processor(image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        scale = detect_resolution / h
        nh = -(-int(h * scale) // config.stride) * config.stride
        nw = -(-int(w * scale) // config.stride) * config.stride
        small = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        paf, heat = run(jnp.asarray(small, np.float32)[None] - 0.5)
        paf = cv2.resize(np.asarray(paf)[0], (w, h), interpolation=cv2.INTER_CUBIC)
        heat = cv2.resize(np.asarray(heat)[0], (w, h), interpolation=cv2.INTER_CUBIC)
        peaks = find_peaks(heat)
        conns = match_limbs(paf, peaks, h)
        candidate, subsets = assemble_people(peaks, conns)
        return draw_bodypose(h, w, candidate, subsets)

    return processor
