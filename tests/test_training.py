"""Trainer loop: end-to-end tiny fine-tune with checkpoint/resume, masked optimizer,
adapter export, data pipeline, gaussian masks, motion helpers."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.configs import LoraRouter, LoraRule, SVDUNetConfig
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.training.train_state import (
    SVDTrainConfig, init_train_state, make_optimizer, make_svd_train_step)
from lkgd_tpu.training.trainer import Trainer, TrainerConfig, export_trainable_safetensors

TINY = SVDUNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1, num_attention_heads=(2, 4), cross_attention_dim=64,
    knowledge_fusion=True,
    lora=LoraRouter(rules=(LoraRule(pattern="*temporal*attn1.*", name="ft", rank=2),)))


def _setup():
    unet = UNetSpatioTemporalCondition(TINY)
    B, T, h, w = 2, 4, 8, 8
    batch = {
        "latents": jnp.ones((B, T, h, w, 4)) * 0.1,
        "cond_latents": jnp.ones((B, h, w, 4)) * 0.2,
        "image_embeddings": jnp.ones((B, 1, 64)),
        "domain_features": jnp.ones((B, 1, 48)),
        "flow_features": jnp.ones((B, 1, 48)),
    }
    trainable = lambda p: "lora" in p or "knowledge_fusion" in p
    optimizer = make_optimizer(1e-3, trainable_predicate=trainable)
    params = unet.init(jax.random.PRNGKey(0), batch["latents"].repeat(2, -1)[..., :8],
                       jnp.zeros((B,)), batch["image_embeddings"], jnp.ones((B, 3)),
                       domain_features=batch["domain_features"],
                       flow_features=batch["flow_features"])
    step = make_svd_train_step(unet, optimizer, SVDTrainConfig(conditioning_dropout_prob=0.1))
    state = init_train_state(params, optimizer)
    return unet, step, state, batch, trainable


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_and_frozen_params_fixed(self):
        unet, step, state, batch, trainable = _setup()
        jstep = jax.jit(step)
        losses = []
        k = jax.random.PRNGKey(1)  # fixed key -> deterministic objective, must descend
        for i in range(8):
            state, loss = jstep(state, batch, k)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        # frozen params (e.g. conv_in) bit-identical; trainable moved
        flat0 = dict(jax.tree_util.tree_flatten_with_path(_setup()[2].params)[0])
        flat1 = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
        moved = frozen_same = 0
        for path, v0 in flat0.items():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            v1 = flat1[path]
            if trainable(p):
                moved += int(not np.array_equal(np.asarray(v0), np.asarray(v1)))
            else:
                frozen_same += int(np.array_equal(np.asarray(v0), np.asarray(v1)))
                assert np.array_equal(np.asarray(v0), np.asarray(v1)), f"frozen {p} moved"
        assert moved > 0


class TestTrainerLoop:
    @pytest.mark.slow
    def test_fit_checkpoint_resume(self, tmp_path):
        unet, step, state, batch, trainable = _setup()
        cfg = TrainerConfig(output_dir=str(tmp_path), max_steps=5, checkpoint_every=2,
                            log_every=2)
        trainer = Trainer(step, state, cfg)

        def data():
            while True:
                yield batch

        final = trainer.fit(data())
        assert int(final.step) == 5
        assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))

        # resume into a fresh trainer
        trainer2 = Trainer(step, _setup()[2], cfg)
        restored = trainer2.restore_latest()
        assert restored == 5
        np.testing.assert_array_equal(np.asarray(trainer2.state.step), 5)

    def test_adapter_export(self, tmp_path):
        unet, step, state, batch, trainable = _setup()
        path = str(tmp_path / "adapters.safetensors")
        n = export_trainable_safetensors(state.params, trainable, path)
        assert n > 0
        from safetensors.numpy import load_file

        sd = load_file(path)
        assert all(("lora" in k) or ("knowledge_fusion" in k) for k in sd)


class TestDataLayer:
    def test_mini_dataset_and_loader(self, tmp_path):
        import cv2

        # synthesize a tiny mp4
        path = str(tmp_path / "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 48))
        rng = np.random.default_rng(0)
        for _ in range(12):
            w.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
        w.release()

        from lkgd_tpu.data.datasets import MiniDataset, PrefetchLoader

        ds = MiniDataset(str(tmp_path), repeat_num=3, sample_size=32, sample_n_frames=4)
        assert len(ds) == 3
        s = ds[0]
        assert s["pixel_values"].shape == (5, 32, 32, 3)
        assert -1.01 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.01

        loader = PrefetchLoader(ds, batch_size=2, prefetch=1)
        batch = next(iter(loader))
        assert batch["pixel_values"].shape == (2, 5, 32, 32, 3)

    def test_video_io_roundtrip(self, tmp_path):
        from lkgd_tpu.data.video_io import read_flo, write_flo, write_video, load_input

        flow = np.random.default_rng(1).normal(size=(8, 6, 2)).astype(np.float32)
        p = str(tmp_path / "x.flo")
        write_flo(p, flow)
        np.testing.assert_array_equal(read_flo(p), flow)

        vid = np.random.default_rng(2).uniform(size=(4, 16, 16, 3)).astype(np.float32)
        gif = str(tmp_path / "x.gif")
        write_video(gif, vid, fps=4)
        back = load_input(gif)
        assert back.shape == (4, 16, 16, 3)

    def test_gaussian_masks(self):
        from lkgd_tpu.data.gaussian_masks import get_rand_masks

        rng = np.random.default_rng(0)
        masks = get_rand_masks(rng, 4, 16, smooth=True)
        assert masks.shape == (4, 16, 16)
        assert set(np.unique(masks)).issubset({0.0, 1.0}) or (
            (masks >= 0).all() and (masks <= 1).all())

    def test_motion_helpers(self):
        from lkgd_tpu.utils.motion import bucket2motion, flow2motion, motion2bucket, motion2flow

        assert motion2bucket(bucket2motion(127)) == 127
        score = motion2flow(7.0, 127)
        assert 0 <= flow2motion(7.0, score) <= 255


class TestBucketedLoader:
    def test_buckets_are_shape_homogeneous(self):
        from lkgd_tpu.data.datasets import BucketedLoader

        class MultiResDataset:
            shapes = [(4, 16, 16, 3), (4, 8, 8, 3)]

            def __len__(self):
                return 12

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return {"pixel_values": rng.normal(size=self.shapes[i % 2]).astype(np.float32)}

        loader = BucketedLoader(MultiResDataset(), batch_size=3)
        it = iter(loader)
        seen = set()
        for _ in range(4):
            b = next(it)["pixel_values"]
            assert b.shape[0] == 3
            seen.add(b.shape[1:])
        assert seen == {(4, 16, 16, 3), (4, 8, 8, 3)}
