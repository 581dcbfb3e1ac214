"""UNetSpatioTemporalCondition — the LKGD/SVD video denoiser, TPU-native.

Re-implements the reference's centerpiece model
(`/root/reference/models/unet_spatio_temporal_condition.py:34-693`) and its variants as one
statically-configured Flax module:

  * base SVD UNet (stock diffusers architecture; reference :72-298)
  * LKGD latent-knowledge fusion of CLIP/domain/flow features (reference :197-225,536-595)
    — enabled by ``config.knowledge_fusion``
  * joint x<->y stream attention (the reference's runtime class-swizzle,
    `patch/patch.py:719-817`) — ``config.joint``
  * LoRA adapters folded into projections — ``config.lora`` router
  * ControlNet residual injection (reference :640-658 and
    `models/unet_spatio_temporal_condition_controlnet.py:358`) — forward kwargs
  * flow variant with second zero-alpha conv_in
    (`models/unet_spatio_temporal_condition_flow.py:495-502`) — ``config.dual_cond_conv_in``

I/O convention (channels-last): ``sample`` is ``(B, T, H, W, C_in)``; returns
``(B, T, H, W, C_out)``. ``timesteps`` is ``(B,)`` (continuous 0.25*log(sigma) values for
SVD), ``added_time_ids`` is ``(B, 3)``, ``encoder_hidden_states`` is ``(B, L, D)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lkgd_tpu.models.blocks_svd import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)
from lkgd_tpu.models.configs import SVDUNetConfig
from lkgd_tpu.models.layers import GroupNorm, TimestepEmbedding, get_timestep_embedding
from lkgd_tpu.ops.fusion import LatentKnowledgeFusion


class UNetSpatioTemporalCondition(nn.Module):
    config: SVDUNetConfig = SVDUNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_time_ids: jnp.ndarray,
        domain_features: Optional[jnp.ndarray] = None,
        flow_features: Optional[jnp.ndarray] = None,
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        image_only_indicator: Optional[jnp.ndarray] = None,
        joint_scale=1.0,
        cond2: Optional[jnp.ndarray] = None,
        deep_cache: Optional[jnp.ndarray] = None,
        return_deep_feature: bool = False,
    ) -> jnp.ndarray:
        """``deep_cache`` / ``return_deep_feature``: the DeepCache serving contract
        (Ma et al. 2023, arXiv:2312.00858 — training-free diffusion acceleration by
        caching slow-changing deep U-Net features across adjacent timesteps).
        ``return_deep_feature=True`` additionally returns the input of the LAST up
        block; passing that back as ``deep_cache`` on a later step recomputes ONLY the
        shallowest level (conv_in + down block 0 for fresh skips + the last up block +
        out head) against the current latents and reuses the cached deep feature.
        Exactness property (tested): full(x) == cached(x, feature_of(full(x)))."""
        cfg = self.config
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        # ---- 1. time + added-time embeddings (reference :480-511)
        t_emb = get_timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(timesteps), (batch_size,)),
                                       cfg.block_out_channels[0]).astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        add_embeds = get_timestep_embedding(added_time_ids.reshape(-1),
                                            cfg.addition_time_embed_dim)
        add_embeds = add_embeds.reshape(batch_size, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="add_embedding")(add_embeds)

        if cfg.y_input_head_mask is not None:
            # joint x/y variant: a cloned input head for the y stream, rows selected by
            # the static mask (reference unet_..._joint.py:483-500)
            emb_y = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                      name="time_embedding_y")(t_emb)
            emb_y = emb_y + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                              name="add_embedding_y")(add_embeds)
            from lkgd_tpu.models.layers import stream_gate

            head_gate = stream_gate(cfg.y_input_head_mask, batch_size, self.dtype)
            emb = jnp.where(head_gate[:, None] > 0, emb_y, emb)

        # ---- 2. latent-knowledge fusion of the cross-attention context (reference :536-595)
        if cfg.knowledge_fusion:
            encoder_hidden_states = LatentKnowledgeFusion(
                ctx_dim=cfg.cross_attention_dim, dtype=self.dtype, name="knowledge_fusion",
            )(encoder_hidden_states, domain_features, flow_features)

        # ---- 3. flatten frames; per-frame broadcast of emb and context (reference :513-613)
        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:]).astype(self.dtype)
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states.astype(self.dtype), num_frames, axis=0)

        # ---- 4. conv_in (+ optional second conditioning head, flow variant)
        if cfg.dual_cond_conv_in:
            # input channels: [noise(4) | cond(4) | cond2(4)] (unet_..._flow.py:495-502)
            noise_cond = sample[..., : cfg.in_channels]
            h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                        name="conv_in")(noise_cond)
            if cond2 is None:
                noise = sample[..., : cfg.in_channels // 2]
                cond2_flat = sample[..., cfg.in_channels:]
            else:
                noise = sample[..., : cfg.in_channels // 2]
                cond2_flat = cond2.reshape((batch_size * num_frames,) + cond2.shape[2:]).astype(self.dtype)
            h2 = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                         kernel_init=nn.initializers.zeros, dtype=self.dtype, name="conv_in2")(
                             jnp.concatenate([noise, cond2_flat], axis=-1))
            alpha = self.param("conv_in2_alpha", nn.initializers.zeros, (1,))
            h = h + h2 * alpha.astype(self.dtype)
            sample = h
        else:
            h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                        name="conv_in")(sample)
            if cfg.y_input_head_mask is not None:
                h_y = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                              name="conv_in_y")(sample)
                from lkgd_tpu.models.layers import stream_gate

                row_gate = stream_gate(cfg.y_input_head_mask, h.shape[0], self.dtype)
                h = jnp.where(row_gate[:, None, None, None] > 0, h_y, h)
            sample = h

        if image_only_indicator is None:
            image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=self.dtype)

        # gradient checkpointing: remat each block (reference :1181-1182)
        maybe_remat = nn.remat if cfg.remat else (lambda m, **kw: m)

        # ---- 5. down blocks (reference :620-647)
        def run_down_block(i, block_type, x):
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                return maybe_remat(CrossAttnDownBlockSpatioTemporal)(
                    cfg.block_out_channels[i], num_layers=cfg.layers_per_block,
                    eps=cfg.resnet_eps_cross or cfg.resnet_eps,
                    transformer_layers=cfg.transformer_layers_per_block,
                    heads=cfg.num_attention_heads[i], cross_attention_dim=cfg.cross_attention_dim,
                    add_downsample=i < len(cfg.block_out_channels) - 1, joint=cfg.joint,
                    block_path=f"down_blocks.{i}", lora=cfg.lora, dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, emb, encoder_hidden_states, image_only_indicator, joint_scale)
            elif block_type == "DownBlockSpatioTemporal":
                return maybe_remat(DownBlockSpatioTemporal)(
                    cfg.block_out_channels[i], num_layers=cfg.layers_per_block,
                    eps=cfg.resnet_eps,
                    add_downsample=i < len(cfg.block_out_channels) - 1, dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, emb, image_only_indicator)
            raise ValueError(block_type)

        if deep_cache is not None:
            # DeepCache cached step: fresh shallow skips from the CURRENT latents, deep
            # trunk replaced by the cached feature; jump straight to the last up block.
            if (down_block_additional_residuals is not None
                    or mid_block_additional_residual is not None):
                raise ValueError("deep_cache is incompatible with ControlNet residuals")
            _, outs0 = run_down_block(0, cfg.down_block_types[0], sample)
            shallow_skips = (sample,) + outs0[:cfg.layers_per_block]
            last = len(cfg.up_block_types) - 1
            sample = self._apply_up_block(
                last, cfg.up_block_types[last], deep_cache.astype(self.dtype),
                shallow_skips, emb, encoder_hidden_states, image_only_indicator,
                joint_scale, maybe_remat)
            sample = GroupNorm(32, 1e-5, dtype=self.dtype, act="silu",
                               name="conv_norm_out")(sample)
            sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                             name="conv_out")(sample)
            out = sample.reshape((batch_size, num_frames) + sample.shape[1:])
            return (out, deep_cache) if return_deep_feature else out

        res_samples = (sample,)
        for i, block_type in enumerate(cfg.down_block_types):
            sample, outs = run_down_block(i, block_type, sample)
            res_samples = res_samples + outs

        if down_block_additional_residuals is not None:
            res_samples = tuple(
                r + add.reshape(r.shape).astype(r.dtype)
                for r, add in zip(res_samples, down_block_additional_residuals)
            )

        # ---- 6. mid (reference :650-658)
        sample = maybe_remat(UNetMidBlockSpatioTemporal)(
            cfg.block_out_channels[-1], eps=cfg.resnet_eps,
            transformer_layers=cfg.transformer_layers_per_block,
            heads=cfg.num_attention_heads[-1], cross_attention_dim=cfg.cross_attention_dim,
            joint=cfg.joint, lora=cfg.lora, dtype=self.dtype, name="mid_block",
        )(sample, emb, encoder_hidden_states, image_only_indicator, joint_scale)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual.reshape(sample.shape).astype(sample.dtype)

        # ---- 7. up blocks (reference :662-680)
        deep_feature = None
        for i, block_type in enumerate(cfg.up_block_types):
            n_layers = cfg.layers_per_block + 1
            skips, res_samples = res_samples[-n_layers:], res_samples[:-n_layers]
            if i == len(cfg.up_block_types) - 1:
                deep_feature = sample  # DeepCache boundary: input of the last up block
            sample = self._apply_up_block(i, block_type, sample, skips, emb,
                                          encoder_hidden_states, image_only_indicator,
                                          joint_scale, maybe_remat)

        # ---- 8. out head (reference :682-688)
        sample = GroupNorm(32, 1e-5, dtype=self.dtype, act="silu", name="conv_norm_out")(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(sample)
        out = sample.reshape((batch_size, num_frames) + sample.shape[1:])
        return (out, deep_feature) if return_deep_feature else out

    def _apply_up_block(self, i, block_type, sample, skips, emb, encoder_hidden_states,
                        image_only_indicator, joint_scale, maybe_remat):
        cfg = self.config
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        reversed_heads = tuple(reversed(cfg.num_attention_heads))
        n_layers = cfg.layers_per_block + 1
        add_upsample = i < len(cfg.block_out_channels) - 1
        if block_type == "CrossAttnUpBlockSpatioTemporal":
            return maybe_remat(CrossAttnUpBlockSpatioTemporal)(
                reversed_channels[i], num_layers=n_layers,
                eps=cfg.resnet_eps_cross or cfg.resnet_eps,
                transformer_layers=cfg.transformer_layers_per_block, heads=reversed_heads[i],
                cross_attention_dim=cfg.cross_attention_dim, add_upsample=add_upsample,
                joint=cfg.joint, block_path=f"up_blocks.{i}", lora=cfg.lora, dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(sample, skips, emb, encoder_hidden_states, image_only_indicator, joint_scale)
        if block_type == "UpBlockSpatioTemporal":
            return maybe_remat(UpBlockSpatioTemporal)(
                reversed_channels[i], num_layers=n_layers, add_upsample=add_upsample,
                eps=cfg.resnet_eps_up or cfg.resnet_eps,
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(sample, skips, emb, image_only_indicator)
        raise ValueError(block_type)
