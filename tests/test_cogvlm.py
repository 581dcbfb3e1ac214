"""CogVLM2 video captioner: expert routing, LLaMA-oracle parity, porter round-trip.

Reference analog: `/root/reference/CogVideo-main/tools/caption/video_caption.py`
(THUDM/cogvlm2-llama3-caption via transformers trust_remote_code).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lkgd_tpu.models.cogvlm import (CogVLMConfig, CogVLMVideoCaptioner, cogvlm_key_map,
                                    greedy_video_caption, port_cogvlm)

CFG = CogVLMConfig.tiny()


def _params(seed=0):
    model = CogVLMVideoCaptioner(CFG)
    frames = jnp.zeros((1, 2, CFG.image_size, CFG.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, 5), jnp.int32)
    return model, model.init(jax.random.PRNGKey(seed), frames, ids)


def test_forward_shapes_and_greedy():
    model, params = _params()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(1, 5)).astype(np.int32))
    logits = model.apply(params, frames, ids)
    assert logits.shape == (1, 5, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    out = greedy_video_caption(model, params, frames, np.asarray(ids), max_new_tokens=4)
    assert out.shape == (1, 4)


def test_expert_routing_isolated():
    """Text-position logits must not depend on vision-expert LM weights beyond the
    attention mixing of image tokens; zeroing the frames and perturbing a vision-expert
    MLP weight must leave an all-text (no-image) LM pass unchanged."""
    model, params = _params()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(1, 6)).astype(np.int32))

    def lm_only(p):
        def run(m):
            emb = m.embed_tokens(ids)
            mask = jnp.zeros(ids.shape, bool)
            return m.lm(emb, mask)
        return nn_apply(model, p, run)

    import flax

    base = lm_only(params)
    mutated = flax.core.unfreeze(jax.tree.map(np.asarray, params))
    w = mutated["params"]["layers_0"]["gate_proj"]["vision"]["kernel"]
    mutated["params"]["layers_0"]["gate_proj"]["vision"]["kernel"] = w + 7.0
    np.testing.assert_array_equal(np.asarray(base), np.asarray(lm_only(mutated)))
    # and the language expert DOES matter
    mutated2 = flax.core.unfreeze(jax.tree.map(np.asarray, params))
    w2 = mutated2["params"]["layers_0"]["gate_proj"]["language"]["kernel"]
    mutated2["params"]["layers_0"]["gate_proj"]["language"]["kernel"] = w2 + 7.0
    assert np.abs(np.asarray(base) - np.asarray(lm_only(mutated2))).max() > 0


def nn_apply(model, params, fn):
    return model.apply(params, method=fn)


def test_language_path_matches_transformers_llama():
    """The all-text path is a LLaMA3-style GQA transformer; verify logits against
    transformers' torch LlamaForCausalLM with identical (ported) weights."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    tcfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size, num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads, num_key_value_heads=CFG.num_kv_heads,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps, attention_bias=True,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    tm = LlamaForCausalLM(tcfg).eval()

    model, params = _params()
    import flax

    p = flax.core.unfreeze(jax.tree.map(np.asarray, params))["params"]
    sd = tm.state_dict()

    def t2n(t):
        return t.detach().numpy()

    p["embed_tokens"]["embedding"] = t2n(sd["model.embed_tokens.weight"])
    p["lm_head"]["kernel"] = t2n(sd["lm_head.weight"]).T
    p["final_norm"] = t2n(sd["model.norm.weight"])
    for i in range(CFG.num_layers):
        L = p[f"layers_{i}"]
        pre = f"model.layers.{i}."
        qw = t2n(sd[pre + "self_attn.q_proj.weight"])
        kw = t2n(sd[pre + "self_attn.k_proj.weight"])
        vw = t2n(sd[pre + "self_attn.v_proj.weight"])
        L["qkv"]["language"]["kernel"] = np.concatenate([qw, kw, vw], 0).T
        qb = t2n(sd[pre + "self_attn.q_proj.bias"])
        kb = t2n(sd[pre + "self_attn.k_proj.bias"])
        vb = t2n(sd[pre + "self_attn.v_proj.bias"])
        L["qkv"]["language"]["bias"] = np.concatenate([qb, kb, vb], 0)
        L["dense"]["language"]["kernel"] = t2n(sd[pre + "self_attn.o_proj.weight"]).T
        for proj in ("gate_proj", "up_proj", "down_proj"):
            L[proj]["language"]["kernel"] = t2n(sd[pre + f"mlp.{proj}.weight"]).T
        L["input_layernorm"] = t2n(sd[pre + "input_layernorm.weight"])
        L["post_attention_layernorm"] = t2n(sd[pre + "post_attention_layernorm.weight"])

    ids_np = np.random.default_rng(2).integers(3, CFG.vocab_size, size=(1, 7))
    with torch.no_grad():
        ref = tm(torch.tensor(ids_np)).logits.numpy()

    ids = jnp.asarray(ids_np.astype(np.int32))

    def run(m):
        emb = m.embed_tokens(ids)
        return m.lm(emb, jnp.zeros(ids.shape, bool))

    out = model.apply({"params": p}, method=run)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_porter_roundtrip_thudm_naming():
    """A synthetic state dict keyed with the THUDM modeling_cogvlm naming must port
    bit-exactly onto the template (strict coverage both ways)."""
    model, params = _params(seed=3)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def torch_name(path_keys):
        ks = [str(getattr(p, "key", p)) for p in path_keys]
        assert ks[0] == "params"
        ks = ks[1:]
        name = ".".join(ks)
        import re

        if name.startswith("vision."):
            v = name[len("vision."):]
            v = re.sub(r"^layers_(\d+)\.", r"transformer.layers.\1.", v)
            v = re.sub(r"\b(query_key_value|dense)\b", r"attention.\1", v, count=1) \
                if ("query_key_value" in v or (".dense." in v and "4h" not in v)) else v
            v = v.replace("fc1", "mlp.fc1").replace("fc2", "mlp.fc2")
            v = v.replace("patch_embedding.", "patch_embedding.proj.")
            v = v.replace("cls_embedding", "patch_embedding.cls_embedding")
            if v == "position_embedding":
                v = "patch_embedding.position_embedding.weight"
            for g in ("linear_proj", "norm1", "gate_proj", "dense_h_to_4h",
                      "dense_4h_to_h"):
                if v.startswith(g + "."):
                    v = "linear_proj." + v
                    break
            name = "model.vision." + v
        elif name.startswith("layers_"):
            import re as _re

            name = _re.sub(r"^layers_(\d+)\.", r"model.layers.\1.", name)
            name = name.replace("qkv.vision", "self_attn.vision_expert_query_key_value")
            name = name.replace("qkv.language", "self_attn.language_expert_query_key_value")
            name = name.replace("dense.vision", "self_attn.vision_expert_dense")
            name = name.replace("dense.language", "self_attn.language_expert_dense")
            for proj in ("gate_proj", "up_proj", "down_proj"):
                name = name.replace(f"{proj}.vision", f"mlp.vision_mlp.{proj}")
                name = name.replace(f"{proj}.language", f"mlp.language_mlp.{proj}")
            name = name.replace("input_layernorm.kernel", "input_layernorm.weight")
        elif name == "final_norm":
            name = "model.norm.weight"
        elif name.startswith("embed_tokens"):
            name = "model.embed_tokens.weight"
        elif name in ("boi", "eoi"):
            name = "model.vision." + name
        elif name.startswith("lm_head"):
            name = name  # lm_head.{kernel->weight}
        # leaf renames
        name = name.replace(".kernel", ".weight")
        name = name.replace(".scale", ".weight")
        if name.endswith(("input_layernorm", "post_attention_layernorm")):
            name = name + ".weight"
        return name

    sd = {}
    for path, leaf in flat:
        x = np.asarray(leaf)
        ks = [str(getattr(p, "key", p)) for p in path]
        if ks[-1] == "kernel":
            if x.ndim == 2:
                x = x.T
            elif x.ndim == 4:
                x = x.transpose(3, 2, 0, 1)
        name = torch_name(path)
        assert name not in sd, name
        sd[name] = x

    ported = port_cogvlm(sd, jax.tree.map(np.asarray, params), strict=True)
    for (pa, a), (pb, bleaf) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                                    jax.tree_util.tree_flatten_with_path(ported)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bleaf),
                                      err_msg=str(pa))


def test_build_position_ids_compression():
    """THUDM build_position_ids semantics: language tokens advance the RoPE position;
    contiguous vision spans share ONE position (the span start advances it); an
    all-language mask degrades to arange."""
    from lkgd_tpu.models.cogvlm import build_position_ids

    # [lang, vis, vis, vis, lang, vis, vis, lang]
    mask = jnp.asarray([[0, 1, 1, 1, 0, 1, 1, 0]], bool)
    got = np.asarray(build_position_ids(mask))[0]
    np.testing.assert_array_equal(got, [0, 1, 1, 1, 2, 3, 3, 4])

    text_only = jnp.zeros((2, 5), bool)
    np.testing.assert_array_equal(np.asarray(build_position_ids(text_only)),
                                  np.tile(np.arange(5), (2, 1)))


def test_default_positions_compress_video_span():
    """__call__ must feed compressed positions: boi + N frame tokens + eoi + text gives
    the first text token position 3 (boi=0, span=1, eoi=2), not 2 + N*tokens."""
    from lkgd_tpu.models.cogvlm import CogVLMConfig, CogVLMVideoCaptioner

    cfg = CogVLMConfig.tiny()
    model = CogVLMVideoCaptioner(cfg)
    frames = jnp.zeros((1, 2, cfg.image_size, cfg.image_size, 3))
    ids = jnp.zeros((1, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, ids)

    seen = {}

    def probe(m, fr, i):
        img = m.image_features(fr)
        txt = m.embed_tokens(i)
        emb = jnp.concatenate([img, txt], axis=1)
        n_img = img.shape[1]
        vm = jnp.concatenate([jnp.ones((1, n_img), bool), jnp.zeros(i.shape, bool)], 1)
        vm = vm.at[:, 0].set(False).at[:, n_img - 1].set(False)
        from lkgd_tpu.models.cogvlm import build_position_ids

        seen["pos"] = build_position_ids(vm)
        seen["n_img"] = n_img
        return m(fr, i)

    model.apply(params, frames, ids, method=probe)
    pos = np.asarray(seen["pos"])[0]
    n_img = seen["n_img"]
    assert pos[0] == 0 and pos[1] == 1 and pos[n_img - 1] == 2  # boi, span, eoi
    np.testing.assert_array_equal(pos[1:n_img - 1], np.ones(n_img - 2))  # shared span
    np.testing.assert_array_equal(pos[n_img:], [3, 4, 5])  # text resumes counting
