"""Native tensor cache: build, roundtrip, reopen, dataset view."""

import numpy as np


def test_roundtrip_and_reopen(tmp_path):
    from lkgd_tpu.data.tensor_cache import PrecomputedLatentDataset, TensorCache

    path = str(tmp_path / "cache.lkgd")
    c = TensorCache(path)
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(3, 4, 4, 4)).astype(np.float32)
    emb = rng.normal(size=(8, 16)).astype(np.float16)
    c.put("clip0/latents", lat)
    c.put("clip0/prompt_embeds", emb)
    c.put("clip1/latents", lat * 2)
    assert len(c) == 3
    assert "clip0/latents" in c and "nope" not in c
    np.testing.assert_array_equal(c.get("clip0/latents"), lat)
    np.testing.assert_array_equal(c.get("clip0/prompt_embeds"), emb)
    # overwrite: later record wins
    c.put("clip0/latents", lat + 1)
    np.testing.assert_array_equal(c.get("clip0/latents"), lat + 1)
    c.close()

    # reopen: index rebuilt by scan
    c2 = TensorCache(path)
    np.testing.assert_array_equal(c2.get("clip0/latents"), lat + 1)
    np.testing.assert_array_equal(c2.get("clip1/latents"), lat * 2)
    c2.close()

    ds = PrecomputedLatentDataset(path)
    assert len(ds) == 2
    s = ds[0]
    assert s["latents"].shape == (3, 4, 4, 4)
    assert "prompt_embeds" in s


def test_bfloat16(tmp_path):
    import ml_dtypes
    from lkgd_tpu.data.tensor_cache import TensorCache

    c = TensorCache(str(tmp_path / "c.lkgd"))
    x = np.arange(8, dtype=np.float32).astype(ml_dtypes.bfloat16)
    c.put("x", x)
    back = c.get("x")
    assert back.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(back.astype(np.float32), x.astype(np.float32))
