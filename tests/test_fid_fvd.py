"""Real-FID/FVD extractors: torch oracles for the numerics-critical pieces (conv
layout, eval BatchNorm, the pytorch-fid pooling patches, TF-SAME 3D conv), porter key
manifests, and end-to-end Frechet smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from lkgd_tpu.eval import fid_inception, i3d
from lkgd_tpu.eval.metrics import fid_from_features, fvd_from_features


# ------------------------------------------------------------------ torch oracles
class _BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _InceptionA(tnn.Module):
    """pytorch-fid FIDInceptionA: count_include_pad=False pool branch."""

    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], 1)


def _randomize_bn(mod, g):
    for m in mod.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_inception_a_matches_torch():
    g = torch.Generator().manual_seed(0)
    ref = _InceptionA(192, 32).eval()
    _randomize_bn(ref, g)
    sd = {k: v.detach() for k, v in ref.state_dict().items()}
    leaf = {}
    for branch in ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                   "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"):
        leaf[branch] = {
            "conv": {"kernel": jnp.asarray(
                sd[f"{branch}.conv.weight"].numpy().transpose(2, 3, 1, 0))},
            "bn": {"weight": jnp.asarray(sd[f"{branch}.bn.weight"].numpy()),
                   "bias": jnp.asarray(sd[f"{branch}.bn.bias"].numpy()),
                   "mean": jnp.asarray(sd[f"{branch}.bn.running_mean"].numpy()),
                   "var": jnp.asarray(sd[f"{branch}.bn.running_var"].numpy())}}
    x = torch.randn(2, 192, 17, 17, generator=g)
    with torch.no_grad():
        want = ref(x).numpy().transpose(0, 2, 3, 1)
    got = fid_inception._inception_a(leaf, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_avg_pool_no_pad_matches_torch():
    g = torch.Generator().manual_seed(1)
    x = torch.randn(1, 5, 9, 9, generator=g)
    want = F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=False).numpy().transpose(0, 2, 3, 1)
    got = fid_inception._avg_pool3_nopad(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_inception_e_max_pool_matches_torch():
    """The FIDInceptionE_2 pool branch is a stride-1 MAX pool — oracle just the pool +
    1x1 conv composition (full branch structure is covered by the A-block oracle)."""
    g = torch.Generator().manual_seed(2)
    x = torch.randn(1, 8, 8, 8, generator=g)
    want = F.max_pool2d(x, 3, stride=1, padding=1).numpy().transpose(0, 2, 3, 1)
    got = fid_inception._max_pool(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 3, 1, pad=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_inception_full_forward_and_manifest():
    params = fid_inception.init_synthetic(jax.random.PRNGKey(0))
    feats = fid_inception.inception_v3_features(params, jnp.ones((2, 64, 64, 3)) * 0.5)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    keys = fid_inception.expected_torch_keys()
    assert len(keys) == len(set(keys)) == 94 * 5  # 94 conv units x (conv + 4 bn stats)
    # porter consumes a synthetic state dict with the exact torch key names
    sd = {}
    for mod, (kh, kw, cin, cout) in fid_inception._iter_convs():
        sd[f"{mod}.conv.weight"] = np.zeros((cout, cin, kh, kw), np.float32)
        sd[f"{mod}.bn.weight"] = np.ones((cout,), np.float32)
        sd[f"{mod}.bn.bias"] = np.zeros((cout,), np.float32)
        sd[f"{mod}.bn.running_mean"] = np.zeros((cout,), np.float32)
        sd[f"{mod}.bn.running_var"] = np.ones((cout,), np.float32)
    assert set(sd) == set(keys)
    ported = fid_inception.port_torch_state_dict(sd)
    assert "Mixed_7c" in ported and "branch_pool" in ported["Mixed_7c"]
    with pytest.raises(KeyError):
        fid_inception.port_torch_state_dict({k: v for k, v in sd.items()
                                             if "Mixed_7c" not in k})


# ------------------------------------------------------------------ I3D
def _tf_same_pad3d(x, k, s):
    """TF-SAME padding for conv3d (what pytorch-i3d's compute_pad does)."""
    pads = []
    for i, (kk, ss) in enumerate(zip(k, s)):
        size = x.shape[2 + i]
        out = -(-size // ss)
        total = max((out - 1) * ss + kk - size, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad takes (w_lo, w_hi, h_lo, h_hi, t_lo, t_hi)
    return F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                     pads[0][0], pads[0][1]))


class _Unit3D(tnn.Module):
    def __init__(self, cin, cout, k, s=(1, 1, 1)):
        super().__init__()
        self.k, self.s = k, s
        self.conv3d = tnn.Conv3d(cin, cout, k, stride=s, bias=False)
        self.bn = tnn.BatchNorm3d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv3d(_tf_same_pad3d(x, self.k, self.s))))


def test_unit3d_matches_torch():
    g = torch.Generator().manual_seed(3)
    ref = _Unit3D(3, 8, (7, 7, 7), (2, 2, 2)).eval()
    _randomize_bn(ref, g)
    sd = ref.state_dict()
    leaf = {"conv3d": {"kernel": jnp.asarray(
                sd["conv3d.weight"].numpy().transpose(2, 3, 4, 1, 0))},
            "bn": {"weight": jnp.asarray(sd["bn.weight"].numpy()),
                   "bias": jnp.asarray(sd["bn.bias"].numpy()),
                   "mean": jnp.asarray(sd["bn.running_mean"].numpy()),
                   "var": jnp.asarray(sd["bn.running_var"].numpy())}}
    x = torch.randn(1, 3, 11, 19, 19, generator=g)  # odd sizes: asymmetric SAME pads
    with torch.no_grad():
        want = ref(x).numpy().transpose(0, 2, 3, 4, 1)
    got = i3d._unit3d(leaf, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
                      stride=(2, 2, 2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_i3d_forward_manifest_and_porter():
    params = i3d.init_synthetic(jax.random.PRNGKey(0))
    feats = i3d.i3d_features(params, jnp.ones((1, 16, 64, 64, 3)) * 0.5)
    assert feats.shape == (1, i3d.NUM_CLASSES)
    assert np.isfinite(np.asarray(feats)).all()
    keys = i3d.expected_torch_keys()
    assert len(keys) == len(set(keys))
    sd = {}
    for unit, (kt, kh, kw), cin, cout, has_bn in i3d._iter_units():
        sd[f"{unit}.conv3d.weight"] = np.zeros((cout, cin, kt, kh, kw), np.float32)
        if has_bn:
            sd[f"{unit}.bn.weight"] = np.ones((cout,), np.float32)
            sd[f"{unit}.bn.bias"] = np.zeros((cout,), np.float32)
            sd[f"{unit}.bn.running_mean"] = np.zeros((cout,), np.float32)
            sd[f"{unit}.bn.running_var"] = np.ones((cout,), np.float32)
        else:
            sd[f"{unit}.conv3d.bias"] = np.zeros((cout,), np.float32)
    assert set(sd) == set(keys)
    ported = i3d.port_torch_state_dict(sd)
    assert "Mixed_5c" in ported and "logits" in ported


# ------------------------------------------------------------------ Frechet end-to-end
def test_fid_zero_for_identical_sets():
    params = fid_inception.init_synthetic(jax.random.PRNGKey(1))
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (8, 64, 64, 3))
    f = fid_inception.make_fid_feature_extractor(params)(imgs)
    assert abs(fid_from_features(np.asarray(f), np.asarray(f))) < 1e-3


def test_fvd_separates_distributions():
    params = i3d.init_synthetic(jax.random.PRNGKey(1))
    a = jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 32, 32, 3))
    ex = i3d.make_fvd_feature_extractor(params)
    fa, fb = ex(a), ex(jnp.clip(a + 0.4, 0, 1))
    same = fvd_from_features(np.asarray(fa), np.asarray(fa))
    diff = fvd_from_features(np.asarray(fa), np.asarray(fb))
    assert abs(same) < 1e-3 and diff > same
