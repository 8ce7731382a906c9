"""U-Net block parity: our flax UNetBlock/AttnBlock vs the reference's torch
EDM blocks (online_testing/baseline_models/Unet_v4/training/layers.py)
executed in-place with IDENTICAL weights.

Pins the block math the ClimSim-Online U-Net is built from: GN(eps=1e-6) ->
SiLU -> conv0 (with built-in [1,1]-filter resampling), GN -> dropout ->
conv1, resample_proj skip 1x1 conv, skip_scale=1/sqrt(2), and the f32
single-head AttentionOp (softmax(q^T k/sqrt(C)), num_heads=1 per
climsim_unet.py:125 block_kwargs).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# stub modulus: layers.py needs weight_init (values get overwritten);
# climsim_unet.py additionally needs Module/ModelMetaData and nvtx
_diff = types.ModuleType("modulus.models.diffusion")
_diff.weight_init = lambda shape, mode, fan_in, fan_out: torch.randn(shape)
_models = types.ModuleType("modulus.models")
_mod = types.ModuleType("modulus")


class _ModulusModule(torch.nn.Module):
    def __init__(self, meta=None):
        super().__init__()


_mod.Module = _ModulusModule
_mod.ModelMetaData = object
sys.modules.setdefault("modulus", _mod)
sys.modules.setdefault("modulus.models", _models)
sys.modules.setdefault("modulus.models.diffusion", _diff)
sys.modules.setdefault("nvtx", types.ModuleType("nvtx"))

_spec = importlib.util.spec_from_file_location(
    "ref_unet_layers",
    "/root/reference/online_testing/baseline_models/Unet_v4/training/"
    "layers.py")
ref_layers = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_layers)

from climsim_tpu.models.unet import UNetBlock  # noqa: E402

# the climsim U-Net's block_kwargs (climsim_unet.py:123-135)
BLOCK_KWARGS = dict(num_heads=1, dropout=0.0, skip_scale=0.5 ** 0.5,
                    eps=1e-6, resample_filter=[1, 1], resample_proj=True,
                    adaptive_scale=False)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _copy_gn(ref_gn, params):
    ref_gn.weight.data = _t(params["scale"])
    ref_gn.bias.data = _t(params["bias"])


def _copy_conv(ref_conv, params):
    # flax Conv kernel [k, cin, cout] -> torch conv1d weight [cout, cin, k]
    ref_conv.weight.data = _t(np.transpose(params["kernel"], (2, 1, 0)))
    ref_conv.bias.data = _t(params["bias"])


def _copy_block(ref_block, params, attention=False):
    _copy_gn(ref_block.norm0, params["GroupNorm_0"])
    _copy_conv(ref_block.conv0, params["conv0"])
    _copy_gn(ref_block.norm1, params["GroupNorm_1"])
    _copy_conv(ref_block.conv1, params["conv1"])
    if ref_block.skip is not None and ref_block.skip.weight is not None:
        _copy_conv(ref_block.skip, params["skip"])
    if attention:
        ap = params["AttnBlock_0"]
        _copy_gn(ref_block.norm2, ap["GroupNorm_0"])
        # reference qkv layout: [B, 3C, L] reshaped to [B, C, 3, L] =>
        # torch output channel c*3+t <- our channel t*C+c (q,k,v blocks)
        k = np.transpose(ap["qkv"]["kernel"], (2, 1, 0))   # [3C, C, 1] ours
        b = np.asarray(ap["qkv"]["bias"])
        C = k.shape[1]
        perm = np.array([t * C + c for c in range(C) for t in range(3)])
        ref_block.qkv.weight.data = _t(k[perm])
        ref_block.qkv.bias.data = _t(b[perm])
        _copy_conv(ref_block.proj, ap["proj"])


def _run_pair(cin, cout, L=16, B=4, **kw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, cin)).astype(np.float32)

    ours = UNetBlock(out_channels=cout, dropout=0.0,
                     up=kw.get("up", False), down=kw.get("down", False),
                     attention=kw.get("attention", False))
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))

    cls = (ref_layers.UNetBlock_atten if kw.get("attention")
           else ref_layers.UNetBlock_noatten)
    ref = cls(in_channels=cin, out_channels=cout,
              up=kw.get("up", False), down=kw.get("down", False),
              attention=kw.get("attention", False), **BLOCK_KWARGS)
    ref.eval()
    _copy_block(ref, params, attention=kw.get("attention", False))
    with torch.no_grad():
        # torch layout is channel-first [B, C, L]
        y_ref = ref(_t(np.transpose(x, (0, 2, 1)))).numpy()
    return y_ours, np.transpose(y_ref, (0, 2, 1))


def test_plain_block_parity():
    a, b = _run_pair(64, 64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_channel_change_block_parity():
    a, b = _run_pair(64, 128)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_attention_block_parity():
    a, b = _run_pair(128, 128, attention=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_down_block_parity():
    # resample_proj=True: skip is a learned 1x1 conv even at equal width
    a, b = _run_pair(64, 64, down=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_up_block_parity():
    a, b = _run_pair(64, 64, up=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_multihead_attention_matches_reference_semantics():
    """With num_heads>1 the scale is sqrt(C/nh) and softmax stays per-head
    (EDM UNetBlock default channels_per_head=64)."""
    from climsim_tpu.models.unet import AttnBlock
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 128)).astype(np.float32)
    blk = AttnBlock(128, num_heads=2)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y = blk.apply({"params": params}, jnp.asarray(x))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def _load_ref_unet_module():
    """Load the reference climsim_unet.py under an isolated 'layers' entry
    (the rnn parity tests put /root/reference/rnn on sys.path, which has its
    own layers.py)."""
    tdir = ("/root/reference/online_testing/baseline_models/Unet_v4/"
            "training")
    saved = sys.modules.pop("layers", None)
    sys.modules["layers"] = ref_layers
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_climsim_unet", tdir + "/climsim_unet.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["layers"] = saved
        else:
            sys.modules.pop("layers", None)
    return mod


def test_full_unet_model_parity():
    """Whole-model weight-copy parity: encoder/decoder wiring, skips,
    location embedding, prev_2d zeroing, padding, scalar ReLU-mean head and
    stratosphere output pruning (climsim_unet.py:35-411)."""
    from climsim_tpu.models.unet import ClimsimUNet

    ref_mod = _load_ref_unet_module()
    kw = dict(num_vars_profile=25, num_vars_scalar=24,
              num_vars_profile_out=6, num_vars_scalar_out=8,
              seq_resolution=64, model_channels=32, channel_mult=[1, 2],
              num_blocks=2, attn_resolutions=[32], dropout=0.0,
              n_model_levels=60, output_prune=True, strato_lev=12,
              loc_embedding=True, skip_conv=False)
    ours = ClimsimUNet(**{**kw, "channel_mult": tuple(kw["channel_mult"]),
                          "attn_resolutions": tuple(kw["attn_resolutions"])})
    ref = ref_mod.ClimsimUnet(**kw)
    ref.eval()

    nin = 25 * 60 + 24 + 1
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, nin)).astype(np.float32)
    x[:, -1] = rng.integers(1, 385, size=4)          # location index

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    ref.emb_loc.data = _t(params["emb_loc"])
    _copy_conv(ref.enc["64_conv"], params["enc_in"])
    for name, block in ref.enc.items():
        if name == "64_conv":
            continue
        res, kind = name.split("_", 1)
        ourname = f"enc_{res}_{kind.replace('block', 'block')}"
        attn = isinstance(block, ref_layers.UNetBlock_atten)
        _copy_block(block, params[ourname], attention=attn)
    for i, conv in enumerate(ref.skip_conv_layer):
        p = params[f"skipconv_{i}"]
        conv.weight.data = _t(np.transpose(p["kernel"], (2, 1, 0)))
        conv.bias.data = _t(p["bias"])
    for name, block in ref.dec.items():
        res, kind = name.split("_", 1)
        attn = isinstance(block, ref_layers.UNetBlock_atten)
        _copy_block(block, params[f"dec_{res}_{kind}"], attention=attn)
    _copy_gn(ref.dec_aux_norm["64_aux_norm"], params["GroupNorm_0"])
    _copy_conv(ref.dec_aux_conv["64_aux_conv"], params["out_conv"])

    y_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.copy())).numpy()
    assert y_ours.shape == y_ref.shape == (4, 6 * 60 + 8)
    np.testing.assert_allclose(y_ours, y_ref, rtol=2e-4, atol=2e-4)

    # pruning pins the stratosphere of the 5 non-T profile tendencies
    for off in (60, 120, 180, 240, 300):
        assert np.all(y_ours[:, off:off + 12] == 0.0)
