"""Numerical parity of the JAX ViT and VQ-GAN against reference-faithful
torch implementations (small configs, random weights, ported through
ospo_tpu.models.weights). This validates the NHWC/HWIO weight mapping, the
GroupNorm/LayerNorm/GELU semantics, and the asymmetric-padding down/upsample
details that determine decode fidelity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from ospo_tpu.models import vit as jvit
from ospo_tpu.models import vqgan as jvq
from ospo_tpu.models import weights


# --------------------------- torch mini-ViT (timm-style) -------------------


class TorchViT(tnn.Module):
    def __init__(self, img=32, patch=16, dim=32, depth=2, heads=2, mlp_ratio=4.0):
        super().__init__()
        self.patch = patch
        self.heads = heads
        self.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            blk.qkv = tnn.Linear(dim, dim * 3)
            blk.proj = tnn.Linear(dim, dim)
            blk.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            blk.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
            blk.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            h = blk.norm1(x)
            B, N, C = h.shape
            qkv = blk.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            a = tF.scaled_dot_product_attention(q, k, v)
            a = a.transpose(1, 2).reshape(B, N, C)
            x = x + blk.proj(a)
            h = blk.norm2(x)
            x = x + blk.fc2(tF.gelu(blk.fc1(h)))
        return self.norm(x)

    def state_dict_janus(self):
        """Rename to the Janus checkpoint key layout."""
        sd = {}
        pre = "vision_model.vision_tower."
        sd[pre + "patch_embed.proj.weight"] = self.proj.weight
        sd[pre + "patch_embed.proj.bias"] = self.proj.bias
        sd[pre + "pos_embed"] = self.pos_embed
        for i, blk in enumerate(self.blocks):
            b = f"{pre}blocks.{i}."
            sd[b + "norm1.weight"] = blk.norm1.weight
            sd[b + "norm1.bias"] = blk.norm1.bias
            sd[b + "attn.qkv.weight"] = blk.qkv.weight
            sd[b + "attn.qkv.bias"] = blk.qkv.bias
            sd[b + "attn.proj.weight"] = blk.proj.weight
            sd[b + "attn.proj.bias"] = blk.proj.bias
            sd[b + "norm2.weight"] = blk.norm2.weight
            sd[b + "norm2.bias"] = blk.norm2.bias
            sd[b + "mlp.fc1.weight"] = blk.fc1.weight
            sd[b + "mlp.fc1.bias"] = blk.fc1.bias
            sd[b + "mlp.fc2.weight"] = blk.fc2.weight
            sd[b + "mlp.fc2.bias"] = blk.fc2.bias
        sd[pre + "norm.weight"] = self.norm.weight
        sd[pre + "norm.bias"] = self.norm.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_vit_parity():
    torch.manual_seed(0)
    tv = TorchViT()
    tv.eval()
    cfg = jvit.ViTConfig(image_size=32, patch_size=16, width=32, layers=2,
                         heads=2, mlp_ratio=4.0, select_layer=-1,
                         dtype=jnp.float32)
    params = weights.port_vit(tv.state_dict_janus(), cfg)

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x)).numpy()
    out = jvit.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


# --------------------------- torch mini-VQGAN ------------------------------
# Mirrors janus/models/vq_model.py exactly (GroupNorm 32→min(ch), swish,
# asymmetric-pad downsample, nearest upsample, L2-normed codebook).


def t_normalize(ch):
    return tnn.GroupNorm(num_groups=min(32, ch), num_channels=ch, eps=1e-6, affine=True)


def t_swish(x):
    return x * torch.sigmoid(x)


class TRes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = t_normalize(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = t_normalize(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.has_shortcut = cin != cout
        if self.has_shortcut:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(t_swish(self.norm1(x)))
        h = self.conv2(t_swish(self.norm2(h)))
        if self.has_shortcut:
            x = self.nin_shortcut(x)
        return x + h


class TAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = t_normalize(ch)
        self.q = tnn.Conv2d(ch, ch, 1)
        self.k = tnn.Conv2d(ch, ch, 1)
        self.v = tnn.Conv2d(ch, ch, 1)
        self.proj_out = tnn.Conv2d(ch, ch, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w_ = torch.bmm(q, k) * (c ** -0.5)
        w_ = tF.softmax(w_, dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class TVQ(tnn.Module):
    """2-level encoder/decoder mirroring the reference wiring."""

    def __init__(self, ch=16, z=16, cb=64, cd=8):
        super().__init__()
        mults = (1, 2)
        # encoder
        self.e_conv_in = tnn.Conv2d(3, ch, 3, 1, 1)
        self.e_l0_res = tnn.ModuleList([TRes(ch, ch), TRes(ch, ch)])
        self.e_l0_down = tnn.Conv2d(ch, ch, 3, 2, 0)
        self.e_l1_res = tnn.ModuleList([TRes(ch, 2 * ch), TRes(2 * ch, 2 * ch)])
        self.e_l1_attn = tnn.ModuleList([TAttn(2 * ch), TAttn(2 * ch)])
        self.e_mid = tnn.ModuleList([TRes(2 * ch, 2 * ch), TAttn(2 * ch), TRes(2 * ch, 2 * ch)])
        self.e_norm_out = t_normalize(2 * ch)
        self.e_conv_out = tnn.Conv2d(2 * ch, z, 3, 1, 1)
        # decoder
        self.d_conv_in = tnn.Conv2d(z, 2 * ch, 3, 1, 1)
        self.d_mid = tnn.ModuleList([TRes(2 * ch, 2 * ch), TAttn(2 * ch), TRes(2 * ch, 2 * ch)])
        self.d_l0_res = tnn.ModuleList([TRes(2 * ch, 2 * ch)] * 0 + [TRes(2 * ch, 2 * ch), TRes(2 * ch, 2 * ch), TRes(2 * ch, 2 * ch)])
        self.d_l0_attn = tnn.ModuleList([TAttn(2 * ch), TAttn(2 * ch), TAttn(2 * ch)])
        self.d_l0_up = tnn.Conv2d(2 * ch, 2 * ch, 3, 1, 1)
        self.d_l1_res = tnn.ModuleList([TRes(2 * ch, ch), TRes(ch, ch), TRes(ch, ch)])
        self.d_norm_out = t_normalize(ch)
        self.d_conv_out = tnn.Conv2d(ch, 3, 3, 1, 1)
        # quantizer
        self.codebook = tnn.Embedding(cb, cd)
        self.quant_conv = tnn.Conv2d(z, cd, 1)
        self.post_quant_conv = tnn.Conv2d(cd, z, 1)

    def encode_z(self, x):
        h = self.e_conv_in(x)
        for r in self.e_l0_res:
            h = r(h)
        h = self.e_l0_down(tF.pad(h, (0, 1, 0, 1)))
        for r, a in zip(self.e_l1_res, self.e_l1_attn):
            h = a(r(h))
        h = self.e_mid[2](self.e_mid[1](self.e_mid[0](h)))
        h = self.e_conv_out(t_swish(self.e_norm_out(h)))
        return self.quant_conv(h)

    def decode_z(self, zq):
        h = self.d_conv_in(self.post_quant_conv(zq))
        h = self.d_mid[2](self.d_mid[1](self.d_mid[0](h)))
        for r, a in zip(self.d_l0_res, self.d_l0_attn):
            h = a(r(h))
        h = self.d_l0_up(tF.interpolate(h, scale_factor=2.0, mode="nearest"))
        for r in self.d_l1_res:
            h = r(h)
        return self.d_conv_out(t_swish(self.d_norm_out(h)))

    def state_dict_janus(self):
        sd = {}
        pre = "gen_vision_model."

        def put(mod, name):
            for k, v in mod.state_dict().items():
                sd[pre + name + "." + k] = v

        put(self.e_conv_in, "encoder.conv_in")
        for j, r in enumerate(self.e_l0_res):
            put(r, f"encoder.conv_blocks.0.res.{j}")
        put(self.e_l0_down, "encoder.conv_blocks.0.downsample.conv")
        for j, r in enumerate(self.e_l1_res):
            put(r, f"encoder.conv_blocks.1.res.{j}")
        for j, a in enumerate(self.e_l1_attn):
            put(a, f"encoder.conv_blocks.1.attn.{j}")
        put(self.e_mid[0], "encoder.mid.0")
        put(self.e_mid[1], "encoder.mid.1")
        put(self.e_mid[2], "encoder.mid.2")
        put(self.e_norm_out, "encoder.norm_out")
        put(self.e_conv_out, "encoder.conv_out")

        put(self.d_conv_in, "decoder.conv_in")
        put(self.d_mid[0], "decoder.mid.0")
        put(self.d_mid[1], "decoder.mid.1")
        put(self.d_mid[2], "decoder.mid.2")
        for j, r in enumerate(self.d_l0_res):
            put(r, f"decoder.conv_blocks.0.res.{j}")
        for j, a in enumerate(self.d_l0_attn):
            put(a, f"decoder.conv_blocks.0.attn.{j}")
        put(self.d_l0_up, "decoder.conv_blocks.0.upsample.conv")
        for j, r in enumerate(self.d_l1_res):
            put(r, f"decoder.conv_blocks.1.res.{j}")
        put(self.d_norm_out, "decoder.norm_out")
        put(self.d_conv_out, "decoder.conv_out")

        sd[pre + "quantize.embedding.weight"] = self.codebook.weight
        put(self.quant_conv, "quant_conv")
        put(self.post_quant_conv, "post_quant_conv")
        return {k: v.detach().numpy() for k, v in sd.items()}


def test_vqgan_parity():
    torch.manual_seed(0)
    tm = TVQ()
    tm.eval()
    cfg = jvq.tiny_vq_config()
    params = weights.port_vqgan(tm.state_dict_janus(), cfg)

    x = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        z_ref = tm.encode_z(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    h = jvq.encoder_forward(params["encoder"], cfg, xj)
    z = jvq.conv2d(params["quant_conv"], h)
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref, atol=1e-4, rtol=1e-4)

    # decode parity from quantised latents
    zq = np.random.default_rng(2).normal(size=(2, cfg.codebook_dim, 8, 8)).astype(np.float32)
    with torch.no_grad():
        dec_ref = tm.decode_z(torch.tensor(zq)).numpy()
    dec = jvq.decode(params, cfg, jnp.asarray(zq.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=1e-4, rtol=1e-4)


def test_quantizer_matches_torch_l2_codebook():
    torch.manual_seed(0)
    cb = torch.randn(64, 8)
    cfg = jvq.tiny_vq_config(codebook_size=64, codebook_dim=8)
    params = jvq.init_params(cfg, jax.random.PRNGKey(0))
    params["codebook"] = jnp.asarray(cb.numpy())

    z = torch.randn(5, 8)
    # reference math (vq_model.py:242-259): normalise z and codebook, argmin dist
    zn = tF.normalize(z, p=2, dim=-1)
    en = tF.normalize(cb, p=2, dim=-1)
    d = (zn ** 2).sum(1, keepdim=True) + (en ** 2).sum(1) - 2 * zn @ en.T
    ref_ids = d.argmin(1).numpy()

    _, ids = jvq.quantize(params, cfg, jnp.asarray(z.numpy()).reshape(1, 5, 1, 8))
    np.testing.assert_array_equal(np.asarray(ids).ravel(), ref_ids)


# ===========================================================================
# Reference-code oracle tests (round-2): compare against the reference's OWN
# torch modules — janus/models/vq_model.py (imported standalone; it is
# torch-pure) and janus/models/siglip_vit.py (imported with a minimal timm
# stub supplying the layers it pulls from timm).  These supersede the
# builder-written replicas above as the ground truth for decode fidelity
# (vq_model.py:217-299, 393-447, 505-513; siglip_vit.py:136-589).
# ===========================================================================

import importlib.util
import sys
import types
from pathlib import Path
from typing import Any

REF_MODELS = Path("/root/reference/janus/models")

requires_reference = pytest.mark.skipif(
    not REF_MODELS.exists(),
    reason="reference checkout not mounted at /root/reference — "
    "reference-oracle parity NOT verified in this environment",
)


def _load_standalone(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_vq():
    if not REF_MODELS.exists():
        pytest.skip("no /root/reference")
    return _load_standalone("ref_vq_model", REF_MODELS / "vq_model.py")


def _ref_state_dict(model, prefix):
    return {prefix + k: v.detach().numpy() for k, v in model.state_dict().items()}


@requires_reference
def test_vq16_encode_matches_reference(ref_vq):
    """Full VQ-16 config (ch=128, mult 1,1,2,2,4, 16384x8 L2 codebook), fp32,
    against VQModel.encode (vq_model.py:494-498)."""
    torch.manual_seed(0)
    m = ref_vq.VQ_16()
    m.eval()
    cfg = jvq.VQ_16
    params = weights.port_vqgan(_ref_state_dict(m, "gen_vision_model."), cfg)

    x = np.random.default_rng(0).uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        quant_ref, _, info = m.encode(torch.tensor(x))
    ids_ref = info[2].numpy().reshape(2, 2, 2)

    z_q, ids = jvq.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(ids), ids_ref)
    np.testing.assert_allclose(
        np.asarray(z_q).transpose(0, 3, 1, 2), quant_ref.numpy(),
        atol=1e-5, rtol=1e-5)


@requires_reference
def test_vq16_decode_code_matches_reference(ref_vq):
    """decode_code parity incl. GroupNorm/swish, nearest-upsample and the
    decoder attn placement (vq_model.py:505-513, 127-214, 393-447)."""
    torch.manual_seed(1)
    m = ref_vq.VQ_16()
    m.eval()
    cfg = jvq.VQ_16
    params = weights.port_vqgan(_ref_state_dict(m, "gen_vision_model."), cfg)

    ids = np.random.default_rng(3).integers(0, cfg.codebook_size, size=(2, 4))
    ids = ids.astype(np.int32)
    with torch.no_grad():
        dec_ref = m.decode_code(torch.tensor(ids.ravel().astype(np.int64)),
                                shape=[2, cfg.codebook_dim, 2, 2]).numpy()
    dec = jvq.decode_code(params, cfg, jnp.asarray(ids), latent_hw=(2, 2))
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=2e-4, rtol=2e-4)


@requires_reference
def test_vq16_training_losses_match_reference(ref_vq):
    """Training-branch vq/commit losses and entropy loss vs the reference
    quantizer in train mode (vq_model.py:266-270, 450-463)."""
    torch.manual_seed(2)
    m = ref_vq.VQ_16()
    m.train()
    cfg = jvq.VQ_16
    params = weights.port_vqgan(_ref_state_dict(m, "gen_vision_model."), cfg)

    x = np.random.default_rng(5).uniform(-1, 1, size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        _, (vq_loss_ref, commit_ref, _), _ = m.encode(torch.tensor(x))

    h = jvq.encoder_forward(params["encoder"], cfg,
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    z = jvq.conv2d(params["quant_conv"], h)
    _, _, losses = jvq.quantize_with_losses(params, cfg, z)
    np.testing.assert_allclose(float(losses["vq_loss"]),
                               float(vq_loss_ref), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(losses["commit_loss"]),
                               float(commit_ref), atol=1e-5, rtol=1e-4)

    aff = np.random.default_rng(6).normal(size=(7, 13)).astype(np.float32)
    ent_ref = ref_vq.compute_entropy_loss(torch.tensor(aff)).item()
    np.testing.assert_allclose(float(jvq.entropy_loss(jnp.asarray(aff))),
                               ent_ref, atol=1e-5, rtol=1e-4)


# --------------------------- reference SigLIP ViT --------------------------


def _install_timm_stub():
    """Minimal torch implementations of the timm layers siglip_vit.py imports
    (siglip_vit.py:42-51).  Only the layers actually exercised at eval time
    carry real math (PatchEmbed/Mlp/AttentionPoolLatent); drop-path and
    patch-drop are identity at inference, exactly as timm's are."""
    if "timm" in sys.modules:
        return

    class Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=tnn.GELU, norm_layer=None, bias=True, drop=0.0,
                     **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.norm = norm_layer(hidden_features) if norm_layer else tnn.Identity()
            self.fc2 = tnn.Linear(hidden_features, out_features, bias=bias)

        def forward(self, x):
            return self.fc2(self.norm(self.act(self.fc1(x))))

    class PatchEmbed(tnn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True,
                     **kw):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = tnn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                   stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else tnn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-time identity

    class PatchDropout(tnn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        def forward(self, x):
            return x

    class AttentionPoolLatent(tnn.Module):
        def __init__(self, in_features, out_features=None, embed_dim=None,
                     num_heads=8, mlp_ratio=4.0, qkv_bias=True, latent_len=1,
                     latent_dim=None, pool_type="token", norm_layer=None,
                     drop=0.0, **kw):
            super().__init__()
            embed_dim = embed_dim or in_features
            out_features = out_features or in_features
            self.num_heads = num_heads
            self.head_dim = embed_dim // num_heads
            self.pool = pool_type
            self.pos_embed = None
            self.latent_dim = latent_dim or embed_dim
            self.latent_len = latent_len
            self.latent = tnn.Parameter(torch.zeros(1, latent_len, embed_dim))
            self.q = tnn.Linear(embed_dim, embed_dim, bias=qkv_bias)
            self.kv = tnn.Linear(embed_dim, embed_dim * 2, bias=qkv_bias)
            self.proj = tnn.Linear(embed_dim, embed_dim)
            self.norm = norm_layer(out_features) if norm_layer else tnn.Identity()
            self.mlp = Mlp(embed_dim, int(embed_dim * mlp_ratio))

        def init_weights(self):
            pass

        def forward(self, x):
            B, N, C = x.shape
            q = self.q(self.latent.expand(B, -1, -1)).reshape(
                B, self.latent_len, self.num_heads, self.head_dim).transpose(1, 2)
            kv = self.kv(x).reshape(
                B, N, 2, self.num_heads, self.head_dim).permute(2, 0, 3, 1, 4)
            k, v = kv.unbind(0)
            x = tF.scaled_dot_product_attention(q, k, v)
            x = x.transpose(1, 2).reshape(B, self.latent_len, C)
            x = self.proj(x)
            x = x + self.mlp(self.norm(x))
            return x[:, 0] if self.pool == "token" else x

    def resample_abs_pos_embed(*a, **kw):
        raise NotImplementedError("dynamic_img_size is not used by Janus")

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_name = ".".join((name, child_name)) if name else child_name
            named_apply(fn, child, child_name, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    def checkpoint_seq(blocks, x, **kw):
        for b in blocks:
            x = b(x)
        return x

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")
    manip = types.ModuleType("timm.models._manipulate")
    layers.Mlp = Mlp
    layers.PatchEmbed = PatchEmbed
    layers.DropPath = DropPath
    layers.PatchDropout = PatchDropout
    layers.AttentionPoolLatent = AttentionPoolLatent
    layers.resample_abs_pos_embed = resample_abs_pos_embed
    layers.LayerType = Any
    manip.named_apply = named_apply
    manip.checkpoint_seq = checkpoint_seq
    timm.layers = layers
    timm.models = models
    models._manipulate = manip
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models._manipulate"] = manip


@pytest.fixture(scope="module")
def ref_siglip():
    if not REF_MODELS.exists():
        pytest.skip("no /root/reference")
    _install_timm_stub()
    return _load_standalone("ref_siglip_vit", REF_MODELS / "siglip_vit.py")


def _make_ref_vit(ref_siglip, *, img=32, patch=16, dim=64, depth=3, heads=4,
                  mlp_ratio=3.7362, seed=0):
    torch.manual_seed(seed)
    m = ref_siglip.VisionTransformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, mlp_ratio=mlp_ratio, class_token=False,
        global_pool="map", ignore_head=True, weight_init="skip",
        num_classes=0)
    for p in m.parameters():
        tnn.init.normal_(p, std=0.02)
    m.eval()
    return m


@requires_reference
def test_siglip_vit_matches_reference(ref_siglip):
    """Patch embed → pos embed → blocks → final norm against the reference's
    own VisionTransformer.forward_features (siglip_vit.py:562-572), with the
    so400m fractional mlp_ratio."""
    m = _make_ref_vit(ref_siglip)
    cfg = jvit.ViTConfig(image_size=32, patch_size=16, width=64, layers=3,
                         heads=4, mlp_ratio=3.7362, select_layer=-1,
                         dtype=jnp.float32)
    params = weights.port_vit(_ref_state_dict(m, "vision_model.vision_tower."),
                              cfg)

    x = np.random.default_rng(7).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()  # ignore_head=True → features
    out = jvit.forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@requires_reference
def test_siglip_attn_pool_matches_reference(ref_siglip):
    """Latent attention-pool head ("map" global pool, siglip_vit.py:415-422)
    against the reference model's attn_pool on shared random features."""
    m = _make_ref_vit(ref_siglip, seed=1)
    cfg = jvit.ViTConfig(image_size=32, patch_size=16, width=64, layers=3,
                         heads=4, mlp_ratio=3.7362, select_layer=-1,
                         dtype=jnp.float32)
    params = weights.port_vit(_ref_state_dict(m, "vision_model.vision_tower."),
                              cfg)
    assert "attn_pool" in params, "port_vit must pick up attn_pool.* keys"

    feats = np.random.default_rng(8).normal(size=(2, 4, 64)).astype(np.float32)
    with torch.no_grad():
        ref = m.attn_pool(torch.tensor(feats)).numpy()
    out = jvit.attention_pool(params["attn_pool"], cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@requires_reference
def test_siglip_select_layer_truncation_matches_reference(ref_siglip):
    """Depth truncation formula parity with create_siglip_vit
    (siglip_vit.py:653-656) across select_layer values."""
    for layers in (3, 27, 24):
        for sel in (-1, -2, -4, 2):
            if sel <= 0:
                ref_depth = min(layers, layers + sel + 1)
            else:
                ref_depth = min(layers, sel)
            cfg = jvit.ViTConfig(layers=layers, select_layer=sel)
            assert cfg.depth == ref_depth, (layers, sel)
