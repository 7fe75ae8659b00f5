"""DPT depth model (omnidata, ViT-B hybrid ResNet50 backbone) in flax.

Rebuild of reference src/mono_priors/omnidata/modules/midas/ (dpt_depth.py:
26-107, vit.py:345-495, blocks.py:231-341 — vendored timm/MiDaS code; the
losses/, unet.py and channel_attention.py files there are vendored but
UNUSED by the pipeline, SURVEY.md §2 row 22). Architecture, matched to the
exact structure the omnidata_dpt_depth_v2 checkpoint was trained with
(timm ``vit_base_r50_s16_384``):

  * ResNetV2-50 stem (weight-standardized 'same'-padded convs, GroupNorm32,
    NON-pre-activation bottlenecks: conv1-norm1-conv2-norm2-conv3-norm3 with
    ReLU after the residual add, downsample = 1x1 conv + norm) producing
    1/4 (256ch) and 1/8 (512ch) feature hooks;
  * ViT-B/16 over the 1/16 grid (768 dim, 12 blocks, 12 heads, cls token)
    with hooks after blocks 9 and 12 (vit.py:370-371, hooks [8, 11]);
  * DPT reassemble ('project' readout) + 4 RefineNet fusion blocks (256ch,
    bilinear align_corners=True upsampling, blocks.py:291-341) and the
    monocular depth head (dpt_depth.py:91-98); inference at 512x512
    (mono_estimators.py:42).

Inference contract matches the reference: normalize(0.5, 0.5), forward,
clamp [0, 1], bicubic resize back to the frame size.

Parameter families are named so import_dpt.load_omnidata_checkpoint can map
every tensor of the torch state dict; activation parity vs the reference
torch model (with a faithful timm stand-in backbone) is asserted in
tests/test_parity_dpt.py.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Module):
    """Weight-standardized conv, 'same' padding (timm StdConv2dSame with
    eps=1e-8 as used by the hybrid backbone)."""
    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        params = self.param(
            "kernel_raw",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        # standardize per OUTPUT channel over (h, w, in) — torch F.batch_norm
        # over the (O, I*kh*kw) view, biased variance
        mean = jnp.mean(params, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(params, axis=(0, 1, 2), keepdims=True)
        w = (params - mean) / jnp.sqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GNReLU(nn.Module):
    """timm GroupNormAct(32, eps=1e-5) with ReLU."""
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.relu(
            nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x))


class Bottleneck(nn.Module):
    """timm ResNetV2 NON-preact bottleneck (resnetv2.py Bottleneck):
    conv1-norm1-conv2(stride)-norm2-conv3-norm3, ReLU(x + shortcut);
    shortcut = downsample(conv 1x1 stride + norm) when shape changes."""
    mid: int
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.stride > 1 or x.shape[-1] != self.out:
            s = StdConv(self.out, 1, self.stride, name="downsample_conv")(x)
            shortcut = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                    name="downsample_norm")(s)
        y = StdConv(self.mid, 1, name="conv1")(x)
        y = GNReLU(name="norm1")(y)
        y = StdConv(self.mid, 3, self.stride, name="conv2")(y)
        y = GNReLU(name="norm2")(y)
        y = StdConv(self.out, 1, name="conv3")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm3")(y)
        return nn.relu(shortcut + y)


class ResNetStem(nn.Module):
    """ResNetV2-50 stages 1-3 (layers (3, 4, 9), through 1/16), hooks at
    1/4 and 1/8 (vit.py:363-368 registers hooks on stages 0 and 1)."""

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, 7, 2, name="stem_conv")(x)
        x = GNReLU(name="stem_norm")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # 1/4
        for i in range(3):
            x = Bottleneck(64, 256, 1, name=f"stage0_{i}")(x)
        hook0 = x                                                   # 1/4
        for i in range(4):
            x = Bottleneck(128, 512, 2 if i == 0 else 1,
                           name=f"stage1_{i}")(x)
        hook1 = x                                                   # 1/8
        for i in range(9):
            x = Bottleneck(256, 1024, 2 if i == 0 else 1,
                           name=f"stage2_{i}")(x)                   # 1/16
        return hook0, hook1, x


class MHSA(nn.Module):
    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.heads, -1), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        scale = (self.dim // self.heads) ** -0.5
        att = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(self.dim, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + MHSA(self.dim, self.heads, name="attn")(y)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class ResidualConvUnit(nn.Module):
    """blocks.py ResidualConvUnit_custom (bn=False, ReLU)."""
    features: int = 256

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


def _ac_weight(n_in, n_out):
    """Row-stochastic bilinear interpolation matrix with torch
    align_corners=True semantics: src = i * (n_in-1)/(n_out-1)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / max(n_out - 1, 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
    frac = src - lo.astype(jnp.float32)
    rows = jnp.arange(n_out)
    W = jnp.zeros((n_out, n_in), jnp.float32)
    W = W.at[rows, lo].set(1.0 - frac)
    W = W.at[rows, lo + 1].add(frac)
    return W


def upsample2_ac(x):
    """2x bilinear upsampling with align_corners=True (torch F.interpolate
    in blocks.py:335-337 / dpt_depth.py:93) as two MXU matmuls."""
    B, H, W, C = x.shape
    Wh = _ac_weight(H, 2 * H)
    Ww = _ac_weight(W, 2 * W)
    y = jnp.einsum("oh,bhwc->bowc", Wh, x)
    return jnp.einsum("ow,bhwc->bhoc", Ww, y)


class FeatureFusion(nn.Module):
    """DPT RefineNet fusion block (blocks.py FeatureFusionBlock_custom,
    deconv=False, bn=False, expand=False, align_corners=True)."""
    features: int = 256

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        else:
            # refinenet4 never receives a skip, but its resConfUnit1 weights
            # exist in the checkpoint — materialize the params (zero-scaled,
            # XLA folds the dead compute) so the importer maps every tensor
            x = x + 0.0 * ResidualConvUnit(self.features, name="rcu1")(x)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = upsample2_ac(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTDepthModel(nn.Module):
    """Full hybrid DPT (reference dpt_depth.py:26-107)."""
    dim: int = 768
    heads: int = 12
    n_blocks: int = 12
    hooks: Sequence[int] = (8, 11)       # transformer hooks (layers 9, 12)
    features: int = 256

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, 3), H/W multiples of 16, normalized (0.5, 0.5).
        Returns depth (B, H, W) in [0, inf) (omnidata outputs ~[0,1])."""
        B, H, W, _ = x.shape
        h16, w16 = H // 16, W // 16

        hook0, hook1, feat = ResNetStem(name="backbone")(x)

        # patch embed on the 1/16 resnet features (hybrid patch size 1)
        tokens = nn.Conv(self.dim, (1, 1), name="patch_embed")(feat)
        tokens = tokens.reshape(B, h16 * w16, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h16 * w16 + 1, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.dim)), tokens], 1
        ) + pos

        t_hooks = []
        for i in range(self.n_blocks):
            tokens = ViTBlock(self.dim, self.heads, name=f"block_{i}")(tokens)
            if i in self.hooks:
                t_hooks.append(tokens)
        # hooks fire on raw block outputs (vit.py:161-165); the final
        # LayerNorm only feeds the unused `glob` return — params kept for
        # checkpoint completeness, output discarded
        _ = nn.LayerNorm(name="norm")(tokens)
        if (self.n_blocks - 1) not in self.hooks:
            t_hooks.append(tokens)
        t_hooks = t_hooks[:2]

        # reassemble transformer hooks to spatial maps ("project" readout:
        # cat(tokens, cls) -> Linear -> GELU, vit.py:36-47)
        def reassemble(t, out_ch, name):
            clsT, grid = t[:, :1], t[:, 1:]
            g = jnp.concatenate(
                [grid, jnp.broadcast_to(clsT, grid.shape)], -1
            )
            g = nn.Dense(self.dim, name=f"{name}_readout")(g)
            g = nn.gelu(g, approximate=False)
            g = g.reshape(B, h16, w16, self.dim)
            return nn.Conv(out_ch, (1, 1), name=f"{name}_proj")(g)

        l3 = reassemble(t_hooks[0], 768, "reassemble3")          # 1/16
        l4 = reassemble(t_hooks[1], 768, "reassemble4")
        l4 = nn.Conv(768, (3, 3), strides=2, padding=1,
                     name="reassemble4_down")(l4)                # 1/32

        # scratch: project all 4 levels to `features`
        s1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer1_rn")(hook0)                    # 1/4
        s2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer2_rn")(hook1)                    # 1/8
        s3 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer3_rn")(l3)                       # 1/16
        s4 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer4_rn")(l4)                       # 1/32

        p4 = FeatureFusion(self.features, name="refinenet4")(s4)        # 1/16
        p3 = FeatureFusion(self.features, name="refinenet3")(p4, s3)    # 1/8
        p2 = FeatureFusion(self.features, name="refinenet2")(p3, s2)    # 1/4
        p1 = FeatureFusion(self.features, name="refinenet1")(p2, s1)    # 1/2

        # monocular depth head (dpt_depth.py:91-98)
        y = nn.Conv(self.features // 2, (3, 3), padding=1,
                    name="head_conv1")(p1)
        y = upsample2_ac(y)                                      # 1/1
        y = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        return nn.relu(y)[..., 0]
