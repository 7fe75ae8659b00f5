"""Minimal torch stand-in for timm's ``vit_base_r50_s16_384`` so the
reference DPT sources (which do ``timm.create_model(...)``) can be built in
this environment. Parameter names and forward semantics replicate timm's
ResNetV2 hybrid backbone (resnetv2.py non-preact Bottleneck, StdConv2dSame
eps=1e-8, GroupNormAct 32/1e-5, 'same' stem) and VisionTransformer (LayerNorm
eps=1e-6, exact GELU) so that a state_dict from this model has exactly the
key families of the real omnidata checkpoint.

Register before importing the reference midas code:

    sys.modules["timm"] = make_timm_module()
"""

import math
import types
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


class StdConv2dSame(nn.Conv2d):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, bias=False,
                 eps=1e-8):
        super().__init__(in_ch, out_ch, kernel_size, stride=stride,
                         padding=0, bias=bias)
        self.eps = eps

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        w = F.batch_norm(
            self.weight.reshape(1, self.out_channels, -1), None, None,
            training=True, momentum=0.0, eps=self.eps,
        ).reshape_as(self.weight)
        return F.conv2d(x, w, self.bias, self.stride, (0, 0),
                        self.dilation, self.groups)


class MaxPool2dSame(nn.Module):
    def forward(self, x):
        ih, iw = x.shape[-2:]
        ph = max((math.ceil(ih / 2) - 1) * 2 + 3 - ih, 0)
        pw = max((math.ceil(iw / 2) - 1) * 2 + 3 - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2],
                  value=-float("inf"))
        return F.max_pool2d(x, 3, 2)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, num_channels, num_groups=32, eps=1e-5, apply_act=True):
        super().__init__(num_groups, num_channels, eps=eps)
        self.act = nn.ReLU(inplace=False) if apply_act else nn.Identity()

    def forward(self, x):
        return self.act(super().forward(x))


class DownsampleConv(nn.Module):
    def __init__(self, in_chs, out_chs, stride):
        super().__init__()
        self.conv = StdConv2dSame(in_chs, out_chs, 1, stride=stride)
        self.norm = GroupNormAct(out_chs, apply_act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    def __init__(self, in_chs, out_chs, mid_chs, stride):
        super().__init__()
        if stride != 1 or in_chs != out_chs:
            self.downsample = DownsampleConv(in_chs, out_chs, stride)
        else:
            self.downsample = None
        self.conv1 = StdConv2dSame(in_chs, mid_chs, 1)
        self.norm1 = GroupNormAct(mid_chs)
        self.conv2 = StdConv2dSame(mid_chs, mid_chs, 3, stride=stride)
        self.norm2 = GroupNormAct(mid_chs)
        self.conv3 = StdConv2dSame(mid_chs, out_chs, 1)
        self.norm3 = GroupNormAct(out_chs, apply_act=False)
        self.act3 = nn.ReLU(inplace=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = self.norm1(self.conv1(x))
        y = self.norm2(self.conv2(y))
        y = self.norm3(self.conv3(y))
        return self.act3(y + shortcut)


class ResNetStage(nn.Module):
    def __init__(self, in_chs, out_chs, mid_chs, depth, stride):
        super().__init__()
        self.blocks = nn.Sequential(*[
            Bottleneck(in_chs if i == 0 else out_chs, out_chs, mid_chs,
                       stride if i == 0 else 1)
            for i in range(depth)
        ])

    def forward(self, x):
        return self.blocks(x)


class ResNetV2Backbone(nn.Module):
    """ResNetV2 (layers (3, 4, 9), non-preact, 'same' stem) through 1/16."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(OrderedDict([
            ("conv", StdConv2dSame(3, 64, 7, stride=2)),
            ("norm", GroupNormAct(64)),
            ("pool", MaxPool2dSame()),
        ]))
        self.stages = nn.Sequential(
            ResNetStage(64, 256, 64, 3, 1),
            ResNetStage(256, 512, 128, 4, 2),
            ResNetStage(512, 1024, 256, 9, 2),
        )

    def forward(self, x):
        return self.stages(self.stem(x))


class HybridEmbed(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.backbone = ResNetV2Backbone()
        self.proj = nn.Conv2d(1024, dim, 1)

    def forward(self, x):  # unused: forward_flex calls backbone/proj itself
        return self.proj(self.backbone(x)).flatten(2).transpose(1, 2)


class Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.num_heads = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, D // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (D // h) ** -0.5
        att = att.softmax(dim=-1)
        x = (att @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim=768, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class VisionTransformerHybrid(nn.Module):
    def __init__(self, dim=768, depth=12, heads=12, grid=24):
        super().__init__()
        self.patch_embed = HybridEmbed(dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.ModuleList([Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)


def create_model(name, pretrained=False, **kwargs):
    assert "r50" in name, f"timm stub only provides the hybrid ViT-B ({name})"
    torch.manual_seed(0)
    model = VisionTransformerHybrid()
    # randomize cls_token too (zeros would mask readout mapping bugs)
    with torch.no_grad():
        model.cls_token.normal_(0, 0.02)
    return model


def make_timm_module():
    mod = types.ModuleType("timm")
    mod.create_model = create_model
    return mod
