"""DROID tracker networks in flax (NHWC, bf16-friendly).

Rebuild of reference src/modules/droid_net/:
  * BasicEncoder / ResidualBlock — extractor.py:4-127 (feature net fnet with
    instance norm -> 128ch @ 1/8; context net cnet with no norm -> 256ch).
  * ConvGRU with global context — gru.py:5-33.
  * UpdateModule (corr/flow encoders, delta/weight heads) — droid_net.py:69-139.
  * GraphAgg (per-keyframe aggregation -> damping eta + upsample mask) —
    droid_net.py:34-66.

Layout: NHWC (TPU-native); the torch checkpoint importer in
``import_torch.py`` transposes OIHW -> HWIO. GradientClip modules
(clipping.py) are backward-pass-only and vanish at inference.

Channel-slice surgery applied at checkpoint load (only the first 2 output
channels of the delta/weight heads are used, reference slam.py:75-78) is
handled by the importer.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.detsum import edge_einsum

DIM = 32
CORR_PLANES = 4 * (2 * 3 + 1) ** 2  # 4 levels x 7x7 window = 196


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d with no affine params (torch default), NHWC."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    """reference extractor.py:4-55 (norm_fn in {'instance', 'none'})."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    def _norm(self, x):
        if self.norm_fn == "instance":
            return instance_norm(x)
        return x  # 'none'

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(self._norm(y))
        if self.stride > 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding=0,
                        dtype=self.dtype, name="downsample")(x)
            x = self._norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """reference extractor.py:61-127: 1/8-resolution CNN encoder."""
    out_dim: int
    norm_fn: str = "instance"
    dtype: Any = jnp.float32

    def _norm(self, x):
        if self.norm_fn == "instance":
            return instance_norm(x)
        return x

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized images -> (B, H/8, W/8, out_dim)."""
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(self._norm(x))
        for i, (dim, stride) in enumerate(
            [(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]
        ):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class ConvGRU(nn.Module):
    """reference gru.py:5-33: ConvGRU with a global-context pathway.

    The reference's separate convz/convr (and convz_glo/convr_glo) share the
    same input, so they run here as ONE double-width conv each (``convzr``,
    ``convzr_glo``; channels [z | r]) — identical math, half the conv
    dispatches on the per-round hot path. The checkpoint importer
    concatenates the torch kernels accordingly (import_torch.py)."""
    h_planes: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp):
        """net (B,h,w,128) hidden state; inp (B,h,w,Ci) stacked inputs."""
        net_inp = jnp.concatenate([net, inp], axis=-1)
        glo = nn.sigmoid(
            nn.Conv(self.h_planes, (1, 1), dtype=self.dtype, name="w")(net)
        ) * net
        glo = jnp.mean(glo, axis=(1, 2), keepdims=True)  # (B,1,1,128)

        zr = nn.sigmoid(
            nn.Conv(2 * self.h_planes, (3, 3), padding=1, dtype=self.dtype,
                    name="convzr")(net_inp)
            + nn.Conv(2 * self.h_planes, (1, 1), dtype=self.dtype,
                      name="convzr_glo")(glo)
        )
        z = zr[..., :self.h_planes]
        r = zr[..., self.h_planes:]
        q = nn.tanh(
            nn.Conv(self.h_planes, (3, 3), padding=1, dtype=self.dtype,
                    name="convq")(jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(self.h_planes, (1, 1), dtype=self.dtype,
                      name="convq_glo")(glo)
        )
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """reference droid_net.py:34-66: per-keyframe aggregation head.

    Produces the per-frame BA damping (0.01 * softplus) and the 8x upsample
    mask. The reference's scatter_mean over unique source frames becomes a
    segment mean with host-provided inverse indices (static frame capacity).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, kk, num_frames: int, edge_mask=None,
                 with_upmask: bool = True):
        """net (E,h,w,128); kk (E,) edge -> frame-slot; returns
        (eta (M,h,w), upmask (M,h,w,8*8*9)) with M = num_frames.

        ``with_upmask=False`` skips the 576-channel upsample-mask head
        (upmask is None): inside a fused multi-round scan only the FINAL
        round's mask is ever consumed, and the head costs ~0.5 GB of
        activation traffic per round."""
        E, h, w, c = net.shape
        x = nn.relu(
            nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv1")(net)
        )
        # Cross-edge reduction as a fixed-association one-hot contraction
        # (utils/detsum.py): under edge sharding GSPMD splits a segment_sum
        # into per-shard partials + psum, reassociating the f32 adds vs the
        # single-device program; that noise rounds to a full bf16 ulp in the
        # recurrent damping path and the DSPO stage-2 fit amplifies it
        # (tests/test_parallel.py::test_fused_rounds_sharded_dspo). The
        # one-hot matmul also rides the MXU instead of the scatter unit.
        ones_e = jnp.ones((E,), x.dtype)
        mask = edge_mask.astype(x.dtype) if edge_mask is not None else ones_e
        oh = (kk[:, None] == jnp.arange(num_frames)[None, :]).astype(x.dtype)
        oh = oh * mask[:, None]
        counts = edge_einsum("ek,e->k", oh, ones_e)
        summed = edge_einsum("ek,ec->kc", oh, x.reshape(E, -1))
        mean = (summed / jnp.maximum(counts, 1.0)[:, None]).reshape(
            num_frames, h, w, c
        )
        y = nn.relu(
            nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv2")(mean)
        )
        eta = nn.softplus(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="eta")(y)
        )[..., 0]
        upmask_conv = nn.Conv(8 * 8 * 9, (1, 1), dtype=self.dtype,
                              name="upmask")
        upmask = upmask_conv(y) if with_upmask else None
        return 0.01 * eta, upmask


class UpdateModule(nn.Module):
    """reference droid_net.py:69-139: recurrent flow/weight update operator."""
    dtype: Any = jnp.float32

    def setup(self):
        self.corr_enc_1 = nn.Conv(128, (1, 1), dtype=self.dtype)
        self.corr_enc_2 = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype)
        self.flow_enc_1 = nn.Conv(128, (7, 7), padding=3, dtype=self.dtype)
        self.flow_enc_2 = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)
        # delta_1 + weight_1 share the input (net), so they run as ONE
        # double-width conv: channels [delta(128) | weight(128)]. The
        # importer concatenates the reference's separate kernels.
        self.dw_1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)
        self.weight_2 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype)
        self.delta_2 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype)
        self.gru = ConvGRU(128, dtype=self.dtype)
        self.agg = GraphAgg(dtype=self.dtype)

    def __call__(self, net, inp, corr, flow=None, kk=None,
                 num_frames: int = 0, edge_mask=None,
                 with_upmask: bool = True):
        """All tensors NHWC, edge-batched:
          net (E,h,w,128) GRU hidden; inp (E,h,w,128) context;
          corr (E,h,w,196); flow (E,h,w,4) motion features.
        Returns (net, delta (E,h,w,2), weight (E,h,w,2)) and, when ``kk`` is
        given, (eta (M,h,w), upmask (M,h,w,576)).
        """
        E, h, w, _ = net.shape
        if flow is None:
            flow = jnp.zeros((E, h, w, 4), net.dtype)

        corr = nn.relu(self.corr_enc_1(corr))
        corr = nn.relu(self.corr_enc_2(corr))
        flow = nn.relu(self.flow_enc_1(flow))
        flow = nn.relu(self.flow_enc_2(flow))

        net = self.gru(net, jnp.concatenate([inp, corr, flow], axis=-1))

        dw = nn.relu(self.dw_1(net))
        delta = self.delta_2(dw[..., :128])
        weight = nn.sigmoid(self.weight_2(dw[..., 128:]))

        if kk is not None:
            eta, upmask = self.agg(net, kk, num_frames, edge_mask,
                                   with_upmask=with_upmask)
            return net, delta, weight, eta, upmask
        return net, delta, weight


class DroidNet(nn.Module):
    """Tracker net bundle (reference droid_net.py:142-147)."""
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(128, "instance", self.dtype)
        self.cnet = BasicEncoder(256, "none", self.dtype)
        self.update = UpdateModule(self.dtype)

    def __call__(self, images):
        """Init-time forward touching every submodule: images (B, H, W, 3)."""
        fmap = self.fnet(images)
        ctx = self.cnet(images)
        net, inp = jnp.split(ctx, 2, axis=-1)
        net, inp = jnp.tanh(net), nn.relu(inp)
        B, h, w, _ = net.shape
        corr = jnp.zeros((B, h, w, CORR_PLANES), net.dtype)
        kk = jnp.zeros((B,), jnp.int32)
        self.update(net, inp, corr, None, kk, 1, None)
        return fmap, net, inp

    def features(self, images):
        return self.fnet(images)

    def context(self, images):
        """-> (net0 tanh, inp relu) (reference motion_filter.py:35-38)."""
        ctx = self.cnet(images)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def update_step(self, net, inp, corr, flow=None, kk=None,
                    num_frames: int = 0, edge_mask=None,
                    with_upmask: bool = True):
        return self.update(net, inp, corr, flow, kk, num_frames, edge_mask,
                           with_upmask=with_upmask)

    def agg_step(self, net, kk, num_frames: int = 0, edge_mask=None):
        """GraphAgg alone (eta + upmask) on an existing hidden state —
        used to produce the final upsample mask after a fused multi-round
        scan that ran with with_upmask=False."""
        return self.update.agg(net, kk, num_frames, edge_mask,
                               with_upmask=True)


# ImageNet normalization used on tracker inputs (reference motion_filter.py:28-29)
IMAGE_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGE_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_images(images):
    """images (..., H, W, 3) in [0, 1] -> ImageNet-normalized."""
    return (images - IMAGE_MEAN) / IMAGE_STD
