"""ResNet-50/101 backbone with frozen batch norm, NHWC, flax.linen.

Functional equivalent of the reference backbone (`src/models/backbone.py:18-98`,
torchvision resnet + FrozenBatchNorm2d): returns the four stage outputs at
strides [4, 8, 16, 32] with channels [256, 512, 1024, 2048], with the optional
DC5 dilation on the last stage. Parameter names mirror the torchvision state
dict (`conv1`, `bn1`, `layer{i}.{j}.conv{k}` …) so the torch→JAX checkpoint
converter is a mechanical rename.

BatchNorm statistics and affines live in the separate ``frozen`` variable
collection: they are never trained (the reference freezes them always) and
never touched by the optimizer.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BLOCK_COUNTS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        w = self.variable("frozen", "weight", jnp.ones, (f,)).value
        b = self.variable("frozen", "bias", jnp.zeros, (f,)).value
        rm = self.variable("frozen", "running_mean", jnp.zeros, (f,)).value
        rv = self.variable("frozen", "running_var", jnp.ones, (f,)).value
        scale = (w * jax.lax.rsqrt(rv + 1e-5)).astype(self.dtype)
        bias = (b - rm * w * jax.lax.rsqrt(rv + 1e-5)).astype(self.dtype)
        return x * scale + bias


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        out = nn.Conv(self.width, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        out = FrozenBatchNorm(self.width, dtype=d, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=d, name="conv2")(out)
        out = FrozenBatchNorm(self.width, dtype=d, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=d, name="conv3")(out)
        out = FrozenBatchNorm(self.width * 4, dtype=d, name="bn3")(out)
        if self.has_downsample:
            sc = nn.Conv(self.width * 4, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=d, name="downsample_0")(x)
            sc = FrozenBatchNorm(self.width * 4, dtype=d, name="downsample_1")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class _StemParams(nn.Module):
    """Declares the stem conv's `nn.Conv`-identical param (kernel
    (7,7,3,64)) so checkpoints are interchangeable while the forward is free
    to run an equivalent reformulation."""
    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


def _stem_conv(parent, x, d):
    """7×7/s2 stem conv. With 3 input channels the MXU contraction is almost
    empty (~1.1 TFLOP/s measured); for even H/W the EXACT same map is
    computed as a 4×4/s1 conv over 2×2 space-to-depth input (12 channels):
    with u = k−3 = 2a+b the 7×7 taps regroup as (a∈[−2,1], b∈{0,1}) pairs,
    i.e. the kernel zero-padded to 8×8 at the top-left and reshaped."""
    w7 = _StemParams(name="conv1")().astype(d)
    B, H, W, _ = x.shape
    if H % 2 or W % 2:
        return jax.lax.conv_general_dilated(
            x, w7, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, 3) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 12)
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 12, 64)
    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    """Returns [layer1, layer2, layer3, layer4] NHWC feature maps."""
    name_variant: str = "resnet50"
    dilation: bool = False          # DC5: stride→dilation in layer4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> List[jnp.ndarray]:
        # `deterministic` is part of the shared backbone interface (the Swin
        # backbone uses it for DropPath); the ResNet has no stochastic parts.
        del deterministic
        d = self.dtype
        x = x.astype(d)
        x = _stem_conv(self, x, d)
        x = FrozenBatchNorm(64, dtype=d, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        counts = BLOCK_COUNTS[self.name_variant]
        widths = (64, 128, 256, 512)
        outs = []
        dilation = 1
        for stage, (n_blocks, width) in enumerate(zip(counts, widths)):
            stride = 1 if stage == 0 else 2
            if stage == 3 and self.dilation:
                dilation, stride = 2, 1
            for blk in range(n_blocks):
                x = Bottleneck(width,
                               stride=stride if blk == 0 else 1,
                               dilation=dilation,
                               has_downsample=(blk == 0),
                               dtype=d,
                               name=f"layer{stage + 1}_{blk}")(x)
            outs.append(x)
        return outs

    @staticmethod
    def num_channels(name_variant: str) -> Tuple[int, ...]:
        return (256, 512, 1024, 2048)

    @staticmethod
    def strides(dilation: bool) -> Tuple[int, ...]:
        return (4, 8, 16, 16) if dilation else (4, 8, 16, 32)
