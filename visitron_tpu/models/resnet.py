"""Eval-mode ResNet backbones (50/101/152) in flax for feature extraction.

Replaces torchvision's ResNet-152 in the scene-feature pipeline
(scripts/precompute_resnet_img_features.py:117-131) and serves as the
detection backbone.  Inference-only: BatchNorm uses stored running statistics
(folded at apply time), which is exactly how the reference uses the model
(``model.eval()``).  A torchvision-layout state-dict importer is provided so
published ImageNet weights drop in (torchvision itself is not required).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with stored statistics (inference only).

    ``dtype``: compute dtype — the folded scale/shift are derived in fp32
    from the fp32 stored statistics, then cast, so bf16 mode loses only the
    final multiply-add's precision, not the variance epsilon's.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


def _conv(features, kernel, strides=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   name=name, dtype=dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block.

    ``caffe_v1``: the original (Kaiming/caffe, and hence bottom-up-attention
    VG) ResNet puts the stride on the first 1x1 conv; torchvision's "v1.5"
    puts it on the 3x3.  The published caffe weights only reproduce under v1
    stride placement.
    """

    features: int  # bottleneck width; output is 4x
    strides: int = 1
    downsample: bool = False
    caffe_v1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.strides if self.caffe_v1 else 1
        s2 = 1 if self.caffe_v1 else self.strides
        dt = self.dtype
        out = _conv(self.features, 1, s1, name="conv1", dtype=dt)(x)
        out = FrozenBatchNorm(self.features, name="bn1", dtype=dt)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, s2, name="conv2", dtype=dt)(out)
        out = FrozenBatchNorm(self.features, name="bn2", dtype=dt)(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, name="conv3", dtype=dt)(out)
        out = FrozenBatchNorm(self.features * 4, name="bn3", dtype=dt)(out)
        if self.downsample:
            sc = _conv(self.features * 4, 1, self.strides,
                       name="downsample_conv", dtype=dt)(x)
            sc = FrozenBatchNorm(self.features * 4, name="downsample_bn",
                                 dtype=dt)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    depth: int = 152
    # Compute dtype.  Params stay fp32 (importer layout unchanged); flax
    # casts them per-op.  NOTE: merely feeding bf16 images to the fp32
    # default does NOT give bf16 convs — flax promotes to
    # result_type(inputs, params) = fp32 — so bf16 inference must be asked
    # for here.  fp32 default preserves torchvision numerical parity.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, return_stages: bool = False):
        """images: (B, H, W, 3) float in [0, 1]; ImageNet-normalized inside.

        Returns pooled (B, 2048) float32 features (and stage outputs c2..c5
        when ``return_stages``, for detection heads).
        """
        blocks = STAGE_BLOCKS[self.depth]
        x = ((images.astype(jnp.float32) - IMAGENET_MEAN)
             / IMAGENET_STD).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        stages = []
        width = 64
        for si, n in enumerate(blocks):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                down = bi == 0
                x = Bottleneck(width, strides=stride, downsample=down,
                               name=f"layer{si + 1}_{bi}",
                               dtype=self.dtype)(x)
            stages.append(x)
            width *= 2
        # Pool in fp32: a (15, 20)-window mean of bf16 values would lose
        # ~2 decimal digits to accumulation.
        pooled = jnp.mean(stages[-1].astype(jnp.float32), axis=(1, 2))
        if return_stages:
            return pooled, stages
        return pooled


def convert_torchvision_resnet(state: dict, depth: int = 152) -> dict:
    """torchvision resnet state dict (numpy values) -> flax params subtree."""
    p: dict = {}
    g = lambda k: np.asarray(state[k])

    def conv(k):  # torch OIHW -> flax HWIO
        return {"kernel": g(k + ".weight").transpose(2, 3, 1, 0)}

    def bn(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias"),
                "mean": g(k + ".running_mean"), "var": g(k + ".running_var")}

    p["conv1"] = conv("conv1")
    p["bn1"] = bn("bn1")
    for si, n in enumerate(STAGE_BLOCKS[depth]):
        for bi in range(n):
            pre = f"layer{si + 1}.{bi}."
            blk = {
                "conv1": conv(pre + "conv1"), "bn1": bn(pre + "bn1"),
                "conv2": conv(pre + "conv2"), "bn2": bn(pre + "bn2"),
                "conv3": conv(pre + "conv3"), "bn3": bn(pre + "bn3"),
            }
            if pre + "downsample.0.weight" in state:
                blk["downsample_conv"] = conv(pre + "downsample.0")
                blk["downsample_bn"] = bn(pre + "downsample.1")
            p[f"layer{si + 1}_{bi}"] = blk
    return p
