"""U-Net lane-line segmentation model (Flax, NHWC).

Capability parity with the reference's two U-Net variants:
  * the documented PyTorch training model (reference README.md:1417-1491):
    per-stage [conv3x3(no bias) + BN + ReLU] x2, 2x2 maxpool, bottleneck at
    2x the deepest width, ConvTranspose(k=2, s=2) upsampling, skip concat
    with the *skip tensor first* (README.md:1478), 1x1 output conv;
  * the deployed 3-level INT8 graph (model/lane_unet.rknn metadata:
    14 ConvRelu / 3 MaxPool / 3 ConvTranspose / 3 Concat).

Depth/width are config (`UNetConfig.features`), covering both presets.

TPU-first notes: NHWC layout (XLA's native conv layout on TPU), static
224x224 shapes so every conv tiles onto the MXU, bf16 compute with f32
params by default. The whole forward is a single XLA program; BN folds into
the convs at inference via `fold_batchnorm`.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from lanetpu.core.config import UNetConfig
from lanetpu.ops.space2depth import depth_to_space, space_to_depth


class ConvBlock(nn.Module):
    """[conv3x3(no bias) -> BN -> ReLU] x2 (reference README.md:1449-1458)."""

    features: int
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=not self.use_batchnorm,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Encoder-decoder segmentation net. Input [N, H, W, C] -> [N, H, W, out]."""

    config: UNetConfig = UNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if cfg.s2d > 1:
            # TPU input packing (ops/space2depth.py): run the whole net at
            # 1/s2d spatial resolution on pixel-packed channels; the head
            # emits s2d^2 x out_channels and unpacks to full resolution.
            x = space_to_depth(x, cfg.s2d)
        skips = []
        # Encoder
        for i, f in enumerate(cfg.features):
            x = ConvBlock(f, cfg.use_batchnorm, self.dtype, name=f"enc{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        # Bottleneck
        x = ConvBlock(
            cfg.features[-1] * 2, cfg.use_batchnorm, self.dtype, name="bottleneck"
        )(x, train)
        # Decoder
        for i, f in enumerate(reversed(cfg.features)):
            x = nn.ConvTranspose(
                f,
                kernel_size=(2, 2),
                strides=(2, 2),
                dtype=self.dtype,
                name=f"up{i}",
            )(x)
            skip = skips[-(i + 1)]
            # Skip tensor first, matching the reference concat order
            # (README.md:1478: torch.cat([skip, x], dim=1)).
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBlock(f, cfg.use_batchnorm, self.dtype, name=f"dec{i}")(x, train)
        # 1x1 head
        x = nn.Conv(
            cfg.out_channels * cfg.s2d * cfg.s2d,
            kernel_size=(1, 1), dtype=self.dtype, name="head"
        )(x)
        if cfg.s2d > 1:
            x = depth_to_space(x, cfg.s2d)
        if cfg.final_sigmoid:
            x = nn.sigmoid(x)
        return x


def create_unet(config: UNetConfig | None = None, dtype=jnp.float32) -> UNet:
    return UNet(config=config or UNetConfig(), dtype=dtype)
