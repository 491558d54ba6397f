"""ResNet backbone + lane-point regression heads (Flax, NHWC).

Capability parity with the reference's two regression models:
  * ResNet50-backbone 4-x-coordinate regressor at fixed bird's-eye rows
    (reference src/resnet50_node.py:23-29, src/resnet50_inference.py) —
    `ResNetRegressor(num_outputs=4)`;
  * 6-point (x, y) centerline regressor (reference src/rknpu_inference.py:
    66-90, 12 normalized outputs) — `ResNetRegressor(num_outputs=12)`.

Both emit normalized coordinates in [0, 1] (the reference clips its model
outputs to that range; we bound them with a sigmoid head instead, so the
clip in postprocessing is a no-op for well-trained models).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from lanetpu.core.config import ResNetConfig

# depth -> (block sizes, bottleneck?)
_SPECS = {
    18: ((2, 2, 2, 2), False),
    34: ((3, 4, 6, 3), False),
    50: ((3, 4, 6, 3), True),
    101: ((3, 4, 23, 3), True),
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="proj")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="proj")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Backbone: input [N, H, W, 3] -> pooled feature vector [N, D]."""

    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks, bottleneck = _SPECS[self.depth]
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n in enumerate(blocks):
            for j in range(n):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(64 * 2**i, strides, self.dtype,
                              name=f"stage{i}_block{j}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool


class ResNetRegressor(nn.Module):
    """ResNet backbone + linear regression head for lane points."""

    config: ResNetConfig = ResNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ResNet(self.config.depth, self.dtype, name="backbone")(x, train)
        out = nn.Dense(self.config.num_outputs, dtype=self.dtype, name="head")(feat)
        if self.config.final_sigmoid:
            out = nn.sigmoid(out)
        return out


# Fixed bird's-eye row coordinates of the 4-x-coordinate regressor
# (reference src/resnet50_node.py:29), in the 685-row warped frame.
FIXED_Y_COORDS = (530, 582, 633, 685)
