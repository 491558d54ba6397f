"""YOLOv8-style object detector (Flax, NHWC).

Capability parity with the reference's YOLO path: a 3-branch FPN detector at
640x640 whose head emits, per branch (strides 8/16/32), a DFL box tensor
(4 sides x `dfl_bins` logits) and per-class sigmoid scores — exactly the
tensors the reference's postprocess consumes (reference src/tool.py:103-155:
`dfl` softmax-expectation over 16 bins, grid+stride decode, 3-branch
flatten/concat). The reference ships only compiled .rknn graphs; this module
provides the trainable/deployable TPU equivalent, and
`lanetpu.ops.dfl.decode_boxes` reproduces the decode math on device.

Architecture: CSP backbone with C2f blocks + SPPF, PAN neck, decoupled head.
Width/depth multipliers select the model scale (default ~YOLOv8n).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from lanetpu.core.config import YoloConfig


def _c(ch: int, width_mult: float) -> int:
    return max(16, int(round(ch * width_mult / 8)) * 8)


def _d(n: int, depth_mult: float) -> int:
    return max(1, round(n * depth_mult))


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8 style)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        y = ConvBNSiLU(2 * hidden, 1, dtype=self.dtype)(x, train)
        parts = [y[..., :hidden], y[..., hidden:]]
        for _ in range(self.n):
            parts.append(
                Bottleneck(hidden, self.shortcut, dtype=self.dtype)(parts[-1], train)
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvBNSiLU(self.features, 1, dtype=self.dtype)(y, train)


class SPPF(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        x = ConvBNSiLU(hidden, 1, dtype=self.dtype)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        return ConvBNSiLU(self.features, 1, dtype=self.dtype)(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train
        )


def _upsample2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class YoloDetector(nn.Module):
    """Returns per-branch (box_dfl, cls_logits) tuples, finest stride first.

    box_dfl: [N, H/s, W/s, 4 * dfl_bins] raw DFL logits
    cls:     [N, H/s, W/s, num_classes] class logits (sigmoid-activated
             downstream, matching the reference's class-conf tensors).
    """

    config: YoloConfig = YoloConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        w, d = cfg.width_mult, cfg.depth_mult
        c1, c2, c3, c4, c5 = (_c(64, w), _c(128, w), _c(256, w),
                              _c(512, w), _c(1024, w))

        # Backbone
        x = ConvBNSiLU(c1, 3, 2, dtype=self.dtype, name="stem")(x, train)       # /2
        x = ConvBNSiLU(c2, 3, 2, dtype=self.dtype, name="down1")(x, train)      # /4
        x = C2f(c2, _d(3, d), dtype=self.dtype, name="c2f1")(x, train)
        x = ConvBNSiLU(c3, 3, 2, dtype=self.dtype, name="down2")(x, train)      # /8
        p3 = C2f(c3, _d(6, d), dtype=self.dtype, name="c2f2")(x, train)
        x = ConvBNSiLU(c4, 3, 2, dtype=self.dtype, name="down3")(p3, train)     # /16
        p4 = C2f(c4, _d(6, d), dtype=self.dtype, name="c2f3")(x, train)
        x = ConvBNSiLU(c5, 3, 2, dtype=self.dtype, name="down4")(p4, train)     # /32
        x = C2f(c5, _d(3, d), dtype=self.dtype, name="c2f4")(x, train)
        p5 = SPPF(c5, dtype=self.dtype, name="sppf")(x, train)

        # PAN neck
        u4 = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        n4 = C2f(c4, _d(3, d), shortcut=False, dtype=self.dtype, name="neck_p4")(u4, train)
        u3 = jnp.concatenate([_upsample2x(n4), p3], axis=-1)
        n3 = C2f(c3, _d(3, d), shortcut=False, dtype=self.dtype, name="neck_p3")(u3, train)
        d4 = ConvBNSiLU(c3, 3, 2, dtype=self.dtype, name="pan_down3")(n3, train)
        n4 = C2f(c4, _d(3, d), shortcut=False, dtype=self.dtype, name="pan_p4")(
            jnp.concatenate([d4, n4], axis=-1), train)
        d5 = ConvBNSiLU(c4, 3, 2, dtype=self.dtype, name="pan_down4")(n4, train)
        n5 = C2f(c5, _d(3, d), shortcut=False, dtype=self.dtype, name="pan_p5")(
            jnp.concatenate([d5, p5], axis=-1), train)

        # Decoupled head per branch
        outputs = []
        box_ch = 4 * cfg.dfl_bins
        for i, feat in enumerate((n3, n4, n5)):
            b = ConvBNSiLU(max(box_ch, feat.shape[-1] // 4), 3,
                           dtype=self.dtype, name=f"head{i}_box0")(feat, train)
            b = ConvBNSiLU(b.shape[-1], 3, dtype=self.dtype,
                           name=f"head{i}_box1")(b, train)
            b = nn.Conv(box_ch, (1, 1), dtype=self.dtype,
                        name=f"head{i}_box_out")(b)
            c = ConvBNSiLU(max(cfg.num_classes, feat.shape[-1] // 4), 3,
                           dtype=self.dtype, name=f"head{i}_cls0")(feat, train)
            c = ConvBNSiLU(c.shape[-1], 3, dtype=self.dtype,
                           name=f"head{i}_cls1")(c, train)
            c = nn.Conv(cfg.num_classes, (1, 1), dtype=self.dtype,
                        name=f"head{i}_cls_out")(c)
            outputs.append((b, c))
        return outputs


# Class lists used by the reference's two detector deployments.
CLASSES_12 = ("Cola", "Potato", "lajiao", "Milk", "Tomato",
              "Traffic_light_red", "Traffic_light_green", "Cake",
              "Watermelon", "Green_apple", "Banana", "Traffic_light_no")
# reference src/yolo_detector.py:67
CLASSES_11 = ("banana", "cake", "cola", "apple", "lajiao", "milk",
              "potato", "tomato", "greenlight", "redlight", "watermelon")
# reference src/yolo_debug.py:47


def yolo_from_meta(meta: dict, classes: tuple | None = None):
    """(YoloConfig, classes) from a .ltpu artifact's self-describing meta —
    the ONE place artifact meta maps to detector construction, shared by
    YoloEngine.from_checkpoint and MultiModelPipeline.from_checkpoints."""
    nc = meta.get("num_classes", 12)
    if classes is None:
        if meta.get("classes"):
            # Artifact carries its own class names (real-dataset training);
            # never guess from the count in that case.
            classes = tuple(meta["classes"])
        else:
            classes = (CLASSES_11 if nc == 11 else CLASSES_12 if nc == 12
                       else tuple(str(i) for i in range(nc)))
    cfg = YoloConfig(num_classes=nc,
                     img_size=tuple(meta.get("img_size", (640, 640))),
                     width_mult=meta.get("width_mult", 0.25),
                     depth_mult=meta.get("depth_mult", 0.33))
    return cfg, classes
