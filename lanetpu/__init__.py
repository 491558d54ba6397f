"""lanetpu — a TPU-native (JAX/XLA/Pallas) rebuild of the capabilities of the
reference `unet-lane-detection` stack (ROS/RKNN smart-car perception package).

Subpackages
-----------
core      : configuration, dtype/layout conventions
ops       : jnp image ops with OpenCV-parity semantics (resize, warp, letterbox, ...)
kernels   : Pallas TPU kernels (fused preprocess/postprocess, int8 conv)
models    : Flax models (U-Net, ResNet50 + regression heads, YOLO detector)
quant     : int8 calibration/quantization with RKNN-parity semantics
runtime   : engines (executor layer) + high-level inference pipelines
parallel  : device mesh / sharding (data + spatial parallelism)
pipeline  : streaming runner, async channels, double-buffered prefetch
train     : losses, augmentation, synthetic data, training loop, checkpoints
control   : host-side robotics control (PID, state machines, LiDAR/IMU fusion)
eval      : metrics (IoU/Dice/mAP), parity harnesses
cli       : command-line entry points

The reference stack is a single-board NPU inference app; this framework keeps
the same capability surface but is designed TPU-first: batched NHWC tensors,
one fused XLA program per pipeline (frame -> mask in a single device launch),
`jax.sharding` meshes for scale-out, and Pallas kernels on the hot paths.
"""

from lanetpu.version import __version__

__all__ = ["__version__"]
