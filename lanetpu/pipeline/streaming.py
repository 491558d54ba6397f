"""Streaming runner: double-buffered host->HBM frame pipeline.

The reference's streaming loop is a ROS callback doing host preprocess + one
blocking NPU call per frame (src/unet_ros_node.py:292-338, ~30 Hz). Its own
README recommends an async double-buffered design it never implemented
(README.md:4316-4341). This runner is that design, TPU-native:

  frame source -> host batcher -> [H2D copy of batch N+1 overlaps device
  compute of batch N] -> mask sink channel

Overlap comes from JAX's async dispatch: `device_put` of the next batch and
the jitted compute of the current batch are issued without blocking; the
host only synchronizes when fetching results a full batch behind.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.pipeline.channels import Bus


class StreamingRunner:
    """Generic double-buffered batch pipeline over a device function.

    device_fn: jitted fn(batch_device_array) -> device output
    """

    def __init__(self, device_fn: Callable, batch_size: int = 32,
                 device=None):
        self.device_fn = device_fn
        self.batch_size = batch_size
        self.device = device or jax.devices()[0]
        self.stats = {"frames": 0, "batches": 0, "wall_s": 0.0}

    def _batches(self, frames: Iterable) -> Iterator:
        buf = []
        for f in frames:
            buf.append(f)
            if len(buf) == self.batch_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)

    def run(self, frames: Iterable, sink: Callable | None = None) -> dict:
        """Stream all frames; call sink(host_output_batch) per batch.

        Keeps one batch in flight: while batch N computes on device, batch
        N+1 is staged host->HBM; results are fetched one batch behind so
        the host never blocks on the device inside the staging path.
        """
        t_start = time.perf_counter()
        in_flight = None  # (device_future, n_frames)
        for batch in self._batches(frames):
            staged = jax.device_put(jnp.asarray(batch), self.device)
            out = self.device_fn(staged)  # async dispatch
            if in_flight is not None:
                prev_out, n = in_flight
                host = np.asarray(prev_out)  # sync point: batch behind
                if sink is not None:
                    sink(host)
                self.stats["frames"] += n
                self.stats["batches"] += 1
            in_flight = (out, len(batch))
        if in_flight is not None:
            prev_out, n = in_flight
            host = np.asarray(prev_out)
            if sink is not None:
                sink(host)
            self.stats["frames"] += n
            self.stats["batches"] += 1
        self.stats["wall_s"] = time.perf_counter() - t_start
        self.stats["fps"] = (self.stats["frames"] / self.stats["wall_s"]
                             if self.stats["wall_s"] > 0 else 0.0)
        return dict(self.stats)


class LaneStreamNode:
    """The ROS lane-segmentation node, re-expressed over channels.

    Equivalent of LaneSegmentationROS (reference src/unet_ros_node.py:
    232-350): subscribes to an input frame channel, runs the fused
    warp+segment pipeline, publishes masks, logs FPS every 5 s.
    """

    def __init__(self, segmenter, bus: Bus | None = None,
                 input_topic: str = "/image_rect_color",
                 output_topic: str = "/mask", warped: bool = True,
                 log_interval_s: float = 5.0,
                 log_fn: Callable = print):
        self.segmenter = segmenter
        self.bus = bus or Bus()
        self.in_ch = self.bus.channel(input_topic, queue_size=1)
        self.out_ch = self.bus.channel(output_topic, queue_size=1)
        self.warped = warped
        self.log_interval_s = log_interval_s
        self.log_fn = log_fn
        self.frame_count = 0
        self.total_time = 0.0
        self._last_log = time.time()
        self._stop = threading.Event()
        self.in_ch.subscribe(self._on_frame)

    def _on_frame(self, frame_bgr: np.ndarray) -> None:
        if self._stop.is_set():
            return
        t0 = time.perf_counter()
        if self.warped:
            mask, _ = self.segmenter.predict_warped(frame_bgr)
        else:
            mask, _ = self.segmenter.predict(frame_bgr[..., ::-1])
        self.out_ch.publish(mask)
        dt = time.perf_counter() - t0
        self.frame_count += 1
        self.total_time += dt
        now = time.time()
        if now - self._last_log > self.log_interval_s:
            fps = self.frame_count / self.total_time if self.total_time else 0
            self.log_fn(f"Lane Segmentation - Frames: {self.frame_count}, "
                        f"Avg FPS: {fps:.1f}")
            self._last_log = now

    def shutdown(self) -> None:
        self._stop.set()
        self.segmenter.release()
