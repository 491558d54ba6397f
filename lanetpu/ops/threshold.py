"""Sigmoid / binarization postprocessing ops.

Parity target: reference src/unet.py:59-67 — optional sigmoid then
`(mask > threshold) * 255` as uint8. The reference applies sigmoid only when
the output range looks like logits (a heuristic); here it is an explicit flag
on the pipeline config.
"""

import jax.numpy as jnp


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.reciprocal(1.0 + jnp.exp(-x.astype(jnp.float32)))


def binarize(prob: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Probabilities -> uint8 {0, 255} mask (reference src/unet.py:67)."""
    return (prob > threshold).astype(jnp.uint8) * jnp.uint8(255)
