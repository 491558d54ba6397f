"""BatchNorm folding: trained UNet variables -> inference conv+bias params.

The deployed RKNN graph has no standalone BN ops — 14 plain ConvRelu layers
(model/lane_unet.rknn metadata, SURVEY.md §2.1 #18) — because the RKNN
compiler folds BN into the convolutions. `fold_unet_batchnorm` performs the
same transform:

  w' = w * gamma / sqrt(var + eps)          (per output channel)
  b' = beta - mean * gamma / sqrt(var + eps)

producing a flat {layer_name: {kernel, bias}} dict consumed by the
functional forward (`lanetpu.quant.functional_unet`), which is the substrate
for both the int8 path and future Pallas conv kernels.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5


def _fold_conv_bn(conv: dict, bn_params: dict, bn_stats: dict) -> dict:
    kernel = np.asarray(conv["kernel"], dtype=np.float32)  # [kh, kw, cin, cout]
    gamma = np.asarray(bn_params["scale"], dtype=np.float32)
    beta = np.asarray(bn_params["bias"], dtype=np.float32)
    mean = np.asarray(bn_stats["mean"], dtype=np.float32)
    var = np.asarray(bn_stats["var"], dtype=np.float32)
    mult = gamma / np.sqrt(var + BN_EPS)
    folded_kernel = kernel * mult  # broadcast over cout (last axis)
    folded_bias = beta - mean * mult
    if "bias" in conv:
        folded_bias = folded_bias + np.asarray(conv["bias"]) * mult
    return {"kernel": folded_kernel, "bias": folded_bias}


def fold_unet_batchnorm(variables: dict, features) -> dict:
    """UNet train variables {params, batch_stats} -> flat folded param dict.

    Keys follow the execution plan of `unet_layer_plan`:
      enc{i}.conv{j}, bottleneck.conv{j}, up{i}, dec{i}.conv{j}, head
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = {}

    def fold_block(block_name: str):
        block_p = params[block_name]
        block_s = stats.get(block_name, {})
        for j in range(2):
            conv = block_p[f"conv{j}"]
            if f"bn{j}" in block_p:
                out[f"{block_name}.conv{j}"] = _fold_conv_bn(
                    conv, block_p[f"bn{j}"], block_s[f"bn{j}"])
            else:
                out[f"{block_name}.conv{j}"] = {
                    "kernel": np.asarray(conv["kernel"], np.float32),
                    "bias": np.asarray(conv.get(
                        "bias", np.zeros(conv["kernel"].shape[-1])), np.float32),
                }

    n = len(features)
    for i in range(n):
        fold_block(f"enc{i}")
    fold_block("bottleneck")
    for i in range(n):
        out[f"up{i}"] = {
            "kernel": np.asarray(params[f"up{i}"]["kernel"], np.float32),
            "bias": np.asarray(params[f"up{i}"]["bias"], np.float32),
        }
        fold_block(f"dec{i}")
    out["head"] = {
        "kernel": np.asarray(params["head"]["kernel"], np.float32),
        "bias": np.asarray(params["head"]["bias"], np.float32),
    }
    return out


def unet_layer_plan(features) -> list:
    """Ordered op plan for the functional forward.

    ops: ('conv', name, relu?) | ('pool',) | ('save_skip', i) |
         ('convT', name) | ('concat', i) — mirrors UNet.__call__.
    """
    plan = []
    n = len(features)
    for i in range(n):
        plan.append(("conv", f"enc{i}.conv0", True))
        plan.append(("conv", f"enc{i}.conv1", True))
        plan.append(("save_skip", i))
        plan.append(("pool",))
    plan.append(("conv", "bottleneck.conv0", True))
    plan.append(("conv", "bottleneck.conv1", True))
    for i in range(n):
        plan.append(("convT", f"up{i}"))
        plan.append(("concat", n - 1 - i))
        plan.append(("conv", f"dec{i}.conv0", True))
        plan.append(("conv", f"dec{i}.conv1", True))
    plan.append(("conv", "head", False))
    return plan
