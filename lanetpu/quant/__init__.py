from lanetpu.quant.qtensor import (
    QuantParams,
    quantize_asymmetric,
    quantize_symmetric_per_channel,
    dequantize,
    fake_quant,
)
from lanetpu.quant.fold import fold_unet_batchnorm, unet_layer_plan
from lanetpu.quant.functional_unet import unet_forward_folded
from lanetpu.quant.calibrate import calibrate_unet, quantize_unet
from lanetpu.quant.parity import parity_report
from lanetpu.quant.generic import (
    collect_ranges,
    quantize_variables,
    make_quantized_forward,
    quantize_forward,
)
from lanetpu.quant.pipeline import quantize_checkpoint

__all__ = [
    "QuantParams",
    "quantize_asymmetric",
    "quantize_symmetric_per_channel",
    "dequantize",
    "fake_quant",
    "fold_unet_batchnorm",
    "unet_layer_plan",
    "unet_forward_folded",
    "calibrate_unet",
    "quantize_unet",
    "parity_report",
    "collect_ranges",
    "quantize_variables",
    "make_quantized_forward",
    "quantize_forward",
    "quantize_checkpoint",
]
