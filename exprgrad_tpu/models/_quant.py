"""Weight-only int8 quantization helpers for the serving runtimes.

The implementation lives in :mod:`exprgrad_tpu.quant` (shared with
``Model.quantize_weights``, which additionally infers scale axes from
the kernel IR); this module keeps the serving-local import path.
"""

from ..quant import QuantW, dequantize, quantize_weight

__all__ = ["QuantW", "dequantize", "quantize_weight"]
