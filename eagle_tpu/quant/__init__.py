from .blocks import SUPPORTED_QUANT_TYPES, dequantize, quantize

__all__ = ["quantize", "dequantize", "SUPPORTED_QUANT_TYPES"]
