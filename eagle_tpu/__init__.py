"""eagle_tpu — TPU-native quantized LLM inference engine with EAGLE speculative decoding.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
mkjsym/EAGLE-in-llama.cpp (llama.cpp + EAGLE feature-level speculation),
re-designed TPU-first: SPMD over device meshes, fused dequant+matmul Pallas
kernels, fully-jitted draft/verify speculation cycles, and a continuous-batching
serving layer.

Subpackages
-----------
- ``gguf``      GGUF v2/v3 container reader/writer (ref: ggml/src/gguf.cpp)
- ``quant``     block quantization formats + TPU repacking (ref: ggml/src/ggml-quants.c)
- ``ops``       compute kernels: Pallas fused quant matmul, attention, norms, rope
- ``models``    functional model definitions (llama family, EAGLE draft head)
- ``runtime``   KV cache, sampling, generation & speculative engines
- ``tokenizer`` SPM/BPE tokenizers built from GGUF vocab metadata
- ``parallel``  mesh construction and sharding rules
- ``server``    OpenAI-compatible continuous-batching HTTP server
- ``tools``     quantize / perplexity / bench / convert CLIs
"""

__version__ = "0.1.0"
