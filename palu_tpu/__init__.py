"""palu_tpu: a TPU-native (JAX/XLA/Pallas) low-rank + quantized KV-cache
inference framework implementing the Palu compression scheme.

Reference capability set: shadowpa0327/Palu (post-training G-LRD low-rank
decomposition of k/v projections, Fisher-based rank search, low-rank-aware
2/3/4-bit latent quantization with Hadamard rotation, fused reconstruction
kernels). Architecture here is TPU-first: functional params pytrees, one
unified accuracy+latency engine with a real latent KV cache, pjit/shard_map
parallelism over a (data, model) mesh, and Pallas kernels for the decode hot
path.
"""

__version__ = "0.1.0"
