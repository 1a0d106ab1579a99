"""opus-pllm-tpu: a TPU-native protein-multimodal LLM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of OPUS-PLLM
(reference: Fanchuana/OPUS-PLLM): an ESM2 protein encoder fused with
decoder-only LLMs (Llama-3, OPT/Galactica, Qwen2.5) through a
contrastively-trained CSTP alignment adapter and a modality-refinement
("switch") projector that injects each protein as 8 soft tokens into the
LLM embedding stream.

Subpackages
-----------
core     : configs, mesh/sharding, checkpointing, PyTorch weight converters
kernels  : Pallas TPU kernels (flash attention, int8 matmul) + JAX references
models   : ESM2 / Llama-3 / OPT / Qwen2 / BERT as pure-functional JAX modules
bridge   : CSTP adapter, switch projector, static multimodal splicer, losses
lora     : LoRA parameter trees (init/apply/merge)
train    : training stages (a) CSTP, (c) projector, (d) LoRA
infer    : batched KV-cache generation engine, conversation templates
evals    : benchmark dataset loaders, task metrics, eval runners
"""

__version__ = "0.1.0"
