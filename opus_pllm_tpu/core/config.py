"""Typed configuration tree for the whole framework.

One dataclass hierarchy replaces the reference's scattered argparse flags,
mutable class-level config (`multi_modality_v1/model/builder.py:24-28`) and
per-module dataclasses (`protein_projector/builder.py:5-13`,
`protein_mlp/builder.py:6-9`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Special token conventions (reference: multi_modality_v1/constants.py:7-9)
# ---------------------------------------------------------------------------
IGNORE_INDEX = -100
SEQ_TOKEN_INDEX = -200
SEQ_TOKEN = "<seq>"


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ESM2Config:
    """ESM2 protein encoder (fair-esm `esm2_t*` family).

    Reference uses esm2_t33_650M_UR50D (cstp_v3/modelling.py:21). Smaller
    presets mirror the public fair-esm family and are used for tests.
    """

    num_layers: int = 33
    embed_dim: int = 1280
    num_heads: int = 20
    vocab_size: int = 33          # fair-esm alphabet size
    # fair-esm alphabet special ids
    cls_idx: int = 0
    pad_idx: int = 1
    eos_idx: int = 2
    mask_idx: int = 32
    token_dropout: bool = True    # ESM2 masks-and-rescales embed at train time
    dtype: str = "float32"

    @property
    def ffn_dim(self) -> int:
        return self.embed_dim * 4

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @staticmethod
    def t33_650M() -> "ESM2Config":
        return ESM2Config(num_layers=33, embed_dim=1280, num_heads=20)

    @staticmethod
    def t36_3B() -> "ESM2Config":
        return ESM2Config(num_layers=36, embed_dim=2560, num_heads=40)

    @staticmethod
    def t30_150M() -> "ESM2Config":
        return ESM2Config(num_layers=30, embed_dim=640, num_heads=20)

    @staticmethod
    def t12_35M() -> "ESM2Config":
        return ESM2Config(num_layers=12, embed_dim=480, num_heads=20)

    @staticmethod
    def t6_8M() -> "ESM2Config":
        return ESM2Config(num_layers=6, embed_dim=320, num_heads=20)

    @staticmethod
    def tiny() -> "ESM2Config":
        """Test-only config: 2 layers, 64-wide."""
        return ESM2Config(num_layers=2, embed_dim=64, num_heads=4)


@dataclass(frozen=True)
class DecoderConfig:
    """A decoder-only LLM. One config covers the three reference families.

    family:
      - "llama": RMSNorm + RoPE + GQA + SiLU-gated MLP (Llama-3)
      - "qwen2": llama skeleton + attention QKV bias (Qwen2.5)
      - "opt":   LayerNorm + learned positions (offset 2) + ReLU MLP
                 (OPT / Galactica)
    """

    family: str = "llama"
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    # Dynamic NTK-aware RoPE scaling for contexts past the trained length
    # (the Qwen config flag the reference's builder.py:93-94 sets — inside
    # its commented-out Qwen branch — restored here as a real feature);
    # see models/layers.ntk_scaled_theta for the formula.
    use_dynamic_ntk: bool = False
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    attention_bias: bool = False      # True for qwen2 (QKV only)
    # OPT-specific
    do_layer_norm_before: bool = True
    activation: str = "silu"          # "relu"/"gelu" for OPT/Galactica
    dtype: str = "bfloat16"

    @property
    def jnp_dtype(self):
        return _dtype(self.dtype)

    # ---- presets -----------------------------------------------------------
    @staticmethod
    def llama3_8b() -> "DecoderConfig":
        return DecoderConfig(
            family="llama", vocab_size=128256, hidden_size=4096,
            intermediate_size=14336, num_layers=32, num_heads=32,
            num_kv_heads=8, head_dim=128, rope_theta=500000.0,
        )

    @staticmethod
    def qwen25_7b() -> "DecoderConfig":
        return DecoderConfig(
            family="qwen2", vocab_size=152064, hidden_size=3584,
            intermediate_size=18944, num_layers=28, num_heads=28,
            num_kv_heads=4, head_dim=128, rope_theta=1000000.0,
            attention_bias=True, rms_norm_eps=1e-6,
        )

    @staticmethod
    def galactica_6_7b() -> "DecoderConfig":
        return DecoderConfig(
            family="opt", vocab_size=50000, hidden_size=4096,
            intermediate_size=16384, num_layers=32, num_heads=32,
            num_kv_heads=32, head_dim=128, max_position_embeddings=2048,
            activation="gelu",
        )

    @staticmethod
    def tiny(family: str = "llama") -> "DecoderConfig":
        """Test-only config."""
        return DecoderConfig(
            family=family, vocab_size=256, hidden_size=64,
            intermediate_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2 if family != "opt" else 4, head_dim=16,
            max_position_embeddings=512, dtype="float32",
            attention_bias=(family == "qwen2"),
            activation="relu" if family == "opt" else "silu",
        )


@dataclass(frozen=True)
class BertConfig:
    """BERT encoder (used for BioBERT-large BERTScore in the eval harness)."""

    vocab_size: int = 58996          # biobert-large-cased-v1.1
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    dtype: str = "float32"

    @staticmethod
    def tiny() -> "BertConfig":
        return BertConfig(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, intermediate_size=128,
                          max_position_embeddings=128)


# ---------------------------------------------------------------------------
# Bridge configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CSTPConfig:
    """Stage-(a) contrastive protein-sequence<->text alignment adapter.

    Active reference path: normalize -> Linear(1280->5120) for protein,
    Linear(5120->5120) for text (cstp_v3/modelling.py:370-394).
    """

    protein_dim: int = 1280
    text_dim: int = 5120
    proj_dim: int = 5120
    temperature: float = 0.0007     # TrustEvidenceLoss temp (modelling.py:312)
    # Evidential (Dirichlet) loss knobs (cstp_v3/evidence_loss.py:44).
    # The reference hard-codes W=c=128, silently coupling the loss to a
    # contrastive batch of 128; here W/c default to the runtime batch size.
    kl_threshold_step: int = 30
    kl_annealing_steps: int = 500
    kl_coefficient: float = 1.0
    evidence_global_step: int = 1000  # fixed at call sites (modelling.py:325)
    # Dead-gradient protection (losses.py module docstring): cold-start
    # embeddings can saturate every elu+1 evidence to 0, flat-lining the
    # evidential loss. 0 = reference-faithful (no warm-up, the DEFAULT —
    # the warm-up is explicit opt-in so default training optimizes exactly
    # the reference loss); N > 0 = train the first N steps with
    # info_nce_sym; -1 = automatic — use info_nce_sym on any step where
    # losses.evidence_is_dead() holds. When != 0 the trainer reports a
    # `warmup_active` metric so fallback steps are visible in logs.
    warmup_info_nce_steps: int = 0

    @staticmethod
    def tiny() -> "CSTPConfig":
        return CSTPConfig(protein_dim=64, text_dim=96, proj_dim=96)


@dataclass(frozen=True)
class SwitchProjectorConfig:
    """Stage-(c) modality refinement projector.

    Maps the CSTP embedding to `hidden_size * n_tokens` and reshapes into
    `n_tokens` soft tokens (protein_mlp/builder.py:11-25). `projector_type`
    is 'linear' or 'mlp<N>x_gelu'.
    """

    input_dim: int = 5120            # 1280 when running raw-ESM (no CSTP)
    llm_hidden_size: int = 4096
    n_tokens: int = 8
    projector_type: str = "mlp2x_gelu"

    @property
    def output_dim(self) -> int:
        return self.llm_hidden_size * self.n_tokens

    @property
    def mlp_depth(self) -> int:
        import re
        if self.projector_type == "linear":
            return 1
        m = re.match(r"^mlp(\d+)x_gelu$", self.projector_type)
        if not m:
            raise ValueError(f"unknown projector_type: {self.projector_type}")
        return int(m.group(1))


# ---------------------------------------------------------------------------
# Assembled multimodal model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OpusConfig:
    """Full protein-multimodal model: encoder + CSTP + switch + LLM."""

    esm: ESM2Config = field(default_factory=ESM2Config.t33_650M)
    cstp: Optional[CSTPConfig] = field(default_factory=CSTPConfig)
    switch: SwitchProjectorConfig = field(default_factory=SwitchProjectorConfig)
    llm: DecoderConfig = field(default_factory=DecoderConfig.llama3_8b)
    # static splicing capacity
    max_prompt_len: int = 512        # token budget before protein expansion
    max_proteins_per_prompt: int = 1

    @staticmethod
    def tiny(family: str = "llama") -> "OpusConfig":
        llm = DecoderConfig.tiny(family)
        cstp = CSTPConfig.tiny()
        return OpusConfig(
            esm=ESM2Config.tiny(),
            cstp=dataclasses.replace(cstp, protein_dim=64, text_dim=96, proj_dim=96),
            switch=SwitchProjectorConfig(input_dim=96, llm_hidden_size=llm.hidden_size,
                                         n_tokens=4),
            llm=llm,
            max_prompt_len=64,
        )


# ---------------------------------------------------------------------------
# Runtime configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh: data axis for DP/FSDP, model axis for TP."""

    data: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "model")


@dataclass(frozen=True)
class GenerationConfig:
    """Mirrors the reference generate() call sites (run_opus_ddp.py:120-132)."""

    max_new_tokens: int = 256
    temperature: float = 0.1
    top_p: float = 0.7
    # reference semantics: do_sample iff temperature > 0
    eos_token_id: int = -1
    pad_token_id: int = 0
    seed: int = 0
    quantize_cache: object = False   # True/"int8" or "int4" KV cache
    # --num_beams surface (run_opus_ddp.py:156-158); >1 switches the engine
    # to beam search (greedy scoring, HF early_stopping=False semantics)
    num_beams: int = 1
    length_penalty: float = 1.0
    # self-speculative (layer-skip) decoding: >0 drafts with the target's
    # own first N layers and verifies K=n_draft proposals per target pass
    # (infer/speculative.py). Greedy-only; token-identical by construction
    draft_layers: int = 0
    n_draft: int = 4

    @property
    def do_sample(self) -> bool:
        return self.temperature > 0


@dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    dropout: float = 0.0
    # projections to adapt; mirrors common PEFT target_modules for Llama
    target_modules: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj",
                                       "gate_proj", "up_proj", "down_proj")


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 0.05       # stage-(a) AdamW lr (modelling.py:599)
    weight_decay: float = 1e-4
    batch_size: int = 128
    num_epochs: int = 1
    warmup_steps: int = 0
    grad_clip_norm: float = 0.0
    seed: int = 0
    log_every: int = 10
    # sequence-chunked cross-entropy: 0 = full (B, S, V) logits; >0 bounds
    # live fp32 logits to (B, chunk, V) — required for single-chip training
    # of 128k-vocab 8B models where full logits+softmax add ~4 GB
    ce_chunk: int = 0
    # layer-loop layout for the decoder scan (models/decoder.py): "xs" scans
    # over stacked weights as scan xs (best default), "index" indexes the
    # stack with dynamic_slice inside the body — bounds XLA's relayout
    # copies to one layer, which is what lets single-chip 8B training fit
    # (the documented ce_chunk + scan_mode="index" recipe, BENCH_NOTES.md)
    scan_mode: str = "xs"
    # gradient accumulation: split each batch into this many micro-chunks,
    # one forward/backward per chunk, ONE optimizer update — effective
    # batch stays batch_size while activation memory drops to the chunk's
    # (the single-chip counterpart of adding DDP replicas); combined by
    # valid-token weighting so the update equals the big-batch step
    grad_accum: int = 1
    # per-layer rematerialization policy for the decoder backward pass:
    # "full" = jax.checkpoint per layer (max memory savings, pays a full
    # extra forward — required for single-chip 8B), "none" = save
    # activations (measured 1.34x on the 1.1B stage-(c/d) step, which is
    # compute-bound, not memory-bound, at batch 8 x seq 512 —
    # BENCH_NOTES round 5), "dots" = checkpoint_dots policy (save MXU
    # outputs, recompute elementwise only)
    remat: str = "full"

    @property
    def remat_mode(self):
        """TrainConfig.remat -> the decoder.forward remat argument."""
        return {"full": True, "none": False, "dots": "dots"}[self.remat]


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
