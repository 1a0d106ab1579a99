"""PyTorch -> JAX weight converters.

Handles the reference's four checkpoint dialects (SURVEY.md §5):
  1. fair-esm / HF-ESM encoder weights (incl. the CSTP Lightning ckpt's
     fine-tuned `protein_model.model.*` overlay, cstp_v3/modelling.py:25-30)
  2. Lightning `.ckpt` CSTP adapters (protein_projector/builder.py:16-25)
  3. HF safetensors/bin LLM checkpoints (Llama-3 / OPT / Qwen2)
  4. PEFT LoRA adapter dirs, merged a la builder.py:105-111

torch (CPU) is used only at conversion time; everything downstream is JAX.
All converters accept a `state_dict`-like mapping of numpy/torch tensors.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .config import BertConfig, CSTPConfig, DecoderConfig, ESM2Config, SwitchProjectorConfig

# ---------------------------------------------------------------------------
# Host-side conversion mode
# ---------------------------------------------------------------------------

# ContextVar (not a module global): per-thread/task scoped, so a concurrent
# conversion on another thread cannot observe this one's host mode
import contextvars

_HOST_MODE = contextvars.ContextVar("opus_convert_host_mode", default=False)


def _asarray(x, dtype=None):
    """jnp.asarray, or numpy passthrough inside `host_arrays()`."""
    if _HOST_MODE.get():
        a = np.asarray(x)
        return a.astype(dtype) if dtype is not None and a.dtype != dtype else a
    return jnp.asarray(x, dtype=dtype)


class host_arrays:
    """Context manager: converters return numpy (host RAM) leaves instead
    of device arrays.

    Loading a big model per-layer onto the chip and stacking there peaks at
    full-params + one stacked leaf AND fragments HBM — measured as the
    remaining single-chip 8B OOM after the compiled step itself fit
    (BENCH_NOTES.md round 2). Convert under host_arrays(), stack with
    decoder.stack_params (numpy-aware: np.stack on host), then transfer
    once per stacked leaf with jax.device_put — fewer, larger transfers
    are also ~25% faster through the chip tunnel.
    """

    def __enter__(self):
        self._token = _HOST_MODE.set(True)
        return self

    def __exit__(self, *exc):
        _HOST_MODE.reset(self._token)
        return False


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().to("cpu").float().numpy()  # torch tensor


def _linear(sd: Mapping[str, Any], prefix: str, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """torch Linear stores (out, in); we store kernel as (in, out)."""
    p = {"kernel": _asarray(_np(sd[prefix + ".weight"]).T, dtype=dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = _asarray(_np(sd[prefix + ".bias"]), dtype=dtype)
    return p


def _linear_int8(sd: Mapping[str, Any], prefix: str,
                 dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Quantize-on-load: per-output-channel int8 computed in numpy BEFORE
    anything lands on device, so an 8B model (16 GB bf16) converts within a
    16 GB chip's HBM as 8 GB of int8 + scales."""
    w = _np(sd[prefix + ".weight"]).T
    s = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    p = {"kernel_q": _asarray(q),
         "scale": _asarray(s.astype(np.float32))}
    if prefix + ".bias" in sd:
        p["bias"] = _asarray(_np(sd[prefix + ".bias"]), dtype=dtype)
    return p


def _norm(sd: Mapping[str, Any], prefix: str, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    p = {"scale": _asarray(_np(sd[prefix + ".weight"]), dtype=dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = _asarray(_np(sd[prefix + ".bias"]), dtype=dtype)
    return p


def _embedding(sd: Mapping[str, Any], key: str, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    return {"embedding": _asarray(_np(sd[key]), dtype=dtype)}


# ---------------------------------------------------------------------------
# ESM2
# ---------------------------------------------------------------------------

def esm2_from_hf(sd: Mapping[str, Any], cfg: ESM2Config, dtype=jnp.float32):
    """Convert a HF `EsmModel` state dict (facebook/esm2_* ports)."""
    pre = "esm." if any(k.startswith("esm.") for k in sd) else ""
    params = {
        "embed_tokens": _embedding(sd, pre + "embeddings.word_embeddings.weight", dtype),
        "final_norm": _norm(sd, pre + "encoder.emb_layer_norm_after", dtype),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layer.{i}."
        params["layers"].append({
            "attn_norm": _norm(sd, lp + "attention.LayerNorm", dtype),
            "q_proj": _linear(sd, lp + "attention.self.query", dtype),
            "k_proj": _linear(sd, lp + "attention.self.key", dtype),
            "v_proj": _linear(sd, lp + "attention.self.value", dtype),
            "o_proj": _linear(sd, lp + "attention.output.dense", dtype),
            "ffn_norm": _norm(sd, lp + "LayerNorm", dtype),
            "fc1": _linear(sd, lp + "intermediate.dense", dtype),
            "fc2": _linear(sd, lp + "output.dense", dtype),
        })
    return params


def esm2_from_fair_esm(sd: Mapping[str, Any], cfg: ESM2Config, dtype=jnp.float32):
    """Convert a fair-esm ESM2 state dict (keys like `layers.0.self_attn.q_proj`).

    This is the dialect stored inside the CSTP Lightning checkpoint under
    `protein_model.model.*` (cstp_v3/modelling.py:25-30); strip that prefix
    with `filter_prefix` before calling.
    """
    params = {
        "embed_tokens": _embedding(sd, "embed_tokens.weight", dtype),
        "final_norm": _norm(sd, "emb_layer_norm_after", dtype),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        params["layers"].append({
            "attn_norm": _norm(sd, lp + "self_attn_layer_norm", dtype),
            "q_proj": _linear(sd, lp + "self_attn.q_proj", dtype),
            "k_proj": _linear(sd, lp + "self_attn.k_proj", dtype),
            "v_proj": _linear(sd, lp + "self_attn.v_proj", dtype),
            "o_proj": _linear(sd, lp + "self_attn.out_proj", dtype),
            "ffn_norm": _norm(sd, lp + "final_layer_norm", dtype),
            "fc1": _linear(sd, lp + "fc1", dtype),
            "fc2": _linear(sd, lp + "fc2", dtype),
        })
    return params


def filter_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Sub-dict of keys under `prefix`, prefix stripped (opus_arch.py:85-89)."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Decoder LLMs (HF Llama / OPT / Qwen2 state dicts)
# ---------------------------------------------------------------------------

def decoder_from_hf(sd: Mapping[str, Any], cfg: DecoderConfig, dtype=None,
                    *, quantize_int8: bool = False):
    dtype = dtype or cfg.jnp_dtype
    if has_bnb_4bit(sd):   # 4-bit-saved checkpoint: dequantize-on-load
        sd = dequantize_bnb_state_dict(sd)
    lin = _linear_int8 if quantize_int8 else _linear
    if cfg.family in ("llama", "qwen2"):
        return _llama_like_from_hf(sd, cfg, dtype, lin)
    if cfg.family == "opt":
        return _opt_from_hf(sd, cfg, dtype, lin)
    raise ValueError(cfg.family)


def _llama_like_from_hf(sd, cfg: DecoderConfig, dtype, lin=_linear):
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    params = {
        "embed_tokens": _embedding(sd, pre + "embed_tokens.weight", dtype),
        "final_norm": {"scale": _asarray(_np(sd[pre + "norm.weight"]), dtype=dtype)},
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(sd, "lm_head", dtype)
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}."
        params["layers"].append({
            "attn_norm": {"scale": _asarray(_np(sd[lp + "input_layernorm.weight"]), dtype=dtype)},
            "q_proj": lin(sd, lp + "self_attn.q_proj", dtype),
            "k_proj": lin(sd, lp + "self_attn.k_proj", dtype),
            "v_proj": lin(sd, lp + "self_attn.v_proj", dtype),
            "o_proj": lin(sd, lp + "self_attn.o_proj", dtype),
            "ffn_norm": {"scale": _asarray(_np(sd[lp + "post_attention_layernorm.weight"]), dtype=dtype)},
            "gate_proj": lin(sd, lp + "mlp.gate_proj", dtype),
            "up_proj": lin(sd, lp + "mlp.up_proj", dtype),
            "down_proj": lin(sd, lp + "mlp.down_proj", dtype),
        })
    return params


def _opt_from_hf(sd, cfg: DecoderConfig, dtype, lin=_linear):
    pre = ""
    for c in ("model.decoder.", "decoder."):
        if any(k.startswith(c) for k in sd):
            pre = c
            break
    params = {
        "embed_tokens": _embedding(sd, pre + "embed_tokens.weight", dtype),
        "embed_positions": _embedding(sd, pre + "embed_positions.weight", dtype),
        "final_norm": _norm(sd, pre + "final_layer_norm", dtype),
        "layers": [],
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = lin(sd, "lm_head", dtype)
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}."
        params["layers"].append({
            "attn_norm": _norm(sd, lp + "self_attn_layer_norm", dtype),
            "q_proj": lin(sd, lp + "self_attn.q_proj", dtype),
            "k_proj": lin(sd, lp + "self_attn.k_proj", dtype),
            "v_proj": lin(sd, lp + "self_attn.v_proj", dtype),
            "o_proj": lin(sd, lp + "self_attn.out_proj", dtype),
            "ffn_norm": _norm(sd, lp + "final_layer_norm", dtype),
            "fc1": lin(sd, lp + "fc1", dtype),
            "fc2": lin(sd, lp + "fc2", dtype),
        })
    return params


# ---------------------------------------------------------------------------
# BERT (BioBERT for BERTScore)
# ---------------------------------------------------------------------------

def bert_from_hf(sd: Mapping[str, Any], cfg: BertConfig, dtype=jnp.float32):
    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    params = {
        "word_embeddings": _embedding(sd, pre + "embeddings.word_embeddings.weight", dtype),
        "position_embeddings": _embedding(sd, pre + "embeddings.position_embeddings.weight", dtype),
        "token_type_embeddings": _embedding(sd, pre + "embeddings.token_type_embeddings.weight", dtype),
        "embed_norm": _norm(sd, pre + "embeddings.LayerNorm", dtype),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layer.{i}."
        params["layers"].append({
            "q_proj": _linear(sd, lp + "attention.self.query", dtype),
            "k_proj": _linear(sd, lp + "attention.self.key", dtype),
            "v_proj": _linear(sd, lp + "attention.self.value", dtype),
            "o_proj": _linear(sd, lp + "attention.output.dense", dtype),
            "attn_norm": _norm(sd, lp + "attention.output.LayerNorm", dtype),
            "fc1": _linear(sd, lp + "intermediate.dense", dtype),
            "fc2": _linear(sd, lp + "output.dense", dtype),
            "ffn_norm": _norm(sd, lp + "output.LayerNorm", dtype),
        })
    return params


# ---------------------------------------------------------------------------
# CSTP adapter + switch projector
# ---------------------------------------------------------------------------

def cstp_from_lightning(ckpt_or_sd: Any, cfg: CSTPConfig, dtype=jnp.float32):
    """Convert a CSTP Lightning checkpoint (or its state dict).

    Lightning stores the module under `state_dict`; active weights are the
    two projection linears (cstp_v3/modelling.py:370-371).
    """
    sd = ckpt_or_sd.get("state_dict", ckpt_or_sd) if isinstance(ckpt_or_sd, dict) else ckpt_or_sd
    return {
        "protein_projection": _linear(sd, "protein_projection.linear", dtype),
        "text_projection": _linear(sd, "text_projection.linear", dtype),
    }


def switch_projector_from_torch(sd: Mapping[str, Any], cfg: SwitchProjectorConfig,
                                dtype=jnp.float32):
    """Convert switch-projector weights saved as `switch_projector.{i}.weight`
    (nn.Sequential indices; see opus_arch.py:85-89 and
    scripts/extract_mm_projector.py). Also accepts already-stripped `{i}.weight`.
    """
    sd = {k.replace("switch_projector.", ""): v for k, v in sd.items()}
    layer_ids = sorted({int(k.split(".")[0]) for k in sd if k[0].isdigit()})
    layers = [_linear(sd, str(i), dtype) for i in layer_ids]
    if not layers:  # single nn.Linear saved without Sequential indices
        layers = [_linear(sd, "", dtype)] if "weight" in sd else []
        if not layers:
            raise ValueError("no switch projector weights found")
    return {"layers": layers}


# ---------------------------------------------------------------------------
# PEFT LoRA
# ---------------------------------------------------------------------------

# HF module name -> our param name (OPT uses out_proj; llama/qwen match)
_PEFT_PROJ_MAP = {"out_proj": "o_proj"}
_PEFT_PROJ_MAP_INV = {"o_proj": "out_proj"}


def lora_from_peft(sd: Mapping[str, Any], dtype=jnp.float32):
    """Convert a PEFT LoRA state dict into {layer_path: {A, B}} numpy trees.

    Handles both HF layouts: llama/qwen
    (`base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight`)
    and OPT/Galactica
    (`...model.decoder.layers.{i}.self_attn.out_proj.lora_A.weight`,
    `...layers.{i}.fc1.lora_A.weight`). Returns a dict keyed by
    (layer_index, our_proj_name).
    """
    out: Dict[Any, Dict[str, jnp.ndarray]] = {}
    for k, v in sd.items():
        if ".lora_A." not in k and ".lora_B." not in k:
            continue
        which = "A" if ".lora_A." in k else "B"
        parts = k.split(".")
        li = int(parts[parts.index("layers") + 1])
        # module name just before lora_{A,B}
        proj = parts[parts.index(f"lora_{which}") - 1]
        proj = _PEFT_PROJ_MAP.get(proj, proj)
        w = _np(v)
        # torch Linear (out,in) -> A: (in, r) kernel, B: (r, out) kernel
        out.setdefault((li, proj), {})[which] = _asarray(w.T, dtype=dtype)
    return out


def merge_lora_into_decoder(params, lora_tree, scaling: float):
    """Merge LoRA deltas into base weights: W += scaling * A @ B.

    Mirrors PEFT `merge_and_unload` (builder.py:107-109).
    """
    import jax

    params = jax.tree.map(lambda x: x, params)  # shallow copy
    for (li, proj), ab in lora_tree.items():
        base = params["layers"][li][proj]["kernel"]
        delta = (ab["A"] @ ab["B"]) * scaling
        params["layers"][li][proj]["kernel"] = (
            base.astype(jnp.float32) + delta.astype(jnp.float32)
        ).astype(base.dtype)
    return params


# ---------------------------------------------------------------------------
# Reverse converters: our trained trees -> reference checkpoint formats
# ---------------------------------------------------------------------------

def switch_projector_to_torch(params) -> Dict[str, np.ndarray]:
    """Switch-projector tree -> the reference's
    `switch_projector.{i}.weight/bias` layout (nn.Sequential indices with
    GELU at odd slots, opus_arch.py:85-89 / extract_mm_projector.py), so a
    projector trained here loads in the PyTorch stack."""
    sd: Dict[str, np.ndarray] = {}
    for i, lp in enumerate(params["layers"]):
        slot = 2 * i   # Linear, GELU, Linear, GELU, ...
        sd[f"switch_projector.{slot}.weight"] = np.asarray(
            lp["kernel"], np.float32).T
        if "bias" in lp:
            sd[f"switch_projector.{slot}.bias"] = np.asarray(
                lp["bias"], np.float32)
    return sd


def lora_to_peft(lora_tree, *, family: str = "llama") -> Dict[str, np.ndarray]:
    """LoRA tree -> PEFT state-dict keys in the target family's HF layout,
    torch (out, in) orientation.

    llama/qwen2: `base_model.model.model.layers.{i}.self_attn.{p}` /
                 `...mlp.{p}`
    opt:         `base_model.model.model.decoder.layers.{i}.self_attn.{p}`
                 (out_proj) / `...layers.{i}.fc{1,2}` (no mlp wrapper)
    """
    def path_of(i: int, proj: str) -> str:
        if family == "opt":
            name = _PEFT_PROJ_MAP_INV.get(proj, proj)
            stem = f"base_model.model.model.decoder.layers.{i}"
            if proj in ("fc1", "fc2"):
                return f"{stem}.{name}"
            return f"{stem}.self_attn.{name}"
        where = "self_attn" if proj in ("q_proj", "k_proj", "v_proj",
                                        "o_proj") else "mlp"
        return f"base_model.model.model.layers.{i}.{where}.{proj}"

    layers = lora_tree["layers"] if "layers" in lora_tree else None
    if layers is None:   # stacked layout
        stacked = lora_tree["layers_stacked"]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        layers = [jax.tree_util.tree_map(lambda x: x[i], stacked)
                  for i in range(n)]
    sd: Dict[str, np.ndarray] = {}
    for i, lp in enumerate(layers):
        for proj, ab in lp.items():
            base = path_of(i, proj)
            # ascontiguousarray, not a .T view: safetensors save_file
            # writes the raw buffer and silently corrupts non-contiguous
            # arrays (observed — layer-1 MLP adapters came back permuted)
            sd[f"{base}.lora_A.weight"] = np.ascontiguousarray(
                np.asarray(ab["A"], np.float32).T)
            sd[f"{base}.lora_B.weight"] = np.ascontiguousarray(
                np.asarray(ab["B"], np.float32).T)
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    import torch
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


# ---------------------------------------------------------------------------
# Checkpoint file loading (torch / safetensors), used by the CLI
# ---------------------------------------------------------------------------

def load_torch_file(path: str) -> Dict[str, Any]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def load_hf_dir(path: str) -> Dict[str, Any]:
    """Load all weights from a HF model dir (safetensors shards or .bin)."""
    sd: Dict[str, Any] = {}
    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sd.update(load_file(os.path.join(path, f)))
        return sd
    bin_files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    import torch
    for f in bin_files:
        sd.update(torch.load(os.path.join(path, f), map_location="cpu"))
    return sd


# ---------------------------------------------------------------------------
# NF4 (bitsandbytes) dequantize-on-load
# ---------------------------------------------------------------------------

# The 16 NF4 code values (normalized-float4 quantiles), as defined by
# bitsandbytes; reference loads LLMs 4-bit NF4 + double quant
# (builder.py:50-55). We dequantize at load time to bf16/int8.
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)


def dequantize_nf4(packed: np.ndarray, absmax: np.ndarray, blocksize: int,
                   shape, code: Optional[np.ndarray] = None) -> np.ndarray:
    """Dequantize bitsandbytes 4-bit data: packed uint8 (2 nibbles/elem),
    per-block absmax scales, 16-entry `code` table (NF4 by default).
    Returns fp32 of `shape`."""
    code = NF4_CODE if code is None else np.asarray(code, np.float32)
    packed = np.asarray(packed, np.uint8).reshape(-1)
    flat = np.empty(packed.size * 2, dtype=np.float32)
    hi = (packed >> 4) & 0xF
    lo = packed & 0xF
    flat[0::2] = code[hi]
    flat[1::2] = code[lo]
    n = int(np.prod(shape))
    flat = flat[:n]
    nblocks = (n + blocksize - 1) // blocksize
    scales = np.repeat(
        np.asarray(absmax, np.float32).reshape(-1)[:nblocks], blocksize)[:n]
    return (flat * scales).reshape(shape)


def dequantize_blockwise_8bit(q: np.ndarray, absmax: np.ndarray,
                              code: np.ndarray, blocksize: int) -> np.ndarray:
    """bitsandbytes blockwise 8-bit dequant: value = code[q] * absmax[block].
    This is the second ("nested") level of double quantization — the fp32
    per-block absmax of the 4-bit data is itself stored 8-bit."""
    q = np.asarray(q, np.uint8).reshape(-1)
    vals = np.asarray(code, np.float32)[q]
    scales = np.repeat(np.asarray(absmax, np.float32).reshape(-1),
                       blocksize)[:q.size]
    return vals * scales


def _bnb_meta(sd: Mapping[str, Any], wkey: str) -> Optional[dict]:
    """Parse `{wkey}.quant_state.bitsandbytes__{nf4,fp4}` json metadata
    (the bnb>=0.41 serialization transformers writes for 4-bit-saved models,
    reference loads with bnb_4bit_use_double_quant=True, builder.py:50-55)."""
    import json as _json

    for qt in ("nf4", "fp4"):
        k = f"{wkey}.quant_state.bitsandbytes__{qt}"
        if k in sd:
            raw = bytes(np.asarray(_np(sd[k]), np.uint8).tolist())
            meta = _json.loads(raw.decode("utf-8"))
            meta["quant_type"] = qt
            return meta
    return None


def dequantize_bnb_4bit(sd: Mapping[str, Any], wkey: str) -> np.ndarray:
    """Reconstruct the fp32 weight for `wkey` from a bitsandbytes 4-bit
    quant_state dir entry, including the double-quant (nested absmax) chain:

        absmax = nested_quant_map[absmax_q8] * repeat(nested_absmax)
                 + nested_offset                      (when double-quant)
        w      = quant_map[nibble] * repeat(absmax)

    Layout keys (per transformers' bnb serialization): `{w}` packed uint8,
    `{w}.absmax` (uint8 double-quant | fp32 single), `{w}.quant_map`,
    `{w}.nested_absmax`, `{w}.nested_quant_map`, and the json quant_state.
    """
    meta = _bnb_meta(sd, wkey)
    if meta is None:
        raise ValueError(f"no bitsandbytes quant_state for {wkey}")
    shape = meta["shape"]
    blocksize = int(meta.get("blocksize", 64))
    code = _np(sd[f"{wkey}.quant_map"]) if f"{wkey}.quant_map" in sd \
        else NF4_CODE
    absmax = _np(sd[f"{wkey}.absmax"])
    if f"{wkey}.nested_absmax" in sd:     # double quant
        absmax = dequantize_blockwise_8bit(
            absmax, _np(sd[f"{wkey}.nested_absmax"]),
            _np(sd[f"{wkey}.nested_quant_map"]),
            int(meta.get("nested_blocksize", 256)))
        absmax = absmax + np.float32(meta.get("nested_offset", 0.0))
    return dequantize_nf4(_np(sd[wkey]), absmax, blocksize, shape, code)


_BNB_AUX_SUFFIXES = (".absmax", ".quant_map", ".nested_absmax",
                     ".nested_quant_map", ".quant_state.bitsandbytes__nf4",
                     ".quant_state.bitsandbytes__fp4")


def has_bnb_4bit(sd: Mapping[str, Any]) -> bool:
    return any(".quant_state.bitsandbytes__" in k for k in sd)


def dequantize_bnb_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Replace every bitsandbytes-4bit weight in `sd` with its fp32
    reconstruction and drop the aux keys, so the normal converters apply."""
    out: Dict[str, Any] = {}
    quantized = {k[:-len(".quant_state.bitsandbytes__nf4")]
                 if k.endswith("nf4") else
                 k[:-len(".quant_state.bitsandbytes__fp4")]
                 for k in sd if ".quant_state.bitsandbytes__" in k}
    for k, v in sd.items():
        if any(k == q or (k.startswith(q) and
                          k[len(q):] in _BNB_AUX_SUFFIXES)
               for q in quantized):
            continue
        out[k] = v
    for q in quantized:
        out[q] = dequantize_bnb_4bit(sd, q)
    return out
