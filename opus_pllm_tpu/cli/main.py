"""opus-pllm-tpu command line: annotate / chat / mcq / train-* / precompute /
convert-weights / bench.

One typed entry point replaces the reference's per-runner argparse scripts
(eval/run_opus_ddp.py:149-163, run_opus_online.py, eval_run_multichoice.py,
eval_run_online.py, scripts/*.py and the Slurm wrappers eval.sh /
eval_total_ablation.sh).

    python -m opus_pllm_tpu.cli.main annotate --test-json ... --model-base ...
    python -m opus_pllm_tpu.cli.main chat --model-base ...
    python -m opus_pllm_tpu.cli.main mcq --test-json ...
    python -m opus_pllm_tpu.cli.main train-cstp --vec-pickle ...
    python -m opus_pllm_tpu.cli.main train-projector --train-json ...
    python -m opus_pllm_tpu.cli.main train-lora --train-json ...
    python -m opus_pllm_tpu.cli.main precompute-embeddings --json ...
    python -m opus_pllm_tpu.cli.main convert-weights --out ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

STANDARD_AA = set("ACDEFGHIKLMNPQRSTVWY")


def _model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model-base", default=None,
                   help="HF dir of the base LLM (family by path substring)")
    p.add_argument("--weights", default=None,
                   help="opus-pllm weights dir (modality_encoder/, "
                        "modality_refinement_projector/, lora_adapter/)")
    p.add_argument("--esm", default=None, help="fair-esm .pt or HF-ESM dir")
    p.add_argument("--no-cstp", action="store_true",
                   help="raw-ESM pipeline (switch projector over 1280-d)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer dir (default: --model-base)")
    p.add_argument("--switch-projector-type", default="mlp2x_gelu",
                   help="'linear' or 'mlp<N>x_gelu' (≙ the reference's "
                        "--switch_projector_type, run_opus_ddp.py:160; "
                        "must match the modality_refinement_projector "
                        "checkpoint's layer count)")
    p.add_argument("--load-int8", action="store_true",
                   help="int8 weight-only LLM (≙ reference --load-8bit)")
    p.add_argument("--load-int4", action="store_true",
                   help="int4 grouped weight-only LLM (≙ reference "
                        "--load-4bit/NF4): half the weight bytes of int8 "
                        "— 963/2195 tok/s vs 666/1765 at 8B b8/b32 "
                        "(BENCH_NOTES.md round 3)")
    p.add_argument("--quantize-cache", nargs="?", const="int8",
                   default=False, choices=["int8", "int4"],
                   help="quantized KV cache during generation: bare flag "
                        "or 'int8' = half the cache bytes; 'int4' = "
                        "packed 4-bit (quarter), for large batch / long "
                        "contexts")
    p.add_argument("--unroll-layers", action="store_true",
                   help="per-layer (unrolled) decode instead of the "
                        "stacked lax.scan: 12-19%% faster decode at "
                        "8B-class models, at the cost of ~30x longer "
                        "first compile (BENCH_NOTES.md round 2)")
    p.add_argument("--mesh", default=None, metavar="DATA[,MODEL]",
                   help="SPMD device mesh, e.g. '4,2': params shard "
                        "TP+FSDP over it and batches shard over the data "
                        "axis (≙ the reference's 4-GPU accelerate launch, "
                        "eval.sh:20-26)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize "
                        "before any device use (reads "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID unless set by the TPU runtime)")


def _gen_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--top-p", type=float, default=0.7)
    p.add_argument("--max-new-tokens", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-beams", type=int, default=1,
                   help="beam search width (run_opus_ddp.py:156-158); >1 "
                        "disables sampling")
    p.add_argument("--length-penalty", type=float, default=1.0)
    p.add_argument("--seq-shards", type=int, default=0,
                   help="shard each prompt's KV cache over a ('seq',) mesh "
                        "of this many devices (ring prefill + LSE-merged "
                        "decode, infer/sp_engine.py) — for contexts whose "
                        "cache exceeds one chip; exclusive with --mesh")
    p.add_argument("--draft-layers", type=int, default=0,
                   help="self-speculative decoding: draft with the "
                        "target's own first N layers, verify --n-draft "
                        "proposals per target pass. Greedy decodes are "
                        "token-identical to plain decoding; sampled ones "
                        "(do_sample: T>0) are distribution-identical via "
                        "rejection-verified speculative sampling — both "
                        "on the static path and under --engine / serve")
    p.add_argument("--n-draft", type=int, default=4,
                   help="speculative proposals per verify pass "
                        "(--draft-layers only)")


def _seq_mesh(args):
    n = getattr(args, "seq_shards", 0)
    if not n:
        return None
    if getattr(args, "mesh", None):
        raise SystemExit("--seq-shards and --mesh are mutually exclusive")
    from ..parallel.ring import make_sp_mesh
    return make_sp_mesh(n)


def _adapter_specs(args) -> dict:
    """--adapter NAME=PATH (repeatable) -> {name: path}, validated BEFORE
    the model load: format, duplicate names (the last one silently winning
    would evaluate the wrong weights), and that each path exists."""
    import os
    specs: dict = {}
    for spec in getattr(args, "adapter", None) or ():
        name, _, path = spec.partition("=")
        if not name or not path:
            raise SystemExit(f"--adapter expects name=path, got {spec!r}")
        if name in specs:
            raise SystemExit(f"duplicate --adapter name {name!r} "
                             f"({specs[name]} and {path})")
        if not os.path.isdir(path):
            raise SystemExit(f"--adapter {name}: no such directory {path}")
        specs[name] = path
    return specs


def _adapter_bank(specs: dict, cfg) -> dict:
    """{name: path} -> {name: folded unmerged tree}.

    Each entry loads an UNMERGED PEFT adapter; per-adapter alpha/rank
    scaling folds into B (lora.fold_scaling) so one bank serves mixed
    recipes under the engine's single lora_scale=1.0. Serve requests pick
    one via {"adapter": name}; annotate-all maps test sets to adapters by
    name (the ablation protocol's per-task adapters,
    eval_total_ablation.sh — which reloads the whole model per adapter)."""
    from ..core import builder
    from ..lora.lora import fold_scaling
    bank = {}
    for name, path in specs.items():
        tree, scale = builder.load_peft_adapter(path, cfg.llm.num_layers)
        bank[name] = fold_scaling(tree, scale)
    return bank


def _adapter_for(names, test_json: str) -> Optional[str]:
    """The bank adapter a test set runs under: the unique NAME that is a
    substring of the set's basename (nucleus/…/test_localization.json
    matches adapter 'localization'). No match -> base weights; two
    matches -> ambiguous, refuse (longest-name tiebreak would silently
    mask typos like go/go_bp); --map resolves it explicitly."""
    import os
    base = os.path.basename(test_json)
    hits = [n for n in names if n in base]
    if len(hits) > 1:
        raise SystemExit(f"test set {base!r} matches multiple adapters "
                         f"{sorted(hits)}; pick one with "
                         f"--map {base}=NAME")
    return hits[0] if hits else None


def _adapter_map(names, test_jsons, map_flags) -> dict:
    """The FULL set->adapter mapping, computed and printed up front (before
    the model load) so an ambiguity or a surprising match fails/surfaces
    before hours of eval, not mid-loop after earlier sets already ran.

    --map BASENAME=NAME (repeatable) overrides the substring match for one
    set; NAME "" (i.e. --map file.json=) forces base weights."""
    import os
    overrides = {}
    for spec in map_flags or ():
        base, _, name = spec.partition("=")
        if not base:
            raise SystemExit(f"--map expects basename=adapter, got {spec!r}")
        if name and name not in names:
            raise SystemExit(f"--map {spec!r}: {name!r} is not a bank "
                             f"adapter ({sorted(names)})")
        overrides[base] = name or None
    bases = [os.path.basename(t) for t in test_jsons]
    unknown = set(overrides) - set(bases)
    if unknown:
        raise SystemExit(f"--map names test sets not in --test-jsons: "
                         f"{sorted(unknown)}")
    mapping = {}
    for tj, base in zip(test_jsons, bases):
        mapping[tj] = (overrides[base] if base in overrides
                       else _adapter_for(names, tj))
        print(f"{base}: adapter {mapping[tj] or '<base weights>'}")
    return mapping


def _engine_mesh(mesh, seq_mesh):
    """--engine composes with TP-only meshes (--mesh 1,N): params/cache
    shard over "model" inside the engine's compiled steps. A data axis >1
    or --seq-shards has no engine meaning (slots ARE the batch) — refuse
    rather than silently underuse devices."""
    if seq_mesh is not None:
        raise SystemExit("--engine and --seq-shards are mutually exclusive")
    if mesh is None:
        return None
    from ..core.mesh import DATA_AXIS
    if mesh.shape.get(DATA_AXIS, 1) != 1:
        raise SystemExit("--engine shards tensor-parallel only: use "
                         "--mesh 1,N (the slot pool is the batch axis)")
    return mesh


def _resume_setup(args, state, restore_fn, data):
    """Shared resume/periodic-save wiring for the train commands: build the
    resume_state CheckpointManager (a SEPARATE subdir so the final
    trainable-only save stays the load surface for convert/eval), restore
    the latest full state with --resume, and skip/bound the batch stream so
    a killed run resumes exactly. Returns (state, data, rs_mgr, save_every).
    """
    import itertools

    from ..core.checkpoint import CheckpointManager

    save_every = getattr(args, "save_every", 0)
    rs_mgr = None
    if save_every or getattr(args, "resume", False):
        import os as _os
        rs_mgr = CheckpointManager(_os.path.join(args.out, "resume_state"),
                                   max_to_keep=2)
    skip = 0
    if getattr(args, "resume", False) and rs_mgr.latest_step() is not None:
        state = restore_fn(rs_mgr, state)
        skip = int(state.step)
        print(f"resuming from step {skip}")
    if skip:
        data = itertools.islice(data, skip, None)
    if getattr(args, "max_steps", 0):
        data = itertools.islice(data, max(args.max_steps - skip, 0))
    return state, data, rs_mgr, save_every


def _build(args):
    from ..core import builder
    from ..core.config import OpusConfig, SwitchProjectorConfig

    # multi-host bootstrap must precede any other JAX device use
    if getattr(args, "distributed", False):
        from ..core.mesh import initialize_distributed
        initialize_distributed()

    llm_cfg = (builder.decoder_config_for(args.model_base)
               if args.model_base else None)
    if llm_cfg is None:
        raise SystemExit("--model-base is required for model commands")
    # dims inferred from the checkpoint artifacts themselves (ESM config,
    # CSTP Lightning hyper_parameters) — the published sizes are only the
    # fallback, so the same CLI drives any scale
    esm_cfg = builder.esm_config_for(args.esm)
    cstp = None if args.no_cstp else builder.cstp_config_for(args.weights)
    switch_in = esm_cfg.embed_dim if args.no_cstp else cstp.proj_dim
    cfg = OpusConfig(
        esm=esm_cfg, cstp=cstp,
        switch=SwitchProjectorConfig(
            input_dim=switch_in, llm_hidden_size=llm_cfg.hidden_size,
            projector_type=getattr(args, "switch_projector_type",
                                   "mlp2x_gelu")),
        llm=llm_cfg)
    # host_arrays: convert + quantize + stack in host RAM, then transfer the
    # stacked tree once — per-layer device staging + on-device stacking
    # fragments HBM and OOMs 8B-class loads (BENCH_NOTES.md round 2)
    import jax

    from ..core import convert as _conv
    from ..models import decoder as _dec, esm2 as _esm
    with _conv.host_arrays():
        params, _ = builder.load_pretrained(
            args.model_base, args.weights, cfg, esm_path=args.esm,
            quantize="int4" if getattr(args, "load_int4", False)
            else "int8" if getattr(args, "load_int8", False) else None,
            # training dequantizes through XLA every fwd/bwd, where the
            # v1 byte layout wins (2500 vs 2021 tok/s 8B LoRA B=8);
            # decode/serving gets the v2 magic-bitcast kernel (1.2x)
            int4_layout=("v1" if getattr(args, "cmd", "").startswith(
                "train") else "auto"))
    # layout guard: the int4 v2 magic-bitcast pack is the DECODE layout;
    # training dequantizes through XLA every fwd/bwd where v1 nibble
    # bytes are the measured fast path (quant4.py) — reject the mismatch
    # loudly instead of silently training slow on an inferred layout
    # (round-4 verdict weak #6)
    builder.check_train_layout(getattr(args, "cmd", ""), params["llm"])
    # stacked layers -> lax.scan: one-layer compiles for the 32/33-deep
    # stacks; --unroll-layers trades compile time for 12-19% decode
    # throughput at 8B scale (BENCH_NOTES.md round 2)
    if not getattr(args, "unroll_layers", False):
        params["llm"] = _dec.stack_params(params["llm"], donate=True)
        params["esm"] = _esm.stack_params(params["esm"], donate=True)
    mesh = None
    if getattr(args, "mesh", None):
        from ..core.mesh import make_mesh, parse_mesh_flag
        from ..parallel import partition
        mesh = make_mesh(parse_mesh_flag(args.mesh))
        # sharded host->device transfer: each device receives only its
        # 1/(data*model) shard of every leaf (big loads never materialize
        # replicated on one chip)
        params = partition.shard_params(mesh, params)
    else:
        params = jax.device_put(params)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    from ..infer.hf_tokenizer import HFTokenizer
    tok = HFTokenizer(args.tokenizer or args.model_base,
                      family=llm_cfg.family)
    return cfg, params, tok, mesh


def _bert_embed_fn(biobert_dir: Optional[str]):
    """BERTScore embedder from a local BioBERT HF dir (weights + vocab.txt);
    None disables BERTScore (the other function metrics still compute)."""
    if not biobert_dir:
        return None
    import os

    import jax

    from ..core import convert
    from ..core.config import BertConfig
    from ..evals.textproc import WordPieceTokenizer
    from ..models import bert

    cfg = BertConfig()
    params = convert.bert_from_hf(convert.load_hf_dir(biobert_dir), cfg)
    vocab = WordPieceTokenizer.load_vocab(os.path.join(biobert_dir, "vocab.txt"))
    tok = WordPieceTokenizer(vocab, lowercase=False)  # biobert is cased
    return bert.make_embed_fn(params, cfg, tok, max_tokens=500)


def cmd_annotate(args) -> None:
    from ..core.config import GenerationConfig
    from ..evals import runner

    # validate the --seq-shards/--mesh conflict and the adapter flags
    # BEFORE the (potentially multi-GB, minutes-long) model load
    seq_mesh = _seq_mesh(args)
    use_engine = getattr(args, "engine", False)
    specs = _adapter_specs(args)
    if (specs or getattr(args, "use_adapter", None)) and not use_engine:
        raise SystemExit("--adapter/--use-adapter need --engine (the "
                         "static path merges adapters via --weights "
                         "instead)")
    aid = None
    if specs:
        aid = getattr(args, "use_adapter", None)
        if aid is not None and aid not in specs:
            raise SystemExit(f"--use-adapter {aid!r} is not in the bank "
                             f"({sorted(specs)})")
        if aid is None:
            aid = _adapter_for(specs, args.test_json)
        print(f"{os.path.basename(args.test_json)}: adapter "
              f"{aid or '<base weights>'}")
    elif getattr(args, "use_adapter", None):
        raise SystemExit("--use-adapter needs --adapter NAME=PATH entries")
    cfg, params, tok, mesh = _build(args)
    from ..evals.datasets import max_new_tokens_for
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens or max_new_tokens_for(args.test_json),
        temperature=args.temperature, top_p=args.top_p,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        seed=args.seed, quantize_cache=getattr(args, "quantize_cache", False),
        num_beams=getattr(args, "num_beams", 1),
        length_penalty=getattr(args, "length_penalty", 1.0),
        draft_layers=getattr(args, "draft_layers", 0),
        n_draft=getattr(args, "n_draft", 4))
    bank = _adapter_bank(specs, cfg)
    if use_engine:
        rep = runner.run_annotation_eval_engine(
            params, cfg, tok, args.test_json, gen=gen,
            max_slots=args.max_slots, steps_per_tick=args.steps_per_tick,
            splice_batch=args.batch_size, save_path=args.save_path,
            lora_bank=bank or None, adapter_id=aid,
            mesh=_engine_mesh(mesh, seq_mesh),
            cache_prefix=getattr(args, "cache_prefix", False),
            bert_embed_fn=_bert_embed_fn(getattr(args, "biobert", None)))
    else:
        rep = runner.run_annotation_eval(
            params, cfg, tok, args.test_json, gen=gen,
            batch_size=args.batch_size, save_path=args.save_path,
            bert_embed_fn=_bert_embed_fn(getattr(args, "biobert", None)),
            mesh=mesh, seq_mesh=seq_mesh)
    print(json.dumps(rep.metrics))


def cmd_annotate_all(args) -> None:
    """Loop test sets x repeats (≙ eval_total_ablation.sh:27-73, which runs
    each set 5x to average sampling noise)."""
    import os

    from ..core.config import GenerationConfig
    from ..evals import runner
    from ..evals.datasets import max_new_tokens_for

    seq_mesh = _seq_mesh(args)   # validate the flag conflicts pre-load
    use_engine = getattr(args, "engine", False)
    specs = _adapter_specs(args)
    if (specs or getattr(args, "map", None)) and not use_engine:
        raise SystemExit("--adapter/--map need --engine")
    # the ablation protocol: each set's per-task adapter, from the bank
    # loaded ONCE (the reference reloads the 8B model per task). The FULL
    # mapping is computed, printed, and ambiguity-checked HERE — before
    # the model load and the hours-long loop, not mid-run per set.
    adapter_map = (_adapter_map(specs, args.test_jsons,
                                getattr(args, "map", None))
                   if specs else {})
    cfg, params, tok, mesh = _build(args)
    bank = _adapter_bank(specs, cfg)
    e_mesh = _engine_mesh(mesh, seq_mesh) if use_engine else None
    engine_cache: dict = {}
    all_metrics = {}
    for test_json in args.test_jsons:
        aid = adapter_map.get(test_json)
        runs = []
        for rep in range(args.repeats):
            gen = GenerationConfig(
                max_new_tokens=args.max_new_tokens or max_new_tokens_for(test_json),
                temperature=args.temperature, top_p=args.top_p,
                eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
                seed=args.seed + rep,
                quantize_cache=getattr(args, "quantize_cache", False),
        num_beams=getattr(args, "num_beams", 1),
        length_penalty=getattr(args, "length_penalty", 1.0),
        draft_layers=getattr(args, "draft_layers", 0),
        n_draft=getattr(args, "n_draft", 4))
            save = None
            if args.save_dir:
                os.makedirs(args.save_dir, exist_ok=True)
                base = os.path.splitext(os.path.basename(test_json))[0]
                save = os.path.join(args.save_dir, f"{base}_rep{rep}.json")
            if use_engine:
                rep_out = runner.run_annotation_eval_engine(
                    params, cfg, tok, test_json, gen=gen,
                    max_slots=args.max_slots,
                    steps_per_tick=args.steps_per_tick,
                    splice_batch=args.batch_size, save_path=save,
                    lora_bank=bank or None, adapter_id=aid,
                    mesh=e_mesh, engine_cache=engine_cache,
                    cache_prefix=getattr(args, "cache_prefix", False))
            else:
                rep_out = runner.run_annotation_eval(
                    params, cfg, tok, test_json, gen=gen,
                    batch_size=args.batch_size, save_path=save, mesh=mesh,
                    seq_mesh=seq_mesh)
            runs.append(rep_out.metrics)
        all_metrics[test_json] = runs
    print(json.dumps(all_metrics, indent=1))


def cmd_mcq(args) -> None:
    from ..core.config import GenerationConfig
    from ..evals import runner

    seq_mesh = _seq_mesh(args)   # validate the flag conflicts pre-load
    use_engine = getattr(args, "engine", False)
    specs = _adapter_specs(args)
    if (specs or getattr(args, "use_adapter", None)) and not use_engine:
        raise SystemExit("--adapter/--use-adapter need --engine")
    aid = None
    if specs:
        aid = getattr(args, "use_adapter", None)
        if aid is not None and aid not in specs:
            raise SystemExit(f"--use-adapter {aid!r} is not in the bank "
                             f"({sorted(specs)})")
        if aid is None:   # same basename auto-match as cmd_annotate —
            # a loaded bank must never silently evaluate base weights
            aid = _adapter_for(specs, args.test_json)
        print(f"{os.path.basename(args.test_json)}: adapter "
              f"{aid or '<base weights>'}")
    elif getattr(args, "use_adapter", None):
        raise SystemExit("--use-adapter needs --adapter NAME=PATH entries")
    cfg, params, tok, mesh = _build(args)
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens or 50,
        temperature=args.temperature, top_p=args.top_p,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        seed=args.seed, quantize_cache=getattr(args, "quantize_cache", False),
        num_beams=getattr(args, "num_beams", 1),
        length_penalty=getattr(args, "length_penalty", 1.0),
        draft_layers=getattr(args, "draft_layers", 0),
        n_draft=getattr(args, "n_draft", 4))
    if getattr(args, "scored", False):
        if use_engine:
            raise SystemExit("--scored is a single-forward evaluator; "
                             "drop --engine")
        if seq_mesh is not None or getattr(args, "mesh", None) \
                or getattr(args, "draft_layers", 0):
            raise SystemExit("--scored runs single-device (one prefill "
                             "forward): drop --mesh/--seq-shards/"
                             "--draft-layers")
        rep = runner.run_mcq_eval_scored(
            params, cfg, tok, args.test_json,
            batch_size=args.batch_size, save_path=args.save_path)
    elif use_engine:
        bank = _adapter_bank(specs, cfg)
        rep = runner.run_mcq_eval_engine(
            params, cfg, tok, args.test_json, gen=gen,
            max_slots=args.max_slots, steps_per_tick=args.steps_per_tick,
            splice_batch=args.batch_size, save_path=args.save_path,
            lora_bank=bank or None, adapter_id=aid,
            mesh=_engine_mesh(mesh, seq_mesh),
            cache_prefix=getattr(args, "cache_prefix", False))
    else:
        rep = runner.run_mcq_eval(params, cfg, tok, args.test_json, gen=gen,
                                  batch_size=args.batch_size,
                                  save_path=args.save_path, mesh=mesh,
                                  seq_mesh=seq_mesh)
    print(json.dumps(rep.metrics))


def cmd_chat(args) -> None:
    """Interactive REPL: professor-style annotation (≙ run_opus_online.py)
    or, with --chat-template, the chat-template flow (≙ eval_run_online.py)."""
    from ..core.config import GenerationConfig
    from ..evals import runner as runner_mod

    seq_mesh = _seq_mesh(args)   # validate the flag conflict pre-load
    cfg, params, tok, mesh = _build(args)
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens or 256,
        temperature=args.temperature, top_p=args.top_p,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        quantize_cache=getattr(args, "quantize_cache", False),
        num_beams=getattr(args, "num_beams", 1),
        length_penalty=getattr(args, "length_penalty", 1.0),
        draft_layers=getattr(args, "draft_layers", 0),
        n_draft=getattr(args, "n_draft", 4))
    draft = runner_mod.make_draft(params, cfg, gen)   # once, not per turn
    print("opus-pllm-tpu chat — empty line to exit")
    turn = 0   # folds into the PRNG so repeated prompts resample at T>0
    while True:
        try:
            instr = input("instruction> ").strip()
        except EOFError:
            break
        if not instr:
            break
        seq = input("sequence> ").strip().upper()
        bad = set(seq) - STANDARD_AA
        if bad:
            print(f"invalid amino acids: {''.join(sorted(bad))} "
                  f"(allowed: {''.join(sorted(STANDARD_AA))})")
            continue
        from ..infer.conversation import VICUNA_V0, VICUNA_V3, annotation_prompt
        if getattr(args, "chat_template", False):
            prompt = tok.apply_chat_template(
                [{"role": "system", "content": VICUNA_V3.system},
                 {"role": "user", "content": "<seq>\n" + instr}],
                add_generation_prompt=True)
        else:
            prompt = annotation_prompt("<seq>\n" + instr, VICUNA_V0)
        texts = runner_mod._generate_batch(
            params, cfg, tok, [prompt], [seq], gen,
            prompt_bucket=64, esm_bucket=128, impl="auto", batch_index=turn,
            mesh=mesh, seq_mesh=seq_mesh, draft=draft)
        turn += 1
        print(texts[0])


def cmd_train_cstp(args) -> None:
    import jax
    import numpy as np

    if getattr(args, "distributed", False):
        from ..core.mesh import initialize_distributed
        initialize_distributed()

    from ..core.checkpoint import CheckpointManager
    from ..core.config import CSTPConfig, TrainConfig
    from ..data.datasets import UniProtQAVecDataset, batch_iterator
    from ..train import cstp_trainer

    cfg = CSTPConfig()
    tcfg = TrainConfig(learning_rate=args.lr, weight_decay=args.wd,
                       batch_size=args.batch_size, num_epochs=args.epochs)
    ds = UniProtQAVecDataset(args.vec_pickle)
    se, te = ds.arrays()
    state, tx = cstp_trainer.create_state(jax.random.PRNGKey(args.seed), cfg,
                                          tcfg)
    mesh = None
    if getattr(args, "mesh", None):
        from ..core.mesh import make_mesh, parse_mesh_flag
        mesh = make_mesh(parse_mesh_flag(args.mesh))
    mgr = CheckpointManager(args.out, max_to_keep=2)

    def batches():
        for idx in batch_iterator(len(se), tcfg.batch_size, seed=args.seed,
                                  epochs=tcfg.num_epochs):
            yield se[idx], te[idx]

    state, data, rs_mgr, save_every = _resume_setup(
        args, state, cstp_trainer.restore_state, batches())
    state = cstp_trainer.fit(state, tx, cfg, tcfg, data, mesh=mesh,
                             ckpt=rs_mgr, save_every=save_every)
    mgr.save(int(state.step), state.params)
    print(f"saved CSTP adapter at step {int(state.step)} -> {args.out}")


def _train_multimodal(args, *, lora: bool) -> None:
    import jax

    from ..core.checkpoint import CheckpointManager
    from ..core.config import LoRAConfig, TrainConfig
    from ..data.collate import instruction_batches
    from ..data.datasets import InstructionDataset
    from ..train import multimodal_trainer as mmt

    seq_shards = getattr(args, "seq_shards", 0)
    pipe_stages = getattr(args, "pipe_stages", 0)
    if sum(bool(x) for x in (seq_shards, pipe_stages,
                             getattr(args, "mesh", None))) > 1:
        raise SystemExit("--seq-shards, --pipe-stages and --mesh are "
                         "mutually exclusive (sequence vs pipeline vs "
                         "data/model parallelism)")
    if getattr(args, "val_json", None) and (seq_shards or pipe_stages):
        raise SystemExit("--val-json runs on the standard (mesh/single-"
                         "device) path only; drop --seq-shards/"
                         "--pipe-stages")
    cfg, params, tok, mesh = _build(args)
    tcfg = TrainConfig(learning_rate=args.lr, weight_decay=args.wd,
                       batch_size=args.batch_size, num_epochs=args.epochs,
                       ce_chunk=args.ce_chunk,
                       scan_mode=getattr(args, "scan_mode", "xs"),
                       grad_accum=getattr(args, "grad_accum", 1),
                       remat=getattr(args, "remat", "full"))
    lcfg = LoRAConfig(rank=args.lora_rank) if lora else None
    ds = InstructionDataset(args.train_json)
    state, tx = mmt.create_state(jax.random.PRNGKey(args.seed), cfg, tcfg,
                                 params, train_switch=not lora or args.train_switch,
                                 lora_cfg=lcfg)
    batches = instruction_batches(ds, tok, tcfg.batch_size, seed=args.seed,
                                  epochs=tcfg.num_epochs,
                                  max_len=args.max_len)
    state, batches, rs_mgr, save_every = _resume_setup(
        args, state, mmt.restore_state, batches)
    if mesh is not None:
        state = mmt.shard_state(mesh, state)
    mgr = CheckpointManager(args.out, max_to_keep=2)
    if seq_shards:
        from ..parallel.ring import make_sp_mesh
        from ..train import sp as sp_mod
        state = sp_mod.fit(state, tx, cfg, tcfg, params, batches,
                           make_sp_mesh(seq_shards), lora_cfg=lcfg,
                           ckpt=rs_mgr, save_every=save_every)
    elif pipe_stages:
        from ..parallel.pipeline import make_pp_mesh
        from ..train import pp as pp_mod
        pp_mesh = make_pp_mesh(pipe_stages,
                               data=getattr(args, "pipe_data", 1))
        state = pp_mod.fit(state, tx, cfg, tcfg, params, batches, pp_mesh,
                           lora_cfg=lcfg,
                           n_micro=getattr(args, "micro_batches", 0) or None,
                           ckpt=rs_mgr, save_every=save_every)
    else:
        val_fn = None
        if getattr(args, "val_json", None):
            vds = InstructionDataset(args.val_json)
            # no shuffle/drop: validation must be deterministic and
            # cover every held-out example (the tail yields a smaller
            # final batch rather than silently vanishing)
            val_fn = lambda: instruction_batches(  # noqa: E731
                vds, tok, min(tcfg.batch_size, len(vds)), shuffle=False,
                seed=0, epochs=1, drop_remainder=False,
                max_len=args.max_len)
        state = mmt.fit(state, tx, cfg, tcfg, params, batches,
                        lora_cfg=lcfg, mesh=mesh,
                        ckpt=rs_mgr, save_every=save_every,
                        val_batches_fn=val_fn,
                        val_every=getattr(args, "val_every", 0))
    mgr.save(int(state.step), state.trainable)
    print(f"saved trainable tree at step {int(state.step)} -> {args.out}")
    if args.export_reference_format:
        import os as _os

        from ..core import convert as cv
        if "switch" in state.trainable:
            d = _os.path.join(args.out, "modality_refinement_projector")
            _os.makedirs(d, exist_ok=True)
            cv.save_torch_state_dict(
                cv.switch_projector_to_torch(state.trainable["switch"]),
                _os.path.join(d, "modality_refinement_projection.bin"))
            print(f"exported switch projector (reference format) -> {d}")
        if "lora" in state.trainable:
            d = _os.path.join(args.out, "lora_adapter")
            _os.makedirs(d, exist_ok=True)
            cv.save_torch_state_dict(
                cv.lora_to_peft(state.trainable["lora"], family=cfg.llm.family),
                _os.path.join(d, "adapter_model.bin"))
            import json as _json
            # target_modules in HF names; without it PEFT falls back to the
            # model default (q/v only) and silently drops the other adapters
            from ..lora.lora import _proj_dims
            hf_name = {"o_proj": "out_proj"} if cfg.llm.family == "opt" else {}
            targets = [hf_name.get(t, t) for t in lcfg.target_modules
                       if t in _proj_dims(cfg.llm)] if lcfg else []
            with open(_os.path.join(d, "adapter_config.json"), "w") as f:
                _json.dump({"r": lcfg.rank if lcfg else 16,
                            "lora_alpha": lcfg.alpha if lcfg else 32,
                            "peft_type": "LORA",
                            "task_type": "CAUSAL_LM",
                            "lora_dropout": 0.0,
                            "bias": "none",
                            "target_modules": targets}, f)
            print(f"exported LoRA adapter (PEFT format) -> {d}")


def cmd_precompute(args) -> None:
    import jax

    from ..core import builder
    from ..data import precompute

    cfg = builder.esm_config_for(args.esm)
    params = builder.load_esm(args.esm, cfg)
    if args.mode == "jsonl":
        n = precompute.precompute_instruction_embeddings(
            params, cfg, args.json, args.out, batch_size=args.batch_size)
    else:
        n = precompute.precompute_sequence_map(
            params, cfg, args.json, args.out, batch_size=args.batch_size)
    print(f"wrote {n} entries -> {args.out}")


def cmd_precompute_pairs(args) -> None:
    """UniProtQA pickle -> stage-(a) (seq, text) embedding pairs."""
    from ..core import builder
    from ..data import precompute
    from ..infer.hf_tokenizer import HFTokenizer

    esm_cfg = builder.esm_config_for(args.esm)
    esm_params = builder.load_esm(args.esm, esm_cfg)
    llm_cfg = builder.decoder_config_for(args.model_base)
    from ..core import convert as cv
    from ..models import decoder as dec
    if args.model_base and __import__("os").path.isdir(args.model_base):
        llm_params = cv.decoder_from_hf(cv.load_hf_dir(args.model_base), llm_cfg)
    else:
        import jax
        llm_params = dec.init(jax.random.PRNGKey(0), llm_cfg)
    tok = HFTokenizer(args.tokenizer or args.model_base, family=llm_cfg.family)
    n = precompute.precompute_cstp_pairs(
        esm_params, esm_cfg, llm_params, llm_cfg, tok,
        args.uniprot_pickle, args.out, batch_size=args.batch_size)
    print(f"wrote {n} pairs -> {args.out}")


def cmd_convert(args) -> None:
    """Convert reference-format checkpoints to the native Orbax layout."""
    from ..core import builder
    from ..core.config import OpusConfig, SwitchProjectorConfig

    llm_cfg = builder.decoder_config_for(args.model_base) if args.model_base \
        else None
    if llm_cfg is None:
        raise SystemExit("--model-base required")
    esm_cfg = builder.esm_config_for(args.esm)
    cstp = None if args.no_cstp else builder.cstp_config_for(args.weights)
    cfg = OpusConfig(
        esm=esm_cfg, cstp=cstp,
        switch=SwitchProjectorConfig(
            input_dim=esm_cfg.embed_dim if args.no_cstp else cstp.proj_dim,
            llm_hidden_size=llm_cfg.hidden_size),
        llm=llm_cfg)
    params, _ = builder.load_pretrained(
        args.model_base, args.weights, cfg, esm_path=args.esm,
        quantize="int4" if getattr(args, "load_int4", False)
        else "int8" if getattr(args, "load_int8", False) else None,
        # --int4-layout makes the on-disk layout an explicit choice:
        # v1 = nibble bytes (train-lora fast path), v2/auto = magic-
        # bitcast words (decode/serving fast path). save_native records
        # it in quant_layout.json next to the checkpoint.
        int4_layout=getattr(args, "int4_layout", "auto"))
    builder.save_native(args.out, params)
    from ..kernels.quant4 import quant_layout_of
    print(f"saved native checkpoint -> {args.out} "
          f"(llm layout: {quant_layout_of(params['llm'])})")


def cmd_bench(args) -> None:
    import os
    import runpy

    # bench.py lives at the repo root (one level above the package)
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "bench.py")
    if not os.path.exists(bench):
        raise SystemExit(f"bench.py not found at {bench}")
    sys.argv = ["bench.py"]
    runpy.run_path(bench, run_name="__main__")


def cmd_serve(args) -> None:
    """HTTP serving daemon over the continuous-batching engine
    (serve/engine.py + serve/server.py) — the deployment surface the
    reference never shipped; its only online path is the REPL."""
    specs = _adapter_specs(args)     # validate the flags pre-load
    cfg, params, tok, mesh = _build(args)
    mesh = _engine_mesh(mesh, None)   # TP-only (--mesh 1,N) or nothing
    from ..serve.server import OpusServer

    bank = _adapter_bank(specs, cfg)
    slots = getattr(args, "adapter_slots", None)
    if slots and not bank:
        raise SystemExit("--adapter-slots needs at least one --adapter "
                         "NAME=PATH (the bank's shapes come from the "
                         "first adapter)")
    srv = OpusServer(
        params, cfg, tok, chat_template=getattr(args, "chat_template", False),
        default_max_new=args.max_new_tokens or 256,
        max_slots=args.max_slots, max_len=args.max_len,
        steps_per_tick=args.steps_per_tick,
        admit_min_free=args.admit_min_free,
        quantize_cache=getattr(args, "quantize_cache", False),
        seed=getattr(args, "seed", 0),
        model_id=getattr(args, "served_model_name", None) or "opus-pllm-tpu",
        lora_bank=bank or None, mesh=mesh,
        chunk_prefill=getattr(args, "chunk_prefill", None),
        adapter_capacity=slots,
        cache_system_prefix=getattr(args, "cache_system_prefix", False),
        max_queue=getattr(args, "max_queue", None),
        # self-speculative continuous batching: greedy AND sampled
        # requests advance up to --n-draft tokens per verify pass (sampled
        # rows via rejection-verified speculative sampling —
        # distribution-identical to plain sampling)
        draft_layers=getattr(args, "draft_layers", 0) or None,
        spec_k=getattr(args, "n_draft", 4),
        spec_adaptive=not getattr(args, "no_spec_adaptive", False))
    # pre-compile every admission shape + the decode step BEFORE accepting
    # traffic; otherwise first requests hit minutes-long jit compiles that
    # stall the queue and trip client timeouts
    print("warming up (pre-compiling admission + decode shapes)...")
    t0 = time.time()
    srv.warmup()
    print(f"warmup done in {time.time() - t0:.1f}s")
    srv.serve_forever(args.host, args.port,
                      drain_grace=getattr(args, "drain_grace", 30.0))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="opus-pllm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("annotate", help="batch annotation eval on a test set")
    _model_args(a); _gen_args(a)
    a.add_argument("--test-json", required=True)
    a.add_argument("--save-path", default=None)
    a.add_argument("--biobert", default=None,
                   help="local BioBERT dir for BERTScore (function sets)")
    a.add_argument("--engine", action="store_true",
                   help="continuous-batching engine instead of static "
                        "batches: per-sequence finish + mid-stream "
                        "admission (T=0 token-identical; T>0 samples "
                        "with per-request temperature + top-p)")
    a.add_argument("--max-slots", type=int, default=16,
                   help="engine slots (--engine only)")
    a.add_argument("--steps-per-tick", type=int, default=4,
                   help="decode steps per compiled engine call "
                        "(--engine only)")
    a.add_argument("--cache-prefix", action="store_true",
                   help="prefill the eval run's common prompt header "
                        "(the professor/system preamble) ONCE and admit "
                        "each request with only its suffix (--engine, "
                        "base weights only)")
    a.add_argument("--adapter", action="append", metavar="NAME=PATH",
                   help="named UNMERGED LoRA adapter for the engine bank "
                        "(repeatable, --engine only); auto-matched to the "
                        "test set by basename, or forced via --use-adapter")
    a.add_argument("--use-adapter", default=None, metavar="NAME",
                   help="run the whole set under this bank adapter")
    a.set_defaults(fn=cmd_annotate)

    aa = sub.add_parser("annotate-all",
                        help="loop test sets x repeats (ablation protocol)")
    _model_args(aa); _gen_args(aa)
    aa.add_argument("--test-jsons", nargs="+", required=True)
    aa.add_argument("--repeats", type=int, default=5)
    aa.add_argument("--save-dir", default=None)
    aa.add_argument("--engine", action="store_true",
                    help="continuous-batching engine instead of static "
                         "batches (see annotate --engine)")
    aa.add_argument("--max-slots", type=int, default=16,
                    help="engine slots (--engine only)")
    aa.add_argument("--steps-per-tick", type=int, default=4,
                    help="decode steps per compiled engine call "
                         "(--engine only)")
    aa.add_argument("--cache-prefix", action="store_true",
                    help="see annotate --cache-prefix")
    aa.add_argument("--adapter", action="append", metavar="NAME=PATH",
                    help="named UNMERGED LoRA adapter (repeatable, --engine "
                         "only): each test set runs under the adapter whose "
                         "NAME appears in its basename — the ablation "
                         "protocol's per-task adapters from ONE loaded "
                         "base, where eval_total_ablation.sh reloads the "
                         "model per adapter; the full mapping prints and "
                         "validates before the model load")
    aa.add_argument("--map", action="append", metavar="BASENAME=NAME",
                    help="override the substring match for one test set "
                         "(resolves ambiguity like go/go_bp); "
                         "BASENAME= (empty NAME) forces base weights")
    aa.set_defaults(fn=cmd_annotate_all)

    m = sub.add_parser("mcq", help="multiple-choice eval")
    _model_args(m); _gen_args(m)
    m.add_argument("--test-json", required=True)
    m.add_argument("--save-path", default=None)
    m.add_argument("--engine", action="store_true",
                   help="continuous-batching engine instead of static "
                        "batches (see annotate --engine)")
    m.add_argument("--max-slots", type=int, default=16,
                   help="engine slots (--engine only)")
    m.add_argument("--steps-per-tick", type=int, default=4,
                   help="decode steps per compiled engine call "
                        "(--engine only)")
    m.add_argument("--cache-prefix", action="store_true",
                   help="see annotate --cache-prefix")
    m.add_argument("--scored", action="store_true",
                   help="score option letters with ONE prefill forward "
                        "(argmax of P(first token = letter)) instead of "
                        "free-text decode + regex extraction — "
                        "deterministic, ~max-new-tokens x faster")
    m.add_argument("--adapter", action="append", metavar="NAME=PATH",
                   help="named UNMERGED LoRA adapter for the engine bank "
                        "(repeatable, --engine only)")
    m.add_argument("--use-adapter", default=None, metavar="NAME",
                   help="run the whole set under this bank adapter")
    m.set_defaults(fn=cmd_mcq)

    c = sub.add_parser("chat", help="interactive annotation REPL")
    _model_args(c); _gen_args(c)
    c.add_argument("--chat-template", action="store_true",
                   help="chat-template prompting (Evol models)")
    c.set_defaults(fn=cmd_chat)

    sv = sub.add_parser("serve", help="HTTP serving daemon (continuous "
                        "batching over one compiled decode step)")
    _model_args(sv)
    sv.add_argument("--host", default="0.0.0.0")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--max-slots", type=int, default=16,
                    help="concurrent sequences (the compiled decode batch)")
    sv.add_argument("--max-len", type=int, default=1024,
                    help="per-slot KV capacity (prompt + generation)")
    sv.add_argument("--steps-per-tick", type=int, default=8,
                    help="decode steps per compiled call (dispatch "
                         "amortization; raise when the host is remote "
                         "from the chip)")
    sv.add_argument("--max-queue", type=int, default=None,
                    help="admission backpressure: reject new requests "
                         "with 429 once this many wait for slots "
                         "(default: unbounded)")
    sv.add_argument("--cache-system-prefix", action="store_true",
                    help="pin the constant professor-header KV once "
                         "(engine prefix cache); matching requests admit "
                         "with only their suffix — per-request prefill "
                         "drops by the header length (manual-layout "
                         "prompts, base-weight requests)")
    sv.add_argument("--adapter-slots", type=int, default=None,
                    help="adapter-bank capacity: spare rows beyond the "
                         "--adapter entries that POST /v1/adapters can "
                         "fill at runtime without a restart/recompile")
    sv.add_argument("--drain-grace", type=float, default=30.0,
                    help="graceful-shutdown window: on SIGTERM, reject "
                         "new requests (503) and give in-flight ones "
                         "this many seconds before cancelling")
    sv.add_argument("--admit-min-free", type=int, default=1,
                    help="batch admissions until this many slots are free "
                         "(fewer prefill dispatches at the cost of "
                         "time-to-first-token)")
    sv.add_argument("--max-new-tokens", type=int, default=None,
                    help="default per-request budget (requests can "
                         "override)")
    sv.add_argument("--seed", type=int, default=0)
    sv.add_argument("--adapter", action="append", metavar="NAME=PATH",
                    help="serve a named UNMERGED LoRA adapter from the "
                         "bank (repeatable; PEFT dir or weights dir with "
                         "lora_adapter/); requests select one with "
                         '{"adapter": NAME} — the ablation protocol\'s '
                         "per-task adapters served concurrently")
    sv.add_argument("--no-spec-adaptive", action="store_true",
                    help="with --draft-layers: always speculate instead "
                         "of falling back to plain decode ticks when the "
                         "measured acceptance stops covering the draft "
                         "cost (the adaptive default)")
    sv.add_argument("--chunk-prefill", type=int, default=None,
                    metavar="C",
                    help="admit prompts longer than the largest prefill "
                         "bucket in C-token chunks, one per tick, "
                         "interleaved with decode (bounds time-to-first-"
                         "token for everyone else)")
    sv.add_argument("--served-model-name", default=None,
                    help="the `model` name the OpenAI-compatible endpoints "
                         "(/v1/chat/completions, /v1/completions, "
                         "/v1/models) serve the base weights under; bank "
                         "adapters route by their --adapter names")
    sv.add_argument("--chat-template", action="store_true",
                    help="chat-template prompting (Evol models)")
    sv.set_defaults(fn=cmd_serve)

    tc = sub.add_parser("train-cstp", help="stage (a): contrastive adapter")
    tc.add_argument("--vec-pickle", required=True)
    tc.add_argument("--out", required=True)
    tc.add_argument("--lr", type=float, default=0.05)
    tc.add_argument("--wd", type=float, default=1e-4)
    tc.add_argument("--batch-size", type=int, default=128)
    tc.add_argument("--epochs", type=int, default=1)
    tc.add_argument("--seed", type=int, default=0)
    tc.add_argument("--mesh", default=None, metavar="DATA[,MODEL]",
                    help="DP mesh for stage (a): embedding batches shard "
                         "over the data axis (Lightning DDP's role)")
    tc.add_argument("--max-steps", type=int, default=0,
                   help="stop after N optimizer steps (0 = all)")
    tc.add_argument("--save-every", type=int, default=0,
                   help="checkpoint the full train state every N steps "
                        "into OUT/resume_state")
    tc.add_argument("--resume", action="store_true",
                   help="resume from the latest OUT/resume_state")
    tc.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize first")
    tc.set_defaults(fn=cmd_train_cstp)

    for name, is_lora in (("train-projector", False), ("train-lora", True)):
        t = sub.add_parser(name)
        _model_args(t)
        t.add_argument("--train-json", required=True)
        t.add_argument("--val-json", default=None,
                       help="held-out instruction JSON: token-weighted "
                            "val loss every --val-every steps + at the "
                            "end (standard path only)")
        t.add_argument("--val-every", type=int, default=0,
                       help="validation interval in steps (0: only at "
                            "the end, when --val-json is set)")
        t.add_argument("--out", required=True)
        t.add_argument("--lr", type=float, default=2e-5 if is_lora else 1e-3)
        t.add_argument("--wd", type=float, default=0.0)
        t.add_argument("--batch-size", type=int, default=16)
        t.add_argument("--epochs", type=int, default=1)
        t.add_argument("--seed", type=int, default=0)
        t.add_argument("--max-len", type=int, default=512)
        t.add_argument("--lora-rank", type=int, default=16)
        t.add_argument("--train-switch", action="store_true")
        t.add_argument("--grad-accum", type=int, default=1,
                       help="gradient accumulation: micro-chunks per "
                            "optimizer step (effective batch stays "
                            "--batch-size; activation memory drops to the "
                            "chunk's; update equals the big-batch step via "
                            "valid-token weighting)")
        t.add_argument("--ce-chunk", type=int, default=0,
                       help="sequence-chunked cross-entropy: bounds live "
                            "fp32 logits to (B, chunk, V) — use 64 for "
                            "single-chip training of 128k-vocab 8B models "
                            "(BENCH_NOTES.md round 2)")
        t.add_argument("--scan-mode", choices=("xs", "index"), default="xs",
                       help="decoder layer-loop layout: 'index' bounds "
                            "XLA's stacked-weight relayout copies to one "
                            "layer — required (with --ce-chunk) for the "
                            "single-chip 8B training recipe")
        t.add_argument("--remat", choices=("full", "none", "dots"),
                       default="full",
                       help="per-layer activation rematerialization: "
                            "'full' (default) fits big models, 'none' is "
                            "1.34x faster on ~1B-class steps where "
                            "activations fit HBM (BENCH_NOTES round 5), "
                            "'dots' saves MXU outputs only")
        t.add_argument("--max-steps", type=int, default=0,
                       help="stop after N optimizer steps (0 = all)")
        t.add_argument("--save-every", type=int, default=0,
                       help="checkpoint the full train state (trainable + "
                            "optimizer + step) every N steps into "
                            "OUT/resume_state")
        t.add_argument("--resume", action="store_true",
                       help="resume from the latest OUT/resume_state "
                            "checkpoint (skips the consumed batches of "
                            "the seeded data stream)")
        t.add_argument("--seq-shards", type=int, default=0,
                       help="sequence-parallel training over a ('seq',) "
                            "mesh of this many devices (ring attention, "
                            "train/sp.py): per-device activation memory "
                            "drops to O(S / shards) for long contexts; "
                            "mutually exclusive with --mesh")
        t.add_argument("--pipe-stages", type=int, default=0,
                       help="pipeline-parallel training over a ('pipe',) "
                            "mesh of this many devices (GPipe microbatch "
                            "schedule, train/pp.py): each stage holds "
                            "layers/stages of the decoder, so stacks past "
                            "one chip's HBM train without TP's matmul "
                            "narrowing; mutually exclusive with --mesh "
                            "and --seq-shards")
        t.add_argument("--micro-batches", type=int, default=0,
                       help="microbatches per step for --pipe-stages "
                            "(default: the stage count; more microbatches "
                            "shrink the pipeline bubble (P-1)/(M+P-1))")
        t.add_argument("--pipe-data", type=int, default=1,
                       help="with --pipe-stages: run this many independent "
                            "pipeline replicas over batch shards (a 2-D "
                            "('data','pipe') mesh of pipe-data x "
                            "pipe-stages devices, DPxPP)")
        t.add_argument("--export-reference-format", action="store_true",
                       help="also write the reference checkpoint layout "
                            "(modality_refinement_projector/, lora_adapter/)")
        t.set_defaults(fn=lambda a, _l=is_lora: _train_multimodal(a, lora=_l))

    pc = sub.add_parser("precompute-embeddings")
    pc.add_argument("--json", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--mode", choices=("jsonl", "map"), default="jsonl")
    pc.add_argument("--esm", default=None)
    pc.add_argument("--batch-size", type=int, default=16)
    pc.set_defaults(fn=cmd_precompute)

    pp = sub.add_parser("precompute-pairs",
                        help="UniProtQA pickle -> CSTP training pairs")
    _model_args(pp)
    pp.add_argument("--uniprot-pickle", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--batch-size", type=int, default=8)
    pp.set_defaults(fn=cmd_precompute_pairs)

    cv = sub.add_parser("convert-weights")
    _model_args(cv)
    cv.add_argument("--out", required=True)
    cv.add_argument("--int4-layout", choices=("auto", "v1", "v2"),
                    default="auto",
                    help="with --load-int4: on-disk pack layout — v1 "
                         "nibble bytes (the train-lora fast path), "
                         "v2/auto magic-bitcast words (the decode/serving "
                         "fast path; train-* commands reject it). "
                         "Recorded in <out>/quant_layout.json")
    cv.set_defaults(fn=cmd_convert)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # on-disk XLA compilation cache: repeat CLI runs (eval loops, the
    # 17-set x 5-repeat ablation, chat restarts) skip the minutes-long
    # TPU compiles entirely (~/.opus_jax_cache, override OPUS_JAX_CACHE)
    from ..core.util import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
