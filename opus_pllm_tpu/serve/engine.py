"""Continuous-batching serving engine (TPU-native, static shapes).

Beyond-parity infrastructure: the reference repo has no serving layer (its
runners are offline batch scripts), but this framework targets production
deployment. The design is the TPU answer to vLLM-style continuous
batching, built so that EVERYTHING the chip executes is compiled once:

* A fixed pool of `max_slots` sequence slots shares one persistent KV
  cache of capacity `max_len` per slot. Slot state (length, last token,
  remaining budget, eos id, temperature) lives in device arrays.
* ONE jitted `decode_step` advances every active slot by one token per
  tick — per-slot cache writes use the decoder's (B,)-indexed scatter
  path, per-slot positions/masks come from the length array, finished
  slots are masked out. No recompilation ever happens during decode.
* New requests join between ticks: prompts are bucketed to a few static
  lengths (powers of two), prefilled as a sub-batch with a fresh
  mini-cache, and spliced into free slots of the big cache by a jitted
  merge (one compile per bucket x join-batch-size, both enumerable).
* The host-side scheduler is a plain queue: admit -> prefill -> tick ->
  harvest. A request completes on EOS or its own max_new_tokens; its slot
  is immediately reusable — sequences of very different lengths never
  barrier on each other, which is the whole point.

Greedy/temperature sampling is per-slot (a temperature of 0 = argmax).
Results are token-identical to `infer.engine.generate` run per request
(tests/test_serve.py asserts this).
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DecoderConfig
from ..models import decoder


@dataclasses.dataclass
class ServeRequest:
    """One generation request. `embeds` (P, H) already-embedded prompt
    (the multimodal splicer emits embeddings, mirroring HF
    generate(inputs_embeds=...)); or pass `token_ids` (P,) to embed from
    the vocabulary."""
    request_id: Any
    embeds: Optional[np.ndarray] = None
    token_ids: Optional[np.ndarray] = None
    max_new_tokens: int = 128
    temperature: float = 0.0
    eos_token_id: int = -1


@dataclasses.dataclass
class Completion:
    request_id: Any
    tokens: List[int]
    finish_reason: str          # "eos" | "length"


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class ServingEngine:
    """Slot-based continuous batching over a fixed decoder.

    params: decoder params (per-layer or stacked layout).
    max_slots: concurrent sequences (the compiled decode batch).
    max_len: per-slot KV capacity (prompt + generation).
    prefill_buckets: static prompt paddings (ascending).
    """

    def __init__(self, params, cfg: DecoderConfig, *, max_slots: int = 8,
                 max_len: int = 512,
                 prefill_buckets: Tuple[int, ...] = (64, 128, 256),
                 quantize_cache: bool = False, seed: int = 0,
                 steps_per_tick: int = 1):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_len = max_len
        # steps_per_tick > 1 runs K decode steps per jitted call (an inner
        # lax.scan): admission/harvest happen every K tokens, but host
        # dispatch latency amortizes K-fold — the lever for remote-hosted
        # chips and high-throughput serving. Slots finishing mid-scan
        # burn at most K-1 wasted steps; their surplus tokens are dropped.
        self.steps_per_tick = int(steps_per_tick)
        self.buckets = tuple(sorted(b for b in prefill_buckets
                                    if b <= max_len))
        if not self.buckets:
            raise ValueError("no prefill bucket fits max_len")
        self.stacked = "layers_stacked" in params

        cache = decoder.init_cache(cfg, max_slots, max_len,
                                   stacked=self.stacked,
                                   quantize=quantize_cache)
        # per-slot write indices instead of the scalar batch-uniform index;
        # cache["mask"] stays (decoder.forward threads it through) but
        # serving derives its real masks from the length array
        cache["index"] = jnp.zeros((max_slots,), jnp.int32)
        self.cache = cache

        z = functools.partial(jnp.zeros, (max_slots,))
        self.state = {
            "active": z(bool),
            "length": z(jnp.int32),        # valid cache slots per row
            "last_token": z(jnp.int32),
            "remaining": z(jnp.int32),     # new-token budget left
            "eos": jnp.full((max_slots,), -1, jnp.int32),
            "temperature": z(jnp.float32),
            "done_now": z(bool),
        }
        self._key = jax.random.PRNGKey(seed)
        self._tick = 0

        self._queue: deque[ServeRequest] = deque()
        self._slot_req: Dict[int, ServeRequest] = {}
        self._slot_tokens: Dict[int, List[int]] = {}
        self._completions: List[Completion] = []
        self._decode = self._build_decode_step()
        self._prefills: Dict[int, Callable] = {}

    # ------------------------------------------------------------------
    # compiled pieces
    # ------------------------------------------------------------------

    def _build_decode_step(self):
        cfg = self.cfg
        L = self.max_len
        K = self.steps_per_tick

        def one(params, cache, state, key):
            ids = state["last_token"]
            emb = decoder.embed_tokens(params, jnp.maximum(ids, 0)
                                       ).astype(cfg.jnp_dtype)[:, None]
            pos = state["length"][:, None]
            # row i attends to its own slots [0, length_i] (incl. the one
            # being written this step)
            valid = (jnp.arange(L)[None, :] <= state["length"][:, None])
            mask4 = valid[:, None, None, :]
            logits, new_cache = decoder.forward(
                params, cfg, emb, pos, mask4, cache=cache)
            lg = logits[:, -1].astype(jnp.float32)
            greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            t = state["temperature"]
            sampled = jax.random.categorical(
                key, lg / jnp.maximum(t, 1e-6)[:, None]).astype(jnp.int32)
            nxt = jnp.where(t > 0, sampled, greedy)
            # inactive slots keep state; active ones advance
            act = state["active"]
            nxt = jnp.where(act, nxt, state["last_token"])
            remaining = state["remaining"] - act.astype(jnp.int32)
            hit_eos = act & (nxt == state["eos"])
            out_of_budget = act & (remaining <= 0)
            done_now = hit_eos | out_of_budget
            new_state = dict(
                state,
                last_token=nxt,
                length=state["length"] + act.astype(jnp.int32),
                remaining=remaining,
                active=act & ~done_now,
                done_now=state["done_now"] | done_now,
            )
            # rows that were inactive must not corrupt their cache slot:
            # their write landed at length_i which stays their next free
            # slot (length unchanged), and will be overwritten on reuse.
            # forward() bumped every row's index by 1; the true next write
            # slot is each row's (new) length
            new_cache = dict(new_cache, index=new_state["length"])
            return new_cache, new_state, nxt

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(params, cache, state, key):
            if K == 1:
                cache, state, nxt = one(params, cache, state, key)
                return cache, state, nxt[None]

            def body(carry, k):
                cache, state = carry
                cache, state, nxt = one(params, cache, state, k)
                return (cache, state), nxt

            (cache, state), toks = jax.lax.scan(
                body, (cache, state), jax.random.split(key, K))
            return cache, state, toks          # (K, B)

        return step

    def _prefill_fn(self, bucket: int):
        """Compile-once prefill for one bucket: returns (cache_rows,
        last_logits) for a 1-request sub-batch, then a jitted merge
        scatters the rows into the big cache."""
        cfg = self.cfg

        @jax.jit
        def prefill(params, emb, mask, pos):
            cache = decoder.init_cache(cfg, 1, bucket, stacked=self.stacked,
                                       quantize=self._cache_quantized())
            # causal within the prompt, padding beyond it
            mask4 = (mask[:, None, None, :]
                     & (jnp.arange(bucket)[None, None, None, :]
                        <= pos[:, None, :, None]))
            logits, new_cache = decoder.forward(
                params, cfg, emb, pos, mask4, cache=cache)
            # the last VALID row's logits (prompts shorter than the bucket)
            n_valid = jnp.sum(mask, axis=-1)
            last = jnp.take_along_axis(
                logits, (n_valid - 1)[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            return new_cache, last

        @functools.partial(jax.jit, donate_argnums=(0,))
        def merge(big, rows, slot):
            def put(b, r):
                if b.ndim == 5:      # stacked: (Layers, B, L, H, D|1)
                    start = (0, slot) + (0,) * 3
                else:                # per-layer: (B, L, H, D|1)
                    start = (slot,) + (0,) * 3
                return jax.lax.dynamic_update_slice(
                    b, r.astype(b.dtype), start)

            big_layers = jax.tree.map(put, big["layers"], rows["layers"])
            return dict(big, layers=big_layers)

        return prefill, merge

    def _cache_quantized(self) -> bool:
        leaf = jax.tree.leaves(self.cache["layers"])[0]
        return leaf.dtype == jnp.int8

    # ------------------------------------------------------------------
    # scheduler
    # ------------------------------------------------------------------

    def submit(self, req: ServeRequest) -> None:
        if req.embeds is None and req.token_ids is None:
            raise ValueError("request needs embeds or token_ids")
        self._queue.append(req)

    def _free_slots(self) -> List[int]:
        active = np.asarray(self.state["active"])
        return [i for i in range(self.max_slots)
                if not active[i] and i not in self._slot_req]

    def _admit(self) -> None:
        free = self._free_slots()
        while free and self._queue:
            slot = free.pop(0)
            req = self._queue.popleft()
            self._start(slot, req)

    def _start(self, slot: int, req: ServeRequest) -> None:
        if req.embeds is not None:
            emb = np.asarray(req.embeds)
        else:
            emb = np.asarray(decoder.embed_tokens(
                self.params, jnp.asarray(req.token_ids)[None])[0])
        p = emb.shape[0]
        if p > self.max_len:
            raise ValueError(f"prompt ({p}) exceeds max_len {self.max_len}")
        bucket = _bucket(p, self.buckets)
        if bucket not in self._prefills:
            self._prefills[bucket] = self._prefill_fn(bucket)
        prefill, merge = self._prefills[bucket]

        pe = np.zeros((1, bucket, emb.shape[-1]), emb.dtype)
        pe[0, :p] = emb
        pm = np.zeros((1, bucket), bool)
        pm[0, :p] = True
        pos = np.zeros((1, bucket), np.int32)
        pos[0, :p] = np.arange(p)
        rows, last = prefill(self.params, jnp.asarray(
            pe, self.cfg.jnp_dtype), jnp.asarray(pm), jnp.asarray(pos))
        self.cache = merge(self.cache, rows, jnp.int32(slot))

        first = int(np.argmax(np.asarray(last[0])))
        if req.temperature > 0:
            self._key, k = jax.random.split(self._key)
            first = int(jax.random.categorical(
                k, last[0] / max(req.temperature, 1e-6)))

        st = {k: np.array(v) for k, v in self.state.items()}
        st["active"][slot] = True
        st["length"][slot] = p
        st["last_token"][slot] = first
        st["remaining"][slot] = req.max_new_tokens - 1
        st["eos"][slot] = req.eos_token_id
        st["temperature"][slot] = req.temperature
        st["done_now"][slot] = False
        self.state = {k: jnp.asarray(v) for k, v in st.items()}
        self.cache["index"] = self.cache["index"].at[slot].set(p)

        self._slot_req[slot] = req
        self._slot_tokens[slot] = [first]
        # a 1-token budget (or an immediate EOS) finishes without a tick
        if first == req.eos_token_id:
            self._finish(slot, "eos")
        elif req.max_new_tokens <= 1:
            self._finish(slot, "length")

    def _finish(self, slot: int, reason: str) -> None:
        req = self._slot_req.pop(slot)
        toks = self._slot_tokens.pop(slot)
        if reason == "eos" and toks and toks[-1] == req.eos_token_id:
            toks = toks[:-1]
        self._completions.append(Completion(req.request_id, toks, reason))
        st = {k: np.array(v) for k, v in self.state.items()}
        st["active"][slot] = False
        st["done_now"][slot] = False
        self.state = {k: jnp.asarray(v) for k, v in st.items()}

    def step(self) -> List[Completion]:
        """One scheduler tick: admit queued requests, advance every active
        slot by up to `steps_per_tick` tokens, harvest completions.
        Returns newly finished."""
        self._admit()
        if not self._slot_req:
            out, self._completions = self._completions, []
            return out
        old_len = np.array(self.state["length"])
        self._key, k = jax.random.split(self._key)
        self.cache, self.state, toks = self._decode(
            self.params, self.cache, self.state, k)
        self._tick += 1

        toks_h = np.asarray(toks)                      # (K, B)
        new_len = np.array(self.state["length"])
        done_h = np.array(self.state["done_now"])
        eos_h = np.array(self.state["eos"])
        for slot in list(self._slot_req):
            # active inner steps are a prefix of the K; after a slot
            # finishes, the scan repeats its last token — dropped here
            n_new = int(new_len[slot] - old_len[slot])
            self._slot_tokens[slot].extend(
                int(t) for t in toks_h[:n_new, slot])
            if done_h[slot]:
                toks_slot = self._slot_tokens[slot]
                reason = ("eos" if toks_slot
                          and toks_slot[-1] == int(eos_h[slot])
                          else "length")
                self._finish(slot, reason)
        out, self._completions = self._completions, []
        return out

    def run(self, requests: List[ServeRequest],
            max_ticks: Optional[int] = None) -> Dict[Any, Completion]:
        """Drive the queue to completion; returns {request_id: Completion}."""
        for r in requests:
            self.submit(r)
        done: Dict[Any, Completion] = {}
        ticks = 0
        while (self._queue or self._slot_req) and (
                max_ticks is None or ticks < max_ticks):
            for c in self.step():
                done[c.request_id] = c
            ticks += 1
        for c in self._completions:
            done[c.request_id] = c
        self._completions = []
        return done
