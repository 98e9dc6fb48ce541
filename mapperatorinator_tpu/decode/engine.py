"""JIT-compiled autoregressive decode engine.

The TPU replacement for HF ``GenerationMixin.generate`` + ``StaticCache``
(reference: ``osuT5/osuT5/inference/server.py:84-156``,
``cache_utils.py:7-35``): one compiled ``lax.while_loop`` whose carry holds
the token buffer, a donated preallocated KV cache, per-sequence finished
flags, and the logit-processor state. Semantics replicated from the
reference stack:

* multi-EOS stopping sets — base EOS, context EOS, and the lookback/
  lookahead time-shift ranges — as a vocab-sized boolean mask,
* the full logit-processor chain (CFG -> monotonic -> bias -> temperature ->
  lookback -> top-k -> top-p) in HF order,
* classifier-free guidance as a folded dual batch: rows [0..B) carry the
  negative prompt, rows [B..2B) the positive; both halves receive the same
  sampled continuation (reference: modeling_mapperatorinator.py:230-271),
* left-padded prompts with attention masks; finished rows emit pad.

Sampling uses ``jax.random.categorical`` over the processed logits. Exact
torch-RNG-stream equality with the reference is impossible cross-framework;
parity is pinned at processed-logits level (SURVEY.md §7 hard part 1) and
fixed-seed determinism holds within this framework.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .logits import LogitsPipeline, LogitsState


@dataclasses.dataclass(frozen=True)
class GenerationParams:
    max_length: int
    pad_token_id: int = 0
    cfg_scale: float = 1.0
    do_sample: bool = True
    num_beams: int = 1


class DecodeCarry(NamedTuple):
    tokens: jnp.ndarray  # (B, max_length) int32
    attention_mask: jnp.ndarray  # (B, max_length) bool — valid (non-pad) slots
    cache: Any
    cur_len: jnp.ndarray  # scalar int32, next write index
    finished: jnp.ndarray  # (B,) bool
    rng: jnp.ndarray
    logits_state: LogitsState
    n_valid: jnp.ndarray  # (B,) int32 — logical (pad-free) sequence lengths


class DecodeEngine:
    """Wraps a Mapperatorinator (or compatible) flax module + params with a
    compiled windowed generate()."""

    def __init__(self, model, params, max_length: int, pad_token_id: int = 0):
        self.model = model
        self.params = params
        self.max_length = max_length
        self.pad_token_id = pad_token_id
        self._generate_fn_cache: dict = {}

    # -- public API -------------------------------------------------------------

    def encode(self, frames: jnp.ndarray, **cond) -> jnp.ndarray:
        return self.encode_with_cond(frames, cond)

    def encode_with_cond(self, frames, cond: Optional[dict] = None) -> jnp.ndarray:
        """Conditioned encoder forward; one compiled program per cond-key set."""
        cond = cond or {}
        key = ("encode", tuple(sorted(cond)), np.shape(frames))
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            model = self.model

            @jax.jit
            def fn(params, frames, cond):
                return model.apply(params, frames, method=type(model).encode, **cond)

            self._generate_fn_cache[key] = fn
        return fn(self.params, jnp.asarray(frames), {k: jnp.asarray(v) for k, v in cond.items()})

    def generate(
        self,
        encoder_states: jnp.ndarray,
        decoder_input_ids: np.ndarray,
        pipeline: LogitsPipeline,
        eos_ids: list[int],
        seed: int = 0,
        decoder_attention_mask: Optional[np.ndarray] = None,
        cfg_scale: float = 1.0,
        max_length: Optional[int] = None,
    ) -> np.ndarray:
        """Run compiled decode. decoder_input_ids: (B, P) left-padded prompt
        (already includes any CFG dual-batch duplication by the caller when
        cfg_scale > 1; encoder_states rows must match). Returns (B, max_length)
        right-padded with pad_token_id."""
        max_length = max_length or self.max_length
        B, P_orig = decoder_input_ids.shape
        assert P_orig < max_length, f"prompt length {P_orig} >= max_length {max_length}"

        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id

        # Bucket the prompt length (power-of-two) so windows with varying
        # prompt sizes reuse a handful of compiled programs. Extra left pads
        # are output-invariant: RoPE positions are mask-aware, pads are
        # masked out of attention, and the generation budget is the dynamic
        # ``gen_limit`` below, preserving HF's max_length = prompt + generated
        # semantics regardless of padding.
        P = _bucket(P_orig)
        if P != P_orig:
            pad = P - P_orig
            decoder_input_ids = np.pad(decoder_input_ids, ((0, 0), (pad, 0)), constant_values=self.pad_token_id)
            decoder_attention_mask = np.pad(decoder_attention_mask, ((0, 0), (pad, 0)), constant_values=False)
        gen_limit = max_length - P_orig

        eos_mask = np.zeros(pipeline.vocab_size, bool)
        for e in eos_ids:
            eos_mask[e] = True

        key = (B, P, max_length, pipeline, cfg_scale)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            fn = self._build_generate_fn(B, P, max_length, pipeline, cfg_scale)
            self._generate_fn_cache[key] = fn

        tokens, lengths = fn(
            self.params,
            encoder_states,
            jnp.asarray(decoder_input_ids, jnp.int32),
            jnp.asarray(decoder_attention_mask, bool),
            jnp.asarray(eos_mask),
            jnp.asarray(gen_limit, jnp.int32),
            jax.random.PRNGKey(seed),
        )
        return np.asarray(tokens), np.asarray(lengths)

    def forward(
        self,
        encoder_states,
        decoder_input_ids: np.ndarray,
        decoder_attention_mask: Optional[np.ndarray] = None,
        cfg_scale: float = 1.0,
    ) -> np.ndarray:
        """Teacher-forced forward -> fp32 logits (B, T, V); folds the CFG dual
        batch like the reference's model_forward (reference: server.py:160-181).
        With cfg_scale > 1 the batch is [neg; pos] and B halves on return."""
        B, T = decoder_input_ids.shape
        key = ("forward", B, T, np.shape(encoder_states))
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            model = self.model

            @jax.jit
            def fn(params, enc, ids, mask):
                logits = model.apply(
                    params,
                    decoder_input_ids=ids,
                    decoder_attention_mask=mask,
                    encoder_states=enc,
                )
                if isinstance(logits, tuple):
                    logits = logits[0]
                return logits.astype(jnp.float32)

            self._generate_fn_cache[key] = fn
        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id
        logits = fn(
            self.params,
            jnp.asarray(encoder_states),
            jnp.asarray(decoder_input_ids, jnp.int32),
            jnp.asarray(decoder_attention_mask),
        )
        logits = np.asarray(logits)
        if cfg_scale > 1.0:
            half = logits.shape[0] // 2
            neg, pos = logits[:half], logits[half:]
            logits = pos + (neg - pos) * cfg_scale
        return logits

    # -- compiled internals -------------------------------------------------------

    def _build_generate_fn(self, B: int, P: int, max_length: int, pipeline: LogitsPipeline, cfg_scale: float):
        model = self.model
        pad_id = self.pad_token_id
        use_cfg = cfg_scale > 1.0

        def apply(params, method, *args, **kw):
            return model.apply(params, *args, method=getattr(type(model), method), **kw)

        # static token buffer: bucketed prompt + full generation budget
        buffer_len = P + max_length

        @functools.partial(jax.jit, donate_argnums=())
        def generate(params, encoder_states, prompt_ids, prompt_mask, eos_mask, gen_limit, rng):
            # 1. init cache and prefill with the prompt chunk
            cache = apply(params, "init_cache", B, buffer_len, encoder_states)

            tokens = jnp.full((B, buffer_len), pad_id, jnp.int32)
            tokens = tokens.at[:, :P].set(prompt_ids)
            attn = jnp.zeros((B, buffer_len), bool).at[:, :P].set(prompt_mask)
            # logical positions ignore left pads -> bucketing is output-invariant
            prompt_positions = jnp.clip(jnp.cumsum(prompt_mask, axis=1) - 1, 0)
            n_valid = prompt_mask.sum(axis=1).astype(jnp.int32)  # (B,)

            # key-side mask over cache slots: (B, 1, 1, max_length)
            self_mask = attn[:, None, None, :]
            prompt_embeds = apply(params, "embed_tokens", prompt_ids)
            logits, cache = apply(
                params, "decode_step", prompt_embeds, cache, 0,
                self_mask=self_mask, positions=prompt_positions,
            )
            last_logits = logits[:, -1].astype(jnp.float32)

            lstate = pipeline.init_state(B if not use_cfg else B // 2)
            finished = jnp.zeros((B,), bool)

            def sample_from(logits, lstate, rng, finished, tokens, cur_len):
                if use_cfg:
                    half = B // 2
                    neg, pos = logits[:half], logits[half:]
                    # HF CFG order as driven by the reference's prepare_inputs:
                    # first half carries the negative prompt ("cond" slot)
                    guided = pos + (neg - pos) * cfg_scale
                    scores = guided
                else:
                    scores = logits

                lstate, scores = pipeline(lstate, scores)
                rng, sub = jax.random.split(rng)
                if pipeline.do_sample:
                    sampled = jax.random.categorical(sub, scores, axis=-1)
                else:
                    sampled = jnp.argmax(scores, axis=-1)
                sampled = sampled.astype(jnp.int32)
                lstate = pipeline.update_state(lstate, sampled)
                if use_cfg:
                    sampled = jnp.concatenate([sampled, sampled], axis=0)

                sampled = jnp.where(finished, pad_id, sampled)
                # eos detection on the guided/sample half
                sample_half = sampled[: B // 2] if use_cfg else sampled
                hit_eos = eos_mask[jnp.clip(sample_half, 0, eos_mask.shape[0] - 1)]
                if use_cfg:
                    hit_eos = jnp.concatenate([hit_eos, hit_eos], axis=0)
                new_finished = finished | hit_eos

                tokens = jax.lax.dynamic_update_slice(tokens, sampled[:, None], (0, cur_len))
                return sampled, lstate, rng, new_finished, tokens

            sampled, lstate, rng, finished, tokens = sample_from(
                last_logits, lstate, rng, finished, tokens, P
            )
            attn = jax.lax.dynamic_update_slice(attn, jnp.ones((B, 1), bool), (0, P))

            carry = DecodeCarry(
                tokens=tokens,
                attention_mask=attn,
                cache=cache,
                cur_len=jnp.asarray(P + 1, jnp.int32),
                finished=finished,
                rng=rng,
                logits_state=lstate,
                n_valid=n_valid + 1,
            )

            def cond(c: DecodeCarry):
                return (c.cur_len < P + gen_limit) & ~jnp.all(c.finished)

            def body(c: DecodeCarry):
                last = jax.lax.dynamic_slice(c.tokens, (0, c.cur_len - 1), (B, 1))
                self_mask = c.attention_mask[:, None, None, :]
                positions = (c.n_valid - 1)[:, None]
                last_embeds = apply(params, "embed_tokens", last)
                logits, cache = apply(
                    params, "decode_step", last_embeds, c.cache, c.cur_len - 1,
                    self_mask=self_mask, positions=positions,
                )
                step_logits = logits[:, -1].astype(jnp.float32)
                sampled, lstate, rng, finished, tokens = sample_from(
                    step_logits, c.logits_state, c.rng, c.finished, c.tokens, c.cur_len
                )
                attn = jax.lax.dynamic_update_slice(
                    c.attention_mask, jnp.ones((B, 1), bool), (0, c.cur_len)
                )
                return DecodeCarry(
                    tokens=tokens,
                    attention_mask=attn,
                    cache=cache,
                    cur_len=c.cur_len + 1,
                    finished=finished,
                    rng=rng,
                    logits_state=lstate,
                    n_valid=c.n_valid + 1,
                )

            final = jax.lax.while_loop(cond, body, carry)
            return final.tokens, final.cur_len

        return generate


def _bucket(p: int) -> int:
    """Smallest power-of-two >= p (min 64)."""
    b = 64
    while b < p:
        b *= 2
    return b
