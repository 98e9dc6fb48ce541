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

Compilation strategy: generation is split into a small per-prompt-bucket
prefill program (right-pads the prompt chunk to a power-of-two, writes its
KV into a fixed ``max_length`` buffer) and ONE expensive while-loop program
per (B, max_length, pipeline, cfg) that starts at the dynamic prompt
length — so serving never re-traces the decode loop when a new prompt
length shows up.

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
        """Conditioned encoder forward; one compiled program per cond-key set.
        The batch dim is bucketed (power of two, padded rows sliced off) so
        windowed passes with varying window counts reuse compiled programs."""
        cond = cond or {}
        frames = np.asarray(frames)
        B = frames.shape[0]
        Bb = _row_bucket(B)
        if Bb != B:
            frames = np.concatenate([frames, np.repeat(frames[-1:], Bb - B, axis=0)], axis=0)
            cond = {
                k: np.concatenate([v, np.repeat(np.asarray(v)[-1:], Bb - B, axis=0)], axis=0)
                for k, v in cond.items()
            }
        key = ("encode", tuple(sorted(cond)), frames.shape)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            model = self.model

            @jax.jit
            def fn(params, frames, cond):
                return model.apply(params, frames, method=type(model).encode, **cond)

            self._generate_fn_cache[key] = fn
        out = fn(self.params, jnp.asarray(frames), {k: jnp.asarray(v) for k, v in cond.items()})
        return out[:B] if Bb != B else out

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

        # Two-stage compile split. The prompt chunk is RIGHT-padded to a
        # power-of-two bucket and prefilled into a fixed ``max_length`` token
        # buffer by a small pipeline-independent program keyed by (B, P);
        # generation then continues at the dynamic offset ``P_orig`` inside
        # ONE expensive while-loop program keyed only by
        # (B, max_length, pipeline, cfg). Bucket right-pads write garbage KV
        # that is masked out of attention and overwritten by generated
        # tokens, so outputs are bucket-invariant; a new prompt bucket costs
        # a ~seconds prefill compile instead of re-tracing the decode loop
        # (measured 22-32 s per bucket — two in-run misses once cost a
        # 3-minute-song e2e run 55 of its 84 seconds).
        P = min(_bucket(P_orig), max_length)
        if P != P_orig:
            pad = P - P_orig
            decoder_input_ids = np.pad(decoder_input_ids, ((0, 0), (0, pad)), constant_values=self.pad_token_id)
            decoder_attention_mask = np.pad(decoder_attention_mask, ((0, 0), (0, pad)), constant_values=False)

        eos_mask = np.zeros(pipeline.vocab_size, bool)
        for e in eos_ids:
            eos_mask[e] = True

        prefill = self._get_prefill_fn(B, P, max_length)
        cache, tokens, attn, n_valid = prefill(
            self.params,
            encoder_states,
            jnp.asarray(decoder_input_ids, jnp.int32),
            jnp.asarray(decoder_attention_mask, bool),
        )

        key = ("loop", B, max_length, pipeline, cfg_scale)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            fn = self._build_loop_fn(B, max_length, pipeline, cfg_scale)
            self._generate_fn_cache[key] = fn

        tokens, lengths = fn(
            self.params,
            cache,
            tokens,
            attn,
            n_valid,
            jnp.asarray(P_orig, jnp.int32),
            jnp.asarray(eos_mask),
            jax.random.PRNGKey(seed),
        )
        return np.asarray(tokens), np.asarray(lengths)

    def precompile(
        self,
        encoder_states,
        max_length: Optional[int] = None,
        max_prompt: Optional[int] = None,
    ) -> None:
        """Compile every prompt-bucket prefill program for the batch shape of
        ``encoder_states`` ahead of time (serving warmup). The decode loop
        itself still compiles on the first :meth:`generate` call per
        (pipeline, cfg) — callers warm that with one real request; this
        covers the long tail of prompt lengths such a request cannot reach."""
        max_length = max_length or self.max_length
        limit = min(max_prompt or max_length, max_length)
        enc = jnp.asarray(encoder_states)
        B = enc.shape[0]
        p = 64
        while True:
            P = min(p, limit)
            fn = self._get_prefill_fn(B, P, max_length)
            ids = jnp.full((B, P), self.pad_token_id, jnp.int32)
            mask = jnp.zeros((B, P), bool).at[:, 0].set(True)
            jax.block_until_ready(fn(self.params, enc, ids, mask))
            if p >= limit:
                break
            p *= 2

    def _get_prefill_fn(self, B: int, P: int, max_length: int):
        key = ("prefill", B, P, max_length)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            fn = self._build_prefill_fn(B, P, max_length)
            self._generate_fn_cache[key] = fn
        return fn

    def generate_beams(
        self,
        encoder_states: jnp.ndarray,
        decoder_input_ids: np.ndarray,
        pipeline: LogitsPipeline,
        eos_ids: list[int],
        num_beams: int,
        decoder_attention_mask: Optional[np.ndarray] = None,
        max_length: Optional[int] = None,
        length_penalty: float = 1.0,
        seed: int = 0,
        cfg_scale: float = 1.0,
    ) -> np.ndarray:
        """HF-style beam search (num_beams > 1; reference uses GenerationMixin
        beam search / beam sample for the super-timing generator when
        timer_num_beams > 1). With a sampling pipeline the 2N candidates are
        drawn without replacement via gumbel-top-k on the processed scores
        (distributionally HF's multinomial draw). With cfg_scale > 1 the
        caller passes the folded dual batch [negative; positive] (rows 2B)
        and guidance is applied before beam selection, matching the
        reference's CFG-processor-first ordering (server.py:105-108).
        Returns (B, max_length) right-padded best hypotheses."""
        max_length = max_length or self.max_length
        use_cfg = cfg_scale > 1.0
        B_rows, P_orig = decoder_input_ids.shape
        B = B_rows // 2 if use_cfg else B_rows
        assert not use_cfg or B_rows % 2 == 0, "CFG fold needs an even row count"
        assert P_orig < max_length

        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id
        P = _bucket(P_orig)
        if P != P_orig:
            pad = P - P_orig
            decoder_input_ids = np.pad(decoder_input_ids, ((0, 0), (pad, 0)), constant_values=self.pad_token_id)
            decoder_attention_mask = np.pad(decoder_attention_mask, ((0, 0), (pad, 0)), constant_values=False)
        gen_limit = max_length - P_orig

        eos_mask = np.zeros(pipeline.vocab_size, bool)
        for e in eos_ids:
            eos_mask[e] = True

        key = ("beams", B, P, max_length, pipeline, num_beams, length_penalty, cfg_scale)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            fn = self._build_beam_fn(B, P, max_length, pipeline, num_beams, length_penalty, cfg_scale)
            self._generate_fn_cache[key] = fn

        tokens, lengths = fn(
            self.params,
            jnp.asarray(encoder_states),
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
        With cfg_scale > 1 the batch is [neg; pos] and B halves on return.

        Shapes are bucketed so windowed analysis passes (ai_mod / server
        forward) reuse a handful of compiled programs: T right-pads to a
        power of two (masked trailing pads — position-safe under causal
        self-attention) and rows pad per CFG half (padded rows discarded)."""
        B, T = decoder_input_ids.shape
        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id
        ids = np.asarray(decoder_input_ids, np.int32)
        mask = np.asarray(decoder_attention_mask, bool)
        enc = jnp.asarray(encoder_states)  # stays on device

        Tb = _bucket(T)
        # never pad past the model's position table
        limit = getattr(self.model.config, "max_target_positions", None)
        if limit is not None and Tb > limit:
            Tb = limit if limit >= T else T
        if Tb != T:
            ids = np.pad(ids, ((0, 0), (0, Tb - T)), constant_values=self.pad_token_id)
            mask = np.pad(mask, ((0, 0), (0, Tb - T)), constant_values=False)

        use_cfg = cfg_scale > 1.0
        halves = 2 if use_cfg else 1
        H = B // halves
        Hb = _row_bucket(H)
        if Hb != H:
            def pad_rows(x, xp):
                parts = xp.split(x, halves, axis=0)
                return xp.concatenate(
                    [xp.concatenate([p, xp.repeat(p[-1:], Hb - H, axis=0)], axis=0) for p in parts],
                    axis=0,
                )

            ids, mask = pad_rows(ids, np), pad_rows(mask, np)
            enc = pad_rows(enc, jnp)

        key = ("forward", ids.shape, enc.shape)
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
        logits = np.asarray(fn(self.params, jnp.asarray(enc), jnp.asarray(ids), jnp.asarray(mask)))
        if use_cfg:
            neg, pos = logits[:Hb][:H], logits[Hb:][:H]
            logits = pos + (neg - pos) * cfg_scale
        else:
            logits = logits[:H]
        return logits[:, :T]

    def forward_stats(
        self,
        encoder_states,
        decoder_input_ids: np.ndarray,
        decoder_attention_mask: Optional[np.ndarray] = None,
        cfg_scale: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Teacher-forced per-position analysis stats, reduced ON DEVICE:
        returns ``(surprisal_bits, entropy_bits, argmax_ids)``, each (B, T).

        Numerically identical to softmaxing :meth:`forward`'s logits on the
        host (same CFG fold first, same ``+1e-10`` guards, base-2), but the
        device->host transfer drops from the (B, T, V) fp32 logits to three
        (B, T) arrays — on a tunneled chip that transfer dominated the whole
        MaiMod analysis pass (measured 41 s of a 41.4 s warm 60-s-song
        ai_mod; reference behavior: server.py:160-181 + processor.py:519-529).
        ``surprisal_bits[p]`` scores the NEXT prompt token (``ids[p+1]``) —
        exactly the token the ai_mod event loop pairs with row ``p``."""
        B, T = decoder_input_ids.shape
        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id
        ids = np.asarray(decoder_input_ids, np.int32)
        mask = np.asarray(decoder_attention_mask, bool)
        enc = jnp.asarray(encoder_states)

        Tb = _bucket(T)
        limit = getattr(self.model.config, "max_target_positions", None)
        if limit is not None and Tb > limit:
            Tb = limit if limit >= T else T
        if Tb != T:
            ids = np.pad(ids, ((0, 0), (0, Tb - T)), constant_values=self.pad_token_id)
            mask = np.pad(mask, ((0, 0), (0, Tb - T)), constant_values=False)

        use_cfg = cfg_scale > 1.0
        halves = 2 if use_cfg else 1
        H = B // halves
        Hb = _row_bucket(H)
        if Hb != H:
            def pad_rows(x, xp):
                parts = xp.split(x, halves, axis=0)
                return xp.concatenate(
                    [xp.concatenate([p, xp.repeat(p[-1:], Hb - H, axis=0)], axis=0) for p in parts],
                    axis=0,
                )

            ids, mask = pad_rows(ids, np), pad_rows(mask, np)
            enc = pad_rows(enc, jnp)

        key = ("forward_stats", ids.shape, enc.shape, cfg_scale)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            model = self.model
            pad_id = self.pad_token_id
            ln2 = float(np.log(2.0))

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
                logits = logits.astype(jnp.float32)
                ids_pos = ids
                if use_cfg:
                    neg, pos = jnp.split(logits, 2, axis=0)
                    logits = pos + (neg - pos) * cfg_scale
                    # rows are [negative; positive]: score the positive
                    # (conditioned) prompt's tokens
                    ids_pos = jnp.split(ids, 2, axis=0)[1]
                probs = jax.nn.softmax(logits, axis=-1)
                entropy = -jnp.sum(probs * jnp.log2(probs + 1e-10), axis=-1)
                targets = jnp.concatenate(
                    [ids_pos[:, 1:], jnp.full((logits.shape[0], 1), pad_id, jnp.int32)], axis=1
                )
                p_target = jnp.take_along_axis(probs, targets[..., None], axis=-1)[..., 0]
                surprisal = -jnp.log(p_target + 1e-10) / ln2
                return surprisal, entropy, jnp.argmax(logits, axis=-1).astype(jnp.int32)

            self._generate_fn_cache[key] = fn
        surprisal, entropy, argmax = fn(self.params, enc, jnp.asarray(ids), jnp.asarray(mask))
        out = []
        for arr in (surprisal, entropy, argmax):
            arr = np.asarray(arr)
            out.append(arr[:H, :T])
        return tuple(out)

    def generate_forced(
        self,
        encoder_states,
        decoder_input_ids: np.ndarray,
        pipeline: LogitsPipeline,
        forced_tokens: np.ndarray,
        decoder_attention_mask: Optional[np.ndarray] = None,
        cfg_scale: float = 1.0,
    ) -> np.ndarray:
        """Forced-decode parity mode: run the SAME incremental path as
        :meth:`generate` (prefill + per-step ``decode_step`` + the full logits
        pipeline with carried state), but take each step's token from
        ``forced_tokens`` instead of the sampler, and return the fp32
        processed scores ``(B, T, V)`` the sampler would have drawn from.

        This is the test-only HF-sampling-order mode (SURVEY.md §7 hard part
        1): exact torch-RNG equality is impossible cross-framework, but
        drawing ``torch.multinomial`` from these scores in HF's order must
        reproduce HF generate's sampled tokens exactly, which pins the whole
        sampled path (KV cache evolution included) at the multinomial input.

        With ``cfg_scale > 1`` rows are the folded dual batch [negative;
        positive] and ``forced_tokens`` has ``B // 2`` rows (both halves are
        fed the same token, like sampling).
        """
        forced = np.asarray(forced_tokens, np.int32)
        B, P = decoder_input_ids.shape
        T = forced.shape[1]
        use_cfg = cfg_scale > 1.0
        if decoder_attention_mask is None:
            decoder_attention_mask = decoder_input_ids != self.pad_token_id

        key = ("forced", B, P, T, pipeline, cfg_scale)
        fn = self._generate_fn_cache.get(key)
        if fn is None:
            fn = self._build_forced_fn(B, P, T, pipeline, cfg_scale)
            self._generate_fn_cache[key] = fn
        scores = fn(
            self.params,
            jnp.asarray(encoder_states),
            jnp.asarray(decoder_input_ids, jnp.int32),
            jnp.asarray(decoder_attention_mask, bool),
            jnp.asarray(forced),
        )
        return np.asarray(scores)

    # -- compiled internals -------------------------------------------------------

    def _build_forced_fn(self, B: int, P: int, T: int, pipeline: LogitsPipeline, cfg_scale: float):
        model = self.model
        pad_id = self.pad_token_id
        use_cfg = cfg_scale > 1.0
        half = B // 2 if use_cfg else B
        buffer_len = P + T

        def apply(params, method, *args, **kw):
            return model.apply(params, *args, method=getattr(type(model), method), **kw)

        @jax.jit
        def forced_fn(params, encoder_states, prompt_ids, prompt_mask, forced):
            cache = apply(params, "init_cache", B, buffer_len, encoder_states)
            tokens = jnp.full((B, buffer_len), pad_id, jnp.int32).at[:, :P].set(prompt_ids)
            attn = jnp.zeros((B, buffer_len), bool).at[:, :P].set(prompt_mask)
            prompt_positions = jnp.clip(jnp.cumsum(prompt_mask, axis=1) - 1, 0)
            n_valid = prompt_mask.sum(axis=1).astype(jnp.int32)
            k_positions = jnp.maximum(
                jnp.arange(buffer_len)[None, :] - (P - n_valid)[:, None], 0
            )

            prompt_embeds = apply(params, "embed_tokens", prompt_ids)
            logits, cache = apply(
                params, "decode_step", prompt_embeds, cache, 0,
                self_mask=attn[:, None, None, :], positions=prompt_positions,
                k_positions=k_positions,
            )
            last_logits = logits[:, -1].astype(jnp.float32)
            lstate = pipeline.init_state(half)

            def body(carry, forced_t):
                cache, attn, tokens, cur_len, n_valid, lstate, last_logits = carry
                if use_cfg:
                    neg, pos = last_logits[:half], last_logits[half:]
                    scores_in = pos + (neg - pos) * cfg_scale
                else:
                    scores_in = last_logits
                lstate, scores = pipeline(lstate, scores_in)
                lstate = pipeline.update_state(lstate, forced_t)
                written = jnp.concatenate([forced_t, forced_t]) if use_cfg else forced_t
                tokens = jax.lax.dynamic_update_slice(tokens, written[:, None], (0, cur_len))
                attn = jax.lax.dynamic_update_slice(attn, jnp.ones((B, 1), bool), (0, cur_len))
                last_embeds = apply(params, "embed_tokens", written[:, None])
                logits, cache = apply(
                    params, "decode_step", last_embeds, cache, cur_len,
                    self_mask=attn[:, None, None, :], positions=n_valid[:, None],
                    k_positions=k_positions,
                )
                carry = (cache, attn, tokens, cur_len + 1, n_valid + 1, lstate,
                         logits[:, -1].astype(jnp.float32))
                return carry, scores

            carry = (cache, attn, tokens, jnp.asarray(P, jnp.int32), n_valid, lstate, last_logits)
            _, scores = jax.lax.scan(body, carry, forced.T)  # (T, half, V)
            return jnp.transpose(scores, (1, 0, 2))

        return forced_fn

    def _build_beam_fn(self, B: int, P: int, max_length: int, pipeline: LogitsPipeline,
                       N: int, length_penalty: float, cfg_scale: float = 1.0):
        """Beam search as one jitted while_loop: top-2N candidate expansion,
        EOS candidates retire into a per-batch top-N finished set, live beams
        reorder the KV cache and processor state by gather. With CFG the row
        layout is [negative(BN); positive(BN)]: guidance folds the halves
        before selection and every beam reorder gathers both halves with the
        same indices."""
        model = self.model
        pad_id = self.pad_token_id
        BN = B * N
        use_cfg = cfg_scale > 1.0
        R = 2 * BN if use_cfg else BN  # model-facing row count
        NEG = jnp.float32(-1e9)

        def apply(params, method, *args, **kw):
            return model.apply(params, *args, method=getattr(type(model), method), **kw)

        buffer_len = P + max_length

        def expand(x):
            # (B|2B, ...) -> (BN|2BN, ...), repeating each row N times per half
            if use_cfg:
                neg, pos = jnp.split(x, 2, axis=0)
                return jnp.concatenate([jnp.repeat(neg, N, axis=0), jnp.repeat(pos, N, axis=0)], axis=0)
            return jnp.repeat(x, N, axis=0)

        def fold(step_logits):
            # (R, V) model logits -> (BN, V) scores. HF's beam paths apply
            # log_softmax to the raw logits BEFORE the processor chain and
            # never renormalize afterwards (GenerationMixin._beam_search);
            # CFG then folds the log-softmaxed halves.
            logp = jax.nn.log_softmax(step_logits, axis=-1)
            if use_cfg:
                neg, pos = jnp.split(logp, 2, axis=0)
                return pos + (neg - pos) * cfg_scale
            return logp

        def both_halves(idx):
            # beam-reorder gather indices for the full row set
            if use_cfg:
                return jnp.concatenate([idx, idx + BN], axis=0)
            return idx

        @jax.jit
        def generate(params, encoder_states, prompt_ids, prompt_mask, eos_mask, gen_limit, rng):
            enc = expand(encoder_states)
            prompt_ids_bn = expand(prompt_ids)
            prompt_mask_bn = expand(prompt_mask)

            cache = apply(params, "init_cache", R, buffer_len, enc)
            tokens = jnp.full((R, buffer_len), pad_id, jnp.int32).at[:, :P].set(prompt_ids_bn)
            attn = jnp.zeros((R, buffer_len), bool).at[:, :P].set(prompt_mask_bn)
            prompt_positions = jnp.clip(jnp.cumsum(prompt_mask_bn, axis=1) - 1, 0)
            n_valid = prompt_mask_bn.sum(axis=1).astype(jnp.int32)
            # logical position of every cache slot (left pads clamp to 0;
            # they are masked anyway) — consumed by t5_relpos bias
            k_positions = jnp.maximum(
                jnp.arange(buffer_len)[None, :] - (P - n_valid)[:, None], 0
            )

            prompt_embeds = apply(params, "embed_tokens", prompt_ids_bn)
            logits, cache = apply(
                params, "decode_step", prompt_embeds, cache, 0,
                self_mask=attn[:, None, None, :], positions=prompt_positions,
                k_positions=k_positions,
            )
            last_logits = fold(logits[:, -1].astype(jnp.float32))

            lstate = pipeline.init_state(BN)
            beam_scores = jnp.full((B, N), NEG).at[:, 0].set(0.0)
            fin_scores = jnp.full((B, N), NEG)
            fin_tokens = jnp.full((B, N, buffer_len), pad_id, jnp.int32)
            fin_lengths = jnp.zeros((B, N), jnp.int32)

            vocab = pipeline.vocab_size

            def step(carry: BeamCarry, step_logits):
                cur_len = carry.cur_len
                # HF normalizes by the hypothesis length EXCLUDING the EOS
                # token being emitted (BeamHypotheses.add)
                gen_len = jnp.maximum((cur_len - P).astype(jnp.float32), 1.0)

                # step_logits are already log-softmaxed (see fold); the
                # processor chain runs on log-probs, matching HF beam order
                lstate2, logp = pipeline(carry.logits_state, step_logits)
                cand = carry.beam_scores[:, :, None] + logp.reshape(B, N, vocab)
                cand = cand.reshape(B, N * vocab)
                rng2 = carry.rng
                if pipeline.do_sample:
                    # beam sample: 2N draws without replacement from
                    # softmax(cand) == gumbel-top-2N on cand; accumulated
                    # scores stay un-noised
                    rng2, sub = jax.random.split(rng2)
                    gumbel = jax.random.gumbel(sub, cand.shape, cand.dtype)
                    _, top_idx = jax.lax.top_k(cand + gumbel, 2 * N)
                    top_vals = jnp.take_along_axis(cand, top_idx, axis=1)
                else:
                    top_vals, top_idx = jax.lax.top_k(cand, 2 * N)  # (B, 2N)
                beam_idx = top_idx // vocab
                token_ids = (top_idx % vocab).astype(jnp.int32)
                is_eos = eos_mask[jnp.clip(token_ids, 0, eos_mask.shape[0] - 1)]

                # --- retire EOS candidates into the finished set -------------
                cand_norm = top_vals / gen_len**length_penalty
                cand_fin_scores = jnp.where(is_eos, cand_norm, NEG)  # (B, 2N)
                pos_tokens = carry.tokens[BN:] if use_cfg else carry.tokens
                flat_src = pos_tokens.reshape(B, N, buffer_len)
                cand_rows = jnp.take_along_axis(flat_src, beam_idx[:, :, None], axis=1)  # (B,2N,L)
                cand_rows = jax.vmap(
                    lambda rows, toks: jax.vmap(
                        lambda row, tok: jax.lax.dynamic_update_slice(row, tok[None], (cur_len,))
                    )(rows, toks)
                )(cand_rows, token_ids)
                nv = (carry.n_valid[BN:] if use_cfg else carry.n_valid).reshape(B, N)
                cand_lengths = jnp.take_along_axis(nv, beam_idx, axis=1) + 1

                all_scores = jnp.concatenate([carry.fin_scores, cand_fin_scores], axis=1)  # (B,3N)
                all_tokens = jnp.concatenate([carry.fin_tokens, cand_rows], axis=1)
                all_lengths = jnp.concatenate([carry.fin_lengths, cand_lengths], axis=1)
                keep_vals, keep_idx = jax.lax.top_k(all_scores, N)
                fin_tokens2 = jnp.take_along_axis(all_tokens, keep_idx[:, :, None], axis=1)
                fin_lengths2 = jnp.take_along_axis(all_lengths, keep_idx, axis=1)

                # --- select the N best non-EOS candidates as live beams ------
                live_vals = jnp.where(is_eos, NEG, top_vals)
                sel_vals, sel = jax.lax.top_k(live_vals, N)  # (B, N) indices into 2N
                sel_beam = jnp.take_along_axis(beam_idx, sel, axis=1)  # (B, N)
                sel_tok = jnp.take_along_axis(token_ids, sel, axis=1)
                global_idx = (jnp.arange(B)[:, None] * N + sel_beam).reshape(BN)
                row_idx = both_halves(global_idx)

                tokens2 = carry.tokens[row_idx]
                sel_rows = jnp.tile(sel_tok.reshape(BN, 1), (2, 1)) if use_cfg else sel_tok.reshape(BN, 1)
                tokens2 = jax.lax.dynamic_update_slice(tokens2, sel_rows, (0, cur_len))
                attn2 = carry.attention_mask[row_idx]
                attn2 = jax.lax.dynamic_update_slice(attn2, jnp.ones((R, 1), bool), (0, cur_len))
                n_valid2 = carry.n_valid[row_idx] + 1
                # KV-cache reorder quirk: the reference reorders BOTH halves
                # with beam_idx.repeat(2) (cache_utils.py:16-20), i.e. the
                # positive half's cache is re-gathered from NEGATIVE-half
                # rows — from step 2 on, both halves decode over the
                # negative-prompt KV history. Replicated for token parity.
                cache_idx = jnp.concatenate([global_idx, global_idx]) if use_cfg else global_idx
                cache2 = jax.tree.map(lambda x: x[cache_idx], carry.cache)
                lstate3 = jax.tree.map(
                    lambda x: x[global_idx] if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == BN else x,
                    lstate2,
                )
                lstate3 = pipeline.update_state(lstate3, sel_tok.reshape(BN))

                return BeamCarry(
                    tokens=tokens2, attention_mask=attn2, cache=cache2,
                    cur_len=cur_len + 1, n_valid=n_valid2, beam_scores=sel_vals,
                    fin_scores=keep_vals, fin_tokens=fin_tokens2, fin_lengths=fin_lengths2,
                    logits_state=lstate3, rng=rng2,
                )

            carry = BeamCarry(
                tokens=tokens, attention_mask=attn, cache=cache,
                cur_len=jnp.asarray(P, jnp.int32), n_valid=n_valid,
                beam_scores=beam_scores, fin_scores=fin_scores,
                fin_tokens=fin_tokens, fin_lengths=fin_lengths, logits_state=lstate,
                rng=rng,
            )
            carry = step(carry, last_logits)

            def cond(c: BeamCarry):
                gen_len = (c.cur_len - P).astype(jnp.float32)
                # HF early_stopping=False: a batch is done once its worst
                # finished hypothesis beats the best attainable live score
                best_attainable = c.beam_scores.max(axis=1) / jnp.maximum(gen_len, 1.0) ** length_penalty
                done = c.fin_scores.min(axis=1) >= best_attainable
                return (c.cur_len < P + gen_limit) & ~jnp.all(done)

            def body(c: BeamCarry):
                last = jax.lax.dynamic_slice(c.tokens, (0, c.cur_len - 1), (R, 1))
                last_embeds = apply(params, "embed_tokens", last)
                logits, cache2 = apply(
                    params, "decode_step", last_embeds, c.cache, c.cur_len - 1,
                    self_mask=c.attention_mask[:, None, None, :],
                    positions=(c.n_valid - 1)[:, None],
                    k_positions=k_positions,
                )
                return step(c._replace(cache=cache2), fold(logits[:, -1].astype(jnp.float32)))

            final = jax.lax.while_loop(cond, body, carry)

            # finalize: live beams compete with finished hypotheses
            gen_len = (final.cur_len - P).astype(jnp.float32)
            live_norm = final.beam_scores / jnp.maximum(gen_len, 1.0) ** length_penalty
            merged_scores = jnp.concatenate([final.fin_scores, live_norm], axis=1)  # (B, 2N)
            pos_tokens = final.tokens[BN:] if use_cfg else final.tokens
            pos_n_valid = final.n_valid[BN:] if use_cfg else final.n_valid
            merged_tokens = jnp.concatenate(
                [final.fin_tokens, pos_tokens.reshape(B, N, buffer_len)], axis=1
            )
            merged_lengths = jnp.concatenate(
                [final.fin_lengths, pos_n_valid.reshape(B, N)], axis=1
            )
            best = jnp.argmax(merged_scores, axis=1)
            out_tokens = jnp.take_along_axis(merged_tokens, best[:, None, None], axis=1)[:, 0]
            out_lengths = jnp.take_along_axis(merged_lengths, best[:, None], axis=1)[:, 0]
            return out_tokens, out_lengths

        return generate

    def _build_prefill_fn(self, B: int, P: int, max_length: int):
        """Stage 1 of :meth:`generate`: allocate the fixed ``max_length``
        buffers, run one chunked ``decode_step`` over the right-padded prompt
        to populate its KV slots, and return the carry pieces the decode loop
        consumes. Pipeline-independent, so every (pipeline, cfg) combination
        shares these per-prompt-bucket programs."""
        model = self.model
        pad_id = self.pad_token_id

        def apply(params, method, *args, **kw):
            return model.apply(params, *args, method=getattr(type(model), method), **kw)

        @jax.jit
        def prefill(params, encoder_states, prompt_ids, prompt_mask):
            cache = apply(params, "init_cache", B, max_length, encoder_states)
            tokens = jnp.full((B, max_length), pad_id, jnp.int32)
            tokens = tokens.at[:, :P].set(prompt_ids)
            attn = jnp.zeros((B, max_length), bool).at[:, :P].set(prompt_mask)
            # logical positions ignore pads -> bucketing is output-invariant
            prompt_positions = jnp.clip(jnp.cumsum(prompt_mask, axis=1) - 1, 0)
            n_valid = prompt_mask.sum(axis=1).astype(jnp.int32)  # (B,)
            # logical position of every cache slot (pads clamp; they are
            # masked anyway) — consumed by t5_relpos bias
            k_positions = jnp.clip(jnp.cumsum(attn, axis=1) - 1, 0)

            prompt_embeds = apply(params, "embed_tokens", prompt_ids)
            _, cache = apply(
                params, "decode_step", prompt_embeds, cache, 0,
                self_mask=attn[:, None, None, :], positions=prompt_positions,
                k_positions=k_positions,
            )
            return cache, tokens, attn, n_valid

        return prefill

    def _build_loop_fn(self, B: int, max_length: int, pipeline: LogitsPipeline, cfg_scale: float):
        """Stage 2 of :meth:`generate`: the compiled decode while-loop.
        Starts at the DYNAMIC prompt length ``start_len`` — its first
        iteration recomputes the last prompt token's logits (rewriting that
        slot's KV with identical values), so no prompt-shape-dependent state
        crosses the stage boundary and one program serves every prompt
        bucket."""
        model = self.model
        pad_id = self.pad_token_id
        use_cfg = cfg_scale > 1.0

        def apply(params, method, *args, **kw):
            return model.apply(params, *args, method=getattr(type(model), method), **kw)

        buffer_len = max_length

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def generate(params, cache, tokens, attn, n_valid, start_len, eos_mask, rng):
            # logical position of every cache slot: prompt slots keep their
            # pad-free cumsum rank; generated slots (>= start_len) continue
            # from each row's logical length
            prompt_rank = jnp.clip(jnp.cumsum(attn, axis=1) - 1, 0)
            slot = jnp.arange(buffer_len)[None, :]
            k_positions = jnp.where(
                slot < start_len, prompt_rank, n_valid[:, None] + slot - start_len
            )

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

            carry = DecodeCarry(
                tokens=tokens,
                attention_mask=attn,
                cache=cache,
                cur_len=start_len.astype(jnp.int32),
                finished=finished,
                rng=rng,
                logits_state=lstate,
                n_valid=n_valid,
            )

            def cond(c: DecodeCarry):
                return (c.cur_len < buffer_len) & ~jnp.all(c.finished)

            def body(c: DecodeCarry):
                last = jax.lax.dynamic_slice(c.tokens, (0, c.cur_len - 1), (B, 1))
                self_mask = c.attention_mask[:, None, None, :]
                positions = (c.n_valid - 1)[:, None]
                last_embeds = apply(params, "embed_tokens", last)
                logits, cache = apply(
                    params, "decode_step", last_embeds, c.cache, c.cur_len - 1,
                    self_mask=self_mask, positions=positions,
                    k_positions=k_positions,
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


def _row_bucket(n: int) -> int:
    """Smallest power-of-two >= n (min 1) — batch-row bucketing."""
    b = 1
    while b < n:
        b *= 2
    return b


class BeamCarry(NamedTuple):
    tokens: jnp.ndarray  # (B*N, buffer_len) int32 — live beams
    attention_mask: jnp.ndarray  # (B*N, buffer_len)
    cache: Any
    cur_len: jnp.ndarray  # scalar — write position
    n_valid: jnp.ndarray  # (B*N,) logical token counts
    beam_scores: jnp.ndarray  # (B, N) running sum of logprobs
    fin_scores: jnp.ndarray  # (B, N) normalized scores of finished hyps
    fin_tokens: jnp.ndarray  # (B, N, buffer_len)
    fin_lengths: jnp.ndarray  # (B, N)
    logits_state: Any
    rng: jnp.ndarray
