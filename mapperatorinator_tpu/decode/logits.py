"""Logit processors as pure jnp functions, HF-semantics-exact.

Replicates the reference's processor stack and ordering (reference:
``osuT5/osuT5/inference/server.py:105-134``, ``logit_processors.py:36-183``,
HF ``GenerationMixin._get_logits_processor`` merge rule: custom processors
first, then top-k/top-p warpers):

    CFG -> MonotonicTimeShift -> TimeshiftBias -> (Conditional)Temperature
        -> LookbackBias -> TopK -> TopP

Each processor is a jit-compatible ``(state, ids_info, scores) -> (state,
scores)`` transform over the *decode-loop carry*; instead of re-scanning the
full ``input_ids`` every step (the reference's O(T) per step), monotonic
state (last time-shift value, last token) is threaded through the loop carry
— O(1) per step, same results.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..osu.events import EventType
from ..osu.streams import TIMED_EVENTS
from ..osu.vocab import MILLISECONDS_PER_STEP, Vocabulary

NEG_INF = jnp.finfo(jnp.float32).min


class LogitsState(NamedTuple):
    """Per-sequence state threaded through the decode loop."""

    last_time_shift: jnp.ndarray  # (B,) int32: last emitted time-shift value, -1 if none
    last_token: jnp.ndarray  # (B,) int32: previous sampled token, -1 at start
    last_scores: jnp.ndarray  # (B, V) float32: previous step's pre-warp scores


@dataclasses.dataclass(frozen=True)
class LogitsPipeline:
    """Static configuration for the processor chain."""

    vocab_size: int
    time_start: int
    time_end: int  # exclusive
    sos_ids: tuple[int, ...]
    eos_ids: tuple[int, ...]  # base eos + context eos
    cfg_scale: float = 1.0
    timeshift_bias: float = 0.0
    temperature: float = 1.0
    # conditional temperatures, types_first only
    types_first: bool = False
    timing_temperature: float = 1.0
    mania_column_temperature: float = 1.0
    taiko_hit_temperature: float = 1.0
    beat_type_tokens: tuple[int, ...] = ()
    mania_type_tokens: tuple[int, ...] = ()
    scroll_speed_tokens: tuple[int, ...] = ()
    # lookback bias
    lookback_max_time: float = 0.0
    timed_token_mask: Optional[tuple] = None  # tuple of vocab-size bools
    top_k: int = 0
    top_p: float = 1.0
    do_sample: bool = True

    def init_state(self, batch: int) -> LogitsState:
        return LogitsState(
            last_time_shift=jnp.full((batch,), -1, jnp.int32),
            last_token=jnp.full((batch,), -1, jnp.int32),
            last_scores=jnp.zeros((batch, self.vocab_size), jnp.float32),
        )

    # -- the chain ------------------------------------------------------------

    def __call__(self, state: LogitsState, scores: jnp.ndarray) -> tuple[LogitsState, jnp.ndarray]:
        """scores: (B, V) fp32 raw logits (CFG already folded by the engine if
        enabled). Returns (new_state, processed_scores). State update for
        last_token/last_time_shift happens in ``update_state`` after sampling."""
        raw = scores

        scores = self._monotonic_time_shift(state, scores)
        if self.timeshift_bias != 0.0:
            scores = scores.at[:, self.time_start : self.time_end].add(self.timeshift_bias)
        scores = self._temperature(state, scores)
        if self.lookback_max_time > 0:
            scores, state = self._lookback_bias(state, scores, raw)
        else:
            state = state._replace(last_scores=raw)
        if self.do_sample:
            if self.top_k > 0:
                scores = top_k_filter(scores, self.top_k)
            if self.top_p < 1.0:
                scores = top_p_filter(scores, self.top_p)
        return state, scores

    def update_state(self, state: LogitsState, token: jnp.ndarray) -> LogitsState:
        """Fold the sampled token into the carry (token: (B,) int32)."""
        is_ts = (token >= self.time_start) & (token < self.time_end)
        is_sos = jnp.zeros_like(is_ts)
        for sid in self.sos_ids:
            is_sos = is_sos | (token == sid)
        new_last_ts = jnp.where(is_ts, token - self.time_start, state.last_time_shift)
        # SOS resets monotonicity (reference: logit_processors.py:170)
        new_last_ts = jnp.where(is_sos, -1, new_last_ts)
        return state._replace(last_time_shift=new_last_ts.astype(jnp.int32), last_token=token.astype(jnp.int32))

    # -- individual processors -----------------------------------------------------

    def _monotonic_time_shift(self, state: LogitsState, scores: jnp.ndarray) -> jnp.ndarray:
        """Mask time shifts earlier than the last emitted one
        (reference: logit_processors.py:136-183)."""
        apply = state.last_time_shift >= 0  # (B,)
        ts_vocab = jnp.arange(self.time_start, self.time_end)
        invalid = ts_vocab[None, :] < (self.time_start + state.last_time_shift)[:, None]
        invalid = invalid & apply[:, None]
        mask = jnp.zeros(scores.shape, bool).at[:, self.time_start : self.time_end].set(invalid)
        return jnp.where(mask, -jnp.inf, scores)

    def _temperature(self, state: LogitsState, scores: jnp.ndarray) -> jnp.ndarray:
        if not self.types_first:
            return scores / self.temperature
        # conditional temperature keyed on the previous token
        # (reference: logit_processors.py:47-82 — reads input_ids[0], i.e. the
        # first batch row decides for the whole batch; replicated)
        temp = jnp.asarray(self.temperature, jnp.float32)
        prev = state.last_token[0]
        for t, tokens, _offset in self._conditionals():
            hit = jnp.zeros((), bool)
            for tok in tokens:
                hit = hit | (prev == tok)
            temp = jnp.where(hit, t, temp)
        return scores / temp

    def _conditionals(self):
        # order matters: first hit wins in the reference, so apply in reverse
        # (later where() must not overwrite an earlier hit). The reference
        # returns on the first matching conditional; emulate by reversing.
        conds = []
        if self.timing_temperature != self.temperature and self.beat_type_tokens:
            conds.append((self.timing_temperature, self.beat_type_tokens, 1))
        if self.mania_column_temperature != self.temperature and self.mania_type_tokens:
            conds.append((self.mania_column_temperature, self.mania_type_tokens, 3))
        if self.taiko_hit_temperature != self.temperature and self.scroll_speed_tokens:
            conds.append((self.taiko_hit_temperature, self.scroll_speed_tokens, 1))
        return reversed(conds)

    def _lookback_bias(
        self, state: LogitsState, scores: jnp.ndarray, raw: jnp.ndarray
    ) -> tuple[jnp.ndarray, LogitsState]:
        """Renormalize lookback-window token mass into EOS
        (reference: logit_processors.py:85-133)."""
        lb_start = self.time_start
        lb_end = self.time_start + int(self.lookback_max_time / MILLISECONDS_PER_STEP)
        lb_mask = jnp.zeros((self.vocab_size,), bool).at[lb_start:lb_end].set(True)

        if not self.types_first:
            out = jnp.where(lb_mask[None, :], -jnp.inf, scores)
            return out, state._replace(last_scores=raw)

        timed = jnp.asarray(self.timed_token_mask, bool)
        last_timed = timed[jnp.clip(state.last_token, 0, self.vocab_size - 1)] & (state.last_token >= 0)

        last_probs = jax.nn.softmax(state.last_scores, axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        eos_mask = jnp.zeros((self.vocab_size,), bool)
        for e in self.eos_ids:
            eos_mask = eos_mask.at[e].set(True)
        prob_eos = (last_probs * eos_mask[None, :]).sum(-1)
        prob_event = 1 - prob_eos
        other = ~lb_mask
        s = 1 / ((probs * other[None, :]).sum(-1) * prob_event + prob_eos)
        probs = jnp.where(lb_mask[None, :], 0.0, probs)
        probs = jnp.where(other[None, :], probs * s[:, None], probs)
        prob_eos_extra = jnp.clip((s - 1) * prob_eos / prob_event, 0, 1)
        probs = probs.at[:, lb_start].set(prob_eos_extra)
        processed = jnp.where(last_timed[:, None], jnp.log(probs), scores)
        return processed, state._replace(last_scores=raw)


def top_k_filter(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    kth = jax.lax.top_k(scores, k)[0][:, -1:]
    return jnp.where(scores < kth, -jnp.inf, scores)


def top_p_filter(scores: jnp.ndarray, top_p: float, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """HF TopPLogitsWarper-exact: sort ascending, cumulative softmax, remove
    tokens with cumulative probability <= 1 - top_p."""
    sorted_logits = jnp.sort(scores, axis=-1)  # ascending
    cumulative = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    sorted_remove = cumulative <= (1 - top_p)
    if min_tokens_to_keep > 0:
        sorted_remove = sorted_remove.at[:, -min_tokens_to_keep:].set(False)
    # map back through the sort: a score is removed if it's below the cutoff
    # value (the smallest kept logit)
    keep_from = jnp.sum(sorted_remove, axis=-1, keepdims=True)  # index of first kept
    cutoff = jnp.take_along_axis(sorted_logits, keep_from, axis=-1)
    return jnp.where(scores < cutoff, -jnp.inf, scores)


def build_logits_pipeline(
    vocab: Vocabulary,
    *,
    cfg_scale: float = 1.0,
    timeshift_bias: float = 0.0,
    temperature: float = 1.0,
    timing_temperature: Optional[float] = None,
    mania_column_temperature: Optional[float] = None,
    taiko_hit_temperature: Optional[float] = None,
    types_first: bool = False,
    lookback_max_time: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    do_sample: bool = True,
) -> LogitsPipeline:
    """Assemble the pipeline from a Vocabulary (reference: server.py:105-134)."""
    ts_start = vocab.event_start[EventType.TIME_SHIFT]
    ts_end = vocab.event_end[EventType.TIME_SHIFT]

    beat_tokens = [vocab.event_start[EventType.BEAT], vocab.event_start[EventType.MEASURE]]
    if EventType.TIMING_POINT in vocab.event_start:
        beat_tokens.append(vocab.event_start[EventType.TIMING_POINT])

    mania_tokens = (
        [
            vocab.event_start[EventType.CIRCLE],
            vocab.event_start[EventType.HOLD_NOTE],
            vocab.event_start[EventType.HOLD_NOTE_END],
        ]
        if EventType.HOLD_NOTE_END in vocab.event_start
        else []
    )
    scroll_tokens = (
        list(range(vocab.event_start[EventType.SCROLL_SPEED], vocab.event_end[EventType.SCROLL_SPEED]))
        if EventType.SCROLL_SPEED in vocab.event_start
        else []
    )

    timed_mask = [False] * vocab.vocab_size_out
    for event_type in TIMED_EVENTS:
        if event_type in vocab.event_start:
            for tid in range(vocab.event_start[event_type], min(vocab.event_end[event_type], vocab.vocab_size_out)):
                timed_mask[tid] = True

    return LogitsPipeline(
        vocab_size=vocab.vocab_size_out,
        time_start=ts_start,
        time_end=ts_end,
        sos_ids=tuple([vocab.sos_id] + list(vocab.context_sos.values())),
        eos_ids=tuple([vocab.eos_id] + list(vocab.context_eos.values())),
        cfg_scale=cfg_scale,
        timeshift_bias=timeshift_bias,
        temperature=temperature,
        types_first=types_first,
        timing_temperature=timing_temperature if timing_temperature is not None else temperature,
        mania_column_temperature=mania_column_temperature if mania_column_temperature is not None else temperature,
        taiko_hit_temperature=taiko_hit_temperature if taiko_hit_temperature is not None else temperature,
        beat_type_tokens=tuple(beat_tokens),
        mania_type_tokens=tuple(mania_tokens),
        scroll_speed_tokens=tuple(scroll_tokens),
        lookback_max_time=lookback_max_time,
        timed_token_mask=tuple(timed_mask),
        top_k=top_k,
        top_p=top_p,
        do_sample=do_sample,
    )


def get_eos_token_ids(
    vocab: Vocabulary,
    lookback_time: float = 0,
    lookahead_time: float = 0,
    context_type=None,
) -> list[int]:
    """Multi-EOS set incl. window-edge time shifts (reference: server.py:72-80)."""
    eos = [vocab.eos_id]
    if context_type is not None and context_type in vocab.context_eos:
        eos.append(vocab.context_eos[context_type])
    ts_start = vocab.event_start[EventType.TIME_SHIFT]
    ts_end = vocab.event_end[EventType.TIME_SHIFT]
    if lookback_time > 0:
        eos.extend(range(ts_start, ts_start + int(lookback_time / MILLISECONDS_PER_STEP)))
    if lookahead_time > 0:
        eos.extend(range(ts_end - int(lookahead_time / MILLISECONDS_PER_STEP), ts_end))
    return eos
