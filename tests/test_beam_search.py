"""Beam-search engine tests: compare the jitted beam decode against a plain
python reference implementation over the same model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.decode import DecodeEngine
from mapperatorinator_tpu.decode.logits import build_logits_pipeline
from mapperatorinator_tpu.models.transformer import OsuTransformer, TransformerConfig
from mapperatorinator_tpu.osu.events import EventRange, EventType
from mapperatorinator_tpu.osu.vocab import Vocabulary


def _tiny_vocab():
    return Vocabulary(
        event_ranges=[
            EventRange(EventType.TIME_SHIFT, 0, 30),
            EventRange(EventType.BEAT, 0, 0),
            EventRange(EventType.MEASURE, 0, 0),
            EventRange(EventType.CIRCLE, 0, 10),
        ],
    )


@pytest.fixture(scope="module")
def setup():
    vocab = _tiny_vocab()
    cfg = TransformerConfig(
        vocab_size=vocab.vocab_size_out, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=128, num_mel_bins=32,
        position_scheme="rope", norm="rms", conv_stem=False,
    )
    model = OsuTransformer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 40, (2, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    engine = DecodeEngine(model, params, max_length=64, pad_token_id=0)
    enc = model.apply(params, feats, method=lambda m, f: m.encoder(f))
    return model, params, engine, enc, vocab


def _reference_beam_search(model, params, enc_row, prompt, num_beams, eos_id, max_length,
                           pipeline, length_penalty=1.0):
    """Plain-python beam search (teacher-forced re-scoring each step) using
    the SAME logits pipeline + state semantics as the engine."""
    beams = [(list(prompt), 0.0, pipeline.init_state(1))]
    finished = []  # (norm_score, tokens)
    P = len(prompt)
    cur_len = P
    while cur_len < max_length:
        candidates = []
        for tokens, score, state in beams:
            ids = jnp.asarray([tokens], jnp.int32)
            logits = model.apply(params, features=None, decoder_input_ids=ids,
                                 encoder_states=enc_row[None])
            # HF beam order: log_softmax the raw logits, THEN the processor
            # chain, with no renormalization (the engine mirrors this)
            step_scores = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
            state2, scores = pipeline(state, step_scores)
            logp = np.asarray(scores)[0]
            for tok in np.argsort(logp)[::-1][: 2 * num_beams]:
                candidates.append((tokens + [int(tok)], score + float(logp[tok]), state2))
        candidates.sort(key=lambda x: x[1], reverse=True)
        candidates = candidates[: 2 * num_beams]
        gen_len = max(cur_len - P, 1)
        new_beams = []
        for tokens, score, state in candidates:
            if tokens[-1] == eos_id:
                finished.append((score / gen_len**length_penalty, tokens))
            elif len(new_beams) < num_beams:
                state = pipeline.update_state(state, jnp.asarray([tokens[-1]], jnp.int32))
                new_beams.append((tokens, score, state))
        beams = new_beams
        cur_len += 1
        if len(finished) >= num_beams:
            worst = sorted(finished, key=lambda x: x[0], reverse=True)[num_beams - 1][0]
            best_live = max(s for _, s, _ in beams) / max(cur_len - P, 1) ** length_penalty
            if worst >= best_live:
                break
    gen_len = max(cur_len - P, 1)
    for tokens, score, _ in beams:
        finished.append((score / gen_len**length_penalty, tokens))
    finished.sort(key=lambda x: x[0], reverse=True)
    return finished[0][1]


@pytest.mark.parametrize("num_beams", [2, 3])
def test_beam_search_matches_reference(setup, num_beams):
    model, params, engine, enc, vocab = setup
    pipeline = build_logits_pipeline(vocab, do_sample=False)
    eos_id = 2
    prompt = np.asarray([[1, 5, 9], [1, 7, 11]], np.int32)

    tokens, lengths = engine.generate_beams(
        enc, prompt, pipeline, [eos_id], num_beams=num_beams, max_length=16
    )
    for b in range(2):
        ref = _reference_beam_search(
            model, params, enc[b], [int(x) for x in prompt[b]], num_beams, eos_id, 16, pipeline
        )
        got = [t for t in tokens[b].tolist() if t != 0][: len(ref)]
        assert got == ref, f"batch {b}: {got} != {ref}"


def test_beam_one_matches_greedy(setup):
    model, params, engine, enc, vocab = setup
    pipeline = build_logits_pipeline(vocab, do_sample=False)
    prompt = np.asarray([[1, 5, 9], [1, 7, 11]], np.int32)
    beam_tokens, _ = engine.generate_beams(enc, prompt, pipeline, [2], num_beams=1, max_length=16)
    greedy_tokens, _ = engine.generate(enc, prompt, pipeline, [2], seed=0, max_length=16)
    gb = [[t for t in row if t != 0] for row in beam_tokens.tolist()]
    gg = [[t for t in row if t != 0] for row in greedy_tokens.tolist()]
    assert gb == gg


def test_beam_sample_runs_and_varies(setup):
    """Sampling pipeline + beams = beam sample: valid output, seed-dependent."""
    model, params, engine, enc, vocab = setup
    pipeline = build_logits_pipeline(vocab, temperature=1.5, do_sample=True)
    prompt = np.asarray([[1, 5, 9], [1, 7, 11]], np.int32)
    t1, _ = engine.generate_beams(enc, prompt, pipeline, [2], num_beams=2, max_length=16, seed=1)
    t2, _ = engine.generate_beams(enc, prompt, pipeline, [2], num_beams=2, max_length=16, seed=2)
    t1b, _ = engine.generate_beams(enc, prompt, pipeline, [2], num_beams=2, max_length=16, seed=1)
    assert (t1 >= 0).all() and t1.shape == t2.shape
    assert np.array_equal(t1, t1b)  # deterministic per seed
    assert not np.array_equal(t1, t2)  # varies across seeds
