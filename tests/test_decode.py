"""Decode engine tests: greedy parity with a python loop, EOS stopping,
logit processor semantics (vs HF torch implementations), bucketing invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.decode import DecodeEngine
from mapperatorinator_tpu.decode.logits import (
    LogitsPipeline,
    build_logits_pipeline,
    get_eos_token_ids,
    top_k_filter,
    top_p_filter,
)
from mapperatorinator_tpu.models import OsuTransformer, TransformerConfig

VOCAB = 64
EOS = 2


def make_pipeline(**kw) -> LogitsPipeline:
    defaults = dict(
        vocab_size=VOCAB,
        time_start=10,
        time_end=30,
        sos_ids=(1,),
        eos_ids=(EOS,),
        do_sample=False,
        temperature=1.0,
    )
    defaults.update(kw)
    return LogitsPipeline(**defaults)


@pytest.fixture(scope="module")
def tiny():
    cfg = TransformerConfig(
        vocab_size=VOCAB,
        d_model=16,
        encoder_layers=1,
        decoder_layers=1,
        encoder_heads=2,
        decoder_heads=2,
        encoder_ffn=32,
        decoder_ffn=32,
        max_source_positions=8,
        max_target_positions=96,
        num_mel_bins=16,
        conv_stem=False,
        position_scheme="rope",
    )
    model = OsuTransformer(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16))
    params = model.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=jnp.ones((1, 4), jnp.int32))
    return cfg, model, params, feats


def _python_greedy(model, params, feats, prompt, max_length, pipeline, eos_ids):
    """Reference decode: plain teacher-forced forward each step, greedy."""
    ids = list(prompt)
    state = pipeline.init_state(1)
    while len(ids) < max_length:
        logits = model.apply(params, features=feats, decoder_input_ids=jnp.array([ids]))
        state, scores = pipeline(state, logits[:, -1].astype(jnp.float32))
        tok = int(jnp.argmax(scores, -1)[0])
        state = pipeline.update_state(state, jnp.array([tok]))
        ids.append(tok)
        if tok in eos_ids:
            break
    return ids


def test_greedy_engine_matches_python_loop(tiny):
    cfg, model, params, feats = tiny
    pipeline = make_pipeline()
    engine = DecodeEngine(model, params, max_length=24)
    enc = model.apply(params, feats, method=OsuTransformer.encode)

    prompt = np.array([[1, 5, 7]], np.int32)
    tokens, cur_len = engine.generate(enc, prompt, pipeline, eos_ids=[EOS], seed=0)

    want = _python_greedy(model, params, feats, [1, 5, 7], 24, make_pipeline(), [EOS])
    # engine buffer layout: [left pads][prompt][generated][right pads]
    got = tokens[0].tolist()
    start = got.index(1)  # prompt SOS
    out = []
    for t in got[start:]:
        if t == 0:  # right-pad tail
            break
        out.append(t)
        if t == EOS:
            break
    assert out == want


def test_bucketing_invariance(tiny):
    """Explicit extra left padding must not change the generated tokens."""
    cfg, model, params, feats = tiny
    pipeline = make_pipeline()
    engine = DecodeEngine(model, params, max_length=80)
    enc = model.apply(params, feats, method=OsuTransformer.encode)

    prompt = np.array([[1, 5, 7]], np.int32)
    t1, _ = engine.generate(enc, prompt, pipeline, eos_ids=[EOS], seed=0)

    padded = np.pad(prompt, ((0, 0), (13, 0)))  # still < 64 bucket, but more pads
    mask = np.pad(np.ones_like(prompt, bool), ((0, 0), (13, 0)), constant_values=False)
    t2, _ = engine.generate(enc, padded, pipeline, eos_ids=[EOS], seed=0, decoder_attention_mask=mask)

    strip = lambda row: [t for t in row.tolist() if t != 0]
    s1, s2 = strip(t1[0]), strip(t2[0])
    # the padded call has a shorter generation budget (HF counts pads toward
    # max_length); content must agree on the common prefix
    n = min(len(s1), len(s2))
    assert n > 10 and s1[:n] == s2[:n]


def test_eos_range_stops_decode(tiny):
    """Every token can be declared EOS via the timeshift-range trick; decode
    must stop immediately after the first sampled token."""
    cfg, model, params, feats = tiny
    pipeline = make_pipeline()
    engine = DecodeEngine(model, params, max_length=96)
    enc = model.apply(params, feats, method=OsuTransformer.encode)
    prompt = np.array([[1]], np.int32)
    tokens, cur_len = engine.generate(enc, prompt, pipeline, eos_ids=list(range(VOCAB)), seed=0)
    # exactly one generated token: prompt (1 non-pad) + 1 generated
    non_pad = [t for t in tokens[0].tolist() if t != 0]
    assert len(non_pad) <= 2 and non_pad[0] == 1


def test_monotonic_timeshift_masking():
    pipeline = make_pipeline()
    state = pipeline.init_state(2)
    # row 0 has emitted timeshift value 5 (token 15); row 1 none
    state = pipeline.update_state(state, jnp.array([15, 3]))
    scores = jnp.zeros((2, VOCAB))
    _, out = pipeline(state, scores)
    assert np.isneginf(np.asarray(out)[0, 10:15]).all()
    assert np.isfinite(np.asarray(out)[0, 15:30]).all()
    assert np.isfinite(np.asarray(out)[1, 10:30]).all()
    # sos resets monotonicity
    state = pipeline.update_state(state, jnp.array([1, 1]))
    _, out = pipeline(state, scores)
    assert np.isfinite(np.asarray(out)[0, 10:30]).all()


def test_top_p_matches_hf():
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(0)
    scores = rng.standard_normal((4, 50)).astype(np.float32) * 3
    ours = np.asarray(top_p_filter(jnp.asarray(scores), 0.9))
    theirs = TopPLogitsWarper(top_p=0.9)(None, torch.tensor(scores)).numpy()
    np.testing.assert_array_equal(np.isneginf(ours), np.isneginf(theirs))
    np.testing.assert_allclose(
        np.where(np.isneginf(ours), 0, ours), np.where(np.isneginf(theirs), 0, theirs), rtol=1e-6
    )


def test_top_k_matches_hf():
    import torch
    from transformers.generation.logits_process import TopKLogitsWarper

    rng = np.random.default_rng(1)
    scores = rng.standard_normal((4, 50)).astype(np.float32) * 3
    ours = np.asarray(top_k_filter(jnp.asarray(scores), 7))
    theirs = TopKLogitsWarper(top_k=7)(None, torch.tensor(scores)).numpy()
    np.testing.assert_array_equal(np.isneginf(ours), np.isneginf(theirs))


def test_timeshift_bias():
    pipeline = make_pipeline(timeshift_bias=2.5)
    state = pipeline.init_state(1)
    scores = jnp.zeros((1, VOCAB))
    _, out = pipeline(state, scores)
    out = np.asarray(out)
    assert np.allclose(out[0, 10:30], 2.5)
    assert np.allclose(out[0, :10], 0)


def test_conditional_temperature_types_first():
    pipeline = make_pipeline(
        types_first=True,
        temperature=1.0,
        timing_temperature=0.1,
        beat_type_tokens=(40, 41),
        do_sample=False,
    )
    state = pipeline.init_state(1)
    scores = jnp.ones((1, VOCAB))
    # last token is a beat type -> timing temperature applies
    state = pipeline.update_state(state, jnp.array([40]))
    _, out = pipeline(state, scores)
    assert np.allclose(np.asarray(out)[0, 0], 10.0)  # 1/0.1
    # otherwise normal temperature
    state = pipeline.update_state(state, jnp.array([5]))
    _, out = pipeline(state, scores)
    assert np.allclose(np.asarray(out)[0, 0], 1.0)


def test_eos_token_ids_helper():
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.osu import ContextType, build_vocabulary

    cfg = compose("/root/reference/configs/train", "v32", schema_cls=schema.TrainConfig)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(cfg)
    eos = get_eos_token_ids(vocab, lookback_time=3276.8, lookahead_time=6553.6, context_type=ContextType.MAP)
    assert vocab.eos_id in eos
    assert vocab.context_eos[ContextType.MAP] in eos
    from mapperatorinator_tpu.osu.events import EventType

    ts_start = vocab.event_start[EventType.TIME_SHIFT]
    ts_end = vocab.event_end[EventType.TIME_SHIFT]
    assert ts_start in eos and ts_start + 326 in eos and ts_start + 328 not in eos
    assert ts_end - 1 in eos and ts_end - 655 in eos and ts_end - 657 not in eos


def test_cfg_dual_batch(tiny):
    """CFG runs a 2B batch and both halves receive identical continuations."""
    cfg, model, params, feats = tiny
    pipeline = make_pipeline()
    engine = DecodeEngine(model, params, max_length=16)
    enc = model.apply(params, feats, method=OsuTransformer.encode)
    enc2 = jnp.concatenate([enc, enc], axis=0)
    prompt = np.array([[1, 5], [1, 6]], np.int32)  # [neg; pos]
    tokens, _ = engine.generate(enc2, prompt, pipeline, eos_ids=[EOS], seed=0, cfg_scale=3.0)
    # generated region starts right after the 2-token prompt (the buffer is
    # exactly max_length wide; prompt bucket pads live only in the prefill)
    assert (tokens[0, 2:] == tokens[1, 2:]).all()
    assert (tokens[:, 2:] != 0).any()  # something was generated


def test_bucketed_cache_attention_matches_full_reads():
    """The live-prefix lax.switch path (decode_attend_bucket) must produce
    the same tokens as full cache reads — it only fires at batch >= 2 with a
    buffer longer than one bucket, so small default-test shapes never
    exercise it; force it here with a tiny bucket."""
    import dataclasses

    base = TransformerConfig(
        vocab_size=VOCAB, d_model=16, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=32, decoder_ffn=32,
        max_source_positions=8, max_target_positions=96, num_mel_bins=16,
        conv_stem=False, position_scheme="rope",
    )
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    prompt = np.array([[1, 5, 7], [1, 9, 4]], np.int32)

    outs = {}
    for bucket in (0, 8):  # 0 disables; 8 forces several switch branches
        cfg = dataclasses.replace(base, decode_attend_bucket=bucket)
        model = OsuTransformer(cfg)
        params = model.init(
            jax.random.PRNGKey(0), features=feats, decoder_input_ids=jnp.ones((2, 4), jnp.int32)
        )
        engine = DecodeEngine(model, params, max_length=48)
        enc = model.apply(params, feats, method=OsuTransformer.encode)
        tokens, _ = engine.generate(enc, prompt, make_pipeline(), eos_ids=[EOS], seed=0)
        outs[bucket] = np.asarray(tokens)

    np.testing.assert_array_equal(outs[0], outs[8])


def test_sampled_path_distribution_matches_hf_processed_softmax(tiny):
    """Fixed-logits distributional check of the sampled path (VERDICT r2
    item 6): the engine's do_sample draws must be distributed as the softmax
    of the SAME processed logits HF's sampler would multinomial-draw from
    (temperature -> top-k -> top-p, the HF warper order). Exact RNG-stream
    equality with torch is impossible by construction (different RNG
    algorithms, STATUS.md), so parity is pinned at the distribution level."""
    import torch
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    from mapperatorinator_tpu.decode.engine import _bucket

    cfg, model, params, feats = tiny
    pipeline = make_pipeline(do_sample=True, temperature=0.8, top_k=12, top_p=0.9)

    # first-step logits, identical for every row
    logits = np.asarray(
        model.apply(params, features=feats, decoder_input_ids=jnp.array([[1]]))
    )[:, -1].astype(np.float32)

    # HF-processed distribution over the same logits
    t = torch.tensor(logits)
    for warper in (TemperatureLogitsWarper(0.8), TopKLogitsWarper(top_k=12), TopPLogitsWarper(top_p=0.9)):
        t = warper(None, t)
    hf_probs = torch.softmax(t, -1).numpy()[0]

    # ours: the pipeline's processed scores must match HF's bit-for-bit
    state = pipeline.init_state(1)
    _, scores = pipeline(state, jnp.asarray(logits))
    my_probs = np.asarray(jax.nn.softmax(scores, -1))[0]
    np.testing.assert_allclose(my_probs, hf_probs, rtol=1e-5, atol=1e-7)

    # ...and the engine's actual sampled draws must follow that distribution
    B = 8192
    engine = DecodeEngine(model, params, max_length=2, pad_token_id=0)
    enc = jnp.repeat(engine.encode(feats), B, axis=0)
    prompt = np.full((B, 1), 1, np.int32)
    out, _ = engine.generate(enc, prompt, pipeline, eos_ids=[EOS], seed=123)
    first = np.asarray(out)[:, 1]  # first generated token follows the prompt
    counts = np.bincount(first, minlength=VOCAB)
    empirical = counts / counts.sum()

    tv = 0.5 * np.abs(empirical - hf_probs).sum()
    assert tv < 0.05, f"total variation {tv:.4f} vs processed softmax"
    # nothing outside the top-k/top-p support may ever be drawn
    assert counts[hf_probs == 0].sum() == 0


def test_data_parallel_sharded_decode_matches_single_device(tiny):
    """Multi-chip batch-parallel serving: sharding the encoder states over a
    data mesh makes GSPMD partition the whole compiled decode loop (KV cache
    included) across devices, token-identically to the single-device run.
    This is the scale-out shape for offline generation fleets — each chip
    decodes its slice of the window batch with zero code changes."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, model, params, feats1 = tiny
    engine = DecodeEngine(model, params, max_length=32, pad_token_id=0)
    pipeline = make_pipeline(do_sample=False)
    n = len(jax.devices())
    assert n >= 2, "virtual device mesh missing (conftest sets 8)"
    prompt = np.ones((n, 1), np.int32)
    feats = jnp.repeat(feats1, n, 0) + jax.random.normal(jax.random.PRNGKey(2), (n,) + feats1.shape[1:]) * 0.1

    enc = engine.encode(feats)
    ref = np.asarray(engine.generate(enc, prompt, pipeline, eos_ids=[EOS], seed=0)[0])

    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("data",))
    enc_sharded = jax.device_put(enc, NamedSharding(mesh, P("data")))
    out = np.asarray(engine.generate(enc_sharded, prompt, pipeline, eos_ids=[EOS], seed=0)[0])
    assert np.array_equal(out, ref)


def test_forward_bucketing_is_output_invariant(tiny):
    """engine.forward right-pads T and pads rows per CFG half to power-of-two
    buckets for compile reuse; outputs must equal the exact-shape forward."""
    from mapperatorinator_tpu.models import OsuTransformer

    cfg, model, params, feats1 = tiny
    engine = DecodeEngine(model, params, max_length=32, pad_token_id=0)
    rng = np.random.default_rng(5)
    B, T = 3, 10  # row bucket 4, T bucket 64
    feats = jnp.repeat(feats1, B, 0) + jax.random.normal(jax.random.PRNGKey(4), (B,) + feats1.shape[1:]) * 0.1
    enc = model.apply(params, feats, method=OsuTransformer.encode)
    ids = rng.integers(3, 60, (B, T)).astype(np.int32)
    ids[0, :4] = 0  # a left-padded row, like the processors produce

    got = engine.forward(enc, ids)
    direct = np.asarray(
        model.apply(
            params,
            decoder_input_ids=jnp.asarray(ids),
            decoder_attention_mask=jnp.asarray(ids != 0),
            encoder_states=enc,
        ),
        np.float32,
    )
    assert got.shape == direct.shape
    # invariance holds at every VALID query position (pad queries attend to
    # an empty key set -> uniform over the key count, which padding changes;
    # no caller reads those rows)
    valid = ids != 0
    np.testing.assert_allclose(got[valid], direct[valid], atol=2e-5)

    # CFG dual batch [neg; pos]: fold result must match the manual fold
    ids2 = np.concatenate([ids, ids], axis=0)
    ids2[:B, 1] = 5  # negative prompt differs
    enc2 = jnp.concatenate([enc, enc], axis=0)
    got_cfg = engine.forward(enc2, ids2, cfg_scale=3.0)
    direct2 = np.asarray(
        model.apply(
            params,
            decoder_input_ids=jnp.asarray(ids2),
            decoder_attention_mask=jnp.asarray(ids2 != 0),
            encoder_states=enc2,
        ),
        np.float32,
    )
    want = direct2[B:] + (direct2[:B] - direct2[B:]) * 3.0
    valid2 = ids2[B:] != 0
    np.testing.assert_allclose(got_cfg[valid2], want[valid2], atol=2e-4)


def test_forward_stats_match_host_reduction(tiny):
    """engine.forward_stats (device-reduced surprisal/entropy/argmax) must
    equal the host reduction of engine.forward's logits — the math the
    MaiMod analysis previously did on the transferred (B, T, V) array."""
    from mapperatorinator_tpu.models import OsuTransformer

    cfg, model, params, feats1 = tiny
    engine = DecodeEngine(model, params, max_length=32, pad_token_id=0)
    rng = np.random.default_rng(6)
    B, T = 2, 9
    feats = jnp.repeat(feats1, B, 0) + jax.random.normal(jax.random.PRNGKey(7), (B,) + feats1.shape[1:]) * 0.1
    enc = model.apply(params, feats, method=OsuTransformer.encode)
    ids = rng.integers(3, 60, (B, T)).astype(np.int32)

    for cfg_scale, enc_in, ids_in in [
        (1.0, enc, ids),
        (2.5, jnp.concatenate([enc, enc], axis=0), np.concatenate([ids + 1, ids], axis=0)),
    ]:
        sur, ent, arg = engine.forward_stats(enc_in, ids_in, cfg_scale=cfg_scale)
        logits = engine.forward(enc_in, ids_in, cfg_scale=cfg_scale)
        x = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(x) / np.exp(x).sum(axis=-1, keepdims=True)
        want_ent = -np.sum(probs * np.log2(probs + 1e-10), axis=-1)
        targets = np.concatenate([ids[:, 1:], np.zeros((B, 1), np.int32)], axis=1)
        want_sur = -np.log2(np.take_along_axis(probs, targets[..., None], -1)[..., 0] + 1e-10)
        assert sur.shape == ent.shape == arg.shape == (B, T)
        np.testing.assert_allclose(ent, want_ent, atol=1e-4)
        np.testing.assert_allclose(sur[:, :-1], want_sur[:, :-1], atol=1e-4)
        np.testing.assert_array_equal(arg, logits.argmax(axis=-1))


def test_tensor_parallel_sharded_decode_matches_single_device(tiny):
    """Multi-chip LATENCY serving: Megatron tensor-parallel param placement
    (wq/wk/wv column, wo/fc2 row — parallel/sharding.py) makes GSPMD
    partition the compiled decode loop across chips, splitting the
    per-step weight streaming that bounds batch-1 sequential decode.
    Combined with the data axis this is the full dp x tp serving layout;
    tokens must match the single-device run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mapperatorinator_tpu.parallel import shard_params

    cfg, model, params, feats1 = tiny
    engine = DecodeEngine(model, params, max_length=32, pad_token_id=0)
    pipeline = make_pipeline(do_sample=False)
    n = len(jax.devices())
    assert n >= 4, "virtual device mesh missing (conftest sets 8)"
    data, tensor = n // 2, 2
    batch = data * 2
    prompt = np.ones((batch, 1), np.int32)
    feats = jnp.repeat(feats1, batch, 0) + jax.random.normal(
        jax.random.PRNGKey(3), (batch,) + feats1.shape[1:]) * 0.1

    enc = engine.encode(feats)
    ref = np.asarray(engine.generate(enc, prompt, pipeline, eos_ids=[EOS], seed=0)[0])

    mesh = Mesh(np.asarray(jax.devices()).reshape(data, tensor), ("data", "tensor"))
    tp_params = shard_params(mesh, params, tensor_axis="tensor")
    tp_engine = DecodeEngine(model, tp_params, max_length=32, pad_token_id=0)
    enc_sharded = jax.device_put(enc, NamedSharding(mesh, P("data")))
    out = np.asarray(tp_engine.generate(enc_sharded, prompt, pipeline, eos_ids=[EOS], seed=0)[0])
    assert np.array_equal(out, ref)
