"""Model stack tests: shapes, cached-decode consistency, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig, OsuTransformer, TransformerConfig
from mapperatorinator_tpu.models.mapperatorinator import LABEL_IGNORE_ID


def tiny_config(**kw) -> TransformerConfig:
    defaults = dict(
        vocab_size=97,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_heads=4,
        decoder_heads=4,
        encoder_ffn=64,
        decoder_ffn=64,
        max_source_positions=16,
        max_target_positions=24,
        num_mel_bins=12,
        position_scheme="rope",
        norm="rms",
        conv_stem=True,
        tie_word_embeddings=False,
    )
    defaults.update(kw)
    return TransformerConfig(**defaults)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    model = OsuTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jnp.ones((2, 32, 12))
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(rng, features=feats, decoder_input_ids=ids)
    return cfg, model, params


def test_forward_shapes(tiny_model):
    cfg, model, params = tiny_model
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 12))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)
    logits = model.apply(params, features=feats, decoder_input_ids=ids)
    assert logits.shape == (2, 8, cfg.vocab_size)  # conv stem halves encoder len only


@pytest.mark.parametrize("scheme,norm", [("rope", "rms"), ("whisper_abs", "layer")])
def test_cached_decode_matches_teacher_forced(scheme, norm):
    """The KV-cached step-by-step decode must produce the same logits as the
    full teacher-forced forward — the core decode-engine invariant."""
    cfg = tiny_config(position_scheme=scheme, norm=norm)
    model = OsuTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 12))
    T = 7
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, T), 0, cfg.vocab_size)
    params = model.init(rng, features=feats, decoder_input_ids=ids)

    full = model.apply(params, features=feats, decoder_input_ids=ids)

    encoder_states = model.apply(params, feats, method=OsuTransformer.encode)
    cache = model.apply(params, 2, cfg.max_target_positions, encoder_states, method=OsuTransformer.init_cache)

    stepwise = []
    for t in range(T):
        embeds = model.apply(params, ids[:, t : t + 1], method=OsuTransformer.embed_decoder_ids)
        logits, cache = model.apply(params, embeds, cache, t, method=OsuTransformer.decode_step)
        stepwise.append(logits[:, 0])
    stepwise = jnp.stack(stepwise, axis=1)

    np.testing.assert_allclose(np.asarray(stepwise), np.asarray(full), rtol=2e-4, atol=2e-4)


def test_local_attention_masks_long_range():
    """A local layer must not attend beyond its window."""
    cfg = tiny_config(global_attn_every_n_layers=2, local_attention=4, encoder_layers=2)
    model = OsuTransformer(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 12))
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)

    # perturb a far-away encoder frame; with window 4 the local layer output
    # at position 0 shouldn't change through layer 1 (local), but the global
    # layer 0 propagates information. So instead check pure attention masking:
    from mapperatorinator_tpu.models.transformer import sliding_window_mask

    m = sliding_window_mask(jnp.arange(10), jnp.arange(10), 4)
    assert bool(m[0, 2]) and not bool(m[0, 3])
    assert bool(m[5, 7]) and not bool(m[5, 8])


def test_mapperatorinator_end_to_end_loss():
    backbone = tiny_config(num_mel_bins=32)
    cfg = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=120,
        vocab_size_out=97,
        n_mels=16,
        cond_size=0,
        project_encoder_input=True,
        embed_decoder_input=True,
        rhythm_token_start=3,
        rhythm_token_end=10,
        rhythm_weight=3.0,
        label_smoothing=0.1,
    )
    model = Mapperatorinator(cfg)
    samples = jax.random.normal(jax.random.PRNGKey(0), (2, 128 * 31))  # 32 frames
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 120)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 97)
    labels = labels.at[:, -2:].set(LABEL_IGNORE_ID)
    params = model.init(jax.random.PRNGKey(3), frames=samples, decoder_input_ids=ids, labels=labels)
    logits, loss = model.apply(params, frames=samples, decoder_input_ids=ids, labels=labels)
    assert logits.shape == (2, 8, 97)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # ignored labels don't contribute: changing them must not change the loss
    labels2 = labels.at[:, -1].set(LABEL_IGNORE_ID)
    _, loss2 = model.apply(params, frames=samples, decoder_input_ids=ids, labels=labels2)
    assert float(loss) == pytest.approx(float(loss2))


def test_loss_rhythm_weighting():
    cfg = MapperatorinatorConfig(
        backbone=tiny_config(),
        vocab_size_out=97,
        rhythm_token_start=0,
        rhythm_token_end=97,
        rhythm_weight=2.0,
        label_smoothing=0.0,
    )
    model = Mapperatorinator(cfg)
    logits = jnp.zeros((1, 4, 97))
    labels = jnp.array([[1, 2, 3, 4]])
    # all classes weighted 2 -> loss is 2x the unweighted CE... but the
    # denominator is the label count, so weight scales the mean.
    loss = model.loss(logits, labels)
    expected = 2.0 * -jax.nn.log_softmax(jnp.zeros(97))[0]
    assert float(loss) == pytest.approx(float(expected), rel=1e-5)


def test_conditioning_embedders():
    backbone = tiny_config(num_mel_bins=16 + 8)
    cfg = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=120,
        vocab_size_out=97,
        n_mels=16,
        cond_dim=8,
        cond_size=8,
        do_difficulty_embed=True,
        project_encoder_input=True,
    )
    model = Mapperatorinator(cfg)
    samples = jax.random.normal(jax.random.PRNGKey(0), (2, 128 * 31))
    ids = jnp.ones((2, 4), jnp.int32)
    diff = jnp.array([3.5, 6.0])
    params = model.init(jax.random.PRNGKey(1), frames=samples, decoder_input_ids=ids, difficulty=diff)
    logits, _ = model.apply(params, frames=samples, decoder_input_ids=ids, difficulty=diff)
    assert logits.shape == (2, 4, 97)
    # different difficulty -> different logits
    logits2, _ = model.apply(params, frames=samples, decoder_input_ids=ids, difficulty=jnp.array([1.0, 9.0]))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


@pytest.mark.parametrize("recipe", ["v28", "v30", "v32"])
def test_backbone_families_forward(recipe):
    """Every published recipe's backbone family builds and runs a forward
    (whisper_abs/layer, rope/layer, rope/rms)."""
    import dataclasses
    import warnings

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import build_vocabulary

    args = compose("/root/repo/configs/train", recipe, schema_cls=schema.TrainConfig)
    args.data.dataset_type = "none"
    args.data.mappers_path = ""
    args.data.tags_metadata_path = ""
    args.data.src_seq_len = 64
    args.data.tgt_seq_len = 64
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    cfg = build_config(args, vocab)
    bb = dataclasses.replace(
        cfg.backbone, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
    )
    cfg = dataclasses.replace(cfg, backbone=bb)
    # v30/v31 RoPEWhisper normalizes with nn.RMSNorm throughout
    # (reference modeling_ropewhisper.py:768,1150)
    expected = {"v28": ("whisper_abs", "layer"), "v30": ("rope", "rms"), "v32": ("rope", "rms")}
    assert (cfg.backbone.position_scheme, cfg.backbone.norm) == expected[recipe]

    model = Mapperatorinator(cfg)
    hop = args.model.spectrogram.hop_length
    cond = {}
    if cfg.do_difficulty_embed:
        cond = dict(
            difficulty=jnp.full((1,), 4.5),
            mapper_idx=jnp.zeros((1,), jnp.int32),
            song_position=jnp.zeros((1, 2)),
        )
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * 63), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
        **cond,
    )
    logits, loss = model.apply(
        params,
        frames=jnp.zeros((1, hop * 63), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
        labels=jnp.ones((1, 8), jnp.int32),
        **cond,
    )
    assert np.isfinite(float(loss))


def test_t5_relpos_cached_decode_matches_full():
    """T5 backbone: relative-position-bias stepwise decode == full forward."""
    cfg = TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=32, num_mel_bins=32,
        position_scheme="t5_relpos", norm="rms", attention_bias=False,
        attention_scale=False, ffn_gated=True, head_dim_override=24, conv_stem=False,
    )
    model = OsuTransformer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 60, (1, 12)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    logits_full = model.apply(params, features=feats, decoder_input_ids=ids)

    enc = model.apply(params, feats, method=lambda m, f: m.encoder(f))
    cache = model.apply(params, 1, 20, enc, method=lambda m, b, l, e: m.init_cache(b, l, e))
    outs = []
    for t in range(12):
        emb = model.apply(params, ids[:, t : t + 1], method=lambda m, i: m.decoder.embed_tokens(i))
        logits, cache = model.apply(
            params, emb, cache, t,
            method=lambda m, e, c, i: m.decode_step(e, c, i, positions=jnp.full((1, 1), i)),
        )
        outs.append(logits[:, 0])
    step = jnp.stack(outs, 1)
    np.testing.assert_allclose(np.asarray(step), np.asarray(logits_full), atol=2e-4)


def test_t5_build_config():
    import warnings

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import build_vocabulary

    args = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    args.model.name = "google/t5-v1_1-small"
    args.data.dataset_type = "none"
    args.data.mappers_path = ""
    args.data.tags_metadata_path = ""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    cfg = build_config(args, vocab)
    bb = cfg.backbone
    assert bb.position_scheme == "t5_relpos"
    assert bb.head_dim == 64 and bb.decoder_heads == 6 and bb.d_model == 512
    assert bb.ffn_gated and not bb.attention_scale and not bb.attention_bias
    assert not bb.conv_stem


def test_build_config_mixed_precision_dtype():
    """The accelerate-style mixed_precision flag sets the flax COMPUTE dtype
    (v32.yaml trains bf16, reference train.py:57); params stay fp32, 'no'
    keeps fp32 compute, and fp16 maps to bf16 (no fp16 path on the MXU)."""
    import warnings

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import build_vocabulary

    args = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    args.data.dataset_type = "none"
    args.data.mappers_path = ""
    args.data.tags_metadata_path = ""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)

    assert args.mixed_precision == "bf16"  # the shipped v32 training default
    assert build_config(args, vocab).backbone.dtype == jnp.bfloat16

    for flag, expected in (("no", jnp.float32), ("fp16", jnp.bfloat16),
                           (None, jnp.float32)):
        args.mixed_precision = flag
        assert build_config(args, vocab).backbone.dtype == expected, flag

    # bf16 compute must not change the parameter dtypes (fp32 master weights)
    args.mixed_precision = "bf16"
    model = Mapperatorinator(build_config(args, vocab))
    hop = 128
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * 15), jnp.float32),
        decoder_input_ids=jnp.ones((1, 4), jnp.int32),
    )
    dtypes = {x.dtype for x in jax.tree.leaves(params)}
    assert dtypes == {jnp.dtype(jnp.float32)}, dtypes


def test_ngpt_nwhisper_cached_decode_matches_full():
    """nGPT-normalized backbone: unit-norm hidden states and exact stepwise
    decode (reference NWhisper: modeling_nwhisper.py:86-262)."""
    cfg = TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=32, num_mel_bins=32,
        position_scheme="whisper_abs", norm="layer", norm_scheme="ngpt", conv_stem=True,
    )
    model = OsuTransformer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 32, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 60, (1, 12)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    logits_full = model.apply(params, features=feats, decoder_input_ids=ids)
    assert bool(jnp.isfinite(logits_full).all())

    enc = model.apply(params, feats, method=lambda m, f: m.encoder(f))
    norms = np.asarray(jnp.linalg.norm(enc, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    cache = model.apply(params, 1, 20, enc, method=lambda m, b, l, e: m.init_cache(b, l, e))
    outs = []
    for t in range(12):
        emb = model.apply(params, ids[:, t : t + 1], method=lambda m, i: m.decoder.embed(i))
        logits, cache = model.apply(
            params, emb, cache, t,
            method=lambda m, e, c, i: m.decode_step(e, c, i, positions=jnp.full((1, 1), i)),
        )
        outs.append(logits[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, 1)), np.asarray(logits_full), atol=2e-4
    )


def test_dynamic_ntk_rope():
    """Dynamic NTK: identity within the trained range, rescaled base beyond;
    longer-than-trained decode stays exact vs an explicitly-scaled model."""
    from mapperatorinator_tpu.models.transformer import dynamic_ntk_theta

    assert dynamic_ntk_theta(10000.0, 64, 100, 128, 1.0) == 10000.0
    scaled = dynamic_ntk_theta(10000.0, 64, 256, 128, 1.0)
    assert scaled > 10000.0
    assert scaled == pytest.approx(10000.0 * 2.0 ** (64 / 62))

    base = dict(
        vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=8, num_mel_bins=32,
        position_scheme="rope", norm="rms", conv_stem=False,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 60, (1, 12)), jnp.int32)  # 12 > max_target 8

    m_dyn = OsuTransformer(TransformerConfig(**base, rope_type="dynamic"))
    m_def = OsuTransformer(TransformerConfig(**base))
    params = m_def.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    out_dyn = m_dyn.apply(params, features=feats, decoder_input_ids=ids)
    out_def = m_def.apply(params, features=feats, decoder_input_ids=ids)
    # beyond the trained range the two differ (frequencies rescaled)
    assert float(jnp.abs(out_dyn - out_def).max()) > 1e-4

    # within range: identical
    ids_short = ids[:, :8]
    out_dyn_s = m_dyn.apply(params, features=feats, decoder_input_ids=ids_short)
    out_def_s = m_def.apply(params, features=feats, decoder_input_ids=ids_short)
    np.testing.assert_allclose(np.asarray(out_dyn_s), np.asarray(out_def_s), atol=1e-6)


def test_remat_matches_no_remat():
    """jax.checkpoint'd layers produce identical loss and gradients."""
    import dataclasses

    base = dict(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=32, num_mel_bins=32,
        position_scheme="rope", norm="rms", conv_stem=False,
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 60, (2, 12)), jnp.int32)

    m_plain = OsuTransformer(TransformerConfig(**base))
    m_remat = OsuTransformer(TransformerConfig(**base, remat=True))
    params = m_plain.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)

    def loss(model, p):
        return (model.apply(p, features=feats, decoder_input_ids=ids).astype(jnp.float32) ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_remat, p))(params)
    assert float(l0) == pytest.approx(float(l1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # selective policy ("dots": matmul outputs stay resident, only
    # elementwise ops recompute) changes the backward schedule, not the math
    m_dots = OsuTransformer(dataclasses.replace(m_remat.config, remat_policy="dots"))
    l2, g2 = jax.value_and_grad(lambda p: loss(m_dots, p))(params)
    assert float(l2) == pytest.approx(float(l1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    with pytest.raises(ValueError, match="remat_policy"):
        OsuTransformer(dataclasses.replace(m_remat.config, remat_policy="bogus")).apply(
            params, features=feats, decoder_input_ids=ids
        )

    # cached decode still works with remat'd layers
    enc = m_remat.apply(params, feats, method=lambda m, f: m.encoder(f))
    cache = m_remat.apply(params, 2, 16, enc, method=lambda m, b, l, e: m.init_cache(b, l, e))
    emb = m_remat.apply(params, ids[:, :1], method=lambda m, i: m.decoder.embed(i))
    logits, cache = m_remat.apply(
        params, emb, cache, 0,
        method=lambda m, e, c, i: m.decode_step(e, c, i, positions=jnp.zeros((2, 1), jnp.int32)),
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_quantized_weights_close_to_fp():
    """Weight-only int8: small logits error, matching argmax, decode works."""
    from mapperatorinator_tpu.models.transformer import quantize_params

    base = dict(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=16, max_target_positions=32, num_mel_bins=32,
        position_scheme="rope", norm="rms", conv_stem=False,
    )
    m = OsuTransformer(TransformerConfig(**base))
    mq = OsuTransformer(TransformerConfig(**base, quantized_weights=True))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 60, (1, 12)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    pq = quantize_params(params)

    # int8 kernels present
    import flax

    flat = flax.traverse_util.flatten_dict(pq, sep="/")
    assert any(k.endswith("kernel_q") for k in flat)
    assert all(v.dtype == np.int8 for k, v in flat.items() if k.endswith("kernel_q"))

    out = m.apply(params, features=feats, decoder_input_ids=ids)
    outq = mq.apply(pq, features=feats, decoder_input_ids=ids)
    rel = float(jnp.abs(out - outq).max() / (jnp.abs(out).max() + 1e-9))
    assert rel < 0.05
    assert float((out.argmax(-1) == outq.argmax(-1)).mean()) > 0.9

    # cached decode runs on the quantized model
    enc = mq.apply(pq, feats, method=lambda m, f: m.encoder(f))
    cache = mq.apply(pq, 1, 16, enc, method=lambda m, b, l, e: m.init_cache(b, l, e))
    emb = mq.apply(pq, ids[:, :1], method=lambda m, i: m.decoder.embed(i))
    logits, _ = mq.apply(
        pq, emb, cache, 0,
        method=lambda m, e, c, i: m.decode_step(e, c, i, positions=jnp.zeros((1, 1), jnp.int32)),
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_moonshine_backbone_from_preset():
    """configs/model/moonshine_tiny.yaml builds and runs: raw-wave stem,
    partial interleaved rotary, gated-concat silu decoder MLP. (The
    reference's own moonshine branch is unimportable; ours is functional and
    conversion-parity-tested against stock HF Moonshine.)"""
    import dataclasses
    import warnings

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import build_vocabulary

    args = compose("/root/repo/configs/train", "default", schema_cls=schema.TrainConfig)
    model_args = compose("/root/repo/configs/model", "moonshine_tiny", schema_cls=schema.ModelConfig)
    for f in dataclasses.fields(args.model):
        if hasattr(model_args, f.name):
            setattr(args.model, f.name, getattr(model_args, f.name))
    args.data.dataset_type = "none"
    args.data.mappers_path = ""
    args.data.tags_metadata_path = ""
    args.data.src_seq_len = 96
    args.data.tgt_seq_len = 64
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    cfg = build_config(args, vocab)
    assert cfg.input_raw_wave
    assert cfg.backbone.stem_type == "moonshine"
    assert cfg.backbone.rope_partial_factor == 0.9
    assert cfg.backbone.decoder_ffn_gated_concat

    bb = dataclasses.replace(
        cfg.backbone, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
    )
    cfg = dataclasses.replace(cfg, backbone=bb)
    model = Mapperatorinator(cfg)
    samples = jnp.zeros((1, 4096), jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames=samples, decoder_input_ids=ids)
    logits, _ = model.apply(params, frames=samples, decoder_input_ids=ids)
    assert logits.shape == (1, 8, vocab.vocab_size_out)
    assert bool(jnp.isfinite(logits).all())
