"""Weight-conversion parity: reference torch VarWhisper -> our Flax
OsuTransformer must produce matching logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapperatorinator_tpu.models import OsuTransformer, TransformerConfig
from mapperatorinator_tpu.models.convert import convert_varwhisper_state_dict
from tests.reference_shim import import_reference_osut5


@pytest.fixture(scope="module")
def torch_varwhisper():
    import_reference_osut5()
    import torch

    from osuT5.osuT5.model.custom_transformers.configuration_varwhisper import VarWhisperConfig
    from osuT5.osuT5.model.custom_transformers.modeling_varwhisper import (
        VarWhisperForConditionalGeneration,
    )

    cfg = VarWhisperConfig(
        vocab_size=64,
        num_mel_bins=16,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        d_model=32,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=32,
        max_target_positions=16,
        attention_bias=True,
        global_attn_every_n_layers=1,
        local_attention=128,
        use_cache=False,
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
        begin_suppress_tokens=None,
        suppress_tokens=None,
    )
    # NOTE: the reference's sdpa path drops the causal mask in teacher-forced
    # decoding (sdpa_attention_forward never passes is_causal and
    # _update_causal_mask yields None) — a reference eval-path bug; its FA2
    # training path IS causal, matching our decoder. Parity is therefore
    # checked on the CACHED stepwise path, where causality is physical
    # (the cache only contains past tokens) and sdpa is exact.
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = VarWhisperForConditionalGeneration(cfg)
    model.eval()
    return cfg, model


def test_varwhisper_conversion_parity(torch_varwhisper):
    import torch

    tcfg, tmodel = torch_varwhisper

    ours_cfg = TransformerConfig(
        vocab_size=64,
        d_model=32,
        encoder_layers=2,
        decoder_layers=2,
        encoder_heads=2,
        decoder_heads=2,
        encoder_ffn=64,
        decoder_ffn=64,
        max_source_positions=32,
        max_target_positions=16,
        num_mel_bins=16,
        position_scheme="rope",
        norm="rms",
        conv_stem=True,
        attention_bias=True,
        tie_word_embeddings=False,
    )
    model = OsuTransformer(ours_cfg)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_varwhisper_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 16, 64)).astype(np.float32)  # (B, mel, T) torch layout
    ids = rng.integers(3, 64, (2, 7)).astype(np.int64)
    T = ids.shape[1]

    # 1. encoder parity (teacher-forced; no mask involved)
    with torch.no_grad():
        t_enc = tmodel.model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
    j_enc = model.apply(params, jnp.asarray(np.transpose(feats, (0, 2, 1))), method=OsuTransformer.encode)
    np.testing.assert_allclose(np.asarray(j_enc), t_enc, rtol=2e-4, atol=2e-4)

    # 2. decoder parity on the cached stepwise path
    from transformers import DynamicCache, EncoderDecoderCache

    t_logits = []
    past = EncoderDecoderCache(DynamicCache(), DynamicCache())
    with torch.no_grad():
        enc_out = tmodel.model.encoder(torch.tensor(feats))
        for t in range(T):
            out = tmodel(
                encoder_outputs=(enc_out.last_hidden_state,),
                decoder_input_ids=torch.tensor(ids[:, t : t + 1]),
                past_key_values=past,
                use_cache=True,
            )
            past = out.past_key_values
            t_logits.append(out.logits[:, 0].numpy())
    t_out = np.stack(t_logits, axis=1)

    cache = model.apply(params, 2, 16, j_enc, method=OsuTransformer.init_cache)
    j_logits = []
    for t in range(T):
        emb = model.apply(params, jnp.asarray(ids[:, t : t + 1].astype(np.int32)),
                          method=OsuTransformer.embed_decoder_ids)
        logits, cache = model.apply(params, emb, cache, t, method=OsuTransformer.decode_step)
        j_logits.append(np.asarray(logits[:, 0]))
    j_out = np.stack(j_logits, axis=1)

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


def test_conversion_roundtrip_through_checkpoint(tmp_path, torch_varwhisper):
    """Converted params survive our native save/load format."""
    import torch

    tcfg, tmodel = torch_varwhisper
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_varwhisper_state_dict(sd, 2, 2, tied_head=False)}

    import flax.serialization

    blob = flax.serialization.to_bytes(params)
    restored = flax.serialization.from_bytes(params, blob)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# per-family conversion parity (VERDICT r1 item 4): every published backbone
# family converts and matches torch logits on the cached stepwise path
# ---------------------------------------------------------------------------


def _stepwise_parity(model, params, tmodel, feats, ids, rtol=2e-4, atol=2e-4, t5=False):
    """Shared harness: encoder parity + cached stepwise decoder parity."""
    import torch

    from transformers import DynamicCache, EncoderDecoderCache

    T = ids.shape[1]
    with torch.no_grad():
        if t5:
            enc_out = tmodel.encoder(inputs_embeds=torch.tensor(feats))
        else:
            enc_out = tmodel.model.encoder(torch.tensor(feats))
    t_enc = enc_out.last_hidden_state.numpy()
    j_feats = feats if t5 else np.transpose(feats, (0, 2, 1))
    j_enc = model.apply(params, jnp.asarray(j_feats), method=OsuTransformer.encode)
    np.testing.assert_allclose(np.asarray(j_enc), t_enc, rtol=rtol, atol=atol)

    t_logits = []
    past = EncoderDecoderCache(DynamicCache(), DynamicCache())
    with torch.no_grad():
        for t in range(T):
            kwargs = dict(
                decoder_input_ids=torch.tensor(ids[:, t : t + 1]),
                past_key_values=past,
                use_cache=True,
            )
            if t5:
                kwargs["encoder_outputs"] = enc_out
            else:
                kwargs["encoder_outputs"] = (enc_out.last_hidden_state,)
            out = tmodel(**kwargs)
            past = out.past_key_values
            t_logits.append(out.logits[:, 0].numpy())
    t_out = np.stack(t_logits, axis=1)

    cache = model.apply(params, ids.shape[0], 16, j_enc, method=OsuTransformer.init_cache)
    j_logits = []
    for t in range(T):
        emb = model.apply(params, jnp.asarray(ids[:, t : t + 1].astype(np.int32)),
                          method=OsuTransformer.embed_decoder_ids)
        logits, cache = model.apply(params, emb, cache, t, method=OsuTransformer.decode_step)
        j_logits.append(np.asarray(logits[:, 0]))
    j_out = np.stack(j_logits, axis=1)

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, rtol=rtol, atol=atol)


def test_whisper_conversion_parity():
    """Stock HF Whisper (reference v28 family: whisper_abs positions,
    LayerNorm, split q/k/v; model_utils.py:356-397)."""
    import_reference_osut5()
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from mapperatorinator_tpu.models.convert import convert_whisper_state_dict

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=16,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=8, max_target_positions=16,
        use_cache=False, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    tmodel = WhisperForConditionalGeneration(cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=8, max_target_positions=16, num_mel_bins=16,
        position_scheme="whisper_abs", norm="layer", conv_stem=True,
        attention_bias=True, tie_word_embeddings=False,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_whisper_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 16, 16)).astype(np.float32)  # (B, mel, T)
    ids = rng.integers(3, 64, (2, 7)).astype(np.int64)
    _stepwise_parity(ours, params, tmodel, feats, ids)


def test_ropewhisper_conversion_parity():
    """RoPEWhisper (reference v29-v31 family: RoPE both stacks, RMSNorm;
    modeling_ropewhisper.py:262-346,768)."""
    import_reference_osut5()
    import torch

    from osuT5.osuT5.model.custom_transformers import (
        RoPEWhisperConfig,
        RoPEWhisperForConditionalGeneration,
    )

    from mapperatorinator_tpu.models.convert import convert_ropewhisper_state_dict

    cfg = RoPEWhisperConfig(
        vocab_size=64, num_mel_bins=16,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=8, max_target_positions=16,
        rope_type="default",
        use_cache=False, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None,
    )
    # the reference's eager cross-attn path indexes DynamicCache.key_cache,
    # which this transformers version removed; its sdpa path uses the
    # supported Cache.update API and is exact on the cached stepwise path
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    tmodel = RoPEWhisperForConditionalGeneration(cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=8, max_target_positions=16, num_mel_bins=16,
        position_scheme="rope", norm="rms", conv_stem=True,
        attention_bias=True, tie_word_embeddings=False,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_ropewhisper_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 16, 16)).astype(np.float32)
    ids = rng.integers(3, 64, (2, 7)).astype(np.int64)
    _stepwise_parity(ours, params, tmodel, feats, ids)


def test_nwhisper_conversion_parity():
    """NWhisper (nGPT hypersphere family; modeling_nwhisper.py). Uses sdpa —
    the reference's eager path drops the sqrt(d) attention scale that its
    sdpa/FA2 paths (and we) apply after qk-norm (modeling_nwhisper.py:502,785)."""
    import_reference_osut5()
    import torch

    from osuT5.osuT5.model.custom_transformers import (
        NWhisperConfig,
        NWhisperForConditionalGeneration,
    )

    from mapperatorinator_tpu.models.convert import convert_nwhisper_state_dict

    cfg = NWhisperConfig(
        vocab_size=64, input_vocab_size=80, num_mel_bins=16,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=8, max_target_positions=16,
        manual_norm_weights=True,
        use_cache=False, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None,
    )
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    tmodel = NWhisperForConditionalGeneration(cfg).eval()
    # with manual_norm_weights the reference renormalizes after every
    # optimizer step and once at startup (osuT5/train.py:105-108); every real
    # checkpoint therefore has unit-norm weight rows. Our NormDense renorm is
    # idempotent on such weights.
    tmodel.norm_weights_()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, input_vocab_size=80, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=8, max_target_positions=16, num_mel_bins=16,
        position_scheme="whisper_abs", norm="layer", norm_scheme="ngpt",
        conv_stem=True, tie_word_embeddings=False,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_nwhisper_state_dict(sd, 2, 2, tied_head=False)}

    # Tolerance note: the hypersphere l2-renorm of small random-init conv
    # outputs amplifies fp32 platform noise (torch-CPU vs XLA convs, ~8e-5)
    # by ~1/||row||; scaled-up inputs keep amplification modest. Structural
    # wiring errors (wrong alpha init, missed slerp) produce diffs >0.1 here
    # (measured), two orders above this gate. The reference hard-casts
    # hidden states to fp32 (modeling_nwhisper.py:1408), so f64 cannot run.
    rng = np.random.default_rng(3)
    feats = (rng.standard_normal((2, 16, 16)) * 3).astype(np.float32)
    ids = rng.integers(3, 80, (2, 7)).astype(np.int64)
    _stepwise_parity(ours, params, tmodel, feats, ids, rtol=5e-3, atol=5e-3)


def test_t5_conversion_parity():
    """Stock HF T5 v1.1 (gated-gelu, rel-pos bias, no biases, d_kv != d/h)."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    from mapperatorinator_tpu.models.convert import convert_t5_state_dict

    cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        use_cache=False, pad_token_id=0, eos_token_id=2, decoder_start_token_id=1,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    tmodel = T5ForConditionalGeneration(cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
        head_dim_override=8, activation="gelu_tanh",
        max_source_positions=16, max_target_positions=16, num_mel_bins=32,
        position_scheme="t5_relpos", norm="rms", norm_eps=1e-6,
        attention_bias=False, attention_scale=False, mlp_bias=False, ffn_gated=True,
        conv_stem=False, tie_word_embeddings=False,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_t5_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 12, 32)).astype(np.float32)  # (B, T, d_model)
    ids = rng.integers(3, 64, (2, 7)).astype(np.int64)
    _stepwise_parity(ours, params, tmodel, feats, ids, t5=True)


def test_full_wrapper_conversion_with_embedders():
    """All conditioning embedders + encoder/decoder embedders convert and the
    full wrapper forward matches a manual torch-side composition of the
    reference's modules (reference modeling_mapperatorinator.py:100-225,
    446-659). The reference config class needs hub access (zero egress), so
    the wrapper is assembled from its building blocks directly."""
    import_reference_osut5()
    import torch

    from osuT5.osuT5.model.custom_transformers.configuration_varwhisper import VarWhisperConfig
    from osuT5.osuT5.model.custom_transformers.modeling_varwhisper import (
        VarWhisperForConditionalGeneration,
    )
    from osuT5.osuT5.model.modeling_mapperatorinator import (
        DifficultyEmbedder as RefDifficulty,
        MapperStyleEmbedder as RefMapper,
        SongPositionEmbedder as RefSongPos,
    )

    from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict

    torch.manual_seed(0)
    bb_cfg = VarWhisperConfig(
        vocab_size=64, num_mel_bins=32,  # = d_model (project_encoder_input)
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=16, max_target_positions=16,
        attention_bias=True, global_attn_every_n_layers=1, local_attention=128,
        use_cache=False, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None,
    )
    bb_cfg._attn_implementation = "sdpa"
    backbone = VarWhisperForConditionalGeneration(bb_cfg).eval()
    n_mels, cond_dim = 16, 16
    cond_size = 3 * cond_dim
    diff_emb = RefDifficulty(hidden_size=cond_dim, max_difficulty=10).eval()
    mapper_emb = RefMapper(embedding_dim=cond_dim, num_mappers=7).eval()
    songpos_emb = RefSongPos(hidden_size=cond_dim, num_basis=10).eval()
    encoder_embedder = torch.nn.Linear(n_mels + cond_size, 32)
    decoder_embedder = torch.nn.Embedding(96, 32)

    # assemble the wrapper-format state dict
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in backbone.state_dict().items()}
    sd.update({f"difficulty_embedder.{k}": v.detach().numpy() for k, v in diff_emb.state_dict().items()})
    sd.update({f"mapper_embedder.{k}": v.detach().numpy() for k, v in mapper_emb.state_dict().items()})
    sd.update({f"song_pos_embedder.{k}": v.detach().numpy() for k, v in songpos_emb.state_dict().items()})
    sd.update({f"encoder_embedder.{k}": v.detach().numpy() for k, v in encoder_embedder.state_dict().items()})
    sd.update({f"decoder_embedder.{k}": v.detach().numpy() for k, v in decoder_embedder.state_dict().items()})

    ours_cfg = MapperatorinatorConfig(
        backbone=TransformerConfig(
            vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=1,
            encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
            max_source_positions=16, max_target_positions=16,
            num_mel_bins=32, position_scheme="rope", norm="rms",
            conv_stem=True, attention_bias=True, tie_word_embeddings=False,
        ),
        vocab_size_in=96, vocab_size_out=64,
        num_mappers=7, cond_dim=cond_dim, cond_size=cond_size,
        input_features=True, project_encoder_input=True, embed_decoder_input=True,
        do_style_embed=False, do_difficulty_embed=True,
        do_mapper_embed=True, do_song_position_embed=True,
        spectrogram_implementation="xla", spectrogram_log_scale=False,
        sample_rate=16000, n_fft=1024, n_mels=n_mels, hop_length=128,
        f_min=0, f_max=8000, pad_mode="constant",
        rhythm_token_start=17, rhythm_token_end=30, max_target_positions=16,
    )
    model = Mapperatorinator(ours_cfg)
    params = {"params": convert_mapperatorinator_state_dict(sd, ours_cfg, family="varwhisper")}

    # every converted leaf must exist in a fresh init with identical shape
    import flax

    init = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((2, 128 * 31), jnp.float32),
        decoder_input_ids=jnp.ones((2, 4), jnp.int32),
        difficulty=jnp.zeros((2,)), mapper_idx=jnp.zeros((2,), jnp.int32),
        song_position=jnp.zeros((2, 2)),
    )
    flat_init = flax.traverse_util.flatten_dict(init["params"], sep="/")
    flat_conv = flax.traverse_util.flatten_dict(params["params"], sep="/")
    # converted tree may carry extra leaves the flax init never materializes
    # (decoder.embed_tokens is unused when embed_decoder_input=True and the
    # head is untied); everything the model needs must be present
    missing = set(flat_init) - set(flat_conv)
    assert not missing, sorted(missing)
    for k in flat_init:
        assert np.asarray(flat_conv[k]).shape == np.asarray(flat_init[k]).shape, k

    # numeric parity of the full wrapper forward. Mel front-ends on both
    # sides are bypassed by feeding the mel features directly (the mel
    # kernel itself is torchaudio-parity tested in test_audio.py): torch side
    # composes the modules exactly like modeling_mapperatorinator.forward.
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 32, n_mels)).astype(np.float32)  # (B, T, M)
    ids = np.asarray([[1, 3, 4, 5], [1, 6, 7, 8]], np.int64)
    difficulty = np.asarray([3.5, 6.0], np.float32)
    mapper_idx = np.asarray([2, -1], np.int64)
    song_position = np.asarray([[0.1, 0.2], [0.8, 0.95]], np.float32)

    with torch.no_grad():
        conds = [
            diff_emb(torch.tensor(difficulty)),
            mapper_emb(torch.tensor(mapper_idx)),
            songpos_emb(torch.tensor(song_position)),
        ]
        frames_t = torch.tensor(mel)
        conds_expanded = [c.unsqueeze(1).expand((-1, frames_t.shape[1], -1)) for c in conds]
        enc_in = encoder_embedder(torch.cat([frames_t] + conds_expanded, dim=-1))
        t_enc = backbone.model.encoder(
            torch.swapaxes(enc_in, 1, 2)
        ).last_hidden_state.numpy()

    # our wrapper: encode() consumes raw audio; call the pieces with mel
    # injected at the same point instead. The ENCODER output is the numeric
    # gate — every converted embedder feeds it; the decoder stack is already
    # covered stepwise by the per-family parity tests (the reference's sdpa
    # teacher-forced path drops the causal mask, so its full-sequence decoder
    # logits are not a valid oracle — see the torch_varwhisper fixture note).
    def jax_encode(p):
        m = jnp.asarray(mel)
        conds_j = []
        conds_j.append(model.apply(
            p, jnp.asarray(difficulty), method=lambda mdl, d: mdl.difficulty_embedder(d)))
        conds_j.append(model.apply(
            p, jnp.asarray(mapper_idx, jnp.int32), method=lambda mdl, i: mdl.mapper_embedder(i)))
        conds_j.append(model.apply(
            p, jnp.asarray(song_position), method=lambda mdl, s: mdl.song_pos_embedder(s)))
        expanded = [jnp.broadcast_to(c[:, None, :], (c.shape[0], m.shape[1], c.shape[-1])) for c in conds_j]
        enc_in_j = model.apply(
            p, jnp.concatenate([m] + expanded, axis=-1),
            method=lambda mdl, x: mdl.encoder_embedder(x))
        return model.apply(p, enc_in_j, method=lambda mdl, x: mdl.transformer.encode(x))

    j_enc = np.asarray(jax_encode(params))
    assert j_enc.shape == t_enc.shape
    np.testing.assert_allclose(j_enc, t_enc, rtol=1e-3, atol=1e-3)


def test_moonshine_conversion_parity():
    """HF Moonshine (raw-wave conv stem, partial interleaved rotary,
    bias-free LayerNorms, silu gated-concat decoder MLP). The reference's own
    moonshine branch is unimportable (modeling_mapperatorinator.py:40-44);
    the oracle here is stock transformers."""
    import torch
    from transformers import MoonshineConfig, MoonshineForConditionalGeneration

    from mapperatorinator_tpu.models.convert import convert_moonshine_state_dict

    cfg = MoonshineConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=2, decoder_num_attention_heads=2,
        encoder_num_key_value_heads=2, decoder_num_key_value_heads=2,
        max_position_embeddings=64, use_cache=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        partial_rotary_factor=0.9,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    tmodel = MoonshineForConditionalGeneration(cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=64, max_target_positions=64, num_mel_bins=1,
        position_scheme="rope", norm="layer", norm_bias=False,
        attention_bias=False, mlp_bias=True,
        decoder_activation="silu", decoder_ffn_gated_concat=True,
        conv_stem=True, stem_type="moonshine", rope_partial_factor=0.9,
        tie_word_embeddings=True,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_moonshine_state_dict(sd, 2, 2, tied_head=True)}

    rng = np.random.default_rng(7)
    # raw waveform long enough for the k127/s64 stem: ~3k samples -> ~7 frames
    wave = (rng.standard_normal((2, 3072)) * 0.1).astype(np.float32)
    ids = rng.integers(3, 64, (2, 6)).astype(np.int64)
    T = ids.shape[1]

    import torch as _torch

    with _torch.no_grad():
        enc_out = tmodel.model.encoder(_torch.tensor(wave))
    t_enc = enc_out.last_hidden_state.numpy()
    j_enc = ours.apply(params, jnp.asarray(wave)[..., None], method=OsuTransformer.encode)
    np.testing.assert_allclose(np.asarray(j_enc), t_enc, rtol=3e-4, atol=3e-4)

    from transformers import DynamicCache, EncoderDecoderCache

    from transformers.modeling_outputs import BaseModelOutput

    t_logits = []
    past = EncoderDecoderCache(DynamicCache(), DynamicCache())
    with _torch.no_grad():
        for t in range(T):
            out = tmodel(
                encoder_outputs=BaseModelOutput(last_hidden_state=enc_out.last_hidden_state),
                decoder_input_ids=_torch.tensor(ids[:, t : t + 1]),
                past_key_values=past,
                use_cache=True,
            )
            past = out.past_key_values
            t_logits.append(out.logits[:, 0].numpy())
    t_out = np.stack(t_logits, axis=1)

    cache = ours.apply(params, 2, 16, j_enc, method=OsuTransformer.init_cache)
    j_logits = []
    for t in range(T):
        emb = ours.apply(params, jnp.asarray(ids[:, t : t + 1].astype(np.int32)),
                         method=OsuTransformer.embed_decoder_ids)
        logits, cache = ours.apply(params, emb, cache, t, method=OsuTransformer.decode_step)
        j_logits.append(np.asarray(logits[:, 0]))
    j_out = np.stack(j_logits, axis=1)

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, rtol=3e-4, atol=3e-4)
