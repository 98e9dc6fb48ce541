"""Full-pipeline greedy token parity vs the reference's HF
``model.generate`` composition (VERDICT r1 items 4/5): same tiny random
checkpoint, same audio, same prompt, same logit processors -> identical
token ids from the reference ``server.model_generate``
(/root/reference/osuT5/osuT5/inference/server.py:84-156) and our
``DecodeEngine.generate``, for every published backbone family.

Covers the exact composition where HF semantics bite: encoder precompute via
the composite ``get_encoder`` with conditioning, prompt handling, the
MonotonicTimeShift processor, multi-EOS stopping, and KV-cached decode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import build_vocabulary
from tests.reference_shim import import_reference_osut5

REF_CONFIGS = "/root/reference/configs"

TINY = dict(
    d_model=32,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
    encoder_ffn_dim=64,
    decoder_ffn_dim=64,
)

FAMILY = {"v28": "whisper", "v31": "ropewhisper", "v32": "varwhisper"}


@pytest.fixture(scope="module")
def ref():
    return import_reference_osut5()


def _configs(ref, name, src_len, tgt_len, tmp_path, monkeypatch):
    """Matched (ours, reference) train configs with tiny dims."""
    cfg = compose(f"{REF_CONFIGS}/train", name, schema_cls=schema.TrainConfig)
    if name != "v32":
        cfg.data.dataset_type = "none"
        cfg.data.mappers_path = ""
        cfg.data.tags_metadata_path = ""
    cfg.data.src_seq_len = src_len
    cfg.data.tgt_seq_len = tgt_len
    # both sides fp32 for exact token parity (the torch reference model is
    # built with torch.float32 below)
    cfg.mixed_precision = "no"
    cfg.model.overwrite = dict(cfg.model.overwrite or {}, **TINY)

    from tests.test_vocab import _copy_dataclass, _setup_v32

    ref_cfg = ref.config.TrainConfig()
    _copy_dataclass(cfg, ref_cfg)
    if name == "v32":
        # same local metadata files for both tokenizers (see test_vocab)
        _setup_v32(ref, cfg, ref_cfg, tmp_path, monkeypatch)
    return cfg, ref_cfg


def _patch_hub_lookups(monkeypatch):
    """Intercept every backbone-config hub fetch with local defaults
    (configuration_mapperatorinator.py:66-80 and HF generate's
    _prepare_generation_config default re-instantiation)."""
    import transformers

    from osuT5.osuT5.model.custom_transformers import NWhisperConfig, RoPEWhisperConfig
    from osuT5.osuT5.model.custom_transformers.configuration_varwhisper import VarWhisperConfig

    for cls in (
        RoPEWhisperConfig,
        VarWhisperConfig,
        NWhisperConfig,
        transformers.WhisperConfig,
        transformers.T5Config,
    ):
        monkeypatch.setattr(cls, "from_pretrained", classmethod(lambda c, name, **kw: c()))


def _mel_shim(cfg, monkeypatch):
    """torchaudio is absent here; route the reference's mel front-end through
    ours so both sides see bit-identical encoder inputs (our mel is
    torchaudio-parity tested in test_audio.py)."""
    import torch

    import osuT5.osuT5.model.modeling_mapperatorinator as ref_modeling

    from mapperatorinator_tpu.audio.mel import MelSpectrogram as OurMel

    m = cfg.model.spectrogram
    our_mel = OurMel(
        implementation="xla", log_scale=m.log_scale, sample_rate=m.sample_rate,
        n_fft=m.n_fft, n_mels=m.n_mels, hop_length=m.hop_length,
        f_min=m.f_min, f_max=m.f_max, pad_mode=m.pad_mode,
    )

    class MelShim(torch.nn.Module):
        def forward(self, x):
            out = np.asarray(our_mel(jnp.asarray(x.detach().cpu().numpy())))
            return torch.tensor(out, dtype=torch.float32)

    monkeypatch.setattr(ref_modeling, "MelSpectrogram", lambda *a, **k: MelShim())


@pytest.mark.parametrize("recipe", ["v28", "v31", "v32"])
def test_greedy_generate_token_parity(ref, recipe, tmp_path, monkeypatch):
    import torch

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    src_len, tgt_len, n_new = 64, 96, 40
    cfg, ref_cfg = _configs(ref, recipe, src_len, tgt_len, tmp_path, monkeypatch)
    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, "sdpa").eval()

    vocab = build_vocabulary(cfg)
    assert vocab.vocab_size_out == ref_tok.vocab_size_out
    assert vocab.vocab_size_in == ref_tok.vocab_size_in

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family=FAMILY[recipe])}

    # same audio, same conditioning, same prompt on both sides
    rng = np.random.default_rng(11)
    hop = cfg.model.spectrogram.hop_length
    n_samples = hop * (src_len - 1)
    frames = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
    has_cond = bool(cfg.model.do_difficulty_embed)
    difficulty = np.asarray([4.5, 6.0], np.float32)
    mapper_idx = np.asarray([-1, -1], np.int64)
    song_position = np.asarray([[0.0, 0.25], [0.25, 0.5]], np.float32)

    sos = ref_tok.sos_id
    prompt = np.asarray([[sos], [sos]], np.int64)
    attn = np.ones_like(prompt)

    # ---- reference: HF GenerationMixin greedy through server.model_generate
    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(prompt),
        decoder_attention_mask=torch.tensor(attn),
    )
    if has_cond:
        model_kwargs.update(
            difficulty=torch.tensor(difficulty),
            mapper_idx=torch.tensor(mapper_idx),
            song_position=torch.tensor(song_position),
        )
    generate_kwargs = dict(
        do_sample=False,
        num_beams=1,
        max_length=prompt.shape[1] + n_new,
        pad_token_id=ref_tok.pad_id,
        temperature=1.0,
    )
    ref_result, _ = ref_server.model_generate(ref_model, ref_tok, model_kwargs, generate_kwargs)
    ref_tokens = ref_result.numpy()  # (B, prompt + generated)

    # ---- ours: compiled while_loop decode on converted weights
    engine = DecodeEngine(model, params, max_length=prompt.shape[1] + n_new,
                          pad_token_id=vocab.pad_id)
    cond = dict(
        difficulty=jnp.asarray(difficulty),
        mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
        song_position=jnp.asarray(song_position),
    ) if has_cond else None
    enc = engine.encode_with_cond(jnp.asarray(frames), cond=cond)
    pipeline = build_logits_pipeline(vocab, temperature=1.0, do_sample=False)
    out, _lengths = engine.generate(
        enc,
        prompt.astype(np.int32),
        pipeline,
        eos_ids=get_eos_token_ids(vocab),
        seed=0,
    )

    # compare generated ids step-for-step until either side stops.
    # engine buffer layout: [left pads][prompt][generated][right pads]
    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == ref_tok.eos_id:
                break
        return ids

    for b in range(2):
        ref_gen = ref_tokens[b, prompt.shape[1]:]
        row = np.asarray(out[b]).tolist()
        start = row.index(sos) + prompt.shape[1]
        my_gen = [t for t in row[start:] if t != vocab.pad_id]
        n = min(len(ref_gen), len(my_gen))
        assert n >= 20, f"batch {b}: too few generated tokens ({n})"
        r = until_eos(ref_gen[:n])
        m = until_eos(my_gen[:n])
        assert m == r, f"batch {b}: ours {m} != reference {r}"


def _run_greedy_parity(ref, cfg, ref_cfg, family, monkeypatch, attn="sdpa",
                       normalize_weights=False, n_new=40, seed=11):
    """Shared greedy-parity recipe: same random checkpoint on both sides,
    reference HF generate via server.model_generate vs our compiled decode."""
    import torch

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, attn).eval()
    if normalize_weights:
        # with manual_norm_weights the reference renormalizes at startup and
        # after every optimizer step (osuT5/train.py:105-108); real
        # checkpoints therefore always carry unit-norm rows
        ref_model.transformer.norm_weights_()

    vocab = build_vocabulary(cfg)
    assert vocab.vocab_size_out == ref_tok.vocab_size_out
    assert vocab.vocab_size_in == ref_tok.vocab_size_in

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family=family)}

    rng = np.random.default_rng(seed)
    hop = cfg.model.spectrogram.hop_length
    src_len = cfg.data.src_seq_len
    frames = (rng.standard_normal((2, hop * (src_len - 1))) * 0.1).astype(np.float32)
    has_cond = bool(cfg.model.do_difficulty_embed)
    difficulty = np.asarray([4.5, 6.0], np.float32)
    mapper_idx = np.asarray([-1, -1], np.int64)
    song_position = np.asarray([[0.0, 0.25], [0.25, 0.5]], np.float32)

    sos = ref_tok.sos_id
    prompt = np.asarray([[sos], [sos]], np.int64)
    attn_mask = np.ones_like(prompt)

    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(prompt),
        decoder_attention_mask=torch.tensor(attn_mask),
    )
    if has_cond:
        model_kwargs.update(
            difficulty=torch.tensor(difficulty),
            mapper_idx=torch.tensor(mapper_idx),
            song_position=torch.tensor(song_position),
        )
    generate_kwargs = dict(
        do_sample=False, num_beams=1,
        max_length=prompt.shape[1] + n_new,
        pad_token_id=ref_tok.pad_id, temperature=1.0,
    )
    ref_result, _ = ref_server.model_generate(ref_model, ref_tok, model_kwargs, generate_kwargs)
    ref_tokens = ref_result.numpy()

    engine = DecodeEngine(model, params, max_length=prompt.shape[1] + n_new,
                          pad_token_id=vocab.pad_id)
    cond = dict(
        difficulty=jnp.asarray(difficulty),
        mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
        song_position=jnp.asarray(song_position),
    ) if has_cond else None
    enc = engine.encode_with_cond(jnp.asarray(frames), cond=cond)
    pipeline = build_logits_pipeline(vocab, temperature=1.0, do_sample=False)
    out, _ = engine.generate(enc, prompt.astype(np.int32), pipeline,
                             eos_ids=get_eos_token_ids(vocab), seed=0)

    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == ref_tok.eos_id:
                break
        return ids

    for b in range(2):
        ref_gen = ref_tokens[b, prompt.shape[1]:]
        row = np.asarray(out[b]).tolist()
        start = row.index(sos) + prompt.shape[1]
        my_gen = [t for t in row[start:] if t != vocab.pad_id]
        n = min(len(ref_gen), len(my_gen))
        assert n >= 16, f"batch {b}: too few generated tokens ({n})"
        r = until_eos(ref_gen[:n])
        m = until_eos(my_gen[:n])
        assert m == r, f"batch {b}: ours {m} != reference {r}"


@pytest.mark.slow
def test_deep_long_greedy_generate_token_parity(ref, tmp_path, monkeypatch):
    """Deeper model + longer horizon than the tiny cases (VERDICT r2 weak 4):
    4+4 layers at d64 generating 96 tokens — cache/rotary drift compounds
    with depth and length, so this catches what 2-layer/40-token runs
    miss."""
    src_len, tgt_len = 64, 160
    cfg, ref_cfg = _configs(ref, "v32", src_len, tgt_len, tmp_path, monkeypatch)
    deep = dict(
        d_model=64, encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
    )
    cfg.model.overwrite = dict(cfg.model.overwrite or {}, **deep)
    ref_cfg.model.overwrite = dict(ref_cfg.model.overwrite or {}, **deep)
    _run_greedy_parity(ref, cfg, ref_cfg, "varwhisper", monkeypatch, n_new=96, seed=23)


def test_nwhisper_greedy_generate_token_parity(ref, tmp_path, monkeypatch):
    """nGPT hypersphere family through the reference's legacy v27 recipe
    (configs/train/legacy/v27.yaml). sdpa oracle — the reference's eager path
    drops the sqrt(d) attention scale (modeling_nwhisper.py:502,785)."""
    src_len, tgt_len = 64, 96
    cfg, ref_cfg = _configs(ref, "legacy/v27", src_len, tgt_len, tmp_path, monkeypatch)
    # the yaml's lowercase name misses the reference's case-sensitive
    # dispatch (modeling_mapperatorinator.py:25); published checkpoints use
    # the canonical casing
    cfg.model.name = ref_cfg.model.name = "OliBomby/nwhisper-base"
    _run_greedy_parity(ref, cfg, ref_cfg, "nwhisper", monkeypatch,
                       normalize_weights=True, seed=13)


def test_t5_greedy_generate_token_parity(monkeypatch):
    """T5 v1.1 backbone greedy decode vs stock HF generate. The reference's
    own T5-through-wrapper generate path is unrunnable with current
    transformers (OsuTEncoder passes inputs_embeds POSITIONALLY as T5Stack's
    input_ids — modeling_mapperatorinator.py:439), so the oracle is
    T5ForConditionalGeneration.generate. T5's relative-position bias is
    recomputed per decode step, exactly where a cached-decode port
    diverges."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import LogitsPipeline
    from mapperatorinator_tpu.models.convert import convert_t5_state_dict
    from mapperatorinator_tpu.models.transformer import OsuTransformer, TransformerConfig

    hf_cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        use_cache=True, pad_token_id=0, eos_token_id=2, decoder_start_token_id=1,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    tmodel = T5ForConditionalGeneration(hf_cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
        head_dim_override=8, activation="gelu_tanh",
        max_source_positions=16, max_target_positions=64, num_mel_bins=32,
        position_scheme="t5_relpos", norm="rms", norm_eps=1e-6,
        attention_bias=False, attention_scale=False, mlp_bias=False, ffn_gated=True,
        conv_stem=False, tie_word_embeddings=False, pad_token_id=0,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_t5_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(17)
    n_new = 24
    feats = rng.standard_normal((2, 12, 32)).astype(np.float32)
    prompt = np.asarray([[1, 5], [1, 9]], np.int64)

    with torch.no_grad():
        ref_out = tmodel.generate(
            inputs_embeds=torch.tensor(feats),
            decoder_input_ids=torch.tensor(prompt),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
        ).numpy()

    engine = DecodeEngine(ours, params, max_length=prompt.shape[1] + n_new, pad_token_id=0)
    enc = engine.encode(jnp.asarray(feats))
    # a pass-through pipeline: no time-shift masking, no sampling
    pipeline = LogitsPipeline(vocab_size=64, time_start=0, time_end=0,
                              sos_ids=(), eos_ids=(2,), do_sample=False)
    out, _ = engine.generate(enc, prompt.astype(np.int32), pipeline, eos_ids=[2], seed=0)

    # HF generate with inputs_embeds returns only the GENERATED ids for
    # encoder-decoder models when decoder_input_ids are given explicitly —
    # align by comparing the generated continuation. Token id 0 doubles as a
    # legitimately generated id on random weights, so compare by position
    # (never filter zeros out of the middle of the row).
    for b in range(2):
        ref_row = ref_out[b].tolist()
        ref_gen = ref_row[prompt.shape[1]:] if ref_row[: prompt.shape[1]] == prompt[b].tolist() else ref_row

        def until_eos(seq):
            ids = []
            for t in seq:
                ids.append(int(t))
                if t == 2:
                    break
            return ids

        r = until_eos(ref_gen)
        row = np.asarray(out[b]).tolist()
        start = row.index(int(prompt[b, 0])) + prompt.shape[1]
        my_gen = row[start : start + len(r)]
        assert len(r) >= 12, f"batch {b}: too few generated tokens ({len(r)})"
        assert until_eos(my_gen) == r


def test_moonshine_greedy_generate_token_parity(monkeypatch):
    """Moonshine backbone greedy decode vs stock HF generate. The reference's
    own moonshine branch is unimportable (modeling_mapperatorinator.py:40-44),
    so the oracle is transformers' MoonshineForConditionalGeneration — this
    still exercises the cached partial-interleaved-rotary stepping and
    stopping where the family would diverge."""
    import torch
    from transformers import MoonshineConfig, MoonshineForConditionalGeneration

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import LogitsPipeline
    from mapperatorinator_tpu.models.convert import convert_moonshine_state_dict
    from mapperatorinator_tpu.models.transformer import OsuTransformer, TransformerConfig

    hf_cfg = MoonshineConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=2, decoder_num_attention_heads=2,
        encoder_num_key_value_heads=2, decoder_num_key_value_heads=2,
        max_position_embeddings=64, use_cache=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        partial_rotary_factor=0.9,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    tmodel = MoonshineForConditionalGeneration(hf_cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=64, max_target_positions=64, num_mel_bins=1,
        position_scheme="rope", norm="layer", norm_bias=False,
        attention_bias=False, mlp_bias=True,
        decoder_activation="silu", decoder_ffn_gated_concat=True,
        conv_stem=True, stem_type="moonshine", rope_partial_factor=0.9,
        tie_word_embeddings=False, pad_token_id=0,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_moonshine_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(19)
    n_new = 24
    wave = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
    prompt = np.asarray([[1, 5], [1, 9]], np.int64)

    with torch.no_grad():
        ref_out = tmodel.generate(
            input_values=torch.tensor(wave),
            decoder_input_ids=torch.tensor(prompt),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
        ).numpy()

    engine = DecodeEngine(ours, params, max_length=prompt.shape[1] + n_new, pad_token_id=0)
    enc = engine.encode(jnp.asarray(wave)[..., None])
    # a pass-through pipeline: no time-shift masking, no sampling
    pipeline = LogitsPipeline(vocab_size=64, time_start=0, time_end=0,
                              sos_ids=(), eos_ids=(2,), do_sample=False)
    out, _ = engine.generate(enc, prompt.astype(np.int32), pipeline, eos_ids=[2], seed=0)

    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == 2:
                break
        return ids

    # Token id 0 doubles as a legitimately generated id on random weights, so
    # compare by position (never filter zeros out of the middle of the row) —
    # same rule as the t5 test above.
    for b in range(2):
        ref_gen = until_eos(ref_out[b, prompt.shape[1]:])
        row = np.asarray(out[b]).tolist()
        start = row.index(int(prompt[b, 0])) + prompt.shape[1]
        my_gen = row[start : start + len(ref_gen)]
        assert len(ref_gen) >= 12, f"batch {b}: too few generated tokens ({len(ref_gen)})"
        assert until_eos(my_gen) == ref_gen


def test_cfg_generate_token_parity(ref, tmp_path, monkeypatch):
    """Classifier-free-guidance decode: the reference drives HF generate with
    a negative_prompt overlay + ClassifierFreeGuidanceLogitsProcessor
    (modeling_mapperatorinator.py:230-271, server.py:105-108); our engine
    folds the dual batch [negative; positive] inside one while_loop. Token
    ids must match under greedy."""
    import torch

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    recipe = "v31"
    src_len, tgt_len, n_new = 64, 96, 32
    cfg, ref_cfg = _configs(ref, recipe, src_len, tgt_len, tmp_path, monkeypatch)
    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, "sdpa").eval()
    vocab = build_vocabulary(cfg)

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family="ropewhisper")}

    rng = np.random.default_rng(21)
    hop = cfg.model.spectrogram.hop_length
    frames = (rng.standard_normal((1, hop * (src_len - 1))) * 0.1).astype(np.float32)
    difficulty = np.asarray([4.0], np.float32)
    mapper_idx = np.asarray([-1], np.int64)
    song_position = np.asarray([[0.0, 0.3]], np.float32)

    sos = ref_tok.sos_id
    # positive and negative prompts differ in one conditioning token
    pos_prompt = np.asarray([[sos, sos + 1, sos + 2]], np.int64)
    neg_prompt = np.asarray([[sos, sos + 3, sos + 2]], np.int64)
    attn = np.ones_like(pos_prompt)
    cfg_scale = 1.5

    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(pos_prompt),
        decoder_attention_mask=torch.tensor(attn),
        negative_prompt=torch.tensor(neg_prompt),
        negative_prompt_attention_mask=torch.tensor(attn),
        difficulty=torch.tensor(difficulty),
        mapper_idx=torch.tensor(mapper_idx),
        song_position=torch.tensor(song_position),
    )
    generate_kwargs = dict(
        do_sample=False, num_beams=1,
        max_length=pos_prompt.shape[1] + n_new,
        pad_token_id=ref_tok.pad_id, temperature=1.0, cfg_scale=cfg_scale,
    )
    ref_result, _ = ref_server.model_generate(ref_model, ref_tok, model_kwargs, generate_kwargs)
    ref_tokens = ref_result.numpy()

    engine = DecodeEngine(model, params, max_length=pos_prompt.shape[1] + n_new,
                          pad_token_id=vocab.pad_id)
    enc = engine.encode_with_cond(
        jnp.asarray(frames),
        cond=dict(
            difficulty=jnp.asarray(difficulty),
            mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
            song_position=jnp.asarray(song_position),
        ),
    )
    enc2 = jnp.concatenate([enc, enc], axis=0)
    prompts = np.concatenate([neg_prompt, pos_prompt], axis=0).astype(np.int32)
    pipeline = build_logits_pipeline(vocab, temperature=1.0, do_sample=False)
    out, _ = engine.generate(
        enc2, prompts, pipeline, eos_ids=get_eos_token_ids(vocab),
        seed=0, cfg_scale=cfg_scale,
    )
    my_row = np.asarray(out[1]).tolist()  # positive half

    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == ref_tok.eos_id:
                break
        return ids

    ref_gen = until_eos(ref_tokens[0, pos_prompt.shape[1]:])
    start = my_row.index(sos) + pos_prompt.shape[1]
    my_gen = until_eos([t for t in my_row[start:] if t != vocab.pad_id])
    n = min(len(ref_gen), len(my_gen))
    assert n >= 16
    assert my_gen[:n] == ref_gen[:n], f"ours {my_gen[:n]} != reference {ref_gen[:n]}"


def test_beam_search_token_parity(ref, tmp_path, monkeypatch):
    """num_beams=2 greedy beam search vs the reference's HF GenerationMixin
    beam path (server.model_generate with num_beams; used by the super-timing
    generator when timer_num_beams > 1). Final hypotheses must match."""
    import torch

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    recipe = "v31"
    src_len, tgt_len, n_new = 64, 96, 24
    cfg, ref_cfg = _configs(ref, recipe, src_len, tgt_len, tmp_path, monkeypatch)
    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, "sdpa").eval()
    vocab = build_vocabulary(cfg)

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family="ropewhisper")}

    rng = np.random.default_rng(31)
    hop = cfg.model.spectrogram.hop_length
    frames = (rng.standard_normal((1, hop * (src_len - 1))) * 0.1).astype(np.float32)
    difficulty = np.asarray([5.0], np.float32)
    mapper_idx = np.asarray([-1], np.int64)
    song_position = np.asarray([[0.1, 0.4]], np.float32)

    sos = ref_tok.sos_id
    prompt = np.asarray([[sos]], np.int64)
    attn = np.ones_like(prompt)

    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(prompt),
        decoder_attention_mask=torch.tensor(attn),
        difficulty=torch.tensor(difficulty),
        mapper_idx=torch.tensor(mapper_idx),
        song_position=torch.tensor(song_position),
    )
    generate_kwargs = dict(
        do_sample=False, num_beams=2,
        max_length=prompt.shape[1] + n_new,
        pad_token_id=ref_tok.pad_id, temperature=1.0,
    )
    ref_result, _ = ref_server.model_generate(ref_model, ref_tok, model_kwargs, generate_kwargs)
    ref_tokens = ref_result.numpy()

    engine = DecodeEngine(model, params, max_length=prompt.shape[1] + n_new,
                          pad_token_id=vocab.pad_id)
    enc = engine.encode_with_cond(
        jnp.asarray(frames),
        cond=dict(
            difficulty=jnp.asarray(difficulty),
            mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
            song_position=jnp.asarray(song_position),
        ),
    )
    pipeline = build_logits_pipeline(vocab, temperature=1.0, do_sample=False)
    out, _ = engine.generate_beams(
        enc, prompt.astype(np.int32), pipeline,
        eos_ids=get_eos_token_ids(vocab), num_beams=2, seed=0,
    )

    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == ref_tok.eos_id:
                break
        return ids

    ref_gen = until_eos(ref_tokens[0, prompt.shape[1]:])
    row = np.asarray(out[0]).tolist()
    start = row.index(sos) + prompt.shape[1]
    my_gen = until_eos([t for t in row[start:] if t != vocab.pad_id])
    n = min(len(ref_gen), len(my_gen))
    assert n >= 12
    assert my_gen[:n] == ref_gen[:n], f"ours {my_gen[:n]} != reference {ref_gen[:n]}"


def test_beam_cfg_generate_token_parity(ref, tmp_path, monkeypatch):
    """num_beams=2 + classifier-free guidance combined — the reference sizes
    the cache batch*beams*2 and lets HF generate run CFG inside beam search
    (cache_utils.py:23-35); our beam loop folds the dual halves."""
    import torch

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    recipe = "v31"
    src_len, tgt_len, n_new = 64, 96, 20
    cfg, ref_cfg = _configs(ref, recipe, src_len, tgt_len, tmp_path, monkeypatch)
    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, "sdpa").eval()
    vocab = build_vocabulary(cfg)

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family="ropewhisper")}

    rng = np.random.default_rng(41)
    hop = cfg.model.spectrogram.hop_length
    frames = (rng.standard_normal((1, hop * (src_len - 1))) * 0.1).astype(np.float32)
    difficulty = np.asarray([5.5], np.float32)
    mapper_idx = np.asarray([-1], np.int64)
    song_position = np.asarray([[0.2, 0.5]], np.float32)

    sos = ref_tok.sos_id
    pos_prompt = np.asarray([[sos, sos + 1]], np.int64)
    neg_prompt = np.asarray([[sos, sos + 4]], np.int64)
    attn = np.ones_like(pos_prompt)
    cfg_scale = 1.5

    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(pos_prompt),
        decoder_attention_mask=torch.tensor(attn),
        negative_prompt=torch.tensor(neg_prompt),
        negative_prompt_attention_mask=torch.tensor(attn),
        difficulty=torch.tensor(difficulty),
        mapper_idx=torch.tensor(mapper_idx),
        song_position=torch.tensor(song_position),
    )
    generate_kwargs = dict(
        do_sample=False, num_beams=2,
        max_length=pos_prompt.shape[1] + n_new,
        pad_token_id=ref_tok.pad_id, temperature=1.0, cfg_scale=cfg_scale,
    )
    ref_result, _ = ref_server.model_generate(ref_model, ref_tok, model_kwargs, generate_kwargs)
    ref_tokens = ref_result.numpy()

    engine = DecodeEngine(model, params, max_length=pos_prompt.shape[1] + n_new,
                          pad_token_id=vocab.pad_id)
    enc = engine.encode_with_cond(
        jnp.asarray(frames),
        cond=dict(
            difficulty=jnp.asarray(difficulty),
            mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
            song_position=jnp.asarray(song_position),
        ),
    )
    enc2 = jnp.concatenate([enc, enc], axis=0)
    prompts = np.concatenate([neg_prompt, pos_prompt], axis=0).astype(np.int32)
    pipeline = build_logits_pipeline(vocab, temperature=1.0, do_sample=False)
    out, _ = engine.generate_beams(
        enc2, prompts, pipeline, eos_ids=get_eos_token_ids(vocab),
        num_beams=2, seed=0, cfg_scale=cfg_scale,
    )
    assert out.shape[0] == 1  # positive-half best hypothesis only

    def until_eos(seq):
        ids = []
        for t in seq:
            ids.append(int(t))
            if t == ref_tok.eos_id:
                break
        return ids

    ref_gen = until_eos(ref_tokens[0, pos_prompt.shape[1]:])
    row = np.asarray(out[0]).tolist()
    start = row.index(sos) + pos_prompt.shape[1]
    my_gen = until_eos([t for t in row[start:] if t != vocab.pad_id])
    n = min(len(ref_gen), len(my_gen))
    assert n >= 10
    assert my_gen[:n] == ref_gen[:n], f"ours {my_gen[:n]} != reference {ref_gen[:n]}"


# ---------------------------------------------------------------------------
# Sampled-path parity (VERDICT r3 item 7). Exact torch-RNG equality is
# impossible cross-framework, so the default do_sample path (temperature 0.9 /
# top_p 0.9, configs/inference/v32.yaml:11-14) is pinned at the multinomial
# INPUT instead: run HF sampled generate capturing its per-step processed
# scores, replay HF's sampled tokens through our engine's forced-decode mode
# (same incremental KV-cached path + logits pipeline), then (a) the processed
# scores must match — same top-p support set, same values — and (b) drawing
# torch.multinomial from OUR scores with HF's RNG stream must reproduce HF's
# sampled tokens exactly.
# ---------------------------------------------------------------------------


def _assert_sampled_scores_match(hf_tokens, hf_scores, my_scores, prompt_len,
                                 eos_ids, rng_seed, *, atol=1e-3):
    import torch

    B, T, V = hf_scores.shape
    assert my_scores.shape == (B, T, V)

    # (a) processed-scores parity: identical top-p support, close kept values
    hf_cut = np.isneginf(hf_scores)
    my_cut = np.isneginf(my_scores)
    mismatched_support = (hf_cut != my_cut).sum()
    assert mismatched_support == 0, (
        f"top-p support sets differ at {mismatched_support} positions")
    keep = ~hf_cut
    max_diff = np.abs(hf_scores[keep] - my_scores[keep]).max()
    assert max_diff < atol, f"kept processed scores differ by {max_diff}"

    # (b) HF-sampling-order redraw from OUR scores == HF's sampled tokens
    torch.manual_seed(rng_seed)
    finished = np.zeros(B, bool)
    eos_arr = np.asarray(list(eos_ids))
    for t in range(T):
        probs = torch.softmax(torch.tensor(my_scores[:, t]), dim=-1)
        draw = torch.multinomial(probs, num_samples=1)[:, 0].numpy()
        expect = hf_tokens[:, prompt_len + t]
        live = ~finished
        assert (draw[live] == expect[live]).all(), (
            f"step {t}: redraw {draw[live]} != HF {expect[live]}")
        finished |= np.isin(expect, eos_arr)


def _run_sampled_parity(ref, cfg, ref_cfg, family, monkeypatch, attn="sdpa",
                        normalize_weights=False, n_new=40, seed=11,
                        rng_seed=123, temperature=0.9, top_p=0.9):
    """Sampled-parity recipe for the wrapper families: HF sampled generate
    with the reference's processor assembly (server.py:105-134) vs our
    forced-decode scores."""
    import torch
    from transformers import LogitsProcessorList, TemperatureLogitsWarper

    from osuT5.osuT5.inference import server as ref_server
    from osuT5.osuT5.inference.logit_processors import MonotonicTimeShiftLogitsProcessor
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    _mel_shim(cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_cfg, ref_tok, torch.float32, attn).eval()
    if normalize_weights:
        ref_model.transformer.norm_weights_()

    vocab = build_vocabulary(cfg)
    assert vocab.vocab_size_out == ref_tok.vocab_size_out

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family=family)}

    rng = np.random.default_rng(seed)
    hop = cfg.model.spectrogram.hop_length
    frames = (rng.standard_normal((2, hop * (cfg.data.src_seq_len - 1))) * 0.1).astype(np.float32)
    has_cond = bool(cfg.model.do_difficulty_embed)
    difficulty = np.asarray([4.5, 6.0], np.float32)
    mapper_idx = np.asarray([-1, -1], np.int64)
    song_position = np.asarray([[0.0, 0.25], [0.25, 0.5]], np.float32)

    sos = ref_tok.sos_id
    prompt = np.asarray([[sos], [sos]], np.int64)

    model_kwargs = dict(
        inputs=torch.tensor(frames),
        decoder_input_ids=torch.tensor(prompt),
        decoder_attention_mask=torch.ones_like(torch.tensor(prompt)),
    )
    if has_cond:
        model_kwargs.update(
            difficulty=torch.tensor(difficulty),
            mapper_idx=torch.tensor(mapper_idx),
            song_position=torch.tensor(song_position),
        )

    # the reference's processor assembly for the default sampled path:
    # custom [monotonic, temperature], HF appends the top-p warper after
    processors = LogitsProcessorList([
        MonotonicTimeShiftLogitsProcessor(ref_tok),
        TemperatureLogitsWarper(temperature),
    ])
    eos_ids = ref_server.get_eos_token_id(ref_tok)
    torch.manual_seed(rng_seed)
    with torch.no_grad():
        out = ref_model.generate(
            **model_kwargs,
            do_sample=True, num_beams=1, top_p=top_p, top_k=0,
            max_length=prompt.shape[1] + n_new,
            pad_token_id=ref_tok.pad_id,
            use_cache=True,
            logits_processor=processors,
            eos_token_id=eos_ids,
            output_scores=True, return_dict_in_generate=True,
        )
    hf_tokens = out.sequences.numpy()
    hf_scores = torch.stack(out.scores, dim=1).numpy()  # (B, T, V) processed
    T = hf_scores.shape[1]
    P = prompt.shape[1]

    engine = DecodeEngine(model, params, max_length=P + n_new, pad_token_id=vocab.pad_id)
    cond = dict(
        difficulty=jnp.asarray(difficulty),
        mapper_idx=jnp.asarray(mapper_idx, jnp.int32),
        song_position=jnp.asarray(song_position),
    ) if has_cond else None
    enc = engine.encode_with_cond(jnp.asarray(frames), cond=cond)
    pipeline = build_logits_pipeline(vocab, temperature=temperature, top_p=top_p, do_sample=True)
    my_scores = engine.generate_forced(
        enc, prompt.astype(np.int32), pipeline, hf_tokens[:, P:P + T])

    assert T >= 16, f"too few sampled steps captured ({T})"
    _assert_sampled_scores_match(hf_tokens, hf_scores, my_scores, P,
                                 eos_ids if isinstance(eos_ids, list) else [eos_ids],
                                 rng_seed)


@pytest.mark.parametrize("recipe", ["v28", "v31", "v32"])
def test_sampled_generate_parity(ref, recipe, tmp_path, monkeypatch):
    src_len, tgt_len = 64, 96
    cfg, ref_cfg = _configs(ref, recipe, src_len, tgt_len, tmp_path, monkeypatch)
    _run_sampled_parity(ref, cfg, ref_cfg, FAMILY[recipe], monkeypatch)


def test_nwhisper_sampled_generate_parity(ref, tmp_path, monkeypatch):
    src_len, tgt_len = 64, 96
    cfg, ref_cfg = _configs(ref, "legacy/v27", src_len, tgt_len, tmp_path, monkeypatch)
    cfg.model.name = ref_cfg.model.name = "OliBomby/nwhisper-base"
    _run_sampled_parity(ref, cfg, ref_cfg, "nwhisper", monkeypatch,
                        normalize_weights=True, seed=13)


def test_t5_sampled_generate_parity(monkeypatch):
    """Stock-HF-oracle sampled parity for the t5 family (same rationale as
    the greedy test: the reference's own T5-through-wrapper path is
    unrunnable)."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import LogitsPipeline
    from mapperatorinator_tpu.models.convert import convert_t5_state_dict
    from mapperatorinator_tpu.models.transformer import OsuTransformer, TransformerConfig

    hf_cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        use_cache=True, pad_token_id=0, eos_token_id=2, decoder_start_token_id=1,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    tmodel = T5ForConditionalGeneration(hf_cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
        head_dim_override=8, activation="gelu_tanh",
        max_source_positions=16, max_target_positions=64, num_mel_bins=32,
        position_scheme="t5_relpos", norm="rms", norm_eps=1e-6,
        attention_bias=False, attention_scale=False, mlp_bias=False, ffn_gated=True,
        conv_stem=False, tie_word_embeddings=False, pad_token_id=0,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_t5_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(17)
    n_new, rng_seed = 24, 123
    feats = rng.standard_normal((2, 12, 32)).astype(np.float32)
    prompt = np.asarray([[1, 5], [1, 9]], np.int64)

    torch.manual_seed(rng_seed)
    with torch.no_grad():
        out = tmodel.generate(
            inputs_embeds=torch.tensor(feats),
            decoder_input_ids=torch.tensor(prompt),
            max_new_tokens=n_new, do_sample=True, num_beams=1,
            temperature=0.9, top_p=0.9, top_k=0,
            output_scores=True, return_dict_in_generate=True,
        )
    # HF returns only the continuation for encoder-decoder inputs_embeds
    seq = out.sequences.numpy()
    gen = seq[:, prompt.shape[1]:] if seq.shape[1] > len(out.scores) else seq
    hf_scores = torch.stack(out.scores, dim=1).numpy()
    T = hf_scores.shape[1]

    engine = DecodeEngine(ours, params, max_length=prompt.shape[1] + n_new, pad_token_id=0)
    enc = engine.encode(jnp.asarray(feats))
    pipeline = LogitsPipeline(vocab_size=64, time_start=0, time_end=0,
                              sos_ids=(), eos_ids=(2,), temperature=0.9,
                              top_p=0.9, do_sample=True)
    my_scores = engine.generate_forced(enc, prompt.astype(np.int32), pipeline, gen[:, :T])

    full = np.concatenate([prompt, gen[:, :T]], axis=1)
    _assert_sampled_scores_match(full, hf_scores, my_scores, prompt.shape[1], [2], rng_seed)


def test_moonshine_sampled_generate_parity(monkeypatch):
    """Stock-HF-oracle sampled parity for the moonshine family."""
    import torch
    from transformers import MoonshineConfig, MoonshineForConditionalGeneration

    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import LogitsPipeline
    from mapperatorinator_tpu.models.convert import convert_moonshine_state_dict
    from mapperatorinator_tpu.models.transformer import OsuTransformer, TransformerConfig

    hf_cfg = MoonshineConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
        encoder_num_attention_heads=2, decoder_num_attention_heads=2,
        encoder_num_key_value_heads=2, decoder_num_key_value_heads=2,
        max_position_embeddings=64, use_cache=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        partial_rotary_factor=0.9,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    tmodel = MoonshineForConditionalGeneration(hf_cfg).eval()

    ours = OsuTransformer(TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=64, max_target_positions=64, num_mel_bins=1,
        position_scheme="rope", norm="layer", norm_bias=False,
        attention_bias=False, mlp_bias=True,
        decoder_activation="silu", decoder_ffn_gated_concat=True,
        conv_stem=True, stem_type="moonshine", rope_partial_factor=0.9,
        tie_word_embeddings=False, pad_token_id=0,
    ))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": convert_moonshine_state_dict(sd, 2, 2, tied_head=False)}

    rng = np.random.default_rng(19)
    n_new, rng_seed = 24, 123
    wave = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
    prompt = np.asarray([[1, 5], [1, 9]], np.int64)

    torch.manual_seed(rng_seed)
    with torch.no_grad():
        out = tmodel.generate(
            input_values=torch.tensor(wave),
            decoder_input_ids=torch.tensor(prompt),
            max_new_tokens=n_new, do_sample=True, num_beams=1,
            temperature=0.9, top_p=0.9, top_k=0,
            output_scores=True, return_dict_in_generate=True,
        )
    seq = out.sequences.numpy()
    hf_scores = torch.stack(out.scores, dim=1).numpy()
    T = hf_scores.shape[1]
    gen = seq[:, prompt.shape[1]:]

    engine = DecodeEngine(ours, params, max_length=prompt.shape[1] + n_new, pad_token_id=0)
    enc = engine.encode(jnp.asarray(wave)[..., None])
    pipeline = LogitsPipeline(vocab_size=64, time_start=0, time_end=0,
                              sos_ids=(), eos_ids=(2,), temperature=0.9,
                              top_p=0.9, do_sample=True)
    my_scores = engine.generate_forced(enc, prompt.astype(np.int32), pipeline, gen[:, :T])

    _assert_sampled_scores_match(seq, hf_scores, my_scores, prompt.shape[1], [2], rng_seed)
