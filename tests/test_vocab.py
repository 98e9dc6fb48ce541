"""Vocabulary/tokenizer parity tests against the reference implementation."""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import ContextType, Event, EventType, Vocabulary, build_vocabulary
from tests.reference_shim import import_reference_osut5

REF_CONFIGS = "/root/reference/configs"


@pytest.fixture(scope="module")
def ref():
    return import_reference_osut5()


def _ref_train_config(ref, name: str):
    """Build the reference TrainConfig matching our composed config."""
    cfg = compose(f"{REF_CONFIGS}/train", name, schema_cls=schema.TrainConfig)
    ref_cfg = ref.config.TrainConfig()
    _copy_dataclass(cfg, ref_cfg)
    return cfg, ref_cfg


def _copy_dataclass(src, dst):
    import dataclasses

    for f in dataclasses.fields(dst):
        if not hasattr(src, f.name):
            continue
        sv = getattr(src, f.name)
        dv = getattr(dst, f.name)
        if dataclasses.is_dataclass(dv) and not isinstance(dv, type):
            _copy_dataclass(sv, dv)
        else:
            if f.name == "context_types":
                sv = [
                    {
                        "in": [ref_ct(ref=None, ct=c) for c in e["in"]],
                        "out": [ref_ct(ref=None, ct=c) for c in e["out"]],
                    }
                    if isinstance(e, dict)
                    else e
                    for e in sv
                ]
            setattr(dst, f.name, sv)


def ref_ct(ref, ct):
    # our ContextType and the reference's are distinct enum classes with
    # equal .value strings; reference code does ContextType(x) so pass value
    import osuT5.osuT5.event as ref_event

    return ref_event.ContextType(ct.value if hasattr(ct, "value") else ct)


@pytest.mark.parametrize("name", ["v28", "v29", "v30", "v31", "v32"])
def test_vocab_layout_matches_reference(ref, name, tmp_path, monkeypatch):
    cfg, ref_cfg = _ref_train_config(ref, name)
    if name == "v32":
        # v32 sizes mapper/descriptor ranges from dataset metadata; feed both
        # implementations the same local files (no network).
        import json

        mappers = tmp_path / "mappers.json"
        mappers.write_text(json.dumps({"101": 11, "102": 22, "103": 11, "104": 33}))
        for c in (cfg, ref_cfg):
            c.data.mappers_path = str(mappers)
            c.data.tags_metadata_path = "/root/repo/datasets/tags_2026.json"
        # skip the reference's HF-dataset descriptor scan (network); it does
        # not affect vocab layout, only per-beatmap lookup tables.
        monkeypatch.setattr(
            ref.tokenizer.Tokenizer,
            "_init_descriptor_idx_web",
            lambda self, args: self._init_user_tag_idx(args),
        )
    else:
        ref_cfg.data.dataset_type = "none"  # skip metadata loading paths
        cfg.data.dataset_type = "none"
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    vocab = build_vocabulary(cfg)

    assert vocab.offset == ref_tok.offset
    assert vocab.vocab_size_out == ref_tok.vocab_size_out
    assert vocab.vocab_size_in == ref_tok.vocab_size_in
    assert {k.value: v for k, v in vocab.context_sos.items()} == {
        k.value: v for k, v in ref_tok.context_sos.items()
    }
    assert {k.value: v for k, v in vocab.event_start.items()} == {
        k.value: v for k, v in ref_tok.event_start.items()
    }
    assert {k.value: v for k, v in vocab.event_end.items()} == {
        k.value: v for k, v in ref_tok.event_end.items()
    }

    # every id decodes identically
    for token_id in range(vocab.offset, vocab.vocab_size_in):
        ev = vocab.decode(token_id)
        rev = ref_tok.decode(token_id)
        assert ev.type.value == rev.type.value and ev.value == rev.value, token_id

    # encode round trip
    for token_id in range(vocab.offset, vocab.vocab_size_in):
        assert vocab.encode(vocab.decode(token_id)) == token_id


def _setup_v32(ref, cfg, ref_cfg, tmp_path, monkeypatch):
    import json

    mappers = tmp_path / "mappers.json"
    mappers.write_text(json.dumps({"101": 11, "102": 22, "103": 11, "104": 33}))
    for c in (cfg, ref_cfg):
        if c is None:
            continue
        c.data.mappers_path = str(mappers)
        c.data.tags_metadata_path = "/root/repo/datasets/tags_2026.json"
    if ref is not None:
        monkeypatch.setattr(
            ref.tokenizer.Tokenizer,
            "_init_descriptor_idx_web",
            lambda self, args: self._init_user_tag_idx(args),
        )


def test_vocab_encoders_match_reference(ref, tmp_path, monkeypatch):
    cfg, ref_cfg = _ref_train_config(ref, "v32")
    _setup_v32(ref, cfg, ref_cfg, tmp_path, monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    vocab = build_vocabulary(cfg)

    for d in [0.0, 1.3, 4.5, 9.99, 11.9, 15.0]:
        assert vocab.encode_diff(d) == ref_tok.encode_diff(d)
    assert vocab.diff_unk == ref_tok.diff_unk
    for cs in [0.0, 3.5, 4.0, 7.2, 10.0]:
        assert vocab.encode_cs(cs) == ref_tok.encode_cs(cs)
    assert vocab.cs_unk == ref_tok.cs_unk
    for y in [2007, 2015, 2024]:
        assert vocab.encode_year(y) == ref_tok.encode_year(y)
    assert vocab.year_unk == ref_tok.year_unk
    for sl in [0, 35000, 180000, 599999, 2000000]:
        assert vocab.encode_song_length(sl) == ref_tok.encode_song_length(sl)
    for sp in [0, 1000, 90000, 180000]:
        assert vocab.encode_song_position(sp, 180000) == ref_tok.encode_song_position(sp, 180000)
    for sv in [0.2, 0.4, 1.0, 1.4, 3.6, 4.0]:
        assert vocab.encode_global_sv(sv) == ref_tok.encode_global_sv(sv)
    for r in [None, 0.0, 0.25, 0.5, 1.0]:
        assert vocab.encode_hold_note_ratio(r) == ref_tok.encode_hold_note_ratio(r)
        assert vocab.encode_scroll_speed_ratio(r) == ref_tok.encode_scroll_speed_ratio(r)
    for gm in range(4):
        assert vocab.encode_gamemode(gm) == ref_tok.encode_gamemode(gm)


def test_vocab_serialization_roundtrip(ref, tmp_path, monkeypatch):
    cfg = compose(f"{REF_CONFIGS}/train", "v32", schema_cls=schema.TrainConfig)
    _setup_v32(None, cfg, None, tmp_path, monkeypatch)
    vocab = build_vocabulary(cfg)
    sd = vocab.state_dict()
    vocab2 = Vocabulary.from_state_dict(sd)
    assert vocab2.vocab_size_in == vocab.vocab_size_in
    assert vocab2.vocab_size_out == vocab.vocab_size_out
    assert vocab2.event_start == vocab.event_start
    for token_id in range(vocab.offset, vocab.vocab_size_in):
        e1, e2 = vocab.decode(token_id), vocab2.decode(token_id)
        assert e1.type == e2.type and e1.value == e2.value


def test_vocab_serialization_matches_reference_schema(ref, tmp_path, monkeypatch):
    cfg, ref_cfg = _ref_train_config(ref, "v32")
    _setup_v32(ref, cfg, ref_cfg, tmp_path, monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_cfg)
    vocab = build_vocabulary(cfg)
    ours, theirs = vocab.state_dict(), ref_tok.state_dict()
    assert set(ours) == set(theirs)
    for key in ("offset", "vocab_size_in", "vocab_size_out", "event_start", "event_end",
                "context_sos", "context_eos", "num_diff_classes", "num_cs_classes"):
        assert ours[key] == theirs[key], key

    # our vocab can load a reference-serialized tokenizer
    import json

    (tmp_path / "tokenizer.json").write_text(json.dumps(theirs))
    loaded = Vocabulary.from_pretrained(tmp_path)
    assert loaded.vocab_size_in == ref_tok.vocab_size_in
    for token_id in range(loaded.offset, loaded.vocab_size_in):
        ev, rev = loaded.decode(token_id), ref_tok.decode(token_id)
        assert ev.type.value == rev.type.value and ev.value == rev.value


def test_vectorized_decode():
    vocab = build_vocabulary()
    ids = np.arange(0, vocab.vocab_size_in)
    t, v = vocab.decode_ids(ids)
    assert (t[:3] == -1).all()
    for token_id in range(vocab.offset, vocab.vocab_size_in):
        ev = vocab.decode(token_id)
        assert v[token_id] == ev.value


@pytest.mark.parametrize("name", ["v28", "v29", "v30", "v31", "v32"])
def test_own_recipes_match_reference_recipes(name):
    """Our configs/train/vNN.yaml must produce the identical vocab layout as
    composing the reference's same-named recipe (transcription check)."""
    ours = compose(f"/root/repo/configs/train", name, schema_cls=schema.TrainConfig)
    theirs = compose(f"{REF_CONFIGS}/train", name, schema_cls=schema.TrainConfig)
    for c in (ours, theirs):
        c.data.dataset_type = "none"  # skip metadata loading paths
        c.data.mappers_path = ""
        c.data.tags_metadata_path = ""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        v_ours = build_vocabulary(ours)
        v_theirs = build_vocabulary(theirs)
    assert v_ours.vocab_size_out == v_theirs.vocab_size_out
    assert v_ours.vocab_size_in == v_theirs.vocab_size_in
    assert v_ours.event_start == v_theirs.event_start
    assert v_ours.event_end == v_theirs.event_end
    assert v_ours.context_sos == v_theirs.context_sos
    # and the model dispatch resolves the same backbone family
    assert ours.model.name == theirs.model.name


@pytest.mark.parametrize("name", ["v28", "v29", "v30", "v31", "v32", "v32-mini_ft"])
def test_shipped_configs_compose_standalone(name, monkeypatch, tmp_path):
    """A clean checkout must compose every shipped train config into a vocab
    with the real vendored metadata tables (datasets/) from any cwd — no
    /root/reference path, no empty-vocab fallback, no warnings."""
    import warnings

    monkeypatch.chdir(tmp_path)  # prove resolution doesn't depend on cwd
    cfg = compose("/root/repo/configs/train", name, schema_cls=schema.TrainConfig)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        vocab = build_vocabulary(cfg)
    # mmrs configs source mapper ids from the dataset's parquet metadata
    # (reference tokenizer.py:587-596), not from a shipped table
    if cfg.data.add_mapper_token and cfg.data.dataset_type in ("ors", "web"):
        assert vocab.num_mapper_classes > 0, "mapper table did not load"
    if cfg.data.add_descriptors and cfg.data.descriptor_source in ("web", "user_tags"):
        assert vocab.num_descriptor_classes > 100, "tags table did not load"


def test_missing_metadata_table_is_hard_error():
    """A config naming a nonexistent table path must raise (reference
    parity: tokenizer.py:565-571,690-693), not warn into an empty vocab."""
    cfg = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    cfg.data.mappers_path = "/nonexistent/beatmap_users.json"
    with pytest.raises(ValueError, match="mappers_path"):
        build_vocabulary(cfg)
    cfg = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    cfg.data.tags_metadata_path = "/nonexistent/tags.json"
    with pytest.raises(ValueError, match="tags_metadata_path"):
        build_vocabulary(cfg)
