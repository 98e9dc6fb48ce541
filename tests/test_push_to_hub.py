"""push_to_hub staging + mapper-takedown tests."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from mapperatorinator_tpu.osu.events import EventRange, EventType
from mapperatorinator_tpu.osu.vocab import Vocabulary

import push_to_hub


def _vocab_with_mappers():
    return Vocabulary(
        event_ranges=[EventRange(EventType.TIME_SHIFT, 0, 9)],
        input_event_ranges=[EventRange(EventType.MAPPER, 0, 4)],
        num_mapper_classes=4,
        mapper_idx={111: 0, 222: 1, 333: 2},
    )


def test_remove_mappers_nulls_rows():
    vocab = _vocab_with_mappers()
    token_222 = vocab.encode_mapper_id(222)
    params = {
        "params": {
            "mapper_embedder": {"dense": {"kernel": np.ones((5, 8), np.float32)}},
            "decoder_embed": {"embedding": np.ones((vocab.vocab_size_in, 8), np.float32)},
        }
    }
    out, vocab = push_to_hub.remove_mappers_from_params(params, vocab, [222, 999])
    emb = out["params"]["mapper_embedder"]["dense"]["kernel"]
    assert (emb[1] == 0).all() and (emb[0] == 1).all() and (emb[2] == 1).all()
    tok = out["params"]["decoder_embed"]["embedding"]
    assert (tok[token_222] == 0).all()
    assert (np.delete(tok, token_222, axis=0) == 1).all()
    assert 222 not in vocab.mapper_idx and 111 in vocab.mapper_idx


def test_discover_submodel_paths(tmp_path):
    sub = tmp_path / "gamemode=3"
    sub.mkdir()
    (sub / "params.msgpack").write_bytes(b"x")
    (sub / "tokenizer.json").write_text("{}")
    (tmp_path / "not_a_ckpt").mkdir()
    found = push_to_hub.discover_submodel_paths(tmp_path)
    assert found == [sub]


def test_load_removed_users_missing_file(tmp_path):
    assert push_to_hub.load_removed_users(tmp_path / "nope.txt") == []
    f = tmp_path / "removed.txt"
    f.write_text("111\n\n222\n")
    assert push_to_hub.load_removed_users(f) == [111, 222]
