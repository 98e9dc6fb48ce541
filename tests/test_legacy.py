"""Legacy accelerate-checkpoint loading: routed unpickling + tokenizer state."""

import pickle
import sys
import types

import pytest
import torch

from mapperatorinator_tpu.models.legacy import (
    RoutedUnpickler,
    _normalize_tokenizer_state,
    is_legacy_checkpoint,
    routed_pickle_module,
)
from mapperatorinator_tpu.osu.events import ContextType, EventRange, EventType
from mapperatorinator_tpu.osu.vocab import Vocabulary


@pytest.fixture
def reference_event_module():
    """A stand-in for the reference's ``osuT5.osuT5.event`` module whose
    classes pickle under the reference path."""
    src = '''
import dataclasses
from enum import Enum

class EventType(Enum):
    TIME_SHIFT = "t"
    CIRCLE = "circle"

class ContextType(Enum):
    MAP = "map"
    TIMING = "timing"

@dataclasses.dataclass
class EventRange:
    type: EventType
    min_value: int
    max_value: int
'''
    pkg = types.ModuleType("osuT5")
    sub = types.ModuleType("osuT5.osuT5")
    mod = types.ModuleType("osuT5.osuT5.event")
    exec(src, mod.__dict__)
    # other tests import the real reference package under these names —
    # save and restore whatever was there
    names = ("osuT5", "osuT5.osuT5", "osuT5.osuT5.event")
    saved = {n: sys.modules.get(n) for n in names}
    sys.modules["osuT5"] = pkg
    sys.modules["osuT5.osuT5"] = sub
    sys.modules["osuT5.osuT5.event"] = mod
    yield mod
    for n in names:
        if saved[n] is not None:
            sys.modules[n] = saved[n]
        else:
            sys.modules.pop(n, None)


def test_routed_unpickler_maps_reference_classes(reference_event_module, tmp_path):
    mod = reference_event_module
    payload = {
        "et": mod.EventType.CIRCLE,
        "er": mod.EventRange(mod.EventType.TIME_SHIFT, 0, 100),
        "ct": mod.ContextType.MAP,
    }
    raw = pickle.dumps(payload)
    # plain unpickling would resolve the reference classes (or fail when the
    # reference isn't importable); the routed unpickler maps to OUR classes
    out = routed_pickle_module.loads(raw)
    assert out["et"] is EventType.CIRCLE
    assert isinstance(out["er"], EventRange) and out["er"].type is EventType.TIME_SHIFT
    assert out["ct"] is ContextType.MAP


def test_normalize_and_load_tokenizer_state():
    state = {
        "offset": 3,
        "context_sos": {ContextType.MAP: 10},
        "context_eos": {ContextType.MAP: 11},
        "event_ranges": [EventRange(EventType.TIME_SHIFT, 0, 100)],
        "input_event_ranges": [],
        "num_classes": 5,
        "num_diff_classes": 0,
        "max_difficulty": 10,
        "event_start": {EventType.TIME_SHIFT: 3},
        "event_end": {EventType.TIME_SHIFT: 104},
        "vocab_size_out": 104,
        "vocab_size_in": 104,
        "beatmap_idx": {1: 0},
        "beatmap_mapper": {},
        "mapper_idx": {},
        "num_mapper_classes": 0,
        "beatmap_descriptors": {},
        "descriptor_idx": {},
        "num_cs_classes": 0,
    }
    vocab = Vocabulary.from_state_dict(_normalize_tokenizer_state(state))
    assert vocab.vocab_size_out == 104
    assert vocab.context_sos[ContextType.MAP] == 10
    assert vocab.event_start[EventType.TIME_SHIFT] == 3


def test_torch_roundtrip_via_routed_module(reference_event_module, tmp_path):
    mod = reference_event_module
    state = {"event_ranges": [mod.EventRange(mod.EventType.TIME_SHIFT, 0, 9)], "num_classes": 1}
    path = tmp_path / "custom_checkpoint_0.pkl"
    torch.save(state, path)
    loaded = torch.load(path, pickle_module=routed_pickle_module, weights_only=False)
    assert isinstance(loaded["event_ranges"][0], EventRange)
    assert loaded["event_ranges"][0].type is EventType.TIME_SHIFT


def test_is_legacy_checkpoint(tmp_path):
    assert not is_legacy_checkpoint(tmp_path)
    (tmp_path / "custom_checkpoint_0.pkl").write_bytes(b"x")
    assert not is_legacy_checkpoint(tmp_path)
    (tmp_path / "pytorch_model.bin").write_bytes(b"x")
    assert is_legacy_checkpoint(tmp_path)
