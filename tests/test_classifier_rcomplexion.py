"""Classifier + rcomplexion data pipeline and model tests."""

import json
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.models.classifier import OsuR, OsuRConfig
from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
from mapperatorinator_tpu.osu.beatmap import Beatmap
from mapperatorinator_tpu.osu.events import Event, EventType
from mapperatorinator_tpu.rcomplexion import (
    RcomplexionDataset,
    RParser,
    RTokenizer,
    create_sequences,
    tokenize_events,
)
from mapperatorinator_tpu.train.data.classifier import ClassifierDataset

from tests.test_data import OSU_TEMPLATE


@pytest.fixture(scope="module")
def ors_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clf_ors")
    rng = np.random.default_rng(0)
    sr = 16000
    track = root / "Track00000"
    (track / "beatmaps").mkdir(parents=True)
    t = np.arange(sr * 6) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype("<i2")
    with wave.open(str(track / "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    meta = {"Beatmaps": {}}
    for i in range(2):
        objects = "\n".join(
            f"{int(rng.integers(50, 450))},{int(rng.integers(50, 330))},{500 + k * 300},1,0,0:0:0:0:"
            for k in range(12)
        )
        (track / "beatmaps" / f"map{i}.osu").write_text(OSU_TEMPLATE.format(i=i, bid=i, objects=objects))
        meta["Beatmaps"][f"map{i}"] = {
            "BeatmapId": i,
            "Index": i,
            "StandardStarRating": {"0": 3.0, "64": 4.0},
        }
    (track / "metadata.json").write_text(json.dumps(meta))
    (root / "mappers.json").write_text(json.dumps({"0": 42, "1": 43}))
    return root


# -- rcomplexion ------------------------------------------------------------


@pytest.fixture(scope="module")
def rc_args(ors_root):
    return compose(
        "/root/repo/configs/rcomplexion",
        "train_v1",
        overrides=[
            f"data.train_dataset_path={ors_root}",
            "data.train_dataset_start=0",
            "data.train_dataset_end=1",
            "data.src_seq_len=8",
        ],
        schema_cls=schema.RcomplexionConfig,
    )


def test_rtokenizer_roundtrip(rc_args):
    tok = RTokenizer(rc_args)
    assert tok.pad_id == 0
    assert tok.vocab_size_out == 1 + 101  # PAD + timeshift 0..100
    assert tok.vocab_size_in == tok.vocab_size_out + 6
    for ev in [Event(EventType.TIME_SHIFT, 0), Event(EventType.TIME_SHIFT, 100), Event(EventType.CIRCLE)]:
        assert tok.decode(tok.encode(ev)) == ev


def test_rparser_circle_gaps(rc_args, ors_root):
    parser = RParser(rc_args.data)
    bm = Beatmap.from_path(ors_root / "Track00000" / "beatmaps" / "map0.osu")
    events = parser.parse(bm)
    # 12 circles -> 24 events alternating TIME_SHIFT / CIRCLE
    assert len(events) == 24
    gaps = [e.value for e in events[2::2] if e.type == EventType.TIME_SHIFT]
    assert all(g == 30 for g in gaps)  # 300 ms at 0.1 steps/ms


def test_create_sequences_labels(rc_args, ors_root):
    tok = RTokenizer(rc_args)
    parser = RParser(rc_args.data)
    bm = Beatmap.from_path(ors_root / "Track00000" / "beatmaps" / "map0.osu")
    tokens = tokenize_events(parser.parse(bm), tok)
    seqs, labels = create_sequences(tokens, 8, tok)
    assert len(seqs) == len(labels) > 0
    for s, l in zip(seqs, labels):
        assert s.shape == (8,)
        # label is the TIME_SHIFT token preceding a timed event
        decoded = tok.decode(l)
        assert decoded.type == EventType.TIME_SHIFT


def test_rcomplexion_dataset_and_model(rc_args):
    tok = RTokenizer(rc_args)
    ds = list(RcomplexionDataset(rc_args, tok))
    assert len(ds) == 16
    model = OsuR(OsuRConfig(vocab_size_in=tok.vocab_size_in, vocab_size_out=tok.vocab_size_out,
                            src_seq_len=8, hidden_size=16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    batch_ids = jnp.asarray(np.stack([s["input_ids"] for s in ds[:4]]))
    batch_labels = jnp.asarray(np.stack([s["labels"] for s in ds[:4]]))
    out = model.apply(params, batch_ids, labels=batch_labels)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (4, tok.vocab_size_out)


# -- classifier ---------------------------------------------------------------


def test_classifier_dataset_windows(ors_root):
    import warnings

    args = compose(
        "/root/repo/configs/classifier",
        "train_v1",
        overrides=[
            f"data.train_dataset_path={ors_root}",
            "data.train_dataset_start=0",
            "data.train_dataset_end=1",
            f"data.mappers_path={ors_root}/mappers.json",
            "data.src_seq_len=128",
            "data.tgt_seq_len=64",
            "data.dt_augment_prob=0",
            "model.spectrogram.n_mels=32",
        ],
        schema_cls=schema.ClassifierConfig,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    assert vocab.num_mapper_classes == 2
    parser = BeatmapParser(args, vocab)
    samples = list(ClassifierDataset(args, parser, vocab))
    assert len(samples) > 0
    hop = args.model.spectrogram.hop_length
    for s in samples:
        assert s["frames"].shape == (hop * 127,)
        assert s["decoder_input_ids"].shape == (64,)
        assert s["labels"] in (vocab.mapper_idx[42], vocab.mapper_idx[43])
    # both mappers appear
    labels = {int(s["labels"]) for s in samples}
    assert labels == {vocab.mapper_idx[42], vocab.mapper_idx[43]}


def test_transfer_from_pretrained_osut5(tmp_path):
    """Classifier tower init from a pretrained osuT5 checkpoint (reference
    classifier/train.py:19-41): shared encoder/decoder stacks graft, the
    reference's ignore list (decoder embeddings, LM head, decoder_embedder)
    stays fresh, classifier-only heads stay fresh, shape mismatch raises."""
    import classifier_train
    from mapperatorinator_tpu.models.classifier import transfer_from_pretrained
    from mapperatorinator_tpu.models.io import load_checkpoint
    from tests.fixtures.tiny_checkpoint import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    _, pre_params, _ = load_checkpoint(ckpt)

    args = compose("/root/repo/configs/classifier", "train_v1",
                   schema_cls=schema.ClassifierConfig)
    # match the tiny v32-arch checkpoint's family and dims
    args.model.position_scheme = "rope"
    args.model.norm = "rms"
    args.model.d_model, args.model.encoder_ffn, args.model.decoder_ffn = 64, 128, 128
    args.model.encoder_layers = args.model.decoder_layers = 2
    args.model.encoder_heads = args.model.decoder_heads = 4
    args.model.spectrogram.n_mels = 128
    args.data.mappers_path = "datasets/beatmap_users.json"

    vocab = build_vocabulary(args)
    model = classifier_train.build_classifier(args, vocab)
    hop = args.model.spectrogram.hop_length
    fresh = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    params = transfer_from_pretrained(fresh, pre_params)

    import flax.traverse_util as traverse

    flat = traverse.flatten_dict(params["params"])
    flat_fresh = traverse.flatten_dict(fresh["params"])
    flat_pre = traverse.flatten_dict(pre_params["params"])

    # encoder + decoder stacks grafted from the checkpoint
    grafted = [k for k in flat
               if k[:2] == ("transformer", "encoder") or k[:2] == ("transformer", "decoder")]
    assert grafted
    n_equal = 0
    for k in grafted:
        if k in flat_pre and tuple(flat_pre[k].shape) == tuple(flat[k].shape):
            np.testing.assert_array_equal(np.asarray(flat[k]), np.asarray(flat_pre[k]))
            n_equal += 1
    assert n_equal >= 10, f"only {n_equal} tower leaves grafted"

    # ignore list: the decoder_embedder keeps its fresh init even though the
    # checkpoint carries a same-shaped one
    key = ("decoder_embedder", "embedding")
    if key in flat_pre and flat_pre[key].shape == flat[key].shape:
        assert not np.array_equal(np.asarray(flat[key]), np.asarray(flat_pre[key]))
    np.testing.assert_array_equal(np.asarray(flat[key]), np.asarray(flat_fresh[key]))

    # classifier-only heads stay fresh (strict=False semantics)
    for head in ("projector", "classifier"):
        k = (head, "kernel")
        np.testing.assert_array_equal(np.asarray(flat[k]), np.asarray(flat_fresh[k]))

    # a transferable-path shape mismatch raises (torch parity)
    args.model.d_model, args.model.encoder_heads, args.model.decoder_heads = 32, 2, 2
    small = classifier_train.build_classifier(args, vocab)
    fresh_small = small.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        transfer_from_pretrained(fresh_small, pre_params)
