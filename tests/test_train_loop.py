"""End-to-end training loop test: tiny model on a fabricated ORS dataset with
eval, checkpointing, and resume."""

import json
import wave
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
from mapperatorinator_tpu.models.transformer import TransformerConfig
from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
from mapperatorinator_tpu.osu.events import EventType
from mapperatorinator_tpu.parallel import make_mesh, replicate, shard_batch
from mapperatorinator_tpu.train import make_train_step
from mapperatorinator_tpu.train.data import OrsDataset
from mapperatorinator_tpu.train.data.batching import batch_iterator
from mapperatorinator_tpu.train.loop import Averager, CheckpointManager, MetricsLogger, eval_model, train
from mapperatorinator_tpu.train.optim import build_optimizer
from mapperatorinator_tpu.train.step import init_train_state, make_eval_step

from tests.test_data import OSU_TEMPLATE  # reuse the fixture template


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ors_train")
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
    metadata = {"Beatmaps": {}}
    for bm_i in range(2):
        name = f"map{bm_i}"
        objects = "\n".join(
            f"{int(rng.integers(50, 450))},{int(rng.integers(50, 330))},{500 + k * 300},1,0,0:0:0:0:"
            for k in range(12)
        )
        (track / "beatmaps" / f"{name}.osu").write_text(OSU_TEMPLATE.format(i=bm_i, bid=bm_i, objects=objects))
        metadata["Beatmaps"][name] = {
            "BeatmapId": bm_i,
            "Index": bm_i,
            "StandardStarRating": {"0": 3.0, "64": 4.0},
            "RankedYear": 2018,
        }
    (track / "metadata.json").write_text(json.dumps(metadata))

    args = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    args.data.train_dataset_path = str(root)
    args.data.train_dataset_start = 0
    args.data.train_dataset_end = 1
    args.data.test_dataset_path = str(root)
    args.data.test_dataset_start = 0
    args.data.test_dataset_end = 1
    args.data.src_seq_len = 128
    args.data.tgt_seq_len = 256
    args.optim.batch_size = 8  # must divide the 8-device mesh
    args.optim.grad_acc = 1
    args.optim.total_steps = 4
    args.optim.name = "adamwscale"
    args.optim.base_lr = 1e-3
    args.optim.warmup_steps = 0
    args.optim.sustain_steps = 1
    args.eval.every_steps = 2
    args.eval.steps = 1
    args.checkpoint.every_steps = 2
    args.logging.every_steps = 1
    args.logging.log_with = "none"
    args.dataloader.balancer_buffer_size = 0

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    parser = BeatmapParser(args, vocab)

    backbone = TransformerConfig(
        vocab_size=vocab.vocab_size_out,
        d_model=32,
        encoder_layers=1,
        decoder_layers=1,
        encoder_heads=2,
        decoder_heads=2,
        encoder_ffn=64,
        decoder_ffn=64,
        max_source_positions=64,
        max_target_positions=256,
        num_mel_bins=32,
        position_scheme="rope",
        norm="rms",
        conv_stem=True,
    )
    mcfg = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=vocab.vocab_size_in,
        vocab_size_out=vocab.vocab_size_out,
        n_mels=128,
        spectrogram_log_scale=True,
        f_min=20,
        pad_mode="reflect",
        project_encoder_input=True,
        embed_decoder_input=True,
        rhythm_token_start=vocab.event_start[EventType.TIME_SHIFT],
        rhythm_token_end=vocab.event_end[EventType.TIME_SHIFT],
    )
    model = Mapperatorinator(mcfg)
    return args, vocab, parser, model


def test_full_training_loop_with_checkpoint_resume(setup, tmp_path):
    args, vocab, parser, model = setup
    hop = args.model.spectrogram.hop_length

    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    tx = build_optimizer(args)
    state = init_train_state(params, tx)

    mesh = make_mesh()
    state = replicate(mesh, state)
    base_step = make_train_step(model, tx, mesh=mesh)

    def sharded_step(state, batch, rng):
        return base_step(state, shard_batch(mesh, batch), rng)

    def make_batches(test):
        dataset = OrsDataset(args.data, parser, vocab, test=test)
        return batch_iterator(dataset, args.optim.batch_size, drop_last=True)

    eval_step = make_eval_step(model)
    checkpoints = CheckpointManager(tmp_path / "ckpt", total_limit=2)
    logger = MetricsLogger(tmp_path / "logs", log_with="none")

    losses = []
    state = train(
        train_step=sharded_step,
        eval_step=eval_step,
        state=state,
        train_batch_factory=lambda: make_batches(False),
        eval_batch_factory=lambda: make_batches(True),
        vocab=vocab,
        args=args,
        logger=logger,
        checkpoints=checkpoints,
        on_step=lambda step, m: losses.append(float(m["loss"])),
    )
    logger.close()

    assert int(state.step) == 4
    assert all(np.isfinite(losses))
    # metrics jsonl written
    lines = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 4
    record = json.loads(lines[-1])
    assert "train/loss" in record or any("loss" in k for k in record)
    # eval metrics present in some record
    assert any("test/" in k for line in lines for k in json.loads(line))

    # checkpoint saved and restorable
    assert checkpoints.latest_step() == 4
    tx2 = build_optimizer(args)
    fresh = init_train_state(params, tx2)
    restored = checkpoints.restore(fresh)
    assert int(restored.step) == 4
    l1 = jax.tree.leaves(state.params)
    l2 = jax.tree.leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_averager():
    a = Averager()
    a.update({"x": np.array([1.0, 3.0])})
    a.update({"x": np.array([5.0])})
    out = a.average()
    assert out["x"] == pytest.approx(3.0)


def test_best_checkpoint_tracking(setup, tmp_path):
    """Eval-loss-keyed best alias + manifest (reference: the wandb Artifact
    'best' alias by eval loss, train_utils.py:115-144)."""
    import json

    args, vocab, parser, model = setup
    hop = args.model.spectrogram.hop_length
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    tx = build_optimizer(args)
    state = init_train_state(params, tx)

    ckpts = CheckpointManager(tmp_path / "ckpt", total_limit=2)
    ckpts.set_metadata({"src_seq_len": args.data.src_seq_len, "format": "orbax"})
    state1 = state._replace(step=jnp.asarray(1, jnp.int32))
    ckpts.save(1, state1, metrics={"step": 1, "eval_loss": 3.0})
    state2 = state._replace(step=jnp.asarray(2, jnp.int32))
    ckpts.save(2, state2, metrics={"step": 2, "eval_loss": 5.0})  # worse
    assert ckpts.best_step() == 1

    manifest = json.loads((tmp_path / "ckpt" / "manifest.json").read_text())
    assert manifest["best"] == {"step": 1, "eval_loss": 3.0}
    assert manifest["metadata"]["src_seq_len"] == args.data.src_seq_len
    assert set(manifest["checkpoints"]) == {"1", "2"}

    # retention (total_limit=2) would eventually GC step 1; the mirror keeps
    # the best restorable regardless
    state3 = state._replace(step=jnp.asarray(3, jnp.int32))
    ckpts.save(3, state3, metrics={"step": 3, "eval_loss": 4.0})
    assert ckpts.latest_step() == 3
    assert ckpts.best_step() == 1
    restored = ckpts.restore_best(state)
    assert int(restored.step) == 1

    # a new minimum moves the alias
    state4 = state._replace(step=jnp.asarray(4, jnp.int32))
    ckpts.save(4, state4, metrics={"step": 4, "eval_loss": 2.0})
    assert ckpts.best_step() == 4
    assert int(ckpts.restore_best(state).step) == 4


class _FakeWandbRun:
    def __init__(self, kwargs):
        self.id = "run123"
        self.init_kwargs = kwargs
        self.logged = []
        self.artifacts = []
        self.finished = False

    def log(self, record, step=None):
        self.logged.append((step, dict(record)))

    def log_artifact(self, art, aliases=None):
        self.artifacts.append((art, aliases))

    def finish(self):
        self.finished = True


class _FakeWandbArtifact:
    def __init__(self, name, type, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata
        self.files = {}

    def add_file(self, path, artifact_path):
        self.files[artifact_path] = path


def _install_fake_wandb(monkeypatch):
    import sys
    import types

    mod = types.ModuleType("wandb")
    mod.runs = []

    def init(**kwargs):
        run = _FakeWandbRun(kwargs)
        mod.runs.append(run)
        return run

    mod.init = init
    mod.Artifact = _FakeWandbArtifact
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_wandb_tracker_backend(setup, tmp_path, monkeypatch):
    """log_with=wandb: run init kwargs, per-step metric forwarding, and
    checkpoint Artifact upload with the ``best`` alias (reference:
    osuT5/train.py:55-83 + train_utils.py:113-141), exercised against an
    injected stand-in module (the real package is not a dependency)."""
    mod = _install_fake_wandb(monkeypatch)
    args, vocab, parser, model = setup
    hop = args.model.spectrogram.hop_length
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    tx = build_optimizer(args)
    state = init_train_state(params, tx)

    logger = MetricsLogger(tmp_path / "logs", log_with="wandb",
                           run_name="myrun", mode="offline")
    run = mod.runs[0]
    assert run.init_kwargs["project"] == "osuT5"
    assert run.init_kwargs["job_type"] == "training"
    assert run.init_kwargs["mode"] == "offline"
    assert run.init_kwargs["name"] == "myrun"

    logger.log({"train/loss": 2.5}, step=10)
    assert run.logged == [(10, {"train/loss": 2.5})]
    # the JSONL sink still writes alongside the tracker
    assert (tmp_path / "logs" / "metrics.jsonl").read_text().strip()

    ckpts = CheckpointManager(tmp_path / "ckpt", total_limit=2)
    ckpts.set_metadata({"src_seq_len": args.data.src_seq_len})
    ckpts.artifact_sink = logger.log_checkpoint_artifact
    ckpts.save(1, state._replace(step=jnp.asarray(1, jnp.int32)),
               metrics={"step": 1, "eval_loss": 3.0})
    ckpts.save(2, state._replace(step=jnp.asarray(2, jnp.int32)),
               metrics={"step": 2, "eval_loss": 5.0})  # worse: no best alias

    assert len(run.artifacts) == 2
    (art1, aliases1), (art2, aliases2) = run.artifacts
    assert art1.name == "osuT5-run123" and art1.type == "model"
    assert aliases1 == ["best"] and aliases2 is None
    # artifact carries run metadata + step metrics, and the checkpoint files
    assert art1.metadata["src_seq_len"] == args.data.src_seq_len
    assert art1.metadata["eval_loss"] == 3.0
    assert art1.files, "no files attached to the checkpoint artifact"
    assert all(not Path(p).is_absolute() for p in art1.files)

    logger.close()
    assert run.finished


def test_wandb_missing_package_degrades_to_jsonl(setup, tmp_path, monkeypatch):
    """log_with=wandb without the package: a warning, then JSONL-only."""
    import sys

    monkeypatch.setitem(sys.modules, "wandb", None)
    with pytest.warns(UserWarning, match="wandb"):
        logger = MetricsLogger(tmp_path / "logs", log_with="wandb")
    assert logger.wandb_run is None
    logger.log({"train/loss": 1.0}, step=1)
    logger.close()
    assert (tmp_path / "logs" / "metrics.jsonl").read_text().strip()
