"""Committed e2e fixtures: a deterministic tiny v32-architecture checkpoint
and a synthesized WAV, generated at test time (no binary blobs in git).

Used by tests/test_cli_e2e.py to drive ``python inference.py`` as a real
subprocess (reference surface: /root/reference/inference.py:647-702) and by
any manual /verify run.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]

# short windows so a 10 s clip decodes in seconds on CPU
SRC_SEQ_LEN = 256
TGT_SEQ_LEN = 256


def make_wav(path, seconds: float = 10.0, sr: int = 16000, freq: float = 440.0) -> Path:
    """Synthesized beat-pulsed tone (deterministic)."""
    path = Path(path)
    t = np.arange(int(sr * seconds)) / sr
    beat = (np.sin(2 * np.pi * 2.0 * t) > 0).astype(np.float32)  # 120 BPM gate
    x = np.sin(2 * np.pi * freq * t) * (0.15 + 0.15 * beat)
    data = (x * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return path


def tiny_train_args(src_len: int = SRC_SEQ_LEN, tgt_len: int = TGT_SEQ_LEN):
    from mapperatorinator_tpu.config import compose, schema

    args = compose(str(REPO_ROOT / "configs" / "train"), "v32", schema_cls=schema.TrainConfig)
    args.data.dataset_type = "none"
    args.data.mappers_path = ""
    args.data.tags_metadata_path = ""
    args.data.src_seq_len = src_len
    args.data.tgt_seq_len = tgt_len
    # fp32 compute: the tiny checkpoint anchors golden/e2e snapshots, which
    # were locked at fp32 numerics (v32.yaml's mixed_precision=bf16 is the
    # production TRAINING dtype, now honored by build_config)
    args.mixed_precision = "no"
    return args


def make_tiny_checkpoint(directory, d_model: int = 64, layers: int = 2, heads: int = 4,
                         ffn: int = 128, seed: int = 0) -> Path:
    """v32-architecture Mapperatorinator at tiny width, deterministic params,
    saved in the native checkpoint format (model_config.json + params.msgpack
    + tokenizer.json)."""
    import warnings

    warnings.filterwarnings("ignore")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.io import save_checkpoint
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import build_vocabulary

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)

    args = tiny_train_args()
    vocab = build_vocabulary(args)
    cfg = build_config(args, vocab)
    bb = dataclasses.replace(
        cfg.backbone, d_model=d_model, encoder_layers=layers, decoder_layers=layers,
        encoder_heads=heads, decoder_heads=heads, encoder_ffn=ffn, decoder_ffn=ffn,
    )
    cfg = dataclasses.replace(cfg, backbone=bb)
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
        jax.random.PRNGKey(seed),
        frames=jnp.zeros((1, hop * (SRC_SEQ_LEN - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
        **cond,
    )
    save_checkpoint(directory, cfg, params, vocab=vocab)
    return directory
