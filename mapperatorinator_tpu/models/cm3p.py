"""CM3P — contrastive audio↔beatmap embedding model (feature extractor).

The reference evaluates a second FID axis and a self-similarity metric on
embeddings from the hub model ``OliBomby/CM3P`` (reference:
``calc_fid.py:579-713``, ``utils/plot_cm3p_self_similarity.py``). That
model ships its architecture as Hub remote code (``trust_remote_code``)
and is unreachable offline, so this module provides the framework side:

* :class:`Cm3p` — a CLIP-style dual encoder: a beatmap-token tower and a
  mel-audio tower, mask-aware mean pooling, linear projections into a
  shared space, l2-normalized embeddings, and a learned contrastive logit
  scale. The evaluation harness consumes ``beatmap_embeds`` (one vector
  per window), matching the reference's use of ``outputs.beatmap_embeds``.
* :func:`extract_cm3p_features` — windows a (beatmap, audio) pair exactly
  like the classifier feature extractor and embeds every window.
* :func:`load_cm3p` / :func:`save_cm3p` — native checkpoint IO
  (``cm3p_config.json`` + ``params.msgpack`` + ``tokenizer.json``) plus a
  torch-state-dict converter for whisper-style dual-tower checkpoints.
  ``calc_fid.py`` auto-enables the CM3P metrics when a loadable local
  checkpoint exists and prints a clear skip message otherwise.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import MelSpectrogram
from .transformer import Encoder, TransformerConfig


@dataclasses.dataclass(frozen=True)
class Cm3pConfig:
    beatmap_backbone: TransformerConfig = TransformerConfig(conv_stem=False)
    audio_backbone: TransformerConfig = TransformerConfig(conv_stem=False)
    vocab_size: int = 4096  # beatmap-token vocab
    projection_dim: int = 512
    logit_scale_init: float = 2.6592  # log(1/0.07), the CLIP default
    sample_rate: int = 16000
    n_fft: int = 1024
    n_mels: int = 388
    hop_length: int = 128
    src_seq_len: int = 1024  # audio window = (src_seq_len-1)*hop samples
    tgt_seq_len: int = 512   # beatmap tokens per window


class Cm3p(nn.Module):
    config: Cm3pConfig

    def setup(self):
        cfg = self.config
        self.spectrogram = MelSpectrogram(
            implementation="xla",
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            n_mels=cfg.n_mels,
            hop_length=cfg.hop_length,
        )
        self.beatmap_embedder = nn.Embed(cfg.vocab_size, cfg.beatmap_backbone.d_model,
                                         name="beatmap_embedder")
        self.beatmap_encoder = Encoder(cfg.beatmap_backbone, name="beatmap_encoder")
        self.audio_embedder = nn.Dense(cfg.audio_backbone.d_model, name="audio_embedder")
        self.audio_encoder = Encoder(cfg.audio_backbone, name="audio_encoder")
        self.beatmap_projection = nn.Dense(cfg.projection_dim, use_bias=False,
                                           name="beatmap_projection")
        self.audio_projection = nn.Dense(cfg.projection_dim, use_bias=False,
                                         name="audio_projection")
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(cfg.logit_scale_init, jnp.float32)
        )

    @staticmethod
    def _pool(hidden: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        if mask is None:
            return hidden.mean(axis=1)
        m = mask.astype(hidden.dtype)[..., None]
        return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)

    def encode_beatmap(self, input_ids: jnp.ndarray,
                       attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        embeds = self.beatmap_embedder(input_ids)
        attn = attention_mask[:, None, None, :].astype(bool) if attention_mask is not None else None
        hidden = self.beatmap_encoder(embeds, attn_mask=attn)
        pooled = self._pool(hidden, attention_mask)
        proj = self.beatmap_projection(pooled)
        return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True).clip(1e-8)

    def encode_audio(self, frames: jnp.ndarray) -> jnp.ndarray:
        mel = self.spectrogram(frames)
        hidden = self.audio_encoder(self.audio_embedder(mel))
        proj = self.audio_projection(self._pool(hidden, None))
        return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True).clip(1e-8)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        frames: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        return_loss: bool = False,
    ) -> dict:
        beatmap_embeds = self.encode_beatmap(input_ids, attention_mask)
        audio_embeds = self.encode_audio(frames)
        scale = jnp.exp(self.logit_scale)
        logits_per_beatmap = beatmap_embeds @ audio_embeds.T * scale

        loss = None
        if return_loss:
            # symmetric InfoNCE over the in-batch pairing
            labels = jnp.arange(logits_per_beatmap.shape[0])
            lb = -jnp.take_along_axis(
                jax.nn.log_softmax(logits_per_beatmap, axis=-1), labels[:, None], axis=-1
            ).mean()
            la = -jnp.take_along_axis(
                jax.nn.log_softmax(logits_per_beatmap.T, axis=-1), labels[:, None], axis=-1
            ).mean()
            loss = (lb + la) / 2
        return {
            "loss": loss,
            "beatmap_embeds": beatmap_embeds,
            "audio_embeds": audio_embeds,
            "logits_per_beatmap": logits_per_beatmap,
        }


# -- feature extraction -------------------------------------------------------


_BEATMAP_ENCODE_JIT: dict = {}


def extract_cm3p_features(beatmap, audio: np.ndarray, bundle, batch_size: int = 16) -> np.ndarray:
    """Per-window CM3P beatmap embeddings (the reference's
    ``outputs.beatmap_embeds`` path, calc_fid.py:650-676). ``bundle`` is the
    (model, params, config, vocab) tuple from :func:`load_cm3p`."""
    from ..osu.events import Event, EventType
    from ..osu.parsing import BeatmapParser

    model, params, config, vocab = bundle

    import types

    from ..config.schema import DataConfig

    data_cfg = DataConfig()
    data_cfg.src_seq_len = config.src_seq_len
    data_cfg.tgt_seq_len = config.tgt_seq_len
    # only emit event families the checkpoint's vocabulary can encode
    ranges = vocab.event_range
    data_cfg.add_distances = EventType.DISTANCE in ranges
    data_cfg.add_positions = EventType.POS in ranges or EventType.POS_X in ranges
    data_cfg.add_hitsounds = EventType.HITSOUND in ranges
    data_cfg.add_snapping = EventType.SNAPPING in ranges
    data_cfg.add_timing_points = EventType.TIMING_POINT in ranges
    data_cfg.add_kiai = EventType.KIAI in ranges
    data_cfg.add_sv = EventType.SCROLL_SPEED in ranges
    data_cfg.add_mania_sv = False
    parser_args = types.SimpleNamespace(data=data_cfg)
    parser = BeatmapParser(parser_args, vocab)
    events, event_times = parser.parse(beatmap, 1.0, None, (False, False))

    samples_per_seq = (config.src_seq_len - 1) * config.hop_length
    seq_s = samples_per_seq / config.sample_rate
    starts = np.arange(0, max(len(audio) / config.sample_rate - seq_s, seq_s / 2), seq_s)

    ts_range = vocab.event_range[EventType.TIME_SHIFT]
    examples = []
    for time_s in starts:
        frames = np.zeros(samples_per_seq, np.float32)
        chunk = audio[int(time_s * config.sample_rate):][:samples_per_seq]
        frames[: len(chunk)] = chunk
        tokens = np.full((config.tgt_seq_len,), vocab.pad_id, np.int32)
        window = [e for e, t in zip(events, event_times) if time_s <= t / 1000 < time_s + seq_s]
        for i, event in enumerate(window[: config.tgt_seq_len]):
            if event.type == EventType.TIME_SHIFT:
                value = int((event.value - time_s * 1000) / 10)
                event = Event(EventType.TIME_SHIFT,
                              int(np.clip(value, ts_range.min_value, ts_range.max_value)))
            tokens[i] = vocab.encode(event)
        examples.append({"input_ids": tokens[None], "frames": frames[None],
                         "attention_mask": (tokens != vocab.pad_id)[None].astype(np.int32)})

    from ..utils.batched_apply import batched_apply

    fn = _BEATMAP_ENCODE_JIT.get(id(model))
    if fn is None:
        def raw(params, ids, mask):
            return model.apply(params, ids, mask, method=Cm3p.encode_beatmap)

        fn = jax.jit(raw)
        _BEATMAP_ENCODE_JIT[id(model)] = fn

    def apply_fn(batch):
        return fn(params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]))

    return batched_apply(examples, batch_size, apply_fn)


# -- checkpoint IO ------------------------------------------------------------


def _config_to_dict(cfg: Cm3pConfig) -> dict:
    d = dataclasses.asdict(cfg)
    for key in ("beatmap_backbone", "audio_backbone"):
        tower = getattr(cfg, key)
        d[key]["dtype"] = str(jnp.dtype(tower.dtype).name)
        d[key]["param_dtype"] = str(jnp.dtype(tower.param_dtype).name)
    return d


def _config_from_dict(d: dict) -> Cm3pConfig:
    d = dict(d)
    for key in ("beatmap_backbone", "audio_backbone"):
        if isinstance(d.get(key), dict):
            td = dict(d[key])
            td["dtype"] = jnp.dtype(td.get("dtype", "float32")).type
            td["param_dtype"] = jnp.dtype(td.get("param_dtype", "float32")).type
            d[key] = TransformerConfig(**td)
    return Cm3pConfig(**d)


def save_cm3p(directory, config: Cm3pConfig, params, vocab=None) -> Path:
    import flax

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "cm3p_config.json").write_text(json.dumps(_config_to_dict(config), indent=1))
    (directory / "params.msgpack").write_bytes(flax.serialization.to_bytes(params))
    if vocab is not None:
        vocab.save_pretrained(directory)
    return directory


def convert_cm3p_state_dict(sd: dict, config: Cm3pConfig) -> dict:
    """Torch dual-tower state dict -> Flax params.

    Handles the whisper-style CLIP layout this architecture defines (the
    naming an equivalent torch module produces): ``beatmap_embedder.weight``,
    ``audio_embedder.{weight,bias}``, ``{beatmap,audio}_projection.weight``,
    ``logit_scale``, and ``{beatmap,audio}_encoder.layers.N.self_attn.
    {q,k,v,out}_proj`` / ``*_layer_norm`` / ``fc1,fc2`` blocks. Unmatched
    keys raise with a listing, so adapting to a differently-named published
    checkpoint is a rename map away."""
    from .convert import _norm_wb, _split_attn_params, _t

    sd = dict(sd)
    params: dict = {
        "beatmap_embedder": {"embedding": np.asarray(sd.pop("beatmap_embedder.weight"))},
        "audio_embedder": {
            "kernel": _t(sd.pop("audio_embedder.weight")),
            "bias": np.asarray(sd.pop("audio_embedder.bias")),
        },
        "beatmap_projection": {"kernel": _t(sd.pop("beatmap_projection.weight"))},
        "audio_projection": {"kernel": _t(sd.pop("audio_projection.weight"))},
        "logit_scale": np.asarray(sd.pop("logit_scale")),
    }
    for tower, backbone in (("beatmap_encoder", config.beatmap_backbone),
                            ("audio_encoder", config.audio_backbone)):
        kind = backbone.norm
        tower_params = {"norm": _norm_wb(sd, f"{tower}.layer_norm", kind)}
        for i in range(backbone.encoder_layers):
            p = f"{tower}.layers.{i}"
            tower_params[f"layers_{i}"] = {
                "self_attn": _split_attn_params(sd, f"{p}.self_attn", cross=False),
                "self_attn_norm": _norm_wb(sd, f"{p}.self_attn_layer_norm", kind),
                "final_norm": _norm_wb(sd, f"{p}.final_layer_norm", kind),
                "ffn": {
                    "fc1": {"kernel": _t(sd.pop(f"{p}.fc1.weight")),
                            "bias": np.asarray(sd.pop(f"{p}.fc1.bias"))},
                    "fc2": {"kernel": _t(sd.pop(f"{p}.fc2.weight")),
                            "bias": np.asarray(sd.pop(f"{p}.fc2.bias"))},
                },
            }
            for suffix in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd.pop(f"{p}.self_attn.{suffix}.weight", None)
                sd.pop(f"{p}.self_attn.{suffix}.bias", None)
            sd.pop(f"{p}.self_attn_layer_norm.weight", None)
            sd.pop(f"{p}.self_attn_layer_norm.bias", None)
            sd.pop(f"{p}.final_layer_norm.weight", None)
            sd.pop(f"{p}.final_layer_norm.bias", None)
        sd.pop(f"{tower}.layer_norm.weight", None)
        sd.pop(f"{tower}.layer_norm.bias", None)
        params[tower] = tower_params
    if sd:
        raise ValueError(f"unconverted CM3P keys: {sorted(sd)[:10]} (+{max(0, len(sd) - 10)} more)")
    return params


def load_cm3p(directory) -> Optional[tuple]:
    """(model, params, config, vocab) from a local CM3P checkpoint dir, or
    None with a printed reason. Native: cm3p_config.json + params.msgpack
    (+ tokenizer.json). Torch: cm3p_config.json + pytorch_model.bin."""
    from ..osu.vocab import Vocabulary

    directory = Path(directory)
    config_path = directory / "cm3p_config.json"
    if not config_path.exists():
        print(
            f"CM3P checkpoint {directory} unavailable (no local cm3p_config.json; "
            "the published hub checkpoint needs network access); skipping fid_cm3p"
        )
        return None
    config = _config_from_dict(json.loads(config_path.read_text()))
    model = Cm3p(config)
    vocab = None
    if (directory / "tokenizer.json").exists():
        vocab = Vocabulary.from_pretrained(directory)

    msgpack = directory / "params.msgpack"
    torch_bin = directory / "pytorch_model.bin"
    if msgpack.exists():
        import flax

        template = model.init(
            jax.random.PRNGKey(0),
            input_ids=jnp.zeros((1, 4), jnp.int32),
            frames=jnp.zeros((1, config.hop_length * 4), jnp.float32),
        )
        params = flax.serialization.from_bytes(template, msgpack.read_bytes())
    elif torch_bin.exists():
        import torch

        sd = {k: v.numpy() for k, v in torch.load(torch_bin, map_location="cpu").items()}
        params = {"params": convert_cm3p_state_dict(sd, config)}
    else:
        print(f"CM3P checkpoint {directory} has no params.msgpack/pytorch_model.bin; skipping fid_cm3p")
        return None
    return model, params, config, vocab
