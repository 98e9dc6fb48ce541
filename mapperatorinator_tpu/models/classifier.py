"""Mapper-style classifier + rhythm-complexity estimator in Flax.

* :class:`OsuClassifier` — whisper-style encoder-decoder over (mel audio,
  beatmap tokens); mean-pooled projector + linear head over mappers; the
  pooled projection doubles as the FID feature vector
  (reference: ``classifier/libs/model/model.py:62-145``).
* :class:`OsuR` — MLP over embedded token windows predicting the
  next-note-timing distribution; per-second cross-entropy = rhythm
  complexity (reference: ``rcomplexion/libs/model/osu_r.py:13-65``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..audio.mel import MelSpectrogram
from .transformer import OsuTransformer, TransformerConfig


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    backbone: TransformerConfig = TransformerConfig()
    vocab_size: int = 4096  # beatmap-token vocab (decoder side)
    num_classes: int = 3731  # mappers
    classifier_proj_size: int = 256
    sample_rate: int = 16000
    n_fft: int = 1024
    n_mels: int = 388
    hop_length: int = 128


class OsuClassifier(nn.Module):
    config: ClassifierConfig

    def setup(self):
        cfg = self.config
        b = cfg.backbone
        self.spectrogram = MelSpectrogram(
            implementation="xla",
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            n_mels=cfg.n_mels,
            hop_length=cfg.hop_length,
        )
        self.transformer = OsuTransformer(b, name="transformer")
        self.decoder_embedder = nn.Embed(cfg.vocab_size, b.d_model, name="decoder_embedder")
        self.encoder_embedder = nn.Dense(b.d_model, name="encoder_embedder")
        self.projector = nn.Dense(cfg.classifier_proj_size, name="projector")
        self.classifier = nn.Dense(cfg.num_classes, name="classifier")

    def __call__(
        self,
        frames: jnp.ndarray,
        decoder_input_ids: jnp.ndarray,
        decoder_attention_mask: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """frames: (B, n_samples) raw audio; decoder_input_ids: (B, T)."""
        mel = self.spectrogram(frames)
        inputs_embeds = self.encoder_embedder(mel)
        decoder_embeds = self.decoder_embedder(decoder_input_ids)

        self_mask = None
        if decoder_attention_mask is not None:
            self_mask = decoder_attention_mask[:, None, None, :].astype(bool)
        encoder_states = self.transformer.encoder(inputs_embeds, deterministic=deterministic)
        hidden, _ = self.transformer.decoder(
            decoder_embeds, encoder_states, self_mask=self_mask, deterministic=deterministic
        )

        projected = self.projector(hidden)
        pooled = projected.mean(axis=1)
        logits = self.classifier(pooled)

        loss = None
        if labels is not None:
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
            loss = nll.mean()

        return {
            "loss": loss,
            "logits": logits,
            "feature_vector": pooled,
            "decoder_last_hidden_state": hidden,
            "encoder_last_hidden_state": encoder_states,
        }


@dataclasses.dataclass(frozen=True)
class OsuRConfig:
    vocab_size_in: int = 9920
    vocab_size_out: int = 3988
    src_seq_len: int = 64
    hidden_size: int = 128


class OsuR(nn.Module):
    """Next-note-timing MLP; per-token CE gives the rhythm-complexity signal."""

    config: OsuRConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        sample_weights: Optional[jnp.ndarray] = None,
    ):
        cfg = self.config
        h = nn.Embed(cfg.vocab_size_in, cfg.hidden_size, name="embed")(input_ids)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(cfg.hidden_size * 4, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.hidden_size * 2, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.hidden_size, name="fc3")(h)
        h = nn.relu(h)
        logits = nn.Dense(cfg.vocab_size_out, name="head")(h)

        loss = None
        if labels is not None:
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
            if sample_weights is not None:
                nll = nll * sample_weights
            loss = nll.mean()

        return {"loss": loss, "logits": logits}


# -- transfer learning from a pretrained osuT5 checkpoint ---------------------

# reference ignore list (classifier/train.py:22-29): the decoder token /
# position embeddings and LM head belong to the generation vocab, the
# decoder_embedder to the classifier's own input vocab, loss weights to the
# osuT5 objective — none transfer.
_TRANSFER_IGNORE = (
    ("transformer", "decoder", "embed_tokens"),
    ("transformer", "decoder", "embed_positions"),
    ("transformer", "proj_out"),
    ("decoder_embedder",),
    ("loss_fn",),
)


def transfer_from_pretrained(classifier_params, pretrained_params) -> dict:
    """Initialize the classifier's towers from an osuT5 checkpoint
    (reference ``classifier/train.py:19-41,58-59``): graft every leaf whose
    path exists in both trees — the shared encoder/decoder stacks and the
    ``encoder_embedder`` projection — except the reference's ignore list.
    Classifier-only leaves (projector, classifier head) keep their fresh
    init (torch ``load_state_dict(strict=False)`` semantics); a shape
    mismatch on a transferable path raises, exactly as torch would.
    """
    import flax.traverse_util as traverse

    flat_clf = traverse.flatten_dict(classifier_params["params"])
    flat_pre = traverse.flatten_dict(pretrained_params["params"])

    grafted = 0
    out = {}
    for key, value in flat_clf.items():
        if any(key[: len(ig)] == ig for ig in _TRANSFER_IGNORE):
            out[key] = value
            continue
        src = flat_pre.get(key)
        if src is None:
            out[key] = value
            continue
        if tuple(src.shape) != tuple(value.shape):
            raise ValueError(
                f"pretrained checkpoint shape mismatch at {'/'.join(key)}: "
                f"{tuple(src.shape)} vs classifier {tuple(value.shape)} — "
                "configure the classifier backbone to the checkpoint's dims"
            )
        out[key] = jnp.asarray(src, dtype=value.dtype) if hasattr(value, "dtype") else src
        grafted += 1
    if grafted == 0:
        raise ValueError(
            "no transferable parameters found in the pretrained checkpoint "
            "(wrong backbone family/scheme for this classifier config?)"
        )
    rest = {k: v for k, v in dict(classifier_params).items() if k != "params"}
    return {"params": traverse.unflatten_dict(out), **rest}
