"""LoRA adapter tests: init/merge semantics, save/load, compatibility gating,
gamemode checkpoint resolution, and the LoRA training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
from mapperatorinator_tpu.models.lora import (
    init_lora_params,
    load_lora,
    merge_lora,
    normalize_targets,
    resolve_compatible_lora_path,
    resolve_model_checkpoint_path,
    save_lora,
)
from mapperatorinator_tpu.models.transformer import TransformerConfig
from mapperatorinator_tpu.train.step import init_train_state, make_lora_train_step

import flax
import optax


@pytest.fixture(scope="module")
def tiny_model():
    backbone = TransformerConfig(
        vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
        max_source_positions=32, max_target_positions=64, num_mel_bins=32,
        position_scheme="rope", norm="rms", conv_stem=True,
    )
    cfg = MapperatorinatorConfig(
        backbone=backbone, vocab_size_in=80, vocab_size_out=64,
        n_mels=128, spectrogram_log_scale=True, f_min=20, pad_mode="reflect",
        project_encoder_input=True, embed_decoder_input=True,
        rhythm_token_start=3, rhythm_token_end=10,
    )
    model = Mapperatorinator(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, 128 * 15), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    return model, params


def test_normalize_targets_aliases():
    assert normalize_targets(["q_proj", "k_proj", "v_proj", "out_proj"]) == ("wq", "wkv", "wo")
    assert normalize_targets(None) == ("wq", "wkv", "wqkv", "wo")


def test_init_and_merge_identity(tiny_model):
    model, params = tiny_model
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    flat = flax.traverse_util.flatten_dict(lora, sep="/")
    assert len(flat) > 0
    for path, leaf in flat.items():
        assert path.endswith("/a") or path.endswith("/b")
        if path.endswith("/a"):
            assert leaf.shape[1] == 4
        else:
            assert (leaf == 0).all()

    # B = 0 at init -> merge is the identity
    merged = merge_lora(params, lora, alpha=128.0)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_merge_changes_only_targets(tiny_model):
    model, params = tiny_model
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4, target_modules=["wq"])
    lora = jax.tree.map(lambda x: jnp.ones_like(x), lora)
    merged = merge_lora(params, lora, alpha=8.0)
    flat_p = flax.traverse_util.flatten_dict(params, sep="/")
    flat_m = flax.traverse_util.flatten_dict(merged, sep="/")
    for path in flat_p:
        changed = not np.allclose(np.asarray(flat_p[path]), np.asarray(flat_m[path]))
        assert changed == ("/wq/kernel" in f"/{path}"), path


def test_save_load_roundtrip(tiny_model, tmp_path):
    model, params = tiny_model
    lora = init_lora_params(jax.random.PRNGKey(2), params, rank=4)
    lora = jax.tree.map(lambda x: x + 0.5, lora)
    save_lora(tmp_path / "lora", lora, rank=4, alpha=64.0,
              ckpt_subfolders=["", "gamemode=3"])
    loaded, config = load_lora(tmp_path / "lora", params)
    assert config["r"] == 4 and config["lora_alpha"] == 64.0
    assert config["ckpt_subfolders"] == ["", "gamemode=3"]
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resolve_compatible_lora(tiny_model, tmp_path):
    model, params = tiny_model
    lora = init_lora_params(jax.random.PRNGKey(2), params, rank=2)
    save_lora(tmp_path / "lora", lora, rank=2, alpha=4.0, ckpt_subfolders=["gamemode=1"])

    path, cfg = resolve_compatible_lora_path(tmp_path / "lora", "gamemode=1")
    assert path is not None
    path, cfg = resolve_compatible_lora_path(tmp_path / "lora", "")
    assert path is None  # restricted to gamemode=1
    # unrestricted adapter
    save_lora(tmp_path / "lora2", lora, rank=2, alpha=4.0)
    path, cfg = resolve_compatible_lora_path(tmp_path / "lora2", "gamemode=2")
    assert path is not None
    assert resolve_compatible_lora_path(None) == (None, None)


def test_gamemode_checkpoint_resolution(tmp_path):
    (tmp_path / "gamemode=3").mkdir()
    assert resolve_model_checkpoint_path(tmp_path, gamemode=3) == tmp_path / "gamemode=3"
    assert resolve_model_checkpoint_path(tmp_path, gamemode=1) == tmp_path
    assert resolve_model_checkpoint_path(tmp_path, gamemode=None) == tmp_path
    assert resolve_model_checkpoint_path(tmp_path, gamemode=3, auto_select_gamemode_model=False) == tmp_path


def test_lora_train_step(tiny_model):
    model, params = tiny_model
    lora = init_lora_params(jax.random.PRNGKey(3), params, rank=4)
    tx = optax.adamw(1e-2)
    state = init_train_state(lora, tx)
    step = make_lora_train_step(model, tx, params, alpha=16.0)

    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.normal(size=(2, 128 * 15)), jnp.float32),
        "decoder_input_ids": jnp.asarray(rng.integers(3, 60, (2, 16)), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, 60, (2, 16)), jnp.int32),
    }
    state1, metrics1 = step(state, batch, jax.random.PRNGKey(0))
    state2, metrics2 = step(state1, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics1["loss"]))
    assert float(metrics2["loss"]) < float(metrics1["loss"])  # same batch -> improves

    # only the factors train; merged weights differ from base afterwards
    b_leaves = [
        leaf for path, leaf in flax.traverse_util.flatten_dict(state2.params, sep="/").items()
        if path.endswith("/b")
    ]
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in b_leaves)


def test_varwhisper_target_aliases():
    assert normalize_targets(["Wq", "Wkv", "Wqkv", "Wo"]) == ("wq", "wkv", "wqkv", "wo")
