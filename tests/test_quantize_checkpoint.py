"""Wrapper-level int8 weight-only quantization (models/io.py:quantize_checkpoint).

Structure-driven conversion: only the backbone's QDense sites become int8;
conditioning embedders stay fp. Logits must stay close to the fp model and
the InferenceConfig flag must thread through load_model.
"""

import flax.traverse_util
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.tiny_checkpoint import make_tiny_checkpoint, tiny_train_args


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    # d_model=128 / ffn=256: lane-tileable so QDense routes through the
    # fused Pallas qmm kernel (interpret-mode on the CPU mesh)
    return make_tiny_checkpoint(
        tmp_path_factory.mktemp("qckpt") / "ckpt", d_model=128, heads=4, ffn=256
    )


def test_quantize_checkpoint_structure_and_logits(ckpt):
    from mapperatorinator_tpu.models.io import load_checkpoint, quantize_checkpoint

    model, params, vocab = load_checkpoint(ckpt)
    qmodel, qparams = quantize_checkpoint(model, params)

    flat = flax.traverse_util.flatten_dict(qparams, sep="/")
    q_keys = [k for k in flat if k.endswith("kernel_q")]
    assert q_keys, "no kernels were quantized"
    assert all(np.asarray(flat[k]).dtype == np.int8 for k in q_keys)
    # non-QDense sites keep fp kernels (conv stems are 3-D, never quantized)
    fp_kernels = [k for k in flat if k.endswith("/kernel")]
    assert any("conv" in k for k in fp_kernels)

    # the quantized structure must match the quantized model's own init
    shapes = jax.eval_shape(
        lambda: qmodel.init(
            jax.random.PRNGKey(0),
            frames=jnp.zeros((1, qmodel.config.hop_length * 15), jnp.float32),
            decoder_input_ids=jnp.ones((1, 4), jnp.int32),
        )
    )
    assert set(flax.traverse_util.flatten_dict(shapes, sep="/")) == set(flat)

    hop = qmodel.config.hop_length
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(1, hop * 15)), jnp.float32)
    ids = jnp.ones((1, 6), jnp.int32)
    cond = dict(
        difficulty=jnp.full((1,), 4.5),
        mapper_idx=jnp.zeros((1,), jnp.int32),
        song_position=jnp.zeros((1, 2)),
    )
    out, _ = model.apply(params, frames=frames, decoder_input_ids=ids, **cond)
    outq, _ = qmodel.apply(qparams, frames=frames, decoder_input_ids=ids, **cond)
    rel = float(jnp.abs(out - outq).max() / (jnp.abs(out).max() + 1e-9))
    assert rel < 0.06
    assert float((out.argmax(-1) == outq.argmax(-1)).mean()) > 0.8


def test_load_model_quantized_flag(ckpt, tmp_path):
    """InferenceConfig.quantized_weights=True loads an int8 engine that decodes."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from inference import load_model

    from mapperatorinator_tpu.config import compose, schema

    args = compose(
        str(__import__("pathlib").Path(__file__).resolve().parents[1] / "configs" / "inference"),
        "v32", schema_cls=schema.InferenceConfig,
    )
    args.model_path = str(ckpt)
    args.gamemode = 0
    args.quantized_weights = True
    args.train = tiny_train_args()

    engine, vocab = load_model(args)
    flat = flax.traverse_util.flatten_dict(engine.params, sep="/")
    assert any(k.endswith("kernel_q") for k in flat)

    from mapperatorinator_tpu.decode.logits import LogitsPipeline

    hop = engine.model.config.hop_length
    enc = engine.encode(
        jnp.zeros((1, hop * 15), jnp.float32),
        difficulty=jnp.full((1,), 4.5),
        mapper_idx=jnp.zeros((1,), jnp.int32),
        song_position=jnp.zeros((1, 2)),
    )
    pipeline = LogitsPipeline(
        vocab_size=engine.model.config.vocab_size_out, time_start=0, time_end=0,
        sos_ids=(), eos_ids=(vocab.eos_id,),
    )
    tokens, cur_len = engine.generate(
        enc, np.full((1, 1), vocab.sos_id, np.int32), pipeline,
        eos_ids=[vocab.eos_id], max_length=8,
    )
    tokens = np.asarray(tokens)
    assert tokens.shape[0] == 1 and tokens.shape[1] >= 8
    assert tokens.dtype.kind == "i" and int(np.asarray(cur_len).reshape(-1)[0]) >= 1
