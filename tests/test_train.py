"""Training runtime tests: optimizers, schedules, sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.config import schema
from mapperatorinator_tpu.parallel import make_mesh, replicate, shard_batch
from mapperatorinator_tpu.train.optim import (
    adamw_scale,
    build_optimizer,
    build_schedule,
    muon,
    muon_branch_mask,
    newton_schulz5,
)
from mapperatorinator_tpu.train.step import init_train_state, make_train_step


def test_newton_schulz_orthogonalizes():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    x = newton_schulz5(g, steps=10).astype(jnp.float32)
    # columns should be near-orthonormal: X^T X ~ diag in [0.5^2, 1.5^2]
    gram = np.asarray(x.T @ x)
    off_diag = gram - np.diag(np.diag(gram))
    assert np.abs(off_diag).max() < 0.35
    assert (np.diag(gram) > 0.2).all() and (np.diag(gram) < 2.3).all()


def test_adamw_scale_against_torch_reference():
    """One step of our optax AdamWScale vs the reference torch implementation."""
    import torch

    from tests.reference_shim import import_reference_osut5

    ref = import_reference_osut5()
    from osuT5.osuT5.utils.copied_utils import AdamWScale

    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    g0 = rng.standard_normal((8, 4)).astype(np.float32)

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = AdamWScale([p], lr=1e-2, weight_decay=0.01)
    p.grad = torch.tensor(g0)
    opt.step()
    want = p.detach().numpy()

    tx = adamw_scale(1e-2, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g0)}, state, params)
    got = np.asarray(params["w"] + updates["w"])

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_muon_step_against_torch_reference():
    import torch

    from tests.reference_shim import import_reference_osut5

    import_reference_osut5()
    from osuT5.osuT5.utils.muon_utils import Muon as TorchMuon

    rng = np.random.default_rng(2)
    w_mat = rng.standard_normal((32, 16)).astype(np.float32)
    g_mat = rng.standard_normal((32, 16)).astype(np.float32)
    w_vec = rng.standard_normal((16,)).astype(np.float32)
    g_vec = rng.standard_normal((16,)).astype(np.float32)

    p_mat = torch.nn.Parameter(torch.tensor(w_mat))
    p_vec = torch.nn.Parameter(torch.tensor(w_vec))
    opt = TorchMuon(muon_params=[p_mat], lr=0.002, adamw_lr=0.001, adamw_params=[p_vec],
                    adamw_betas=(0.90, 0.95), adamw_wd=0.01)
    p_mat.grad = torch.tensor(g_mat)
    p_vec.grad = torch.tensor(g_vec)
    opt.step()

    tx = muon(0.002, 0.001, adamw_wd=0.01, adamw_betas=(0.90, 0.95),
              muon_mask=lambda params: {"mat": True, "vec": False})
    params = {"mat": jnp.asarray(w_mat), "vec": jnp.asarray(w_vec)}
    state = tx.init(params)
    updates, _ = tx.update({"mat": jnp.asarray(g_mat), "vec": jnp.asarray(g_vec)}, state, params)
    got_mat = np.asarray(params["mat"] + updates["mat"])
    got_vec = np.asarray(params["vec"] + updates["vec"])

    # NS5 runs in bf16 -> tolerance reflects that
    np.testing.assert_allclose(got_mat, p_mat.detach().numpy(), rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(got_vec, p_vec.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_schedule_shapes():
    optim = schema.OptimizerConfig(
        base_lr=1e-2, warmup_steps=100, sustain_steps=50, total_steps=1000,
        lr_scheduler="cosine", final_cosine=1e-5,
    )
    sched = build_schedule(optim)
    assert float(sched(0)) == pytest.approx(5e-3)  # start factor 0.5
    assert float(sched(100)) == pytest.approx(1e-2, rel=1e-2)
    assert float(sched(125)) == pytest.approx(1e-2)  # sustain
    assert float(sched(999)) < 1e-3  # decayed
    assert float(sched(1000)) == pytest.approx(1e-5, rel=1e-1)


def test_muon_branch_mask():
    params = {
        "decoder_embedder": {"embedding": jnp.zeros((100, 8))},
        "proj_out": {"kernel": jnp.zeros((8, 100))},
        "layer": {"wqkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros(24)}},
    }
    mask = muon_branch_mask(params)
    assert not mask["decoder_embedder"]["embedding"]
    assert not mask["proj_out"]["kernel"]
    assert mask["layer"]["wqkv"]["kernel"]
    assert not mask["layer"]["wqkv"]["bias"]


@pytest.mark.parametrize("optimizer", ["adamwscale", "muon"])
def test_sharded_train_step(optimizer):
    """Full train step on the virtual 8-device mesh: loss decreases."""
    from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
    from mapperatorinator_tpu.models.transformer import TransformerConfig

    backbone = TransformerConfig(
        vocab_size=50, d_model=16, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, encoder_ffn=32, decoder_ffn=32,
        max_source_positions=8, max_target_positions=16, num_mel_bins=16,
        conv_stem=True,
    )
    cfg = MapperatorinatorConfig(
        backbone=backbone, vocab_size_in=60, vocab_size_out=50, n_mels=16,
        rhythm_token_start=3, rhythm_token_end=10,
    )
    model = Mapperatorinator(cfg)

    args = schema.TrainConfig()
    args.optim.name = optimizer
    args.optim.base_lr = 1e-2
    args.optim.base_lr_2 = 1e-2
    args.optim.warmup_steps = 0
    args.optim.sustain_steps = 2
    args.optim.total_steps = 100
    args.optim.grad_acc = 1

    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.standard_normal((8, 128 * 15)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, 60, (8, 8)).astype(np.int32),
        "decoder_attention_mask": np.ones((8, 8), np.int32),
        "labels": rng.integers(0, 50, (8, 8)).astype(np.int32),
    }

    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.asarray(batch["frames"][:1]),
        decoder_input_ids=jnp.asarray(batch["decoder_input_ids"][:1]),
    )
    from mapperatorinator_tpu.train.optim import build_optimizer

    tx = build_optimizer(args)
    state = init_train_state(params, tx)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)
    step = make_train_step(model, tx, mesh=mesh)

    losses = []
    for i in range(5):
        state, metrics = step(state, sharded, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizes the fixed batch


def test_tensor_parallel_step_matches_data_parallel():
    """dp4 x tp2 mesh produces the same loss/step as dp8 with replicated
    params (GSPMD collectives preserve the math)."""
    import numpy as np
    from jax.sharding import Mesh

    import __graft_entry__ as g
    from mapperatorinator_tpu.parallel import param_specs, shard_batch, shard_params
    from mapperatorinator_tpu.parallel.mesh import ensure_on_mesh, make_mesh, replicate
    from mapperatorinator_tpu.train import make_train_step
    from mapperatorinator_tpu.train.optim import build_optimizer
    from mapperatorinator_tpu.train.step import init_train_state

    model, args, vocab = g._tiny_v32_model(d_model=32, layers=1, heads=2, ffn=64, tgt_len=32, src_len=64)
    args.optim.name = "adamwscale"
    args.optim.warmup_steps = 10
    args.optim.total_steps = 100

    rng = np.random.default_rng(0)
    hop = 128
    batch_data = {
        "frames": rng.standard_normal((8, hop * 63)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, vocab.vocab_size_in, (8, 32)).astype(np.int32),
        "decoder_attention_mask": np.ones((8, 32), np.int32),
        "labels": rng.integers(0, vocab.vocab_size_out, (8, 32)).astype(np.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.asarray(batch_data["frames"][:1]),
        decoder_input_ids=jnp.asarray(batch_data["decoder_input_ids"][:1]),
    )
    tx = build_optimizer(args)
    params = jax.device_get(params)  # host copy: the jitted step donates its input state

    losses = {}
    for name, (shape, tensor) in {"dp8": ((8,), None), "dp4tp2": ((4, 2), "tensor")}.items():
        devices = np.asarray(jax.devices()[:8]).reshape(shape)
        mesh = Mesh(devices, ("data",) if tensor is None else ("data", "tensor"))
        if tensor:
            p = shard_params(mesh, params, tensor_axis=tensor)
            specs = param_specs(params, tensor_axis=tensor, mesh=mesh)
            n_tp = sum(1 for s in jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index"))
                       if "tensor" in str(s))
            assert n_tp > 0
        else:
            p = replicate(mesh, params)
        state = ensure_on_mesh(mesh, init_train_state(p, tx))
        step_fn = make_train_step(model, tx, mesh=mesh)
        _, metrics = step_fn(state, shard_batch(mesh, batch_data), jax.random.PRNGKey(1))
        losses[name] = float(metrics["loss"])

    assert np.isfinite(losses["dp8"])
    # sharded contractions change fp summation order; ~1e-4 drift expected
    assert abs(losses["dp8"] - losses["dp4tp2"]) < 2e-3, losses


def test_fsdp_sharded_step_matches_replicated():
    """FSDP param placement (parallel/sharding.py fsdp_axis: every large
    parameter sharded along its first dim, GSPMD inserting the gathers)
    produces the same loss as fully-replicated data parallelism — both as
    fsdp-over-the-data-axis (the classic ZeRO-3 layout) and as a separate
    dp4 x fsdp2 hybrid axis."""
    import numpy as np
    from jax.sharding import Mesh

    import __graft_entry__ as g
    from mapperatorinator_tpu.parallel import param_specs, shard_batch, shard_params
    from mapperatorinator_tpu.parallel.mesh import ensure_on_mesh, replicate
    from mapperatorinator_tpu.train import make_train_step
    from mapperatorinator_tpu.train.optim import build_optimizer
    from mapperatorinator_tpu.train.step import init_train_state

    model, args, vocab = g._tiny_v32_model(d_model=32, layers=1, heads=2, ffn=64, tgt_len=32, src_len=64)
    args.optim.name = "adamwscale"
    args.optim.warmup_steps = 10
    args.optim.total_steps = 100

    rng = np.random.default_rng(0)
    hop = 128
    batch_data = {
        "frames": rng.standard_normal((8, hop * 63)).astype(np.float32),
        "decoder_input_ids": rng.integers(0, vocab.vocab_size_in, (8, 32)).astype(np.int32),
        "decoder_attention_mask": np.ones((8, 32), np.int32),
        "labels": rng.integers(0, vocab.vocab_size_out, (8, 32)).astype(np.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.asarray(batch_data["frames"][:1]),
        decoder_input_ids=jnp.asarray(batch_data["decoder_input_ids"][:1]),
    )
    tx = build_optimizer(args)
    params = jax.device_get(params)

    losses = {}
    cases = {
        "dp8": ((8,), ("data",), None),
        "fsdp8": ((8,), ("data",), "data"),          # ZeRO-3: shard over the data axis
        "dp4fsdp2": ((4, 2), ("data", "fsdp"), "fsdp"),
    }
    for name, (shape, axes, fsdp) in cases.items():
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(shape), axes)
        if fsdp:
            p = shard_params(mesh, params, fsdp_axis=fsdp)
            specs = param_specs(params, fsdp_axis=fsdp, mesh=mesh)
            n_sharded = sum(1 for s in jax.tree.leaves(specs, is_leaf=lambda x: hasattr(x, "index"))
                            if fsdp in str(s))
            assert n_sharded > 0, f"{name}: no parameter actually fsdp-sharded"
            # the placement really shrinks per-device param bytes
            big = max(jax.tree.leaves(p), key=lambda x: x.size)
            assert big.addressable_shards[0].data.size < big.size
        else:
            p = replicate(mesh, params)
        state = ensure_on_mesh(mesh, init_train_state(p, tx))
        step_fn = make_train_step(model, tx, mesh=mesh)
        new_state, metrics = step_fn(state, shard_batch(mesh, batch_data), jax.random.PRNGKey(1))
        losses[name] = float(metrics["loss"])
        if fsdp:
            # updated params keep their FSDP placement across the step
            big = max(jax.tree.leaves(new_state.params), key=lambda x: x.size)
            assert big.addressable_shards[0].data.size < big.size

    assert np.isfinite(losses["dp8"])
    assert abs(losses["dp8"] - losses["fsdp8"]) < 2e-3, losses
    assert abs(losses["dp8"] - losses["dp4fsdp2"]) < 2e-3, losses
