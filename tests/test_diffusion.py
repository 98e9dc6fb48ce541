"""Diffusion math parity vs the reference torch implementation + DiT and
pipeline structure tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapperatorinator_tpu.diffusion import GaussianDiffusion, create_diffusion, space_timesteps
from mapperatorinator_tpu.diffusion.gaussian import get_named_beta_schedule
from tests.reference_shim import import_reference_osut5


@pytest.fixture(scope="module")
def ref_diffusion():
    import_reference_osut5()
    import sys

    sys.path.insert(0, "/root/reference")
    from osu_diffusion.utils.diffusion import create_diffusion as ref_create

    return ref_create


def test_beta_schedule_matches_reference(ref_diffusion):
    ref = ref_diffusion(timestep_respacing=[100, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                        noise_schedule="squaredcos_cap_v2", diffusion_steps=1000)
    ours = create_diffusion(timestep_respacing=[100, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                            noise_schedule="squaredcos_cap_v2", diffusion_steps=1000)
    np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12)
    np.testing.assert_array_equal(ours.timestep_map, ref.timestep_map)
    assert ours.num_timesteps == ref.num_timesteps == 100
    np.testing.assert_allclose(ours.posterior_mean_coef1, ref.posterior_mean_coef1, rtol=1e-12)
    np.testing.assert_allclose(ours.posterior_log_variance_clipped, ref.posterior_log_variance_clipped, rtol=1e-12)


def test_q_sample_matches_reference(ref_diffusion):
    import torch

    ref = ref_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=100)
    ours = create_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=100)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    noise = rng.standard_normal((2, 3, 4)).astype(np.float32)
    t = np.array([5, 50])

    want = ref.q_sample(torch.tensor(x), torch.tensor(t), torch.tensor(noise)).numpy()
    got = np.asarray(ours.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_p_mean_variance_matches_reference(ref_diffusion):
    """Learned-range sigma path with a deterministic dummy model."""
    import torch

    steps = 50
    ref = ref_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)
    ours = create_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)

    rng = np.random.default_rng(1)
    # reference layout: (N, C, T); ours: (N, T, C)
    x_nct = rng.standard_normal((2, 2, 6)).astype(np.float32)
    out_nct = rng.standard_normal((2, 4, 6)).astype(np.float32) * 0.1
    t = np.array([3, 30])

    def ref_model(x, tt, **kw):
        return torch.tensor(out_nct)

    want = ref.p_mean_variance(ref_model, torch.tensor(x_nct), torch.tensor(t), clip_denoised=True)

    def our_model(x, tt):
        return jnp.asarray(np.transpose(out_nct, (0, 2, 1)))

    got = ours.p_mean_variance(our_model, jnp.asarray(np.transpose(x_nct, (0, 2, 1))), jnp.asarray(t))

    for key in ("mean", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got[key]), (0, 2, 1)),
            want[key].numpy(),
            rtol=1e-4,
            atol=1e-5,
            err_msg=key,
        )


def test_ddim_deterministic_loop_matches_reference(ref_diffusion):
    """eta=0 DDIM with a fixed model and fixed init is fully deterministic —
    loop results must match the reference exactly."""
    import torch

    steps = 10
    # (linear schedule needs >=100 steps to keep betas <= 1)
    ref = ref_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)
    ours = create_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)

    rng = np.random.default_rng(2)
    noise_nct = rng.standard_normal((1, 2, 5)).astype(np.float32)
    w = rng.standard_normal((1, 4, 5)).astype(np.float32) * 0.05

    def ref_model(x, tt, **kw):
        return torch.tensor(w) + 0.1 * torch.cat([x, x], dim=1)

    want = ref.ddim_sample_loop(ref_model, noise_nct.shape, noise=torch.tensor(noise_nct), device="cpu").numpy()

    def our_model(x, tt):
        w_ntc = jnp.asarray(np.transpose(w, (0, 2, 1)))
        return w_ntc + 0.1 * jnp.concatenate([x, x], axis=-1)

    got = ours.ddim_sample_loop(
        our_model, noise=jnp.asarray(np.transpose(noise_nct, (0, 2, 1))), rng=jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 2, 1)), want, rtol=2e-4, atol=2e-5)


def test_training_losses_match_reference(ref_diffusion):
    import torch

    steps = 20
    ref = ref_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)
    ours = create_diffusion(timestep_respacing="", noise_schedule="squaredcos_cap_v2", diffusion_steps=steps)

    rng = np.random.default_rng(3)
    x_start = rng.standard_normal((2, 2, 6)).astype(np.float32)
    noise = rng.standard_normal((2, 2, 6)).astype(np.float32)
    w = rng.standard_normal((2, 4, 6)).astype(np.float32) * 0.1
    t = np.array([0, 10])

    def ref_model(x, tt, **kw):
        return torch.tensor(w)

    want = ref.training_losses(ref_model, torch.tensor(x_start), torch.tensor(t), noise=torch.tensor(noise))

    def our_model(x, tt):
        return jnp.asarray(np.transpose(w, (0, 2, 1)))

    # monkey-substitute noise: call internals directly
    x_t = ours.q_sample(jnp.asarray(np.transpose(x_start, (0, 2, 1))), jnp.asarray(t),
                        jnp.asarray(np.transpose(noise, (0, 2, 1))))
    model_output = our_model(x_t, t)
    c = 2
    mean_out, var_values = model_output[..., :c], model_output[..., c:]
    frozen = jnp.concatenate([mean_out, var_values], axis=-1)
    vb = ours._vb_terms(frozen, jnp.asarray(np.transpose(x_start, (0, 2, 1))), x_t, jnp.asarray(t))
    target = jnp.asarray(np.transpose(noise, (0, 2, 1)))
    mse = ((target - mean_out) ** 2).mean(axis=(1, 2))
    loss = mse + vb

    np.testing.assert_allclose(np.asarray(mse), want["mse"].numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vb), want["vb"].numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(loss), want["loss"].numpy(), rtol=1e-3, atol=1e-5)


def test_dit_forward_and_cfg():
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig, banded_attention_mask

    cfg = DiTConfig(in_channels=2, context_size=20, hidden_size=32, depth=2, num_heads=2, class_size=8)
    model = DiT(cfg)
    x = jnp.zeros((2, 6, 2))
    t = jnp.zeros((2,), jnp.int32)
    c = jnp.zeros((2, 6, 20))
    y = jnp.zeros((2, 8))
    params = model.init(jax.random.PRNGKey(0), x, t, c, y)
    out = model.apply(params, x, t, c, y, banded_attention_mask(6, 2))
    assert out.shape == (2, 6, 4)  # learned sigma doubles channels

    cfg_out = model.apply(params, x, t, c, y, 3.0, method=DiT.forward_with_cfg)
    assert cfg_out.shape == (2, 6, 4)
    # eps channels of both halves must be identical
    np.testing.assert_array_equal(np.asarray(cfg_out[0, :, :2]), np.asarray(cfg_out[1, :, :2]))


def test_pipeline_sequence_roundtrip():
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.infer.diffusion_pipeline import DiffusionPipeline
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig
    from mapperatorinator_tpu.osu.events import Event, EventType

    args = compose("/root/repo/configs/inference", "v32", schema_cls=schema.InferenceConfig)
    args.seed = 0
    args.max_seq_len = 32
    args.overlap_buffer = 4
    args.timesteps = [4]
    args.diffusion.model.diffusion_steps = 8

    dit_cfg = DiTConfig(in_channels=2, context_size=272, hidden_size=32, depth=1, num_heads=2, class_size=1)
    model = DiT(dit_cfg)
    x0 = jnp.zeros((2, 8, 2))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32), jnp.zeros((2, 8, 272)), jnp.zeros((2, 1)))

    from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab

    pipeline = DiffusionPipeline(args, (model, params), vocab=DiffusionVocab(num_cs_classes=1))
    E = Event
    events = [
        E(EventType.TIME_SHIFT, 1000), E(EventType.DISTANCE, 80), E(EventType.CIRCLE),
        E(EventType.TIME_SHIFT, 1500), E(EventType.DISTANCE, 100), E(EventType.CIRCLE),
        E(EventType.TIME_SHIFT, 2000), E(EventType.DISTANCE, 50), E(EventType.SPINNER),
    ]
    seq_x, seq_o, seq_c, seq_len, seq_indices, sliders = pipeline.events_to_sequence(events, None, 1.4)
    assert seq_len == 3
    assert seq_c.shape == (3, 128 + 128 + 16)
    assert list(seq_o) == [1000, 1500, 2000]

    from mapperatorinator_tpu.infer.processor import GenerationConfig

    out = pipeline.generate(events, GenerationConfig(), timing=None)
    # distance events replaced by generated positions
    types = [e.type for e in out]
    assert EventType.DISTANCE not in types
    assert types.count(EventType.POS_X) == 3 and types.count(EventType.POS_Y) == 3

    # chunk buckets: songs of different lengths in the same power-of-two
    # bucket must reuse ONE compiled sampling loop (the 3-min DiT-B
    # refinement was ~90% chunk-shape compiles before bucketing)
    assert len(pipeline._loop_cache) == 1
    events2 = events + [
        E(EventType.TIME_SHIFT, 2500), E(EventType.DISTANCE, 60), E(EventType.CIRCLE),
    ]
    out2 = pipeline.generate(events2, GenerationConfig(), timing=None)
    assert [e.type for e in out2].count(EventType.POS_X) == 4
    assert len(pipeline._loop_cache) == 1


def test_dit_padded_keys_do_not_affect_real_rows():
    """Bucket padding contract: a padded chunk with key-validity masking
    produces the same outputs on the real rows as the unpadded forward."""
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig, banded_attention_mask

    cfg = DiTConfig(in_channels=2, context_size=20, hidden_size=32, depth=2, num_heads=2, class_size=8)
    model = DiT(cfg)
    rng = np.random.default_rng(0)
    t_len, bucket = 12, 16
    x = jnp.asarray(rng.standard_normal((2, t_len, 2)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, t_len, 20)), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2, 8))
    params = model.init(jax.random.PRNGKey(0), x, t, c, y)

    band = 4
    ref = model.apply(params, x, t, c, y, banded_attention_mask(t_len, band))

    x_pad = jnp.pad(x, ((0, 0), (0, bucket - t_len), (0, 0)))
    c_pad = jnp.pad(c, ((0, 0), (0, bucket - t_len), (0, 0)))
    mask = np.asarray(banded_attention_mask(bucket, band)) & (np.arange(bucket) < t_len)[None, None, None, :]
    out = model.apply(params, x_pad, t, c_pad, y, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out[:, :t_len]), np.asarray(ref), atol=1e-5)
