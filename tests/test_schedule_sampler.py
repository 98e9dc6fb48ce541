"""Loss-aware timestep schedule samplers vs the reference semantics.

The numpy model inside these tests is a direct port of the reference's
``LossSecondMomentResampler`` update/weights logic
(osu_diffusion/utils/diffusion/timestep_sampler.py:120-152); the jax
implementation's state evolution and weights must match it exactly,
including ring-buffer shifts and duplicate timesteps within one batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.diffusion.schedule_sampler import make_schedule_sampler


class _NumpyReference:
    """Reference-semantics LossSecondMomentResampler (numpy, host-side)."""

    def __init__(self, num_timesteps, history_per_term=10, uniform_prob=0.001):
        self.T = num_timesteps
        self.h = history_per_term
        self.uniform_prob = uniform_prob
        self.history = np.zeros((num_timesteps, history_per_term), np.float64)
        self.counts = np.zeros((num_timesteps,), np.int64)

    def update(self, ts, losses):
        for t, loss in zip(ts, losses):
            if self.counts[t] == self.h:
                self.history[t, :-1] = self.history[t, 1:]
                self.history[t, -1] = loss
            else:
                self.history[t, self.counts[t]] = loss
                self.counts[t] += 1

    def weights(self):
        if not (self.counts == self.h).all():
            return np.ones([self.T], np.float64)
        w = np.sqrt(np.mean(self.history**2, axis=-1))
        w /= np.sum(w)
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w


def test_uniform_sampler_capped_support():
    s = make_schedule_sampler("uniform", num_timesteps=1000, max_timestep=100)
    state = s.init()
    t, iw = jax.jit(lambda st, r: s.sample(st, r, 512))(state, jax.random.PRNGKey(0))
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() < 100
    # reference train.py:192 parity: losses enter the objective unweighted
    assert np.allclose(np.asarray(iw), 1.0)
    # update is a no-op
    assert s.update(state, t, jnp.ones_like(t, jnp.float32)) == state


def test_unknown_sampler_name_raises():
    with pytest.raises(NotImplementedError):
        make_schedule_sampler("nope", num_timesteps=10)


def test_loss_second_moment_state_matches_reference_semantics():
    T, H = 13, 4
    rng = np.random.default_rng(0)
    s = make_schedule_sampler("loss-second-moment", num_timesteps=T, history_per_term=H)
    state = s.init()
    ref = _NumpyReference(T, history_per_term=H)

    update = jax.jit(s.update)
    weights = jax.jit(s.weights)

    for step in range(40):
        batch = rng.integers(0, T, size=8)          # duplicates guaranteed
        losses = rng.random(8).astype(np.float32)
        state = update(state, jnp.asarray(batch), jnp.asarray(losses))
        ref.update(batch, losses)
        np.testing.assert_allclose(np.asarray(state["history"]), ref.history, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(state["counts"]), ref.counts)
        np.testing.assert_allclose(np.asarray(weights(state)), ref.weights(), atol=1e-6)


def test_loss_second_moment_importance_weights_unbiased():
    """After warm-up, E[iw * f(t)] must equal mean_t f(t) (importance
    sampling identity); check the weight formula 1/(S*p) directly."""
    T, H = 8, 2
    s = make_schedule_sampler("loss-second-moment", num_timesteps=T, history_per_term=H)
    state = s.init()
    # warm up with per-timestep losses proportional to t+1
    for _ in range(H):
        state = s.update(state, jnp.arange(T), jnp.arange(1, T + 1, dtype=jnp.float32))
    w = np.asarray(s.weights(state))
    p = w / w.sum()
    t, iw = s.sample(state, jax.random.PRNGKey(1), 4096)
    t, iw = np.asarray(t), np.asarray(iw)
    np.testing.assert_allclose(iw, 1.0 / (T * p[t]), rtol=1e-5)
    # heavier losses → higher sampling probability
    assert p[-1] > p[0]
    # unbiasedness: E[iw] ≈ 1
    assert abs(iw.mean() - 1.0) < 0.05


def test_loss_second_moment_warmup_is_uniform():
    T = 6
    s = make_schedule_sampler("loss-second-moment", num_timesteps=T, history_per_term=3)
    state = s.init()
    # partially warmed (one timestep short) → still uniform
    for _ in range(3):
        state = s.update(state, jnp.arange(T - 1), jnp.ones((T - 1,), jnp.float32))
    np.testing.assert_allclose(np.asarray(s.weights(state)), np.ones(T))


def test_train_step_with_loss_aware_sampler(tmp_path):
    """The wired train step runs and evolves the sampler history."""
    import optax

    from diffusion_train import make_diffusion_train_step
    from mapperatorinator_tpu.diffusion import create_diffusion
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig

    T = 16
    # cosine schedule: the linear default's 1000/T beta rescale is degenerate
    # (beta>1) at tiny T, in the reference too — real configs use cosine
    diffusion = create_diffusion(timestep_respacing="", diffusion_steps=T,
                                 noise_schedule="squaredcos_cap_v2")
    cfg = DiTConfig.from_name("DiT-T", context_size=272, class_size=20)
    model = DiT(cfg)
    seq_len = 8
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, seq_len, cfg.in_channels)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, seq_len, cfg.context_size)),
                        jnp.zeros((1, 20)))
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    sampler = make_schedule_sampler("loss-second-moment", num_timesteps=T, max_timestep=T,
                                    history_per_term=2)
    step_fn = make_diffusion_train_step(model, diffusion, tx, max_t=T, sampler=sampler)

    batch = {
        "x": jnp.asarray(np.random.default_rng(0).standard_normal((4, seq_len, 2)), jnp.float32),
        "c": jnp.zeros((4, seq_len, 272), jnp.float32),
        "y": jnp.zeros((4, 20), jnp.float32),
    }
    ema = jax.tree.map(lambda x: x, params)
    state = sampler.init()
    for i in range(3):
        params, ema, opt_state, loss, state = step_fn(params, ema, opt_state, batch,
                                                      jax.random.PRNGKey(i), state)
    assert np.isfinite(float(loss))
    assert int(np.asarray(state["counts"]).sum()) == 12  # 3 steps x batch 4
