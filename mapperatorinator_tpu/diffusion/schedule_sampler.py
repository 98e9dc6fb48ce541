"""Diffusion timestep schedule samplers.

Reference: ``osu_diffusion/utils/diffusion/timestep_sampler.py:27-120``
(uniform sampling and loss-second-moment importance resampling, the
IDDPM-lineage variance-reduction technique). The reference keeps sampler
state in host numpy, draws with ``np.random.choice``, and synchronizes
ranks by all_gathering python lists of ``(t, loss)`` pairs through
``torch.distributed`` (timestep_sampler.py:71-106).

TPU-first redesign: the state is a small pytree of device arrays and
``sample``/``update`` are pure, jit-compatible transforms that live
*inside* the compiled train step — no host round-trip per step. Under a
data-sharded mesh the per-sample timesteps and losses are already global
arrays, so the history update executes replicated by GSPMD and every
process holds the identical state; the reference's explicit gather has no
equivalent code here by design.

The reference's own train loop does not use these samplers (it draws
uniform timesteps capped at ``max_diffusion_step``,
osu_diffusion/train.py:192); they are a library capability. Parity with
that default is preserved: ``make_schedule_sampler("uniform", ...)`` with a
cap reproduces the capped-uniform draw with unit loss weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScheduleSampler:
    """A distribution over diffusion timesteps with optional loss-aware
    importance resampling.

    Functional API (all jit-compatible):
      state = sampler.init()
      t, weights = sampler.sample(state, rng, batch_size)
      state = sampler.update(state, t, per_sample_losses)

    ``weights`` are the unbiased importance weights ``1 / (S * p[t])``
    (S = support size), to be multiplied into the per-sample losses so the
    objective's mean is unchanged (reference timestep_sampler.py:44-58).
    """

    name: str
    num_timesteps: int
    max_timestep: Optional[int] = None  # exclusive cap (refine models)
    history_per_term: int = 10
    uniform_prob: float = 0.001

    @property
    def support_size(self) -> int:
        if self.max_timestep is None:
            return self.num_timesteps
        return min(self.max_timestep, self.num_timesteps)

    def _support_mask(self) -> jnp.ndarray:
        return (jnp.arange(self.num_timesteps) < self.support_size).astype(jnp.float32)

    # -- state ---------------------------------------------------------

    def init(self) -> dict:
        if self.name == "uniform":
            return {}
        return {
            "history": jnp.zeros((self.num_timesteps, self.history_per_term), jnp.float32),
            "counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    # -- weights -------------------------------------------------------

    def weights(self, state: dict) -> jnp.ndarray:
        """Per-timestep unnormalized sampling weights over the support.

        Loss-second-moment: sqrt(E[loss^2]) per timestep once every
        timestep has a full history, mixed with ``uniform_prob`` mass of
        uniform exploration; uniform until warmed up
        (reference timestep_sampler.py:126-134).
        """
        mask = self._support_mask()
        if self.name == "uniform":
            return mask
        counts = state["counts"]
        # warm-up only requires history for reachable timesteps
        warmed = jnp.all(jnp.where(mask > 0, counts >= self.history_per_term, True))
        w = jnp.sqrt(jnp.mean(jnp.square(state["history"]), axis=-1)) * mask
        w = w / jnp.maximum(jnp.sum(w), 1e-20)
        w = w * (1.0 - self.uniform_prob) + self.uniform_prob / self.support_size * mask
        return jnp.where(warmed, w, mask)

    # -- sampling ------------------------------------------------------

    def sample(self, state: dict, rng: jax.Array, batch_size: int):
        """Draw ``batch_size`` timesteps and their importance weights."""
        w = self.weights(state)
        p = w / jnp.sum(w)
        logits = jnp.log(jnp.maximum(p, 1e-30))
        t = jax.random.categorical(rng, logits, shape=(batch_size,))
        if self.name == "uniform":
            # reference train.py:192 parity: plain capped-uniform draw,
            # losses enter the objective unweighted
            iw = jnp.ones((batch_size,), jnp.float32)
        else:
            iw = 1.0 / (self.support_size * p[t])
        return t, iw

    # -- history update ------------------------------------------------

    def update(self, state: dict, t: jnp.ndarray, losses: jnp.ndarray) -> dict:
        """Push per-sample losses into each timestep's ring history.

        Semantics match the reference exactly (timestep_sampler.py:136-144):
        while a timestep's history is not full, append at the fill index;
        once full, shift the oldest loss out. Duplicate timesteps within a
        batch apply sequentially, so the loop is a ``fori_loop`` over the
        (static) batch dimension — a handful of scalar scatters per step,
        negligible next to the DiT forward.
        """
        if self.name == "uniform":
            return state
        h = self.history_per_term

        def body(i, st):
            hist, cnt = st
            ti = t[i]
            li = losses[i].astype(jnp.float32)
            c = cnt[ti]
            row = hist[ti]
            shifted = jnp.roll(row, -1).at[h - 1].set(li)
            written = row.at[jnp.clip(c, 0, h - 1)].set(li)
            hist = hist.at[ti].set(jnp.where(c >= h, shifted, written))
            cnt = cnt.at[ti].set(jnp.minimum(c + 1, h))
            return hist, cnt

        hist, cnt = jax.lax.fori_loop(0, t.shape[0], body, (state["history"], state["counts"]))
        return {"history": hist, "counts": cnt}


def make_schedule_sampler(name: str, num_timesteps: int, max_timestep: Optional[int] = None,
                          history_per_term: int = 10, uniform_prob: float = 0.001) -> ScheduleSampler:
    """Create a named schedule sampler (reference timestep_sampler.py:13-24)."""
    if name not in ("uniform", "loss-second-moment"):
        raise NotImplementedError(f"unknown schedule sampler: {name}")
    return ScheduleSampler(name=name, num_timesteps=num_timesteps, max_timestep=max_timestep,
                           history_per_term=history_per_term, uniform_prob=uniform_prob)
