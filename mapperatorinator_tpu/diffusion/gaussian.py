"""Gaussian diffusion (ADM/IDDPM lineage) for JAX.

Numerically matches the reference's OpenAI-derived implementation
(reference: ``osu_diffusion/utils/diffusion/gaussian_diffusion.py:59-874``,
``respace.py:11-130``): squaredcos_cap_v2 / linear beta schedules, epsilon
prediction with LEARNED_RANGE sigma, timestep respacing (incl. per-section
counts like ``[100,0,...]``), DDPM and DDIM sampling, and MSE+VB training
losses. The sampling loops run as ``lax.scan`` over the respaced steps —
one compiled program per (shape, steps) — with the in-painting
``denoised_fn`` threaded as a pure function of (pred_xstart, step_rng).

Coefficient tables are float64 numpy at build time (matching the reference's
precision), gathered as fp32 on device.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "squaredcos_cap_v2":
        alpha_bar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = []
        for i in range(num_diffusion_timesteps):
            t1 = i / num_diffusion_timesteps
            t2 = (i + 1) / num_diffusion_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Respacing step selection (reference: respace.py:11-62)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {num_timesteps} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        start_idx += size
    return set(all_steps)


class GaussianDiffusion:
    """Respaced diffusion process. ``model_fn(x, t, rng)`` receives ORIGINAL
    timesteps (the respacing map is applied internally). x is (N, T, C)."""

    def __init__(
        self,
        betas: np.ndarray,
        use_timesteps: Optional[set] = None,
        learn_sigma: bool = True,
        predict_xstart: bool = False,
        use_l1: bool = False,
        rescale_vb: bool = False,
    ):
        self.rescale_vb = rescale_vb
        betas = np.asarray(betas, np.float64)
        self.original_num_steps = len(betas)
        if use_timesteps is not None:
            base_alphas_cumprod = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, self.timestep_map = [], []
            for i, ac in enumerate(base_alphas_cumprod):
                if i in use_timesteps:
                    new_betas.append(1 - ac / last)
                    last = ac
                    self.timestep_map.append(i)
            betas = np.array(new_betas, np.float64)
        else:
            self.timestep_map = list(range(len(betas)))

        self.learn_sigma = learn_sigma
        self.predict_xstart = predict_xstart
        self.use_l1 = use_l1
        self.betas = betas
        self.num_timesteps = len(betas)

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)

        self.posterior_variance = betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        self.posterior_log_variance_clipped = (
            np.log(np.append(self.posterior_variance[1], self.posterior_variance[1:]))
            if len(self.posterior_variance) > 1
            else np.array([])
        )
        self.posterior_mean_coef1 = betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        self.posterior_mean_coef2 = (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)

    # -- table gathers -------------------------------------------------------------

    @staticmethod
    def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        out = jnp.asarray(arr, jnp.float32)[t]
        return out.reshape(out.shape[0], *([1] * (ndim - 1)))

    # -- q distributions -------------------------------------------------------------

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        nd = x_start.ndim
        return (
            self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            self._extract(self.posterior_mean_coef1, t, nd) * x_start
            + self._extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        var = self._extract(self.posterior_variance, t, nd)
        log_var = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    # -- p distribution ---------------------------------------------------------------

    def _map_t(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(np.asarray(self.timestep_map, np.int32))[t]

    def p_mean_variance(
        self,
        model_fn: Callable,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        denoised_rng: Optional[jnp.ndarray] = None,
    ) -> dict:
        nd = x.ndim
        model_output = model_fn(x, self._map_t(t))

        if self.learn_sigma:
            c = x.shape[-1]
            model_output, model_var_values = model_output[..., :c], model_output[..., c:]
            min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
            max_log = self._extract(np.log(self.betas), t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
        else:
            var = np.append(self.posterior_variance[1], self.betas[1:])
            model_variance = self._extract(var, t, nd)
            model_log_variance = self._extract(np.log(var), t, nd)

        if self.predict_xstart:
            pred_xstart = model_output
        else:
            pred_xstart = self._predict_xstart_from_eps(x, t, model_output)
        if denoised_fn is not None:
            pred_xstart = denoised_fn(pred_xstart, denoised_rng)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -2, 2)

        mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {
            "mean": mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # -- sampling -------------------------------------------------------------------

    def p_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None
    ) -> dict:
        rng_noise, rng_dn = jax.random.split(rng)
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn, rng_dn)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn,
        shape=None,
        rng=None,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        start_t: Optional[int] = None,
    ) -> jnp.ndarray:
        """DDPM ancestral sampling as a lax.scan over the respaced steps
        (reference: gaussian_diffusion.py:469-561). ``start_t`` limits to the
        noisiest ``start_t`` respaced steps (for partially-noised inputs)."""
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape, jnp.float32)
        n_steps = self.num_timesteps if start_t is None else start_t
        indices = jnp.arange(n_steps - 1, -1, -1)

        def body(carry, i):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            t = jnp.full((x.shape[0],), i, jnp.int32)
            out = self.p_sample(model_fn, x, t, sub, clip_denoised, denoised_fn)
            return (out["sample"], rng), None

        (x, _), _ = jax.lax.scan(body, (noise, rng), indices)
        return x

    def ddim_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None, eta: float = 0.0
    ) -> dict:
        rng_noise, rng_dn = jax.random.split(rng)
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn, rng_dn)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev - sigma**2
        ) * eps
        nonzero = (t != 0).astype(x.dtype).reshape(-1, *([1] * (nd - 1)))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn,
        shape=None,
        rng=None,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        eta: float = 0.0,
        start_t: Optional[int] = None,
    ) -> jnp.ndarray:
        if noise is None:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape, jnp.float32)
        n_steps = self.num_timesteps if start_t is None else start_t
        indices = jnp.arange(n_steps - 1, -1, -1)

        def body(carry, i):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            t = jnp.full((x.shape[0],), i, jnp.int32)
            out = self.ddim_sample(model_fn, x, t, sub, clip_denoised, denoised_fn, eta)
            return (out["sample"], rng), None

        (x, _), _ = jax.lax.scan(body, (noise, rng), indices)
        return x

    # -- training ---------------------------------------------------------------------

    def training_losses(self, model_fn, x_start, t, rng) -> dict:
        """MSE(+VB for learned sigma) losses (reference:
        gaussian_diffusion.py:785-874). Returns per-sample losses (N,)."""
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        model_output = model_fn(x_t, self._map_t(t))

        terms = {}
        if self.learn_sigma:
            c = x_t.shape[-1]
            mean_out, var_values = model_output[..., :c], model_output[..., c:]
            frozen = jnp.concatenate([jax.lax.stop_gradient(mean_out), var_values], axis=-1)
            terms["vb"] = self._vb_terms(frozen, x_start, x_t, t)
            # the reference only rescales vb for RESCALED_* loss types; its
            # create_diffusion default is plain MSE (no rescale)
            if self.rescale_vb:
                terms["vb"] = terms["vb"] * self.num_timesteps / 1000.0
            model_output = mean_out

        target = x_start if self.predict_xstart else noise
        axes = tuple(range(1, x_start.ndim))
        if self.use_l1:
            terms["l1"] = jnp.abs(target - model_output).mean(axes)
            terms["loss"] = terms["l1"] + terms.get("vb", 0)
        else:
            terms["mse"] = ((target - model_output) ** 2).mean(axes)
            terms["loss"] = terms["mse"] + terms.get("vb", 0)
        return terms

    def _vb_terms(self, frozen_out, x_start, x_t, t) -> jnp.ndarray:
        nd = x_t.ndim
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)

        c = x_t.shape[-1]
        mean_out, var_values = frozen_out[..., :c], frozen_out[..., c:]
        min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
        max_log = self._extract(np.log(self.betas), t, nd)
        frac = (var_values + 1) / 2
        log_var = frac * max_log + (1 - frac) * min_log
        pred_xstart = self._predict_xstart_from_eps(x_t, t, mean_out)
        mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x_t, t)

        kl = normal_kl(true_mean, true_log_var, mean, log_var)
        axes = tuple(range(1, x_t.ndim))
        kl = kl.mean(axes) / math.log(2.0)

        decoder_nll = -discretized_gaussian_log_likelihood(x_start, mean, 0.5 * log_var)
        decoder_nll = decoder_nll.mean(axes) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12))),
    )


def create_diffusion(
    timestep_respacing,
    noise_schedule: str = "linear",
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    diffusion_steps: int = 1000,
    use_l1: bool = False,
) -> GaussianDiffusion:
    """Factory matching the reference (osu_diffusion/utils/diffusion/__init__.py:10)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    return GaussianDiffusion(
        betas=betas,
        use_timesteps=space_timesteps(diffusion_steps, timestep_respacing),
        learn_sigma=learn_sigma,
        predict_xstart=predict_xstart,
        use_l1=use_l1,
    )
