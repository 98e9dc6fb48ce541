"""Optimizers and LR schedules in optax.

Implements the reference's optimizer zoo (reference:
``osuT5/osuT5/utils/copied_utils.py:243-360``, ``muon_utils.py:35-205``,
``model_utils.py:421-538``):

* ``adamwscale`` — AdamW with Adafactor-style LR scaling by RMS(weights),
* ``muon`` — Newton-Schulz-5 orthogonalized momentum for >=2-D internal
  matrices + AdamW for embeddings/heads/vectors. The NS5 loop is 5 matmuls
  per iteration in bf16 — exactly the shape the MXU wants, so on TPU the
  orthogonalization is nearly free,
* stock ``adamw`` / ``adafactor``,
* warmup(0.5 start factor) -> optional constant sustain -> cosine or linear
  decay schedule.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# AdamWScale
# ---------------------------------------------------------------------------


class AdamWScaleState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamw_scale(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    mask: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """AdamW with the update scaled by max(1e-3, rms(param))
    (reference: copied_utils.py:289-360)."""

    def init(params):
        return AdamWScaleState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        mu = jax.tree.map(lambda m, g: m * b1 + g * (1 - b1), state.mu, grads)
        nu = jax.tree.map(lambda v, g: v * b2 + g * g * (1 - b2), state.nu, grads)

        bc1 = 1 - b1**count
        bc2 = 1 - b2**count
        step_size = lr * jnp.sqrt(bc2) / bc1

        def one(param, m, v, decayed):
            rms = jnp.linalg.norm(param) / jnp.sqrt(param.size)
            scaled = step_size * jnp.maximum(1e-3, rms)
            upd = -scaled * m / (jnp.sqrt(v) + eps)
            if decayed and weight_decay > 0:
                upd = upd - lr * weight_decay * param
            return upd

        decay_mask = mask(params) if mask is not None else jax.tree.map(lambda _: True, params)
        updates = jax.tree.map(
            lambda p, m, v, d: one(p, m, v, d), params, mu, nu, decay_mask
        )
        return updates, AdamWScaleState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Muon
# ---------------------------------------------------------------------------


def newton_schulz5(g: jnp.ndarray, steps: int = 6, eps: float = 1e-7) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization in bf16
    (reference: muon_utils.py:35-59). Pure matmuls — MXU-native."""
    assert g.ndim == 2
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.bfloat16)
    x = x / (jnp.linalg.norm(x) + eps)
    transpose = g.shape[0] > g.shape[1]
    if transpose:
        x = x.T

    def body(_, x):
        A = x @ x.T
        B = b * A + c * (A @ A)
        return a * x + B @ x

    x = jax.lax.fori_loop(0, steps, body, x)
    if transpose:
        x = x.T
    return x


class MuonState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates  # muon branch
    moment1: optax.Updates  # adamw branch
    moment2: optax.Updates


def muon(
    learning_rate,
    adamw_learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 6,
    adamw_betas: tuple = (0.90, 0.95),
    adamw_eps: float = 1e-8,
    adamw_wd: float = 0.0,
    muon_mask: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Muon + internal AdamW (reference: muon_utils.py:61-203). ``muon_mask``
    maps the param tree to True where Muon applies (>=2-D internal matrices);
    default: ndim >= 2 and first dim < 10000 (excludes embeds/heads by the
    caller's mask, see :func:`build_optimizer`)."""

    def init(params):
        return MuonState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            moment1=jax.tree.map(jnp.zeros_like, params),
            moment2=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        adamw_lr = adamw_learning_rate(count) if callable(adamw_learning_rate) else adamw_learning_rate

        use_muon = muon_mask(params) if muon_mask is not None else jax.tree.map(
            lambda p: p.ndim >= 2 and p.shape[0] < 10000, params
        )

        new_momentum = jax.tree.map(lambda b, g: b * momentum + g, state.momentum, grads)
        new_m1 = jax.tree.map(
            lambda b, g: b + (g - b) * (1 - adamw_betas[0]), state.moment1, grads
        )
        new_m2 = jax.tree.map(
            lambda b, g: b + (g * g - b) * (1 - adamw_betas[1]), state.moment2, grads
        )

        bc1 = 1 - adamw_betas[0] ** count
        bc2 = 1 - adamw_betas[1] ** count
        adamw_scale_f = bc1 / jnp.sqrt(bc2)

        def muon_update(g, buf, param):
            eff = g + buf * momentum if nesterov else buf
            shape = eff.shape
            mat = eff.reshape(shape[0], -1) if eff.ndim > 2 else eff
            ortho = newton_schulz5(mat, ns_steps)
            ortho = ortho * jnp.maximum(1, mat.shape[0] / mat.shape[1]) ** 0.5
            return (-lr * ortho.reshape(shape)).astype(param.dtype)

        def adamw_update(g, m1, m2, param):
            upd = m1 / (adamw_eps + jnp.sqrt(m2))
            # reference quirk (muon_utils.py:200-203): the decay uses the
            # adamw lr but the step itself uses the MUON lr
            decay = -adamw_lr * adamw_wd * param
            return decay - (lr / adamw_scale_f) * upd

        def one(g, buf, m1, m2, param, is_muon):
            if is_muon and g.ndim >= 2:
                return muon_update(g, buf, param)
            return adamw_update(g, m1, m2, param)

        updates = jax.tree.map(
            one, grads, new_momentum, new_m1, new_m2, params, use_muon
        )
        return updates, MuonState(count=count, momentum=new_momentum, moment1=new_m1, moment2=new_m2)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# schedules + builder
# ---------------------------------------------------------------------------


def build_schedule(optim_args, num_processes: int = 1, base_lr: Optional[float] = None) -> optax.Schedule:
    """warmup(0.5->1) -> sustain -> cosine/linear decay
    (reference: model_utils.py:494-538)."""
    base = base_lr if base_lr is not None else optim_args.base_lr
    segments = []
    boundaries = []
    step = 0

    if optim_args.warmup_steps > 0:
        n = optim_args.warmup_steps * num_processes
        segments.append(optax.linear_schedule(base * 0.5, base, n))
        step += n
        boundaries.append(step)

    if optim_args.sustain_steps > 0:
        n = optim_args.sustain_steps * num_processes
        segments.append(optax.constant_schedule(base))
        step += n
        boundaries.append(step)

    remaining = optim_args.total_steps * num_processes - step
    if optim_args.lr_scheduler == "cosine":
        segments.append(optax.cosine_decay_schedule(base, remaining, alpha=optim_args.final_cosine / base))
    else:
        segments.append(optax.linear_schedule(base, optim_args.final_cosine, remaining))

    if len(segments) == 1:
        return segments[0]
    return optax.join_schedules(segments, boundaries)


_NO_DECAY_SUBSTRINGS = ("bias", "layernorm", "layer_norm", "ln", "norm", "scale")
_ADAMW_BRANCH_SUBSTRINGS = ("embed", "proj_out")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def decay_mask(params):
    """True where weight decay applies (reference: model_utils.py:422-441)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: not any(s in _path_str(path) for s in _NO_DECAY_SUBSTRINGS), params
    )


def muon_branch_mask(params):
    """True where the Muon branch applies: >=2-D internal matrices, excluding
    embeds and output heads (reference: model_utils.py:461-487)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: (
            p.ndim >= 2 and not any(s in _path_str(path) for s in _ADAMW_BRANCH_SUBSTRINGS)
        ),
        params,
    )


def build_optimizer(args, num_processes: int = 1) -> optax.GradientTransformation:
    """Build the configured optimizer + schedule + grad clipping."""
    optim = args.optim
    schedule = build_schedule(optim, num_processes)

    if optim.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=optim.weight_decay, mask=decay_mask)
    elif optim.name == "adamwscale":
        tx = adamw_scale(schedule, weight_decay=optim.weight_decay, mask=decay_mask)
    elif optim.name == "adafactor":
        tx = optax.adafactor(schedule)
    elif optim.name == "muon":
        schedule2 = build_schedule(optim, num_processes, base_lr=optim.base_lr_2)
        tx = muon(
            schedule,
            schedule2,
            adamw_wd=optim.weight_decay,
            muon_mask=muon_branch_mask,
        )
    else:
        raise NotImplementedError(optim.name)

    if optim.grad_clip and optim.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(optim.grad_clip), tx)
    return tx
