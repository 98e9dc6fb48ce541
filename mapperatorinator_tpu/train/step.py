"""The jitted training step.

Pure-functional replacement for the reference's Accelerate loop body
(reference: ``osuT5/osuT5/utils/train_utils.py:379-434``): forward with the
rhythm-weighted loss, grad, optional gradient accumulation via
``optax.MultiSteps``, optimizer update, plus grad/weight L2 metrics. Under a
``Mesh`` with the batch sharded on ``data`` and params replicated, XLA
inserts the gradient all-reduce over ICI — the NCCL DDP equivalent.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    # jit the optimizer init: EAGER optax init over a full-size param tree
    # dispatches one tiny program per leaf — on a tunneled TPU each is a
    # remote compile, hundreds of seconds at v32 scale (round-5 bench probe);
    # one jitted program is also persistently cacheable
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      opt_state=jax.jit(tx.init)(params))


def wrap_grad_acc(tx: optax.GradientTransformation, grad_acc: int) -> optax.GradientTransformation:
    """Gradient accumulation via optax.MultiSteps (reference: accelerate's
    gradient_accumulation_steps, osuT5/train.py + v32.yaml grad_acc).

    Callers MUST wrap BEFORE ``init_train_state`` so the optimizer state
    tree matches the transformation the train step updates with — wrapping
    inside ``make_train_step`` alone leaves the state built from the
    unwrapped tx (structure mismatch at trace time)."""
    return optax.MultiSteps(tx, every_k_schedule=grad_acc) if grad_acc > 1 else tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    log_grad_l2: bool = True,
    log_weights_l2: bool = True,
):
    """Returns a jitted (state, batch, rng) -> (state, metrics) function.

    batch keys: frames, decoder_input_ids, decoder_attention_mask, labels,
    optional sample_weights and conditioning inputs.

    For gradient accumulation pass a ``wrap_grad_acc``-wrapped tx (and init
    the train state with the same wrapped tx).
    """

    def loss_fn(params, batch, rng):
        logits, loss = model.apply(
            params,
            frames=batch["frames"],
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            labels=batch["labels"],
            sample_weights=batch.get("sample_weights"),
            deterministic=True,
        )
        return loss, logits

    def train_step(state: TrainState, batch, rng):
        (loss, _logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        if log_grad_l2:
            metrics["grad_l2"] = optax.global_norm(grads)
        if log_weights_l2:
            metrics["weights_l2"] = optax.global_norm(new_params)
        return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state), metrics

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("data"))

        def batch_spec(batch):
            return jax.tree.map(lambda _: batch_sharding, batch)

        def jitted(state, batch, rng):
            # honor whatever placement the caller gave the state (replicated,
            # tensor-parallel via parallel.shard_params, fsdp, ...); optimizer
            # moments created from placed params already carry matching
            # shardings, so GSPMD propagates and inserts the collectives
            state_sh = jax.tree.map(
                lambda x: x.sharding if hasattr(x, "sharding") else replicated, state
            )
            fn = jax.jit(
                train_step,
                in_shardings=(state_sh, batch_spec(batch), replicated),
                out_shardings=(state_sh, None),
                donate_argnums=(0,),
            )
            return fn(state, batch, rng)

        return jitted

    return jax.jit(train_step, donate_argnums=(0,))


def make_lora_train_step(
    model,
    tx: optax.GradientTransformation,
    base_params,
    alpha: float = 128.0,
    mesh: Optional[Mesh] = None,
):
    """LoRA fine-tune step (reference: ``osuT5/train.py:93-99`` uses peft).

    TPU-native formulation: the train state carries ONLY the (A, B) factors;
    the forward merges them into the frozen base weights inside the loss, so
    gradients flow to the factors alone and no model code changes. The merge
    is one rank-r matmul per target — negligible next to the forward.

    For gradient accumulation pass a ``wrap_grad_acc``-wrapped tx (and init
    the train state with the same wrapped tx).
    """
    from ..models.lora import merge_lora

    def loss_fn(lora_params, batch):
        merged = merge_lora(base_params, lora_params, alpha=alpha)
        _logits, loss = model.apply(
            merged,
            frames=batch["frames"],
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            labels=batch["labels"],
            sample_weights=batch.get("sample_weights"),
            deterministic=True,
        )
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_l2": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state), metrics

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("data"))

        def jitted(state, batch, rng):
            fn = jax.jit(
                train_step,
                in_shardings=(
                    jax.tree.map(lambda _: replicated, state),
                    jax.tree.map(lambda _: batch_sharding, batch),
                    replicated,
                ),
                out_shardings=(jax.tree.map(lambda _: replicated, state), None),
                donate_argnums=(0,),
            )
            return fn(state, batch, rng)

        return jitted

    return jax.jit(train_step, donate_argnums=(0,))


def make_global_eval_step(model, mesh: Mesh):
    """Mesh-sharded eval step whose metrics are reduced across the ENTIRE
    global batch ON DEVICE, so only replicated scalars ever leave the mesh.

    This is the multi-host-safe eval path (reference: train_utils.py:236-318
    runs eval under DDP where each rank sees its own logits and accelerate
    gathers them): the host-side :func:`make_eval_step` materializes the full
    logits array, which a process in a multi-host run cannot do — the array
    spans non-addressable devices. Here each process feeds only its local
    eval rows (``parallel.make_global_batch``) and reads back replicated
    (loss, correct, total) scalars; per-context slicing needs host logits and
    stays a single-host feature."""
    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data"))

    def eval_step(params, batch):
        logits, loss = model.apply(
            params,
            frames=batch["frames"],
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            labels=batch["labels"],
            sample_weights=batch.get("sample_weights"),
            deterministic=True,
        )
        labels = batch["labels"]
        mask = labels != -100  # LABEL_IGNORE_ID
        preds = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((preds == labels) & mask)
        total = jnp.sum(mask)
        return {"loss": loss, "correct": correct, "total": total}

    def jitted(params, batch):
        params_sh = jax.tree.map(
            lambda x: x.sharding if hasattr(x, "sharding") else replicated, params
        )
        fn = jax.jit(
            eval_step,
            in_shardings=(params_sh, jax.tree.map(lambda _: batch_sharding, batch)),
            out_shardings=None,
        )
        return fn(params, batch)

    return jitted


def eval_model_global(eval_step_global, params, local_batches, mesh, max_steps=None) -> dict:
    """Multi-host eval driver: every process iterates its OWN local eval rows
    in lockstep (``local_batches`` yields per-process shards of the same
    global batch sequence), assembles global arrays, and averages the
    device-reduced metrics. Returns ``{"test/loss", "test/acc"}`` computed
    over the global eval set."""
    from ..parallel import make_global_batch

    loss_sum = correct = total = 0.0
    n = 0
    for i, local in enumerate(local_batches, start=1):
        if max_steps is not None and i > max_steps:
            break
        local = {k: v for k, v in local.items() if k not in ("beatmap_idx",)}
        m = eval_step_global(params, make_global_batch(mesh, local))
        m = {k: float(np.asarray(v.addressable_data(0) if hasattr(v, "addressable_data") else v))
             for k, v in m.items()}
        loss_sum += m["loss"]
        correct += m["correct"]
        total += m["total"]
        n += 1
    if n == 0:
        return {}
    return {"test/loss": loss_sum / n, "test/acc": correct / total if total else 0.0}


def make_eval_step(model):
    """Jitted eval forward returning loss + logits (metrics computed host-side
    per context type, reference: train_utils.py:236-376)."""

    @jax.jit
    def eval_step(params, batch):
        logits, loss = model.apply(
            params,
            frames=batch["frames"],
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            labels=batch["labels"],
            sample_weights=batch.get("sample_weights"),
            deterministic=True,
        )
        return loss, logits

    return eval_step
