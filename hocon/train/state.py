"""Train state: params + BN stats + optimizer state + step."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model,
    mano,
    optimizer: optax.GradientTransformation,
    sample_batch: dict,
    rng: jax.Array,
    with_object: bool = True,
) -> TrainState:
    """Initialize model variables from a representative (host) batch."""
    obj = sample_batch.get("obj_verts_can") if with_object else None
    variables = model.init(
        rng,
        jnp.asarray(sample_batch["image"]),
        jnp.asarray(sample_batch["camintr"]),
        mano,
        jnp.asarray(obj) if obj is not None else None,
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_optimizer(
    name: str = "adam",
    lr: float = 5e-5,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    lr_decay_step: int = 0,
    lr_decay_gamma: float = 0.5,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Reference optimizer surface: adam / sgd(+momentum), step-decay LR."""
    if lr_decay_step > 0:
        schedule = optax.exponential_decay(
            lr, transition_steps=lr_decay_step, decay_rate=lr_decay_gamma,
            staircase=True,
        )
    else:
        schedule = lr
    if name == "adam":
        tx = optax.adam(schedule)
    elif name == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
