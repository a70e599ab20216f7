"""Minimal explicit optimizers over (sub)pytrees.

Hand-rolled instead of optax because MAD adaptation updates *subtrees*
of the param pytree per step (one block at a time); plain function-of-
pytree optimizers make that surgery trivial and keep the update
numerics exactly those of the reference's TF1 optimizers:

* SGD + momentum (``tf.train.MomentumOptimizer(lr, 0.9)``,
  Stereo_Online_Adaptation.py:85): ``acc = m*acc + g; p -= lr*acc``.
* Adam (``tf.train.AdamOptimizer``, Train.py:95, Demo/demo_model.py:163):
  bias-corrected first/second moments, epsilon outside the sqrt.

All update functions work on any pytree (full params or an extracted
block) as long as state/grads/params share structure.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "momentum_init",
    "momentum_update",
    "adam_init",
    "adam_update",
    "AdamState",
]

Tree = Any


def momentum_init(params: Tree) -> Tree:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def momentum_update(
    params: Tree, acc: Tree, grads: Tree, lr: float, beta: float = 0.9
) -> Tuple[Tree, Tree]:
    new_acc = jax.tree_util.tree_map(lambda a, g: beta * a + g, acc, grads)
    new_params = jax.tree_util.tree_map(lambda p, a: p - lr * a, params, new_acc)
    return new_params, new_acc


class AdamState(NamedTuple):
    m: Tree
    v: Tree
    t: jnp.ndarray  # step count, scalar int32


def adam_init(params: Tree) -> AdamState:
    return AdamState(
        m=jax.tree_util.tree_map(jnp.zeros_like, params),
        v=jax.tree_util.tree_map(jnp.zeros_like, params),
        t=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Tree,
    state: AdamState,
    grads: Tree,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Tree, AdamState]:
    t = state.t + 1
    m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
    v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
    tf_ = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - b2**tf_) / (1.0 - b1**tf_)
    new_params = jax.tree_util.tree_map(
        lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + eps), params, m, v
    )
    return new_params, AdamState(m=m, v=v, t=t)
