"""AdamUniform optimizer — functional (optax-style) with the exact update
semantics of the reference implementation (reference: utils/optimizer.py:4-89).

Semantics reproduced:
  - first/second moments with standard bias correction, but the update divides
    the whole tensor by the *scalar max* of sqrt(m2) (+1e-8), not per-component
    (utils/optimizer.py:74) — "uniform scaling by the second moment";
  - staged grad cap: a (values, iters) schedule; at each step the current cap
    ``m`` is read, then the stage pointer advances once if the step counter has
    reached ``iters[ptr]`` (so a new cap takes effect the *next* step), and the
    update is rescaled so max|update| <= m (utils/optimizer.py:76-88);
  - cosine-annealed learning rate eta_min=1e-4 over total steps, matching
    torch.optim.lr_scheduler.CosineAnnealingLR as driven by the reference
    trainer (trainer.py:57-58) where the scheduler steps after every forward.

Everything is jit-friendly: the stage pointer and step counter live in the
optimizer state as traced ints; caps/iters are static tuples baked into the
compiled step. The scalar max reductions stay on device — no host sync.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp


class AdamUniformState(NamedTuple):
    count: jax.Array          # int32 — completed update calls
    g1: any                   # pytree like params — first moment
    g2: any                   # pytree like params — second moment
    limit_ptr: jax.Array      # int32 — grad-limit stage pointer
    cc: jax.Array             # int32 — per-leaf step counter (reference `cc`)


ScheduleOrFloat = Union[float, Callable[[jax.Array], jax.Array]]


def cosine_annealing_lr(lr0: float, total_steps: int, eta_min: float = 1e-4
                        ) -> Callable[[jax.Array], jax.Array]:
    """Closed form of torch CosineAnnealingLR under sequential stepping:
    eta_t = eta_min + (lr0 - eta_min) * (1 + cos(pi * t / T)) / 2."""
    lr0 = float(lr0)
    T = max(int(total_steps), 1)

    def schedule(count):
        t = jnp.minimum(jnp.asarray(count, jnp.float32), T)
        return eta_min + (lr0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / T))

    return schedule


def adam_uniform(learning_rate: ScheduleOrFloat = 0.1,
                 b1: float = 0.9, b2: float = 0.999,
                 grad_limit: bool = False,
                 grad_limit_values: Sequence[float] = (0.05, 0.01),
                 grad_limit_iters: Sequence[int] = (4000,),
                 eps: float = 1e-8):
    """Build (init_fn, update_fn) for AdamUniform.

    ``update_fn(grads, state, params) -> (updates, new_state)`` where updates
    are deltas to *add* to params (optax convention; the descent sign is
    already applied).
    """
    values = tuple(float(v) for v in grad_limit_values)
    iters = tuple(int(i) for i in grad_limit_iters)
    if grad_limit and (len(values) != len(iters) + 1):
        # reference allows len(values) == len(iters)+1 (last value unbounded)
        # or equal lengths (pointer clamps); accept both, pad last value.
        if len(values) < len(iters) + 1:
            values = values + (values[-1],) * (len(iters) + 1 - len(values))

    def init_fn(params) -> AdamUniformState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamUniformState(
            count=jnp.zeros((), jnp.int32),
            g1=zeros,
            g2=jax.tree_util.tree_map(jnp.zeros_like, params),
            limit_ptr=jnp.zeros((), jnp.int32),
            cc=jnp.zeros((), jnp.int32),
        )

    def _lr(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def update_fn(grads, state: AdamUniformState, params=None):
        del params
        step = state.count + 1
        b1c = 1.0 - b1 ** step.astype(jnp.float32)
        b2c = 1.0 - b2 ** step.astype(jnp.float32)

        g1 = jax.tree_util.tree_map(lambda m, g: b1 * m + (1.0 - b1) * g,
                                    state.g1, grads)
        g2 = jax.tree_util.tree_map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                                    state.g2, grads)

        lr = _lr(state.count)

        # Current cap: values[ptr] (jit-friendly static gather). The pointer
        # advance uses the *pre-update* cc, matching the read-then-advance
        # order of the reference (utils/optimizer.py:76-88).
        if grad_limit:
            vals = jnp.asarray(values, jnp.float32)
            its = jnp.asarray(iters, jnp.int32) if iters else None
            cap = vals[jnp.minimum(state.limit_ptr, len(values) - 1)]
            if its is not None and len(iters) > 0:
                can_advance = state.limit_ptr < len(iters)
                reached = state.cc >= its[jnp.minimum(state.limit_ptr,
                                                      len(iters) - 1)]
                limit_ptr = state.limit_ptr + jnp.where(
                    can_advance & reached, 1, 0).astype(jnp.int32)
            else:
                limit_ptr = state.limit_ptr
        else:
            cap = None
            limit_ptr = state.limit_ptr

        n_leaves = len(jax.tree_util.tree_leaves(grads))

        def leaf_update(m, v):
            m1 = m / b1c
            m2 = v / b2c
            gr = m1 / (eps + jnp.sqrt(jnp.max(m2)))
            if cap is not None:
                s = jnp.max(jnp.abs(gr))
                gr = jnp.where(s > cap, gr * (cap / jnp.maximum(s, 1e-30)), gr)
            return -lr * gr

        updates = jax.tree_util.tree_map(leaf_update, g1, g2)
        new_state = AdamUniformState(
            count=step,
            g1=g1,
            g2=g2,
            limit_ptr=limit_ptr,
            cc=state.cc + jnp.asarray(n_leaves, jnp.int32),
        )
        return updates, new_state

    return init_fn, update_fn


def apply_updates(params, updates):
    return jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
