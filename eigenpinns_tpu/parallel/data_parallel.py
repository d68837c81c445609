"""Data-parallel training over sharded collocation/node sets.

The north-star training mode (BASELINE.json): collocation points and all
per-node arrays are sharded over the mesh's "data" axis, model parameters
are replicated, and XLA GSPMD inserts the gradient all-reduces (psum over
ICI) and the gathers needed by sparse operators whose stencils cross
shard boundaries. No hand-written collectives on this path — sharding
constraints + jit are the whole API, per the scaling-book recipe.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_train_step(
    loss_fn: Callable,        # (params, batch) -> scalar loss
    optimizer,                # optax transform
    mesh: Mesh,
    batch_spec=P("data"),
) -> Callable:
    """Build a jitted DP train step: params replicated, batch node-sharded.

    Returns step(params, opt_state, batch) -> (params, opt_state, loss).
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, batch_spec)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, shard),
        out_shardings=(repl, repl, repl),
    )
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def constrain(x, mesh: Mesh, spec) -> jax.Array:
    """In-computation sharding annotation
    (jax.lax.with_sharding_constraint)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spec))
