"""Hierarchical neural upscaler: coarse eigenvector -> fine eigenvector.

Capability parity with `HierarchicalUpscaler`
(downsampling_toy_example.ipynb cell 0:104-124): a per-eigenpair MLP
mapping the coarse-level eigenvector (n_coarse values) to the fine-level
one (n_fine values), with a trainable eigenvalue refined jointly. Used by
the matrix-only multigrid driver (`eigenpinns_tpu.solvers.upscale`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class HierarchicalUpscaler(nn.Module):
    """u_fine = MLP(u_coarse); lam = trainable, init from the coarse value."""

    hidden: Sequence[int]
    n_fine: int
    lambda_init: float = 0.0

    @nn.compact
    def __call__(self, u_coarse):
        from eigenpinns_tpu.models.mlp import MLP

        h = jnp.reshape(u_coarse, (1, -1))
        u_fine = MLP(tuple(self.hidden), self.n_fine,
                     activation="tanh")(h)[0]
        lam = self.param(
            "lam", lambda key, shape: jnp.full(shape, self.lambda_init), ())
        return u_fine, lam
