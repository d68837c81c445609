"""MLP building blocks (flax.linen).

Activations cover the reference model zoo: ReLU correctors
(src/corrector_model.py), SiLU joint eigen-nets
(scripts/simplified_loss.ipynb cell 0:90-104) and Sin-activated
lambda-conditioned nets (iterative_eigenvalues_on_cloud.ipynb cell 1:20-67).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "silu": nn.silu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
    "sin": jnp.sin,
}


def small_init(std: float = 0.01):
    """N(0, std^2) kernel init — the reference's "escape the do-nothing
    minimum" output-layer init (src/multigrid_model.py:211-214)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class MLP(nn.Module):
    """Plain MLP: hidden layers + linear head.

    `small_output_init` reproduces the reference's small-std output-layer
    initialization; `dropout` matches the correctorGNN config knob
    (src/parameters.yml:22).
    """

    hidden: Sequence[int]
    out_dim: int
    activation: str = "relu"
    dropout: float = 0.0
    small_output_init: bool = False
    first_layer_omega: float = 1.0  # SIREN-style input scaling for sin nets
    # Matmul/activation compute dtype (params stay f32). 'bfloat16' puts
    # the hidden layers on the MXU's bf16 path — at 300k nodes the MLP
    # fwd+bwd is compute-bound, so this is a large step-time lever; the
    # f32 output head is restored by the final cast.
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = ACTIVATIONS[self.activation]
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        in_dtype = x.dtype
        if dt is not None:
            x = x.astype(dt)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"hidden_{i}", dtype=dt)(x)
            x = act(self.first_layer_omega * x) if (
                i == 0 and self.activation == "sin") else act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        kernel_init = (small_init() if self.small_output_init
                       else nn.initializers.lecun_normal())
        out = nn.Dense(self.out_dim, name="out", kernel_init=kernel_init,
                       bias_init=nn.initializers.zeros, dtype=dt)(x)
        return out.astype(in_dtype)
