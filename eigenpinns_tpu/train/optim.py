"""Optimizers and schedules (optax).

Replicates the reference's training stacks:
  * Adam + L2 weight decay + grad clipping + ReduceLROnPlateau
    (src/multigrid_model.py:218-224, 258-260: clip 10, factor 0.5,
    patience 2000, min_lr 1e-6) — torch Adam's `weight_decay` adds
    wd * param to the RAW gradient before the moment estimates, which is
    optax.add_decayed_weights placed before adam;
  * AdamW + cosine warm restarts (loss_with_rigid_body.ipynb cell 0);
  * exponential decay (simplified_loss.ipynb: 0.01 -> 1e-4).
"""

from __future__ import annotations

import optax
from optax import contrib as optax_contrib


def adam_plateau(
    learning_rate: float,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    plateau_factor: float = 0.5,
    plateau_patience: int = 2000,
    min_scale: float = 1e-3,
):
    """(optimizer, plateau) pair. Apply the plateau transform manually with
    the scalar loss:

        updates, opt_state = opt.update(grads, opt_state, params)
        updates, pl_state = plateau.update(updates, pl_state, value=loss)
    """
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(learning_rate))
    opt = optax.chain(*chain)
    plateau = optax_contrib.reduce_on_plateau(
        factor=plateau_factor,
        patience=plateau_patience,
        cooldown=0,
        accumulation_size=1,
        min_scale=min_scale,
    )
    return opt, plateau


def adamw_cosine_restarts(
    peak_lr: float,
    first_cycle: int,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
    n_cycles: int = 8,
    t_mult: int = 2,
):
    """AdamW with SGDR cosine warm restarts (the loss_with_rigid_body
    stack, cell 0: CosineAnnealingWarmRestarts)."""
    boundaries_and_scales = {}
    schedules = []
    cycle = first_cycle
    for _ in range(n_cycles):
        schedules.append(optax.cosine_decay_schedule(peak_lr, cycle))
        cycle *= t_mult
    schedule = optax.join_schedules(
        schedules,
        boundaries=_cycle_boundaries(first_cycle, t_mult, n_cycles - 1),
    )
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(schedule, weight_decay=weight_decay))
    return optax.chain(*chain), schedule


def _cycle_boundaries(first: int, mult: int, n: int) -> list[int]:
    out, acc, cycle = [], 0, first
    for _ in range(n):
        acc += cycle
        out.append(acc)
        cycle *= mult
    return out


def adam_exp_decay(lr_start: float = 1e-2, lr_end: float = 1e-4,
                   steps: int = 20000):
    """Adam with exponential LR decay (simplified_loss.ipynb stack)."""
    schedule = optax.exponential_decay(
        lr_start, steps, lr_end / lr_start)
    return optax.adam(schedule), schedule
