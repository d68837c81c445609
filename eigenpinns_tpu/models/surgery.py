"""Parameter surgery: partial weight copy across architecture changes.

Parity with the transfer-learning notebooks' model re-creation "with
partial weight copy when in_dim changes"
(iterative_downsampling_continued.ipynb cell 0:283-296): when a network
is re-instantiated with a different input (or output) width, every
overlapping kernel/bias slice of matching layers is copied so training
resumes from the transferred weights instead of a fresh init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def partial_weight_copy(old_params, new_params):
    """Copy overlapping slices of every matching leaf from old into new.

    Leaves are matched by pytree path; a leaf pair with different shapes
    copies the overlapping hyper-rectangle (new init retained elsewhere).
    Returns the updated new_params.
    """
    old_flat = dict(jax.tree_util.tree_flatten_with_path(old_params)[0])
    new_flat, treedef = jax.tree_util.tree_flatten_with_path(new_params)

    out = []
    for path, leaf in new_flat:
        src = old_flat.get(path)
        if src is None or src.ndim != leaf.ndim:
            out.append(leaf)
            continue
        slices = tuple(slice(0, min(a, b))
                       for a, b in zip(src.shape, leaf.shape))
        out.append(jnp.asarray(leaf).at[slices].set(
            jnp.asarray(src)[slices]))
    return jax.tree_util.tree_unflatten(treedef, out)
