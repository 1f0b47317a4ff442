"""Checkpoint / resume for long batched exploration runs.

Reference status: NONE — the reference's controller state (warm-started
control sequence + replay buffer) is lost on restart (SURVEY.md section 6,
checkpoint row). Build-side: the entire engine state is a small pytree of
arrays (Scenarios = control sequences, ring buffers, running basis sums,
poses, twists, RNG keys), so checkpointing is one host transfer + one
``np.savez``; on restore the arrays are re-laid-out over whatever mesh the
new engine has (device count may differ across restarts).

Format: flat ``.npz`` with enumerated leaf keys. The pytree STRUCTURE comes
from a template (``like``) built by the code, so files stay portable across
refactors that keep leaf order/shapes.
"""

from __future__ import annotations

import numpy as np

import jax


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz)."""
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure (and dtype casts); its leaf count
    must match the file.
    """
    with np.load(path) as data:
        keys = sorted(data.files)
        leaves = [data[k] for k in keys]
    treedef = jax.tree.structure(like)
    tmpl_leaves = jax.tree.leaves(like)
    if len(tmpl_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template has {len(tmpl_leaves)}"
        )
    cast = [np.asarray(a, dtype=np.asarray(t).dtype) for a, t in zip(leaves, tmpl_leaves)]
    return jax.tree.unflatten(treedef, cast)
