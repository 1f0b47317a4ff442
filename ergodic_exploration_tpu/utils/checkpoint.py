"""Checkpoint / resume for long batched exploration runs.

Reference status: NONE — the reference's controller state (warm-started
control sequence + replay buffer) is lost on restart (SURVEY.md section 6,
checkpoint row). Build-side: the entire engine state is a small pytree of
arrays (Scenarios = control sequences, ring buffers, running basis sums,
poses, twists, RNG keys), so checkpointing is one host transfer + one
``np.savez``; on restore the arrays are re-laid-out over whatever mesh the
new engine has (device count may differ across restarts).

Format (version 2): flat ``.npz`` with one entry per leaf plus a ``__meta__``
JSON record carrying the format version and the PATH-BASED leaf keys
(``jax.tree_util.keystr``), shapes, and dtypes. Loading validates all three
against the ``like`` template and fails loudly on any mismatch — a reordered
or renamed NamedTuple field can no longer silently load wrong data into a
same-shape leaf.

Multi-host: leaves that are not fully addressable (sharded across processes
under ``jax.distributed``) are gathered with
``multihost_utils.process_allgather`` before saving; only process 0 writes.
Every process can load the file; the engine re-shards on restore.
"""

from __future__ import annotations

import json

import numpy as np

import jax

CHECKPOINT_FORMAT_VERSION = 2


def _template_keys_and_leaves(like):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    keys = [jax.tree_util.keystr(p) for p, _ in paths_leaves]
    leaves = [leaf for _, leaf in paths_leaves]
    return keys, leaves, treedef


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz, format v2).

    Safe under ``jax.distributed``: process-sharded leaves are allgathered
    and only process 0 writes (all processes must call this — the gather is
    collective).
    """
    keys, leaves, _ = _template_keys_and_leaves(tree)
    arrays = {}
    for i, leaf in enumerate(leaves):
        x = leaf
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        arrays[f"leaf_{i:04d}"] = np.asarray(x)
    meta = {
        "version": CHECKPOINT_FORMAT_VERSION,
        "keys": keys,
        "shapes": [list(a.shape) for a in arrays.values()],
        "dtypes": [str(a.dtype) for a in arrays.values()],
    }
    if jax.process_index() == 0:
        np.savez(path, __meta__=np.array(json.dumps(meta)), **arrays)


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure; the file's leaf KEYS (tree paths)
    and SHAPES must match the template exactly, and the format version must
    be supported — mismatches raise instead of silently mis-assigning
    same-shape leaves. Dtypes are cast to the template's. Legacy v1 files
    (no ``__meta__``) load by order with a count check only.
    """
    tmpl_keys, tmpl_leaves, treedef = _template_keys_and_leaves(like)
    with np.load(path) as data:
        if "__meta__" not in data.files:  # legacy v1: enumerated, order-matched
            leaves = [data[k] for k in sorted(data.files)]
            if len(tmpl_leaves) != len(leaves):
                raise ValueError(
                    f"legacy checkpoint has {len(leaves)} leaves but template "
                    f"has {len(tmpl_leaves)}"
                )
        else:
            meta = json.loads(str(data["__meta__"]))
            version = meta.get("version")
            if version is None or version > CHECKPOINT_FORMAT_VERSION:
                raise ValueError(
                    f"checkpoint format version {version!r} is newer than "
                    f"supported ({CHECKPOINT_FORMAT_VERSION})"
                )
            if meta["keys"] != tmpl_keys:
                missing = [k for k in tmpl_keys if k not in meta["keys"]]
                extra = [k for k in meta["keys"] if k not in tmpl_keys]
                raise ValueError(
                    "checkpoint leaf keys do not match the template pytree "
                    f"(missing from file: {missing or 'none'}; "
                    f"unexpected in file: {extra or 'none'}; full file order: "
                    f"{meta['keys']})"
                )
            leaves = [data[f"leaf_{i:04d}"] for i in range(len(tmpl_keys))]
        leaves = [np.asarray(a) for a in leaves]

    def _dtype(t):
        # never materialize the template (it may be a non-addressable global
        # array under jax.distributed) — read metadata only
        dt = getattr(t, "dtype", None)
        return np.dtype(dt) if dt is not None else np.asarray(t).dtype

    for key, got, tmpl in zip(tmpl_keys, leaves, tmpl_leaves):
        want_shape = tuple(np.shape(tmpl))
        if got.shape != want_shape:
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {got.shape} but template "
                f"expects {want_shape}"
            )
    cast = [np.asarray(a, dtype=_dtype(t)) for a, t in zip(leaves, tmpl_leaves)]
    return jax.tree.unflatten(treedef, cast)
