"""Partial-load / freeze-retrain support.

Equivalent of the reference driver's restore-with-partial-load + frozen
retraining mode (train_rnn_rollout_torchscript_hydra.py:759-792): load
whatever parameter subtrees a checkpoint shares with the current model,
and build an optimizer that zeroes updates for frozen subtrees.
"""
from __future__ import annotations

import fnmatch

import jax
import optax


def partial_load(params, restored) -> tuple:
    """Copy leaves from ``restored`` into ``params`` wherever paths AND
    shapes match; returns (merged, n_loaded, n_skipped)."""
    paths_p = jax.tree_util.tree_flatten_with_path(params)
    paths_r = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_flatten_with_path(restored)[0]}
    out, loaded, skipped = [], 0, 0
    for kp, v in paths_p[0]:
        key = jax.tree_util.keystr(kp)
        r = paths_r.get(key)
        if r is not None and getattr(r, "shape", None) == v.shape:
            out.append(r)
            loaded += 1
        else:
            out.append(v)
            skipped += 1
    merged = jax.tree_util.tree_unflatten(paths_p[1], out)
    return merged, loaded, skipped


def freeze(tx: optax.GradientTransformation,
           params, frozen_patterns: list[str]) -> optax.GradientTransformation:
    """Wrap an optimizer so parameters whose path matches any glob pattern
    (e.g. 'rnn_up/*', '*mlp_output*') receive zero updates."""

    def label(params):
        def lab(kp, _):
            key = jax.tree_util.keystr(kp).replace("'", "").replace("][",
                                                                    "/")
            key = key.strip("[]")
            for pat in frozen_patterns:
                if fnmatch.fnmatch(key, pat) or pat in key:
                    return "frozen"
            return "train"
        return jax.tree_util.tree_map_with_path(lab, params)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label)
