"""Checkpoint / resume for solver state.

The reference has no serialization in active use (its data structs inherit
`pinocchio::serialization::Serializable` but nothing in-repo calls it,
loik-loid-data.hpp:61; SURVEY.md §5).  Here the entire solver state is a
pytree, so checkpointing is flat array IO: save mid-run (e.g. a long
multi-start campaign), restore on another host/chip count, and continue via
warm start — sharded arrays are gathered on save and resharded by the next
solve's placement.
"""

from __future__ import annotations

import os
import jax
import numpy as np

from ..solver.state import SolverState


def save_state(path: str, state: SolverState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, like: SolverState) -> SolverState:
    """Restore a state saved by save_state; `like` provides the treedef
    (construct via init_state with the same shapes)."""
    _, treedef = jax.tree_util.tree_flatten(like)
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
