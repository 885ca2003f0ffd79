"""Checkpoint / resume for device-resident state.

Two layers (SURVEY §5: the reference's only checkpoint mechanism is the
NetCDF tile store, which nd_tpu.tiling keeps):

  - ``save_params`` / ``load_params``: lightweight .npz snapshots of any
    pytree of arrays (classifier heads, pipeline state) — dependency
    free, host-side.
  - ``Checkpointer``: orbax-backed versioned checkpoints with retention,
    for long-running sharded training where per-host async saving
    matters.
"""

from __future__ import annotations

import os

import numpy as np

import jax

__all__ = ['save_params', 'load_params', 'Checkpointer']


def save_params(params, path):
    """Save a pytree of arrays to an .npz file (atomic rename).

    The tree structure's string form is stored alongside the leaves so
    :func:`load_params` can reject a mismatched ``like`` tree instead
    of silently rebinding leaves to the wrong positions.
    """
    flat, treedef = jax.tree_util.tree_flatten(params)
    arrays = {('arr_%d' % i): np.asarray(a) for i, a in enumerate(flat)}
    tmp = str(path) + '.part'
    np.savez(tmp, __treedef__=np.array(str(treedef)), **arrays)
    os.replace(tmp + '.npz', path)   # np.savez appends .npz to `tmp`
    return path


def load_params(path, like=None):
    """Load a pytree saved by :func:`save_params`.

    ``like`` supplies the tree structure (e.g. freshly initialized
    params) and is validated against the structure recorded at save
    time; without it a flat list of arrays is returned.
    """
    with np.load(path, allow_pickle=False) as data:
        n = len([k for k in data.files if k.startswith('arr_')])
        flat = [data['arr_%d' % i] for i in range(n)]
        saved_tree = str(data['__treedef__']) \
            if '__treedef__' in data.files else None
    if like is None:
        return flat
    treedef = jax.tree_util.tree_structure(like)
    if saved_tree is not None and str(treedef) != saved_tree:
        raise ValueError(
            'checkpoint tree structure %s does not match `like` %s'
            % (saved_tree, treedef))
    return jax.tree_util.tree_unflatten(treedef, flat)


class Checkpointer:
    """Versioned checkpoints via orbax (step-indexed, retained N)."""

    def __init__(self, directory, max_to_keep=3):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step, state):
        """Kick off an (async, per-host) save and return immediately —
        the whole point of the orbax manager is overlapping the
        serialization with the next training steps. Use :meth:`wait`
        (or close()) for a durability barrier; restore() waits
        automatically."""
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self):
        """Block until every in-flight save is durable on disk."""
        self._mgr.wait_until_finished()

    def restore(self, step=None, like=None):
        import orbax.checkpoint as ocp
        self._mgr.wait_until_finished()   # never read a torn save
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if like is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
