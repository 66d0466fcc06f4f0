"""Checkpoint / resume for training state (SURVEY §5).

The reference's persistence story is whole-model pickle with **no
mid-training resume** (``Recommender.save``, reference
``models/recommender.py:223-304``; ``fit()`` always restarts).  This module
adds the TPU-native equivalent the survey calls for: Orbax checkpointing of
(sharded) array pytrees with a step counter, so long fits can stop and
resume.

Usage::

    mgr = CheckpointManager(dir, max_to_keep=3)
    mgr.save(step, {"params": params, "opt_state": opt_state})
    ...
    step, state = mgr.restore_latest()    # None if no checkpoint yet

Falls back transparently between Orbax API generations; state must be a
pytree of arrays (jax or numpy) — exactly what the jitted training loops
in this package carry.
"""

import os

import numpy as np


class CheckpointManager:
    """Thin Orbax wrapper with a stable API across orbax versions."""

    def __init__(self, directory, max_to_keep=3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._ocp = ocp

    def save(self, step, state, force=False):
        """Save a pytree of arrays at ``step``. Returns True if written."""
        ok = self._mgr.save(
            int(step),
            args=self._ocp.args.StandardSave(state),
            force=force,
        )
        self._mgr.wait_until_finished()
        return bool(ok)

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step, template=None):
        """Restore the pytree saved at ``step``.

        ``template`` (a pytree of arrays with the right shapes/dtypes or
        jax.ShapeDtypeStruct leaves) restores with matching sharding; None
        restores as host numpy arrays.
        """
        if template is not None:
            args = self._ocp.args.StandardRestore(template)
            return self._mgr.restore(int(step), args=args)
        return self._mgr.restore(int(step))

    def restore_latest(self, template=None):
        """(step, state) of the newest checkpoint, or (None, None)."""
        step = self.latest_step()
        if step is None:
            return None, None
        return step, self.restore(step, template)

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()


def save_pytree(path, state):
    """One-shot pytree save without a manager (single checkpoint)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_pytree(path, template=None):
    """One-shot pytree restore; numpy leaves when no template given."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))
    finally:
        ckptr.close()


def tree_to_numpy(state):
    """Device pytree -> host numpy pytree (for pickling alongside models)."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), state)


def epoch_loop(model, total, run_chunk, state, on_report=None, place=None,
               max_chunk=None):
    """Host-side epoch driver shared by the jitted trainers: chunking for
    verbose reporting, periodic checkpointing, and mid-training resume.

    The reference restarts ``fit()`` from scratch on any interruption
    (``models/recommender.py:223-304`` persists only finished models); this
    is the SURVEY §5 mid-training resume that replaces that.

    Parameters
    ----------
    model: the Recommender being fitted — supplies ``verbose`` and the
        checkpoint config set by :meth:`Recommender.enable_checkpointing`.
    total: total number of epochs.
    run_chunk: ``(state, start_epoch, n_epochs) -> (state, info)`` running
        ``n_epochs`` epochs in one compiled program. Implementations MUST
        derive per-epoch randomness from the *global* epoch index
        (``start_epoch + e``) so results are invariant to chunk boundaries —
        that is what makes a resumed fit bit-identical to an uninterrupted
        one.
    state: pytree of device arrays (the training carry).
    on_report: optional ``(done, info) -> None`` verbose callback, invoked
        per chunk when ``model.verbose``.
    place: optional ``pytree -> pytree`` re-placing a host-restored state
        onto devices (e.g. re-applying mesh shardings). Defaults to
        ``jnp.asarray`` per leaf.
    max_chunk: optional upper bound on epochs per compiled chunk — set to 1
        by trainers that must observe per-epoch info on the host (e.g.
        early stopping on delta-loss).

    ``run_chunk`` may signal early stopping by returning an info dict with
    a truthy ``"stop"`` key; a final checkpoint is written before exiting.

    Returns the final state.
    """
    import jax
    import jax.numpy as jnp

    cfg = getattr(model, "_ckpt_cfg", None)
    verbose = bool(getattr(model, "verbose", False))
    mgr = None
    done = 0
    if cfg is not None:
        mgr = CheckpointManager(cfg["dir"], max_to_keep=cfg["max_to_keep"])
        if cfg["resume"]:
            step, saved = mgr.restore_latest()
            if step is not None:
                done = min(int(step), total)
                if place is None:
                    restored = jax.tree_util.tree_map(jnp.asarray, saved)
                else:
                    restored = place(saved)
                # graft restored leaves onto the live state's treedef (orbax
                # may return plain dicts for custom nodes)
                leaves, treedef = jax.tree_util.tree_flatten(restored)
                state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(state), leaves
                )
                if verbose:
                    print("Resumed from checkpoint at epoch %d" % done)

    chunk = total
    if verbose:
        chunk = 1
    if mgr is not None:
        chunk = min(chunk, cfg["every"])
    if max_chunk is not None:
        chunk = min(chunk, max_chunk)

    try:
        while done < total:
            e = min(chunk, total - done)
            state, info = run_chunk(state, done, e)
            done += e
            stop = isinstance(info, dict) and bool(info.get("stop"))
            if verbose and on_report is not None:
                on_report(done, info)
            if mgr is not None and (
                done % cfg["every"] == 0 or done == total or stop
            ):
                mgr.save(done, tree_to_numpy(state))
            if stop:
                break
    finally:
        if mgr is not None:
            mgr.close()
    return state
