"""Checkpoint / resume / stacked-finetune initialization.

Reference: simonmeister/UnFlow uses ``tf.train.Saver`` in
``src/e2eflow/core/train.py`` (save every ``save_interval`` into the
experiment dir; restore latest on resume) and a ``finetune`` config list
naming previous experiments whose checkpoints initialize the already-
trained stages of a stacked net (SURVEY.md §5 checkpoint row).

Here: orbax checkpointing of the ``{params, opt_state, step}`` pytree;
``init_stages_from`` copies stage subtrees (``stage0_C`` etc.) from
prior experiments' checkpoints — the functional equivalent of the
reference's variable-scope-based restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self._dir = Path(directory).absolute() / "checkpoints"
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    @property
    def directory(self) -> Path:
        return self._dir

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_untyped(self, step: int | None = None) -> Any:
        """Template-free restore: the tree structure comes from the
        checkpoint's own metadata. Public wrapper so callers never reach
        into orbax internals."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_params(exp_dir: str | Path, params_template: Any = None) -> Any:
    """Restore only the params subtree from an experiment's latest ckpt.

    Template-free (the checkpoint also stores opt_state/step, which a
    partial template restore would reject); returns host numpy arrays.
    """
    del params_template  # structure comes from checkpoint metadata
    mgr = CheckpointManager(exp_dir)
    try:
        restored = mgr.restore_untyped()
    finally:
        mgr.close()
    return restored["params"]


def init_stages_from(params: dict, finetune_exp_dirs: list[str | Path]) -> dict:
    """Initialize stage subtrees from prior experiments' checkpoints.

    The last experiment in the list wins per stage (so the C -> CS ->
    CSS recipe passes [C_exp, CS_exp] and CS's stage0/1 take precedence,
    matching the reference's sequential restore order).
    Stage keys missing in a checkpoint are left at fresh init.
    """
    params = dict(params)
    for exp_dir in finetune_exp_dirs:
        ckpt_dir = Path(exp_dir)
        mgr = CheckpointManager(ckpt_dir)
        # Template-free restore: the prior experiment may have fewer
        # stages than this one; copy whichever stage subtrees it has.
        try:
            restored = mgr.restore_untyped()
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"finetune experiment has no checkpoint: {ckpt_dir}"
            ) from e
        finally:
            mgr.close()
        for key, sub in restored.get("params", {}).items():
            if key in params:
                params[key] = jax.tree_util.tree_map(jnp_asarray_like, sub, params[key])
    return params


def jnp_asarray_like(value, like):
    import jax.numpy as jnp

    arr = jnp.asarray(value, dtype=like.dtype)
    if arr.shape != like.shape:
        raise ValueError(
            f"finetune checkpoint param shape {arr.shape} != model {like.shape}"
        )
    return arr
