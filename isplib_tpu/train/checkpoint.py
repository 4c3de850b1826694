"""Checkpoint / resume (orbax) — a subsystem the reference lacks entirely
(models are retrained from scratch every run; SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, params: Any,
                    opt_state: Any = None, batch_stats: Any = None,
                    extra: Optional[dict] = None,
                    max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if batch_stats is not None:
        state["batch_stats"] = batch_stats
    if extra:
        state["extra"] = extra
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                       template: Any = None) -> dict:
    """Restore state; ``template`` (a matching pytree of arrays) enables
    exact dtype/sharding restoration."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    if template is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out
