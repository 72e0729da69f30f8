"""Full-state checkpoint/resume via orbax.

The reference persists only mesh artifacts every 100 iters (reference:
trainer.py:143-146, geometry/tetrahedron_mesh.py:82-91) and resumes by
re-reading the final .veg (geometry/tetmesh_geometry.py:221-231) — optimizer
state is lost across restarts. Here the whole TrainState (params, AdamUniform
moments/stage pointers, best tracking) plus the iteration counter checkpoint
atomically, making restart exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: Any,
                       step: Optional[int] = None) -> Tuple[int, Any]:
    """Restore (step, state); ``template`` is a pytree with the target
    structure/shapes (an initialized TrainState)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        state = mngr.restore(step, args=ocp.args.StandardRestore(template))
    return step, state
