"""Native checkpointing via Orbax.

Replaces torch.save/load of {model, optimizer, epoch, scaler, args}
(util/misc.py:295-338). Process-0-only gating is handled by orbax itself
in multi-host runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional



def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(os.path.abspath(directory))


def save_checkpoint(directory: str, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    return _manager(directory).latest_step()


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    if template is not None:
        return mgr.restore(step, args=ocp.args.StandardRestore(template))
    return mgr.restore(step)
