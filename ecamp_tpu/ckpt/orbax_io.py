"""Native checkpointing via Orbax.

Replaces torch.save/load of {model, optimizer, epoch, scaler, args}
(util/misc.py:295-338). Process-0-only gating is handled by orbax itself
in multi-host runs.

Saves are asynchronous: `save_checkpoint` enqueues the host-side write and
returns once the device arrays are snapshotted, so checkpoint I/O overlaps
the next training steps (the reference's torch.save blocks the loop,
main_pretrain.py:274-292). A cached per-directory CheckpointManager
serializes saves to the same directory; call `wait_for_saves()` (or let
interpreter exit do it) before reading a checkpoint you just wrote.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional

_MANAGERS: Dict[str, Any] = {}


def _manager(directory: str):
    import orbax.checkpoint as ocp

    key = os.path.abspath(directory)
    mgr = _MANAGERS.get(key)
    if mgr is None:
        mgr = ocp.CheckpointManager(key)
        _MANAGERS[key] = mgr
    return mgr


def save_checkpoint(directory: str, step: int, state: Any,
                    block: bool = False) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if block:
        mgr.wait_until_finished()


def wait_for_saves(directory: Optional[str] = None) -> None:
    """Block until pending async saves finish (all directories by default)."""
    mgrs = ([_MANAGERS[os.path.abspath(directory)]]
            if directory is not None and os.path.abspath(directory) in _MANAGERS
            else list(_MANAGERS.values()))
    for mgr in mgrs:
        mgr.wait_until_finished()


@atexit.register
def _drain_at_exit() -> None:  # pragma: no cover - interpreter teardown
    for mgr in list(_MANAGERS.values()):
        try:
            mgr.wait_until_finished()
        except Exception:
            pass


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    mgr.wait_until_finished()  # count any save still in flight
    return mgr.latest_step()


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.wait_until_finished()  # a just-enqueued save may be the one requested
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    if template is not None:
        return mgr.restore(step, args=ocp.args.StandardRestore(template))
    return mgr.restore(step)
