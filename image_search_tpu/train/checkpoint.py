"""Training-state checkpointing (orbax): resumable fine-tuning.

The model checkpoint (safetensors, models/convert.py) carries params only —
right for serving. Training additionally needs optimizer moments and the
step counter to resume exactly; those go through orbax, which handles
sharded arrays and atomic directory swaps natively.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

from image_search_tpu.train.contrastive import TrainState

log = logging.getLogger(__name__)


def save_train_state(directory: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, dict(state._asdict()), force=True)
    log.info("saved train state (step %d) to %s", int(state.step), path)


def load_train_state(directory: str, template: TrainState) -> Optional[TrainState]:
    """Restore a state saved by save_train_state; None when absent.

    ``template`` supplies the tree structure/shapes/shardings (build it with
    the same init_fn used for a fresh run)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    if not os.path.exists(path):
        return None
    with ocp.StandardCheckpointer() as ckpt:
        restored = ckpt.restore(path, dict(template._asdict()))
    state = TrainState(**restored)
    log.info("restored train state (step %d) from %s", int(state.step), path)
    return state
