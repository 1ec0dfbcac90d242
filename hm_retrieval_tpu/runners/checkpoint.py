"""Orbax checkpointing of the full train state + model export.

The reference only save-exports (three SavedModels per epoch, optimizer
state never persisted, nothing ever loaded back — SURVEY §5.4,
ref: two_tower_model.py:176-205, abstract_keras_model.py:120-131). The
TPU-native design checkpoints {params, opt_state, step} with Orbax for
deterministic restart, and separately exports towers as plain-array npz
artifacts for serving.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from hm_retrieval_tpu.models.two_tower import TrainState
from hm_retrieval_tpu.utils.pytree_io import save_pytree_npz

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Step-numbered orbax checkpoints with latest-restore."""

    def __init__(self, dirpath: str, max_to_keep: int = 3):
        self.dirpath = os.path.abspath(dirpath)
        os.makedirs(self.dirpath, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dirpath,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        """ASYNC: returns once the device->host snapshot is taken (orbax
        performs the D2H copy synchronously inside ``save``, so donating
        or mutating ``state`` afterwards is safe); the disk write
        overlaps the next epoch's training (SURVEY §5.4). ``close()``
        and ``restore()`` barrier on in-flight writes."""
        self._mgr.save(
            step, args=ocp.args.StandardSave(state._asdict())
        )
        logger.info(
            "Scheduled async checkpoint step=%d -> %s",
            step,
            self.dirpath,
        )

    def wait_until_finished(self) -> None:
        """Block until every scheduled save is durably on disk."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state):
        """Restore the latest checkpoint into the structure/shardings of
        ``abstract_state`` (a freshly-initialized TrainState or
        SparseTrainState) — including onto a DIFFERENT mesh than the one
        that saved: orbax re-shards rows to the target shardings."""
        self._mgr.wait_until_finished()  # barrier on in-flight saves
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found in {self.dirpath}"
            )
        target = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, abstract_state._asdict()
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        logger.info("Restored checkpoint step=%d", step)
        return type(abstract_state)(**restored)

    def close(self) -> None:
        self._mgr.close()


def export_model(params, dirpath: str) -> None:
    """Serving export: full model + each tower as plain npz pytrees
    (the reference's two_tower/query_tower/candidate_tower triple,
    ref: two_tower_model.py:176-205)."""
    save_pytree_npz(
        params, os.path.join(dirpath, "two_tower", "params.npz")
    )
    save_pytree_npz(
        params["query_tower"],
        os.path.join(dirpath, "query_tower", "params.npz"),
    )
    save_pytree_npz(
        params["candidate_tower"],
        os.path.join(dirpath, "candidate_tower", "params.npz"),
    )
    logger.info("Exported model artifacts to %s", dirpath)
