"""Train-state checkpointing and resume.

The reference has no mid-training resume (SURVEY.md §5.4 — training is 3k
steps; only best/last weight snapshots exist). This framework adds proper
TPU-native checkpointing: the full train state (trainable params, optimizer
state, teacher EMA, step counter, host RNG) saved via Orbax at an interval,
with keep-N rotation and latest-checkpoint resume — the role FSDPCheckpointer
plays for the reference's DINOv2 trainer (dinov2/fsdp/__init__.py:86-156).
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


class TrainStateCheckpointer:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        self._ocp = None
        self._checkpointer = None
        # Orbax's save/restore issue their own cross-process barriers and
        # collectives; called from one rank (or interleaved with the train
        # loop's Gloo collectives on other ranks) they corrupt collective
        # pairing. Multi-process runs therefore use the collective-free
        # pickle format: rank 0 writes plain files, every rank reads locally.
        if jax.process_count() == 1:
            try:
                import orbax.checkpoint as ocp

                self._ocp = ocp
                self._checkpointer = ocp.StandardCheckpointer()
            except Exception as e:  # fall back to pickle if orbax misbehaves
                logger.warning("orbax unavailable (%s); using pickle checkpoints", e)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def list_steps(self):
        if not os.path.isdir(self.directory):
            return []
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name[5:]))
                except ValueError:
                    pass
        return sorted(steps)

    def save(self, step: int, arrays: Any, aux: dict) -> None:
        """arrays: pytree of jax/np arrays; aux: small picklable metadata."""
        path = self._step_dir(step)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if self._checkpointer is not None:
            self._checkpointer.save(os.path.join(os.path.abspath(tmp), "arrays"), arrays)
            # StandardCheckpointer saves asynchronously; finish before the
            # atomic directory rename below.
            if hasattr(self._checkpointer, "wait_until_finished"):
                self._checkpointer.wait_until_finished()
        else:
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "arrays.pkl"), "wb") as f:
                pickle.dump(jax.tree_util.tree_map(np.asarray, arrays), f)
        with open(os.path.join(tmp, "aux.pkl"), "wb") as f:
            pickle.dump({**aux, "step": step}, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        # rotation
        steps = self.list_steps()
        for old in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self._step_dir(old), ignore_errors=True)

    def restore_latest(self, template: Any) -> Optional[Tuple[Any, dict]]:
        steps = self.list_steps()
        if not steps:
            return None
        path = self._step_dir(steps[-1])
        if self._checkpointer is not None and os.path.isdir(os.path.join(path, "arrays")):
            # dtype via attribute when present: np.asarray on a cross-process
            # sharded template leaf (FSDP params) would raise
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype
                ),
                template,
            )
            arrays = self._checkpointer.restore(
                os.path.join(os.path.abspath(path), "arrays"), abstract
            )
        elif os.path.isdir(os.path.join(path, "arrays")):
            raise RuntimeError(
                f"{path} is an Orbax-format checkpoint but this run is "
                f"multi-process ({jax.process_count()} ranks), which uses the "
                "pickle format; resume it single-process or convert it."
            )
        else:
            with open(os.path.join(path, "arrays.pkl"), "rb") as f:
                arrays = pickle.load(f)
        with open(os.path.join(path, "aux.pkl"), "rb") as f:
            aux = pickle.load(f)
        logger.info("restored checkpoint at step %d from %s", aux["step"], path)
        return arrays, aux
