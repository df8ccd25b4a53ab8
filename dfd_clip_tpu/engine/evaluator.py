"""Evaluators (reference /root/reference/src/evaluator.py).

A no-grad pass over each eval dataloader using the trainer's current params;
the eval step is a single jitted program per task. Ragged tail batches are
padded to the data-parallel batch shape and unpadded on the host, keeping XLA
shapes static (SURVEY.md §7 "ragged/packed eval" hard part).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from .callbacks import CallbackMixin
from .trainer import _merge


class _Evaluator(CallbackMixin):
    pass


class Evaluator(_Evaluator):
    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "Evaluator"
        C.num_workers = 4
        C.batch_size = 16
        C.metrics = []
        return C

    def __init__(self, config, runtime, datasets, tracker=None):
        self._init_callbacks()
        self.config = config
        self.runtime = runtime
        self.tracker = tracker
        self.dataloaders = {}
        for dataset in datasets:
            from ..data.loader import DataLoader

            self.dataloaders[f"{dataset.category}/{dataset.name}"] = DataLoader(
                dataset,
                batch_size=config.batch_size * runtime.data_parallel,
                shuffle=False,
                num_workers=config.num_workers,
                collate_fn=dataset.collate_fn,
                drop_last=False,
            )
        self._eval_fns: Dict[int, object] = {}

    def _eval_fn(self, trainer, task_index: int):
        if task_index in self._eval_fns:
            return self._eval_fns[task_index]
        model = trainer.model
        total_tasks = trainer.total_tasks

        def step(trainable, frozen, x, labels, m):
            y = [labels if i == task_index else None for i in range(total_tasks)]
            task_losses, task_logits = model.forward(
                _merge(trainable, frozen), x, y, m, train=False, single_task=task_index
            )
            return task_losses[task_index], task_logits[task_index]

        fn = jax.jit(step)
        self._eval_fns[task_index] = fn
        return fn

    def snapshot_model_state(self, include_frozen: bool = False):
        return self.trainer.snapshot_model_state(include_frozen)

    def run(self, trainer):
        self.trigger_callbacks("on_evaluation_start")
        self.steps = trainer.steps
        self.trainer = trainer
        self.batch_num = 0
        self.total_tasks = trainer.total_tasks
        dp = self.runtime.data_parallel

        for name in self.dataloaders:
            for batch in self.dataloaders[name]:
                self.trigger_callbacks("on_batch_start")
                self.batch_losses = {}
                self.batch_logits = {}
                self.batch_labels = {}
                self.batch_valid = {}

                frames, label, mask, comps, speed, index = batch
                task_index = int(np.asarray(index).reshape(-1)[0])
                x = np.asarray(frames)
                y = np.asarray(label)
                m = np.asarray(mask)

                # pad the ragged tail to the full global batch shape so the
                # eval step compiles at most twice (full + padded-full)
                n = x.shape[0]
                full = self.config.batch_size * dp
                target = full if n < full else ((n + dp - 1) // dp) * dp
                pad = target - n
                if pad:
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                    y = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
                    m = np.concatenate([m, np.repeat(m[-1:], pad, axis=0)])

                # rowid rides along so each process can drop the padding rows
                # that landed in ITS shards (they need not be trailing rows
                # of the local view on non-first ranks)
                arrays = self.runtime.shard_batch(
                    {"x": x, "label": y, "m": m,
                     "rowid": np.arange(target, dtype=np.int32)}
                )
                losses, logits = self._eval_fn(trainer, task_index)(
                    trainer.trainable,
                    # prefer the once-prepared frozen view (int8 wq/ws
                    # sidecar leaves) when the trainer carries one
                    getattr(trainer, "frozen_run", trainer.frozen),
                    arrays["x"], arrays["label"], arrays["m"],
                )
                # local-shard host views, label/rowid from the same sharded
                # arrays so every row stays aligned with its loss/logit.
                # Padding rows stay IN the arrays (fixed local shapes keep
                # the metric allgather collective-safe); batch_valid marks
                # them for post-gather removal in update_metrics
                self.batch_losses[name] = self.runtime.to_host(losses)
                self.batch_logits[name] = self.runtime.to_host(logits)
                self.batch_labels[name] = self.runtime.to_host(arrays["label"])
                self.batch_valid[name] = self.runtime.to_host(arrays["rowid"]) < n

                self.batch_num += 1
                self.batch_loss_info = ",".join(
                    f"{np.mean(l[self.batch_valid[n_]]):.6f}({n_}) "
                    if self.batch_valid[n_].any() else f"-({n_}) "
                    for n_, l in self.batch_losses.items()
                )
                self.trigger_callbacks("on_batch_end")
        self.trigger_callbacks("on_evaluation_end")


class CompInvEvaluator(_Evaluator):
    """Round-robin recon/match evaluation (reference src/evaluator.py:100-172)."""

    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "CompInvEvaluator"
        C.num_workers = 4
        C.batch_size = 16
        C.metrics = []
        return C

    def __init__(self, config, runtime, datasets, tracker=None):
        self._init_callbacks()
        self.config = config
        self.runtime = runtime
        self.tracker = tracker
        self.dataloaders = {}
        for dataset in datasets:
            from ..data.loader import DataLoader

            self.dataloaders[f"{dataset.category}/{dataset.name}"] = DataLoader(
                dataset,
                batch_size=config.batch_size * runtime.data_parallel,
                shuffle=False,
                num_workers=config.num_workers,
                collate_fn=dataset.collate_fn,
                drop_last=True,
            )
        self._eval_fn_cache = None

    def snapshot_model_state(self, include_frozen: bool = False):
        return self.trainer.snapshot_model_state(include_frozen)

    def run(self, trainer):
        self.trigger_callbacks("on_evaluation_start")
        self.steps = trainer.steps
        self.trainer = trainer
        self.batch_num = 0
        model = trainer.model

        if self._eval_fn_cache is None:
            def step(trainable, frozen, x, comp_is_raw):
                return model.forward(_merge(trainable, frozen), x, comp_is_raw, train=False)

            self._eval_fn_cache = jax.jit(step)

        iterators = {name: iter(dl) for name, dl in self.dataloaders.items()}
        while iterators:
            self.trigger_callbacks("on_batch_start")
            self.batch_losses = {}
            self.batch_logits = {}
            self.batch_labels = {}
            for name in list(iterators):
                try:
                    batch = next(iterators[name])
                except StopIteration:
                    iterators.pop(name)
                    continue
                comp_is_raw = np.asarray([c == "raw" for c in batch[3]])
                arrays = self.runtime.shard_batch(
                    {"x": np.asarray(batch[0]), "c": comp_is_raw}
                )
                recon, match = self._eval_fn_cache(
                    trainer.trainable,
                    getattr(trainer, "frozen_run", trainer.frozen),
                    arrays["x"], arrays["c"]
                )
                # local-shard host views (np.asarray would raise on the
                # cross-process-sharded outputs of a multi-host mesh)
                self.batch_losses["recon"] = self.runtime.to_host(recon)
                self.batch_losses["match"] = self.runtime.to_host(match)

            self.batch_num += 1
            self.batch_loss_info = ",".join(
                f"{np.mean(l):.6f}({n}) " for n, l in self.batch_losses.items()
            )
            self.trigger_callbacks("on_batch_end")
        self.trigger_callbacks("on_evaluation_end")
