"""Step-based multi-task trainer.

Re-architecture of the reference Trainer (/root/reference/src/trainer.py:15-203)
for the TPU runtime: one jitted gradient step per task (the frozen encoder,
decoder forward, losses, and backward are a single XLA program with the batch
sharded over the mesh's data axis — gradient all-reduce is a psum inserted by
XLA, replacing DDP), gradients accumulated across the per-step task batches,
and one optimizer apply per step, matching the reference's
"zero_grad -> backward per task -> single optimizer.step()" semantics
(src/trainer.py:110-177).

Teacher mode (src/trainer.py:67-70, 124-137, 179-191): an EMA copy of the
trainable params produces soft pseudo-labels for non-source tasks after
``teach_at`` steps; the EMA update (p_t = (1-r) p_t + r p_s — note the
reference's inverted ratio semantics, kept verbatim) runs jitted on device.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import optim
from .callbacks import CallbackMixin
from ..models import weights as weights_lib

logger = logging.getLogger(__name__)


def _merge(trainable: Dict, frozen: Dict) -> Dict:
    return {**frozen, **trainable}


class _Trainer(CallbackMixin):
    def _prepare_frozen(self, frozen):
        """Runtime view of the frozen pytree fed to jitted step fns: with
        op_mode.compute_int8 the frozen tower's GEMM weights pre-quantize
        ONCE here (int8 "wq"/f32 "ws" sidecar leaves the kernels pick up,
        clip_vit.prepare_int8_params) instead of re-quantizing the full
        weight set inside every gradient step — the frozen params are jit
        inputs, so XLA cannot constant-fold the absmax+round pass away.
        Identity when compute_int8 is off. ``self.frozen`` stays pristine:
        snapshots/checkpoints never see the runtime-only leaves."""
        prepare = getattr(self.model, "prepare_params", None)
        return prepare(frozen) if prepare is not None else frozen


class Trainer(_Trainer):
    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "Trainer"
        C.max_steps = 100
        C.num_workers = 4
        C.batch_size = 16
        C.learning_rate = 1e-3
        C.metrics = []
        C.mode = "normal"
        C.mode_params = CN(new_allowed=True)
        C.lr_scheduler = "one_cycle"
        # train-state checkpointing (0 = off; dir defaults to the run dir)
        C.checkpoint_interval = 0
        C.checkpoint_dir = ""
        C.checkpoint_keep = 3
        return C

    def __init__(self, config, runtime, model, datasets, tracker=None, seed: int = 0):
        assert config.mode in ("normal", "teacher")
        if config.mode == "teacher":
            assert 0 <= config.mode_params.teach_at <= config.max_steps
        self._init_callbacks()
        self.config = config
        self.mode = config.mode
        self.runtime = runtime
        self.model = model
        self.tracker = tracker
        self.total_tasks = len(model.out_dim)
        self.host_rng = np.random.default_rng(seed + runtime.process_index)
        self.dropout_keys = jax.random.split(jax.random.key(seed), 1)[0]

        # Schedule: total steps scale with the data-parallel world size
        # (src/trainer.py:56-62) while the trainer runs max_steps steps.
        self.schedule = (
            optim.one_cycle_schedule(config.learning_rate, config.max_steps * runtime.data_parallel)
            if config.lr_scheduler == "one_cycle"
            else None
        )
        if self.schedule is None:
            raise NotImplementedError(config.lr_scheduler)

        params = model.init_params(jax.random.key(seed))
        if getattr(model, "pretrained_encoder", None) is not None:
            params["encoder"] = model.pretrained_encoder
        self.trainable, self.frozen = model.partition_params(params)
        self.optimizer = optim.build_optimizer(model.optimizer_spec(), self.schedule)
        self.opt_state = self.optimizer.init(self.trainable)

        self.teaching = False
        self.teacher = jax.tree_util.tree_map(jnp.copy, self.trainable) if self.mode == "teacher" else None

        # Replicate state over the mesh; batches get sharded per step.
        self.trainable = runtime.replicate(self.trainable)
        self.frozen = runtime.replicate(self.frozen)
        self.frozen_run = self._prepare_frozen(self.frozen)
        self.opt_state = runtime.replicate(self.opt_state)
        if self.teacher is not None:
            self.teacher = runtime.replicate(self.teacher)

        self.dataloaders = {}
        for dataset in datasets:
            from ..data.loader import DataLoader

            # batch_size is per data-parallel replica (the reference's per-GPU
            # batch, src/trainer.py:77-86); the loader emits the global batch.
            self.dataloaders[f"{dataset.category}/{dataset.name}"] = DataLoader(
                dataset,
                batch_size=config.batch_size * runtime.data_parallel,
                shuffle=True,
                num_workers=config.num_workers,
                collate_fn=dataset.collate_fn,
                drop_last=True,
                seed=seed,
            )

        self._grad_fns: Dict[Any, Any] = {}
        self._apply_fn = jax.jit(self._apply_update, donate_argnums=(0, 1))
        self._ema_fn = jax.jit(self._ema_update, donate_argnums=(0,))

        # checkpoint/resume
        self.start_step = 0
        self.checkpointer = None
        if config.get("checkpoint_interval", 0):
            from .checkpoint import TrainStateCheckpointer

            self.checkpointer = TrainStateCheckpointer(
                config.checkpoint_dir or "checkpoints",
                keep=config.get("checkpoint_keep", 3),
            )
            restored = self.checkpointer.restore_latest(self._checkpoint_arrays())
            if restored is not None:
                arrays, aux = restored
                self.trainable = runtime.replicate(arrays["trainable"])
                # restored opt_state leaves arrive in the saved (dict) shape;
                # rebuild the optax NamedTuple structure around them.
                self.opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.opt_state),
                    jax.tree_util.tree_leaves(runtime.replicate(arrays["opt_state"])),
                )
                if self.teacher is not None and arrays.get("teacher") is not None:
                    self.teacher = runtime.replicate(arrays["teacher"])
                self.start_step = aux["step"]
                self.teaching = bool(aux.get("teaching", False))
                self.host_rng = np.random.default_rng()
                self.host_rng.bit_generator.state = aux["host_rng_state"]
                self.dropout_keys = jax.random.wrap_key_data(
                    jnp.asarray(arrays["dropout_keys"])
                )

    def _checkpoint_arrays(self):
        return {
            "trainable": self.trainable,
            "opt_state": self.opt_state,
            "teacher": self.teacher,
            "dropout_keys": jax.random.key_data(self.dropout_keys)
            if jnp.issubdtype(self.dropout_keys.dtype, jax.dtypes.prng_key)
            else self.dropout_keys,
        }

    def _maybe_checkpoint(self):
        interval = self.config.get("checkpoint_interval", 0)
        if not self.checkpointer or not interval or self.steps % interval:
            return
        if self.runtime.is_main_process:
            self.checkpointer.save(
                self.steps,
                weights_lib.to_numpy_tree(self._checkpoint_arrays()),
                {
                    "teaching": self.teaching,
                    "host_rng_state": self.host_rng.bit_generator.state,
                },
            )

    # -- jitted pieces ---------------------------------------------------------
    def _apply_update(self, trainable, opt_state, grads):
        updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state

    def _ema_update(self, teacher, trainable):
        r = self.config.mode_params.ema_ratio
        return jax.tree_util.tree_map(
            lambda t, s: (1.0 - r) * t + r * s, teacher, trainable
        )

    def _grad_fn(self, task_index: int, teaching: bool, label_kinds: tuple):
        key = (task_index, teaching, label_kinds)
        if key in self._grad_fns:
            return self._grad_fns[key]

        model = self.model

        def step(trainable, frozen, teacher, x, labels, m, comp_is_raw, speed, rng,
                 patch_indices, triplet_indices):
            if teaching:
                t_logits, _ = model.predict(
                    _merge(teacher, frozen), x, m, train=False
                )
                y = [
                    labels if i == task_index else jax.nn.softmax(t_logits[i], axis=-1)
                    for i in range(self.total_tasks)
                ]
                single_task = None
            else:
                y = [labels if i == task_index else None for i in range(self.total_tasks)]
                single_task = task_index

            def loss_fn(tr):
                task_losses, task_logits, other = model.forward(
                    _merge(tr, frozen), x, y, m, comp_is_raw, speed,
                    train=True, single_task=single_task, rng=rng,
                    patch_indices=patch_indices, triplet_indices=triplet_indices,
                )
                if teaching:
                    main = sum(l.mean() for l in task_losses)
                else:
                    main = task_losses[task_index].mean()
                main = main + sum(v.mean() for v in other.values())
                return main, (task_losses, task_logits, other, y)

            grads, aux = jax.grad(loss_fn, has_aux=True)(trainable)
            return grads, aux

        fn = jax.jit(step, static_argnames=())
        self._grad_fns[key] = fn
        return fn

    # -- helpers ----------------------------------------------------------------
    def current_lr(self) -> float:
        return float(self.schedule(min(self.steps, self.config.max_steps * self.runtime.data_parallel)))

    def snapshot_model_state(self, include_frozen: bool = False):
        state = {"trainable": weights_lib.to_numpy_tree(self.trainable), "steps": getattr(self, "steps", 0)}
        if include_frozen:
            state["frozen"] = weights_lib.to_numpy_tree(self.frozen)
        return state

    def _next_dropout_key(self):
        self.dropout_keys, sub = jax.random.split(self.dropout_keys)
        return sub

    def _host_extras(self, batch_size: int):
        """Per-step host-sampled index arrays (patch mask, triplets)."""
        patch_indices = None
        if "patch_mask" in self.model.train_mode:
            patch_indices = jnp.asarray(self.model.sample_patch_indices(self.host_rng))
        triplet_indices = None
        tm = self.model.train_mode
        if "temporal" in tm and tm.temporal == "triplet":
            from math import comb

            rounds = min(comb(batch_size, 3), 10)
            if rounds == 0:
                raise ValueError(
                    "train_mode.temporal='triplet' needs a global batch of"
                    f" >= 3 clips to sample a speed triplet, got {batch_size}"
                    " (raise trainer.batch_size)"
                )
            idx = np.stack([
                self.host_rng.choice(batch_size, 3, replace=False) for _ in range(rounds)
            ])
            triplet_indices = jnp.asarray(idx)  # sorted by speed inside forward? no:
        return patch_indices, triplet_indices

    def _prepare_batch(self, batch):
        """Collated numpy batch -> device arrays: batch axis over 'data',
        frame axis over 'seq' when sequence parallelism is on."""
        from jax.sharding import PartitionSpec as P

        frames, label, mask, comps, speed, index = batch
        comp_is_raw = np.asarray([c == "raw" for c in comps])
        arrays = {
            "x": np.asarray(frames),
            "label": np.asarray(label),
            "m": np.asarray(mask),
            "comp_is_raw": comp_is_raw,
            "speed": np.asarray(speed, np.float32),
        }
        specs = None
        if self.runtime.seq_parallel > 1 and arrays["x"].shape[1] % self.runtime.seq_parallel == 0:
            specs = {"x": P("data", "seq")}
        return (
            self.runtime.shard_batch(arrays, specs),
            int(np.asarray(index).reshape(-1)[0]),
        )

    # -- the loop (reference src/trainer.py:98-203) ------------------------------
    def _next_device_batch(self, iterators, name):
        """Fetch + device-place the next batch of one task's loader."""
        try:
            batch = next(iterators[name])
        except StopIteration:
            iterators[name] = iter(self.dataloaders[name])
            try:
                batch = next(iterators[name])
            except StopIteration:
                raise RuntimeError(
                    f"dataloader '{name}' yields no batches: dataset has "
                    f"{len(self.dataloaders[name].dataset)} samples but the "
                    f"global batch is {self.dataloaders[name].batch_size} "
                    "(batch_size x data_parallel) with drop_last"
                ) from None
        return (*self._prepare_batch(batch), batch)

    def run(self):
        import queue as _queue
        import threading as _threading

        self.trigger_callbacks("on_training_start")
        self.steps = self.start_step
        if self.steps >= self.config.max_steps:
            self.trigger_callbacks("on_training_end")
            return
        if self.start_step:
            # Resume the data stream, not just the params: every step draws
            # exactly one batch per task loader, so the position is fully
            # determined by the step count. Without this, the rebuilt
            # iterators replayed the epoch from the top and the resumed run
            # re-trained on exactly the batches the pre-crash run already
            # consumed (duplicated data, diverges from an uninterrupted
            # run). The loaders' (seed + epoch) shuffle makes the skip
            # index-only — no decode work for skipped batches.
            for dl in self.dataloaders.values():
                per_epoch = len(dl)
                if per_epoch > 0:
                    dl.set_position(self.start_step // per_epoch,
                                    self.start_step % per_epoch)
        iterators = {name: iter(dl) for name, dl in self.dataloaders.items()}

        # Device prefetch: decode + host->device transfer of the next round
        # of task batches overlaps the current step's compute (the transfer
        # can dominate on slow host links).
        names = list(iterators.keys())
        prefetch_q: "_queue.Queue" = _queue.Queue(maxsize=1)
        stop_prefetch = _threading.Event()

        def producer():
            try:
                while not stop_prefetch.is_set():
                    round_batches = [
                        (name, self._next_device_batch(iterators, name))
                        for name in names
                    ]
                    while not stop_prefetch.is_set():
                        try:
                            prefetch_q.put(("ok", round_batches), timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except Exception as e:
                prefetch_q.put(("err", e))

        producer_thread = _threading.Thread(target=producer, daemon=True)
        producer_thread.start()

        try:
            self._run_loop(prefetch_q)
        finally:
            stop_prefetch.set()
            # Drain so a blocked put returns, then JOIN: a daemon thread
            # still inside native decode at interpreter exit dies by forced
            # unwind ("FATAL: exception not rethrown" -> SIGABRT) when it
            # next touches the GIL (same teardown hazard as data/loader.py).
            try:
                while True:
                    prefetch_q.get_nowait()
            except _queue.Empty:
                pass
            producer_thread.join(timeout=30)

    def _run_loop(self, prefetch_q):
        while True:
            self.trigger_callbacks("on_batch_start")
            self.batch_losses = {}
            self.batch_logits = {}
            self.batch_labels = {}

            kind, round_batches = prefetch_q.get()
            if kind == "err":
                raise round_batches

            total_grads = None
            for name, (device_batch, task_index, batch) in round_batches:
                bsz = device_batch["x"].shape[0]
                patch_indices, triplet_indices = self._host_extras(bsz)
                if triplet_indices is not None:
                    # order each triple fastest->slowest by this batch's speeds
                    speeds = np.asarray(batch[4])
                    tri = np.asarray(triplet_indices)
                    order = np.argsort(-speeds[tri], axis=1)
                    triplet_indices = jnp.asarray(np.take_along_axis(tri, order, axis=1))

                label_kinds = (str(device_batch["label"].dtype), device_batch["label"].shape[1:])
                grad_fn = self._grad_fn(task_index, self.teaching, label_kinds)
                grads, (task_losses, task_logits, other, y) = grad_fn(
                    self.trainable, self.frozen_run, self.teacher,
                    device_batch["x"], device_batch["label"], device_batch["m"],
                    device_batch["comp_is_raw"], device_batch["speed"],
                    self._next_dropout_key(), patch_indices, triplet_indices,
                )
                total_grads = grads if total_grads is None else jax.tree_util.tree_map(
                    jnp.add, total_grads, grads
                )

                to_host = self.runtime.to_host
                self.batch_losses[name] = to_host(task_losses[task_index])
                self.batch_logits[name] = to_host(task_logits[task_index])
                self.batch_labels[name] = to_host(y[task_index])
                for k, v in other.items():
                    self.batch_losses[k] = to_host(v)

            self.batch_loss_info = ",".join(
                f"{np.mean(l):.6f}({n}) " for n, l in self.batch_losses.items()
            )
            # NaN abort (the dinov2 trainer's guard, train.py:274-276).
            # BEFORE the optimizer apply and checkpoint: losses are already
            # on host (to_host above, no extra sync), and aborting here
            # leaves self.trainable at the last good params instead of
            # applying NaN grads and possibly persisting the poisoned
            # state via _maybe_checkpoint — a resume would then NaN again.
            for name, losses in self.batch_losses.items():
                if not np.isfinite(np.asarray(losses)).all():
                    raise FloatingPointError(
                        f"NaN/Inf loss for '{name}' at step {self.steps + 1}"
                    )

            self.trainable, self.opt_state = self._apply_fn(
                self.trainable, self.opt_state, total_grads
            )

            if self.mode == "teacher":
                self.teacher = self._ema_fn(self.teacher, self.trainable)

            self.steps += 1
            if self.mode == "teacher" and not self.teaching and self.config.mode_params.teach_at < self.steps:
                self.teaching = True
            self._maybe_checkpoint()
            self.trigger_callbacks("on_batch_end")

            if self.steps >= self.config.max_steps:
                self.trigger_callbacks("on_training_end")
                return


class CompInvTrainer(_Trainer):
    """Adapter pretrainer loop (reference src/trainer.py:206-316)."""

    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "CompInvTrainer"
        C.max_steps = 100
        C.num_workers = 4
        C.batch_size = 16
        C.learning_rate = 1e-3
        C.metrics = []
        return C

    def __init__(self, config, runtime, model, datasets, tracker=None, seed: int = 0):
        self._init_callbacks()
        self.config = config
        self.runtime = runtime
        self.model = model
        self.tracker = tracker
        self.host_rng = np.random.default_rng(seed)
        self.dropout_keys = jax.random.key(seed + 1)

        self.schedule = optim.one_cycle_schedule(
            config.learning_rate, config.max_steps * runtime.data_parallel
        )
        params = model.init_params(jax.random.key(seed))
        if getattr(model, "pretrained_encoder", None) is not None:
            params["encoder"] = model.pretrained_encoder
        self.trainable, self.frozen = model.partition_params(params)
        self.optimizer = optim.build_optimizer(model.optimizer_spec(), self.schedule)
        self.opt_state = self.optimizer.init(self.trainable)
        self.trainable = runtime.replicate(self.trainable)
        self.frozen = runtime.replicate(self.frozen)
        self.frozen_run = self._prepare_frozen(self.frozen)
        self.opt_state = runtime.replicate(self.opt_state)

        self.dataloaders = {}
        for dataset in datasets:
            from ..data.loader import DataLoader

            # batch_size is per data-parallel replica (the reference's per-GPU
            # batch, src/trainer.py:77-86); the loader emits the global batch.
            self.dataloaders[f"{dataset.category}/{dataset.name}"] = DataLoader(
                dataset,
                batch_size=config.batch_size * runtime.data_parallel,
                shuffle=True,
                num_workers=config.num_workers,
                collate_fn=dataset.collate_fn,
                drop_last=True,
                seed=seed,
            )

        model_ref = self.model

        def step(trainable, frozen, opt_state, x, comp_is_raw, rng):
            def loss_fn(tr):
                recon, match = model_ref.forward(
                    _merge(tr, frozen), x, comp_is_raw, train=True, rng=rng
                )
                return recon + match, (recon, match)

            grads, aux = jax.grad(loss_fn, has_aux=True)(trainable)
            updates, opt_state2 = self.optimizer.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state2, aux

        self._step_fn = jax.jit(step, donate_argnums=(0, 2))

    def current_lr(self) -> float:
        return float(self.schedule(min(self.steps, self.config.max_steps * self.runtime.data_parallel)))

    def snapshot_model_state(self, include_frozen: bool = False):
        return {"trainable": weights_lib.to_numpy_tree(self.trainable), "steps": getattr(self, "steps", 0)}

    def run(self):
        self.trigger_callbacks("on_training_start")
        self.steps = 0
        iterators = {name: iter(dl) for name, dl in self.dataloaders.items()}

        while True:
            self.trigger_callbacks("on_batch_start")
            self.batch_losses = {}
            self.batch_logits = {}
            self.batch_labels = {}

            for name in iterators:
                try:
                    batch = next(iterators[name])
                except StopIteration:
                    iterators[name] = iter(self.dataloaders[name])
                    batch = next(iterators[name])

                frames, label, mask, comps = batch[0], batch[1], batch[2], batch[3]
                comp_is_raw = np.asarray([c == "raw" for c in comps])
                arrays = self.runtime.shard_batch(
                    {"x": np.asarray(frames), "comp_is_raw": comp_is_raw}
                )
                self.dropout_keys, sub = jax.random.split(self.dropout_keys)
                self.trainable, self.opt_state, (recon, match) = self._step_fn(
                    self.trainable, self.frozen_run, self.opt_state,
                    arrays["x"], arrays["comp_is_raw"], sub,
                )
                # local-shard host views (multi-host-safe; see Evaluator)
                self.batch_losses["recon"] = self.runtime.to_host(recon)
                self.batch_losses["match"] = self.runtime.to_host(match)

            self.steps += 1
            self.batch_loss_info = ",".join(
                f"{np.mean(l):.6f}({n}) " for n, l in self.batch_losses.items()
            )
            self.trigger_callbacks("on_batch_end")

            if self.steps >= self.config.max_steps:
                self._maybe_calibrate_bn(iterators)
                self.trigger_callbacks("on_training_end")
                return

    def _maybe_calibrate_bn(self, iterators, n_batches: int = 8):
        """768-bn adapters: populate the eval-time BatchNorm running stats
        from raw encoder K/V (torch tracks these as buffers during training;
        the functional train step cannot — see adapter.calibrate_bn_stats)."""
        cfg = getattr(self.model, "adapter_cfg", None)
        if cfg is None or cfg.struct_type != "768-bn":
            return
        from ..models import adapter as adapter_lib

        name = next(iter(self.dataloaders))
        params = _merge(self.trainable, self.frozen_run)

        def raw_kv_batches():
            for _ in range(n_batches):
                try:
                    batch = next(iterators[name])
                except StopIteration:
                    iterators[name] = iter(self.dataloaders[name])
                    batch = next(iterators[name])
                x = self.runtime.shard_batch({"x": np.asarray(batch[0])})["x"]
                _, kv_raw = self.model.predict(params, x, train=False)
                yield {s: np.asarray(v) for s, v in kv_raw.items()}

        self.trainable = dict(self.trainable)
        self.trainable["adapter"] = adapter_lib.calibrate_bn_stats(
            self.trainable["adapter"], raw_kv_batches(), cfg
        )
