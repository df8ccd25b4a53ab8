"""SSL training loop (the equivalent of dinov2/train/train.py:135-314).

One jitted train step over the mesh: student forward on masked globals +
locals, DINO/iBOT/KoLeo losses, AdamW with layerwise decay and scheduled
weight decay, teacher EMA, loss centering — plus the host loop with cosine
schedules, NaN abort (train.py:274-276), periodic checkpointing, and JSONL
metric logging.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip_vit import ViTConfig
from ..models import dinov2_vit  # noqa: F401  (arch registry)
from . import schedules as sched_lib
from .augmentations import MultiCropAugmentation
from .masking import BlockMaskGenerator
from .meta_arch import SSLConfig, SSLMetaArch
from .samplers import ShardedInfiniteSampler

logger = logging.getLogger(__name__)


class SSLTrainer:
    @staticmethod
    def get_default_config():
        from ..config import CN

        C = CN()
        C.name = "SSLTrainer"
        C.arch = "ViT-B/14"
        C.ffn_layer = ""   # override: "mlp" | "swiglufused" (dinov2 ffn_layer knob)
        C.centering = "centering"  # or "sinkhorn_knopp" (ssl_default_config.yaml:70)
        C.out_dim = 65536
        C.batch_size = 32          # per data-parallel replica
        C.max_steps = 1000
        C.warmup_steps = 100
        C.freeze_last_layer_steps = 30
        C.lr = 0.004               # scaled by sqrt(global_batch/1024)
        C.final_lr = 1.0e-6
        C.weight_decay = 0.04
        C.final_weight_decay = 0.4
        C.teacher_momentum = 0.992
        C.final_teacher_momentum = 1.0
        C.teacher_temp = 0.07
        C.warmup_teacher_temp = 0.04
        C.warmup_teacher_temp_steps = 300
        C.n_local_crops = 8
        C.local_size = 98
        C.mask_ratio_min = 0.1
        C.mask_ratio_max = 0.5
        C.mask_sample_prob = 0.5
        C.layerwise_decay = 0.9
        C.drop_path_rate = 0.0
        C.remat = 0  # rematerialize student blocks in backward (HBM relief)
        C.fsdp = 0  # shard params/opt state over the data axis (ZeRO-3 analog)
        C.checkpoint_interval = 0
        C.checkpoint_dir = "ssl_checkpoints"
        C.seed = 0
        return C

    def __init__(self, config, runtime, dataset, tracker=None,
                 arch: Optional[ViTConfig] = None):
        """dataset: map-style, __getitem__(i) -> HWC uint8 RGB image."""
        from ..models.dinov2_vit import ARCHITECTURES

        self.config = config
        self.runtime = runtime
        self.dataset = dataset
        self.tracker = tracker
        vit_cfg = arch or ARCHITECTURES[config.arch]
        if config.get("ffn_layer", ""):
            import dataclasses

            vit_cfg = dataclasses.replace(vit_cfg, ffn_layer=config.ffn_layer)

        self.ssl_cfg = SSLConfig(
            arch=vit_cfg,
            out_dim=config.out_dim,
            ibot_out_dim=config.out_dim,
            local_size=config.local_size,
            n_local_crops=config.n_local_crops,
            drop_path_rate=config.get("drop_path_rate", 0.0),
            remat=bool(config.get("remat", 0)),
            centering=config.get("centering", "centering"),
        )
        self.meta = SSLMetaArch(self.ssl_cfg)
        self.student, self.teacher, self.centers = self.meta.init_params(
            jax.random.key(config.seed)
        )

        global_batch = config.batch_size * runtime.data_parallel
        lr = sched_lib.sqrt_lr_scaling(config.lr, global_batch)
        self.lr_schedule = sched_lib.cosine_with_warmup(
            lr, config.final_lr, config.max_steps, config.warmup_steps
        )
        self.wd_schedule = sched_lib.cosine_with_warmup(
            config.weight_decay, config.final_weight_decay, config.max_steps
        )
        self.momentum_schedule = sched_lib.cosine_with_warmup(
            config.teacher_momentum, config.final_teacher_momentum, config.max_steps
        )
        self.temp_schedule = sched_lib.cosine_with_warmup(
            config.teacher_temp, config.teacher_temp, config.max_steps,
            warmup_steps=config.warmup_teacher_temp_steps,
            start=config.warmup_teacher_temp,
        )

        self.optimizer = sched_lib.build_ssl_optimizer(
            self.student, self.lr_schedule, self.wd_schedule,
            n_layers=vit_cfg.layers, layerwise_decay=config.layerwise_decay,
        )
        self.opt_state = self.optimizer.init(self.student)

        # Parameter placement: replicated, or FSDP-style sharded storage —
        # leaves whose leading dim divides the data axis are laid out
        # P('data'); XLA all-gathers at use and keeps optimizer state sharded
        # (the TPU analog of the reference's FULL_SHARD FSDP,
        # dinov2/fsdp/__init__.py:23-55).
        place = self._shard_params if config.get("fsdp", 0) else runtime.replicate
        self._place = place
        self.student = place(self.student)
        self.teacher = place(self.teacher)
        self.centers = runtime.replicate(self.centers)
        self.opt_state = place(self.opt_state)

        self.augment = MultiCropAugmentation(
            global_size=vit_cfg.input_resolution, local_size=config.local_size,
            n_local=config.n_local_crops,
        )
        self.mask_gen = BlockMaskGenerator(
            vit_cfg.grid, config.mask_ratio_min, config.mask_ratio_max
        )
        self.host_rng = np.random.default_rng(config.seed + runtime.process_index)

        meta = self.meta

        freeze_steps = config.get("freeze_last_layer_steps", 0)

        def train_step(student, teacher, centers, opt_state,
                       global_crops, local_crops, patch_masks, step, rng):
            temp = self.temp_schedule(step)

            def loss_fn(s):
                return meta.forward_loss(
                    s, teacher, centers, global_crops, local_crops,
                    patch_masks, temp, rng=rng,
                )

            grads, (metrics, new_centers) = jax.grad(loss_fn, has_aux=True)(student)
            # freeze the weight-normed prototype layers for the first
            # freeze_last_layer_steps (dinov2 cancel_last_layer_gradients)
            live = (step >= freeze_steps).astype(jnp.float32)
            for head in ("dino_head", "ibot_head"):
                if head in grads:
                    grads[head]["last_v"] = grads[head]["last_v"] * live
                    grads[head]["last_g"] = grads[head]["last_g"] * live
            updates, opt_state2 = self.optimizer.update(grads, opt_state, student)
            # zeroed GRADS are not enough: decoupled/scheduled weight decay
            # still emits wd*p updates for the frozen prototypes — zero the
            # UPDATE so the layer truly does not move during the freeze
            # window (torch's grad=None skips the param entirely)
            for head in ("dino_head", "ibot_head"):
                if head in updates:
                    updates[head]["last_v"] = updates[head]["last_v"] * live
                    updates[head]["last_g"] = updates[head]["last_g"] * live
            student2 = optax.apply_updates(student, updates)
            m = self.momentum_schedule(step)
            teacher2 = meta.ema_update(teacher, student2, m)
            return student2, teacher2, new_centers, opt_state2, metrics

        self._step_fn = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

        self.checkpointer = None
        self.start_step = 0
        if config.checkpoint_interval:
            from ..engine.checkpoint import TrainStateCheckpointer

            self.checkpointer = TrainStateCheckpointer(config.checkpoint_dir)
            restored = self.checkpointer.restore_latest(self._arrays())
            if restored is not None:
                arrays, aux = restored
                # re-establish the TRAINING placement (fsdp P('data') or
                # replicated, matching init) — plain replication of fsdp
                # params would recompile the donated step and unshard storage
                self.student = self._place(arrays["student"])
                self.teacher = self._place(arrays["teacher"])
                self.centers = runtime.replicate(arrays["centers"])
                self.opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(self.opt_state),
                    jax.tree_util.tree_leaves(self._place(arrays["opt_state"])),
                )
                self.start_step = aux["step"]
                if "host_rng_state" in aux:
                    # rank-0's augmentation stream continues exactly; other
                    # ranks re-derive (their states are not in the ckpt)
                    if runtime.is_main_process:
                        self.host_rng.bit_generator.state = aux["host_rng_state"]
                    else:
                        self.host_rng = np.random.default_rng(
                            (config.seed + runtime.process_index) * 1_000_003
                            + self.start_step
                        )

    def _shard_params(self, tree):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.runtime.data_parallel
        mesh = self.runtime.mesh

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0 and x.shape[0] >= dp:
                return jax.device_put(x, NamedSharding(mesh, P("data")))
            return jax.device_put(x, NamedSharding(mesh, P()))

        return jax.tree_util.tree_map(put, tree)

    def _arrays(self):
        return {
            "student": self.student,
            "teacher": self.teacher,
            "centers": self.centers,
            "opt_state": self.opt_state,
        }

    def _next_batch(self, batch_size: int):
        """Host side: sample images, multi-crop augment, block masks."""
        n = len(self.dataset)
        idx = [next(self._sampler_iter) % n for _ in range(batch_size)]
        globals_, locals_ = [], []
        for i in idx:
            crops = self.augment(self.dataset[i], self.host_rng)
            globals_.append(crops["global"])
            locals_.append(crops["local"])
        g = np.stack([np.stack([s[c] for s in globals_]) for c in range(2)])
        l = None
        if self.config.n_local_crops:
            l = np.stack([
                np.stack([s[c] for s in locals_])
                for c in range(self.config.n_local_crops)
            ])
        masks = np.stack([
            self.mask_gen.batch_masks(batch_size, self.config.mask_sample_prob,
                                      self.host_rng)
            for _ in range(2)
        ])  # (2, B, P)
        return g, l, masks

    def run(self) -> Dict[str, float]:
        import queue as _queue
        import threading as _threading

        cfg = self.config
        # Each process samples/augments only its OWN slice of the global
        # batch (the sampler is rank-sharded, host_rng rank-seeded);
        # shard_local_batch assembles the global sharded arrays. On resume,
        # advance the sampler past the consumed items so the stream
        # continues instead of replaying from step 0 (the engine trainer's
        # set_position fix, applied to the SSL stream).
        global_batch = cfg.batch_size * self.runtime.data_parallel
        if global_batch % self.runtime.num_processes:
            raise ValueError(
                f"global batch {global_batch} not divisible by"
                f" {self.runtime.num_processes} processes"
            )
        batch = global_batch // self.runtime.num_processes
        self._sampler_iter = iter(
            ShardedInfiniteSampler(
                max(len(self.dataset), 1), seed=cfg.seed,
                shard_index=self.runtime.process_index,
                num_shards=self.runtime.num_processes,
                advance=self.start_step * batch,
            )
        )

        # one-batch device prefetch: multi-crop augmentation + transfer
        # overlap the previous step's compute
        q: "_queue.Queue" = _queue.Queue(maxsize=1)
        stop = _threading.Event()

        def producer():
            try:
                while not stop.is_set():
                    g, l, masks = self._next_batch(batch)
                    # (2, B, ...) / (nl, B, ...) / (2, B, P): the batch axis
                    # is axis 1 — shard it over the mesh's data axis so the
                    # step actually runs data-parallel (a bare device_put
                    # would commit the full batch to device 0 and leave the
                    # computation replicated, and rejects multi-host outright)
                    rt = self.runtime
                    item = (
                        rt.shard_local_batch(g, batch_axis=1),
                        rt.shard_local_batch(l, batch_axis=1),
                        rt.shard_local_batch(masks, batch_axis=1),
                    )
                    while not stop.is_set():
                        try:
                            q.put(("ok", item), timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except Exception as e:
                q.put(("err", e))

        producer_thread = _threading.Thread(target=producer, daemon=True)
        producer_thread.start()

        last_metrics: Dict[str, float] = {}
        try:
            last_metrics = self._run_loop(q)
        finally:
            stop.set()
        return last_metrics

    def _run_loop(self, q) -> Dict[str, float]:
        cfg = self.config
        last_metrics: Dict[str, float] = {}
        for step in range(self.start_step, cfg.max_steps):
            kind, item = q.get()
            if kind == "err":
                raise item
            g_d, l_d, m_d = item
            (self.student, self.teacher, self.centers, self.opt_state,
             metrics) = self._step_fn(
                self.student, self.teacher, self.centers, self.opt_state,
                g_d, l_d, m_d, jnp.asarray(step, jnp.float32),
                jax.random.fold_in(jax.random.key(cfg.seed + 1), step),
            )
            last_metrics = {k: float(v) for k, v in metrics.items()}
            if not np.isfinite(last_metrics["total"]):
                raise FloatingPointError(
                    f"NaN/Inf loss at step {step}: {last_metrics}"
                )
            if self.tracker is not None and step % 10 == 0:
                self.tracker.log({f"ssl/{k}": v for k, v in last_metrics.items()},
                                 step=step)
            if (self.checkpointer and cfg.checkpoint_interval
                    and (step + 1) % cfg.checkpoint_interval == 0):
                # materialize is a COLLECTIVE (all-gathers FSDP shards on
                # device): every rank participates, rank 0 writes, then a
                # barrier so no rank races past an in-progress write
                host_tree = self.runtime.materialize(self._arrays())
                if self.runtime.is_main_process:
                    self.checkpointer.save(
                        step + 1, host_tree,
                        {"host_rng_state": self.host_rng.bit_generator.state},
                    )
                self.runtime.barrier(f"ssl_ckpt_{step + 1}")
            if step % 10 == 0:
                self.runtime.print(f"ssl step {step}: {last_metrics}")
        return last_metrics

