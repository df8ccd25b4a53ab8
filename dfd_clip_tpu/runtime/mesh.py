"""Device mesh runtime.

TPU-native replacement for the reference's HuggingFace Accelerate + NCCL
process-group layer (cf. /root/reference/main.py:280-317 and
/root/reference/dinov2/distributed/__init__.py): one `jax.sharding.Mesh`
owned by the runtime, data parallelism expressed as a `NamedSharding` on the
batch axis, gradient sync done by XLA collectives inside the jitted step.

Axes:
  * ``data`` — batch/data parallelism (gradient psum rides ICI).
  * ``seq``  — sequence parallelism: the frozen encoder is embarrassingly
    parallel over (batch x frames), and the decoder's flattened K/V stream is
    sharded on its token axis (see SURVEY.md §5.7).
"""

from __future__ import annotations

import logging
from contextlib import contextmanager
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


# The mesh the running process computes over, registered by MeshRuntime so
# model-level code (ops/spmd.py) can shard_map Pallas kernels over it without
# threading the runtime through every call signature. Process-global by
# design (the CLIs own exactly one mesh for their lifetime); library callers
# that create short-lived runtimes should scope them with ``active_mesh`` /
# ``MeshRuntime.deactivate`` so a stale multi-device registration cannot
# reroute later single-stream work through shard_map.
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Register ``mesh`` as the process mesh; returns the previous value so
    callers can restore it."""
    global _CURRENT_MESH
    prev = _CURRENT_MESH
    _CURRENT_MESH = mesh
    return prev


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


@contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Scope the process-mesh registration: restores the previous mesh on
    exit, exception-safe. Use for temporary meshes (tests, nested tools)."""
    prev = set_current_mesh(mesh)
    try:
        yield mesh
    finally:
        set_current_mesh(prev)


def best_mesh_shape(n_devices: int, seq_parallel: int = 1) -> tuple[int, int]:
    """Factor ``n_devices`` into (data, seq) mesh dims."""
    if n_devices % seq_parallel != 0:
        raise ValueError(
            f"seq_parallel={seq_parallel} must divide device count {n_devices}"
        )
    return n_devices // seq_parallel, seq_parallel


def initialize_multihost() -> None:
    """Bootstrap multi-host JAX from cluster env vars when present.

    Replaces the reference's SLURM/torchrun NCCL bootstrap
    (/root/reference/dinov2/distributed/__init__.py:152-237); see
    runtime/launch.py for the cluster-detection logic.
    """
    from .launch import initialize

    initialize()


class MeshRuntime:
    """Owns the device mesh and the canonical shardings of the framework."""

    DATA_AXIS = "data"
    SEQ_AXIS = "seq"

    def __init__(
        self,
        devices: Optional[Sequence[Any]] = None,
        seq_parallel: int = 1,
    ):
        self.devices = list(devices) if devices is not None else jax.devices()
        dp, sp = best_mesh_shape(len(self.devices), seq_parallel)
        dev_array = np.asarray(self.devices).reshape(dp, sp)
        self.mesh = Mesh(dev_array, (self.DATA_AXIS, self.SEQ_AXIS))
        self.data_parallel = dp
        self.seq_parallel = sp
        logger.info(
            "MeshRuntime: %d devices, mesh (data=%d, seq=%d)", len(self.devices), dp, sp
        )
        set_current_mesh(self.mesh)

    def deactivate(self) -> None:
        """Unregister this runtime's mesh if it is still the process mesh
        (no-op when another runtime has since taken over). Call when a
        short-lived runtime goes away; also invoked by ``__exit__``."""
        if current_mesh() is self.mesh:
            set_current_mesh(None)

    def __enter__(self) -> "MeshRuntime":
        set_current_mesh(self.mesh)
        return self

    def __exit__(self, *exc) -> None:
        self.deactivate()

    # -- process topology ----------------------------------------------------
    @property
    def num_processes(self) -> int:
        return jax.process_count()

    @property
    def process_index(self) -> int:
        return jax.process_index()

    @property
    def is_main_process(self) -> bool:
        return jax.process_index() == 0

    def print(self, *args: Any, **kwargs: Any) -> None:
        if self.is_main_process:
            print(*args, **kwargs)

    # -- shardings -------------------------------------------------------------
    def sharding(self, *spec: Any) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading-axis sharding over the data axis."""
        return self.sharding(self.DATA_AXIS)

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    def shard_batch(self, tree: Any, specs: Optional[dict] = None) -> Any:
        """Place a host batch on the mesh, sharded on the leading axis.

        ``specs`` optionally overrides the PartitionSpec per dict key — e.g.
        ``{"x": P("data", "seq")}`` shards a clip batch's frame axis over the
        sequence-parallel mesh axis (the frozen encoder is embarrassingly
        parallel over frames, SURVEY.md §5.7).
        """
        default = self.batch_sharding

        def put(key, x):
            if specs and key in specs:
                return jax.device_put(x, NamedSharding(self.mesh, specs[key]))
            return jax.device_put(x, default)

        if isinstance(tree, dict):
            return {k: put(k, v) for k, v in tree.items()}
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, default), tree)

    def replicate(self, tree: Any) -> Any:
        sh = self.replicated
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def shard_local_batch(self, x, batch_axis: int = 0):
        """Assemble a global device array sharded over 'data' at
        ``batch_axis`` from this process's LOCAL slice of the batch.

        Unlike ``shard_batch`` (whose device_put contract requires every
        process to hold the identical GLOBAL batch), each process passes
        only its own rows — the per-rank-sampler design the SSL trainer
        uses. Single-process this is a plain sharded device_put."""
        if x is None:
            return None
        spec = P(*([None] * batch_axis + ["data"]))
        sharding = NamedSharding(self.mesh, spec)
        if self.num_processes == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    def pad_batch_to_devices(self, n: int) -> int:
        """Smallest multiple of the data-axis size that is >= n."""
        dp = self.data_parallel
        return ((n + dp - 1) // dp) * dp

    def to_host(self, x) -> np.ndarray:
        """Host view of a (possibly cross-process-sharded) device array.

        Returns the process-LOCAL rows for batch-sharded arrays (the
        Accelerate convention — gather_for_metrics then assembles the global
        view), or the full value when it is addressable/replicated.
        """
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = [s for s in x.addressable_shards if s.replica_id == 0]
            for s in shards:
                for axis, sl in enumerate(s.index):
                    if axis > 0 and (sl.start or 0) != 0:
                        # concatenating along axis 0 would silently scramble
                        # an array sharded on a later axis (e.g. the seq
                        # token axis) into wrong-shaped batch rows
                        raise NotImplementedError(
                            "to_host only reassembles leading-axis-sharded "
                            f"arrays; got a shard at index {s.index}"
                        )
            shards.sort(key=lambda s: tuple(
                (sl.start or 0) for sl in s.index
            ))
            return np.concatenate([np.asarray(s.data) for s in shards])
        return np.asarray(x)

    # -- metric gather ---------------------------------------------------------
    def gather_for_metrics(self, tree: Any) -> Any:
        """Gather per-process arrays for metric computation.

        Multi-host analog of Accelerate's ``gather_for_metrics``
        (/root/reference/src/callbacks/metrics.py:98); identity on one host.
        """
        if jax.process_count() == 1:
            return jax.tree_util.tree_map(np.asarray, tree)
        from jax.experimental import multihost_utils

        return jax.tree_util.tree_map(
            lambda x: np.asarray(multihost_utils.process_allgather(x)).reshape(
                (-1,) + np.shape(x)[1:]
            ),
            tree,
        )

    def gather_ragged(self, tree: Any) -> Any:
        """Gather per-process arrays whose leading dim DIFFERS across ranks.

        ``gather_for_metrics``/``process_allgather`` require identical shard
        shapes on every process (unequal shapes deadlock the collective), so
        ragged results — e.g. per-rank video shards of an unevenly divided
        test set (inference.py) — are padded to the all-rank maximum, gathered
        once, and trimmed per segment. Identity on one process.
        """
        if jax.process_count() == 1:
            return jax.tree_util.tree_map(np.asarray, tree)
        from jax.experimental import multihost_utils

        def gather_one(x):
            x = np.asarray(x)
            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray([x.shape[0]], np.int64)
            )).reshape(-1)
            cap = int(counts.max())
            if cap == 0:
                return x.reshape((0,) + x.shape[1:])
            pad_shape = (cap - x.shape[0],) + x.shape[1:]
            padded = np.concatenate([x, np.zeros(pad_shape, x.dtype)])
            full = np.asarray(multihost_utils.process_allgather(padded)).reshape(
                (-1, cap) + x.shape[1:]
            )
            return np.concatenate(
                [full[p, : counts[p]] for p in range(len(counts))]
            )

        return jax.tree_util.tree_map(gather_one, tree)

    def broadcast_str(self, s: str, max_bytes: int = 1024) -> str:
        """Broadcast a (short) string from process 0 to all processes, so
        rank-dependent decisions (run-dir timestamps, version probes) cannot
        fork across ranks. Identity on one process."""
        if jax.process_count() == 1:
            return s
        from jax.experimental import multihost_utils

        buf = np.zeros((max_bytes,), np.uint8)
        raw = s.encode()[:max_bytes]
        buf[: len(raw)] = np.frombuffer(raw, np.uint8)
        out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        return bytes(out[out != 0]).decode()

    def barrier(self, name: str) -> None:
        """Named cross-process barrier. Symmetric (every rank must call it
        with the same name) — used to fence rank-asymmetric host work like
        checkpoint writes off the subsequent collectives."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def materialize(self, tree: Any) -> Any:
        """Full host (numpy) value of every leaf, including cross-process
        sharded jax.Arrays (e.g. FSDP params at checkpoint time).

        COLLECTIVE in multi-process runs: non-addressable leaves are
        all-gathered on device into a replicated layout first, so EVERY
        process must call this (never from inside an is_main_process guard).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())

        def one(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                x = jax.jit(lambda a: a, out_shardings=rep)(x)
            return np.asarray(x)

        return jax.tree_util.tree_map(one, tree)
