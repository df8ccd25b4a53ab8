"""Cluster launch helpers.

The TPU-native replacement for the reference's SLURM/submitit launcher and
NCCL env bootstrap (dinov2/run/submit.py:92-119,
dinov2/distributed/__init__.py:152-237): detect the cluster environment
(explicit JAX coordinator vars, SLURM, or TPU pod metadata) and initialize
``jax.distributed`` accordingly. On TPU pods jax discovers topology itself;
on CPU/SLURM fleets the coordinator is derived from the SLURM node list.
"""

from __future__ import annotations

import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_PORT = 8476


def slurm_env() -> Optional[dict]:
    if "SLURM_JOB_ID" not in os.environ:
        return None
    try:
        nodelist = os.environ["SLURM_JOB_NODELIST"]
        first = subprocess.check_output(
            ["scontrol", "show", "hostnames", nodelist], text=True
        ).splitlines()[0]
        return {
            "coordinator_address": f"{first}:{DEFAULT_PORT}",
            "num_processes": int(os.environ["SLURM_NTASKS"]),
            "process_id": int(os.environ["SLURM_PROCID"]),
        }
    except Exception as e:
        logger.warning("SLURM detected but env parse failed: %s", e)
        return None


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from explicit args, env, or SLURM.

    Returns True if a multi-process runtime was initialized.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        s = slurm_env()
        if s is not None:
            coordinator_address = s["coordinator_address"]
            if num_processes is None:
                num_processes = s["num_processes"]
            if process_id is None:  # NB: rank 0 is falsy — test for None
                process_id = s["process_id"]
    if coordinator_address is None:
        # TPU pods: jax.distributed.initialize() discovers everything itself
        # when run under the TPU runtime with multiple workers. Single-host
        # environments that merely look pod-like (tunneled chips) fail the
        # discovery — treat that as single-process.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            try:
                jax.distributed.initialize()
                return True
            except Exception as e:
                logger.info("single-process run (pod discovery failed: %s)", e)
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d via %s",
        jax.process_index(), jax.process_count(), coordinator_address,
    )
    return True
