"""Multi-host bootstrap: the reference's init_distributed_mode equivalent.

utils.py:262-312 probes OMPI/SLURM/env:// rendezvous and calls
init_process_group(nccl). Under single-controller JAX SPMD the equivalent is
jax.distributed.initialize() per host plus print-gating on non-zero hosts;
collectives themselves are emitted by XLA from shardings (SURVEY.md §5.8),
so there is no user-level backend to select.
"""

from __future__ import annotations

import builtins
import os
from typing import Optional


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    suppress_output: bool = True,
) -> int:
    """Initialize multi-host JAX if a cluster environment is detected.

    Environment probing mirrors the reference (utils.py:263-297): explicit
    args beat JAX_COORDINATOR_ADDRESS / SLURM / OMPI variables; single-host
    runs are a no-op. Returns the process index.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
    if num_processes is None and "OMPI_COMM_WORLD_SIZE" in os.environ:
        num_processes = int(os.environ["OMPI_COMM_WORLD_SIZE"])
        process_id = int(os.environ.get("OMPI_COMM_WORLD_RANK", 0))

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )

    rank = jax.process_index()
    if suppress_output and rank != 0:
        setup_for_distributed(False)
    return rank


def setup_for_distributed(is_master: bool) -> None:
    """Print gating with a `force=True` escape hatch (utils.py:218-230)."""
    base_print = builtins.print

    def gated_print(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            base_print(*args, **kwargs)

    builtins.print = gated_print


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def save_on_master(fn, *args, **kwargs):
    """Run a save callable only on host 0 (utils.py:257-259)."""
    if is_main_process():
        return fn(*args, **kwargs)
    return None
