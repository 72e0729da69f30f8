"""Process-environment discovery + multi-host initialization.

Parity with the reference's rank discovery (reference: utils/config.py:12-24
reads RANK / LOCAL_RANK / SLURM_PROCID / JSM_NAMESPACE_RANK and maps
rank -> cuda device). On TPU the analogue is jax.distributed initialization:
every host runs the same program, jax.devices() spans the pod slice, and the
dataloader's (world_size, rank) seam keys off process_index.
"""

from __future__ import annotations

import os

_RANK_KEYS = ("RANK", "LOCAL_RANK", "SLURM_PROCID", "JSM_NAMESPACE_RANK")
_WORLD_KEYS = ("WORLD_SIZE", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE")


def get_rank() -> int:
    """Env-var process rank, 0 when unset (reference utils/config.py:12-20).
    After jax.distributed.initialize, prefer jax.process_index()."""
    try:
        import jax
        if jax.process_count() > 1:
            return jax.process_index()
    except Exception:
        pass
    for k in _RANK_KEYS:
        v = os.environ.get(k)
        if v is not None:
            try:
                return int(v)
            except ValueError:
                pass
    return 0


def get_world_size() -> int:
    try:
        import jax
        if jax.process_count() > 1:
            return jax.process_count()
    except Exception:
        pass
    for k in _WORLD_KEYS:
        v = os.environ.get(k)
        if v is not None:
            try:
                return int(v)
            except ValueError:
                pass
    return 1


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX when env/args indicate a multi-process run;
    no-op otherwise. Safe to call unconditionally at driver start."""
    import jax
    if num_processes is None:
        num_processes = get_world_size()
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
