"""Multi-host driver: shard blocks across processes, gather bitstreams in
original order.

The reference is strictly single-process (SURVEY.md §2: no sockets, no MPI,
no threads); this module is the pod-scale capability from BASELINE config
#5: every process encodes a contiguous span of blocks with its local
devices, per-block payloads are exchanged with a fixed-size
``process_allgather`` (padded to the per-round max and trimmed by length),
and host 0 reassembles the container in block order. Bitstreams are
host-count-invariant because block boundaries, model state resets, and the
per-block coder are independent of which host coded a block (property-tested
in tests/test_distributed.py with 1 vs 2 CPU processes).
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = ["distributed_init", "my_block_span", "allgather_blocks"]


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def my_block_span(n_blocks: int, process_id: int | None = None,
                  n_processes: int | None = None) -> tuple[int, int]:
    """Contiguous block span [start, end) owned by this process."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if n_processes is None else n_processes
    per = -(-n_blocks // n)
    start = min(pid * per, n_blocks)
    return start, min(start + per, n_blocks)


def allgather_blocks(payloads: list[bytes], n_blocks: int) -> list[bytes] | None:
    """Gather per-block payloads from all processes, ordered by block index.

    Each process passes its own span's payloads (in block order). Returns
    the full ordered list on every process (containers are assembled on
    host 0 by convention). Fixed-shape collective: payloads are padded to
    the global max length for one allgather of bytes + one of lengths.
    """
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    if n_proc == 1:
        assert len(payloads) == n_blocks
        return payloads
    per = -(-n_blocks // n_proc)
    local_len = np.zeros((per,), dtype=np.int64)
    for i, p in enumerate(payloads):
        local_len[i] = len(p)
    # round 1: lengths (also learns the global max for fixed-shape round 2)
    all_len = np.asarray(multihost_utils.process_allgather(local_len))  # [P, per]
    maxlen = int(all_len.max())
    local_buf = np.zeros((per, max(1, maxlen)), dtype=np.uint8)
    for i, p in enumerate(payloads):
        local_buf[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    all_buf = np.asarray(multihost_utils.process_allgather(local_buf))  # [P, per, max]
    out: list[bytes] = []
    for blk in range(n_blocks):
        pid, off = divmod(blk, per)
        out.append(all_buf[pid, off, : all_len[pid, off]].tobytes())
    return out
