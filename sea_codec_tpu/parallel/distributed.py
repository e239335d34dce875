"""Multi-host (multi-slice) initialization helpers.

The codec's distributed story is purely data parallel (SURVEY.md section 5):
files shard across hosts over DCN, chunks shard across a host's local devices
over ICI, and no collective ever touches the compute path (each chunk/file is
independent; results are assembled host-side). These helpers wrap
``jax.distributed`` so the corpus pipeline runs unchanged on a multi-host
deployment; on a single host they are no-ops.

Exercised for real by ``tests/test_multihost.py``: a 2-process JAX cluster
(gloo CPU collectives, 4 virtual devices per process) initializes through
``initialize()``, runs a cross-process collective, and encodes a file-sharded
corpus byte-identically to the single-process pipeline. The same
`Mesh`/`NamedSharding` layout is validated single-process on a virtual
8-device mesh by `tests/test_parallel.py`.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-host (no-op otherwise).

    With no arguments, relies on the cluster environment (TPU pod metadata /
    GKE env vars) the way ``jax.distributed.initialize`` documents.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if coordinator_address is not None:
            # an explicit coordinator was requested: silently falling back
            # to single-process would re-encode other hosts' file shards
            raise
        # already initialized or single-process context
        pass


def shard_files_across_hosts(n_files: int) -> range:
    """The slice of corpus file indices this host is responsible for.

    Pure data parallelism over DCN: host i takes files [i*k, (i+1)*k).
    """
    procs = jax.process_count()
    me = jax.process_index()
    per = -(-n_files // procs)
    return range(me * per, min((me + 1) * per, n_files))
