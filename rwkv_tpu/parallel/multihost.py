"""Multi-host (pod / multi-slice) setup helpers.

Topology doctrine (jax-ml.github.io/scaling-book): tensor parallelism stays
inside a slice where collectives ride ICI; independent streams scale across
hosts over DCN as pure data parallelism (RWKV state is O(5·L·E) per stream —
no KV-cache growth — so stream migration between hosts is trivially cheap).

Usage on each host of a TPU pod slice:

    from rwkv_tpu.parallel.multihost import initialize, pod_mesh
    initialize()                      # jax.distributed auto-bootstrap
    mesh = pod_mesh(model="slice")    # TP within slice, DP across hosts
"""

from __future__ import annotations

from typing import Optional

import jax

from rwkv_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap jax.distributed. On Cloud TPU the arguments auto-detect;
    pass them explicitly for other launchers."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # single-process run (tests, single host without a coordinator)
        pass


def pod_mesh(model: int | str = "slice"):
    """('data','model') mesh over every device in the job.

    model="slice": the model axis spans one host's local devices (ICI only);
    the data axis spans hosts (DCN). model=<int>: explicit TP width.
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    tp = n_local if model == "slice" else int(model)
    if n_total % tp:
        raise ValueError(f"{n_total} devices not divisible by model={tp}")
    return make_mesh(model=tp, data=n_total // tp)
