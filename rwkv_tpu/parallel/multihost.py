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
    **kwargs,
) -> None:
    """Bootstrap jax.distributed. On Cloud TPU the arguments auto-detect;
    pass them explicitly for other launchers.

    Failure policy: with EXPLICIT coordinator args a failed bootstrap
    raises — a pod whose coordinator is misconfigured must not silently
    degrade to single-process serving (each host would happily serve its
    own shard-less copy). Auto-detect mode still no-ops gracefully so
    single-host runs need no special-casing."""
    if jax.distributed.is_initialized():
        return
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,  # e.g. initialization_timeout (seconds)
        )
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise RuntimeError(
                f"jax.distributed bootstrap failed with explicit "
                f"coordinator args (coordinator={coordinator_address}, "
                f"num_processes={num_processes}, process_id={process_id}); "
                f"refusing to silently fall back to single-process mode"
            ) from e
        # auto-detect on a single host (tests, dev): no coordinator is fine


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
