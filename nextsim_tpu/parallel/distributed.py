"""Multi-host initialisation — the Environment/MPI_Init analog.

The reference boots through boost::mpi (reference: core/src/environment.cpp:
23-60: MPI_Init + config parse + data-dir resolution). The jax equivalent
for a multi-host pod slice is `jax.distributed.initialize()`, after which
`jax.devices()` spans the slice and the GSPMD-sharded step runs unchanged
— device meshes from parallel/sharding.py simply see more devices.

Call `init_distributed()` once at program start (the CLI does this when the
standard coordinator env vars are present). On a single host it is a no-op.
"""

from __future__ import annotations

import os


def init_distributed(coordinator_address=None, num_processes=None, process_id=None) -> bool:
    """Initialise jax.distributed when running multi-host. Returns True when
    a multi-process runtime was initialised."""
    import jax

    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS") or env.get(
            "COORDINATOR_ADDRESS"
        )
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])

    # TPU pods auto-detect without explicit args; only initialise when either
    # the coordinator is named or we're clearly on a multi-host TPU runtime.
    on_tpu_pod = bool(env.get("TPU_WORKER_HOSTNAMES", "")) and "," in env.get(
        "TPU_WORKER_HOSTNAMES", ""
    )
    if coordinator_address is None and not on_tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_count() > 1
    except Exception:
        return False
