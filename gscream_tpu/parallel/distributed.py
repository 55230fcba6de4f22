"""Multi-host bring-up (SURVEY.md §7 step 7, BASELINE gate 5).

The reference is single-GPU; scaling past one host on TPU means starting
one process per host and letting XLA collectives ride ICI/DCN.  This
module is the thin, testable wrapper around ``jax.distributed.initialize``:

* every process calls :func:`init_distributed` **before** any other jax
  call (it registers the global device view);
* afterwards ``jax.devices()`` is the *global* device list, so
  :func:`gscream_tpu.parallel.mesh.make_mesh` / ``auto_mesh`` and the
  ``shard_map`` training step work unchanged — the data/tiles mesh simply
  spans hosts (keep ``tiles`` within a host so the per-view halo exchange
  stays on ICI; put ``data`` across hosts, where only the per-step
  gradient psum crosses DCN);
* `tests/test_multiprocess.py` exercises the real thing: two local
  processes, 4 virtual CPU devices each, one global psum and one sharded
  train step over the 8-device mesh.

Driver wiring: ``train.py --dist_coordinator HOST:PORT --dist_nprocs N
--dist_pid I`` (all three must be given together; single-process runs skip
initialization entirely).
"""
from __future__ import annotations

import jax


def init_distributed(coordinator: str = "", num_processes: int = 1,
                     process_id: int = 0,
                     local_device_ids=None) -> bool:
    """Initialize the multi-process runtime.  Returns True if distributed.

    ``coordinator`` is ``host:port`` of process 0.  A no-op (returns
    False) when ``num_processes <= 1`` or no coordinator is given, so
    single-host paths never pay for it.
    """
    if num_processes <= 1 or not coordinator:
        return False
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs)
    return True


def process_info():
    """(process_index, process_count, n_local, n_global) after init."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())
