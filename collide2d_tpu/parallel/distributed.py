"""Multi-host (multi-process) deployment helpers.

The reference is single-GPU/single-process (SURVEY.md §2 checklist —
no NCCL/MPI anywhere). This framework's single-host multi-chip story is
`sharding.make_mesh` over ICI; this module is the DCN story for pods
with more than one host. Two patterns, in order of preference for this
embarrassingly-parallel workload:

1. **Batch partitioning (no collectives, recommended).** Dataset batches
   are independent: batch ``i``'s PRNG key is ``fold_in(master, i)`` and
   its file is ``{i}.npy`` (data/pipeline.py), so processes can generate
   DISJOINT batch ranges with zero communication and byte-identical
   results to a single-host run. `process_batch_range` computes each
   process's slice; point every process at a shared filesystem (or
   distinct dirs + concatenate).

2. **Global mesh over DCN.** After `initialize_multihost()`,
   `global_mesh` builds a (config, sample) mesh over every process's
   devices with the ``config`` axis spanning hosts (embarrassingly
   parallel — the only cross-host traffic is the done-count psum) and
   the ``sample`` axis constrained within one host's ICI domain, where
   its per-round psum belongs (a sample-axis psum over DCN would
   serialize every round on cross-host latency).

Untested on real multi-host hardware in this image (single-host); the
mesh path reuses the exact code paths proven on the 8-device CPU mesh
(tests/test_sharding.py), and pattern 1 is pure bookkeeping.
"""

from __future__ import annotations

import jax

from collide2d_tpu.parallel.sharding import Mesh, make_mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """`jax.distributed.initialize` with pass-through arguments.

    Call BEFORE any other jax use on every process of the pod. On cloud
    TPU pods the arguments are auto-detected from the environment and
    may be omitted.
    """
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(sample_axis: int | None = None, devices=None) -> Mesh:
    """A (config, sample) mesh over ALL processes' devices.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (n / s, s) with ``s`` dividing the per-process device count keeps
    every sample-axis group inside one host's ICI domain while the
    config axis spans hosts over DCN.
    """
    devices = list(devices) if devices is not None else jax.devices()
    s = sample_axis or 1
    # per-process count derived from the device list itself (robust in
    # environments where multiple backends coexist, e.g. the test
    # harness's CPU mesh alongside a TPU plugin)
    local = sum(1 for d in devices if d.process_index == devices[0].process_index)
    if s > local or local % s:
        raise ValueError(
            f"sample_axis={s} must divide the per-process device count "
            f"{local}: the per-round sample psum must stay within one "
            "host's ICI domain (over DCN it would serialize every round)"
        )
    return make_mesh(devices, sample_axis=s)


def process_batch_range(
    num_batches: int,
    start_batch_count: int = 0,
    process_id: int | None = None,
    num_processes: int | None = None,
) -> range:
    """This process's contiguous slice of the global batch indices.

    Zero-communication multi-host generation: run the SAME
    `GenerateConfig` on every process but with ``num_batches`` /
    ``start_batch_count`` taken from this range — batch keys are
    fold_in(master, batch_index), so the union of outputs is
    byte-identical to a single-process run over all batches.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if not 0 <= pid < n:
        raise ValueError(f"process_id {pid} out of range for {n} processes")
    per = num_batches // n
    extra = num_batches % n
    lo = start_batch_count + pid * per + min(pid, extra)
    hi = lo + per + (1 if pid < extra else 0)
    return range(lo, hi)
