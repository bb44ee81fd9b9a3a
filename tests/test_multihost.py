"""Multi-host story, EXECUTED: two real OS processes generate disjoint
batch slices whose union is byte-identical to a single-process run.

Round-2 review: `parallel/distributed.py`'s claim was prose + unit tests
of the partition math only. Here the claim runs: each subprocess is an
independent Python/JAX process (its own PRNG, compile cache, device)
labeling its `process_batch_range` slice into a SHARED output directory,
exactly the pattern the module docstring prescribes for pods. Batch keys
are fold_in(master, batch_index), so the union must equal the
single-process artifact bit for bit.

A true 2-process `jax.distributed` global mesh cannot run in this image
(the CPU backend here does not aggregate devices across processes —
process_count() stays 1 after a successful coordination handshake), so
the DCN-mesh half remains covered by the 8-device single-process mesh
tests (test_sharding.py); `initialize_multihost`'s handshake itself is
smoke-tested below.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from collide2d_tpu.data.pipeline import GenerateConfig, generate_dataset
from collide2d_tpu.mc.estimator import AdaptiveConfig

FAST = dict(
    max_samples=4000, initial_batch=1000, initial_phase_samples=2000,
    later_batch=2000, bin_accuracy=(0.02, 0.02, 0.05), min_active=64,
)

_WORKER = r"""
import os, sys
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")  # never touch the axon tunnel
jax.config.update("jax_default_device", jax.devices("cpu")[0])
from collide2d_tpu.parallel.distributed import process_batch_range
from collide2d_tpu.data.pipeline import GenerateConfig, generate_dataset
from collide2d_tpu.mc.estimator import AdaptiveConfig

pid, nproc, num_batches, data_dir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
fast = AdaptiveConfig(
    max_samples=4000, initial_batch=1000, initial_phase_samples=2000,
    later_batch=2000, bin_accuracy=(0.02, 0.02, 0.05), min_active=64,
)
r = process_batch_range(num_batches, 0, process_id=pid, num_processes=nproc)
generate_dataset(GenerateConfig(
    data_dir=data_dir, num_batches=len(r), batch_size=64,
    start_batch_count=r.start, num_poses=8, num_variances=8, seed=7,
    verbose=False, adaptive=fast, max_samples=4000,
))
"""


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


def test_two_process_generate_union_is_byte_identical(tmp_path):
    num_batches = 3  # odd on purpose: uneven 2/1 split across processes
    shared = tmp_path / "shared"
    shared.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER,
             str(pid), "2", str(num_batches), str(shared)],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    # single-process reference over ALL batches, in this process
    ref = tmp_path / "ref"
    generate_dataset(GenerateConfig(
        data_dir=str(ref), num_batches=num_batches, batch_size=64,
        num_poses=8, num_variances=8, seed=7, verbose=False,
        adaptive=AdaptiveConfig(**FAST), max_samples=4000,
    ))
    for i in range(num_batches):
        np.testing.assert_array_equal(
            np.load(shared / f"{i}.npy"), np.load(ref / f"{i}.npy"),
            err_msg=f"batch {i} differs from the single-process run",
        )
    # both processes sampled identical tables into the shared dir
    np.testing.assert_array_equal(
        np.load(shared / "poses.npy"), np.load(ref / "poses.npy")
    )
    np.testing.assert_array_equal(
        np.load(shared / "variances.npy"), np.load(ref / "variances.npy")
    )


def test_initialize_multihost_handshake():
    # Coordination-service smoke: two processes complete
    # jax.distributed.initialize against one local coordinator and exit
    # cleanly. (Device aggregation across processes is not available on
    # this image's CPU backend — see module docstring.)
    script = r"""
import os, sys
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
from collide2d_tpu.parallel.distributed import initialize_multihost
initialize_multihost("localhost:12477", 2, int(sys.argv[1]))
import jax
jax.config.update("jax_platforms", "cpu")  # never touch the axon tunnel
jax.devices()
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            assert p.returncode == 0, err.decode()[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
