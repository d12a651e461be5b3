"""Two-PROCESS blockwise smoke over one shared-FS lease queue (VERDICT r4
missing #5 / SURVEY §5.8): the reference's seam is daisy's TCP server
feeding N worker processes (reference ``predict.py:154-170``); here two
actual OS processes each run ``jax.distributed.initialize`` over localhost
(the DCN control plane) and a ``BlockwiseRunner`` in queue mode against the
same ``queue_dir``, writing disjoint chunk-aligned blocks of one output
zarr. Asserts: both workers exit 0, coverage is complete and exact, every
block was claimed by exactly one worker, and both processes did real work.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io import open_ds, prepare_ds

WORKER = r"""
import json, os, sys
import numpy as np
import jax

coord, pid, qdir, path = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()

from raygun_tpu.distributed import BlockwiseRunner
from raygun_tpu.io import open_ds

fn = jax.jit(lambda x: x + 1.0)
runner = BlockwiseRunner(
    source=open_ds(path, "raw"),
    outputs={"out": open_ds(path, "out", mode="a")},
    fn=lambda x: {"out": np.asarray(fn(x))[:, 2:-2, 2:-2, 2:-2, 0]},
    input_shape=(8, 8, 8),
    output_shape=(4, 4, 4),
    queue_dir=qdir,
)
stats = runner.run(progress=False)
print(json.dumps({"pid": pid, "blocks": stats["blocks"]}))
"""


@pytest.mark.slow
def test_two_process_queue_coverage(tmp_path):
    path = str(tmp_path / "mp.zarr")
    vx = Coordinate(10, 10, 10)
    roi = Roi((0, 0, 0), (240, 240, 240))
    src = prepare_ds(path, "raw", roi, vx, np.float32, delete=True)
    rng = np.random.default_rng(0)
    data = rng.random((24, 24, 24)).astype(np.float32)
    src.write(roi, data)
    write_roi = roi.grow(Coordinate(-20, -20, -20), Coordinate(-20, -20, -20))
    # chunk-aligned output (write_size == block write size) so two
    # processes never touch the same zarr chunk
    prepare_ds(path, "out", write_roi, vx, np.float32,
               write_size=(40, 40, 40), delete=True)

    qdir = str(tmp_path / "queue")
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never let a child touch the TPU
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single local CPU device per process
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), coord, str(i), qdir, path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # complete, exact coverage: out == raw + 1 on the write ROI
    got = open_ds(path, "out").read()
    np.testing.assert_array_equal(got, data[2:-2, 2:-2, 2:-2] + 1.0)

    # every block claimed exactly once; both processes did real work
    n_blocks = 5 ** 3
    leases = sorted(f for f in os.listdir(qdir) if f.endswith(".lease"))
    dones = sorted(f for f in os.listdir(qdir) if f.endswith(".done"))
    assert len(leases) == n_blocks and len(dones) == n_blocks
    owners = {
        f: open(os.path.join(qdir, f)).read() for f in leases
    }
    assert len(set(owners.values())) == 2, "one worker claimed everything"
    blocks_by_pid = {o["pid"]: o["blocks"] for o in outs}
    assert blocks_by_pid[0] > 0 and blocks_by_pid[1] > 0
    assert blocks_by_pid[0] + blocks_by_pid[1] == n_blocks


def test_distributed_init_hook_single_process(monkeypatch):
    """The ``jax.distributed`` init hook (cli/train.py) is a no-op without
    cluster env and attempts initialization when JAX_COORDINATOR_ADDRESS is
    set (single-process form of SURVEY §5.8)."""
    from raygun_tpu.cli.train import _maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    _maybe_init_distributed()  # no env: must not raise or initialize

    called = {}
    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **k: called.setdefault("yes", True),
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1")
    _maybe_init_distributed()
    assert called.get("yes"), "hook ignored JAX_COORDINATOR_ADDRESS"
