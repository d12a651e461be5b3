"""Shared-filesystem block lease queue: the daisy control plane, serverless.

The reference schedules inference blocks through daisy's TCP server
(reference ``predict.py:154-170``, ``worker.py:94-97`` — block lease +
completion messages). On a TPU pod the data plane is already the shared
filesystem (zarr chunks); this queue puts the control plane there too:

  * a worker CLAIMS block i by creating ``block_<i>.lease`` with O_EXCL —
    atomic on POSIX filesystems, so exactly one worker wins;
  * completion is ``block_<i>.done`` (leases are kept for debugging);
  * a lease older than ``lease_timeout`` with no ``.done`` is STALE — the
    worker died; any worker may reclaim it by atomically renaming the stale
    lease away (failed-shard reissue, SURVEY §5.3/§5.8 without a
    coordinator process, heartbeats, or TCP).

Workers need no rank assignment and can join/leave at any time — the
elastic property daisy's worker pool had, minus its server.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Optional

class FileClaimQueue:
    def __init__(
        self,
        queue_dir: str,
        n_blocks: int,
        lease_timeout: float = 600.0,
        worker_id: Optional[str] = None,
    ):
        self.dir = queue_dir
        self.n = int(n_blocks)
        self.lease_timeout = float(lease_timeout)
        self.worker_id = worker_id or uuid.uuid4().hex[:8]
        os.makedirs(queue_dir, exist_ok=True)

    def _lease(self, i: int) -> str:
        return os.path.join(self.dir, f"block_{i}.lease")

    def _done(self, i: int) -> str:
        return os.path.join(self.dir, f"block_{i}.done")

    def _try_claim(self, i: int) -> bool:
        try:
            fd = os.open(self._lease(i), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(self.worker_id)
        return True

    def _try_reclaim_stale(self, i: int) -> bool:
        lease = self._lease(i)
        try:
            age = time.time() - os.path.getmtime(lease)
        except OSError:
            return False
        if age < self.lease_timeout:
            return False
        # atomically steal the stale lease: rename wins exactly once
        stolen = lease + f".stale.{self.worker_id}"
        try:
            os.rename(lease, stolen)
        except OSError:
            return False
        return self._try_claim(i)

    def _sweep(self) -> Optional[int]:
        for i in range(self.n):
            if os.path.exists(self._done(i)):
                continue
            if self._try_claim(i):
                return i
        # second sweep: reclaim stale leases of dead workers
        for i in range(self.n):
            if os.path.exists(self._done(i)):
                continue
            if self._try_reclaim_stale(i):
                return i
        return None

    def next_block(
        self, wait: bool = True, poll_interval: float = 5.0
    ) -> Optional[int]:
        """Claim the next unprocessed block; None only when EVERY block is
        done. While undone blocks are leased by other workers, this waits
        (polling) rather than returning — if those workers die, their
        leases go stale and get reclaimed here; returning early would leave
        holes in the output volume (``wait=False`` restores the
        non-blocking behavior for tests/polling loops)."""
        while True:
            i = self._sweep()
            if i is not None:
                return i
            if self.remaining() == 0 or not wait:
                return None
            time.sleep(min(poll_interval, max(self.lease_timeout / 10, 0.05)))

    def mark_done(self, i: int) -> None:
        tmp = self._done(i) + f".{self.worker_id}"
        with open(tmp, "w") as f:
            f.write(self.worker_id)
        os.replace(tmp, self._done(i))

    def remaining(self) -> int:
        return sum(
            1 for i in range(self.n) if not os.path.exists(self._done(i))
        )
