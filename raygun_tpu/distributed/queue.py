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

Cost model (matches daisy's server-side O(1) dispatch): claims are
O(1) amortized, not O(N) per claim.  Each worker walks the block range
ONCE with a private cursor, started at a worker-id-derived stripe offset
so concurrent workers fan out over disjoint regions instead of racing at
block 0; blocks observed ``.done`` are cached and never stat'ed again;
the stale-lease sweep (the only remaining O(N) scan) runs only once the
fresh pass is exhausted — i.e. near the end of the volume, when the scan
is also the completeness check the caller needs anyway.
"""

from __future__ import annotations

import os
import time
import uuid
import zlib
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
        # stripe start: spreads concurrent workers across the range so
        # fresh-pass claim attempts rarely collide
        self._start = zlib.crc32(self.worker_id.encode()) % max(self.n, 1)
        self._fresh = 0  # blocks consumed from this worker's fresh pass
        self._known_done = bytearray(self.n)  # .done files never disappear
        self._mine: set = set()  # claims held by THIS instance

    def _lease(self, i: int) -> str:
        return os.path.join(self.dir, f"block_{i}.lease")

    def _done(self, i: int) -> str:
        return os.path.join(self.dir, f"block_{i}.done")

    def _is_done(self, i: int) -> bool:
        if self._known_done[i]:
            return True
        if os.path.exists(self._done(i)):
            self._known_done[i] = 1
            return True
        return False

    def _try_claim(self, i: int) -> bool:
        try:
            fd = os.open(self._lease(i), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(self.worker_id)
        self._mine.add(i)
        return True

    def _try_reclaim_stale(self, i: int) -> bool:
        if i in self._mine:
            # never steal our own in-progress lease — staleness means the
            # HOLDER died, and this process is demonstrably alive
            return False
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
        # fresh pass: each block is visited AT MOST ONCE over this worker's
        # lifetime — claims are O(1) amortized instead of O(N) each
        while self._fresh < self.n:
            i = (self._start + self._fresh) % self.n
            self._fresh += 1
            if self._is_done(i):
                continue
            if self._try_claim(i):
                return i
        # fresh pass exhausted: every undone block is leased by someone.
        # Sweep for stale leases of dead workers (failed-shard reissue).
        for off in range(self.n):
            i = (self._start + off) % self.n
            if self._is_done(i):
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
        self._known_done[i] = 1
        self._mine.discard(i)

    def remaining(self) -> int:
        # done-ness is monotone, so blocks already observed done skip the
        # filesystem entirely; only still-undone blocks are stat'ed
        return sum(1 for i in range(self.n) if not self._is_done(i))
