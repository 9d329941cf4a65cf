"""T3 leader election: exclusive ownership with fencing epochs.

The reference elects the map-updater by Pulsar EXCLUSIVE subscription
(`game-code/pulsar.go:198-227`): the first client to subscribe the
map topic becomes the updater, later subscribers fail and fall back
to follower behavior, and broker-side fencing guarantees a zombie
ex-leader cannot write after a takeover.

Filesystem analog with the same three guarantees:

1. **Mutual exclusion** — acquisition is a single atomic
   ``O_CREAT|O_EXCL`` create of the lock file: exactly one contender
   wins, no TOCTOU window.
2. **Liveness** — the leader heartbeats; a lease whose heartbeat is
   older than ``ttl_s`` is STALE and may be taken over. Takeover
   races serialize on ``os.rename`` (exactly one renamer of the same
   inode succeeds), then the winner re-runs the atomic create.
3. **Fencing** — every leadership generation gets a monotone
   ``epoch`` (Pulsar's producer-epoch analog). Leader-only writes
   call ``fence_check(epoch)`` first, so a paused-and-resumed
   ex-leader (GC pause, partition) fails closed instead of
   corrupting state.

The lock file is IMMUTABLE for its generation — heartbeats go to an
epoch-suffixed sidecar, so a zombie's late heartbeat can never
clobber a successor's lock (it lands in a dead ``.hb.<old>`` file).

Single-host by construction (POSIX atomic create/rename). On a
cluster, keep the PROTOCOL and swap the primitive: HDFS/S3A create
with ``overwrite=false``, a Delta/Iceberg commit, or a coordination
service — the epoch/fence/TTL logic is the portable part.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class StaleLeaderError(RuntimeError):
    """A fenced (superseded) leader attempted a leader-only action."""


class LeaderLease:
    """Exclusive lease with TTL takeover and fencing epochs."""

    def __init__(self, path: str, ttl_s: float = 10.0) -> None:
        self.path = path
        self.ttl_s = ttl_s

    @property
    def _lock(self) -> str:
        return self.path + ".lock"

    @property
    def _gen(self) -> str:
        return self.path + ".gen"

    def _hb_file(self, epoch: int) -> str:
        return self.path + f".hb.{epoch}"

    def _read_lock(self) -> dict | None:
        try:
            with open(self._lock) as f:
                return json.loads(f.read())
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _read_gen(self) -> int:
        try:
            with open(self._gen) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _last_beat(self, held: dict) -> float:
        try:
            with open(self._hb_file(held["epoch"])) as f:
                return float(f.read().strip())
        except (FileNotFoundError, ValueError):
            return float(held.get("born", 0.0))

    def current(self) -> dict | None:
        """{owner, epoch, born} of the live leader, or None."""
        return self._read_lock()

    def try_acquire(self, owner: str) -> int | None:
        """Attempt to become leader. Returns the fencing epoch on
        success, None while another leader holds a FRESH lease (the
        reference's 'subscription already has other consumers'
        branch). A stale lease is taken over."""
        held = self._read_lock()
        if held is not None:
            if time.monotonic() - self._last_beat(held) <= self.ttl_s:
                return None
            # stale: serialize the takeover — exactly one renamer wins
            try:
                os.rename(self._lock, self._lock + f".dead.{uuid.uuid4().hex[:8]}")
            except FileNotFoundError:
                pass  # another contender already renamed (or released)
        try:
            fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None  # lost the post-takeover (or fresh) race
        epoch = self._read_gen() + 1
        try:
            os.write(
                fd,
                json.dumps(
                    {"owner": owner, "epoch": epoch, "born": time.monotonic()}
                ).encode(),
            )
        finally:
            os.close(fd)
        # only the lock holder advances the generation counter
        with open(self._gen, "w") as f:
            f.write(str(epoch))
        return epoch

    def fence_check(self, epoch: int) -> None:
        """Guard for every leader-only write: raises if this epoch has
        been superseded (or the lease vanished)."""
        held = self._read_lock()
        if held is None or held["epoch"] != epoch:
            raise StaleLeaderError(
                f"epoch {epoch} fenced (current: {held and held['epoch']})"
            )

    def heartbeat(self, epoch: int) -> None:
        """Refresh the lease. Fails closed if fenced; a zombie's late
        heartbeat writes only its own dead .hb.<epoch> sidecar and can
        never touch a successor's lock or heartbeat."""
        self.fence_check(epoch)
        tmp = self._hb_file(epoch) + ".tmp"
        with open(tmp, "w") as f:
            f.write(repr(time.monotonic()))
        os.replace(tmp, self._hb_file(epoch))

    def release(self, epoch: int) -> None:
        """Step down (clean shutdown). No-op if already superseded —
        a fenced ex-leader must not unlink its successor's lock.

        Known window: the read-check-unlink below is not CAS, so a
        ZOMBIE releasing in the same instant as a takeover could
        remove the successor's fresh lock. Plain POSIX cannot
        compare-and-delete; coordination services can. The failure is
        a spurious leadership VACANCY (next tick re-elects), never a
        state write by the wrong leader — those are stopped by
        fence_check's epoch guard."""
        held = self._read_lock()
        if held is not None and held["epoch"] == epoch:
            try:
                os.unlink(self._lock)
            except FileNotFoundError:
                pass
        try:
            os.unlink(self._hb_file(epoch))
        except FileNotFoundError:
            pass

    def run_if_leader(self, owner: str, fn):
        """T2+T3 composition: run a periodic leader-only job (the
        reference's once-a-minute obstacle refresh) iff this contender
        holds or wins the lease; followers return None."""
        epoch = self.try_acquire(owner)
        if epoch is None:
            return None
        try:
            self.fence_check(epoch)
            return fn(epoch)
        finally:
            self.release(epoch)
