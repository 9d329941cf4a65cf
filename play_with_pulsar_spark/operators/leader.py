"""T3 leader election: exclusive ownership with fencing epochs.

The reference elects the map-updater by Pulsar EXCLUSIVE subscription
(`game-code/pulsar.go:198-227`): the first client to subscribe the
map topic becomes the updater, later subscribers fail and fall back
to follower behavior, and broker-side fencing guarantees a zombie
ex-leader cannot write after a takeover.

Filesystem analog. The guarantee HIERARCHY matters — state safety
comes from fencing, not from the lock:

1. **Unique fencing epochs (the hard guarantee)** — an epoch is
   minted by ``O_CREAT|O_EXCL`` of a durable ``gen.<n>`` marker
   BEFORE the lock is published, so no two leaderships can ever
   share an epoch, even across crashes mid-acquire or duplicate
   lock winners. Every leader-only write calls
   ``fence_check(epoch)`` first and fails closed.
2. **Mutual exclusion (fast path)** — acquisition is an atomic
   ``O_CREAT|O_EXCL`` create of the lock file, then a re-read
   verify. Plain POSIX rename is path-based, so a takeover that
   races a fresh acquisition can transiently leave two processes
   believing they won; the verify shrinks that window and the epoch
   guard (1) keeps state safe through it — same posture as
   lease-based leaders on real coordination services.
3. **Liveness** — the leader heartbeats WALL-CLOCK time
   (``time.time``: comparable across processes and reboots —
   ``time.monotonic`` is neither); a lease silent for ``ttl_s`` is
   STALE and may be taken over. Takeovers serialize on ``os.rename``
   (exactly one renamer of an inode succeeds). Because the rename is
   path-based, a rival takeover can install a FRESH lock between a
   contender's staleness check and its rename — the contender would
   then depose a live, heartbeating leader. ``try_acquire`` re-reads
   the lock immediately before renaming AND verifies the renamed
   file's epoch afterwards, restoring a swept-up fresh lock via
   ``os.link`` (which never overwrites). The microsecond residue of
   the race costs at most one spurious re-election; state safety is
   (1)'s job either way.

The lock file is IMMUTABLE for its generation — heartbeats go to an
epoch-suffixed sidecar, so a zombie's late heartbeat can never
clobber a successor's lock. Each successful acquisition reaps dead
locks, superseded heartbeat sidecars, and old generation markers
(always keeping the top ones, so a concurrent minter can never
observe a lowered maximum and reuse an epoch).

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

    # generation markers kept behind the newest one (never reap the
    # top ones: a concurrent minter reads max+1, and lowering the
    # visible max could mint a duplicate epoch)
    _GEN_KEEP = 5

    def __init__(self, path: str, ttl_s: float = 10.0) -> None:
        self.path = path
        self.ttl_s = ttl_s

    @property
    def _lock(self) -> str:
        return self.path + ".lock"

    def _gen_marker(self, n: int) -> str:
        return self.path + f".gen.{n}"

    def _hb_file(self, epoch: int) -> str:
        return self.path + f".hb.{epoch}"

    def _read_lock(self) -> dict | None:
        try:
            with open(self._lock) as f:
                return json.loads(f.read())
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _sibling_files(self, suffix_prefix: str) -> list[str]:
        base = os.path.basename(self.path) + suffix_prefix
        parent = os.path.dirname(self.path) or "."
        if not os.path.isdir(parent):
            return []
        return [
            os.path.join(parent, d)
            for d in os.listdir(parent)
            if d.startswith(base)
        ]

    def _max_gen(self) -> int:
        best = 0
        for p in self._sibling_files(".gen."):
            try:
                best = max(best, int(p.rsplit(".gen.", 1)[1]))
            except ValueError:
                continue
        return best

    def _mint_epoch(self) -> int:
        """Durably claim a NEVER-REUSED epoch: O_EXCL-create the
        ``gen.<n>`` marker. The marker exists on disk before any lock
        carrying the epoch is published, so a crash mid-acquire (or a
        duplicate lock winner) can only orphan a number, never let
        two leaderships share one."""
        n = self._max_gen() + 1
        while True:
            try:
                fd = os.open(
                    self._gen_marker(n), os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.close(fd)
                return n
            except FileExistsError:
                n += 1

    def _last_beat(self, held: dict) -> float:
        try:
            with open(self._hb_file(held["epoch"])) as f:
                return float(f.read().strip())
        except (FileNotFoundError, ValueError):
            return float(held.get("born", 0.0))

    def _reap(self, my_epoch: int) -> None:
        """Remove dead renamed locks, superseded heartbeat sidecars,
        and generation markers well behind the tip."""
        for p in self._sibling_files(".lock.dead."):
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass
        for p in self._sibling_files(".hb."):
            try:
                if int(p.rsplit(".hb.", 1)[1]) < my_epoch:
                    os.unlink(p)
            except (ValueError, FileNotFoundError):
                pass
        for p in self._sibling_files(".gen."):
            try:
                if int(p.rsplit(".gen.", 1)[1]) <= my_epoch - self._GEN_KEEP:
                    os.unlink(p)
            except (ValueError, FileNotFoundError):
                pass

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
            if time.time() - self._last_beat(held) <= self.ttl_s:
                return None
            # Stale: serialize the takeover — one renamer wins. The
            # rename is PATH-based, so between observing staleness and
            # renaming, a rival takeover can install a FRESH lock at
            # the same path; blindly renaming would depose a live,
            # heartbeating leader (state safety would still hold via
            # fence_check failing closed, but liveness wouldn't).
            # Shrink the window: re-read immediately before the
            # rename, and VERIFY afterwards that the file we renamed
            # away is the stale lock we measured — if a fresh lock got
            # swept up, restore it (os.link refuses to overwrite, so a
            # restore never clobbers an even-newer winner).
            recheck = self._read_lock()
            if recheck is None or recheck.get("epoch") != held.get("epoch"):
                return None  # lock changed hands in the window
            dead = self._lock + f".dead.{uuid.uuid4().hex[:8]}"
            try:
                os.rename(self._lock, dead)
            except FileNotFoundError:
                pass  # another contender already renamed (or released)
            else:
                victim = None
                try:
                    with open(dead) as f:
                        victim = json.loads(f.read())
                except (OSError, ValueError):
                    pass
                if victim is not None and victim.get("epoch") != held.get("epoch"):
                    # renamed a FRESH rival lock — put it back and yield
                    try:
                        os.link(dead, self._lock)
                    except FileExistsError:
                        pass  # an even newer lock exists; rival refetches
                    except OSError:
                        pass
                    try:
                        os.unlink(dead)
                    except FileNotFoundError:
                        pass
                    return None
        epoch = self._mint_epoch()  # durable + unique BEFORE publication
        try:
            fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None  # lost the race; the minted marker is orphaned
        me = {"owner": owner, "epoch": epoch, "born": time.time()}
        try:
            os.write(fd, json.dumps(me).encode())
        finally:
            os.close(fd)
        # verify: a racing takeover may have renamed our fresh lock
        # away in the path-based window — if what's live isn't ours,
        # report defeat (our epoch stays burned, fencing stays sound)
        live = self._read_lock()
        if live is None or live["epoch"] != epoch or live["owner"] != owner:
            return None
        self._reap(epoch)
        return epoch

    def fence_check(self, epoch: int) -> None:
        """Guard for every leader-only write: raises if this epoch has
        been superseded (or the lease vanished). Epochs are globally
        unique (durable O_EXCL minting), so a zombie can never collide
        with a successor's epoch."""
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
            f.write(repr(time.time()))
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
        fence_check's unique-epoch guard."""
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
