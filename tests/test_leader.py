"""T3 leader election: mutual exclusion, clean handover, TTL
takeover, fencing of zombie ex-leaders (pulsar.go:198-227 analog)."""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from play_with_pulsar_spark.operators.leader import LeaderLease, StaleLeaderError


def test_exclusive_acquisition_and_handover(tmp_path):
    lease = LeaderLease(str(tmp_path / "map_updater"), ttl_s=30)
    e1 = lease.try_acquire("alice")
    assert e1 == 1
    # the reference's failed-Exclusive-subscribe branch
    assert lease.try_acquire("bob") is None
    lease.release(e1)
    e2 = lease.try_acquire("bob")
    assert e2 == 2  # epochs are monotone across generations
    assert lease.current()["owner"] == "bob"
    lease.release(e2)


def test_contention_exactly_one_winner(tmp_path):
    lease = LeaderLease(str(tmp_path / "lease"), ttl_s=30)
    with ThreadPoolExecutor(max_workers=16) as ex:
        wins = list(ex.map(lambda i: lease.try_acquire(f"c{i}"), range(16)))
    assert sum(1 for w in wins if w is not None) == 1


def test_stale_takeover_and_fencing(tmp_path):
    lease = LeaderLease(str(tmp_path / "lease"), ttl_s=0.2)
    e1 = lease.try_acquire("alice")
    assert e1 == 1
    lease.heartbeat(e1)
    time.sleep(0.3)  # alice goes silent past the TTL
    e2 = lease.try_acquire("bob")
    assert e2 == 2  # takeover
    # zombie alice is fenced out of every leader-only action
    with pytest.raises(StaleLeaderError):
        lease.fence_check(e1)
    with pytest.raises(StaleLeaderError):
        lease.heartbeat(e1)
    # and her release cannot unlink bob's lock
    lease.release(e1)
    assert lease.current()["owner"] == "bob"
    lease.fence_check(e2)  # bob unaffected
    lease.release(e2)


def test_heartbeat_keeps_lease_fresh(tmp_path):
    lease = LeaderLease(str(tmp_path / "lease"), ttl_s=0.4)
    e1 = lease.try_acquire("alice")
    for _ in range(4):
        time.sleep(0.15)
        lease.heartbeat(e1)
        # a heartbeating leader is never preempted
        assert lease.try_acquire("bob") is None
    lease.release(e1)


def test_run_if_leader_single_executor(tmp_path):
    """T2+T3: the periodic map-refresh job runs on exactly one
    contender per tick."""
    lease = LeaderLease(str(tmp_path / "tick"), ttl_s=30)
    ran = []
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(
            ex.map(
                lambda i: lease.run_if_leader(f"c{i}", lambda ep: ran.append(ep)),
                range(8),
            )
        )
    # at least one tick ran, and never two concurrently under one
    # epoch (epochs strictly increase because each winner releases)
    assert ran and sorted(set(ran)) == sorted(ran)


def test_takeover_rename_does_not_depose_fresh_rival(tmp_path, monkeypatch):
    """If a rival installs a FRESH lock between a contender's
    staleness check and its rename, the contender must detect the
    fresh epoch on the renamed file, restore it, and yield — a live
    leader is never deposed by a stale-takeover race."""
    import os as _os

    lease = LeaderLease(str(tmp_path / "lease"), ttl_s=0.05)
    stale_epoch = lease.try_acquire("old")
    assert stale_epoch is not None
    time.sleep(0.1)  # lease goes stale

    rival = LeaderLease(str(tmp_path / "lease"), ttl_s=0.05)
    real_rename = _os.rename
    raced = {"done": False}

    def racing_rename(src, dst):
        # simulate the rival completing a takeover + fresh acquire in
        # the window between the contender's recheck and its rename
        if src == lease._lock and not raced["done"]:
            raced["done"] = True
            fresh = rival.try_acquire("rival")
            assert fresh is not None
            rival.heartbeat(fresh)
        return real_rename(src, dst)

    monkeypatch.setattr("play_with_pulsar_spark.operators.leader.os.rename", racing_rename)
    got = lease.try_acquire("contender")
    monkeypatch.undo()

    assert got is None  # contender yields
    live = lease.current()
    assert live is not None and live["owner"] == "rival"  # rival survives
    rival.fence_check(live["epoch"])  # and is NOT fenced
