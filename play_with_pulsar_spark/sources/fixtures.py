"""Seeded game-event-log generator (FIXTURES.md §A1).

Produces valid, deterministic event logs mirroring the reference's
wire traffic: every room starts with a UserJoinEvent carrying a full
obstacle list (event.go:72-83), ExplodeEvents fire ~2 s after their
SetBombEvent and UndoExplodeEvents ~2 s after that (event.go:100-107,
165-175 — the log is self-contained, timers emit events), kills are
attributed through the flame map like the reference's local detection
(game.go:139-147), and the log deliberately contains the edge cases
the fold must tolerate: duplicate SetBombEvents at an occupied
position (event.go:118-121), moves onto obstacles / out of bounds /
by dead players (event.go:33-45), and self-kills (name == comment)
for the scoreboard filter (ScoreboardFunction.java:24-27).

Generation is per-room deterministic (seed derived from room name
only), so the same (room, seed) yields the same events regardless of
partitioning — the distributed generator shards by room exactly like
the fold does.
"""

from __future__ import annotations

import heapq
import random
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.replay import GameState, fold_events, valid_coordinate
from ..schema import (
    GAME_EVENT_SCHEMA,
    GRID_H,
    GRID_W,
    N_DESTRUCTIBLE,
    N_INDESTRUCTIBLE,
)

_EPOCH = datetime(2024, 3, 1)
_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _rand_suffix(rng: random.Random) -> str:
    """utils.go:78-85's 5-char alpha suffix, seeded."""
    return "".join(rng.choice(_LETTERS) for _ in range(5))


def _obstacle_list(rng: random.Random, players: dict) -> list[int]:
    """A random obstacle list à la genRandomObstacleList
    (game.go:213-238): ~N_INDESTRUCTIBLE positive + ~N_DESTRUCTIBLE
    negative codes, keeping cells near players clear."""
    keep_clear = set()
    for p in players.values():
        x, y = p.pos
        for dx, dy in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)):
            keep_clear.add((y + dy) * GRID_W + (x + dx))
    cells = [c for c in range(GRID_W * GRID_H) if c not in keep_clear]
    picked = rng.sample(cells, N_INDESTRUCTIBLE + N_DESTRUCTIBLE)
    return [c for c in picked[:N_INDESTRUCTIBLE]] + [-c for c in picked[N_INDESTRUCTIBLE:] if c != 0]


def generate_room_events(room: str, n_events: int, seed: int = 42) -> list[dict]:
    """Generate one room's ordered event list (offset 0..n-1)."""
    rng = random.Random(f"{seed}:{room}")
    state = GameState()
    events: list[dict] = []
    clock = _EPOCH + timedelta(seconds=rng.uniform(0, 5))
    timers: list[tuple[datetime, int, str, dict]] = []  # (fire_at, seq, kind, payload)
    seq = 0
    player_names = [f"{room}-p{i}" for i in range(rng.randint(3, 5))]

    def emit(type_: str, *, name=None, comment="", x=None, y=None, alive=None, lst=None):
        ev = {
            "offset": len(events),
            "room": room,
            "ts": clock,
            "type": type_,
            "name": name,
            "avatar": "fff",
            "comment": comment,
            "x": x if x is not None else 0,
            "y": y if y is not None else 0,
            "alive": alive if alive is not None else True,
            "list": lst,
        }
        events.append(ev)
        state.apply(ev)

    def schedule(delay_s: float, kind: str, payload: dict):
        nonlocal seq
        seq += 1
        heapq.heappush(timers, (clock + timedelta(seconds=delay_s), seq, kind, payload))

    def kill_sweep():
        """Reference-local kill detection (game.go:139-147): players
        standing in flame die; killer = flame owner at that cell."""
        for pname, p in list(state.players.items()):
            if p.alive and p.pos in state.flames:
                killer = state.flames[p.pos].owner
                emit("UserDeadEvent", name=pname, comment=killer,
                     x=p.pos[0], y=p.pos[1], alive=False)
                schedule(rng.uniform(2.5, 6.0), "revive", {"name": pname})

    # Every room starts with joins carrying a full obstacle list.
    for pname in player_names:
        pos = (rng.randrange(GRID_W), rng.randrange(GRID_H))
        emit("UserJoinEvent", name=pname, x=pos[0], y=pos[1], alive=True,
             lst=_obstacle_list(rng, state.players))
        clock += timedelta(milliseconds=rng.randint(20, 120))

    next_map_update = clock + timedelta(seconds=60)

    while len(events) < n_events:
        clock += timedelta(milliseconds=rng.randint(40, 250))

        # fire due timers first — explode/undo events enter the log in
        # time order, like the reference's client timers
        if timers and timers[0][0] <= clock:
            _, _, kind, payload = heapq.heappop(timers)
            if kind == "explode":
                b = state.bombs.get(payload["name"])
                pos = b.pos if b else (payload["x"], payload["y"])
                emit("ExplodeEvent", name=payload["name"], x=pos[0], y=pos[1])
                schedule(2.0, "undo", {"x": pos[0], "y": pos[1]})
                kill_sweep()
            elif kind == "undo":
                emit("UndoExplodeEvent", x=payload["x"], y=payload["y"])
            elif kind == "revive":
                p = state.players.get(payload["name"])
                if p is not None and not p.alive:
                    pos = (rng.randrange(GRID_W), rng.randrange(GRID_H))
                    emit("UserReviveEvent", name=payload["name"], x=pos[0], y=pos[1], alive=True)
            continue

        if clock >= next_map_update:
            emit("UpdateMapEvent", lst=_obstacle_list(rng, state.players))
            next_map_update = clock + timedelta(seconds=60)
            continue

        r = rng.random()
        pname = rng.choice(player_names)
        p = state.players.get(pname)
        if r < 0.62 and p is not None:
            # random walk; ~6% deliberately invalid moves (guards P5-P7)
            x, y = p.pos
            dx, dy = rng.choice([(1, 0), (-1, 0), (0, 1), (0, -1)])
            nx, ny = x + dx, y + dy
            bad = rng.random()
            if bad < 0.02:
                nx, ny = -1, y  # out of bounds
            elif bad < 0.04 and state.obstacles:
                nx, ny = rng.choice(sorted(state.obstacles))  # onto obstacle
            # dead players keep emitting moves (guard P7 rejects them)
            emit("UserMoveEvent", name=pname, x=nx, y=ny, alive=p.alive)
        elif r < 0.80 and p is not None and p.alive:
            # set a bomb at the player's position (game.go:191-198);
            # ~10% duplicate at an occupied position (idempotence T5)
            pos = p.pos
            if rng.random() < 0.10 and state.pos_bombs:
                pos = rng.choice(sorted(state.pos_bombs))
            bname = (f"random-{_rand_suffix(rng)}" if rng.random() < 0.15
                     else f"{pname}-{_rand_suffix(rng)}")
            emit("SetBombEvent", name=bname, x=pos[0], y=pos[1])
            schedule(2.0, "explode", {"name": bname, "x": pos[0], "y": pos[1]})
        elif r < 0.88 and state.bombs:
            bname = rng.choice(sorted(state.bombs))
            b = state.bombs[bname]
            dx, dy = rng.choice([(1, 0), (-1, 0), (0, 1), (0, -1)])
            emit("BombMoveEvent", name=bname, x=b.pos[0] + dx, y=b.pos[1] + dy)
        elif r < 0.93:
            # occasional unattributed death incl. self-kills (P2 data)
            victim = rng.choice(player_names)
            killer = victim if rng.random() < 0.3 else rng.choice(player_names)
            vp = state.players.get(victim)
            if vp is not None and vp.alive:
                emit("UserDeadEvent", name=victim, comment=killer,
                     x=vp.pos[0], y=vp.pos[1], alive=False)
                schedule(rng.uniform(2.5, 6.0), "revive", {"name": victim})
        else:
            pos = (rng.randrange(GRID_W), rng.randrange(GRID_H))
            emit("UserMoveEvent", name=pname, x=pos[0], y=pos[1])

    return events[:n_events]


def room_names(n_rooms: int) -> list[str]:
    return [f"room-{i:04d}" for i in range(n_rooms)]


def game_event_log(
    spark: SparkSession,
    n_rooms: int = 8,
    events_per_room: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Distributed generation: one task per room (mapInPandas over a
    room list), so fixture creation scales exactly like the fold —
    no driver-side materialization."""
    # spark.range with explicit numPartitions yields one task per room
    # WITHOUT an exchange (a repartition of the room list would add a
    # whole extra stage — measured ~0.5-1.8 s of pure scheduling/task
    # overhead on this box for zero useful work). Output partitioning
    # is exactly topic-per-room, so downstream folds can use the
    # shuffle-free ``replay_state_grouped``.
    n_parts = min(n_rooms, 64)
    room_col = F.format_string("room-%04d", F.col("id"))
    ids = spark.range(0, n_rooms, numPartitions=n_parts).select(room_col.alias("room"))

    def gen(batches):
        for pdf in batches:
            for room in pdf["room"]:
                out = pd.DataFrame(generate_room_events(room, events_per_room, seed))
                out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
                yield out

    return ids.mapInPandas(gen, schema=GAME_EVENT_SCHEMA)


__all__ = [
    "fold_events",
    "game_event_log",
    "generate_room_events",
    "room_names",
    "valid_coordinate",
]


# --- language-ID evaluation corpus (per-language vocabulary) ---

# Common-word vocabularies chosen so each language's text actually
# exhibits its character-trigram statistics (the driver's documents
# fixture shares one vocabulary across lang labels, which makes
# accuracy against it meaningless — ROADMAP gap 5). Public common
# words only.
_LANG_VOCAB: dict[str, list[str]] = {
    "en": ["the", "and", "of", "thing", "going", "standing", "other",
           "another", "hand", "land", "making", "finding", "world",
           "thought", "nothing", "morning", "during", "people", "that",
           "with", "house", "water", "under", "think", "there"],
    "es": ["de", "la", "el", "que", "los", "las", "nación", "canción",
           "hablar", "estar", "casa", "quiero", "porque", "ciudad",
           "trabajo", "tiempo", "historia", "grande", "pequeño",
           "información", "corazón", "mundo", "desde", "ellos", "cuando"],
    "fr": ["le", "de", "la", "les", "et", "entente", "moment", "nation",
           "maison", "temps", "gouvernement", "pendant", "comment",
           "enfant", "souvent", "grandes", "petites", "question",
           "attention", "devant", "toujours", "histoire", "lentement",
           "seulement", "vraiment"],
    "de": ["der", "die", "ein", "ich", "schön", "deutsch", "sich",
           "nicht", "einer", "dieser", "zwischen", "deutschland",
           "geschichte", "wichtig", "eigentlich", "menschen", "sprache",
           "schnell", "schreiben", "einfach", "wieder", "dieses",
           "entscheidung", "wissenschaft", "natürlich"],
}


def lang_corpus(n_per_lang: int = 50, seed: int = 42,
                words_per_doc: int = 30) -> list[dict]:
    """Labeled corpus where each document is sampled from ITS
    language's vocabulary — accuracy of a language identifier against
    the ``lang`` label is meaningful here, unlike on the shared-
    vocabulary driver fixture."""
    rng = random.Random(seed)
    rows = []
    doc_id = 0
    for lang, vocab in _LANG_VOCAB.items():
        for _ in range(n_per_lang):
            text = " ".join(rng.choice(vocab) for _ in range(words_per_doc))
            rows.append({"doc_id": doc_id, "lang": lang, "text": text})
            doc_id += 1
    return rows
