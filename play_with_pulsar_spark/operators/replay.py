"""The deterministic replay fold — state = fold(handle, init, events).

This is the reference's central computation (SURVEY §2.4): an ordered
event log folded into materialized state ("same initial state + same
event sequence ⇒ same result", docs/en/game1-introduce.md:91-97). The
transition semantics reproduce game-code/event.go:31-225 exactly,
including the guard predicates (event.go:33-45), duplicate-bomb
no-ops (event.go:118-132), destructible-obstacle destruction during
flame ray-cast (event.go:141-150), and full flame-map recomputation on
explode/undo (event.go:152-163,184-194; geometry utils.go:132-175).

Determinism note: Go map iteration order is unspecified, so the
reference's flame recomputation is nondeterministic when two exploding
bombs' flames overlap; this engine iterates exploding bombs sorted by
position, making the fold a pure function of the event sequence.

Execution model (the scale story): the fold is inherently sequential
*within a room* but rooms are independent (topic-per-room isolation,
docs/en/game2-use-mq.md:13-15). So the operator is
``groupBy(room).applyInPandas(fold)``: one shuffle on room, then a
pure per-group computation whose state is tiny and bounded (≤750
cells, a handful of players — game.go:25-37). 100 TB of events =
millions of rooms sharding across executors; no state ever crosses a
group boundary. Python-side work is Arrow-batched; within-group
ordering is by explicit ``offset`` (the broker order made a column).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schema import BOMB_LENGTH, GRID_H, GRID_W

DESTRUCTIBLE = 1
INDESTRUCTIBLE = 2

# One tagged table holds all five state maps (players/pos_players/
# bombs/obstacles/flames) so a replay is ONE fold and one shuffle.
STATE_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("entity", StringType(), False),  # player|pos_player|bomb|obstacle|flame
        StructField("name", StringType(), True),  # player or bomb name
        StructField("owner", StringType(), True),  # bomb/flame owning player
        StructField("x", IntegerType(), True),
        StructField("y", IntegerType(), True),
        StructField("alive", BooleanType(), True),  # players only
        StructField("destructible", BooleanType(), True),  # obstacles only
    ]
)


def valid_coordinate(x: int, y: int) -> bool:
    """Bounds guard P5 (utils.go:61-63)."""
    return 0 <= x < GRID_W and 0 <= y < GRID_H


def decode_xy(code: int) -> tuple[int, int]:
    """X1 inverse (utils.go:91-93): code = y*W + x."""
    return code % GRID_W, code // GRID_W


def encode_xy(x: int, y: int) -> int:
    return y * GRID_W + x


def _clip_ray(cells) -> tuple:
    """Truncate a ray at its FIRST out-of-bounds cell — identical to
    the per-cell ``valid_coordinate`` break in utils.go:132-175 (a ray
    never skips an invalid cell and resumes)."""
    out = []
    for p in cells:
        if not valid_coordinate(*p):
            break
        out.append(p)
    return tuple(out)


def _rays_at(x0: int, y0: int) -> tuple:
    """The four border-clipped rays of utils.go:132-175 from (x0, y0):
    left (excl. origin), right (incl.), up (excl.), down (incl.)."""
    return (
        _clip_ray((i, y0) for i in range(x0 - 1, x0 - BOMB_LENGTH - 1, -1)),
        _clip_ray((i, y0) for i in range(x0, x0 + BOMB_LENGTH + 1)),
        _clip_ray((x0, j) for j in range(y0 - 1, y0 - BOMB_LENGTH - 1, -1)),
        _clip_ray((x0, j) for j in range(y0, y0 + BOMB_LENGTH + 1)),
    )


# Precomputed border-clipped ray templates for every in-grid cell —
# the flame recompute runs once per explode/undo event, so the
# geometry (4 list builds + ~22 valid_coordinate calls per bomb per
# recompute) was ~half the fold kernel's CPU. 750 cells × ≤22 cells
# of tuples, built once per worker at import.
_RAYS = [_rays_at(code % GRID_W, code // GRID_W) for code in range(GRID_W * GRID_H)]


def _rays_for(pos: tuple[int, int]) -> tuple:
    """Rays for a bomb position. Out-of-grid positions are legal state
    (set_bomb/bomb_move don't bounds-check — event.go:85-109,197-217)
    and CAN cast into the grid (a bomb at x=GRID_W's leftward ray
    starts at GRID_W-1), so they fall back to on-the-fly clipping."""
    x, y = pos
    if 0 <= x < GRID_W and 0 <= y < GRID_H:
        return _RAYS[y * GRID_W + x]
    return _rays_at(x, y)




@dataclass
class Bomb:
    bomb_name: str
    owner: str  # Split(bombName,"-")[0] — game.go:244 (X6)
    pos: tuple[int, int]


@dataclass
class Player:
    name: str
    avatar: str | None
    pos: tuple[int, int]
    alive: bool


@dataclass
class GameState:
    """The five keyed state maps of game-code/game.go:55-90."""

    players: dict[str, Player] = field(default_factory=dict)  # nameToPlayers
    # posToPlayers (game.go:62): position-keyed LWW map written ONLY by
    # move/join (event.go:47,80) — reference semantics: the cell holds
    # the SAME object stored in nameToPlayers at write time (pointer
    # aliasing), stale cells are never cleared when a player moves
    # away, and revive/dead never write it. Two players on one cell =
    # last writer wins.
    pos_players: dict[tuple[int, int], Player] = field(default_factory=dict)
    bombs: dict[str, Bomb] = field(default_factory=dict)  # nameToBombs
    pos_bombs: dict[tuple[int, int], str] = field(default_factory=dict)  # posToBombs
    exploding: dict[tuple[int, int], Bomb] = field(default_factory=dict)
    obstacles: dict[tuple[int, int], int] = field(default_factory=dict)
    flames: dict[tuple[int, int], Bomb] = field(default_factory=dict)

    # --- transitions (event.go:31-225) ---

    def _obstacles_from_list(self, codes) -> None:
        """X3 genObstacleMapFromList (event.go:227-251): sign encodes
        destructibility (negative = destructible, X2)."""
        if codes is None or isinstance(codes, float):  # None / NaN
            codes = ()
        m: dict[tuple[int, int], int] = {}
        for code in codes:
            if code < 0:
                code = -code
                m[(code % GRID_W, code // GRID_W)] = DESTRUCTIBLE
            else:
                m[(code % GRID_W, code // GRID_W)] = INDESTRUCTIBLE
        self.obstacles = m

    def _remove_bomb(self, bomb_name: str) -> None:
        """game.go:252-259 — also clears the position slot even when a
        later duplicate bomb overwrote it."""
        bomb = self.bombs.pop(bomb_name, None)
        if bomb is not None:
            self.pos_bombs.pop(bomb.pos, None)

    def _recompute_flames(self) -> None:
        """event.go:152-163,184-194: rebuilt from scratch from every
        exploding bomb; only indestructible obstacles block flame.
        Sorted iteration replaces Go's random map order (see module
        docstring). Direct loops over the precomputed clipped rays —
        the per-cell-callback form cost ~2× in pure dispatch."""
        new: dict[tuple[int, int], Bomb] = {}
        get = self.obstacles.get
        for pos, bomb in sorted(self.exploding.items()):
            for ray in _rays_for(pos):
                for p in ray:
                    if get(p) == INDESTRUCTIBLE:
                        break
                    new[p] = bomb
        self.flames = new

    def user_move(self, name, x, y, avatar=None, alive=True) -> None:
        """F1 (event.go:31-48) with guards P5 (bounds), P6 (obstacle),
        P7 (dead players can't move)."""
        if not (0 <= x < GRID_W and 0 <= y < GRID_H):
            return
        pos = (x, y)
        if pos in self.obstacles:
            return
        p = self.players.get(name)
        if p is not None and not p.alive:
            return
        moved = Player(name, avatar, pos, bool(alive))
        self.players[name] = moved
        self.pos_players[pos] = moved  # event.go:47 — same object, LWW

    def user_dead(self, name) -> None:
        """F2 (event.go:50-59): flip alive only if the player exists."""
        p = self.players.get(name)
        if p is not None:
            p.alive = False

    def user_revive(self, name, x, y, avatar=None) -> None:
        """F3 (event.go:61-68)."""
        self.players[name] = Player(name, avatar, (x, y), True)

    def user_join(self, name, x, y, avatar=None, alive=True, obstacle_list=None) -> None:
        """F4 (event.go:72-83): upsert player AND replace the whole
        obstacle map."""
        pos = (x, y)
        joined = Player(name, avatar, pos, bool(alive))
        self.players[name] = joined
        self.pos_players[pos] = joined  # event.go:80
        self._obstacles_from_list(obstacle_list)

    def set_bomb(self, name, x, y) -> None:
        """F5 (event.go:85-109): guarded insert; duplicate at an
        occupied position overwrites the position slot (setBombWithTrigger,
        game.go:239-250). Timer emission is not folded — the resulting
        ExplodeEvent is already in the log (T1, SURVEY §2.6)."""
        pos = (x, y)
        if pos in self.obstacles:
            return
        bomb = Bomb(name, name.split("-")[0], pos)
        self.bombs[name] = bomb
        self.pos_bombs[pos] = name

    def explode(self, name) -> None:
        """F6 (event.go:111-163): no-op when the bomb is gone or its
        position slot was cleared (duplicate-bomb tolerance T5); else
        remove bomb, mark exploding, destroy destructible obstacles
        along the rays (indestructible blocks), recompute flames."""
        bomb = self.bombs.get(name)
        if bomb is None:
            return
        if bomb.pos not in self.pos_bombs:
            return
        self._remove_bomb(bomb.bomb_name)
        self.exploding[bomb.pos] = bomb

        obstacles = self.obstacles
        for ray in _rays_for(bomb.pos):
            for p in ray:
                t = obstacles.get(p)
                if t == INDESTRUCTIBLE:
                    break
                if t == DESTRUCTIBLE:
                    del obstacles[p]
        self._recompute_flames()

    def undo_explode(self, x, y) -> None:
        """F7 (event.go:178-195): keyed by POSITION, then recompute."""
        self.exploding.pop((x, y), None)
        self._recompute_flames()

    def bomb_move(self, name, x, y) -> None:
        """F8 (event.go:197-217): keyed move; no bounds check on the
        target (faithful to the reference)."""
        bomb = self.bombs.get(name)
        if bomb is None:
            return
        if bomb.pos not in self.pos_bombs:
            return
        del self.pos_bombs[bomb.pos]
        bomb.pos = (x, y)
        self.pos_bombs[bomb.pos] = bomb.bomb_name

    def update_map(self, obstacle_list) -> None:
        """F9 (event.go:219-225): replace the whole obstacle map."""
        self._obstacles_from_list(obstacle_list)

    def apply(self, ev: dict) -> None:
        """Dict-event dispatch (the wire/dict API; the columnar kernel
        ``fold_pdf`` calls the transitions positionally). Branch order
        follows observed event frequency. Missing-key defaults match
        event.go's zero-value semantics: ``alive`` defaults True when
        ABSENT (an explicit None folds falsy, same as the historical
        ``bool(ev.get('alive', True))``)."""
        t = ev["type"]
        if t == "UserMoveEvent":
            self.user_move(ev["name"], ev["x"], ev["y"], ev.get("avatar"), ev.get("alive", True))
        elif t == "BombMoveEvent":
            self.bomb_move(ev["name"], ev["x"], ev["y"])
        elif t == "SetBombEvent":
            self.set_bomb(ev["name"], ev["x"], ev["y"])
        elif t == "ExplodeEvent":
            self.explode(ev["name"])
        elif t == "UndoExplodeEvent":
            self.undo_explode(ev["x"], ev["y"])
        elif t == "UserDeadEvent":
            self.user_dead(ev["name"])
        elif t == "UserReviveEvent":
            self.user_revive(ev["name"], ev["x"], ev["y"], ev.get("avatar"))
        elif t == "UserJoinEvent":
            self.user_join(ev["name"], ev["x"], ev["y"], ev.get("avatar"),
                           ev.get("alive", True), ev.get("list"))
        elif t == "UpdateMapEvent":
            self.update_map(ev.get("list"))

    def to_rows(self, room: str) -> list[dict]:
        rows = []
        for p in self.players.values():
            rows.append(
                dict(room=room, entity="player", name=p.name, owner=None,
                     x=p.pos[0], y=p.pos[1], alive=p.alive, destructible=None)
            )
        for (x, y), p in self.pos_players.items():
            rows.append(
                dict(room=room, entity="pos_player", name=p.name, owner=None,
                     x=x, y=y, alive=p.alive, destructible=None)
            )
        for b in self.bombs.values():
            rows.append(
                dict(room=room, entity="bomb", name=b.bomb_name, owner=b.owner,
                     x=b.pos[0], y=b.pos[1], alive=None, destructible=None)
            )
        for (x, y), t in self.obstacles.items():
            rows.append(
                dict(room=room, entity="obstacle", name=None, owner=None,
                     x=x, y=y, alive=None, destructible=t == DESTRUCTIBLE)
            )
        for (x, y), b in self.flames.items():
            rows.append(
                dict(room=room, entity="flame", name=b.bomb_name, owner=b.owner,
                     x=x, y=y, alive=None, destructible=None)
            )
        return rows


def fold_events(events, state: GameState | None = None) -> GameState:
    """Fold an in-order iterable of event dicts into state — the
    single authoritative transition implementation, shared by the
    batch operator, the streaming operator, and the tests."""
    state = state or GameState()
    for ev in events:
        state.apply(ev)
    return state


# Columns the transitions actually read. Iterating ONLY these (via
# per-column tolist) instead of pdf.to_dict("records") skips the
# expensive per-cell conversion of ts/comment/offset — measured 33ms →
# ~13ms per 3000-event room, which at millions of rooms is the
# difference between the fold and the Arrow transfer being the
# bottleneck.
_EVENT_COLS = ("type", "name", "avatar", "x", "y", "alive", "list")


def fold_pdf(pdf: pd.DataFrame, state: GameState | None = None) -> GameState:
    """Fold a SORTED single-room pandas frame into state via the
    authoritative transitions, converting only the columns the
    transitions read."""
    state = state or GameState()
    n = len(pdf)
    # a frame LACKING a column folds as if every event omitted that
    # key — for ``alive`` the dict-based fold defaults a missing key
    # to True (event.go:31-43's zero-value semantics), so the columnar
    # default must be True too, not None (None folds players as dead)
    cols = [
        pdf[c].tolist()
        if c in pdf.columns
        else ([True] * n if c == "alive" else [None] * n)
        for c in _EVENT_COLS
    ]
    types, names, avatars, xs, ys, alives, lists = cols
    # positional dispatch (no per-event dict build, no dispatch-table
    # lookup): the branch chain is ordered by observed frequency —
    # measured 9.2 → ~5 ms per 3000-event room together with the
    # precomputed ray templates
    user_move = state.user_move
    bomb_move = state.bomb_move
    set_bomb = state.set_bomb
    explode = state.explode
    undo_explode = state.undo_explode
    user_dead = state.user_dead
    user_revive = state.user_revive
    user_join = state.user_join
    update_map = state.update_map
    for i in range(n):
        t = types[i]
        if t == "UserMoveEvent":
            user_move(names[i], xs[i], ys[i], avatars[i], alives[i])
        elif t == "BombMoveEvent":
            bomb_move(names[i], xs[i], ys[i])
        elif t == "SetBombEvent":
            set_bomb(names[i], xs[i], ys[i])
        elif t == "ExplodeEvent":
            explode(names[i])
        elif t == "UndoExplodeEvent":
            undo_explode(xs[i], ys[i])
        elif t == "UserDeadEvent":
            user_dead(names[i])
        elif t == "UserReviveEvent":
            user_revive(names[i], xs[i], ys[i], avatars[i])
        elif t == "UserJoinEvent":
            user_join(names[i], xs[i], ys[i], avatars[i], alives[i], lists[i])
        elif t == "UpdateMapEvent":
            update_map(lists[i])
    return state


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("offset", kind="mergesort")
    room = pdf["room"].iloc[0]
    state = fold_pdf(pdf)
    rows = state.to_rows(room)
    if not rows:
        return pd.DataFrame(columns=[f.name for f in STATE_SCHEMA.fields])
    return pd.DataFrame(rows)


def _project_fold_columns(events: DataFrame) -> DataFrame:
    """Keep only the columns the fold reads (room, offset, and the
    transition inputs). The scan-side projection cuts what crosses the
    shuffle/Arrow boundary — the dead ``ts``/``comment`` columns and
    their timestamp→datetime64 conversion never reach the Python
    worker."""
    keep = ["room", "offset"] + [c for c in _EVENT_COLS if c in events.columns]
    return events.select(*keep)


# (measured: the pruning is ~10% off the pure fold wall at 3M events
# on local parquet — modest here because the dropped columns are 2 of
# 11; on a wide production envelope or across a real shuffle the
# saving scales with what was dropped)


def replay_state(events: DataFrame, upto_offset: int | None = None) -> DataFrame:
    """Time-travel query: materialized state as of ``upto_offset``
    (inclusive), per room (SURVEY §3.2 — watch.go:43-85's re-fold).

    Plan: offset filter (pushed to the scan) → column-pruned shuffle
    on room → per-room Arrow-batched fold. Returns the tagged state
    table (``STATE_SCHEMA``).
    """
    if upto_offset is not None:
        events = events.filter(F.col("offset") <= upto_offset)
    return (
        _project_fold_columns(events)
        .groupBy("room")
        .applyInPandas(_fold_group, schema=STATE_SCHEMA)
    )


def assert_rooms_not_split(events: DataFrame) -> None:
    """Validate the ``replay_state_grouped`` precondition: every room's
    events live in exactly ONE partition. One narrow pass (room +
    partition id, partial-aggregated); raises with the offending rooms
    if the layout is wrong. Run it when adopting a NEW source layout —
    a split room would otherwise fold partial logs silently."""
    split = (
        events.select("room", F.spark_partition_id().alias("pid"))
        .groupBy("room")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .filter(F.col("n_parts") > 1)
    )
    bad = [r.room for r in split.limit(5).collect()]
    if bad:
        raise ValueError(
            "rooms split across partitions (topic-per-room precondition "
            f"violated), e.g. {bad}: use replay_state (shuffled) or "
            "repartition('room') first"
        )


def replay_state_grouped(events: DataFrame, verify_layout: bool = False) -> DataFrame:
    """Shuffle-free fold for sources PHYSICALLY partitioned by room.

    The reference's log is topic-per-room (docs/en/game2-use-mq.md:
    13-15) — a scan of such a log already delivers every room's events
    wholly inside one partition, so the ``groupBy(room)`` exchange in
    ``replay_state`` would re-shuffle 100 TB only to recreate the
    partitioning the storage layout already has. This variant folds
    within each partition (grouping by room across Arrow batches,
    sorting each room by offset) via ``mapInPandas`` — zero exchanges.

    PRECONDITION: every room's events live in exactly one partition
    (topic-per-room scan, or an upstream ``repartition("room")``).
    Rooms split across partitions would each fold a partial log —
    use ``replay_state`` when the layout is unknown. Memory: a
    partition's events are buffered (same bound as one applyInPandas
    group holding one room; here it is one task's share of the log,
    i.e. one topic partition — bounded by the source layout).

    ``verify_layout=True`` runs :func:`assert_rooms_not_split` first
    (one extra narrow pass) — use when adopting a new source layout;
    leave False on layouts already proven (the generator's, a
    topic-per-room scan) to keep the zero-extra-pass plan.
    """
    if verify_layout:
        assert_rooms_not_split(events)
    events = _project_fold_columns(events)

    def fold_partition(batches):
        import collections

        per_room: dict[str, list[pd.DataFrame]] = collections.defaultdict(list)
        for pdf in batches:
            if len(pdf):
                for room, sub in pdf.groupby("room", sort=False):
                    per_room[room].append(sub)
        # batch many rooms' state rows into each yielded frame — one
        # Arrow batch per ~8k rows instead of one tiny batch per room
        # (at millions of rooms per partition, per-batch Arrow overhead
        # would dominate the fold itself)
        buf: list[dict] = []
        for room, parts in per_room.items():
            pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
            pdf = pdf.sort_values("offset", kind="mergesort")
            buf.extend(fold_pdf(pdf).to_rows(room))
            if len(buf) >= 8192:
                yield pd.DataFrame(buf)
                buf = []
        if buf:
            yield pd.DataFrame(buf)

    return events.mapInPandas(fold_partition, schema=STATE_SCHEMA)


def players_state(state: DataFrame) -> DataFrame:
    return state.filter(F.col("entity") == "player").select("room", "name", "x", "y", "alive")


def pos_players_state(state: DataFrame) -> DataFrame:
    """Who is standing on cell (x, y) — the posToPlayers map
    (game.go:62): LWW per cell, stale cells persist after moves
    (reference semantics, event.go:47,80)."""
    return state.filter(F.col("entity") == "pos_player").select(
        "room", "x", "y", "name", "alive"
    )


def bombs_state(state: DataFrame) -> DataFrame:
    return state.filter(F.col("entity") == "bomb").select("room", "name", "owner", "x", "y")


def obstacles_state(state: DataFrame) -> DataFrame:
    return state.filter(F.col("entity") == "obstacle").select("room", "x", "y", "destructible")


def flames_state(state: DataFrame) -> DataFrame:
    return state.filter(F.col("entity") == "flame").select("room", "name", "owner", "x", "y")


SNAPSHOT_SCHEMA = StructType(
    [
        StructField("room", StringType(), False),
        StructField("snap_offset", LongType(), False),
        StructField("blob", BinaryType(), False),
    ]
)


def snapshot_states(events: DataFrame, every_k: int = 1000) -> DataFrame:
    """Time-travel checkpoints: fold each room ONCE, emitting a
    pickled GameState every ``every_k`` offsets. At 100 TB this is
    the structure that makes ``state_at(room, k)`` O(tail) instead of
    O(history): store this table partitioned by room, then any replay
    starts from the nearest snapshot ≤ k (``state_at``)."""
    import pickle

    events = _project_fold_columns(events)

    def snap(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset", kind="mergesort")
        room = pdf["room"].iloc[0]
        state = GameState()
        out = []
        offsets = pdf["offset"].tolist()
        # columnar segment fold between snapshot points (same kernel
        # as the batch fold; avoids per-row dict materialization)
        seg_start = 0
        for i, off in enumerate(offsets):
            if (off + 1) % every_k == 0:
                fold_pdf(pdf.iloc[seg_start : i + 1], state)
                seg_start = i + 1
                out.append(
                    {"room": room, "snap_offset": off, "blob": pickle.dumps(state)}
                )
        if not out:
            out.append({"room": room, "snap_offset": -1, "blob": pickle.dumps(GameState())})
        return pd.DataFrame(out)

    return events.groupBy("room").applyInPandas(snap, schema=SNAPSHOT_SCHEMA)


def state_at(events: DataFrame, snapshots: DataFrame, upto_offset: int) -> DataFrame:
    """state_at(room, k) from the nearest snapshot ≤ k + tail replay.

    One cogrouped fold per room: the snapshot side contributes the
    starting GameState, the event side contributes only offsets in
    (snap_offset, k] — the work is proportional to the tail, not the
    log. Returns the tagged state table (``STATE_SCHEMA``)."""
    import pickle

    best = (
        snapshots.filter(F.col("snap_offset") <= upto_offset)
        .groupBy("room")
        .agg(F.max_by(F.struct("snap_offset", "blob"), "snap_offset").alias("s"))
        .select("room", F.col("s.snap_offset").alias("snap_offset"), F.col("s.blob").alias("blob"))
    )
    tail = _project_fold_columns(events.filter(F.col("offset") <= upto_offset))

    def fold_tail(key, evs: pd.DataFrame, snaps: pd.DataFrame):
        room = key[0]
        if len(snaps):
            state = pickle.loads(snaps["blob"].iloc[0])
            start = int(snaps["snap_offset"].iloc[0])
        else:
            state, start = GameState(), -1
        evs = evs[evs["offset"] > start].sort_values("offset", kind="mergesort")
        fold_pdf(evs, state)
        rows = state.to_rows(room)
        return pd.DataFrame(rows if rows else [], columns=[f.name for f in STATE_SCHEMA.fields])

    return (
        tail.groupBy("room")
        .cogroup(best.groupBy("room"))
        .applyInPandas(fold_tail, schema=STATE_SCHEMA)
    )


class FoldSnapshotView:
    """Incrementally-maintained snapshot table for the fold — the
    matview pattern (``operators.matview``) applied to GameState time
    travel (round 7). :func:`snapshot_states` builds the checkpoint
    table by folding the WHOLE log; nothing maintained it as the log
    grew, so a crawl-loop deployment would re-fold history per
    refresh. This view folds each appended batch ONCE: per-batch cost
    is O(batch events), and ``state_at`` stays O(tail ≤ every_k) from
    the latest materialized snapshot forever.

    State layout under ``path`` (the curator's idempotent-batch-dir
    protocol, local/POSIX ``_SUCCESS`` markers):

    - ``snaps/batch=<id>/`` — public checkpoint rows (room,
      snap_offset, blob), one pickled GameState per crossed
      ``every_k`` boundary, append-only across batches.
    - ``heads/batch=<id>/`` — per-room CARRY state: the fold result
      at the last offset each batch processed. The latest head per
      room is the next batch's resume point, so a batch ending
      mid-interval costs the next batch nothing extra; the reader
      takes max-by-offset, so superseded heads are dead weight until
      a cleanup (bounded: one row per room per batch).

    Replay semantics: ``update`` with an already-committed
    ``batch_id`` is a no-op; a replay after a partial commit excludes
    this batch's own partitions from the resume read (the curator's
    exclude-own-batch rule) and rewrites both partitions
    deterministically (pickle of the same fold from the same resume
    state is byte-identical).

    PRECONDITION (append-only log tail): each batch carries, per
    room, only offsets strictly greater than every offset a previous
    batch carried for that room — exactly what a monotone
    micro-batched log reader delivers. Out-of-order delivery must be
    repaired upstream (the fold is order-sensitive by definition).

    At 100 TB: rooms shard the kernel (one group = one room, state ≤
    a few KB), snapshots partition by room for the ``state_at`` point
    read, and per-batch work never touches history — the same
    O(batch)-not-O(log) contract as ``LatestStateView``."""

    def __init__(self, spark, path: str, every_k: int = 1000) -> None:
        import os

        self.spark = spark
        self.path = path
        self.every_k = int(every_k)
        self.snaps_dir = os.path.join(path, "snaps")
        self.heads_dir = os.path.join(path, "heads")

    # ---------------------------------------------------------- layout

    def _batch_dir(self, base: str, batch_id: int) -> str:
        import os

        return os.path.join(base, f"batch={batch_id}")

    def _committed(self, base: str, batch_id: int) -> bool:
        import os

        return os.path.exists(
            os.path.join(self._batch_dir(base, batch_id), "_SUCCESS")
        )

    def _committed_dirs(self, base: str, exclude: int | None = None) -> list[str]:
        import os

        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if not d.startswith("batch="):
                continue
            bid = int(d.split("=", 1)[1])
            if exclude is not None and bid == exclude:
                continue
            full = os.path.join(base, d)
            if os.path.exists(os.path.join(full, "_SUCCESS")):
                out.append(full)
        return out

    def _read(self, base: str, schema: str, exclude: int | None = None) -> DataFrame:
        dirs = self._committed_dirs(base, exclude)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.schema(schema)
            .option("basePath", base)
            .parquet(*dirs)
            .select(*[c.split()[0] for c in schema.split(",")])
        )

    # ----------------------------------------------------------- reads

    def snapshots(self) -> DataFrame:
        """The maintained checkpoint table (SNAPSHOT_SCHEMA shape) —
        drop-in for :func:`state_at`'s ``snapshots`` argument."""
        return self._read(
            self.snaps_dir, "room string, snap_offset long, blob binary"
        )

    def heads(self) -> DataFrame:
        """(room, upto_offset, blob): the latest carry state per room
        — the resume point, also useful as a cheap latest-state view."""
        raw = self._read(
            self.heads_dir, "room string, upto_offset long, blob binary"
        )
        return (
            raw.groupBy("room")
            .agg(F.max_by(F.struct("upto_offset", "blob"), "upto_offset").alias("h"))
            .select(
                "room",
                F.col("h.upto_offset").alias("upto_offset"),
                F.col("h.blob").alias("blob"),
            )
        )

    def state_at(self, events: DataFrame, upto_offset: int) -> DataFrame:
        """Time travel through the MAINTAINED snapshots: O(tail) —
        the event scan below the chosen snapshot is pruned by
        :func:`state_at`'s filter, and the tail is < ``every_k``
        events per room once the view has caught up past ``upto``."""
        return state_at(events, self.snapshots(), upto_offset)

    # ---------------------------------------------------------- update

    def update(self, events: DataFrame, batch_id: int) -> None:
        """Fold one appended batch into the view: resume each room
        from its latest committed head (this batch's own partitions
        excluded — replay safety), emit a snapshot row at every
        crossed ``every_k`` boundary plus the new head, and commit
        both tables into idempotent ``batch=<id>`` partitions."""
        import pickle

        snaps_done = self._committed(self.snaps_dir, batch_id)
        heads_done = self._committed(self.heads_dir, batch_id)
        if snaps_done and heads_done:
            return
        resume = self._read(
            self.heads_dir, "room string, upto_offset long, blob binary",
            exclude=batch_id,
        )
        resume = (
            resume.groupBy("room")
            .agg(F.max_by(F.struct("upto_offset", "blob"), "upto_offset").alias("h"))
            .select(
                "room",
                F.col("h.upto_offset").alias("upto_offset"),
                F.col("h.blob").alias("blob"),
            )
        )
        ev = _project_fold_columns(events)
        every_k = self.every_k

        def fold_batch(key, evs: pd.DataFrame, hd: pd.DataFrame) -> pd.DataFrame:
            cols = ["room", "snap_offset", "blob", "is_head"]
            if not len(evs):  # head-only group: old head stays latest
                return pd.DataFrame([], columns=cols)
            room = key[0]
            if len(hd):
                state = pickle.loads(hd["blob"].iloc[0])
                start = int(hd["upto_offset"].iloc[0])
            else:
                state, start = GameState(), -1
            evs = evs[evs["offset"] > start].sort_values("offset", kind="mergesort")
            offsets = evs["offset"].tolist()
            out = []
            seg = 0
            for i, off in enumerate(offsets):
                if (off + 1) % every_k == 0:
                    fold_pdf(evs.iloc[seg : i + 1], state)
                    seg = i + 1
                    out.append(
                        {"room": room, "snap_offset": int(off),
                         "blob": pickle.dumps(state), "is_head": False}
                    )
            fold_pdf(evs.iloc[seg:], state)
            upto = int(offsets[-1]) if offsets else start
            out.append(
                {"room": room, "snap_offset": upto,
                 "blob": pickle.dumps(state), "is_head": True}
            )
            return pd.DataFrame(out, columns=cols)

        rows = (
            ev.groupBy("room")
            .cogroup(resume.groupBy("room"))
            .applyInPandas(
                fold_batch,
                schema="room string, snap_offset long, blob binary, is_head boolean",
            )
            .persist()
        )
        if not snaps_done:
            rows.filter(~F.col("is_head")).select(
                "room", "snap_offset", "blob"
            ).write.mode("overwrite").parquet(self._batch_dir(self.snaps_dir, batch_id))
        if not heads_done:
            rows.filter(F.col("is_head")).select(
                "room",
                F.col("snap_offset").alias("upto_offset"),
                "blob",
            ).write.mode("overwrite").parquet(self._batch_dir(self.heads_dir, batch_id))
        rows.unpersist()

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — maintain the
        snapshot view directly off the event stream."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.update(batch_df, int(epoch_id))

        return fn


def paced_replay(events: DataFrame, room: str, pace_ms: int = 200):
    """W4 (watch.go:63-83): ordered event emission for presentation —
    a generator over the room's log in offset order, optionally paced.
    Uses ``toLocalIterator`` so only one partition's rows are resident
    driver-side at a time; the sort happens cluster-side."""
    import time as _time

    it = (
        events.filter(F.col("room") == room)
        .orderBy("offset")
        .toLocalIterator(prefetchPartitions=True)
    )
    for row in it:
        if pace_ms:
            _time.sleep(pace_ms / 1000.0)
        yield row


def player_position_history(events: DataFrame) -> DataFrame:
    """The SQL fast path (SURVEY §2.4 batch-replay note): last
    guard-free upsert per (room, player) via plain window analytics —
    valid when guards pass; the exact operator is ``replay_state``.
    Used for scalable position-history analytics where per-event
    guard re-evaluation is not needed.
    """
    w_ev = events.filter(
        F.col("type").isin("UserMoveEvent", "UserJoinEvent", "UserReviveEvent")
    )
    return (
        w_ev.groupBy("room", "name")
        .agg(
            F.max_by(F.struct("x", "y", "ts"), "offset").alias("last"),
            F.count(F.lit(1)).alias("n_updates"),
        )
        .select("room", "name", "last.x", "last.y", "last.ts", "n_updates")
    )
