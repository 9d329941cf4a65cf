"""Materialize the committed game-event-log fixture (FIXTURES.md §A1).

Writes fixtures/game_events.parquet — 6 rooms × 3000 events, seed 42,
single parquet file — used by the game-native declared queries so
their DuckDB oracles can read the same table by path. Regenerating is
idempotent: the generator is a pure function of (room, seed).

Run: python scripts/gen_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from play_with_pulsar_spark.sources.fixtures import generate_room_events, room_names

N_ROOMS = 6
EVENTS_PER_ROOM = 3000
SEED = 42

SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("room", pa.string()),
        ("ts", pa.timestamp("us")),
        ("type", pa.string()),
        ("name", pa.string()),
        ("avatar", pa.string()),
        ("comment", pa.string()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("alive", pa.bool_()),
        ("list", pa.list_(pa.int32())),
    ]
)


CHANGELOG_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("room", pa.string()),
        ("ts", pa.timestamp("us")),
        ("key", pa.string()),
        ("value", pa.string()),
    ]
)


def derive_score_changelog(events: list[dict]) -> list[dict]:
    """FIXTURES.md §A2: what the scoreboard Function would emit for
    this room's log — running totals per killer as STRING values
    (ScoreboardFunction.java:41-50), one message per qualifying kill."""
    counters: dict[str, int] = {}
    out = []
    for ev in events:
        if ev["type"] != "UserDeadEvent" or ev["name"] == ev["comment"]:
            continue
        killer = ev["comment"]
        counters[killer] = counters.get(killer, 0) + 1
        out.append(
            {
                "offset": len(out),
                "room": ev["room"],
                "ts": ev["ts"],
                "key": killer,
                "value": str(counters[killer]),  # score + "" (X11)
            }
        )
    return out


def main() -> None:
    fixture_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    os.makedirs(fixture_dir, exist_ok=True)

    rows: list[dict] = []
    chg: list[dict] = []
    for room in room_names(N_ROOMS):
        evs = generate_room_events(room, EVENTS_PER_ROOM, SEED)
        rows.extend(evs)
        chg.extend(derive_score_changelog(evs))

    table = pa.Table.from_pydict(
        {name: [r[name] for r in rows] for name in SCHEMA.names}, schema=SCHEMA
    )
    out = os.path.join(fixture_dir, "game_events.parquet")
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")

    ctable = pa.Table.from_pydict(
        {name: [r[name] for r in chg] for name in CHANGELOG_SCHEMA.names},
        schema=CHANGELOG_SCHEMA,
    )
    cout = os.path.join(fixture_dir, "score_changelog.parquet")
    pq.write_table(ctable, cout, compression="zstd")
    print(f"wrote {cout}: {ctable.num_rows} rows")


if __name__ == "__main__":
    main()
