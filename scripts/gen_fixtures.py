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


def main() -> None:
    rows: list[dict] = []
    for room in room_names(N_ROOMS):
        rows.extend(generate_room_events(room, EVENTS_PER_ROOM, SEED))
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    table = pa.Table.from_pydict(cols, schema=SCHEMA)
    out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "game_events.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
