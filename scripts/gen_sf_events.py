#!/usr/bin/env python3
"""Tile the events fixture N x with key-shifted copies, preserving the
parquet INT64 TIMESTAMP(NANOS) physical type (Spark reads it only as a raw
long via nanosAsLong and cannot write it back — see graft.tools.ScaleGen).

event_id shifts by copy * (max_event_id + 1); user_id by copy * (max + 1).
ts / event_type / value / props are unchanged: the same wall-clock range at
N x density, which is how a real event stream scales.

Usage: python3 scripts/gen_sf_events.py <srcSfDir> <dstSfDir> [copies=10]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    t = pq.read_table(f"{src}/events.parquet")
    n_ev = pc.max(t["event_id"]).as_py() + 1
    n_us = pc.max(t["user_id"]).as_py() + 1
    tiles = []
    for c in range(copies):
        tiles.append(t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], c * n_ev)
        ).set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], c * n_us)))
    out = pa.concat_tables(tiles)
    pq.write_table(out, f"{dst}/events.parquet", row_group_size=200_000)
    print(f'{{"gen_sf_events":"done","rows":{out.num_rows},"copies":{copies}}}')

if __name__ == "__main__":
    main()
