#!/usr/bin/env python3
"""Generate the legacy TIMESTAMP(NANOS) parquet fixture TablesSpec pins.

Spark cannot WRITE parquet TIMESTAMP(NANOS) (it reads it only through
`spark.sql.legacy.parquet.nanosAsLong=true`), so the fixture that exercises
that read leg has to be produced by a foreign writer — pyarrow here, with
parquet format version 2.6 (the first carrying the NANOS logical type).

Driver-side tooling only; the committed fixture at
src/test/resources/fixtures/nanos-legacy/events.parquet is what the build
consumes. Values match TablesSpec's canonical rows (micros * 1000).
"""
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

MICROS = [1705314600123456, 1705314600123457, 1705401000000000]

out = Path(__file__).resolve().parent.parent / \
    "src/test/resources/fixtures/nanos-legacy/events.parquet"
out.parent.mkdir(parents=True, exist_ok=True)
table = pa.table({
    "event_id": pa.array(range(len(MICROS)), pa.int64()),
    "ts": pa.array([us * 1000 for us in MICROS], pa.timestamp("ns")),
})
pq.write_table(table, out, version="2.6", coerce_timestamps=None,
               compression="snappy")
print(f"wrote {out}")
print(pq.read_schema(out))
