#!/usr/bin/env python3
"""Post-process a graft.GenData output directory so its layout is
byte-compatible with the driver's testdata: rewrite events.parquet's raw
epoch-nanos int64 `ts` column as parquet TIMESTAMP(NANOS) (Spark cannot
write that logical type; the driver's files carry it, and the DuckDB side
of the oracle reads the file directly, so the logical types must agree).

Usage: python3 tools/make_sf.py <dir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
path = f"{d}/events.parquet"
t = pq.read_table(path)
ts = t.column("ts")
if not pa.types.is_timestamp(ts.type):
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     ts.cast(pa.timestamp("ns")))
    # a GRAFT_GEN_MULTIFILE generation leaves events.parquet as a
    # DIRECTORY of part files; the oracle reads the logical type from a
    # single file, so collapse it (read_table above already merged the
    # parts; row groups keep Spark-side parallelism)
    if os.path.isdir(path):
        shutil.rmtree(path)
    # keep row groups small: one whole-file row group reads back as a
    # single Spark partition (see GenData.writeSf)
    pq.write_table(t, path, row_group_size=131072)
    print(f"rewrote {path}: ts int64 -> timestamp[ns]")
else:
    print(f"{path}: ts already {ts.type}")
