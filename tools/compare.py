#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables and compare with the Spark dump
produced by `graft.Verify`. Columns are sorted by name before comparison
(mirroring the driver); values compared exactly.

Usage: python3 tools/compare.py [sf_dir] [verify_out_dir] [json_out]

With a third argument, also writes a CORRECTNESS_r*-shaped JSON
({query: {match, spark_rows, oracle_rows, err}}) — used to commit the
sf1 sweep as evidence.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Heavy oracles (the all-pairs / recursive-closure CTE class) spill DuckDB
# temp. Temp goes next to the verify OUTPUT dir by default — the same
# volume the Spark dumps prove is writable and sized for this sweep —
# overridable with GRAFT_DUCKDB_TMP; memory is capped so spilling engages
# before the OS OOMs the process. NOTE: relocation alone is NOT sufficient
# for the two monolithic all-pairs-composition oracles (dedup_cascade,
# sim_modularity) at sf>=1 — their single-statement plans can exceed any
# single volume (rounds 9-10 died disk-full). For those, run with
# GRAFT_STAGED_ORACLE=1: each heavy subtree is materialized sequentially
# as an on-disk table (temp freed between stages) from the staged
# decomposition Verify dumps alongside the monolithic SQL.
tmpdir = os.environ.get("GRAFT_DUCKDB_TMP",
                        os.path.join(os.path.abspath(OUT), "duckdb_tmp"))
os.makedirs(tmpdir, exist_ok=True)
STAGED = os.environ.get("GRAFT_STAGED_ORACLE", "") == "1"
# staged runs use an on-disk database so CTAS stages land compactly
# (columnar, compressed) instead of as temp spill. The file is scoped per
# scale factor AND recreated per run: with a shared GRAFT_DUCKDB_TMP, two
# concurrent sweeps at different SFs would otherwise share one database
# and clobber each other's stage_* tables and parquet views mid-run (and
# stale stage tables from prior runs would accumulate).
if STAGED:
    stage_db = os.path.join(tmpdir,
                            f"stage_{os.path.basename(SF.rstrip('/'))}.db")
    for leftover in (stage_db, stage_db + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)
else:
    stage_db = None


def connect():
    """(Re)open the oracle connection. A hard Out-of-Memory error inside
    DuckDB leaves the buffer pool poisoned for the life of the connection
    — at sf3 one genuinely-infeasible 16 GiB closure stage then made 47
    later trivial queries die on 8-BYTE allocations. Reconnecting resets
    the pool; staged CTAS tables persist in the on-disk stage database,
    so nothing already built is lost."""
    c = duckdb.connect(stage_db if STAGED else ":memory:")
    c.execute(f"PRAGMA temp_directory='{tmpdir}'")
    c.execute(
        f"PRAGMA memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        # a GRAFT_GEN_MULTIFILE corpus stores each table as a DIRECTORY
        # of part files; DuckDB needs the explicit glob there. A probe
        # corpus (sf60emb etc.) holds only a table subset — skip the
        # missing ones so a GRAFT_COMPARE_ONLY run against it can
        # connect; a query referencing a skipped table fails per-query.
        src = f"{SF}/{t}.parquet"
        if os.path.isdir(src):
            if not glob.glob(f"{src}/*.parquet"):
                continue
            src = f"{src}/*.parquet"
        elif not os.path.exists(src):
            continue
        c.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")
    return c


con = connect()

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
staged = {}
if STAGED:
    try:
        staged = json.load(open(f"{OUT}/oracle_stage_sql.json"))
        print(f"STAGED oracles for: {sorted(staged)}")
    except FileNotFoundError:
        print("GRAFT_STAGED_ORACLE=1 but no oracle_stage_sql.json; "
              "falling back to monolithic")
# comma-separated query names whose oracles are cost-prohibitive at this
# scale (the all-pairs CTE class at sf1) — skipped entirely and left OUT of
# the JSON report, mirroring the committed 207-entry sf1 artifact shape;
# their sf1 signal comes from graft.ScaleCheck property gates instead
skip = set(filter(None, os.environ.get("GRAFT_COMPARE_SKIP", "").split(",")))
if skip:
    print(f"SKIP {len(skip)} (oracle-cost-bound): {sorted(skip)}")
    oracle = {k: v for k, v in oracle.items() if k not in skip}
# comma-separated allowlist for ISOLATED re-runs (a disk-bound query gets
# the whole volume to itself, the round-14 adjudication protocol); the
# JSON report then holds just these queries for a documented merge
only = set(filter(None, os.environ.get("GRAFT_COMPARE_ONLY", "").split(",")))
if only:
    print(f"ONLY {len(only)}: {sorted(only)}")
    oracle = {k: v for k, v in oracle.items() if k in only}
fails, passes, warns = [], [], []
shapes = {}
built_stages = {}
# stage SQL -> error: a stage that already OOM'd is not rebuilt for the
# next query sharing it — its consumers all record the same honest err
failed_stages = {}


class StageFailed(RuntimeError):
    """Short-circuit for a stage that already failed on a FRESH pool.

    Distinct type so the OOM-retry test below never matches it: the
    embedded original error text usually says 'Out of Memory', and before
    round 13 every later consumer of a failed stage therefore paid a
    pointless reconnect + a second doomed attempt (+ another reconnect).
    """

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

progress = os.environ.get("GRAFT_COMPARE_PROGRESS", "") == "1"
for qi, name in enumerate(sorted(oracle), 1):
    if progress:
        # one flushed line per query so a killed long sweep (OOM at sf6)
        # shows exactly where it died and how far it got
        print(f"[{qi}/{len(oracle)}] {name}", flush=True)
    sql = oracle[name]
    dump = f"{OUT}/{name}"
    if not glob.glob(f"{dump}/*.parquet"):
        fails.append((name, "no spark dump"))
        continue
    def attempt(fresh):
        got = norm(con.execute(
            f"SELECT * FROM read_parquet('{dump}/*.parquet')").fetchdf())
        if name in staged:
            for tbl, ssql in staged[name]["stages"]:
                if (tbl, ssql) in failed_stages:
                    raise StageFailed(
                        f"stage {tbl} previously failed: "
                        f"{failed_stages[(tbl, ssql)]}")
                # stages are shared across staged queries (stage_sem feeds
                # both cascade and modularity) — materialize each once
                if built_stages.get(tbl) != ssql:
                    try:
                        con.execute(f"CREATE OR REPLACE TABLE {tbl} AS {ssql}")
                        con.execute("CHECKPOINT")
                        built_stages[tbl] = ssql
                    except Exception as se:
                        # only a FRESH-pool failure is the stage's honest
                        # verdict; a failure on a possibly-poisoned pool
                        # deserves the retry below
                        if fresh:
                            failed_stages[(tbl, ssql)] = str(se)
                        raise
            want = norm(con.execute(staged[name]["final"]).fetchdf())
        else:
            want = norm(con.execute(sql).fetchdf())
        return got, want

    try:
        try:
            got, want = attempt(fresh=False)
        except Exception as e:
            if isinstance(e, StageFailed) or (
                    "Out of Memory" not in str(e)
                    and "bad allocation" not in str(e)):
                raise
            # reset the poisoned buffer pool and retry once; a second OOM
            # on a fresh pool is the honest cost-bound verdict
            con = connect()
            got, want = attempt(fresh=True)
    except Exception as e:
        fails.append((name, f"query error: {e}"))
        # an OOM can leave the pool pinned — reconnect so the NEXT query
        # starts clean either way (a StageFailed short-circuit never
        # touched the pool, so it skips the reconnect too)
        if not isinstance(e, StageFailed) and (
                "Out of Memory" in str(e) or "bad allocation" in str(e)):
            con = connect()
        continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"))
        continue
    if got.shape != want.shape:
        fails.append((name, f"shape differ: spark={got.shape} oracle={want.shape}"))
        continue
    shapes[name] = int(got.shape[0])
    ok = True
    for c in got.columns:
        a, b = got[c], want[c]
        if str(a.dtype) != str(b.dtype):
            warns.append((name, c, f"dtype spark={a.dtype} oracle={b.dtype}"))
        try:
            av = a.to_numpy()
            bv = b.to_numpy()
            if a.dtype == object or b.dtype == object:
                eq = all((x == y) or (pd.isna(x) and pd.isna(y))
                         for x, y in zip(a.tolist(), b.tolist()))
            elif np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                af = a.astype("float64").to_numpy()
                bf = b.astype("float64").to_numpy()
                eq = bool(np.all((af == bf) | (np.isnan(af) & np.isnan(bf))))
            elif "datetime" in str(a.dtype) or "datetime" in str(b.dtype):
                eq = bool((a.astype("datetime64[us]") == b.astype("datetime64[us]")).all())
            else:
                eq = bool(np.array_equal(av, bv))
        except Exception as e:
            eq = False
        if not eq:
            ok = False
            diff = None
            try:
                mask = ~(a.astype(str) == b.astype(str))
                idx = mask[mask].index[:3].tolist()
                diff = [(i, a.iloc[i], b.iloc[i]) for i in idx]
            except Exception:
                pass
            fails.append((name, f"values differ in col {c}: {diff}"))
            break
    # Render-sensitive pass, mimicking the driver's hash: the driver hashes
    # STRING-RENDERED rows, so two value-identical frames can still mismatch
    # when a type renders differently on the two sides (the round-1 trap:
    # DECIMAL(18,2) `123.40` vs `123.4`). Compare str() of every cell too.
    if ok:
        def rend(v):
            if isinstance(v, (list, np.ndarray)):
                return str([rend(x) for x in v])
            try:
                if pd.isna(v):
                    return "NULL"
            except Exception:
                pass
            return str(v)
        for c in got.columns:
            ra = got[c].map(rend)
            rb = want[c].map(rend)
            neq = ra[ra != rb]
            if len(neq):
                ok = False
                i = neq.index[0]
                fails.append((name,
                    f"RENDER differs in col {c} (values equal!): "
                    f"spark={ra.iloc[i]!r} oracle={rb.iloc[i]!r} "
                    f"dtypes spark={got[c].dtype} oracle={want[c].dtype}"))
                break
    if ok:
        passes.append(name)

print(f"PASS {len(passes)}: {passes}")
for w in warns:
    print(f"WARN {w}")
for f in fails:
    print(f"FAIL {f}")
if JSON_OUT:
    failmap = {}
    for name, msg in fails:
        failmap.setdefault(name, msg)
    results = {}
    for name in sorted(oracle):
        if name in failmap:
            results[name] = {"match": False, "err": failmap[name]}
        else:
            n = shapes.get(name)
            results[name] = {"match": True, "spark_rows": n, "oracle_rows": n,
                             "err": None}
    # a filtered run must be distinguishable from a full sweep INSIDE the
    # artifact (round-15 advice); the round-16 advice refinement: nest the
    # query rows under "results" so a consumer iterating the report never
    # mistakes the _meta marker for a query name. Full sweeps keep the
    # historical flat name->result shape (byte-comparable across rounds).
    if only or skip:
        report = {"_meta": {"partial": True,
                            "only": sorted(only), "skip": sorted(skip)},
                  "results": results}
    else:
        report = results
    with open(JSON_OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {JSON_OUT}")
sys.exit(1 if fails else 0)
