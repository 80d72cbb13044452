#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
outputs against the DuckDB oracle SQL and diff. Usage:
  python3 tools/check.py <sfDir> <outDir> [query ...]
(Verify must have been run first to populate outDir.)"""
import json, os, sys, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Stress knobs (mirror the driver's memory-pressured checker): cap the
# allocator / thread fan-out, e.g. DUCKDB_MEMORY_LIMIT=2GB DUCKDB_THREADS=4.
# The r12 gate lost vec_ivf_ann / vec_semantic_dedup to allocator OOMs that
# only reproduce under pressure — run heavy-oracle edits under a cap before
# calling them done.
if os.environ.get("DUCKDB_MEMORY_LIMIT"):
    con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
if os.environ.get("DUCKDB_THREADS"):
    con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        # the driver's hash is BIT-sensitive: -0.0 != +0.0 there (DuckDB
        # round() keeps the IEEE sign bit; Spark round / Java BigDecimal
        # normalize it away). Distinguish zero signs here too, or this
        # stand-in passes what the driver fails (the r13 vec_covariance
        # red row shipped through exactly this blind spot).
        if v == 0.0 and math.copysign(1.0, v) < 0: return "-0.0"
        return v
    return v

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    # one retry on exceptions: DuckDB under memory pressure throws
    # transient allocation OOMs on heavy oracles (observed on
    # vec_trunc_recall / vec_ivf_ann) that vanish on immediate re-run —
    # a retried pass distinguishes those from real failures
    for attempt in (0, 1):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(norm(r[exp.columns.index(c)]) for c in exp_cols)
                        for r in exp.fetchall()]
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(norm(r[got.columns.index(c)]) for c in got_cols)
                        for r in got.fetchall()]
            err = None
            break
        except Exception as e:
            err = e
    if err is not None:
        print(f"FAIL {name}: exception {err}")
        fails.append(name); continue
    if exp_cols != got_cols:
        print(f"FAIL {name}: columns exp={exp_cols} got={got_cols}")
        fails.append(name); continue
    # driver's hash is TYPE-sensitive (DuckDB sum(BIGINT)->HUGEINT vs
    # Spark BIGINT fails even when values match) — compare dtypes too
    exp_types = [str(exp.types[exp.columns.index(c)]) for c in exp_cols]
    got_types = [str(got.types[got.columns.index(c)]) for c in got_cols]
    if exp_types != got_types:
        print(f"FAIL {name}: dtypes exp={list(zip(exp_cols, exp_types))} got={list(zip(got_cols, got_types))}")
        fails.append(name); continue
    if len(exp_rows) != len(got_rows):
        print(f"FAIL {name}: rowcount exp={len(exp_rows)} got={len(got_rows)}")
        fails.append(name); continue
    # compare as sorted multisets AND in-order; report first diff
    bad = None
    for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
        if a != b:
            bad = (i, a, b); break
    if bad:
        srt_match = sorted(map(repr, exp_rows)) == sorted(map(repr, got_rows))
        print(f"FAIL {name}: first row diff at {bad[0]}\n  exp={bad[1]}\n  got={bad[2]}\n  (set-equal={srt_match})")
        fails.append(name); continue
    print(f"ok   {name} ({len(exp_rows)} rows, cols={got_cols})")

print(f"\n{len(oracle) if not only else len(only)} checked, {len(fails)} failed: {fails}")
sys.exit(1 if fails else 0)
