"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` via DuckDB (row count + column names + order-insensitive
canonicalized values).

Usage: python tools/check_contract.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from htmld_spark.pipeline.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_val(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main(names: list[str]) -> int:
    spark = get_spark(master="local[8]", app_name="check_contract")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    targets = names or list(qs)
    failures = 0
    for name in targets:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            # registry-wide plan sweep: no row-at-a-time Python UDF may
            # appear in ANY contract query's executed plan (the repo-wide
            # invariant the targeted test_plans asserts for the flagship)
            plan = sdf._jdf.queryExecution().executedPlan().toString()
            if "BatchEvalPython" in plan:
                print(f"FAIL  {name}: BatchEvalPython in executed plan")
                failures += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s)  [rows-only]")
            if len(srows) == 0 and name != "dedup_minhash_lsh":
                print(f"      WARNING: empty rows-only result")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        # dtype-family comparison (warn-only; driver's strictness unknown)
        # duckdb's DBAPI description only exposes coarse families
        # (NUMBER/STRING/DATETIME/Date/bool) — compare at that granularity
        fam = {
            "bigint": "num", "long": "num", "int": "num", "smallint": "num",
            "double": "num", "float": "num", "decimal": "num",
            "NUMBER": "num", "string": "s", "STRING": "s",
            "boolean": "b", "bool": "b", "date": "d", "Date": "d",
            "timestamp": "t", "timestamp_ntz": "t", "DATETIME": "t",
        }
        sd = {c: fam.get(t, t) for c, t in sdf.dtypes}
        od = {d[0]: fam.get(str(d[1]), str(d[1])) for d in res.description}
        for c in set(sd) & set(od):
            if sd[c] != od[c]:
                print(f"      DTYPE-WARN {name}.{c}: spark={sd[c]} duckdb={od[c]}")
        sc, sr = canon_rows(scols, srows)
        oc, orw = canon_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            failures += 1
        elif len(sr) != len(orw):
            print(f"FAIL  {name}: rows {len(sr)} != {len(orw)}")
            failures += 1
        elif sr != orw:
            bad = next(i for i in range(len(sr)) if sr[i] != orw[i])
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:")
            print(f"      spark : {sr[bad]}")
            print(f"      oracle: {orw[bad]}")
            failures += 1
        else:
            print(f"OK    {name}: {len(sr)} rows match ({dt:.1f}s)")
    spark.stop()
    # registry bookkeeping, printed by the TOOL so round docs quote it
    # instead of hand-maintaining counts (VERDICT r05 "what's wrong" #2:
    # hand-kept numbers rotted three rounds running)
    print(
        f"\nregistry: {len(qs)} entries, {len(oracles)} value-oracled, "
        f"{len(qs) - len(oracles)} rows-only; checked {len(targets)} this run"
    )
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
