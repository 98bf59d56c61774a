"""Spot-check a subset of registered queries against the DuckDB oracle.

Usage: python tools/check_subset.py q_name [q_name ...]
Same canon/vhash as driver_sim, vanilla session, sf0.01 by default.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import decimal
import hashlib
import math

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as mod


def canon(v):
    if v is None:
        return "N"
    if isinstance(v, decimal.Decimal):
        raise AssertionError(f"decimal value {v} in result set")
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"s:{v}"


def vhash(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in idx) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

names = sys.argv[1:]
spark = (
    SparkSession.builder.master("local[8]")
    .appName("check-subset")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for tb in TABLES:
    con.sql(f"CREATE VIEW {tb} AS SELECT * FROM '{SF}/{tb}.parquet'")

qs = mod.queries()
oracles = mod.oracle_sql()
fail = 0
for name in names:
    df = qs[name](spark, SF)
    cols = [f.name for f in df.schema.fields]
    rows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        print(f"  {name:28s} rows-only {len(rows)} rows")
        continue
    od = con.sql(oracles[name])
    ocols = [d[0] for d in od.description]
    orows = od.fetchall()
    h1, h2 = vhash(cols, rows), vhash(ocols, orows)
    ok = len(rows) == len(orows) and sorted(cols) == sorted(ocols) and h1 == h2
    print(
        f"  {name:28s} {'OK' if ok else 'MISMATCH'}  spark={len(rows)} oracle={len(orows)} "
        f"cols={'=' if sorted(cols)==sorted(ocols) else (sorted(cols), sorted(ocols))} hash={'=' if h1==h2 else (h1,h2)}"
    )
    if not ok:
        fail += 1
        for r in rows[:3]:
            print("    spark :", r)
        for r in orows[:3]:
            print("    oracle:", r)
print(f"{len(names)} checked, {fail} failures")
sys.exit(1 if fail else 0)
