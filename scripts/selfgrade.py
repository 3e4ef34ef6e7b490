"""Driver-emulating self-grader: run every registered query on Spark and its
oracle SQL on DuckDB at the same sf dir, canonicalize both results the way the
driver does (columns sorted by name, rows sorted by all columns, values
hashed), and report per-query rows/schema/hash matches.

Usage: python scripts/selfgrade.py [query ...]   (default: all)
Env:   SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from llm_data_pipeline_spark import queries as Q

Q.load_all()

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# Deliberately a *plain* session (no session.py confs) to emulate the driver's
# harness; queries must self-provision any conf they need.
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .appName("selfgrade")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )


def _canon(df: pd.DataFrame) -> tuple[list[str], int, str]:
    cols = sorted(df.columns)
    df = df[cols]
    # normalize dtypes: floats rounded, everything to string
    norm = {}
    for c in cols:
        s = df[c]
        if s.dtype.kind == "f":
            norm[c] = s.round(6)
        else:
            norm[c] = s
    df = pd.DataFrame(norm)
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    payload = df.astype(str).to_csv(index=False)
    return cols, len(df), hashlib.sha256(payload.encode()).hexdigest()


names = sys.argv[1:] or sorted(Q.REGISTRY)
results: dict[str, dict] = {}
for name in names:
    spec = Q.REGISTRY[name]
    row: dict = {}
    try:
        sdf = spec.fn(spark, SF_DIR)
        spdf = sdf.toPandas()
        s_cols, s_rows, s_hash = _canon(spdf)
    except Exception:
        row["err"] = "SPARK: " + traceback.format_exc(limit=3).splitlines()[-1]
        results[name] = row
        print(f"FAIL  {name}: {row['err']}", flush=True)
        continue
    if not spec.oracle:
        row.update(spark_rows=s_rows, err="no_oracle")
        results[name] = row
        print(f"NOORA {name}: rows={s_rows}", flush=True)
        continue
    try:
        odf = con.execute(spec.oracle).fetchdf()
        o_cols, o_rows, o_hash = _canon(odf)
    except Exception:
        row["err"] = "ORACLE: " + traceback.format_exc(limit=3).splitlines()[-1]
        results[name] = row
        print(f"FAIL  {name}: {row['err']}", flush=True)
        continue
    row.update(
        rows_match=s_rows == o_rows,
        schema_match=s_cols == o_cols,
        hash_match=s_hash == o_hash,
        spark_rows=s_rows,
        oracle_rows=o_rows,
        err=None,
    )
    results[name] = row
    ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
    tag = "OK   " if ok else "DIFF "
    detail = ""
    if not row["schema_match"]:
        detail = f" spark_cols={s_cols} oracle_cols={o_cols}"
    elif not row["rows_match"]:
        detail = f" spark_rows={s_rows} oracle_rows={o_rows}"
    elif not row["hash_match"]:
        detail = " value-hash mismatch"
    print(f"{tag} {name}{detail}", flush=True)

n_ok = sum(
    1
    for r in results.values()
    if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
)
print(f"\n{n_ok}/{len(results)} fully green")
with open("/tmp/selfgrade.json", "w") as f:
    json.dump(results, f, indent=1)
