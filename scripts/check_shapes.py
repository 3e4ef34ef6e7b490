"""Scan every registered query's output schema for driver-canonicalizer hazards.

The driver canonicalizes results with pandas ``sort_values`` over all columns,
which raises ``TypeError: unhashable type`` on array/map/struct columns. This
script builds each query's DataFrame (no collect) and flags non-scalar columns.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

from llm_data_pipeline_spark import queries as Q

Q.load_all()

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("shape-check")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

bad = []
errs = []
for name in sorted(Q.REGISTRY):
    spec = Q.REGISTRY[name]
    try:
        df = spec.fn(spark, SF_DIR)
    except Exception as e:  # noqa: BLE001
        errs.append((name, repr(e)[:200]))
        continue
    hazards = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if hazards:
        bad.append((name, hazards, "ORACLE" if spec.oracle else "no_oracle"))

print(f"total queries: {len(Q.REGISTRY)}")
print(f"with oracle:   {sum(1 for s in Q.REGISTRY.values() if s.oracle)}")
for name, hazards, kind in bad:
    print(f"HAZARD {kind:9s} {name}: non-scalar cols {hazards}")
for name, err in errs:
    print(f"ERROR  {name}: {err}")
if not bad and not errs:
    print("all clear")
