"""Print PLANS.md-style evidence sections for the given query names.

Usage: python scripts/gen_plan_section.py name1 name2 ... [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_data_pipeline_spark.plans import inspect as I  # noqa: E402
from llm_data_pipeline_spark.queries import REGISTRY, load_all  # noqa: E402
from llm_data_pipeline_spark.session import get_spark  # noqa: E402

load_all()
sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
spark = get_spark("plan-evidence")
spark.sparkContext.setLogLevel("ERROR")

for name in sys.argv[1:]:
    df = REGISTRY[name].fn(spark, sf_dir)
    # structural counts from the PRE-execution plan (no AQE query-stage
    # duplication) — capture before running
    pushed = I.pushed_filters(df)
    schemas = I.scan_read_schemas(df)
    bjoins = I.broadcast_join_count(df)
    shuffles = I.shuffle_count(df)
    # collect() executes THIS dataframe's query execution (count() builds a
    # separate one), so AQE finalizes and codegen spans become visible
    df.collect()
    print(f"\n## {name}\n")
    print(f"- pushed filters: `{pushed}`")
    print(f"- scan read schemas: `{schemas}`")
    print(
        f"- broadcast joins: {bjoins}, "
        f"shuffles: {shuffles}, "
        f"whole-stage codegen spans (executed): {I.wholestage_codegen_spans(df)}"
    )
