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
    df.count()  # execute so AQE finalizes and codegen spans are visible
    print(f"\n## {name}\n")
    print(f"- pushed filters: `{I.pushed_filters(df)}`")
    print(f"- scan read schemas: `{I.scan_read_schemas(df)}`")
    print(
        f"- broadcast joins: {I.broadcast_join_count(df)}, "
        f"shuffles: {I.shuffle_count(df)}, "
        f"whole-stage codegen spans (executed): {I.wholestage_codegen_spans(df)}"
    )
