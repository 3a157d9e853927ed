"""Regenerate PLANS.md: the formatted physical-plan trees for every
bench.py query (per-node detail sections elided). Run from the repo root:

    python tools/gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# Physical plans — headline bench queries (sf0.001 shapes)

`df.explain("formatted")` operator trees (per-node detail sections elided)
for every `bench.py` query — the evidence behind the plan-audit assertions
in `tests/test_plans.py`: broadcasts where expected, filters pushed to
scans, single exchanges, TakeOrderedAndProject for top-k, no cartesian
products. Plan shapes are scale-free: the same plan compiles at sf100.
"""


def main() -> None:
    from bench import BENCH_QUERIES
    from meos_rs_spark.registry import load_registry
    from meos_rs_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    out = [HEADER]
    for name in BENCH_QUERIES:
        df = reg[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        tree = plan.split("\n\n")[0]
        out.append(f"## {name}\n\n```\n{tree.strip()}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(BENCH_QUERIES)} queries)")


if __name__ == "__main__":
    main()
