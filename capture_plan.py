"""Capture .explain('formatted') for named queries into plans/r09/.

    python capture_plan.py <suffix> <query> [query...]

suffix is 'before' or 'after'; writes plans/r09/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ticdc_capture_plan")
    from ticdc_spark.queries import QUERIES

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} bytes, {n_ex} Exchange -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
