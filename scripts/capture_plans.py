"""Capture ``.explain("formatted")`` for bench/gate queries into
``plans/r13/<query>_<tag>.txt`` (round-13 optimization evidence).

Usage::

    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

With no query names, captures every gate query. Queries whose DataFrame
is produced behind a streaming drain or a localCheckpoint barrier still
capture — the plan shows the returned (probe/read-back) side, which is
what the optimization evidence needs plus the operator-internal plans
asserted by tests/test_plan_scale.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ue_big_data_project_spark import get_spark  # noqa: E402
from ue_big_data_project_spark.queries import (  # noqa: E402
    all_queries,
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    registry = all_queries()
    if not names:
        from ue_big_data_project_spark.queries import GATE_ORDER

        names = list(GATE_ORDER)
    spark = get_spark(app_name=f"plans-{tag}")
    from ue_big_data_project_spark.queries.textops import (
        warm_session_indexes,
    )

    warm_session_indexes(spark, sf_dir)
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - capture tool
            plan = f"ERROR capturing plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
