"""Dump ``.explain("formatted")`` for declared registry queries.

Usage: python scripts/dump_plan.py <out_suffix> <query> [<query> ...]

Writes plans/r06/<query>_<out_suffix>.txt for each named query, built
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plans are
captured pre-execution (AdaptiveSparkPlan isFinalPlan=false), which is
what the optimization round's before/after evidence needs: Exchange
placement, join strategy, PushedFilters, Generate/eval-node shape.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(_REPO, "plans", "r06")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from mistral_ocr_spark.plans.queries import REGISTRY
    from mistral_ocr_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
