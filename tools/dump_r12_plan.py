"""Dump `.explain("formatted")` for named registry queries into
plans/r12/<name>_<tag>.txt (the optimization round's before/after plan
evidence).

Usage: python tools/dump_r12_plan.py <before|after> name [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.registry import QUERIES  # noqa: E402
from crmint_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("crmint-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r12/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote plans/r12/{name}_{tag}.txt")


if __name__ == "__main__":
    main()
