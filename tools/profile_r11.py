"""Profile a registry entry driver-side: wall time + cProfile top
cumulative functions (py4j socket time = JVM work; everything else =
Python driver work). Steady-state: one untimed warmup run first.

Usage: python tools/profile_r11.py name [name ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.registry import QUERIES  # noqa: E402
from crmint_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("crmint-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from crmint_spark.catalog import TESTDATA_TABLES, load

    for t in TESTDATA_TABLES:
        try:
            load(spark, SF, t).count()
        except Exception:
            pass
    for name in names:
        QUERIES[name](spark, SF).count()  # warmup (plan caches, JIT)
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        QUERIES[name](spark, SF).count()
        pr.disable()
        dt = time.perf_counter() - t0
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        st.print_stats(30)
        print(f"===== {name}: {dt:.3f}s =====")
        print("\n".join(buf.getvalue().splitlines()[:46]))


if __name__ == "__main__":
    main()
