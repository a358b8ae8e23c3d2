"""Run the driver-checked registry window on a BARE SparkSession.

The external driver builds its own session (no engine conf: no AQE
settings, no shuffle-partition tuning, default everything). Engine code
must not silently depend on `session.get_session`'s configuration; this
smoke runs the first N registry queries on a vanilla session and reports
row counts only.

    python tools/bare_session_smoke.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, fn in list(entrymod.queries().items())[:n]:
        t0 = time.time()
        try:
            cnt = fn(spark, sf_dir).count()
            print(f"okay {name}: {cnt} rows ({time.time()-t0:.1f}s)")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{len(failures)} failures / {n} checked on bare session")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
