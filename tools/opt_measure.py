"""Optimization-round measurement harness (guide §1).

Times individual registered queries exactly the way bench.py does
(one discarded warm-up + best-of-REPEATS toPandas) and/or dumps their
``explain("formatted")`` plans to plans/r<round>/<name>_<tag>.txt.

Usage:
  python tools/opt_measure.py time <name> [<name> ...]
  python tools/opt_measure.py plan <tag> <name> [<name> ...]
  python tools/opt_measure.py both <tag> <name> [<name> ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPEATS
(default 5), SPARK_GRAFT_OPT_ROUND (default r16). The noop sink variant
(`SPARK_GRAFT_OPT_SINK=noop`) times computation without the Arrow
driver transfer, per guide §1.4 — used for isolation only; bench.py's
committed methodology (toPandas) is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
ROUND = os.environ.get("SPARK_GRAFT_OPT_ROUND", "r16")
SINK = os.environ.get("SPARK_GRAFT_OPT_SINK", "toPandas")


def main() -> None:
    mode = sys.argv[1]
    if mode in ("plan", "both"):
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]

    import __spark_entry__ as entrymod
    from bench import _folded_compat
    from executor_u1mindexer_spark import cache, plans
    from executor_u1mindexer_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entrymod.queries(), **_folded_compat()}

    out: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        if mode in ("plan", "both"):
            os.makedirs(f"plans/{ROUND}", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/{ROUND}/{name}_{tag}.txt", "w") as f:
                f.write(plans.physical_plan(df, "formatted"))
        if mode in ("time", "both"):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            repeats = []
            for i in range(REPEATS + 1):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                if SINK == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.toPandas()
                dt = time.time() - t0
                if i:
                    repeats.append(dt)
            out[name] = round(min(repeats), 4)
            spark.sparkContext.setJobDescription(None)
            cache.release_all()
    if out:
        print(json.dumps({"sink": SINK, "sf_dir": SF_DIR, "times": out}))


if __name__ == "__main__":
    main()
