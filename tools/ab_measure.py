"""Interleaved A/B measurement harness (r17; guide §1 + VERDICT r16 #2).

Runs a registered query alternating an env knob (old/new code path read
at plan-build time) WITHIN one Spark session, several repeats each, and
reports per-variant medians of:

- wall seconds (the bench's number; noisy on a shared host), and
- JVM CPU seconds (utime+stime of the local[*] JVM from /proc — the
  TOTAL-COMPUTE cost. On an idle local[32] box, duplicated subtrees run
  as concurrent stages and hide from wall-clock; they cannot hide from
  CPU time. This is the "judge on total task time" measurement VERDICT
  r16 #2 asked for), and
- Spark job count (serial driver barriers show up here).

Usage:
  SPARK_GRAFT_AB_KNOB=SPARK_GRAFT_PIN_EXACT \\
  python tools/ab_measure.py <name> [<name> ...]

The operator under test must read os.environ[<knob>] ("old"/"new") when
building its plan. Reps via SPARK_GRAFT_AB_REPS (default 6 per variant).
Sink matches bench.py (toPandas) unless SPARK_GRAFT_OPT_SINK=noop.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "6"))
KNOB = os.environ.get("SPARK_GRAFT_AB_KNOB", "SPARK_GRAFT_AB")
SINK = os.environ.get("SPARK_GRAFT_OPT_SINK", "toPandas")


def _jvm_pid() -> int | None:
    """The java child of this python process (local-mode driver JVM)."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if parts[1].strip("()") == "java" and int(parts[3]) == me:
                return int(pid)
        except OSError:
            continue
    return None


def _cpu_s(pid: int) -> float:
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    hz = os.sysconf("SC_CLK_TCK")
    return (int(parts[13]) + int(parts[14])) / hz


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entrymod
    from bench import _folded_compat
    from executor_u1mindexer_spark import cache
    from executor_u1mindexer_spark.session import get_spark

    spark = get_spark("ab-measure")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entrymod.queries(), **_folded_compat()}
    jpid = _jvm_pid()
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = registry[name]
        rows: dict[str, dict[str, list[float]]] = {
            v: {"wall": [], "cpu": [], "jobs": []} for v in ("old", "new")
        }
        # one discarded warm-up per variant
        for v in ("old", "new"):
            os.environ[KNOB] = v
            fn(spark, SF_DIR).toPandas()
            cache.release_all()
        for i in range(REPS):
            for v in ("old", "new"):
                os.environ[KNOB] = v
                group = f"ab:{name}:{v}:{i}"
                spark.sparkContext.setJobGroup(group, group)
                c0 = _cpu_s(jpid) if jpid else 0.0
                t0 = time.time()
                df = fn(spark, SF_DIR)
                if SINK == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.toPandas()
                wall = time.time() - t0
                cpu = (_cpu_s(jpid) - c0) if jpid else 0.0
                njobs = len(tracker.getJobIdsForGroup(group))
                spark.sparkContext.setJobGroup(None, None)
                rows[v]["wall"].append(wall)
                rows[v]["cpu"].append(cpu)
                rows[v]["jobs"].append(njobs)
                cache.release_all()
        out = {
            "name": name,
            "knob": KNOB,
            "sink": SINK,
            "reps": REPS,
        }
        for v in ("old", "new"):
            out[v] = {
                "wall_median": round(statistics.median(rows[v]["wall"]), 4),
                "wall_all": [round(x, 3) for x in rows[v]["wall"]],
                "cpu_median": round(statistics.median(rows[v]["cpu"]), 4),
                "cpu_all": [round(x, 3) for x in rows[v]["cpu"]],
                "jobs": rows[v]["jobs"][0],
            }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
