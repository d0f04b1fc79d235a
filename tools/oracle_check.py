"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it to
``oracle_sql()`` via DuckDB: row count, schema (column names), and an
order-insensitive value hash (columns sorted by name, rows sorted by their
canonical string). Reports both a bit-exact hash and a 9-significant-digit
rounded hash so float last-bit divergence is visible but distinguishable
from real bugs.

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v, ndigits=None):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if ndigits is not None and v != 0.0:
            return f"{v:.{ndigits}e}"
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x, ndigits) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k], ndigits)}" for k in sorted(v)) + "}"
    return str(v)


def _hash_rows(cols, rows, ndigits=None):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i], ndigits) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from executor_u1mindexer_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown query name(s) {unknown}; available: {sorted(qs)}")
        return 2
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        srows_t = [tuple(r) for r in srows]
        problems = []
        if len(srows_t) != len(orows):
            problems.append(f"rowcount spark={len(srows_t)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            h_s = _hash_rows(scols, srows_t)
            h_o = _hash_rows(ocols, orows)
            if h_s != h_o:
                r_s = _hash_rows(scols, srows_t, ndigits=9)
                r_o = _hash_rows(ocols, orows, ndigits=9)
                if r_s == r_o:
                    problems.append("hash mismatch (bit-level only; 9-digit match)")
                else:
                    problems.append(f"value hash spark={h_s} oracle={h_o} (9-digit also differs)")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows_t)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
