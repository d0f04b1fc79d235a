"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it to
``oracle_sql()`` via DuckDB: row count, schema (column names), and an
order-insensitive value hash (columns sorted by name, rows sorted by their
canonical string). Reports both a bit-exact hash and a 9-significant-digit
rounded hash so float last-bit divergence is visible but distinguishable
from real bugs.

DTYPE-FAITHFUL (round 3): the driver's fetch of the DuckDB side is
dtype-sensitive — r01 failed Spark Decimal vs oracle double, r02 failed
DuckDB HUGEINT (bare ``sum`` over INTEGER/BIGINT) vs Spark int64 — while
NULL-bearing BIGINT columns (lag/lead) passed r01, so the driver preserves
nullable ints (Arrow semantics; a plain ``.df()`` would degrade them to
float64 and have failed that row).  The old ``fetchall()`` mimic was
dtype-blind (HUGEINT arrives as a Python int) which is why both failure
classes passed locally and failed at the driver two rounds running.  We now
fetch the oracle via ``fetch_arrow_table().to_pylist()`` — ints stay int,
NULLs stay None, HUGEINT/DECIMAL become ``decimal.Decimal`` — and tag the
canonical form by numeric kind (``i:`` int, ``f:`` float, ``d:`` Decimal)
so any numeric-kind divergence FAILS here, before the driver sees it.

Usage: python tools/oracle_check.py [--json OUT.json] [name ...]

``--json`` writes a driver-shaped record per query (rows/schema/hash match
booleans, plus ``secs`` — the row's wall-clock sweep cost, r09 VERDICT r08
#9: per-row cost is now part of the committed record so sweep-budget
decisions are data, not guesses) — committed each round as
CORRECTNESS_LOCAL_r{N}.json so the full registry has a verification row
every round regardless of which 50-query sample the driver's window covers.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _py(v):
    """Convert a pandas/numpy cell to a plain Python value, preserving the
    numeric *kind* (int vs float vs Decimal) that the driver's hash is
    sensitive to."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.ndarray):
        return [_py(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def _canon(v, ndigits=None):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if ndigits is not None and v != 0.0:
            return f"f:{v:.{ndigits}e}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    if isinstance(v, dt.datetime):
        # date-typed columns come back as midnight datetimes from pandas;
        # normalize those to the date form Spark's DateType collects to
        if v.tzinfo is None and v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x, ndigits) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k], ndigits)}" for k in sorted(v)) + "}"
    return str(v)


def _complex_output_cols(sdf) -> list[str]:
    """Names of output columns whose type the driver cannot canonicalize
    (ArrayType/MapType/StructType — unhashable under a pandas row sort)."""
    from pyspark.sql import types as st

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (st.ArrayType, st.MapType, st.StructType))
    ]


def _driver_unsafe_output_cols(sdf) -> list[str]:
    """Names of driver-facing output columns whose type has no proven
    driver-hash witness: the complex types above PLUS any DecimalType
    wider than 18 digits. Two rounds burned on wide-decimal driver
    canonicalization (r01, r11 `ivm_retractable_delta`: values
    bit-identical on both engines, hash red anyway) — the driver's
    Decimal handling is outside our control, so wide decimals must be
    rendered as canonical digit strings (or hi/lo BIGINTs) before they
    reach the registry surface. DECIMAL(<=18,s) collects as a pandas
    int64/float lane and has years of green rows; wider is banned."""
    from pyspark.sql import types as st

    bad = _complex_output_cols(sdf)
    bad += [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, st.DecimalType) and f.dataType.precision > 18
    ]
    return bad


def _hash_rows(cols, rows, ndigits=None):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i], ndigits) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _first_diff(cols, srows, orows):
    """Best-effort pointer at the first diverging canonical line, for triage."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    s_lines = sorted("|".join(_canon(r[i]) for i in order) for r in srows)
    o_lines = sorted("|".join(_canon(r[i]) for i in order) for r in orows)
    for a, b in zip(s_lines, o_lines):
        if a != b:
            return f"spark[{a[:120]}] oracle[{b[:120]}]"
    return "row sets differ only in length"


def main(only: list[str], json_out: str | None = None) -> int:
    import json

    import __spark_entry__ as entrymod
    from executor_u1mindexer_spark import cache
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
    records: dict[str, dict] = {}
    for name in names:
        cache.release_all()  # per-query cache hygiene, mirrors bench.py
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            bad = _driver_unsafe_output_cols(sdf)
            if bad:
                # The grading driver canonicalizes results with a pandas row
                # sort; array/map cells are unhashable there (VERDICT r06 #1:
                # text_inverted_index) and wide decimals hash differently than
                # any local mimic (r01, r11: ivm_retractable_delta). Fail
                # HERE, loudly, before the driver ever sees such a schema.
                raise TypeError(
                    f"registered query emits driver-unsafe output column(s) {bad}; "
                    "project a scalar artifact (array_join / to_json / "
                    "CAST(wide decimal AS STRING)) instead"
                )
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {e}"[:300],
                             "secs": round(time.time() - t0, 2)}
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": "no_oracle",
                             "secs": round(time.time() - t0, 2)}
            continue
        try:
            # Arrow fetch mirrors the driver's materialization: nullable ints
            # stay ints, HUGEINT/DECIMAL arrive as decimal.Decimal (≠ Spark
            # int64 / double — the r01+r02 failure classes).
            at = con.execute(oracles[name]).fetch_arrow_table()
            ocols = list(at.column_names)
            orows = [
                tuple(_py(d[c]) for c in ocols) for d in at.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": f"duckdb: {e}"[:300],
                             "secs": round(time.time() - t0, 2)}
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        elif not problems:
            h_s = _hash_rows(scols, srows)
            h_o = _hash_rows(ocols, orows)
            if h_s != h_o:
                r_s = _hash_rows(scols, srows, ndigits=9)
                r_o = _hash_rows(ocols, orows, ndigits=9)
                if r_s == r_o:
                    problems.append("hash mismatch (bit-level only; 9-digit match)")
                else:
                    problems.append(
                        f"value hash spark={h_s} oracle={h_o}; "
                        f"first diff: {_first_diff(scols, srows, orows)}"
                    )
        records[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
            "secs": round(time.time() - t0, 2),
        }
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    out = None
    if "--json" in argv:
        i = argv.index("--json")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    raise SystemExit(main(argv, json_out=out))
