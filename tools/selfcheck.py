"""Local twin of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compares row count, sorted
column names, and an order-insensitive value hash. Exercised before every
commit so CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/selfcheck.py [name ...]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import os as _os
SF_DIR = _os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; -0.0 folds to 0.0
        return repr(v + 0.0)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash_frame(pdf) -> tuple[int, list[str], str]:
    import hashlib

    cols = sorted(pdf.columns)
    rows = [
        "\x1f".join(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    digest = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, digest


def main(only: list[str]) -> int:
    import duckdb

    import __spark_entry__ as e
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    names = only or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            s_n, s_cols, s_hash = _hash_frame(sdf)
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({s_n} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
            o_n, o_cols, o_hash = _hash_frame(odf)
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            continue
        status = []
        if s_n != o_n:
            status.append(f"rows {s_n}!={o_n}")
        if s_cols != o_cols:
            status.append(f"cols {s_cols}!={o_cols}")
        if s_hash != o_hash:
            status.append("hash mismatch")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"PASS  {name}: {s_n} rows [{time.time()-t0:.1f}s]")
    print(json.dumps({"checked": len(names), "failed": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
