"""Ad-hoc parity check for a subset of registry queries (dev loop).

Usage: python tools/quick_parity.py <sf_dir> <query> [<query> ...]
Runs the same comparison as tests/test_oracle_parity.py.
"""

from __future__ import annotations

import math
import sys

import duckdb

from mapreducecore_spark.queries import REGISTRY, _load_all
from mapreducecore_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    _load_all()
    spark = get_spark(app_name="quick-parity", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rc = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            rel = con.sql(spec.oracle)
            dcols = list(rel.columns)
            drows = rel.fetchall()
            if sorted(scols) != sorted(dcols):
                print(f"FAIL {name}: cols spark={scols} duck={dcols}")
                rc = 1
                continue
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if len(ns) != len(nd):
                print(f"FAIL {name}: rows spark={len(ns)} duck={len(nd)}")
                print("  spark head:", ns[:3])
                print("  duck head:", nd[:3])
                rc = 1
                continue
            bad = [(a, b) for a, b in zip(ns, nd) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} value mismatches; first: {bad[0]}")
                rc = 1
            else:
                print(f"OK   {name}: {len(ns)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:400]}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
