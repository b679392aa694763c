"""Driver-contract verify: run every query vs its DuckDB oracle at
sf0.01 exactly like the grading driver (the /verify skill recipe).
Usage: python tools/run_verify.py  — exits nonzero on any MISMATCH."""

import logging
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import ray.data  # noqa: E402

sys.path.insert(0, ".")
import __ray_entry__ as m  # noqa: E402

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def to_df(r):
    return r.to_pandas() if isinstance(r, (ray.data.Dataset, pa.Table)) else r


print("entry:", len(to_df(m.entry())))
bad = []
for name, fn in sorted(m.queries().items()):
    got = to_df(fn(SF))
    sql = m.oracle_sql().get(name)
    if sql is None:
        print(name, len(got), "rows-only")
        continue
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    b = want[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    ok = len(a) == len(b) and all(
        (a[c].astype(float).values == b[c].astype(float).values).all()
        if a[c].dtype.kind == "f"
        else list(a[c].astype(str)) == list(b[c].astype(str))
        for c in cols
    )
    print(name, len(got), "MATCH" if ok else "MISMATCH")
    if not ok:
        bad.append(name)
ray.shutdown()
if bad:
    print("FAILED:", bad)
    sys.exit(1)
print("ALL MATCH")
