import json, sys
import duckdb
import pandas as pd
import numpy as np
from pg_lake_spark.session import get_spark, TABLES
import __spark_entry__ as e

spark = get_spark(master="local[16]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

results = {}
names = list(qs)[:50]
for name in names:
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name not in osql:
            results[name] = {"rows": len(sdf), "oracle": None, "ok": True}
            continue
        ddf = con.sql(osql[name]).df()
        a, b = canon(sdf), canon(ddf)
        ok_shape = a.shape == b.shape and list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_shape:
            ok_vals = True
            for c in a.columns:
                av, bv = a[c], b[c]
                try:
                    if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
                        ok = np.allclose(av.astype(float).fillna(-9e99), bv.astype(float).fillna(-9e99), rtol=1e-9, atol=1e-9)
                    else:
                        ok = (av.astype(str).fillna("") == bv.astype(str).fillna("")).all()
                except Exception:
                    ok = (av.astype(str) == bv.astype(str)).all()
                if not ok:
                    ok_vals = False
                    break
        results[name] = {"rows": len(sdf), "oracle_rows": len(ddf), "ok": bool(ok_shape and ok_vals)}
    except Exception as exc:
        results[name] = {"ok": False, "err": f"{type(exc).__name__}: {exc}"[:300]}
    print(name, "OK" if results[name]["ok"] else "FAIL", flush=True)

bad = {k: v for k, v in results.items() if not v["ok"]}
print(json.dumps({"total": len(results), "failed": list(bad), "details": bad}, indent=1))
spark.stop()
