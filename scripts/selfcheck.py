#!/usr/bin/env python3
"""Self-check: run each oracle SQL in DuckDB over the same sf dir and
compare to the Spark result parquet (columns sorted by name, values
stringified) - mimics the driver's correctness gate."""
import duckdb, json, sys, glob, os
sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
fails = []
for name in sorted(glob.glob(f"{outdir}/*/")):
    qname = os.path.basename(name.rstrip("/"))
    spark = con.sql(f"SELECT * FROM '{name}/*.parquet'").df()
    if qname not in oracle:
        print(f"{qname:28s} rows-only ({len(spark)} rows)")
        continue
    try:
        duck = con.sql(oracle[qname]).df()
    except Exception as e:
        print(f"{qname:28s} ORACLE ERROR: {e}"); fails.append(qname); continue
    s = spark[sorted(spark.columns)]; d = duck[sorted(duck.columns)]
    if list(s.columns) != list(d.columns):
        print(f"{qname:28s} COLS MISMATCH {list(s.columns)} vs {list(d.columns)}"); fails.append(qname); continue
    sv = [tuple(str(x) for x in r) for r in s.itertuples(index=False)]
    dv = [tuple(str(x) for x in r) for r in d.itertuples(index=False)]
    if sv == dv:
        print(f"{qname:28s} OK ({len(sv)} rows)")
    else:
        diff = [i for i,(a,b) in enumerate(zip(sv,dv)) if a!=b][:3]
        print(f"{qname:28s} MISMATCH rows={len(sv)}/{len(dv)} first_diffs={[(sv[i],dv[i]) for i in diff][:2]}")
        fails.append(qname)
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
