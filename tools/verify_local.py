"""Scratch: local replica of the driver's t2 correctness gate at sf0.01."""
import os, sys, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

from vector_db_handler_spark.session import get_spark
from vector_db_handler_spark import driver_queries as dq
from tests.oracle_check import compare

SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

spark = get_spark("verify")
con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

names = sys.argv[1:] or sorted(dq.queries())
oracles = dq.oracle_sql()
fails = []
for name in names:
    fn = dq.queries()[name]
    try:
        df = fn(spark, SF)
        if name in oracles:
            compare(df, con, oracles[name])
            print(f"PASS {name}")
        else:
            n = df.count()
            print(f"ROWS-ONLY {name}: {n} rows")
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}")
        traceback.print_exc(limit=3)
print("FAILURES:", fails if fails else "none")
