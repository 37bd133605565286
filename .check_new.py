"""Ad-hoc strict parity check for a subset of queries (driver-faithful)."""
import os, sys
sys.path.insert(0, '/root/repo')
import duckdb
os.environ.setdefault("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
SF = os.environ["SPARK_GRAFT_TEST_SF"]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.local.dir","/root/repo/.spark-tmp")
    .config("spark.ui.enabled","false")
    .config("spark.driver.memory","8g")
    .getOrCreate())
from fame2pygen_spark.queries import QUERIES, ORACLES
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
names = sys.argv[1:]
fail = 0
for name in names:
    try:
        sdf = QUERIES[name](spark, SF)
        srows = sdf.collect(); scols = sdf.columns
        od = con.execute(ORACLES[name]).fetchall(); ocols = [d[0] for d in con.description]
        def norm(rows, cols):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            data = [tuple(r[i] for i in order) for r in rows]
            data.sort(key=lambda r: [(v is None, str(v)) for v in r])
            return [cols[i] for i in order], data
        sc, sd = norm([tuple(r) for r in srows], scols)
        oc, od2 = norm(od, ocols)
        ok = sc == oc and len(sd) == len(od2) and all(
            all((a is None and b is None) or (a is not None and b is not None and str(a)==str(b)) for a,b in zip(r1,r2))
            for r1,r2 in zip(sd,od2))
        print(name, "rows", len(sd), "vs", len(od2), "cols", sc==oc, "OK" if ok else "MISMATCH")
        if not ok:
            fail += 1
            for r1, r2 in zip(sd, od2):
                if [str(v) for v in r1] != [str(v) for v in r2]:
                    print("  spark :", r1); print("  oracle:", r2); break
            if len(sd) != len(od2):
                print("  spark sample:", sd[:3]); print("  oracle sample:", od2[:3])
    except Exception as ex:
        fail += 1
        print(name, "ERROR", type(ex).__name__, str(ex)[:500])
spark.stop()
sys.exit(1 if fail else 0)
