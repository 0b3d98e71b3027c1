import sys, time
from vectordb_testbricks_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark('draw9')
for name in sys.argv[1:]:
    fn = getattr(E, name)
    runs = []
    for a in range(2):
        spark.catalog.clearCache()
        spark._jvm.System.gc(); time.sleep(1.0); spark._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn(spark, '/root/testdata/sf0.1').count()
        runs.append(round(time.perf_counter() - t0, 2))
    print(f"DRAW {name} runs={runs} rows={n}", flush=True)
spark.stop()
