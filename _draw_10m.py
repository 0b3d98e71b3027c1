import os, sys, time, json
os.environ["SPARK_GRAFT_UI"] = "1"
from vectordb_testbricks_spark.session import get_spark
import __spark_entry__ as E
import bench
spark = get_spark('draw10m')
name = sys.argv[1]
t0 = time.perf_counter()
n = getattr(E, name)(spark, '/root/testdata/sf0.1').count()
dt = round(time.perf_counter()-t0,2)
m = bench._stages_since(spark, -1)
print(f"DRAW {name} cold_proc={dt} rows={n} run={m.get('executor_run_sec')} cpu={m.get('executor_cpu_sec')} gc={m.get('executor_gc_sec')} spill={m.get('disk_spill_mb')} shufw={m.get('shuffle_write_mb')}", flush=True)
print("TOP", json.dumps(m.get('top_stages')), flush=True)
spark.stop()
