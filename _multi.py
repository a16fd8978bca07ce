import sys, time
sf_dir, name, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
from koby_s_ai_vector_db_spark.session import get_spark
from koby_s_ai_vector_db_spark import registry
spark = get_spark("multi"); spark.sparkContext.setLogLevel("ERROR")
q = registry.queries()[name]
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
ts = []
for _ in range(n):
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts.append(round(time.perf_counter() - t0, 3))
print(f"{name}: {ts} min={min(ts)}")
