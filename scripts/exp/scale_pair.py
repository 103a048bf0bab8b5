"""Measure extraction scaling between two local[N] levels.
Usage: python scripts/exp/scale_pair.py N1 N2 [conf_json]"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from octospark.session import get_spark
from pyspark.sql import functions as F
from octospark.pipeline import extract_pages

PATH = "/tmp/octospark_bench_pages_0_1_40.parquet"
conf = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
for n in (sys.argv[1], sys.argv[2]):
    spark = get_spark(app_name="scalepair", master=f"local[{n}]",
                      shuffle_partitions=64, extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(PATH).drop("text")
    def run():
        return extract_pages(pages, salted=True, num_partitions=128).agg(
            F.count("*"), F.bit_xor(F.xxhash64("url","text"))).collect()
    run()
    best = 1e9
    for _ in range(2):
        t0=time.time(); run(); best=min(best, time.time()-t0)
    print(f"local[{n}]: {best:.2f}s -> {200000/best:.0f} pages/s", flush=True)
    spark.stop()
