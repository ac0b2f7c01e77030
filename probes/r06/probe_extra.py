"""Supplemental scale probe: median-of-3 timings (after one warm run)
for the round-5/6 queries the headline bench doesn't carry."""
import json, os, sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))

NAMES = [
    "customer_rfm_segments",
    "part_abc_classification",
    "order_price_quartiles",
    "quantity_rank_profile",
    "q15_top_supplier",
    "hybrid_rrf_knn",
    "hybrid_lexical_dense",
    "doc_bm25_scores",
]

def materialize(df):
    df.write.mode("overwrite").format("noop").save()

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from df_to_azure_spark.plans.registry import REGISTRY
    from df_to_azure_spark.session import get_spark
    spark = get_spark(app_name="probe_extra")
    times = {}
    for name in NAMES:
        fn = REGISTRY[name].spark
        materialize(fn(spark, sf_dir))
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            samples.append(time.monotonic() - t0)
        times[name] = round(sorted(samples)[1], 3)
    print(json.dumps({"sf_dir": sf_dir, "queries": times,
                      "total": round(sum(times.values()), 3)}))

if __name__ == "__main__":
    main()
