import sys, time, statistics
sys.path.insert(0, "/root/repo")
from spark_ibm_mq_spark import registry
from spark_ibm_mq_spark.session import get_spark
registry.load_all_modules()
import pyspark.sql.functions as F
from spark_ibm_mq_spark.tables import load_table, spread

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("simhash-variants")
spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["pricing_summary"](spark, sf_dir).collect()
n_bits = 48

def hof(spread_on):
    d = load_table(spark, sf_dir, "documents")
    arrs = d.select("doc_id", F.array_distinct(F.split(F.trim("text"), "\\s+")).alias("toks"))
    if spread_on:
        arrs = spread(arrs, "doc_id")
    hashed = arrs.select("doc_id", F.transform("toks", lambda t: F.xxhash64(t)).alias("hs"), F.size("toks").alias("n"))
    def bc(b):
        return F.size(F.filter("hs", lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1))
    sim = sum(F.when(bc(b)*2 > F.col("n"), F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint")) for b in range(n_bits))
    sigs = hashed.select("doc_id", sim.alias("simhash")).withColumn("prefix", F.shiftright("simhash", n_bits-12))
    x, y = sigs.alias("x"), sigs.alias("y")
    hamming = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (x.join(y, (F.col("x.prefix")==F.col("y.prefix")) & (F.col("x.doc_id")<F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"), hamming.alias("hamming"))
            .filter(F.col("hamming")<=6))

def explode_form():
    d = load_table(spark, sf_dir, "documents")
    ex = spread(d.select("doc_id", F.array_distinct(F.split(F.trim("text"), "\\s+")).alias("toks")), "doc_id")\
        .select("doc_id", F.explode("toks").alias("t")).select("doc_id", F.xxhash64("t").alias("h"))
    votes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}") for b in range(n_bits)])
    sim = sum(F.when(F.col(f"c{b}")*2 > F.col("n"), F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint")) for b in range(n_bits))
    sigs = votes.select("doc_id", sim.alias("simhash")).withColumn("prefix", F.shiftright("simhash", n_bits-12))
    x, y = sigs.alias("x"), sigs.alias("y")
    hamming = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (x.join(y, (F.col("x.prefix")==F.col("y.prefix")) & (F.col("x.doc_id")<F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"), hamming.alias("hamming"))
            .filter(F.col("hamming")<=6))

variants = {"hof_spread": lambda: hof(True), "hof_nospread": lambda: hof(False), "explode": explode_form}
samples = {k: [] for k in variants}
for rnd in range(5):
    for k, fn in variants.items():
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        samples[k].append(round(time.perf_counter()-t0, 3))
        spark.catalog.clearCache()
for k, v in samples.items():
    print(f"{k:14s} min {min(v):6.3f} median {statistics.median(v):6.3f}  {v}")
spark.stop()
