"""Scale probe: STREAMING text MinHash near-dup state growth (SCALE.md
r10 — the video/image/audio twins have measured 10k-point state tables;
this closes the last asserted-not-measured streaming state claim).

- N documents: doc ``d`` renders a ~40-token text keyed by ``d - 1``
  when ``d % 4 == 1`` else ``d`` (the planted-dup structure every other
  probe uses), distinct keys giving well-separated shingle sets;
- K parquet files streamed one per micro-batch (maxFilesPerTrigger=1,
  mtimes pinned) through ``stream_neardup_minhash`` at its realistic
  operating point (num_perm=64, 32 bands × 2 rows, threshold 0.8);
- per micro-batch: state-store rows + bytes — the claim under test is
  state = O(docs · bands) signature copies, growing LINEARLY in docs
  seen;
- verdict agreement: the cross-micro-batch pair set must equal the
  batch LSH operator over the full corpus at the same threshold
  (verify=False — the stream's estimator semantics).

Usage: python tools/scale_probe_stream_text.py [n_docs] [n_batches]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
THRESHOLD = 0.8

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowhere_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from knowhere_spark.streaming.dedup import stream_neardup_minhash  # noqa: E402

# deterministic ~40-token text per key: word identities keyed by mixed
# multiples so distinct keys share almost no 3-shingles
key = F.when(
    F.col("doc_id") % 4 == 1, F.col("doc_id") - 1
).otherwise(F.col("doc_id"))
words = F.transform(
    F.sequence(F.lit(0), F.lit(39)),
    lambda i: F.concat(
        F.lit("w"),
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", key.cast("string"), i.cast("string"))),
                1, 8,
            ),
            16, 10,
        ),
    ),
)
docs = spark.range(N_DOCS).select(
    F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
)

tmp = tempfile.mkdtemp(prefix="knowhere_stream_text_probe_")
src = f"{tmp}/src"
t0 = time.monotonic()
docs.withColumn(
    "__b", (F.col("doc_id") % N_BATCHES).cast("int")
).repartition(N_BATCHES, "__b").drop("__b").write.parquet(src)
files = sorted(
    e.path for e in os.scandir(src) if e.name.endswith(".parquet")
)
now = time.time()
for i, pth in enumerate(files):
    os.utime(pth, (now - 3600 + i * 120, now - 3600 + i * 120))
print(f"# corpus written: {N_DOCS} docs, {len(files)} files, "
      f"{time.monotonic() - t0:.1f}s")

stream = (
    spark.readStream.schema(docs.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
t0 = time.monotonic()
q = (
    stream_neardup_minhash(stream, THRESHOLD)
    .writeStream.format("memory")
    .queryName("probe_text")
    .outputMode("append")
    .option("checkpointLocation", f"{tmp}/ckpt")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
stream_wall = time.monotonic() - t0

print("# micro-batch state-store growth:")
print("# batch | inputRows | stateRows | stateMB | batchWall_s")
for p in q.recentProgress:
    so = (p.get("stateOperators") or [{}])[0]
    if not so:
        continue
    dur = (p.get("durationMs") or {}).get("triggerExecution", 0) / 1000.0
    print(
        f"#  {p.get('batchId')} | {int(p.get('numInputRows', 0))} | "
        f"{so.get('numRowsTotal')} | "
        f"{(so.get('memoryUsedBytes') or 0) / 2**20:.1f} | {dur:.1f}"
    )

sp = {
    (r.doc_a, r.doc_b)
    for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM probe_text").collect()
}
t0 = time.monotonic()
bp = {
    (r.doc_a, r.doc_b)
    for r in minhash_lsh_pairs(docs, THRESHOLD, verify=False).collect()
}
batch_wall = time.monotonic() - t0
planted = {(d - 1, d) for d in range(1, N_DOCS) if d % 4 == 1}

print(f"# stream ingest wall: {stream_wall:.1f}s over {len(files)} batches")
print(f"# batch LSH wall: {batch_wall:.1f}s")
print(f"# pairs: stream={len(sp)} batch={len(bp)} planted={len(planted)}")
print(f"# stream==batch: {sp == bp}   planted⊆stream: {planted <= sp}")
assert sp == bp, "streaming pair set diverges from batch LSH"
assert planted <= sp, "planted duplicate pairs not fully recovered"

# ---- ids-only state mode (r10): ~num_perm x smaller state, candidates ----
stream2 = (
    spark.readStream.schema(docs.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
t0 = time.monotonic()
q2 = (
    stream_neardup_minhash(stream2, THRESHOLD, state="ids")
    .writeStream.format("memory")
    .queryName("probe_text_ids")
    .outputMode("append")
    .option("checkpointLocation", f"{tmp}/ckpt_ids")
    .trigger(availableNow=True)
    .start()
)
q2.awaitTermination()
last = [
    p for p in q2.recentProgress if (p.get("stateOperators") or [{}])[0]
][-1]
so = last["stateOperators"][0]
cands = {
    (r.doc_a, r.doc_b)
    for r in spark.sql(
        "SELECT DISTINCT doc_a, doc_b FROM probe_text_ids"
    ).collect()
}
print(
    f"# ids-state mode: final stateRows={so.get('numRowsTotal')} "
    f"stateMB={(so.get('memoryUsedBytes') or 0) / 2**20:.1f} "
    f"wall={time.monotonic() - t0:.1f}s candidates={len(cands)}"
)
assert sp <= cands, "ids-mode candidates must cover the thresholded pairs"
print("# OK")
