"""Scale probe: STREAMING video near-dup state growth (SCALE.md r9,
VERDICT r8 #6).

The batch video probe (scale_probe_video_dedup.py) measured the
quadratic cliff the stop-hash cap prevents; this probe measures the
STREAMING twin's other bounded resource — the keyed frame-hash state
store — under a 10⁴-video ingest:

- N videos (real MP4 containers, operators/multimodal.
  synthesize_video_media's planted-dup structure: pairs at d%4==1
  share 3 of 4-6 frames) written as K parquet files and streamed one
  file per micro-batch (maxFilesPerTrigger=1, mtimes pinned);
- per micro-batch: state-store rows + bytes (StreamingQueryProgress
  stateOperators) — the claim under test is state = O(distinct frame
  hashes), growing LINEARLY in videos seen, each key bounded by
  max_hash_freq;
- verdict agreement: the aggregated evidence
  (streaming/dedup.video_match_overlap) must equal the batch operator
  run with denominator="pre_drop" (the documented
  streaming-compatible denominator) on the same corpus.

Usage: python tools/scale_probe_stream_media.py [n_videos] [n_batches]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_VIDEOS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowhere_spark.operators.multimodal import (  # noqa: E402
    synthesize_video_media,
    video_neardup_pairs,
)
from knowhere_spark.streaming.dedup import (  # noqa: E402
    stream_video_neardup,
    video_match_overlap,
)

docs = spark.range(N_VIDEOS).select(F.col("id").alias("doc_id"))
media = synthesize_video_media(docs)

tmp = tempfile.mkdtemp(prefix="knowhere_stream_media_probe_")
src = f"{tmp}/src"
t0 = time.monotonic()
# one file per micro-batch, id-partitioned so arrival order is by id
# range; mtimes spaced so FileStreamSource orders deterministically
media.withColumn(
    "__b", (F.col("media_id") % N_BATCHES).cast("int")
).repartition(N_BATCHES, "__b").drop("__b").write.parquet(src)
files = sorted(
    e.path for e in os.scandir(src) if e.name.endswith(".parquet")
)
now = time.time()
for i, pth in enumerate(files):
    os.utime(pth, (now - 3600 + i * 120, now - 3600 + i * 120))
print(f"# corpus written: {N_VIDEOS} videos, {len(files)} files, "
      f"{time.monotonic() - t0:.1f}s")

stream = (
    spark.readStream.schema(media.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
evidence = stream_video_neardup(stream, max_hash_freq=10_000)
t0 = time.monotonic()
q = (
    evidence.writeStream.format("memory")
    .queryName("probe_evidence")
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

sev = spark.sql("SELECT * FROM probe_evidence")
stream_pairs = video_match_overlap(sev, min_overlap=0.5)
sp = {
    (r.id_a, r.id_b, r.matches, r.overlap) for r in stream_pairs.collect()
}
t0 = time.monotonic()
bp = {
    (r.id_a, r.id_b, r.matches, r.overlap)
    for r in video_neardup_pairs(
        media, min_overlap=0.5, denominator="pre_drop"
    ).collect()
}
batch_wall = time.monotonic() - t0
expected = sum(1 for d in range(1, N_VIDEOS) if d % 4 == 1)

print(f"# stream ingest wall: {stream_wall:.1f}s over {len(files)} batches")
print(f"# batch operator wall: {batch_wall:.1f}s")
print(f"# pairs: stream={len(sp)} batch={len(bp)} expected={expected}")
print(f"# stream==batch: {sp == bp}")
assert sp == bp, "streaming verdicts diverge from batch(pre_drop)"
assert len(sp) == expected, "planted pairs not fully recovered"

# ---- image twin: banded-pHash bucket state at the same corpus size ----
from knowhere_spark.operators.multimodal import (  # noqa: E402
    phash_neardup_pairs,
    synthesize_image_media,
)
from knowhere_spark.streaming.dedup import stream_neardup_images  # noqa: E402

imedia = synthesize_image_media(docs)
isrc = f"{tmp}/isrc"
imedia.withColumn(
    "__b", (F.col("media_id") % N_BATCHES).cast("int")
).repartition(N_BATCHES, "__b").drop("__b").write.parquet(isrc)
ifiles = sorted(
    e.path for e in os.scandir(isrc) if e.name.endswith(".parquet")
)
now = time.time()
for i, pth in enumerate(ifiles):
    os.utime(pth, (now - 3600 + i * 120, now - 3600 + i * 120))

istream = (
    spark.readStream.schema(imedia.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(isrc)
)
t0 = time.monotonic()
iq = (
    stream_neardup_images(istream, max_hamming=3)
    .writeStream.format("memory")
    .queryName("probe_img")
    .outputMode("append")
    .option("checkpointLocation", f"{tmp}/ickpt")
    .trigger(availableNow=True)
    .start()
)
iq.awaitTermination()
istream_wall = time.monotonic() - t0
print("# image micro-batch state growth (banded-pHash buckets):")
print("# batch | inputRows | stateRows | stateMB | batchWall_s")
for p in iq.recentProgress:
    so = (p.get("stateOperators") or [{}])[0]
    if not so:
        continue
    dur = (p.get("durationMs") or {}).get("triggerExecution", 0) / 1000.0
    print(
        f"#  {p.get('batchId')} | {int(p.get('numInputRows', 0))} | "
        f"{so.get('numRowsTotal')} | "
        f"{(so.get('memoryUsedBytes') or 0) / 2**20:.1f} | {dur:.1f}"
    )
isp = {
    (r.id_a, r.id_b, r.hamming)
    for r in spark.sql("SELECT DISTINCT * FROM probe_img").collect()
}
t0 = time.monotonic()
ibp = {
    (r.id_a, r.id_b, r.hamming)
    for r in phash_neardup_pairs(imedia, max_hamming=3).collect()
}
ibatch_wall = time.monotonic() - t0
iexpected = sum(1 for d in range(1, N_VIDEOS) if d % 5 == 1)
print(f"# image stream wall: {istream_wall:.1f}s; batch: {ibatch_wall:.1f}s")
print(f"# image pairs: stream={len(isp)} batch={len(ibp)} expected={iexpected}")
assert isp == ibp, "streaming image verdicts diverge from batch"
assert len(isp) == iexpected, "planted image dups not fully recovered"
print("# PROBE OK")
