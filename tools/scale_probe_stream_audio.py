"""Scale probe: STREAMING audio near-dup state growth (SCALE.md r10,
VERDICT r9 #8 — the video and image twins got measured 10k-point state
tables in r9; this closes the audio gap).

- N audio clips (real PCM16 WAVs): clip ``d`` renders a two-tone signal
  keyed by ``d - 1`` when ``d % 4 == 1`` else ``d`` (the video probe's
  planted-dup structure), tone frequencies pseudo-randomized per key
  under Nyquist, so pairs at ``d % 4 == 1`` are byte-exact duplicates
  (identical SRP hash) and other keys have well-separated spectra;
- K parquet files streamed one per micro-batch (maxFilesPerTrigger=1,
  mtimes pinned) through ``stream_neardup_audio`` at its DEFAULT
  operating point (max_hamming=6, 7 pigeonhole bands);
- per micro-batch: state-store rows + bytes (StreamingQueryProgress
  stateOperators) — the claim under test is state = O(clips · bands),
  growing LINEARLY in clips seen, each bucket capped by max_bucket;
- verdict agreement: the cross-micro-batch pair set must equal the
  batch banding (audio_srp_hash → hamming64_pairs at the same
  max_hamming), which is exactly audio_neardup_pairs' default
  candidate machinery.

Usage: python tools/scale_probe_stream_audio.py [n_clips] [n_batches]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MAX_HAMMING = 6

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowhere_spark.operators.dedup import hamming64_pairs  # noqa: E402
from knowhere_spark.operators.multimodal import (  # noqa: E402
    audio_srp_hash,
    synthesize_audio_media,
)
from knowhere_spark.streaming.dedup import stream_neardup_audio  # noqa: E402

# planted-dup WAV corpus (clip d duplicates d-1 at d % 4 == 1) — the
# library fixture's sparse-pair mode, shared with the bench entry
media = synthesize_audio_media(
    spark.range(N_CLIPS).select(F.col("id").alias("doc_id")), dup_stride=4
)
tmp = tempfile.mkdtemp(prefix="knowhere_stream_audio_probe_")
src = f"{tmp}/src"
t0 = time.monotonic()
media.withColumn(
    "__b", (F.col("media_id") % N_BATCHES).cast("int")
).repartition(N_BATCHES, "__b").drop("__b").write.parquet(src)
files = sorted(
    e.path for e in os.scandir(src) if e.name.endswith(".parquet")
)
now = time.time()
for i, pth in enumerate(files):
    os.utime(pth, (now - 3600 + i * 120, now - 3600 + i * 120))
print(f"# corpus written: {N_CLIPS} clips, {len(files)} files, "
      f"{time.monotonic() - t0:.1f}s")

stream = (
    spark.readStream.schema(media.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
t0 = time.monotonic()
q = (
    stream_neardup_audio(stream, max_hamming=MAX_HAMMING)
    .writeStream.format("memory")
    .queryName("probe_audio")
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
    (r.id_a, r.id_b)
    for r in spark.sql("SELECT * FROM probe_audio").collect()
}
t0 = time.monotonic()
bp = {
    (r.id_a, r.id_b)
    for r in hamming64_pairs(
        audio_srp_hash(media), MAX_HAMMING, id_col="media_id",
        sig_col="ahash",
    ).collect()
}
batch_wall = time.monotonic() - t0
planted = {(d - 1, d) for d in range(1, N_CLIPS) if d % 4 == 1}

print(f"# stream ingest wall: {stream_wall:.1f}s over {len(files)} batches")
print(f"# batch banding wall: {batch_wall:.1f}s")
print(f"# pairs: stream={len(sp)} batch={len(bp)} planted={len(planted)}")
print(f"# stream==batch: {sp == bp}   planted⊆stream: {planted <= sp}")
assert sp == bp, "streaming pair set diverges from batch banding"
assert planted <= sp, "planted duplicate pairs not fully recovered"
print("# OK")
