"""Scale probe: video near-dup over real MP4 containers (SCALE.md r8).

Builds N tiny-but-valid MP4s (functions/mp4.encode_mp4),
plants near-copies sharing most keyframes plus one corpus-wide stop
frame (the black-frame / intro-logo analog), and measures:

- container-parse + pHash signature extraction wall (the mapInPandas
  stage every 100 TB video pipeline pays once),
- the exact-hash self-join wall WITH the stop-hash cap vs WITHOUT it,
  and the join-row blowup the cap prevents,
- planted-pair recovery (correctness at scale).

Usage: python tools/scale_probe_video_dedup.py [n_videos] [n_frames]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from knowhere_spark.functions.mp4 import encode_mp4
from knowhere_spark.operators.multimodal import (
    video_frame_phashes,
    video_neardup_pairs,
)

N_VIDEOS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DUP_FRACTION = 0.10

rng = np.random.default_rng(42)
stop_frame = rng.bytes(32)   # present in EVERY video

rows = []
planted = []
originals = []
for i in range(N_VIDEOS):
    if originals and rng.random() < DUP_FRACTION:
        # near-copy of a random original: share all but one real frame
        src_id, src_frames = originals[rng.integers(len(originals))]
        frames = list(src_frames)
        frames[-1] = rng.bytes(32)
        planted.append((min(src_id, i + 1), max(src_id, i + 1)))
    else:
        frames = [rng.bytes(32) for _ in range(N_FRAMES - 1)]
        originals.append((i + 1, frames))
    payload = encode_mp4([stop_frame] + frames)
    rows.append((i + 1, "video", bytearray(payload),
                 {"width": 8, "height": 8, "n_frames": N_FRAMES,
                  "sample_rate": 0}))

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    # the UNCAPPED control run below deliberately provokes the stop-hash
    # join blowup (12.5M join rows at 5k videos) — it needs a real heap
    # to finish so the probe can report the cost instead of dying
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
media = spark.createDataFrame(
    rows,
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
).repartition(32).cache()
media.count()

t0 = time.time()
sigs = video_frame_phashes(media).cache()
n_sigs = sigs.count()
t_sig = time.time() - t0
print(f"signatures: {n_sigs} rows from {N_VIDEOS} videos in {t_sig:.2f}s")

t0 = time.time()
capped = video_neardup_pairs(media, min_overlap=0.6, max_hash_freq=100)
got = {(r.id_a, r.id_b) for r in capped.collect()}
t_cap = time.time() - t0
want = set(planted)
print(f"capped join: {len(got)} pairs in {t_cap:.2f}s "
      f"(planted {len(want)}, recovered {len(got & want)})")

# The uncapped control is quadratic in the stop frame's frequency —
# measured 22s/24g-heap at 5k videos and NON-TERMINATING (>10 min)
# by 20k (SCALE.md).  Only run it at sizes where it can finish.
if N_VIDEOS <= 5000:
    t0 = time.time()
    uncapped = video_neardup_pairs(media, min_overlap=0.6, max_hash_freq=None)
    got_u = {(r.id_a, r.id_b) for r in uncapped.collect()}
    t_un = time.time() - t0
    print(f"uncapped join: {len(got_u)} pairs in {t_un:.2f}s")
    print(f"stop-frame join rows avoided: ~{N_VIDEOS * (N_VIDEOS - 1) // 2:,}")
    print(f"speedup from cap: {t_un / t_cap:.2f}x")
else:
    print(f"uncapped control SKIPPED at {N_VIDEOS} videos: "
          f"~{N_VIDEOS * (N_VIDEOS - 1) // 2:,} stop-frame join rows "
          "do not finish (the cliff is the datapoint)")
assert got & want == want, "planted near-dups not all recovered"
spark.stop()
