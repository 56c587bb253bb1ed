"""Scale probe: BATCH audio near-dup — banded SRP default vs the exact
O(n²) verifier (SCALE.md r10, the measurement behind VERDICT r9 #1's
strategy change).

At each corpus size the same planted-dup WAV corpus (clip ``d``
duplicates ``d-1`` at ``d % 4 == 1``, pseudo-randomized two-tone keys)
runs through ``audio_neardup_pairs`` twice:

- ``strategy="banded"`` (the r10 default): seeded SRP hash → pigeonhole
  banded Hamming join → true-cosine verify — pair emission bounded by
  band-bucket collisions, never all-pairs;
- ``strategy="exact"``: brute-force cosine range search — every pair of
  clips GEMM-scored, the all-pairs shape the default replaced.

The claim under test: banded wall grows ~linearly while exact grows
~quadratically, and (at sizes where exact is runnable) the banded pair
set ⊇ planted and its FOUND pairs carry exact cosines.

Usage: python tools/scale_probe_audio_dedup.py [sizes_csv]
       (default 2000,10000,30000 for the A/B; banded-only at 100000)
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SIZES = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [2_000, 10_000, 30_000]
)
BANDED_ONLY = [100_000] if len(sys.argv) <= 1 else []
THRESHOLD = 0.99

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowhere_spark.operators.multimodal import (  # noqa: E402
    audio_neardup_pairs,
    synthesize_audio_media,
)

print("# n_clips | strategy | wall_s | pairs | planted_recovered")
for n in SIZES + BANDED_ONLY:
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = synthesize_audio_media(docs, dup_stride=4).localCheckpoint(
        eager=True
    )
    planted = {(d - 1, d) for d in range(1, n) if d % 4 == 1}
    strategies = ["banded"] if n in BANDED_ONLY else ["banded", "exact"]
    results = {}
    for strat in strategies:
        t0 = time.monotonic()
        pairs = {
            (r.id_a, r.id_b)
            for r in audio_neardup_pairs(
                media, THRESHOLD, strategy=strat
            ).collect()
        }
        wall = time.monotonic() - t0
        results[strat] = pairs
        print(
            f"#  {n} | {strat} | {wall:.1f} | {len(pairs)} | "
            f"{planted <= pairs}"
        )
        assert planted <= pairs, f"{strat}@{n}: planted pairs missed"
    if "exact" in results:
        # banded recall vs exact at the same threshold (precision is
        # structurally 1.0 — banded re-scores candidates exactly)
        missing = results["exact"] - results["banded"]
        extra = results["banded"] - results["exact"]
        assert not extra, f"banded emitted non-exact pairs: {len(extra)}"
        rec = 1 - len(missing) / max(len(results["exact"]), 1)
        print(f"#  {n} | banded recall vs exact: {rec:.4f}")
    media.unpersist()
print("# OK")
