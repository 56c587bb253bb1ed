"""One-off SCALE probe (VERDICT r11 #5): the TEXT pipeline at 1M docs —
WARC ingest → HTML→text extraction → signal pass → MinHash-LSH dedup →
full curate chain, each phase timed with shuffle read/write bytes from
the Spark status store.

The vector side has 1M-row probes (SCALE.md); text evidence previously
topped out at bench sf0.1 (~10-100k docs).  Fixture: 1M synthetic HTML
pages in 200 whole-file-gzipped WARC segments — unique 50-token docs
from a 30k vocab, with ~2% planted near-dup pairs (adjacent ids sharing
all but 2 tokens, J≈0.92 > the 0.7 threshold) so the dedup stage has
real work whose expected output is known.

Run:  python tools/scale_probe_text_1m.py [n_docs] [workdir]
Results go to SCALE.md (r12 section); fixture generation is untimed.
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DOCS_PER_SEG = 5000
VOCAB = 30_000
TOKENS_PER_DOC = 50


def _gen_fixture(workdir: str) -> tuple[int, int]:
    """Write N_DOCS HTML pages as WARC segments; returns (n_segments,
    total_bytes).  Deterministic (seeded numpy)."""
    from knowhere_spark.sources.warc import (
        encode_http_response,
        encode_warc_record,
    )

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(VOCAB)])
    os.makedirs(workdir, exist_ok=True)
    n_seg = N_DOCS // DOCS_PER_SEG
    total = 0
    for seg in range(n_seg):
        ids = seg * DOCS_PER_SEG + np.arange(DOCS_PER_SEG)
        toks = vocab[rng.integers(0, VOCAB, (DOCS_PER_SEG, TOKENS_PER_DOC))]
        # planted near-dups: id with id%50==2 copies id-1's tokens except
        # the last two -> J = 48/52 ~ 0.92 within the pair, unique corpus
        # elsewhere (random 50-of-30k token sets collide at J ~ 0.002)
        dup_rows = np.nonzero(ids % 50 == 2)[0]
        dup_rows = dup_rows[dup_rows > 0]
        toks[dup_rows, :-2] = toks[dup_rows - 1, :-2]
        recs = []
        for i in range(DOCS_PER_SEG):
            text = " ".join(toks[i])
            html = (
                "<html><head><title>doc %d</title><style>p{color:red}"
                "</style><script>track(%d);</script></head><body><p>%s"
                "</p><!-- c --></body></html>" % (ids[i], ids[i], text)
            ).encode()
            recs.append(
                encode_warc_record(
                    "response",
                    encode_http_response(html),
                    url=f"http://probe.example/{ids[i]}",
                )
            )
        data = gzip.compress(b"".join(recs), compresslevel=1)
        with open(os.path.join(workdir, f"seg{seg:04d}.warc.gz"), "wb") as fh:
            fh.write(data)
        total += len(data)
    return n_seg, total


def _shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages
    so far, via the app status store (UI-less)."""
    try:
        store = spark._jsparkSession.sparkContext().statusStore()
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        lst = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        rd = wr = 0
        for i in range(lst.size()):
            s = lst.apply(i)
            rd += s.shuffleReadBytes()
            wr += s.shuffleWriteBytes()
        return rd, wr
    except Exception:
        return -1, -1


def main() -> None:
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/knowhere_text_1m"
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("knowhere-scale-text-1m")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from knowhere_spark.functions.text import (
        bpe_token_count_expr,
        fingerprint_expr,
        langid_expr,
        quality_features_expr,
    )
    from knowhere_spark.operators.dedup import minhash_lsh_pairs
    from knowhere_spark.operators.pipeline import curate_corpus
    from knowhere_spark.sources.warc import (
        read_warc,
        warc_responses_to_documents,
    )

    print(f"# n_docs={N_DOCS} cpus={CPUS} load1={os.getloadavg()[0]:.1f}")
    if not os.path.isdir(workdir) or not os.listdir(workdir):
        t0 = time.monotonic()
        n_seg, nbytes = _gen_fixture(workdir)
        print(
            f"# fixture: {n_seg} segments, {nbytes / 1e6:.0f} MB gz, "
            f"{time.monotonic() - t0:.0f}s (untimed)"
        )

    marks = [("start", time.monotonic(), *_shuffle_totals(spark))]

    def phase(name: str):
        t = time.monotonic()
        rd, wr = _shuffle_totals(spark)
        p_name, p_t, p_rd, p_wr = marks[-1]
        print(
            f"{marks[-1][0]}: wall={t - p_t:.1f}s "
            f"shuffle_read={(rd - p_rd) / 1e6:.0f}MB "
            f"shuffle_write={(wr - p_wr) / 1e6:.0f}MB "
            f"load1={os.getloadavg()[0]:.1f}"
        )
        marks.append((name, t, rd, wr))

    # 1. crawl front door: binaryFile listing -> per-file parse ->
    #    codegen'd HTML->text -> documents shape, materialized
    docs = warc_responses_to_documents(read_warc(spark, workdir)).cache()
    n = docs.count()
    marks[-1] = ("ingest+extract(n=%d)" % n, *marks[-1][1:])
    phase("signals")

    # 2. signal pass: quality features + langid + fingerprint + BPE-ish
    #    budget in one select, forced with a noop write (zero shuffle)
    feats = quality_features_expr(F.col("text"))
    sig = docs.select(
        "doc_id",
        *[v.alias(k) for k, v in feats.items()],
        langid_expr(F.col("text")).alias("lang"),
        fingerprint_expr(F.col("text")).alias("fp"),
        bpe_token_count_expr(F.col("text")).alias("bpe_tokens"),
    )
    sig.write.format("noop").mode("overwrite").save()
    phase("minhash_pairs")

    # 3. MinHash-LSH near-dup pairs (banded, verify=True)
    pairs = minhash_lsh_pairs(docs, 0.7, id_col="doc_id", text_col="text")
    n_pairs = pairs.count()
    expected = sum(1 for i in range(N_DOCS) if i % 50 == 2 and i > 0)
    marks[-1] = (
        f"minhash_pairs(pairs={n_pairs},planted={expected})",
        *marks[-1][1:],
    )
    phase("curate_full")

    # 4. the full curate chain (quality gate -> LSH -> CC dedup -> split)
    kept = curate_corpus(docs, min_tokens=5, jaccard_threshold=0.7)
    n_kept = kept.count()
    marks[-1] = (f"curate_full(kept={n_kept})", *marks[-1][1:])
    phase("end")

    t_all = marks[-1][1] - marks[0][1]
    print(f"# total={t_all:.1f}s docs_per_sec={N_DOCS / t_all:.0f}")
    spark.stop()
    if os.environ.get("KEEP_FIXTURE") != "1":
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
