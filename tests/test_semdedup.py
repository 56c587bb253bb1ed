"""SemDeDup (operators/semdedup.py) — planted semantic-duplicate groups,
keep-rule verification, blocked-GEMM equivalence, edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.semdedup import semdedup, semdedup_filter


def _corpus(n_unique=30, dup_groups=8, copies=2, dim=16, seed=7):
    """n_unique random unit vectors; the first dup_groups of them each get
    `copies` tiny-noise near-copies.  Returns (rows, group_of_id)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_unique, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, group = [], {}
    nid = 0
    for i in range(n_unique):
        rows.append((nid, base[i].astype(np.float32).tolist()))
        group[nid] = i
        nid += 1
    for i in range(dup_groups):
        for _ in range(copies):
            v = base[i] + rng.normal(scale=1e-3, size=dim)
            v /= np.linalg.norm(v)
            rows.append((nid, v.astype(np.float32).tolist()))
            group[nid] = i
            nid += 1
    return rows, group


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows, group = _corpus()
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    return df.cache(), group


def test_one_survivor_per_group(corpus_df):
    df, group = corpus_df
    out = semdedup(df, eps=0.99, num_clusters=4, seed=3).collect()
    kept = {r.id for r in out if r.keep}
    # every semantic group keeps exactly one member
    by_group = {}
    for r in out:
        by_group.setdefault(group[r.id], []).append(r)
    for g, members in by_group.items():
        assert sum(1 for r in members if r.keep) == 1, f"group {g}"
    # unique (singleton) vectors all survive
    singles = [i for i, g in group.items() if sum(1 for x in group.values() if x == g) == 1]
    assert set(singles) <= kept


def test_verdict_frame_shape(corpus_df):
    df, _ = corpus_df
    out = semdedup(df, eps=0.99, num_clusters=4, seed=3)
    assert out.count() == df.count()
    assert set(out.columns) == {"id", "cluster_id", "centroid_cos", "max_prior_cos", "keep"}
    # exactly one NULL max_prior_cos per non-empty cluster (its first item).
    # Count clusters too: a kernel that emits NaN VALUES instead of nulls
    # (the Arrow serializer does NOT nullify NaN like the pandas one did)
    # makes the filter empty and a bare all(...) vacuously true — r12
    # caught exactly that regression at the oracle, not here.
    firsts = out.filter(F.col("max_prior_cos").isNull()).groupBy("cluster_id").count()
    rows = firsts.collect()
    n_clusters = out.select("cluster_id").distinct().count()
    assert len(rows) == n_clusters
    assert all(r["count"] == 1 for r in rows)
    # and no NaN leaks where nulls belong
    assert out.filter(F.isnan("max_prior_cos")).count() == 0


def test_keep_rule_low_centroid_similarity(corpus_df):
    """Within a duplicate group the survivor is the (centroid_cos, id)-min
    member — the paper's low-centroid-similarity keep rule."""
    df, group = corpus_df
    out = semdedup(df, eps=0.99, num_clusters=4, seed=3).collect()
    by_id = {r.id: r for r in out}
    for g in set(group.values()):
        members = [by_id[i] for i, gg in group.items() if gg == g]
        if len(members) == 1:
            continue
        # near-copies land in one cluster (noise 1e-3 vs unit vectors)
        assert len({m.cluster_id for m in members}) == 1
        survivor = [m for m in members if m.keep]
        assert len(survivor) == 1
        expect = min(members, key=lambda m: (m.centroid_cos, m.id))
        assert survivor[0].id == expect.id


def test_blocked_equals_unblocked(corpus_df):
    df, _ = corpus_df
    a = semdedup(df, eps=0.99, num_clusters=4, seed=3, block_rows=4)
    b = semdedup(df, eps=0.99, num_clusters=4, seed=3, block_rows=1 << 20)
    ra = {(r.id, r.keep, r.cluster_id) for r in a.collect()}
    rb = {(r.id, r.keep, r.cluster_id) for r in b.collect()}
    assert ra == rb


def test_filter_returns_original_schema(corpus_df):
    df, group = corpus_df
    out = semdedup_filter(df, eps=0.99, num_clusters=4, seed=3)
    assert out.columns == df.columns
    n_groups = len(set(group.values()))
    assert out.count() == n_groups


def test_pinned_centroids_single_cluster(spark):
    rows, _ = _corpus(n_unique=10, dup_groups=2, copies=1)
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    cents = np.zeros((1, 16))
    cents[0, 0] = 1.0
    out = semdedup(df, eps=0.99, centroids=cents).collect()
    assert len(out) == len(rows)
    assert {r.cluster_id for r in out} == {0}
    assert sum(1 for r in out if r.keep) == 10


def test_eps_one_keeps_everything(corpus_df):
    """Near-copies have cosine < 1.0 strictly, so eps slightly above their
    similarity keeps all rows."""
    df, _ = corpus_df
    out = semdedup(df, eps=1.0000001, num_clusters=4, seed=3)
    assert out.filter(~F.col("keep")).count() == 0


def test_cluster_cap_raises(corpus_df):
    # the r4 contract, preserved behind auto_split_clusters=False
    df, _ = corpus_df
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(
            df, eps=0.99, num_clusters=1, max_cluster_rows=5,
            auto_split_clusters=False,
        ).count()


def test_autosplit_megacluster_degrades_not_dies(spark):
    """VERDICT r4 #5: a planted mega-cluster (one tight semantic ball far
    over max_cluster_rows) must auto-split and complete — no manual
    re-tune — while still deduplicating within each sub-cluster."""
    rng = np.random.default_rng(11)
    center = rng.normal(size=16)
    center /= np.linalg.norm(center)
    rows = []
    # 400 near-identical copies of one vector — the skewed semantic ball
    for i in range(400):
        v = center + rng.normal(scale=1e-3, size=16)
        v /= np.linalg.norm(v)
        rows.append((i, v.astype(np.float32).tolist()))
    # plus a handful of scattered uniques
    for i in range(400, 420):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((i, v.astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = semdedup(
        df, eps=0.95, num_clusters=4, seed=3, max_cluster_rows=50
    ).collect()
    assert len(out) == 420
    # the ball's rows were split into sub-clusters, each under the cap
    from collections import Counter

    sizes = Counter(r.cluster_id for r in out)
    assert max(sizes.values()) <= 50
    # dedup still happened: the ball keeps at most one row per sub-cluster
    ball = [r for r in out if r.id < 400]
    ball_kept = sum(1 for r in ball if r.keep)
    ball_clusters = {r.cluster_id for r in ball}
    assert ball_kept <= len(ball_clusters)
    # uniques all survive
    assert all(r.keep for r in out if r.id >= 400)


def test_autosplit_identical_vector_flood(spark):
    """Exactly-identical vectors defeat k-means sub-splitting (every row
    ties to one sub-centroid) — the deterministic id-hash fallback must
    bound the groups instead.  Determinism: two runs agree row-for-row."""
    v = (np.arange(16) / 16.0).astype(np.float32).tolist()
    rows = [(i, v) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out1 = sorted(
        semdedup(df, eps=0.95, num_clusters=2, seed=3, max_cluster_rows=40).collect(),
        key=lambda r: r.id,
    )
    from collections import Counter

    sizes = Counter(r.cluster_id for r in out1)
    assert len(out1) == 300 and max(sizes.values()) <= 40
    # one survivor per id-hash bucket (documented degradation bound)
    assert sum(1 for r in out1 if r.keep) == len(sizes)
    out2 = sorted(
        semdedup(df, eps=0.95, num_clusters=2, seed=3, max_cluster_rows=40).collect(),
        key=lambda r: r.id,
    )
    assert [(r.id, r.cluster_id, r.keep) for r in out1] == [
        (r.id, r.cluster_id, r.keep) for r in out2
    ]


def test_zero_vector_survives(spark):
    rows = [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7), (2, [1.0] + [0.0] * 7)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    cents = np.zeros((1, 8))
    cents[0, 0] = 1.0
    out = {r.id: r for r in semdedup(df, eps=0.99, centroids=cents).collect()}
    assert out[0].keep                     # zero vec: cosine 0 to everything
    assert sum(out[i].keep for i in (1, 2)) == 1   # exact dups keep one


def test_distributed_train_fallback(spark, monkeypatch):
    """Force the MLlib cutover (sample*dim above the driver ceiling) and
    check the fallback produces the same one-survivor-per-group verdicts."""
    from knowhere_spark.operators.ivf import IVFFlatIndex

    monkeypatch.setattr(IVFFlatIndex, "_DRIVER_TRAIN_MAX_ELEMS", 8)
    rows, group = _corpus()
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = semdedup(df, eps=0.99, num_clusters=4, seed=3).collect()
    assert len(out) == len(rows)
    by_group = {}
    for r in out:
        by_group.setdefault(group[r.id], []).append(r)
    for g, members in by_group.items():
        assert sum(1 for r in members if r.keep) == 1, f"group {g}"


def test_autosplit_probes_do_not_recompute_assignment(spark):
    """ADVICE r5: _autosplit_overcap must materialize `assigned` once —
    the over-cap probe, per-offender sample-collects and the reassign
    pass then read stored blocks instead of re-running the assignment
    lineage (instrumented here with an accumulator)."""
    import numpy as np

    from knowhere_spark.operators.semdedup import _autosplit_overcap

    acc = spark.sparkContext.accumulator(0)
    n = 400
    rng = np.random.default_rng(5)
    rows = [(i, 0, [float(x) for x in rng.random(8)]) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, cluster_id int, vec array<double>")

    def instrument(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    assigned = df.mapInPandas(instrument, df.schema)
    out, cents2 = _autosplit_overcap(assigned, np.zeros((1, 8)), cap=100, seed=42)
    assert out.count() == n
    assert len(cents2) > 1          # the over-cap cluster actually split
    # exactly ONE pass of the instrumented lineage (the eager checkpoint);
    # before the fix this was 1 + offenders + 2 more full recomputes
    assert acc.value == n
