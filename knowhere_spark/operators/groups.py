"""Duplicate-group resolution: connected components over near-dup pairs.

Every dedup operator in :mod:`knowhere_spark.operators.dedup` emits *pairs*
``(doc_a, doc_b)``; an actual corpus-curation pipeline must resolve those
pairs into transitive *groups* and keep one canonical document per group.
(A found B and B found C ⇒ A,B,C are one duplicate cluster even if (A,C)
was never emitted.)  This module supplies that step as pure DataFrame
transformations:

- :func:`connected_components` — min-label propagation with path
  compression (the alternating "large-star/small-star" contraction of
  Kiveris et al., *Connected Components in MapReduce and Beyond*, SoCC'14,
  which converges in O(log n) rounds on any graph).  Each round is two
  hash-shuffles on node id; no driver-side graph state, so the same plan
  runs on a 1000-executor cluster.
- :func:`dedup_groups` — pairs → ``(doc_id, group_id, group_size,
  is_canonical)`` with ``group_id = min(doc_id)`` of the component.
- :func:`dedup_filter` — corpus minus non-canonical members: the actual
  "drop the duplicates" step a training pipeline runs.

The reference engine stops at pair/neighbor emission (its Search/RangeSearch
verbs, index_node.h:133-326); group resolution is the training-data
extension layered on top, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: auto-strategy cutover: below this many edges the component resolution
#: runs as driver-side union-find (the dup-pair set is the *duplicate
#: fraction* of a corpus — tiny relative to the corpus, which never
#: collects); above it, the distributed label-propagation loop runs.
DRIVER_MAX_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 25,
    strategy: str = "auto",
) -> DataFrame:
    """Resolve undirected edges into components: ``(doc_id, group_id)``
    where ``group_id`` is the minimum node id reachable from ``doc_id``.

    Algorithm: iterated min-label propagation with path compression —
    each round every node adopts the smallest label in its closed
    neighborhood, then labels are compressed one hop
    (``label = label(label)``), the same contraction family as
    large-star/small-star (Kiveris et al. SoCC'14) with O(log n) round
    convergence.  Per round: one groupBy(node) shuffle + one broadcast-free
    equi-join on label — both scale-safe shapes.  The loop is driver-side
    control flow only (a convergence flag per round, never the data);
    ``localCheckpoint`` truncates the growing lineage each round.

    Only nodes appearing in ``pairs`` are returned (singletons carry no
    dedup information; join back to the corpus for them).

    ``strategy``: ``driver`` collects the edge list once and union-finds
    it in-process — the right call whenever the pair set is small (it is
    the *duplicate fraction* of the corpus; the corpus itself never
    collects), and the same driver/distributed switch the ANN search
    operators use.  ``distributed`` runs the propagation loop; ``auto``
    picks by a bounded edge count against :data:`DRIVER_MAX_EDGES`.
    """
    # symmetric edge list over a canonical node/neighbor naming
    fwd = pairs.select(
        F.col(src_col).cast("long").alias("u"), F.col(dst_col).cast("long").alias("v")
    )
    edge_rows = None
    if strategy == "auto":
        # one bounded collect doubles as the size probe AND the driver-path
        # edge list — the (possibly expensive) pair pipeline upstream runs
        # exactly once either way
        sample = fwd.limit(DRIVER_MAX_EDGES + 1).collect()
        if len(sample) <= DRIVER_MAX_EDGES:
            strategy, edge_rows = "driver", sample
        else:
            strategy = "distributed"
    elif strategy == "driver":
        edge_rows = fwd.collect()
    if strategy == "driver":
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edge_rows:
            ra, rb = find(int(r["u"])), find(int(r["v"]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(n, find(n)) for n in parent]
        return pairs.sparkSession.createDataFrame(
            rows, "doc_id long, group_id long"
        )
    if strategy != "distributed":
        raise ValueError(f"unknown strategy {strategy!r}")
    # pin the forward edge list BEFORE the symmetrize union: both union
    # branches reference the upstream PAIR PIPELINE (a banded LSH join +
    # verify at 100 TB), and Spark does not common-subexpression the
    # lineage across union branches — un-pinned, the whole pipeline
    # executed twice inside the checkpoint action (the same bug class as
    # the r12 HNSW edge symmetrize).  Storage is the duplicate-fraction
    # edge list, 16 B/row.
    fwd = fwd.localCheckpoint(eager=True)
    edges = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    # label(u) starts as min(u, min neighbor) — the first propagation round
    # fused into initialization
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select("u", F.least(F.col("label"), F.col("u")).alias("label"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # propagate: candidate label for u = min over neighbors' labels
        nbr = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # path compression: label(u) <- label(label(u)).  label ids are node
        # ids, so the lookup is a self-join on the labels table.
        lut = updated.select(
            F.col("u").alias("label"), F.col("label").alias("parent")
        )
        compressed = (
            updated.join(lut, "label", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("parent"), F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint(eager=True)

        # converged when no label changed this round (count of diffs — an
        # O(1)-result action, not a collect of the data)
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = compressed
        if changed == 0:
            break

    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("group_id"))


def dedup_groups(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → duplicate groups:
    ``(doc_id, group_id, group_size, is_canonical)``.

    ``group_id`` is the smallest doc_id in the transitive component;
    ``is_canonical`` marks that representative (the member a curation
    pipeline keeps).  One extra shuffle on group_id after the component
    resolution."""
    cc = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    w = Window.partitionBy("group_id")
    return (
        cc.withColumn("group_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("group_id"))
        .select("doc_id", "group_id", "group_size", "is_canonical")
    )


def dedup_filter(
    corpus: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """The curation step itself: drop every non-canonical duplicate from
    ``corpus``, keeping untouched docs and one representative per group.

    A broadcast-friendly left-anti join against the (small relative to the
    corpus) non-canonical id set — the duplicate fraction of a corpus is
    what's dropped, never the corpus itself shuffled."""
    drop = (
        dedup_groups(pairs, src_col=src_col, dst_col=dst_col)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    return corpus.join(drop, id_col, "left_anti")


def dedup_filter_best(
    corpus: DataFrame,
    pairs: DataFrame,
    score_col: str,
    *,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    keep: str = "max",
) -> DataFrame:
    """Quality-aware dedup resolution: keep ONE representative per
    duplicate group — the member with the BEST ``score_col`` (standard
    curation practice: among near-identical copies keep the
    highest-quality one, e.g. ``quality.quality_score`` with
    ``keep="max"`` or an LM perplexity with ``keep="min"``), not the
    arbitrary smallest id :func:`dedup_filter` keeps.  Untouched docs
    pass through; ties break to the smallest doc id (deterministic).

    Plan: component labels → join members to their scores (the dup
    FRACTION of the corpus only, never the whole corpus shuffled) →
    ``max_by``/``min_by`` per group (declarative aggregates with
    map-side partial combine — a hot million-member group arrives at
    its reducer pre-combined per partition, no window straggler; the
    same skew discipline as ``pipeline.dedup_lines_across_corpus``) →
    anti-join of the losers against the corpus."""
    if keep not in ("max", "min"):
        raise ValueError("keep must be 'max' or 'min'")
    cc = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    # a NULL or NaN score must never WIN the group: Spark's struct
    # ordering sorts NULL below and NaN above every real double, so a
    # member whose scorer failed would be kept (min: NULL wins; max:
    # NaN wins) while all validly-scored copies are dropped — exactly
    # backwards.  Missing/NaN scores are pinned to the WORST value for
    # the chosen direction instead (ties still break by id).
    raw = F.col(score_col).cast("double")
    worst = float("-inf") if keep == "max" else float("inf")
    score = F.when(raw.isNull() | F.isnan(raw), F.lit(worst)).otherwise(raw)
    members = cc.join(
        corpus.select(
            F.col(id_col).alias("doc_id"),
            score.alias("__s"),
        ),
        "doc_id",
    )
    did = F.col("doc_id").cast("long")
    if keep == "max":
        # max over (score, -id): higher score wins, ties -> smaller id
        pick = F.max_by("doc_id", F.struct(F.col("__s"), (-did).alias("t")))
    else:
        pick = F.min_by("doc_id", F.struct(F.col("__s"), did.alias("t")))
    winners = members.groupBy("group_id").agg(pick.alias("__keep"))
    drop = (
        members.join(winners, "group_id")
        .filter(F.col("doc_id") != F.col("__keep"))
        .select(F.col("doc_id").alias(id_col))
    )
    return corpus.join(drop, id_col, "left_anti")
