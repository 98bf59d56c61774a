"""Connected-components clustering for near-duplicate canonicalization.

Pair-producing dedup ops (MinHash-LSH, SimHash, embedding-cosine) emit
*edges*; an actual dedup pipeline must then pick ONE representative per
transitive duplicate cluster.  That closure step is this module: given an
edge list, label every node with its component's minimum id (a stable,
deterministic canonical id), so `keep = (doc_id == cluster_id)` is the
dedup decision.

Algorithm: iterative min-label propagation expressed as DataFrame
joins/aggregations — per round, every node takes the minimum label among
itself and its direct neighbors; convergence after `diameter(component)`
rounds.  Near-dup clusters in a real corpus are dense and shallow
(duplicates of a common source, diameter ≲ 4), so the loop runs 3-5
rounds even at billions of edges.  Each round is one shuffle join on the
edge list plus one aggregation — the same cost envelope as the
large-star/small-star MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) without its neighborhood
re-materialization; switch to that formulation only if components with
very large diameters are expected (chain-shaped graphs), which LSH output
is not.  Lineage is truncated every round with ``localCheckpoint`` so the
plan does not grow with iterations (Spark's iterative-algorithm pitfall).

The reference has no dedup beyond MERGE-on-key (SURVEY §2.3 J1,
`pipelines/stock_api/ingest_stocks.py:84-100`); this is north-star
extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node with the minimum node id reachable via edges.

    Returns ``DataFrame[node, label]`` — `label` is the component id.
    With ``nodes=None`` the node set is derived from the edge list (only
    nodes that can change label); pass an explicit superset to also emit
    isolated nodes, which keep their own id.  Deterministic: the fixpoint
    is unique regardless of execution order.

    Raises ``RuntimeError`` if not converged within ``max_iter`` rounds;
    each round materializes TWO propagation hops, so the cap allows
    component diameters up to 2·max_iter (a real near-dup corpus
    converges in ≤ 3 rounds; hitting the cap means the edge list is
    chain-shaped and the large-star/small-star variant should be used).
    """
    # Materialize the edge list ONCE, before symmetrizing — the union
    # would otherwise execute the (possibly expensive) edge-producing plan
    # upstream (e.g. the full MinHash-LSH pipeline) once per branch, and
    # the loop re-reads the result every round.
    # coalesce before every checkpoint: a checkpointed plan keeps its
    # upstream shuffle partitioning (AQE cannot re-coalesce it), so the
    # edge-incident subgraph — orders of magnitude smaller than whatever
    # produced it — would otherwise drag one task per producer shuffle
    # partition through EVERY propagation round (~5 rounds × 4 stages ×
    # 200 near-empty tasks under a vanilla session; the measured
    # t_dedup_cluster_stats fix). defaultParallelism = one task per core,
    # the same idiom as m_triangle_count's edge cache.
    npart = edges.sparkSession.sparkContext.defaultParallelism
    # Symmetrize + SELF-LOOP by EXPLODING out of one pass rather than
    # unioning branches: a union would execute the (possibly expensive)
    # edge-producing plan once per branch. Self-loops (v, v) for every
    # node make each propagation hop ONE join + ONE agg that consumes the
    # label table exactly once — the old shape consumed it TWICE per hop
    # (left side of an outer join + the nbr_min build), and Spark's
    # ReuseExchange does NOT fire across those differently-keyed
    # consumers (verified r8: the un-persisted plan executed hop 1's
    # join+agg twice per round; a persist() fixes the duplication but
    # measured SLOWER at sf0.01/sf0.1 — cache build + AQE-less cached
    # exchanges cost more than the AQE-coalesced duplicate). The self row
    # also doubles as the old-label carrier for change detection. Row
    # overhead: ≤ one loop row per edge-incident node.
    orient = [
        F.struct(F.col(src_col).alias("a"), F.col(dst_col).alias("b")),
        F.struct(F.col(dst_col).alias("a"), F.col(src_col).alias("b")),
        F.struct(F.col(src_col).alias("a"), F.col(src_col).alias("b")),
        F.struct(F.col(dst_col).alias("a"), F.col(dst_col).alias("b")),
    ]
    sym = edges.select(F.explode(F.array(*orient)).alias("e")).select(
        "e.a", "e.b"
    )
    if nodes is not None:
        # explicit roster (isolated nodes included): their self-loops join
        # the same adjacency; distinct() below absorbs the overlap with
        # the edge-derived loops
        sym = sym.unionByName(
            nodes.select(
                F.col(node_col).alias("a"), F.col(node_col).alias("b")
            )
        )
    adj = sym.distinct().coalesce(npart).localCheckpoint()
    node_set = (
        adj.filter(F.col("a") == F.col("b")).select(
            F.col("a").alias(node_col)
        )
        if nodes is None
        else nodes
    )
    # Early exit on an edge-free graph (r7 verdict item 5): a curated
    # corpus late in dedup has mostly-empty pair batches, and every
    # propagation round costs a serial checkpoint barrier — so when the
    # (already-materialized) adjacency holds no REAL edge, every node is
    # its own singleton component and the answer needs ZERO propagation
    # jobs, no label checkpoint, no convergence probe. first() over the
    # checkpointed blocks is a cheap scan, not a recomputation.
    if adj.filter(F.col("a") != F.col("b")).first() is None:
        return node_set.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("label")
        )
    # The labels checkpoint keeps round 1's plan shape identical to later
    # rounds (checkpoint-scan input), so the loop compiles ONE codegen
    # plan reused every round.
    labels = (
        node_set.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("label")
        )
        .coalesce(npart)
        .localCheckpoint()
    )
    def _hop(lab: DataFrame) -> DataFrame:
        return (
            adj.join(lab, adj.b == lab.node)
            .groupBy("a")
            .agg(
                F.min("label").alias("label"),
                # exactly one self row per node → min() picks its old label
                F.min(F.when(F.col("a") == F.col("b"), F.col("label"))).alias(
                    "_old"
                ),
            )
            .select(
                F.col("a").alias("node"),
                "label",
                (F.col("label") < F.col("_old")).cast("int").alias("_chg"),
            )
        )

    # TWO propagation hops per materialized round: each checkpoint (a
    # full shuffle barrier + driver job) covers distance-2 propagation,
    # halving the serial-barrier count for the shallow components LSH
    # emits — the loop's cost at any scale is barriers, not rows.
    # Convergence needs only the SECOND hop's change flags: hop 2 is a
    # complete propagation step over hop 1's labels, so zero changes in
    # hop 2 means those labels were already the fixpoint (whatever hop 1
    # did). The flag rides inside the checkpointed rows, so detection is
    # a map-side sum over the checkpoint, not a separate join job.
    # (One-hop rounds for tiny graphs were considered and rejected: a
    # diameter-1 graph converges in ONE two-hop round — hop 1 changes,
    # hop 2 proves the fixpoint — vs TWO one-hop barriers, so two-hop
    # rounds are barrier-optimal at every graph size.)
    for _ in range(max_iter):
        stepped = (
            _hop(_hop(labels).drop("_chg"))
            .coalesce(npart)
            .localCheckpoint()
        )
        changed = stepped.agg(F.sum("_chg")).first()[0]
        labels = stepped.drop("_chg")
        if not changed:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Canonicalize near-dup pairs into clusters over the full corpus.

    Returns one row per document: ``[doc_id, cluster_id, is_canonical,
    cluster_size]``.  The canonical representative is the minimum doc_id
    of the cluster — stable under re-runs and independent of partitioning.

    CONTRACT: ``pairs`` must reference only ids present in ``docs`` (the
    natural shape — every registered caller generates pairs FROM the same
    corpus it labels).  Sizes and canonical picks come from the
    edge-derived label table, deliberately NOT from a corpus-relative
    count (which would shuffle all corpus ids a second time just to count
    the handful of multi-member clusters); if ``docs`` were a strict
    subset of the pair universe, a cluster's size would count unseen
    members and its canonical id could fall outside ``docs`` (leaving
    every visible member ``is_canonical=false``).  Filter ``pairs`` to the
    corpus first when labeling a sub-corpus.
    """
    # Iterate ONLY over nodes incident to an edge — in a deduplicated
    # corpus that subgraph is orders of magnitude smaller than the corpus
    # (most documents have no near-dup pair), so the propagation loop
    # shuffles the sparse edge-node set per round while the 100 TB corpus
    # is touched exactly once, by the final left join.
    cc = connected_components(pairs, node_col=id_col, src_col=id_a, dst_col=id_b)
    # Cluster sizes come from the tiny label table (every non-singleton
    # member is edge-incident, so it IS in cc), with absent docs
    # defaulting to size 1 — NOT from a corpus-wide
    # Window.partitionBy(cluster_id), which would shuffle all 100 TB of
    # doc ids a second time just to count the handful of multi-member
    # clusters. The corpus is now touched by exactly one join (broadcast
    # when the edge-incident subgraph fits, AQE decides).
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("_csz"))
    labeled = cc.join(sizes, "label").select(
        "node", F.col("label").alias("_cl"), "_csz"
    )
    return (
        docs.select(id_col)
        .join(labeled, F.col(id_col) == labeled.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_cl"), F.col(id_col)).alias("cluster_id"),
            (
                F.coalesce(F.col("_cl"), F.col(id_col)) == F.col(id_col)
            ).alias("is_canonical"),
            F.coalesce(F.col("_csz"), F.lit(1)).cast("long").alias(
                "cluster_size"
            ),
        )
    )
