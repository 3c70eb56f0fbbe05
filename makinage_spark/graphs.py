"""Distributed graph analytics on DataFrames.

Companion to :mod:`makinage_spark.dedup`'s connected components (duplicate
clustering): the same edges-as-rows representation, driven by join-aggregate
rounds instead of RDD message passing. Extends the reference's scope (the
reference tree has no graph operators); north-star rows in SURVEY §2 cover
graph-shaped corpus analyses (link graphs, citation ranks) that a
training-data pipeline runs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Target rows per partition for persisted loop-invariant graph relations.
_EDGES_PER_PARTITION = 250_000


def _graph_parts(n_rows: int) -> int:
    """Partition count for a persisted loop-invariant graph relation:
    ~250k rows/partition with a floor of 4. Deliberately UNCAPPED by the
    session's ``spark.sql.shuffle.partitions`` (r8): a 10B-edge graph on an
    untuned session (shuffle.partitions=200, or 8 on a notebook) must land
    at ~40k partitions, not be squeezed to the session config — the whole
    point of sizing to the data is that the data, not the session default,
    picks the width."""
    return max(4, n_rows // _EDGES_PER_PARTITION + 1)


def _sized_persist(df: DataFrame, key: str = "src") -> DataFrame:
    """Persist a derived graph relation SIZED TO ITS OWN ROW COUNT
    (~250k rows/partition, floor 4) — the shared policy of every iterative
    loop here and of dedup.connected_components. A graph derived from a
    corpus inherits the corpus's partition count, so each iteration's map
    stages schedule a corpus-width task wave over near-empty cached blocks
    (cached plans do not get AQE re-coalescing by default); conversely a
    huge graph built under a small session config inherits TOO FEW
    partitions, so the rule resizes in BOTH directions (r8 — previously
    the count was capped at the session's shuffle partitions, which would
    squeeze a 10B-edge graph onto an 8-partition notebook session). The
    count doubles as the materialization barrier the self-joining
    iteration bodies need anyway."""
    df = df.persist()
    n = df.count()
    parts = _graph_parts(n)
    if parts != df.rdd.getNumPartitions():
        sized = df.repartition(parts, key).persist()
        sized.count()
        df.unpersist()
        return sized
    return df


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    broadcast_ranks: bool = False,
    assume_distinct: bool = False,
    dangling: str = "drop",
    personalize: DataFrame | None = None,
) -> DataFrame:
    """Damped power-iteration PageRank over a directed edge list.

    Returns ``(id, rank_nanos, rank)`` for every node that appears in
    ``edges``: ``rank_nanos`` is the rank in fixed-point nano-units (bigint,
    1e9 = total mass 1.0) and ``rank`` the single IEEE division
    ``rank_nanos / 1e9``.

    Engine-portable determinism: float sums across a shuffle are
    order-dependent, so all mass accounting is FIXED-POINT — each node's
    out-contribution ``rank_nanos / outdeg`` is snapped to an integer with
    ``floor(x + 0.5)`` (half-up pinned; built-in ROUND is HALF_UP on Spark
    but half-even on DuckDB/Postgres, which diverges by one ulp) BEFORE the
    per-destination sum. Integer addition is associative, so the result is
    identical regardless of partitioning and matches a single-threaded SQL
    oracle bit-for-bit. Every double op in the update runs on exact integer
    inputs below 2^53, so it is deterministic on any IEEE engine.

    Scale shape: each iteration is one hash join of the |V|-row rank vector
    to the edge list on ``src`` plus one shuffle-aggregate on ``dst`` — the
    textbook distributed formulation. Out-degrees are pre-joined into the
    edge list ONCE as a persisted loop invariant ``(src, dst, outdeg)``, so
    no iteration ever re-joins the degree table; the per-edge contribution
    ``half_up(rank_nanos / outdeg)`` depends only on src-level values, so
    computing it per edge row is bit-identical to the per-source
    formulation. With ``broadcast_ranks=True`` the rank
    vector is broadcast instead, so the edge list moves ONCE per iteration
    (the map-side-combined ``dst`` aggregate) rather than twice — the right
    choice whenever |V| fits in executor memory (up to tens of millions of
    nodes; beyond that leave it off and let AQE pick the join). The returned plan unrolls
    ``iterations`` rounds of lineage; for iterations ≳ 8 on a real cluster,
    checkpoint the rank vector every few rounds to truncate lineage (same
    pattern as dedup.connected_components' pointer jumping).

    Caching contract: the loop-invariant relations (``e``, ``ew``, ``base``)
    are persisted lazily and materialize when the caller first evaluates the
    returned plan — they CANNOT be unpersisted here without defeating the
    cache. Callers running many pagerank calls in one session should
    ``spark.catalog.clearCache()`` between evaluations (bench.py does).

    Personalized PageRank: pass ``personalize`` — a DataFrame whose first
    column is the restart node-id set S — and all teleport mass (both the
    initial vector and the per-iteration ``(1-d)`` term) concentrates
    uniformly on S instead of on all nodes: the random-walk-with-restart
    scores used for seed-relative relevance (e.g. propagating quality from
    trusted seed domains through a web graph). S is broadcast (seed sets are
    small by construction); non-seed nodes start at 0 and receive mass only
    through edges. With ``dangling="drop"`` (required for now) dangling mass
    vanishes exactly as in the uniform case.

    Dangling nodes (no out-edges): ``dangling="drop"`` (default) lets their
    mass vanish, matching the common sparse formulation;
    ``dangling="redistribute"`` applies the textbook correction — each
    iteration sums the exact fixed-point mass held by dangling nodes (one
    anti-join + 1-row aggregate, broadcast back in-plan) and spreads the
    per-node share ``half_up(dangling_nanos / n)`` uniformly inside the
    damped term, so total mass is conserved up to rounding. Nodes never
    referenced by any edge are absent.
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be drop|redistribute, got {dangling!r}")
    half_up = lambda x: F.floor(x + F.lit(0.5)).cast("bigint")  # noqa: E731
    # loop invariants: persist, or every unrolled round re-derives the edge
    # list from source lineage (measured 4× total-work blowup at 3 rounds).
    # SIZED persist (r8): e inherits corpus-width partitioning from its
    # lineage, and nodes/outdeg/ew are all derived from it — sizing the
    # FIRST materialization means every downstream pass (the nodes
    # distinct, the degree agg, the ew join+count) runs over ~250k-row
    # cached blocks instead of corpus-width near-empty ones. Interleaved
    # min-of-3 at sf0.1 (1.17M sym edges, 3 iters, broadcast ranks):
    # 6.6 → 3.6 s end-to-end vs sizing only ew.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # duplicate edges would double-count contributions; callers that
        # guarantee uniqueness (assume_distinct=True) skip this E-sized shuffle
        e = e.distinct()
    e = _sized_persist(e, key="src")
    # persisted (r13): nodes is referenced TWICE — the n_df 1-row count that
    # broadcasts into base, and base itself — and without the persist the
    # |V| union-distinct over the edge cache computed twice per evaluation
    # (two back-to-back full-width jobs in the sf1 event-log breakdown).
    # |V| rows is tiny next to the edge cache this function already holds;
    # same clearCache-between-evaluations contract as e/ew/base. Measured
    # interleaved min-of-3, ranks asserted bit-identical
    # (tools/pagerank_nodes_ab_r13.py): sf0.1 3.635 → 3.513 s, sf1 (10×
    # fixture) 8.251 → 7.729 s.
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    # outdeg is consumed once to build ew; only the redistribute path re-reads
    # it (per-iteration dangling anti-join), so only that path caches it —
    # persisting on the drop path would hold edge-scale state for the whole
    # session with zero reuse
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if dangling == "redistribute":
        outdeg = outdeg.persist()
    # loop invariant: edges annotated with their source's out-degree, so the
    # iteration body is a single join (rank vector → weighted edges) instead
    # of rank⋈outdeg followed by edges⋈emitting.
    # The persisted invariant is SIZED TO THE GRAPH (~250k edges/partition,
    # floor 4) — same policy as dedup.connected_components: a derived graph
    # inherits the corpus's partition count, and every iteration then
    # schedules a corpus-width task wave over near-empty cached blocks
    # (cached plans don't get AQE re-coalescing by default). Measured at
    # sf0.1 (1.17M sym edges, 3 iters, broadcast ranks): 7.97 → 3.63 s.
    # At 100 TB the same rule yields thousands of partitions — it is a
    # sizing rule, not a small-data shortcut. Routed through _sized_persist
    # (r8) so the guard compares against the relation's ACTUAL partition
    # count, not the session shuffle-partitions config, and upsizes huge
    # graphs on untuned sessions; its count doubles as the materialization
    # barrier for the persisted edge list.
    ew = _sized_persist(e.join(outdeg, "src"), key="src")
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    if personalize is not None:
        if dangling != "drop":
            raise ValueError("personalize currently requires dangling='drop'")
        seeds = personalize.select(
            F.col(personalize.columns[0]).alias("id")
        ).distinct()
        s_df = seeds.agg(F.count(F.lit(1)).cast("double").alias("s"))
        base = (
            nodes.join(
                F.broadcast(seeds.select("id", F.lit(1).alias("is_seed"))),
                "id",
                "left",
            )
            .select("id", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(s_df))
            .persist()
        )
        carry = ["id", "n", "s", "is_seed"]
        ranks = base.select(
            *carry,
            F.when(
                F.col("is_seed") == 1, half_up(F.lit(1.0e9) / F.col("s"))
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("rank_nanos"),
        )
        tele = F.when(
            F.col("is_seed") == 1, (1.0 - damping) * 1.0e9 / F.col("s")
        ).otherwise(F.lit(0.0))
    else:
        base = nodes.crossJoin(F.broadcast(n_df)).persist()
        carry = ["id", "n"]
        ranks = base.select(
            *carry, half_up(F.lit(1.0e9) / F.col("n")).alias("rank_nanos")
        )
        tele = (1.0 - damping) * 1.0e9 / F.col("n")
    maybe_bc = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iterations):
        emitting = ranks.select(F.col("id").alias("src"), "rank_nanos")
        contrib = (
            ew.join(maybe_bc(emitting), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(
                    half_up(F.col("rank_nanos").cast("double") / F.col("outdeg"))
                ).alias("contrib")
            )
        )
        updated = base.join(maybe_bc(contrib), "id", "left")
        received = F.coalesce(F.col("contrib"), F.lit(0))
        if dangling == "redistribute":
            # exact bigint mass held by out-degree-0 nodes this round; the
            # 1-row aggregate broadcasts back into the update in-plan
            dang = (
                ranks.join(outdeg, ranks.id == outdeg.src, "left_anti")
                .agg(
                    F.coalesce(F.sum("rank_nanos"), F.lit(0))
                    .cast("bigint")
                    .alias("dang_nanos")
                )
            )
            updated = updated.crossJoin(F.broadcast(dang))
            received = received + half_up(
                F.col("dang_nanos").cast("double") / F.col("n")
            )
        ranks = updated.select(
            *carry,
            half_up(
                tele + damping * received.cast("double")
            ).alias("rank_nanos"),
        )
    return ranks.select(
        "id",
        "rank_nanos",
        (F.col("rank_nanos").cast("double") / F.lit(1.0e9)).alias("rank"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    assume_distinct: bool = False,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan/Albert/Kumara
    2007) — community detection as the fourth graph fixpoint family after
    :func:`pagerank`, :func:`hits` and connected components.

    Every node starts labeled with its own id; each round, SYNCHRONOUSLY,
    every node adopts the label most frequent among its neighbors' current
    labels, ties broken by the SMALLEST label. Both the synchronous schedule
    and the min-tie-break are part of the operator contract: the textbook
    asynchronous/random-tie variant is non-deterministic, which would make
    the result partitioning-dependent and oracle-uncheckable. All counts are
    integers, so every iterate is bitwise partitioning-invariant.

    Per iteration: one hash join of the |V|-row label vector to the edge
    list on ``dst`` + one shuffle-aggregate on ``(src, label)`` + the argmax
    fold — the argmax is a ``max(struct(count, -label))`` single groupBy, NOT
    a row_number window, so it map-side combines and never materializes the
    per-label ranking. Same scale shape as pagerank (edge list persists as
    the loop invariant; label vector is |V| rows). For iterations ≳ 8 on a
    real cluster, checkpoint the label vector every few rounds to truncate
    the unrolled lineage.

    Single-reference lineage: only nodes WITH out-edges ever receive votes,
    and that set is static, so the loop updates just the voter partition and
    unions the (static) sink-only labels back per round — each iterate
    references its predecessor exactly ONCE. The naive formulation (left
    join each new vector onto the previous to carry sinks forward) refers to
    the predecessor twice, doubling the unrolled plan per round — measured
    3.5× total work at 3 iterations (the CC ``stepped`` defect class,
    VERDICT r5 #4).

    Caching contract: the persisted edge list materializes when the caller
    evaluates the returned plan and is not unpersisted here; call
    ``spark.catalog.clearCache()`` between repeated invocations (the same
    contract as pagerank/hits).

    Returns ``(id, community)`` — community = the node's label after
    ``iterations`` rounds. Isolated endpoints cannot occur (every node in an
    edge list has degree ≥ 1); nodes never referenced by any edge are absent.
    """
    if iterations < 1:
        raise ValueError("label_propagation needs at least 1 iteration")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # duplicate edges would double-weight a neighbor's vote
        e = e.distinct()
    # sized on "dst": the per-round votes join probes e on dst
    e = _sized_persist(e, key="dst")
    all_nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # sink-only nodes (dst-only in a directed graph) receive no votes in ANY
    # round — their label is frozen at the seed; splitting them out ONCE
    # removes the per-round carry-forward left join (and with it the double
    # reference to the previous iterate). On symmetric graphs this set is
    # empty and the union is a no-op.
    sinks = all_nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).withColumn("label", F.col("id").cast("bigint")).persist()
    voters = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id").cast("bigint"))
    )
    for _ in range(iterations):
        full = voters.union(sinks)
        votes = e.join(
            full.select(F.col("id").alias("dst"), F.col("label").alias("nb_label")),
            "dst",
        )
        cnt = votes.groupBy(F.col("src").alias("id"), "nb_label").agg(
            F.count(F.lit(1)).alias("c")
        )
        # argmax(count) with min-label tie-break as one associative aggregate:
        # max over (c, -label) structs == highest count, then smallest label
        voters = (
            cnt.groupBy("id")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("nb_label")).alias("nl"))).alias("m")
            )
            .select("id", (-F.col("m.nl")).cast("bigint").alias("label"))
        )
    return voters.union(sinks).select("id", F.col("label").alias("community"))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    assume_distinct: bool = False,
) -> DataFrame:
    """HITS hubs & authorities over a directed edge list — the second graph
    fixpoint family after :func:`pagerank`, and the natural centrality pair
    for BIPARTITE corpora (queries↔documents, customers↔suppliers).

    Mutual recursion ``auth_{t+1}(v) = Σ_{u→v} hub_t(u)``,
    ``hub_{t+1}(u) = Σ_{u→v} auth_{t+1}(v)`` runs UNNORMALIZED on exact
    BIGINT mass seeded at 1 — integer addition is associative, so every
    iterate is bitwise partitioning-invariant and oracle-exact (scores grow
    ~degree^t; at 3 iterations even a 10⁸-degree hub stays far under 2⁶³).
    The single float op is the final normalization to the maximum (two
    1-row aggregates broadcast back in-plan), rounded at 9dp.

    Per half-iteration: one hash join of the score vector to the edge list
    + one map-side-combined shuffle on the opposite endpoint — the same
    scale shape as pagerank; the edge list persists as the loop invariant.

    Returns ``(id, hub_score_raw, auth_score_raw, hub, auth)`` for every
    node (non-hubs/non-authorities carry 0, not null).
    """
    if iterations < 1:
        raise ValueError("hits needs at least 1 iteration")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # loop invariants persist for the unrolled iterations and are NOT
    # unpersisted here (the result is lazy); repeated invocations in one
    # session require spark.catalog.clearCache() between rounds — see the
    # cleanup contract note in dedup.py:prefix_filter_pairs
    e = _sized_persist(e)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    hub = nodes.select("id", F.lit(1).cast("bigint").alias("h"))
    auth = None
    for _ in range(iterations):
        auth = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        hub = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
    scores = (
        nodes.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub_score_raw"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("auth_score_raw"),
        )
    )
    mx = scores.agg(
        F.max("hub_score_raw").cast("double").alias("mh"),
        F.max("auth_score_raw").cast("double").alias("ma"),
    )
    return scores.crossJoin(F.broadcast(mx)).select(
        "id",
        "hub_score_raw",
        "auth_score_raw",
        F.round(F.col("hub_score_raw") / F.col("mh"), 9).alias("hub"),
        F.round(F.col("auth_score_raw") / F.col("ma"), 9).alias("auth"),
    )
