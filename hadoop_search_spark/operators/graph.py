"""Connected components over a pair graph — the step that turns
near-duplicate PAIRS into duplicate CLUSTERS (transitive closure:
if A~B and B~C, then {A,B,C} is one group keeping one survivor).

Iterative min-label propagation with pointer doubling, as DataFrame
ops with a driver-side convergence loop (the standard Spark shape for
iterative graph algorithms — the driver holds only one scalar per
round, never the data):

* each round, every node takes the min label over {itself} ∪
  {neighbors' labels} ∪ {its label's label} — the last term is the
  pointer-doubling step, which squares path lengths so convergence is
  O(log diameter) rounds, not O(diameter);
* labels only decrease, so ``sum(labels)`` is strictly monotone until
  the fixpoint — convergence is detected by one scalar aggregate per
  round (no expensive change-count join);
* each round's result is ``localCheckpoint``-ed to truncate lineage
  (otherwise the plan doubles per iteration and the driver dies
  planning, the classic iterative-Spark failure mode).

Near-dup graphs are unions of small dense clusters (tiny diameter),
so this typically converges in 2-3 rounds regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component): every node labeled with the smallest node id
    reachable from it (undirected reachability over ``edges``;
    isolated ``nodes`` form singleton components). ``nodes``, when
    given, is the output universe (edge endpoints outside it are used
    for connectivity but not emitted); it defaults to the endpoints
    of ``edges``."""
    # Materialize the symmetrized edge set ONCE: the loop below unions
    # it into every round's plan, and without this its whole upstream
    # lineage (for dedup_clusters, the LSH band join + Jaccard verify)
    # would re-execute at every localCheckpoint.
    sym = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .unionByName(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .localCheckpoint(eager=True)
    )
    # Iterate ONLY over edge-touched nodes: isolated nodes are
    # fixpoints from round zero, and in a deduped corpus they are the
    # overwhelming majority — keeping them out of the loop turns
    # rounds x |corpus| shuffle volume into rounds x |pair subgraph|,
    # with one left join at the end to label the untouched rest.
    base = sym.select(F.col("n").alias("node")).distinct()

    lbl = base.withColumn("lbl", F.col("node")).localCheckpoint(eager=True)
    if not lbl.head(1):  # no edges: every node is a singleton fixpoint
        max_iter = 0
    prev_sum = None
    for it in range(max_iter):
        # pointer edges node<->label make label paths double each round.
        # Round 0 special case (r13): lbl == node by construction, so
        # the pointer set is EMPTY — skip the two union branches
        # instead of planning+codegening them per fresh plan (values
        # identical: unioning an empty frame is a no-op).
        if it == 0:
            hops = sym
        else:
            ptr = lbl.filter(F.col("lbl") != F.col("node")).select(
                F.col("node").alias("n"), F.col("lbl").alias("m")
            )
            hops = sym.unionByName(ptr).unionByName(
                ptr.select(F.col("m").alias("n"), F.col("n").alias("m"))
            )
        msgs = hops.join(
            lbl.select(F.col("node").alias("m"), F.col("lbl").alias("nbr_lbl")),
            "m",
        ).select(F.col("n").alias("node"), F.col("nbr_lbl").alias("lbl"))
        # LAZY checkpoint + the convergence aggregate in ONE job (r13):
        # the first action over a lazily-checkpointed frame both
        # materializes its blocks and computes the aggregate — the
        # previous eager-checkpoint-then-collect shape paid two
        # sequential jobs per round for the same values.
        new = (
            lbl.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        # labels are min-monotone: unchanged sum == fixpoint. DECIMAL
        # accumulator so huge id sums can't wrap at scale.
        cur_sum = new.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s
        lbl = new
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = lbl.select("node", F.col("lbl").alias("component"))
    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        out = universe.join(out, "node", "left").select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    return out


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "a",
    dst: str = "b",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the undirected pair graph → ``(node, rank)`` —
    the authority/centrality signal over the near-dup similarity
    graph (a doc central to a large template family is boilerplate;
    a peripheral doc is distinctive — a corpus-curation weighting).

    Bit-deterministic by the engine's standing rules: each edge
    contribution and each dangling-node rank is cast to
    DECIMAL(28,12) BEFORE its sum, so the per-iteration aggregates
    are order-independent and the whole computation is identical
    under any partitioning AND in the pure-Python twin (the golden
    generator / pytest differential). Driver holds only the dangling
    scalar per round; each round ``localCheckpoint``s (the CC-loop
    lineage rule). Quantization granularity 10⁻¹² is ~1e-4 relative
    at 10⁸ nodes; rescale the quantizer before going far beyond.

    Scale shape per iteration: one join of the edge list with the
    rank/out-degree table (both keyed by node — co-partitioned after
    the first shuffle) + one dst-keyed aggregate; dangling mass is
    one anti-join aggregate returning a single scalar. Classic
    pregel-without-pregel.
    """
    q12 = "decimal(28,12)"
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    # materialized once: both per-iteration joins reference deg, and a
    # lazy frame would re-run the degree shuffle twice per round
    deg = (
        sym.groupBy("u")
        .agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    universe = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    n = universe.count()
    if n == 0:
        raise ValueError("empty node universe")
    base = (1.0 - damping) / n
    ranks = universe.select(
        "node", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks.node == deg.u, "left")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .select(F.col("rank").cast(q12).alias("r"))
            .agg(F.sum("r").cast("double").alias("s"))
            .collect()[0]
            .s
        )
        dang_share = (float(dangling) if dangling is not None else 0.0) / n
        contribs = (
            sym.join(ranks, sym.u == ranks.node)
            .join(deg.withColumnRenamed("u", "du"), F.col("u") == F.col("du"))
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("deg")).cast(q12).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("c"))
        )
        ranks = (
            universe.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dang_share))
                ).alias("rank"),
            )
            # lazy (r13): the next round's dangling aggregate is the
            # first action over this frame and materializes the
            # checkpoint blocks in the SAME job — the eager form paid
            # a dedicated materialization job per round
            .localCheckpoint(eager=False)
        )
    return ranks
