"""Iterative graph algorithms as DataFrame supersteps.

Connected components live in ``dedup.connected_components`` (the
alternating large-star/small-star algorithm backing x09); this module
holds rank propagation.  The execution model is the Pregel superstep
expressed relationally: one edge-keyed join distributes each node's
state along its out-edges, one destination-keyed aggregation combines
incoming messages — no driver-side graph, no per-node memory beyond
the join row, and each iteration is a fixed two-shuffle plan whatever
the graph size.

Engine-exactness: per-edge contributions are deterministic scalar
expressions and the message combine is a decimal sum
(order-insensitive), so an external engine replays any single
iteration bitwise — which is how the x91 oracle checks the superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_step(
    edges: DataFrame,
    ranks: DataFrame,
    *,
    n_nodes: float,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    rank_col: str = "rank",
    teleport: float | None = None,
) -> DataFrame:
    """One damped, weighted PageRank superstep: returns new
    ``(node, rank)`` for every node RECEIVING mass.

    ``new_rank(v) = teleport + damping * Σ_u rank(u) * w(u,v)/wout(u)``
    with ``teleport`` defaulting to ``0.15 / n_nodes`` (pass it
    explicitly when damping ≠ 0.85 — and pass a LITERAL, not
    ``(1-damping)/n``: Python's ``1.0 - 0.85`` is an ulp away from
    ``0.15``, the classic cross-engine boundary bug).

    Dangling nodes (no out-edges) leak their mass — standard for the
    bipartite half-step; add a dangling-mass redistribution term
    outside if running to a stationary distribution on a general
    graph.
    """
    if teleport is None:
        teleport = 0.15 / n_nodes
    outw = edges.groupBy(src_col).agg(
        F.sum(weight_col).cast("long").alias("__wout")
    )
    contribs = (
        edges.join(outw, on=src_col)
        .join(
            ranks.select(
                F.col("node").alias(src_col),
                F.col(rank_col).alias("__r"),
            ),
            on=src_col,
        )
        .select(
            F.col(dst_col).alias("node"),
            (
                F.col("__r")
                * (F.col(weight_col).cast("double") / F.col("__wout"))
            )
            .cast("decimal(28,18)")
            .alias("__c"),
        )
    )
    return contribs.groupBy("node").agg(
        (
            F.lit(float(teleport))
            + F.lit(float(damping)) * F.sum("__c").cast("double")
        ).alias(rank_col)
    )


def pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Run *n_iter* supersteps from the uniform distribution over all
    nodes appearing in the edge list.  Nodes that stop receiving mass
    fall back to the teleport floor each round (they re-enter the rank
    frame so later iterations see them).

    Lineage is truncated each iteration with ``localCheckpoint`` —
    without it the plan doubles per superstep (the x09 CC discipline).
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n_nodes = float(nodes.count())
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    teleport = 0.15 / n_nodes
    for _ in range(n_iter):
        stepped = pagerank_step(
            edges, ranks, n_nodes=n_nodes, damping=damping,
            src_col=src_col, dst_col=dst_col, weight_col=weight_col,
            teleport=teleport,
        )
        ranks = (
            nodes.join(stepped, on="node", how="left")
            .select(
                "node",
                F.coalesce("rank", F.lit(float(teleport))).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def label_propagation_step(
    edges: DataFrame,
    labels: DataFrame | None = None,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "w",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """One synchronous label-propagation superstep (Raghavan et al.
    2007, the LPA community-detection iteration): every node adopts
    the label carrying the greatest incident edge weight among its
    neighbors' current labels (ties → the smallest label).  With
    *labels* = None, labels initialize to the node ids — the standard
    LPA start.  Iterating to (near-)fixpoint = re-feeding the output;
    communities emerge in O(few) supersteps on real graphs.

    Same relational Pregel shape as :func:`pagerank_step`: symmetric
    edge expansion, one join to pull neighbor labels, one
    (node, label) weight aggregation, and a node-keyed argmax window
    over the ≤|neighbor labels| aggregate rows.  All weights are
    integer sums — the superstep is engine-exact with no float
    anywhere.

    Output: ``node, label, label_weight`` — the adopted label and its
    incident weight.  Isolated nodes (no edges) do not appear; feed
    them through unchanged when iterating.
    """
    from pyspark.sql import Window

    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    base = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"), w.alias("w")
    )
    sym = base.unionAll(
        base.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    if labels is None:
        lbl = sym.select(F.col("v").alias("__n")).distinct().select(
            F.col("__n").alias("__lnode"), F.col("__n").alias("__lbl")
        )
    else:
        lbl = labels.select(
            F.col(node_col).alias("__lnode"), F.col(label_col).alias("__lbl")
        )
    votes = (
        sym.join(lbl, on=sym.v == F.col("__lnode"))
        .groupBy(F.col("u").alias("node"), F.col("__lbl").alias("label"))
        .agg(F.sum("w").alias("label_weight"))
    )
    wn = Window.partitionBy("node").orderBy(
        F.desc("label_weight"), F.asc("label")
    )
    return (
        votes.withColumn("__r", F.row_number().over(wn))
        .where(F.col("__r") == 1)
        .select("node", "label", "label_weight")
    )


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    min_weight: int = 1,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficients via
    the degree-ordered wedge join (Suri & Vassilvitskii 2011, "Counting
    triangles and the curse of the last reducer") — the community-
    cohesion primitive behind spam-graph and link-farm detection.

    Edges are undirected: canonicalized to ``u < v``, self-loops
    dropped, multiplicity collapsed with a count; *min_weight* keeps
    only ties observed at least that often (graph sparsification — the
    knob that keeps co-occurrence graphs from going near-complete).

    Scale shape: every edge is ORIENTED from its lower-``(degree, id)``
    endpoint to the higher one, so each wedge ``b ← a → c`` is
    enumerated at its lowest-degree vertex — per-pivot fan-out is
    bounded by O(√m) whatever the degree skew (the curse-of-the-last-
    reducer fix; an unoriented join would square the hub degree).  One
    self-join builds wedges, one more equi-join closes them; each
    triangle materializes exactly once.  All counts are integers —
    engine-exact.

    Output: ``(node, degree, triangles, clustering)`` for every node
    of the sparsified graph, ``clustering = 2T/(d(d−1))`` (6 dp, null
    for degree-1 nodes).
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__w"))
        .where(F.col("__w") >= F.lit(int(min_weight)))
        .select("u", "v")
    )
    # canon feeds the degree count AND the orientation join; deg feeds
    # the orientation AND the final output join; oriented feeds BOTH
    # wedge sides AND the closure probe.  Spark does not reuse an
    # exchange across consumers with different downstream pruning, so
    # without materialization the whole canon pipeline replays once
    # per consumer (~4x the edge shuffles) — the semdedup/
    # curate_documents localCheckpoint discipline applies
    canon = canon.localCheckpoint(eager=True)
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    ).localCheckpoint(eager=True)
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("__du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("__dv")
    )
    oriented = (
        canon.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("__du") < F.col("__dv"))
                | (
                    (F.col("__du") == F.col("__dv"))
                    & (F.col("u") < F.col("v"))
                ),
                F.struct(
                    F.col("u").alias("a"),
                    F.col("v").alias("b"),
                    F.col("__du").alias("da"),
                    F.col("__dv").alias("db"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("a"),
                    F.col("u").alias("b"),
                    F.col("__dv").alias("da"),
                    F.col("__du").alias("db"),
                )
            )
            .alias("e")
        )
        .select("e.a", "e.b", "e.da", "e.db")
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("a").alias("p"),
        F.col("b").alias("x"),
        F.col("db").alias("dx"),
    )
    e2 = oriented.select(
        F.col("a").alias("p"),
        F.col("b").alias("y"),
        F.col("db").alias("dy"),
    )
    wedges = e1.join(e2, "p").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closure = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tri = wedges.join(closure, ["x", "y"]).select("p", "x", "y")
    per_node = (
        tri.select(
            F.explode(
                F.array(F.col("p"), F.col("x"), F.col("y"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").withColumn(
        "triangles", F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    )
    d = F.col("degree").cast("double")
    return out.select(
        "node",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0 * F.col("triangles").cast("double") / (d * (d - 1.0)),
                6,
            ),
        ).alias("clustering"),
    )


def hits_step(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """One HITS iteration (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment") from the uniform start: authority(v) =
    Σ_{u→v} w·hub(u), then hub(u) = Σ_{u→v} w·authority(v), each
    L1-normalized.  Unlike PageRank, HITS is meaningful on BIPARTITE
    graphs (buyers→suppliers, queries→documents): hubs and
    authorities live on opposite sides instead of collapsing to the
    stationary distribution.

    From hub⁰ = 1 with integer weights, both raw scores are INTEGER
    sums — two edge-keyed aggregations, no floats until the two final
    normalizing divisions — so the superstep is engine-exact (the
    integer analogue of ``pagerank_step``'s decimal-sum discipline).

    Output: ``(node, auth, hub)`` (6 dp) for every node incident to an
    edge; pure hubs have auth 0 and vice versa.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    base = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"), w.alias("w")
    ).localCheckpoint(eager=True)
    auth_raw = base.groupBy(F.col("v").alias("node")).agg(
        F.sum("w").alias("__a")
    ).localCheckpoint(eager=True)
    hub_raw = (
        base.join(
            auth_raw.select(
                F.col("node").alias("v"), F.col("__a").alias("__av")
            ),
            "v",
        )
        .groupBy(F.col("u").alias("node"))
        .agg(F.sum(F.col("w") * F.col("__av")).alias("__h"))
    ).localCheckpoint(eager=True)
    # base/auth_raw/hub_raw each feed two consumers (aggregate +
    # join); uncheckpointed, the edge build replays per consumer
    # (24 fact scans measured at sf0.01)
    totals = auth_raw.agg(F.sum("__a").alias("__ta")).crossJoin(
        hub_raw.agg(F.sum("__h").alias("__th"))
    )
    joined = (
        auth_raw.join(hub_raw, "node", "full")
        .select(
            "node",
            F.coalesce(F.col("__a"), F.lit(0)).alias("__a"),
            F.coalesce(F.col("__h"), F.lit(0)).alias("__h"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return joined.select(
        "node",
        F.round(
            F.try_divide(
                F.col("__a").cast("double"), F.col("__ta").cast("double")
            ),
            6,
        ).alias("auth"),
        F.round(
            F.try_divide(
                F.col("__h").cast("double"), F.col("__th").cast("double")
            ),
            6,
        ).alias("hub"),
    )


def label_propagation(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "w",
    early_stop: bool = False,
) -> DataFrame:
    """Multi-superstep label propagation: ``n_iter`` synchronous
    :func:`label_propagation_step` rounds from the identity labeling —
    the full LPA community detector rather than the single x137
    superstep.  Each round's labels are lazily ``localCheckpoint``-ed
    (eager=False): lineage is truncated at checkpoint creation, and
    the blocks are materialized by the round's own action — the
    early-stop changed count, the next superstep, or the caller's
    final action — instead of a separate per-round count() job (the
    CC/pagerank fusion, r10).  Note the constraint this leaves:
    without *early_stop* no action runs per superstep, so round RDDs
    are only computed at the caller's final action, and with
    ``spark.checkpoint.checkpointAllMarkedAncestors=false`` (the
    default) intermediate rounds are cached but not truncated at the
    RDD level — RDD lineage grows linearly with *n_iter* while
    logical-PLAN truncation (the thing that doubles planning time)
    still holds per round.  For very large *n_iter* add a periodic
    eager checkpoint.

    *early_stop* adds a convergence probe — an anti-join count of
    changed labels per round, stopping when zero.  It is OFF for
    oracle-checked runs: synchronous LPA on bipartite structure can
    oscillate with period 2 (both engines must therefore run the SAME
    fixed round count), and the probe costs one extra job per round.
    Production graphs converge in O(few) rounds (Raghavan et al. 2007
    report ~5 for 95% of nodes).

    Output: ``(node, label)`` after the final round.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    labels = None
    for _ in range(int(n_iter)):
        stepped = label_propagation_step(
            edges,
            labels,
            src_col=src_col,
            dst_col=dst_col,
            weight_col=weight_col,
        ).select("node", "label")
        # eager=False (the CC/pagerank fusion): the early-stop changed
        # count — or, without early stop, the next superstep / the
        # caller's action — is the job that materializes this round's
        # checkpoint; eager=True ran a separate count() job per round
        stepped = stepped.localCheckpoint(eager=False)
        if early_stop and labels is not None:
            changed = (
                stepped.alias("new")
                .join(labels.alias("old"), "node")
                .where(F.col("new.label") != F.col("old.label"))
                .count()
            )
            if changed == 0:
                return stepped
        labels = stepped
    return labels


def kcore(
    edges: DataFrame,
    *,
    k: int,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    early_stop: bool = False,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983): drop
    every node whose degree within the REMAINING graph is below *k*,
    repeat — the fixpoint is the maximal subgraph where everyone keeps
    ≥ k ties.  The density gate behind engagement-ring / link-farm
    detection: a clique of colluding accounts survives peeling that
    strips organically-sparse neighborhoods.

    Fixed *n_iter* peels by default (peeling is idempotent at the
    fixpoint, so extra rounds are no-ops — the cross-engine contract
    that lets a fixed-round oracle replay it); *early_stop* probes for
    convergence per round at one extra count job.  Each round is two
    semi-joins (endpoint membership) + one degree aggregation, with
    the membership frame checkpointed (the iterative-operator lineage
    discipline).

    Output: ``(node, core_degree)`` for surviving nodes — degree
    counted within the final core.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = canon.unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    remaining = (
        sym.select(F.col("u").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(int(n_iter)):
        deg = (
            sym.join(
                remaining.select(F.col("node").alias("u")), "u", "semi"
            )
            .join(
                remaining.select(F.col("node").alias("v")), "v", "semi"
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        )
        new_remaining = (
            deg.where(F.col("core_degree") >= k)
            .localCheckpoint(eager=True)
        )
        if early_stop and new_remaining.count() == remaining.count():
            remaining = new_remaining
            break
        remaining = new_remaining
    return remaining.select("node", "core_degree")


def degree_assortativity(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the directed-both-ways edge
    list — positive means hubs link to hubs (social-graph signature),
    negative means hubs link to leaves (web/biology signature).  A
    one-number structural fingerprint: a spam farm wired hub-to-leaf
    shows up as sharply disassortative against an assortative
    organic baseline.

    Shape: canonical distinct edges, one degree aggregation, two
    broadcast-joined degree lookups, and decimal moment sums over the
    symmetric edge list (the ``corr_pairs`` idiom) — engine-exact,
    one pass per step, nothing quadratic.

    Output, one row: ``(n_nodes, n_edges, assortativity)`` (6 dp;
    null for degree-regular graphs where the variance is 0).
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    ).localCheckpoint(eager=True)
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ).localCheckpoint(eager=True)
    sym = canon.unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dy"))
    ed = sym.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    dec = "decimal(38,6)"
    x = F.col("__dx").cast("double")
    y = F.col("__dy").cast("double")
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__dx").cast(dec)).alias("__sx"),
        F.sum(F.col("__dy").cast(dec)).alias("__sy"),
        F.sum((x * y).cast(dec)).alias("__sxy"),
        F.sum((x * x).cast(dec)).alias("__sxx"),
        F.sum((y * y).cast(dec)).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    n_nodes = deg.count()
    n_edges = canon.count()
    return m.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


def adamic_adar(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 1000,
    top_n: int = 100,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): score every
    non-adjacent node pair (u, w) by ``sum over common neighbors v of
    1/ln(deg(v))`` — the classic common-neighbor signal that
    down-weights promiscuous hubs, used for recommend-next-link and
    for auditing near-miss edges in entity graphs.

    Scale shape: candidate pairs are generated by self-joining the
    symmetric edge list on the shared-neighbor key, so cost is
    Σ deg(v)² over NEIGHBOR nodes — the ``max_degree`` cap drops hub
    intermediates before the join (documented recall trade, same cap
    discipline as the LSH ``max_bucket``), bounding the quadratic
    term.  Existing edges leave via one anti-join; per-pair scores
    are decimal-cast before summing (order-insensitive).

    Output: top ``top_n`` predicted links ``(u, w, n_common,
    aa_score)`` ordered by score desc (6 dp), ties broken by (u, w).
    """
    max_degree = int(max_degree)
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    ).localCheckpoint(eager=True)
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    sym = canon.unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # incident lists keyed by the shared neighbor, hub-capped
    inc = (
        sym.select(F.col("v").alias("mid"), F.col("u").alias("leaf"))
        .join(
            F.broadcast(
                deg.where(F.col("deg") <= max_degree).select(
                    F.col("node").alias("mid"), "deg"
                )
            ),
            "mid",
        )
    ).localCheckpoint(eager=True)
    a, b = inc.alias("a"), inc.alias("b")
    pairs = a.join(
        b,
        (F.col("a.mid") == F.col("b.mid"))
        & (F.col("a.leaf") < F.col("b.leaf")),
    ).select(
        F.col("a.leaf").alias("u"),
        F.col("b.leaf").alias("w"),
        (F.lit(1.0) / F.log(F.col("a.deg").cast("double")))
        .cast("decimal(38,18)")
        .alias("__term"),
    )
    scored = pairs.groupBy("u", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("__term").alias("__s"),
    )
    adj = canon.select(
        F.col("u").alias("u"), F.col("v").alias("w")
    )
    out = scored.join(adj, ["u", "w"], "left_anti").select(
        "u",
        "w",
        "n_common",
        F.round(F.col("__s").cast("double"), 6).alias("aa_score"),
    )
    return out.orderBy(
        F.desc("aa_score"), F.asc("u"), F.asc("w")
    ).limit(int(top_n))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman–Girvan weighted modularity of a node partition:
    ``Q = Σ_c [ in_c/(2m) − (deg_c/(2m))² ]`` — the standard score of
    how much better a community assignment (e.g. :func:`label_
    propagation`'s) explains the edge mass than a degree-preserving
    random graph.  Q ≈ 0 ⇒ the "communities" are noise; > ~0.3 ⇒ real
    structure worth acting on (per-community curation, sharding).

    Edges are symmetrized internally, so every degree/internal sum is
    the both-directions convention (2m = Σ_sym w) — same bookkeeping
    in the oracle.

    Engine-exactness: in_c, deg_c, and 2m are exact integer-weight
    sums; per-community contributions are decimal-cast before the
    final sum so Q is accumulation-order-free.

    Scale shape: two broadcast-friendly label joins onto the edge
    list (label table is |nodes| — keyed equi-joins, shuffled not
    broadcast at 100 TB, which is the correct plan), one label-keyed
    agg, one 1-row combine.

    Output: one row — ``(n_communities, total_weight2, q)`` (6 dp).
    """
    sym = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"),
        F.col(weight_col).alias("w"),
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("u"), F.col(src_col).alias("v"),
            F.col(weight_col).alias("w"),
        )
    )
    lab_u = labels.select(
        F.col(node_col).alias("u"), F.col(label_col).alias("__lu")
    )
    lab_v = labels.select(
        F.col(node_col).alias("v"), F.col(label_col).alias("__lv")
    )
    tagged = sym.join(lab_u, on="u").join(lab_v, on="v")
    per_c = tagged.groupBy("__lu").agg(
        F.sum("w").alias("__deg"),
        F.sum(F.when(F.col("__lu") == F.col("__lv"), F.col("w"))).alias(
            "__in"
        ),
    )
    tot = per_c.agg(F.sum("__deg").alias("__m2"))
    j = per_c.crossJoin(F.broadcast(tot))
    m2 = F.col("__m2").cast("double")
    contrib = (
        F.coalesce(F.col("__in"), F.lit(0)).cast("double") / m2
        - (F.col("__deg").cast("double") / m2)
        * (F.col("__deg").cast("double") / m2)
    ).cast("decimal(38,18)")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("__m2").cast("long").alias("total_weight2"),
        F.round(F.sum(contrib).cast("double"), 6).alias("q"),
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Bounded-depth breadth-first search from a seed set: every node
    reachable within *max_depth* undirected hops, labeled with its
    MINIMUM hop distance — the "influence horizon" query (which
    suppliers are ≤3 ties from this watchlist; which users are ≤2
    co-session hops from a flagged account) that a full
    shortest-paths pass wildly over-serves.

    Classic synchronous frontier BFS as *max_depth* unrolled
    supersteps (Pregel-style, same shape as the label-propagation and
    alternating-star loops here): each superstep is one join of the
    CURRENT frontier against the adjacency list plus one anti-join
    against the visited set, so a node is expanded exactly once, at
    its first (= minimum) depth — cost O(Σ frontier degree) per step,
    never O(V·E).  Lineage is truncated per superstep with
    ``localCheckpoint`` (the connected-components discipline,
    dedup.py).

    Edges are treated as UNDIRECTED (symmetrized + deduped here);
    seeds absent from the edge set still report depth 0.

    Output: ``(node, depth)`` — one row per reached node,
    depth ∈ [0, max_depth].
    """
    max_depth = int(max_depth)
    e = edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
    sym = (
        e.union(e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
        .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .distinct()
    )
    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            # eager=False: the visited-union checkpoint below is the
            # round's materializing job and computes every partition
            # of nxt in the same pass — one job per depth, not two
            .localCheckpoint(eager=False)
        )
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited.select("node", F.col("depth").cast("long").alias("depth"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    n_iter: int = 3,
    damping: float = 0.85,
    restart: float = 0.15,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Personalized PageRank (random walk with restart to the SEED
    set, Haveliwala 2002): stationary-ish mass after *n_iter*
    supersteps of ``r ← restart·s + damping·Pᵀr`` where the prior
    ``s`` is uniform over the seeds — proximity to a watchlist in a
    way raw PageRank (global importance, x91) can't express, and the
    weighted/attenuated refinement of the hard 3-hop horizon
    (``bfs_depths``): BFS says WHO is within k ties, PPR says HOW
    STRONGLY each of them is tied.

    Pass *restart* as a LITERAL alongside *damping* (the
    ``pagerank_step`` rule: Python's ``1.0 - 0.85`` is an ulp off
    ``0.15``, the classic cross-engine boundary bug).

    Per superstep: out-weight normalize, one edge⋈rank join, a
    decimal(28,18)-cast contribution sum (accumulation-order-proof),
    and a full-outer combine with the seed prior; nodes receiving no
    mass and holding no prior drop out (their rank is exactly 0) —
    the frontier grows like BFS instead of touching all V every
    round.  Lineage truncated per superstep (``localCheckpoint``,
    the x09 discipline).  Dangling mass is NOT redistributed — with
    restart > 0 the walk is still proper; document the leak if
    comparing to a power-iteration reference.

    Output: ``(node, rank)`` for every node with nonzero mass
    (6 dp).
    """
    e = edges.select(
        F.col(src_col).alias("__s"),
        F.col(dst_col).alias("__d"),
        F.col(weight_col).cast("double").alias("__w"),
    )
    # undirected co-occurrence graphs arrive as canonical pairs;
    # walk both directions
    sym = e.union(
        e.select(
            F.col("__d").alias("__s"),
            F.col("__s").alias("__d"),
            F.col("__w"),
        )
    )
    outw = sym.groupBy("__s").agg(F.sum("__w").alias("__wo"))
    adj = sym.join(outw, "__s").select(
        "__s", "__d", (F.col("__w") / F.col("__wo")).alias("__p")
    ).localCheckpoint(eager=True)
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = sd.count()
    prior = sd.withColumn(
        "__prior", F.lit(1.0 / float(n_seeds))
    ).localCheckpoint(eager=True)
    ranks = prior.select("node", F.col("__prior").alias("rank"))
    for _ in range(int(n_iter)):
        contrib = (
            ranks.join(adj, ranks["node"] == adj["__s"])
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") * F.col("__p"))
                .cast("decimal(28,18)")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__m"))
        )
        ranks = (
            prior.join(contrib, "node", "full_outer")
            .select(
                "node",
                (
                    F.lit(float(restart))
                    * F.coalesce(F.col("__prior"), F.lit(0.0))
                    + F.lit(float(damping))
                    * F.coalesce(F.col("__m"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def grid_density_clusters(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    grid: int = 16,
    min_pts: int = 8,
) -> DataFrame:
    """Grid-DBSCAN-style density clustering over two numeric features:
    bin points into a ``grid × grid`` lattice (equal-width over the
    observed range), call a cell CORE when it holds ≥ *min_pts*
    points, and merge 8-adjacent core cells into clusters via
    connected components.  The density-clustering answer that scales
    where true DBSCAN's ε-neighborhood join does not: binning is one
    map-side pass, and the component step runs on the CELL graph
    (≤ grid² nodes, ≤ 8·grid² edges — metadata-sized regardless of
    row count), never on points.

    Labels are deterministic: a cluster is named by its minimum cell
    id (``gx·grid + gy``).  Output: one row per core cell —
    ``(cell_id, gx, gy, n_pts, cluster, cluster_cells,
    cluster_pts)`` ordered by cell_id.  Border points (in non-core
    cells) are intentionally unassigned — at the corpus scale this
    operator targets, cluster MEMBERSHIP of dense regions is the
    decision input, not per-point labels; join points back to cells
    for that if needed.
    """
    from .dedup import connected_components

    g = int(grid)
    if g < 2:
        raise ValueError("grid must be >= 2")
    base = df.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    rng = base.agg(
        F.min("__x").alias("__xlo"),
        F.max("__x").alias("__xhi"),
        F.min("__y").alias("__ylo"),
        F.max("__y").alias("__yhi"),
    )
    binned = base.crossJoin(F.broadcast(rng))

    def bucket(col, lo, hi):
        width = (F.col(hi) - F.col(lo)) / F.lit(g)
        raw = F.floor(F.try_divide(F.col(col) - F.col(lo), width)).cast("long")
        return F.coalesce(
            F.least(F.greatest(raw, F.lit(0)), F.lit(g - 1)), F.lit(0)
        )

    cells = (
        binned.select(
            bucket("__x", "__xlo", "__xhi").alias("gx"),
            bucket("__y", "__ylo", "__yhi").alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pts"))
    )
    core = cells.where(F.col("n_pts") >= int(min_pts)).select(
        (F.col("gx") * g + F.col("gy")).alias("cell_id"), "gx", "gy", "n_pts"
    )
    # 8-adjacency on the bounded core-cell set: a self-join keyed by
    # nothing data-sized — both sides are ≤ grid² rows, broadcast
    lhs = core.select(
        F.col("cell_id").alias("id_a"),
        F.col("gx").alias("__ax"),
        F.col("gy").alias("__ay"),
    )
    rhs = core.select(
        F.col("cell_id").alias("id_b"),
        F.col("gx").alias("__bx"),
        F.col("gy").alias("__by"),
    )
    edges = (
        lhs.join(
            F.broadcast(rhs),
            (F.abs(F.col("__ax") - F.col("__bx")) <= 1)
            & (F.abs(F.col("__ay") - F.col("__by")) <= 1)
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
    )
    comp = connected_components(edges, "id_a", "id_b").select(
        F.col("doc").alias("cell_id"), F.col("component").alias("cluster")
    )
    labeled = core.join(comp, "cell_id", "left").select(
        "cell_id",
        "gx",
        "gy",
        "n_pts",
        # isolated core cells (no adjacent core neighbor) are their
        # own singleton cluster
        F.coalesce("cluster", "cell_id").alias("cluster"),
    )
    per_cluster = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_cells"),
        F.sum("n_pts").cast("long").alias("cluster_pts"),
    )
    return (
        labeled.join(F.broadcast(per_cluster), "cluster")
        .select(
            "cell_id", "gx", "gy", "n_pts",
            F.col("cluster").cast("long").alias("cluster"),
            "cluster_cells", "cluster_pts",
        )
        .orderBy("cell_id")
    )


def ktruss_edges(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 4,
    min_weight: int = 1,
) -> DataFrame:
    """One k-truss peeling pass (Cohen 2008, "Trusses: cohesive
    subgraphs for social network analysis"): compute each edge's
    SUPPORT — the number of triangles it participates in — and keep
    edges with ``support >= k - 2``, the edge-centric cohesion
    criterion that is strictly stronger than k-core's node degrees
    (an edge can join two high-degree nodes yet close no triangle —
    k-core keeps it, the truss drops it).  This is the single
    support-and-filter pass; the full k-truss fixpoint re-applies it
    until stable (each pass is one Spark job over the surviving
    edges, the pagerank_step iteration idiom).

    Triangles enumerate once via the same degree-ordered wedge join
    as :func:`triangle_count` (per-pivot fan-out O(√m) under hub
    skew), then each triangle's three edges re-canonicalize to
    ``u < v`` and a single groupBy counts support — all integers,
    engine-exact.

    Output: ``(u, v, support, keep)`` for every sparsified edge
    (support 0 when the edge closes nothing), ordered by (u, v).
    """
    if k < 3:
        raise ValueError("ktruss_edges: k must be >= 3")
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__w"))
        .where(F.col("__w") >= F.lit(int(min_weight)))
        .select("u", "v")
    )
    canon = canon.localCheckpoint(eager=True)
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    ).localCheckpoint(eager=True)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("__dv"))
    lower = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        canon.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                lower,
                F.struct(
                    F.col("u").alias("a"), F.col("v").alias("b"),
                    F.col("__dv").alias("db"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("a"), F.col("u").alias("b"),
                    F.col("__du").alias("db"),
                )
            )
            .alias("e")
        )
        .select("e.a", "e.b", "e.db")
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("a").alias("p"), F.col("b").alias("x"),
        F.col("db").alias("dx"),
    )
    e2 = oriented.select(
        F.col("a").alias("p"), F.col("b").alias("y"),
        F.col("db").alias("dy"),
    )
    wedges = e1.join(e2, "p").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closure = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    tri = wedges.join(closure, ["x", "y"]).select("p", "x", "y")
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("p", "x").alias("u"),
                    F.greatest("p", "x").alias("v"),
                ),
                F.struct(
                    F.least("p", "y").alias("u"),
                    F.greatest("p", "y").alias("v"),
                ),
                F.struct(
                    F.least("x", "y").alias("u"),
                    F.greatest("x", "y").alias("v"),
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    support = tri_edges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    out = canon.join(support, ["u", "v"], "left").select(
        "u",
        "v",
        F.coalesce(F.col("support"), F.lit(0)).alias("support"),
        (
            F.coalesce(F.col("support"), F.lit(0))
            >= F.lit(int(k) - 2)
        )
        .cast("int")
        .alias("keep"),
    )
    return out.orderBy("u", "v")


def wl_refinement(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    min_weight: int = 1,
) -> DataFrame:
    """Weisfeiler–Leman color refinement (1-WL, Weisfeiler & Leman
    1968): start every node at its degree, then repeatedly recolor
    each node by hashing its own color with the SORTED multiset of
    neighbor colors — the graph-isomorphism fingerprint behind WL
    graph kernels and GNN expressiveness.  The color-count sequence
    (how many distinct colors after 0, 1, 2… rounds) is a structural
    signature: two graphs differing anywhere in it are certainly
    non-isomorphic, and a round that stops adding colors has
    STABILIZED — more rounds (or a more expressive model) buy
    nothing.  md5 hashing of the canonical sorted string makes every
    color engine-portable.

    Each iteration is one edge join + one sorted collect per node —
    all keyed by node id; *iterations* is a literal (each round is a
    Spark job, the pagerank_step idiom).

    Output: ``(iteration, n_colors, max_color_class)`` for
    iteration = 0..*iterations*, ordered by iteration.
    """
    if not (1 <= int(iterations) <= 8):
        raise ValueError("wl_refinement: iterations must be in 1..8")
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__w"))
        .where(F.col("__w") >= F.lit(int(min_weight)))
        .select("u", "v")
    ).localCheckpoint(eager=True)
    und = canon.unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    colors = (
        und.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select("node", F.col("deg").cast("string").alias("color"))
    ).localCheckpoint(eager=True)

    def census(cframe, it):
        return cframe.groupBy("color").agg(
            F.count(F.lit(1)).alias("cc")
        ).agg(
            F.lit(it).cast("long").alias("iteration"),
            F.count(F.lit(1)).cast("long").alias("n_colors"),
            F.max("cc").cast("long").alias("max_color_class"),
        )

    out = census(colors, 0)
    cur = colors
    for it in range(1, int(iterations) + 1):
        nbr = und.join(
            cur.withColumnRenamed("node", "v"), "v"
        ).select(
            F.col("u").alias("node"),
            F.col("color").alias("ncolor"),
        )
        recolored = (
            cur.join(nbr, "node")
            .groupBy("node", "color")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list("ncolor")), ","
                ).alias("nbrs")
            )
            .select(
                "node",
                F.substring(
                    F.md5(
                        F.concat_ws("|", F.col("color"), F.col("nbrs"))
                    ),
                    1,
                    12,
                ).alias("color"),
            )
        ).localCheckpoint(eager=True)
        out = out.unionByName(census(recolored, it))
        cur = recolored
    return out.orderBy("iteration")


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Bounded-hop single-source(-set) shortest paths — Bellman-Ford
    relaxation as *max_hops* unrolled Pregel supersteps (the weighted
    upgrade of :func:`bfs_depths`): after step k every node carries
    the cheapest cost reachable from the seed set using ≤ k edges.
    Supply-chain cost horizons, weighted influence radii, cheapest
    k-hop routing over co-occurrence graphs.

    Each superstep is ONE join of the current distance table against
    the adjacency list plus ONE keyed min-aggregation — no frontier
    tracking needed because min() absorbs non-improvements; lineage
    truncates per superstep (``localCheckpoint``, the BFS/CC
    discipline).  Integer weights → exact distances, and a FIXED hop
    bound → deterministic output regardless of convergence (document
    the bound; this is bounded-hop SSSP, not full convergence).

    Edges are directed as given; pass a symmetrized frame for
    undirected semantics.  Output: ``(node, dist)``.
    """
    max_hops = int(max_hops)
    e = edges.select(
        F.col(src_col).alias("__s"),
        F.col(dst_col).alias("__d"),
        F.col(weight_col).cast("long").alias("__w"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__d").isNotNull()
        & F.col("__w").isNotNull()
    )
    dists = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        relax = (
            dists.join(e, dists["node"] == e["__s"])
            .select(
                F.col("__d").alias("node"),
                (F.col("dist") + F.col("__w")).alias("dist"),
            )
        )
        dists = (
            dists.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dists.orderBy("node")


def pagerank_keyed(
    edges: DataFrame,
    *,
    partition_col: str = "pk",
    n_iter: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Entity-scoped PageRank (r9 verdict item #8 — the graph family's
    panel lane): :func:`pagerank` with every superstep join, message
    aggregate, node universe, and teleport constant keyed by
    *partition_col* — one call ranks EVERY entity's graph, and no rank
    mass ever crosses an entity boundary.

    Per entity e with n_e nodes: ranks start uniform (``1/n_e``), each
    superstep distributes ``rank·w/wout`` along (entity, src)-keyed
    out-edges and combines by (entity, dst) in decimal(28,18)
    (order-insensitive — an external engine replays every iteration
    bitwise); nodes receiving no mass fall back to their entity's
    teleport floor ``0.15/n_e``.

    At 100 TB this is per-source / per-tenant graph analytics: the
    two shuffles per superstep key on (entity, node), so adding
    entities adds partitions — never join width — and a dense entity's
    supersteps cannot skew another's.  Lineage is truncated per
    iteration with ``localCheckpoint`` (the :func:`pagerank` / x09 CC
    discipline).

    Returns ``(partition_col, node, rank)`` for every node of every
    entity after *n_iter* supersteps.
    """
    pk = partition_col
    nodes = (
        edges.select(pk, F.col(src_col).alias("node"))
        .union(edges.select(pk, F.col(dst_col).alias("node")))
        .distinct()
    )
    tps = nodes.groupBy(pk).agg(F.count(F.lit(1)).alias("__n")).select(
        pk,
        (F.lit(0.15) / F.col("__n").cast("double")).alias("__tp"),
        (F.lit(1.0) / F.col("__n").cast("double")).alias("__r0"),
    )
    ranks = nodes.join(tps, on=pk).select(
        pk, "node", F.col("__r0").alias("rank")
    )
    outw = edges.groupBy(pk, src_col).agg(
        F.sum(weight_col).cast("long").alias("__wout")
    )
    for _ in range(n_iter):
        contribs = (
            edges.join(outw, on=[pk, src_col])
            .join(
                ranks.select(
                    pk,
                    F.col("node").alias(src_col),
                    F.col("rank").alias("__r"),
                ),
                on=[pk, src_col],
            )
            .select(
                pk,
                F.col(dst_col).alias("node"),
                (
                    F.col("__r")
                    * (F.col(weight_col).cast("double") / F.col("__wout"))
                )
                .cast("decimal(28,18)")
                .alias("__c"),
            )
        )
        stepped = contribs.groupBy(pk, "node").agg(
            F.sum("__c").alias("__s")
        )
        ranks = (
            nodes.join(tps, on=pk)
            .join(stepped, on=[pk, "node"], how="left")
            .select(
                pk,
                "node",
                F.when(
                    F.col("__s").isNotNull(),
                    F.col("__tp")
                    + F.lit(float(damping)) * F.col("__s").cast("double"),
                )
                .otherwise(F.col("__tp"))
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
