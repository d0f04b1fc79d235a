"""Graph analytics on relational co-occurrence graphs — bounded-iteration
PageRank and triangle counting, engineered for cross-engine bit-exactness.

A training-data pipeline meets graphs constantly (dedup clusters, link
graphs for quality signals, co-occurrence structure); the engine already
has connected components (dedup.near_dedup_clusters). This module adds
the two classic batch-graph workloads:

- **PageRank** (Page/Brin/Motwani/Winograd 1999), N fixed iterations of
  the damped power method. All arithmetic is SCALED-INTEGER: ranks live
  as BIGINTs at SCALE = 1e12, per-edge contributions are integer
  divisions (rank DIV outdeg), and the damping update is
  ((100-d)*base + d*sum) DIV 100 — so partition order, engine, and fold
  order cannot move a single bit, and the DuckDB oracle replays the
  identical iterations as chained CTEs (the BPE-training playbook).
  Floor divisions shed < 1 ulp of mass per hop; that drift is the SAME
  in both engines and irrelevant to ranking (documented, not hidden).
- **Triangle counting** via the canonical-edge join: undirected edges
  stored once as src < dst, triangles = paths (a<b<c) closed by the
  (a,c) edge. Pure integer counts.

Graph construction (`consecutive_line_edges`): nodes are parts, with an
undirected edge when two parts appear on ADJACENT lineitem lines of one
order. Adjacency (not all-pairs-in-order) bounds the per-order edge
fan-out at lines-1 — the same bounded-candidate-generation principle as
the banded range join and LSH dedup: at 100 TB the edge list grows
linearly with the fact table, never quadratically with basket size.

Scale shape: each PageRank iteration is one (edges JOIN ranks) shuffle on
the src key + one groupBy dst — the canonical Pregel-style message pass
expressed as joins; state between iterations is one (node, rank) row per
node. Triangle counting is two self-joins whose intermediate is bounded
by sum-of-squared-degrees (the adjacency construction keeps degrees
small).

[NOT IN REFERENCE — executor.py has no graph surface; beyond-reference
breadth alongside the iterative-BPE family.]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def _idiv(a: str, b: str, engine: str) -> str:
    """Integer floor division fragment (both operands non-negative here).
    Spark's `/` is double division and DuckDB's `/` widens to double too —
    the r03 dtype trap class — so both engines get their native integer
    operator."""
    if engine == "spark":
        return f"({a} DIV {b})"
    return f"({a} // {b})"


def consecutive_line_edges(lineitem: DataFrame) -> DataFrame:
    """Canonical undirected edges (src < dst) between parts on adjacent
    lines of the same order — one bounded self-join on (orderkey, line)."""
    a = lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").alias("__ln"),
        F.col("l_partkey").alias("__pa"),
    )
    b = lineitem.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("__ln"),
        F.col("l_partkey").alias("__pb"),
    )
    return (
        a.join(b, ["l_orderkey", "__ln"])
        .filter(F.col("__pa") != F.col("__pb"))
        .select(
            F.least("__pa", "__pb").alias("src"),
            F.greatest("__pa", "__pb").alias("dst"),
        )
        .distinct()
    )


def _both_directions(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize an edge list — each row fanned out to itself and its
    reverse — with ONE evaluation of the upstream subtree.

    r16 optimization (guide §7.2 duplicated subtrees / §2.3): the
    two-leg ``e.unionByName(e.flipped)`` idiom evaluates the edge
    builder once per leg (for the part co-occurrence graph that is the
    lineitem self-join + distinct, twice), because the differing leg
    projections defeat exchange reuse. One in-partition
    explode(array(struct fwd, struct rev)) produces the identical row
    multiset from a single evaluation — a narrow operator, no new
    barrier, no new shuffle.

    Precondition (ADVICE r16): array(struct(src,dst), struct(dst,src))
    requires src and dst to coerce to ONE common type — fine for the
    long ids every caller uses; heterogeneously-typed endpoints that the
    old two-leg union coerced per-column would raise here instead."""
    e = F.explode(
        F.array(
            F.struct(F.col(src).alias(src), F.col(dst).alias(dst)),
            F.struct(F.col(dst).alias(src), F.col(src).alias(dst)),
        )
    ).alias("__e")
    return edges.select(e).select(f"__e.{src}", f"__e.{dst}")


def _adjacency(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared loop-invariant build for the iterative graph operators:
    (deg, adj) over the symmetrized edge list, all eagerly checkpointed.

    deg = (node, outdeg) — every node incident to an edge appears as a
    src once both directions are present, so deg doubles as the node
    list. adj = (node, __salt, __dsts) adjacency arrays; the salt count
    is PER NODE — ceil(outdeg/1024), i.e. 0 extra rows for ordinary
    nodes and ceil(deg/1024) slices for a hub, so no task ever
    materializes a celebrity's whole neighborhood in one array while
    small nodes pay zero fragmentation. The build costs one edge-sized
    window + groupBy pipeline, ONCE, outside any iteration; array
    element order is partition-dependent and callers must only consume
    the arrays order-insensitively (sums, counts)."""
    # r17 (VERDICT r16 #3): ONE edge-sized checkpoint job instead of
    # three (the r16 shape checkpointed the symmetrized edge list AND
    # the degree table AND the arrays — two serial O(E) barriers and an
    # O(E) materialized copy more than needed). The
    # edge-sized build runs as a single pipeline — symmetrize, count the
    # per-node degree with an unordered window OVER THE SAME node
    # exchange the grouping needs, fold the arrays in-partition — so the
    # edge builder is evaluated once with no intermediate
    # materialization, and the checkpointed adj comes out HASH(node)-
    # PARTITIONED (the window exchange's partitioning survives the
    # aggregate, whose keys are a superset, AND the checkpoint — Spark
    # preserves LogicalRDD partitioning). Iterative consumers joining on
    # node therefore need NO adj-side exchange at all, in any round. deg
    # (the node list / init table) is a node-sized PARTITION-LOCAL
    # aggregate over the checkpointed adj (grouping key = its hash
    # partitioning key): no edge pass, no exchange — checkpointing it
    # keeps the consumers' residual plans flat (the plan-depth tripwire
    # tests) for the cost of one tiny node-sized job.
    from pyspark.sql import Window as _W

    directed = _both_directions(edges.select("src", "dst"))
    adj = (
        directed.withColumn(
            "__outdeg",
            F.count(F.lit(1)).over(_W.partitionBy("src")).cast("long"),
        )
        .groupBy(
            F.col("src").alias("node"),
            F.col("__outdeg"),
            F.pmod(
                F.xxhash64("dst"), F.ceil(F.col("__outdeg") / F.lit(1024))
            ).alias("__salt"),
        )
        .agg(F.collect_list("dst").alias("__dsts"))
        .localCheckpoint(eager=True)
    )
    deg = (
        adj.groupBy("node")
        .agg(F.max("__outdeg").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    return deg, adj


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Scaled-integer PageRank over canonical undirected edges.

    Returns (node, rank_scaled) for every node incident to an edge;
    rank_scaled is the damped-power-method value after n_iter rounds at
    SCALE = 1e12. Undirected: each canonical edge contributes in both
    directions. The uniform init and the (1-d)/n base use the SAME floor
    division the oracle replays.

    checkpoint_every: lineage is truncated every K supersteps, not every
    superstep. Unlike upsert's ~16×-per-batch self-embedding plan, each
    pagerank round references the previous ranks exactly ONCE (share =
    r ⋈ deg), so plan depth grows LINEARLY inside a window and the
    per-round eager checkpoint was pure job-launch overhead: a default
    5-iteration run now compiles to one Spark job instead of six.
    checkpoint_every=1 restores the strict Pregel-superstep behavior."""
    if not (1 <= n_iter <= 50):
        raise ValueError(f"n_iter must be in [1, 50], got {n_iter}")
    if not (0 <= damping_pct <= 100):
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # Loop-invariant hoists (the GraphX routing-table idea): after the
    # shared adjacency build, NO iteration shuffles edge-sized rows — the
    # one per-round join is node-keyed (ranks ⋈ adj, which carries
    # __outdeg in-row), the fan-out happens by exploding in-partition
    # arrays, and the partial groupBy(dst) combines the exploded stream
    # map-side back down to ~distinct-dsts-per-partition before the only
    # exchange. Per-iteration shuffled bytes drop from O(E) (the previous
    # edges ⋈ share join) to O(N). The checkpointed (node, outdeg) table
    # serves the base-rank init and the n scalar.
    deg, adj = _adjacency(edges)
    nodes = deg.select("node")
    n = deg.count()  # bounded driver scalar, like the literal-centroid fits
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    base = SCALE // n
    r = nodes.select("node", F.lit(base).cast("long").alias("rank_scaled"))
    for it in range(n_iter):
        # r16 loop slimming (guide §2.1/§3): ONE node-keyed join per
        # round. The share division reads __outdeg off the adjacency row
        # (hoisted into the state by _adjacency) instead of a ranks ⋈ deg
        # pre-join, and the dangling-node left join is gone because it
        # was VACUOUS: _adjacency symmetrizes, so every node has an edge,
        # every neighbor holds a rank, and contrib covers the node set
        # exactly — coalesce(__contrib, 0) never fired. Three node-sized
        # joins per round -> one; identical integer arithmetic.
        # r17: shuffle_hash hint on the node-sized ranks side (§3.1).
        # Both sides are already hash(node)-partitioned (adj from the
        # checkpoint, r from the previous round's groupBy), so the join
        # needs no exchange either way — but the default SMJ paid two
        # per-round sorts and AQE's local alternative was a per-round
        # driver BROADCAST of the ranks (a serial barrier locally, and
        # impossible at 100 TB where ranks are node-sized). The hash
        # build over the small per-partition rank slices is the
        # scale-correct strategy; A/B: wall −11% at 32c, jobs 22→17.
        contrib = (
            adj.join(r.hint("shuffle_hash"), "node")
            .select(
                F.explode("__dsts").alias("node"),
                F.expr(_idiv("rank_scaled", "__outdeg", "spark")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__contrib"))
        )
        r = contrib.select(
            "node",
            F.expr(
                _idiv(
                    f"({100 - damping_pct} * {base}L"
                    f" + {damping_pct} * __contrib)",
                    "100",
                    "spark",
                )
            )
            .cast("long")
            .alias("rank_scaled"),
        )
        # one (node, rank) row per node at each truncation point — plan
        # depth stays bounded by the checkpoint window (linear within it,
        # see the docstring; same rationale as BPE's per-round truncation
        # but amortized over K rounds)
        if (it + 1) % checkpoint_every == 0 and (it + 1) < n_iter:
            r = r.localCheckpoint(eager=True)
    return r


def triangle_count(edges: DataFrame) -> DataFrame:
    """One-row (n_nodes, n_edges, n_triangles) summary over canonical
    undirected edges, one count per triangle.

    Path generation uses DEGREE-ORDERED orientation (the
    compact-forward / Schank–Wagner device): every undirected edge points
    from its lower-(degree, id) endpoint to the higher one, and the join
    builds lo→mid→hi chains closed by the lo→hi edge. Under this
    orientation out-degree is O(sqrt(E)) for EVERY node, so the chain
    intermediate is Σ_mid in(mid)·out(mid) ≤ sqrt(E)·E — bounded for any
    degree distribution: a celebrity node contributes almost nothing
    because nearly all of its edges point INTO it and its out-fan is
    capped. The naive a<b<c id-ordering bounds nothing — a low-id hub
    keeps its full quadratic fan-out, exactly the skew that kills a
    100 TB run. Each triangle still closes exactly once (its three nodes
    have a unique (degree, id) total order, so exactly one lo→mid→hi
    labeling exists). The two degree-attach joins this costs are
    node-keyed and loop-free — the cheap side of the trade.

    Input hardening (ADVICE r09): edges are normalized to canonical form
    (least, greatest) BEFORE the distinct, so an input that carries both
    (x, y) and (y, x) — or self-loops — cannot double-orient an edge
    onto the same lo→hi arc and silently multiply chain matches; degrees
    and n_edges then count each undirected edge exactly once."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        e.join(deg.select(F.col("n").alias("src"), F.col("d").alias("__ds")), "src")
        .join(deg.select(F.col("n").alias("dst"), F.col("d").alias("__dd")), "dst")
        .select(
            F.when(
                F.struct("__ds", "src") < F.struct("__dd", "dst"), F.col("src")
            )
            .otherwise(F.col("dst"))
            .alias("lo"),
            F.when(
                F.struct("__ds", "src") < F.struct("__dd", "dst"), F.col("dst")
            )
            .otherwise(F.col("src"))
            .alias("hi"),
        )
        .localCheckpoint(eager=True)
    )
    ab = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"])
    nodes = e.select(F.col("src").alias("n")).unionByName(
        e.select(F.col("dst").alias("n"))
    ).distinct()
    return (
        nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .crossJoin(tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    )


def connected_components(
    edges: DataFrame, *, max_rounds: int = 25
) -> DataFrame:
    """Exact connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
    "Connected Components in MapReduce and Beyond", SoCC 2014).

    Returns (node, component) for every node incident to at least one
    edge; ``component`` is the component's minimum node id (the same
    labeling convention as dedup.dedup_clusters).

    Why a second CC algorithm when dedup_clusters already does min-label
    propagation: propagation converges in O(diameter) rounds — correct
    for detector pair graphs (tiny, bushy components) but fatal on chain-
    or path-shaped graphs (event chains, linked lists of revisions) where
    the diameter grows with the data. Star contraction halves path
    lengths every alternation, converging in O(log^2 n) rounds with the
    SAME per-round cost shape (one groupBy-min + one equi-join on the
    current edge set). A 99-hop user-event chain converges in ~10 rounds
    here vs 99 rounds of propagation; at 100 TB, chains are unbounded and
    this is the only shape that survives.

    Per round: large-star — every node u points its GREATER neighbors at
    m(u) = min(N(u) ∪ {u}); small-star — every node u points its
    not-greater neighborhood (and itself) at its minimum neighbor. Both
    are (groupBy u → min) + (join back on u) over the current edge set,
    each followed by distinct; edge count is non-increasing after the
    first round and every edge stays within its component (min labels
    only ever decrease toward the component min). Convergence = the
    canonical edge set's signature (count + sum of xxhash64(src,dst)) is
    unchanged by a full round; at the fixpoint every edge is
    (component_min, v) — a star — which is returned directly.

    100 TB shape: state between rounds is the contracted edge set itself
    (≤ input edges rows), each round is two shuffle pairs on node keys
    with partial aggregation, and each round ends in an eager
    localCheckpoint so plan depth stays constant (the Pregel-superstep
    pattern shared with pagerank/BPE). The convergence probe is a 1-row
    aggregate — the same bounded driver scalar every
    iterate-until-fixpoint algorithm needs. No collect of node/edge rows.

    [NOT IN REFERENCE — executor.py has no graph surface.]
    """
    if not (1 <= max_rounds <= 200):
        raise ValueError(f"max_rounds must be in [1, 200], got {max_rounds}")
    e = (
        edges.select(
            F.least("src", "dst").cast("long").alias("src"),
            F.greatest("src", "dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(cur: DataFrame) -> tuple[int, int]:
        # each term bounded to |h| < 2^31 so the ANSI-mode BIGINT sum
        # cannot overflow below ~4e9 edges per partitioned aggregate
        row = cur.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst") % F.lit(2**31)), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["c"], row["h"])

    def _large_star(cur: DataFrame) -> DataFrame:
        # neighborhoods of u over symmetric edges; m(u) = min(N(u) ∪ {u})
        sym = cur.unionByName(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mn = sym.groupBy(F.col("src").alias("u")).agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        # strictly-greater neighbors point at m(u); m(u) <= u < v keeps
        # the (src=min, dst=max) canonical orientation for free
        return (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mn, sym["src"] == mn["u"])
            .select(F.col("m").alias("src"), F.col("dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # orient so dst carries the greater endpoint (already canonical);
        # neighborhood of the GREATER node u = {v : v < u}; m(u) = min
        mn = cur.groupBy(F.col("dst").alias("u")).agg(F.min("src").alias("m"))
        pointed = (
            cur.join(mn, cur["dst"] == mn["u"])
            .select(F.col("m").alias("src"), F.col("src").alias("dst"))
        )
        selfed = mn.select(F.col("m").alias("src"), F.col("u").alias("dst"))
        return (
            pointed.unionByName(selfed)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    prev = _sig(e)
    converged = False
    for _ in range(max_rounds):
        prev_e = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _sig(e)
        if cur == prev:
            # the signature (count + bounded-hash sum) could in principle
            # collide; confirm set equality EXACTLY once, at the candidate
            # fixpoint (both sides are distinct sets with equal counts, so
            # one empty exceptAll suffices) — cost is a single anti-join
            # at convergence, never per round
            if e.exceptAll(prev_e).limit(1).count() == 0:
                converged = True
                break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # fixpoint edge set is a star forest: (component_min, member)
    members = e.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).distinct()


def label_propagation(
    edges: DataFrame, n_iter: int = 4, checkpoint_every: int = 8
) -> DataFrame:
    """Synchronous label propagation (community detection; Raghavan,
    Albert, Kumara 2007) with FULLY DETERMINISTIC semantics: labels
    start as node ids; each round every node adopts the label most
    frequent among its neighbors, ties broken by SMALLEST label (the
    classic async coin-flips are replaced by the (count desc, label asc)
    rule so engines and partitionings agree bit-for-bit), run for a
    FIXED n_iter rounds (like pagerank — bounded replayable iterations,
    not a data-dependent fixpoint).

    Returns (node, label) for every node incident to an edge. Scale
    shape mirrors pagerank's: edges fold ONCE into per-node-salted
    adjacency arrays, each round is a node-keyed adj ⋈ labels join whose
    fan-out explodes in-partition and partially aggregates map-side
    before the one (node, label) exchange, and lineage truncates every
    checkpoint_every rounds (each round references the previous labels
    exactly once, so in-window plan growth is linear and AQE's
    ReuseExchange materializes the adjacency shuffle once per window).
    The per-node argmax is min_by over the (-count, label) vote struct —
    map-side combinable, no window sort, label never negated so any
    orderable label type stays deterministic. The oracle replays all
    rounds as chained CTEs.

    [NOT IN REFERENCE — executor.py has no graph surface.]"""
    if not (1 <= n_iter <= 50):
        raise ValueError(f"n_iter must be in [1, 50], got {n_iter}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    deg, adj = _adjacency(edges)
    labels = deg.select("node", F.col("node").alias("label"))
    # (count desc, label asc) == min of the (-count, label) struct: only
    # the COUNT (always numeric) is negated, so the rule works for any
    # orderable label type — negating the label instead would silently
    # break string/date node ids
    pick = F.min_by(
        F.col("label"), F.struct((-F.col("__c")).alias("__nc"), F.col("label"))
    )
    for it in range(n_iter):
        # r17: shuffle_hash hint on the node-sized labels side — same
        # rationale and A/B as pagerank's loop (wall −21% vs the
        # per-round broadcast AQE picks locally; broadcast is impossible
        # for billion-node label state and SMJ pays two per-round sorts)
        votes = (
            adj.join(labels.hint("shuffle_hash"), "node")
            .select(F.explode("__dsts").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = votes.groupBy("node").agg(pick.alias("label"))
        if (it + 1) % checkpoint_every == 0 and (it + 1) < n_iter:
            labels = labels.localCheckpoint(eager=True)
    return labels


def oracle_label_propagation_sql(n_iter: int = 4) -> str:
    """Chained-CTE replay of label_propagation over the part-adjacency
    edges — identical vote counting and (count desc, label asc) rule."""
    if not (1 <= n_iter <= 50):
        raise ValueError(f"n_iter must be in [1, 50], got {n_iter}")
    body = [
        f"WITH edges AS ({_EDGES_SQL}),",
        """directed AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM directed),""",
    ]
    for i in range(1, n_iter + 1):
        prev = f"l{i - 1}"
        body.append(f"""v{i} AS (
  SELECT d.dst AS node, p.label, CAST(count(*) AS BIGINT) AS c
  FROM directed d JOIN {prev} p ON d.src = p.node
  GROUP BY d.dst, p.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM v{i}) q
  WHERE rn = 1
),""")
    out = "\n".join(body).rstrip().rstrip(",")
    return out + f"\nSELECT node, label FROM l{n_iter}\n"


# -- DuckDB oracle generators ------------------------------------------------

_EDGES_SQL = """
SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS src,
       greatest(a.l_partkey, b.l_partkey) AS dst
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber + 1
WHERE a.l_partkey <> b.l_partkey
"""


def oracle_edges_sql() -> str:
    return _EDGES_SQL


def oracle_pagerank_sql(n_iter: int = 5, damping_pct: int = 85) -> str:
    """Chained-CTE replay of pagerank() — identical integer arithmetic."""
    if not (1 <= n_iter <= 50):
        raise ValueError(f"n_iter must be in [1, 50], got {n_iter}")
    idiv = lambda a, b: _idiv(a, b, "duck")  # noqa: E731
    body = [
        f"WITH edges AS ({_EDGES_SQL}),",
        """directed AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS node FROM directed),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM directed GROUP BY src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(""" + idiv(str(SCALE), "n") + """ AS BIGINT) AS rank_scaled
  FROM nodes CROSS JOIN nn
),""",
    ]
    for i in range(1, n_iter + 1):
        prev = f"r{i - 1}"
        body.append(f"""c{i} AS (
  SELECT d.dst AS node,
         CAST(sum({idiv("r.rank_scaled", "g.outdeg")}) AS BIGINT) AS contrib
  FROM directed d
  JOIN {prev} r ON d.src = r.node
  JOIN deg g ON d.src = g.node
  GROUP BY d.dst
),
r{i} AS (
  SELECT n.node,
         CAST({idiv(
             f"({100 - damping_pct} * {idiv(str(SCALE), 'nn.n')}"
             f" + {damping_pct} * coalesce(c.contrib, 0))",
             "100",
         )} AS BIGINT) AS rank_scaled
  FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c ON n.node = c.node
),""")
    out = "\n".join(body)
    out = out.rstrip().rstrip(",")
    return out + f"\nSELECT node, rank_scaled FROM r{n_iter}\n"


def oracle_triangles_sql() -> str:
    return f"""
WITH e AS ({_EDGES_SQL}),
nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM e
                                  UNION ALL SELECT dst AS n FROM e) u),
tris AS (
  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
  FROM e ab JOIN e bc ON ab.dst = bc.src
  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM tris) AS n_triangles
"""


def bfs_hop_distances(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Multi-source bounded-hop BFS (r12): for every node reachable from
    the source set within ``max_hops`` undirected hops, the MINIMUM hop
    distance — the classic batch-graph reachability/shortest-path
    primitive beside PageRank / CC / triangles / label propagation
    (unweighted shortest path IS BFS level order).

    ``sources`` is a 1-column (node) DataFrame. Frontier expansion, one
    hop per round: neighbors of the current frontier that are not yet
    visited join at distance h. Distances are exact by induction (a node
    is first reached at its true BFS level; the anti-join guarantees it
    is never re-labeled), so the result is partitioning- and
    order-independent — no tie rules needed.

    100 TB shape: per hop ONE equi-join of the frontier against the
    symmetric edge list (shuffle on node key) + one anti-join against
    the visited set, then an eager localCheckpoint so plan depth stays
    constant (the Pregel-superstep pattern shared with pagerank / CC /
    BPE). State between hops is the visited (node, dist) set — at most
    one row per reached node. Bounded hops is the honest contract at
    scale: an unbounded all-pairs BFS is a different (and quadratic)
    problem; bounded neighborhoods are what feature pipelines actually
    compute. [NOT IN REFERENCE — executor.py has no graph surface.]"""
    if not (1 <= max_hops <= 20):
        raise ValueError(f"max_hops must be in [1, 20], got {max_hops}")
    sym = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("u"), F.col("src").cast("long").alias("v")
            ).filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        sources.select(F.col(sources.columns[0]).cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(h).cast("int"))
            .localCheckpoint(eager=True)
        )
        # bounded driver scalar — the same convergence probe every
        # iterate-until-fixpoint operator here uses
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


# ------------------------------------------------- weighted SSSP (r12)


def consecutive_line_weighted_edges(lineitem: DataFrame) -> DataFrame:
    """Weighted canonical edges: the same adjacent-lines pairs as
    consecutive_line_edges but WITHOUT the distinct — the multiplicity
    (how many orders co-list the pair) becomes the tie strength, and the
    traversal cost is its inverse, ``w = 1 + 64 DIV cnt`` (strong ties
    are short — the standard network-science cost transform for
    co-occurrence graphs). Integer-only, so path costs are exact."""
    a = lineitem.select(
        "l_orderkey",
        F.col("l_linenumber").alias("__ln"),
        F.col("l_partkey").alias("__pa"),
    )
    b = lineitem.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("__ln"),
        F.col("l_partkey").alias("__pb"),
    )
    return (
        a.join(b, ["l_orderkey", "__ln"])
        .filter(F.col("__pa") != F.col("__pb"))
        .select(
            F.least("__pa", "__pb").alias("src"),
            F.greatest("__pa", "__pb").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "src", "dst", (F.lit(1) + F.expr("64 DIV __cnt")).cast("long").alias("w")
        )
    )


_WEIGHTED_EDGES_SQL = """
SELECT src, dst, CAST(1 + 64 // cnt AS BIGINT) AS w
FROM (
  SELECT least(a.l_partkey, b.l_partkey) AS src,
         greatest(a.l_partkey, b.l_partkey) AS dst,
         count(*) AS cnt
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
) g
"""


def oracle_weighted_edges_sql() -> str:
    return _WEIGHTED_EDGES_SQL


def sssp_weighted(
    edges_w: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Multi-source bounded-hop weighted shortest paths (r12): for every
    node reachable from the source set within ``max_hops`` undirected
    edges, the MINIMUM total edge cost over such paths — the weighted
    generalization of bfs_hop_distances via frontier-only Bellman-Ford
    relaxation. Exact by the standard BF induction: after round h,
    ``best`` holds the min cost over paths of <= h edges (relaxing only
    last-round-improved nodes is lossless because any <=h-edge improving
    path extends a <=h-1-edge improving prefix). Deterministic — min is
    order- and partitioning-independent; no tie rules needed.

    100 TB shape: per hop ONE equi-join of the improved frontier against
    the symmetric weighted edge list + one grouped min + one join
    against the running best, each checkpointed so plan depth stays
    constant (the Pregel-superstep pattern of pagerank/CC/BFS/BPE).
    State between hops is one (node, cost) row per reached node. The
    hop bound is the honest scale contract, as with BFS. [NOT IN
    REFERENCE — executor.py has no graph surface.]"""
    if not (1 <= max_hops <= 20):
        raise ValueError(f"max_hops must be in [1, 20], got {max_hops}")
    sym = (
        edges_w.select(
            F.col("src").cast("long").alias("u"),
            F.col("dst").cast("long").alias("v"),
            F.col("w").cast("long").alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges_w.select(
                F.col("dst").cast("long").alias("u"),
                F.col("src").cast("long").alias("v"),
                F.col("w").cast("long").alias("w"),
            ).filter(F.col("u") != F.col("v"))
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    best = (
        sources.select(F.col(sources.columns[0]).cast("long").alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = best
    for _h in range(1, max_hops + 1):
        cand = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        old = best.select("node", F.col("cost").alias("__old"))
        improved = (
            cand.join(old, "node", "left")
            .filter(F.col("__old").isNull() | (F.col("cost") < F.col("__old")))
            .select("node", "cost")
            .localCheckpoint(eager=True)
        )
        # bounded driver scalar — the module's standard convergence probe
        if improved.limit(1).count() == 0:
            break
        best = (
            best.unionByName(improved)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return best


# ---------------------------------------------- link prediction (r12)


def link_prediction_topk(
    edges: DataFrame, k: int = 100, min_cn: int = 2
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell & Kleinberg
    2003): for node pairs NOT currently connected, the number of shared
    neighbors and the Jaccard coefficient of their neighborhoods — the
    classic 'which edges are missing' graph-ML feature (recommendation
    candidates, knowledge-graph completion). Top-k by (jaccard desc,
    pair), pairs below ``min_cn`` shared neighbors dropped.

    Exactness: cn, deg are integers; jaccard = cn/(deg_a + deg_b − cn)
    is ONE correctly-rounded division of exact integers — bit-identical
    cross-engine, ties fall to the (a, b) key order.

    Scale shape: wedge generation is one self-join of the symmetric
    edge list on the middle node (intermediate bounded by Σ deg² — the
    triangle-count bound; a hub-capped variant would pre-filter deg),
    then a grouped count per pair, an anti-join against the edge set
    (existing edges are not 'predictions'), two degree joins, and a
    TakeOrdered — never an all-pairs product."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_cn < 1:
        raise ValueError(f"min_cn must be >= 1, got {min_cn}")
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    e1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("m"))
    e2 = sym.select(F.col("src").alias("m"), F.col("dst").alias("b"))
    # each shared neighbor m contributes exactly one wedge row (sym is
    # distinct), so count(*) IS the common-neighbor count
    cn = (
        e1.join(e2, "m")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .filter(F.col("cn") >= min_cn)
    )
    nonedge = cn.join(
        e,
        (cn["a"] == e["src"]) & (cn["b"] == e["dst"]),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
        nonedge.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(cn AS DOUBLE) / CAST(deg_a + deg_b - cn AS DOUBLE)"
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(k)
    )


def oracle_link_prediction_sql(k: int = 100, min_cn: int = 2) -> str:
    """DuckDB twin of link_prediction_topk over the co-occurrence edges."""
    return f"""
WITH e AS ({_EDGES_SQL}),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY src),
cn AS (
  SELECT e1.dst AS dummy_m, e1.src AS a, e2.dst AS b
  FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
),
cnt AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cn
  FROM cn GROUP BY a, b HAVING count(*) >= {min_cn}
),
nonedge AS (
  SELECT c.* FROM cnt c LEFT JOIN e ON c.a = e.src AND c.b = e.dst
  WHERE e.src IS NULL
)
SELECT n.a, n.b, n.cn, da.deg AS deg_a, db.deg AS deg_b,
       CAST(n.cn AS DOUBLE) / CAST(da.deg + db.deg - n.cn AS DOUBLE)
         AS jaccard
FROM nonedge n
JOIN deg da ON n.a = da.node
JOIN deg db ON n.b = db.node
ORDER BY jaccard DESC, n.a, n.b LIMIT {k}
"""


_AA_W_MICRO = "CAST(round(1000000.0e0 / ln(CAST(deg_m AS DOUBLE)), 0) AS BIGINT)"


def link_prediction_aa_topk(
    edges: DataFrame, k: int = 100, min_cn: int = 2
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): like
    link_prediction_topk but each shared neighbor m contributes
    1/ln(deg(m)) instead of 1 — rare shared neighbors are stronger
    evidence than hubs. The per-middle weight is rounded ONCE to
    integer micros (the bigram-LM ln-determinism pattern) so the
    per-pair score is an INTEGER sum — fold-order free, and a libm ulp
    cannot flip the top-k. A middle node's degree is ≥ 2 by
    construction (it touches both endpoints), so ln never sees 1.
    Same wedge/anti-join machinery and Σ deg² bound as the Jaccard
    scorer; the two rows rank the same candidates by different
    evidence models."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_cn < 1:
        raise ValueError(f"min_cn must be >= 1, got {min_cn}")
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    e1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("m"))
    e2 = sym.select(F.col("src").alias("m"), F.col("dst").alias("b"))
    wedges = (
        e1.join(e2, "m")
        .filter(F.col("a") < F.col("b"))
        .join(deg.select(F.col("node").alias("m"), F.col("deg").alias("deg_m")), "m")
    )
    scored = (
        wedges.select("a", "b", F.expr(_AA_W_MICRO).alias("__w"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("__w").cast("long").alias("aa_micro"),
        )
        .filter(F.col("cn") >= min_cn)
    )
    nonedge = scored.join(
        e, (scored["a"] == e["src"]) & (scored["b"] == e["dst"]), "left_anti"
    )
    return (
        nonedge.select("a", "b", "cn", "aa_micro")
        .orderBy(F.col("aa_micro").desc(), "a", "b")
        .limit(k)
    )


def oracle_link_prediction_aa_sql(k: int = 100, min_cn: int = 2) -> str:
    return f"""
WITH e AS ({_EDGES_SQL}),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY src),
wedge AS (
  SELECT e1.src AS a, e2.dst AS b, d.deg AS deg_m
  FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
  JOIN deg d ON e1.dst = d.node
  WHERE e1.src < e2.dst
),
scored AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum({_AA_W_MICRO}) AS BIGINT) AS aa_micro
  FROM wedge GROUP BY a, b HAVING count(*) >= {min_cn}
),
nonedge AS (
  SELECT s.* FROM scored s LEFT JOIN e ON s.a = e.src AND s.b = e.dst
  WHERE e.src IS NULL
)
SELECT a, b, cn, aa_micro
FROM nonedge ORDER BY aa_micro DESC, a, b LIMIT {k}
"""


# ---------------------------------------------- k-core decomposition (r13)


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 8,
    broadcast_keep: bool = False,
    convergence_probe: bool = True,
    compact_frac: float = 0.25,
) -> DataFrame:
    """K-core: the maximal subgraph where every node has degree >= k,
    by synchronous iterative peeling (Seidman 1983; the Batagelj-
    Zaversnik sequential algorithm's distributed form) — each round
    drops every node whose degree in the CURRENT surviving subgraph is
    below k, until fixpoint. Output: one (node, core_degree) row per
    k-core member plus a `converged` verdict riding every row.

    Correctness does NOT depend on round count or removal order: peeling
    is CONFLUENT (removing a deg<k node never raises another node's
    degree, so the deg>=k fixpoint reached is the unique maximal
    k-core). `converged` re-derives that fixpoint condition in-plan —
    min surviving degree >= k — so an insufficient max_rounds shows up
    as an explicit false on every row, never as a silently-wrong core.

    100 TB shape (r16 optimization — guide §2.3 "shuffle fewer bytes" /
    §2.4): rounds run as DELTA-PEELING over NODE-sized state. The
    symmetric edge list is materialized ONCE; per-round state is one
    (node, surviving-degree) row per survivor, and each round subtracts
    the edges lost to the round's REMOVED set — one semi-filtered scan
    of the pinned edge list grouped by the surviving endpoint — instead
    of re-semi-joining and re-checkpointing the whole edge list. The
    previous form checkpointed O(E) rows per round (8 edge-sized
    materializations at the registered row's max_rounds=8); this form
    checkpoints O(N) rows per round and touches edge-sized data only in
    the loss scan, whose shuffled output is bounded by the removed
    nodes' degree sum (zero once peeling quiesces). Equivalence with
    the synchronous induced-subgraph recount is inductive — deg in the
    round-r induced subgraph = full degree minus edges to all
    previously removed nodes — and is property-tested against a python
    reference peeling plus a per-round recount twin. Measured A/B at
    sf0.1 (registered row, same session): ~4.6-5.0 s -> ~3.5-4.1 s.
    Knobs:

    - broadcast_keep: True broadcasts the per-round REMOVED frontier
      into the loss semi-join so the edge list never shuffles there;
      the default stays False (shuffle-safe) because at extreme scale
      a first-round removed set can be a large fraction of the node
      list, and AQE can still pick the broadcast at runtime.
    - convergence_probe: bounded driver scalar as an early-exit check,
      one count job per round — now over the node-sized survivor
      state, not the edge list. False skips the probes and always runs
      the bounded max_rounds; post-fixpoint rounds are no-op node-sized
      filters, and the `converged` verdict (not the probe) is what
      guards correctness.
    - compact_frac (r17, VERDICT r16 #6): every round's loss semi-join
      scans the FULL pinned edge list even when the frontier is tiny —
      fine while peeling is shallow, the dominant remaining cost on a
      deep peel at 100 TB. When the nodes removed since the last pin
      exceed compact_frac of the node count AT that pin, the edge list
      is re-filtered to current survivors and re-checkpointed, so
      subsequent loss scans read only surviving edges. The trigger is
      DATA-ADAPTIVE, reusing the probe's counts (the round-0 probe
      returns node total + below-k count in one aggregate): a shallow
      peel (the registered sf0.1 row removes 6.3% of nodes across all
      rounds) never compacts and pays nothing; a deep peel compacts
      every time another quarter of the graph dissolves, bounding the
      per-round scan without reverting to O(E)-per-round checkpoints.
      Requires the probe (no counts without it); 0 disables. Peeling
      confluence makes the result independent of compaction: removed
      sets are always subsets of the survivors at any earlier pin, so
      every loss edge is still present.
    [NOT IN REFERENCE — executor.py has no graph surface.]"""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (1 <= max_rounds <= 30):
        raise ValueError(f"max_rounds must be in [1, 30], got {max_rounds}")
    # Self-loop guard on the UNION result, not just the first leg — a
    # self-loop edge would otherwise re-enter via the reversed second
    # leg and count 1 toward degree (ADVICE r13). The oracle's sym CTE
    # carries the same a <> b predicate.
    sym = (
        _both_directions(
            edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            src="a",
            dst="b",
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # (node, surviving-degree) state; one edge-sized groupBy, ONCE.
    surv = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
        .localCheckpoint(eager=True)
    )
    n_pin: int | None = None  # node count at the last edge-list pin
    cum_removed = 0
    for it in range(max_rounds):
        removed = surv.filter(F.col("__d") < k).select("a")
        if convergence_probe and compact_frac <= 0:
            # compaction off: the probe needs no counts — keep the
            # cheapest short-circuiting form
            if removed.isEmpty():
                break
        elif convergence_probe:
            if n_pin is None:
                # one aggregate gives BOTH the probe and the compaction
                # denominator — no extra job vs the old isEmpty()
                row0 = surv.agg(
                    F.count(F.lit(1)).alias("__n"),
                    F.sum((F.col("__d") < k).cast("long")).alias("__nr"),
                ).collect()[0]
                n_pin, n_rem = int(row0["__n"]), int(row0["__nr"] or 0)
            else:
                n_rem = removed.count()
            if n_rem == 0:
                break
            cum_removed += n_rem
        removed_b = removed.select(F.col("a").alias("b"))
        if broadcast_keep:
            removed_b = F.broadcast(removed_b)
        # edges whose far endpoint was just removed, counted per near
        # endpoint — the only edge-sized touch in the round, and its
        # shuffle carries one row per (survivor, lost-edge) only
        loss = (
            sym.join(removed_b, "b", "leftsemi")
            .groupBy("a")
            .agg(F.count(F.lit(1)).cast("long").alias("__l"))
        )
        surv = (
            surv.filter(F.col("__d") >= k)
            .join(loss, "a", "left")
            .select(
                "a",
                (F.col("__d") - F.coalesce(F.col("__l"), F.lit(0).cast("long")))
                .cast("long")
                .alias("__d"),
            )
            .localCheckpoint(eager=True)
        )
        if (
            compact_frac > 0
            and convergence_probe
            and (it + 1) < max_rounds
            and cum_removed >= compact_frac * n_pin
        ):
            keys = surv.select("a")
            sym = (
                sym.join(keys, "a", "leftsemi")
                .join(keys.select(F.col("a").alias("b")), "b", "leftsemi")
                .localCheckpoint(eager=True)
            )
            n_pin -= cum_removed
            cum_removed = 0
    # a survivor whose every neighbor peeled has no surviving edge — the
    # induced-subgraph recount form had no row for it; drop it here too
    deg = surv.filter(F.col("__d") >= 1).select(
        "a", F.col("__d").alias("core_degree")
    )
    conv = deg.agg(
        F.coalesce(F.min("core_degree") >= k, F.lit(True)).alias("converged")
    )
    return (
        deg.select(F.col("a").alias("node"), "core_degree")
        .crossJoin(F.broadcast(conv))
        .orderBy("node")
    )


def oracle_kcore_sql(k: int, max_rounds: int = 8) -> str:
    """DuckDB twin: the peeling rounds replayed as chained CTEs (the
    pagerank/LPA playbook). Confluence makes the replay exact: both
    engines remove the same synchronous batches, and the shared
    fixpoint verdict (min surviving degree >= k) rides every row.
    Every stage is MATERIALIZED — DuckDB inlines plain CTEs, and each
    n_i references n_{i-1} twice, so un-materialized chains re-evaluate
    the whole prefix 2^rounds times (the BPE oracle's lesson,
    text_suite.py:851)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_EDGES_SQL}),",
        "sym AS MATERIALIZED (SELECT a, b FROM (SELECT src AS a, dst AS b"
        " FROM e UNION SELECT dst, src FROM e) WHERE a <> b),",
        "n0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym),",
    ]
    for i in range(1, max_rounds + 1):
        parts.append(
            f"n{i} AS MATERIALIZED (\n"
            f"  SELECT a AS node FROM sym\n"
            f"  WHERE a IN (SELECT node FROM n{i - 1})\n"
            f"    AND b IN (SELECT node FROM n{i - 1})\n"
            f"  GROUP BY a HAVING count(*) >= {k}\n"
            "),"
        )
    last = f"n{max_rounds}"
    parts.append(
        "deg AS MATERIALIZED (\n"
        "  SELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree\n"
        f"  FROM sym WHERE a IN (SELECT node FROM {last})\n"
        f"    AND b IN (SELECT node FROM {last})\n"
        "  GROUP BY a\n"
        "),\n"
        "conv AS (SELECT coalesce((SELECT min(core_degree) FROM deg)"
        f" >= {k}, TRUE) AS converged)\n"
        "SELECT node, core_degree, converged FROM deg, conv ORDER BY node"
    )
    return "\n".join(parts)
