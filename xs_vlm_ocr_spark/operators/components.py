"""Connected components over near-duplicate pair lists (pairs -> clusters).

The near-dup operators (text_dedup.py) emit PAIRS (a, b, score); an
actual deduplication pass needs CLUSTERS: the transitive closure of the
pair relation, one canonical winner per cluster. A 10^12-row corpus can
have components far larger than any executor's memory and chains far
longer than any fixed iteration count, so the driver-side union-find
that a single-node engine would use (and that the reference's SQLite
history layer effectively is — one process owns all rows) does not
transfer.

Spark restatement: the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (ACM SoCC
2014) — each round is two groupBy+join passes over the edge list, the
edge list only shrinks toward per-component stars, and convergence takes
O(log n) rounds even on adversarial chain graphs (vs O(diameter) for
naive label propagation). Every step is a plain DataFrame groupBy /
join, so AQE handles skewed mega-components the same way it handles any
skewed aggregation; per-round ``localCheckpoint`` truncates the
otherwise-exponential iterative lineage.

Determinism: component ids are the MINIMUM member id, ties impossible;
the result is a pure function of the edge set (iteration order does not
matter — the fixpoint is unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "assign_clusters",
    "finalize_canonical",
    "incremental_components",
]

# rounds taken by the most recent connected_components call — exposed
# for tests and scale probes that pin the O(log n) convergence claim
LAST_ROUNDS: int = 0


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, no self-loops."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropna()
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every neighbor v > u links to min(N(u) + {u}).

    Operates on the symmetric edge list; strictly decreases the sum of
    edge endpoints unless already large-star-stable (Kiveris et al. §3).
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    )
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient edges (u > v); every small neighbor and u
    itself link to the minimum small neighbor."""
    o = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    j = o.join(mins, "u")
    neighbor_links = j.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_links = mins.select("u", F.col("m").alias("v"))
    return _canon(neighbor_links.union(self_links))


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """Order-independent edge-set fingerprint: (count, xor of xxhash64).

    bit_xor never overflows (sum would, under ANSI mode). Used as the
    cheap convergence SCREEN only: a 64-bit-xor collision between two
    consecutive NON-equal edge sets would otherwise end the loop early
    and extract members from a non-star edge set (wrong clusters), so
    ``connected_components`` CONFIRMS an apparent fixpoint with an exact
    set-equality check (equal counts + one-directional exceptAll — both
    sides are distinct sets) before extracting; a collision then merely
    costs that one confirming comparison and the loop continues.
    """
    row = edges.select(F.xxhash64("u", "v").alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    ``component`` is the minimum node id of the node's connected
    component (the node itself for component roots). Nodes not present
    in any pair are not emitted — callers union singletons back via
    :func:`assign_clusters`.

    max_iter bounds the driver loop; large-star/small-star needs
    O(log n) rounds, so 50 covers any physically storable graph. A
    non-converged exit raises rather than returning partial clusters.
    """
    global LAST_ROUNDS
    # checkpoint BEFORE deriving nodes: nodes is evaluated again by the
    # final roots anti-join, and off the pre-checkpoint lineage that
    # evaluation would re-scan the full input pair set (plus _canon's
    # distinct exchange) just to enumerate ids
    edges = _canon(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    prev = _checksum(edges)
    for rounds in range(1, max_iter + 1):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(new_edges)
        # checksum match is a screen; CONFIRM with an exact set-equality
        # check before trusting it (equal counts are already part of the
        # checksum tuple; both sides are distinct sets, so one-direction
        # exceptAll emptiness completes multiset equality). Runs ONCE
        # per apparent fixpoint — O(final star set), negligible against
        # the loop — and turns a 2^-64 xor collision from a wrong answer
        # into one extra round.
        if cur == prev and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            LAST_ROUNDS = rounds
            break
        prev, edges = cur, new_edges
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # Converged: edges form stars, canonically stored (u=root, v=member)
    # with u < v — the root is the component minimum. Each member node
    # appears exactly once as a v; roots never appear as a v and are
    # component ids of themselves.
    member = edges.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = nodes.join(member.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return member.union(roots)


def incremental_components(
    prev: DataFrame,
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Update a (node, component) assignment under NEW pairs without
    re-reading the historical pair set.

    Star compression preserves connectivity — CC(stars(CC(E1)) ∪ E2) ==
    CC(E1 ∪ E2) — so the convergence input is the previous assignment's
    member→root edges (|V| rows, one per previously clustered node)
    plus only the increment's pairs, never the full pair history. At
    corpus scale that turns per-ingest cluster maintenance from
    O(all pairs ever) into O(previously clustered nodes + new pairs).
    Bit-equal to a full recompute over the union (pinned by test).

    ``prev``: (node, component) rows; component roots (node ==
    component) contribute no edge but stay in the output node set, so
    feeding a previous output back in is closed under composition.
    """
    prev_edges = (
        prev.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("u"), F.col("component").alias("v"))
    )
    new_edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    comp = connected_components(
        prev_edges.unionByName(new_edges), "u", "v", max_iter
    )
    all_nodes = (
        prev.select("node")
        .union(pairs.select(F.col(a_col).alias("node")))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    return (
        all_nodes.join(comp, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def finalize_canonical(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Given rows with a ``cluster_id``, mark ``is_canonical`` as the
    minimum PRESENT member of each cluster. The cluster id itself is
    the minimum member of the pair graph's component, but that doc may
    be absent from ``df`` (retired by retention/expiry, or the caller
    clusters a subset) — a dedup pass keeping only canonical rows must
    never be left with a winner-less cluster."""
    winners = df.groupBy("cluster_id").agg(F.min(id_col).alias("_w"))
    return (
        df.join(winners, "cluster_id")
        .withColumn(
            "is_canonical", (F.col(id_col) == F.col("_w")).cast("int")
        )
        .drop("_w")
    )


def assign_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Every doc mapped to its dedup cluster: docs in no pair are their
    own singleton cluster; ``is_canonical`` marks the one row per
    cluster that a dedup pass keeps (min PRESENT member id —
    deterministic, and still well-defined when the component minimum is
    not in ``docs``).

    Output: docs' columns + (cluster_id, is_canonical int).
    """
    comp = connected_components(pairs, a_col=a_col, b_col=b_col, max_iter=max_iter)
    comp = comp.withColumnRenamed("node", id_col)
    out = docs.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    return finalize_canonical(out, id_col)
