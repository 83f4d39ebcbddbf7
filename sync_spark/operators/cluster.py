"""Connected components over near-duplicate pair graphs — the final
dedup step: a SURVIVOR PER CLUSTER, not per pair (transitively, A~B
and B~C must collapse to one survivor even when A≁C directly).

Algorithm: iterative min-label propagation (the DataFrame-native
variant of large-star/small-star; Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public algorithm).
Each round every node takes the min label among itself and its
neighbors; converges in O(graph diameter) rounds. Near-dup clusters
have tiny diameters (pairs share most shingles), so 3-5 rounds
typically suffice; the loop checks an actual convergence counter
rather than trusting a fixed count.

Scale notes: each round is one join + one aggregation, both keyed by
node id. Lineage is cut per round with localCheckpoint — iterative
joins otherwise build exponentially deep plans (the classic iterative-
Spark trap). Label state is 16 bytes/node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """nodes(id), edges(id_a, id_b) undirected → (id, cluster_id)
    where cluster_id = min node id reachable.

    Two regimes, same answer:
    - edge list ≤ ``driver_threshold``: union-find on the driver. The
      near-dup pair graph is normally MINUSCULE next to the corpus
      (256 edges for 5000 docs on the test data), and the distributed
      loop's per-round jobs are pure scheduling overhead there. The
      boundary is sized by ABSOLUTE driver cost, not corpus scale:
      1M edges arrive as ~16 MB of Arrow (sub-second collect) and
      union-find touches them once (~2s of driver CPU) — cheaper than
      even one round of the distributed loop's join+agg+checkpoint on
      any cluster, and the loop needs O(log diameter) rounds. (r12:
      raised from 200k after the sf1 pair graph, 250,600 edges, landed
      just past the old boundary and paid ~4 rounds of loop jobs for
      a graph the driver resolves in under a second; interleaved A/B
      won 4/5 draws. The 200k value predates the Arrow edge collect.)
    - larger: the checkpointed min-label-propagation loop below, one
      join + one aggregation per round.
    """
    # materialize the (expensive) pair lineage exactly ONCE, fully in
    # parallel: the distributed loop would otherwise re-evaluate the
    # whole pair join a second time when building `both`.
    # MEMORY_AND_DISK checkpoint storage spills rather than OOMs if
    # the edge list is huge. LAZY checkpoint (r11 opt round, guide
    # §1.2): the regime probe below is the first action, so it
    # materializes the checkpoint in the same job.
    edges_m = edges.select("id_a", "id_b").localCheckpoint(eager=False)
    # regime probe FOLDED into the edge collect (r12 continuation,
    # guide §1.2): limit(threshold+1).toPandas() picks the regime AND
    # delivers the rows the small case consumes in ONE job. The Arrow
    # collect path executes CollectLimitExec.doExecute (per-partition
    # LocalLimit + one-partition shuffle of ≤ threshold+1 narrow rows,
    # full scan parallelism) — NOT the executeTake scale-up waves that
    # made a pickled limit-collect probe a serializing hazard (the r8
    # rejection, which predates the Arrow edge transfer). Measured at
    # sf0.1: 3 jobs (AQE-staged count + checkpoint-read collect) → 1.
    # Large regime: ≤ threshold+1 rows (~16 MB Arrow at the 1M cap)
    # ship once and are discarded — bounded by the same absolute
    # driver budget the small regime already accepts.
    pdf = edges_m.limit(driver_threshold + 1).toPandas()
    if len(pdf) <= driver_threshold:
        return _driver_union_find(nodes, pdf, id_col)
    both = edges_m.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges_m.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))

    # only edge-touched nodes participate in propagation; singletons
    # are trivially their own cluster and skip the loop entirely
    touched = both.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    labels = touched.withColumn("label", F.col("node"))
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("label"),
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "mid_label"
            ),
        )
        # POINTER JUMP (r9 verdict #7 — halve the pass count on
        # chain-heavy graphs): after the neighbor step, shortcut each
        # node's label to its label's OWN label (L(v) ← min(L(v),
        # L(L(v)))). Propagation alone needs O(diameter) rounds; with
        # the jump the pointer chains halve per round, so convergence
        # is O(log diameter) — the standard pointer-doubling
        # acceleration (Kiveris et al.'s alternation achieves the same
        # bound by rewriting edges; this variant keeps the edge set
        # immutable, which preserves the checkpointed-loop structure).
        # CORRECTNESS invariant unchanged: L(v) is always the id of a
        # node REACHABLE from v (labels start as self, the neighbor
        # step moves them along edges, and the jump composes two
        # reachability hops), monotonically decreasing and bounded by
        # the component min — so the fixpoint is exactly min-reachable.
        # The lookup side is the PREVIOUS round's CHECKPOINTED label
        # function, not `stepped` itself — a stepped-vs-stepped
        # self-join would execute the neighbor aggregation twice per
        # round, spending the very pass count the jump saves.
        lut = labels.select(
            F.col("node").alias("__t_node"), F.col("label").alias("__t_label")
        )
        # ONE materialization per round: checkpoint the (old, new)
        # pair, then both the convergence check and the next round's
        # input are cheap reads of the checkpointed data
        updated = (
            stepped.join(lut, stepped.mid_label == lut.__t_node, "left")
            .select(
                "node",
                F.col("label"),
                F.least(
                    F.col("mid_label"),
                    F.coalesce(F.col("__t_label"), F.col("mid_label")),
                ).alias("new_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    if not converged:
        # a silently-split component would leak duplicate "survivors";
        # fail loudly instead (raise max_iter for huge-diameter graphs)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter)"
        )
    cc_touched = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
    singletons = (
        nodes.select(F.col(id_col))
        .join(touched.withColumnRenamed("node", id_col), id_col, "left_anti")
        .withColumn("cluster_id", F.col(id_col))
    )
    return cc_touched.unionByName(singletons)


def _driver_union_find(nodes: DataFrame, pdf, id_col: str) -> DataFrame:
    """Small-graph path: union-find over the driver-collected edge
    list with min-id roots (identical labels to min-label
    propagation), ship the touched-node mapping back, and anti-join
    for singletons. ``pdf`` is the already-collected pandas edge
    frame — it arrives via Arrow ``toPandas`` (r12, guide §6 — the
    Arrow driver transfer: 250k edges measured 0.68s vs 3.33s for the
    pickled-Row ``collect()``), folded into the regime probe's
    limit-collect (one job, see connected_components); ``.tolist()``
    converts the columns back to plain Python scalars so the
    union-find and the VALUES/schema branches below see the same
    values as before."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf.iloc[:, 0].tolist(), pdf.iloc[:, 1].tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root so cluster_id = min reachable node id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    mapping = [(n, find(n)) for n in parent]
    spark = nodes.sparkSession
    id_field = nodes.select(id_col).schema.fields[0]
    id_type = id_field.dataType.simpleString()
    values_literal = False
    if mapping and id_type in ("bigint", "int", "smallint", "tinyint") and len(mapping) <= 50_000:
        # r11 (guide §4 — the Python boundary): createDataFrame(list)
        # parallelizes a PICKLED RDD, so every downstream action of the
        # assembly re-ran 32 Python-worker tasks just to deserialize a
        # few hundred labels. A VALUES literal plans as a JVM
        # LocalRelation: the broadcast build is driver-side, no Python
        # workers, no scan tasks. Bounded: integer ids only and
        # ≤ 50k pairs of SQL text (the small regime is already capped
        # by driver_threshold edges).
        vals = ", ".join(f"({a},{b})" for a, b in mapping)
        touched = spark.sql(
            f"SELECT CAST(col1 AS {id_type}) AS {id_col}, "
            f"CAST(col2 AS {id_type}) AS cluster_id FROM VALUES {vals}"
        )
        values_literal = True
    elif mapping:
        schema = f"{id_col} {id_type}, cluster_id {id_type}"
        # r12: mappings past the VALUES cap ship as an Arrow local
        # frame (driver-serialized batches decoded JVM-side) instead
        # of a pickled-RDD createDataFrame — no Python-worker tasks
        # per downstream action. NOTE kept from the pickled era: no
        # coalesce(1) here — collapsing the local frame to one slice
        # measured 10s vs 1s by dragging every slice through a single
        # decode task per downstream use.
        from sync_spark.operators.localrel import arrow_local_frame

        touched = arrow_local_frame(spark, mapping, schema)
    else:
        touched = nodes.select(
            F.col(id_col), F.col(id_col).alias("cluster_id")
        ).limit(0)
    # explicit broadcast: an ExistingRDD side has no size statistics,
    # so Catalyst would otherwise plan a full sort-merge anti-join
    # (both sides shuffled) against a mapping that is at most
    # driver_threshold rows — measured 2.5s → 0.3s on the assembly
    singletons = (
        nodes.select(F.col(id_col))
        .join(F.broadcast(touched.select(id_col)), id_col, "left_anti")
        .withColumn("cluster_id", F.col(id_col))
    )
    # coalesce(1) on the UNION side only (r11 opt round): a VALUES
    # LocalTableScan consumed as an RDD plans leafNodeDefaultParallelism
    # (= core count) near-empty tasks — 32 tasks to ship a few hundred
    # driver literals into the union. The broadcast build above stays
    # on the raw frame: LocalTableScan.executeCollect() short-circuits
    # driver-side, and a Coalesce on top would force it back through a
    # task. Bounded: ≤ driver_threshold rows by construction. Applied
    # to the VALUES branch ONLY: on the pickled createDataFrame
    # fallback a no-shuffle coalesce(1) drags every pickled slice
    # through one Python worker (measured 10s vs 1s — the NOTE above).
    if values_literal:
        touched = touched.coalesce(1)
    return touched.unionByName(singletons)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """docs + near-dup pairs → (doc_id, cluster_id, is_survivor).
    Survivor = min doc_id per cluster (deterministic), singletons are
    their own cluster."""
    nodes = docs.select(id_col)
    cc = connected_components(nodes, pairs, id_col=id_col)
    return cc.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_survivor"),
    )
