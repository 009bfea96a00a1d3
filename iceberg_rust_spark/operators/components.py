"""Connected components over near-duplicate pair edges — the clustering step
that turns pairwise dedup output (minhash/simhash/embedding LSH) into
keep-one-per-cluster decisions in a training-data pipeline.

Beyond-reference surface (like operators/dedup.py). Algorithm: iterative
min-label propagation with pointer-jumping compression — every node adopts
the smallest label among itself and its neighbors, then (from round 2)
jumps to its label's label, doubling the distance covered per round.
Near-duplicate graphs are dense low-diameter blobs (a cluster of N copies
is close to a clique), so round 1 settles real corpora in one join + one
aggregate; pathological chain shapes converge in O(log diameter) rounds
(Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds"), so `max_iter`=25 reaches any graph up to diameter
~2^24. Each round is one action; labels persist round-over-round and the
previous round is unpersisted, so lineage stays O(1) and memory O(nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25,
                         reliable: bool = False,
                         checkpoint_dir: str = None,
                         small_graph_cap: int = 100_000) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the component
    id is the smallest node id in the component (deterministic canonical
    representative).

    ``small_graph_cap``: near-dup pair graphs are usually TINY relative to
    the corpus (most docs have no near-duplicate), while each distributed
    propagation round costs fixed job-launch latency. When the symmetrized
    edge list fits under the cap (default 100k edges ≈ a few MB), a
    driver-side union-find (union-by-min + path compression) computes the
    identical labels in microseconds — the bounded-collect pattern used
    elsewhere (CDC target lists). The probing collect doubles as the edge
    checkpoint's materialization, so an over-cap graph pays nothing extra:
    the loop starts against already-persisted blocks. Pass 0 to force the
    distributed loop (the SCALE probe does, so the iterative path keeps
    its measured evidence).

    ``reliable=True`` swaps the per-round localCheckpoint for a RELIABLE
    checkpoint (written to ``checkpoint_dir`` / the session's configured
    checkpoint dir): localCheckpoint blocks live on executors, so losing one
    executor mid-iteration kills the whole job on a real cluster — reliable
    checkpoints survive executor loss at the cost of a filesystem write per
    round. Use it for long iterative runs on preemptible/spot fleets; the
    default stays local (faster) for short-lived local jobs."""
    # null endpoints (the cast('long') nulls any non-numeric id): a null
    # is not a node, so edges with a null side carry no adjacency — but
    # the VALID side of a half-null edge is still a referenced node and
    # must come out as a singleton component (callers join labels back
    # to the corpus; silently losing the node loses corpus rows). The
    # split happens AFTER the symmetrize checkpoint below, so the
    # (possibly expensive) upstream pair pipeline runs exactly once.
    e = edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
    spark = edges.sparkSession
    if reliable and checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    if reliable:
        def _ckpt(df, eager=True):
            return df.checkpoint(eager=eager)
    else:
        def _ckpt(df, eager=True):
            return df.localCheckpoint(eager=eager)
    # Checkpoint, not persist: the edge list is referenced by every round,
    # and a mere .persist() left the (possibly expensive) upstream
    # pair-generation pipeline in the lineage — measured re-running under
    # the lazily-checkpointed label joins. Truncating here makes each round
    # plan against a materialized scan of the (small) edge set. LAZY (r7):
    # an eager checkpoint was a whole extra sequential action just to
    # materialize the pipeline; folding it into round 1's convergence
    # action lets ReuseExchange collapse the duplicated upstream subtree
    # inside the one job — one fewer job launch per call, same data read.
    # repartition("b") BEFORE the checkpoint: every round joins und on "b";
    # Dataset.checkpoint preserves the hash partitioning in the LogicalRDD,
    # so the static edge side never re-shuffles inside the loop — only the
    # (changing) label side moves each round. One extra shuffle up front
    # buys max_iter saved shuffles of the larger relation.
    # NO distinct(): min-label propagation is idempotent under duplicate
    # edges and self-loops — they add rows to the per-round min() aggregate
    # but never change its value — so the dedup shuffle that used to sit
    # here bought nothing but wall time. Producers with heavy edge
    # multiplicity can pre-distinct on their side if the volume warrants.
    # symmetrize via explode, NOT union: a union's two branches are
    # separate subtrees, so the (possibly expensive) upstream edge
    # pipeline — an LSH join for near-dup graphs — executed TWICE inside
    # the checkpoint job (ReuseExchange only collapses identical
    # exchanges, and the pipeline's top operator isn't one). explode
    # emits both directions from ONE computation of each edge row.
    sym = (e.where(F.col("a").isNotNull() | F.col("b").isNotNull())
           .select(F.explode(F.array(
               F.struct(F.col("a"), F.col("b")),
               F.struct(F.col("b").alias("a"),
                        F.col("a").alias("b")))).alias("_e"))
           .select("_e.a", "_e.b"))
    if small_graph_cap:
        # bounded probe FIRST, against the bare symmetrized stream (r14):
        # the common small-graph path used to probe through the
        # repartition+checkpoint built for the distributed loop, paying a
        # full extra exchange and block persistence only to discard them
        # when the union-find answered. Probing the un-repartitioned
        # stream keeps the small path at exactly one pipeline run with no
        # exchange/persist; an over-cap graph pays one bounded probe job
        # before the loop's checkpoint materialization (rare by
        # construction, and the probe's limit bounds its extra cost).
        sym_cap = 2 * small_graph_cap
        probe = sym.limit(sym_cap + 1).collect()
        if len(probe) <= sym_cap:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in probe:
                pa_, pb_ = r["a"], r["b"]
                for v in (pa_, pb_):
                    if v is not None and v not in parent:
                        parent[v] = v
                if pa_ is None or pb_ is None:
                    continue            # half-null: singleton only
                ra, rb = find(pa_), find(pb_)
                if ra != rb:
                    # union-by-min: the root of every set stays its
                    # smallest member, so root == the distributed loop's
                    # min-label component id
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            rows = [(v, find(v)) for v in parent]
            from ..session import local_df
            return local_df(spark, rows, "node long, component long")
    # over-cap (or cap=0): build the loop's static edge side.
    # repartition("b") BEFORE the checkpoint (see the block comment
    # above): every round joins und on "b" and Dataset.checkpoint
    # preserves the hash partitioning, so the static side never
    # re-shuffles inside the loop. LAZY: round 1's convergence action
    # materializes it.
    und_all = _ckpt(sym.repartition(F.col("b")), eager=False)
    # adjacency side: both endpoints real. Half-null edges appear in
    # und_all as exactly one (valid, null) row each (the symmetric twin
    # is (null, valid)) — those valid endpoints become singletons.
    und = und_all.where(F.col("a").isNotNull() & F.col("b").isNotNull())
    # localCheckpoint per round, NOT just persist: an iterative self-join
    # grows the LOGICAL plan exponentially even when the data is cached —
    # analysis/codegen OOMs by ~iteration 20. Checkpointing truncates the
    # lineage so every round plans against a flat scan (reliable=True for
    # executor-loss-safe runs).
    # seed labels with round 1 fused in: label = min(self, neighbors) —
    # same shuffle as a plain distinct would cost, one fewer loop round
    # (dense near-dup clusters are cliques and converge immediately)
    prev_ckpt = _ckpt(und.groupBy("a").agg(F.min("b").alias("_mb"))
                      .select("a", F.least("a", "_mb").alias("label")),
                      eager=False)
    labels = prev_ckpt
    # the null threaded through the neighbor rows below must match the label
    # column's type exactly — deriving it (instead of hard-coding long) keeps
    # the union well-typed if callers ever feed non-numeric node ids
    label_type = prev_ckpt.schema["label"].dataType
    for rnd in range(max_iter):
        # Thread each node's OLD label through the same union+aggregate that
        # computes its new label: the self row carries old=label, neighbor
        # rows carry old=NULL (min ignores nulls; every node has exactly one
        # self row because labels covers every vertex of the symmetric edge
        # set). The convergence test is then a plain max() over the aggregate
        # output — ONE action per round, no separate new-vs-old join (the
        # old shape cost an extra shuffle join + job every round and was the
        # wall driver on small graphs where launch overhead dominates).
        cur = labels.select("a", "label", F.col("label").alias("old"))
        nbr = (und.join(cur.select(F.col("a").alias("b"),
                                   F.col("label")), "b")
               .select("a", "label",
                       F.lit(None).cast(label_type).alias("old")))
        prop = (cur.unionByName(nbr).groupBy("a")
                .agg(F.min("label").alias("label"),
                     F.min("old").alias("old")))
        if rnd > 0:
            # Pointer-jumping compression (r8, Rastogi et al. "Finding
            # Connected Components in Map-Reduce in Logarithmic Rounds"):
            # label <- label(label). Every label value is itself a vertex
            # (labels are min node-ids), so one self-join doubles the
            # distance already covered — rounds drop from O(diameter) to
            # O(log diameter), and max_iter=25 now converges any graph up
            # to diameter ~2^24 instead of silently returning split
            # components past 25 hops. Round 1 skips it: near-dup graphs
            # are cliques that converge at the seed hop, and the common
            # case must stay one join + one aggregate per call.
            m = prop.select(F.col("a").alias("_ma"),
                            F.col("label").alias("_ml"))
            prop = (prop.join(m, prop["label"] == m["_ma"], "left")
                    .select("a", F.coalesce("_ml", "label").alias("label"),
                            "old"))
        # lazy checkpoint: the convergence aggregate below is the one action
        # per round — it materializes the checkpoint as a side effect
        new_ckpt = _ckpt(prop, eager=False)
        changed = new_ckpt.select(
            F.max((F.col("label") < F.col("old")).cast("int"))
            .alias("c")).first()[0]
        prev_ckpt.unpersist()
        prev_ckpt = new_ckpt
        labels = new_ckpt.select("a", "label")
        if not changed:
            break
    out = labels.select(F.col("a").alias("node"),
                        F.col("label").alias("component"))
    # valid endpoints of half-null edges become singleton components.
    # One cheap existence probe over the already-persisted blocks keeps
    # the common no-nulls case exactly as before (blocks unpersisted,
    # plain labels plan); only inputs that actually carry half-null
    # edges pay the extra union + anti-join and keep the blocks alive
    # for the returned lazy plan.
    half = und_all.where(F.col("a").isNotNull() & F.col("b").isNull())
    if half.limit(1).count() == 0:
        und_all.unpersist()
        return out
    singles = (half.select("a").distinct()
               .join(labels.select("a"), "a", "left_anti")
               .select(F.col("a").alias("node"),
                       F.col("a").alias("component")))
    return out.unionByName(singles)


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b",
                   small_graph_cap: int = 100_000) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, cluster_size), cluster_id =
    min doc id in the cluster. Rows = every doc that had at least one
    near-duplicate; docs absent from ``pairs`` are singletons by definition
    and are left out (at scale that's the overwhelming majority — emitting
    them would turn a cluster summary into a full-corpus pass).
    ``small_graph_cap`` forwards to connected_components (0 = always run
    the distributed loop)."""
    from pyspark.sql import Window
    comp = connected_components(pairs, id_a, id_b,
                                small_graph_cap=small_graph_cap)
    # count() over a component window: ONE shuffle (partition by component)
    # instead of the groupBy + join-back shape's two — comp has exactly one
    # row per node, so the window count IS the cluster size.
    w = Window.partitionBy("component")
    return comp.select(F.col("node").alias("doc_id"),
                       F.col("component").alias("cluster_id"),
                       F.count("*").over(w).alias("cluster_size"))
