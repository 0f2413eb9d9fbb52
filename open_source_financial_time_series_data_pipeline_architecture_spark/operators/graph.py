"""Distributed connected components — duplicate-CLUSTER formation.

Pair enumerators (MinHash/SimHash LSH, embedding blocking, entity
linkage) emit EDGES; a curation pipeline needs the CLUSTERS those edges
imply, then keeps one canonical document per cluster. This is the
pair→cluster step rebuilt Spark-first: iterative min-label propagation
with POINTER JUMPING, entirely in DataFrame joins/aggregations.

Per round, every vertex takes the minimum label among itself and its
neighbors (one hop), then compresses paths by adopting its label's
label (label tables self-join — Wyllie's pointer jumping). Hop alone
needs O(diameter) rounds; with jumping the label graph's depth roughly
halves per round, so convergence is O(log D) rounds — and near-dup
clusters have tiny diameters anyway (a dup cluster is usually a dense
blob, not a path). Each round is two shuffles on the edge/vertex key;
nothing is ever collected to the driver except the 1-row convergence
probe. This is the standard map-reduce CC recipe (Kiveris et al. 2014
"Connected Components in MapReduce and Beyond" — large-star/small-star
is the same idea with a different union order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: integral id types where the sum-of-labels convergence probe is exact
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _label_sum(labels: DataFrame):
    """Exact order-independent fingerprint of an integral label frame:
    decimal(38,0) sum never overflows below ~1e20 total, so equality
    with the previous round's sum ⟺ no label moved (labels are
    per-vertex monotone non-increasing under min-propagation)."""
    return labels.agg(
        F.sum(F.col("label").cast(T.DecimalType(38, 0)))
    ).first()[0]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex incident to ``edges``; the
    component id is the MINIMUM vertex id in the component (canonical —
    "keep the smallest doc_id" is the usual dedup survivor rule).
    Deterministic; raises if ``max_iter`` rounds do not converge
    (log-diameter rounds suffice, so 25 covers any real graph)."""
    # Symmetrize with ONE pass over the edge subtree: explode each edge
    # into both directions. A unionByName of two selects referenced the
    # (often expensive — an LSH pair enumeration) upstream DAG twice
    # and executed it twice inside this checkpoint (measured ~2x the
    # build cost of dedup_clusters_md5 at sf0.1).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("t")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("t")),
                )
            ).alias("e")
        )
        .select("e.s", "e.t")
        .distinct()
        # lineage TRUNCATION, not just caching: every round's plan would
        # otherwise embed all previous rounds' join trees and Catalyst
        # planning time grows exponentially with iterations — the
        # standard iterative-algorithm failure mode. localCheckpoint
        # materializes to executor-local storage and cuts the lineage.
        # ALL checkpoints in this loop are LAZY: each round's one
        # convergence-probe action materializes every pending
        # checkpoint in a single job (shared RDD nodes compute once
        # per job), where the eager form paid 2-3 driver-blocking
        # jobs per round — pure scheduling latency at any data size.
        .localCheckpoint(eager=False)
    )
    # Fused round-0 hop: every vertex appears as `s` in the symmetric
    # edge list, so min(id, min neighbor id) is exactly what the first
    # hop would compute from identity labels — one groupBy replaces the
    # identity-label init AND the first round's join+union+agg.
    labels = (
        sym.groupBy(F.col("s").alias("id"))
        .agg(F.min("t").alias("__m"))
        .select("id", F.least(F.col("id"), F.col("__m")).alias("label"))
        .localCheckpoint(eager=False)
    )
    # Convergence probe: labels are monotone non-increasing, so for
    # integral ids an exact decimal sum is an order-independent "did
    # anything move" fingerprint — one cheap scan of the checkpointed
    # frame instead of a join + filter + count per round. Non-integral
    # ids keep the join probe.
    integral = isinstance(edges.schema[src].dataType, _INTEGRAL)
    prev_sum = _label_sum(labels) if integral else None
    for _ in range(max_iter):
        nbr = sym.join(
            labels.select(
                F.col("id").alias("t"), F.col("label").alias("nl")
            ),
            "t",
        ).select(F.col("s").alias("id"), F.col("nl").alias("label"))
        # NO checkpoint on hop: jumped references it twice, but both
        # references live in ONE round's plan rooted at the previous
        # round's checkpoint — constant-size per round, not the
        # cross-round exponential the jumped checkpoint guards against
        # — and the hop aggregate's exchange is computed once and
        # reused (ReusedExchange) inside the probe job. Dropping it
        # saves one RDD-conversion round trip per round (the dominant
        # driver-side cost of this loop, r9 §20).
        hop = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: label ← label(label); labels are always
        # vertex ids (mins of vertex ids), so the lookup hits.
        # Neutral key names on the lookup side: projecting `id AS
        # label` over the same frame trips the analyzer's self-join
        # disambiguation ("key not found" on complex inputs).
        lookup = hop.select(
            F.col("id").alias("__k"), F.col("label").alias("__v")
        )
        jumped = (
            hop.join(lookup, F.col("label") == F.col("__k"), "left")
            .select(
                "id",
                F.coalesce(F.col("__v"), F.col("label")).alias("label"),
            )
            # lazy: the convergence probe's aggregate materializes the
            # checkpoint as a side effect — no separate eager job
            .localCheckpoint(eager=False)
        )
        if integral:
            cur_sum = _label_sum(jumped)
            changed = int(cur_sum != prev_sum)
            prev_sum = cur_sum
        else:
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
        labels = jumped
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size, is_canonical):
    the cluster id is the smallest member id (the survivor the usual
    keep-first rule retains); every other member is a drop candidate."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return cc.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
