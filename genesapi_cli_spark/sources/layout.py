"""Multi-dimensional data layout (Z-order clustering) for write-side
data skipping.

A linear sort layout gives perfect file-skipping on ONE leading column and
none on the others. Z-ordering interleaves the bits of k quantized columns
into a single clustering key, so file-level min/max bounding boxes shrink in
EVERY dimension — a predicate on any subset of the z-columns prunes files.
This is the layout Delta/Iceberg `OPTIMIZE ZORDER BY` applies; here it is
expressed with plain Spark built-ins so any parquet lake gets it:

    zorder_write(df, ["user_id", "value"], out_path, n_files=16)

Design for 100 TB:
- Quantization bounds come from ONE tiny agg job (global min/max per
  column — at scale use sampled or maintained statistics instead).
- The z-value is a pure codegen'd long expression (shift/or over 16-bit
  planes, built as a single expr string — no Python in the row path).
- ``repartitionByRange(z)`` range-partitions on the z-key (sampled range
  bounds, balanced output files) and ``sortWithinPartitions`` makes
  row-group stats tight inside each file.

Reference analog: none (the upstream CLI writes unclustered NDJSON);
this is part of the lake-layout surface a Spark-native engine owns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesapi_cli_spark.operators.graph import _EDGES_SQL as _GRAPH_EDGES_SQL
from genesapi_cli_spark.registry import register

#: bits kept per dimension; k dims × BITS must stay < 63 (long z-value).
BITS = 16


def _z_expr(cols: list[str], bits: int = BITS) -> str:
    """Bit-interleaving expression: z = Σ_{i<bits, j<k} bit_i(col_j) << (i*k+j).

    The per-plane terms touch disjoint bits, so OR == SUM and the whole
    thing folds into one codegen'd long expression. Built as a SQL string:
    node-by-node Column construction over Py4J is seconds-slow for wide
    trees (measured), one expr() parse is not.
    """
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"(shiftleft(shiftright(__q_{c}, {i}) & 1, {i * k + j}))")
    return " + ".join(terms)


def with_zvalue(df: DataFrame, cols: list[str], bits: int = BITS) -> DataFrame:
    """Add a ``__z`` column interleaving ``cols`` (numeric), quantized to
    ``bits``-bit ranks via global min/max scaling."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("zorder supports 1-3 columns")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    out = df
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        out = out.withColumn(
            f"__q_{c}",
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ).cast("long"),
        )
    out = out.withColumn("__z", F.expr(_z_expr(cols, bits)))
    return out.drop(*[f"__q_{c}" for c in cols])


def zorder_write(df: DataFrame, cols: list[str], path: str, n_files: int = 16) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``."""
    z = with_zvalue(df, cols)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --- q_layout_bucketed (bucket-layout shuffle-elision certificate) -----------

#: buckets for the events relayout; on a cluster pick ~(table size / 1 GB).
_N_BUCKETS = 8

_BUCKET_PATH = "/tmp/genesapi_spark/bucketed_events"

_BUCKET_ORACLE = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user,
       0 AS agg_exchanges_bucketed,
       0 AS join_exchanges_bucketed,
       TRUE AS plain_agg_shuffles,
       TRUE AS plain_join_shuffles
FROM events
"""


def _n_exchanges(df: DataFrame) -> int:
    """Count SHUFFLE Exchange operators in the prepared physical plan
    (planning only — nothing is executed). BroadcastExchange is excluded:
    broadcasting a small side is not the data movement bucketing exists to
    avoid, and the join probes force merge joins anyway so the bucketed
    path is what's actually certified."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")


@register("q_layout_bucketed", oracle=_BUCKET_ORACLE)
def q_layout_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-layout certificate: rewrite events bucketed+sorted on user_id
    (``bucketBy(8).sortBy`` parquet table) and PROVE the layout pays — the
    physical plans of a per-user aggregate and a user_id equi-join read
    from the bucketed copy with ZERO Exchange operators, while the same
    queries over the plain parquet shuffle. SURVEY §4.2 names layout, not
    rules, as the 100-TB lever: a table bucketed on its join/group key
    makes every downstream stage on that key shuffle-free, which at 100 TB
    is the difference between an in-place merge and moving the table over
    the network per query.

    The certificate is honest on both axes: the data columns (n_users /
    n_events / min / max) are computed FROM THE BUCKETED COPY and must
    hash-match DuckDB reading the original parquet (the relayout lost
    nothing), and the Exchange counts are read off the prepared physical
    plans and pinned to 0 by the oracle (bucketing regression fails the
    hash loudly). The plain-side counts are reported as booleans since
    exact Exchange counts under AQE are version-fluid.

    Scale shape: the relayout itself is one full shuffle (the last one that
    key ever needs); bucket count on a cluster tracks table size, and the
    sortBy makes per-bucket files range-readable (row-group pruning on the
    sort key comes free)."""
    from genesapi_cli_spark.io import load, session_nonce

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
    table = (
        f"ev_bucketed_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        ev.write.format("parquet")
        .mode("overwrite")
        .option("path", f"{_BUCKET_PATH}_{table}")
        .bucketBy(_N_BUCKETS, "user_id")
        .sortBy("user_id")
        .saveAsTable(table)
    )
    bt = spark.table(table)

    agg_bucketed = bt.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    agg_plain = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # hint("merge") pins SortMergeJoin on both probes so the comparison is
    # bucketed-SMJ (exchange-free) vs plain-SMJ (both sides shuffle) — not
    # SMJ vs an incidental broadcast plan.
    join_bucketed = bt.hint("merge").join(
        bt.select("user_id").distinct().hint("merge"), "user_id"
    )
    join_plain = ev.hint("merge").join(
        ev.select("user_id").distinct().hint("merge"), "user_id"
    )

    return (
        bt.agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
        )
        .withColumn("agg_exchanges_bucketed", F.lit(_n_exchanges(agg_bucketed)))
        .withColumn("join_exchanges_bucketed", F.lit(_n_exchanges(join_bucketed)))
        .withColumn("plain_agg_shuffles", F.lit(_n_exchanges(agg_plain) > 0))
        .withColumn("plain_join_shuffles", F.lit(_n_exchanges(join_plain) > 0))
    )


# --- q_layout_edges (materialized derived-edge-table certificate) ------------

_EDGE_PATH = "/tmp/genesapi_spark/bucketed_edges"
_EDGE_BUCKETS = 8

_EDGES_LAYOUT_ORACLE = f"""{_GRAPH_EDGES_SQL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(DISTINCT pa) AS BIGINT) AS n_src,
       CAST(SUM(pa) AS BIGINT) AS sum_pa,
       CAST(SUM(pb) AS BIGINT) AS sum_pb,
       0 AS degree_exchanges_bucketed,
       0 AS join_exchanges_bucketed,
       TRUE AS plain_degree_shuffles,
       TRUE AS plain_join_shuffles
FROM edges
"""


@register("q_layout_edges", oracle=_EDGES_LAYOUT_ORACLE)
def q_layout_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DERIVED-TABLE MATERIALIZATION certificate: the co-purchase edge list
    (basket collect → in-row pair explode → support filter — the pipeline
    every graph.py query rebuilds behind lazy localCheckpoints) is persisted
    ONCE as a parquet table bucketed+sorted on the source node, and the
    certificate proves the layout pays: the physical plans of the two
    downstream shapes the graph family actually runs — a per-node degree
    aggregate and a node equi-join — read the bucketed copy with ZERO
    shuffle Exchanges, while the same shapes over the recomputed pipeline
    shuffle.

    This is the 100 TB answer to "shared subtree recomputed per query":
    within one session a lazy checkpoint deduplicates work, but ACROSS
    queries/jobs the only durable fix is a lake table whose bucketing key is
    the downstream join/group key — the edge build's shuffle is paid once,
    at write time, and every later traversal on that key is exchange-free.
    q_layout_bucketed pins the pattern for a base table; this pins it for a
    DERIVED relation (the expensive-to-rebuild kind).

    Honesty of the certificate: the data columns (edge count, distinct
    sources, endpoint checksums) are computed FROM THE BUCKETED COPY and
    must hash-match DuckDB deriving the edges relationally from lineitem —
    the materialization lost nothing. Exchange counts come off prepared
    physical plans (planning only); plain-side counts are booleans since
    exact counts under AQE are version-fluid.
    """
    from genesapi_cli_spark.io import session_nonce
    from genesapi_cli_spark.operators.graph import (
        build_copurchase_edges,
        shared_copurchase_edges,
    )

    # WRITE from the session-memoized edge relation (identical rows; the
    # basket-explode pipeline is the expensive part and every graph query
    # already shares its checkpointed blocks — re-deriving it here just to
    # persist it doubled this query's cost). The PLAIN-side certificates
    # below must keep the un-memoized plan: a checkpoint scan has no
    # lineage for the exchange counter to count, and they are prepared
    # (planned), never executed — the un-memoized plan costs nothing.
    edges_src = shared_copurchase_edges(spark, sf_dir)
    edges = build_copurchase_edges(spark, sf_dir)
    table = (
        f"edges_bucketed_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        edges_src.write.format("parquet")
        .mode("overwrite")
        .option("path", f"{_EDGE_PATH}_{table}")
        .bucketBy(_EDGE_BUCKETS, "pa")
        .sortBy("pa", "pb")
        .saveAsTable(table)
    )
    bt = spark.table(table)

    deg_bucketed = bt.groupBy("pa").agg(F.count(F.lit(1)).alias("deg"))
    deg_plain = edges.groupBy("pa").agg(F.count(F.lit(1)).alias("deg"))
    join_bucketed = bt.hint("merge").join(
        bt.select("pa").distinct().hint("merge"), "pa"
    )
    join_plain = edges.hint("merge").join(
        edges.select("pa").distinct().hint("merge"), "pa"
    )

    return (
        bt.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.count_distinct("pa").cast("bigint").alias("n_src"),
            F.sum("pa").cast("bigint").alias("sum_pa"),
            F.sum("pb").cast("bigint").alias("sum_pb"),
        )
        .withColumn("degree_exchanges_bucketed", F.lit(_n_exchanges(deg_bucketed)))
        .withColumn("join_exchanges_bucketed", F.lit(_n_exchanges(join_bucketed)))
        .withColumn("plain_degree_shuffles", F.lit(_n_exchanges(deg_plain) > 0))
        .withColumn("plain_join_shuffles", F.lit(_n_exchanges(join_plain) > 0))
    )


# --- q_layout_zorder (Z-order multi-dim skipping certificate) ----------------

_ZORDER_PATH = "/tmp/genesapi_spark/zorder_events"
_ZORDER_FILES = 16

_ZORDER_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       TRUE  AS z_shrinks_dim1,
       TRUE  AS z_shrinks_dim2,
       TRUE  AS linear_shrinks_dim1,
       FALSE AS linear_shrinks_dim2
FROM events
"""


def _file_boxes(df: DataFrame, c1: str, c2: str):
    """Per-parquet-file min/max bounding boxes via input_file_name(), plus
    per-file count / column sums so data checksums can be re-aggregated
    from the SAME relation (exact: bigint partial sums) instead of
    re-reading the files."""
    return df.groupBy(F.input_file_name().alias("f")).agg(
        F.min(c1).alias("mn1"), F.max(c1).alias("mx1"),
        F.min(c2).alias("mn2"), F.max(c2).alias("mx2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c1).cast("bigint").alias("sum1"),
        F.sum(c2).cast("bigint").alias("sum2"),
    )


def _shrinks_verdict(boxes: DataFrame, spans: DataFrame) -> DataFrame:
    """One-row verdict relation over LAYOUT-TAGGED boxes: per (layout,
    dimension), TRUE iff MOST of that layout's file boxes cover < half the
    global span (the margin makes the verdict robust to range-partitioner
    sampling). Declarative — the global spans arrive as a broadcast
    one-row relation, never as driver-side literals — and BOTH layouts are
    judged in ONE aggregate over the unioned box relation (per-layout
    conditional averages; ``avg`` ignores the other layout's NULLs), so
    the certificate costs one plan and one spans computation instead of
    two of each (the round-7 bench regression on this query)."""

    def _frac(layout: str, mn: str, mx: str, s: str):
        shrunk = ((F.col(mx) - F.col(mn)) * 2 < F.col(s)).cast("int")
        return F.avg(F.when(F.col("layout") == layout, shrunk)) > 0.5

    return boxes.crossJoin(F.broadcast(spans)).agg(
        _frac("z", "mn1", "mx1", "s1").alias("z_shrinks_dim1"),
        _frac("z", "mn2", "mx2", "s2").alias("z_shrinks_dim2"),
        _frac("lin", "mn1", "mx1", "s1").alias("linear_shrinks_dim1"),
        _frac("lin", "mn2", "mx2", "s2").alias("linear_shrinks_dim2"),
    )


@register("q_layout_zorder", oracle=_ZORDER_ORACLE)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER skipping certificate, the registered companion of the pytest
    file-skipping proof (test_zorder_skips_files_on_both_dims): write
    events clustered two ways — Z-ordered on (user_id, cents) vs linearly
    sorted on user_id alone — then MEASURE each file's min/max bounding
    box on both dimensions and pin the verdict: the Z-layout shrinks
    boxes on BOTH dimensions (most files cover < half the global span →
    min/max row-group pruning bites for predicates on either column),
    while the linear sort shrinks only its leading dimension and leaves
    dim-2 boxes full-width (pruning-useless). The data columns checksum
    the written copy against the original parquet — the relayout lost
    nothing.

    The half-span-majority test has wide margin on both sides (z-boxes
    quantize to ~1/16 of each span; linear dim-2 boxes stay ~full span),
    so the boolean verdict is stable under the range partitioner's
    sampling. SURVEY §4.2: layout is the 100-TB lever — this certificate
    and q_layout_bucketed pin the two write-side layouts the engine owns
    (multi-dim skipping and co-located joins).
    """
    from genesapi_cli_spark.io import load, session_nonce

    base = (
        f"{_ZORDER_PATH}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    zorder_write(ev, ["user_id", "cents"], f"{base}/z", n_files=_ZORDER_FILES)
    (
        ev.repartitionByRange(_ZORDER_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(f"{base}/linear")
    )
    # ONE read per written layout: the per-file box relation (≤32 rows,
    # lazily checkpointed for reuse) carries bounding boxes AND exact
    # per-file partial sums, so the global spans, the skipping verdicts,
    # and the data checksums are all re-aggregated from it — no events
    # rescan and no second read of the written files (the round-7 bench
    # regression on this query was exactly those redundant scans).
    boxes = (
        _file_boxes(spark.read.parquet(f"{base}/z"), "user_id", "cents")
        .withColumn("layout", F.lit("z"))
        .unionByName(
            _file_boxes(spark.read.parquet(f"{base}/linear"), "user_id", "cents")
            .withColumn("layout", F.lit("lin"))
        )
        .localCheckpoint(eager=False)
    )
    zb = boxes.filter(F.col("layout") == "z")
    # global spans = fold of the z-copy's own file boxes (z holds all rows)
    spans = zb.agg(
        (F.max("mx1") - F.min("mn1")).alias("s1"),
        (F.max("mx2") - F.min("mn2")).alias("s2"),
    )
    return (
        zb.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("sum1").cast("bigint").alias("sum_users"),
            F.sum("sum2").cast("bigint").alias("sum_cents"),
        )
        .crossJoin(F.broadcast(_shrinks_verdict(boxes, spans)))
    )


# --- q_layout_compaction (small-file compaction certificate) -----------------

_COMPACT_PATH = "/tmp/genesapi_spark/compact_events"
_SMALL_FILES = 64
_COMPACT_FILES = 4

_COMPACT_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       {_SMALL_FILES} AS files_before,
       {_COMPACT_FILES} AS files_after,
       TRUE AS lossless
FROM events
"""


@register("q_layout_compaction", oracle=_COMPACT_ORACLE)
def q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION certificate: events written as
    ``_SMALL_FILES`` shards (the pathological many-small-files layout
    streaming ingestion accretes) are compacted to ``_COMPACT_FILES`` by
    one round-robin repartition write, and the certificate pins the
    MEASURED file counts of both generations (distinct
    ``input_file_name()`` over each read-back) plus a row/sum checksum
    proving the rewrite lost nothing — with ``lossless`` additionally
    comparing both generations' aggregates inside the query.

    The small-file problem is a first-order 100 TB cost: every file is a
    task, a footer fetch, an open — a 64→4 compaction is a 16× cut in
    per-file overhead for all downstream scans. Production wraps exactly
    this rewrite in a row-budget loop (tests/test_layout.py exercises
    the budgeted variant); the certificate pins the primitive.
    """
    from genesapi_cli_spark.io import load, session_nonce

    base = (
        f"{_COMPACT_PATH}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    ev.repartition(_SMALL_FILES).write.mode("overwrite").parquet(f"{base}/small")
    small = spark.read.parquet(f"{base}/small")
    small.repartition(_COMPACT_FILES).write.mode("overwrite").parquet(
        f"{base}/compact"
    )
    compact = spark.read.parquet(f"{base}/compact")

    def stats(df: DataFrame, tag: str) -> DataFrame:
        # one-row (file count, row count, checksum) relation per generation
        return df.withColumn("f", F.input_file_name()).agg(
            F.count_distinct("f").cast("int").alias(f"nf_{tag}"),
            F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"),
            F.sum("user_id").cast("bigint").alias(f"su_{tag}"),
        )

    # Both generations' stats stay RELATIONS, broadcast-crossed into the
    # one-row certificate — zero driver collects; the lossless comparison
    # happens inside the submitted plan.
    return (
        stats(compact, "b")
        .crossJoin(F.broadcast(stats(small, "a")))
        .select(
            F.col("n_b").alias("n_rows"),
            F.col("su_b").alias("sum_users"),
            F.col("nf_a").alias("files_before"),
            F.col("nf_b").alias("files_after"),
            (
                (F.col("n_a") == F.col("n_b")) & (F.col("su_a") == F.col("su_b"))
            ).alias("lossless"),
        )
    )


# --- q_layout_overlap (file clustering-depth certificate) --------------------

_OVERLAP_PATH = "/tmp/genesapi_spark/overlap_events"
_OVERLAP_FILES = 8

_OVERLAP_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       {_OVERLAP_FILES} AS n_files,
       TRUE AS sorted_layout_shallow,
       TRUE AS random_layout_deep
FROM events
"""


def _max_overlap_depth_df(boxes: DataFrame, out: str) -> DataFrame:
    """ONE-ROW RELATION holding the max number of per-file [mn, mx]
    intervals covering any single point, via the ±1 boundary sweep (the
    q_intervals_active encoding pointed at file statistics). Returned as a
    DataFrame, not a driver scalar: the maintenance planner's verdict
    stays inside the submitted plan (broadcast-crossed into the
    certificate row), so a million-file manifest never rides through the
    driver. The global window is over O(files) boundary points — manifest-
    sized, not data-sized."""
    deltas = boxes.select(
        F.col("mn").alias("p"), F.lit(1).alias("d")
    ).unionAll(boxes.select((F.col("mx") + 1).alias("p"), F.lit(-1).alias("d")))
    depth = deltas.groupBy("p").agg(F.sum("d").alias("d")).select(
        F.sum("d")
        .over(
            Window.orderBy("p").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("depth")
    )
    return depth.agg(F.max("depth").alias(out))


@register("q_layout_overlap", oracle=_OVERLAP_ORACLE)
def q_layout_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE CLUSTERING-DEPTH certificate — the compaction-planning metric
    Iceberg/Delta maintenance jobs compute before rewriting: the maximum
    number of files whose [min, max] key intervals overlap at any point.
    Depth 1 means range predicates touch one file (perfectly clustered);
    depth = file count means every range scan reads everything (the
    streaming-append pathology). Events are written twice — range-
    partitioned+sorted by ts_us vs round-robin — and the certificate pins
    the MEASURED verdicts: the sorted generation stays shallow (≤ 2 — a
    duplicate boundary timestamp can legitimately land in two adjacent
    files) and the round-robin generation is deeper than half the file
    count. Depth is computed with the ±1 boundary sweep over the per-file
    min/max statistics (q_intervals_active's encoding pointed at file
    metadata — exactly what a table-format maintenance planner reads from
    the manifest, no data scan needed at 100 TB).

    A row/sum checksum proves both generations lossless; scratch paths are
    session-nonced (concurrent runs never collide).
    """
    from genesapi_cli_spark.io import load, session_nonce

    base = (
        f"{_OVERLAP_PATH}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    ev = load(spark, sf_dir, "events").select("user_id", "ts_us")
    (
        ev.repartitionByRange(_OVERLAP_FILES, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(f"{base}/sorted")
    )
    ev.repartition(_OVERLAP_FILES).write.mode("overwrite").parquet(
        f"{base}/random"
    )

    def boxes(path: str) -> DataFrame:
        # per-file stats carry the row/sum checksum alongside min/max, so
        # the lossless certificate reuses THIS read-back instead of a third
        # full scan of the generation.
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("ts_us").alias("mn"),
                F.max("ts_us").alias("mx"),
                F.count(F.lit(1)).alias("cnt"),
                F.sum("user_id").alias("su"),
            )
        )

    # the sorted generation's file stats feed the depth sweep AND the
    # checksum row — lazy-checkpoint the 8-row relation so the read-back
    # happens once.
    sorted_boxes = boxes(f"{base}/sorted").localCheckpoint(eager=False)
    depth_sorted = _max_overlap_depth_df(sorted_boxes, "ds")
    # same for the random generation: the ±1 sweep unions its input twice
    # (mn and mx branches), so without the 8-row checkpoint the generation
    # is scanned twice.
    depth_random = _max_overlap_depth_df(
        boxes(f"{base}/random").localCheckpoint(eager=False), "dr"
    )
    return (
        sorted_boxes.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.sum("su").cast("bigint").alias("sum_users"),
        )
        .crossJoin(F.broadcast(depth_sorted))
        .crossJoin(F.broadcast(depth_random))
        .select(
            "n_rows",
            "sum_users",
            F.lit(_OVERLAP_FILES).alias("n_files"),
            (F.col("ds") <= 2).alias("sorted_layout_shallow"),
            (F.col("dr") > _OVERLAP_FILES // 2).alias("random_layout_deep"),
        )
    )


# --- q_source_commit_log (table-format log replay) ---------------------------

_CLOG_PATH = "/tmp/genesapi_spark/commit_log"
_CLOG_GEN0_FILES = 4


def _build_commit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the 2-version scratch table + JSON commit log (gen0 = 4 files,
    gen1 = their compaction; v1 tombstones all of v0) and return the log as
    a DataFrame. Shared by q_source_commit_log (head replay) and
    q_source_time_travel (as-of replay); session-nonce scratch, overwrite-
    idempotent.

    The log itself is CONSTRUCTED AND WRITTEN declaratively: each
    generation's file manifest is a `distinct input_file_name()` relation
    folded to one (version, adds, removes) row, unioned and written
    through Spark's JSON sink — the writer-side analog of the readers'
    anti-join replay, with zero driver-side file listings (the round-7
    review's remaining manifest collects)."""
    from genesapi_cli_spark.io import load, session_nonce

    base = (
        f"{_CLOG_PATH}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
        f"_{session_nonce(spark)}"
    )
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    ev.repartition(_CLOG_GEN0_FILES).write.mode("overwrite").parquet(f"{base}/gen0")
    gen0_files = (
        spark.read.parquet(f"{base}/gen0")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .agg(F.sort_array(F.collect_list("f")).alias("files"))
    )
    spark.read.parquet(f"{base}/gen0").repartition(1).write.mode(
        "overwrite"
    ).parquet(f"{base}/gen1")
    gen1_files = (
        spark.read.parquet(f"{base}/gen1")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .agg(F.sort_array(F.collect_list("f")).alias("files"))
    )
    log = gen0_files.select(
        F.lit(0).alias("version"),
        F.col("files").alias("adds"),
        F.array().cast("array<string>").alias("removes"),
    ).unionByName(
        gen1_files.crossJoin(
            F.broadcast(gen0_files.select(F.col("files").alias("removes")))
        ).select(
            F.lit(1).alias("version"),
            F.col("files").alias("adds"),
            "removes",
        )
    )
    log.coalesce(1).write.mode("overwrite").json(f"{base}/log")
    return spark.read.json(f"{base}/log")



_CLOG_ORACLE = f"""
SELECT 2 AS n_versions,
       1 AS n_live_files,
       {_CLOG_GEN0_FILES} AS n_tombstones,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
"""


@register("q_source_commit_log", oracle=_CLOG_ORACLE)
def q_source_commit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse TABLE-FORMAT COMMIT-LOG replay (the Delta/Iceberg core,
    reduced to its relational essence): version 0 adds the table's initial
    {_CLOG_GEN0_FILES} parquet files, version 1 compacts them into one file
    (adds it, tombstones all four); the current snapshot is computed by
    REPLAYING the JSON log relationally — explode adds, explode removes,
    live = adds ANTI-JOIN removes — and the certificate reads ONLY the live
    files and proves the snapshot equals the logical table (row count +
    checksum), with version/file/tombstone counts pinned.

    This is exactly how a 100 TB lakehouse table isolates readers from
    writers: readers resolve the log head, not the directory listing, so a
    concurrent compactor never double-counts or drops rows. The log here is
    real JSON on disk (session-nonce scratch), read back through Spark's JSON
    source; the anti-join replay is the plan a metadata layer runs at scale
    (millions of log entries — a DataFrame problem, not a driver loop; the
    bounded collect fetches only the live-file list, i.e. the reader's scan
    manifest).
    """
    log = _build_commit_log(spark, sf_dir)
    adds = log.select(
        "version", F.explode("adds").alias("path")
    )
    removes = log.select(F.explode("removes").alias("rpath")).distinct()
    live = adds.join(
        removes, F.col("path") == F.col("rpath"), "left_anti"
    )
    # THE one bounded manifest fetch: Spark's parquet reader needs concrete
    # paths at planning time, exactly the file list a Delta/Iceberg reader
    # materializes after resolving the log head — O(live files), nothing
    # else crosses the driver. Version/tombstone counts stay RELATIONS,
    # broadcast-crossed into the certificate row.
    live_paths = sorted(r.path for r in live.select("path").collect())
    snap = spark.read.parquet(*live_paths)
    meta = (
        log.agg(F.count(F.lit(1)).cast("int").alias("n_versions"))
        .crossJoin(
            removes.agg(F.count(F.lit(1)).cast("int").alias("n_tombstones"))
        )
    )
    return (
        snap.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("user_id").cast("bigint").alias("sum_users"),
        )
        .crossJoin(F.broadcast(meta))
        .select(
            "n_versions",
            F.lit(len(live_paths)).cast("int").alias("n_live_files"),
            "n_tombstones",
            "n_rows",
            "sum_users",
        )
    )


# --- q_source_time_travel -----------------------------------------------------

_TT_ORACLE = f"""
SELECT 0 AS version, {_CLOG_GEN0_FILES} AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
UNION ALL
SELECT 1 AS version, 1 AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
"""


@register("q_source_time_travel", oracle=_TT_ORACLE)
def q_source_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the commit log: resolve the table snapshot AS OF each
    version v (live files = adds with version ≤ v ANTI-JOIN removes with
    version ≤ v) and certify that every historical snapshot returns the SAME
    logical table (row count + checksum) while its physical file count
    changes ({_CLOG_GEN0_FILES} files at v0, 1 after the v1 compaction) —
    the reproducibility guarantee lakehouse readers rely on: a compaction
    commit must be invisible to `VERSION AS OF` reads.

    Scale shape: the as-of predicate is a pushed filter on the log relation
    before the same anti-join replay as q_source_commit_log; per-version
    snapshot stats are one aggregate over the resolved files. At 100 TB the
    log is itself a partitioned table and `version ≤ v` prunes log
    partitions — time travel never lists directories.
    """
    log = _build_commit_log(spark, sf_dir)
    # Resolve EVERY version's live set in one declarative plan: tag each
    # as-of version, filter the log to version ≤ v, anti-join tombstones —
    # then make THE one bounded manifest fetch (the per-version scan file
    # lists, O(versions × live files); Spark's parquet reader needs
    # concrete paths at planning time, as any table-format reader does).
    versions = (0, 1)
    manifests = None
    for v in versions:
        lv = log.filter(F.col("version") <= v)
        adds = lv.select(F.explode("adds").alias("path"))
        removes = lv.select(F.explode("removes").alias("rpath")).distinct()
        live_v = adds.join(
            removes, F.col("path") == F.col("rpath"), "left_anti"
        ).select(F.lit(v).alias("asof"), "path")
        manifests = live_v if manifests is None else manifests.unionAll(live_v)
    by_version: dict[int, list[str]] = {v: [] for v in versions}
    for r in manifests.collect():
        by_version[r.asof].append(r.path)
    out = []
    for v in versions:
        live = sorted(by_version[v])
        snap = spark.read.parquet(*live)
        out.append(
            snap.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("user_id").cast("bigint").alias("sum_users"),
            ).select(
                F.lit(v).cast("int").alias("version"),
                F.lit(len(live)).cast("int").alias("n_files"),
                "n_rows",
                "sum_users",
            )
        )
    return out[0].unionAll(out[1])
