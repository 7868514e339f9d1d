"""Typed loaders for the testdata lake.

Reference analog: ``genesapi/storage.py (upstream)`` — the versioned on-disk
cube store. Here storage is a columnar Parquet lake read declaratively so
Catalyst gets predicate pushdown + column pruning for free; there is no
imperative read loop to port.

Scale notes: each ``load`` is a plain ``spark.read.parquet`` so partition
discovery, split planning (``spark.sql.files.maxPartitionBytes``) and vectorized
Parquet decoding all apply. At 100 TB the same call reads a partitioned
directory tree; nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genesapi_cli_spark.session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Session memo of loaded table DataFrames, keyed by (application, sf_dir,
#: table, source mtime). DataFrames are immutable and the testdata lake is
#: read-only, so re-analyzing the same parquet scan on every query invocation
#: is pure Py4J/analysis tax (~0.13-0.16 s per load on this host — the bulk
#: of the per-query invocation floor SCALE.md 6f decomposes). The mtime in
#: the key makes a rewritten path (test fixtures) refresh instead of serving
#: a stale plan; non-statable paths (object stores) memoize on path alone.
#: The memo never crosses sessions (applicationId key) and holds one entry
#: per table per sf_dir — O(10) per session.
_LOAD_MEMO: dict = {}


def _src_stamp(path: str) -> object:
    """Freshness stamp for a parquet source path.

    Single file: (mtime_ns, size). Partitioned DIRECTORY tree: an in-place
    rewrite of a part file does not necessarily bump the directory's own
    mtime, so a stat of the top-level path alone can serve a stale memo —
    instead fold (max mtime_ns, total size, file count) over a recursive
    walk of the tree. The walk is O(files) driver-side metadata, the same
    listing Spark itself performs to plan the scan; testdata trees here are
    O(1)–O(100) files. Non-statable paths (object stores) stamp None and
    memoize on path alone."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    max_mtime, total_size, n_files = st.st_mtime_ns, 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                fst = os.stat(os.path.join(root, f))
            except OSError:
                continue
            max_mtime = max(max_mtime, fst.st_mtime_ns)
            total_size += fst.st_size
            n_files += 1
    return (max_mtime, total_size, n_files)


#: Bytes of source parquet per INITIAL (pre-AQE-coalesce) shuffle partition.
#: 8 MiB of compressed parquet decodes to roughly 20–30 MB of in-memory rows,
#: a comfortable per-reducer unit. The knob this sizes —
#: ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` — is the
#: AQE-era replacement for hand-tuning shuffle.partitions: shuffles START
#: wide enough for the data volume and AQE coalesces them back down to the
#: advisory size at runtime, so small inputs pay nothing while large inputs
#: stop serializing through too-few reducers. Measured need (SCALE.md §6j):
#: at sf10 (60M-row lineitem) q_tpch_q21's exponent fell 1.27 → 0.56 and
#: q_agg_spearman's 1.27 → 0.63 when reducers rose 32 → 128; this makes that
#: scaling automatic instead of a per-run override.
#:
#: The FLOOR is the session's own ``spark.sql.shuffle.partitions`` — i.e.
#: this never LOWERS the initial reducer count below today's behavior
#: (initialPartitionNum defaults to shuffle.partitions when unset); it only
#: raises it when input bytes demand more. A hard floor of 32 was measured
#: to cost the sf0.1 bench suite ~30% (bench tunes shuffle.partitions=3 for
#: the local stage-barrier floor; forcing 32 initial partitions re-imposed
#: the per-task tax on hundreds of sub-MB shuffles).
#:
#: CLUSTER masters only. In local mode every reducer shares one JVM, one
#: block manager and one disk, so extra initial partitions are pure
#: scheduling/shuffle-file tax with nothing to parallelize beyond the core
#: count — measured round 9 at sf10 (60M-row lineitem, isolated min-of-2,
#: replicated in two fresh sessions): q_tpch_q21 17.1 s at 32 initial,
#: 21.4 s at 128, 26.5 s at 251; q_agg_spearman flat (11.8/12.1 s). The
#: round-8 reading that said the opposite (51 s at 32) did not replicate
#: under the isolated protocol — host-load contamination. On a real
#: cluster the calculus inverts: hundreds of executors NEED wide shuffles
#: before AQE coalesces, which is exactly what this sizes.
_INITIAL_PART_BYTES = 8 << 20
_INITIAL_PART_CAP = 4096

#: Bytes of source parquet per LEAF slice (round 13, guide §2.2/§6).
#: ``spark.sql.leafNodeDefaultParallelism`` defaults to defaultParallelism,
#: which PADS small inputs out to the core count: on local[32] every ≤11 MB
#: bench file fans out to 32 ~300 KB micro-tasks and every literal/range
#: leaf to 32 near-empty slices — FLOOR_PROBE (plans/r13) measured 19,385
#: tasks over the 459-query suite at ~2.7 ms marginal each, and the 8-core
#: driver bench beating the 32-core one (204.9 vs 237.1 s, r12) is the same
#: signature. Deriving the floor FROM LAKE SIZE instead —
#: clamp(bytes / 32 MiB, 1, defaultParallelism) — removes the padding where
#: inputs are tiny (sf0.1: 17 MB → 1; per-query-paired interleaved A/B:
#: 66-query subset 46.4 → 39.6 s, 24 improved / 6 noise-band regressions)
#: while converging to Spark's own default once the lake carries ≥ 32 MiB
#: per core (sf10: 2.2 GB → clamped at defaultParallelism — measured
#: equal-or-better there within the host's swing), so at 100 TB the knob is
#: exactly the stock default. Override via SPARK_GRAFT_LEAF_PAR.
_LEAF_PART_BYTES = 32 << 20

#: (applicationId, sf_dir) -> computed initialPartitionNum; plus the last
#: value actually applied per application so alternating sf_dirs in one
#: session re-applies without re-walking the tree.
_PART_MEMO: dict = {}
_PART_APPLIED: dict = {}


def _lake_bytes(spark: SparkSession, sf_dir: str) -> int:
    """Total bytes under ``sf_dir`` via the Hadoop FileSystem API — the
    same listing Spark's own FileIndex performs, so it resolves every
    scheme Spark can read (file:, hdfs:, s3a:, ...). A driver-local
    ``os.walk`` sees only local paths and silently returned 0 for remote
    lakes — exactly the cluster deployments this sizing exists for.
    Falls back to the local walk when no JVM gateway is reachable
    (connect-mode sessions)."""
    try:
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(sf_dir)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        it = fs.listFiles(hpath, True)
        total = 0
        while it.hasNext():
            total += it.next().getLen()
        return total
    except Exception:
        total = 0
        try:
            for root, _dirs, files in os.walk(sf_dir):
                for f in files:
                    try:
                        total += os.stat(os.path.join(root, f)).st_size
                    except OSError:
                        continue
        except OSError:
            total = 0
        return total


def _ensure_scale_partitions(spark: SparkSession, sf_dir: str) -> None:
    """Size partition-count knobs to the lake under ``sf_dir`` (∝ total
    parquet bytes via the Hadoop FileSystem listing). Driver-side metadata
    only, memoized per (application, sf_dir, freshness stamp): the stamp is
    ``_src_stamp`` for driver-visible paths — so a lake that GROWS
    mid-session re-sizes, same contract as the load memo — plus the manual
    bump knob ``spark.genesapi.lake.stamp`` for object-store lakes where a
    per-load recursive remote listing would double metadata RPCs (bump
    the knob after large ingests to force a re-size).

    Two knobs, both derived from the same listing:

    - ``spark.sql.leafNodeDefaultParallelism`` =
      clamp(lake bytes / 32 MiB, 1, defaultParallelism) — ALL masters
      (round 13; see the ``_LEAF_PART_BYTES`` block for the measurements).
      Identical to the stock default once the lake carries ≥ 32 MiB per
      core; below that it stops Spark padding tiny scans/literals out to
      the core count.
    - AQE's ``initialPartitionNum`` (∝ bytes / 8 MiB, floored at
      shuffle.partitions, cap 4096) — CLUSTER masters only; a no-op under
      local[*] (see the ``_INITIAL_PART_BYTES`` block for the measured
      local penalty)."""
    try:
        sc = spark.sparkContext
        local = sc.master.startswith("local")
        app = sc.applicationId
        dp = sc.defaultParallelism
    except Exception:  # pragma: no cover - connect-mode sessions
        return
    try:
        manual = spark.conf.get("spark.genesapi.lake.stamp", "") or ""
    except Exception:  # pragma: no cover
        manual = ""
    key = (app, sf_dir, _src_stamp(sf_dir), manual)
    sizes = _PART_MEMO.get(key)
    if sizes is None:
        total = _lake_bytes(spark, sf_dir)
        sizes = (
            min(_INITIAL_PART_CAP, total // _INITIAL_PART_BYTES),
            max(1, min(dp, total // _LEAF_PART_BYTES)),
        )
        _PART_MEMO[key] = sizes
    n_bytes, leaf_n = sizes
    want: dict = {
        "spark.sql.leafNodeDefaultParallelism": os.environ.get(
            "SPARK_GRAFT_LEAF_PAR", str(leaf_n)
        )
    }
    if not local:
        try:
            floor = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200") or "200"
            )
        except Exception:  # pragma: no cover
            floor = 200
        want["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = str(
            max(floor, n_bytes)
        )
    if _PART_APPLIED.get(app) == want:
        return
    try:
        for k, v in want.items():
            spark.conf.set(k, v)
        _PART_APPLIED[app] = want
    except Exception:  # pragma: no cover - static-conf-locked exotic session
        pass


def derived_memo_key(spark: SparkSession, sf_dir: str, *tables: str) -> tuple:
    """Memo key for session-memoized DERIVED relations (shared_ranked_cents,
    shared_payload_frames, shared_copurchase_edges, …): (application,
    sf_dir, source stamp per underlying table). ``_LOAD_MEMO`` keys on the
    source mtime/size precisely so a rewritten path refreshes; a derived
    memo keyed on (application, sf_dir) alone would keep serving frozen
    rows after the dataset at that path is rewritten mid-session (test
    fixtures, regenerated data). Including the same stamps here makes every
    derived memo exactly as fresh as the loads it was built from."""
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        tuple(_src_stamp(f"{sf_dir}/{t}.parquet") for t in tables),
    )


def evict_stale_derived(memo: dict, key: tuple) -> None:
    """Drop memo entries superseded by ``key`` (same applicationId + sf_dir
    prefix, different source stamp) before inserting the fresh one.

    Without this, every source rewrite mid-session (test fixtures,
    regenerated data) leaks one localCheckpoint'd DataFrame per shared
    relation: the old key never matches again, but its checkpointed RDD
    blocks stay pinned in block-manager memory for the session's lifetime.
    Eviction unpersists the stale checkpoint eagerly (best-effort — an
    un-materialized lazy checkpoint has nothing to free and unpersist is
    a no-op there)."""
    prefix = key[:2]
    for k in [k for k in memo if k[:2] == prefix and k != key]:
        stale = memo.pop(k)
        try:
            stale.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def derived_memo_get_or_build(memo: dict, key: tuple, build) -> DataFrame:
    """The shared-relation memo protocol in one place: hit → return; miss →
    evict same-(app, sf_dir) stale entries, build, lazily localCheckpoint
    (plan-cut so dependent queries don't each re-derive the lineage), store.

    ``SPARK_GRAFT_NO_MEMO=1`` disables the cross-invocation sharing: every
    call builds its own relation (still lazily checkpointed, so a single
    query's multi-consumer plan is unchanged — only the reuse BETWEEN query
    invocations is gone). This is the round-13 de-shadowing knob: running
    the full bench once each way quantifies exactly what the session memos
    contribute to the suite total (SCALE.md §10), so the memo's effect is a
    measured, subtractable number instead of a standing shadow.
    """
    if os.environ.get("SPARK_GRAFT_NO_MEMO") == "1":
        return build().localCheckpoint(eager=False)
    df = memo.get(key)
    if df is None:
        evict_stale_derived(memo, key)
        df = build().localCheckpoint(eager=False)
        memo[key] = df
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. ``events.ts`` is normalized to THREE columns regardless
    of the physical parquet layout:

    - ``ts``     the original timestamp column (TIMESTAMP or TIMESTAMP_NTZ)
    - ``ts_us``  LONG epoch microseconds (exact integer arithmetic, no float)
    - ``ts_ns``  LONG epoch nanoseconds

    Two physical layouts exist in the wild and we detect by schema, not conf:

    1. ``timestamp[us]`` (current driver testdata) — Spark reads it as
       TIMESTAMP_NTZ (no isAdjustedToUTC flag). With the session timezone
       pinned to UTC, ``unix_micros(cast(ts as timestamp))`` yields the same
       epoch-µs DuckDB's ``epoch_us(ts)`` yields on the same file.
    2. ``int64`` raw nanos (legacy ``nanosAsLong`` layout) — integer ``div``
       is mandatory: float /1000 on ~1.7e18 ns loses precision (> 2^53).
    """
    ensure_runtime_confs(spark)
    _ensure_scale_partitions(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, sf_dir, name, _src_stamp(path))
    cached = _LOAD_MEMO.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
            )
        else:
            df = df.withColumn(
                "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
            ).withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
    _LOAD_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load(spark, sf_dir, n) for n in names)


def session_nonce(spark: SparkSession) -> str:
    """Per-session suffix for scratch paths and catalog table names.

    The layout/DPP certificates materialize real parquet generations; fixed
    paths would make two concurrent sessions (driver run + local check.py,
    say) overwrite each other's files and race on shared catalog table
    names. The Spark application id is unique per session and stable
    WITHIN it, so repeated invocations in one session reuse (and
    mode=overwrite) the same scratch location instead of leaking one copy
    per call."""
    app_id = spark.sparkContext.applicationId
    return "".join(ch if ch.isalnum() else "_" for ch in app_id)


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a small scan across all cores before a CPU-heavy stage.

    The local testdata files are single-row-group parquet, so Spark plans ONE
    input partition and interpreted/HOF-heavy stages serialize on one core.
    Repartitioning (by the downstream grouping key when given, so the
    follow-up aggregation needs no second shuffle) costs a tiny shuffle of
    the raw rows and buys full parallelism.

    No-op when the input already has >= defaultParallelism partitions: at
    cluster scale inputs arrive pre-split, and an unconditional repartition
    of 100 TB would be a catastrophic full shuffle.

    The partition-count probe (``df.rdd.getNumPartitions()``) costs a full
    plan→RDD conversion (~0.15-0.19 s of Py4J/analysis per call on this
    host), so the result is cached ON the DataFrame object: the memoized
    ``load`` returns the same Python object per (session, sf_dir, table),
    making every later spread of that table free. Transient inputs (already
    transformed DataFrames) just re-probe — the attribute dies with them.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n = getattr(df, "_graft_nparts", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        try:
            df._graft_nparts = n
        except AttributeError:
            pass
    if n >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def write_bucketed(df: DataFrame, name: str, key: str, n_buckets: int, path: str) -> None:
    """Persist a table bucketed+sorted by its join key — the 100 TB layout
    decision for repeated co-located joins (SURVEY.md §4.2): two tables
    bucketed the same way join with ZERO shuffle (bucket layout supplies
    the distribution, the sort supplies the order for SortMergeJoin).

    Uses saveAsTable (external, explicit path) because bucket metadata lives
    in the catalog; plain parquet files cannot carry it.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )
