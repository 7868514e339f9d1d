"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 runtime surface; the brief's "custom stateful operators"
path for semantics the built-in window aggregations can't express).

The demo operator is a per-user running profile (event count, value sum,
max single value) that survives across micro-batches: state lives in the
state store keyed by user_id, each micro-batch's rows arrive as Arrow
batches, and the operator emits the updated profile per touched user.

Scale notes: state is partitioned by the group key across executors and
checkpointed with the query; memory is bounded by (distinct keys × state
row), not by stream length. A production variant adds a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to evict idle users — the
eviction hook is sketched below. This is the Spark-native replacement for
hand-rolled state in a reference-style long-running sync loop.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _profile_fold_impl(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the persisted profile
    and emit the updated row. Arrow-batched: pandas in, pandas out.

    With ``ttl_ms`` set (ProcessingTimeTimeout mode) a user idle past the
    TTL is evicted — the fold fires with hasTimedOut, removes the state,
    and emits nothing; the deadline re-arms on every arrival so active
    users never expire."""
    (user_id,) = key
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "total_value": pd.Series([], dtype="float64"),
                "max_value": pd.Series([], dtype="float64"),
            }
        )
        return
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Unbounded-state profile fold (the pinned batch≡stream contract)."""
    yield from _profile_fold_impl(key, pdfs, state, None)


def _profile_fold_ttl(ttl_ms: int):
    """Profile fold with idle-TTL eviction — the production guard for the
    one stateful operator in this module whose key universe (user_id) is
    genuinely unbounded."""

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        yield from _profile_fold_impl(key, pdfs, state, ttl_ms)

    return fold


def user_running_profile(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Mount the stateful profile operator on a (batch or streaming) events
    DataFrame. In streaming mode state persists across micro-batches; in a
    single-batch run the result equals a plain groupBy aggregation — the
    equivalence the pytest harness asserts.

    STATE BOUND: unlike every other stateful operator in this module —
    whose keys are bounded by construction (event_type for the
    Page-Hinkley/CUSUM/ESD/PSI detectors, a constant for KS, the source
    dimension for pack_stream, distinct content/band buckets for the dedup
    screens, which any dedup must hold somewhere) — the profile is keyed by
    user_id, which grows with the user universe. ``ttl_ms`` bounds it for
    continuous pipelines: a user idle longer than the TTL is evicted
    (ProcessingTimeTimeout; the deadline re-arms per arrival, so active
    users never expire). ACCURACY CAVEAT, by design: a returning user whose
    state expired restarts the running profile from zero — the retention
    horizon is the profile window, the standard trade for running forever.
    Default None preserves the exact batch≡stream contract."""
    fold = _update_user_profile if ttl_ms is None else _profile_fold_ttl(ttl_ms)
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# --- streaming Page-Hinkley drift detector -----------------------------------

PH_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("s", LongType()),
        StructField("msum", LongType()),
        StructField("m_min", LongType()),
        StructField("n_alarms", LongType()),
        StructField("first_alarm_t", LongType()),
        StructField("max_ph", LongType()),
    ]
)

PH_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("n_alarms", LongType()),
        StructField("first_alarm_t", LongType()),
        StructField("max_ph_micro", LongType()),
    ]
)


def _ph_fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Fold one stream's micro-batch into the persisted Page-Hinkley state —
    the applyInPandasWithState twin of the batch q_events_page_hinkley
    (operators/timeseries.py): identical integer-micro arithmetic, so after
    the last micro-batch the state equals the batch query's row exactly.
    Requires per-key event-time-ordered delivery (the standard contract for
    a sequential detector fed from a log); rows within a micro-batch are
    sorted here, ordering ACROSS micro-batches belongs to the source.
    """
    import math

    from genesapi_cli_spark.operators.timeseries import _PH_LAMBDA_MICRO

    (event_type,) = key
    t, s, msum, m_min, n_alarms, first_alarm_t, max_ph = (
        state.get if state.exists else (0, 0, 0, None, 0, None, 0)
    )
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"])
    for v in rows["value"]:
        c = int(math.floor(v * 100 + 0.5))
        t += 1
        s += c
        # float(s) first — the batch/oracle compute CAST(s AS DOUBLE)/t
        # (round s to double, THEN divide); Python's int/int true division
        # rounds the exact rational instead and can differ by 1 ulp once
        # s exceeds 2^53, which would diverge all downstream integer state.
        # Same int64 bound as the batch docstring: |s|·1e6 must stay below
        # 2^63, i.e. |s| < ~9.2e12 cents — certify, don't silently wrap.
        # explicit raise, not assert: the bound must survive `python -O`
        # (asserts are stripped), and a typed error beats a bare
        # AssertionError killing the streaming query opaquely.
        if abs(s) >= (1 << 63) // 1_000_000:
            raise OverflowError(
                "page-hinkley micro-sum bound: |s| cents would overflow "
                "int64 when scaled by 1e6 — certify, don't wrap"
            )
        msum += int(math.floor(float(s) / t * 1_000_000 + 0.5))
        m = s * 1_000_000 - msum
        m_min = m if m_min is None else min(m_min, m)
        ph = m - m_min
        max_ph = max(max_ph, ph)
        if ph > _PH_LAMBDA_MICRO:
            n_alarms += 1
            if first_alarm_t is None:
                first_alarm_t = t
    state.update((t, s, msum, m_min, n_alarms, first_alarm_t, max_ph))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n": [t],
            "n_alarms": [n_alarms],
            "first_alarm_t": [first_alarm_t],
            "max_ph_micro": [max_ph],
        }
    )


def page_hinkley_stream(events: DataFrame) -> DataFrame:
    """Mount the sequential drift detector on a (batch or streaming) events
    DataFrame: per event_type, state = the seven Page-Hinkley sufficient
    statistics; each emitted row is that stream's current verdict. At scale
    state is O(|streams|) and partitions across executors with the key.
    NoTimeout is SAFE HERE BY CONSTRUCTION: the key universe is the
    event-type dimension (bounded, not data-sized), so state never grows
    with stream length — no TTL needed."""
    return (
        events.select("event_type", "ts_us", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _ph_fold,
            outputStructType=PH_OUTPUT_SCHEMA,
            stateStructType=PH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming fixed-target CUSUM ----------------------------------------------

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("s_run", LongType()),
        StructField("max_s", LongType()),
        StructField("min_s", LongType()),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("cusum_scaled", LongType()),
        StructField("max_cusum_scaled", LongType()),
        StructField("min_cusum_scaled", LongType()),
    ]
)


def cusum_stream(events: DataFrame, targets: dict) -> DataFrame:
    """Online CUSUM against a FIXED per-stream target (integer cents) — the
    production profile→monitor contract: the retrospective batch CUSUM
    (q_window_cusum) profiles the historical mean once, then the live
    detector tracks the running sum of deviations from that frozen target
    with O(1) integer state per stream. Exact: deviations, running sum,
    and extremes are int64 end to end (same bound discipline as the batch
    docstring: |Σ(c−k)| ≤ n·max|c−k| ≪ 2⁶³). Requires per-key event-time-
    ordered delivery across micro-batches (the sequential-detector
    contract); rows within a micro-batch are sorted here.

    The extremes are over the POST-OBSERVATION sums S₁..S_t (no phantom
    S₀=0), so after the final micro-batch the state equals the batch
    cumulative-window rollup bit for bit — pytest-pinned.

    NoTimeout is safe by construction: state exists only for keys in the
    frozen targets dict (the calibrated stream set) — bounded by
    configuration, not by data."""
    import math

    def _fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (event_type,) = key
        k = int(targets.get(event_type, 0))
        t, s, mx, mn = state.get if state.exists else (0, 0, None, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for v in rows["value"]:
            c = int(math.floor(v * 100 + 0.5))
            t += 1
            s += c - k
            mx = s if mx is None else max(mx, s)
            mn = s if mn is None else min(mn, s)
        state.update((t, s, mx, mn))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n": [t],
                "cusum_scaled": [s],
                "max_cusum_scaled": [mx],
                "min_cusum_scaled": [mn],
            }
        )

    return (
        events.select("event_type", "ts_us", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _fold,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_fixed_target_batch(events: DataFrame, targets: dict) -> DataFrame:
    """Batch twin of cusum_stream: one cumulative window per stream over the
    same (ts_us, event_id) order, same fixed integer targets — the relation
    the equivalence pytest compares the final stream state against."""
    from pyspark.sql import Window, functions as F

    spark = events.sparkSession
    tdf = spark.createDataFrame(
        [(et, int(k)) for et, k in targets.items()], "event_type string, k long"
    )
    dev = events.join(F.broadcast(tdf), "event_type").select(
        "event_type",
        "ts_us",
        "event_id",
        (F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)") - F.col("k")).alias(
            "d"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cus = dev.select("event_type", F.sum("d").over(w).alias("s"))
    return cus.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("s").cast("bigint").alias("max_cusum_scaled"),
        F.min("s").cast("bigint").alias("min_cusum_scaled"),
    )


# --- streaming exact two-sample Kolmogorov-Smirnov ---------------------------

KS_STATE_SCHEMA = StructType(
    [
        StructField("cents", ArrayType(LongType())),
        StructField("da", ArrayType(LongType())),
        StructField("db", ArrayType(LongType())),
    ]
)

KS_OUTPUT_SCHEMA = StructType(
    [
        StructField("g", LongType()),
        StructField("na", LongType()),
        StructField("nb", LongType()),
        StructField("d_num", LongType()),
        StructField("d_r4", DoubleType()),
    ]
)


def _ks_fold(key: tuple, pdfs: "Iterable[pd.DataFrame]", state: GroupState):
    """applyInPandasWithState twin of the batch q_events_ks
    (operators/experiments.py): state is the exact per-value count pair
    (cents → (n_click, n_purchase)) — the two samples' full sufficient
    statistic, bounded by SUPPORT cardinality (distinct 2-decimal values,
    ≪ stream length), not by stream length. Each micro-batch merges its
    counts, then recomputes the exact supremum MAX|ca·Nb − cb·Na| over the
    sorted support in arbitrary-precision ints — identical integer
    arithmetic to the batch/oracle cross-multiply, so after the last
    micro-batch the emission equals the batch row exactly (d_r4 shares the
    same double division + micro-snap). Unlike CUSUM/Page-Hinkley, KS is
    ORDER-FREE (a distribution statistic), so this twin needs no
    cross-batch event-time ordering contract at all."""
    import math

    (g,) = key
    if state.exists:
        cs, da, db = state.get
        counts = {int(c): [int(a), int(b)] for c, a, b in zip(cs, da, db)}
    else:
        counts = {}
    rows = pd.concat(list(pdfs), ignore_index=True)
    for v, et in zip(rows["value"], rows["event_type"]):
        c = int(math.floor(v * 100 + 0.5))
        slot = counts.setdefault(c, [0, 0])
        slot[0 if et == "click" else 1] += 1
    cs = sorted(counts)
    state.update(
        (cs, [counts[c][0] for c in cs], [counts[c][1] for c in cs])
    )
    ca = cb = 0
    na = sum(counts[c][0] for c in cs)
    nb = sum(counts[c][1] for c in cs)
    d_num = 0
    for c in cs:
        ca += counts[c][0]
        cb += counts[c][1]
        d_num = max(d_num, abs(ca * nb - cb * na))
    d_r4 = (
        math.floor(float(d_num) / float(na * nb) * 10000 + 0.5) / 10000
        if na and nb
        else 0.0
    )
    yield pd.DataFrame(
        {
            "g": [g],
            "na": [na],
            "nb": [nb],
            "d_num": [d_num],
            "d_r4": [d_r4],
        }
    )


def ks_stream(events: DataFrame) -> DataFrame:
    """Mount the exact two-sample KS drift monitor on a (batch or streaming)
    events DataFrame: click-vs-purchase `value` distributions, one global
    detector (state keyed by a constant group — production shards this by
    segment key, e.g. per region or per model version, which also
    partitions the state across executors). Emits the current exact KS
    verdict (na, nb, d_num, d_r4) every micro-batch.

    NoTimeout is safe by construction: one constant group key here (a
    bounded segment dimension in the sharded production form); note the
    value-histogram state within the key grows with DISTINCT OBSERVED
    VALUES — cents-quantized, so bounded by the value range, not stream
    length."""
    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select(F.lit(1).cast("long").alias("g"), "event_type", "value")
        .groupBy("g")
        .applyInPandasWithState(
            _ks_fold,
            outputStructType=KS_OUTPUT_SCHEMA,
            stateStructType=KS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming generalized-ESD (Rosner) multi-outlier screen ------------------

#: mirrors operators/timeseries._ESD_ROUNDS (the batch twin's unroll depth);
#: kept as a local constant so streaming/ never imports the 5.7k-LoC batch
#: module into the state-store worker.
_ESD_STREAM_ROUNDS = 3

_ESD_DAY_US = 86_400_000_000

ESD_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("cents", ArrayType(LongType())),
        StructField("seen", LongType()),
    ]
)

ESD_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("round", LongType()),
        StructField("day_idx", LongType()),
        StructField("cents", LongType()),
        StructField("r_micro", LongType()),
        StructField("n_at_round", LongType()),
        StructField("seen", LongType()),
    ]
)


def _esd_rounds(day_cents: dict, rounds: int) -> list[tuple]:
    """The exact Rosner schedule shared with the batch q_events_esd
    (operators/timeseries.py): each round argmaxes the EXACT integer
    n-scaled deviation |n·x − s| over the remaining days (ties to the
    earliest day), emits the studentized R as one snapped double (floor
    (num/den · 1e6 + 0.5), the identical cast/association sequence the
    Spark plan and the DuckDB oracle use), and removes the day. A
    degenerate round (n ≤ 2 or zero variance) emits nothing and ends the
    schedule — removal only ever follows a pick, so later rounds would
    be byte-identical no-ops in the batch plan too. Python ints are
    arbitrary-precision, so where the batch bigint moments would saturate
    (documented there), this twin stays exact — never less exact."""
    import math

    remaining = dict(day_cents)
    out = []
    for r in range(1, rounds + 1):
        n = len(remaining)
        if n <= 2:
            break
        s = sum(remaining.values())
        q = sum(c * c for c in remaining.values())
        nd = float(n)
        if not (nd * float(q) > float(s) * float(s)):
            break
        day, x = min(
            remaining.items(), key=lambda kv: (-abs(n * kv[1] - s), kv[0])
        )
        den = math.sqrt(nd * (nd * float(q) - float(s) * float(s)) / (n - 1))
        r_micro = int(
            math.floor(float(abs(n * x - s)) / den * 1000000.0 + 0.5)
        )
        out.append((r, day, x, r_micro, n))
        del remaining[day]
    return out


def esd_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState twin of the batch q_events_esd: a streaming
    multi-outlier screen over each stream's daily-revenue series. State
    per event_type is the day→cents rollup — the full sufficient
    statistic, bounded by DISTINCT DAYS (calendar time), not by stream
    length — so like the KS twin (and unlike CUSUM/Page-Hinkley) the
    statistic is ORDER-FREE: any split of rows across micro-batches
    yields the same final verdict, no event-time ordering contract
    needed. Each micro-batch merges its per-day cents, reruns the exact
    3-round Rosner schedule on the current rollup, and emits the full
    pick list; after the last micro-batch the emission equals the batch
    rows exactly. ``seen`` (cumulative row count per key) is the monotone
    marker consumers use to select the final emission under update mode —
    memory-sink row order is not contractual.

    NoTimeout note: keys are the bounded event-type dimension, but the
    per-key day→cents rollup grows with CALENDAR TIME (~365 longs per
    stream-year). That is the full sufficient statistic of the Rosner test
    — a forever-run deployment bounds it by retention policy (drop days
    older than the monitoring horizon in the fold), not by key TTL, since
    evicting a whole stream's state would zero the detector, not trim
    it."""

    def _fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (et,) = key
        if state.exists:
            days, cents_arr, seen = state.get
            acc = {int(d): int(c) for d, c in zip(days, cents_arr)}
            seen = int(seen)
        else:
            acc, seen = {}, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        seen += len(rows)
        for d, c in zip(rows["day_idx"], rows["c"]):
            acc[int(d)] = acc.get(int(d), 0) + int(c)
        ds = sorted(acc)
        state.update((ds, [acc[d] for d in ds], seen))
        recs = _esd_rounds(acc, _ESD_STREAM_ROUNDS)
        yield pd.DataFrame(
            {
                "event_type": pd.Series([et] * len(recs), dtype="object"),
                "round": pd.Series([r for r, *_ in recs], dtype="int64"),
                "day_idx": pd.Series([d for _, d, *_ in recs], dtype="int64"),
                "cents": pd.Series([c for _, _, c, *_ in recs], dtype="int64"),
                "r_micro": pd.Series(
                    [rm for *_, rm, _n in recs], dtype="int64"
                ),
                "n_at_round": pd.Series([n for *_, n in recs], dtype="int64"),
                "seen": pd.Series([seen] * len(recs), dtype="int64"),
            }
        )

    return (
        events.select(
            "event_type",
            F.expr(f"ts_us div {_ESD_DAY_US}").alias("day_idx"),
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            _fold,
            outputStructType=ESD_OUTPUT_SCHEMA,
            stateStructType=ESD_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming PSI drift monitor (frozen-reference form) ----------------------

PSI_STATE_SCHEMA = StructType(
    [
        StructField("c_cur", ArrayType(LongType())),
        StructField("seen", LongType()),
    ]
)

PSI_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_ref", LongType()),
        StructField("n_cur", LongType()),
        StructField("psi_r4", DoubleType()),
        StructField("drifted", BooleanType()),
        StructField("seen", LongType()),
    ]
)


def psi_reference(events: DataFrame) -> dict:
    """CALIBRATION SNAPSHOT for :func:`psi_stream` — the frozen reference a
    production PSI monitor ships to the serving tier: per event_type the
    binning grid (global time midpoint, value span → 10 equal-width bins)
    and the reference bin counts, computed with the EXACT integer
    arithmetic of the batch q_quality_psi (operators/scans.py) so the
    streaming monitor's verdicts are its exact continuation. The collect
    here is the one bounded-by-contract driver fetch: ≤ |event types| × 10
    rows of calibration constants — configuration, not data (the cusum
    targets-dict pattern), frozen once per calibration window."""
    ev = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.col("ts_us").alias("t_us"),
    )
    mid = ev.agg(
        ((F.min("t_us") + F.max("t_us")) / 2).cast("bigint").alias("mid_us")
    )
    spans = ev.groupBy("event_type").agg(
        F.min("cents").alias("mn_c"), F.max("cents").alias("mx_c")
    )
    rows = (
        ev.join(F.broadcast(spans), "event_type")
        .crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            "mn_c",
            "mx_c",
            "mid_us",
            F.expr("(cents - mn_c) * 10 DIV (mx_c - mn_c + 1)").alias("bin"),
            (F.col("t_us") <= F.col("mid_us")).cast("int").alias("is_ref"),
        )
        .groupBy("event_type", "mn_c", "mx_c", "mid_us", "bin")
        .agg(F.sum("is_ref").cast("bigint").alias("c_ref"))
        .collect()
    )
    ref: dict = {}
    for r in rows:
        ent = ref.setdefault(
            r.event_type,
            {
                "mid_us": int(r.mid_us),
                "mn_c": int(r.mn_c),
                "mx_c": int(r.mx_c),
                "c_ref": [0] * 10,
                # bins PRESENT in the calibration data (either period) —
                # the batch terms relation has a row exactly for these, so
                # the stream must score the same bin set.
                "bins": set(),
            },
        )
        ent["c_ref"][int(r.bin)] += int(r.c_ref)
        ent["bins"].add(int(r.bin))
    for ent in ref.values():
        ent["n_ref"] = sum(ent["c_ref"])
    return ref


def psi_stream(events: DataFrame, ref: dict) -> DataFrame:
    """applyInPandasWithState PSI drift monitor — the streaming continuation
    of the batch q_quality_psi: the reference distribution and binning grid
    arrive FROZEN (psi_reference — what model-monitoring systems actually
    deploy: calibrate offline, monitor online), state per event_type is 10
    current-bin counters (O(1), unconditionally bounded), and every
    micro-batch re-emits the exact integer PSI verdict over the counts so
    far. Like KS/ESD (and unlike CUSUM), PSI is a DISTRIBUTION statistic —
    order-free across micro-batches — so after the final micro-batch the
    emission equals the batch row exactly; the pytest feeds the
    current-period rows through an arbitrary split and pins equality.
    Rows at or before the calibration midpoint are reference traffic and
    are not re-scored; live values outside the frozen grid clamp to the
    edge bins (standard practice — the grid is a calibration artifact).
    NoTimeout is safe by construction: keys come from the frozen reference
    dict and state is 10 counters + 1 counter per key — O(|calibrated
    streams|), data-independent."""
    import math

    def _fold(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (et,) = key
        r = ref.get(et)
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "n_ref": pd.Series([], dtype="int64"),
                "n_cur": pd.Series([], dtype="int64"),
                "psi_r4": pd.Series([], dtype="float64"),
                "drifted": pd.Series([], dtype="bool"),
                "seen": pd.Series([], dtype="int64"),
            }
        )
        if r is None:
            yield empty
            return
        if state.exists:
            c_cur, seen = state.get
            c_cur, seen = list(c_cur), int(seen)
        else:
            c_cur, seen = [0] * 10, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        seen += len(rows)
        span = r["mx_c"] - r["mn_c"] + 1
        for v, t in zip(rows["value"], rows["ts_us"]):
            if int(t) <= r["mid_us"]:
                continue
            cents = int(math.floor(v * 100 + 0.5))
            b = (cents - r["mn_c"]) * 10 // span
            c_cur[min(max(b, 0), 9)] += 1
        state.update((c_cur, seen))
        n_cur = sum(c_cur)
        if n_cur == 0:
            yield empty
            return
        n_ref = r["n_ref"]
        lnm = lambda s: int(  # noqa: E731 — the module-standard ln snap
            math.floor(math.log(float(max(s, 1))) * 1000000.0 + 0.5)
        )
        total = 0
        for b in sorted(r["bins"] | {i for i in range(10) if c_cur[i]}):
            cr, cc = r["c_ref"][b], c_cur[b]
            s_ref = (2 * cr * 1000000 + n_ref) // (2 * n_ref)
            s_cur = (2 * cc * 1000000 + n_cur) // (2 * n_cur)
            total += (s_ref - s_cur) * (lnm(s_ref) - lnm(s_cur))
        r4i = (2 * total + 100000000) // 200000000
        yield pd.DataFrame(
            {
                "event_type": pd.Series([et], dtype="object"),
                "n_ref": pd.Series([n_ref], dtype="int64"),
                "n_cur": pd.Series([n_cur], dtype="int64"),
                "psi_r4": pd.Series([float(r4i) / 10000], dtype="float64"),
                "drifted": pd.Series([r4i >= 1000], dtype="bool"),
                "seen": pd.Series([seen], dtype="int64"),
            }
        )

    return (
        events.select("event_type", "value", "ts_us")
        .groupBy("event_type")
        .applyInPandasWithState(
            _fold,
            outputStructType=PSI_OUTPUT_SCHEMA,
            stateStructType=PSI_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming sequence packing (pack-on-ingest) ------------------------------

PACK_STATE_SCHEMA = StructType(
    [
        StructField("last_doc", LongType()),
        StructField("cum_tokens", LongType()),
    ]
)

PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("bin_id", LongType()),
    ]
)


def _pack_budget() -> int:
    """Single source of truth for the bin budget (operators/extended.py
    PACK_BUDGET), imported lazily so the Python worker that unpickles this
    fold never drags the full operators package into its import path."""
    from genesapi_cli_spark.operators.extended import PACK_BUDGET

    return PACK_BUDGET


def _pack_fold(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one source's micro-batch into the running pack fill and emit
    each document's bin assignment. The running state is two longs — the
    last packed doc_id (ingest-order guard) and the cumulative token count
    (the exclusive prefix sum's carry)."""
    (source,) = key
    last_doc, cum = state.get if state.exists else (-1, 0)
    out_doc: list[int] = []
    out_tok: list[int] = []
    out_bin: list[int] = []
    # Materialize and sort ONCE per micro-batch: applyInPandasWithState may
    # deliver one group as several Arrow chunks in arbitrary order, so a
    # per-chunk sort can still interleave doc_ids across chunks and trip the
    # ordered-ingest guard on perfectly ordered input (same pattern as the
    # CUSUM/PH folds above).
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
        if doc_id <= last_doc:
            # The operator's contract is ordered-per-source ingest (an
            # append log); silent reordering would corrupt every later
            # bin id, so fail loudly instead.
            raise ValueError(
                f"pack_stream: out-of-order doc {doc_id} after {last_doc}"
                f" in source {source!r}"
            )
        out_doc.append(int(doc_id))
        out_tok.append(int(n_tok))
        out_bin.append(cum // _pack_budget())
        cum += int(n_tok)
        last_doc = int(doc_id)
    state.update((last_doc, cum))
    yield pd.DataFrame(
        {
            "source": pd.Series([source] * len(out_doc), dtype="object"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "n_tokens": pd.Series(out_tok, dtype="int64"),
            "bin_id": pd.Series(out_bin, dtype="int64"),
        }
    )


def pack_stream(docs: DataFrame) -> DataFrame:
    """Sequence packing ON INGEST — the streaming twin of
    q_pack_sequences' exclusive-prefix-sum window (operators/extended.py
    pack_assignments): as documents arrive per source, assign each to its
    fixed-budget (2048-token) training bin and carry the pack fill across
    micro-batches in the state store. This is the operator a continuous
    pretraining-data pipeline runs so training shards are ready the moment
    ingest lands, instead of re-packing the corpus nightly.

    Exactness contract (pinned by pytest): with ordered-per-source ingest
    — the append-log contract, same as the CUSUM family's time-ordered
    feed — the stream's emissions equal the batch prefix-sum relation
    BIT-FOR-BIT under any micro-batch split, because integer token counts
    make the carry exact and each doc's bin depends only on the carry.
    Out-of-order arrival fails loudly (ValueError) rather than silently
    corrupting every subsequent bin id.

    Scale shape: state is two longs per SOURCE (not per doc — bounded by
    the source dimension, never stream length); rows shuffle once on
    source; the token count is a JVM-side projection before the Python
    boundary, so Arrow batches carry three narrow columns."""
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    )
    return (
        docs.select("source", "doc_id", n_tokens.cast("long").alias("n_tokens"))
        .groupBy("source")
        .applyInPandasWithState(
            _pack_fold,
            outputStructType=PACK_OUTPUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming exact dedup (dedup-on-ingest) ----------------------------------

DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("keeper_doc", LongType()),
        StructField("n_seen", LongType()),
    ]
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("keeper_doc", LongType()),
        StructField("is_dup", BooleanType()),
    ]
)


def _dedup_fold_impl(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    """Fold one content-hash group's micro-batch: the first-ever doc (min
    doc_id under the ordered-ingest contract) becomes the keeper; every
    later doc with the same hash emits is_dup=true pointing at it.

    With ``ttl_ms`` set (ProcessingTimeTimeout mode) a group idle longer
    than the TTL is EVICTED: the fold is invoked with hasTimedOut for
    groups with no new data past their deadline, removes the state, and
    emits nothing. The recall caveat is inherent and documented on the
    public wrappers: a duplicate arriving after its keeper's state expired
    is indistinguishable from fresh content and becomes a new keeper."""
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "keeper_doc": pd.Series([], dtype="int64"),
                "is_dup": pd.Series([], dtype="bool"),
            }
        )
        return
    keeper, n_seen = state.get if state.exists else (-1, 0)
    out_doc: list[int] = []
    out_keep: list[int] = []
    out_dup: list[bool] = []
    # One concat + one sort per micro-batch: a group split across Arrow
    # chunks would otherwise pick the min doc_id of whichever chunk arrived
    # first as keeper — a silent wrong-keeper, not just a spurious error.
    pdf = pd.concat(list(pdfs), ignore_index=True)
    for doc_id in pdf["doc_id"].sort_values():
        d = int(doc_id)
        if keeper < 0:
            keeper = d
        out_doc.append(d)
        out_keep.append(keeper)
        out_dup.append(d != keeper)
        n_seen += 1
    state.update((keeper, n_seen))
    if ttl_ms is not None:
        # ProcessingTimeTimeout deadlines do not survive an update — re-arm
        # on every batch that touches the group (idle clock, not age clock).
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "keeper_doc": pd.Series(out_keep, dtype="int64"),
            "is_dup": pd.Series(out_dup, dtype="bool"),
        }
    )


def _dedup_fold(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Unbounded-state first-seen fold (the pinned batch≡stream contract)."""
    yield from _dedup_fold_impl(key, pdfs, state, None)


def _dedup_fold_ttl(ttl_ms: int):
    """First-seen fold with idle-TTL state eviction — the production guard
    for continuous pipelines where per-distinct-content state would
    otherwise grow without bound under GroupStateTimeout.NoTimeout."""

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        yield from _dedup_fold_impl(key, pdfs, state, ttl_ms)

    return fold


def dedup_stream(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Exact content dedup ON INGEST — the screen every continuous
    training-data pipeline runs before anything else touches a document:
    md5(text) keys the state store, the first arrival (min doc_id under
    the append-log ordered-ingest contract, same as pack_stream) becomes
    the content's keeper, and every later arrival emits is_dup=true with a
    pointer to it. The streaming continuation of batch q_dedup_exact:
    with ordered ingest the emissions equal the batch min-doc-per-hash
    relation exactly under any micro-batch split (pytest-pinned).

    Scale shape: the hash is a JVM-side projection before the Python
    boundary (Arrow batches carry two narrow columns); state is two longs
    per DISTINCT content — bounded by unique corpus content, the same
    cardinality any exact dedup must hold somewhere; on a cluster the
    RocksDB state store spills it off-heap and checkpointing makes the
    screen exactly-once across restarts. Near-dup ingest screening
    composes by swapping the key projection for a band signature
    (q_dedup_near_minhash's bands) — same fold, same state bound.

    ``ttl_ms`` bounds the state for CONTINUOUS pipelines: per-content state
    is evicted after being idle that long (ProcessingTimeTimeout; the
    deadline re-arms on every arrival, so hot content never expires).
    RECALL CAVEAT, by design: a duplicate arriving after its keeper's
    state expired becomes a fresh keeper — the retention horizon is the
    dedup window, exactly the trade a production ingest screen makes to
    run forever. Default None preserves the exact batch≡stream contract."""
    fold = _dedup_fold if ttl_ms is None else _dedup_fold_ttl(ttl_ms)
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .applyInPandasWithState(
            fold,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def near_dedup_stream(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """NEAR-dup screening on ingest — the band-signature swap the exact
    screen's docstring promises, proved here: the group key becomes an LSH
    band bucket (lang, band, k1, k2) instead of the content hash, and the
    SAME first-seen fold (_dedup_fold is key-agnostic) flags every later
    arrival whose 4-seed portable-minhash signature collides with an
    earlier document's band. Each doc emits one row per band (2); the
    doc-level verdict is the standard LSH OR — near-dup iff ANY band row
    flags it — derivable downstream without extra state.

    The signature is computed ENTIRELY IN-ROW (word-3-gram shingles via
    array HOFs, each m_s an array_min over seeded sha256 prefixes —
    byte-identical to the batch portable_bands relation), which is what
    makes this a legal streaming plan: one stateless projection + inline
    band explode + ONE stateful operator; no shuffle-aggregate feeds the
    state store. Structured Streaming forbids chaining stateful ops, so an
    aggregate-then-dedup formulation would not even start — in-row
    signatures are the load-bearing design choice, not a convenience.

    Scale shape: state is two longs per occupied band bucket (bounded by
    distinct signatures, ~2 buckets/doc worst case); Arrow batches carry
    (bucket key, doc_id) only — text never crosses the Python boundary.
    ``ttl_ms`` evicts idle band-bucket state exactly as in dedup_stream
    (same fold), with the same documented recall caveat: near-dups of
    content idle past the retention horizon are re-admitted as keepers."""
    parts = F.split(F.lower("text"), " ")
    sh = F.when(
        F.size(parts) >= 3,
        F.expr(
            "transform(sequence(1, size(split(lower(text), ' ')) - 2),"
            " i -> concat_ws(' ', split(lower(text), ' ')[i-1],"
            " split(lower(text), ' ')[i], split(lower(text), ' ')[i+1]))"
        ),
    ).otherwise(F.array(F.lower("text")))

    def mh(seed: int):
        return F.expr(
            f"array_min(transform(sh, g -> CAST(conv(substring("
            f"sha2(concat('{seed}:', g), 256), 1, 8), 16, 10) AS BIGINT)))"
        )

    banded = (
        docs.select("doc_id", "lang", sh.alias("sh"))
        .select(
            "doc_id",
            "lang",
            F.inline(
                F.array(
                    F.struct(
                        F.lit(0).alias("band"),
                        mh(0).alias("k1"),
                        mh(1).alias("k2"),
                    ),
                    F.struct(
                        F.lit(1).alias("band"),
                        mh(2).alias("k1"),
                        mh(3).alias("k2"),
                    ),
                )
            ),
        )
    )
    fold = _dedup_fold if ttl_ms is None else _dedup_fold_ttl(ttl_ms)
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return banded.groupBy("lang", "band", "k1", "k2").applyInPandasWithState(
        fold,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
