#!/usr/bin/env python
"""Scale-rehearsal data generator: deterministic, Spark-native synthetic
tables matching the driver testdata schemas/domains (FIXTURES.md) at
arbitrary scale factor, written to /root/repo/scale_data/sf{SF}/.

Why this exists: SCALE.md's 100 TB claims were (through round 7) pinned by
plan ASSERTIONS at sf0.1 — pushdown, broadcast, shuffle counts — but never
by measured behavior beyond sf0.1. This generator produces sf1/sf3 locally
so BENCH_SCALE.json can report measured per-query scaling exponents
(scripts/bench_scale.py).

Design constraints:
- Deterministic WITHOUT Python RNG loops: every value is a pure function of
  the row id via xxhash64(id, salt) — fully distributed, re-runnable, and
  partition-count-independent (no rand(seed), whose stream depends on the
  task split).
- Distribution-faithful where distributions drive plan behavior, per the
  profile of /root/testdata/sf0.1 (2026-08-15, duckdb):
  * domains/cardinalities exactly (event_type/flag/status/priority values,
    date ranges, 31-word document vocab, dim-64 unit embeddings, label 0-9)
  * events.value ~ Exponential(mean 50) (profiled avg 49.9, median 35≈50ln2)
  * row-count ratios: customer 150k/sf1, supplier 10k, part 200k, orders
    1.5M, lineitem 6M, events 1M, documents 50k, embeddings 20k (all ×sf)
  * documents carry exact duplicates by construction (~0.16% profiled) plus
    one-word-changed near-duplicates for the MinHash family
- Timestamps written as TIMESTAMP_NTZ under a UTC session — the same
  physical parquet layout (timestamp, isAdjustedToUTC=false) io.load
  detects in the driver testdata.

Usage:  python scripts/gen_scale.py 1 [3 ...]    # one dir per sf argument
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUT_ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/root/repo/scale_data")
SEED_NS = "genscale-v1"  # bump to invalidate all generated dirs

DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
PTYPE_W1 = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAME_W1 = ["large", "hot", "blue", "red", "small", "green", "dim", "pale"]
PNAME_W2 = ["ring", "bolt", "washer", "nut", "plate", "rod", "gear", "cap"]
LANGS = [("en", 0.41), ("zh", 0.56), ("es", 0.71), ("fr", 0.86), ("de", 1.01)]

EPOCH_1995 = 788918400  # 1995-01-01 UTC, seconds
ORDERDATE_SPAN_S = 207878400  # → 2001-08-01
SHIPDATE_LO_S = EPOCH_1995 + 86400  # 1995-01-02
SHIPDATE_SPAN_S = 215654400  # → 2001-11-04
EVENTS_T0_US = 1704067200 * 1_000_000  # 2024-01-01 UTC, micros
EVENTS_SPAN_US = 30 * 86400 * 1_000_000 - 1  # 30 days


def _u(col, salt: str):
    """Deterministic uniform [0,1) from (value, salt) — 40 mantissa bits."""
    return F.pmod(F.xxhash64(col, F.lit(SEED_NS + salt)), F.lit(1 << 40)) / float(
        1 << 40
    )


def _pick(col, salt: str, values: list[str]):
    """Deterministic uniform choice from a literal list (JVM-side elt)."""
    idx = F.pmod(F.xxhash64(col, F.lit(SEED_NS + salt)), F.lit(len(values)))
    return F.element_at(F.array(*[F.lit(v) for v in values]), (idx + 1).cast("int"))


def _ids(spark: SparkSession, n: int, parts: int | None = None) -> DataFrame:
    parts = parts or max(4, min(64, n // 250_000 + 1))
    return spark.range(0, n, 1, parts).withColumnRenamed("id", "_id")


def gen_region_nation(spark: SparkSession):
    region = spark.createDataFrame(
        list(
            enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
        ),
        "r_regionkey int, r_name string",
    ).select("r_regionkey", "r_name")
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.format_string("NATION_%d", F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    return region, nation


def gen_customer(spark, n):
    d = _ids(spark, n)
    return d.select(
        F.col("_id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("_id")).alias("c_name"),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "cn")), F.lit(25))
        .cast("int")
        .alias("c_nationkey"),
        F.round(_u(F.col("_id"), "cb") * 10999.8 - 999.9, 2).alias("c_acctbal"),
        _pick(F.col("_id"), "cm", MKTSEGMENTS).alias("c_mktsegment"),
    )


def gen_supplier(spark, n):
    d = _ids(spark, n)
    return d.select(
        F.col("_id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("_id")).alias("s_name"),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "sn")), F.lit(25))
        .cast("int")
        .alias("s_nationkey"),
        F.round(_u(F.col("_id"), "sb") * 10999.8 - 999.9, 2).alias("s_acctbal"),
    )


def gen_part(spark, n):
    d = _ids(spark, n)
    return d.select(
        F.col("_id").alias("p_partkey"),
        F.concat_ws(
            " ",
            _pick(F.col("_id"), "pn1", PNAME_W1),
            _pick(F.col("_id"), "pn2", PNAME_W2),
        ).alias("p_name"),
        F.format_string(
            "Brand#%d",
            F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "pb")), F.lit(25)) + 1,
        ).alias("p_brand"),
        F.concat_ws(
            " ",
            _pick(F.col("_id"), "pt1", PTYPE_W1),
            _pick(F.col("_id"), "pt2", ["ANODIZED", "BRUSHED", "PLATED"]),
        ).alias("p_type"),
        (
            F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "ps")), F.lit(50)) + 1
        )
        .cast("int")
        .alias("p_size"),
        F.round(_u(F.col("_id"), "pp") * 99.9 + 900.0, 2).alias("p_retailprice"),
    )


def gen_orders(spark, n, n_cust):
    d = _ids(spark, n)
    odate_s = (
        F.lit(EPOCH_1995)
        + F.pmod(
            F.xxhash64("_id", F.lit(SEED_NS + "od")), F.lit(ORDERDATE_SPAN_S // 86400)
        )
        * 86400
    )
    return d.select(
        F.col("_id").alias("o_orderkey"),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "oc")), F.lit(n_cust)).alias(
            "o_custkey"
        ),
        _pick(F.col("_id"), "os", ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(_u(F.col("_id"), "op") * 498991.27 + 1001.91, 2).alias(
            "o_totalprice"
        ),
        F.timestamp_seconds(odate_s).cast("timestamp_ntz").alias("o_orderdate"),
        _pick(F.col("_id"), "opr", PRIORITIES).alias("o_orderpriority"),
    )


def gen_lineitem(spark, n, n_orders, n_parts, n_supps):
    d = _ids(spark, n)
    sdate_s = (
        F.lit(SHIPDATE_LO_S)
        + F.pmod(
            F.xxhash64("_id", F.lit(SEED_NS + "ls")), F.lit(SHIPDATE_SPAN_S // 86400)
        )
        * 86400
    )
    qty = (F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "lq")), F.lit(50)) + 1).cast(
        "double"
    )
    return d.select(
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "lo")), F.lit(n_orders)).alias(
            "l_orderkey"
        ),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "lp")), F.lit(n_parts)).alias(
            "l_partkey"
        ),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "lu")), F.lit(n_supps)).alias(
            "l_suppkey"
        ),
        (F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "ln")), F.lit(7)) + 1)
        .cast("int")
        .alias("l_linenumber"),
        qty.alias("l_quantity"),
        F.round(qty * (_u(F.col("_id"), "le") * 1199.9 + 900.1), 2).alias(
            "l_extendedprice"
        ),
        (
            F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "ld")), F.lit(11)) / 100.0
        ).alias("l_discount"),
        (F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "lt")), F.lit(9)) / 100.0).alias(
            "l_tax"
        ),
        _pick(F.col("_id"), "lr", ["A", "N", "R"]).alias("l_returnflag"),
        _pick(F.col("_id"), "ll", ["F", "O"]).alias("l_linestatus"),
        F.timestamp_seconds(sdate_s).cast("timestamp_ntz").alias("l_shipdate"),
    )


def gen_events(spark, n, n_users):
    d = _ids(spark, n)
    ts_us = F.lit(EVENTS_T0_US) + F.pmod(
        F.xxhash64("_id", F.lit(SEED_NS + "et")), F.lit(EVENTS_SPAN_US)
    )
    # Exponential(mean 50) via inverse CDF of the hash-uniform; cap 1-u away
    # from 0 so ln never sees it (max value ≈ 50·ln 2^40 ≈ 1386).
    val = F.round(-50.0 * F.log(F.lit(1.0) - _u(F.col("_id"), "ev")), 2)
    return d.select(
        F.col("_id").alias("event_id"),
        F.timestamp_micros(ts_us).cast("timestamp_ntz").alias("ts"),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "eu")), F.lit(n_users)).alias(
            "user_id"
        ),
        _pick(F.col("_id"), "ee", ETYPES).alias("event_type"),
        val.alias("value"),
        F.format_string(
            '{"k": %d}',
            F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "ek")), F.lit(100)),
        ).alias("props"),
    )


def gen_documents(spark, n):
    """31-word-vocab documents, 10..100 words, with BY-CONSTRUCTION exact
    duplicates (id % 617 == 1 copies id−1's text: ~0.16%, the profiled
    rate) and one-word-changed near-duplicates (id % 1009 == 1 keeps
    id−1's text except the last word — the MinHash golden-pair shape)."""
    d = _ids(spark, n)
    # text_seed: the id whose hash stream defines this row's words
    seed = F.when(
        (F.pmod(F.col("_id"), F.lit(617)) == 1)
        | (F.pmod(F.col("_id"), F.lit(1009)) == 1),
        F.col("_id") - 1,
    ).otherwise(F.col("_id"))
    nw = (F.pmod(F.xxhash64(seed, F.lit(SEED_NS + "dl")), F.lit(91)) + 10).cast(
        "int"
    )
    vocab_arr = F.array(*[F.lit(w) for w in DOC_VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), nw),
        lambda i: F.element_at(
            vocab_arr,
            (
                F.pmod(F.xxhash64(seed, i, F.lit(SEED_NS + "dw")), F.lit(31)) + 1
            ).cast("int"),
        ),
    )
    # near-dup: swap the LAST word for a deterministic different one
    is_near = (F.pmod(F.col("_id"), F.lit(1009)) == 1) & (
        F.pmod(F.col("_id"), F.lit(617)) != 1
    )
    words = F.when(
        is_near,
        F.concat(
            F.slice(words, 1, nw - 1),
            F.array(
                F.element_at(
                    vocab_arr,
                    (
                        F.pmod(
                            F.xxhash64("_id", F.lit(SEED_NS + "dswap")), F.lit(31)
                        )
                        + 1
                    ).cast("int"),
                )
            ),
        ),
    ).otherwise(words)
    text = F.array_join(words, " ")
    lang_u = _u(F.col("_id"), "dg")
    lang = (
        F.when(lang_u < LANGS[0][1], LANGS[0][0])
        .when(lang_u < LANGS[1][1], LANGS[1][0])
        .when(lang_u < LANGS[2][1], LANGS[2][0])
        .when(lang_u < LANGS[3][1], LANGS[3][0])
        .otherwise(LANGS[4][0])
    )
    return d.select(
        F.col("_id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.format_string(
            "src%d", F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "ds")), F.lit(20))
        ).alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )


def gen_embeddings(spark, n):
    """Unit-norm dim-64 float vectors: per-coordinate standard normals via
    Box-Muller over two hash-uniforms, then one JVM-side L2 normalize.
    Labels 0..9 are unclustered blocking keys (profiled: centroids ≈ 0)."""
    d = _ids(spark, n)
    two_pi = 2.0 * math.pi

    def gauss(k):
        u1 = F.pmod(
            F.xxhash64("_id", F.lit(k), F.lit(SEED_NS + "g1")), F.lit(1 << 40)
        ) / float(1 << 40)
        u2 = F.pmod(
            F.xxhash64("_id", F.lit(k), F.lit(SEED_NS + "g2")), F.lit(1 << 40)
        ) / float(1 << 40)
        return F.sqrt(-2.0 * F.log(F.lit(1.0) - u1)) * F.cos(F.lit(two_pi) * u2)

    raw = F.array(*[gauss(k) for k in range(64)])
    nrm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return d.select(
        F.col("_id").alias("vec_id"),
        F.transform(raw, lambda x: (x / nrm).cast("float")).alias("embedding"),
        F.pmod(F.xxhash64("_id", F.lit(SEED_NS + "el")), F.lit(10))
        .cast("int")
        .alias("label"),
    )


def generate(spark: SparkSession, sf: float, out_dir: str) -> None:
    n = lambda base: max(1, int(round(base * sf)))
    n_cust, n_supp, n_part = n(150_000), n(10_000), n(200_000)
    n_ord, n_li, n_ev = n(1_500_000), n(6_000_000), n(1_000_000)
    n_doc, n_emb = n(50_000), n(20_000)
    n_users = max(150, n(15_000))
    region, nation = gen_region_nation(spark)
    tables = {
        "region": region,
        "nation": nation,
        "customer": gen_customer(spark, n_cust),
        "supplier": gen_supplier(spark, n_supp),
        "part": gen_part(spark, n_part),
        "orders": gen_orders(spark, n_ord, n_cust),
        "lineitem": gen_lineitem(spark, n_li, n_ord, n_part, n_supp),
        "events": gen_events(spark, n_ev, n_users),
        "documents": gen_documents(spark, n_doc),
        "embeddings": gen_embeddings(spark, n_emb),
    }
    for name, df in tables.items():
        path = f"{out_dir}/{name}.parquet"
        df.write.mode("overwrite").parquet(path)
        print(f"  {name}: wrote {path}")


def main() -> int:
    sfs = [float(a) for a in sys.argv[1:]] or [1.0]
    from genesapi_cli_spark.session import build_session

    spark = build_session(app_name="genesapi-gen-scale", shuffle_partitions=32)
    for sf in sfs:
        tag = ("%g" % sf)
        out = f"{OUT_ROOT}/sf{tag}"
        print(f"generating sf{tag} → {out}")
        generate(spark, sf, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
