"""Local differential-oracle harness replicating the driver's t2 check.

For each declared query: run the Spark DataFrame AND the DuckDB oracle SQL on
the same parquet tables, then compare row count, column names (sorted), value
kinds, and an order-insensitive multiset of normalized rows. A query is only
*declared* (registered with an oracle) once it passes here at sf0.01 — the
exact data the driver uses.

Normalization mirrors what any sane value-hash must do: sorted column order,
canonical string forms per cell. We are strictly *stricter* than a hash —
exact equality of normalized cells.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field
from decimal import Decimal

from genesapi_cli_spark.io import TABLES
from genesapi_cli_spark.registry import REGISTRY, Query


def duckdb_connect(sf_dir: str):
    """Fresh DuckDB connection with driver-style views over the sf tables."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"  # queries should avoid Decimal outputs
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


# --- declared-type strictness ----------------------------------------------
# The external driver hashes values type-sensitively: DuckDB HUGEINT
# (SUM(BIGINT)'s default result type) vs Spark bigint hash-differ even though
# fetchall() coerces both to Python int. Guard the whole class: map DECLARED
# DuckDB result types and Spark schema types to a common kind and compare;
# reject any oracle declaring HUGEINT/UHUGEINT/DECIMAL outright.

_FORBIDDEN_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _duck_kind(typestr: str):
    t = typestr.upper()
    if t.endswith("[]"):
        return "list"
    if t.startswith(("STRUCT", "MAP", "UNION")):
        return "complex"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BLOB":
        return "bytes"
    return t.lower()


def _spark_kind(dtype: str):
    t = dtype.lower()
    if t.startswith("array"):
        return "list"
    if t.startswith(("struct", "map")):
        return "complex"
    if t in ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "binary":
        return "bytes"
    return t


def _kind(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (float, Decimal)):
        return "float"
    if isinstance(v, int):
        return "int"
    if isinstance(v, _dt.datetime):
        return "timestamp"
    if isinstance(v, _dt.date):
        return "date"
    return type(v).__name__


@dataclass
class CheckResult:
    name: str
    ok: bool
    mode: str  # "oracle" | "rows-only"
    spark_rows: int = 0
    oracle_rows: int = 0
    errors: list = field(default_factory=list)

    def __str__(self) -> str:
        s = "PASS" if self.ok else "FAIL"
        msg = f"{s} {self.name} [{self.mode}] rows={self.spark_rows}"
        for e in self.errors[:6]:
            msg += f"\n    - {e}"
        return msg


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def check_query(spark, q: Query, sf_dir: str, con=None) -> CheckResult:
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = CheckResult(q.name, True, "oracle" if q.oracle else "rows-only", len(srows))

    if len(set(scols)) != len(scols):
        res.ok = False
        res.errors.append(f"duplicate spark column names: {scols}")
        return res

    if q.oracle is None:
        if not srows:
            res.errors.append("rows-only query returned 0 rows (allowed but suspicious)")
        return res

    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        cur = con.sql(q.oracle)
        ocols = list(cur.columns)
        otypes = [str(t) for t in cur.types]
        orows = cur.fetchall()
    finally:
        if own_con:
            con.close()

    res.oracle_rows = len(orows)
    if sorted(scols) != sorted(ocols):
        res.ok = False
        res.errors.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return res

    # DECLARED-type strictness: the driver's value hash sees DuckDB's declared
    # result types, not the Python-coerced values fetchall() hands us.
    for c, t in zip(ocols, otypes):
        if any(f in t.upper() for f in _FORBIDDEN_DUCK):
            res.ok = False
            res.errors.append(
                f"oracle column {c} declares forbidden DuckDB type {t} "
                f"(wrap with CAST(... AS BIGINT/DOUBLE))"
            )
    sdtypes = dict(sdf.dtypes)
    odtypes = dict(zip(ocols, otypes))
    for c in scols:
        skind, okind = _spark_kind(sdtypes[c]), _duck_kind(odtypes[c])
        if skind != okind:
            res.ok = False
            res.errors.append(
                f"column {c} declared-type kind differs: "
                f"spark {sdtypes[c]} ({skind}) vs oracle {odtypes[c]} ({okind})"
            )
    if not res.ok:
        return res
    if len(srows) != len(orows):
        res.ok = False
        res.errors.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")

    # column kinds (first non-null value per column, compared by sorted name)
    def kinds(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = {}
        for i in order:
            k = None
            for r in rows:
                k = _kind(r[i])
                if k is not None:
                    break
            out[cols[i]] = k
        return out

    sk, ok_ = kinds(srows, scols), kinds(orows, ocols)
    for c in sk:
        if sk[c] is not None and ok_[c] is not None and sk[c] != ok_[c]:
            res.ok = False
            res.errors.append(f"column {c} kind differs: spark={sk[c]} oracle={ok_[c]}")

    sn, on = _normalize(srows, scols), _normalize(orows, ocols)
    if sn != on:
        res.ok = False
        only_s = [r for r in sn if r not in set(on)]
        only_o = [r for r in on if r not in set(sn)]
        res.errors.append(
            f"value mismatch: {len(only_s)} spark-only / {len(only_o)} oracle-only rows"
        )
        for r in only_s[:3]:
            res.errors.append(f"  spark-only: {r[:240]}")
        for r in only_o[:3]:
            res.errors.append(f"  oracle-only: {r[:240]}")
    return res


def check_all(spark, sf_dir: str, names=None) -> list[CheckResult]:
    import genesapi_cli_spark

    genesapi_cli_spark.load_all()
    con = duckdb_connect(sf_dir)
    out = []
    try:
        for name, q in sorted(REGISTRY.items()):
            if names and name not in names:
                continue
            try:
                out.append(check_query(spark, q, sf_dir, con))
            except Exception as e:  # noqa: BLE001 — harness must report, not die
                r = CheckResult(name, False, "oracle" if q.oracle else "rows-only")
                r.errors.append(f"exception: {type(e).__name__}: {e}")
                out.append(r)
    finally:
        con.close()
    return out
