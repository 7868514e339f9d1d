"""Round-9 invariants: the PII redaction ladder on a corpus that actually
contains PII (the sf tables carry none, so the registered oracle proves the
ladder only structurally), BPE encode vs a from-scratch Python reimplementation,
q_dedup_eval's block-sampling knob, the bounded ahash top-k contract, and the
long-gram substring screen on planted duplicated spans."""

from __future__ import annotations

import math
import shutil
from collections import Counter, defaultdict

import duckdb

import genesapi_cli_spark
from genesapi_cli_spark.io import TABLES
from genesapi_cli_spark.registry import REGISTRY
from tests.conftest import SMOKE_SF_DIR

genesapi_cli_spark.load_all()


def _scratch_lake(tmp_path, replace: dict[str, str]) -> str:
    """Copy every smoke table into a scratch sf_dir, overriding the named
    tables with DuckDB SELECTs over their smoke source ({src} placeholder),
    so differential checks (which view ALL tables) run against it."""
    sf = str(tmp_path)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SMOKE_SF_DIR}/{t}.parquet"
        if t in replace:
            con.sql(
                f"COPY ({replace[t].format(src=src)})"
                f" TO '{sf}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(src, f"{sf}/{t}.parquet")
    con.close()
    return sf


def test_redact_ladder_on_real_pii(spark, tmp_path):
    """The registered corpus has zero emails/IPs/phones, so the oracle there
    proves only ladder structure. Here props is seeded with every class and
    the FULL differential (Spark vs DuckDB) must still hash-match — this is
    the test that would catch a Java-vs-RE2 regex divergence — plus each
    class counter must actually fire."""
    from genesapi_cli_spark.oracle import check_all

    inject = """
SELECT * REPLACE (
  CASE event_id % 5
    WHEN 0 THEN 'contact alice.smith+spam@ex-ample.org or bob@sub.domain.io'
    WHEN 1 THEN 'srv 10.0.42.7 peer 192.168.0.1:8080 up'
    WHEN 2 THEN 'call +4915112345678 or 040-555-0199 x 7'
    WHEN 3 THEN props
    ELSE 'mixed a@b.co 1.2.3.4 +12025550123 and 99 apples'
  END AS props)
FROM read_parquet('{src}')
"""
    sf = _scratch_lake(tmp_path, {"events": inject})
    res = check_all(spark, sf, {"q_text_redact"})
    assert len(res) == 1 and res[0].ok, res[0]
    row = (
        REGISTRY["q_text_redact"].fn(spark, sf)
        .selectExpr(
            "sum(n_email) AS e", "sum(n_ip) AS i",
            "sum(n_phone) AS p", "sum(n_num) AS n",
        )
        .collect()[0]
    )
    assert row["e"] > 0 and row["i"] > 0 and row["p"] > 0 and row["n"] > 0


def _python_bpe_encode(rows, rounds=2):
    """From-scratch BPE train+encode over (doc_id, lang, text) rows: word
    freqs, `rounds` greedy argmax merges (count DESC, pair ASC), left-fold
    application, per-lang token economics."""
    freqs: Counter = Counter()
    for _, _, text in rows:
        for w in (text or "").lower().split(" "):
            if w:
                freqs[w] += 1
    toks = {w: list(w) for w in freqs}

    def fold(seq, a, b):
        out: list = []
        for x in seq:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    for _ in range(rounds):
        pairs: Counter = Counter()
        for w, t in toks.items():
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] += freqs[w]
        (a, b), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        toks = {w: fold(t, a, b) for w, t in toks.items()}

    agg = defaultdict(lambda: [set(), 0, 0, 0])  # docs, words, chars, tokens
    for doc_id, lang, text in rows:
        for w in (text or "").lower().split(" "):
            if w:
                a = agg[lang]
                a[0].add(doc_id)
                a[1] += 1
                a[2] += len(w)
                a[3] += len(toks[w])

    def r4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    return {
        lang: (
            len(d), nw, nc, nt, r4(nc / nt), r4(nt / len(d))
        )
        for lang, (d, nw, nc, nt) in agg.items()
    }


def test_bpe_encode_matches_python_reimplementation(spark):
    """q_text_bpe_encode vs an independent pure-Python BPE train+encode on
    the smoke corpus — same merge list, same greedy fold, same economics."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, text FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    want = _python_bpe_encode(rows)
    got = {
        r["lang"]: (
            r["n_docs"], r["n_words"], r["n_chars"], r["n_tokens"],
            r["chars_per_token_r4"], r["tokens_per_doc_r4"],
        )
        for r in REGISTRY["q_text_bpe_encode"].fn(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want


def test_dedup_eval_block_sampling_knob(spark):
    """The block-sample knob must thin coverage deterministically: sampled
    blocks < total blocks, pair coverage monotone non-increasing, identical
    schema; a vanishing rate must yield the 1-row zero-coverage certificate,
    not a crash."""
    fn = REGISTRY["q_dedup_eval"].fn
    full = fn(spark, SMOKE_SF_DIR).collect()[0]
    try:
        spark.conf.set("spark.genesapi.dedup.eval.block_sample", "0.3")
        samp = fn(spark, SMOKE_SF_DIR).collect()[0]
        spark.conf.set("spark.genesapi.dedup.eval.block_sample", "1e-9")
        none = fn(spark, SMOKE_SF_DIR).collect()[0]
    finally:
        spark.conf.set("spark.genesapi.dedup.eval.block_sample", "1.0")
    assert full["blocks_sampled"] == full["blocks_total"]
    assert 0 < samp["blocks_sampled"] < samp["blocks_total"] == full["blocks_total"]
    assert samp["n_pairs"] <= full["n_pairs"]
    assert none["n_pairs"] == 0 and none["mae_r4"] is None


def test_ahash_topk_is_bounded_and_ranked(spark):
    """Per-asset neighbor lists: ≤ k rows per doc, rn dense from 1, hamming
    non-decreasing in rn, and every listed edge's mirror appears in the
    symmetric relation (the pair stage is undirected)."""
    rows = REGISTRY["q_multimodal_ahash"].fn(spark, SMOKE_SF_DIR).collect()
    per_doc: dict = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append((r["rn"], r["nbr_id"], r["hamming"]))
    edges = {(r["doc_id"], r["nbr_id"]) for r in rows}
    assert edges, "smoke corpus should contain at least one near-dup pair"
    for doc, lst in per_doc.items():
        lst.sort()
        assert 1 <= len(lst) <= 3
        assert [rn for rn, _, _ in lst] == list(range(1, len(lst) + 1))
        hams = [h for _, _, h in lst]
        assert hams == sorted(hams) and all(h <= 6 for h in hams)


def test_round9_degenerate_corpora(spark, tmp_path):
    """Edge branches the main corpus never exercises, each run as a FULL
    differential so both engines must agree: documents shorter than one
    gram (whole-text fallback in longgram AND the short-doc single-window
    fallback in winnowing), a one-word corpus through BPE encode (no
    mergeable pair on round 2 boundary behavior), and a PII-free ladder."""
    from genesapi_cli_spark.oracle import check_all

    shorty = """
SELECT * REPLACE (
  CASE row_number() OVER (ORDER BY doc_id) % 3
    WHEN 0 THEN 'tiny'
    WHEN 1 THEN 'under fifty characters of text here'
    ELSE 'word ' || doc_id
  END AS text)
FROM read_parquet('{src}') LIMIT 6
"""
    sf = _scratch_lake(tmp_path, {"documents": shorty})
    res = check_all(
        spark, sf,
        {"q_text_longgram_dedup", "q_text_winnow_dedup", "q_text_bpe_encode",
         "q_text_sentence_dedup"},
    )
    bad = [r for r in res if not r.ok]
    assert not bad, bad
    # The two 'tiny' docs and the two identical sub-50-char docs count each
    # other as dups through the whole-text fallback gram; the per-doc-unique
    # 'word N' docs must not.
    rows = {r["doc_id"]: r for r in
            REGISTRY["q_text_longgram_dedup"].fn(spark, sf).collect()}
    assert sum(1 for r in rows.values() if r["n_dup"] > 0) == 4
    assert sum(1 for r in rows.values() if r["n_dup"] == 0) == 2


def test_ahash_empty_pair_graph(spark, tmp_path):
    """A corpus whose payload prefixes are all far apart in hamming space:
    the top-k table AND the cluster rollup are both EMPTY relations (not a
    crash, not a null row), and the differentials still hash-match."""
    from genesapi_cli_spark.oracle import check_all

    # alternate two payload alphabets so block sums differ wildly -> 60-bit
    # hashes far apart; every doc unique
    spread_docs = """
SELECT * REPLACE (
  'doc' || doc_id || repeat(CASE WHEN doc_id % 2 = 0 THEN ' zz 99 ' ELSE ' aa !! ' END
    || doc_id || ' ', 40) AS text)
FROM read_parquet('{src}') LIMIT 4
"""
    sf = _scratch_lake(tmp_path, {"documents": spread_docs})
    res = check_all(
        spark, sf, {"q_multimodal_ahash", "q_multimodal_dedup_clusters"}
    )
    bad = [r for r in res if not r.ok]
    assert not bad, bad


def test_ahash_clusters_match_union_find(spark):
    """The perceptual-dedup cluster rollup must equal union-find ground
    truth over the same (capped, verified) pair relation: same keeper per
    asset, same sizes, converged certificate."""
    from genesapi_cli_spark.operators.multimodal import ahash_pairs

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in ahash_pairs(spark, SMOKE_SF_DIR).collect()
    ]
    assert pairs
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict = defaultdict(set)
    for n in parent:
        want[find(n)].add(n)
    rows = REGISTRY["q_multimodal_dedup_clusters"].fn(spark, SMOKE_SF_DIR).collect()
    got = {r["keeper_doc"]: r for r in rows}
    assert set(got) == set(want)
    for k, members in want.items():
        assert got[k]["n_assets"] == len(members)
        assert got[k]["max_doc"] == max(members)
        assert got[k]["n_dropped"] == len(members) - 1
        assert got[k]["n_unconverged"] == 0


def test_longgram_detects_planted_spans(spark, tmp_path):
    """Two docs sharing a 60-char span at DIFFERENT offsets must both report
    duplicated grams (alignment-free detection); an unrelated doc reports
    zero; and the differential oracle still hash-matches on this corpus."""
    from genesapi_cli_spark.oracle import check_all

    span = "x" * 25 + " the exact duplicated span " + "y" * 8  # 60 chars
    assert len(span) == 60
    inject = f"""
SELECT * REPLACE (
  CASE row_number() OVER (ORDER BY doc_id) % 3
    WHEN 0 THEN 'leading prefix AAA {span} trailing'
    WHEN 1 THEN 'a very different and much longer leading prefix {span}'
    ELSE 'clean document with short flanks ' || doc_id || ' nothing fifty chars repeats here'
  END AS text)
FROM read_parquet('{{src}}') LIMIT 9
"""
    sf = _scratch_lake(tmp_path, {"documents": inject})
    res = check_all(spark, sf, {"q_text_longgram_dedup"})
    assert len(res) == 1 and res[0].ok, res[0]
    rows = REGISTRY["q_text_longgram_dedup"].fn(spark, sf).collect()
    dup = [r for r in rows if r["n_dup"] > 0]
    clean = [r for r in rows if r["n_dup"] == 0]
    assert len(dup) == 6 and len(clean) == 3

    # The winnowed screen must honor its correctness theorem on the same
    # corpus: the planted span is 60 ≥ gram+w−1 = 57 chars, so every
    # span-carrying doc keeps at least one SHARED fingerprint, the clean
    # docs keep none, and thinning is real (n_fp < n_grams on long docs).
    res = check_all(spark, sf, {"q_text_winnow_dedup"})
    assert len(res) == 1 and res[0].ok, res[0]
    wrows = REGISTRY["q_text_winnow_dedup"].fn(spark, sf).collect()
    wdup = {r["doc_id"] for r in wrows if r["n_dup"] > 0}
    assert wdup == {r["doc_id"] for r in dup}
    assert all(r["n_fp"] < r["n_grams"] for r in wrows if r["n_grams"] > 8)
