"""Round-13 optimization-round tests: the memo de-shadowing knob and any
operator-internal changes this round makes (focused tests per the round
rules — one test per changed internal)."""

from __future__ import annotations

import os

from genesapi_cli_spark.io import derived_memo_get_or_build

from tests.conftest import SMOKE_SF_DIR


def test_no_memo_knob_disables_cross_invocation_sharing(spark, monkeypatch):
    """SPARK_GRAFT_NO_MEMO=1 must route every derived_memo_get_or_build call
    to a fresh build (no memo population, no reuse), while the default path
    still serves one shared object. This is the round-13 de-shadowing knob
    the bench runs once each way to quantify the session memos."""
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).toDF("x")

    memo: dict = {}
    key = ("app", SMOKE_SF_DIR, ("stamp",))

    monkeypatch.setenv("SPARK_GRAFT_NO_MEMO", "1")
    a = derived_memo_get_or_build(memo, key, build)
    b = derived_memo_get_or_build(memo, key, build)
    assert calls["n"] == 2, "no-memo mode must rebuild per call"
    assert not memo, "no-memo mode must not populate the memo"
    assert a is not b
    assert sorted(r.x for r in a.collect()) == sorted(r.x for r in b.collect())

    monkeypatch.delenv("SPARK_GRAFT_NO_MEMO")
    c = derived_memo_get_or_build(memo, key, build)
    d = derived_memo_get_or_build(memo, key, build)
    assert calls["n"] == 3, "memo mode must build once"
    assert c is d
    assert key in memo
