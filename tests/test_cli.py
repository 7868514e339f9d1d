"""CLI surface tests: the reference's serialize/schema subcommands
re-expressed (cube file → NDJSON docs / schema.json), run in-process."""

from __future__ import annotations

import json

from genesapi_cli_spark.cli import main
from genesapi_cli_spark.sources.cube import SAMPLE_CUBE_TEXT, parse_cube_file


def _cube_file(tmp_path):
    p = tmp_path / "12411BJ001.quader"
    p.write_text(SAMPLE_CUBE_TEXT)
    return str(p)


def test_parse_cube_file_matches_literal(spark, tmp_path):
    rows = parse_cube_file(spark, _cube_file(tmp_path)).collect()
    assert len(rows) == 4
    assert {r.region_id for r in rows} == {"01001", "01002"}
    # confidential tokens → NULL value, quality preserved
    assert sum(r.value is None for r in rows) == 2


def test_cli_serialize_roundtrip(spark, tmp_path):
    out = str(tmp_path / "docs")
    rc = main(["serialize", _cube_file(tmp_path), out])
    assert rc == 0
    docs = [
        json.loads(line)
        for f in (tmp_path / "docs").glob("part-*")
        for line in f.read_text().splitlines()
    ]
    assert len(docs) == 4
    parsed = [json.loads(d["doc"]) for d in docs]
    assert {p["region_id"] for p in parsed} == {"01001", "01002"}
    assert all(len(d["fact_id"]) == 64 for d in docs)  # sha256 hex ids
    # deterministic fact ids: same content → same id on rerun
    rc = main(["serialize", _cube_file(tmp_path), out + "2"])
    assert rc == 0
    docs2 = [
        json.loads(line)
        for f in (tmp_path / "docs2").glob("part-*")
        for line in f.read_text().splitlines()
    ]
    assert {d["fact_id"] for d in docs} == {d["fact_id"] for d in docs2}


def test_cli_schema_build(spark, tmp_path):
    out = str(tmp_path / "schema.json")
    rc = main(["schema", _cube_file(tmp_path), out])
    assert rc == 0
    schema = json.loads((tmp_path / "schema.json").read_text())
    m = schema["statistics"]["12411"]["measures"]["BEVSTD"]
    assert m["n_facts"] == 4 and m["n_regions"] == 2
    assert m["years"] == [2014, 2014]
    assert m["dimensions"] == {"GES": ["GESM", "GESW"]}


def test_cli_sql_adhoc(spark, capsys):
    rc = main([
        "sql",
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out and "A" in out


def test_cli_explain_plan(spark, capsys):
    rc = main(["explain", "q_join_broadcast", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BroadcastHashJoin" in out or "Exchange" in out
