"""Raw-corpus on-ramps (sources/text_corpus.py): JSONL / CSV /
whole-text trees land in the documents shape with deterministic ids,
and the result drives the existing operator surface directly."""

from __future__ import annotations

import json
import os

import pytest

from dtle_spark.sources.text_corpus import (
    DOCUMENTS_COLUMNS,
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_tree,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "dump"
    p.mkdir()
    rows = [
        {"text": "the quick brown fox", "lang": "en", "id": 7},
        {"text": "der schnelle braune fuchs", "lang": "de", "id": 8},
        {"text": "", "lang": "en", "id": 9},
    ]
    with open(p / "part-000.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_jsonl_with_explicit_columns(spark, jsonl_dir):
    d = read_jsonl_corpus(spark, jsonl_dir, id_col="id", lang_col="lang",
                          default_source="dump-v1")
    assert d.columns == DOCUMENTS_COLUMNS
    rows = {r["doc_id"]: r for r in d.collect()}
    assert set(rows) == {7, 8, 9}
    assert rows[7]["lang"] == "en" and rows[8]["lang"] == "de"
    assert rows[7]["n_chars"] == len("the quick brown fox")
    assert rows[9]["text"] == "" and rows[9]["n_chars"] == 0
    assert all(r["source"] == "dump-v1" for r in rows.values())


def test_jsonl_derived_ids_deterministic(spark, jsonl_dir):
    a = {r["text"]: r["doc_id"]
         for r in read_jsonl_corpus(spark, jsonl_dir).collect()}
    b = {r["text"]: r["doc_id"]
         for r in read_jsonl_corpus(
             spark, jsonl_dir).repartition(7).collect()}
    assert a == b  # partition-layout-independent ids
    assert len(set(a.values())) == len(a)  # distinct per distinct text


def test_jsonl_missing_text_col_fails_loud(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    with open(p / "x.jsonl", "w") as f:
        f.write(json.dumps({"body": "hi"}) + "\n")
    with pytest.raises(ValueError, match="no 'text'"):
        read_jsonl_corpus(spark, str(p))


def test_csv_corpus(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    with open(p / "docs.csv", "w") as f:
        f.write('id,text,lang\n1,"hello, world",en\n2,"multi\nline",de\n')
    d = read_csv_corpus(spark, str(p), id_col="id", lang_col="lang")
    rows = {int(r["doc_id"]): r for r in d.collect()}
    assert rows[1]["text"] == "hello, world"
    assert rows[2]["text"] == "multi\nline" and rows[2]["lang"] == "de"


def test_text_tree_one_doc_per_file(spark, tmp_path):
    p = tmp_path / "tree"
    (p / "a").mkdir(parents=True)
    (p / "a" / "x.txt").write_text("alpha doc")
    (p / "a" / "y.txt").write_text("beta doc")
    d = read_text_tree(spark, str(p / "a"))
    rows = d.collect()
    assert len(rows) == 2
    assert {r["text"] for r in rows} == {"alpha doc", "beta doc"}
    assert all(r["source"].endswith((".txt",)) for r in rows)
    assert len({r["doc_id"] for r in rows}) == 2


def test_ingested_corpus_drives_operators(spark, jsonl_dir):
    """The on-ramp's output IS the operator surface's input: text
    stats and exact-dedup fingerprints run unmodified on it."""
    from pyspark.sql import functions as F

    from dtle_spark.functions import textstats as tx

    d = read_jsonl_corpus(spark, jsonl_dir, id_col="id", lang_col="lang")
    stats = d.select(
        "doc_id",
        tx.token_count(tx.tokens(F.col("text"))).alias("n_tokens"),
        F.md5("text").alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in stats}
    assert by_id[7]["n_tokens"] == 4
    assert by_id[9]["n_tokens"] == 0
    assert len({r["fp"] for r in stats}) == 3


def test_string_ids_hash_instead_of_null(spark, tmp_path):
    """A string/uuid id column must not become silent NULLs: non-castable
    ids hash deterministically."""
    p = tmp_path / "sids"
    p.mkdir()
    with open(p / "x.jsonl", "w") as f:
        f.write(json.dumps({"id": "doc-aaa", "text": "one"}) + "\n")
        f.write(json.dumps({"id": "doc-bbb", "text": "two"}) + "\n")
        f.write(json.dumps({"id": "17", "text": "three"}) + "\n")
    d = read_jsonl_corpus(spark, str(p), id_col="id")
    rows = {r["text"]: r["doc_id"] for r in d.collect()}
    assert None not in rows.values()
    assert rows["three"] == 17          # numeric strings pass through
    assert len(set(rows.values())) == 3
    again = {r["text"]: r["doc_id"]
             for r in read_jsonl_corpus(spark, str(p), id_col="id").collect()}
    assert again == rows                # hash ids are deterministic
