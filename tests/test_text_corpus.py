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


def test_jsonl_tree_to_streaming_ingest_e2e(spark, tmp_path):
    """The first path a real training-data user hits, end to end:
    raw JSONL dump tree -> stream_jsonl_corpus (documents shape,
    deterministic xxhash64 ids) -> CorpusIngestJob (within-batch exact
    dedup, cross-batch near-dup vs the PERSISTED index) ->
    manifest-sealed corpus, replay-idempotent."""
    import json
    import os

    from dtle_spark.sinks.manifest import TableManifest
    from dtle_spark.sources.text_corpus import stream_jsonl_corpus
    from dtle_spark.streaming.corpus_ingest import CorpusIngestJob

    src = str(tmp_path / "dumps")
    os.makedirs(src)
    base = "the quick brown fox jumps over the lazy dog and runs far away"

    def dump(name, docs):
        with open(os.path.join(src, name), "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")

    dump("crawl-000.jsonl", [
        {"text": base + " one", "lang": "en"},
        {"text": "completely different text about spark query engines",
         "lang": "en"},
        {"text": base + " one", "lang": "en"},  # exact dup within batch
    ])

    def reader(s):
        return stream_jsonl_corpus(
            s, os.path.join(src, "*.jsonl"),
            "text string, lang string", lang_col="lang",
        )

    job = CorpusIngestJob(
        spark, src, str(tmp_path / "tgt"), str(tmp_path / "ckpt"),
        reader=reader,
    )
    job.start()
    job.process_available()
    c1 = job.corpus().collect()
    texts1 = sorted(r["text"] for r in c1)
    assert texts1 == sorted([
        base + " one",
        "completely different text about spark query engines",
    ])
    # deterministic ids + attribution: xxhash64(source, text), source
    # is the originating dump file
    assert all(r["source"].endswith("crawl-000.jsonl") for r in c1)
    assert all(r["doc_id"] is not None for r in c1)
    assert all(r["n_chars"] == len(r["text"]) for r in c1)

    # second crawl chunk arrives: exact dup + near dup + fresh doc
    dump("crawl-001.jsonl", [
        {"text": base + " one", "lang": "en"},   # exact dup of corpus
        {"text": base + " two", "lang": "en"},   # near dup of corpus
        {"text": "fresh unrelated content counting tokens and windows",
         "lang": "en"},
    ])
    job.start()
    job.process_available()
    texts2 = sorted(r["text"] for r in job.corpus().collect())
    assert texts2 == sorted(texts1 + [
        "fresh unrelated content counting tokens and windows",
    ])

    # replay-idempotence: re-running the committed batch is a no-op
    wm = job.target.seq_watermark("corpus", "documents")["__ingest_batch"]
    from dtle_spark.sources.text_corpus import read_jsonl_corpus
    batch_again = read_jsonl_corpus(
        spark, os.path.join(src, "crawl-001.jsonl"), lang_col="lang",
    )
    job.apply_batch(batch_again, wm)
    assert sorted(r["text"] for r in job.corpus().collect()) == texts2

    # manifest-sealed: each chunk left a resolvable snapshot
    vs = TableManifest.versions(job.target.path("corpus", "documents"))
    assert len(vs) >= 2
