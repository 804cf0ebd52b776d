"""Raw-corpus ingestion: JSONL / CSV / whole-text files into the
``documents`` layout (doc_id, text, lang, source, n_chars).

The engine's training-data operators all consume the documents shape;
these readers are the batch on-ramp from the formats raw corpora
actually arrive in (Common-Crawl-style JSONL dumps, one-doc-per-file
text trees, CSV exports). Everything is a plain ``spark.read`` with a
declarative projection — pushdown/pruning stay with Catalyst, and the
readers add only:

- **Deterministic ids**: when the source carries no id column, doc_id
  is ``xxhash64(source, text)`` — stable across re-runs and cluster
  layouts (``monotonically_increasing_id`` is partition-dependent and
  would re-id the corpus on every repartition). Engine-internal only —
  never oracle-compared (same policy as the LSH production lane).
  Collisions are birthday-bounded (~N^2 / 2^64); exact dedup runs on
  content fingerprints, not ids, so a collision cannot merge distinct
  documents silently.
- **Source attribution**: the originating file path rides along
  (``input_file_name``), parameterized into the ``source`` column the
  mixing/dedup operators key on.

Scale: JSONL/CSV readers are splittable scans (Spark parallelizes
within files); ``wholetext`` reads one file per task by design — the
right shape for one-document-per-file trees, pathological for a few
giant files (concatenate those into JSONL first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def _finish(
    df: DataFrame,
    text_col: str,
    id_col: str | None,
    lang_col: str | None,
    source_col: str | None,
    default_lang: str,
    default_source: str | None,
) -> DataFrame:
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    source = (
        F.col(source_col).cast("string")
        if source_col
        else (F.lit(default_source) if default_source is not None
              else F.input_file_name())
    )
    # numeric ids pass through; string/uuid ids hash deterministically
    # (try_cast: a bare cast NULLs them in legacy mode and THROWS under
    # ANSI — both wrong answers for an id column)
    doc_id = (
        F.coalesce(F.col(id_col).try_cast("long"), F.xxhash64(F.col(id_col)))
        if id_col
        else F.xxhash64(source, text)
    )
    lang = (
        F.coalesce(F.col(lang_col).cast("string"), F.lit(default_lang))
        if lang_col
        else F.lit(default_lang)
    )
    return df.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    default_lang: str = "und",
    default_source: str | None = None,
) -> DataFrame:
    """One JSON object per line (the lingua franca of crawled corpora)
    -> documents shape. Unparseable lines surface under Spark's
    ``_corrupt_record`` policy (PERMISSIVE default: null columns) —
    pass ``.option`` tweaks via a pre-read if a corpus needs FAILFAST."""
    raw = spark.read.json(path)
    if text_col not in raw.columns:
        raise ValueError(
            f"JSONL at {path} has no {text_col!r} field; "
            f"columns: {raw.columns}"
        )
    return _finish(raw, text_col, id_col, lang_col, source_col,
                   default_lang, default_source)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    default_lang: str = "und",
    default_source: str | None = None,
    **csv_options,
) -> DataFrame:
    """CSV export -> documents shape (header row expected by default;
    multiline quoted text enabled — the usual shape of text dumps)."""
    opts = {"header": "true", "multiLine": "true", "escape": '"'}
    opts.update({k: str(v) for k, v in csv_options.items()})
    raw = spark.read.options(**opts).csv(path)
    if text_col not in raw.columns:
        raise ValueError(
            f"CSV at {path} has no {text_col!r} column; "
            f"columns: {raw.columns}"
        )
    return _finish(raw, text_col, id_col, lang_col, source_col,
                   default_lang, default_source)


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    json_schema: str,
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    default_lang: str = "und",
    default_source: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_corpus`: readStream over a
    growing JSONL tree -> STREAMING documents frame, for wiring the
    raw-corpus on-ramp straight into
    :class:`~dtle_spark.streaming.corpus_ingest.CorpusIngestJob` (pass
    as its ``reader``). Identical projection (_finish), so batch and
    streaming ingests of the same files produce identical rows —
    including the deterministic xxhash64 ids. Streaming reads require
    an explicit ``json_schema`` (no inference pass over an unbounded
    source); new files are the micro-batch unit, exactly how crawled
    corpora land (one dump file per crawl chunk)."""
    raw = (
        spark.readStream.schema(json_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    if text_col not in raw.columns:
        raise ValueError(
            f"JSONL stream schema has no {text_col!r} field; "
            f"columns: {raw.columns}"
        )
    return _finish(raw, text_col, id_col, lang_col, source_col,
                   default_lang, default_source)


def read_text_tree(
    spark: SparkSession,
    path: str,
    default_lang: str = "und",
) -> DataFrame:
    """One document per FILE (``wholetext``): doc_id =
    xxhash64(file path, content), source = the file path. The
    one-task-per-file shape — right for document trees, wrong for a
    few giant files (see module docstring)."""
    raw = spark.read.option("wholetext", "true").text(path)
    return _finish(
        raw.select(F.col("value").alias("text")),
        "text", None, None, None, default_lang, None,
    )
