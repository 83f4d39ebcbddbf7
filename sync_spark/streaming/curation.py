"""Streaming corpus curation: the LLM-training-data pipeline run as a
CDC consumer — documents arriving on the change-event envelope are
quality-filtered, language-gated, and exact-deduplicated ON THE
STREAM, landing an append-only curated corpus.

Composition (everything per-row or watermark-bounded — legal on a
streaming DataFrame, no unsupported batch-window ops):

- source: the same envelope log the replication pipeline tails
  (sources/cdc.py) — curation is just another consumer of the feed;
- signals: token count, composite quality score, stopword-vote
  language id, md5 fingerprint (functions/text.py) — pure Column
  expressions, map-side, no shuffle before the filter so rejected
  documents die in the scan stage;
- dedup: ``withWatermark(ts) + dropDuplicatesWithinWatermark(fp)`` —
  first arrival of a fingerprint wins, re-sends within the watermark
  horizon are dropped, and state is EVICTED past it (the unbounded
  dropDuplicates state growth is exactly what the WithinWatermark
  variant exists to fix; at 100 TB/day the state is bounded by the
  horizon's unique-fingerprint count, not history);
- sink: append-mode parquet with checkpointed offsets — restart-safe
  like every other stream here.

The batch oracle for tests: quality filter over the same rows +
first-arrival-per-fingerprint (min seq), computed with batch ops.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.functions.text import fingerprint, langid, quality_score, token_count
from sync_spark.sources.cdc import read_event_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

DEFAULT_MIN_TOKENS = 5
DEFAULT_MIN_QUALITY = 0.3


def curation_signals(docs: DataFrame) -> DataFrame:
    """Attach the per-row curation signals (streaming-legal: no
    windows, no aggregation; tokens staged once — narrow projections
    only, so the expression-sharing form stays streaming-legal)."""
    from sync_spark.functions.text import (
        langid_toks,
        quality_score_toks,
        tokens,
    )

    staged = docs.select("*", tokens(F.col("text")).alias("__cs_toks"))
    return staged.select(
        *docs.columns,
        F.size("__cs_toks").alias("n_tokens"),
        quality_score_toks(F.col("__cs_toks"), F.col("text")).alias("quality"),
        langid_toks(F.col("__cs_toks")).alias("lang_pred"),
        fingerprint(F.col("text")).alias("fp"),
    )


def curate_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    min_tokens: int = DEFAULT_MIN_TOKENS,
    min_quality: float = DEFAULT_MIN_QUALITY,
    benchmark_fps: DataFrame | None = None,
    coverage_model: Optional[list] = None,
    min_coverage_e6: int = 0,
) -> DataFrame:
    """signals → quality/language gate → streaming exact dedup.

    Dedup contract: ACROSS micro-batches the first-processed
    fingerprint wins and later arrivals within the watermark horizon
    are dropped; WITHIN one micro-batch the survivor among
    simultaneous duplicates is operator-chosen (Spark keeps an
    arbitrary single row). Pipelines needing strict in-batch ordering
    should bound the trigger (maxFilesPerTrigger=1 makes file order
    the arrival order) — tested both ways."""
    sig = curation_signals(docs)
    kept = sig.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
        & (F.col("lang_pred") == F.col("lang"))
    )
    if benchmark_fps is not None:
        # streaming decontamination: the held-out eval set's winnowing
        # fingerprints (STATIC — computed once batch-side, collected
        # once; eval sets are MBs) become an array literal, and each
        # streaming doc recomputes its own fingerprint set PER ROW via
        # the staged-column winnowing builder (dedup.winnow_fps_columns
        # — narrow projections only, so it is streaming-legal, and
        # linear per document where the one-big-expression HOF form
        # re-evaluates the gram hashes per window position). agreement
        # with the batch operator is test-asserted. arrays_overlap is a
        # map-side predicate: no join, no state, a doc sharing any
        # verbatim >= k+window-1 token run with the benchmark dies in
        # the scan stage. Same decontamination criterion as the batch
        # d_decontaminate operator.
        from sync_spark.operators.dedup import winnow_fps_columns

        bench = [r["fp"] for r in benchmark_fps.select("fp").distinct().collect()]
        if bench:
            kept = winnow_fps_columns(kept, "text", out="__doc_fps")
            kept = kept.filter(
                ~F.arrays_overlap(F.col("__doc_fps"), F.lit(bench))
            ).drop("__doc_fps")
    if coverage_model is not None:
        # model-assisted gate: per-row coverage against the static
        # top-k bigram table (see lm_coverage_col) — unscorable docs
        # (< 2 tokens) pass this gate (min_tokens owns that decision)
        kept = kept.withColumn("lm_coverage_e6", lm_coverage_col(F.col("text"), coverage_model))
        kept = kept.filter(
            F.col("lm_coverage_e6").isNull()
            | (F.col("lm_coverage_e6") >= min_coverage_e6)
        )
    else:
        # always emit the column (ADVICE r5): re-running a pipeline on
        # an existing out_path with the coverage option toggled must
        # not append parquet files with a different schema
        kept = kept.withColumn("lm_coverage_e6", F.lit(None).cast("long"))
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])


def train_topk_bigrams(docs: DataFrame, k: int = 4096) -> list:
    """Distill a reference corpus into its top-k most frequent bigrams
    — the static "model" for the streaming coverage gate. The corpus
    work is one map-side-partial aggregation; the collect is
    K-BOUNDED by construction (the repo's bounded-collect discipline),
    ordered (count desc, bigram asc) so the model is deterministic
    across runs and partitionings."""
    from sync_spark.functions.text import tokens

    toks = docs.select(tokens(F.col("text")).alias("toks"))
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode_outer(
                F.zip_with(
                    F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
                    F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
                    lambda x, y: F.concat_ws("\x1f", x, y),
                )
            ).alias("bi")
        )
        .filter(F.col("bi").isNotNull())
    )
    top = (
        bi.groupBy("bi")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("bi").asc())
        .limit(k)
    )
    return [r["bi"] for r in top.collect()]


def lm_coverage_col(text_col, topk_bigrams: list):
    """Per-row model-coverage score: the fraction (e6-scaled integer)
    of the document's DISTINCT bigrams found in the static top-k
    table. A cheap CCNet-style fluency proxy that is fully
    streaming-legal — no join, no state, no shuffle: the model rides
    along as an array literal (k·avg-bigram-len bytes, KBs at
    k=4096), array_intersect hashes one side per row (O(len + k)),
    and a gibberish document whose transitions never appear in the
    reference corpus scores 0. Staged columns keep the tokenizer
    single-evaluation (the same CollapseProject discipline as the
    winnow/LM kernels); NULL when the doc has no bigram (< 2 tokens)
    so callers choose the polarity of the gate."""
    from pyspark.sql import Column  # noqa: F401

    toks = F.split(F.trim(text_col), r"\s+")
    toks = F.when(F.length(F.trim(text_col)) == 0, F.array().cast("array<string>")).otherwise(toks)
    bi = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat_ws("\x1f", x, y),
    )
    dbi = F.array_distinct(bi)
    covered = F.size(F.array_intersect(dbi, F.lit(topk_bigrams).cast("array<string>")))
    return F.when(
        F.size(dbi) > 0,
        (covered.cast("long") * F.lit(1000000)) / F.size(dbi),
    ).cast("long").alias("lm_coverage_e6")


class CurationPipeline:
    """Envelope log → curated corpus. A sibling consumer to
    CdcPipeline over the same feed."""

    def __init__(
        self,
        spark: SparkSession,
        event_log_dir: str,
        out_path: str,
        checkpoint_dir: str,
        source_table: str = "documents",
        doc_schema: T.StructType = DOC_SCHEMA,
        watermark: str = "1 hour",
        min_tokens: int = DEFAULT_MIN_TOKENS,
        min_quality: float = DEFAULT_MIN_QUALITY,
        max_files_per_trigger: Optional[int] = None,
        benchmark: Optional[DataFrame] = None,
        coverage_model: Optional[list] = None,
        min_coverage_e6: int = 0,
    ) -> None:
        self.spark = spark
        self.event_log_dir = event_log_dir
        self.out_path = out_path
        self.checkpoint_dir = checkpoint_dir
        self.source_table = source_table
        self.doc_schema = doc_schema
        self.watermark = watermark
        self.min_tokens = min_tokens
        self.min_quality = min_quality
        self.max_files_per_trigger = max_files_per_trigger
        self.coverage_model = coverage_model
        self.min_coverage_e6 = min_coverage_e6
        # static decontamination probe: fingerprint the eval set ONCE
        # at pipeline build (batch side), not per micro-batch
        self._benchmark_fps: Optional[DataFrame] = None
        if benchmark is not None:
            from sync_spark.operators.dedup import winnow_fingerprint_rows

            self._benchmark_fps = winnow_fingerprint_rows(
                benchmark, "text", "doc_id"
            )

    def _stream(self, insert_only: bool = False) -> DataFrame:
        env = read_event_stream(self.spark, self.event_log_dir, self.max_files_per_trigger)
        # inline projection (not changes_for_table, which drops ts —
        # and re-attaching it via a second branch of the same stream
        # would be an illegal stream-stream self-join in append mode):
        # one map-side select keeps the event time for the watermark
        after = F.from_json("after_json", self.doc_schema)
        # non-insert_only keeps NULL-op rows (malformed events): a bare
        # `op != 'delete'` is NULL for them and would silently drop the
        # exact class cdc.changes_for_table's no-silent-drop contract
        # covers. Kept, they parse to all-NULL docs and die at the
        # quality gate like any other unusable doc — the same
        # deterministic path, not a hidden op-filter vanish (r8
        # ADVICE). insert_only is an explicit opt-in to inserts only.
        op_filter = (
            (F.col("op") == "insert")
            if insert_only
            else ((F.col("op") != "delete") | F.col("op").isNull())
        )
        docs = env.filter(
            (F.col("source_table") == self.source_table) & op_filter
        ).select(
            *[after[f.name].alias(f.name) for f in self.doc_schema.fields],
            F.col("seq"),
            F.col("ts"),
        )
        return curate_stream(
            docs,
            ts_col="ts",
            watermark=self.watermark,
            min_tokens=self.min_tokens,
            min_quality=self.min_quality,
            benchmark_fps=self._benchmark_fps,
            coverage_model=self.coverage_model,
            min_coverage_e6=self.min_coverage_e6,
        )

    def start(self, trigger_once: bool = True):
        # lm_coverage_e6 is always in the sink schema (null when no
        # coverage model) so out_path stays schema-stable across
        # differently-configured runs
        curated = self._stream().select(*self._SINK_COLS)
        writer = (
            curated.writeStream.format("parquet")
            .option("path", self.out_path)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="2 seconds")
        return writer.start()

    def run_available(self) -> None:
        q = self.start(trigger_once=True)
        q.awaitTermination()

    _SINK_COLS = [
        "doc_id", "text", "lang", "n_tokens", "quality", "fp", "seq",
        "lm_coverage_e6",
    ]

    def start_with_index(
        self,
        fp_index_path: Optional[str] = None,
        bm25_index_path: Optional[str] = None,
        trigger_once: bool = True,
    ):
        """foreachBatch sink variant: the crawl stream KEEPS THE
        PERSISTED INDEXES FRESH — per micro-batch, (a) the curated
        rows land in a batch-id-keyed corpus directory and (b) the
        fingerprint / BM25 indexes extend with exactly the accepted
        docs (O(batch) touched-bucket rewrites).

        Crash-replay safety end to end, with no transaction log: a
        batch that replays after a crash (i) OVERWRITES its own
        ``batch=<id>`` directory — the standard exactly-once
        foreachBatch idiom — and (ii) re-extends the indexes, which is
        a no-op because extend_fp_index / extend_bm25_index are
        idempotent distinct-merges by contract. Read the corpus with
        ``spark.read.parquet(out_path)`` (the batch column is layout,
        not data).

        INSERT-ONLY by design: the extend contract requires slice ids
        to be new or byte-identical re-sends, so this sink consumes
        only ``op == 'insert'`` events — the append-only crawl feed
        shape the LLM pipeline actually produces. A mutating CDC feed
        (updates/deletes) must run the batch update cycle instead
        (remove_from_*_index(old) + extend(new)); wiring deletes here
        is impossible anyway — a delete event carries no content, and
        the content is what locates the touched buckets.

        The target indexes must exist (build_*_index first — an empty
        build writes a readable schema-bearing layout, so 'start
        empty, fill from the stream' is the natural bootstrap). The
        ``out_path`` must be fresh or batch-keyed: a corpus previously
        written by ``start()`` (flat part files) cannot gain batch
        dirs — Spark rejects the mixed layout at read time — so this
        guards against reusing a flat corpus dir.

        ``out_path`` and ``checkpoint_dir`` are a UNIT: batch ids come
        from the checkpoint, so pointing a FRESH checkpoint at an
        existing batch-keyed corpus restarts ids at 0 and overwrites
        ``batch=0`` with different rows (and the indexes keep the old
        rows — extends are idempotent only for identical content).
        Resume with the original checkpoint, or start both fresh."""
        from sync_spark.operators.incremental import extend_fp_index
        from sync_spark.operators.retrieval import extend_bm25_index

        out_path = self.out_path
        if os.path.isdir(out_path) and any(
            not (e.startswith("batch=") or e.startswith(".") or e.startswith("_"))
            for e in os.listdir(out_path)
        ):
            raise ValueError(
                f"out_path {out_path!r} holds a flat (non batch-keyed) corpus "
                "— start_with_index writes batch=<id> directories and Spark "
                "cannot read the mixed layout; use a fresh out_path"
            )

        def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df = batch_df.select(*self._SINK_COLS).persist()
            try:
                batch_df.write.mode("overwrite").parquet(
                    f"{out_path}/batch={batch_id}"
                )
                if fp_index_path is not None:
                    extend_fp_index(batch_df, fp_index_path)
                if bm25_index_path is not None:
                    extend_bm25_index(batch_df, bm25_index_path)
            finally:
                batch_df.unpersist()

        writer = (
            self._stream(insert_only=True)
            .select(*self._SINK_COLS)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="2 seconds")
        return writer.start()

    def run_available_with_index(
        self,
        fp_index_path: Optional[str] = None,
        bm25_index_path: Optional[str] = None,
    ) -> None:
        q = self.start_with_index(fp_index_path, bm25_index_path)
        q.awaitTermination()
