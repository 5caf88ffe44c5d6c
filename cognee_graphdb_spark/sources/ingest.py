"""Ingest path (S1-S3) + incremental-load semantics (ST2).

Reference:
- ``cognee.add``: save item -> loader -> classify -> content-hash identify ->
  dedup by (content_hash, owner) (tasks/ingestion/ingest_data.py:24-193; id at
  :93-96; dedup invariant tests/test_deduplication.py:13-106).
- Loader dispatch by extension/MIME (infrastructure/loaders/LoaderEngine.py:25-96)
  with text/pdf/audio/image loaders; audio->transcript and image->description
  are LLM loaders (core/audio_loader.py:18, core/image_loader.py:15).
- Incremental: a dataset whose pipeline run is STARTED/COMPLETED is skipped,
  and already-ingested content hashes are not reprocessed
  (check_pipeline_run_qualification.py:17-59).

Spark-first: ingestion is a DataFrame pipeline — the content hash, the
classification, and the dedup are all expressions; the only Python is inside
binary loaders (Arrow-batched), and those are STUBBED deterministically here
because the decode libraries are not in this container (the Spark-side
plumbing — schema, dispatch, batching — is real).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.ids import content_id

# S3 — extension -> Document subtype (classify_documents.py)
EXTENSION_TYPES: dict[str, str] = {
    "txt": "TextDocument",
    "md": "TextDocument",
    "csv": "TextDocument",
    "pdf": "PdfDocument",
    "mp3": "AudioDocument",
    "wav": "AudioDocument",
    "png": "ImageDocument",
    "gif": "ImageDocument",
    "jpg": "ImageDocument",
    "jpeg": "ImageDocument",
    "mp4": "VideoDocument",
    # the reference's optional unstructured_loader surface
    # (loaders/external/unstructured_loader.py:19-45), decoded for real by
    # sources/office.py (ZIP+XML / html.parser / email — pure stdlib)
    "docx": "OfficeDocument",
    "xlsx": "OfficeDocument",
    "pptx": "OfficeDocument",
    "odt": "OfficeDocument",
    "html": "HtmlDocument",
    "htm": "HtmlDocument",
    "eml": "EmailDocument",
}


def classify_documents(df: DataFrame, name_col: str = "name") -> DataFrame:
    """S3 — map file name -> Document subtype via a when/otherwise chain."""
    ext = F.lower(F.element_at(F.split(F.col(name_col), "\\."), -1))
    expr = F.lit("TextDocument")
    for e, t in sorted(EXTENSION_TYPES.items(), reverse=True):
        expr = F.when(ext == e, F.lit(t)).otherwise(expr)
    return df.withColumn("document_type", expr)


def loader_for(document_type: str) -> str:
    """S2 — loader dispatch (LoaderEngine.py:25-96).  Text loads natively;
    binary formats route to (stubbed) decode loaders."""
    return {
        "TextDocument": "text_loader",
        "PdfDocument": "pdf_loader",
        "AudioDocument": "audio_loader",
        "ImageDocument": "image_loader",
        "VideoDocument": "video_loader",
        "OfficeDocument": "office_loader",
        "HtmlDocument": "html_loader",
        "EmailDocument": "email_loader",
    }.get(document_type, "text_loader")


def decode_row(loader: str, content: bytes | None, gateway=None) -> str:
    """Per-row binary decode, dispatched by loader name.

    - ``pdf_loader``: REAL deterministic text extraction
      (:mod:`cognee_graphdb_spark.sources.pdf` — pypdf when importable,
      else a pure-Python parser; reference pypdf_loader.py:19-97).
    - ``audio_loader`` / ``image_loader``: the BINARY half decodes for REAL
      when the blob is a stdlib-parseable format (WAV via sources/media.py
      RIFF parse; BMP/PPM/PNG/GIF/JPEG pixel rows; MP3 via the
      sources/container.py frame-header walk) — the envelope carries genuine
      channels/rate/duration/RMS or dimensions/mean-RGB.  The
      transcript/description half is [LLM] in the reference
      (core/audio_loader.py:18, core/image_loader.py:15) and stays behind
      the gateway.
    - ``video_loader``: MP4 box-tree metadata parses for REAL
      (sources/container.py) — dimensions/duration/codec in the envelope;
      frame DECODE needs ffmpeg and stays a content-addressed stand-in.

    ``gateway`` enables the reference's [LLM] media path: audio/image blobs
    still decode for REAL, but the feature envelope routes through
    ``gateway.create_transcript`` / ``gateway.transcribe_image`` so the
    stored text is the transcript/description the reference's loaders
    produce (audio_loader.py:18, image_loader.py:15).  Formats the engine
    can't decode (mp3 PCM, mp4 frames) keep the non-LLM metadata envelope —
    an honest boundary, not a silent fallthrough.
    """
    data = bytes(content) if content is not None else b""
    # Decode failures fall through to the non-LLM metadata envelope (an
    # undecodable blob is not an error); gateway TRANSPORT failures propagate
    # — a 5xx that exhausts retries must not silently turn the stored corpus
    # nondeterministic by swapping transcript text for the envelope.
    if gateway is not None and loader == "audio_loader" and data[:4] == b"RIFF":
        features = None
        try:
            from cognee_graphdb_spark.sources import media as m

            info = m.parse_wav(data)
            features = {
                "channels": info.channels,
                "sample_rate": info.sample_rate,
                "duration_ms": info.duration_ms,
                "rms": m.wav_rms(data),
            }
        except Exception:
            pass
        if features is not None:
            return gateway.create_transcript(features)
    if gateway is not None and loader == "audio_loader" and data[:4] != b"RIFF":
        # compressed audio (MP3): no from-spec PCM decode here, but the
        # reference sends the file to transcription WITHOUT local decode
        # (core/audio_loader.py:18) — feed the gateway the frame-walk
        # container features (sources/container.py) as the envelope
        features = None
        try:
            from cognee_graphdb_spark.sources.container import parse_mp3

            info = parse_mp3(data)
            features = {
                "channels": info.channels,
                "sample_rate": info.sample_rate,
                "duration_ms": info.duration_ms,
                "frames": info.frames,
                "bitrate_kbps": info.bitrate_kbps,
            }
        except Exception:
            pass
        if features is not None:
            return gateway.create_transcript(features)
    if gateway is not None and loader == "video_loader":
        features = None
        try:
            from cognee_graphdb_spark.sources.container import parse_mp4

            info = parse_mp4(data)
            features = {
                "width": info.width,
                "height": info.height,
                "duration_ms": info.duration_ms,
                "codecs": list(info.codecs),
            }
        except Exception:
            pass
        if features is not None:
            return gateway.create_transcript(features)
    if gateway is not None and loader == "image_loader":
        features = None
        try:
            import numpy as np

            from cognee_graphdb_spark.sources import media as m

            if m.is_image_magic(data):
                px = m.decode_image_np(data)
                h, w = px.shape[0], px.shape[1]
                sums = px.astype(np.int64).sum(axis=(0, 1))  # integer-exact
                mean = tuple(int(s) // (h * w) for s in sums)
                features = {"width": w, "height": h, "mean_rgb": mean}
        except Exception:
            pass
        if features is not None:
            return gateway.transcribe_image(features)
    if loader == "pdf_loader":
        from cognee_graphdb_spark.sources.pdf import extract_pdf_text

        return extract_pdf_text(data or None)
    if loader == "office_loader" and data[:4] == b"PK\x03\x04":
        try:
            from cognee_graphdb_spark.sources.office import office_text

            return office_text(data)
        except Exception:
            pass  # malformed container: content-addressed stand-in below
    if loader == "html_loader":
        try:
            from cognee_graphdb_spark.sources.office import html_text

            return html_text(data)
        except Exception:
            pass
    if loader == "email_loader":
        try:
            from cognee_graphdb_spark.sources.office import eml_text

            return eml_text(data)
        except Exception:
            pass
    if loader == "audio_loader" and data[:4] == b"RIFF":
        try:
            from cognee_graphdb_spark.sources import media as m

            info = m.parse_wav(data)
            rms = m.wav_rms(data)
            return (
                f"[audio {info.channels}ch {info.sample_rate}Hz "
                f"{info.duration_ms}ms rms={rms:.4f}]"
            )
        except Exception:
            pass
    if loader == "audio_loader":
        try:
            from cognee_graphdb_spark.sources.container import parse_mp3

            info = parse_mp3(data)
            return (
                f"[audio {info.channels}ch {info.sample_rate}Hz "
                f"{info.duration_ms}ms {info.bitrate_kbps}kbps mp3]"
            )
        except Exception:
            pass
    if loader == "video_loader":
        try:
            from cognee_graphdb_spark.sources.container import parse_mp4

            info = parse_mp4(data)
            codec = info.codecs[0] if info.codecs else "?"
            return f"[video {info.width}x{info.height} {info.duration_ms}ms {codec}]"
        except Exception:
            pass
    if loader == "image_loader":
        try:
            import numpy as np

            from cognee_graphdb_spark.sources import media as m

            if not m.is_image_magic(data):
                raise ValueError("not a stdlib-decodable image")
            px = m.decode_image_np(data)
            h, w = px.shape[0], px.shape[1]
            sums = px.astype(np.int64).sum(axis=(0, 1))  # integer-exact
            mean = tuple(int(s) // (h * w) for s in sums)
            return f"[image {w}x{h} mean_rgb={mean}]"
        except Exception:
            pass
    import hashlib

    digest = hashlib.md5(data).hexdigest()
    return f"[{loader}:{digest[:12]}]"


def _decode_map(df: DataFrame, gateway=None) -> DataFrame:
    """(id, document_type, content) -> (id, text): ONE Arrow-batched
    mapInPandas pass dispatching per row — every binary type decodes in the
    same stage, so N document types cost one plan, not a union of N.
    ``gateway`` (picklable) switches audio/image rows to the [LLM]
    transcript/description path (see :func:`decode_row`)."""
    import pandas as pd
    from pyspark.sql import types as T

    from cognee_graphdb_spark.session import ship_package

    ship_package(df.sparkSession)
    out_schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("text", T.StringType())]
    )

    def _decode(batches):
        for pdf in batches:
            rows = [
                (i, decode_row(loader_for(dtype), content, gateway=gateway))
                for i, dtype, content in zip(pdf["id"], pdf["document_type"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=["id", "text"])

    return df.select("id", "document_type", "content").mapInPandas(_decode, out_schema)


def load_binary_as_text(df: DataFrame, document_type: str, gateway=None) -> DataFrame:
    """S2 loader dispatch for one document type (LoaderEngine.py:25-96):
    text loads natively (codegen cast, no Python); binary types decode via
    :func:`decode_row` inside an Arrow-batched stage."""
    if loader_for(document_type) == "text_loader":
        return df.withColumn("text", F.col("content").cast("string"))
    return _decode_map(df.withColumn("document_type", F.lit(document_type)), gateway=gateway)


def decode_documents(df: DataFrame, gateway=None) -> DataFrame:
    """Public mixed-type decode: (id, document_type, content) rows of ANY
    document types through the per-row loader dispatch in one Arrow stage.
    With ``gateway`` set this is the reference's media ingestion shape —
    audio becomes its transcript, images their description, stored as text
    for downstream chunk/embed (audio_loader.py / image_loader.py both write
    ``text_<hash>.txt`` via the LLM)."""
    return _decode_map(df, gateway=gateway)


def ingest_texts(
    spark: SparkSession,
    items: list[tuple[str, str]],
    dataset_id: str = "main_dataset",
    owner_id: str = "default_user",
) -> DataFrame:
    """S1 — the ``cognee.add`` equivalent for in-memory text items
    (name, text).  Returns the ``data`` table rows: deterministic id =
    md5(content_hash + owner), deduped by (content_hash, owner) so re-adding
    identical content is a no-op (ingest_data.py:93-96)."""
    df = spark.createDataFrame(items, ["name", "text"])
    return ingest_dataframe(df, dataset_id=dataset_id, owner_id=owner_id)


def ingest_dataframe(
    df: DataFrame,
    text_col: str = "text",
    name_col: str = "name",
    dataset_id: str = "main_dataset",
    owner_id: str = "default_user",
) -> DataFrame:
    """S1 core: classify + hash-identify + first-wins dedup by content hash."""
    out = classify_documents(df, name_col)
    out = out.select(
        F.col(name_col).alias("name"),
        F.col(text_col).alias("text"),
        "document_type",
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    out = out.withColumn("id", content_id(F.col("content_hash"), F.lit(owner_id))).withColumn(
        "dataset_id", F.lit(dataset_id)
    )
    # first-wins per (content_hash, owner): identical content -> one Data row
    return out.dropDuplicates(["id"]).select("id", "name", "text", "document_type", "content_hash", "dataset_id")


def ingest_files(spark: SparkSession, path_glob: str, dataset_id: str = "main_dataset", owner_id: str = "default_user") -> DataFrame:
    """S1/S2 over real files: binaryFile source -> classify by extension ->
    loader dispatch -> hash-identify."""
    raw = spark.read.format("binaryFile").load(path_glob).select(
        F.col("path").alias("name"), F.col("content")
    )
    raw = classify_documents(raw, "name").withColumn("id", F.md5(F.col("content")))
    # two branches, one plan: text documents decode as a codegen cast; every
    # binary type goes through ONE shared Arrow dispatch stage (no per-type
    # driver loop, no N-way union)
    is_text = F.col("document_type") == "TextDocument"
    text_part = raw.filter(is_text).select(
        "id", "name", F.col("content").cast("string").alias("text"), "document_type"
    )
    binary = raw.filter(~is_text)
    binary_part = (
        binary.select("id", "name", "document_type")
        .join(_decode_map(binary), "id")
        .select("id", "name", "text", "document_type")
    )
    out = text_part.unionByName(binary_part)
    out = out.withColumn("content_hash", F.md5("text")).withColumn(
        "id", content_id(F.col("content_hash"), F.lit(owner_id))
    )
    return out.withColumn("dataset_id", F.lit(dataset_id)).dropDuplicates(["id"])


# ---------------------------------------------------------------------------
# ST2 — incremental loading
# ---------------------------------------------------------------------------


DELETED_MARKER = "__dataset_deleted__"


class PipelineRuns:
    """Run-state bookkeeping (check_pipeline_run_qualification.py:17-59):
    a dataset whose latest run is STARTED/COMPLETED is skipped; data rows whose
    content hash was already processed are filtered with an anti-join."""

    def __init__(self, spark: SparkSession, root: str):
        from cognee_graphdb_spark.sources.fs import Fs

        self.spark = spark
        self.fs = Fs(spark, root)  # scheme-generic (S8): file://, s3a://, ...
        self.path = os.path.join(root, "pipeline_runs")
        self.processed_path = os.path.join(root, "processed_hashes")

    def status(self, dataset_id: str, pipeline_name: str) -> str | None:
        # two concurrent writers can race to the same seq: statuses() breaks
        # ties deterministically (wall_ns, run_id) — one shared ordering rule
        return self.statuses([dataset_id], (pipeline_name,)).get(dataset_id)

    def statuses(
        self,
        dataset_ids: list[str] | None = None,
        pipeline_names: tuple[str, ...] = ("cognify", "cognify_temporal"),
    ) -> dict[str, str]:
        """Latest run status per dataset in ONE pass (api/v1/datasets
        get_status -> get_pipeline_status): a ranking window over the run
        log, optionally restricted to ``dataset_ids``.  Both cognify
        pipelines count by default — a temporal build IS a processed
        dataset.  This is the ONE home of the latest-run ordering rule
        (seq desc, wall_ns/run_id tie-break); ``status()`` delegates."""
        from pyspark.sql.window import Window

        if not self.fs.exists(self.path):
            return {}
        log = self.spark.read.parquet(self.path)
        if dataset_ids is not None:
            log = log.filter(F.col("dataset_id").isin(dataset_ids))
        # dataset deletion is an APPEND-ONLY tombstone row (pipeline_name
        # DELETED_MARKER), so concurrent run appends are never lost to a
        # rewrite; the latest row ACROSS runs+tombstones decides visibility —
        # a dataset re-created after deletion logs newer runs and reappears
        df = log.filter(
            F.col("pipeline_name").isin(list(pipeline_names) + [DELETED_MARKER])
        )
        order = [F.col("seq").desc()]
        if "wall_ns" in df.columns:
            order += [F.col("wall_ns").desc(), F.col("run_id").desc()]
        w = Window.partitionBy("dataset_id").orderBy(*order)
        latest = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        return {
            r["dataset_id"]: r["status"]
            for r in latest.select("dataset_id", "status", "pipeline_name").collect()
            if r["pipeline_name"] != DELETED_MARKER
        }

    def forget_dataset(self, dataset_id: str) -> None:
        """Hide a deleted dataset from ``statuses()`` (delete_dataset removes
        the dataset record in the reference).  Implemented as an APPEND-ONLY
        tombstone row, NOT a log rewrite: a rewrite's snapshot-swap would
        silently drop run rows another engine instance appends concurrently,
        and the run log is the one table every cognify appends to.  A later
        run for a re-created dataset outranks the tombstone and the dataset
        reappears."""
        if not self.fs.exists(self.path):
            return
        self.log(dataset_id, DELETED_MARKER, "DELETED")

    def log(self, dataset_id: str, pipeline_name: str, status: str) -> None:
        import time
        import uuid

        seq = 0
        if self.fs.exists(self.path):
            seq = self.spark.read.parquet(self.path).agg(F.max("seq")).first()[0] + 1
        self.spark.createDataFrame(
            [(dataset_id, pipeline_name, status, seq, time.time_ns(), uuid.uuid4().hex)],
            "dataset_id string, pipeline_name string, status string, seq long, wall_ns long, run_id string",
        ).write.mode("append").parquet(self.path)

    def mark_processed(self, data: DataFrame) -> None:
        """Record content as cognified.  Marks are PER DATASET when the rows
        carry dataset_id: graphs are per-dataset (the reference runs one
        graph DB per dataset, search.py:322), so dataset B adding content
        dataset A already cognified must still build B's own graph rows — a
        store-global mark would silently skip it forever."""
        cols = ["content_hash"] + (["dataset_id"] if "dataset_id" in data.columns else [])
        data.select(*cols).distinct().write.mode("append").parquet(self.processed_path)

    def _processed(self) -> DataFrame:
        # mergeSchema: legacy hash-only rows and scoped rows may coexist
        return self.spark.read.option("mergeSchema", "true").parquet(self.processed_path)

    def unmark_processed(
        self,
        hashes: "list[str] | DataFrame",
        dataset_id: str | None = None,
        keep_legacy_for: DataFrame | None = None,
    ) -> None:
        """Forget content hashes (document/dataset delete): re-adding the
        same content afterwards re-processes instead of hitting the ST2 skip.
        ``hashes`` may be a DataFrame with a content_hash column (dataset
        deletes pass the whole set without collecting it to the driver);
        ``dataset_id`` scopes the forget to that dataset's marks.
        ``keep_legacy_for`` (content hashes other datasets still reference)
        protects LEGACY hash-only marks for shared content: a legacy row has
        no dataset tag, so scoped forgetting may only drop it when no other
        dataset still relies on it — the pre-scoping guard, preserved for
        stores whose marks predate dataset tagging.

        The processed-hash set is O(corpus), so this never touches the driver:
        a distributed join against the delete set is written to a fresh
        snapshot directory first, then swapped in — the same
        write-new-then-swap discipline as ``GraphStore._swap_write``."""
        if not self.fs.exists(self.processed_path):
            return
        if isinstance(hashes, DataFrame):
            to_drop = hashes.select("content_hash").distinct()
            if to_drop.isEmpty():
                # nothing to forget: skip the O(corpus) table rewrite + swap
                return
        else:
            if not hashes:
                return
            # dedup: the scoped path LEFT-joins this set, and duplicate keys
            # would multiply the kept rows
            to_drop = self.spark.createDataFrame(
                [(h,) for h in sorted(set(hashes))], "content_hash string"
            )
        import uuid

        seen = self._processed()
        if dataset_id is not None and "dataset_id" in seen.columns:
            # scoped forget: other datasets' marks for the same content stay.
            # Legacy hash-only rows (null dataset) blocked EVERY dataset, so
            # they go too — unless keep_legacy_for says another dataset still
            # references the content.  One or two left joins, fully
            # distributed.
            marked = seen.join(to_drop.withColumn("__drop", F.lit(1)), "content_hash", "left")
            legacy_doomed = F.col("dataset_id").isNull()
            if keep_legacy_for is not None:
                protect = keep_legacy_for.select("content_hash").distinct().withColumn(
                    "__keep", F.lit(1)
                )
                marked = marked.join(protect, "content_hash", "left")
                legacy_doomed = legacy_doomed & F.col("__keep").isNull()
            doomed = F.col("__drop").isNotNull() & (
                legacy_doomed | (F.col("dataset_id") == dataset_id)
            )
            kept = marked.filter(~doomed).drop("__drop", "__keep")
        else:
            # fully legacy table (no dataset column at all): every mark is
            # global, so the cross-reference guard applies to the whole drop
            # set — content another dataset still holds stays marked
            if keep_legacy_for is not None:
                to_drop = to_drop.join(
                    keep_legacy_for.select("content_hash").distinct(), "content_hash", "left_anti"
                )
            kept = seen.join(to_drop, "content_hash", "left_anti")
        tmp = f"{self.processed_path}.swap-{uuid.uuid4().hex[:8]}"
        kept.write.mode("overwrite").parquet(tmp)
        # validate the replacement BEFORE touching the live directory: a crash
        # mid-swap must never lose the store-global processed set.  A 0-row
        # write emits only _SUCCESS (no parquet part files) — that genuine
        # empty case becomes "no directory" (absent IS the empty set).  Any
        # OTHER unreadable state (transient FS error, partial write) must
        # leave the live directory untouched, not silently discard the
        # store-global processed set and force full reprocessing.
        has_parts = any(f.startswith("part-") for f in self.fs.listdir(tmp))
        if not has_parts:
            self.fs.delete(tmp)
            self.fs.delete(self.processed_path)
            return
        try:
            self.spark.read.parquet(tmp)
        except Exception:
            self.fs.delete(tmp)
            raise
        # two-rename swap: the live dir is renamed aside (instant), the
        # validated replacement renamed in, then the old copy reaped — the
        # loss window is two renames, not a Spark write.  Each rename's
        # result is CHECKED: proceeding after a failed aside-rename would
        # make the second rename move tmp INSIDE the still-present live
        # directory (Hadoop rename-into-dir semantics), corrupting the set.
        old = f"{self.processed_path}.old-{uuid.uuid4().hex[:8]}"
        if not self.fs.rename(self.processed_path, old):
            self.fs.delete(tmp)
            raise IOError(f"could not move {self.processed_path} aside")
        if not self.fs.rename(tmp, self.processed_path):
            # restore the live directory before failing
            self.fs.rename(old, self.processed_path)
            self.fs.delete(tmp)
            raise IOError(f"could not install {tmp} as {self.processed_path}")
        self.fs.delete(old)

    def unprocessed(self, data: DataFrame) -> DataFrame:
        """Anti-join new data against the processed-hash set — incremental
        cognify reprocesses only new content.  Marks scope per dataset when
        both sides carry dataset_id (a mark from another dataset does NOT
        skip this one's build); legacy hash-only marks stay global."""
        if not self.fs.exists(self.processed_path):
            return data
        seen = self._processed()
        if "dataset_id" in seen.columns and "dataset_id" in data.columns:
            scoped = seen.filter(F.col("dataset_id").isNotNull()).select("content_hash", "dataset_id")
            legacy = seen.filter(F.col("dataset_id").isNull()).select("content_hash")
            out = data.join(scoped, ["content_hash", "dataset_id"], "left_anti")
            return out.join(legacy, "content_hash", "left_anti")
        return data.join(seen.select("content_hash"), "content_hash", "left_anti")

    def should_run(self, dataset_id: str, pipeline_name: str, incremental: bool = True) -> bool:
        if not incremental:
            return True
        return self.status(dataset_id, pipeline_name) not in ("STARTED", "COMPLETED")
