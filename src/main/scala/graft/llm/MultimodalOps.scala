package graft.llm

import org.apache.spark.sql.functions._
import graft.QFn
import graft.tables.Tables

/** SURVEY.md §2.10 [north-star] — multimodal columns: image/audio/video
  * payloads are opaque `binary` columns with typed metadata alongside.
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything around it — binary
  * column creation, schema, partition-parallel mapPartitions plumbing,
  * typed output — is real and oracle-checked.
  */
object MultimodalOps {

  /** Typed metadata a real decoder would emit per media object. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, fake_width: Int, fake_frames: Int)

  /** Array/binary columns survive relational ops untouched: embeddings
    * (array<float>) joined to documents, filtered, projected — the arrays
    * are carried through and only inspected at the end. */
  val llmMultimodalCols: QFn = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "embeddings")
    val d = Tables(spark, sfDir, "documents")
    e.filter(col("label").isin(1, 2, 3))
      .join(d, e("vec_id") === d("doc_id"))
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        col("lang"))
      .orderBy("vec_id")
  }

  /** Binary decode pipeline: text → UTF-8 bytes stand in for an image
    * payload; mapPartitions carries whole partitions of (id, bytes) through
    * a per-element "decoder". The decode itself is a STUB (deterministic
    * fake derived from the byte length — no codec libs in this container);
    * the Spark-side plumbing (binary column, typed Dataset, partition-wise
    * map, schema of the result) is the real thing a production decoder
    * would plug into. */
  val llmMultimodalDecode: QFn = (spark, sfDir) => {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB decode: a real implementation would parse image headers /
          // sample video frames here. Deterministic fake keeps the oracle.
          MediaMeta(id, bytes.length, bytes.length % 640 + 1, bytes.length / 100 + 1)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling over a binary "video" payload: fixed-size byte windows
    * stand in for frames; every k-th window is sampled and a per-frame
    * feature (here: a byte checksum — a real pipeline would run a vision
    * encoder) is emitted as an array column. The Spark-side shape — binary
    * in, `array<struct>`-like typed columns out, one row per kept frame via
    * posexplode — is exactly what a production frame sampler produces. */
  val llmMultimodalFramesample: QFn = (spark, sfDir) => {
    val frameChars = 64
    val stride = 4 // keep every 4th frame
    // Frames are CODEPOINT windows end to end (n_frames from the decoded
    // string, windows by substr, checksum = codepoint sum): mixing byte
    // counts with character indexing would diverge on multibyte text. The
    // binary column still flows through the pipeline as the payload a real
    // decoder would consume.
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      // Hoist the decoded string to a per-row column: Catalyst does not CSE
      // inside HOF lambdas, so referencing decode(media) in the per-element
      // lambda below would re-decode the payload once per sampled byte
      // (~64× per frame, measured ~8× slower than this shape).
      .withColumn("s", decode(col("media"), "UTF-8"))
      // One O(len) pass builds the codepoint array; per-frame checksums then
      // slice it in O(frameChars). The substr-per-position spelling is
      // O(len) PER position (UTF-8 codepoint seek from the string start) —
      // quadratic per document, measured ~1.5× slower warm and 3× cold.
      .withColumn("cs", expr("transform(split(s, ''), c -> coalesce(ascii(c), 0))"))
      .withColumn("n_frames",
        ceil(length(col("s")).cast("double") / frameChars).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          s"transform(sequence(0, (n_frames - 1) div $stride), " +
            s"k -> aggregate(slice(cs, k * $stride * $frameChars + 1, $frameChars), " +
            "0, (acc, b) -> acc + b))"))
          .as(Seq("frame_idx", "frame_checksum")))
      .select(col("doc_id"), col("n_frames"),
        (col("frame_idx") * stride).as("frame_no"), col("frame_checksum"))
      .orderBy("doc_id", "frame_no")
  }

  /** Resize stub: downsample the payload by keeping every 2nd codepoint
    * (a real implementation would bilinear-resample pixel rows — no image
    * libs in this container). Emits the resized length plus a checksum of
    * the kept codepoints, so the downsample is observable and testable.
    * Codepoint-indexed end to end, like framesample. */
  val llmMultimodalResize: QFn = (spark, sfDir) => {
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .withColumn("s", decode(col("media"), "UTF-8"))
      // same linear shape as framesample: codepoint array once, then an
      // index-filtered sum instead of an O(len) substr seek per position
      .withColumn("cs", expr("transform(split(s, ''), c -> coalesce(ascii(c), 0))"))
      .select(col("doc_id"),
        length(col("s")).as("orig_len"),
        expr("cast((length(s) + 1) div 2 as int)").as("resized_len"),
        expr("aggregate(filter(cs, (c, i) -> i % 2 = 0), 0, " +
          "(acc, b) -> acc + b)").as("resized_checksum"))
      .orderBy("doc_id")
  }

  /** Exact asset dedup by content digest — the first pass every
    * multimodal training pipeline runs (identical bytes = the same
    * image/audio object re-crawled under a different id; training on
    * duplicates over-weights them). Keyed on sha2-256 of the binary
    * payload: one hash shuffle whose keys are 32-byte digests, never the
    * payloads themselves — at 100 TB the exchange carries digests while
    * the multi-MB blobs stay columnar in the scan (project-then-shuffle,
    * the only viable order for binary columns). The oracle replays the
    * grouping on the payload bytes directly (digest grouping ≡ byte
    * grouping under collision-freeness, the same argument as every
    * hash-keyed dedup here). */
  val llmMultimodalDedup: QFn = (spark, sfDir) =>
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .groupBy(sha2(col("media"), 256).as("digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        min(length(col("media"))).cast("long").as("n_bytes"))
      .select("keep_doc_id", "n_copies", "n_bytes")
      .orderBy("keep_doc_id")

  val queries: Map[String, QFn] = Map(
    "llm_multimodal_cols" -> llmMultimodalCols,
    "llm_multimodal_dedup" -> llmMultimodalDedup,
    "llm_multimodal_decode" -> llmMultimodalDecode,
    "llm_multimodal_framesample" -> llmMultimodalFramesample,
    "llm_multimodal_resize" -> llmMultimodalResize,
  )

  val oracleSql: Map[String, String] = Map(
    "llm_multimodal_dedup" ->
      ("SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies, " +
        "CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes " +
        "FROM documents GROUP BY encode(text) ORDER BY 1"),
    "llm_multimodal_cols" ->
      ("SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim, " +
        "ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1, lang " +
        "FROM embeddings JOIN documents ON vec_id = doc_id " +
        "WHERE label IN (1, 2, 3) ORDER BY vec_id"),
    "llm_multimodal_decode" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width, " +
        "CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS fake_frames " +
        "FROM documents ORDER BY doc_id"),
    // Codepoint-window arithmetic replayed exactly: DuckDB ascii('') = 0 and
    // -1 // 4 = 0 (truncation) both match Spark, verified empirically.
    "llm_multimodal_framesample" ->
      ("WITH g AS (SELECT doc_id, text AS s, CAST(ceil(length(text) / 64.0) AS INT) AS n_frames FROM documents) " +
        "SELECT doc_id, n_frames, CAST(k * 4 AS INT) AS frame_no, " +
        "CAST(coalesce(list_sum(list_transform(range(1, 65), " +
        "i -> coalesce(ascii(substr(s, CAST(k * 4 * 64 + i AS BIGINT), 1)), 0))), 0) AS INT) AS frame_checksum " +
        "FROM g, unnest(range(0, (n_frames - 1) // 4 + 1)) AS t(k) " +
        "ORDER BY doc_id, frame_no"),
    "llm_multimodal_resize" ->
      ("SELECT doc_id, CAST(length(text) AS INT) AS orig_len, " +
        "CAST((length(text) + 1) // 2 AS INT) AS resized_len, " +
        "CAST(coalesce(list_sum(list_transform(range(1, (length(text) + 1) // 2 + 1), " +
        "i -> coalesce(ascii(substr(text, CAST(2 * i - 1 AS BIGINT), 1)), 0))), 0) AS INT) AS resized_checksum " +
        "FROM documents ORDER BY doc_id"),
  )
}
