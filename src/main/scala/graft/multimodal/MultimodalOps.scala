package graft.multimodal

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Multimodal-column plumbing (builder brief): media is carried as an opaque
  * `binary` payload column plus a typed metadata struct; decode /
  * feature-extract runs as a typed mapPartitions stage (the Scala analogue
  * of a batched Pandas-UDF pipeline: one iterator per partition, no
  * per-row closure dispatch).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container — see [[StubDecoder]]); the Spark-side plumbing — binary
  * schema, partition-wise batching, feature schema — is real and verified:
  * the stub features are deterministic byte statistics the DuckDB oracle
  * recomputes from the source text.
  */
object MultimodalOps {

  /** Decoded-media feature record produced per payload. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, feat_raw: Double, n_frames: Long)

  /** Placeholder for a real media decoder (libjpeg/ffmpeg/... not present).
    * Deterministic fake: "decodes" the payload into per-byte samples and
    * derives features from the first 8 bytes. A real deployment swaps ONLY
    * this object; the pipeline around it is unchanged.
    */
  object StubDecoder {
    val FrameBytes = 64

    def decode(payload: Array[Byte]): MediaFeatures0 = {
      // real impl would be e.g. ImageIO.read(new ByteArrayInputStream(payload))
      val head = payload.take(8).map(b => (b & 0xff).toDouble)
      MediaFeatures0(
        nBytes = payload.length.toLong,
        featRaw = if (head.isEmpty) 0.0 else head.sum / head.length,
        nFrames = (payload.length + FrameBytes - 1) / FrameBytes)
    }
  }
  final case class MediaFeatures0(nBytes: Long, featRaw: Double, nFrames: Long)

  /** m1: binary payload -> partition-batched stub decode -> feature table.
    * Scale shape: pure map stage (no shuffle); payload bytes never leave
    * the executor; output is a narrow feature row per media item.
    */
  val m1 = Q(
    "m1_multimodal_features",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  round(list_sum(list_transform(generate_series(1, 8), i -> ascii(substring(text, i, 1))::DOUBLE)) / 8, 2) AS feat,
      |  ((octet_length(encode(text)) + 63) // 64) AS n_frames
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    val payloads = Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      it.map { case (id, payload) =>
        val f = StubDecoder.decode(payload)
        MediaFeatures(id, f.nBytes, f.featRaw, f.nFrames)
      }
    }.toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(col("feat_raw"), 2).as("feat"), col("n_frames"))
  }

  /** m2: frame sampling — the video-ish access pattern: explode each
    * payload into fixed 64-byte frames, keep every 4th frame, emit a
    * per-frame stub feature (first-byte code). Generator over binary +
    * per-frame map stage; at scale this is how frame-level features fan out
    * of media blobs without the blob ever leaving the executor.
    */
  val m2 = Q(
    "m2_frame_sample",
    """SELECT doc_id, frame_no,
      |  ascii(substring(text, frame_no * 64 + 1, 1)) AS frame_head
      |FROM documents,
      |  (SELECT unnest(generate_series(0, 20)) AS frame_no) f
      |WHERE frame_no * 64 < octet_length(encode(text)) AND frame_no % 4 = 0""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .select(col("doc_id"), col("payload"), explode(expr("sequence(0, 20)")).as("frame_no"))
      .filter(col("frame_no") * StubDecoder.FrameBytes < length(col("payload")) &&
        col("frame_no") % 4 === 0)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        expr(s"CAST(ascii(substring(CAST(payload AS STRING), frame_no * ${StubDecoder.FrameBytes} + 1, 1)) AS BIGINT)")
          .as("frame_head"))
  }

  /** m3: modality census — content-type sniffing by leading magic bytes
    * (the pre-decode triage every mixed media lake runs: route each blob by
    * its container signature before any expensive decode). The classifier
    * here is the stub analogue of magic-byte dispatch — first payload byte
    * mod 3 → image/audio/video — with real accounting around it: per
    * modality, item count, total payload bytes, and total decoded frames
    * (StubDecoder's frame arithmetic).
    *
    * Scale shape: the payload reduces to (first byte, length) at the scan —
    * a pure map stage; only a 3-key partial+final agg shuffles. Identical
    * plan when blobs are GB-scale video: sniffing never reads past the
    * magic bytes.
    */
  val m3 = Q(
    "m3_modality_census",
    """SELECT CASE ascii(substring(text, 1, 1)) % 3
      |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |  count(*) AS n_items,
      |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
      |  sum((octet_length(encode(text)) + 63) // 64)::BIGINT AS total_frames
      |FROM documents
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(encode(col("text"), "utf-8").as("payload"))
      .select(
        expr("CASE CAST(ascii(substring(CAST(payload AS STRING), 1, 1)) AS BIGINT) % 3 " +
          "WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("modality"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(expr(s"(n_bytes + ${StubDecoder.FrameBytes - 1}) DIV ${StubDecoder.FrameBytes}"))
          .as("total_frames"))
  }

  val all: Seq[Q] = Seq(m1, m2, m3)
}
