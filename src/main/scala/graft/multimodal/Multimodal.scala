package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Q, Tables}

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY payloads with typed metadata, processed with the same
  * partition-parallel DataFrame plumbing as every other operator.
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  * environment): `mediaTable` fabricates deterministic payloads — a REAL
  * magic header (PNG/JPEG/RIFF) followed by the document's UTF-8 bytes as a
  * stand-in body — and `frameFeatures` derives a deterministic fake feature
  * vector from frame hashes. Everything around the stub is real and tested:
  * binary schema, format sniffing from magic bytes, content fingerprinting,
  * fixed-size frame chunking, and the feature-vector batch shape a
  * downstream embedding model would consume.
  */
object Multimodal {

  /** Real magic headers (public file-format signatures). */
  final case class Magic(format: String, bytes: Seq[Int], hexPrefix: String)
  val magics: Seq[Magic] = Seq(
    Magic("png", Seq(0x89, 0x50, 0x4E, 0x47), "89504E47"),
    Magic("jpeg", Seq(0xFF, 0xD8, 0xFF, 0xE0), "FFD8FFE0"),
    Magic("wav", Seq(0x52, 0x49, 0x46, 0x46), "52494646"),
  )

  /** Stand-in media table over documents (STUB body, see object doc):
    * (media_id, payload BINARY, declared_format). Repartitioned like every
    * compute-bound derivation (binary work scales with payload bytes, not
    * row count).
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val body = encode(col("text"), "UTF-8")
    val payload = magics.zipWithIndex.foldLeft(lit(null).cast(BinaryType)) {
      case (acc, (m, i)) =>
        when(pmod(col("doc_id"), lit(magics.size)) === i,
          concat(lit(m.bytes.map(_.toByte).toArray), body)).otherwise(acc)
    }
    val declared = magics.zipWithIndex.foldLeft(lit(null).cast(StringType)) {
      case (acc, (m, i)) =>
        when(pmod(col("doc_id"), lit(magics.size)) === i, m.format).otherwise(acc)
    }
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id").as("media_id"), payload.as("payload"), declared.as("declared_format"))
  }

  /** Format sniff from the payload's leading magic bytes — the real
    * operator a landing zone runs before routing to a decoder.
    */
  def sniffFormat(payload: Column): Column =
    magics.foldLeft(when(payload.isNull, "unknown")) { (acc, m) =>
      acc.when(substring(hex(payload), 1, m.hexPrefix.length) === m.hexPrefix, m.format)
    }.otherwise("unknown")

  /** Content fingerprint: md5 over the hex rendering (hex, not raw bytes, so
    * the DuckDB oracle — whose md5 takes VARCHAR only — computes the
    * identical digest).
    */
  def fingerprint(payload: Column): Column =
    md5(encode(hex(payload), "UTF-8"))

  /** Fixed-size frame chunking (video frame-sampling / audio windowing
    * shape): one row per (media_id, frame_idx, frame BINARY). explode_outer
    * + ordinal filter for the InferFiltersFromGenerate reason documented at
    * Dedup.hashedPosting.
    */
  def frames(media: DataFrame, frameSize: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameSize.toDouble)).cast(IntegerType)
    media
      .select(col("media_id"),
        posexplode_outer(transform(sequence(lit(0), nFrames - 1), i =>
          col("payload").substr(i * frameSize + 1, lit(frameSize))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx").isNotNull)
  }

  /** STUB feature extraction: a real pipeline would decode the frame and run
    * a vision/audio encoder here; this derives a deterministic fake
    * `dim`-dimensional vector in [0,1] from the frame's md5 fingerprint (one
    * byte of the digest per dimension), keeping the batch shape (one dense
    * vector per frame) and everything downstream (ANN, dedup over
    * embeddings) exercisable. md5-over-hex rather than xxhash64 so the
    * DuckDB oracle reproduces the exact vector (integer byte / 255.0 is the
    * same IEEE division on both engines).
    */
  def frameFeatures(framed: DataFrame, dim: Int = 8): DataFrame = {
    require(dim <= 16, "stub packs at most the md5 digest's 16 bytes")
    val fp = fingerprint(col("frame"))
    framed.withColumn("feature",
      array((0 until dim).map { i =>
        conv(substring(fp, 2 * i + 1, 2), 16, 10).cast(DoubleType) / 255.0
      }: _*))
  }

  // ---------------------------------------------------------------- queries

  private def payloadSql(m: Magic): String = {
    val esc = m.bytes.map(b => f"\\x$b%02X").mkString
    s"('$esc'::BLOB || text::BLOB)"
  }

  private val payloadCase =
    magics.zipWithIndex.map { case (m, i) =>
      s"WHEN doc_id % ${magics.size} = $i THEN ${payloadSql(m)}"
    }.mkString("CASE ", " ", " END")

  /** Oracle-checked: sniffed format, byte length, and fingerprint all match
    * a DuckDB re-construction of the same payloads.
    */
  val q_mm_metadata: Q = Q(
    "q_mm_metadata",
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id, $payloadCase AS payload FROM documents)
      SELECT media_id,
             ${magics.map(m => s"WHEN hex(payload)[1:${m.hexPrefix.length}] = '${m.hexPrefix}' THEN '${m.format}'").mkString("CASE ", " ", " ELSE 'unknown' END")} AS format,
             octet_length(payload) AS n_bytes,
             md5(hex(payload)) AS fingerprint
      FROM m
      ORDER BY media_id
    """),
  ) { (s, d) =>
    mediaTable(Tables.documents(s, d))
      .select(
        col("media_id"),
        sniffFormat(col("payload")).as("format"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        fingerprint(col("payload")).as("fingerprint"),
      )
      .orderBy("media_id")
  }

  /** Oracle-checked frame accounting: the chunker's row count and byte
    * totals against DuckDB arithmetic, plus the first frame's digest via
    * the hex-slice rendering (identical string on both engines).
    */
  val q_mm_frames: Q = Q(
    "q_mm_frames",
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id, $payloadCase AS payload FROM documents)
      SELECT media_id,
             CAST(ceil(octet_length(payload) / 16.0) AS BIGINT) AS n_frames,
             octet_length(payload) AS sum_frame_bytes,
             md5(hex(payload)[1:32]) AS first_frame_md5
      FROM m
      ORDER BY media_id
    """),
  ) { (s, d) =>
    frames(mediaTable(Tables.documents(s, d)), frameSize = 16)
      .groupBy("media_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).as("sum_frame_bytes"),
        max(when(col("frame_idx") === 0, fingerprint(col("frame")))).as("first_frame_md5"),
      )
      .orderBy("media_id")
  }

  /** Oracle-checked feature extraction: the dump flattens the vector to one
    * scalar row per (media_id, frame_idx, dim) — array cells would break the
    * driver's pandas comparator — and DuckDB rebuilds the identical values
    * from the frame fingerprint's hex pairs (strpos-based hex parse; its
    * md5 is VARCHAR-only and it has no hex→int cast).
    */
  val q_mm_features: Q = Q(
    "q_mm_features",
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id, $payloadCase AS payload FROM documents),
      h AS (SELECT media_id, hex(payload) AS hx FROM m),
      -- unnest(range(n)) rather than generate_series: the table function
      -- cannot take lateral column parameters in this DuckDB build
      u AS (
        SELECT media_id, hx,
               CAST(unnest(range(CAST(ceil(length(hx) / 128.0) AS BIGINT))) AS INT) AS frame_idx
        FROM h
      ),
      f AS (
        SELECT media_id, frame_idx,
               md5(substring(hx, frame_idx * 128 + 1, 128)) AS fp
        FROM u
      )
      SELECT media_id, frame_idx, CAST(dg.d AS INT) AS dim,
             ((strpos('0123456789abcdef', substring(fp, CAST(dg.d AS INT) * 2 + 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substring(fp, CAST(dg.d AS INT) * 2 + 2, 1)) - 1)) / 255.0 AS value
      FROM f, generate_series(0, 7) AS dg(d)
      ORDER BY media_id, frame_idx, dim
    """),
  ) { (s, d) =>
    frameFeatures(frames(mediaTable(Tables.documents(s, d)), frameSize = 64))
      .select(col("media_id"), col("frame_idx"),
        posexplode(col("feature")).as(Seq("dim", "value")))
      .orderBy("media_id", "frame_idx", "dim")
  }

  /** STUB resize: byte-stride downsampling (every 4th payload byte) via the
    * native [[graft.functions.ByteStride]] kernel — a real resize would
    * decode, scale, re-encode; the stride keeps the deterministic
    * binary-in/binary-out shape. Oracle-checked: DuckDB rebuilds the strided
    * bytes from the hex rendering (it cannot slice blobs) and both engines
    * fingerprint the result identically.
    */
  val q_mm_resize: Q = Q(
    "q_mm_resize",
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id, $payloadCase AS payload FROM documents),
      h AS (SELECT media_id, octet_length(payload) AS n_bytes, hex(payload) AS hx FROM m)
      SELECT media_id,
             n_bytes,
             CAST(ceil(n_bytes / 4.0) AS BIGINT) AS n_bytes_resized,
             md5(list_aggregate(
               list_transform(range(CAST(ceil(n_bytes / 4.0) AS BIGINT)),
                 i -> substring(hx, CAST(i AS INT) * 8 + 1, 2)),
               'string_agg', '')) AS resized_fingerprint
      FROM h
      ORDER BY media_id
    """),
  ) { (s, d) =>
    graft.functions.BinaryFunctions.ensureRegistered(s)
    val resized = graft.functions.BinaryFunctions.byteStride(col("payload"), 4)
    mediaTable(Tables.documents(s, d))
      .select(
        col("media_id"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        length(resized).cast(LongType).as("n_bytes_resized"),
        fingerprint(resized).as("resized_fingerprint"),
      )
      .orderBy("media_id")
  }

  def all: Seq[Q] = Seq(q_mm_metadata, q_mm_frames, q_mm_features, q_mm_resize)
}
