package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction plumbing.
  *
  * The real pipeline shape at 100 TB: media bytes live in parquet binary
  * columns (or object-store pointers), partitioned so one task holds a
  * batch of blobs; decode + feature extraction run per-partition (the
  * Scala analog of `mapInPandas`: `mapPartitions` over an iterator, so
  * codec state is reused across a batch and memory stays bounded).
  *
  * The codec itself is STUBBED (no image/audio libs in this container):
  * `decodeStub` produces deterministic fake features from the bytes.
  * Everything around it — schema, batching, partitioning, lazy iterator —
  * is real and tested.
  */
object Multimodal {

  /** Media metadata schema carried alongside the blob. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Synthesize binary payloads + metadata from `documents` (testdata has
    * no real media; payload = utf-8 bytes of the text, metadata derived
    * deterministically from doc_id). */
  def withBinaryPayload(docs: DataFrame): DataFrame = {
    val mt = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video")
    docs
      .withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("media_type", mt)
      .withColumn("metadata", struct(
        mt.as("media_type"),
        when(mt === "image", (col("doc_id") % 1024 + 64).cast("int"))
          .otherwise(lit(null).cast("int")).as("width"),
        when(mt === "image", (col("doc_id") % 768 + 48).cast("int"))
          .otherwise(lit(null).cast("int")).as("height"),
        when(mt === "audio", lit(16000)).otherwise(lit(null).cast("int"))
          .as("sample_rate"),
        when(mt === "video", (col("doc_id") % 300 + 1).cast("int"))
          .otherwise(lit(null).cast("int")).as("n_frames")))
  }

  /** Output schema of the feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** Per-partition decode + feature extraction over (id, media_type, blob)
    * batches. The decode is a deterministic STUB: a real deployment swaps
    * `decodeStub` for an actual codec call; the Spark-side contract
    * (iterator-in/iterator-out, one codec init per partition) is the part
    * that matters for scale. */
  def extractFeatures(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    val input = withMedia.select(col("doc_id"), col("media_type"),
      col("media"))
    val rdd = input.rdd.mapPartitions { it =>
      // real impl: initialize codec once per partition here
      it.map { r =>
        val id = r.getLong(0)
        val mt = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        Row(id, mt, bytes.length, decodeStub(bytes))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sampling plan for video rows: the uniform frame-index set a
    * decoder should extract — `min(n_frames, maxFrames)` indices at
    * `floor(i·n/k)`, covering the clip evenly and degenerating to
    * all-frames for short clips. This IS the engine's half of frame
    * sampling (deciding WHAT to decode is plan work; the pixel fetch is
    * the codec stub's). Pure per-row expression, no shuffle; the index
    * arithmetic is exact in doubles (i·n ≤ maxFrames·n_frames ≪ 2⁵³). */
  def frameSamplePlan(withMedia: DataFrame, maxFrames: Int = 8): DataFrame = {
    val n = col("metadata.n_frames")
    val k = least(n, lit(maxFrames))
    val idx = transform(sequence(lit(0), k - 1),
      i => floor(i * n / k).cast("int"))
    withMedia.filter(col("media_type") === "video")
      .select(col("doc_id"), n.as("n_frames"), idx.as("frame_indices"))
  }

  /** Resize plan for image rows: aspect-preserving fit into a
    * `target`×`target` box — `scale = min(t/w, t/h)`, output dims
    * `max(1, round(dim·scale))`. The geometry (what every resize kernel
    * needs as input) is engine-side expression work; the resample itself
    * belongs to the codec stub. */
  def resizePlan(withMedia: DataFrame, target: Int = 224): DataFrame = {
    val w = col("metadata.width").cast("double")
    val h = col("metadata.height").cast("double")
    val scale = least(lit(target.toDouble) / w, lit(target.toDouble) / h)
    withMedia.filter(col("media_type") === "image")
      .select(col("doc_id"),
        col("metadata.width").as("width"),
        col("metadata.height").as("height"),
        round(scale, 6).as("scale"),
        greatest(lit(1L), round(w * scale, 0).cast("long")).as("out_w"),
        greatest(lit(1L), round(h * scale, 0).cast("long")).as("out_h"))
  }

  /** Sliding-window chunk plan for audio rows: interpret the payload
    * as 16-bit mono samples (n_samples = bytes/2), emit windows of
    * `window` samples at stride `stride` — the ASR/training chunking
    * shape (overlap = window − stride keeps context across cuts).
    * Plan-only work like frame sampling: WHICH sample ranges to decode
    * is engine-side integer arithmetic (one explode per row, rows ∝
    * ⌈n/stride⌉); the PCM fetch belongs to the codec stub. The filter
    * on n_samples ≥ 1 is load-bearing: Spark's `sequence(0, -1)`
    * DESCENDS, so an empty payload would emit phantom chunks. */
  def audioChunkPlan(withMedia: DataFrame, window: Int = 64,
      stride: Int = 48): DataFrame =
    withMedia.filter(col("media_type") === "audio")
      .withColumn("byte_len", length(col("media")).cast("bigint"))
      .withColumn("n_samples", expr("byte_len div 2"))
      .filter(col("n_samples") >= 1)
      .withColumn("n_chunks",
        expr(s"(n_samples + ${stride - 1}) div $stride"))
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("n_samples"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_sample"),
        least(col("chunk_idx") * stride + window, col("n_samples"))
          .as("end_sample"))

  /** STUB for the media codec: 4 deterministic moments of the byte
    * stream standing in for decoded-content features. */
  private def decodeStub(bytes: Array[Byte]): Seq[Double] = {
    var sum = 0L; var min = 255; var max = 0
    bytes.foreach { b =>
      val u = b & 0xff
      sum += u; if (u < min) min = u; if (u > max) max = u
    }
    val n = math.max(bytes.length, 1)
    Seq(bytes.length.toDouble, sum.toDouble / n, min.toDouble, max.toDouble)
  }

  // ------------------------------------------------- perceptual dedup

  /** 64-cell "luminance" grid — the deterministic stand-in for
    * decode + downscale-to-8×8 (a real deployment replaces this with
    * the codec + resampler; everything downstream is codec-agnostic).
    * Cell i averages the unsigned bytes of the i-th of 64 equal spans,
    * so a LOCAL edit to the payload perturbs only the cells it
    * touches — the property perceptual hashing needs and a
    * cryptographic hash destroys. */
  private def gridStub(bytes: Array[Byte], cells: Int = 64)
      : Array[Double] = {
    val len = bytes.length
    if (len == 0) Array.fill(cells)(0.0)
    else Array.tabulate(cells) { i =>
      val s = math.min((i.toLong * len / cells).toInt, len - 1)
      val e = math.max(((i + 1).toLong * len / cells).toInt, s + 1)
      var sum = 0L
      var j = s
      while (j < e) { sum += bytes(j) & 0xff; j += 1 }
      sum.toDouble / (e - s)
    }
  }

  /** Average-hash (aHash) per media row: bit i set iff grid cell i is
    * above the grid mean — the classic 64-bit perceptual signature.
    * Runs in the same per-partition decode boundary as
    * [[extractFeatures]] (one codec init per partition at scale). */
  def perceptualHashes(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    val rdd = withMedia.select(col("doc_id"), col("media"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val g = gridStub(r.getAs[Array[Byte]](1))
          val mean = g.sum / g.length
          var h = 0L
          var i = 0
          while (i < g.length) {
            if (g(i) > mean) h |= (1L << i)
            i += 1
          }
          Row(id, h)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("simhash", LongType))))
  }

  /** Perceptual near-dup pairs (mm6): aHash signatures blocked by
    * d4's pigeonhole scheme (Hamming ≤ maxDist ⇒ some exact chunk
    * collides) — the image-dedup pipeline every multimodal corpus
    * runs, with the decode behind the documented stub and every stage
    * after it real: bucket-join candidate generation, exact popcount
    * verify, no all-pairs anywhere. */
  def mediaNearDupPairs(withMedia: DataFrame, maxDist: Int = 6)
      : DataFrame =
    graft.dedup.Dedup.simhashNearPairs(perceptualHashes(withMedia),
      maxDist = maxDist)

  /** ENGINE-PORTABLE perceptual hash (mm6p) — the d17/d4p recipe
    * applied to the LAST algorithmic no_oracle row: everything mm6
    * computes after the decode (aHash bit math over a locality-
    * preserving cell grid, pigeonhole blocking, exact popcount verify)
    * replayed bit-for-bit in DuckDB. The one swapped piece is the
    * decode stub itself: instead of per-byte span averages (an RDD
    * loop no SQL engine replays), cell i is the md5₄₈-prefix of the
    * i-th of `cells` equal CHARACTER spans of the payload text, mod
    * 256 — still local (an edit perturbs only the spans it touches,
    * the property aHash needs), still deterministic, and computable
    * identically from both engines' substr/md5. Bits are the exact
    * integer compare cell·cells > Σcells (≡ cell > mean, no division);
    * signatures stay in non-negative 48-bit BIGINT space. */
  def portablePerceptualHashes(docs: DataFrame, cells: Int = 48)
      : DataFrame = {
    require(cells >= 1 && cells <= 48,
      s"signature carries at most 48 bits; got $cells")
    val grid = docs
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"), col("len"),
        explode(sequence(lit(0), lit(cells - 1))).as("i"))
      // span i = chars [(i·len) div cells, ((i+1)·len) div cells) —
      // 1-based substring in both engines; empty spans hash md5("")
      .withColumn("s", expr(s"(i * len) div $cells"))
      .withColumn("e", expr(s"((i + 1) * len) div $cells"))
      .withColumn("cell", expr(
        "CAST(conv(substring(md5(substring(text, CAST(s + 1 AS INT), " +
          "CAST(e - s AS INT))), 1, 12), 16, 10) AS BIGINT) % 256"))
    // window aggregate, not groupBy+self-join: the join form evaluates
    // the explode+md5 grid TWICE (once per plan subtree); the window
    // computes the 48 span hashes once per document
    val perDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    grid.withColumn("tot", sum(col("cell")).over(perDoc))
      .groupBy(col("doc_id"))
      .agg(sum(expr(
        s"CASE WHEN cell * $cells > tot " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }

  /** DuckDB twin of [[portablePerceptualHashes]] +
    * [[graft.dedup.Dedup.simhashNearPairs]] over `docsRel`
    * (doc_id, text): identical spans, cells, bit rule, pigeonhole
    * chunks and popcount filter. */
  def portablePerceptualPairsSql(docsRel: String, maxDist: Int = 6,
      cells: Int = 48): String = {
    val chunks = maxDist + 1
    val width = cells / chunks
    s"""WITH docs AS (SELECT doc_id, text, length(text) AS len
       |  FROM $docsRel),
       |grid AS (SELECT doc_id,
       |    CAST(('0x' || substr(md5(substr(text,
       |        CAST((i * len) // $cells + 1 AS INT),
       |        CAST(((i + 1) * len) // $cells
       |          - (i * len) // $cells AS INT))), 1, 12)) AS BIGINT)
       |      % 256 AS cell, i
       |  FROM docs, (SELECT CAST(x AS BIGINT) AS i
       |    FROM generate_series(0, ${cells - 1}) t(x)) ii),
       |tot AS (SELECT doc_id, sum(cell) AS tot FROM grid GROUP BY 1),
       |sig AS (SELECT g.doc_id,
       |    CAST(sum(CASE WHEN g.cell * $cells > t.tot
       |      THEN (CAST(1 AS BIGINT) << CAST(g.i AS INT))
       |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM grid g JOIN tot t ON g.doc_id = t.doc_id GROUP BY 1),
       |ch AS (SELECT doc_id, simhash, cs.ci,
       |    (simhash >> (cs.ci * $width)) & ${(1L << width) - 1} AS cv
       |  FROM sig, (SELECT CAST(x AS INT) AS ci
       |    FROM generate_series(0, ${chunks - 1}) t(x)) cs),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.cv = b.cv
       |    AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sa, sb)) <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin.replace('\n', ' ')
  }

  /** Exact media dedup by CONTENT digest (mm7): sha-256 over the raw
    * bytes — the first pass of every media-dedup stack (CSAM/copyright
    * filters, LAION-style corpus dedup) and the only multimodal
    * operator with a full DuckDB twin (a cryptographic digest of the
    * bytes needs no decode, so nothing is stubbed). Metadata is
    * deliberately IGNORED: re-encoded uploads carry fresh width/height
    * rows but identical payload bytes, and byte-identity is what the
    * digest certifies. Per duplicate set: copy count, min-id
    * canonical, distinct metadata variants. Scale: one scan to
    * (digest → aggregates); the digest is 32 bytes per doc — the
    * shuffle carries digests, never media bytes. */
  def exactMediaDedup(withMedia: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{count, countDistinct, lit,
      min, sha2}
    withMedia
      .withColumn("digest", sha2(col("media"), 256))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("canonical_id"),
        countDistinct(col("metadata.width")).as("n_meta_variants"))
      .filter(col("n_copies") > 1)
  }
}
