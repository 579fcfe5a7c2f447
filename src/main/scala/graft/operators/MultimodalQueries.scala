package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (BASELINE.json north star).
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * pattern a 100 TB training-data pipeline uses: the bytes travel through
  * Spark untouched (no decode on the shuffle path), metadata lives in a
  * struct column for pruning/filtering, and decode/feature-extraction is
  * a per-partition boundary op. `mm_decode_partitionwise` runs a REAL
  * codec (javax.imageio PNG encode → decode, round 15); the remaining
  * byte-plane keys use `decodeStub` — a clearly-marked deterministic
  * fake for formats whose libs aren't in this environment — with the
  * plumbing (binary schema, metadata struct, partition-wise extraction,
  * filter pushdown on metadata) real and oracle-checked via byte-level
  * functions DuckDB shares.
  */
object MultimodalQueries {

  /** documents.text re-encoded as a binary payload + metadata struct —
    * the canonical "media table" shape: (id, bytes, meta).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          col("n_chars").cast("long").as("n_bytes"),
          col("lang").as("format"),
          col("source").as("origin")).as("meta"))

  /** STUB decoder — stands in for image/audio decode (libs unavailable
    * here). Deterministic fake: "decodes" a payload to (n_bytes,
    * first_byte, byte_sum) so the pipeline shape (binary in → features
    * out, computed partition-wise, no driver collect) is fully exercised.
    */
  def decodeStub(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      octet_length(payload).as("n_bytes"),
      getbit(payload, lit(0)).as("first_bit"),
      crc32(payload).as("checksum"))

  val queries: Map[String, Q] = Map(
    // binary payload round-trip: encode → octet_length/metadata checks
    "mm_binary_meta" -> ((s, dir) => {
      mediaTable(s, dir)
        .select(
          col("media_id"),
          octet_length(col("payload")).as("payload_bytes"),
          col("meta.n_bytes").as("meta_bytes"),
          (octet_length(col("payload")).cast("long") === col("meta.n_bytes")).as("meta_consistent"),
          col("meta.format").as("format"))
        .orderBy(col("media_id"))
    }),

    // metadata-pruned scan: filter on the struct BEFORE touching payload
    // (at scale: row-group pruning on the small meta column, payload
    // bytes never read for filtered-out rows)
    "mm_meta_filter" -> ((s, dir) => {
      mediaTable(s, dir)
        .filter(col("meta.format").isin("en", "fr") && col("meta.n_bytes") > 100)
        .groupBy(col("meta.format").as("format"))
        .agg(count(lit(1)).as("n"), sum(col("meta.n_bytes")).as("total_bytes"))
        .orderBy(col("format"))
    }),

    // partition-wise feature extraction over binary payloads (stub
    // decode): substring of bytes + per-payload byte checks — the shape
    // of frame-sample / feature-extract
    "mm_feature_extract" -> ((s, dir) => {
      mediaTable(s, dir)
        .select(
          col("media_id"),
          octet_length(col("payload")).as("n_bytes"),
          decode(substr(col("payload"), lit(1), lit(10)), "UTF-8").as("head_text"),
          ascii(decode(substr(col("payload"), lit(1), lit(1)), "UTF-8")).as("first_byte"))
        .orderBy(col("media_id"))
    }),

    "mm_decode_partitionwise" -> ((s, dir) => decodePartitionwise(s, dir)),

    // frame sampling over a binary media payload: the video pipeline's
    // "every k-th frame" extraction expressed on the byte plane — fixed
    // 16-byte "frames", keep every 4th, per-frame features via dynamic
    // byte-offset substr. The explode(sequence(...)) is the scale shape:
    // frame rows are generated partition-locally (no shuffle, no driver
    // loop), payload bytes are sliced once per KEPT frame only
    "mm_frame_sample" -> ((s, dir) => {
      val frame = 16
      mediaTable(s, dir)
        .select(col("media_id"), col("payload"), octet_length(col("payload")).as("nb"))
        .withColumn("n_frames", ceil(col("nb") / lit(frame.toDouble)).cast("int"))
        .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("media_id"), col("frame_idx"), col("n_frames"),
          decode(substr(col("payload"), col("frame_idx") * frame + 1, lit(frame)), "UTF-8")
            .as("frame_text"),
          ascii(decode(substr(col("payload"), col("frame_idx") * frame + 1, lit(1)), "UTF-8"))
            .as("frame_first_byte"))
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  /** Typed per-partition decode record: decoded geometry + exact per-
    * channel pixel means of the REAL decoded image.
    */
  case class ImgFeatures(media_id: Long, w: Int, h: Int, decode_ok: Boolean,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Partition-wise REAL image decode (round-15 upgrade from the byte
    * stub): each media row synthesizes a deterministic RGB image
    * (w = 8 + id%8, h = 8 + (id/8)%8, channel(x,y) = linear-congruential
    * pattern mod 256), encodes it to REAL PNG bytes with
    * javax.imageio.ImageIO (the payload a production table would carry),
    * then a second mapPartitions stage DECODES those bytes back through
    * ImageIO.read and extracts features — geometry + exact per-channel
    * means. The invariant is end-to-end: PNG is lossless, so the decoded
    * means must equal the closed-form expectation the DuckDB oracle
    * computes from the pattern alone; any decode failure or pixel
    * corruption breaks the hash compare. Both stages are typed
    * mapPartitions (the batched-decode-UDF shape): bytes never cross to
    * the driver, partitions decode independently, and at 100 TB the
    * payload column would be the parquet binary column this synthesizes.
    */
  private val decodePartitionwise: Q = (s, dir) => {
    import s.implicits._
    def chanR(x: Int, y: Int, id: Long) = ((x * 7 + y * 13 + id) % 256).toInt
    def chanG(x: Int, y: Int, id: Long) = ((x * 3 + y * 5 + 2 * id) % 256).toInt
    def chanB(x: Int, y: Int, id: Long) = ((x + y + 3 * id) % 256).toInt
    val encoded = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 + (id % 8).toInt
        val h = 8 + ((id / 8) % 8).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (chanR(x, y, id) << 16) | (chanG(x, y, id) << 8) | chanB(x, y, id))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      })
      .toDF("media_id", "payload")
    encoded
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) ImgFeatures(id, -1, -1, decode_ok = false, -1, -1, -1)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          def r6(v: Double) =
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          ImgFeatures(id, w, h, decode_ok = true, r6(sr / n), r6(sg / n), r6(sb / n))
        }
      })
      .toDF()
      .orderBy(col("media_id"))
  }

  val oracle: Map[String, String] = Map(
    // the decoded per-channel means must equal the closed-form
    // expectation of the synthesis pattern — PNG is lossless, so any
    // ImageIO decode defect breaks the hash compare
    "mm_decode_partitionwise" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    CAST(8 + doc_id % 8 AS INT) AS w,
        |    CAST(8 + (doc_id // 8) % 8 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id, w, h, xs.x, ys.y
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, w)) AS x) xs,
        |    LATERAL (SELECT unnest(range(0, h)) AS y) ys)
        |SELECT media_id, w, h, TRUE AS decode_ok,
        |  round(avg((x * 7 + y * 13 + media_id) % 256), 6) AS mean_r,
        |  round(avg((x * 3 + y * 5 + 2 * media_id) % 256), 6) AS mean_g,
        |  round(avg((x + y + 3 * media_id) % 256), 6) AS mean_b
        |FROM px GROUP BY media_id, w, h ORDER BY media_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS payload_bytes,
        |  CAST(n_chars AS BIGINT) AS meta_bytes,
        |  octet_length(encode(text)) = n_chars AS meta_consistent,
        |  lang AS format
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_meta_filter" ->
      """SELECT lang AS format, count(*) AS n, CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_bytes
        |FROM documents
        |WHERE lang IN ('en', 'fr') AND n_chars > 100
        |GROUP BY lang ORDER BY format""".stripMargin,

    "mm_feature_extract" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  substring(text, 1, 10) AS head_text,
        |  ascii(substring(text, 1, 1)) AS first_byte
        |FROM documents ORDER BY media_id""".stripMargin,

    // corpus is ASCII (FIXTURES.md), so byte offsets == char offsets and
    // the oracle frames the text directly
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(ceil(octet_length(encode(text)) / 16.0) AS INT) AS n_frames
        |  FROM documents),
        |fr AS (
        |  SELECT media_id, text, n_frames,
        |    CAST(unnest(range(0, n_frames)) AS INT) AS frame_idx
        |  FROM m)
        |SELECT media_id, frame_idx, n_frames,
        |  substring(text, frame_idx * 16 + 1, 16) AS frame_text,
        |  ascii(substring(text, frame_idx * 16 + 1, 1)) AS frame_first_byte
        |FROM fr WHERE frame_idx % 4 = 0
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
