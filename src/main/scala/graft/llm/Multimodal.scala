package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads with typed metadata,
  * and a batched decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so `decodeFeatures` STUBS the
  * actual decode with a deterministic byte-level extractor — but the
  * Spark-side plumbing is real and is what matters at 100 TB: binary column +
  * metadata struct schema, batched per-partition processing (the Scala
  * analogue of `mapInPandas` batches), and a narrow, shuffle-free plan. A
  * real deployment swaps `stubDecode` for a codec call; nothing else changes.
  */
object Multimodal {

  /** Attach an opaque binary payload (here: utf-8 bytes standing in for
    * image bytes) and typed metadata derived without decoding. */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "utf-8"))
      .withColumn("meta", struct(
        octet_length(col(textCol)).as("n_bytes"),
        substring(md5(col(textCol)), 1, 8).as("content_id"),
        (lit(64) + pmod(octet_length(col(textCol)), lit(512))).as("width"),
        (lit(64) + pmod(octet_length(col(textCol)) * 7, lit(512))).as("height")))

  /** STUB decode: deterministic byte statistics standing in for a codec.
    * Marked clearly; a real build replaces only this function. */
  private def stubDecode(bytes: Array[Byte]): (Double, Int, Array[Long]) = {
    var sum = 0L
    var mx = 0
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      if (v > mx) mx = v
      hist(v >> 6) += 1
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    (mean, mx, hist)
  }

  /** Frame sampling over a "video" payload: treat the binary as fixed-size
    * frames, keep every `everyN`-th, one output row per sampled frame —
    * the distributed explode pattern real frame extraction uses (slicing is
    * pure SQL; per-frame decode goes through the same batched stub). A
    * short trailing frame is kept, like a real container's last frame. */
  def frameSample(withPayloads: DataFrame, frameBytes: Int = 256, everyN: Int = 2,
                  payloadCol: String = "payload"): DataFrame = {
    val nFrames = ceil(octet_length(col(payloadCol)).cast("double") / frameBytes)
      .cast("int")
    val frames = withPayloads
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .where(pmod(col("frame_idx"), lit(everyN)) === 0)
      .withColumn("frame",
        substring(col(payloadCol), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
    decodeFeatures(frames.drop(payloadCol), "frame")
  }

  /** STUB resize: deterministic fake that truncates/pads the payload to the
    * target pixel budget and rewrites the metadata struct — the schema and
    * per-row shape of a real resize; only this function changes with a real
    * codec. */
  def resizeStub(withPayloads: DataFrame, w: Int, h: Int,
                 payloadCol: String = "payload"): DataFrame = {
    val target = w * h / 64
    withPayloads
      .withColumn(payloadCol,
        rpad(substring(col(payloadCol), 1, target), target, Array[Byte](0)))
      .withColumn("meta", struct(
        lit(target).as("n_bytes"),
        col("meta.content_id").as("content_id"),
        lit(w).as("width"), lit(h).as("height")))
  }

  /** Batched per-partition "decode" over the binary payload — the real
    * plumbing (schema, batching, partition-parallel, no shuffle) with the
    * codec stubbed. */
  def decodeFeatures(withPayloads: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(withPayloads.schema.fields ++ Seq(
      StructField("mean_byte", DoubleType),
      StructField("max_byte", IntegerType),
      StructField("byte_hist", ArrayType(LongType))))
    val idx = withPayloads.schema.fieldIndex(payloadCol)
    withPayloads.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (mean, mx, hist) = stubDecode(bytes)
        Row.fromSeq(row.toSeq ++ Seq(mean, mx, hist.toSeq))
      }
    }(Encoders.row(schema))
  }
}
