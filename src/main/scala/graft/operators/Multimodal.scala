package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A media record: opaque binary payload + typed metadata — the
  * multimodal column pattern (image/audio/video as `binary` with a
  * sidecar metadata struct). Payloads here are deterministic fakes
  * (utf-8 of the document text) because no codec libraries exist in
  * this environment; the Spark-side plumbing — schema, typed Dataset,
  * partition-batched decode — is real.
  */
case class MediaRec(doc_id: Long, fmt: String, width: Int, height: Int,
    payload: Array[Byte])

/** Features extracted by the (stubbed) decoder. */
case class MediaFeat(doc_id: Long, fmt: String, width: Int, height: Int,
    payload_len: Int, brightness_milli: Long)

/** One sampled "frame" of a media payload. */
case class FrameFeat(doc_id: Long, frame_no: Int, frame_len: Int,
    mean_milli: Long)

/** A resized media record (stub decimation, real plumbing). */
case class ResizedMedia(doc_id: Long, new_w: Int, new_h: Int,
    new_len: Int, resized: Array[Byte])

/** Multimodal-column processing: binary payloads with typed metadata,
  * decoded per partition in batches — the Scala analog of a
  * `mapInPandas` batch UDF. The decode itself is a STUB (deterministic
  * fake features over the payload bytes — real image/audio codecs are
  * not available in this container); everything around it — the typed
  * `Dataset[MediaRec]`, the `mapPartitions` batch shape, the exact
  * integer feature math — is the production plumbing.
  *
  * Scale: decode is row-local (`mapPartitions`, no shuffle) and
  * batch-amortised — at 100 TB the decoder initialises once per task,
  * not once per record, which is the whole point of the batched shape.
  */
object Multimodal {

  /** documents → media records: binary payload + metadata columns. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRec] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lit("fake_rgb8").as("fmt"),
      ((col("n_chars") % 64 + 1) * 10).cast("int").as("width"),
      ((col("n_chars") % 48 + 1) * 10).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRec]
  }

  /** STUB DECODER — deterministic fake. A real deployment would open a
    * codec once per partition (the expensive init this batched shape
    * amortises) and emit real features; here "brightness" is the mean
    * of the first 16 payload bytes in milli-units, exact integer math
    * so the DuckDB oracle can reproduce it from the source text.
    */
  private def decodeBatch(batch: Iterator[MediaRec]): Iterator[MediaFeat] =
    batch.map { r =>
      val n = math.min(16, r.payload.length)
      var s = 0L
      var i = 0
      while (i < n) { s += (r.payload(i) & 0xFF); i += 1 }
      MediaFeat(r.doc_id, r.fmt, r.width, r.height, r.payload.length,
        if (n == 0) 0L else s * 1000L / n)
    }

  /** q25: the end-to-end multimodal pipeline — build media records,
    * batch-decode features per partition.
    */
  def multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(decodeBatch).toDF()
  }

  private val FrameBytes = 32
  private val SampleStride = 4 // keep every 4th frame

  /** STUB FRAME SAMPLER — the video half of the multimodal pattern:
    * treat the payload as fixed-size frames, keep every k-th frame,
    * emit per-frame features. One input record fans out to many rows
    * (the flatMap batch shape a real frame decoder needs); sampling
    * happens BEFORE feature extraction, so skipped frames cost
    * nothing — the property that matters when a real decoder is the
    * expensive step.
    */
  private def sampleFrames(batch: Iterator[MediaRec]): Iterator[FrameFeat] =
    batch.flatMap { r =>
      val nFrames = (r.payload.length + FrameBytes - 1) / FrameBytes
      Iterator.range(0, nFrames, SampleStride).map { f =>
        val off = f * FrameBytes
        val len = math.min(FrameBytes, r.payload.length - off)
        var s = 0L
        var i = 0
        while (i < len) { s += (r.payload(off + i) & 0xFF); i += 1 }
        FrameFeat(r.doc_id, f, len, if (len == 0) 0L else s * 1000L / len)
      }
    }

  /** q32: frame sampling over the media table. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(sampleFrames).toDF()
  }

  /** STUB RESIZER — half-size nearest-neighbour decimation: keep every
    * 2nd payload byte and halve the metadata dims (what a real
    * per-axis image downsample does, stubbed on the 1-D fake payload).
    * The resized payload itself is verified: the query returns its md5
    * and the oracle recomputes the same hash from the source text.
    */
  private def resizeBatch(batch: Iterator[MediaRec]): Iterator[ResizedMedia] =
    batch.map { r =>
      val out = new Array[Byte]((r.payload.length + 1) / 2)
      var i = 0
      while (i < out.length) { out(i) = r.payload(2 * i); i += 1 }
      ResizedMedia(r.doc_id, (r.width + 1) / 2, (r.height + 1) / 2,
        out.length, out)
    }

  /** q41: media resize (metadata + payload, md5-checked). */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(resizeBatch).toDF()
      .select(col("doc_id"), col("new_w"), col("new_h"), col("new_len"),
        md5(col("resized")).as("resized_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_multimodal" -> multimodal,
    "q32_frame_sample" -> frameSample,
    "q41_media_resize" -> mediaResize)

  // The payload is utf-8 of ASCII text, so payload bytes == ascii codes
  // of the text characters and the oracle can be expressed over `text`.
  private val multimodalSql =
    """SELECT doc_id, 'fake_rgb8' AS fmt,
      |  CAST(((n_chars % 64) + 1) * 10 AS INTEGER) AS width,
      |  CAST(((n_chars % 48) + 1) * 10 AS INTEGER) AS height,
      |  CAST(length(text) AS INTEGER) AS payload_len,
      |  CAST(coalesce(list_sum(list_transform(range(1, least(16, length(text)) + 1),
      |         i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) * 1000
      |       // nullif(least(16, length(text)), 0), 0) AS BIGINT) AS brightness_milli
      |FROM documents""".stripMargin

  private val frameSampleSql =
    s"""WITH f AS (
      |  SELECT doc_id, text, length(text) n,
      |         unnest(range(0, CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS BIGINT), $SampleStride)) fno
      |  FROM documents)
      |SELECT doc_id, CAST(fno AS INTEGER) AS frame_no,
      |  CAST(least($FrameBytes, n - fno*$FrameBytes) AS INTEGER) AS frame_len,
      |  CAST(list_sum(list_transform(range(1, CAST(least($FrameBytes, n - fno*$FrameBytes) AS BIGINT) + 1),
      |         i -> ascii(substr(text, CAST(fno*$FrameBytes + i AS INTEGER), 1)))) * 1000
      |       // least($FrameBytes, n - fno*$FrameBytes) AS BIGINT) AS mean_milli
      |FROM f""".stripMargin

  private val resizeSql =
    """SELECT doc_id,
      |  CAST((((n_chars % 64) + 1) * 10 + 1) // 2 AS INTEGER) AS new_w,
      |  CAST((((n_chars % 48) + 1) * 10 + 1) // 2 AS INTEGER) AS new_h,
      |  CAST((length(text) + 1) // 2 AS INTEGER) AS new_len,
      |  md5(array_to_string(list_transform(range(1, length(text) + 1, 2),
      |        i -> substr(text, CAST(i AS INTEGER), 1)), '')) AS resized_md5
      |FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "q25_multimodal" -> multimodalSql,
    "q32_frame_sample" -> frameSampleSql,
    "q41_media_resize" -> resizeSql)
}
