package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** S5 — ARC file source (tools/arc/ArcRecordReader.java:39-210,
  * ArcSegmentCreator.java header parse).
  *
  * An ARC file is a concatenation of gzip members; each member holds one
  * record: a header line `URL IP-address date(yyyyMMddHHmmss) mime-type
  * length\n` followed by the payload bytes. The reader scans for gzip
  * magic (0x1F 0x8B) to find member starts — the same split-recovery
  * trick the reference uses so an executor can start mid-file — and
  * inflates each member independently.
  */
object ArcSource {

  final case class ArcRecord(url: String, ip: String, timestamp: Long,
      contentType: String, declaredLength: Long, body: Array[Byte])

  /** Offsets of gzip members (magic 0x1F8B, deflate method 0x08). */
  def memberOffsets(bytes: Array[Byte]): Seq[Int] =
    (0 until math.max(0, bytes.length - 2)).filter { i =>
      (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
        (bytes(i + 2) & 0xff) == 0x08
    }

  /** Inflate one member starting at `off`; None if it isn't a real
    * member start (false-positive magic inside compressed data). */
  def inflateAt(bytes: Array[Byte], off: Int): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(
        new ByteArrayInputStream(bytes, off, bytes.length - off))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Parse one inflated record: header line + payload. */
  def parseRecord(rec: Array[Byte]): Option[ArcRecord] = {
    val nl = rec.indexOf('\n'.toByte)
    if (nl <= 0) return None
    val header = new String(rec, 0, nl, "UTF-8").trim
    val fields = header.split(" ")
    if (fields.length < 5) return None
    try {
      val ts = java.time.LocalDateTime.parse(fields(2),
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      // truncate to the declared length: GZIPInputStream reads
      // CONCATENATED members, so inflating at member N yields N..end
      val len = fields(4).toInt
      Some(ArcRecord(fields(0), fields(1), ts, fields(3), len.toLong,
        rec.slice(nl + 1, math.min(rec.length, nl + 1 + len))))
    } catch { case _: Exception => None }
  }

  /** All records of one ARC blob. Members whose inflate fails (magic
    * false-positives) and unparseable records are skipped; the leading
    * `filedesc://` version record is dropped like the reference does. */
  def records(bytes: Array[Byte]): Seq[ArcRecord] = {
    val seen = scala.collection.mutable.Set.empty[String]
    memberOffsets(bytes).flatMap(off => inflateAt(bytes, off))
      .flatMap(parseRecord)
      .filterNot(_.url.startsWith("filedesc://"))
      .filter(r => seen.add(r.url + "@" + r.timestamp)) // overlapping scans
  }

  /** Distributed read: one task per ARC file (binaryFiles), flatMap to
    * records — per-partition imperative decode, the legitimate RDD seam. */
  def read(spark: SparkSession, path: String): Dataset[ArcRecord] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => records(pds.toArray()) }
      .toDS()
  }

  /** Build an ARC blob from records (test/export helper). */
  def write(recs: Seq[(String, String, String, String, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (url, ip, date, mime, body) =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      val header = s"$url $ip $date $mime ${body.length}\n"
      gz.write(header.getBytes("UTF-8"))
      gz.write(body)
      gz.finish()
    }
    out.toByteArray
  }
}
