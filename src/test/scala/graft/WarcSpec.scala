package graft

import graft.sources.WarcFile
import graft.sources.WarcFile.WarcRecord

/** WARC codec tests: framing, gzip member concatenation, foreign header
  * order, and loud failure on structural damage. */
class WarcSpec extends SparkSpecBase {

  private val recs = Seq(
    WarcRecord("http://a.com/1", "urn:graft:doc-1", 200, "<html>one</html>"),
    WarcRecord("https://b.org/2?x=1", "urn:graft:doc-2", 404,
      "<html>\nmulti\nline body with bytes: åäö</html>"),
    WarcRecord("http://c.net/3", "urn:graft:doc-3", 200, ""))

  test("round-trip: records, URIs, ids, statuses, bodies exact") {
    val back = WarcFile.decodeWarcGz(WarcFile.encodeWarcGz(recs))
    assert(back == recs)
  }

  test("gzip members concatenate: two archives appended read as one") {
    val a = WarcFile.encodeWarcGz(recs.take(1))
    val b = WarcFile.encodeWarcGz(recs.drop(1))
    assert(WarcFile.decodeWarcGz(a ++ b) == recs,
      "per-record gzip members must be independently concatenable")
  }

  test("foreign producer: arbitrary header order and unknown headers parse") {
    // hand-built record with shuffled headers, an unknown header, and a
    // non-response record (warcinfo) that must be skipped
    val body = "HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\npayload"
    val rec =
      "WARC/1.0\r\n" +
        s"Content-Length: ${body.getBytes("UTF-8").length}\r\n" +
        "X-Unknown-Header: whatever\r\n" +
        "WARC-Record-ID: <urn:x:1>\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: http://z.io/\r\n\r\n" +
        body + "\r\n\r\n"
    val info = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write((info + rec).getBytes("UTF-8")); gz.close()
    val got = WarcFile.decodeWarcGz(out.toByteArray)
    assert(got == Seq(WarcRecord("http://z.io/", "urn:x:1", 301, "payload")))
  }

  test("damage fails loudly: truncation, bad magic, missing length") {
    val bytes = WarcFile.encodeWarcGz(recs)
    intercept[Exception](WarcFile.decodeWarcGz(bytes.take(bytes.length / 2)))
    intercept[Exception](WarcFile.decodeWarcGz("not a warc".getBytes("UTF-8")))
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(noLen.getBytes("UTF-8")); gz.close()
    intercept[Exception](WarcFile.decodeWarcGz(out.toByteArray))
  }

  test("q_warc_extract output matches q_html_extract on the shared chain") {
    val warc = graft.SparkEntry.queries("q_warc_extract")(spark, TestSpark.Sf0001)
      .select("doc_id", "extracted", "n_boilerplate_lines")
    val html = graft.SparkEntry.queries("q_html_extract")(spark, TestSpark.Sf0001)
    assert(warc.exceptAll(html).count() == 0 && html.exceptAll(warc).count() == 0,
      "container path must reproduce the direct extraction exactly")
  }
}
