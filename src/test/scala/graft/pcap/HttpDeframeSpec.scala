package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9112 body de-framing contract of graft.functions.HttpParse: the
  * three framings the corpus-bridge fixture emits, the framing
  * boundaries a naive blank-line split gets wrong, and the
  * junk-rejection contract (null, never a throw, on untrusted bytes). */
class HttpDeframeSpec extends AnyFunSuite {

  private def frame(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def deframe(b: Array[Byte]) = graft.functions.HttpParse.deframe(b)
  private def bodyOf(b: Array[Byte]): String = {
    val r = deframe(b)
    assert(r != null, "expected a well-formed response")
    new String(r.getBinary(1), "US-ASCII")
  }

  test("Content-Length cuts the body ahead of a pipelined response") {
    val raw = frame("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello" +
      "HTTP/1.1 204 No Content\r\nContent-Length: 0\r\n\r\n")
    assert(bodyOf(raw) == "hello")
    assert(deframe(raw).getInt(0) == 200)
  }

  test("chunked transfer coding strips size lines and terminator") {
    val raw = frame("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    assert(bodyOf(raw) == "hello world")
  }

  test("chunk extensions are ignored; chunked beats Content-Length") {
    // RFC 9112 §6.3 rule 3: Transfer-Encoding takes precedence
    val raw = frame("HTTP/1.1 200 OK\r\nContent-Length: 3\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "b;ext=1\r\nhello world\r\n0\r\n\r\n")
    assert(bodyOf(raw) == "hello world")
  }

  test("gzip content coding is decoded after framing") {
    val gz = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write("compressed payload".getBytes("US-ASCII")); g.close()
      o.toByteArray
    }
    val raw = frame(s"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      s"Content-Length: ${gz.length}\r\n\r\n") ++ gz
    assert(bodyOf(raw) == "compressed payload")
  }

  test("no framing header = framed by connection close") {
    val raw = frame("HTTP/1.1 200 OK\r\nServer: x\r\n\r\nrest of stream")
    assert(bodyOf(raw) == "rest of stream")
  }

  test("header names match case-insensitively") {
    val raw = frame("HTTP/1.1 200 OK\r\ncontent-length: 2\r\n\r\nokNO")
    assert(bodyOf(raw) == "ok")
  }

  test("malformed inputs return null, never throw") {
    val bad = Seq(
      "not http at all",
      "HTTP/1.1\r\n\r\n", // no status code
      "HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort", // truncated
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx", // bad hex
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhel", // cut
      "HTTP/1.1 200 OK\r\nContent-Length: -1\r\n\r\n",
      "HTTP/1.1 200 OK no terminator")
    bad.foreach(s => assert(deframe(frame(s)) == null, s.take(40)))
    // corrupt gzip member
    val raw = frame("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Length: 4\r\n\r\n")
    assert(deframe(raw) == null)
  }

  test("fuzz: random bytes never throw") {
    val rnd = new scala.util.Random(1717)
    (0 until 500).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      deframe(b) // any result fine; must not throw
      // and random garbage appended to a valid head must not throw
      val withHead = frame("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n") ++ b
      deframe(withHead)
    }
  }

  test("gzip bomb is rejected by the inflated-size cap") {
    // 64 MiB of zeros compresses to ~64 KiB; inflation must hit the
    // 16 MiB cap and return null rather than materialize the bomb
    val o = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(o)
    val zeros = new Array[Byte](1 << 20)
    (0 until 64).foreach(_ => g.write(zeros))
    g.close()
    val gz = o.toByteArray
    val raw = frame(s"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      s"Content-Length: ${gz.length}\r\n\r\n") ++ gz
    assert(deframe(raw) == null)
  }
}
