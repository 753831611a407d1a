package graft.sources.warc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Deterministic WARC fixture synthesis — the PcapSynth discipline
  * applied to the crawl format: every record is a pure function of the
  * page index, so the DuckDB oracle for each `warc_*` query re-derives
  * the same values from the same closed-form formulas with SQL alone
  * (generate_series + string construction), sharing no code with the
  * reader it checks. `tools/warc_oracle.py` additionally re-parses the
  * fixture bytes with CPython's stdlib gzip — the tarfile-interop
  * pattern — so the writer is pinned by an independent decoder too.
  *
  * Layout mirrors Common Crawl: pages are split across four files by
  * `i % 4`; files 0-1 are plain `.warc`, files 2-3 are `.warc.gz`
  * with EVERY record its own gzip member (the CC framing that lets an
  * indexed reader seek to a member). Each file opens with a `warcinfo`
  * record; each page contributes a `request` and a `response` record.
  *
  * Page formulas (all SQL-expressible):
  *   site(i)  = i % 50
  *   url(i)   = http://site{site}.example/p{i}
  *   status   = 404 when i % 17 == 0 else 200
  *   image    = i % 13 == 5 -> image/gif, binary body "GIF89a" + 20+(i%30) bytes
  *   g        = i % 700 (the exact-dup group: pages repeat every 700)
  *   text(i)  = "warc document {g} alpha beta gamma {(g*37)%1000}"
  *   html(i)  = <html><title>t{g}</title><body>{text}</body></html>
  */
object WarcSynth {

  val Date = "2026-02-01T00:00:00Z"

  /** Bumped whenever any synthesis formula or record layout changes:
    * the fixture-ready marker encodes version AND page count, so a
    * formula edit or count change regenerates instead of silently
    * reusing a stale fixture (r14 ADVICE). */
  val SynthVersion = 3 // v3: RFC 9309 robots fixture (Allow/wildcards)

  private def marker(d: Path, n: Int): Path =
    d.resolve(s"_FIXTURE_OK_v${SynthVersion}_n$n")

  def siteOf(i: Long): Long = i % 50
  def urlOf(i: Long): String = s"http://site${siteOf(i)}.example/p$i"
  def statusOf(i: Long): Int = if (i % 17 == 0) 404 else 200
  def isImage(i: Long): Boolean = i % 13 == 5
  def dupGroup(i: Long): Long = i % 700

  def textOf(i: Long): String = {
    val g = dupGroup(i)
    s"warc document $g alpha beta gamma ${(g * 37) % 1000}"
  }

  def htmlOf(i: Long): String = {
    val g = dupGroup(i)
    s"<html><title>t$g</title><body>${textOf(i)}</body></html>"
  }

  def bodyOf(i: Long): Array[Byte] =
    if (isImage(i)) {
      val n = 20 + (i % 30).toInt
      val b = new Array[Byte](6 + n)
      "GIF89a".getBytes("US-ASCII").copyToArray(b)
      var k = 0
      while (k < n) { b(6 + k) = ((i * 31 + k * 7) % 256).toByte; k += 1 }
      b
    } else htmlOf(i).getBytes("US-ASCII")

  def contentTypeOf(i: Long): String =
    if (isImage(i)) "image/gif" else "text/html"

  // ---- record framing (WARC/1.0 grammar) ---------------------------------

  /** version line + named fields + CRLF CRLF + block + CRLF CRLF. */
  def record(fields: Seq[(String, String)], block: Array[Byte])
      : Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    fields.foreach { case (k, v) => sb.append(k).append(": ")
      .append(v).append("\r\n") }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("US-ASCII")
    val out = new Array[Byte](head.length + block.length + 4)
    head.copyToArray(out)
    block.copyToArray(out, head.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  def recordIdOf(kind: String, i: Long): String =
    s"<urn:uuid:graft-$kind-$i>"

  def warcinfoRecord(file: Int): Array[Byte] = {
    val block = ("software: graft-warc-synth\r\n" +
      s"isPartOf: graft-fixture-file-$file\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> recordIdOf("info", file.toLong),
      "WARC-Date" -> Date,
      "Content-Type" -> "application/warc-fields"), block)
  }

  def requestRecord(i: Long): Array[Byte] = {
    val block = (s"GET /p$i HTTP/1.1\r\n" +
      s"Host: site${siteOf(i)}.example\r\n" +
      "User-Agent: graft-crawler/1.0\r\n\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> recordIdOf("req", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=request"), block)
  }

  def responseRecord(i: Long): Array[Byte] = {
    val body = bodyOf(i)
    val status = statusOf(i)
    val reason = if (status == 200) "OK" else "Not Found"
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: ${contentTypeOf(i)}\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val block = new Array[Byte](head.length + body.length)
    head.copyToArray(block)
    body.copyToArray(block, head.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("resp", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** A `request` record (WARC 1.1 §6.4) linked to its response by
    * WARC-Concurrent-To (§5.7) — how real crawls store the fetch side
    * of each capture. Deterministic User-Agent rotation (4 bots) so
    * the pairing query's census has a closed form. (The plain
    * [[requestRecord]] above predates the link header and stays
    * byte-stable for the main fixture's formulas.) */
  def pairedRequestRecord(i: Long): Array[Byte] = {
    val head = (s"GET /p$i HTTP/1.1\r\n" +
      s"Host: site${siteOf(i)}.example\r\n" +
      s"User-Agent: graftbot/${1 + (i % 4)}.0\r\n" +
      "Accept: text/html\r\n\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> recordIdOf("req", i),
      "WARC-Concurrent-To" -> recordIdOf("resp", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=request"), head)
  }

  /** A `revisit` record (WARC 1.1 §6.7.2, identical-payload-digest
    * profile) — how real crawls record "this URL served bytes we
    * already stored": no body, `WARC-Refers-To` names the original
    * response record. Page i revisits the original of its dup group. */
  def revisitRecord(i: Long): Array[Byte] = {
    val block = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "revisit",
      "WARC-Record-ID" -> recordIdOf("rev", i),
      "WARC-Refers-To" -> recordIdOf("resp", dupGroup(i)),
      "WARC-Profile" ->
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** 3xx redirect roles for the redirect-chain fixture: page i is a
    * redirect iff i % 6 ∈ {0, 1, 4} and i < n - 6 (the tail guard keeps
    * every chain's intermediate hops inside the fixture). Role 0 is a
    * 301 to i+1 (itself a 302 to i+3 — a TWO-hop chain); roles 1 and 4
    * redirect straight to a landing page (i+2 / i+5, both ≡ 3 mod 6). */
  def redirectTarget(i: Long, n: Int): Long =
    if (i >= n - 6) -1L
    else i % 6 match {
      case 0 => i + 1
      case 1 => i + 2
      case 4 => i + 5
      case _ => -1L
    }

  def redirectRecord(i: Long, n: Int): Array[Byte] = {
    val target = redirectTarget(i, n)
    if (target < 0) {
      val body = s"<html><body>landing $i</body></html>".getBytes("US-ASCII")
      val head = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordIdOf("resp", i),
        "WARC-Date" -> Date,
        "WARC-Target-URI" -> urlOf(i),
        "Content-Type" -> "application/http; msgtype=response"),
        head ++ body)
    } else {
      val status = if (i % 6 == 1) 302 else 301
      val reason = if (status == 301) "Moved Permanently" else "Found"
      val head = (s"HTTP/1.1 $status $reason\r\n" +
        s"Location: ${urlOf(target)}\r\n" +
        s"Content-Type: text/html\r\nContent-Length: 0\r\n\r\n")
        .getBytes("US-ASCII")
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordIdOf("resp", i),
        "WARC-Date" -> Date,
        "WARC-Target-URI" -> urlOf(i),
        "Content-Type" -> "application/http; msgtype=response"), head)
    }
  }

  def ensureRedirectFixture(dir: String, n: Int): String =
    ensureGzOnlyFixture(dir, n, "redir", i => redirectRecord(i, n))

  /** One sitemap.xml capture per site i (the crawl-frontier protocol:
    * sitemaps.org §XML format): 3 + i%4 url entries with loc + lastmod,
    * every value a closed-form function of (i, j). */
  def sitemapNUrls(i: Long): Int = 3 + (i % 4).toInt
  def sitemapLastmod(i: Long, j: Int): String =
    s"2026-0${1 + (i + j) % 9}-${10 + (i * 3 + j) % 18}" // day 10-27: 2 digits
  def sitemapRecord(i: Long): Array[Byte] = {
    val urls = (0 until sitemapNUrls(i)).map { j =>
      s"<url><loc>http://site$i.example/p$j</loc>" +
        s"<lastmod>${sitemapLastmod(i, j)}</lastmod></url>"
    }.mkString
    val body = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      urls + "</urlset>").getBytes("UTF-8")
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("resp", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> s"http://site$i.example/sitemap.xml",
      "Content-Type" -> "application/http; msgtype=response"),
      head ++ body)
  }

  def ensureSitemapFixture(dir: String, n: Int): String =
    ensureGzOnlyFixture(dir, n, "smap", sitemapRecord)

  /** Where site i really serves its sitemap: every third site uses a
    * NON-default path discoverable only through robots.txt's
    * `Sitemap:` directive (RFC 9309 §2.3) — the mechanism real
    * crawlers use; the rest sit at the /sitemap.xml convention. */
  def sitemapPath(i: Long): String =
    if (i % 3 == 0) s"maps/urls-$i.xml" else "sitemap.xml"

  private def urlsetBody(urls: String): Array[Byte] =
    ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      urls + "</urlset>").getBytes("UTF-8")

  private def xmlResponse(kind: String, i: Long, uri: String,
      body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf(kind, i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      head ++ body)
  }

  /** robots.txt capture whose `Sitemap:` directive names the REAL
    * sitemap location (RFC 9309 §2.3 cross-link). */
  def robotsSitemapRecord(i: Long): Array[Byte] = {
    val body = ("User-agent: *\r\nDisallow: /private/\r\n" +
      s"Sitemap: http://site$i.example/${sitemapPath(i)}\r\n")
      .getBytes("US-ASCII")
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("rob", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> s"http://site$i.example/robots.txt",
      "Content-Type" -> "application/http; msgtype=response"),
      head ++ body)
  }

  /** Frontier fixture: per site, a robots.txt declaring the sitemap
    * location, the sitemap AT that location, and — for the
    * non-default sites — an UNDECLARED decoy at /sitemap.xml that
    * path-convention discovery would wrongly count. */
  def sitemapFrontierRecord(i: Long): Array[Byte] = {
    val declared = xmlResponse("smapf", i,
      s"http://site$i.example/${sitemapPath(i)}",
      urlsetBody((0 until sitemapNUrls(i)).map { j =>
        s"<url><loc>http://site$i.example/p$j</loc>" +
          s"<lastmod>${sitemapLastmod(i, j)}</lastmod></url>"
      }.mkString))
    val decoy = if (i % 3 == 0)
      xmlResponse("decoy", i, s"http://site$i.example/sitemap.xml",
        urlsetBody(s"<url><loc>http://site$i.example/decoy</loc>" +
          "<lastmod>2020-01-01</lastmod></url>"))
    else Array.emptyByteArray
    robotsSitemapRecord(i) ++ declared ++ decoy
  }

  def ensureSitemapFrontierFixture(dir: String, n: Int): String =
    ensureGzOnlyFixture(dir, n, "smfr", sitemapFrontierRecord)

  // ---- sitemapindex fixture (sitemaps.org nested-index form) -------------
  // Every fourth site declares a <sitemapindex> in robots.txt whose 2
  // child sitemaps carry the url entries; the rest declare a direct
  // urlset. Closed forms: child k of site i has 2 + (i + k) % 3 urls.

  def smIndexIsNested(i: Long): Boolean = i % 4 == 0
  /** urls in child k of a nested site (k = 0, 1). */
  def smIndexUrlsOf(i: Long, k: Int): Int = 2 + ((i + k) % 3).toInt

  def sitemapIndexRecord(i: Long): Array[Byte] = {
    val host = s"http://site$i.example"
    val declared =
      if (smIndexIsNested(i)) s"$host/maps/index-$i.xml"
      else s"$host/sitemap.xml"
    val robotsBody = ("User-agent: *\r\n" +
      s"Sitemap: $declared\r\n").getBytes("US-ASCII")
    val robotsHead = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${robotsBody.length}\r\n\r\n").getBytes("US-ASCII")
    val robots = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("xrob", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> s"$host/robots.txt",
      "Content-Type" -> "application/http; msgtype=response"),
      robotsHead ++ robotsBody)
    def urlset(nUrls: Int, tag: Int): Array[Byte] =
      urlsetBody((0 until nUrls).map { j =>
        s"<url><loc>$host/p$tag-$j</loc>" +
          s"<lastmod>${sitemapLastmod(i, tag * 10 + j)}</lastmod></url>"
      }.mkString)
    if (smIndexIsNested(i)) {
      val index = xmlResponse("smidx", i, declared,
        ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          (0 until 2).map(k =>
            s"<sitemap><loc>$host/maps/part-$i-$k.xml</loc></sitemap>")
            .mkString + "</sitemapindex>").getBytes("UTF-8"))
      val kids = (0 until 2).map(k => record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordIdOf(s"smpart$k", i),
        "WARC-Date" -> Date,
        "WARC-Target-URI" -> s"$host/maps/part-$i-$k.xml",
        "Content-Type" -> "application/http; msgtype=response"), {
          val b = urlset(smIndexUrlsOf(i, k), k)
          (s"HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n" +
            s"Content-Length: ${b.length}\r\n\r\n").getBytes("US-ASCII") ++ b
        }))
      robots ++ index ++ kids(0) ++ kids(1)
    } else
      robots ++ xmlResponse("smflat", i, declared,
        urlset(sitemapNUrls(i), 9))
  }

  def ensureSitemapIndexFixture(dir: String, n: Int): String =
    ensureGzOnlyFixture(dir, n, "smidx", sitemapIndexRecord)

  /** Revisit-deduped crawl fixture: the FIRST occurrence of each dup
    * group (i < 700, so g == i) is a full response; every repeat is a
    * revisit record pointing at it. Two files, one plain + one
    * member-gzip, pages split by parity. */
  def ensureRevisitFixture(dir: String, n: Int): String = {
    require(n >= 700, "revisit fixture needs at least one full cycle")
    val d = Paths.get(dir)
    val done = marker(d, n)
    if (Files.exists(done)) return dir
    Files.createDirectories(d)
    for (f <- 0 until 2) {
      val pages = (0 until n).filter(_ % 2 == f).map(_.toLong)
      val recs = Iterator(warcinfoRecord(f)) ++
        pages.iterator.map(i =>
          if (i < 700) responseRecord(i) else revisitRecord(i))
      if (f == 0)
        writeAtomic(d.resolve("dedup-00.warc"), os => recs.foreach(os.write))
      else
        writeAtomic(d.resolve("dedup-01.warc.gz"),
          os => gzipMembers(recs, os))
    }
    Files.write(done, Array.empty[Byte])
    dir
  }

  /** RFC 9112 chunked framing: the body split into `chunkSize`-byte
    * chunks (hex size + CRLF + chunk + CRLF), 0-terminated. */
  def chunkEncode(body: Array[Byte], chunkSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < body.length) {
      val n = math.min(chunkSize, body.length - off)
      out.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(body, off, n)
      out.write("\r\n".getBytes("US-ASCII"))
      off += n
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** A response whose HTTP body keeps its chunked transfer framing —
    * captured as fetched, the way real crawls store it. Chunk size
    * varies with the page so boundaries land everywhere. */
  def chunkedResponseRecord(i: Long): Array[Byte] = {
    val body = chunkEncode(htmlOf(i).getBytes("US-ASCII"),
      7 + (i % 13).toInt)
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes("US-ASCII")
    val block = new Array[Byte](head.length + body.length)
    head.copyToArray(block)
    body.copyToArray(block, head.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("chunked", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b)
    gz.close()
    bos.toByteArray
  }

  /** zlib-wrapped DEFLATE (RFC 1950) — what a spec-conforming server
    * sends for `Content-Encoding: deflate`. */
  def zlibBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val ds = new java.util.zip.DeflaterOutputStream(bos, d)
    ds.write(b)
    ds.close()
    d.end()
    bos.toByteArray
  }

  /** Raw DEFLATE (no zlib wrapper) — what plenty of real servers
    * actually send for `deflate`; readers must sniff. */
  def rawDeflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val ds = new java.util.zip.DeflaterOutputStream(bos, d)
    ds.write(b)
    ds.close()
    d.end()
    bos.toByteArray
  }

  /** A response whose HTTP body kept its Content-Encoding as captured
    * (the dominant real-crawl case — Common Crawl bodies are mostly
    * `Content-Encoding: gzip`). Five shapes cycled by page:
    * gzip; zlib deflate; gzip UNDER chunked transfer framing (decode
    * order: de-chunk, then content-decode); raw-deflate (the
    * spec-violating server readers must sniff); brotli (RFC 7932 —
    * the second-most-common real coding). */
  def contentEncodedResponseRecord(i: Long): Array[Byte] = {
    val plain = htmlOf(i).getBytes("US-ASCII")
    val mode = (i % 5).toInt
    val encName = mode match {
      case 1 | 3 => "deflate"
      case 4 => "br"
      case _ => "gzip"
    }
    val coded = mode match {
      case 1 => zlibBytes(plain)
      case 3 => rawDeflateBytes(plain)
      // a REAL dictionary-referencing stream (word 0 through Appendix
      // B transform 4 -> "Time ", then the page): every scan of a br
      // page now exercises the §8 dictionary machinery oracle-gated
      case 4 => graft.operators.BrotliCodec.encodeWithDictPrefix(plain)
      case _ => gzipBytes(plain)
    }
    val chunked = mode == 2
    val body = if (chunked) chunkEncode(coded, 7 + (i % 13).toInt)
      else coded
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Encoding: $encName\r\n" +
      (if (chunked) "Transfer-Encoding: chunked\r\n"
       else s"Content-Length: ${body.length}\r\n") +
      "\r\n").getBytes("US-ASCII")
    val block = new Array[Byte](head.length + body.length)
    head.copyToArray(block)
    body.copyToArray(block, head.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("ce", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** A WET-style `conversion` record (the extracted-text sibling lake
    * Common Crawl ships next to its WARCs): plain-text block, refers
    * back to the response it was extracted from. */
  def conversionRecord(i: Long): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> recordIdOf("conv", i),
      "WARC-Refers-To" -> recordIdOf("resp", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "text/plain"), textOf(i).getBytes("US-ASCII"))

  /** Robots fixture (RFC 9309): record i < 50 is site i's /robots.txt
    * with rules by site class (site % 6) — 0: plain Disallow prefix;
    * 1: Disallow + a LONGER Allow carve-out (longest-match override);
    * 2: a `*`-wildcard + `$`-anchored Disallow; 3: an equal-length
    * Allow/Disallow TIE (Allow must win); 4: no path rules at all;
    * 5: a mid-pattern wildcard with an end anchor. Record i >= 50 is
    * a page whose path exercises every class: /private/p{i} (i%5==0),
    * /private/pub/p{i} (1), /p{i}.tmp (2), else /p{i}. */
  def robotsPathOf(i: Long): String = (i % 5) match {
    case 0 => s"/private/p$i"
    case 1 => s"/private/pub/p$i"
    case 2 => s"/p$i.tmp"
    case _ => s"/p$i"
  }

  def robotsRulesOf(site: Long): String = (site % 6) match {
    case 0 => "User-agent: *\nDisallow: /private/\n"
    case 1 => "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
    case 2 => "User-agent: *\nDisallow: /*.tmp$\n"
    case 3 => "User-agent: *\nDisallow: /p\nAllow: /p\n"
    case 4 => "User-agent: *\nCrawl-delay: 1\n"
    case _ => "User-agent: *\nDisallow: /p*3$\n"
  }

  def robotsFixtureRecord(i: Long): Array[Byte] =
    if (i < 50) {
      val body = robotsRulesOf(i).getBytes("US-ASCII")
      val head = ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordIdOf("robots", i),
        "WARC-Date" -> Date,
        "WARC-Target-URI" -> s"http://site$i.example/robots.txt",
        "Content-Type" -> "application/http; msgtype=response"),
        head ++ body)
    } else {
      val body = htmlOf(i).getBytes("US-ASCII")
      val head = ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordIdOf("page", i),
        "WARC-Date" -> Date,
        "WARC-Target-URI" ->
          s"http://site${siteOf(i)}.example${robotsPathOf(i)}",
        "Content-Type" -> "application/http; msgtype=response"),
        head ++ body)
    }

  /** Date-varying crawl (SQL-expressible): page i fetched on February
    * day 1 + i%28 — ISO 8601 WARC-Dates compare lexicographically =
    * chronologically, the property date-window pushdown rides on. */
  def dateOf(i: Long): String = f"2026-02-${1 + (i % 28)}%02dT00:00:00Z"

  def datedResponseRecord(i: Long): Array[Byte] = {
    val body = htmlOf(i).getBytes("US-ASCII")
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val block = new Array[Byte](head.length + body.length)
    head.copyToArray(block)
    body.copyToArray(block, head.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("dated", i),
      "WARC-Date" -> dateOf(i),
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** Charset fixture (SQL-expressible via chr()): the same logical
    * text served as ISO-8859-1 bytes on odd pages and UTF-8 on even,
    * with the charset declared in the Content-Type header — the
    * mojibake trap every multilingual crawl pipeline must clear. */
  def charsetTextOf(i: Long): String = {
    val g = dupGroup(i)
    s"café doc $g résumé ${(g * 37) % 1000}"
  }

  def charsetResponseRecord(i: Long): Array[Byte] = {
    val cs = if (i % 2 == 1) "iso-8859-1" else "utf-8"
    val body = charsetTextOf(i).getBytes(
      if (i % 2 == 1) "ISO-8859-1" else "UTF-8")
    val head = ("HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; charset=$cs\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val block = new Array[Byte](head.length + body.length)
    head.copyToArray(block)
    body.copyToArray(block, head.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordIdOf("cs", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** WAT outlink formulas (SQL-expressible): page i links to
    * `(i + 1 + 31*j) % n` for j < 2 + i%3 — 2-4 distinct targets. */
  def watOutDegree(i: Long): Int = 2 + (i % 3).toInt
  def watTarget(i: Long, j: Int, n: Int): Long = (i + 1 + 31L * j) % n

  /** A WAT-style `metadata` record (the third member of Common
    * Crawl's WARC/WAT/WET triple): a JSON block in the (simplified)
    * WAT envelope shape — header metadata + extracted HTML links —
    * referring back to the response it describes. The outlink graph a
    * crawl's link analysis starts from. */
  def watRecord(n: Int)(i: Long): Array[Byte] = {
    val links = (0 until watOutDegree(i)).map { j =>
      s"""{"path":"A@/href","url":"${urlOf(watTarget(i, j, n))}"}"""
    }.mkString(",")
    val json =
      s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"${
        urlOf(i)}"},"Payload-Metadata":{"HTML-Metadata":{"Links":[$links]}}}}"""
    record(Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> recordIdOf("wat", i),
      "WARC-Refers-To" -> recordIdOf("resp", i),
      "WARC-Date" -> Date,
      "WARC-Target-URI" -> urlOf(i),
      "Content-Type" -> "application/json"),
      json.getBytes("US-ASCII"))
  }

  /** Two member-gzip archives with NO `.wcdx` sidecars — the
    * foreign-index scenario: a crawl the engine did not index itself,
    * navigable only through an externally-written CDX(J). */
  def ensureGzOnlyFixture(dir: String, n: Int, ext: String,
      recOf: Long => Array[Byte]): String = {
    val d = Paths.get(dir)
    val done = marker(d, n)
    if (Files.exists(done)) return dir
    Files.createDirectories(d)
    for (f <- 0 until 2) {
      val pages = (0 until n).filter(_ % 2 == f).map(_.toLong)
      val recs = Iterator(warcinfoRecord(f)) ++ pages.iterator.map(recOf)
      writeAtomic(d.resolve(s"$ext-0$f.warc.gz"),
        os => gzipMembers(recs, os))
    }
    Files.write(done, Array.empty[Byte])
    dir
  }

  /** Two-file fixtures (plain + member-gzip) of one record kind. */
  def ensureTwoFileFixture(dir: String, n: Int, ext: String,
      recOf: Long => Array[Byte]): String = {
    val d = Paths.get(dir)
    val done = marker(d, n)
    if (Files.exists(done)) return dir
    Files.createDirectories(d)
    for (f <- 0 until 2) {
      val pages = (0 until n).filter(_ % 2 == f).map(_.toLong)
      val recs = Iterator(warcinfoRecord(f)) ++ pages.iterator.map(recOf)
      if (f == 0)
        writeAtomic(d.resolve(s"$ext-00.warc"), os => recs.foreach(os.write))
      else
        writeAtomic(d.resolve(s"$ext-01.warc.gz"),
          os => gzipMembers(recs, os))
    }
    Files.write(done, Array.empty[Byte])
    dir
  }

  /** One gzip member per byte chunk — the Common Crawl framing. Each
    * member stream is CLOSED against a close-shielding wrapper so its
    * native Deflater is released immediately (finish() alone leaves
    * one Deflater per record for GC finalization — r14 ADVICE) while
    * `out` stays open for the next member. */
  def gzipMembers(chunks: Iterator[Array[Byte]],
      out: java.io.OutputStream): Unit = {
    val shield = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        this.out.write(b, off, len)
      override def close(): Unit = flush() // member done; keep out open
    }
    chunks.foreach { c =>
      val gz = new java.util.zip.GZIPOutputStream(shield, 1 << 16)
      gz.write(c)
      gz.close() // member trailer + deflater.end()
    }
  }

  private def writeAtomic(target: Path, write: java.io.OutputStream => Unit)
      : Unit = {
    val tmp = target.resolveSibling("." + target.getFileName + ".tmp")
    val os = Files.newOutputStream(tmp)
    try write(os) finally os.close()
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The four-file fixture (2 plain + 2 member-gzip), n pages total,
    * written once and reused (pure function of n). */
  def ensureFixture(dir: String, n: Int): String = {
    val d = Paths.get(dir)
    val done = marker(d, n)
    if (Files.exists(done)) return dir
    Files.createDirectories(d)
    for (f <- 0 until 4) {
      val pages = (0 until n).filter(_ % 4 == f).map(_.toLong)
      val recs = Iterator(warcinfoRecord(f)) ++
        pages.iterator.flatMap(i =>
          Iterator(requestRecord(i), responseRecord(i)))
      if (f < 2)
        writeAtomic(d.resolve(s"crawl-0$f.warc"),
          os => recs.foreach(os.write))
      else
        writeAtomic(d.resolve(s"crawl-0$f.warc.gz"),
          os => gzipMembers(recs, os))
    }
    Files.write(done, Array.empty[Byte])
    dir
  }
}
