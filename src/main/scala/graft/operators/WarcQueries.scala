package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Queries over the `warc` DSv2 source — the crawl format the
  * canonical LLM text pipeline starts from (Common Crawl ships
  * member-gzip `.warc.gz`). DuckDB cannot read WARC, but the fixture
  * is DETERMINISTIC ([[graft.sources.warc.WarcSynth]]: every record a
  * pure function of the page index), so each oracle re-derives the
  * same values from the same closed-form formulas with SQL alone
  * (generate_series + string construction) — the PcapQueries
  * discipline. `tools/warc_oracle.py` additionally re-parses the
  * fixture bytes with CPython's stdlib gzip, pinning the framing
  * against an independent decoder.
  */
object WarcQueries {

  private val NPages = 40000
  private val RevisitPages = 6000
  private val ChunkedPages = 3000
  private val CePages = 3000
  private val WetPages = 8000
  private val WatPages = 6000
  private val RobotsRecs = 10050 // 50 robots.txt + 10000 pages
  private val CharsetPages = 4000
  private val DatedPages = 8400 // 300 per February day
  private val TwinRuns = new java.util.concurrent.atomic.AtomicLong

  private def fixtureDir: String =
    graft.sources.warc.WarcSynth.ensureFixture(
      "/tmp/graft_warc_fixture", NPages)

  /** The closed-form page HTML, reconstructed in DuckDB SQL (g is the
    * dup group i % 700). */
  private def htmlSql(g: String): String =
    s"'<html><title>t' || $g || '</title><body>warc document ' || $g || " +
      s"' alpha beta gamma ' || (($g*37)%1000) || '</body></html>'"

  private val ForeignPages = 3000

  /** Point-lookup doc ids for the CDXJ export round trip — all below
    * the smallest SF's 500 docs so the set is SF-stable. */
  private val CdxjLookupDocs = Seq(0L, 7L, 123L, 250L, 499L)

  /** 20 spread-out lookup pages avoiding the image (i%13==5) and 404
    * (i%17==0) formula rows, so the oracle's html-md5 closed form
    * holds for every lookup. */
  private lazy val foreignLookupPages: Seq[Long] = {
    val cand = (0 until ForeignPages)
      .filter(i => i % 13 != 5 && i % 17 != 0)
    (0 until 20).map(g => cand(g * (cand.length / 20)).toLong)
  }

  /** A second spread of lookup pages (same image/404 avoidance) for
    * the cluster.idx path, offset so the two lookup queries never
    * share a page. */
  private lazy val clusterLookupPages: Seq[Long] = {
    val cand = (0 until ForeignPages)
      .filter(i => i % 13 != 5 && i % 17 != 0)
    (0 until 12).map(g => cand(g * (cand.length / 12) + 3).toLong)
  }

  /** Foreign-indexed crawl: member-gzip archives with NO .wcdx,
    * indexed ONLY by the CPython CDXJ writer — the independent-writer
    * evidence that the engine consumes the industry CDX(J) form, not
    * its own dialect round-tripped. Writes BOTH layouts: the
    * single-file `_index.cdxj` and the sharded Common Crawl form
    * (`indexes/cdx-*.gz` blocks + `cluster.idx`). */
  private def foreignCdxDir: String = {
    val dir = graft.sources.warc.WarcSynth.ensureGzOnlyFixture(
      "/tmp/graft_warc_foreign", ForeignPages, "foreign",
      graft.sources.warc.WarcSynth.responseRecord)
    val cluster =
      java.nio.file.Paths.get(dir, "indexes", "cluster.idx")
    if (!java.nio.file.Files.exists(cluster)) {
      val pb = new ProcessBuilder("python3", "tools/warc_oracle.py",
        "cdxj", dir, "40", "3") // 40-line blocks across 3 shards
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0 && out.contains("PASS"),
        s"CPython cdxj writer failed: ${out.take(400)}")
    }
    dir
  }

  def defs: Seq[Q] = Seq(

    // ----- fixture scan ----------------------------------------------------
    // The source's record grammar end-to-end: four files (2 plain + 2
    // member-gzip), warcinfo + request + response records, HTTP blocks
    // split into status/headers/body. The aggregate matches only if
    // the version/field/Content-Length framing, the concatenated-gzip
    // member walk, and the HTTP header split are all byte-exact —
    // one mis-framed record corrupts every row after it. The oracle
    // reconstructs record populations and payload (HTTP body) lengths
    // from the synthesis formulas alone. Scale: whole-file parallel
    // scan, one partial-agg shuffle of 3 rows.
    Q("warc_fixture_scan",
      (s, _) => {
        s.read.format("warc").load(fixtureDir)
          .groupBy("rec_type")
          .agg(count(lit(1)).as("n"),
            count(when(col("http_status") === 200, 1)).as("n_ok"),
            sum(octet_length(col("payload")).cast("long"))
              .as("payload_bytes"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        resp AS (
          SELECT i, i % 700 AS g,
            CASE WHEN i % 17 = 0 THEN 404 ELSE 200 END AS status,
            i % 13 = 5 AS img
          FROM pages),
        plens AS (
          SELECT status,
            CASE WHEN img THEN 26 + i % 30
                 ELSE length(${htmlSql("g")}) END AS plen
          FROM resp)
        SELECT 'warcinfo' AS rec_type, 4::BIGINT AS n, 0::BIGINT AS n_ok,
          (SELECT CAST(SUM(length('software: graft-warc-synth') + 2
             + length('isPartOf: graft-fixture-file-' || f) + 2) AS BIGINT)
           FROM (SELECT unnest(generate_series(0, 3)) AS f)) AS payload_bytes
        UNION ALL
        SELECT 'request', ${NPages}::BIGINT, 0::BIGINT, 0::BIGINT
        UNION ALL
        SELECT 'response', ${NPages}::BIGINT,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM plens WHERE status = 200),
          (SELECT CAST(SUM(plen) AS BIGINT) FROM plens)""")),

    // ----- crawl -> corpus pipeline ----------------------------------------
    // The end-to-end shape a Common Crawl text pipeline runs: keep
    // 200-status text/html responses, strip markup, token-count, and
    // exact-dedup the page texts per site — all on the REAL decoded
    // payload bytes (the oracle reconstructs the same strings from the
    // formulas and re-derives identical md5 groups, so a one-byte
    // payload slip breaks every site's row). Scale: payload-projected
    // whole-file scan, ONE shuffle (the site aggregate); dedup is a
    // distinct over digests, never page bytes.
    Q("warc_crawl_pipeline",
      (s, _) => {
        import s.implicits._
        val resp = s.read.format("warc").load(fixtureDir)
          .filter($"rec_type" === "response" && $"http_status" === 200 &&
            $"http_content_type" === "text/html")
          .select($"url", $"payload")
        resp
          .withColumn("site",
            regexp_extract($"url", "site(\\d+)\\.example", 1).cast("int"))
          .withColumn("text",
            regexp_replace($"payload".cast("string"), "<[^>]*>", " "))
          .withColumn("tokens",
            size(split(trim($"text"), "\\s+")).cast("long"))
          .withColumn("digest", md5($"text".cast("binary")))
          .groupBy($"site")
          .agg(count(lit(1)).as("pages"),
            countDistinct($"digest").as("uniq_docs"),
            sum($"tokens").as("tokens_total"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        kept AS (
          SELECT i, CAST(i % 50 AS INT) AS site, i % 700 AS g
          FROM pages WHERE i % 17 <> 0 AND i % 13 <> 5),
        stripped AS (
          SELECT site,
            regexp_replace(${htmlSql("g")}, '<[^>]*>', ' ', 'g') AS text
          FROM kept),
        scored AS (
          SELECT site, md5(text) AS digest,
            CAST(len(regexp_split_to_array(trim(text), '\\s+'))
              AS BIGINT) AS tokens
          FROM stripped)
        SELECT site, CAST(COUNT(*) AS BIGINT) AS pages,
          CAST(COUNT(DISTINCT digest) AS BIGINT) AS uniq_docs,
          CAST(SUM(tokens) AS BIGINT) AS tokens_total
        FROM scored GROUP BY site""") ,
      headline = true),

    // ----- corpus round-trip (documents -> warc SINK -> scan) --------------
    // The DSv2 write side end-to-end: the REAL documents table exports
    // through `df.write.format("warc")` — one member-per-record
    // .warc.gz per task (the Common Crawl framing), HTTP response
    // blocks synthesized from (http_status, http_content_type,
    // payload), atomic .inprogress renames, and a `.wcdx` sidecar
    // written at commit so the exported lake is born range-splittable
    // and metadata-countable. The scan reads it back and the md5 of
    // every payload must equal the md5 DuckDB computes from the source
    // table — proving writer AND walker against arbitrary page bytes,
    // not just the synthetic formulas. Scale: streamed row-by-row
    // writes (constant memory per task); whole-file parallel read-back.
    Q("warc_corpus_roundtrip",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_warc_corpus_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        Tables.documents(s, d)
          .select(
            concat(lit("http://corpus.example/doc/"), $"doc_id")
              .as("url"),
            concat(lit("<urn:uuid:graft-doc-"), $"doc_id", lit(">"))
              .as("record_id"),
            lit(graft.sources.warc.WarcSynth.Date).as("warc_date"),
            lit(200).as("http_status"),
            lit("text/plain; charset=utf-8").as("http_content_type"),
            encode($"text", "UTF-8").as("payload"))
          .repartition(8)
          .write.format("warc").mode("overwrite").save(outDir)
        s.read.format("warc").load(outDir)
          .select(
            regexp_extract($"url", "doc/(\\d+)$", 1).cast("long")
              .as("doc_id"),
            $"http_status",
            md5($"payload").as("payload_md5"))
      },
      Some("""SELECT doc_id, CAST(200 AS INT) AS http_status,
          md5(text) AS payload_md5
        FROM documents""")),

    // ----- STREAMING archive export -> batch import parity -------------------
    // The fetcher-side landing path: the same documents corpus as
    // warc_corpus_roundtrip, but exported by the STREAMING `warc`
    // sink — documents land as a parquet-backed file stream
    // (maxFilesPerTrigger=1, so the export spans several real
    // micro-batches), each epoch commits its own atomically-renamed,
    // epoch-keyed archives WITH their .wcdx sidecars, and the batch
    // scan imports the union. Same md5-per-doc oracle as the batch
    // sink — the row matches only if every epoch's records landed
    // exactly once and byte-identically.
    Q("warc_sink_stream_twin",
      (s, d) => {
        import s.implicits._
        val tag = java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val stage = s"/tmp/graft_warc_sinkstream_stage_$tag"
        val outDir = s"/tmp/graft_warc_sinkstream_out_$tag"
        val ckpt = s"/tmp/graft_warc_sinkstream_ckpt_$tag"
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        Seq(stage, outDir, ckpt).foreach(p =>
          fs.delete(new org.apache.hadoop.fs.Path(p), true))
        val src = Tables.documents(s, d)
          .select(
            concat(lit("http://corpus.example/doc/"), $"doc_id")
              .as("url"),
            lit(200).as("http_status"),
            lit("text/plain; charset=utf-8").as("http_content_type"),
            encode($"text", "UTF-8").as("payload"))
        src.repartition(4).write.parquet(stage)
        val q = s.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage)
          .writeStream.format("warc")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        try q.processAllAvailable() finally q.stop()
        s.read.format("warc").load(outDir)
          .select(
            regexp_extract($"url", "doc/(\\d+)$", 1).cast("long")
              .as("doc_id"),
            $"http_status",
            md5($"payload").as("payload_md5"))
      },
      Some("""SELECT doc_id, CAST(200 AS INT) AS http_status,
          md5(text) AS payload_md5
        FROM documents""")),

    // ----- continuous crawl ingestion (stream twin) -------------------------
    // The streaming form of the crawl pipeline: the four fixture files
    // LAND one micro-batch each (maxFilesPerTrigger=1 — four real
    // epochs through the admission log), records stream through the
    // SAME WarcRecordWalk the batch scan uses, and the downstream
    // corpus aggregate must equal the batch pipeline's oracle row for
    // row — exactly-once across epochs or a site's page count slips.
    // Scale: stateless per-file flatMap; the aggregate is the same ONE
    // shuffle as the batch form.
    Q("warc_ingest_stream_twin",
      (s, _) => {
        import s.implicits._
        val dir = fixtureDir
        // unique per invocation: a second run in the same session must
        // not append into the first run's memory table
        val table = s"warc_twin_${TwinRuns.incrementAndGet()}"
        val ckpt = java.nio.file.Files
          .createTempDirectory("warc_twin_ckpt").toString
        val q = graft.streaming.WarcStream
          .records(s, dir, maxFilesPerTrigger = Some(1))
          .writeStream.format("memory").queryName(table)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(table)
          .filter($"rec_type" === "response" && $"http_status" === 200 &&
            $"http_content_type" === "text/html")
          .withColumn("site",
            regexp_extract($"url", "site(\\d+)\\.example", 1).cast("int"))
          .withColumn("text",
            regexp_replace($"payload".cast("string"), "<[^>]*>", " "))
          .withColumn("tokens",
            size(split(trim($"text"), "\\s+")).cast("long"))
          .withColumn("digest", md5($"text".cast("binary")))
          .groupBy($"site")
          .agg(count(lit(1)).as("pages"),
            countDistinct($"digest").as("uniq_docs"),
            sum($"tokens").as("tokens_total"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        kept AS (
          SELECT i, CAST(i % 50 AS INT) AS site, i % 700 AS g
          FROM pages WHERE i % 17 <> 0 AND i % 13 <> 5),
        stripped AS (
          SELECT site,
            regexp_replace(${htmlSql("g")}, '<[^>]*>', ' ', 'g') AS text
          FROM kept),
        scored AS (
          SELECT site, md5(text) AS digest,
            CAST(len(regexp_split_to_array(trim(text), '\\s+'))
              AS BIGINT) AS tokens
          FROM stripped)
        SELECT site, CAST(COUNT(*) AS BIGINT) AS pages,
          CAST(COUNT(DISTINCT digest) AS BIGINT) AS uniq_docs,
          CAST(SUM(tokens) AS BIGINT) AS tokens_total
        FROM scored GROUP BY site""")),

    // ----- revisit-record dedup accounting ----------------------------------
    // How real crawls dedup (WARC 1.1 §6.7.2): a repeated URL lands as
    // a body-less `revisit` record whose WARC-Refers-To names the
    // original response. The accounting query every crawl owner runs —
    // how many fetches did each stored page absorb? — is a
    // refers_to -> record_id equi-join (the 700-row original side
    // broadcasts; revisit blocks are header-only so the scan reads
    // almost no payload bytes). The oracle re-derives the revisit
    // multiplicity per dup group in closed form, so the row matches
    // only if the refers_to linkage survives both file codecs.
    Q("warc_revisit_dedup",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureRevisitFixture(
          "/tmp/graft_warc_revisit", RevisitPages)
        val recs = s.read.format("warc").load(dir)
        val originals = recs.filter($"rec_type" === "response")
          .select($"record_id", $"url")
        val revisits = recs.filter($"rec_type" === "revisit")
          .select($"refers_to")
        revisits.join(originals,
            revisits("refers_to") === originals("record_id"))
          .groupBy($"url")
          .agg(count(lit(1)).as("revisits"))
      },
      Some(s"""SELECT 'http://site' || (g % 50) || '.example/p' || g AS url,
          CAST(CASE WHEN g < ${RevisitPages % 700} THEN
            ${RevisitPages / 700} ELSE ${RevisitPages / 700 - 1} END
            AS BIGINT) AS revisits
        FROM (SELECT unnest(generate_series(0, 699)) AS g)""")),

    // ----- SINK-side revisit dedup (storage dedup at export) ------------------
    // The write-side twin of warc_revisit_dedup: with
    // option("dedupDigest","true") the warc sink turns repeated
    // payload digests into REVISIT records (WARC 1.1 §6.7.2
    // identical-payload-digest profile, headers only, no body) — the
    // storage-dedup convention real crawls ship with and the scan's
    // refers_to column already resolves. Export 600 rows over 200
    // distinct payloads, re-read, resolve each revisit to its
    // canonical copy: every group must show exactly 2 revisits whose
    // blocks carry ZERO payload bytes (the byte shrink) while the
    // canonical body survives verbatim. Scale: dedup state is one map
    // entry per DISTINCT payload per task; global dedup = repartition
    // by a digest column upstream so copies co-locate.
    Q("warc_sink_revisit_roundtrip",
      (s, _) => {
        import s.implicits._
        val n = 600
        val k = 200
        val dir = "/tmp/graft_warc_sink_revisit"
        s.range(n.toLong).select(
            $"id",
            concat(lit("http://rev.example/p"), $"id").as("url"),
            lit(200).as("http_status"),
            lit("text/plain").as("http_content_type"),
            concat(lit("<urn:rev:"), $"id", lit(">")).as("record_id"),
            encode(concat(lit("dup body "), $"id" % k), "UTF-8")
              .as("payload"))
          .coalesce(1).sortWithinPartitions($"id") // canonical = lowest id
          .write.format("warc").mode("overwrite")
          .option("dedupDigest", "true").save(dir)
        val recs = s.read.format("warc").load(dir)
        val originals = recs.filter($"rec_type" === "response")
          .select($"record_id", $"url".as("canonical_url"),
            octet_length($"payload").cast("long").as("body_bytes"))
        val revisits = recs.filter($"rec_type" === "revisit")
          .select($"refers_to",
            octet_length($"payload").cast("long").as("revisit_bytes"))
        // no broadcast hint: at crawl scale BOTH sides are unbounded
        // (originals is every response; a heavily-deduplicated crawl
        // has revisit counts of the same order) — let AQE pick the
        // join on the record_id equi-key
        revisits.join(originals,
            revisits("refers_to") === originals("record_id"))
          .groupBy($"canonical_url")
          .agg(count(lit(1)).as("revisits"),
            max($"revisit_bytes").as("max_revisit_bytes"),
            max($"body_bytes").as("body_bytes"))
      },
      Some("""SELECT 'http://rev.example/p' || g AS canonical_url,
          CAST(2 AS BIGINT) AS revisits,
          CAST(0 AS BIGINT) AS max_revisit_bytes,
          CAST(length('dup body ' || g) AS BIGINT) AS body_bytes
        FROM (SELECT unnest(generate_series(0, 199)) AS g)""")),

    // ----- chunked transfer decoding ----------------------------------------
    // Crawls store HTTP bodies AS CAPTURED, and the capture often kept
    // its Transfer-Encoding: chunked framing — every real WARC reader
    // de-chunks (warcio's content_stream). The fixture's chunk size
    // varies with the page (7-19 bytes) so boundaries land mid-tag,
    // mid-word, everywhere; the oracle knows only the page formula, so
    // the md5 matches only if the hex-size/CRLF reframe is byte-exact.
    Q("warc_chunked_decode",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_chunked", ChunkedPages, "chunked",
          graft.sources.warc.WarcSynth.chunkedResponseRecord)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long").as("page"),
            md5($"payload").as("body_md5"),
            octet_length($"payload").cast("long").as("body_bytes"))
      },
      Some(s"""SELECT i AS page,
          md5('<html><title>t' || (i % 700) || '</title><body>warc document '
            || (i % 700) || ' alpha beta gamma ' || (((i % 700) * 37) % 1000)
            || '</body></html>') AS body_md5,
          CAST(length('<html><title>t' || (i % 700)
            || '</title><body>warc document ' || (i % 700)
            || ' alpha beta gamma ' || (((i % 700) * 37) % 1000)
            || '</body></html>') AS BIGINT) AS body_bytes
        FROM (SELECT unnest(generate_series(0, ${ChunkedPages - 1})) AS i)""")),

    // ----- CDX sidecar survey (O(index), zero warc bytes) -------------------
    // The crawl-industry artifact: a `.wcdx` record-offset sidecar per
    // warc file (Common Crawl publishes CDX next to every crawl). Two
    // jobs: record-range SPLITS of big member-gzip files (the
    // one-task-per-100 GB straggler fix — WarcCdxSpec proves the
    // range-split scan row-identical to whole-file) and O(index)
    // surveys: this census reads ONLY the sidecars — not one page
    // byte (the spec pins recordsRead == 0). The oracle re-derives
    // the per-type/status populations from the synthesis formulas.
    Q("warc_cdx_survey",
      (s, _) => {
        import s.implicits._
        val dir = fixtureDir
        graft.sources.warc.WarcCdx.ensureIndexed(
          s.sessionState.newHadoopConf(), dir)
        graft.sources.warc.WarcCdx.survey(s, dir)
          .groupBy($"rec_type",
            coalesce($"http_status", lit(-1)).as("status"))
          .agg(count(lit(1)).as("n"),
            count($"url").as("n_urls"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        statuses AS (
          SELECT CASE WHEN i % 17 = 0 THEN 404 ELSE 200 END AS st
          FROM pages)
        SELECT 'warcinfo' AS rec_type, -1 AS status, 4::BIGINT AS n,
          0::BIGINT AS n_urls
        UNION ALL
        SELECT 'request', -1, ${NPages}::BIGINT, ${NPages}::BIGINT
        UNION ALL
        SELECT 'response', st,
          CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        FROM statuses GROUP BY st""")),

    // ----- CDX point lookup (the wayback access pattern) ---------------------
    // "Give me THIS url's stored page" — the crawl industry's bread-
    // and-butter read, and the reason CDX exists: with a fresh .wcdx
    // and a pushed url equality, the PLANNER slices only the matching
    // record's member (WarcCdx.planMatchingSlices), so the scan reads
    // one record of a 40k-page crawl instead of four whole files
    // (WarcCdxSpec pins the one-slice plan + recordsRead == 1). The
    // oracle re-derives the page's md5/length from the formulas.
    Q("warc_cdx_point_lookup",
      (s, _) => {
        import s.implicits._
        val dir = fixtureDir
        graft.sources.warc.WarcCdx.ensureIndexed(
          s.sessionState.newHadoopConf(), dir)
        val target = graft.sources.warc.WarcSynth.urlOf(12345)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response" && $"url" === target)
          .select($"url", $"http_status",
            md5($"payload").as("body_md5"),
            octet_length($"payload").cast("long").as("body_bytes"))
      },
      Some(s"""SELECT 'http://site45.example/p12345' AS url,
          CAST(200 AS INT) AS http_status,
          md5(${htmlSql("445")}) AS body_md5,
          CAST(length(${htmlSql("445")}) AS BIGINT) AS body_bytes""")),

    // ----- FOREIGN CDX(J) consumption (industry-index interop) ---------------
    // The single most realistic 100 TB workflow: point lookups and
    // pruned scans over a crawl the engine did NOT index itself. The
    // fixture is two member-gzip archives with NO .wcdx, indexed ONLY
    // by the CPython CDXJ writer (tools/warc_oracle.py cdxj — an
    // INDEPENDENT implementation: its own RFC 1952 member walk, its
    // own record parse, the standard SURT-keyed CDXJ line form). With
    // option("cdx", …) and pushed url equalities the planner slices
    // only the matching members (WarcForeignCdx -> the same
    // slicesFromEntries path as .wcdx; WarcCdxSpec pins one-slice
    // point plans and ZERO partitions on no-match). The oracle
    // re-derives each page's md5 from the formulas, so the lookups
    // match only if the foreign offsets/lengths landed on real member
    // boundaries.
    Q("warc_cdx_foreign_lookup",
      (s, _) => {
        import s.implicits._
        val dir = foreignCdxDir
        val pages = foreignLookupPages
        val lookups = pages.map(graft.sources.warc.WarcSynth.urlOf)
        s.read.format("warc").option("cdx", s"$dir/_index.cdxj")
          .load(dir)
          .filter($"rec_type" === "response" && $"url".isin(lookups: _*))
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long")
              .as("page"),
            $"http_status",
            md5($"payload").as("body_md5"),
            octet_length($"payload").cast("long").as("body_bytes"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest([${foreignLookupPages.mkString(", ")}]) AS i)
        SELECT i AS page, CAST(200 AS INT) AS http_status,
          md5(${htmlSql("(i % 700)")}) AS body_md5,
          CAST(length(${htmlSql("(i % 700)")}) AS BIGINT) AS body_bytes
        FROM pages""")),

    // ----- cluster.idx point lookup (the 300 GB-index shape) ------------------
    // The full Common Crawl index is hundreds of GB — driver-loading
    // it is the wrong shape at ANY cap. Real tooling goes through the
    // SECONDARY index: cluster.idx lines point at independently-
    // gzipped blocks of the sorted cdx-*.gz shards, and a url lookup
    // binary-searches cluster.idx ON DISK (seek probes, never a full
    // read), then reads only the matching block (+1 slack). The
    // planner takes this path automatically when option("cdx") names
    // a directory with a cluster.idx and url equalities are pushed —
    // O(lookups · log(index)) seeks + O(lookups · blockBytes)
    // whatever the crawl size (WarcCdxSpec pins the bounded
    // blocksRead and the one-slice plans). Index written by the
    // CPython writer — layout interop, not a round-trip.
    Q("warc_cdx_cluster_lookup",
      (s, _) => {
        import s.implicits._
        val dir = foreignCdxDir
        val lookups = clusterLookupPages
          .map(graft.sources.warc.WarcSynth.urlOf)
        s.read.format("warc").option("cdx", s"$dir/indexes")
          .load(dir)
          .filter($"rec_type" === "response" && $"url".isin(lookups: _*))
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long")
              .as("page"),
            $"http_status",
            md5($"payload").as("body_md5"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest([${clusterLookupPages.mkString(", ")}]) AS i)
        SELECT i AS page, CAST(200 AS INT) AS http_status,
          md5(${htmlSql("(i % 700)")}) AS body_md5
        FROM pages""")),

    // ----- Common Crawl domain extraction via cluster.idx range -------------
    // "Give me everything under site7.example/" — the OTHER Common
    // Crawl access pattern next to point lookups: a pushed url PREFIX
    // becomes a SURT-key RANGE over cluster.idx (floor block through
    // the first block past prefix+U+FFFF), so the blocks read are
    // proportional to the MATCHING data, never the index or crawl
    // size, and the planner slices exactly the member extents of that
    // one site out of archives that carry 50 sites. Host-incomplete
    // prefixes (which could match other domains) are rejected from
    // range planning by rangeablePrefix — WarcCdxSpec pins that and
    // the bounded blocksRead. md5 gated to 200/html rows because the
    // 404 and image populations have non-formula bodies.
    Q("warc_cdx_prefix_scan",
      (s, _) => {
        import s.implicits._
        val dir = foreignCdxDir
        s.read.format("warc").option("cdx", s"$dir/indexes")
          .load(dir)
          .filter($"rec_type" === "response" &&
            $"url".startsWith("http://site7.example/"))
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long")
              .as("page"),
            $"http_status",
            when($"http_status" === 200 &&
              $"http_content_type" === "text/html", md5($"payload"))
              .as("body_md5"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${ForeignPages - 1})) AS i)
        SELECT i AS page,
          CAST(CASE WHEN i % 17 = 0 THEN 404 ELSE 200 END AS INT)
            AS http_status,
          CASE WHEN i % 17 = 0 OR i % 13 = 5 THEN NULL
            ELSE md5(${htmlSql("(i % 700)")}) END AS body_md5
        FROM pages WHERE i % 50 = 7""")),

    // ----- standard CDXJ export -> foreign-path round-trip -----------------
    // The interop loop closed (round-16 verdict "What's missing #3"):
    // the sink can emit pywb-standard `.cdxj` twins at commit
    // (option("cdxj","true")), so replay tooling consumes an
    // engine-exported crawl WITHOUT reindexing — and the proof is a
    // round trip through the engine's own FOREIGN index path: export
    // with the private `.wcdx` DISABLED, read back with option("cdx")
    // pointed at the exported CDXJ lines only. The point lookups plan
    // pruned member slices off those lines (no sidecar exists to
    // fall back on), so a wrong surt key, offset, length, or sort
    // order in the export breaks the row. tools/warc_oracle.py cdxj
    // independently re-validates every exported line against the
    // archive bytes (WarcCdxjSpec).
    Q("warc_cdxj_export_roundtrip",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_warc_cdxj_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        Tables.documents(s, d)
          .select(
            concat(lit("http://corpus.example/doc/"), $"doc_id")
              .as("url"),
            concat(lit("<urn:uuid:graft-cdxj-"), $"doc_id", lit(">"))
              .as("record_id"),
            lit(graft.sources.warc.WarcSynth.Date).as("warc_date"),
            lit(200).as("http_status"),
            lit("text/plain; charset=utf-8").as("http_content_type"),
            encode($"text", "UTF-8").as("payload"))
          .repartition(4)
          .write.format("warc").mode("overwrite")
          .option("writeWcdx", "false").option("cdxj", "true")
          .save(outDir)
        val lookups = CdxjLookupDocs
          .map(i => s"http://corpus.example/doc/$i")
        s.read.format("warc").option("cdx", outDir)
          .load(outDir)
          .filter($"rec_type" === "response" && $"url".isin(lookups: _*))
          .select(
            regexp_extract($"url", "doc/(\\d+)$", 1).cast("long")
              .as("doc_id"),
            $"http_status",
            md5($"payload").as("payload_md5"))
      },
      Some(s"""SELECT doc_id, CAST(200 AS INT) AS http_status,
          md5(text) AS payload_md5
        FROM documents
        WHERE doc_id IN (${CdxjLookupDocs.mkString(", ")})""")),

    // ----- request-record pairing (crawl QA off the fetch side) ------------
    // Real crawls store `request` records linked to their responses by
    // WARC-Concurrent-To (WARC 1.1 §5.7) — the fetch metadata crawl QA
    // runs on: which User-Agent fetched what, how many hosts each bot
    // touched, how much body each pulled. The pairing joins REQUEST ->
    // RESPONSE on the header link (`concurrent_to` = `record_id`),
    // never on record adjacency — interleaved or reordered archives
    // pair identically. Scale: one equi-key shuffle join (both sides
    // crawl-sized — no broadcast hint, AQE picks), then a 4-key
    // aggregation; request records are headers-only so the request
    // side scans without payload bytes.
    Q("warc_request_pairs",
      (s, _) => {
        import s.implicits._
        val n = 800
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_reqs", n, "req",
          i => graft.sources.warc.WarcSynth.pairedRequestRecord(i) ++
            graft.sources.warc.WarcSynth.responseRecord(i))
        val scan = s.read.format("warc").load(dir)
        val reqs = scan.filter($"rec_type" === "request")
          .select($"concurrent_to",
            element_at($"http_headers", "user-agent").as("ua"),
            element_at($"http_headers", "host").as("req_host"))
        val resps = scan.filter($"rec_type" === "response")
          .select($"record_id", $"http_status",
            octet_length($"payload").cast("long").as("body_bytes"))
        reqs.join(resps, reqs("concurrent_to") === resps("record_id"))
          .groupBy($"ua")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct($"req_host").as("n_hosts"),
            sum(when($"http_status" === 200, 1L).otherwise(0L))
              .as("n_ok"),
            sum($"body_bytes").as("body_bytes"))
      },
      Some(s"""WITH p AS (SELECT unnest(generate_series(0, 799)) AS i),
        r AS (SELECT i,
          'graftbot/' || (1 + i % 4) || '.0' AS ua,
          'site' || (i % 50) || '.example' AS req_host,
          CASE WHEN i % 17 = 0 THEN 404 ELSE 200 END AS status,
          CAST(CASE WHEN i % 13 = 5 THEN 26 + i % 30
               ELSE length(${htmlSql("(i % 700)")}) END AS BIGINT) AS bb
          FROM p)
        SELECT ua, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(DISTINCT req_host) AS BIGINT) AS n_hosts,
          CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_ok,
          CAST(SUM(bb) AS BIGINT) AS body_bytes
        FROM r GROUP BY ua""")),

    // ----- redirect-chain resolution (crawl-hygiene URL canonicalizer) -----
    // Real crawls are full of 3xx hops, and URL-level dedup/attribution
    // must key on the FINAL landing page, not the entry URL. The
    // redirect map (url -> Location, off the http_headers map column)
    // is a small fraction of the crawl, so it persists once and
    // resolves chains by a bounded driver loop of BROADCAST
    // left-joins (4 hops covers practically all real chains; browsers
    // cap around 20) — the corpus-sized side is touched exactly once.
    // The fixture builds one- and two-hop chains (301 -> 302 -> 200)
    // with a tail guard so every chain stays inside the crawl; the
    // oracle replays the role arithmetic closed-form.
    Q("warc_redirect_chains",
      (s, _) => {
        import s.implicits._
        val n = 600
        val dir = graft.sources.warc.WarcSynth.ensureRedirectFixture(
          "/tmp/graft_warc_redirects", n)
        val scan = s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long").as("page"),
            $"http_status".as("status"),
            regexp_extract(
              element_at($"http_headers", "location"), "/p(\\d+)$", 1)
              .cast("long").as("loc_page"))
        val redirects = scan
          .filter($"status".isin(301, 302) && $"loc_page".isNotNull)
          .select($"page".as("src"), $"loc_page".as("dst"))
          .persist()
        var resolved = redirects
          .select($"src".as("page"), $"dst".as("cur"), lit(1L).as("n_hops"))
        for (k <- 1 to 3) {
          val r = redirects.select($"src".as(s"s$k"), $"dst".as(s"d$k"))
          resolved = resolved
            .join(broadcast(r), resolved("cur") === r(s"s$k"), "left")
            .select($"page",
              coalesce(col(s"d$k"), $"cur").as("cur"),
              ($"n_hops" + when(col(s"d$k").isNotNull, 1L).otherwise(0L))
                .as("n_hops"))
        }
        val landings = scan.select($"page".as("lp"), $"status".as("ls"))
        // (the persisted redirect map releases with the session — the
        // bounded-artifact discipline; at scale it would be an
        // Artifact-managed cache like the dedup indexes)
        // broadcast the RESOLVED side: it derives from the redirect
        // map (3xx responses — a small fraction of the crawl), while
        // `landings` is the full corpus-sized response scan and must
        // never ride an exchange to every executor
        broadcast(resolved)
          .join(landings, resolved("cur") === landings("lp"))
          .select($"page", $"cur".as("final_page"),
            $"n_hops".cast("int").as("n_hops"),
            $"ls".cast("int").as("final_status"))
      },
      Some("""WITH p AS (SELECT unnest(generate_series(0, 599)) AS i)
        SELECT i AS page,
          CASE i % 6 WHEN 0 THEN i + 3 WHEN 1 THEN i + 2
            ELSE i + 5 END AS final_page,
          CAST(CASE i % 6 WHEN 0 THEN 2 ELSE 1 END AS INT) AS n_hops,
          CAST(200 AS INT) AS final_status
        FROM p WHERE i % 6 IN (0, 1, 4) AND i < 594""")),

    // ----- sitemap survey (the crawl-frontier protocol) ---------------------
    // Captured sitemap.xml pages (sitemaps.org) tell a crawl operator
    // what each site DECLARES it serves and how fresh it claims to be —
    // the frontier-planning input next to robots.txt. The XML parse is
    // Spark's built-in xpath over the payload (no UDF); loc/lastmod
    // arrays stay zipped so pairs can't misalign; per-site rollup with
    // string min/max (ISO dates sort lexicographically). One scan, one
    // tiny-key shuffle. The oracle replays the synthesis closed form
    // with its own date arithmetic, so a namespace-handling or
    // element-order slip in the xpath mismatches.
    Q("warc_sitemap_survey",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureSitemapFixture(
          "/tmp/graft_warc_sitemaps", 160)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response" &&
            $"url".endsWith("/sitemap.xml"))
          .select(
            regexp_extract($"url", "site(\\d+)\\.example", 1).cast("long")
              .as("site"),
            expr("xpath(CAST(payload AS STRING), '//*[local-name()=\"url\"]/*[local-name()=\"loc\"]/text()')")
              .as("locs"),
            expr("xpath(CAST(payload AS STRING), '//*[local-name()=\"url\"]/*[local-name()=\"lastmod\"]/text()')")
              .as("mods"))
          .select($"site", explode(arrays_zip($"locs", $"mods")).as("u"))
          .groupBy($"site")
          .agg(count(lit(1)).as("n_urls"),
            min($"u.mods").as("first_lastmod"),
            max($"u.mods").as("last_lastmod"),
            countDistinct($"u.locs").as("n_distinct_locs"))
      },
      Some("""WITH sites AS (
          SELECT unnest(generate_series(0, 159)) AS i),
        urls AS (
          SELECT i, unnest(generate_series(0, 2 + i % 4)) AS j FROM sites),
        rows_ AS (
          SELECT i, j,
            '2026-0' || (1 + (i + j) % 9) || '-' || (10 + (i * 3 + j) % 18)
              AS lastmod
          FROM urls)
        SELECT i AS site, CAST(COUNT(*) AS BIGINT) AS n_urls,
          MIN(lastmod) AS first_lastmod,
          MAX(lastmod) AS last_lastmod,
          CAST(COUNT(*) AS BIGINT) AS n_distinct_locs
        FROM rows_ GROUP BY i""")),

    // ----- sitemap FRONTIER via robots.txt (RFC 9309 §2.3) ------------------
    // Real crawlers discover sitemaps through robots.txt's `Sitemap:`
    // directive, not the /sitemap.xml path convention — a third of the
    // fixture's sites serve their sitemap at a non-default path ONLY
    // discoverable that way, and those sites also carry an UNDECLARED
    // decoy at /sitemap.xml that convention-based discovery would
    // wrongly count. The frontier: parse directives out of robots
    // captures, aggregate to one row per declared sitemap url (a
    // host-cardinality set — the Aggregate is what makes the broadcast
    // side bounded), then join captures ON THE DECLARED URL and parse
    // the XML as in warc_sitemap_survey. `via` reports whether the
    // declared location was the convention path or not, straight off
    // the url. Scale: robots parse is a payload-projected scan of
    // /robots.txt captures only (pushed url suffix... evaluated
    // residually), one broadcast of the host-sized frontier, one
    // tiny-key rollup shuffle.
    Q("warc_sitemap_frontier",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth
          .ensureSitemapFrontierFixture("/tmp/graft_warc_smfrontier", 150)
        val scan = s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
        val declared = scan.filter($"url".endsWith("/robots.txt"))
          .select(explode(split($"payload".cast("string"), "\\r?\\n"))
            .as("line"))
          .filter(lower(trim($"line")).startsWith("sitemap:"))
          .select(trim(expr("substring(trim(line), 9)")).as("sm_url"))
          .groupBy($"sm_url").agg(count(lit(1)).as("n_decl"))
        val captures = scan.select($"url", $"payload")
        broadcast(declared)
          .join(captures, declared("sm_url") === captures("url"))
          .select(
            regexp_extract($"sm_url", "site(\\d+)\\.example", 1)
              .cast("long").as("site"),
            when($"sm_url".endsWith("/sitemap.xml"), "default")
              .otherwise("declared").as("via"),
            expr("xpath(CAST(payload AS STRING), '//*[local-name()=\"url\"]/*[local-name()=\"loc\"]/text()')")
              .as("locs"),
            expr("xpath(CAST(payload AS STRING), '//*[local-name()=\"url\"]/*[local-name()=\"lastmod\"]/text()')")
              .as("mods"))
          .select($"site", $"via",
            explode(arrays_zip($"locs", $"mods")).as("u"))
          .groupBy($"site", $"via")
          .agg(count(lit(1)).as("n_urls"),
            min($"u.mods").as("first_lastmod"),
            max($"u.mods").as("last_lastmod"))
      },
      Some("""WITH sites AS (
          SELECT unnest(generate_series(0, 149)) AS i),
        urls AS (
          SELECT i, unnest(generate_series(0, 2 + i % 4)) AS j FROM sites),
        rows_ AS (
          SELECT i, j,
            '2026-0' || (1 + (i + j) % 9) || '-' || (10 + (i * 3 + j) % 18)
              AS lastmod
          FROM urls)
        SELECT i AS site,
          CASE WHEN i % 3 = 0 THEN 'declared' ELSE 'default' END AS via,
          CAST(COUNT(*) AS BIGINT) AS n_urls,
          MIN(lastmod) AS first_lastmod,
          MAX(lastmod) AS last_lastmod
        FROM rows_ GROUP BY i""")),

    // ----- nested sitemapindex traversal (sitemaps.org index form) ----------
    // Big sites don't serve one urlset — they serve a <sitemapindex>
    // whose children carry the entries (the 50k-url/50MB caps force
    // it), and robots.txt declares the INDEX. Two frontier hops, both
    // with host-cardinality broadcast sides (Aggregate-bounded like
    // warc_sitemap_frontier): robots -> declared docs, index children
    // -> child urlsets; direct urlsets from hop 1 and child urlsets
    // from hop 2 union into one per-site rollup. A parser that
    // confuses the two root elements, drops a child, or double-counts
    // a urlset breaks n_urls or n_docs. Scale: two bounded broadcasts,
    // one tiny-key shuffle.
    Q("warc_sitemap_index",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth
          .ensureSitemapIndexFixture("/tmp/graft_warc_smindex", 120)
        val scan = s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
        val declared = scan.filter($"url".endsWith("/robots.txt"))
          .select(explode(split($"payload".cast("string"), "\\r?\\n"))
            .as("line"))
          .filter(lower(trim($"line")).startsWith("sitemap:"))
          .select(trim(expr("substring(trim(line), 9)")).as("sm_url"))
          .groupBy($"sm_url").agg(count(lit(1)).as("n_decl"))
        // the xpath argument is guarded BEFORE the join: the optimizer
        // is free to evaluate projections early (and real crawls serve
        // garbage at declared urls) — a non-XML body becomes an empty
        // document instead of a parse crash, and the join/rollup math
        // is unchanged
        val caps = scan
          .select($"url",
            when(substring($"payload".cast("string"), 1, 1) === "<",
              $"payload".cast("string")).otherwise("<x/>").as("xml"))
        val hop1 = broadcast(declared)
          .join(caps, declared("sm_url") === caps("url"))
          .select($"sm_url",
            expr("xpath(xml, '//*[local-name()=\"sitemap\"]/*[local-name()=\"loc\"]/text()')")
              .as("kids"),
            expr("xpath(xml, '//*[local-name()=\"url\"]/*[local-name()=\"loc\"]/text()')")
              .as("locs"))
        val children = hop1
          .select(explode($"kids").as("child_url"))
          .groupBy($"child_url").agg(count(lit(1)).as("n_ref"))
        // hop 2 re-reads the captures under FRESH attribute names: a
        // second join against the same `caps` plan is a self-join on
        // shared attribute ids, and the resolver can pick the wrong
        // side (robots.txt rows reached the XML parse here)
        val caps2 = scan
          .select($"url".as("url2"),
            when(substring($"payload".cast("string"), 1, 1) === "<",
              $"payload".cast("string")).otherwise("<x/>").as("xml2"))
        val hop2 = broadcast(children)
          .join(caps2, children("child_url") === caps2("url2"))
          .select($"child_url".as("src"),
            explode(expr("xpath(xml2, '//*[local-name()=\"url\"]/*[local-name()=\"loc\"]/text()')"))
              .as("loc"))
        val direct = hop1.filter(size($"locs") > 0)
          .select($"sm_url".as("src"), explode($"locs").as("loc"))
        direct.unionByName(hop2)
          .select(
            regexp_extract($"loc", "site(\\d+)\\.example", 1).cast("long")
              .as("site"),
            $"src".contains("/maps/part-").as("from_index"),
            $"src")
          .groupBy($"site")
          .agg(max($"from_index").as("nested"),
            count(lit(1)).as("n_urls"),
            countDistinct($"src").as("n_docs"))
      },
      Some("""SELECT i AS site, i % 4 = 0 AS nested,
          CAST(CASE WHEN i % 4 = 0 THEN (2 + i % 3) + (2 + (i + 1) % 3)
               ELSE 3 + i % 4 END AS BIGINT) AS n_urls,
          CAST(CASE WHEN i % 4 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_docs
        FROM (SELECT unnest(generate_series(0, 119)) AS i)""")),

    // ----- CDX dedup survey (digests off the index, zero page bytes) --------
    // The v2 sidecar carries the CDX digest column (md5 of the payload
    // as the scan returns it), so crawl-wide dedup ACCOUNTING — how
    // many distinct pages does each site really have? — runs off the
    // index alone: no warc byte is opened (the spec pins recordsRead
    // == 0 for survey paths). The oracle recomputes every digest from
    // the page formulas, so an indexer that hashed the wrong byte
    // range (headers in, encoding undone, ...) breaks every row.
    Q("warc_cdx_dedup_survey",
      (s, _) => {
        import s.implicits._
        val dir = fixtureDir
        graft.sources.warc.WarcCdx.ensureIndexed(
          s.sessionState.newHadoopConf(), dir)
        graft.sources.warc.WarcCdx.survey(s, dir)
          .filter($"rec_type" === "response" &&
            $"http_content_type" === "text/html")
          .groupBy(regexp_extract($"url", "site(\\d+)\\.example", 1)
            .cast("int").as("site"))
          .agg(count(lit(1)).as("pages"),
            countDistinct($"digest").as("uniq_payloads"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        texts AS (
          SELECT CAST(i % 50 AS INT) AS site,
            md5(${htmlSql("(i % 700)")}) AS d
          FROM pages WHERE i % 13 <> 5)
        SELECT site, CAST(COUNT(*) AS BIGINT) AS pages,
          CAST(COUNT(DISTINCT d) AS BIGINT) AS uniq_payloads
        FROM texts GROUP BY site""")),

    // ----- Content-Encoding decode ------------------------------------------
    // The first thing a user hits on a NON-synthetic crawl: Common
    // Crawl bodies mostly carry `Content-Encoding: gzip` (and deflate)
    // INSIDE the captured block — tokenizing the raw bytes would dedup
    // deflate streams, not text. The walk decodes by default (warcio's
    // content_stream parity): the fixture cycles gzip / zlib-deflate /
    // gzip-under-chunked (layering: de-chunk THEN content-decode) /
    // raw-deflate (the spec-violating server readers must sniff) /
    // brotli (RFC 7932 via the clean-room BrotliCodec: a REAL
    // static-dictionary reference opens each br body — word 0 through
    // Appendix B transform 4 decodes to "Time " before the page —
    // so the §8 machinery is oracle-gated on every run), and the
    // oracle knows only the page formula — the md5 matches only if
    // every decode path is byte-exact. `encoding` reports the header
    // as captured. Scale: per-record in-memory inflate, no shuffle.
    Q("warc_content_encoding",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_ce2", CePages, "ce",
          graft.sources.warc.WarcSynth.contentEncodedResponseRecord)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long").as("page"),
            $"http_content_encoding".as("encoding"),
            md5($"payload").as("body_md5"),
            octet_length($"payload").cast("long").as("body_bytes"))
      },
      Some(s"""WITH p AS (
          SELECT i,
            CASE WHEN i % 5 = 4 THEN 'Time ' ELSE '' END
              || '<html><title>t' || (i % 700)
              || '</title><body>warc document ' || (i % 700)
              || ' alpha beta gamma ' || (((i % 700) * 37) % 1000)
              || '</body></html>' AS body
          FROM (SELECT unnest(generate_series(0, ${CePages - 1})) AS i))
        SELECT i AS page,
          CASE WHEN i % 5 IN (1, 3) THEN 'deflate'
               WHEN i % 5 = 4 THEN 'br' ELSE 'gzip' END
            AS encoding,
          md5(body) AS body_md5,
          CAST(length(body) AS BIGINT) AS body_bytes
        FROM p""")),

    // ----- full HTTP header map ------------------------------------------------
    // The promoted columns (status/content-type/content-encoding)
    // cover the hot filters, but real pipelines also route on
    // arbitrary captured headers (Last-Modified windows, Server
    // census, X-Robots-Tag hygiene): `http_headers` exposes EVERY
    // header field as a map (names lowercased, repeats '\n'-joined).
    // The census extracts content-type/content-length back OUT of the
    // map and reconciles the byte totals against the page formulas —
    // the row matches only if the map carries each header verbatim.
    // Scale: headers-only projection (payload blocks seek-skipped),
    // ONE tiny-key aggregation shuffle.
    Q("warc_http_headers",
      (s, _) => {
        import s.implicits._
        val dir = fixtureDir
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
          .select(
            element_at($"http_headers", "content-type").as("ctype"),
            element_at($"http_headers", "content-length")
              .cast("long").as("clen"),
            size(map_keys($"http_headers")).as("n_hdrs"))
          .groupBy($"ctype")
          .agg(count(lit(1)).as("n"),
            sum($"clen").as("body_bytes"),
            max($"n_hdrs").as("max_hdrs"),
            min($"n_hdrs").as("min_hdrs"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${NPages - 1})) AS i),
        r AS (SELECT i,
          CASE WHEN i % 13 = 5 THEN 'image/gif'
               ELSE 'text/html' END AS ctype,
          CASE WHEN i % 13 = 5 THEN 26 + i % 30
               ELSE length(${htmlSql("(i % 700)")}) END AS clen
          FROM pages)
        SELECT ctype, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(clen) AS BIGINT) AS body_bytes,
          CAST(2 AS INT) AS max_hdrs,
          CAST(2 AS INT) AS min_hdrs
        FROM r GROUP BY ctype""")),

    // ----- robots.txt policy filtering (RFC 9309) -----------------------------
    // Crawl hygiene every training pipeline re-checks: a site's
    // /robots.txt decides which stored pages may be used. The crawl
    // itself carries the policy (CC stores robots.txt fetches as
    // ordinary response records). Semantics are the FULL RFC 9309
    // matcher ([[graft.functions.RobotsMatcher]]): among all matching
    // Allow/Disallow rules the LONGEST pattern wins, Allow wins
    // length ties, `*` wildcards and `$` end anchors match per
    // §2.2.2/§2.2.3, and a rule-less site allows everything. The
    // fixture exercises every clause (longer-Allow carve-out,
    // wildcard+anchor, equal-length tie) and the DuckDB oracle
    // RECOMPUTES longest-match over the same rules with a window
    // rank — not a baked flag formula. Scale: rules collapse to ONE
    // array row per site -> broadcast; pages never carry payload
    // (url-only projection); ONE site-agg shuffle.
    Q("warc_robots_filter",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_robots", RobotsRecs, "robots",
          graft.sources.warc.WarcSynth.robotsFixtureRecord)
        val recs = s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
        val rules = recs.filter($"url".endsWith("/robots.txt"))
          .select(
            regexp_extract($"url", "site(\\d+)\\.example", 1)
              .cast("int").as("site"),
            explode(split($"payload".cast("string"), "\n")).as("line"))
          .filter($"line".startsWith("Allow:") ||
            $"line".startsWith("Disallow:"))
          .select($"site",
            $"line".startsWith("Allow:").as("allow"),
            trim(regexp_replace($"line", "^(Allow|Disallow):", ""))
              .as("pattern"))
          .filter(length($"pattern") > 0) // empty Disallow: = no rule
          .groupBy($"site")
          .agg(collect_list(struct($"allow", $"pattern")).as("rules"))
        val verdict = udf((rs: Seq[org.apache.spark.sql.Row],
            path: String) =>
          rs == null || graft.functions.RobotsMatcher.allowed(
            rs.map(r => (r.getBoolean(0), r.getString(1))), path))
        val pages = recs.filter(!$"url".endsWith("/robots.txt"))
          .select(
            regexp_extract($"url", "site(\\d+)\\.example", 1)
              .cast("int").as("site"),
            regexp_extract($"url", "example(/.*)$", 1).as("path"))
        pages.join(broadcast(rules), Seq("site"), "left")
          .withColumn("blocked",
            when(verdict($"rules", $"path"), 0L).otherwise(1L))
          .groupBy($"site")
          .agg(count(lit(1)).as("pages_total"),
            sum($"blocked").as("pages_blocked"),
            (count(lit(1)) - sum($"blocked")).as("pages_kept"))
      },
      // the oracle derives each page's verdict by longest-match RANK
      // over the same per-class rule set (patterns as anchored
      // regexes, plen = RFC pattern length), Allow breaking ties
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(50, ${RobotsRecs - 1})) AS i),
        p AS (
          SELECT i, CAST(i % 50 AS INT) AS site,
            CASE CAST(i % 5 AS INT)
              WHEN 0 THEN '/private/p' || i
              WHEN 1 THEN '/private/pub/p' || i
              WHEN 2 THEN '/p' || i || '.tmp'
              ELSE '/p' || i END AS path
          FROM pages),
        matched AS (
          SELECT p.i, r.allow, r.plen
          FROM p JOIN (VALUES
              (0, FALSE, '^/private/', 9),
              (1, FALSE, '^/private/', 9),
              (1, TRUE,  '^/private/pub/', 13),
              (2, FALSE, '^/.*\\.tmp$$', 7),
              (3, FALSE, '^/p', 2),
              (3, TRUE,  '^/p', 2),
              (5, FALSE, '^/p.*3$$', 5))
              AS r(cls, allow, re, plen)
            ON p.site % 6 = r.cls AND regexp_matches(p.path, r.re)),
        best AS (
          SELECT i, allow, row_number() OVER (PARTITION BY i
            ORDER BY plen DESC, CASE WHEN allow THEN 0 ELSE 1 END) AS rn
          FROM matched),
        verdict AS (
          SELECT p.site,
            CASE WHEN b.allow IS FALSE THEN 1 ELSE 0 END AS blocked
          FROM p LEFT JOIN (SELECT i, allow FROM best WHERE rn = 1) b
            USING (i))
        SELECT site, CAST(COUNT(*) AS BIGINT) AS pages_total,
          CAST(SUM(blocked) AS BIGINT) AS pages_blocked,
          CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS pages_kept
        FROM verdict GROUP BY site""")),

    // ----- crawl time-window survey (warc_date pushdown) ----------------------
    // The fetch-window query every crawl owner runs ("what landed in
    // the second half of February?"): ISO 8601 WARC-Dates compare
    // lexicographically = chronologically, so string range predicates
    // on warc_date push to BOTH skip points — the record walk skips
    // out-of-window blocks in place, and the CDX planner prunes
    // out-of-window records from the slices entirely (the spec pins
    // both seams). The filter stays residual; the oracle re-derives
    // the per-day populations from day(i) = 1 + i%28. Scale: a
    // date-bounded survey of an indexed 100 TB crawl reads only the
    // window's container bytes.
    Q("warc_date_survey",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_dated", DatedPages, "dated",
          graft.sources.warc.WarcSynth.datedResponseRecord)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response" &&
            $"warc_date" >= "2026-02-15")
          .groupBy(substring($"warc_date", 9, 2).cast("int").as("day"))
          .agg(count(lit(1)).as("pages"),
            countDistinct(
              regexp_extract($"url", "site(\\d+)\\.example", 1)
                .cast("int")).as("sites"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${DatedPages - 1})) AS i),
        dated AS (
          SELECT CAST(1 + i % 28 AS INT) AS day, CAST(i % 50 AS INT)
            AS site
          FROM pages WHERE 1 + i % 28 >= 15)
        SELECT day, CAST(COUNT(*) AS BIGINT) AS pages,
          CAST(COUNT(DISTINCT site) AS BIGINT) AS sites
        FROM dated GROUP BY day""")),

    // ----- charset-aware payload decode ---------------------------------------
    // The mojibake trap: half the web serves legacy ISO-8859-1 and a
    // pipeline that blindly casts bytes to UTF-8 silently corrupts
    // every non-ASCII character — two byte-identical texts in
    // different charsets then dedup apart. The operator routes each
    // body through the charset its OWN Content-Type header declares
    // (the same logical text arrives as latin-1 on odd pages, UTF-8 on
    // even); the oracle reconstructs the unicode text with chr(233)
    // codepoints, so the md5 matches only if both decode paths land on
    // identical strings. Scale: per-row decode, no shuffle.
    Q("warc_charset_decode",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_charset", CharsetPages, "cs",
          graft.sources.warc.WarcSynth.charsetResponseRecord)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "response")
          .withColumn("text",
            when(lower($"http_content_type").contains("iso-8859-1"),
              decode($"payload", "ISO-8859-1"))
              .otherwise(decode($"payload", "UTF-8")))
          .select(
            regexp_extract($"url", "/p(\\d+)$", 1).cast("long")
              .as("page"),
            md5(encode($"text", "UTF-8")).as("text_md5"),
            length($"text").cast("long").as("chars"),
            octet_length($"payload").cast("long").as("raw_bytes"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${CharsetPages - 1})) AS i),
        texts AS (
          SELECT i, 'caf' || chr(233) || ' doc ' || (i % 700) || ' r'
            || chr(233) || 'sum' || chr(233) || ' '
            || (((i % 700) * 37) % 1000) AS t
          FROM pages)
        SELECT i AS page, md5(t) AS text_md5,
          CAST(length(t) AS BIGINT) AS chars,
          CAST(CASE WHEN i % 2 = 1 THEN length(t)
               ELSE length(t) + 3 END AS BIGINT) AS raw_bytes
        FROM texts""")),

    // ----- WAT metadata lake: the crawl outlink graph ----------------------
    // The third member of Common Crawl's WARC/WAT/WET triple:
    // `metadata` records whose JSON block carries the page's extracted
    // HTML links in the WAT envelope shape. The source reads them
    // generically (non-HTTP block -> payload verbatim); the query
    // parses the nested envelope with from_json, explodes the links,
    // and surveys the inter-site link structure — the graph the
    // pagerank family starts from. The oracle re-derives the link
    // population from the outlink formulas (src i -> (i+1+31j) % n for
    // j < 2+i%3) with a generate_series cross join. Scale: narrow
    // parse + explode, ONE site-aggregate shuffle; page bytes are the
    // JSON itself (no HTML ever read).
    Q("warc_wat_outlinks",
      (s, _) => {
        import s.implicits._
        import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_wat", WatPages, "wat",
          graft.sources.warc.WarcSynth.watRecord(WatPages))
        val linkT = new StructType()
          .add("path", StringType).add("url", StringType)
        val watSchema = new StructType().add("Envelope", new StructType()
          .add("WARC-Header-Metadata",
            new StructType().add("WARC-Target-URI", StringType))
          .add("Payload-Metadata", new StructType()
            .add("HTML-Metadata",
              new StructType().add("Links", ArrayType(linkT)))))
        val env = s.read.format("warc").load(dir)
          .filter($"rec_type" === "metadata")
          .select(from_json($"payload".cast("string"), watSchema)
            .getField("Envelope").as("e"))
        env
          .select(
            regexp_extract(
              $"e".getField("WARC-Header-Metadata")
                .getField("WARC-Target-URI"), "/p(\\d+)$", 1)
              .cast("long").as("src"),
            explode($"e".getField("Payload-Metadata")
              .getField("HTML-Metadata").getField("Links")).as("link"))
          .select($"src",
            regexp_extract($"link".getField("url"), "/p(\\d+)$", 1)
              .cast("long").as("dst"))
          .groupBy(($"dst" % 50).cast("int").as("site"))
          .agg(count(lit(1)).as("inlinks"),
            countDistinct(($"src" % 50).cast("int"))
              .as("uniq_src_sites"))
      },
      Some(s"""WITH pages AS (
          SELECT unnest(generate_series(0, ${WatPages - 1})) AS i),
        js AS (SELECT unnest(generate_series(0, 3)) AS j),
        links AS (
          SELECT i AS src, (i + 1 + 31*j) % ${WatPages} AS dst
          FROM pages, js WHERE j < 2 + (i % 3))
        SELECT CAST(dst % 50 AS INT) AS site,
          CAST(COUNT(*) AS BIGINT) AS inlinks,
          CAST(COUNT(DISTINCT src % 50) AS BIGINT) AS uniq_src_sites
        FROM links GROUP BY 1""")),

    // ----- WET extracted-text lake ------------------------------------------
    // Common Crawl ships a WET sibling next to every WARC: `conversion`
    // records whose block IS the extracted plain text. The source reads
    // them generically (non-HTTP block -> payload verbatim, refers_to
    // linking back to the response); the corpus survey groups per site.
    Q("warc_wet_scan",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.warc.WarcSynth.ensureTwoFileFixture(
          "/tmp/graft_warc_wet", WetPages, "wet",
          graft.sources.warc.WarcSynth.conversionRecord)
        s.read.format("warc").load(dir)
          .filter($"rec_type" === "conversion")
          .withColumn("site",
            regexp_extract($"url", "site(\\d+)\\.example", 1).cast("int"))
          .withColumn("text", $"payload".cast("string"))
          .groupBy($"site")
          .agg(count(lit(1)).as("pages"),
            countDistinct(md5($"text".cast("binary"))).as("uniq_texts"),
            sum(size(split($"text", "\\s+")).cast("long")).as("tokens"))
      },
      Some(s"""WITH recs AS (
          SELECT CAST(i % 50 AS INT) AS site,
            'warc document ' || (i % 700) || ' alpha beta gamma '
              || (((i % 700) * 37) % 1000) AS text
          FROM (SELECT unnest(generate_series(0, ${WetPages - 1})) AS i))
        SELECT site, CAST(COUNT(*) AS BIGINT) AS pages,
          CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS uniq_texts,
          CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
            AS tokens
        FROM recs GROUP BY site"""))
  )
}
