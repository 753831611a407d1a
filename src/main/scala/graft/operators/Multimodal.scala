package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief; SURVEY.md §2C): media
  * payloads ride as opaque `BINARY` columns with a typed metadata struct,
  * and decode/feature-extraction runs as a typed `mapPartitions` over the
  * batch — the Scala analogue of a Pandas-UDF `mapInPandas` stage.
  *
  * The actual image/audio decode is STUBBED (codec libraries are not in
  * this container): `FakeMediaCodec.decode` below is a deterministic
  * stand-in, clearly marked, with the real Spark-side contract — schema,
  * per-partition batching, no shuffle, binary in / features out — fully
  * exercised and tested.
  *
  * Scale notes: media blobs never shuffle; every stage below is a narrow
  * map over the scan, so 100 TB of media partitions by input file and
  * streams through executors. Feature vectors (small) are what joins and
  * aggregations downstream touch.
  */
object Multimodal {

  /** Deterministic synthetic media corpus derived from `documents`: the
    * text bytes stand in for an encoded image/audio blob. kind cycles
    * image/audio/video; metadata is a pure function of doc_id. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id".as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      $"text".cast("binary").as("content"),
      struct(
        ($"doc_id" % 640 + 16).cast("int").as("width"),
        ($"doc_id" % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        ($"doc_id" % 24 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** STUB codec: deterministic "features" from the blob bytes. A real
    * deployment swaps this one function for an actual decoder; the Spark
    * plumbing around it is unchanged. */
  object FakeMediaCodec extends Serializable {
    final case class Features(
        mediaId: Long, kind: String, nBytes: Int,
        brightness: Double, checksum: Long)

    def decode(mediaId: Long, kind: String, content: Array[Byte]): Features = {
      var sum = 0L
      var ck = 0L
      var i = 0
      while (i < content.length) {
        sum += content(i) & 0xFF
        ck = (ck * 131 + (content(i) & 0xFF)) % 1000000007L
        i += 1
      }
      Features(mediaId, kind, content.length,
        if (content.length == 0) 0.0 else sum.toDouble / content.length, ck)
    }
  }

  val defs: Seq[Q] = Seq(

    // ----- binary-column stats (oracle-checked: synthesis is SQL-equal) --
    Q("mm_media_stats",
      (s, d) => {
        import s.implicits._
        mediaTable(s, d)
          .groupBy($"kind")
          .agg(
            count(lit(1)).as("n"),
            sum(length($"content").cast("long")).as("total_bytes"),
            max($"meta.width").as("max_width"),
            min($"meta.n_frames").as("min_frames"))
      },
      Some("""SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS kind,
        COUNT(*) AS n,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(MAX(doc_id % 640 + 16) AS INT) AS max_width,
        CAST(MIN(doc_id % 24 + 1) AS INT) AS min_frames
        FROM documents GROUP BY 1""")),

    // ----- typed mapPartitions feature extraction (STUB decode) ----------
    Q("mm_feature_extract",
      (s, d) => {
        import s.implicits._
        val media = mediaTable(s, d)
          .select($"media_id", $"kind", $"content")
          .as[(Long, String, Array[Byte])]
        media.mapPartitions { it =>
          // one codec instance per partition — the batch shape a real
          // decoder needs (model/codec init amortized across the batch)
          it.map { case (id, kind, bytes) =>
            FakeMediaCodec.decode(id, kind, bytes)
          }
        }.toDF()
          .select($"mediaId".as("media_id"), $"kind", $"nBytes".as("n_bytes"),
            // floor-scaled micro-units: one double divide + multiply in
            // the same op order as the oracle -> bit-identical, and floor
            // (unlike round) has no cross-engine tie semantics
            floor($"brightness" * lit(1000000.0)).cast("long")
              .as("brightness_e6"),
            $"checksum")
      },
      // DuckDB re-derives the stub codec byte-for-byte: document text is
      // ASCII (TESTDATA.md), so ord(char) == byte value; the polynomial
      // checksum folds left in BIGINT exactly like the Scala loop.
      Some("""WITH codes AS (
          SELECT doc_id,
            CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
            octet_length(encode(text)) AS n_bytes,
            [ord(text[i]) FOR i IN range(1, length(text) + 1)] AS cs
          FROM documents)
        SELECT doc_id AS media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
          CAST(floor((CAST(list_sum(cs) AS DOUBLE) / n_bytes) * 1000000.0)
               AS BIGINT) AS brightness_e6,
          list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
            (acc, x) -> (acc * 131 + x) % 1000000007) AS checksum
        FROM codes""")),

    // ----- frame sampling: chunk the blob, keep every 4th frame ----------
    Q("mm_frame_sample",
      (s, d) => {
        import s.implicits._
        mediaTable(s, d)
          .filter($"kind" === "video")
          .select($"media_id", $"meta.n_frames".as("n_frames"),
            explode(expr(
              "filter(sequence(0, meta.n_frames - 1), f -> f % 4 = 0)"))
              .as("frame_no"),
            length($"content").as("blob_len"))
          .select($"media_id", $"frame_no",
            // STUB frame slice: byte range that a real codec would decode
            expr("CAST((CAST(frame_no AS BIGINT) * blob_len) div n_frames AS INT)")
              .as("frame_offset"))
      },
      Some("""SELECT doc_id AS media_id, CAST(f.frame_no AS INT) AS frame_no,
        CAST(CAST(f.frame_no AS BIGINT) * LENGTH(text)
             // (doc_id % 24 + 1) AS INT) AS frame_offset
        FROM documents,
          LATERAL (SELECT UNNEST([x FOR x IN
            generate_series(0, CAST(doc_id % 24 AS INT)) IF x % 4 = 0])
            AS frame_no) f
        WHERE doc_id % 3 = 2""")),

    // ----- resize (STUB nearest-neighbor downsample) ----------------------
    // The resize stage of an image pipeline: target max-dim 64 with
    // integer aspect preservation, and a strided byte sample of the blob
    // standing in for nearest-neighbor resampling (a real codec swaps
    // into the same mapPartitions seam as mm_feature_extract; the batch
    // shape, schema, and no-shuffle contract are what's under test).
    Q("mm_resize",
      (s, d) => {
        import s.implicits._
        val media = mediaTable(s, d)
          .filter($"kind" === "image")
          .select($"media_id", $"meta.width".as("w"),
            $"meta.height".as("h"), $"content")
          .as[(Long, Int, Int, Array[Byte])]
        media.mapPartitions { it =>
          it.map { case (id, w, h, bytes) =>
            val scale = (math.max(w, h) + 63) / 64
            val nw = math.max(w / scale, 1)
            val nh = math.max(h / scale, 1)
            var ck = 0L
            var i = 0
            while (i < bytes.length) {
              ck = (ck * 131 + (bytes(i) & 0xFF)) % 1000000007L
              i += scale
            }
            (id, w, h, nw, nh, ck)
          }
        }.toDF("media_id", "w", "h", "new_w", "new_h", "sample_checksum")
      },
      Some("""WITH img AS (
          SELECT doc_id AS media_id,
            CAST(doc_id % 640 + 16 AS INT) AS w,
            CAST(doc_id % 480 + 16 AS INT) AS h,
            text
          FROM documents WHERE doc_id % 3 = 0),
        dims AS (
          SELECT media_id, w, h,
            CAST((greatest(w, h) + 63) // 64 AS INT) AS scale, text
          FROM img)
        SELECT media_id, w, h,
          CAST(greatest(w // scale, 1) AS INT) AS new_w,
          CAST(greatest(h // scale, 1) AS INT) AS new_h,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            [ord(text[i]) FOR i IN range(1, length(text) + 1)
             IF (i - 1) % scale = 0]),
            (acc, x) -> (acc * 131 + x) % 1000000007) AS sample_checksum
        FROM dims"""))
  )
}
