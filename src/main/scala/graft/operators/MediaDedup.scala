package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media near-dup retrieval — the consumers of the perceptual-fingerprint
  * trio ([[Multimodal]] `mm_dhash` / `mm_video_dhash`): banded Hamming
  * pair generation over image dHashes, connected components over the
  * pair graph, and aligned sequence overlap over per-frame video hashes.
  * This is the pixel-side twin of the text dedup family in [[Dedup]] —
  * same candidate-generation discipline (pigeonhole banding, never
  * all-pairs), same verification discipline (the DuckDB oracles below
  * are the NAIVE all-pairs joins, so a hash match proves the banded
  * generator loses no pair).
  *
  * Reference scope note: the reference engine has no media operators at
  * all (its whole surface is pcap decode + Hive SQL delegation,
  * `hadoop-pcap-serde/.../PcapDeserializer.java:49-60`); this family is
  * part of the training-data-pipeline extension surface.
  *
  * == Candidate generation: byte-pair banding ==
  *
  * The 64-bit dHash rides as two 32-bit words (`dhash_hi`, `dhash_lo`,
  * exactly the `mm_dhash` schema). Split the 64 bits into 8 bytes; a
  * pair within Hamming distance 6 has differing bits in at most 6
  * bytes, so AT LEAST TWO of the 8 bytes match exactly — joining on
  * (j1, j2, byte_j1, byte_j2) over all C(8,2) = 28 byte pairs is a
  * complete candidate generator for hamming <= 6, and bit_count(xor)
  * verifies exactly. Why pairs of bytes and not single bytes: the
  * single-byte key space is 8 x 256 = 2048 buckets, whose occupancy
  * grows linearly with the corpus (the dedup_simhash_pairs level-2
  * rationale, Dedup.scala); the byte-pair space is 28 x 65536 ~ 1.8M
  * keys — ~900x fewer random collisions per key — while staying a
  * strict pigeonhole argument rather than a probabilistic one.
  *
  * Honest bound (same as dedup_simhash_pairs): a mega-cluster of
  * IDENTICAL images collides in every band and its hamming-0 pairs are
  * all in the output, which no candidate scheme can make sub-quadratic
  * — for that regime use the cluster surface (mm_dhash_components),
  * not a pair list. MediaDedupSpec pins the pigeonhole completeness
  * property and the fixture's band-occupancy bound.
  *
  * == Fixture ==
  *
  * The synthetic corpus has no organic near-duplicate images (formula
  * hashes are pseudo-random, P[hamming <= 6 over 64 bits] ~ 1e-11), so
  * the pair ops hash a GROUPED fixture: image id renders the group
  * base `gid = (id/4)*4`, and members id%4 = 1..3 get one sampled
  * grid pixel whited out (the 9x8 dHash grid samples distinct pixels
  * for w >= 9, h >= 8, so whiting the sample at grid (2*(id%4), 3)
  * perturbs exactly the two comparison bits it feeds). Within-group
  * Hamming is therefore <= 4 — real near-dups with KNOWN structure —
  * while cross-group hashes stay far apart. The oracle re-derives
  * every bit from the synthesis formulas (the mm_dhash discipline) and
  * then does the naive all-pairs join.
  */
object MediaDedup {

  /** Hamming threshold for image near-dup pairs. 6 is the classic
    * "same image, minor re-encode" dHash band; it is also the largest
    * threshold the byte-pair pigeonhole covers (t <= 6 leaves >= 2 of
    * 8 bytes clean). */
  private val HammingT = 6

  /** (media_id, dhash_hi, dhash_lo) for the grouped near-dup fixture:
    * decode the group-base BMP, white out one sampled grid pixel per
    * non-base member, hash through the SAME dhashOf as mm_dhash. */
  private[graft] def groupedDhashes(
      s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d).select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val gid = (id / 4) * 4
        val img = Multimodal.BmpCodec.decode(Multimodal.BmpCodec.encode(gid))
        val q = (id % 4).toInt
        if (q != 0) {
          // white out the single pixel the dHash grid samples at
          // (gx = 2q, gy = 3): flips at most comparison bits
          // (2q-1, 3) and (2q, 3)
          val sx = (2 * q) * img.w / 9
          val sy = 3 * img.h / 8
          val o = (sy * img.w + sx) * 3
          img.px(o) = -1; img.px(o + 1) = -1; img.px(o + 2) = -1
        }
        val (hi, lo) = Multimodal.dhashOf(img)
        (id, hi, lo)
      }
    }.toDF("media_id", "dhash_hi", "dhash_lo")
  }

  /** The banded-Hamming pair relation (m1, m2, hamming): explode the 28
    * byte-pair keys, equi-join, verify with exact bit_count. ONE
    * shuffle on the band key + the distinct; never all-pairs. */
  private[operators] def dhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // cached: the band relation feeds both sides of the self-join — at
    // scale the per-image decode must not run twice
    val bands = groupedDhashes(s, d).select(
      $"media_id", $"dhash_hi", $"dhash_lo",
      explode(expr(
        """flatten(transform(sequence(0, 6), j1 ->
             transform(sequence(j1 + 1, 7), j2 ->
               struct(j1 AS j1, j2 AS j2,
                 (CASE WHEN j1 < 4 THEN shiftright(dhash_lo, j1 * 8)
                       ELSE shiftright(dhash_hi, (j1 - 4) * 8) END)
                   & 255L AS b1,
                 (CASE WHEN j2 < 4 THEN shiftright(dhash_lo, j2 * 8)
                       ELSE shiftright(dhash_hi, (j2 - 4) * 8) END)
                   & 255L AS b2))))""")).as("bd"))
      .select($"media_id", $"dhash_hi", $"dhash_lo",
        $"bd.j1", $"bd.j2", $"bd.b1", $"bd.b2")
      .cache()
    val l = bands.select($"media_id".as("m1"), $"dhash_hi".as("hi1"),
      $"dhash_lo".as("lo1"), $"j1", $"j2", $"b1", $"b2")
    val r = bands.select($"media_id".as("m2"), $"dhash_hi".as("hi2"),
      $"dhash_lo".as("lo2"), $"j1", $"j2", $"b1", $"b2")
    l.join(r, Seq("j1", "j2", "b1", "b2"))
      .filter($"m1" < $"m2")
      .select($"m1", $"m2",
        (bit_count($"hi1".bitwiseXOR($"hi2"))
          + bit_count($"lo1".bitwiseXOR($"lo2"))).as("hamming"))
      .distinct()
      .filter($"hamming" <= HammingT)
  }

  /** Shared oracle CTE chain deriving the grouped-fixture hash relation
    * `ph(media_id, dhash_hi, dhash_lo)` from the synthesis formulas —
    * group base `gid`, whiteout grid column `pc` (-1 = none), the same
    * integer luma/grid math as the mm_dhash oracle. */
  private val dhashCtes: String = """ids AS (
      SELECT doc_id, (doc_id // 4) * 4 AS gid,
        CASE WHEN doc_id % 4 = 0 THEN -1
             ELSE 2 * (doc_id % 4) END AS pc
      FROM documents),
    pg AS (
      SELECT doc_id, gid, pc,
        CAST(16 + gid % 13 AS INT) AS w,
        CAST(12 + gid % 7 AS INT) AS h, x, y
      FROM ids,
        LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
        LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys),
    pb AS (
      SELECT doc_id, x, y,
        CASE WHEN
          (CASE WHEN x + 1 = pc AND y = 3 THEN 255000 ELSE
            299 * ((gid*7 + (((x+1)*w)//9)*3 + ((y*h)//8)*5) % 256)
            + 587 * ((gid + (((x+1)*w)//9)*11 + ((y*h)//8)*2) % 256)
            + 114 * ((gid*13 + (((x+1)*w)//9) * ((y*h)//8)) % 256) END)
          >
          (CASE WHEN x = pc AND y = 3 THEN 255000 ELSE
            299 * ((gid*7 + ((x*w)//9)*3 + ((y*h)//8)*5) % 256)
            + 587 * ((gid + ((x*w)//9)*11 + ((y*h)//8)*2) % 256)
            + 114 * ((gid*13 + ((x*w)//9) * ((y*h)//8)) % 256) END)
        THEN 1 ELSE 0 END AS bit
      FROM pg),
    ph AS (
      SELECT doc_id AS media_id,
        CAST(SUM(CASE WHEN y >= 4
          THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
          ELSE 0 END) AS BIGINT) AS dhash_hi,
        CAST(SUM(CASE WHEN y < 4
          THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
          ELSE 0 END) AS BIGINT) AS dhash_lo
      FROM pb GROUP BY 1)"""

  val defs: Seq[Q] = Seq(

    // ----- image near-dup pairs (banded Hamming join) --------------------
    // The retrieval the dHash column exists for: all image pairs within
    // Hamming distance 6, generated by the 28-key byte-pair pigeonhole
    // banding (see object doc) and verified exactly. The oracle is the
    // NAIVE all-pairs Hamming join — the hash match proves candidate
    // completeness, the dedup_ppjoin verification pattern.
    Q("mm_dhash_pairs",
      (s, d) => dhashPairs(s, d),
      Some(s"""WITH $dhashCtes
        SELECT l.media_id AS m1, r.media_id AS m2,
          CAST(bit_count(xor(l.dhash_hi, r.dhash_hi))
             + bit_count(xor(l.dhash_lo, r.dhash_lo)) AS INT) AS hamming
        FROM ph l JOIN ph r ON l.media_id < r.media_id
        WHERE bit_count(xor(l.dhash_hi, r.dhash_hi))
            + bit_count(xor(l.dhash_lo, r.dhash_lo)) <= $HammingT""")),

    // ----- image near-dup clusters ----------------------------------------
    // The mega-cluster-safe surface: connected components over the
    // banded pair graph (the shared iterative min-label fixpoint from
    // Dedup.connectedComponents, localCheckpoint per round), labeling
    // every image with its cluster minimum. The oracle runs the
    // recursive-CTE transitive closure over the NAIVE all-pairs edge
    // set, so the hash match proves the banded graph has identical
    // components.
    Q("mm_dhash_components",
      (s, d) => {
        import s.implicits._
        val pairs = dhashPairs(s, d).cache()
        val edges = pairs.select($"m1".as("src"), $"m2".as("dst"))
          .union(pairs.select($"m2".as("src"), $"m1".as("dst")))
          .cache()
        val labels =
          try Dedup.connectedComponents(edges)
          finally { edges.unpersist(); pairs.unpersist() }
        labels.select($"doc_id".as("media_id"), $"component")
      },
      Some(s"""WITH RECURSIVE $dhashCtes,
        cand AS (
          SELECT l.media_id AS m1, r.media_id AS m2
          FROM ph l JOIN ph r ON l.media_id < r.media_id
          WHERE bit_count(xor(l.dhash_hi, r.dhash_hi))
              + bit_count(xor(l.dhash_lo, r.dhash_lo)) <= $HammingT),
        edges AS (SELECT m1 AS a, m2 AS b FROM cand
                  UNION SELECT m2, m1 FROM cand),
        nodes AS (SELECT DISTINCT a AS doc FROM edges),
        reach(doc, r) AS (
          SELECT doc, doc FROM nodes
          UNION
          SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.doc)
        SELECT doc AS media_id, MIN(r) AS component
        FROM reach GROUP BY doc""")),

    // ----- video sequence overlap (shared-clip detection) -----------------
    // The mm_video_dhash payoff: find video pairs that share an aligned
    // run of identical frames — the "same clip, different in-point" cut
    // detection video dedup pipelines run. Frame hashes equi-join on
    // the full 64-bit dHash (high-cardinality content key — ONE
    // shuffle), then grouping by (v1, v2, frame_shift) counts the
    // aligned overlap per relative offset; a constant-shift run is a
    // shared clip. Tolerant (near-identical) frame matching would
    // substitute the byte-pair banded generator above for the equi-join
    // — the aggregation shape is unchanged. Fixture: videos come in
    // groups of three cuts of one base AVI (member m drops the first m
    // frames and renumbers), so members genuinely share trailing frames
    // at a constant offset; the oracle re-derives every frame hash from
    // the synthesis formulas and joins naively.
    Q("mm_video_overlap",
      (s, d) => {
        import s.implicits._
        val vids = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        val fh = vids.mapPartitions { it =>
          it.flatMap { id =>
            val t = (id - 2) / 3
            val gid = 2 + 9 * (t / 3)
            val m = (t % 3).toInt
            val vid = Multimodal.AviCodec.decode(Multimodal.AviCodec.encode(gid))
            vid.frames.zipWithIndex.drop(m).map { case (img, j) =>
              val (hi, lo) = Multimodal.dhashOf(img)
              (id, j - m, hi, lo)
            }
          }
        }.toDF("media_id", "frame_idx", "dhash_hi", "dhash_lo")
          .cache() // both join sides: decode the videos once
        val l = fh.select($"media_id".as("v1"), $"frame_idx".as("f1"),
          $"dhash_hi", $"dhash_lo")
        val r = fh.select($"media_id".as("v2"), $"frame_idx".as("f2"),
          $"dhash_hi", $"dhash_lo")
        l.join(r, Seq("dhash_hi", "dhash_lo"))
          .filter($"v1" < $"v2")
          .groupBy($"v1", $"v2", ($"f1" - $"f2").as("frame_shift"))
          .agg(count(lit(1)).as("n_aligned"))
      },
      Some("""WITH vids AS (
          SELECT doc_id, (doc_id - 2) // 3 AS t
          FROM documents WHERE doc_id % 3 = 2),
        mem AS (
          SELECT doc_id, 2 + 9 * (t // 3) AS gid, t % 3 AS m FROM vids),
        vg AS (
          SELECT doc_id, gid, m, j, gid + 131 * j AS fid,
            CAST(16 + gid % 13 AS INT) AS w,
            CAST(12 + gid % 7 AS INT) AS h, x, y
          FROM mem,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(3 + gid % 4 AS INT) - 1)) AS j) js,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys
          WHERE j >= m),
        vb AS (
          SELECT doc_id, m, j, x, y,
            CASE WHEN
              299 * ((fid*7 + (((x+1)*w)//9)*3 + ((y*h)//8)*5) % 256)
              + 587 * ((fid + (((x+1)*w)//9)*11 + ((y*h)//8)*2) % 256)
              + 114 * ((fid*13 + (((x+1)*w)//9) * ((y*h)//8)) % 256)
              >
              299 * ((fid*7 + ((x*w)//9)*3 + ((y*h)//8)*5) % 256)
              + 587 * ((fid + ((x*w)//9)*11 + ((y*h)//8)*2) % 256)
              + 114 * ((fid*13 + ((x*w)//9) * ((y*h)//8)) % 256)
            THEN 1 ELSE 0 END AS bit
          FROM vg),
        vh AS (
          SELECT doc_id AS media_id, CAST(j - m AS INT) AS frame_idx,
            CAST(SUM(CASE WHEN y >= 4
              THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
              ELSE 0 END) AS BIGINT) AS dhash_hi,
            CAST(SUM(CASE WHEN y < 4
              THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
              ELSE 0 END) AS BIGINT) AS dhash_lo
          FROM vb GROUP BY 1, 2)
        SELECT l.media_id AS v1, r.media_id AS v2,
          CAST(l.frame_idx - r.frame_idx AS INT) AS frame_shift,
          COUNT(*) AS n_aligned
        FROM vh l JOIN vh r
          ON l.dhash_hi = r.dhash_hi AND l.dhash_lo = r.dhash_lo
          AND l.media_id < r.media_id
        GROUP BY 1, 2, 3""")),

    // ----- audio sequence overlap (shared-recording detection) ------------
    // The mm_audio_fingerprint payoff, completing the trio's consumers:
    // Shazam-style landmark matching reduced to the energy-contour
    // scheme — each clip emits a 6-bit KEY of consecutive rise/fall
    // bits at every contour position, keys equi-join on content (ONE
    // shuffle), and (a1, a2, shift) counts aligned matches; a shared
    // recording shows up as a run at one constant offset, chance 6-bit
    // collisions scatter across shifts. Fixture: audio docs come in
    // groups of three trims of one base WAV (member m drops its first
    // m 20-sample windows — window-aligned, so the contour suffix is
    // a pure shift); the oracle re-derives every window energy from
    // the PCM synthesis formula and joins naively — integer-exact end
    // to end.
    Q("mm_audio_overlap",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        val keys = ids.mapPartitions { it =>
          it.flatMap { id =>
            val t = (id - 1) / 3
            val gid = 1 + 9 * (t / 3)
            val m = (t % 3).toInt
            val a = Multimodal.WavCodec.decode(
              Multimodal.WavCodec.encode(gid))
            val W = 20
            val nw = a.samples.length / W
            val en = Array.tabulate(nw) { w =>
              var acc = 0L
              var i = 0
              while (i < W) {
                acc += math.abs(a.samples(w * W + i).toInt); i += 1
              }
              acc
            }
            // member m's contour = the base contour from boundary m on
            val bits = Array.tabulate(nw - 1 - m)(k =>
              if (en(m + k + 1) > en(m + k)) 1 else 0)
            (0 to bits.length - 6).map { p =>
              var key = 0
              var j = 0
              while (j < 6) { key |= bits(p + j) << j; j += 1 }
              (id, p, key)
            }
          }
        }.toDF("media_id", "p", "key")
          .cache() // both join sides: decode the audio once
        val l = keys.select($"media_id".as("a1"), $"p".as("p1"), $"key")
        val r = keys.select($"media_id".as("a2"), $"p".as("p2"), $"key")
        l.join(r, Seq("key"))
          .filter($"a1" < $"a2")
          .groupBy($"a1", $"a2", ($"p1" - $"p2").as("shift"))
          .agg(count(lit(1)).as("n_aligned"))
      },
      Some("""WITH aud AS (
          SELECT doc_id, (doc_id - 1) // 3 AS t
          FROM documents WHERE doc_id % 3 = 1),
        mem AS (
          SELECT doc_id, 1 + 9 * (t // 3) AS gid, t % 3 AS m FROM aud),
        sz AS (
          SELECT doc_id, gid, m, CAST(200 + gid % 57 AS INT) AS n
          FROM mem),
        e AS (
          SELECT doc_id, m, w,
            list_sum([abs(((gid*31 + i*i*7) % 65536) - 32768)
                      FOR i IN generate_series(w*20, w*20 + 19)]) AS en
          FROM sz,
            LATERAL (SELECT unnest(generate_series(0, n//20 - 1)) AS w)),
        b AS (
          SELECT doc_id, w - m - 1 AS k,
            CASE WHEN en > lag(en) OVER
              (PARTITION BY doc_id ORDER BY w) THEN 1 ELSE 0 END AS bit
          FROM e QUALIFY w >= m + 1),
        kp AS (
          SELECT b1.doc_id, b1.k AS p,
            CAST(SUM(b2.bit * (1 << (b2.k - b1.k))) AS INT) AS key
          FROM b b1 JOIN b b2 ON b2.doc_id = b1.doc_id
            AND b2.k BETWEEN b1.k AND b1.k + 5
          GROUP BY 1, 2 HAVING COUNT(*) = 6)
        SELECT l.doc_id AS a1, r.doc_id AS a2,
          CAST(l.p - r.p AS INT) AS shift, COUNT(*) AS n_aligned
        FROM kp l JOIN kp r
          ON l.key = r.key AND l.doc_id < r.doc_id
        GROUP BY 1, 2, 3"""))
  )
}
