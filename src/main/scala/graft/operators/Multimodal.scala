package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief; SURVEY.md §2C): media
  * payloads ride as opaque `BINARY` columns with a typed metadata struct,
  * and decode/feature-extraction runs as a typed `mapPartitions` over the
  * batch — the Scala analogue of a Pandas-UDF `mapInPandas` stage.
  *
  * Every modality has a REAL pure-JVM codec: uncompressed 24-bit BMP +
  * binary PPM images ([[Multimodal.BmpCodec]]/[[Multimodal.PpmCodec]] —
  * header fields, 4-byte row padding, bottom-up BGR), PCM-16 WAV audio
  * ([[Multimodal.WavCodec]] — RIFF chunk walk, little-endian int16),
  * uncompressed AVI video ([[Multimodal.AviCodec]] — RIFF chunk
  * tree, avih header, 00db DIB frames), zlib PNG ([[Multimodal.PngCodec]]),
  * LZW GIF ([[Multimodal.GifCodec]]), and baseline JPEG
  * ([[JpegCodec]] — full T.81 sequential decode). EVERY mm op runs on them: the
  * [[mediaTable]] binary column carries genuine BMP/WAV/AVI files, the
  * generic ops (mm_media_stats / mm_feature_extract / mm_frame_sample /
  * mm_resize) sniff the container from magic bytes and decode with the
  * byte-only parsers, and the per-format ops (mm_decode_bmp /
  * mm_resize_bmp / mm_decode_any / mm_decode_wav / mm_video_frames_avi)
  * exercise each parser in depth. Oracles re-derive expected stats from
  * the synthesis FORMULAS, never the bytes, so any header-offset /
  * stride / endianness parse bug mismatches.
  *
  * Scale notes: media blobs never shuffle; every stage below is a narrow
  * map over the scan, so 100 TB of media partitions by input file and
  * streams through executors. Feature vectors (small) are what joins and
  * aggregations downstream touch.
  */
object Multimodal {

  /** Deterministic synthetic media corpus derived from `documents`: the
    * binary column carries a GENUINE encoded file per row — a 24-bit BMP
    * (doc_id % 3 == 0), a PCM-16 WAV (== 1), or an uncompressed AVI
    * (== 2), all synthesized byte-by-byte by the codecs below with
    * content that is a pure function of doc_id (the PcapSynth pattern).
    * The meta struct carries the same values the file headers declare,
    * from the synthesis formulas. Blob synthesis is a narrow map over
    * the documents scan — no shuffle, media bytes never leave the
    * partition. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select($"doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        (id % 3) match {
          case 0 =>
            val (w, h) = BmpCodec.dims(id)
            (id, "image", BmpCodec.encode(id),
              Some(w), Some(h), None: Option[Int], None: Option[Int])
          case 1 =>
            (id, "audio", WavCodec.encode(id),
              None: Option[Int], None: Option[Int],
              Some(WavCodec.rate(id)), None: Option[Int])
          case _ =>
            val (w, h) = BmpCodec.dims(id)
            (id, "video", AviCodec.encode(id),
              Some(w), Some(h), None: Option[Int],
              Some(AviCodec.nFrames(id)))
        }
      }
    }.toDF("media_id", "kind", "content", "width", "height",
        "sample_rate", "n_frames")
      .select($"media_id", $"kind", $"content",
        struct($"width", $"height", $"sample_rate", $"n_frames").as("meta"))
  }

  /** Round-17 optimization: spread a decode-heavy id list across the
    * cluster before its mapPartitions decode (the [[graft.operators
    * .Spread]] rationale — at bench scale the documents scan is one
    * small parquet file, so these per-id codec sweeps otherwise
    * serialize on a single task; at production scale the scan already
    * has >= parallelism partitions and this is a no-op). */
  private def spreadIds(ids: org.apache.spark.sql.Dataset[Long])
      : org.apache.spark.sql.Dataset[Long] = {
    val s = ids.sparkSession
    import s.implicits._
    val par = s.sparkContext.defaultParallelism
    val df = ids.toDF("id")
    (if (df.rdd.getNumPartitions >= par) df
     else df.repartition(par, col("id"))).as[Long]
  }

  /** Container sniffing + decode for the generic ops: dispatch on magic
    * bytes (never the kind/meta columns — those are untrusted metadata)
    * and return modality-normalized features. */
  /** Container from magic bytes alone — NO decode (header/stats paths
    * must not pay a full pixel/sample unpack just to learn the kind). */
  private[operators] def sniffKind(bytes: Array[Byte]): String = {
    def riffTag: String =
      new String(bytes, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 8 && bytes(0) == 0x89.toByte &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "gif"
    else if (bytes.length >= 4 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte) "jpg"
    else if (bytes.length >= 4 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
        bytes(3) == 0) ||
       (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        bytes(3) == 42))) "tiff"
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else if (bytes.length >= 12 &&
      new String(bytes, 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        == "ftyp") "mp4"
    else if (bytes.length >= 12 && riffTag == "WAVE") "wav"
    else "avi"
  }

  private[operators] def sniffDecode(bytes: Array[Byte])
      : (String, Long, Long) = sniffKind(bytes) match {
    // ONE magic-byte dispatch (sniffKind) feeds both the full-decode
    // and the header/stats paths, so a blob can never classify
    // differently between them
    case "bmp" =>
      val img = BmpCodec.decode(bytes)
      ("bmp", img.w.toLong * img.h, weightedPxSum(img))
    case "png" =>
      val img = PngCodec.decode(bytes)
      ("png", img.w.toLong * img.h, weightedPxSum(img))
    case "gif" =>
      val img = GifCodec.decode(bytes)
      ("gif", img.w.toLong * img.h, weightedPxSum(img))
    case "jpg" =>
      val img = JpegCodec.decode(bytes)
      ("jpg", img.w.toLong * img.h, weightedPxSum(img))
    case "tiff" =>
      val img = TiffCodec.decode(bytes)
      ("tiff", img.w.toLong * img.h, weightedPxSum(img))
    case "ppm" =>
      val img = PpmCodec.decode(bytes)
      ("ppm", img.w.toLong * img.h, weightedPxSum(img))
    case "wav" =>
      val a = WavCodec.decode(bytes)
      var sumAbs = 0L
      var i = 0
      while (i < a.samples.length) {
        sumAbs += math.abs(a.samples(i).toInt); i += 1
      }
      ("wav", a.samples.length.toLong, sumAbs)
    case _ =>
      val v = AviCodec.decode(bytes)
      var acc = 0L
      v.frames.foreach(acc += weightedPxSum(_))
      ("avi", v.frames.length.toLong * v.w * v.h, acc)
  }

  /** The battery's canonical integer-exact image feature: sum over
    * pixels of r + 2g + 3b (channel-order sensitive, so a BGR/RGB swap
    * mismatches the oracle). */
  private[operators] def weightedPxSum(img: BmpCodec.Image): Long = {
    var acc = 0L
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        acc += img.r(x, y) + 2L * img.g(x, y) + 3L * img.b(x, y)
        x += 1
      }
      y += 1
    }
    acc
  }

  /** 9×8 difference hash of a decoded image: nearest-sample grayscale
    * grid (scaled-integer 299/587/114 luma), horizontal-neighbor
    * comparison bits, packed as (hi, lo) 32-bit halves so both
    * engines' arithmetic stays trivially exact. Shared by mm_dhash and
    * mm_video_dhash. */
  private[graft] def dhashOf(img: BmpCodec.Image): (Long, Long) = {
    def lum(gx: Int, gy: Int): Int = {
      val sx = gx * img.w / 9
      val sy = gy * img.h / 8
      299 * img.r(sx, sy) + 587 * img.g(sx, sy) + 114 * img.b(sx, sy)
    }
    var lo = 0L
    var hi = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x + 1, y) > lum(x, y)) {
          if (y < 4) lo |= 1L << (y * 8 + x)
          else hi |= 1L << ((y - 4) * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** REAL image codec for the uncompressed-BMP ops below (mm_decode_bmp,
    * mm_resize_bmp): a byte-level 24-bit BITMAPINFOHEADER writer and an
    * INDEPENDENT parser — the decode path reads only bytes (magic, data
    * offset, dims, bpp, 4-byte row padding, bottom-up row order, BGR)
    * and never consults the synthesis formula, so the formula-derived
    * DuckDB oracles catch any stride/origin/channel-order mistake.
    * Pure JVM — no codec libraries needed (the container has none). */
  object BmpCodec extends Serializable {

    /** Deterministic fixture content: dims and RGB per pixel as pure
      * functions of the image id (the PcapSynth pattern — fixtures are
      * synthesized byte-by-byte, oracles re-derive from the formula). */
    def dims(id: Long): (Int, Int) =
      ((16 + id % 13).toInt, (12 + id % 7).toInt) // w not 4-aligned: pads
    def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((id * 7 + x * 3 + y * 5) % 256).toInt,
      ((id + x * 11 + y * 2) % 256).toInt,
      ((id * 13 + x.toLong * y) % 256).toInt)

    private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte
      b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte
      b(off + 3) = (v >>> 24).toByte
    }

    /** Write a real 24-bit uncompressed BMP (54-byte header, bottom-up
      * BGR rows padded to 4 bytes) with the fixture content for `id`. */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val stride = (w * 3 + 3) / 4 * 4
      val size = 54 + stride * h
      val b = new Array[Byte](size)
      b(0) = 'B'; b(1) = 'M'
      putLe32(b, 2, size)
      putLe32(b, 10, 54) // pixel-data offset
      putLe32(b, 14, 40) // BITMAPINFOHEADER
      putLe32(b, 18, w)
      putLe32(b, 22, h) // positive height = bottom-up
      b(26) = 1 // planes
      b(28) = 24 // bpp
      // compression 0, sizes/ppm/colors left 0 (valid for BI_RGB)
      var y = 0
      while (y < h) {
        val row = 54 + (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val (r, g, bl) = pixel(id, x, y)
          b(row + x * 3) = bl.toByte
          b(row + x * 3 + 1) = g.toByte
          b(row + x * 3 + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      b
    }

    /** Decoded image: RGB triplets, row-major, top-down. */
    final case class Image(w: Int, h: Int, px: Array[Byte]) {
      def r(x: Int, y: Int): Int = px((y * w + x) * 3) & 0xFF
      def g(x: Int, y: Int): Int = px((y * w + x) * 3 + 1) & 0xFF
      def b(x: Int, y: Int): Int = px((y * w + x) * 3 + 2) & 0xFF
    }

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

    /** Parse a 24-bit uncompressed BMP from bytes alone. */
    /** Header-only dims (no pixel unpack) — the stats-query companion to
      * [[AviCodec.header]], and the SINGLE home of the BMP header
      * guards ([[decode]] delegates here). Dims are sanity-bounded
      * BEFORE any stride math: a crafted header with w ~ 2^30 would
      * overflow stride*h to a small/negative Int and sail past length
      * checks into out-of-bounds reads. */
    def headerDims(bytes: Array[Byte]): (Int, Int) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP")
      val w = le32(bytes, 18)
      val h = math.abs(le32(bytes, 22))
      val bpp = (bytes(28) & 0xFF) | ((bytes(29) & 0xFF) << 8)
      val compression = le32(bytes, 30)
      require(bpp == 24 && compression == 0,
        s"unsupported BMP variant: bpp=$bpp compression=$compression")
      require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
        s"implausible BMP dims ${w}x$h")
      (w, h)
    }

    def decode(bytes: Array[Byte]): Image = {
      // header guards live in ONE place: headerDims validates magic,
      // variant, and dimension bounds for both the stats and decode
      // paths (a guard fix applied there covers both)
      val (w, h) = headerDims(bytes)
      val dataOff = le32(bytes, 10)
      val topDown = le32(bytes, 22) < 0
      // a negative/low data offset (top bit set in the header field)
      // would make the truncation check pass and the row reads negative
      require(dataOff >= 54 && dataOff <= bytes.length,
        s"implausible BMP data offset $dataOff")
      val stride = (w * 3 + 3) / 4 * 4
      require(bytes.length >= dataOff.toLong + stride.toLong * h,
        "truncated BMP")
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y) * stride
        var x = 0
        while (x < w) {
          px((y * w + x) * 3) = bytes(srcRow + x * 3 + 2) // R
          px((y * w + x) * 3 + 1) = bytes(srcRow + x * 3 + 1) // G
          px((y * w + x) * 3 + 2) = bytes(srcRow + x * 3) // B
          x += 1
        }
        y += 1
      }
      Image(w, h, px)
    }
  }

  /** REAL binary-PPM (P6) codec — the second container format behind the
    * seam. Same independence contract as [[BmpCodec]]: the decoder reads
    * only bytes (ASCII header with whitespace/comment handling, then raw
    * RGB triplets, top-down) and shares nothing with the synthesis
    * formula. */
  object PpmCodec extends Serializable {

    /** Write a binary P6 PPM with the SAME fixture content as BmpCodec
      * (dims/pixel formulas shared — the two containers must decode to
      * identical images, which MultimodalCodecSpec asserts). */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = BmpCodec.dims(id)
      val header = s"P6\n# graft fixture $id\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = BmpCodec.pixel(id, x, y)
          px((y * w + x) * 3) = r.toByte
          px((y * w + x) * 3 + 1) = g.toByte
          px((y * w + x) * 3 + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      header ++ px
    }

    /** Parse a binary P6 PPM from bytes alone (maxval must be 255). */
    def decode(bytes: Array[Byte]): BmpCodec.Image = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        "not a P6 PPM")
      var i = 2
      // read 3 header ints (w, h, maxval), skipping whitespace and
      // '#'-to-newline comments between tokens
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        while (i < bytes.length &&
               (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
          if (bytes(i) == '#')
            while (i < bytes.length && bytes(i) != '\n') i += 1
          else i += 1
        }
        var n = 0
        var any = false
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          n = n * 10 + (bytes(i) - '0'); i += 1; any = true
        }
        require(any, "malformed PPM header")
        vals(v) = n
        v += 1
      }
      val (w, h, maxv) = (vals(0), vals(1), vals(2))
      require(maxv == 255, s"unsupported PPM maxval $maxv")
      require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
        s"implausible PPM dims ${w}x$h")
      i += 1 // single whitespace byte after maxval, then raw triplets
      require(bytes.length >= i.toLong + w.toLong * h * 3, "truncated PPM")
      val px = new Array[Byte](w * h * 3)
      System.arraycopy(bytes, i, px, 0, w * h * 3)
      BmpCodec.Image(w, h, px)
    }
  }

  /** REAL baseline-TIFF codec (uncompressed RGB strips, BOTH byte
    * orders — the scanned-document-corpus container): a TIFF 6.0
    * writer and an INDEPENDENT parser sharing BmpCodec's fixture
    * formulas, so the container-independent pixel oracles catch any
    * IFD/strip/endianness mistake. The writer emits the 9 required
    * baseline-RGB tags in ascending order with RowsPerStrip = 4
    * (h ≥ 12, so every fixture is MULTI-strip and the offset/bytecount
    * array walk is always exercised), byte order flipping with id
    * parity (II even / MM odd — the ExifCodec convention). The parser
    * is a generic bounds-guarded IFD walk: it reads whatever entry
    * layout it finds (inline vs offset values, SHORT vs LONG tag
    * types), validates the baseline-RGB contract, and reassembles
    * strips — bytes only, nothing shared with the synthesis formula.
    * MultimodalCodecSpec cross-checks decode against the JDK's own
    * ImageIO TIFF reader, pixel for pixel, in both byte orders. */
  object TiffCodec extends Serializable {

    def littleEndian(id: Long): Boolean = id % 2 == 0
    private val RowsPerStrip = 4

    /** PackBits (TIFF compression 32773): the RLE every scanned-fax
      * corpus carries. Encoder is greedy run/literal; decoder follows
      * the spec's signed-count scheme (n >= 0: n+1 literals; -127..-1:
      * 1-n repeats; -128: noop). */
    def packBits(raw: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < raw.length) {
        // measure the run at i
        var run = 1
        while (i + run < raw.length && run < 128 &&
               raw(i + run) == raw(i)) run += 1
        if (run >= 3) {
          out.write(1 - run) // -(run-1)
          out.write(raw(i))
          i += run
        } else {
          // literal until the next >=3 run (or 128 cap)
          var lit = run
          while (i + lit < raw.length && lit < 128 && {
            var r = 1
            while (i + lit + r < raw.length && r < 3 &&
                   raw(i + lit + r) == raw(i + lit)) r += 1
            r < 3
          }) lit += 1
          out.write(lit - 1)
          out.write(raw, i, lit)
          i += lit
        }
      }
      out.toByteArray
    }

    def unpackBits(packed: Array[Byte], want: Int): Array[Byte] = {
      val out = new Array[Byte](want)
      var i = 0
      var o = 0
      while (i < packed.length && o < want) {
        val n = packed(i)
        i += 1
        if (n >= 0) {
          require(i + n + 1 <= packed.length && o + n + 1 <= want,
            "PackBits literal overruns")
          System.arraycopy(packed, i, out, o, n + 1)
          i += n + 1
          o += n + 1
        } else if (n != -128) {
          require(i < packed.length && o + (1 - n) <= want,
            "PackBits run overruns")
          java.util.Arrays.fill(out, o, o + 1 - n, packed(i))
          i += 1
          o += 1 - n
        } // -128: noop per spec
      }
      require(o == want, s"PackBits strip decoded $o of $want bytes")
      out
    }

    // ---- LZW (TIFF 6.0 §13) ---------------------------------------------
    // The compression real scanned-document corpora actually carry.
    // MSB-first code packing, ClearCode 256 / EOI 257, and the spec's
    // "early change": code width grows when the NEXT free entry reaches
    // 2^width - 1 (511/1023/2047), one code earlier than plain LZW —
    // the off-by-one that makes or breaks interop with libtiff/ImageIO
    // (the codec spec cross-checks both against ImageIO pixel-exact).

    def lzwEncode(raw: Array[Byte]): Array[Byte] = {
      val Clear = 256
      val Eoi = 257
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L
      var bitCnt = 0
      var width = 9
      def put(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code
        bitCnt += width
        while (bitCnt >= 8) {
          out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt)
          bitCnt -= 8
        }
      }
      // prefix table: (prefixCode << 8 | byte) -> code
      var table = new java.util.HashMap[Integer, Integer]
      var nextCode = 258
      put(Clear)
      var prefix = -1
      var i = 0
      while (i < raw.length) {
        val b = raw(i) & 0xFF
        if (prefix < 0) prefix = b
        else {
          val k = Integer.valueOf((prefix << 8) | b)
          val hit = table.get(k)
          if (hit != null) prefix = hit.intValue()
          else {
            put(prefix)
            table.put(k, Integer.valueOf(nextCode))
            nextCode += 1
            // early change: grow when the next free code hits 2^w —
            // one code earlier than strictly necessary (an emittable
            // code still fits w bits until next free passes 2^w), the
            // libtiff/ImageIO convention
            if (nextCode == (1 << width) && width < 12) width += 1
            if (nextCode >= 4094) { // table nearly full: reset
              put(Clear)
              table = new java.util.HashMap[Integer, Integer]
              nextCode = 258
              width = 9
            }
            prefix = b
          }
        }
        i += 1
      }
      if (prefix >= 0) put(prefix)
      put(Eoi)
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
      out.toByteArray
    }

    def lzwDecode(packed: Array[Byte], want: Int): Array[Byte] = {
      val Clear = 256
      val Eoi = 257
      val out = new Array[Byte](want)
      var o = 0
      var bitBuf = 0L
      var bitCnt = 0
      var pos = 0
      var width = 9
      def next(): Int = {
        while (bitCnt < width) {
          require(pos < packed.length, "LZW stream truncated (no EOI)")
          bitBuf = (bitBuf << 8) | (packed(pos) & 0xFF)
          pos += 1
          bitCnt += 8
        }
        val c = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
        bitCnt -= width
        c
      }
      // table as (prefixCode, lastByte, length); roots are implicit
      val prefixOf = new Array[Int](4096)
      val byteOf = new Array[Byte](4096)
      val lenOf = new Array[Int](4096)
      var nextCode = 258
      def emit(code: Int): Byte = {
        // write the code's string ending at out[o + len - 1]; returns
        // its FIRST byte (needed for the KwKwK case)
        var c = code
        var at = o + lenOf(c)
        require(at <= want, s"LZW output overruns strip ($at > $want)")
        o = at
        while (c >= 258) {
          at -= 1
          out(at) = byteOf(c)
          c = prefixOf(c)
        }
        at -= 1
        out(at) = c.toByte
        out(at)
      }
      // roots: length 1, no prefix
      java.util.Arrays.fill(lenOf, 0, 256, 1)
      var old = -1
      var done = false
      while (!done) {
        val code = next()
        if (code == Eoi) done = true
        else if (code == Clear) {
          nextCode = 258
          width = 9
          old = -1
        } else if (old < 0) {
          require(code < 256, s"LZW first code after Clear is $code")
          out(o) = code.toByte
          o += 1
          old = code
        } else {
          require(code <= nextCode, s"LZW code $code beyond table")
          val firstByte = if (code < nextCode) emit(code)
          else { // KwKwK: string(old) + first byte of string(old)
            var c = old
            while (c >= 258) c = prefixOf(c)
            val fb = c.toByte
            prefixOf(nextCode) = old
            byteOf(nextCode) = fb
            lenOf(nextCode) = lenOf(old) + 1
            emit(code) // now defined
          }
          if (code < nextCode) {
            prefixOf(nextCode) = old
            byteOf(nextCode) = firstByte
            lenOf(nextCode) = lenOf(old) + 1
          }
          nextCode += 1
          // the decoder's table lags the encoder's by ONE entry (no
          // entry is added for the first code after Clear), so it
          // widens at 2^w - 1 — the TIFF 6.0 511/1023/2047 points —
          // matching the encoder's switch at 2^w
          if (nextCode == (1 << width) - 1 && width < 12) width += 1
          require(nextCode <= 4095, "LZW table overflow without Clear")
          old = code
        }
      }
      require(o == want, s"LZW strip decoded $o of $want bytes")
      out
    }

    // ---- Deflate (TIFF compression 8 / legacy 32946) ----------------------
    // zlib-wrapped per strip — "Adobe deflate", what `tiffcp -c zip`
    // and scanner toolchains emit.

    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }

    def inflate(packed: Array[Byte], want: Int): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(packed)
      val out = new Array[Byte](want)
      var o = 0
      while (o < want && !inf.finished()) {
        val n = inf.inflate(out, o, want - o)
        require(n > 0 || !inf.needsInput,
          "TIFF deflate strip truncated")
        o += n
      }
      inf.end()
      require(o == want, s"deflate strip decoded $o of $want bytes")
      out
    }

    def encode(id: Long): Array[Byte] = encode(id, packbits = false)

    def encode(id: Long, packbits: Boolean): Array[Byte] =
      encode(id, if (packbits) 32773 else 1)

    def encode(id: Long, compression: Int): Array[Byte] =
      encode(id, compression, predictor2 = false)

    /** compression: 1 none, 32773 PackBits, 5 LZW, 8 zlib Deflate;
      * predictor2 applies TIFF horizontal differencing (tag 317 = 2,
      * per row per sample) before compression — what `tiffcp -c lzw:2`
      * and most scanner toolchains emit, because differenced scans
      * compress far better. */
    def encode(id: Long, compression: Int, predictor2: Boolean)
        : Array[Byte] = {
      val packbits = compression == 32773
      require(!predictor2 || compression == 5 || compression == 8,
        "predictor 2 is only defined for LZW/Deflate")
      val (w, h) = BmpCodec.dims(id)
      val le = littleEndian(id)
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit =
        if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
        else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      def u32(v: Long): Unit =
        if (le) {
          out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
          out.write(((v >> 16) & 0xFF).toInt)
          out.write(((v >> 24) & 0xFF).toInt)
        } else {
          out.write(((v >> 24) & 0xFF).toInt)
          out.write(((v >> 16) & 0xFF).toInt)
          out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
        }
      val nStrips = (h + RowsPerStrip - 1) / RowsPerStrip
      val stripRows = (0 until nStrips)
        .map(k => math.min(RowsPerStrip, h - k * RowsPerStrip))
      // each strip's raw RGB rows, compressed per strip when packbits
      // (TIFF compresses strip-by-strip, never across strips)
      val strips = (0 until nStrips).map { k =>
        val rows = stripRows(k)
        val raw = new Array[Byte](rows * w * 3)
        var i = 0
        var y = k * RowsPerStrip
        while (y < k * RowsPerStrip + rows) {
          var x = 0
          while (x < w) {
            val (r, g, b) = BmpCodec.pixel(id, x, y)
            raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
            i += 3
            x += 1
          }
          y += 1
        }
        if (packbits) {
          // TIFF 6.0 mandates PackBits per ROW (a run must not cross a
          // row boundary), so strict row-at-a-time decoders stay happy;
          // the concatenated per-row streams decode identically under
          // a whole-strip unpack
          val o = new java.io.ByteArrayOutputStream()
          var r2 = 0
          while (r2 < rows) {
            o.write(packBits(java.util.Arrays.copyOfRange(
              raw, r2 * w * 3, (r2 + 1) * w * 3)))
            r2 += 1
          }
          o.toByteArray
        } else if (compression == 1) raw
        else {
          val pre = if (!predictor2) raw else {
            // horizontal differencing per ROW per SAMPLE (mod 256):
            // each byte minus the same sample 3 bytes earlier
            val d = raw.clone()
            var r2 = 0
            while (r2 < rows) {
              var i = (r2 + 1) * w * 3 - 1
              while (i >= r2 * w * 3 + 3) {
                d(i) = (raw(i) - raw(i - 3)).toByte
                i -= 1
              }
              r2 += 1
            }
            d
          }
          if (compression == 5) lzwEncode(pre) else deflate(pre)
        }
      }
      val stripLens = strips.map(_.length)
      val stripOffs = stripLens.map(_.toLong).scanLeft(8L)(_ + _).init
      val bpsOff = 8L + stripLens.sum
      val soOff = bpsOff + 6
      val sbcOff = soOff + 4L * nStrips
      val ifdOff = sbcOff + 4L * nStrips
      // header
      out.write((if (le) "II" else "MM").getBytes("US-ASCII"))
      u16(42)
      u32(ifdOff)
      strips.foreach(out.write)
      // out-of-line values: BitsPerSample [8,8,8], then the strip arrays
      u16(8); u16(8); u16(8)
      stripOffs.foreach(u32)
      stripLens.foreach(v => u32(v.toLong))
      // IFD: 9 baseline-RGB entries, ascending tag order
      def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
        u16(tag); u16(typ); u32(count)
        val before = out.size()
        value
        while (out.size() < before + 4) out.write(0) // pad the value slot
      }
      u16(if (predictor2) 10 else 9)
      entry(256, 4, 1)(u32(w.toLong))            // ImageWidth
      entry(257, 4, 1)(u32(h.toLong))            // ImageLength
      entry(258, 3, 3)(u32(bpsOff))              // BitsPerSample -> offset
      entry(259, 3, 1)(u16(compression))         // Compression
      entry(262, 3, 1)(u16(2))                   // Photometric: RGB
      entry(273, 4, nStrips.toLong)(u32(soOff))  // StripOffsets
      entry(277, 3, 1)(u16(3))                   // SamplesPerPixel
      entry(278, 4, 1)(u32(RowsPerStrip.toLong)) // RowsPerStrip
      entry(279, 4, nStrips.toLong)(u32(sbcOff)) // StripByteCounts
      if (predictor2) entry(317, 3, 1)(u16(2))   // Predictor: horizontal
      u32(0)                                     // next IFD: none
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): BmpCodec.Image = {
      require(bytes.length >= 8, "truncated TIFF header")
      val le = (bytes(0), bytes(1)) match {
        case ('I', 'I') => true
        case ('M', 'M') => false
        case _ => throw new IllegalArgumentException("not a TIFF")
      }
      def u16(at: Long): Int = {
        require(at >= 0 && at + 2 <= bytes.length, "TIFF read out of bounds")
        val a = bytes(at.toInt) & 0xFF
        val b = bytes(at.toInt + 1) & 0xFF
        if (le) a | (b << 8) else (a << 8) | b
      }
      def u32(at: Long): Long = {
        require(at >= 0 && at + 4 <= bytes.length, "TIFF read out of bounds")
        val v = (0 until 4).map(i => (bytes(at.toInt + i) & 0xFFL))
        if (le) v(0) | (v(1) << 8) | (v(2) << 16) | (v(3) << 24)
        else (v(0) << 24) | (v(1) << 16) | (v(2) << 8) | v(3)
      }
      require(u16(2) == 42, "bad TIFF magic")
      val ifd = u32(4)
      val n = u16(ifd)
      require(n > 0 && n <= 512, s"implausible TIFF entry count $n")
      require(ifd + 2 + n * 12 + 4 <= bytes.length, "truncated TIFF IFD")
      val entries = (0 until n).map { i =>
        val e = ifd + 2 + i * 12
        u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
      }.toMap
      def typeSize(typ: Int): Int = typ match {
        case 1 => 1; case 3 => 2; case 4 => 4
        case t => throw new IllegalArgumentException(s"TIFF value type $t")
      }
      /** All values of one entry as longs (inline when they fit the
        * 4-byte slot, out-of-line otherwise — the TIFF 6.0 rule). */
      def values(tag: Int): Seq[Long] = entries.get(tag) match {
        case None => Seq.empty
        case Some((typ, count, slot)) =>
          val sz = typeSize(typ)
          require(count >= 0 && count <= 65535, s"TIFF count $count")
          val at = if (count * sz <= 4) slot else u32(slot)
          (0L until count).map { i =>
            typ match {
              case 1 =>
                require(at + i >= 0 && at + i < bytes.length,
                  "TIFF read out of bounds")
                (bytes((at + i).toInt) & 0xFF).toLong
              case 3 => u16(at + i * 2).toLong
              case 4 => u32(at + i * 4)
            }
          }
      }
      def one(tag: Int, name: String): Long = {
        val v = values(tag)
        require(v.length == 1, s"TIFF $name must have one value")
        v.head
      }
      val w = one(256, "ImageWidth")
      val h = one(257, "ImageLength")
      require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
        s"implausible TIFF dims ${w}x$h")
      // decompression-bomb guard (the PNG inflate-guard discipline):
      // a ~200-byte header can declare dims whose pixel buffer is
      // gigabytes — and w*h*3 at the per-dim cap overflows Int. Bound
      // the TOTAL before any allocation; untrusted lake bytes reach
      // this parser through the sniffKind seam.
      require(w * h <= (1L << 26),
        s"TIFF pixel count ${w}x$h exceeds the 64M-pixel decode bound")
      val compression = one(259, "Compression") match {
        case 32946 => 8L // legacy Deflate code, same codec
        case c => c
      }
      require(compression == 1 || compression == 32773 ||
          compression == 5 || compression == 8,
        s"unsupported TIFF compression $compression " +
          "(none, PackBits, LZW, Deflate)")
      // predictor tag (317): 1 = none, 2 = horizontal differencing
      // (applied after decompression, per row per sample)
      val predictor = values(317).headOption.getOrElse(1L)
      require(predictor == 1 || predictor == 2,
        s"unsupported TIFF predictor $predictor")
      require(predictor == 1 || compression == 5 || compression == 8,
        "predictor 2 outside LZW/Deflate")
      require(one(262, "Photometric") == 2, "TIFF must be RGB")
      require(one(277, "SamplesPerPixel") == 3, "TIFF must be 3-sample")
      require(values(258) == Seq(8L, 8L, 8L), "TIFF must be 8-bit/sample")
      val rps = entries.get(278).map(_ => one(278, "RowsPerStrip"))
        .getOrElse(h)
      require(rps > 0, "bad RowsPerStrip")
      val offs = values(273)
      val lens = values(279)
      require(offs.nonEmpty && offs.length == lens.length,
        "TIFF strip offsets/bytecounts mismatch")
      require(offs.length == ((h + rps - 1) / rps),
        "TIFF strip count does not cover the image")
      val px = new Array[Byte]((w * h * 3).toInt)
      var strip = 0
      var row = 0L
      while (strip < offs.length) {
        val rows = math.min(rps, h - row)
        val want = rows * w * 3
        val off = offs(strip)
        val len = lens(strip)
        require(off >= 0 && len >= 0 && off + len <= bytes.length,
          "TIFF strip out of bounds")
        if (compression != 1) {
          val packed = java.util.Arrays.copyOfRange(
            bytes, off.toInt, (off + len).toInt)
          val strip0 = compression match {
            case 32773 => unpackBits(packed, want.toInt)
            case 5 => lzwDecode(packed, want.toInt)
            case 8 => inflate(packed, want.toInt)
          }
          if (predictor == 2) {
            // undo horizontal differencing: accumulate per row per
            // sample (mod 256) — rows never span strips in TIFF
            var r2 = 0L
            while (r2 < rows) {
              var i = (r2 * w * 3 + 3).toInt
              val rowEnd = ((r2 + 1) * w * 3).toInt
              while (i < rowEnd) {
                strip0(i) = (strip0(i) + strip0(i - 3)).toByte
                i += 1
              }
              r2 += 1
            }
          }
          System.arraycopy(strip0, 0, px,
            (row * w * 3).toInt, want.toInt)
        } else {
          require(len == want,
            s"TIFF strip $strip is $len B, want $want")
          System.arraycopy(bytes, off.toInt, px, (row * w * 3).toInt,
            want.toInt)
        }
        row += rows
        strip += 1
      }
      BmpCodec.Image(w.toInt, h.toInt, px)
    }
  }

  /** REAL compressed-image codec: PNG, 8-bit truecolor (color type 2),
    * built entirely on the JDK (`java.util.zip.Deflater`/`Inflater`,
    * `CRC32`) — the first container behind the seam whose payload is
    * genuinely compressed, so byte length is NOT a closed formula of the
    * id (the PNG queries therefore pin pixels, never file size).
    *
    * The encoder cycles the scanline filter with the row index
    * (y % 5: None, Sub, Up, Average, Paeth), so every decode exercises
    * all five unfilter paths including the Paeth predictor. The decoder
    * walks chunks from the 8-byte signature, VALIDATES each chunk's
    * CRC-32 (rejecting corruption instead of misparsing it), concatenates
    * IDAT payloads, inflates, and unfilters — bytes only, nothing shared
    * with the synthesis formula. MultimodalCodecSpec additionally
    * cross-checks both directions against the JDK's own independent
    * ImageIO PNG implementation. */
  object PngCodec extends Serializable {

    private val Sig: Array[Byte] =
      Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

    private def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

    private def rdBe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

    private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t)
      crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }

    // ---- tEXt metadata (PNG spec 11.3.4.3) ------------------------------
    // The PNG-side metadata sidecar: keyword NUL text, Latin-1, one
    // chunk per pair — where authoring tools leave Author/Software and
    // (the curation-relevant one) location strings. The fixture
    // formulas, a CRC-verified extractor, and a scrubber that drops
    // the WHOLE textual family (tEXt/zTXt/iTXt) while copying every
    // other chunk byte-identically — the EXIF-scrub contract for PNG.

    def authorOf(id: Long): String = s"author${id % 10}"
    def softwareOf(id: Long): String = s"graftcam ${id % 5}.${id % 10}"
    def hasLocation(id: Long): Boolean = id % 3 == 0
    def locationOf(id: Long): String = s"geo:${id % 90},${id % 180}"

    def descriptionOf(id: Long): String =
      s"synthetic fixture image number $id, deflate-compressed metadata"

    /** Fixture PNG with tEXt chunks — plus one zTXt (deflate-compressed
      * text, method 0), so the extractor's decompression path is
      * exercised in-fixture — spliced right after IHDR. */
    def encodeWithText(id: Long): Array[Byte] = {
      val png = encode(id)
      def tChunk(k: String, v: String): Array[Byte] =
        chunk("tEXt", k.getBytes("ISO-8859-1") ++ Array[Byte](0) ++
          v.getBytes("ISO-8859-1"))
      def zChunk(k: String, v: String): Array[Byte] = {
        val d = new java.util.zip.Deflater()
        d.setInput(v.getBytes("ISO-8859-1"))
        d.finish()
        val buf = new Array[Byte](v.length * 2 + 64)
        val n = d.deflate(buf)
        d.end()
        chunk("zTXt", k.getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
          buf.take(n))
      }
      val ins = tChunk("Author", authorOf(id)) ++
        tChunk("Software", softwareOf(id)) ++
        zChunk("Description", descriptionOf(id)) ++
        (if (hasLocation(id)) tChunk("Location", locationOf(id))
         else Array.emptyByteArray)
      val ihdrEnd = 8 + 12 + 13 // signature + IHDR chunk framing + data
      png.take(ihdrEnd) ++ ins ++ png.drop(ihdrEnd)
    }

    /** Every tEXt (keyword, text) pair, in chunk order; the walk is
      * decode()'s (CRC verified per chunk, bounds-safe requires). */
    def textChunks(bytes: Array[Byte]): Seq[(String, String)] = {
      require(bytes.length >= 8 && Sig.indices.forall(i => bytes(i) == Sig(i)),
        "not a PNG")
      val out = Seq.newBuilder[(String, String)]
      var off = 8
      var done = false
      while (!done) {
        require(off + 8 <= bytes.length, "truncated PNG chunk header")
        val len = rdBe32(bytes, off)
        require(len >= 0 && off + 12L + len <= bytes.length,
          "truncated PNG chunk")
        val tag = new String(bytes, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == rdBe32(bytes, off + 8 + len),
          s"PNG $tag chunk CRC mismatch")
        if (tag == "tEXt" || tag == "zTXt") {
          val nul = (off + 8 until off + 8 + len)
            .find(bytes(_) == 0)
            .getOrElse(throw new IllegalArgumentException(
              s"$tag chunk missing keyword terminator"))
          val key = new String(bytes, off + 8, nul - (off + 8), "ISO-8859-1")
          val text =
            if (tag == "tEXt")
              new String(bytes, nul + 1, off + 8 + len - nul - 1,
                "ISO-8859-1")
            else {
              // zTXt: keyword NUL method(0=deflate) compressed-text
              require(nul + 1 < off + 8 + len && bytes(nul + 1) == 0,
                "unsupported zTXt compression method")
              val inf = new java.util.zip.Inflater()
              inf.setInput(bytes, nul + 2, off + 8 + len - nul - 2)
              val sb = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](256)
              while (!inf.finished()) {
                val n = inf.inflate(buf)
                require(n > 0 || inf.finished(), "truncated zTXt stream")
                sb.write(buf, 0, n)
                require(sb.size() <= (1 << 20), "implausible zTXt size")
              }
              inf.end()
              new String(sb.toByteArray, "ISO-8859-1")
            }
          out += ((key, text))
        }
        if (tag == "IEND") done = true
        off += 12 + len
      }
      out.result()
    }

    /** Drop the textual chunk family (tEXt/zTXt/iTXt), copying every
      * other chunk — framing, data, and CRC — byte-identically. */
    def stripText(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.length >= 8 && Sig.indices.forall(i => bytes(i) == Sig(i)),
        "not a PNG")
      val out = new java.io.ByteArrayOutputStream()
      out.write(bytes, 0, 8)
      var off = 8
      var done = false
      while (!done) {
        require(off + 8 <= bytes.length, "truncated PNG chunk header")
        val len = rdBe32(bytes, off)
        require(len >= 0 && off + 12L + len <= bytes.length,
          "truncated PNG chunk")
        val tag = new String(bytes, off + 4, 4, "US-ASCII")
        if (tag != "tEXt" && tag != "zTXt" && tag != "iTXt")
          out.write(bytes, off, 12 + len)
        if (tag == "IEND") done = true
        off += 12 + len
      }
      out.toByteArray
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Adam7 pass grid: (x0, dx, y0, dy) per pass (PNG spec §8.2). */
    private val Adam7: Array[(Int, Int, Int, Int)] = Array(
      (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
      (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))

    /** Filter one sub-image's scanlines (pixels supplied row-major as
      * wp×hp RGB) into `out`, filter type (ftBase + y) % 5; the filter
      * context is LOCAL to the sub-image (prior = previous row of the
      * same pass — PNG spec §8.2: each pass filters independently). */
    private def filterInto(out: java.io.ByteArrayOutputStream,
        px: Array[Byte], wp: Int, hp: Int, ftBase: Int): Unit = {
      val stride = wp * 3
      var y = 0
      while (y < hp) {
        val ft = (ftBase + y) % 5
        out.write(ft)
        var i = 0
        while (i < stride) {
          val v = px(y * stride + i) & 0xFF
          val left = if (i >= 3) px(y * stride + i - 3) & 0xFF else 0
          val up = if (y > 0) px((y - 1) * stride + i) & 0xFF else 0
          val ul = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xFF
            else 0
          out.write(((ft match {
            case 0 => v
            case 1 => v - left
            case 2 => v - up
            case 3 => v - (left + up) / 2
            case _ => v - paeth(left, up, ul)
          }) & 0xFF))
          i += 1
        }
        y += 1
      }
    }

    private def deflate(raw: Array[Byte]): Array[Byte] = {
      val deflater = new java.util.zip.Deflater
      deflater.setInput(raw)
      deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream
      while (!deflater.finished())
        out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      out.toByteArray
    }

    private def wrap(w: Int, h: Int, interlace: Int,
        idat: Array[Byte]): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, interlace.toByte)
      Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.empty[Byte])
    }

    /** Write a real PNG (8-bit RGB, no interlace) with the SAME fixture
      * content as BmpCodec for `id`; filter type y % 5 per scanline. */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = BmpCodec.dims(id)
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = BmpCodec.pixel(id, x, y)
          px((y * w + x) * 3) = r.toByte
          px((y * w + x) * 3 + 1) = g.toByte
          px((y * w + x) * 3 + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream
      filterInto(out, px, w, h, 0)
      wrap(w, h, 0, deflate(out.toByteArray))
    }

    /** Write a real Adam7-INTERLACED PNG (8-bit RGB) with the same
      * fixture content: seven per-pass sub-images, each filtered
      * independently (PNG spec §8.2 — the progressive wire format of
      * the PNG world, the sibling of JpegCodec's SOF2 path). Filter
      * base varies per pass so every pass exercises several filter
      * types. */
    def encodeInterlaced(id: Long): Array[Byte] = {
      val (w, h) = BmpCodec.dims(id)
      val out = new java.io.ByteArrayOutputStream
      var p = 0
      while (p < 7) {
        val (x0, dx, y0, dy) = Adam7(p)
        val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (wp > 0 && hp > 0) {
          val sub = new Array[Byte](wp * hp * 3)
          var j = 0
          while (j < hp) {
            var i = 0
            while (i < wp) {
              val (r, g, b) = BmpCodec.pixel(id, x0 + i * dx, y0 + j * dy)
              sub((j * wp + i) * 3) = r.toByte
              sub((j * wp + i) * 3 + 1) = g.toByte
              sub((j * wp + i) * 3 + 2) = b.toByte
              i += 1
            }
            j += 1
          }
          filterInto(out, sub, wp, hp, p)
        }
        p += 1
      }
      wrap(w, h, 1, deflate(out.toByteArray))
    }

    /** Parse a PNG from bytes alone (8-bit RGB, CRC-checked chunks). */
    def decode(bytes: Array[Byte]): BmpCodec.Image = {
      require(bytes.length >= 8 && Sig.indices.forall(i => bytes(i) == Sig(i)),
        "not a PNG")
      var off = 8
      var w = 0
      var h = 0
      var seenIhdr = false
      var interlaced = false
      val idat = new java.io.ByteArrayOutputStream
      var done = false
      while (!done) {
        require(off + 8 <= bytes.length, "truncated PNG chunk header")
        val len = rdBe32(bytes, off)
        require(len >= 0 && off + 12L + len <= bytes.length,
          "truncated PNG chunk")
        val tag = new String(bytes, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == rdBe32(bytes, off + 8 + len),
          s"PNG $tag chunk CRC mismatch")
        tag match {
          case "IHDR" =>
            require(len == 13, "bad IHDR length")
            w = rdBe32(bytes, off + 8)
            h = rdBe32(bytes, off + 12)
            require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
              s"implausible PNG dims ${w}x$h")
            // decompression-bomb guard: unlike BMP/PPM, a tiny
            // compressed file can declare huge dims, and the raw
            // scanline buffer h*(1+w*3) is allocated BEFORE inflating —
            // unbounded it overflows Int (NegativeArraySizeException,
            // not a clean reject) or allocates gigabytes from a
            // 100-byte input. 2^24 pixels = ~50 MB raw, far above any
            // fixture and below any harm.
            require(w.toLong * h <= (1L << 24),
              s"PNG pixel count ${w.toLong * h} above decode bound")
            val depth = bytes(off + 16)
            val color = bytes(off + 17)
            interlaced = bytes(off + 20) == 1
            require(depth == 8 && color == 2 &&
              (bytes(off + 20) == 0 || bytes(off + 20) == 1),
              s"unsupported PNG variant: depth=$depth color=$color " +
                s"interlace=${bytes(off + 20)}")
            seenIhdr = true
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk: skip (CRC already checked)
        }
        off += 12 + len
      }
      require(seenIhdr && idat.size() > 0, "PNG missing IHDR/IDAT")
      // pass layout: Adam7 sub-images when interlaced, else ONE pass
      // covering the image — the same de-filter walks both layouts
      val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
        if (interlaced) Adam7.toSeq.map { case (x0, dx, y0, dy) =>
          val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
          (x0, dx, y0, dy, wp, hp)
        }.filter(t => t._5 > 0 && t._6 > 0)
        else Seq((0, 1, 0, 1, w, h))
      val rawLen = passes.map(t => t._6.toLong * (1 + t._5 * 3)).sum
      // bounded by the pixel-count guard above (~50 MB + pass overhead)
      require(rawLen <= (1L << 28), "PNG raw stream above decode bound")
      val raw = new Array[Byte](rawLen.toInt)
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          require(n > 0 || inflater.finished(), "malformed PNG deflate data")
          got += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"corrupt PNG zlib stream: $e")
      } finally inflater.end()
      require(got == raw.length, "PNG pixel data short of expected scanlines")
      val px = new Array[Byte](w * h * 3)
      var rawOff = 0
      passes.foreach { case (x0, dx, y0, dy, wp, hp) =>
        val stride = wp * 3
        val sub = new Array[Byte](hp * stride)
        var y = 0
        while (y < hp) {
          val ft = raw(rawOff) & 0xFF
          rawOff += 1
          require(ft <= 4, s"unknown PNG filter type $ft")
          var i = 0
          while (i < stride) {
            val v = raw(rawOff) & 0xFF
            rawOff += 1
            val left = if (i >= 3) sub(y * stride + i - 3) & 0xFF else 0
            val up = if (y > 0) sub((y - 1) * stride + i) & 0xFF else 0
            val ul = if (y > 0 && i >= 3) sub((y - 1) * stride + i - 3) & 0xFF
              else 0
            sub(y * stride + i) = (ft match {
              case 0 => v
              case 1 => v + left
              case 2 => v + up
              case 3 => v + (left + up) / 2
              case _ => v + paeth(left, up, ul)
            }).toByte
            i += 1
          }
          y += 1
        }
        // scatter the pass's sub-image onto the Adam7 grid
        var j = 0
        while (j < hp) {
          var i = 0
          while (i < wp) {
            val di = ((y0 + j * dy) * w + (x0 + i * dx)) * 3
            px(di) = sub((j * wp + i) * 3)
            px(di + 1) = sub((j * wp + i) * 3 + 1)
            px(di + 2) = sub((j * wp + i) * 3 + 2)
            i += 1
          }
          j += 1
        }
      }
      BmpCodec.Image(w, h, px)
    }
  }

  /** REAL audio codec for uncompressed PCM-16 mono WAV: a canonical
    * 44-byte RIFF/WAVE header writer and an INDEPENDENT byte-only parser
    * (chunk walk from offset 12 — reads `fmt `'s sample rate and `data`'s
    * little-endian int16 payload, skips unknown chunks word-aligned; the
    * decode path never consults the synthesis formulas, so the
    * formula-derived oracle catches any header-offset/endianness/chunk
    * mistake). Pure JVM — no codec libraries needed.
    *
    * Fixture formulas (the PcapSynth pattern): rate = 8000 + (id%3)*4000,
    * n = 200 + id%57, sample_i = ((id*31 + i*i*7) mod 65536) - 32768. */
  object WavCodec extends Serializable {
    def rate(id: Long): Int = 8000 + (id % 3).toInt * 4000
    def nSamples(id: Long): Int = 200 + (id % 57).toInt
    def sample(id: Long, i: Int): Int =
      (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt

    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte
      b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte
      b(off + 3) = (v >>> 24).toByte
    }
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte
      b(off + 1) = (v >>> 8).toByte
    }
    private def tag(b: Array[Byte], off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { b(off + i) = s.charAt(i).toByte; i += 1 }
    }

    def encode(id: Long): Array[Byte] = {
      val n = nSamples(id)
      val r = rate(id)
      val out = new Array[Byte](44 + n * 2)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + n * 2); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, 1)                  // PCM
      le16(out, 22, 1)                  // mono
      le32(out, 24, r)                  // sample rate
      le32(out, 28, r * 2)              // byte rate
      le16(out, 32, 2)                  // block align
      le16(out, 34, 16)                 // bits per sample
      tag(out, 36, "data"); le32(out, 40, n * 2)
      var i = 0
      while (i < n) {
        le16(out, 44 + 2 * i, sample(id, i) & 0xFFFF)
        i += 1
      }
      out
    }

    // ---- G.711 (ITU-T; RFC 3551 payload types 0/8) ----------------------
    // The telephony companders RTP audio actually carries: 8-bit log-
    // companded samples expanding to 13/14-bit linear PCM. The decode
    // tables are pure spec arithmetic (segment/mantissa unpack), written
    // here from the G.711 definition — integer-exact, so the DuckDB
    // oracle re-derives every expanded sample in closed form.

    /** Fixture compressed byte i of clip id (every byte value 0..255 is
      * a valid G.711 codeword, so the formula needs no masking care). */
    def g711Byte(id: Long, i: Int): Int =
      ((id * 31 + i.toLong * i * 7) % 256).toInt

    /** µ-law codeword → linear PCM (G.711 table 2a/2b): complement,
      * unpack 3-bit segment + 4-bit mantissa around the 33-step bias,
      * sign from bit 7. Range ±32124. */
    def ulawExpand(b: Int): Int = {
      val u = (~b) & 0xFF
      val t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }

    /** A-law codeword → linear PCM (G.711 table 1a/1b): invert the
      * even bits (0x55 toggle), unpack segment + mantissa (segment 0
      * is linear with a half-step offset, segment 1 starts the
      * doubling chain), sign from bit 7. Range ±32256. */
    def alawExpand(b: Int): Int = {
      val a = b ^ 0x55
      val seg = (a >> 4) & 0x07
      val t = seg match {
        case 0 => ((a & 0x0F) << 4) + 8
        case 1 => ((a & 0x0F) << 4) + 0x108
        case _ => (((a & 0x0F) << 4) + 0x108) << (seg - 1)
      }
      if ((a & 0x80) != 0) t else -t
    }

    // ---- IMA/DVI ADPCM (WAVE format tag 0x11; RFC 3551 "DVI4") ----------
    // The 4-bit differential compander: each code adjusts a running
    // predictor by a fraction of an 89-entry step table whose index
    // walks with the code magnitude. Block-structured in WAV — every
    // block restarts the state from a 4-byte header (predictor int16,
    // step index, reserved), so blocks decode independently (the
    // seek/robustness property the container format exists for).
    // Tables and update rule are the public IMA interchange algorithm.

    /** IMA step-size table (89 entries). */
    val ImaSteps: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)

    /** Step-index walk per 3-bit code magnitude. */
    val ImaIndexDelta: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** Fixture: data bytes per block (fixed — 129 samples/block). */
    val ImaBlockData: Int = 64
    def imaNBlocks(id: Long): Int = 2 + (id % 3).toInt
    def imaPred0(id: Long, b: Int): Int =
      (((id * 31 + b * 101) % 65536) - 32768).toInt
    def imaIdx0(id: Long, b: Int): Int = ((id + b * 7) % 89).toInt
    def imaData(id: Long, b: Int, i: Int): Int =
      ((id * 13 + b * 53 + i * 29) % 256).toInt

    /** IMA ADPCM WAV writer: format tag 0x11, the 20-byte extended fmt
      * chunk (cbSize 2 + wSamplesPerBlock), one 4-byte state header +
      * [[ImaBlockData]] nibble bytes per block from the fixture
      * formulas. */
    def encodeImaAdpcm(id: Long): Array[Byte] = {
      val r = rate(id)
      val nbk = imaNBlocks(id)
      val blockAlign = 4 + ImaBlockData
      val spb = 1 + 2 * ImaBlockData
      val dataSize = nbk * blockAlign
      val out = new Array[Byte](48 + dataSize)
      tag(out, 0, "RIFF"); le32(out, 4, 40 + dataSize); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 20)
      le16(out, 20, 0x11)               // IMA ADPCM
      le16(out, 22, 1)                  // mono
      le32(out, 24, r)                  // sample rate
      le32(out, 28, r * blockAlign / spb) // byte rate (approx, informative)
      le16(out, 32, blockAlign)
      le16(out, 34, 4)                  // bits per sample
      le16(out, 36, 2)                  // cbSize
      le16(out, 38, spb)                // wSamplesPerBlock
      tag(out, 40, "data"); le32(out, 44, dataSize)
      var b = 0
      while (b < nbk) {
        val base = 48 + b * blockAlign
        le16(out, base, imaPred0(id, b) & 0xFFFF)
        out(base + 2) = imaIdx0(id, b).toByte
        out(base + 3) = 0
        var i = 0
        while (i < ImaBlockData) {
          out(base + 4 + i) = imaData(id, b, i).toByte
          i += 1
        }
        b += 1
      }
      out
    }

    /** G.711 WAV writer: format tag 7 (µ-law) or 6 (A-law), 8 bits per
      * sample, one codeword byte per sample from [[g711Byte]]. */
    def encodeG711(id: Long, alaw: Boolean): Array[Byte] = {
      val n = nSamples(id)
      val r = rate(id)
      val out = new Array[Byte](44 + n)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + n); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, if (alaw) 6 else 7) // WAVE_FORMAT_ALAW / _MULAW
      le16(out, 22, 1)                  // mono
      le32(out, 24, r)                  // sample rate
      le32(out, 28, r)                  // byte rate (1 byte/sample)
      le16(out, 32, 1)                  // block align
      le16(out, 34, 8)                  // bits per sample
      tag(out, 36, "data"); le32(out, 40, n)
      var i = 0
      while (i < n) {
        out(44 + i) = g711Byte(id, i).toByte
        i += 1
      }
      out
    }

    final case class Audio(sampleRate: Int, samples: Array[Short])

    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

    /** Byte-only parse: RIFF/WAVE magics, then a chunk walk. */
    def decode(bytes: Array[Byte]): Audio = {
      def tagAt(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(bytes.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "WAVE",
        "not a RIFF/WAVE file")
      var off = 12
      var sampleRate = -1
      var fmtTag = -1
      var blockAlign = -1
      var dataOff = -1
      var dataSize = -1
      while (off + 8 <= bytes.length) {
        val id = tagAt(off)
        val size = rdLe32(bytes, off + 4)
        // compare in Long: a size near Int.MaxValue would wrap the Int
        // sum negative and sail past this check into a huge allocation
        require(size >= 0 && off + 8 + size.toLong <= bytes.length,
          s"truncated chunk $id")
        if (id == "fmt ") {
          require(size >= 16, "short fmt chunk")
          fmtTag = (bytes(off + 8) & 0xFF) | ((bytes(off + 9) & 0xFF) << 8)
          sampleRate = rdLe32(bytes, off + 12)
          blockAlign = (bytes(off + 20) & 0xFF) |
            ((bytes(off + 21) & 0xFF) << 8)
        } else if (id == "data") {
          // record and expand AFTER the walk: the RIFF spec does not
          // order chunks, and the sample width depends on the fmt tag
          dataOff = off + 8
          dataSize = size
        }
        off += 8 + size + (size & 1)    // RIFF chunks are word-aligned
      }
      require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
      val samples = fmtTag match {
        case 1 =>                       // PCM16 little-endian
          val n = dataSize / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((bytes(dataOff + 2 * i) & 0xFF) |
              (bytes(dataOff + 1 + 2 * i) << 8)).toShort
            i += 1
          }
          out
        case 6 | 7 =>                   // G.711 A-law / µ-law, 1 byte each
          val out = new Array[Short](dataSize)
          var i = 0
          while (i < dataSize) {
            val b = bytes(dataOff + i) & 0xFF
            out(i) = (if (fmtTag == 6) alawExpand(b) else ulawExpand(b)).toShort
            i += 1
          }
          out
        case 0x11 =>                    // IMA ADPCM: independent blocks
          require(blockAlign > 4 && dataSize % blockAlign == 0,
            "ADPCM blocks must tile the data chunk")
          val spb = 1 + 2 * (blockAlign - 4)
          val nbk = dataSize / blockAlign
          val out = new Array[Short](nbk * spb)
          var bI = 0
          while (bI < nbk) {
            val base = dataOff + bI * blockAlign
            // block header: predictor (int16 LE) IS the first output
            // sample; step index; reserved byte
            var pred = ((bytes(base) & 0xFF) |
              (bytes(base + 1) << 8)).toShort.toInt
            var idx = bytes(base + 2) & 0xFF
            require(idx <= 88, s"ADPCM step index $idx out of range")
            var o = bI * spb
            out(o) = pred.toShort; o += 1
            var i = 0
            while (i < blockAlign - 4) {
              val w = bytes(base + 4 + i) & 0xFF
              var n = 0
              while (n < 2) {
                val c = if (n == 0) w & 0xF else w >> 4 // low nibble first
                val step = ImaSteps(idx)
                var diff = step >> 3
                if ((c & 1) != 0) diff += step >> 2
                if ((c & 2) != 0) diff += step >> 1
                if ((c & 4) != 0) diff += step
                pred = if ((c & 8) != 0) pred - diff else pred + diff
                if (pred > 32767) pred = 32767
                else if (pred < -32768) pred = -32768
                idx += ImaIndexDelta(c & 7)
                if (idx < 0) idx = 0 else if (idx > 88) idx = 88
                out(o) = pred.toShort; o += 1
                n += 1
              }
              i += 1
            }
            bI += 1
          }
          out
        case t => throw new IllegalArgumentException(
          s"unsupported WAVE format tag $t")
      }
      Audio(sampleRate, samples)
    }
  }

  /** REAL video codec for uncompressed AVI: a minimal RIFF 'AVI ' writer
    * (LIST hdrl → avih carrying frame count + dims; LIST movi → one
    * '00db' DIB chunk per frame, the standard uncompressed-video frame
    * form: bottom-up BGR rows padded to 4 bytes, exactly the BMP pixel
    * array convention) and an INDEPENDENT byte-only parser that walks
    * the chunk tree and never consults the synthesis formulas. Pure JVM.
    *
    * Frame f of video id carries [[BmpCodec.pixel]] content under the
    * shifted id `id + 131*f` at [[BmpCodec.dims]](id) — so the oracle
    * re-derives every pixel sum from the formula alone. */
  object AviCodec extends Serializable {
    def nFrames(id: Long): Int = 3 + (id % 4).toInt
    def frameId(id: Long, f: Int): Long = id + 131L * f

    /** MJPEG frame-content id: the shift is lcm(14, 11) = 154 so every
      * frame's JPEG fixture dims ([[JpegCodec.dims]]: 21 + id % 14 ×
      * 13 + id % 11) equal frame 0's — a real video stream has one
      * frame size, and the container header declares it once. */
    def mjpegFrameId(id: Long, f: Int): Long = id + 154L * f

    private def le32(v: Int): Array[Byte] = Array(
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** Shared RIFF 'AVI ' assembly: LIST hdrl → avih (frame count +
      * dims), LIST movi → one chunk per frame under `chunkId` ('00db'
      * uncompressed DIB, '00dc' compressed — here MJPEG), word-aligned
      * per the RIFF contract. */
    private def riffAvi(w: Int, h: Int,
        frames: IndexedSeq[Array[Byte]], chunkId: String): Array[Byte] = {
      val avih = new Array[Byte](56)
      System.arraycopy(le32(33333), 0, avih, 0, 4)   // µs per frame (30fps)
      System.arraycopy(le32(frames.length), 0, avih, 16, 4) // dwTotalFrames
      System.arraycopy(le32(1), 0, avih, 24, 4)      // dwStreams
      System.arraycopy(le32(w), 0, avih, 32, 4)      // dwWidth
      System.arraycopy(le32(h), 0, avih, 36, 4)      // dwHeight
      val hdrl = tag("LIST") ++ le32(4 + 8 + 56) ++ tag("hdrl") ++
        tag("avih") ++ le32(56) ++ avih
      val moviBody = frames.flatMap { fr =>
        (tag(chunkId) ++ le32(fr.length) ++ fr ++
          (if (fr.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)).toSeq
      }.toArray
      val movi = tag("LIST") ++ le32(4 + moviBody.length) ++ tag("movi") ++
        moviBody
      val body = tag("AVI ") ++ hdrl ++ movi
      tag("RIFF") ++ le32(body.length) ++ body
    }

    def encode(id: Long): Array[Byte] = {
      val (w, h) = BmpCodec.dims(id)
      val stride = (w * 3 + 3) / 4 * 4
      def dibFrame(f: Int): Array[Byte] = {
        val b = new Array[Byte](stride * h)
        val fid = frameId(id, f)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val (r, g, bl) = BmpCodec.pixel(fid, x, y)
            b(row + x * 3) = bl.toByte
            b(row + x * 3 + 1) = g.toByte
            b(row + x * 3 + 2) = r.toByte
            x += 1
          }
          y += 1
        }
        b
      }
      riffAvi(w, h, (0 until nFrames(id)).map(dibFrame), "00db")
    }

    /** MJPEG-in-AVI: the first COMPRESSED video container — '00dc'
      * chunks each carrying a complete baseline JFIF stream from the
      * shared [[JpegCodec]] (real entropy coding, real wire format; no
      * new codec work, the round-11 verdict's point). Frame f carries
      * the coefficient-space fixture content of [[mjpegFrameId]], so
      * the lossy round-trip stays pixel-exactly predictable and the
      * closed-form JPEG oracle pins every decoded frame. */
    def encodeMjpeg(id: Long): Array[Byte] = {
      val (w, h) = JpegCodec.dims(id)
      riffAvi(w, h,
        (0 until nFrames(id)).map(f => JpegCodec.encode(mjpegFrameId(id, f))),
        "00dc")
    }

    final case class Video(w: Int, h: Int, frames: Vector[BmpCodec.Image])

    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

    /** Header-only parse: walk the RIFF tree to the first avih chunk and
      * return (width, height, declared frame count) WITHOUT touching the
      * movi list — stats queries need the header fields, not nf×w×h
      * unpacked pixels (round-6 ADVICE; mm_media_stats uses this).
      *
      * The walk is [[decode]]'s recursion verbatim — depth counts only
      * true descents and every inner chunk is bounded by its ENCLOSING
      * list's extent, not the file end — short-circuiting at avih. The
      * earlier linear walk counted sibling LISTs toward the nesting
      * bound (a valid AVI with 16+ lists — per-stream strl, INFO, odml,
      * rec — would throw) and let a chunk overflow its enclosing list as
      * long as it stayed inside the file (accepted where decode
      * rejects). Frame-count semantics: this is the DECLARED
      * dwTotalFrames; [[decode]] requires declared == actual movi
      * frames, so on any decodable AVI the two agree — a file whose
      * header lies yields header-only stats for a blob decode would
      * reject, which is the documented stats contract (header fields
      * describe the container's declaration). */
    def header(bytes: Array[Byte]): (Int, Int, Int) = {
      def tagAt(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      require(bytes.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "AVI ",
        "not a RIFF AVI")
      def walk(off0: Int, end: Int, depth: Int): Option[(Int, Int, Int)] = {
        require(depth < 16, "implausible LIST nesting")
        var off = off0
        while (off + 8 <= end) {
          val id = tagAt(off)
          val size = rd32(bytes, off + 4)
          require(size >= 0 && off + 8 + size.toLong <= end,
            s"truncated chunk $id")
          if (id == "avih") {
            require(size >= 56, "short avih")
            val total = rd32(bytes, off + 8 + 16)
            val w = rd32(bytes, off + 8 + 32)
            val h = rd32(bytes, off + 8 + 36)
            require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
              s"implausible AVI dims ${w}x$h")
            require(total >= 0 && total <= (1 << 20),
              s"implausible frame count $total")
            return Some((w, h, total))
          } else if (id == "LIST") {
            require(size >= 4, "short LIST chunk")
            val r = walk(off + 12, off + 8 + size, depth + 1)
            if (r.isDefined) return r
          }
          off += 8 + size + (size & 1)  // RIFF chunks are word-aligned
        }
        None
      }
      walk(12, bytes.length, 0).getOrElse(
        throw new IllegalArgumentException("no avih header found"))
    }

    /** Byte-only parse: RIFF('AVI ') → LIST hdrl (avih: dims, frame
      * count) → LIST movi ('00db' DIB frames, bottom-up padded BGR, or
      * '00dc' MJPEG frames decoded through [[JpegCodec]]). */
    def decode(bytes: Array[Byte]): Video = {
      def tagAt(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      require(bytes.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "AVI ",
        "not a RIFF AVI")
      var w, h, total = -1
      val frames = Vector.newBuilder[BmpCodec.Image]
      def dib(b: Array[Byte], off: Int, len: Int): BmpCodec.Image = {
        val stride = (w * 3 + 3) / 4 * 4
        require(len.toLong >= stride.toLong * h, "truncated DIB frame")
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val srcRow = off + (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            px((y * w + x) * 3) = b(srcRow + x * 3 + 2)
            px((y * w + x) * 3 + 1) = b(srcRow + x * 3 + 1)
            px((y * w + x) * 3 + 2) = b(srcRow + x * 3)
            x += 1
          }
          y += 1
        }
        BmpCodec.Image(w, h, px)
      }
      def walk(off0: Int, end: Int, depth: Int): Unit = {
        require(depth < 16, "implausible LIST nesting")
        var off = off0
        while (off + 8 <= end) {
          val id = tagAt(off)
          val size = rd32(bytes, off + 4)
          // Long compare: Int wraparound on a crafted size would pass
          // the bound and walk off to a negative offset
          require(size >= 0 && off + 8 + size.toLong <= end,
            s"truncated chunk $id")
          if (id == "LIST") {
            require(size >= 4, s"short LIST chunk")
            walk(off + 12, off + 8 + size, depth + 1) // skip the list type
          } else if (id == "avih") {
            require(size >= 56, "short avih")
            total = rd32(bytes, off + 8 + 16)
            w = rd32(bytes, off + 8 + 32)
            h = rd32(bytes, off + 8 + 36)
            // same overflow guard as BmpCodec.decode: bound dims before
            // any stride arithmetic
            require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
              s"implausible AVI dims ${w}x$h")
            require(total >= 0 && total <= (1 << 20),
              s"implausible frame count $total")
          } else if (id == "00db") {
            require(w > 0 && h > 0, "frame chunk before avih header")
            frames += dib(bytes, off + 8, size)
          } else if (id == "00dc") {
            // compressed frame: a complete JPEG stream per MJPEG
            // convention — route through the shared JpegCodec (both
            // baseline and progressive streams decode). The frame must
            // agree with the container's declared dims: an MJPEG whose
            // frames change size mid-stream is malformed.
            require(w > 0 && h > 0, "frame chunk before avih header")
            val img = JpegCodec.decode(
              java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size))
            require(img.w == w && img.h == h,
              s"MJPEG frame ${img.w}x${img.h} != declared ${w}x$h")
            frames += img
          }
          off += 8 + size + (size & 1)  // RIFF chunks are word-aligned
        }
      }
      walk(12, bytes.length, 0)
      val fs = frames.result()
      require(total == fs.length,
        s"avih declares $total frames, movi carries ${fs.length}")
      Video(w, h, fs)
    }
  }

  /** MP4 / ISO-BMFF (ISO 14496-12) container metadata — HEADER-ONLY:
    * the box-tree walk real video lakes need for stats/QC (dims, codec
    * fourcc, duration, track kinds) without any frame decode. The
    * encoder builds a minimal-but-valid file (ftyp + moov[mvhd +
    * trak[tkhd + mdia[mdhd + hdlr + minf[stbl[stsd]]]]] + mdat stub)
    * whose every field is a closed-form function of the id; the
    * decoder walks boxes generically — size/type framing, 64-bit
    * largesize, nesting bounded by the ENCLOSING box extent (the AVI
    * walk discipline), depth and box-count caps as the bomb guard —
    * and extracts mvhd timescale/duration, per-trak hdlr handler and
    * stsd first-entry fourcc, video width/height and audio sample
    * rate from the sample entries. stsd dims are authoritative (tkhd
    * dims are presentation hints). */
  object Mp4Codec extends Serializable {

    // fixture formulas (SQL-expressible)
    def dims(id: Long): (Int, Int) =
      (320 + (id % 5).toInt * 16, 240 + (id % 3).toInt * 16)
    def durationMs(id: Long): Long = 1000 + (id % 900) * 10
    def audioRate(id: Long): Int = if (id % 2 == 0) 48000 else 44100
    def videoCodec(id: Long): String = (id % 3) match {
      case 0 => "avc1"; case 1 => "hvc1"; case _ => "mp4v"
    }
    def hasTextTrack(id: Long): Boolean = id % 4 == 0
    def trackCount(id: Long): Int = if (hasTextTrack(id)) 3 else 2

    // sample-table formulas (SQL-expressible) — stts/stsz/stsc/stco
    // populations per track; audio uses the uniform-stsz branch and
    // 64-bit co64 chunk offsets (a >4 GiB mdat), video the
    // per-sample-size branch, stco, and stss keyframes every 8th
    def vSampleCount(id: Long): Int = 24 + (id % 48).toInt
    def vSampleSize(id: Long, k: Int): Int =
      400 + ((id * 31 + k * 17) % 256).toInt
    def vKeyframeCount(id: Long): Int = (vSampleCount(id) + 7) / 8
    def vChunkCount(id: Long): Int = (vSampleCount(id) + 4) / 5
    def aSampleCount(id: Long): Int = 50 + (id % 100).toInt
    def aSampleSize(id: Long): Int = 200 + (id % 50).toInt
    def aChunkCount(id: Long): Int = (aSampleCount(id) + 24) / 25
    val ChunkBase64: Long = (1L << 32) + 4096 // proves 64-bit offsets

    // edit-list formulas (SQL-expressible): the video trak opens with
    // an EMPTY edit (media_time -1 — the standard startup-delay
    // idiom) of leadMs, then presents the whole media; effective
    // presentation duration = lead + media (movie-timescale ms)
    def editLeadMs(id: Long): Long = (id % 7) * 100
    def editPresentationMs(id: Long): Long =
      editLeadMs(id) + durationMs(id)

    private def be16(v: Int): Array[Byte] =
      Array((v >>> 8).toByte, v.toByte)
    private def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def be64(v: Long): Array[Byte] = Array(
      (v >>> 56).toByte, (v >>> 48).toByte, (v >>> 40).toByte,
      (v >>> 32).toByte, (v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ cc(typ) ++ body
    }
    private def full(typ: String, payload: Array[Byte]*): Array[Byte] =
      box(typ, (be32(0) +: payload): _*) // version 0, flags 0

    private def mvhd(id: Long): Array[Byte] = full("mvhd",
      be32(0), be32(0),                  // creation, modification
      be32(1000), be32(durationMs(id)),  // timescale 1000 -> ms
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      // identity matrix
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0),
      be32(trackCount(id) + 1L))         // next_track_id

    private def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] =
      box("tkhd", be32(7), // version 0 + flags enabled|in-movie|in-preview
        be32(0), be32(0), be32(trackId.toLong), be32(0), be32(0),
        be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
        be32(0x00010000L), be32(0), be32(0),
        be32(0), be32(0x00010000L), be32(0),
        be32(0), be32(0), be32(0x40000000L),
        be32(w.toLong << 16), be32(h.toLong << 16)) // 16.16 fixed

    private def mdhd(timescale: Long, duration: Long): Array[Byte] =
      full("mdhd", be32(0), be32(0), be32(timescale), be32(duration),
        be16(0x55C4), be16(0)) // language 'und'

    private def hdlr(handler: String): Array[Byte] =
      full("hdlr", be32(0), cc(handler), be32(0), be32(0), be32(0),
        Array[Byte](0)) // empty NUL name

    private def videoEntry(fourcc: String, w: Int, h: Int): Array[Byte] =
      box(fourcc, new Array[Byte](6), be16(1), // reserved, data_ref_index
        be16(0), be16(0), new Array[Byte](12), // predefined/reserved
        be16(w), be16(h),
        be32(0x00480000L), be32(0x00480000L), // 72 dpi
        be32(0), be16(1),                     // reserved, frame_count
        new Array[Byte](32),                  // compressorname
        be16(24), be16(0xFFFF))               // depth, predefined -1

    private def audioEntry(rate: Int): Array[Byte] =
      box("mp4a", new Array[Byte](6), be16(1),
        be32(0), be32(0),
        be16(2), be16(16), be16(0), be16(0),  // channels, bits
        be32(rate.toLong << 16))              // 16.16 fixed

    private def textEntry: Array[Byte] =
      box("tx3g", new Array[Byte](6), be16(1))

    private def stsd(entry: Array[Byte]): Array[Byte] =
      full("stsd", be32(1), entry)

    // ---- sample tables (ISO 14496-12 §8.6-8.7) ----
    private def stts(count: Int, delta: Long): Array[Byte] =
      full("stts", be32(1), be32(count.toLong), be32(delta))
    private def stscOne(samplesPerChunk: Int): Array[Byte] =
      full("stsc", be32(1), be32(1), be32(samplesPerChunk.toLong),
        be32(1))
    private def stszPerSample(sizes: Seq[Int]): Array[Byte] =
      full("stsz", be32(0), be32(sizes.length.toLong),
        sizes.flatMap(sz => be32(sz.toLong).toSeq).toArray)
    private def stszUniform(size: Int, count: Int): Array[Byte] =
      full("stsz", be32(size.toLong), be32(count.toLong))
    private def stcoBox(offsets: Seq[Long]): Array[Byte] =
      full("stco", be32(offsets.length.toLong),
        offsets.flatMap(o => be32(o).toSeq).toArray)
    private def co64Box(offsets: Seq[Long]): Array[Byte] =
      full("co64", be32(offsets.length.toLong),
        offsets.flatMap(o => be64(o).toSeq).toArray)
    private def stssBox(keys: Seq[Int]): Array[Byte] =
      full("stss", be32(keys.length.toLong),
        keys.flatMap(k => be32(k.toLong).toSeq).toArray)

    /** edts/elst (ISO 14496-12 §8.6.5-8.6.6, version 0): entries of
      * (segment_duration u32 in MOVIE timescale, media_time i32 — -1
      * for an empty edit, rate 16.16). */
    private def edts(entries: Seq[(Long, Long)]): Array[Byte] =
      box("edts", full("elst", be32(entries.length.toLong),
        entries.flatMap { case (dur, mediaTime) =>
          (be32(dur) ++ be32(mediaTime & 0xFFFFFFFFL) ++
            be32(0x00010000L)).toSeq
        }.toArray))

    private def trak(trackId: Int, id: Long, handler: String): Array[Byte] = {
      val (w, h) = dims(id)
      val (tsc, dur, entry, tw, th) = handler match {
        case "vide" =>
          (30000L, durationMs(id) * 30, videoEntry(videoCodec(id), w, h),
            w, h)
        case "soun" =>
          (audioRate(id).toLong, durationMs(id) * audioRate(id) / 1000,
            audioEntry(audioRate(id)), 0, 0)
        case _ =>
          (1000L, durationMs(id), textEntry, 0, 0)
      }
      val tables: Seq[Array[Byte]] = handler match {
        case "vide" =>
          val n = vSampleCount(id)
          Seq(stts(n, 1000L), stscOne(5),
            stszPerSample((0 until n).map(k => vSampleSize(id, k))),
            stcoBox((0 until vChunkCount(id))
              .map(c => 4096L + 1000L * c)),
            stssBox((1 to n by 8).toSeq))
        case "soun" =>
          val n = aSampleCount(id)
          Seq(stts(n, 1024L), stscOne(25),
            stszUniform(aSampleSize(id), n),
            co64Box((0 until aChunkCount(id))
              .map(c => ChunkBase64 + 1000L * c)))
        case _ => Seq.empty
      }
      val edits: Seq[Array[Byte]] =
        if (handler == "vide")
          Seq(edts(Seq(
            editLeadMs(id) -> -1L,            // empty edit (startup delay)
            durationMs(id) -> 0L)))           // present the whole media
        else Seq.empty
      box("trak", (tkhd(trackId, tw, th) +: edits) :+
        box("mdia", mdhd(tsc, dur), hdlr(handler),
          box("minf", box("stbl", (stsd(entry) +: tables): _*))): _*)
    }

    def encode(id: Long): Array[Byte] = {
      val traks = Seq(trak(1, id, "vide"), trak(2, id, "soun")) ++
        (if (hasTextTrack(id)) Seq(trak(3, id, "text")) else Seq.empty)
      box("ftyp", cc("isom"), be32(0x200), cc("isom"), cc("mp42")) ++
        box("moov", (mvhd(id) +: traks): _*) ++
        box("mdat", Array.tabulate[Byte](16)(k => (id + k).toByte))
    }

    final case class Meta(durationMs: Long, tracks: Int,
        vCodec: String, w: Int, h: Int, aCodec: String, aRate: Int)

    def meta(bytes: Array[Byte]): Meta = {
      require(bytes.length >= 12, "truncated MP4")
      def rd32(off: Long): Long = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        ((bytes(off.toInt) & 0xFFL) << 24) |
          ((bytes(off.toInt + 1) & 0xFFL) << 16) |
          ((bytes(off.toInt + 2) & 0xFFL) << 8) |
          (bytes(off.toInt + 3) & 0xFFL)
      }
      def rd16(off: Long): Int = {
        require(off >= 0 && off + 2 <= bytes.length, "MP4 read OOB")
        ((bytes(off.toInt) & 0xFF) << 8) | (bytes(off.toInt + 1) & 0xFF)
      }
      def tagAt(off: Long): String = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        new String(bytes, off.toInt, 4, "US-ASCII")
      }
      require(tagAt(4) == "ftyp", "not an ISO-BMFF file (no ftyp)")
      var boxes = 0
      var durMs = -1L
      var tracks = 0
      var vCodec: String = null
      var vW, vH = 0
      var aCodec: String = null
      var aRate = 0
      // the handler of the trak being walked: hdlr precedes stbl/stsd
      // within mdia, so stsd entries resolve against the right kind
      var handlerOfTrak: String = "none"
      def walk(off0: Long, end: Long, depth: Int, path: String): Unit = {
        require(depth < 16, "implausible MP4 box nesting")
        var off = off0
        while (off + 8 <= end) {
          boxes += 1
          require(boxes <= 4096, "implausible MP4 box count")
          var size = rd32(off)
          val typ = tagAt(off + 4)
          var hdr = 8L
          if (size == 1) { // 64-bit largesize
            require(off + 16 <= end, "truncated largesize box")
            val hi = rd32(off + 8)
            val lo = rd32(off + 12)
            size = (hi << 32) | lo
            hdr = 16L
          } else if (size == 0) size = end - off // box runs to parent end
          require(size >= hdr && off + size <= end,
            s"MP4 box $typ overruns its parent")
          val body = off + hdr
          typ match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              walk(body, off + size, depth + 1, path + "/" + typ)
              if (typ == "trak") tracks += 1
            case "mvhd" if path.endsWith("/moov") =>
              val version = (rd32(body) >>> 24).toInt // bounds-checked
              if (version == 0) {
                val tsc = rd32(body + 12)
                val dur = rd32(body + 16)
                require(tsc > 0, "mvhd timescale 0")
                durMs = dur * 1000L / tsc
              } else { // version 1: u64 fields
                val tsc = rd32(body + 20)
                val dur = (rd32(body + 24) << 32) | rd32(body + 28)
                require(tsc > 0, "mvhd timescale 0")
                durMs = dur * 1000L / tsc
              }
            case "hdlr" =>
              handlerOfTrak = tagAt(body + 8)
            case "stsd" =>
              val n = rd32(body + 4)
              require(n >= 1 && n <= 64, s"implausible stsd count $n")
              val entry = body + 8
              val entrySize = rd32(entry)
              require(entrySize >= 16 && entry + entrySize <= off + size,
                "stsd entry overruns")
              val fourcc = tagAt(entry + 4)
              handlerOfTrak match {
                case "vide" =>
                  vCodec = fourcc
                  vW = rd16(entry + 8 + 24)
                  vH = rd16(entry + 8 + 26)
                  require(vW > 0 && vH > 0 && vW <= 65535 && vH <= 65535,
                    s"implausible MP4 dims ${vW}x$vH")
                case "soun" =>
                  aCodec = fourcc
                  aRate = (rd32(entry + 8 + 24) >>> 16).toInt
                  require(aRate > 0 && aRate <= (1 << 20),
                    s"implausible MP4 sample rate $aRate")
                case _ => ()
              }
            case _ => () // ftyp, mdat, tkhd, mdhd, free, ...: skip
          }
          off += size
        }
      }
      walk(0, bytes.length.toLong, 0, "")
      require(durMs >= 0, "MP4 has no moov/mvhd (streaming-only file?)")
      Meta(durMs, tracks, vCodec, vW, vH, aCodec, aRate)
    }

    /** Per-track sample-table stats. `aFirstOffset` comes from co64,
      * proving the 64-bit chunk-offset path end-to-end. */
    final case class SampleMeta(vSamples: Int, vBytes: Long,
        vKeyframes: Int, vChunks: Int, aSamples: Int, aBytes: Long,
        aChunks: Int, aFirstOffset: Long)

    /** The stts/stsz/stsc/stco(+co64)/stss walk real video lakes need
      * for per-track bitrate/keyframe/sample QC — still header-only,
      * no frame decode. Fragmented MP4 (moof/mvex) REJECTS explicitly:
      * its sample tables live in per-fragment trun boxes this walk
      * would silently undercount. Consistency is enforced (stts total
      * == stsz count; single-entry stsc must cover the samples with
      * the declared chunks) — a lying table rejects rather than
      * feeding wrong QC numbers downstream. */
    def sampleMeta(bytes: Array[Byte]): SampleMeta = {
      require(bytes.length >= 12, "truncated MP4")
      def rd32(off: Long): Long = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        ((bytes(off.toInt) & 0xFFL) << 24) |
          ((bytes(off.toInt + 1) & 0xFFL) << 16) |
          ((bytes(off.toInt + 2) & 0xFFL) << 8) |
          (bytes(off.toInt + 3) & 0xFFL)
      }
      def rd64(off: Long): Long = (rd32(off) << 32) | rd32(off + 4)
      def tagAt(off: Long): String = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        new String(bytes, off.toInt, 4, "US-ASCII")
      }
      require(tagAt(4) == "ftyp", "not an ISO-BMFF file (no ftyp)")
      var boxes = 0
      var handlerOfTrak = "none"
      var vSamples, vKeyframes, vChunks = 0
      var vBytes = 0L
      var aSamples, aChunks = 0
      var aBytes = 0L
      var aFirstOffset = -1L
      // per-trak scratch, committed when the trak closes
      var tSttsCount = -1
      var tStszCount = -1
      var tBytes = 0L
      var tChunks = 0
      var tPerChunk = 0
      var tKeyframes = 0
      var tFirstOffset = -1L
      def resetTrak(): Unit = {
        tSttsCount = -1; tStszCount = -1; tBytes = 0L
        tChunks = 0; tPerChunk = 0; tKeyframes = 0; tFirstOffset = -1L
        handlerOfTrak = "none"
      }
      def commitTrak(): Unit = {
        if (tSttsCount >= 0 || tStszCount >= 0) {
          require(tSttsCount == tStszCount,
            s"stts total $tSttsCount != stsz count $tStszCount")
          require(tChunks > 0 && tPerChunk > 0 &&
            tChunks.toLong * tPerChunk >= tSttsCount &&
            (tChunks - 1).toLong * tPerChunk < tSttsCount,
            s"stsc/stco do not cover $tSttsCount samples " +
              s"($tChunks chunks x $tPerChunk)")
          handlerOfTrak match {
            case "vide" =>
              vSamples = tSttsCount; vBytes = tBytes
              vKeyframes = tKeyframes; vChunks = tChunks
            case "soun" =>
              aSamples = tSttsCount; aBytes = tBytes
              aChunks = tChunks; aFirstOffset = tFirstOffset
            case _ => ()
          }
        }
      }
      def walk(off0: Long, end: Long, depth: Int, path: String): Unit = {
        require(depth < 16, "implausible MP4 box nesting")
        var off = off0
        while (off + 8 <= end) {
          boxes += 1
          require(boxes <= 8192, "implausible MP4 box count")
          var size = rd32(off)
          val typ = tagAt(off + 4)
          var hdr = 8L
          if (size == 1) {
            require(off + 16 <= end, "truncated largesize box")
            size = (rd32(off + 8) << 32) | rd32(off + 12)
            hdr = 16L
          } else if (size == 0) size = end - off
          require(size >= hdr && off + size <= end,
            s"MP4 box $typ overruns its parent")
          val body = off + hdr
          typ match {
            case "moof" | "mvex" => require(false,
              "fragmented MP4 (moof/mvex) is not supported: sample " +
                "tables live in per-fragment trun boxes")
            case "moov" | "mdia" | "minf" | "stbl" =>
              walk(body, off + size, depth + 1, path + "/" + typ)
            case "trak" =>
              resetTrak()
              walk(body, off + size, depth + 1, path + "/trak")
              commitTrak()
            case "hdlr" => handlerOfTrak = tagAt(body + 8)
            case "stts" =>
              val n = rd32(body + 4)
              require(n >= 0 && n <= (1 << 20), "implausible stts count")
              var total = 0L
              var k = 0
              while (k < n) {
                total += rd32(body + 8 + 8L * k)
                k += 1
              }
              require(total <= Int.MaxValue, "implausible sample count")
              tSttsCount = total.toInt
            case "stsz" =>
              val uniform = rd32(body + 4)
              val n = rd32(body + 8)
              require(n >= 0 && n <= (1 << 20), "implausible stsz count")
              tStszCount = n.toInt
              if (uniform != 0) tBytes = uniform * n
              else {
                var k = 0
                var sum = 0L
                while (k < n) {
                  sum += rd32(body + 12 + 4L * k)
                  k += 1
                }
                tBytes = sum
              }
            case "stsc" =>
              val n = rd32(body + 4)
              require(n == 1,
                s"only single-entry stsc supported here, got $n")
              tPerChunk = rd32(body + 12).toInt
            case "stco" =>
              val n = rd32(body + 4)
              require(n >= 0 && n <= (1 << 20), "implausible stco count")
              tChunks = n.toInt
              if (n > 0) tFirstOffset = rd32(body + 8)
            case "co64" =>
              val n = rd32(body + 4)
              require(n >= 0 && n <= (1 << 20), "implausible co64 count")
              tChunks = n.toInt
              if (n > 0) tFirstOffset = rd64(body + 8)
            case "stss" =>
              val n = rd32(body + 4)
              require(n >= 0 && n <= (1 << 20), "implausible stss count")
              tKeyframes = n.toInt
            case _ => ()
          }
          off += size
        }
      }
      walk(0, bytes.length.toLong, 0, "")
      SampleMeta(vSamples, vBytes, vKeyframes, vChunks,
        aSamples, aBytes, aChunks, aFirstOffset)
    }

    /** Video-track edit list (edts/elst): entry count, leading empty-
      * edit duration (the startup-delay idiom: media_time == -1), and
      * the effective presentation duration = sum of segment durations
      * in the MOVIE timescale (ms here). Tracks without an elst
      * report (0, 0, 0) — presentation equals media duration. */
    final case class EditMeta(entries: Int, leadMs: Long,
        presentationMs: Long)

    def editList(bytes: Array[Byte]): EditMeta = {
      require(bytes.length >= 12, "truncated MP4")
      def rd32(off: Long): Long = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        ((bytes(off.toInt) & 0xFFL) << 24) |
          ((bytes(off.toInt + 1) & 0xFFL) << 16) |
          ((bytes(off.toInt + 2) & 0xFFL) << 8) |
          (bytes(off.toInt + 3) & 0xFFL)
      }
      def tagAt(off: Long): String = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        new String(bytes, off.toInt, 4, "US-ASCII")
      }
      require(tagAt(4) == "ftyp", "not an ISO-BMFF file (no ftyp)")
      var boxes = 0
      var handlerOfTrak = "none"
      // per-trak scratch (edts precedes mdia/hdlr, so commit at close)
      var tEntries = 0
      var tLead = 0L
      var tPres = 0L
      var entries = 0
      var leadMs = 0L
      var presMs = 0L
      def walk(off0: Long, end: Long, depth: Int): Unit = {
        require(depth < 16, "implausible MP4 box nesting")
        var off = off0
        while (off + 8 <= end) {
          boxes += 1
          require(boxes <= 8192, "implausible MP4 box count")
          var size = rd32(off)
          val typ = tagAt(off + 4)
          var hdr = 8L
          if (size == 1) {
            require(off + 16 <= end, "truncated largesize box")
            size = (rd32(off + 8) << 32) | rd32(off + 12)
            hdr = 16L
          } else if (size == 0) size = end - off
          require(size >= hdr && off + size <= end,
            s"MP4 box $typ overruns its parent")
          val body = off + hdr
          typ match {
            case "moov" | "mdia" | "edts" => walk(body, off + size,
              depth + 1)
            case "trak" =>
              handlerOfTrak = "none"; tEntries = 0; tLead = 0L; tPres = 0L
              walk(body, off + size, depth + 1)
              if (handlerOfTrak == "vide") {
                entries = tEntries; leadMs = tLead; presMs = tPres
              }
            case "hdlr" => handlerOfTrak = tagAt(body + 8)
            case "elst" =>
              require((rd32(body) >>> 24) == 0,
                "only version-0 elst supported")
              val n = rd32(body + 4)
              require(n >= 0 && n <= 1024, s"implausible elst count $n")
              tEntries = n.toInt
              var k = 0
              while (k < n) {
                val dur = rd32(body + 8 + 12L * k)
                val mediaTime = rd32(body + 12 + 12L * k).toInt // i32
                if (mediaTime == -1) tLead += dur
                tPres += dur
                k += 1
              }
            case _ => ()
          }
          off += size
        }
      }
      walk(0, bytes.length.toLong, 0)
      EditMeta(entries, leadMs, presMs)
    }

    // ---- fragmented MP4 (ISO 14496-12 §8.8 — the DASH/CMAF shape) ----
    // Streaming-media lakes are mostly FRAGMENTED: the moov carries
    // only mvex defaults and empty sample tables, and the real sample
    // populations live in per-fragment moof/traf/tfhd/trun boxes.
    // sampleMeta rejects those honestly; fragmentMeta is the walk that
    // makes their stats real.

    // fragment formulas (SQL-expressible)
    def fragCount(id: Long): Int = 3 + (id % 4).toInt
    def fragVCount(id: Long, f: Int): Int = 8 + ((id + f) % 5).toInt
    def fragVSize(id: Long, f: Int, k: Int): Int =
      400 + ((id * 7 + f * 13 + k * 17) % 200).toInt
    def fragACount(id: Long, f: Int): Int = 20 + ((id + f) % 7).toInt
    def fragASize(id: Long): Int = 200 + (id % 50).toInt

    private def trexBox(trackId: Int, defDur: Long, defSize: Long)
        : Array[Byte] =
      full("trex", be32(trackId.toLong), be32(1), be32(defDur),
        be32(defSize), be32(0))

    /** A trak with EMPTY sample tables — the fMP4 convention: real
      * samples live in the fragments. */
    private def fragTrak(trackId: Int, id: Long, handler: String)
        : Array[Byte] = {
      val (w, h) = dims(id)
      val (tsc, entry, tw, th) = handler match {
        case "vide" => (30000L, videoEntry(videoCodec(id), w, h), w, h)
        case _ => (audioRate(id).toLong, audioEntry(audioRate(id)), 0, 0)
      }
      val emptyTables = Seq(
        full("stts", be32(0)),
        full("stsz", be32(0), be32(0)),
        full("stsc", be32(0)),
        full("stco", be32(0)))
      box("trak", tkhd(trackId, tw, th),
        box("mdia", mdhd(tsc, 0L), hdlr(handler),
          box("minf", box("stbl", (stsd(entry) +: emptyTables): _*))))
    }

    private def tfhdBox(trackId: Int, flags: Long,
        optFields: Array[Byte]*): Array[Byte] =
      box("tfhd", be32(flags), be32(trackId.toLong),
        optFields.flatten.toArray)

    /** Fragmented twin of [[encode]]: moov carries mvex/trex defaults
      * and empty tables; each of fragCount(id) fragments is a
      * moof(mfhd, video traf + audio traf) + mdat. The video trun
      * carries PER-SAMPLE sizes (flag 0x200); the audio trun carries
      * none — its size comes from the tfhd default (flag 0x10), so
      * both size-resolution paths are on the wire. tfhd flag 0x020000
      * (default-base-is-moof) everywhere. */
    def encodeFragmented(id: Long): Array[Byte] = {
      val moov = box("moov", mvhd(id),
        fragTrak(1, id, "vide"), fragTrak(2, id, "soun"),
        box("mvex",
          trexBox(1, 1000L, 0L),
          trexBox(2, 1024L, fragASize(id).toLong)))
      val frags = (0 until fragCount(id)).flatMap { f =>
        val vSizes = (0 until fragVCount(id, f)).map(k =>
          fragVSize(id, f, k))
        val aCount = fragACount(id, f)
        val vTrun = box("trun", be32(0x000201L), // data-offset + sizes
          be32(vSizes.length.toLong), be32(0L),
          vSizes.flatMap(sz => be32(sz.toLong).toSeq).toArray)
        val aTrun = box("trun", be32(0x000001L), // data-offset only
          be32(aCount.toLong), be32(0L))
        val moof = box("moof", full("mfhd", be32(f + 1L)),
          box("traf", tfhdBox(1, 0x020000L), vTrun),
          box("traf",
            tfhdBox(2, 0x020010L, be32(fragASize(id).toLong)), aTrun))
        val mdatLen = vSizes.map(_.toLong).sum +
          aCount.toLong * fragASize(id)
        val mdat = box("mdat",
          Array.tabulate[Byte](mdatLen.toInt)(k => (id + f + k).toByte))
        (moof ++ mdat).toSeq
      }.toArray
      box("ftyp", cc("isom"), be32(0x200), cc("iso5"), cc("cmfc")) ++
        moov ++ frags
    }

    /** Per-track fragment stats. Byte counts resolve per RFC: trun
      * per-sample size if flag 0x200, else the tfhd default (0x10),
      * else the trex default — a sample with NO size source rejects. */
    final case class FragMeta(fragments: Int, vSamples: Int,
        vBytes: Long, aSamples: Int, aBytes: Long)

    /** The moof/traf/tfhd/trun walk (ISO 14496-12 §8.8): moov gives
      * (trackId -> handler) and trex defaults; each moof's trafs are
      * summed per track. Same consistency discipline as sampleMeta:
      * mfhd sequence numbers must be 1..n in order, every sample must
      * resolve a size, malformed counts reject. */
    def fragmentMeta(bytes: Array[Byte]): FragMeta = {
      require(bytes.length >= 12, "truncated MP4")
      def rd32(off: Long): Long = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        ((bytes(off.toInt) & 0xFFL) << 24) |
          ((bytes(off.toInt + 1) & 0xFFL) << 16) |
          ((bytes(off.toInt + 2) & 0xFFL) << 8) |
          (bytes(off.toInt + 3) & 0xFFL)
      }
      def tagAt(off: Long): String = {
        require(off >= 0 && off + 4 <= bytes.length, "MP4 read OOB")
        new String(bytes, off.toInt, 4, "US-ASCII")
      }
      require(tagAt(4) == "ftyp", "not an ISO-BMFF file (no ftyp)")
      var boxes = 0
      val handlerOf = scala.collection.mutable.Map.empty[Long, String]
      val trexDur = scala.collection.mutable.Map.empty[Long, Long]
      val trexSize = scala.collection.mutable.Map.empty[Long, Long]
      var sawMvex = false
      var fragments = 0
      var vSamples = 0L
      var vBytes = 0L
      var aSamples = 0L
      var aBytes = 0L
      // per-trak scratch in the moov walk
      var curTrackId = -1L
      var curHandler = "none"
      // per-traf scratch in the moof walk
      var trafTrack = -1L
      var trafDefSize = -1L
      def walk(off0: Long, end: Long, depth: Int, path: String): Unit = {
        require(depth < 16, "implausible MP4 box nesting")
        var off = off0
        while (off + 8 <= end) {
          boxes += 1
          require(boxes <= 65536, "implausible MP4 box count")
          var size = rd32(off)
          val typ = tagAt(off + 4)
          var hdr = 8L
          if (size == 1) {
            require(off + 16 <= end, "truncated largesize box")
            size = (rd32(off + 8) << 32) | rd32(off + 12)
            hdr = 16L
          } else if (size == 0) size = end - off
          require(size >= hdr && off + size <= end,
            s"MP4 box $typ overruns its parent")
          val body = off + hdr
          typ match {
            case "moov" | "mdia" | "mvex" =>
              walk(body, off + size, depth + 1, path + "/" + typ)
              if (typ == "mvex") sawMvex = true
            case "trak" =>
              curTrackId = -1L; curHandler = "none"
              walk(body, off + size, depth + 1, path + "/trak")
              if (curTrackId >= 0) handlerOf(curTrackId) = curHandler
            case "tkhd" => curTrackId = rd32(body + 12)
            case "hdlr" => curHandler = tagAt(body + 8)
            case "trex" =>
              val tid = rd32(body + 4)
              trexDur(tid) = rd32(body + 12)
              trexSize(tid) = rd32(body + 16)
            case "moof" =>
              fragments += 1
              walk(body, off + size, depth + 1, path + "/moof")
            case "mfhd" =>
              require(rd32(body + 4) == fragments,
                s"moof sequence ${rd32(body + 4)} out of order " +
                  s"(expected $fragments)")
            case "traf" =>
              trafTrack = -1L; trafDefSize = -1L
              walk(body, off + size, depth + 1, path + "/traf")
            case "tfhd" =>
              val flags = rd32(body) & 0xFFFFFF
              trafTrack = rd32(body + 4)
              var p = body + 8
              if ((flags & 0x1) != 0) p += 8  // base_data_offset u64
              if ((flags & 0x2) != 0) p += 4  // sample_description_index
              if ((flags & 0x8) != 0) p += 4  // default_sample_duration
              if ((flags & 0x10) != 0) { trafDefSize = rd32(p); p += 4 }
            case "trun" =>
              require(trafTrack >= 0, "trun before tfhd in traf")
              val flags = rd32(body) & 0xFFFFFF
              val n = rd32(body + 4)
              require(n >= 0 && n <= (1 << 20),
                s"implausible trun sample count $n")
              var p = body + 8
              if ((flags & 0x1) != 0) p += 4   // data_offset
              if ((flags & 0x4) != 0) p += 4   // first_sample_flags
              val perDur = (flags & 0x100) != 0
              val perSize = (flags & 0x200) != 0
              val perFlags = (flags & 0x400) != 0
              val perCto = (flags & 0x800) != 0
              var sum = 0L
              if (perSize) {
                // per-sample rows: fields appear in flag order
                val stride = (if (perDur) 4 else 0) +
                  (if (perSize) 4 else 0) + (if (perFlags) 4 else 0) +
                  (if (perCto) 4 else 0)
                val sizeOff = if (perDur) 4 else 0
                var i = 0L
                while (i < n) {
                  sum += rd32(p + stride * i + sizeOff)
                  i += 1
                }
              } else {
                val defSize =
                  if (trafDefSize >= 0) trafDefSize
                  else trexSize.getOrElse(trafTrack, -1L)
                require(defSize >= 0,
                  s"trun of track $trafTrack has no size source " +
                    "(no per-sample sizes, no tfhd/trex default)")
                sum = defSize * n
              }
              handlerOf.getOrElse(trafTrack, "none") match {
                case "vide" => vSamples += n; vBytes += sum
                case "soun" => aSamples += n; aBytes += sum
                case other => throw new IllegalArgumentException(
                  s"trun references unknown track $trafTrack ($other)")
              }
            case _ => () // ftyp, mdat, tkhd in moof-less paths, ...
          }
          off += size
        }
      }
      walk(0, bytes.length.toLong, 0, "")
      require(sawMvex, "not a fragmented MP4 (no mvex) — use sampleMeta")
      require(fragments > 0, "fragmented MP4 with zero fragments")
      require(vSamples <= Int.MaxValue && aSamples <= Int.MaxValue,
        "implausible fragment sample totals")
      FragMeta(fragments, vSamples.toInt, vBytes, aSamples.toInt, aBytes)
    }
  }

  /** REAL POSIX ustar writer + INDEPENDENT parser — the container the
    * WebDataset multimodal training layout stores shards in (one tar
    * per shard; a sample = consecutive entries sharing a key stem with
    * different extensions). Writer: 512-byte ustar headers (octal
    * size, checksum computed over a space-filled checksum field, magic
    * "ustar"), data padded to 512, two zero blocks at end, mtime
    * pinned to 0 so shard bytes are deterministic. Parser: walks
    * headers bounds-safely, VERIFIES each checksum and the magic,
    * stops at the zero block — truncated or corrupt archives reject,
    * never misparse. Pure JVM. */
  object TarCodec extends Serializable {
    private val Block = 512

    private def octal(v: Long, width: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (width - 1 - s.length) + s
      (pad + "\u0000").getBytes("US-ASCII")
    }

    /** Stream one entry (header + data + padding) to `out` — the form
      * the `wds` shard sink writes row-by-row with constant memory;
      * [[encode]] is the in-memory composition of these. */
    def writeEntry(out: java.io.OutputStream, name: String,
        data: Array[Byte]): Unit = {
      val nb = name.getBytes("US-ASCII")
      require(nb.length <= 100, s"tar entry name too long: $name")
      val h = new Array[Byte](Block)
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(octal(420, 8), 0, h, 100, 8)   // mode 0644
      System.arraycopy(octal(0, 8), 0, h, 108, 8)     // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8)     // gid
      System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0, 12), 0, h, 136, 12)   // mtime: pinned
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)  // chksum spaces
      h(156) = '0'                                    // regular file
      System.arraycopy("ustar\u0000".getBytes("US-ASCII"), 0, h, 257, 6)
      System.arraycopy("00".getBytes("US-ASCII"), 0, h, 263, 2)
      var sum = 0L
      var i = 0
      while (i < Block) { sum += h(i) & 0xFF; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val rem = data.length % Block
      if (rem != 0) out.write(new Array[Byte](Block - rem))
    }

    /** The two-zero-block end-of-archive marker. */
    def endArchive(out: java.io.OutputStream): Unit =
      out.write(new Array[Byte](2 * Block))

    def encode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      entries.foreach { case (name, data) => writeEntry(out, name, data) }
      endArchive(out)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
      val entries = Seq.newBuilder[(String, Array[Byte])]
      var off = 0
      var done = false
      while (!done) {
        require(off + Block <= bytes.length, "truncated tar header")
        if (bytes(off) == 0) {
          // end marker: two zero blocks
          require(off + 2 * Block <= bytes.length &&
            (off until off + 2 * Block).forall(bytes(_) == 0),
            "malformed tar end marker")
          done = true
        } else {
          require(new String(bytes, off + 257, 5, "US-ASCII") == "ustar",
            "not a ustar header")
          var sum = 0L
          var i = 0
          while (i < Block) {
            sum += (if (i >= 148 && i < 156) ' '.toByte
                    else bytes(off + i)) & 0xFF
            i += 1
          }
          val stored = java.lang.Long.parseLong(
            new String(bytes, off + 148, 6, "US-ASCII").trim, 8)
          require(stored == sum, s"tar checksum mismatch at $off")
          val nameEnd = (off until off + 100)
            .find(bytes(_) == 0).getOrElse(off + 100)
          val name = new String(bytes, off, nameEnd - off, "US-ASCII")
          val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
            .takeWhile(c => c >= '0' && c <= '7')
          val size = java.lang.Long.parseLong(sizeStr, 8)
          require(size >= 0 && size <= Int.MaxValue &&
            off + Block + size <= bytes.length, "truncated tar entry")
          entries += ((name, java.util.Arrays.copyOfRange(bytes,
            off + Block, off + Block + size.toInt)))
          val padded = ((size + Block - 1) / Block) * Block
          off += Block + padded.toInt
        }
      }
      entries.result()
    }
  }

  /** REAL GIF87a/89a codec with a hand-written LZW coder — the one
    * image container in the family whose compression has NO JDK
    * primitive (PNG leans on `java.util.zip.Inflater`; GIF-LZW has
    * nothing), so both directions are implemented from the spec:
    * variable-width codes (9→12 bits, LSB-first bit packing), CLEAR /
    * END-OF-INFORMATION control codes, dictionary reset at 4096, the
    * `code == next` self-referential case on decode, and 255-byte data
    * sub-block framing. Encoder and decoder are independent enough that
    * a width-growth off-by-one on either side breaks round-trip — and
    * MultimodalCodecSpec additionally cross-checks decode against JDK
    * ImageIO's third-party GIF reader, pixel for pixel.
    *
    * Fixture formulas (the PcapSynth pattern — oracles re-derive from
    * these, never from bytes): 256-entry global palette with
    * pal(c) = (c, 3c mod 256, 7c mod 256); pixel INDEX
    * idx(x,y) = (id*5 + 3x + 7y) mod 256; dims (24 + id%13,
    * 18 + id%7) — up to 36×24 px, enough that every image crosses the
    * 511→512 table boundary and exercises 9→10-bit width growth. */
  object GifCodec extends Serializable {

    def dims(id: Long): (Int, Int) =
      ((24 + id % 13).toInt, (18 + id % 7).toInt)
    def palIdx(id: Long, x: Int, y: Int): Int =
      ((id * 5 + x * 3 + y * 7) % 256).toInt
    def pal(c: Int): (Int, Int, Int) = (c, c * 3 % 256, c * 7 % 256)

    /** GIF-LZW compress `pixels` (values < 2^mcs) into the raw code
      * stream (no sub-block framing). Standard dictionary coder:
      * phrases keyed (prefixCode << 8 | suffixByte), codes grow 9→12
      * bits, CLEAR emitted up front and at table overflow. */
    private[graft] def lzwCompress(
        pixels: Array[Int], mcs: Int): Array[Byte] = {
      val clear = 1 << mcs
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 16)
      var acc = 0L; var nbits = 0
      var width = mcs + 1
      def emit(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += width
        while (nbits >= 8) {
          out.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8
        }
      }
      var dict = new java.util.HashMap[Integer, Integer]()
      var next = eoi + 1
      emit(clear)
      var cur = pixels(0)
      var i = 1
      while (i < pixels.length) {
        val k = pixels(i)
        val key = (cur << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit
        else {
          emit(cur)
          dict.put(key, next); next += 1
          // width grows the moment code `next-1` was assigned a slot
          // needing more bits; decoder mirrors this after ITS add
          // the encoder's add counter runs ONE ahead of the decoder's
          // (decoder adds on the read AFTER the emission), so the
          // matched pair of growth rules is +1 here, exact there
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next == 4096) { // table full: emit CLEAR and reset
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            width = mcs + 1; next = eoi + 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
      // EOI corner: the decoder performs one more add (for that final
      // data code) before reading EOI, so if that add lands its counter
      // exactly on 2^width it grows FIRST and reads EOI one bit wider —
      // mirror that here or a stream whose last data code sits on a
      // width boundary loses EOI past the encoder's end (found by a
      // round-trip fuzz: ~0.3% of random streams)
      if (next == (1 << width) && width < 12) width += 1
      emit(eoi)
      if (nbits > 0) out.write((acc & 0xFF).toInt)
      out.toByteArray
    }

    /** Inverse of [[lzwCompress]]: raw code stream → pixel indices.
      * `expect` bounds output (bomb guard). */
    private[graft] def lzwDecompress(
        data: Array[Byte], mcs: Int, expect: Int): Array[Int] = {
      val clear = 1 << mcs
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      val out = new Array[Int](expect)
      var outN = 0
      var width = mcs + 1
      var next = eoi + 1
      var prev = -1
      var acc = 0L; var nbits = 0; var pos = 0
      val stack = new Array[Int](4096)
      def firstByte(code0: Int): Int = {
        var c = code0
        while (c >= clear) c = prefix(c)
        c
      }
      def expand(code0: Int): Unit = {
        var sp = 0
        var c = code0
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c; sp += 1
        while (sp > 0) {
          sp -= 1
          require(outN < expect, "LZW output exceeds declared pixel count")
          out(outN) = stack(sp); outN += 1
        }
      }
      var done = false
      while (!done) {
        while (nbits < width && pos < data.length) {
          acc |= (data(pos) & 0xFFL) << nbits; nbits += 8; pos += 1
        }
        require(nbits >= width, "LZW stream truncated (no EOI)")
        val code = (acc & ((1 << width) - 1)).toInt
        acc >>>= width; nbits -= width
        if (code == clear) {
          width = mcs + 1; next = eoi + 1; prev = -1
        } else if (code == eoi) {
          done = true
        } else if (prev == -1) {
          require(code < clear, s"first code after CLEAR not literal: $code")
          expand(code)
          prev = code
        } else {
          require(code <= next, s"LZW code $code beyond table ($next)")
          if (code == next) { // the self-referential KwKwK case
            require(next < 4096, "KwKwK at full table")
            prefix(next) = prev; suffix(next) = firstByte(prev)
            next += 1
            expand(code)
          } else {
            expand(code)
            if (next < 4096) {
              prefix(next) = prev; suffix(next) = firstByte(code)
              next += 1
            }
          }
          if (next == (1 << width) && width < 12) width += 1
          prev = code
        }
      }
      require(outN == expect,
        s"LZW decoded $outN pixels, image declares $expect")
      out
    }

    private def le16(v: Int): Array[Byte] =
      Array(v.toByte, (v >>> 8).toByte)

    /** Write a genuine GIF89a: logical screen descriptor, 256-entry
      * global color table from [[pal]], one non-interlaced image,
      * LZW-compressed with [[lzwCompress]] at min code size 8, data in
      * 255-byte sub-blocks. */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val out = new java.io.ByteArrayOutputStream(1024)
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(le16(w)); out.write(le16(h))
      out.write(0xF7) // GCT present, 8 bpp, 2^8 entries
      out.write(0); out.write(0) // background idx, aspect
      var c = 0
      while (c < 256) {
        val (r, g, b) = pal(c)
        out.write(r); out.write(g); out.write(b)
        c += 1
      }
      out.write(0x2C) // image descriptor
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(w)); out.write(le16(h))
      out.write(0) // no local table, not interlaced
      out.write(8) // LZW min code size
      val pixels = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { pixels(y * w + x) = palIdx(id, x, y); x += 1 }
        y += 1
      }
      val data = lzwCompress(pixels, 8)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n)
        out.write(data, off, n)
        off += n
      }
      out.write(0) // block terminator
      out.write(0x3B) // trailer
      out.toByteArray
    }

    // ----- animation (GIF89a multi-frame) --------------------------------

    /** Frame count for the animated fixture. */
    def nFrames(id: Long): Int = (3 + id % 4).toInt

    /** Changed-rect of frame f >= 1 (frame 0 is the full canvas):
      * (x0, y0, wf, hf), always inside dims — the optimized-GIF shape
      * real encoders emit, which forces genuine canvas compositing. */
    def frameRect(id: Long, f: Int): (Int, Int, Int, Int) = {
      val (w, h) = dims(id)
      val wf = 8 + f % 5
      val hf = 6 + f % 3
      val x0 = (3 * f + (id % 5).toInt) % (w - wf + 1)
      val y0 = (2 * f + (id % 3).toInt) % (h - hf + 1)
      (x0, y0, wf, hf)
    }

    /** Write a real ANIMATED GIF89a: NETSCAPE2.0 loop extension, one
      * Graphics Control Extension per frame (disposal 1 = leave in
      * place, delay 10+f cs), frame 0 full-canvas, frames f >= 1 only
      * their changed rect [[frameRect]] — pixel content of frame f is
      * palIdx(id + 131*f, x, y) at ABSOLUTE canvas coordinates. */
    def encodeAnimated(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val out = new java.io.ByteArrayOutputStream(2048)
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(le16(w)); out.write(le16(h))
      out.write(0xF7); out.write(0); out.write(0)
      var c = 0
      while (c < 256) {
        val (r, g, b) = pal(c)
        out.write(r); out.write(g); out.write(b)
        c += 1
      }
      // NETSCAPE2.0 application extension: loop forever
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); out.write(0); out.write(0); out.write(0)
      val nf = nFrames(id)
      var f = 0
      while (f < nf) {
        // Graphics Control Extension: disposal 1, delay 10+f cs
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write(1 << 2); out.write(le16(10 + f)); out.write(0)
        out.write(0)
        val (x0, y0, wf, hf) =
          if (f == 0) (0, 0, w, h) else frameRect(id, f)
        out.write(0x2C)
        out.write(le16(x0)); out.write(le16(y0))
        out.write(le16(wf)); out.write(le16(hf))
        out.write(0)
        out.write(8)
        val fid = id + 131L * f
        val pixels = new Array[Int](wf * hf)
        var j = 0
        while (j < hf) {
          var i = 0
          while (i < wf) {
            pixels(j * wf + i) = palIdx(fid, x0 + i, y0 + j)
            i += 1
          }
          j += 1
        }
        val data = lzwCompress(pixels, 8)
        var o = 0
        while (o < data.length) {
          val n = math.min(255, data.length - o)
          out.write(n); out.write(data, o, n); o += n
        }
        out.write(0)
        f += 1
      }
      out.write(0x3B)
      out.toByteArray
    }

    /** Parse an animated GIF from bytes alone: every image descriptor
      * composites its rect onto the persistent canvas (disposal
      * method 1 — the fixture's and the common web-GIF case; methods
      * 0/1 both leave the canvas in place) and yields one full-canvas
      * snapshot per frame with the preceding GCE's delay. The
      * single-image [[decode]] path stays untouched. */
    def decodeFrames(bytes: Array[Byte]): Seq[(BmpCodec.Image, Int)] = {
      require(bytes.length >= 13, "truncated GIF")
      val magic = new String(bytes, 0, 6, "US-ASCII")
      require(magic == "GIF87a" || magic == "GIF89a", "not a GIF file")
      def rd16(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      val cw = rd16(6)
      val ch = rd16(8)
      require(cw > 0 && ch > 0 && cw <= 4096 && ch <= 4096,
        s"implausible GIF canvas ${cw}x$ch")
      val packed = bytes(10) & 0xFF
      var off = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(off + 3 * n <= bytes.length, "truncated color table")
        gct = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
        off += 3 * n
      }
      val canvas = new Array[Byte](cw * ch * 3)
      val frames = Seq.newBuilder[(BmpCodec.Image, Int)]
      var delay = 0
      var disposal = 0
      var done = false
      while (!done && off < bytes.length) {
        (bytes(off) & 0xFF) match {
          case 0x21 =>
            val label = bytes(off + 1) & 0xFF
            if (label == 0xF9) {
              require(off + 7 < bytes.length, "truncated GCE")
              require((bytes(off + 2) & 0xFF) == 4, "bad GCE length")
              disposal = (bytes(off + 3) & 0x1C) >> 2
              require(disposal <= 1,
                s"unsupported GIF disposal method $disposal")
              delay = rd16(off + 4)
              off += 8
            } else {
              off += 2
              while ({
                require(off < bytes.length, "truncated extension")
                val n = bytes(off) & 0xFF; off += 1 + n; n != 0
              }) ()
            }
          case 0x2C =>
            require(off + 11 <= bytes.length,
              "truncated GIF image descriptor")
            val x0 = rd16(off + 1)
            val y0 = rd16(off + 3)
            val w = rd16(off + 5)
            val h = rd16(off + 7)
            require(w > 0 && h > 0 && x0 + w <= cw && y0 + h <= ch,
              s"frame rect ${x0},$y0 ${w}x$h outside ${cw}x$ch canvas")
            val ip = bytes(off + 9) & 0xFF
            require((ip & 0x40) == 0,
              "interlaced animation frames unsupported")
            off += 10
            var table = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              require(off + 3 * n <= bytes.length, "truncated local table")
              table = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
              off += 3 * n
            }
            require(table != null, "GIF frame with no color table")
            require(off < bytes.length, "truncated before LZW code size")
            val mcs = bytes(off) & 0xFF; off += 1
            require(mcs >= 2 && mcs <= 8, s"implausible LZW code size $mcs")
            val data = new java.io.ByteArrayOutputStream(bytes.length)
            while ({
              require(off < bytes.length, "truncated image data")
              val n = bytes(off) & 0xFF; off += 1
              require(off + n <= bytes.length, "sub-block overruns file")
              data.write(bytes, off, n); off += n; n != 0
            }) ()
            val idx = lzwDecompress(data.toByteArray, mcs, w * h)
            var i = 0
            while (i < idx.length) {
              val e = idx(i) * 3
              require(e + 2 < table.length, s"palette index ${idx(i)} OOB")
              val o = ((y0 + i / w) * cw + x0 + i % w) * 3
              canvas(o) = table(e)
              canvas(o + 1) = table(e + 1)
              canvas(o + 2) = table(e + 2)
              i += 1
            }
            frames += ((BmpCodec.Image(cw, ch,
              java.util.Arrays.copyOf(canvas, canvas.length)), delay))
          case 0x3B => done = true
          case b => throw new IllegalArgumentException(
            f"unknown GIF block 0x$b%02x")
        }
      }
      val out = frames.result()
      require(out.nonEmpty, "no image block in GIF")
      out
    }

    /** Parse a GIF from bytes alone: header + LSD, global color table,
      * skipped extension blocks, first image descriptor (local palette
      * honored, interlaced row order deinterlaced), LZW decode,
      * palette → RGB. Returns
      * the shared [[BmpCodec.Image]] so the generic pixel helpers
      * apply. Guards mirror the other codecs: dims sanity-bounded
      * before any allocation, sub-block walks bounds-checked, decoded
      * pixel count must equal w*h. */
    def decode(bytes: Array[Byte]): BmpCodec.Image = {
      require(bytes.length >= 13, "truncated GIF")
      val magic = new String(bytes, 0, 6, "US-ASCII")
      require(magic == "GIF87a" || magic == "GIF89a", "not a GIF file")
      def rd16(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      val packed = bytes(10) & 0xFF
      var off = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        require(off + 3 * n <= bytes.length, "truncated color table")
        gct = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
        off += 3 * n
      }
      while (off < bytes.length) {
        (bytes(off) & 0xFF) match {
          case 0x21 => // extension: label byte + sub-blocks
            off += 2
            while ({
              require(off < bytes.length, "truncated extension")
              val n = bytes(off) & 0xFF; off += 1 + n; n != 0
            }) ()
          case 0x2C =>
            require(off + 11 <= bytes.length,
              "truncated GIF image descriptor")
            val w = rd16(off + 5)
            val h = rd16(off + 7)
            require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
              s"implausible GIF dims ${w}x$h")
            val ip = bytes(off + 9) & 0xFF
            val interlaced = (ip & 0x40) != 0
            off += 10
            var table = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              require(off + 3 * n <= bytes.length, "truncated local table")
              table = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
              off += 3 * n
            }
            require(table != null, "GIF image with no color table")
            require(off < bytes.length, "truncated before LZW code size")
            val mcs = bytes(off) & 0xFF; off += 1
            require(mcs >= 2 && mcs <= 8, s"implausible LZW code size $mcs")
            val data = new java.io.ByteArrayOutputStream(bytes.length)
            while ({
              require(off < bytes.length, "truncated image data")
              val n = bytes(off) & 0xFF; off += 1
              require(off + n <= bytes.length, "sub-block overruns file")
              data.write(bytes, off, n); off += n; n != 0
            }) ()
            val idx = lzwDecompress(data.toByteArray, mcs, w * h)
            // interlaced GIFs (the JDK writer's default!) store rows in
            // four passes: 0,8,16…, then 4,12…, then 2,6…, then odd
            val rowOf: Int => Int =
              if (!interlaced) identity
              else {
                val order =
                  (0 until h by 8) ++ (4 until h by 8) ++
                    (2 until h by 4) ++ (1 until h by 2)
                order.toArray.apply _
              }
            val px = new Array[Byte](w * h * 3)
            var i = 0
            while (i < idx.length) {
              val e = idx(i) * 3
              require(e + 2 < table.length, s"palette index ${idx(i)} OOB")
              val o = (rowOf(i / w) * w + i % w) * 3
              px(o) = table(e)
              px(o + 1) = table(e + 1)
              px(o + 2) = table(e + 2)
              i += 1
            }
            return BmpCodec.Image(w, h, px)
          case 0x3B => throw new IllegalArgumentException(
            "GIF trailer before any image")
          case b => throw new IllegalArgumentException(
            f"unknown GIF block 0x$b%02x")
        }
      }
      throw new IllegalArgumentException("no image block in GIF")
    }
  }

  val defs: Seq[Q] = Seq(

    // ----- per-kind stats from DECODED headers ---------------------------
    // Not the meta column: each blob's container is sniffed from magic
    // bytes and its dims/frame count read back out of the file itself by
    // the byte-only parsers. The oracle re-derives sizes and headers
    // from the synthesis formulas (BMP = 54 + stride*h; WAV = 44 + 2n;
    // AVI = 100 + nf*(8 + stride*h)), so a header-parse bug mismatches.
    Q("mm_media_stats",
      (s, d) => {
        import s.implicits._
        mediaTable(s, d)
          .select($"media_id", $"kind", $"content")
          .as[(Long, String, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (_, kind, bytes) =>
              // stats come from header fields alone — no pixel/frame
              // unpack (a stats scan over video must not pay nf×w×h per
              // row; round-6 ADVICE)
              val (width, frames) = sniffKind(bytes) match {
                case "bmp" =>
                  (Some(BmpCodec.headerDims(bytes)._1), None: Option[Int])
                case "avi" =>
                  val (w, _, nf) = AviCodec.header(bytes)
                  (Some(w), Some(nf))
                case _ => (None: Option[Int], None: Option[Int])
              }
              (kind, bytes.length, width, frames)
            }
          }.toDF("kind", "n_bytes", "width", "frames")
          .groupBy($"kind")
          .agg(
            count(lit(1)).as("n"),
            sum($"n_bytes".cast("long")).as("total_bytes"),
            max($"width").as("max_width"),
            min($"frames").as("min_frames"))
      },
      Some("""WITH m AS (
          SELECT doc_id,
            CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
            CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h,
            ((16 + doc_id % 13) * 3 + 3) // 4 * 4 AS stride,
            CAST(3 + doc_id % 4 AS INT) AS nf,
            CAST(200 + doc_id % 57 AS INT) AS ns
          FROM documents)
        SELECT kind, COUNT(*) AS n,
          CAST(SUM(CASE kind WHEN 'image' THEN 54 + stride * h
            WHEN 'audio' THEN 44 + ns * 2
            ELSE 100 + nf * (8 + stride * h) END) AS BIGINT) AS total_bytes,
          CAST(MAX(CASE WHEN kind IN ('image', 'video') THEN w END) AS INT)
            AS max_width,
          CAST(MIN(CASE WHEN kind = 'video' THEN nf END) AS INT)
            AS min_frames
        FROM m GROUP BY 1""")),

    // ----- typed mapPartitions feature extraction (REAL decode) ----------
    // The generic any-modality feature stage: sniff the container, run
    // the matching byte-only decoder, and emit a modality-normalized
    // integer feature — weighted pixel sum for image/video, absolute
    // sample sum for audio — plus the decoded unit count (pixels /
    // samples / frame-pixels). One codec dispatch per row inside
    // mapPartitions (the batch shape a real decoder needs: init
    // amortized per partition, blobs never shuffle). The oracle
    // re-derives every number from the synthesis formulas.
    Q("mm_feature_extract",
      (s, d) => {
        import s.implicits._
        val media = mediaTable(s, d)
          .select($"media_id", $"kind", $"content")
          .as[(Long, String, Array[Byte])]
        media.mapPartitions { it =>
          it.map { case (id, kind, bytes) =>
            val (_, nUnits, feature) = sniffDecode(bytes)
            (id, kind, bytes.length, nUnits, feature)
          }
        }.toDF("media_id", "kind", "n_bytes", "n_units", "feature_sum")
      },
      Some("""WITH m AS (
          SELECT doc_id,
            CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h,
            ((16 + doc_id % 13) * 3 + 3) // 4 * 4 AS stride,
            CAST(3 + doc_id % 4 AS INT) AS nf,
            CAST(200 + doc_id % 57 AS INT) AS ns
          FROM documents)
        SELECT doc_id AS media_id, 'image' AS kind,
          CAST(54 + stride * h AS INT) AS n_bytes,
          CAST(w * h AS BIGINT) AS n_units,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS feature_sum
        FROM m,
          LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys
        WHERE doc_id % 3 = 0 GROUP BY 1, 2, 3, 4
        UNION ALL
        SELECT doc_id AS media_id, 'audio' AS kind,
          CAST(44 + ns * 2 AS INT) AS n_bytes,
          CAST(ns AS BIGINT) AS n_units,
          CAST(list_sum([abs(((doc_id * 31 + i * i * 7) % 65536) - 32768)
               FOR i IN generate_series(0, ns - 1)]) AS BIGINT) AS feature_sum
        FROM m WHERE doc_id % 3 = 1
        UNION ALL
        SELECT base.doc_id AS media_id, 'video' AS kind,
          CAST(100 + base.nf * (8 + base.stride * base.h) AS INT) AS n_bytes,
          CAST(base.nf * base.w * base.h AS BIGINT) AS n_units,
          CAST(SUM((base.fid * 7 + x * 3 + y * 5) % 256
             + 2 * ((base.fid + x * 11 + y * 2) % 256)
             + 3 * ((base.fid * 13 + x * y) % 256)) AS BIGINT) AS feature_sum
        FROM (SELECT m.*, doc_id + 131 * f AS fid FROM m,
            LATERAL (SELECT unnest(generate_series(0, m.nf - 1)) AS f) fs
          WHERE doc_id % 3 = 2) base,
          LATERAL (SELECT unnest(generate_series(0, base.w - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0, base.h - 1)) AS y) ys
        GROUP BY 1, 2, 3, 4""")),

    // ----- frame sampling: decode the AVI, keep every 4th REAL frame -----
    // The video-pipeline sampling stage: parse the container, unpack the
    // sampled frames' actual pixels (not byte offsets), and emit a
    // per-frame feature. The oracle re-derives each sampled frame's
    // pixel sum from the formula with the id + 131*f frame shift.
    Q("mm_frame_sample",
      (s, d) => {
        import s.implicits._
        val vids = mediaTable(s, d)
          .filter($"kind" === "video")
          .select($"media_id", $"content")
          .as[(Long, Array[Byte])]
        vids.mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            val vid = AviCodec.decode(bytes)
            vid.frames.zipWithIndex.collect {
              case (img, f) if f % 4 == 0 =>
                (id, f, img.w, img.h, weightedPxSum(img))
            }
          }
        }.toDF("media_id", "frame_no", "w", "h", "px_sum")
      },
      Some("""SELECT base.doc_id AS media_id, CAST(base.f AS INT) AS frame_no,
          CAST(16 + base.doc_id % 13 AS INT) AS w,
          CAST(12 + base.doc_id % 7 AS INT) AS h,
          CAST(SUM((base.fid * 7 + x * 3 + y * 5) % 256
             + 2 * ((base.fid + x * 11 + y * 2) % 256)
             + 3 * ((base.fid * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM (SELECT doc_id, f, doc_id + 131 * f AS fid FROM documents,
            LATERAL (SELECT UNNEST([x FOR x IN
              generate_series(0, CAST(3 + doc_id % 4 AS INT) - 1)
              IF x % 4 = 0]) AS f) fs
          WHERE doc_id % 3 = 2) base,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + base.doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + base.doc_id % 7 AS INT) - 1)) AS y) ys
        GROUP BY 1, 2, 3, 4""")),

    // ----- resize (REAL nearest-neighbor pixel downsample) ---------------
    // The resize stage of an image pipeline: decode the BMP, integer
    // nearest-neighbor downsample to fit within 8x8 preserving aspect
    // (scale = ceil(max_dim / 8); target pixel (x, y) samples source
    // pixel (x*scale, y*scale)), and emit the resized image's weighted
    // pixel sum. The oracle computes the same sampled-pixel sum from the
    // formula + identical index math, independent of the decoder.
    Q("mm_resize",
      (s, d) => {
        import s.implicits._
        val media = mediaTable(s, d)
          .filter($"kind" === "image")
          .select($"media_id", $"content")
          .as[(Long, Array[Byte])]
        media.mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = BmpCodec.decode(bytes)
            val scale = (math.max(img.w, img.h) + 7) / 8
            val nw = math.max(img.w / scale, 1)
            val nh = math.max(img.h / scale, 1)
            var acc = 0L
            var y = 0
            while (y < nh) {
              var x = 0
              while (x < nw) {
                val (sx, sy) = (x * scale, y * scale)
                acc += img.r(sx, sy) + 2L * img.g(sx, sy) + 3L * img.b(sx, sy)
                x += 1
              }
              y += 1
            }
            (id, img.w, img.h, nw, nh, acc)
          }
        }.toDF("media_id", "w", "h", "new_w", "new_h", "px_sum")
      },
      Some("""WITH img AS (
          SELECT doc_id AS media_id,
            CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h
          FROM documents WHERE doc_id % 3 = 0),
        dims AS (
          SELECT media_id, w, h,
            CAST((greatest(w, h) + 7) // 8 AS INT) AS scale,
            CAST(greatest(w // ((greatest(w, h) + 7) // 8), 1) AS INT) AS nw,
            CAST(greatest(h // ((greatest(w, h) + 7) // 8), 1) AS INT) AS nh
          FROM img)
        SELECT media_id, w, h, nw AS new_w, nh AS new_h,
          CAST(SUM((media_id * 7 + (x * scale) * 3 + (y * scale) * 5) % 256
             + 2 * ((media_id + (x * scale) * 11 + (y * scale) * 2) % 256)
             + 3 * ((media_id * 13 + (x * scale) * (y * scale)) % 256))
             AS BIGINT) AS px_sum
        FROM dims,
          LATERAL (SELECT unnest(generate_series(0, nw - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0, nh - 1)) AS y) ys
        GROUP BY 1, 2, 3, 4, 5""")),

    // ----- REAL BMP decode through the mapPartitions seam ----------------
    // The binary column carries genuine BMP files (BmpCodec.encode —
    // synthesized byte-by-byte, PcapSynth-style); the seam decodes them
    // with the independent byte-only parser and emits per-image stats.
    // The oracle derives the same stats from the pixel FORMULA, never
    // the bytes: any stride/origin/channel-order parse bug mismatches.
    Q("mm_decode_bmp",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val bytes = BmpCodec.encode(id) // the stored blob (real BMP)
            val img = BmpCodec.decode(bytes) // byte-only parse under test
            var acc = 0L
            var y = 0
            while (y < img.h) {
              var x = 0
              while (x < img.w) {
                acc += img.r(x, y) + 2L * img.g(x, y) + 3L * img.b(x, y)
                x += 1
              }
              y += 1
            }
            (id, img.w, img.h, bytes.length, acc)
          }
        }.toDF("media_id", "w", "h", "file_bytes", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(54 + ((16 + doc_id % 13) * 3 + 3) // 4 * 4
               * (12 + doc_id % 7) AS INT) AS file_bytes,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 0
        GROUP BY 1, 2, 3, 4""")),

    // ----- REAL PNG decode (compressed container) ------------------------
    // Same contract as mm_decode_bmp but through the COMPRESSED codec:
    // encode each image doc as a genuine PNG (zlib-deflated scanlines,
    // filter type cycling through all five per row), parse it back with
    // the byte-only CRC-checking PngCodec.decode under test, and emit
    // per-image pixel stats. File size is deliberately NOT an output —
    // deflate length is not a closed formula — so the oracle pins the
    // pixels, which the formula fully determines.
    Q("mm_decode_png",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val img = PngCodec.decode(PngCodec.encode(id))
            (id, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 0
        GROUP BY 1, 2, 3""")),

    // ----- REAL animated GIF decode (canvas compositing) -----------------
    // The multi-frame GIF89a path real web GIFs use: NETSCAPE loop
    // extension, per-frame Graphics Control Extensions, and OPTIMIZED
    // frames that carry only their changed rect — so decoding frame f
    // requires compositing every rect up to f onto the persistent
    // canvas. The oracle re-derives each composited canvas from the
    // synthesis formulas alone (for every pixel, the GOVERNING frame is
    // the latest g <= f whose rect covers it — a correlated MAX, no
    // knowledge of GIF wire format), so a hash match proves the GCE
    // walk, rect placement, LZW per frame, and compositing are all
    // exact. Narrow per-row decode; frames explode to rows only after
    // the canvas is reduced to one BIGINT sum.
    Q("mm_decode_gif_animated",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        spreadIds(ids).mapPartitions { it =>
          it.flatMap { id =>
            val frames = GifCodec.decodeFrames(GifCodec.encodeAnimated(id))
            frames.zipWithIndex.map { case ((img, delay), f) =>
              (id, f, delay, weightedPxSum(img))
            }
          }
        }.toDF("media_id", "frame_idx", "delay_cs", "px_sum")
      },
      Some("""WITH gifs AS (
          SELECT doc_id, CAST(3 + doc_id % 4 AS INT) AS nf,
            CAST(24 + doc_id % 13 AS INT) AS w,
            CAST(18 + doc_id % 7 AS INT) AS h
          FROM documents WHERE doc_id % 3 = 1),
        fx AS (
          SELECT doc_id, w, h, f FROM gifs,
            LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) fs),
        pxg AS (
          SELECT doc_id, f, x, y,
            COALESCE(MAX(CASE WHEN g <= f
                AND x >= (3*g + doc_id % 5) % (w - (8 + g % 5) + 1)
                AND x < (3*g + doc_id % 5) % (w - (8 + g % 5) + 1)
                      + 8 + g % 5
                AND y >= (2*g + doc_id % 3) % (h - (6 + g % 3) + 1)
                AND y < (2*g + doc_id % 3) % (h - (6 + g % 3) + 1)
                      + 6 + g % 3
              THEN g END), 0) AS g
          FROM fx,
            LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys,
            (SELECT unnest(generate_series(1, 6)) AS g) gs
          GROUP BY doc_id, f, x, y),
        ci AS (
          SELECT doc_id, f,
            ((doc_id + 131 * g) * 5 + x * 3 + y * 7) % 256 AS c
          FROM pxg)
        SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
          CAST(10 + f AS INT) AS delay_cs,
          CAST(SUM(c + 2 * ((c * 3) % 256) + 3 * ((c * 7) % 256))
            AS BIGINT) AS px_sum
        FROM ci GROUP BY 1, 2, 3""")),

    // ----- REAL Adam7-interlaced PNG decode ------------------------------
    // The PNG world's progressive wire format (spec §8.2), the sibling
    // of mm_decode_jpeg_progressive: seven per-pass sub-images, each
    // filtered INDEPENDENTLY, scattered back onto the pixel grid. The
    // oracle re-derives pixel sums from the synthesis formulas — it
    // knows nothing about passes — so a hash match proves the pass
    // geometry, the per-pass filter context reset, and the scatter are
    // all exact. Every doc id's dims hit different pass-emptiness
    // shapes (w,h from 16-28 × 12-18 exercise all seven passes
    // non-empty plus ragged sub-image edges).
    Q("mm_decode_png_interlaced",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        spreadIds(imgs).mapPartitions { it =>
          it.map { id =>
            val img = PngCodec.decode(PngCodec.encodeInterlaced(id))
            (id, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 0
        GROUP BY 1, 2, 3""")),

    // ----- REAL GIF decode (hand-written LZW) ----------------------------
    // Same contract as mm_decode_png but through the LZW container —
    // the codec with no JDK compression primitive (see GifCodec). Every
    // doc row becomes a GIF (no %3 gate: odd and even dims, all 91
    // w×h combinations), each is LZW-compressed and decoded back by
    // the byte-only parser under test. File size is not an output (LZW
    // length has no closed formula); the oracle re-derives dims and the
    // palette-weighted pixel sum from the synthesis formulas alone.
    Q("mm_decode_gif",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val img = GifCodec.decode(GifCodec.encode(id))
            (id, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(24 + doc_id % 13 AS INT) AS w,
          CAST(18 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 5 + x * 3 + y * 7) % 256
             + 2 * (((doc_id * 5 + x * 3 + y * 7) % 256) * 3 % 256)
             + 3 * (((doc_id * 5 + x * 3 + y * 7) % 256) * 7 % 256))
            AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(24 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(18 + doc_id % 7 AS INT) - 1)) AS y) ys
        GROUP BY 1, 2, 3""")),

    // ----- REAL JPEG decode (lossy DCT container) ------------------------
    // The dominant image format of any real crawl, through a full
    // baseline JFIF codec (JpegCodec: Annex-K Huffman, DC prediction,
    // zigzag/ZRL/EOB, dequant, IDCT, 4:2:0 upsample, YCbCr→RGB). The
    // fixture is synthesized in COEFFICIENT space so the lossy
    // roundtrip is exactly predictable: per-8×8 luma block a DC level
    // + three AC basis patterns whose IDCT is ±coeff/8 at every pixel,
    // chroma constant per MCU (see JpegCodec scaladoc). The oracle
    // re-derives each pixel from the block formulas + the closed-form
    // JFIF color transform in identical IEEE-double arithmetic — no
    // codec knowledge, pixel-level bit-exact. Blob dispatch goes
    // through the same magic-byte sniffer as every other container.
    Q("mm_decode_jpeg",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).select($"doc_id").as[Long]
        spreadIds(imgs).mapPartitions { it =>
          it.map { id =>
            val bytes = JpegCodec.encode(id)
            val img = sniffKind(bytes) match {
              case "jpg" => JpegCodec.decode(bytes)
              case k => throw new IllegalStateException(
                s"sniffer classified a JPEG blob as $k")
            }
            (id, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "w", "h", "px_sum")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px)
        SELECT doc_id AS media_id,
          CAST(21 + doc_id % 14 AS INT) AS w,
          CAST(13 + doc_id % 11 AS INT) AS h,
          CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
        FROM rgb GROUP BY 1, 2, 3""")),

    // ----- REAL progressive JPEG decode (SOF2, T.81 Annex G) -------------
    // A large share of web JPEGs are progressive; mm_decode_jpeg alone
    // would skip them. Same coefficient-space fixture content as the
    // baseline entry, delivered across a 7-scan progressive script
    // (interleaved DC first pass at Al=1, spectral-band AC first
    // passes, all-zero chroma bands as pure EOB runs, an AC refinement
    // pass with newly-significant + correction bits, a DC refinement
    // pass) — so the SAME closed-form oracle pins every pixel while
    // the decode takes the scan-accumulation path (coefficient stores
    // + per-scan successive approximation) instead of the one-shot
    // baseline path. Gated to doc_id % 3 == 1 to keep battery cost
    // bounded (the full-set sweep is mm_decode_jpeg's).
    Q("mm_decode_jpeg_progressive",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        spreadIds(imgs).mapPartitions { it =>
          it.map { id =>
            val bytes = JpegCodec.encodeProgressive(id)
            val img = sniffKind(bytes) match {
              case "jpg" => JpegCodec.decode(bytes)
              case k => throw new IllegalStateException(
                s"sniffer classified a progressive JPEG blob as $k")
            }
            (id, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "w", "h", "px_sum")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys
          WHERE doc_id % 3 = 1),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px)
        SELECT doc_id AS media_id,
          CAST(21 + doc_id % 14 AS INT) AS w,
          CAST(13 + doc_id % 11 AS INT) AS h,
          CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
        FROM rgb GROUP BY 1, 2, 3""")),

    // ----- perceptual image fingerprint (dHash) --------------------------
    // THE standard image near-dup primitive (difference hash): sample
    // the decoded image to a 9×8 grayscale grid (same nearest-neighbor
    // index math as mm_resize_bmp), compare horizontal neighbors, pack
    // the 64 comparison bits. Downstream image dedup is then exact
    // hash-groupBy or banded Hamming joins over THIS column — the
    // dedup-family machinery applied to pixels. All-integer (scaled
    // 299/587/114 luma, integer grid division), so the oracle
    // re-derives every bit from the synthesis formulas; the hash rides
    // as two 32-bit halves in BIGINTs to keep both engines' arithmetic
    // trivially exact. Narrow map over the decode, no shuffle.
    Q("mm_dhash",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val (hi, lo) = dhashOf(BmpCodec.decode(BmpCodec.encode(id)))
            (id, hi, lo)
          }
        }.toDF("media_id", "dhash_hi", "dhash_lo")
      },
      Some("""WITH g AS (
          SELECT doc_id, CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h, x, y
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys
          WHERE doc_id % 3 = 0),
        b AS (
          SELECT doc_id, x, y,
            CASE WHEN
              299 * ((doc_id*7 + ((x+1)*w//9)*3 + (y*h//8)*5) % 256)
              + 587 * ((doc_id + ((x+1)*w//9)*11 + (y*h//8)*2) % 256)
              + 114 * ((doc_id*13 + ((x+1)*w//9) * (y*h//8)) % 256)
              >
              299 * ((doc_id*7 + (x*w//9)*3 + (y*h//8)*5) % 256)
              + 587 * ((doc_id + (x*w//9)*11 + (y*h//8)*2) % 256)
              + 114 * ((doc_id*13 + (x*w//9) * (y*h//8)) % 256)
            THEN 1 ELSE 0 END AS bit
          FROM g)
        SELECT doc_id AS media_id,
          CAST(SUM(CASE WHEN y >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_hi,
          CAST(SUM(CASE WHEN y < 4
            THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_lo
        FROM b GROUP BY 1""")),

    // ----- per-frame video fingerprint (dHash sequence) ------------------
    // The video leg of the fingerprint trio: every decoded AVI frame
    // gets the SAME 9×8 dHash as mm_dhash (shared dhashOf helper), so
    // near-dup video detection reduces to sequence comparison over
    // (frame_idx, hash) rows — shot-boundary detection and duplicate
    // clips both fall out of this relation. Frame f carries the
    // id + 131·f fixture content, so the oracle re-derives every bit
    // per frame. flatMap explodes frames; still a narrow map.
    Q("mm_video_dhash",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.flatMap { id =>
            val vid = AviCodec.decode(AviCodec.encode(id))
            vid.frames.zipWithIndex.map { case (img, f) =>
              val (hi, lo) = dhashOf(img)
              (id, f, hi, lo)
            }
          }
        }.toDF("media_id", "frame_idx", "dhash_hi", "dhash_lo")
      },
      Some("""WITH g AS (
          SELECT doc_id, f, doc_id + 131 * f AS fid,
            CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h, x, y
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(3 + doc_id % 4 AS INT) - 1)) AS f) fs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys
          WHERE doc_id % 3 = 2),
        b AS (
          SELECT doc_id, f, x, y,
            CASE WHEN
              299 * ((fid*7 + ((x+1)*w//9)*3 + (y*h//8)*5) % 256)
              + 587 * ((fid + ((x+1)*w//9)*11 + (y*h//8)*2) % 256)
              + 114 * ((fid*13 + ((x+1)*w//9) * (y*h//8)) % 256)
              >
              299 * ((fid*7 + (x*w//9)*3 + (y*h//8)*5) % 256)
              + 587 * ((fid + (x*w//9)*11 + (y*h//8)*2) % 256)
              + 114 * ((fid*13 + (x*w//9) * (y*h//8)) % 256)
            THEN 1 ELSE 0 END AS bit
          FROM g)
        SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
          CAST(SUM(CASE WHEN y >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_hi,
          CAST(SUM(CASE WHEN y < 4
            THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_lo
        FROM b GROUP BY 1, 2""")),

    // ----- audio energy-contour fingerprint ------------------------------
    // The audio-dedup companion to mm_dhash: decoded PCM splits into
    // 20-sample windows, per-window energy = Σ|sample| (exact integer),
    // and the fingerprint packs the rises of the energy contour
    // (energy(w) > energy(w−1)) — the energy-delta scheme acoustic
    // fingerprinters build on. Window w's bit position is w−1; trailing
    // partial windows are dropped (every full window is identical on
    // both engines). Narrow map over the decode, no shuffle; the
    // oracle re-derives every window energy from the PCM synthesis
    // formula.
    Q("mm_audio_fingerprint",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val a = WavCodec.decode(WavCodec.encode(id))
            val W = 20
            val nw = a.samples.length / W
            val en = new Array[Long](nw)
            var w = 0
            while (w < nw) {
              var acc = 0L
              var i = 0
              while (i < W) {
                acc += math.abs(a.samples(w * W + i).toInt)
                i += 1
              }
              en(w) = acc
              w += 1
            }
            var fp = 0L
            var k = 1
            while (k < nw) {
              if (en(k) > en(k - 1)) fp |= 1L << (k - 1)
              k += 1
            }
            (id, nw, fp)
          }
        }.toDF("media_id", "n_windows", "fp")
      },
      Some("""WITH sz AS (
          SELECT doc_id, CAST(200 + doc_id % 57 AS INT) AS n
          FROM documents WHERE doc_id % 3 = 1),
        e AS (
          SELECT doc_id, w,
            list_sum([abs(((doc_id*31 + i*i*7) % 65536) - 32768)
                      FOR i IN generate_series(w*20, w*20 + 19)]) AS en
          FROM sz,
            LATERAL (SELECT unnest(generate_series(0, n//20 - 1)) AS w)),
        b AS (
          SELECT doc_id, w,
            CASE WHEN en > lag(en) OVER
              (PARTITION BY doc_id ORDER BY w) THEN 1 ELSE 0 END AS bit
          FROM e)
        SELECT doc_id AS media_id,
          CAST(COUNT(*) AS INT) AS n_windows,
          CAST(SUM(CASE WHEN w >= 1
            THEN bit * (CAST(1 AS BIGINT) << (w - 1))
            ELSE 0 END) AS BIGINT) AS fp
        FROM b GROUP BY 1""")),

    // ----- dHash through the container sniffer (mixed formats) -----------
    // The production shape of perceptual fingerprinting: a crawl's image
    // column is format-heterogeneous, so the hash must ride the
    // magic-byte sniffer, not a per-format op. Each doc renders as one
    // of FOUR containers (BMP / PNG / GIF / JPEG by doc_id % 4), is
    // dispatched on magic bytes alone, decoded by the byte-only parser
    // — including the full lossy T.81 JPEG path — and fed to the SAME
    // dhashOf as mm_dhash. The oracle re-derives every sampled-pixel
    // luma from each format's synthesis formulas (for JPEG, the
    // closed-form coefficient-space reconstruction of mm_decode_jpeg
    // restricted to the 9x8 sample grid) and compares hashes bit-for-
    // bit — so a stride, palette, or IDCT slip in ANY decoder flips
    // bits and mismatches. Narrow per-row map, no shuffle.
    Q("mm_dhash_any",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val bytes = (id % 4) match {
              case 0 => BmpCodec.encode(id)
              case 1 => PngCodec.encode(id)
              case 2 => GifCodec.encode(id)
              // half the JPEGs ride the PROGRESSIVE (SOF2) wire format:
              // same magic bytes, same decoded pixels (coefficient-
              // identical scans), so the oracle is unchanged while the
              // sniffer path exercises both decode paths
              case _ => if (id % 8 == 3) JpegCodec.encodeProgressive(id)
                        else JpegCodec.encode(id)
            }
            val (container, img) = sniffKind(bytes) match {
              case "bmp" => ("bmp", BmpCodec.decode(bytes))
              case "png" => ("png", PngCodec.decode(bytes))
              case "gif" => ("gif", GifCodec.decode(bytes))
              case "jpg" => ("jpg", JpegCodec.decode(bytes))
              case k => throw new IllegalStateException(
                s"sniffer classified an image blob as $k")
            }
            val (hi, lo) = dhashOf(img)
            (id, container, hi, lo)
          }
        }.toDF("media_id", "container", "dhash_hi", "dhash_lo")
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 4 AS c FROM documents),
        d2 AS (SELECT doc_id, c,
            CAST(CASE WHEN c = 2 THEN 24 + doc_id % 13
                      WHEN c = 3 THEN 21 + doc_id % 14
                      ELSE 16 + doc_id % 13 END AS INT) AS w,
            CAST(CASE WHEN c = 2 THEN 18 + doc_id % 7
                      WHEN c = 3 THEN 13 + doc_id % 11
                      ELSE 12 + doc_id % 7 END AS INT) AS h
          FROM m),
        sp AS (SELECT doc_id, c, gx, y,
            (gx * w) // 9 AS px, (y * h) // 8 AS py
          FROM d2,
            LATERAL (SELECT unnest(generate_series(0, 8)) AS gx) gs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys),
        jp AS (SELECT doc_id, gx, y,
            64 + (doc_id*7 + (px//8)*31 + (py//8)*17) % 128
              + ((doc_id + (px//8)*5 + (py//8)*3) % 8)
                * (CASE WHEN (px%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (px//8) + (py//8)*7) % 8)
                * (CASE WHEN (py%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (px//8)*7 + (py//8)) % 4)
                * (CASE WHEN (px%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (py%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (px//16)*13 + (py//16)*19) % 256 AS cb,
            (doc_id*3 + (px//16)*7 + (py//16)*29) % 256 AS cr
          FROM sp WHERE c = 3),
        rgb AS (
          SELECT doc_id, gx, y,
            (doc_id*7 + px*3 + py*5) % 256 AS r,
            (doc_id + px*11 + py*2) % 256 AS g,
            (doc_id*13 + px*py) % 256 AS b
          FROM sp WHERE c IN (0, 1)
          UNION ALL
          SELECT doc_id, gx, y,
            (doc_id*5 + px*3 + py*7) % 256,
            ((doc_id*5 + px*3 + py*7) % 256) * 3 % 256,
            ((doc_id*5 + px*3 + py*7) % 256) * 7 % 256
          FROM sp WHERE c = 2
          UNION ALL
          SELECT doc_id, gx, y,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))),
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))),
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT)))
          FROM jp),
        lum AS (SELECT doc_id, gx, y,
            299 * r + 587 * g + 114 * b AS lum FROM rgb),
        bb AS (SELECT l0.doc_id, l0.gx AS x, l0.y AS y,
            CASE WHEN l1.lum > l0.lum THEN 1 ELSE 0 END AS bit
          FROM lum l0 JOIN lum l1
            ON l1.doc_id = l0.doc_id AND l1.y = l0.y AND l1.gx = l0.gx + 1
          WHERE l0.gx < 8)
        SELECT bb.doc_id AS media_id,
          CASE c WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                 WHEN 2 THEN 'gif' ELSE 'jpg' END AS container,
          CAST(SUM(CASE WHEN y >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_hi,
          CAST(SUM(CASE WHEN y < 4
            THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_lo
        FROM bb JOIN m ON bb.doc_id = m.doc_id
        GROUP BY 1, 2""")),

    // ----- DC-only JPEG fingerprint (the petabyte-scale dHash path) -------
    // Fingerprinting a JPEG corpus does NOT need full decodes: the DC
    // coefficients alone reconstruct an exact 1/8-scale luma thumbnail
    // (a DC-only block IDCTs to a flat floor(dc/8 + 128.5)), which is
    // more resolution than the 9x8 dHash grid samples anyway. On
    // PROGRESSIVE input (the dominant web wire format) the decoder
    // byte-SKIPS every AC scan without entropy-decoding it — cost is
    // O(DC-scan bytes), a few percent of the stream — and on baseline
    // it skips IDCT/upsample/color. The fixture renders large
    // (75-95 x 66-78) coefficient-synthesized JPEGs, half baseline and
    // half progressive (bit-identical thumbnails, DcThumbnailSpec);
    // the ORACLE is pure closed form: the fixture's DC-only
    // reconstruction is exactly yBase (the AC bases vanish from a
    // flat block), so every hash bit derives from integer arithmetic
    // with no decoder in the loop. Narrow per-row map, no shuffle.
    Q("mm_dhash_dc",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        spreadIds(imgs).mapPartitions { it =>
          it.map { id =>
            val dims = (75 + (id % 21).toInt, 66 + (id % 13).toInt)
            val bytes =
              if (id % 2 == 0) JpegCodec.encode(id, dimsOverride = dims)
              else JpegCodec.encodeProgressive(id, dimsOverride = dims)
            val (hi, lo) =
              dhashOf(JpegCodec.decodeLumaDcThumbnail(bytes))
            (id, hi, lo)
          }
        }.toDF("media_id", "dhash_hi", "dhash_lo")
      },
      Some("""WITH dm AS (
          SELECT doc_id,
            (75 + doc_id % 21 + 7) // 8 AS tw,
            (66 + doc_id % 13 + 7) // 8 AS th
          FROM documents WHERE doc_id % 3 = 0),
        pb AS (
          SELECT doc_id, x, y,
            CASE WHEN
              (64 + (doc_id*7 + (((x+1)*tw)//9)*31 + ((y*th)//8)*17) % 128)
              >
              (64 + (doc_id*7 + ((x*tw)//9)*31 + ((y*th)//8)*17) % 128)
            THEN 1 ELSE 0 END AS bit
          FROM dm,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, 7)) AS y) ys)
        SELECT doc_id AS media_id,
          CAST(SUM(CASE WHEN y >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_hi,
          CAST(SUM(CASE WHEN y < 4
            THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x))
            ELSE 0 END) AS BIGINT) AS dhash_lo
        FROM pb GROUP BY 1""")),

    // ----- REAL nearest-neighbor resize (actual pixel downsampling) ------
    // Decode the BMP, then sample source pixel (x*w/8, y*h/6) for each
    // target pixel of an 8x6 thumbnail — the integer nearest-neighbor
    // resample an image pipeline's resize stage performs. Exploded to
    // per-pixel rows so the oracle compares every byte; the oracle
    // computes expected channels from the formula + the same index math,
    // independent of the decoder.
    Q("mm_resize_bmp",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.flatMap { id =>
            val img = BmpCodec.decode(BmpCodec.encode(id))
            for { y <- 0 until 6; x <- 0 until 8 } yield {
              val sx = x * img.w / 8
              val sy = y * img.h / 6
              (id, y, x, img.r(sx, sy), img.g(sx, sy), img.b(sx, sy))
            }
          }
        }.toDF("media_id", "y", "x", "r", "g", "b")
      },
      Some("""WITH img AS (
          SELECT doc_id, CAST(16 + doc_id % 13 AS INT) AS w,
            CAST(12 + doc_id % 7 AS INT) AS h
          FROM documents WHERE doc_id % 3 = 0)
        SELECT doc_id AS media_id, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
          CAST((doc_id * 7 + ((x * w) // 8) * 3 + ((y * h) // 6) * 5) % 256
               AS INT) AS r,
          CAST((doc_id + ((x * w) // 8) * 11 + ((y * h) // 6) * 2) % 256
               AS INT) AS g,
          CAST((doc_id * 13 + ((x * w) // 8) * ((y * h) // 6)) % 256
               AS INT) AS b
        FROM img,
          LATERAL (SELECT unnest(generate_series(0, 7)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0, 5)) AS y) ys""")),

    // ----- REAL audio decode (PCM-16 WAV) --------------------------------
    // The audio leg of the multimodal family, same contract as
    // mm_decode_bmp: encode the deterministic fixture blob, parse it
    // back through the byte-only WavCodec.decode under test, and emit
    // integer-exact features (peak, sum of |sample|, duration) the
    // oracle re-derives from the synthesis formula alone. Narrow map,
    // no shuffle; blobs never leave the partition.
    Q("mm_decode_wav",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val audio = WavCodec.decode(WavCodec.encode(id))
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < audio.samples.length) {
              val a = math.abs(audio.samples(i).toInt)
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            (id, audio.sampleRate, audio.samples.length,
              audio.samples.length * 1000 / audio.sampleRate, peak, sumAbs)
          }
        }.toDF("media_id", "sample_rate", "n_samples", "duration_ms",
          "peak", "sum_abs")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(200 + doc_id % 57 AS INT) AS n_samples,
          CAST((200 + doc_id % 57) * 1000
               // (8000 + (doc_id % 3) * 4000) AS INT) AS duration_ms,
          CAST(list_max([abs(((doc_id * 31 + i * i * 7) % 65536) - 32768)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS INT) AS peak,
          CAST(list_sum([abs(((doc_id * 31 + i * i * 7) % 65536) - 32768)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS BIGINT) AS sum_abs
        FROM documents WHERE doc_id % 3 = 1""")),

    // ----- REAL compressed-audio decode (G.711 µ-law / A-law WAV) --------
    // The telephony companders (ITU-T G.711; RFC 3551 payload types
    // 0/8) — what RTP voice captures actually carry, and the cheapest
    // real-world compressed-audio coverage: WAVE format tags 7/6, one
    // codeword byte per sample, expanded to linear PCM by pure spec
    // arithmetic (segment/mantissa unpack) inside the same chunk walk
    // as PCM16. Alternating clips are µ-law vs A-law so one query
    // exercises both expansion tables; the oracle re-derives every
    // expanded sample in closed form from the codeword formula —
    // integer-exact end to end.
    Q("mm_decode_wav_g711",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val alaw = (id / 3) % 2 == 1
            val audio = WavCodec.decode(WavCodec.encodeG711(id, alaw))
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < audio.samples.length) {
              val a = math.abs(audio.samples(i).toInt)
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            (id, if (alaw) "alaw" else "ulaw", audio.sampleRate,
              audio.samples.length, peak, sumAbs)
          }
        }.toDF("media_id", "codec", "sample_rate", "n_samples",
          "peak", "sum_abs")
      },
      Some("""WITH cw AS (
          SELECT doc_id,
            CASE WHEN (doc_id // 3) % 2 = 1 THEN 'alaw' ELSE 'ulaw' END
              AS codec,
            CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
            CAST(200 + doc_id % 57 AS INT) AS n_samples,
            (doc_id * 31 + i * i * 7) % 256 AS b
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(200 + doc_id % 57 AS INT) - 1)) AS i) xs
          WHERE doc_id % 3 = 2),
        pcm AS (
          SELECT doc_id, codec, sample_rate, n_samples,
            CASE WHEN codec = 'ulaw' THEN
              -- u = ~b & 255; t = ((mant<<3)+132) << seg; sign bit 7
              CASE WHEN (255 - b) >= 128
                THEN 132 - (((255 - b) % 16) * 8 + 132)
                           * (1 << (((255 - b) // 16) % 8))
                ELSE (((255 - b) % 16) * 8 + 132)
                     * (1 << ((255 - b) // 16)) - 132
              END
            ELSE
              -- a = b ^ 0x55; seg 0 linear+8, seg 1 starts the chain
              (CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END) *
              (CASE WHEN (xor(b, 85) // 16) % 8 = 0
                 THEN (xor(b, 85) % 16) * 16 + 8
                 WHEN (xor(b, 85) // 16) % 8 = 1
                 THEN (xor(b, 85) % 16) * 16 + 264
                 ELSE ((xor(b, 85) % 16) * 16 + 264)
                      * (1 << ((xor(b, 85) // 16) % 8 - 1))
               END)
            END AS v
          FROM cw)
        SELECT doc_id AS media_id, codec, sample_rate, n_samples,
          CAST(MAX(ABS(v)) AS INT) AS peak,
          CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
        FROM pcm GROUP BY 1, 2, 3, 4""")),

    // ----- REAL compressed-audio decode #2 (IMA/DVI ADPCM) ----------------
    // The 4-bit DIFFERENTIAL compander (WAVE tag 0x11; RFC 3551
    // "DVI4") — unlike G.711's stateless per-byte tables, every sample
    // depends on the running (predictor, step-index) state, restarted
    // per block from a 4-byte header. The decoder walks blocks
    // independently (the format's seek property); the oracle re-derives
    // the EXACT state recursion in SQL — a recursive CTE stepping
    // (pred, idx) through every nibble with the public IMA step/index
    // tables inlined — so a hash match proves the stateful decode
    // sample-for-sample, not just in aggregate shape.
    Q("mm_decode_wav_adpcm",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 4 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val audio = WavCodec.decode(WavCodec.encodeImaAdpcm(id))
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < audio.samples.length) {
              val a = math.abs(audio.samples(i).toInt)
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            (id, audio.sampleRate, audio.samples.length, peak, sumAbs)
          }
        }.toDF("media_id", "sample_rate", "n_samples", "peak", "sum_abs")
      },
      Some("""WITH RECURSIVE tb AS (
          SELECT [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
            28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97,
            107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
            337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
            1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
            2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
            7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
            16818, 18500, 20350, 22385, 24623, 27086, 29794,
            32767] AS steps),
        blk AS (
          SELECT doc_id, b,
            CAST(((doc_id*31 + b*101) % 65536) - 32768 AS INT) AS pred0,
            CAST((doc_id + b*7) % 89 AS INT) AS idx0
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(2 + doc_id % 3 AS INT) - 1)) AS b) bs
          WHERE doc_id % 4 = 1),
        rec AS (
          SELECT doc_id, b, -1 AS t, pred0 AS pred, idx0 AS idx
          FROM blk
          UNION ALL
          SELECT doc_id, b, t + 1,
            CAST(LEAST(32767, GREATEST(-32768,
              pred + (CASE WHEN c >= 8 THEN -1 ELSE 1 END) *
                (step // 8
                 + CASE WHEN c % 2 = 1 THEN step // 4 ELSE 0 END
                 + CASE WHEN (c // 2) % 2 = 1 THEN step // 2 ELSE 0 END
                 + CASE WHEN (c // 4) % 2 = 1 THEN step ELSE 0 END)))
              AS INT),
            CAST(LEAST(88, GREATEST(0, idx + CASE c % 8
              WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
              ELSE -1 END)) AS INT)
          FROM (
            SELECT r.doc_id, r.b, r.t, r.pred, r.idx,
              CASE WHEN (r.t + 1) % 2 = 0
                THEN ((r.doc_id*13 + r.b*53 + ((r.t + 1) // 2)*29) % 256)
                     % 16
                ELSE ((r.doc_id*13 + r.b*53 + ((r.t + 1) // 2)*29) % 256)
                     // 16
              END AS c,
              tb.steps[r.idx + 1] AS step
            FROM rec r CROSS JOIN tb
            WHERE r.t + 1 < 128))
        SELECT doc_id AS media_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(COUNT(*) AS INT) AS n_samples,
          CAST(MAX(ABS(pred)) AS INT) AS peak,
          CAST(SUM(ABS(pred)) AS BIGINT) AS sum_abs
        FROM rec GROUP BY 1""")),

    // ----- REAL video decode (uncompressed AVI) --------------------------
    // The video leg: encode the deterministic multi-frame fixture, parse
    // it back through the byte-only AviCodec.decode under test (chunk
    // tree walk, DIB frame unpack), and emit per-frame weighted pixel
    // sums the oracle re-derives from the formula with the id + 131*f
    // frame shift. flatMap explodes frames to rows; still a narrow map.
    Q("mm_video_frames_avi",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.flatMap { id =>
            val vid = AviCodec.decode(AviCodec.encode(id))
            vid.frames.zipWithIndex.map { case (img, f) =>
              var acc = 0L
              var y = 0
              while (y < img.h) {
                var x = 0
                while (x < img.w) {
                  acc += img.r(x, y) + 2L * img.g(x, y) + 3L * img.b(x, y)
                  x += 1
                }
                y += 1
              }
              (id, f, img.w, img.h, acc)
            }
          }
        }.toDF("media_id", "frame_idx", "w", "h", "px_sum")
      },
      Some("""SELECT base.doc_id AS media_id, CAST(base.f AS INT) AS frame_idx,
          CAST(16 + base.doc_id % 13 AS INT) AS w,
          CAST(12 + base.doc_id % 7 AS INT) AS h,
          CAST(SUM((base.fid * 7 + x * 3 + y * 5) % 256
             + 2 * ((base.fid + x * 11 + y * 2) % 256)
             + 3 * ((base.fid * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM (SELECT doc_id, f, doc_id + 131 * f AS fid FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(3 + doc_id % 4 AS INT) - 1)) AS f) fs
          WHERE doc_id % 3 = 2) base,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + base.doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + base.doc_id % 7 AS INT) - 1)) AS y) ys
        GROUP BY 1, 2, 3, 4""")),

    // ----- REAL compressed-video decode (MJPEG-in-AVI) --------------------
    // The first compressed video container: '00dc' chunks each carry a
    // complete baseline JFIF stream, decoded frame-by-frame through the
    // shared JpegCodec inside the AviCodec chunk walk — real RIFF
    // container, real JPEG entropy coding, zero new codec work (the
    // round-11 verdict's MJPEG route). Frame f carries the
    // coefficient-space JPEG fixture content of id + 154*f (lcm(14,11),
    // so dims stay constant across the stream), making the lossy
    // round-trip pixel-exactly predictable: the oracle is the
    // mm_decode_jpeg closed-form formula with the per-frame id shift.
    Q("mm_video_frames_mjpeg",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        spreadIds(ids).mapPartitions { it =>
          it.flatMap { id =>
            val bytes = AviCodec.encodeMjpeg(id)
            val vid = sniffKind(bytes) match {
              case "avi" => AviCodec.decode(bytes)
              case k => throw new IllegalStateException(
                s"sniffer classified an MJPEG AVI blob as $k")
            }
            vid.frames.zipWithIndex.map { case (img, f) =>
              (id, f, img.w, img.h, weightedPxSum(img))
            }
          }
        }.toDF("media_id", "frame_idx", "w", "h", "px_sum")
      },
      Some("""WITH base AS (
          SELECT doc_id, f, doc_id + 154 * f AS fid,
            CAST(21 + doc_id % 14 AS INT) AS w,
            CAST(13 + doc_id % 11 AS INT) AS h
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(3 + doc_id % 4 AS INT) - 1)) AS f) fs
          WHERE doc_id % 3 = 1),
        px AS (
          SELECT doc_id, f, w, h,
            64 + (fid*7 + (x//8)*31 + (y//8)*17) % 128
              + ((fid + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((fid*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((fid*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (fid*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (fid*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM base,
            LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id, f, w, h,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px)
        SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, w, h,
          CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
        FROM rgb GROUP BY 1, 2, 3, 4""")),

    // ----- ViT-style patch extraction --------------------------------------
    // The vision-training preprocessing step: split each decoded image
    // into the top-left grid of 8x8 patches (edge remainders dropped —
    // the crop-to-grid convention) and emit one row per patch with its
    // integer-exact weighted pixel sum — the (patch, embedding-input)
    // granularity a ViT data loader feeds. Scale shape: narrow per-row
    // decode + a bounded flatMap (patch count is dims/64), no shuffle
    // at all until a downstream consumer aggregates.
    Q("mm_patchify",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.flatMap { id =>
            val img = BmpCodec.decode(BmpCodec.encode(id))
            val pw = img.w / 8
            val ph = img.h / 8
            for (py <- 0 until ph; px <- 0 until pw) yield {
              var acc = 0L
              var y = py * 8
              while (y < py * 8 + 8) {
                var x = px * 8
                while (x < px * 8 + 8) {
                  acc += img.r(x, y) + 2L * img.g(x, y) + 3L * img.b(x, y)
                  x += 1
                }
                y += 1
              }
              (id, px, py, acc)
            }
          }
        }.toDF("media_id", "px", "py", "patch_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(px AS INT) AS px, CAST(py AS INT) AS py,
          CAST(SUM((doc_id*7 + (px*8 + i)*3 + (py*8 + j)*5) % 256
             + 2 * ((doc_id + (px*8 + i)*11 + (py*8 + j)*2) % 256)
             + 3 * ((doc_id*13 + (px*8 + i) * (py*8 + j)) % 256))
            AS BIGINT) AS patch_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) // 8 - 1)) AS px) pxs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) // 8 - 1)) AS py) pys,
          LATERAL (SELECT unnest(generate_series(0, 7)) AS i) is_,
          LATERAL (SELECT unnest(generate_series(0, 7)) AS j) js
        GROUP BY 1, 2, 3""")),

    // ----- audio resample (integer-factor decimation) ----------------------
    // Sample-rate normalization, the audio-training-prep twin of image
    // resize: decimate by 2 with pair averaging (anti-alias box
    // filter), TRUNCATING division on BOTH engines (JVM int `/` and
    // DuckDB `//` both round toward zero on negatives — the `//`↔`DIV`
    // determinism idiom; an arithmetic shift would floor instead and
    // diverge on odd negative sums). Odd trailing samples drop, the
    // crop-to-grid convention again.
    Q("mm_audio_resample",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val a = WavCodec.decode(WavCodec.encode(id))
            val nOut = a.samples.length / 2
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < nOut) {
              val v = (a.samples(2 * i) + a.samples(2 * i + 1)) / 2
              val ab = math.abs(v)
              if (ab > peak) peak = ab
              sumAbs += ab
              i += 1
            }
            (id, a.sampleRate, a.sampleRate / 2, a.samples.length, nOut,
              peak, sumAbs)
          }
        }.toDF("media_id", "rate_in", "rate_out", "n_in", "n_out",
          "peak_out", "sum_abs_out")
      },
      Some("""WITH pairs AS (
          SELECT doc_id,
            ((((doc_id * 31 + (2*k) * (2*k) * 7) % 65536) - 32768)
             + (((doc_id * 31 + (2*k+1) * (2*k+1) * 7) % 65536) - 32768))
            // 2 AS v
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(200 + doc_id % 57 AS INT) // 2 - 1)) AS k) ks
          WHERE doc_id % 3 = 1)
        SELECT doc_id AS media_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate_in,
          CAST((8000 + (doc_id % 3) * 4000) // 2 AS INT) AS rate_out,
          CAST(200 + doc_id % 57 AS INT) AS n_in,
          CAST(COUNT(*) AS INT) AS n_out,
          CAST(MAX(ABS(v)) AS INT) AS peak_out,
          CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs_out
        FROM pairs GROUP BY 1, 2, 3, 4""")),

    // ----- EXIF metadata extraction (TIFF-in-APP1) -------------------------
    // The metadata sidecar of real crawl JPEGs: camera make and — the
    // curation-critical part — GPS coordinates in a nested GPS IFD.
    // The fixture splices a real APP1/TIFF structure into the JPEG
    // stream, alternating II/MM byte order so the parser's endianness
    // handling is exercised, with GPS present on one third of images.
    // The parser is a generic bounds-safe IFD walk (segment scan →
    // TIFF header → IFD0 → GPS sub-IFD pointer → ASCII + RATIONAL
    // values); rationals surface as integer (deg, min, sec-milli)
    // components — no float division crosses engines.
    Q("mm_exif_extract",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val ex = ExifCodec.parse(ExifCodec.encodeWithExif(id))
              .getOrElse(throw new IllegalStateException(
                s"EXIF parse failed for $id"))
            val g = ex.gps
            (id, ex.byteOrder, ex.make, g.isDefined,
              g.map(_.latRef).orNull, g.map(_.latDeg), g.map(_.latMin),
              g.map(_.latSecMilli),
              g.map(_.lonRef).orNull, g.map(_.lonDeg), g.map(_.lonMin),
              g.map(_.lonSecMilli))
          }
        }.toDF("media_id", "byte_order", "make", "has_gps",
          "lat_ref", "lat_deg", "lat_min", "lat_sec_milli",
          "lon_ref", "lon_deg", "lon_min", "lon_sec_milli")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
          'cam' || CAST(doc_id % 10 AS VARCHAR) AS make,
          doc_id % 3 = 0 AS has_gps,
          CASE WHEN doc_id % 3 = 0 THEN
            CASE WHEN doc_id % 2 = 0 THEN 'N' ELSE 'S' END END AS lat_ref,
          CASE WHEN doc_id % 3 = 0
            THEN CAST(doc_id % 90 AS INT) END AS lat_deg,
          CASE WHEN doc_id % 3 = 0
            THEN CAST(doc_id % 60 AS INT) END AS lat_min,
          CASE WHEN doc_id % 3 = 0
            THEN CAST((doc_id * 7) % 60000 AS BIGINT) END AS lat_sec_milli,
          CASE WHEN doc_id % 3 = 0 THEN
            CASE WHEN (doc_id // 2) % 2 = 0 THEN 'E' ELSE 'W' END
            END AS lon_ref,
          CASE WHEN doc_id % 3 = 0
            THEN CAST(doc_id % 180 AS INT) END AS lon_deg,
          CASE WHEN doc_id % 3 = 0
            THEN CAST((doc_id * 3) % 60 AS INT) END AS lon_min,
          CASE WHEN doc_id % 3 = 0
            THEN CAST((doc_id * 11) % 60000 AS BIGINT) END AS lon_sec_milli
        FROM documents""")),

    // ----- EXIF scrub (GPS-PII removal) ------------------------------------
    // The curation intervention the extractor exists to justify:
    // training images must ship with location metadata REMOVED but the
    // image stream untouched. scrub() drops every Exif APP1 segment
    // verbatim-copying everything else; the query proves BOTH halves —
    // the scrubbed blob parses as EXIF-free AND still decodes to the
    // exact closed-form pixels (a scrubber that disturbed the entropy
    // stream would break the px_sum hash).
    Q("mm_exif_scrub",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val withExif = ExifCodec.encodeWithExif(id)
            if (ExifCodec.parse(withExif).isEmpty)
              throw new IllegalStateException(s"fixture lost EXIF for $id")
            val clean = ExifCodec.scrub(withExif)
            val img = JpegCodec.decode(clean)
            (id, ExifCodec.parse(clean).isEmpty, img.w, img.h,
              weightedPxSum(img))
          }
        }.toDF("media_id", "exif_removed", "w", "h", "px_sum")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px)
        SELECT doc_id AS media_id, TRUE AS exif_removed,
          CAST(21 + doc_id % 14 AS INT) AS w,
          CAST(13 + doc_id % 11 AS INT) AS h,
          CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
        FROM rgb GROUP BY 1, 2, 3, 4""")),

    // ----- PNG tEXt metadata extraction + strip -----------------------------
    // The PNG side of the metadata-scrub family (EXIF covers JPEG):
    // authoring tools leave Author/Software/location strings in tEXt
    // chunks; extraction surfaces them, and the strip drops the whole
    // textual family while copying every other chunk — framing, data,
    // CRC — byte-identically, so the image stream is untouched.
    Q("mm_png_text_extract",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val kv = PngCodec.textChunks(PngCodec.encodeWithText(id)).toMap
            (id, kv("Author"), kv("Software"), kv("Description"),
              kv.get("Location").orNull)
          }
        }.toDF("media_id", "author", "software", "description", "location")
      },
      Some("""SELECT doc_id AS media_id,
          'author' || CAST(doc_id % 10 AS VARCHAR) AS author,
          'graftcam ' || CAST(doc_id % 5 AS VARCHAR) || '.'
            || CAST(doc_id % 10 AS VARCHAR) AS software,
          'synthetic fixture image number ' || CAST(doc_id AS VARCHAR)
            || ', deflate-compressed metadata' AS description,
          CASE WHEN doc_id % 3 = 0 THEN
            'geo:' || CAST(doc_id % 90 AS VARCHAR) || ','
              || CAST(doc_id % 180 AS VARCHAR) END AS location
        FROM documents""")),

    Q("mm_png_text_strip",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val withText = PngCodec.encodeWithText(id)
            if (PngCodec.textChunks(withText).isEmpty)
              throw new IllegalStateException(s"fixture lost tEXt for $id")
            val clean = PngCodec.stripText(withText)
            val img = PngCodec.decode(clean)
            (id, PngCodec.textChunks(clean).isEmpty, img.w, img.h,
              weightedPxSum(img))
          }
        }.toDF("media_id", "text_removed", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id, TRUE AS text_removed,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        GROUP BY 1, 2, 3, 4""")),

    // ----- WebDataset-style tar-shard round-trip ---------------------------
    // THE multimodal training-data layout: samples packed as
    // consecutive tar entries sharing a key stem ("<id>.jpg" +
    // "<id>.txt"), ~fixed-count shards, sequential-read friendly.
    // Each shard of 16 docs is PACKED through the ustar writer
    // (real JPEG bytes + UTF-8 caption), then UNPACKED by the
    // independent tar parser, samples regrouped by stem, images
    // JPEG-decoded and captions digested — so the row only matches if
    // the container, the naming convention, and the payload bytes all
    // round-trip. Scale shape: ONE shuffle on the shard key (exactly
    // how a WebDataset export distributes), then narrow per-shard
    // pack/unpack work; shard size is the knob that bounds task memory.
    Q("mm_wds_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .groupByKey(_._1 / 16)
          .flatMapGroups { (shard, it) =>
            val docs = it.toSeq.sortBy(_._1)
            val entries = docs.flatMap { case (id, text) =>
              Seq((s"$id.jpg", JpegCodec.encode(id)),
                (s"$id.txt", text.getBytes("UTF-8")))
            }
            val back = TarCodec.decode(TarCodec.encode(entries))
            back.groupBy(_._1.takeWhile(_ != '.')).toSeq.map {
              case (stem, es) =>
                val id = stem.toLong
                val jpg = es.find(_._1.endsWith(".jpg")).get._2
                val txt = es.find(_._1.endsWith(".txt")).get._2
                val img = JpegCodec.decode(jpg)
                val md5hex = java.security.MessageDigest
                  .getInstance("MD5").digest(txt)
                  .map(b => f"${b & 0xFF}%02x").mkString
                (id, shard, img.w, img.h, weightedPxSum(img), md5hex)
            }.iterator
          }
          .toDF("media_id", "shard", "w", "h", "px_sum", "caption_md5")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px),
        img AS (
          SELECT doc_id,
            CAST(21 + doc_id % 14 AS INT) AS w,
            CAST(13 + doc_id % 11 AS INT) AS h,
            CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
          FROM rgb GROUP BY 1, 2, 3)
        SELECT d.doc_id AS media_id,
          CAST(d.doc_id // 16 AS BIGINT) AS shard,
          img.w, img.h, img.px_sum,
          md5(d.text) AS caption_md5
        FROM documents d JOIN img ON img.doc_id = d.doc_id""")),

    // ----- WebDataset export -> import through the DSv2 wds format --------
    // The round-trip THROUGH REAL FILES and the registered source/sink
    // (mm_wds_roundtrip proves the codec in-map; this proves the I/O
    // path): documents export as (key, jpg, txt) rows via
    // write.format("wds") — one streamed tar shard per task, atomic
    // rename commit — then import via read.format("wds") as
    // (shard, key, ext, data) entry rows, regroup by key, decode, and
    // digest. The oracle knows only the pixel formulas + md5(text), so
    // the row matches only if the sink's naming/framing and the
    // source's checksum-verified walk both round-trip every byte.
    // Scale shape: export = ONE shuffle (the repartition that sets
    // shard count/size); import = whole-shard parallel scan; regroup =
    // ONE shuffle on key.
    Q("mm_wds_export_import",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_wds_export_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
        // repartition BEFORE the JPEG-encode map (round 17): the shard
        // count is unchanged (8), but the shuffle now carries the raw
        // (doc_id, text) rows instead of encoded JPEGs — fewer bytes
        // through the exchange (guide §2.3) — and the encode runs on 8
        // tasks instead of serializing on the single-file scan partition
        Tables.documents(s, d).select($"doc_id", $"text")
          .repartition(8)
          .as[(Long, String)]
          .map { case (id, text) =>
            (id.toString, JpegCodec.encode(id), text.getBytes("UTF-8"))
          }
          .toDF("key", "jpg", "txt")
          .write.format("wds").mode("append").save(outDir)
        // explicit key repartition (not bare groupBy): the decode map
        // below is CPU-amplifying, and AQE's byte-targeted coalescing
        // would shrink this small shuffle to one partition and serialize
        // the JPEG decode; a user repartition pins the parallelism and
        // the groupBy reuses its partitioning (no extra exchange).
        // Scale-aware count: never below the scan's own parallelism.
        val back = s.read.format("wds").load(outDir)
        back
          .repartition(math.max(s.sparkContext.defaultParallelism,
            back.rdd.getNumPartitions), $"key")
          .groupBy($"key")
          .agg(max(when($"ext" === "jpg", $"data")).as("jpg"),
            max(when($"ext" === "txt", $"data")).as("txt"))
          .as[(String, Array[Byte], Array[Byte])]
          .map { case (key, jpg, txt) =>
            val img = JpegCodec.decode(jpg)
            val md5hex = java.security.MessageDigest.getInstance("MD5")
              .digest(txt).map(b => f"${b & 0xFF}%02x").mkString
            (key.toLong, img.w, img.h, weightedPxSum(img), md5hex)
          }
          .toDF("media_id", "w", "h", "px_sum", "caption_md5")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px),
        img AS (
          SELECT doc_id,
            CAST(21 + doc_id % 14 AS INT) AS w,
            CAST(13 + doc_id % 11 AS INT) AS h,
            CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
          FROM rgb GROUP BY 1, 2, 3)
        SELECT d.doc_id AS media_id, img.w, img.h, img.px_sum,
          md5(d.text) AS caption_md5
        FROM documents d JOIN img ON img.doc_id = d.doc_id""")),

    // ----- WebDataset compressed-shard round-trip --------------------------
    // Real lakes gzip their shards; the codec seam must be byte-exact,
    // not just "reads without error". Documents export through the wds
    // sink as plain tars, every shard is then gzip-compressed (and the
    // original removed), and the import runs through the streaming tar
    // walk's decompress-and-read path. Same pixel-formula + md5 oracle
    // as the plain round-trip: the row matches only if decompression
    // hands the walk the identical byte stream. Scale shape: identical
    // to mm_wds_export_import — codec wrapping is per-task streaming.
    Q("mm_wds_codec_roundtrip",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_wds_gz_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
        Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            (id.toString, JpegCodec.encode(id), text.getBytes("UTF-8"))
          }
          .toDF("key", "jpg", "txt")
          .repartition(8)
          .write.format("wds").mode("append").save(outDir)
        // gzip every shard in place (driver-side: 8 small fixture
        // shards; a production lake compresses at export time)
        fs.listStatus(new org.apache.hadoop.fs.Path(outDir)).foreach { st =>
          if (st.isFile && st.getPath.getName.endsWith(".tar")) {
            val in = fs.open(st.getPath)
            val gzPath = new org.apache.hadoop.fs.Path(
              outDir, st.getPath.getName + ".gz")
            val gz = new java.util.zip.GZIPOutputStream(
              fs.create(gzPath, true))
            val buf = new Array[Byte](1 << 16)
            var r = in.read(buf)
            while (r > 0) { gz.write(buf, 0, r); r = in.read(buf) }
            in.close(); gz.close()
            fs.delete(st.getPath, false)
          }
        }
        s.read.format("wds").load(outDir)
          .groupBy($"key")
          .agg(max(when($"ext" === "jpg", $"data")).as("jpg"),
            max(when($"ext" === "txt", $"data")).as("txt"))
          .as[(String, Array[Byte], Array[Byte])]
          .map { case (key, jpg, txt) =>
            val img = JpegCodec.decode(jpg)
            val md5hex = java.security.MessageDigest.getInstance("MD5")
              .digest(txt).map(b => f"${b & 0xFF}%02x").mkString
            (key.toLong, img.w, img.h, weightedPxSum(img), md5hex)
          }
          .toDF("media_id", "w", "h", "px_sum", "caption_md5")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px),
        img AS (
          SELECT doc_id,
            CAST(21 + doc_id % 14 AS INT) AS w,
            CAST(13 + doc_id % 11 AS INT) AS h,
            CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
          FROM rgb GROUP BY 1, 2, 3)
        SELECT d.doc_id AS media_id, img.w, img.h, img.px_sum,
          md5(d.text) AS caption_md5
        FROM documents d JOIN img ON img.doc_id = d.doc_id""")),

    // ----- WebDataset filtered caption scan (entry-filter pushdown) -------
    // The curation read pattern: pull ONLY the text modality out of an
    // image+caption lake. The ext='txt' predicate pushes into the tar
    // walk, so every jpg payload is seek-skipped, never allocated —
    // the query reads ~1% of the lake's bytes. The oracle re-derives
    // the captions from documents, so the row matches only if the
    // filtered walk returns exactly the txt entries byte-identically
    // (WdsSourceSpec additionally seam-counts the skipped jpg bytes
    // and pins pushdown-disabled parity).
    Q("mm_wds_caption_scan",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_wds_cap_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
        Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            (id.toString, JpegCodec.encode(id), text.getBytes("UTF-8"))
          }
          .toDF("key", "jpg", "txt")
          .repartition(6)
          .write.format("wds").mode("append").save(outDir)
        s.read.format("wds").load(outDir)
          .filter($"ext" === "txt")
          .select($"key".cast("long").as("media_id"),
            md5($"data").as("caption_md5"))
      },
      Some("SELECT doc_id AS media_id, md5(text) AS caption_md5 " +
        "FROM documents")),

    // ----- WebDataset .json sample metadata --------------------------------
    // The near-universal WebDataset convention: every sample carries a
    // `.json` member with its metadata next to its media members. One
    // SCAN reads both, the key groupBy reunites each sample (the
    // first-dot stem contract), and from_json projects the typed
    // fields beside the media digest — the query every wds lake user
    // writes on day one. The oracle re-derives lang/score/md5 from
    // documents, so the row matches only if the .json member
    // round-trips byte-exactly AND regroups with the right caption.
    // Scale: ONE whole-shard scan + ONE key shuffle; json parsing is
    // per-row projection.
    Q("mm_wds_meta_join",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_wds_meta_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
        Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            val lang = Seq("en", "de", "fr")((id % 3).toInt)
            val json =
              s"""{"doc_id":$id,"lang":"$lang","score":${id % 7}}"""
            (id.toString, json.getBytes("UTF-8"), text.getBytes("UTF-8"))
          }
          .toDF("key", "json", "txt")
          .repartition(6)
          .write.format("wds").mode("append").save(outDir)
        val metaSchema = new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("lang", org.apache.spark.sql.types.StringType)
          .add("score", org.apache.spark.sql.types.LongType)
        s.read.format("wds").load(outDir)
          .groupBy($"key")
          .agg(max(when($"ext" === "json", $"data")).as("j"),
            max(when($"ext" === "txt", $"data")).as("t"))
          .select(from_json($"j".cast("string"), metaSchema).as("m"),
            md5($"t").as("caption_md5"))
          .select($"m.doc_id".as("doc_id"), $"m.lang".as("lang"),
            $"m.score".as("score"), $"caption_md5")
      },
      Some("""SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END
            AS lang,
          CAST(doc_id % 7 AS BIGINT) AS score,
          md5(text) AS caption_md5
        FROM documents""")),

    // ----- WebDataset metadata-only count (the .widx sidecar path) --------
    // The lake-triage query: how many entries landed? The sink writes a
    // `_<shard>.widx` sidecar per shard at task commit, and COUNT(*)
    // folds the sidecars from the listing alone — a WdsStatsScan that
    // never opens a shard (plan pinned in WdsSourceSpec + PlanLintSpec;
    // the oracle pins the VALUE, so a sidecar counting bug cannot hide
    // behind the fast path). One doc exports as 2 entries (jpg + txt).
    Q("mm_wds_count_meta",
      (s, d) => {
        import s.implicits._
        val outDir = "/tmp/graft_wds_cnt_" +
          java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
        Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            (id.toString, JpegCodec.encode(id), text.getBytes("UTF-8"))
          }
          .toDF("key", "jpg", "txt")
          .repartition(6)
          .write.format("wds").mode("append").save(outDir)
        val counted = s.read.format("wds").load(outDir).groupBy().count()
        // the whole point is the metadata path: fail loudly if the
        // plan fell back to a real walk (e.g. a shard lost its sidecar)
        require(counted.queryExecution.executedPlan.toString
          .contains("WdsStatsScan"), "expected the sidecar count scan")
        counted.select($"count".cast("long").as("n_entries"))
      },
      Some("SELECT CAST(COUNT(*) * 2 AS BIGINT) AS n_entries " +
        "FROM documents")),

    // ----- WebDataset STREAMING export -> batch import parity -------------
    // The continuous-curation landing path: the same (key, jpg, txt)
    // corpus as mm_wds_export_import, but exported by the STREAMING
    // `wds` sink — documents land as a parquet-backed file stream
    // (maxFilesPerTrigger=1, so the export spans several micro-batches),
    // each epoch commits its own atomically-renamed epoch-keyed shards,
    // and the batch `wds` scan imports the union. The oracle is the
    // same pixel-formula + md5 SQL as the batch export — the row
    // matches only if every micro-batch's shards landed exactly once
    // and byte-identically (the q24/pcap_corpus_stream_twin pattern
    // for the write side). Checkpoint-restart idempotence is pinned in
    // WdsSinkStreamSpec.
    Q("mm_wds_sink_stream_twin",
      (s, d) => {
        import s.implicits._
        val tag = java.lang.Long.toHexString(d.hashCode.toLong & 0xFFFFFFFFL)
        val stage = s"/tmp/graft_wds_sinkstream_stage_$tag"
        val outDir = s"/tmp/graft_wds_sinkstream_out_$tag"
        val ckpt = s"/tmp/graft_wds_sinkstream_ckpt_$tag"
        val fs = new org.apache.hadoop.fs.Path(outDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        Seq(stage, outDir, ckpt).foreach(p =>
          fs.delete(new org.apache.hadoop.fs.Path(p), true))
        val src = Tables.documents(s, d).select($"doc_id", $"text")
          .as[(Long, String)]
          .map { case (id, text) =>
            (id.toString, JpegCodec.encode(id), text.getBytes("UTF-8"))
          }
          .toDF("key", "jpg", "txt")
        src.repartition(4).write.parquet(stage)
        // maxFilesPerTrigger is a FILE-SOURCE option — it must sit on
        // the reader (on the writer it would go to the wds sink, which
        // ignores it, collapsing the export into one epoch and gutting
        // the multi-epoch property this twin exists to verify)
        val q = s.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage)
          .writeStream.format("wds")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        try q.processAllAvailable() finally q.stop()
        s.read.format("wds").load(outDir)
          .groupBy($"key")
          .agg(max(when($"ext" === "jpg", $"data")).as("jpg"),
            max(when($"ext" === "txt", $"data")).as("txt"))
          .as[(String, Array[Byte], Array[Byte])]
          .map { case (key, jpg, txt) =>
            val img = JpegCodec.decode(jpg)
            val md5hex = java.security.MessageDigest.getInstance("MD5")
              .digest(txt).map(b => f"${b & 0xFF}%02x").mkString
            (key.toLong, img.w, img.h, weightedPxSum(img), md5hex)
          }
          .toDF("media_id", "w", "h", "px_sum", "caption_md5")
      },
      Some("""WITH px AS (
          SELECT doc_id,
            64 + (doc_id*7 + (x//8)*31 + (y//8)*17) % 128
              + ((doc_id + (x//8)*5 + (y//8)*3) % 8)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*3 + (x//8) + (y//8)*7) % 8)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
              + ((doc_id*5 + (x//8)*7 + (y//8)) % 4)
                * (CASE WHEN (x%8) IN (0,3,4,7) THEN 1 ELSE -1 END)
                * (CASE WHEN (y%8) IN (0,3,4,7) THEN 1 ELSE -1 END) AS yv,
            (doc_id*11 + (x//16)*13 + (y//16)*19) % 256 AS cb,
            (doc_id*3 + (x//16)*7 + (y//16)*29) % 256 AS cr
          FROM documents,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(21 + doc_id % 14 AS INT) - 1)) AS x) xs,
            LATERAL (SELECT unnest(generate_series(0,
              CAST(13 + doc_id % 11 AS INT) - 1)) AS y) ys),
        rgb AS (
          SELECT doc_id,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.402E0 * (cr - 128) + 0.5E0) AS BIGINT))) AS r,
            LEAST(255, GREATEST(0, CAST(floor(
              yv - 0.344136E0 * (cb - 128) - 0.714136E0 * (cr - 128)
                + 0.5E0) AS BIGINT))) AS g,
            LEAST(255, GREATEST(0, CAST(floor(
              yv + 1.772E0 * (cb - 128) + 0.5E0) AS BIGINT))) AS b
          FROM px),
        img AS (
          SELECT doc_id,
            CAST(21 + doc_id % 14 AS INT) AS w,
            CAST(13 + doc_id % 11 AS INT) AS h,
            CAST(SUM(r + 2*g + 3*b) AS BIGINT) AS px_sum
          FROM rgb GROUP BY 1, 2, 3)
        SELECT d.doc_id AS media_id, img.w, img.h, img.px_sum,
          md5(d.text) AS caption_md5
        FROM documents d JOIN img ON img.doc_id = d.doc_id""")),

    // ----- mixed-container decode (format sniffing: BMP + PPM + TIFF) -----
    // A real lake holds a mix of encodings; the seam dispatches on the
    // magic bytes (sniffKind), not a format column. Images alternate
    // three ways — BMP, binary PPM, TIFF — and the oracle's expected
    // stats are container-INDEPENDENT (pure formula), so the row only
    // matches if all three parsers decode the same image from their
    // very different byte layouts (bottom-up padded BGR vs ASCII-header
    // raw RGB vs IFD-walked multi-strip, endianness flipping with id).
    Q("mm_decode_any",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val bytes = (id / 3) % 3 match {
              case 0 => BmpCodec.encode(id)
              case 1 => PpmCodec.encode(id)
              case _ => TiffCodec.encode(id)
            }
            val kind = sniffKind(bytes)
            val img = kind match {
              case "bmp" => BmpCodec.decode(bytes)
              case "ppm" => PpmCodec.decode(bytes)
              case "tiff" => TiffCodec.decode(bytes)
              case other =>
                throw new IllegalStateException(s"missniffed: $other")
            }
            (id, kind, img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "container", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CASE (doc_id // 3) % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
            ELSE 'tiff' END AS container,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 0
        GROUP BY 1, 2, 3, 4""")),

    // ----- TIFF decode (strips, both byte orders, PackBits) ---------------
    // The scanned-document-corpus container, in depth: every image is a
    // MULTI-strip baseline-RGB TIFF (RowsPerStrip 4 over h in 12..18,
    // so 3-5 strips each), byte order flipping with id parity (II/MM)
    // and compression alternating none/PackBits on a second parity,
    // decoded through the magic-byte seam. The oracle knows only the
    // pixel formula and the parity rules — the row matches only if the
    // IFD walk (inline vs out-of-line values, SHORT vs LONG types,
    // both endiannesses), the per-strip RLE, and the strip reassembly
    // are all right. Scale: narrow per-row decode, image bytes never
    // shuffle.
    Q("mm_decode_tiff",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val pb = (id / 2) % 2 == 0
            val bytes = TiffCodec.encode(id, packbits = pb)
            require(sniffKind(bytes) == "tiff", "missniffed TIFF")
            val img = TiffCodec.decode(bytes)
            (id, if (TiffCodec.littleEndian(id)) "II" else "MM",
              if (pb) "packbits" else "none",
              img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "byte_order", "compression", "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
          CASE WHEN (doc_id // 2) % 2 = 0 THEN 'packbits' ELSE 'none' END
            AS compression,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 2
        GROUP BY 1, 2, 3, 4, 5""")),

    // ----- TIFF LZW + Deflate decode ---------------------------------------
    // What scanned-document corpora OVERWHELMINGLY ship (tiffcp -c lzw
    // / -c zip): per-strip TIFF 6.0 §13 LZW — MSB-first codes,
    // Clear/EOI, the early-change width switch — and zlib Deflate,
    // alternating on id parity over multi-strip images in both byte
    // orders. The oracle knows only the pixel formula; a row matches
    // only if the bit-unpacking, the KwKwK case, the early-change
    // off-by-one, and strip reassembly are all exact (the codec spec
    // additionally cross-checks both against ImageIO pixel-for-pixel).
    // Scale: narrow per-row decode, image bytes never shuffle.
    Q("mm_decode_tiff_lzw",
      (s, d) => {
        import s.implicits._
        val imgs = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        imgs.mapPartitions { it =>
          it.map { id =>
            val lzw = (id / 2) % 2 == 0
            val pred2 = (id / 4) % 2 == 0
            val bytes = TiffCodec.encode(id, if (lzw) 5 else 8, pred2)
            require(sniffKind(bytes) == "tiff", "missniffed TIFF")
            val img = TiffCodec.decode(bytes)
            (id, if (TiffCodec.littleEndian(id)) "II" else "MM",
              if (lzw) "lzw" else "deflate",
              if (pred2) "horizontal" else "none",
              img.w, img.h, weightedPxSum(img))
          }
        }.toDF("media_id", "byte_order", "compression", "predictor",
          "w", "h", "px_sum")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
          CASE WHEN (doc_id // 2) % 2 = 0 THEN 'lzw' ELSE 'deflate' END
            AS compression,
          CASE WHEN (doc_id // 4) % 2 = 0 THEN 'horizontal' ELSE 'none' END
            AS predictor,
          CAST(16 + doc_id % 13 AS INT) AS w,
          CAST(12 + doc_id % 7 AS INT) AS h,
          CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256
             + 2 * ((doc_id + x * 11 + y * 2) % 256)
             + 3 * ((doc_id * 13 + x * y) % 256)) AS BIGINT) AS px_sum
        FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(16 + doc_id % 13 AS INT) - 1)) AS x) xs,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(12 + doc_id % 7 AS INT) - 1)) AS y) ys
        WHERE doc_id % 3 = 2
        GROUP BY 1, 2, 3, 4, 5, 6""")),

    // ----- MP4 / ISO-BMFF container metadata -------------------------------
    // The stats/QC walk for the container real video lakes actually
    // ship: header-only moov parse (box framing incl. 64-bit
    // largesize, mvhd duration, per-trak hdlr + stsd sample entries)
    // — dims, codec fourcc, duration, track count — NO frame decode.
    // The fixture cycles codecs (avc1/hvc1/mp4v), sample rates, and an
    // optional tx3g text track; the oracle knows only the closed-form
    // field formulas, so a row matches only if the box walk, the
    // 16.16 fixed-point fields, and the per-trak handler resolution
    // are all exact. Scale: per-row header walk, container bytes
    // never shuffle; bomb-guarded (box count/nesting/size caps).
    Q("mm_mp4_stats",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val bytes = Mp4Codec.encode(id)
            require(sniffKind(bytes) == "mp4", "missniffed MP4")
            val m = Mp4Codec.meta(bytes)
            (id, m.durationMs, m.tracks, m.vCodec, m.w, m.h,
              m.aCodec, m.aRate)
          }
        }.toDF("media_id", "duration_ms", "tracks", "v_codec",
          "w", "h", "a_codec", "a_rate")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(1000 + (doc_id % 900) * 10 AS BIGINT) AS duration_ms,
          CAST(CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 2 END AS INT) AS tracks,
          CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
            ELSE 'mp4v' END AS v_codec,
          CAST(320 + (doc_id % 5) * 16 AS INT) AS w,
          CAST(240 + (doc_id % 3) * 16 AS INT) AS h,
          'mp4a' AS a_codec,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 48000 ELSE 44100 END AS INT)
            AS a_rate
        FROM documents""")),

    // ----- MP4 sample tables (stts/stsz/stsc/stco/co64/stss) ---------------
    // The per-track QC real video lakes run off the sample tables:
    // sample counts (stts), byte totals and average bitrate (stsz —
    // BOTH branches: per-sample sizes on video, the uniform-size
    // shortcut on audio), chunk maps (single-entry stsc + stco on
    // video, 64-bit co64 on audio — the first offset sits above 4 GiB
    // to prove the wide path), and keyframe counts (stss). Consistency
    // is enforced (stts total == stsz count, chunks cover samples) and
    // fragmented MP4 (moof/mvex) rejects explicitly. The oracle
    // re-derives every population — including the per-sample byte sum
    // — from the closed-form formulas. Scale: per-row header walk, no
    // shuffle beyond the implicit projection.
    Q("mm_mp4_samples",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val m = Mp4Codec.sampleMeta(Mp4Codec.encode(id))
            val kbps = m.vBytes * 8 / Mp4Codec.durationMs(id)
            (id, m.vSamples, m.vBytes, kbps, m.vKeyframes, m.vChunks,
              m.aSamples, m.aBytes, m.aChunks, m.aFirstOffset)
          }
        }.toDF("media_id", "v_samples", "v_bytes", "v_kbps",
          "v_keyframes", "v_chunks", "a_samples", "a_bytes", "a_chunks",
          "a_first_offset")
      },
      Some("""WITH sizes AS (
          SELECT doc_id, CAST(SUM(400 + ((doc_id * 31 + k * 17) % 256))
            AS BIGINT) AS vbytes
          FROM documents,
          LATERAL (SELECT unnest(generate_series(0,
            CAST(24 + doc_id % 48 AS INT) - 1)) AS k) ks
          GROUP BY doc_id)
        SELECT d.doc_id AS media_id,
          CAST(24 + d.doc_id % 48 AS INT) AS v_samples,
          s.vbytes AS v_bytes,
          CAST(s.vbytes * 8 // (1000 + (d.doc_id % 900) * 10) AS BIGINT)
            AS v_kbps,
          CAST((24 + d.doc_id % 48 + 7) // 8 AS INT) AS v_keyframes,
          CAST((24 + d.doc_id % 48 + 4) // 5 AS INT) AS v_chunks,
          CAST(50 + d.doc_id % 100 AS INT) AS a_samples,
          CAST((200 + d.doc_id % 50) * (50 + d.doc_id % 100) AS BIGINT)
            AS a_bytes,
          CAST((50 + d.doc_id % 100 + 24) // 25 AS INT) AS a_chunks,
          CAST(4294967296 + 4096 AS BIGINT) AS a_first_offset
        FROM documents d JOIN sizes s ON d.doc_id = s.doc_id""")),

    // ----- MP4 edit lists (edts/elst) ----------------------------------------
    // The presentation-timing QC piece: real encoders open video
    // tracks with an EMPTY edit (media_time -1, the startup-delay
    // idiom), so effective presentation duration = lead + media —
    // a lake that reports mdhd media duration alone mis-lengths every
    // clip with a lead. Version-0 elst parse, per-trak commit against
    // the hdlr handler (edts precedes mdia in the box order), bomb
    // caps as everywhere. Scale: per-row header walk, no shuffle.
    Q("mm_mp4_edits",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val e = Mp4Codec.editList(Mp4Codec.encode(id))
            (id, e.entries, e.leadMs, e.presentationMs,
              Mp4Codec.durationMs(id))
          }
        }.toDF("media_id", "edit_entries", "lead_ms", "presentation_ms",
          "media_ms")
      },
      Some("""SELECT doc_id AS media_id,
          CAST(2 AS INT) AS edit_entries,
          CAST((doc_id % 7) * 100 AS BIGINT) AS lead_ms,
          CAST((doc_id % 7) * 100 + 1000 + (doc_id % 900) * 10
            AS BIGINT) AS presentation_ms,
          CAST(1000 + (doc_id % 900) * 10 AS BIGINT) AS media_ms
        FROM documents""")),

    // ----- fragmented MP4 (DASH/CMAF) sample stats --------------------------
    // Streaming-media lakes are mostly FRAGMENTED MP4: moov carries
    // only mvex/trex defaults, and the sample populations live in
    // per-fragment moof/traf/tfhd/trun boxes. sampleMeta rejects those
    // honestly (a non-fragment walk would silently undercount);
    // fragmentMeta walks the fragments for real — mfhd sequence
    // checked 1..n, video sizes from per-sample trun entries (flag
    // 0x200), audio sizes from the tfhd default (flag 0x10), so both
    // RFC size-resolution paths are on the wire. The oracle sums the
    // per-fragment trun populations INDEPENDENTLY (a nested series per
    // fragment/sample), so a fragment skipped or double-walked
    // mismatches. Scale: per-row header walk, no shuffle.
    Q("mm_mp4_fragments",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val m = Mp4Codec.fragmentMeta(Mp4Codec.encodeFragmented(id))
            (id, m.fragments, m.vSamples, m.vBytes, m.aSamples,
              m.aBytes)
          }
        }.toDF("media_id", "fragments", "v_samples", "v_bytes",
          "a_samples", "a_bytes")
      },
      Some("""WITH frags AS (
          SELECT doc_id, unnest(generate_series(0,
            CAST(3 + doc_id % 4 AS INT) - 1)) AS f
          FROM documents),
        v AS (
          SELECT doc_id, f, CAST(8 + (doc_id + f) % 5 AS INT) AS vc
          FROM frags),
        vbytes AS (
          SELECT doc_id, SUM(400 + (doc_id * 7 + f * 13 + k * 17) % 200)
            AS vb, COUNT(*) AS vs
          FROM v, LATERAL (SELECT unnest(generate_series(0, vc - 1)) AS k)
          GROUP BY doc_id),
        abytes AS (
          SELECT doc_id, SUM(20 + (doc_id + f) % 7) AS asamp,
            SUM((20 + (doc_id + f) % 7) * (200 + doc_id % 50)) AS ab,
            COUNT(*) AS nf
          FROM frags GROUP BY doc_id)
        SELECT d.doc_id AS media_id,
          CAST(a.nf AS INT) AS fragments,
          CAST(v.vs AS INT) AS v_samples,
          CAST(v.vb AS BIGINT) AS v_bytes,
          CAST(a.asamp AS INT) AS a_samples,
          CAST(a.ab AS BIGINT) AS a_bytes
        FROM documents d
          JOIN vbytes v ON v.doc_id = d.doc_id
          JOIN abytes a ON a.doc_id = d.doc_id""")),

    // ----- REAL FLAC decode (the speech-corpus container) ------------------
    // LibriSpeech et al. ship FLAC, not WAV: a real lossless codec —
    // frame sync + CRC-8/CRC-16 verification, UTF-8-coded frame
    // numbers, FIXED predictors (orders 0-4, per-frame best) on even
    // ids and genuine quantized-coefficient LPC subframes on odd ids,
    // Rice-coded residuals, multi-frame streams (blocksize 64 over
    // 200-256 samples -> 4-5 frames incl. a partial tail), and the
    // STREAMINFO MD5 of the decoded PCM verified end-to-end. Same
    // closed-form sample formula as the WAV family, so the oracle is
    // identical arithmetic — the row matches only if every predictor,
    // Rice quotient, and frame boundary reconstructs the PCM exactly.
    // Scale: per-row decode, audio bytes never shuffle.
    Q("mm_decode_flac",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 0)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val audio = FlacCodec.decode(FlacCodec.encode(id))
            val pcm = audio.mono
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < pcm.length) {
              val a = math.abs(pcm(i))
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            (id, if (id % 2 == 0) "fixed" else "lpc",
              audio.sampleRate, pcm.length, peak, sumAbs)
          }
        }.toDF("media_id", "predictor", "sample_rate", "n_samples",
          "peak", "sum_abs")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'fixed' ELSE 'lpc' END AS predictor,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(200 + doc_id % 57 AS INT) AS n_samples,
          CAST(list_max([abs(((doc_id * 31 + i * i * 7) % 65536) - 32768)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS INT) AS peak,
          CAST(list_sum([abs(((doc_id * 31 + i * i * 7) % 65536) - 32768)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS BIGINT) AS sum_abs
        FROM documents WHERE doc_id % 3 = 0""")),

    // ----- stereo FLAC decode (mid/side + independent, one oracle) ---------
    // The libFLAC stereo reality: the encoder chooses mid/side
    // decorrelation or independent channels PER FRAME by residual
    // cost, and the fixture forces both — even ids carry an
    // uncorrelated right channel (independent wins), odd ids a
    // near-left right channel (mid/side wins, 17-bit side) — so one
    // oracle gates both wire forms and the exact reconstruction.
    // Scale: per-row decode, audio bytes never shuffle.
    Q("mm_decode_flac_stereo",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val n = FlacCodec.nSamples(id)
            val left = Array.tabulate(n)(i => FlacCodec.sample(id, i))
            val right = Array.tabulate(n)(i => FlacCodec.rightSample(id, i))
            val audio = FlacCodec.decode(
              FlacCodec.encodePcmStereo(left, right, FlacCodec.rate(id)))
            require(audio.channels == 2, "stereo decode lost a channel")
            def stats(ch: Array[Int]): (Int, Long) = {
              var peak = 0
              var sum = 0L
              var i = 0
              while (i < ch.length) {
                val a = math.abs(ch(i))
                if (a > peak) peak = a
                sum += a
                i += 1
              }
              (peak, sum)
            }
            val (pl, sl) = stats(audio.samples(0))
            val (pr, sr) = stats(audio.samples(1))
            (id, audio.sampleRate, audio.samples(0).length,
              pl, sl, pr, sr)
          }
        }.toDF("media_id", "sample_rate", "n_samples",
          "peak_l", "sum_abs_l", "peak_r", "sum_abs_r")
      },
      Some("""WITH base AS (
          SELECT doc_id, CAST(200 + doc_id % 57 AS INT) AS n
          FROM documents WHERE doc_id % 3 = 1),
        chans AS (
          SELECT doc_id, n,
            abs(((doc_id * 31 + i * i * 7) % 65536) - 32768) AS al,
            abs(CASE WHEN doc_id % 2 = 0 THEN
                ((doc_id * 47 + i * i * 11) % 65536) - 32768
              ELSE
                ((((doc_id * 31 + i * i * 7) % 65536) - 32768
                  + ((i * 13 + doc_id) % 31) - 15 + 98304) % 65536) - 32768
              END) AS ar
          FROM base, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i))
        SELECT doc_id AS media_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(MAX(n) AS INT) AS n_samples,
          CAST(MAX(al) AS INT) AS peak_l,
          CAST(SUM(al) AS BIGINT) AS sum_abs_l,
          CAST(MAX(ar) AS INT) AS peak_r,
          CAST(SUM(ar) AS BIGINT) AS sum_abs_r
        FROM chans GROUP BY doc_id""")),

    // ----- 24-bit FLAC decode (hi-res speech/music corpora) ----------------
    // 24-bit is the dominant hi-res delivery form; a 16-bit-only
    // decoder rejects most studio/music lakes outright. The fixture
    // spans the full ±2^23 range so the 24-bit warmup sample widths,
    // Rice residuals on large deltas, and the 3-bytes-per-sample
    // STREAMINFO MD5 walk are all genuinely exercised end-to-end
    // (fixed predictors on even ids, quantized-coefficient LPC on
    // odd). Scale: per-row decode, audio bytes never shuffle.
    Q("mm_decode_flac_24",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 2)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val n = FlacCodec.nSamples(id)
            val pcm = Array.tabulate(n)(i => FlacCodec.sample24(id, i))
            val audio = FlacCodec.decode(FlacCodec.encodePcm(
              pcm, FlacCodec.rate(id), useLpc = id % 2 == 1, bps = 24))
            val out = audio.mono
            var peak = 0
            var sumAbs = 0L
            var i = 0
            while (i < out.length) {
              val a = math.abs(out(i))
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            (id, if (id % 2 == 0) "fixed" else "lpc",
              audio.sampleRate, out.length, peak, sumAbs)
          }
        }.toDF("media_id", "predictor", "sample_rate", "n_samples",
          "peak", "sum_abs")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'fixed' ELSE 'lpc' END AS predictor,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(200 + doc_id % 57 AS INT) AS n_samples,
          CAST(list_max([abs(((doc_id * 131 + i * i * 17) % 16777216) - 8388608)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS INT) AS peak,
          CAST(list_sum([abs(((doc_id * 131 + i * i * 17) % 16777216) - 8388608)
               FOR i IN generate_series(0, CAST(200 + doc_id % 57 AS INT) - 1)])
               AS BIGINT) AS sum_abs
        FROM documents WHERE doc_id % 3 = 2""")),

    // ----- ZIP dataset ingestion (central-directory census + extract) ------
    // Public datasets ship as ZIP (Kaggle exports, image bundles); the
    // `zip` DSv2 source plans per-entry slices from the central
    // directory, so one 50 GB archive fans out across executors and a
    // name/size census reads ZERO entry bytes (ZipSourceSpec pins the
    // counter; the fixture is written by the JDK's own ZipOutputStream
    // — streaming local headers + data descriptors, the layout that
    // breaks local-header-trusting readers). Census: column pruning
    // drops `data`, the scan never opens a local header.
    Q("mm_zip_census",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.zip.ZipSynth
          .ensureFixture("/tmp/graft_zip_fixture")
        s.read.format("zip").load(dir)
          .groupBy($"archive")
          .agg(count(lit(1)).as("n_entries"),
            sum($"size").as("total_bytes"),
            sum(when($"method" === "store", 1L).otherwise(0L))
              .as("n_stored"))
      },
      Some("""WITH a AS (SELECT unnest(generate_series(0, 11)) AS i),
          e AS (SELECT i, unnest(generate_series(0, 4 + i % 5)) AS j FROM a)
        SELECT 'ds-' || lpad(CAST(i AS VARCHAR), 3, '0') || '.zip' AS archive,
          CAST(COUNT(*) AS BIGINT) AS n_entries,
          CAST(SUM(length('zip ' || i || ' entry ' || j || ' ')
            * (1 + (i * 7 + j) % 5)) AS BIGINT) AS total_bytes,
          CAST(SUM(CASE WHEN (i + j) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_stored
        FROM e GROUP BY 1""")),

    // Extraction: every entry decompressed (stored + deflate mix) with
    // CRC-32 and size verified against the central directory — a
    // corrupt entry fails the task instead of feeding silent garbage
    // to training. The md5 parity below holds only if the CD offsets,
    // the local-header skip, and the inflate all land byte-exactly.
    Q("mm_zip_extract",
      (s, _) => {
        import s.implicits._
        val dir = graft.sources.zip.ZipSynth
          .ensureFixture("/tmp/graft_zip_fixture")
        s.read.format("zip").load(dir)
          .select($"archive", $"entry", md5($"data").as("body_md5"))
      },
      Some("""WITH a AS (SELECT unnest(generate_series(0, 11)) AS i),
          e AS (SELECT i, unnest(generate_series(0, 4 + i % 5)) AS j FROM a)
        SELECT 'ds-' || lpad(CAST(i AS VARCHAR), 3, '0') || '.zip' AS archive,
          'docs/e' || lpad(CAST(j AS VARCHAR), 3, '0') || '.txt' AS entry,
          md5(repeat('zip ' || i || ' entry ' || j || ' ',
            CAST(1 + (i * 7 + j) % 5 AS INT))) AS body_md5
        FROM e""")),

    // ----- MP3 stream walk (the web/podcast audio census) ------------------
    // MP3 is what crawled and podcast audio actually ships as; the
    // curation questions (duration, rate, CBR/VBR, tag presence, frame
    // integrity) need only the frame HEADERS — Mp3Codec.walk verifies
    // every frame's sync/consistency, skips ID3v2 by its syncsafe size,
    // detects the Xing/Info tag frame at its version×mode-dependent
    // offset (excluded from the audio count, as players do), and stops
    // at the ID3v1 trailer. The walk also cross-checks the encoder's
    // Xing frame count against its own — a mismatch is a truncated or
    // spliced file and rejects. Scale: per-row walk over header bytes
    // only, audio payloads never shuffle, no decode.
    Q("mm_mp3_stats",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val info = Mp3Codec.walk(Mp3Codec.encode(id))
            require(info != null, s"mp3 walk rejected its own fixture: $id")
            require(info.xingFrames == info.nFrames,
              s"Xing count ${info.xingFrames} != walked ${info.nFrames}")
            (id, info.versionName, info.sampleRate, info.channels,
              info.nFrames, info.durationMs, info.vbr, info.avgKbps,
              info.hasId3v2, Option(info.id3Title), info.hasId3v1)
          }
        }.toDF("media_id", "mpeg_version", "sample_rate", "channels",
          "n_frames", "duration_ms", "vbr", "avg_kbps", "has_id3v2",
          "id3_title", "has_id3v1")
      },
      Some("""SELECT doc_id AS media_id,
          CASE doc_id % 3 WHEN 0 THEN 'MPEG1' WHEN 1 THEN 'MPEG2'
            ELSE 'MPEG2.5' END AS mpeg_version,
          CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 24000
            ELSE 8000 END AS INT) AS sample_rate,
          CAST(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 2 END AS INT) AS channels,
          CAST(6 + doc_id % 5 AS INT) AS n_frames,
          CAST(((6 + doc_id % 5) *
              (CASE WHEN doc_id % 3 = 0 THEN 1152 ELSE 576 END) * 1000)
            // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 24000
               ELSE 8000 END) AS BIGINT) AS duration_ms,
          doc_id % 3 = 0 AS vbr,
          CAST(list_sum([CASE WHEN doc_id % 3 = 0
                THEN ([128,160,192,224])[CAST((doc_id + j) % 4 AS INT) + 1]
                ELSE ([80,96,112,128])[CAST(doc_id % 4 AS INT) + 1] END
              FOR j IN generate_series(0, CAST(6 + doc_id % 5 AS INT) - 1)])
            // (6 + doc_id % 5) AS INT) AS avg_kbps,
          doc_id % 2 = 0 AS has_id3v2,
          CASE WHEN doc_id % 2 = 0 THEN 'track' || doc_id
            ELSE NULL END AS id3_title,
          doc_id % 4 = 1 AS has_id3v1
        FROM documents""")),

    // ----- Ogg/Opus container walk (the voice/WebRTC audio census) ---------
    // Opus-in-Ogg is what crawled voice audio ships as (WebRTC dumps,
    // podcast re-encodes). OggOpusCodec.walk verifies every page CRC
    // with Ogg's own unreflected CRC-32, stitches continued packets
    // across page boundaries by the lacing rules (the fixture splits a
    // packet at a 255-lacing boundary for every 3rd id), parses
    // OpusHead/OpusTags, and derives duration from the final granule
    // minus pre-skip per RFC 7845 — container walked, SILK/CELT
    // honestly not decoded (nothing downstream consumes PCM here).
    // Scale: per-row walk, audio bytes never shuffle.
    Q("mm_ogg_opus_stats",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val info = OggOpusCodec.walk(OggOpusCodec.encode(id))
            require(info != null, s"ogg walk rejected its own fixture: $id")
            (id, info.channels, info.preSkip, info.inputRate, info.nPages,
              info.nPackets, info.durationMs, info.vendor)
          }
        }.toDF("media_id", "channels", "pre_skip", "input_rate", "n_pages",
          "n_packets", "duration_ms", "vendor")
      },
      Some("""WITH f AS (
          SELECT doc_id,
            CAST(8 + doc_id % 7 AS INT) AS n,
            CAST((8 + doc_id % 7 + 2) // 3 AS INT) AS n_groups
          FROM documents)
        SELECT doc_id AS media_id,
          CAST(1 + doc_id % 2 AS INT) AS channels,
          CAST(312 + (doc_id % 5) * 10 AS INT) AS pre_skip,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END AS BIGINT)
            AS input_rate,
          CAST(2 + n_groups + CASE WHEN doc_id % 3 = 0 THEN
              list_sum([CASE WHEN 40 + ((doc_id * 11 + (3 * g + 2) * 37) % 500)
                  >= 255 THEN 1 ELSE 0 END
                FOR g IN generate_series(0, n_groups - 2)])
            ELSE 0 END AS INT) AS n_pages,
          CAST(n AS INT) AS n_packets,
          CAST(n * 20 AS BIGINT) AS duration_ms,
          'graft-synth' AS vendor
        FROM f""")),

    // ----- header-only dimension census (incl. WebP) ------------------------
    // "What resolutions does this image lake hold" must not pay IDCT +
    // inflate for an answer that lives in the first kilobyte: at 100 TB
    // the census is I/O-shaped only if the per-row work is a header
    // parse. ImageDims.sniff covers the repo's six decodable formats
    // (ImageDimsSpec pins header-vs-full-decode dims parity across the
    // whole fixture space) PLUS WebP in all three wire layouts — the
    // modern-crawl staple with no full decoder here, which is exactly
    // why the header path matters. One narrow projection, no shuffle.
    Q("mm_image_dims",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val bytes = (id % 8) match {
              case 0 => BmpCodec.encode(id)
              case 1 => PngCodec.encode(id)
              case 2 => GifCodec.encode(id)
              case 3 => if (id % 2 == 1) JpegCodec.encodeProgressive(id)
                else JpegCodec.encode(id)
              case 4 => TiffCodec.encode(id)
              case 5 => PpmCodec.encode(id)
              case 6 => if (id % 16 == 6) ImageDims.encodeWebpVp8l(id)
                else ImageDims.encodeWebpVp8(id)
              case _ => if (id % 16 == 7) ImageDims.encodeWebpVp8x(id)
                else ImageDims.encodeAvif(id)
            }
            val dm = ImageDims.sniff(bytes)
            require(dm != null, s"dims sniff rejected its own fixture: $id")
            (id, dm.format, dm.w, dm.h)
          }
        }.toDF("media_id", "format", "w", "h")
      },
      Some("""SELECT doc_id AS media_id,
          CASE WHEN doc_id % 16 = 15 THEN 'avif' ELSE
            CASE doc_id % 8 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
              WHEN 2 THEN 'gif' WHEN 3 THEN 'jpg' WHEN 4 THEN 'tiff'
              WHEN 5 THEN 'ppm' ELSE 'webp' END END AS format,
          CAST(CASE WHEN doc_id % 16 = 15 THEN 800 + doc_id % 200 ELSE
            CASE doc_id % 8
              WHEN 2 THEN 24 + doc_id % 13
              WHEN 3 THEN 21 + doc_id % 14
              WHEN 6 THEN 100 + doc_id % 50
              WHEN 7 THEN 640 + doc_id % 100
              ELSE 16 + doc_id % 13 END END AS INT) AS w,
          CAST(CASE WHEN doc_id % 16 = 15 THEN 600 + doc_id % 150 ELSE
            CASE doc_id % 8
              WHEN 2 THEN 18 + doc_id % 7
              WHEN 3 THEN 13 + doc_id % 11
              WHEN 6 THEN 80 + doc_id % 40
              WHEN 7 THEN 480 + doc_id % 50
              ELSE 12 + doc_id % 7 END END AS INT) AS h
        FROM documents""")),

    // ----- VAD-style speech segmentation ----------------------------------
    // The ASR-curation segmenter: cut each clip into maximal runs of
    // energetic frames (2 ms frames, frame active iff mean|s| ≥ half
    // scale — integer cross-multiplied, no float ratio), the energy
    // analogue of gaps-and-islands. The fixture's pseudo-noise PCM
    // alternates loud/quiet frames, so every clip yields 2-4 genuine
    // segments. Spark side runs the detector imperatively per decoded
    // clip (the modality pattern — audio bytes never shuffle); the
    // oracle re-derives samples from the synthesis formula and finds
    // the SAME islands with a row_number-difference grouping, so a
    // frame boundary or threshold slip mismatches. Full frames only
    // (the tail partial frame is dropped on both sides). O(clips)
    // small output rows.
    Q("mm_audio_vad_segments",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.flatMap { id =>
          val a = WavCodec.decode(WavCodec.encode(id))
          val flen = a.sampleRate / 500 // 2 ms
          val nf = a.samples.length / flen
          val active = Array.tabulate(nf) { f =>
            var e = 0L
            var i = f * flen
            while (i < (f + 1) * flen) {
              e += math.abs(a.samples(i).toInt); i += 1
            }
            2 * e >= 32768L * flen
          }
          val segs = Seq.newBuilder[(Long, Int, Int, Int, Int)]
          var f = 0
          var segIdx = 0
          while (f < nf) {
            if (active(f)) {
              val start = f
              while (f < nf && active(f)) f += 1
              segIdx += 1
              segs += ((id, segIdx, start, f - 1, f - start))
            } else f += 1
          }
          segs.result()
        }.toDF("media_id", "seg_idx", "start_frame", "end_frame",
          "n_frames")
      },
      Some("""WITH par AS (
          SELECT doc_id AS id,
            (8000 + (doc_id % 3) * 4000) // 500 AS flen,
            200 + (doc_id % 57) AS n
          FROM documents WHERE doc_id % 3 = 1),
        fe AS (
          SELECT id, i // flen AS f, flen,
            SUM(ABS(((id * 31 + i * i * 7) % 65536) - 32768)) AS e
          FROM par, LATERAL (SELECT unnest(generate_series(0,
            CAST((n // flen) * flen AS INT) - 1)) AS i) ii
          GROUP BY 1, 2, 3),
        act AS (SELECT id, f FROM fe WHERE 2 * e >= 32768 * flen),
        isl AS (
          SELECT id, f,
            f - ROW_NUMBER() OVER (PARTITION BY id ORDER BY f) AS grp
          FROM act)
        SELECT id AS media_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY id ORDER BY MIN(f))
            AS INT) AS seg_idx,
          CAST(MIN(f) AS INT) AS start_frame,
          CAST(MAX(f) AS INT) AS end_frame,
          CAST(COUNT(*) AS INT) AS n_frames
        FROM isl GROUP BY id, grp""")),

    // ----- audio QC: silence / clipping screen ---------------------------
    // The audio-curation gate a speech/ASR corpus runs before paying for
    // transcription or training: clips that are mostly silence carry no
    // signal, clips that clip (samples pinned near full-scale) carry
    // distorted signal — both are dropped at ingest. Counts are exact
    // integers over the decoded PCM (silence = |s| < 1024, i.e. under
    // -30 dBFS for 16-bit; clipping = |s| >= 32256, within 512 of
    // full scale), so the oracle — which replays the synthesis FORMULA,
    // never the bytes — hash-matches exactly; the keep flags compare by
    // integer cross-multiplication (10 * n_silent <= n vs a float
    // ratio), so no tolerance anywhere. Scale: narrow per-row decode,
    // audio bytes never shuffle — the mm_decode_wav shape; the output
    // is O(clips) small rows.
    Q("mm_audio_quality",
      (s, d) => {
        import s.implicits._
        val ids = Tables.documents(s, d).filter($"doc_id" % 3 === 1)
          .select($"doc_id").as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val audio = WavCodec.decode(WavCodec.encode(id))
            val n = audio.samples.length
            var silent = 0
            var clipped = 0
            var i = 0
            while (i < n) {
              val a = math.abs(audio.samples(i).toInt)
              if (a < 1024) silent += 1
              if (a >= 32256) clipped += 1
              i += 1
            }
            (id, n, silent, clipped,
              silent.toDouble / n, clipped.toDouble / n,
              10L * silent <= n && 50L * clipped <= n)
          }
        }.toDF("media_id", "n_samples", "n_silent", "n_clipped",
          "silent_frac", "clipped_frac", "keep")
      },
      Some("""WITH a AS (
          SELECT doc_id, CAST(200 + doc_id % 57 AS INT) AS n
          FROM documents WHERE doc_id % 3 = 1),
        c AS (
          SELECT doc_id, n,
            CAST(list_sum([CASE WHEN
                abs(((doc_id * 31 + i * i * 7) % 65536) - 32768) < 1024
              THEN 1 ELSE 0 END
              FOR i IN generate_series(0, n - 1)]) AS INT) AS n_silent,
            CAST(list_sum([CASE WHEN
                abs(((doc_id * 31 + i * i * 7) % 65536) - 32768) >= 32256
              THEN 1 ELSE 0 END
              FOR i IN generate_series(0, n - 1)]) AS INT) AS n_clipped
          FROM a)
        SELECT doc_id AS media_id, n AS n_samples, n_silent, n_clipped,
          CAST(n_silent AS DOUBLE) / n AS silent_frac,
          CAST(n_clipped AS DOUBLE) / n AS clipped_frac,
          (10 * n_silent <= n AND 50 * n_clipped <= n) AS keep
        FROM c"""))
  )
}
