package graft.operators

/** BPE tokenizer TRAINING (Sennrich et al. 2016 — the algorithm behind
  * GPT-2/RoBERTa vocabularies). `pipeline_bpe_pairs` is one training
  * iteration and `text_bpe_apply` is inference with a trained merge
  * list; this is the missing middle: produce the merge list itself.
  *
  * The 100 TB shape is the word-dictionary trick every production BPE
  * trainer uses: the corpus collapses to (word, count) — ONE
  * distributed shuffle — and training then iterates over that BOUNDED
  * artifact (top-K words by count, a deterministic TakeOrdered like
  * the k-means centroids / PQ codebooks this repo already trains), so
  * the 40-merge loop never touches the corpus again. Merge selection
  * is deterministic: highest weighted pair count, ties broken by the
  * lexicographically smallest (left, right) — pinned identically in
  * the independent CPython trainer (tools/bpe_oracle.py).
  *
  * The training corpus is a zip fixture of pseudo-word shards
  * (deterministic syllable chains with a quadratically-skewed rank
  * distribution, so merges are non-trivial), read through the `zip`
  * DSv2 source — the merge sequence is a constant of the formulas,
  * which makes the DuckDB oracle an honest VALUES table independently
  * reproduced by the CPython trainer from the same archive bytes.
  */
object BpeTrain {

  private val Syllables = Array(
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu")

  /** Pseudo-word for vocabulary rank r: 2-4 syllables. */
  def word(rank: Int): String = {
    val n = 2 + rank % 3
    (0 until n).map(t => Syllables((rank * 7 + t * 13) % 45)).mkString
  }

  /** The j-th word of shard i: quadratically rank-skewed (low ranks
    * dominate, Zipf-ish) and fully deterministic. */
  def shardWord(i: Int, j: Int): String = {
    val v = (i.toLong * 2654435761L + j.toLong * 40503L + 12345L) & 0xFFFFFFFFL
    val u = (v % 1000L).toInt
    word((u * u / 5000) % 200)
  }

  def shardText(i: Int): String =
    (0 until 400).map(j => shardWord(i, j)).mkString(" ")

  final val NShards = 8

  /** The training fixture: one JDK-written zip of NShards text shards
    * (dog-fooding the `zip` source as the corpus container). */
  def ensureFixture(dir: String): String = {
    val d = java.nio.file.Paths.get(dir)
    val marker = d.resolve("_BPE_FIXTURE_OK_v1")
    if (java.nio.file.Files.exists(marker)) return dir
    java.nio.file.Files.createDirectories(d)
    val tmp = d.resolve(s".corpus.zip.${ProcessHandle.current().pid()}")
    val zo = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(tmp))
    try {
      for (i <- 0 until NShards) {
        zo.putNextEntry(new java.util.zip.ZipEntry(f"shard-$i%02d.txt"))
        zo.write(shardText(i).getBytes("UTF-8"))
        zo.closeEntry()
      }
    } finally zo.close()
    java.nio.file.Files.move(tmp, d.resolve("corpus.zip"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.write(marker, Array.empty[Byte])
    dir
  }

  /** Classic BPE training over a (word, count) dictionary: symbols
    * start as characters; each round merges the highest-count adjacent
    * pair (ties: lexicographically smallest (left, right)). Returns
    * (left, right, weightedCount) in merge order. */
  def train(dict: Seq[(String, Long)], nMerges: Int)
      : Seq[(String, String, Long)] = {
    var words = dict.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; k <- 0 until syms.length - 1) {
        val p = (syms(k), syms(k + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val (best, n) = counts.toSeq.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        merges += ((best._1, best._2, n))
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var k = 0
          while (k < syms.length) {
            if (k + 1 < syms.length && syms(k) == best._1 &&
                syms(k + 1) == best._2) {
              out += joined
              k += 2
            } else {
              out += syms(k)
              k += 1
            }
          }
          (out.result(), c)
        }
        round += 1
      }
    }
    merges.result()
  }
}
