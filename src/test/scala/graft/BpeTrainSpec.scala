package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE training: the Scala trainer and the INDEPENDENT CPython trainer
  * (stdlib zipfile + Counter, zero shared code) must produce the
  * identical 40-merge sequence from the same archive bytes; plus
  * structural properties of the merge chain. */
class BpeTrainSpec extends AnyFunSuite {

  private def dict: Seq[(String, Long)] = {
    val words = (0 until BpeTrain.NShards)
      .flatMap(i => BpeTrain.shardText(i).split(" "))
    words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(200)
  }

  test("Scala and CPython trainers agree on the full merge sequence") {
    val dir = BpeTrain.ensureFixture("/tmp/graft_bpe_fixture")
    val ours = BpeTrain.train(dict, 40).zipWithIndex.map {
      case ((a, b, c), i) => s"${i + 1} $a $b ${a + b} $c"
    }
    val out = new StringBuilder
    val code = scala.sys.process.Process(Seq("python3",
      "/root/repo/tools/bpe_oracle.py", dir, "40"))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0, s"python trainer failed: $out")
    val theirs = out.toString.linesIterator
      .filter(_.headOption.exists(_.isDigit)).toSeq
    assert(ours == theirs,
      s"merge sequences diverge:\nscala: ${ours.take(5)}\npython: ${theirs.take(5)}")
  }

  test("merge chain structure: hierarchical merges and exact coverage") {
    val merges = BpeTrain.train(dict, 40)
    assert(merges.length == 40)
    // later merges build on earlier merged symbols (hierarchy, the
    // whole point of BPE) — at least one side longer than one char
    assert(merges.exists { case (a, b, _) => a.length > 1 || b.length > 1 })
    // every merged symbol is a contiguous substring of some dict word
    val vocabText = dict.map(_._1).mkString(" ")
    for ((a, b, _) <- merges)
      assert(vocabText.contains(a + b), s"merged symbol ${a + b} unseen")
    // counts are positive and the first merge is the global best pair
    assert(merges.forall(_._3 > 0))
    val charPairs = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    for ((w, c) <- dict; k <- 0 until w.length - 1) {
      val p = (w(k).toString, w(k + 1).toString)
      charPairs(p) = charPairs.getOrElse(p, 0L) + c
    }
    val best = charPairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
    assert((merges.head._1, merges.head._2) == best._1)
    assert(merges.head._3 == best._2)
  }

  test("determinism: shuffled dict order trains the same sequence") {
    val shuffled = new scala.util.Random(7).shuffle(dict)
    assert(BpeTrain.train(shuffled, 40) == BpeTrain.train(dict, 40))
  }
}
