package graft.tools

/** Prints the battery inventory (name + has-oracle) for bookkeeping. */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val all = graft.SparkEntry.all
    println(s"battery=${all.size} oracles=${all.count(_.oracle.isDefined)}")
    all.map(_.name).sorted.foreach(println)
  }
}
