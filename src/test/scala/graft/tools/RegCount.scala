package graft.tools
object RegCount {
  def main(args: Array[String]): Unit = {
    val reg = graft.SparkEntry.registry
    println(s"[regcount] registry: ${reg.size}")
    println(s"[regcount] no-oracle: ${reg.collect{case (k, graft.queries.Q(_, None)) => k}.toSeq.sorted.mkString(",")}")
  }
}
