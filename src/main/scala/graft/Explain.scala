package graft

import graft.api.QueryCatalog

/** Dev tool: print the formatted physical plan of catalog queries.
  * Usage: runMain graft.Explain <sfDir> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else QueryCatalog.entries.map(_.name)
    val spark = GraftSession.local(4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryCatalog.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
