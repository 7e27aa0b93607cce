package graft

/** Dev aid: print formatted physical plans for selected queries so the
  * pushdown/pruning/broadcast/codegen properties can be inspected.
  * Usage: runMain graft.Explain <sfDir> q1_agg,q6_filter,...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_agg", "q3_join", "q5_multijoin", "q6_filter", "asof_join")
    val spark = GraftSession.build(appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // simple tree first: the *(n) markers show WholeStageCodegen spans
      println(df.queryExecution.executedPlan.toString)
      df.explain("formatted")
    }
    spark.stop()
  }
}
