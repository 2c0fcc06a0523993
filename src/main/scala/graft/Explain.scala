package graft

/** Plan-inspection tool: `runMain graft.Explain <sfDir> [names...]`
  * prints the formatted physical plan of each named query (default: a
  * representative set). Used to check pushdown/broadcast/codegen per
  * query — see README "plan hygiene".
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_join_revenue", "q05b_overlap_bucketed",
        "q27_jaccard_pairs", "q30_topk_bruteforce")
    val spark = Engine.session("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
