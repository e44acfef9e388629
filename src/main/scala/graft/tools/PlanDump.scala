package graft.tools

import graft.core.GraftSession

/** Dev tool: print the physical plan of a SparkEntry query.
  * Usage: runMain graft.tools.PlanDump <query> [sfDir] [--exec]
  * (--exec runs the query first so the final adaptive plan is shown).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val q = positional.headOption.getOrElse("q59_seq_packing")
    val sf = positional.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4, "plandump")
    val df = graft.SparkEntry.queries(q)(spark, sf)
    if (args.contains("--exec")) df.collect()
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
  }
}
