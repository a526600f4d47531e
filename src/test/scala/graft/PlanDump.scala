package graft

/** Dev tool: print the formatted physical plan of registry queries —
  * `sbt "Test/runMain graft.PlanDump q106 q50"` (prefix match, plans
  * at sf0.001 so iterative queries build fast). Backs the PERF.md
  * plan audits; not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = graft.queries.Registry.all.map(_.name)
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    names.foreach { n =>
      println(s"\n===== $n =====")
      try graft.queries.Registry.byName(n)
        .run(spark, "/root/testdata/sf0.001").explain("formatted")
      catch { case e: Throwable => println(s"plan failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
