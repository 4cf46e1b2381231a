package graft

/** Reads the ACTUAL capacity of Spark's global generated-class cache
  * and the janino compile counters, in a JVM that pinned the cache via
  * GraftSession.pinCodegenCache — the direct test of whether the
  * bistable damaged state (flat ~+0.4 s/query; SURVEY §15) is still
  * the 100-entry cache thrash or something else.
  *
  *   sbt 'Test/runMain graft.CodegenCacheProbe'
  */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.pinCodegenCache(spark)

    // reflect the guava cache's maxWeight out of CodeGenerator$.cache
    val cgClass = Class.forName(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
    val module = cgClass.getField("MODULE$").get(null)
    val cacheField = cgClass.getDeclaredFields
      .find(_.getName.endsWith("cache")).get
    cacheField.setAccessible(true)
    val cache = cacheField.get(module)
    println(s"PROBE cache impl: ${cache.getClass.getName}")
    def findField(o: Any, name: String): Option[Any] = {
      var c: Class[_] = o.getClass
      while (c != null) {
        c.getDeclaredFields.find(_.getName == name).foreach { f =>
          f.setAccessible(true); return Some(f.get(o))
        }
        c = c.getSuperclass
      }
      None
    }
    // NonFateSharingLoadingCache wraps the guava LoadingCache in a
    // private field; unwrap every layer that smells like a cache
    def unwrap(o: Any, depth: Int = 0): Any = {
      if (depth > 4) return o
      findField(o, "localCache").orElse(findField(o, "loadingCache"))
        .orElse(findField(o, "delegate")).orElse(findField(o, "cache"))
        .map(unwrap(_, depth + 1)).getOrElse(o)
    }
    val local = unwrap(cache)
    println(s"PROBE unwrapped: ${local.getClass.getName}")
    findField(local, "maxWeight").foreach(w => println(s"PROBE cache maxWeight=$w"))

    // compile-counter movement across identical suite passes: with an
    // effective cache the later passes compile ~nothing
    val hist = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    def compiles: Long = hist.getCount

    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("st_")) // batch plans only: fast, codegen-dense
    def pass(tag: String): Unit = {
      val c0 = compiles
      val t0 = System.nanoTime()
      qs.foreach { case (n, fn) =>
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      println(f"PROBE pass[$tag] wall=${(System.nanoTime() - t0) / 1e9}%6.1f s " +
        s"janinoCompiles=+${compiles - c0} (total ${compiles})")
    }
    pass("p1"); pass("p2"); pass("p3")

    // the canary, in THIS warmed JVM: separates fast (≈0.11 s in-suite)
    // from damaged (≈0.5 s) without the full Bench harness; plus the
    // bare scheduling floor and GC counters to localize a non-janino tax
    val canary = SparkEntry.queries("mm_resize_plan")
    val reps = sys.env.getOrElse("PROBE_CANARY_REPS", "6").toInt
    for (i <- 1 to reps) {
      val c0 = compiles
      val t0 = System.nanoTime()
      val df = canary(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
        s"$p=${s.endTimeMs - s.startTimeMs}" }.mkString(" ")
      println(f"PROBE canary r$i total=${(t3 - t0) / 1e9}%6.3f s " +
        f"build=${(t1 - t0) / 1e6}%5.1f plan=${(t2 - t1) / 1e6}%6.1f " +
        f"exec=${(t3 - t2) / 1e6}%6.1f ms compiles=+${compiles - c0}  $phases")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.range(1000).write.format("noop").mode("overwrite").save()
      println(f"PROBE range-noop r$i ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .foreach(gc => println(s"PROBE gc ${gc.getName} count=${gc.getCollectionCount} ms=${gc.getCollectionTime}"))
    spark.stop()
  }
}
