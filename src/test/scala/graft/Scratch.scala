package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamOps

    val dir = "/root/testdata/sf0.1"

    // st_stream_join: per-batch duration breakdown from the streaming
    // progress — where do 2.5 s go?
    def joinOnce(tag: String): Unit = {
      val joined = StreamOps.intervalJoin(
        StreamOps.eventsStream(spark, dir), "click", "purchase", "1 hour")
        .select(col("user_id"), col("left_id").as("click_id"),
          col("right_id").as("purchase_id"))
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, StreamOps.replayStateParts(spark).toString)
      val t0 = System.nanoTime()
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "scratch-ckpt-")
      val q = joined.writeStream
        .format("memory").queryName(s"scr_$tag").outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t1 = System.nanoTime()
      spark.conf.set(key, prev)
      println(f"SCRATCH join[$tag] total=${(t1 - t0) / 1e9}%5.2f s")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      org.apache.spark.sql.execution.streaming.state.GraftStateBridge.unloadAll()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    if (sys.env.contains("SCRATCH_JOIN")) { joinOnce("r1"); joinOnce("r2"); joinOnce("r3") }

    // noFlush A/B on a complete-mode windowed agg
    if (sys.env.contains("SCRATCH_FLUSH")) {
      def winOnce(tag: String, noFlush: Boolean): Unit = {
        val t0 = System.nanoTime()
        StreamOps.runToMemory(spark,
          ss => StreamOps.windowedCounts(StreamOps.eventsStream(ss, dir)),
          s"scrw_$tag", "complete", noFlush = noFlush).write.format("noop").mode("overwrite").save()
        println(f"SCRATCH win[$tag] noFlush=$noFlush total=${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
      for (i <- 1 to 4) { winOnce(s"f$i", noFlush = false); winOnce(s"n$i", noFlush = true) }
      spark.stop(); return
    }

    // native-vs-from_json A/B on the streaming positions parse
    if (sys.env.contains("SCRATCH_PJ")) {
      def run(tag: String, native: Boolean): Unit = {
        def parsed(sx: org.apache.spark.sql.SparkSession) = {
          val lines = StreamOps.spreadStream(
            StreamOps.eventsStream(sx, dir)
              .select(col("event_id"), col("user_id"), col("ts")))
            .select(col("event_id"),
              queries.IngestQueries.positionEnvelopeLine.as("line"))
          val rec = if (native) graft.plans.PositionRecordParse(col("line"))
            else from_json(col("line"), sources.PositionLog.RecordSchema)
          queries.IngestQueries.positionEnvelopeProjection(
            lines.withColumn("__rec", rec)
              .select(col("*"), col("__rec.count").as("rec_count"),
                posexplode(col("__rec.positions")).as(Seq("pos_idx", "__p")))
              .select(col("*"), col("__p.vehicle_id").as("vehicle_id"),
                col("__p.route_id").as("route_id"), col("__p.lat").as("lat"),
                col("__p.lon").as("lon"), col("__p.direction").as("direction"),
                col("__p.flag").as("flag"), col("__p.timestamp").as("pos_ts"))
              .drop("__rec", "__p"))
        }
        val t0 = System.nanoTime()
        StreamOps.runToMemory(spark, parsed _, s"scrpj_$tag", "append")
          .orderBy("event_id", "pos_idx")
          .write.format("noop").mode("overwrite").save()
        println(f"SCRATCH pj[$tag] native=$native total=${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
      for (i <- 1 to 4) { run(s"f$i", native = false); run(s"n$i", native = true) }
      spark.stop(); return
    }

    // coalesce-finish A/B for the three suspicious conversions
    if (sys.env.contains("SCRATCH_FIN")) {
      def skewCoal = queries.MiscQueries.queries("q_skew_join")(spark, dir)
      def skewOrd = {
        import spark.implicits._
        val weights = Seq(("signup", 2.0), ("purchase", 4.0), ("view", 0.5),
          ("click", 1.0), ("error", 0.25)).toDF("event_type", "weight")
        graft.operators.Skew.saltedJoin(
          graft.operators.Par.spread(
            Tables.events(spark, dir).select("event_type", "value")),
          weights, "event_type", nSalts = 32)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(sum(col("value") * col("weight")), 2).as("wsum"))
          .orderBy("event_type")
      }
      def fillCoal = queries.TpchQueries.queries("q_order_fill_rate")(spark, dir)
      def hourCoal = queries.TrafficQueries.queries("ta_hourly_activity")(spark, dir)
      for (i <- 1 to 4) {
        time(s"skewCoal r$i")(skewCoal)
        time(s"skewOrd  r$i")(skewOrd)
        time(s"fillCoal r$i")(fillCoal)
        time(s"hourCoal r$i")(hourCoal)
      }
      spark.stop(); return
    }

    // dd_embedding_lsh stage dissection
    if (sys.env.contains("SCRATCH_EMB")) {
      import graft.operators.{Dedup, Par}
      import graft.functions.VectorFunctions
      val thr = queries.DedupQueries.CosineThreshold
      def embBase = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("__id"),
          VectorFunctions.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorFunctions.normPre(col("emb")))
      def sigs = {
        val vals = array((0 until 20).map { b =>
          VectorFunctions.hyperplaneSigPreAt(col("emb"), b * 5, 5, 64)
        }: _*)
        Par.spread(embBase.select(col("__id"), col("emb")))
          .withColumn("vals", vals)
          .select(col("__id"), posexplode(col("vals")).as(Seq("band", "v")))
          .groupBy("band", "v").agg(count(lit(1)).as("n"))
      }
      def lshFull = Dedup.embeddingPairsLsh(embBase, "__id", "emb",
        dim = 64, threshold = thr)
      // stepwise replica of embeddingPairsLsh internals
      import org.apache.spark.sql.expressions.Window
      val (bands, rr, dimN, maxBucket) = (20, 5, 64, 1000L)
      def e = embBase
      def bandedF = {
        val vals = array((0 until bands).map { b =>
          VectorFunctions.hyperplaneSigPreAt(col("emb"), b * rr, rr, dimN)
        }: _*)
        Par.spread(e.select(col("__id"), col("emb")))
          .withColumn("vals", vals)
          .select(col("__id"), col("vals"),
            posexplode(col("vals")).as(Seq("band", "v")))
      }
      def boundedF = bandedF
        .withColumn("__ok", count(lit(1)).over(Window.partitionBy("band", "v")) <= maxBucket)
        .withColumn("okMask",
          sum(when(col("__ok"), expr("shiftleft(1L, cast(band as int))"))
            .otherwise(lit(0L))).over(Window.partitionBy("__id")))
        .filter(col("__ok")).drop("__ok")
      def candF = {
        val earlierEq = (0 until bands - 1).map { bp =>
          col("band") > bp &&
            (element_at(col("a_vals"), bp + 1) === element_at(col("b_vals"), bp + 1)) &&
            (shiftrightunsigned(col("a_mask"), bp).bitwiseAND(lit(1L)) === 1L)
        }.reduce(_ || _)
        boundedF.select(col("band"), col("v"), col("__id").as("a_id"),
            col("vals").as("a_vals"), col("okMask").as("a_mask"))
          .join(boundedF.select(col("band"), col("v"), col("__id").as("b_id"),
            col("vals").as("b_vals")), Seq("band", "v"))
          .filter(col("a_id") < col("b_id") && !earlierEq)
          .select("a_id", "b_id")
      }
      for (i <- 1 to 3) {
        time(s"emb banded  r$i")(bandedF)
        time(s"emb bounded r$i")(boundedF)
        time(s"emb cand    r$i")(candF)
        time(s"emb full    r$i")(lshFull)
      }
      println("SCRATCH emb cand rows=" + candF.count())
      val full = lshFull
      full.write.format("noop").mode("overwrite").save()
      val psAnn = full.queryExecution.executedPlan.toString
      println("SCRATCH emb codegen-spans=" + "WholeStageCodegen".r.findAllIn(psAnn).length +
        " fallbacks=" + psAnn.split('\n').count(l => l.contains("Project") && !l.contains("codegen")))
      println(psAnn.split('\n').take(60).mkString("\n"))
      spark.stop(); return
    }

    // ANN plan cost: literal-plane expression tree vs execution
    if (sys.env.contains("SCRATCH_ANN")) {
      for (r <- 1 to 3; n <- Seq("dd_embedding_lsh", "ss_lsh_topk", "ss_ivf_topk")) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val ph = df.queryExecution.tracker.phases.map { case (p, s) =>
          s"$p=${s.endTimeMs - s.startTimeMs}" }.mkString(" ")
        println(f"SCRATCH ann[$n%-18s] r$r build=${(t1 - t0) / 1e6}%6.1f plan=${(t2 - t1) / 1e6}%6.1f exec=${(t3 - t2) / 1e6}%7.1f ms  $ph")
      }
      spark.stop(); return
    }

    // construction cost: where do 400-600 ms of DataFrame building go?
    if (sys.env.contains("SCRATCH_CONS")) {
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH cons[$tag%-28s] ${(System.nanoTime() - t0) / 1e6}%7.1f ms"); r
      }
      for (r <- 1 to 4) {
        val o = t(s"read orders r$r")(Tables.orders(spark, dir))
        val sch = o.schema
        t(s"read orders+schema r$r")(
          spark.read.schema(sch).parquet(s"$dir/orders.parquet"))
        t(s"q5 build r$r")(queries.TpchQueries.queries("q5_local_supplier")(spark, dir))
        t(s"decile build r$r")(queries.TpchQueries.queries("q_decile_stats")(spark, dir))
        t(s"decile exec-plan r$r")(queries.TpchQueries.queries("q_decile_stats")(spark, dir)
          .queryExecution.executedPlan)
        time(s"decile noop r$r")(queries.TpchQueries.queries("q_decile_stats")(spark, dir))
        time(s"q5 noop r$r")(queries.TpchQueries.queries("q5_local_supplier")(spark, dir))
      }
      val d = queries.TpchQueries.queries("q_decile_stats")(spark, dir)
      d.write.format("noop").mode("overwrite").save()
      val ps = d.queryExecution.executedPlan.toString
      println("SCRATCH decile reused=" + ps.contains("ReusedExchange") +
        " exchanges=" + "Exchange".r.findAllIn(ps).length)
      spark.stop(); return
    }

    // floor breakdown: planning vs execution on floor-bound queries
    if (sys.env.contains("SCRATCH_FLOOR")) {
      val names = Seq("ing_bounds_filter", "geo_grid_density", "q1_pricing_summary",
        "q_decile_stats", "q5_local_supplier", "ta_weather_corr", "ta_fastest_routes",
        "q_order_fill_rate", "ta_interpolate", "tx_pack_sequences")
      val all = SparkEntry.queries
      for (r <- 1 to 5; n <- names) {
        val t0 = System.nanoTime()
        val df = all(n)(spark, dir)
        val plan = df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
          s"$p=${s.endTimeMs - s.startTimeMs}" }.mkString(" ")
        println(f"SCRATCH floor[$n%-22s] r$r plan=${(t1 - t0) / 1e6}%6.1f ms exec=${(t2 - t1) / 1e6}%7.1f ms  $phases")
      }
      spark.stop(); return
    }

    // ta_speed_lag / ta_asof_weather: orderBy (range-sampling re-executes
    // the window/probe result stage) vs sortWithinPartitions finish
    // round-14: st_session_window + ta_speed_lag sf1 dissection
    if (sys.env.contains("SCRATCH_SW")) {
      val d = sys.env.getOrElse("SCRATCH_SW_DIR", "/tmp/graft-sf1")
      // ta_speed_lag component breakdown
      def posScan = sources.PositionView.fromEvents(Tables.events(spark, d))
      def lagOnly = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vehicle_id").orderBy("ts_us", "event_id")
        posScan.withColumn("prev_ts_s", lag("ts_s", 1).over(w))
          .filter(col("prev_ts_s").isNotNull)
      }
      def lagFull = queries.TrafficQueries.queries("ta_speed_lag")(spark, d)
      // st_session_window variants
      def swRun(parts: Int, localMerge: Boolean, spread: Boolean = false,
                wide: Int = 0): DataFrame = {
        val mk = "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition"
        val pk = "spark.sql.shuffle.partitions"
        val prevM = spark.conf.get(mk)
        val prevP = spark.conf.get(pk)
        spark.conf.set(mk, localMerge.toString)
        try {
          val src0 = if (wide > 0) StreamOps.eventsStreamWide(spark, d, wide)
            else StreamOps.eventsStream(spark, d)
          val agg = StreamOps.sessionCounts(
            if (spread) StreamOps.spreadStream(src0) else src0, "30 minutes")
          spark.conf.set(pk, parts.toString)
          val name = s"scr_sw_${parts}_${localMerge}_w$wide"
          val ckpt = java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "scr-sw-")
          val fk = "spark.sql.streaming.noDataMicroBatches.enabled"
          spark.conf.set(fk, "false")
          val q = agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination()
          if (sys.env.contains("SCRATCH_SW_PROG")) q.recentProgress.foreach { p =>
            println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=" +
              new java.util.TreeMap[String, java.lang.Long](p.durationMs) +
              " stateOps=" + p.stateOperators.toSeq.map(so =>
                s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
                s"commitMs=${so.commitTimeMs} customMetrics=${so.customMetrics}"))
          }
          spark.conf.set(fk, "true")
          org.apache.spark.sql.execution.streaming.state.GraftStateBridge.unloadAll()
          spark.table(name)
            .select(col("user_id"),
              col("session_window.start").cast("timestamp_ntz").as("sess_start"),
              col("session_window.end").cast("timestamp_ntz").as("sess_end"),
              col("n_events"))
            .orderBy("user_id", "sess_start")
        } finally { spark.conf.set(mk, prevM); spark.conf.set(pk, prevP) }
      }
      // batch-mode session_window over the same rows: the state-free cost
      def swBatch = {
        val ev = Tables.events(spark, d)
          .withColumn("ts_w", timestamp_micros(expr("ts div 1000")))
        ev.groupBy(col("user_id"), session_window(col("ts_w"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").cast("timestamp_ntz").as("sess_start"),
            col("session_window.end").cast("timestamp_ntz").as("sess_end"),
            col("n_events"))
          .orderBy("user_id", "sess_start")
      }
      // slim pre-shuffle projection for the lag window: shuffle only
      // (event_id, user_id, ts); derive lat/lon/ts post-exchange
      def lagSlim = {
        val slim = Tables.events(spark, d)
          .select(col("event_id"), col("user_id"), col("ts"))
          .repartition(col("user_id"))
        val pos = sources.PositionView.fromEvents(slim
          .withColumn("event_type", lit(null).cast("string"))
          .withColumn("value", lit(null).cast("double")))
        import graft.operators.SpeedOps
        SpeedOps.speeds(pos, queries.TrafficQueries.SynthMaxGapS,
          SpeedOps.MaxRealisticSpeedKmh)
          .select(col("event_id"), col("vehicle_id"), col("route_id"), col("dt_s"),
            round(col("dist_km"), 6).as("dist_km"),
            round(col("speed_kmh"), 6).as("speed_kmh"))
          .sortWithinPartitions("event_id")
      }
      def lagSlimNoSort = {
        val slim = Tables.events(spark, d)
          .select(col("event_id"), col("user_id"), col("ts"))
          .repartition(col("user_id"))
        val pos = sources.PositionView.fromEvents(slim
          .withColumn("event_type", lit(null).cast("string"))
          .withColumn("value", lit(null).cast("double")))
        import graft.operators.SpeedOps
        SpeedOps.speeds(pos, queries.TrafficQueries.SynthMaxGapS,
          SpeedOps.MaxRealisticSpeedKmh)
          .select(col("event_id"), col("vehicle_id"), col("route_id"), col("dt_s"),
            round(col("dist_km"), 6).as("dist_km"),
            round(col("speed_kmh"), 6).as("speed_kmh"))
      }
      // old full-row window path, for A/B against the slim registry impl
      def lagOld = {
        import graft.operators.SpeedOps
        SpeedOps.speeds(posScan, queries.TrafficQueries.SynthMaxGapS,
          SpeedOps.MaxRealisticSpeedKmh)
          .select(col("event_id"), col("vehicle_id"), col("route_id"), col("dt_s"),
            round(col("dist_km"), 6).as("dist_km"),
            round(col("speed_kmh"), 6).as("speed_kmh"))
          .sortWithinPartitions("event_id")
      }
      def withConf(k: String, v: String)(f: => Unit): Unit = {
        val prev = spark.conf.get(k)
        spark.conf.set(k, v); try f finally spark.conf.set(k, prev)
      }
      val mps = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
      val swOnly = sys.env.contains("SCRATCH_SW_PROG")
      for (i <- 1 to 4) {
        if (!swOnly) {
          time(s"lagOld r$i")(lagOld)
          time(s"lagNew r$i")(lagFull)
          withConf(mps, "262144") { time(s"lagNew mps256k r$i")(lagFull) }
          withConf(mps, "262144") { time(s"lagOld mps256k r$i")(lagOld) }
          time(s"swBatch r$i")(swBatch)
        }
        time(s"sw p4  lm=T r$i")(swRun(4, localMerge = true))
        if (swOnly) {
          time(s"sw p4  wide16 r$i")(swRun(4, localMerge = true, wide = 16))
          time(s"sw p8  wide16 r$i")(swRun(8, localMerge = true, wide = 16))
          time(s"sw p4  spread r$i")(swRun(4, localMerge = true, spread = true))
        }
      }
      // confirm lagSlim plan has exactly one exchange
      val lp = lagSlim.queryExecution.executedPlan.toString
      println("SCRATCH lagSlim exchanges=" + "Exchange".r.findAllIn(lp).length)
      spark.stop(); return
    }

    // streaming-replay machinery floor: the cheapest possible stateless
    // and stateful replays over the same backlog — the number the
    // st_* family's sf1 rows are defended against
    if (sys.env.contains("SCRATCH_STFLOOR")) {
      val d = sys.env.getOrElse("SCRATCH_STFLOOR_DIR", "/tmp/graft-sf1")
      def statelessMin = StreamOps.runToMemory(spark,
        ss => StreamOps.eventsStreamWide(ss, d, StreamOps.wideReplayFiles(spark))
          .select(col("event_id")).filter(col("event_id") < 0),
        "scr_floor_sl", "append", noFlush = true)
      def statefulMin = StreamOps.runToMemory(spark,
        ss => StreamOps.eventsStreamWide(ss, d, StreamOps.wideReplayFiles(spark))
          .withColumn("ts_w", timestamp_micros(expr("ts div 1000")))
          .withWatermark("ts_w", "1 hour")
          .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
        "scr_floor_sf", "complete", noFlush = true)
      for (i <- 1 to 4) {
        time(s"stateless-min r$i")(statelessMin)
        time(s"stateful-min  r$i")(statefulMin)
      }
      spark.stop(); return
    }

    // session-window APPEND + final state-store read: flushed sessions
    // land distributed; still-open sessions come from one state read
    if (sys.env.contains("SCRATCH_SWAP")) {
      val d = sys.env.getOrElse("SCRATCH_SWAP_DIR", "/tmp/graft-sf1")
      def once(tag: String): Unit = {
        val pk = "spark.sql.shuffle.partitions"
        val prevP = spark.conf.get(pk)
        val t0 = System.nanoTime()
        val agg = StreamOps.sessionCounts(
          StreamOps.eventsStreamWide(spark, d, 16), "30 minutes")
        spark.conf.set(pk, "4")
        val ckpt = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "scr-swap-")
        val out = ckpt.resolve("sink")
        try {
          val q = agg.writeStream.format("parquet")
            .option("path", out.toString)
            .outputMode("append")
            .option("checkpointLocation", ckpt.resolve("ck").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination()
          spark.conf.set(pk, prevP)
          val t1 = System.nanoTime()
          val flushed = spark.read.schema(agg.schema).parquet(out.toString)
          val open = spark.read.format("statestore")
            .option("path", ckpt.resolve("ck").toString).load()
          if (tag == "r1") { open.printSchema(); open.show(3, truncate = false) }
          val nf = flushed.count(); val no = open.count()
          val t2 = System.nanoTime()
          println(f"SCRATCH swap[$tag] stream=${(t1 - t0) / 1e9}%5.2f s " +
            f"reads=${(t2 - t1) / 1e9}%5.2f s flushed=$nf open=$no")
        } finally {
          spark.conf.set(pk, prevP)
          org.apache.spark.sql.execution.streaming.state.GraftStateBridge.unloadAll()
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(ckpt).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      for (i <- 1 to 4) once(s"r$i")
      spark.stop(); return
    }

    // multi-batch session-final divergence: which batch got which rows,
    // and what the 4-batch replay drops vs the 1-batch one
    if (sys.env.contains("SCRATCH_MB")) {
      val d = sys.env.getOrElse("SCRATCH_MB_DIR", "/root/testdata/sf0.001")
      val agg = StreamOps.sessionCounts(
        StreamOps.eventsStreamSliced(spark, d, 4), "30 minutes")
      val pk = "spark.sql.shuffle.partitions"
      val prevP = spark.conf.get(pk)
      spark.conf.set(pk, "4")
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "scr-mb-")
      val q = agg.writeStream.format("parquet")
        .option("path", ckpt.resolve("sink").toString)
        .outputMode("append")
        .option("checkpointLocation", ckpt.resolve("ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.conf.set(pk, prevP)
      q.recentProgress.foreach { p =>
        println(s"SCRATCH mb batch=${p.batchId} rows=${p.numInputRows} " +
          s"watermark=${p.eventTime.get("watermark")} " +
          s"maxEventTime=${p.eventTime.get("max")} dropped=" +
          p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(","))
      }
      org.apache.spark.sql.execution.streaming.state.GraftStateBridge.unloadAll()
      // file mtimes of the staged slices
      val stageRoot = java.nio.file.Paths.get("/tmp/graft-stream")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stageRoot).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .filter(_.toString.contains("-x4"))
        .foreach(p => println(s"SCRATCH mb file ${p.getFileName} mtime=" +
          java.nio.file.Files.getLastModifiedTime(p)))
      spark.stop(); return
    }

    // ta_speed_lag cost decomposition: where do the sf1 0.38 s go?
    // (a) the PositionView scan+project alone, (b) + the vehicle_id
    // shuffle with a partition sort but no window/haversine, (c) full
    if (sys.env.contains("SCRATCH_TAFLOOR")) {
      val d = sys.env.getOrElse("SCRATCH_TAFLOOR_DIR", "/tmp/graft-sf1")
      def posOnly = queries.GeoQueries.pos(spark, d)
        .select("event_id", "vehicle_id", "route_id", "lat", "lon",
          "ts_us", "ts_s")
      def shuffled = posOnly
        .repartition(col("vehicle_id"))
        .sortWithinPartitions("vehicle_id", "ts_us", "event_id")
      def full = queries.TrafficQueries.queries("ta_speed_lag")(spark, d)
      for (i <- 1 to 4) {
        time(s"ta scan+proj r$i")(posOnly)
        time(s"ta +shuffle  r$i")(shuffled)
        time(s"ta full lag  r$i")(full)
      }
      spark.stop(); return
    }

    // geo_poly_concave agg-shape A/B: direct multi-countDistinct
    // (Expand x3 over every hit row) vs pre-collapsed distinct triple
    if (sys.env.contains("SCRATCH_GPC")) {
      val d = sys.env.getOrElse("SCRATCH_GPC_DIR", "/tmp/graft-sf1")
      def hits = graft.operators.PolyJoin.containsJoin(
        queries.GeoQueries.pos(spark, d), "lat", "lon",
        queries.GeoQueries.concavePolys(spark), "poly_id", "verts",
        cellDeg = queries.GeoQueries.CellDeg, convex = false)
      def direct = hits
        .groupBy("poly_id")
        .agg(count(lit(1)).as("n"),
          countDistinct("vehicle_id").as("n_vehicles"),
          countDistinct("route_id").as("n_routes"))
        .orderBy("poly_id")
      def collapsed = hits
        .groupBy("poly_id", "vehicle_id", "route_id")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("poly_id")
        .agg(sum("cnt").as("n"),
          countDistinct("vehicle_id").as("n_vehicles"),
          countDistinct("route_id").as("n_routes"))
        .orderBy("poly_id")
      def joinOnly = hits.select(col("poly_id"), col("vehicle_id"))
        .groupBy("poly_id").agg(count(lit(1)).as("n"))
      for (i <- 1 to 4) {
        time(s"gpc direct    r$i")(direct)
        time(s"gpc collapsed r$i")(collapsed)
        time(s"gpc joinOnly  r$i")(joinOnly)
      }
      spark.stop(); return
    }

    // round-15: st_stream_join dissection — streaming vs the SAME join
    // as a batch plan over the staged files, rocksdb A/B, and a
    // two-sided stateful floor (cheapest possible two-input stateful op)
    if (sys.env.contains("SCRATCH_SJ")) {
      val d = sys.env.getOrElse("SCRATCH_SJ_DIR", "/tmp/graft-sf1")
      val all = SparkEntry.queries
      def current() = all("st_stream_join")(spark, d)
      def batchEquiv() = {
        // identical logical join over the same staged wide files,
        // executed as a plain batch plan (AQE, 32-way) — the pure
        // join-compute cost with zero streaming machinery
        val ev = Tables.events(spark, d)
        val tsUs = graft.sources.PositionView.TsUsSql
        val left = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("left_id"), col("user_id"),
            timestamp_micros(expr(tsUs)).as("left_ts"))
        val right = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("right_id"), col("user_id").as("__ru"),
            timestamp_micros(expr(tsUs)).as("right_ts"))
        left.join(right,
          col("user_id") === col("__ru") &&
            col("right_ts") > col("left_ts") &&
            col("right_ts") <= col("left_ts") + expr("INTERVAL 1 hour"))
          .drop("__ru")
          .select(col("user_id"), col("left_id").as("click_id"),
            col("right_id").as("purchase_id"))
          .orderBy("user_id", "click_id", "purchase_id")
      }
      for (r <- 1 to 3) {
        time(s"sj batch-equiv r$r")(batchEquiv())
        sys.props.remove("graft.stream.provider")
        time(s"sj current     r$r")(current())
        StreamOps.ReplayMetrics.details("st_stream_join_sink").foreach(l => println(s"    $l"))
        sys.props("graft.stream.provider") =
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        time(s"sj rocksdb     r$r")(current())
        StreamOps.ReplayMetrics.details("st_stream_join_sink").foreach(l => println(s"    $l"))
        sys.props.remove("graft.stream.provider")
      }
      spark.stop(); return
    }

    // round-15: stateful-replay cost sweep — state partition count x
    // state store provider, per-batch phase breakdown from ReplayMetrics
    if (sys.env.contains("SCRATCH_ST")) {
      val d = sys.env.getOrElse("SCRATCH_ST_DIR", "/tmp/graft-sf1")
      val names = sys.env.getOrElse("SCRATCH_ST_QUERIES",
        "st_stream_join,st_session_window,st_session_final,st_incremental_dedup")
        .split(",").map(_.trim).toSeq
      val partSweep = sys.env.getOrElse("SCRATCH_ST_PARTS", "4,8,16,32")
        .split(",").map(_.trim.toInt).toSeq
      val providers = sys.env.getOrElse("SCRATCH_ST_PROVIDERS", "hdfs")
        .split(",").map(_.trim).toSeq
      val all = SparkEntry.queries
      // one throwaway pass per query to absorb staging + codegen
      names.foreach { n =>
        try all(n)(spark, d).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"SCRATCH st warm $n FAILED: $e") }
      }
      for (r <- 1 to 2; prov <- providers; parts <- partSweep; n <- names) {
        if (prov == "rocksdb")
          sys.props("graft.stream.provider") =
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else sys.props.remove("graft.stream.provider")
        sys.props("graft.stream.parts") = parts.toString
        val t0 = System.nanoTime()
        val ok = try { all(n)(spark, d).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => println(s"SCRATCH st $n FAILED: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) {
          println(f"SCRATCH st[$n%-22s] prov=$prov%-7s parts=$parts%2d r$r ${dt}%6.2f s")
          val sink = n match {
            case "st_stream_join" => "st_stream_join_sink"
            case "st_session_window" => "st_session_window_sink"
            case "st_session_final" => "st_session_final_sink"
            case "st_incremental_dedup" => "st_incr_dedup"
            case other => other
          }
          (StreamOps.ReplayMetrics.details(sink) ++
            StreamOps.ReplayMetrics.details(n)).distinct
            .foreach(l => println(s"    $l"))
        }
      }
      sys.props.remove("graft.stream.parts")
      sys.props.remove("graft.stream.provider")
      spark.stop(); return
    }

    if (sys.env.contains("SCRATCH_TA")) {
      val d = sys.env.getOrElse("SCRATCH_TA_DIR", dir)
      def lagOrd = queries.TrafficQueries.queries("ta_speed_lag")(spark, d)
      def lagSwp = queries.TrafficQueries.taSpeedLagBody(spark, d)
        .sortWithinPartitions("event_id")
      def asofOrd = queries.TrafficQueries.queries("ta_asof_weather")(spark, d)
      def asofSwp = queries.TrafficQueries.taAsofWeatherBody(spark, d)
        .sortWithinPartitions("event_id")
      for (i <- 1 to 4) {
        time(s"lag ordBy r$i")(lagOrd)
        time(s"lag swp   r$i")(lagSwp)
        time(s"asof ordBy r$i")(asofOrd)
        time(s"asof swp   r$i")(asofSwp)
      }
      spark.stop(); return
    }

    // r20: geo_nearest_signal pass decomposition — where does the time
    // go at each SF? (a) position parse, (b) signal layer stage,
    // (c) pass-1 candidate join + argmin alone, (d) the full ladder.
    if (sys.env.contains("SCRATCH_GEO")) {
      val d = sys.env.getOrElse("SCRATCH_GEO_DIR", dir)
      import graft.functions.GeoFunctions
      import graft.operators.{GeoNearest, Par}
      def posOnly = queries.GeoQueries.pos(spark, d).select("event_id", "lat", "lon")
      def sigOnly = posOnly.filter(col("event_id") % 199 === 0)
        .select((col("event_id") / 199).cast("long").as("signal_id"),
          col("lat").as("s_lat"), col("lon").as("s_lon"))
      def full = SparkEntry.queries("geo_nearest_signal")(spark, d)
      // pass-1 only: ring-1 join + argmin, no ladder/net/union/sort
      def cellOf: Double = {
        val n = math.max(1L, Tables.events(spark, d).count() / 199)
        math.max(0.002, math.min(0.2,
          queries.GeoQueries.CellDeg * math.pow(500.0 / n.toDouble, 0.4)))
      }
      def pass1(cell: Double) = {
        val sig = sigOnly
          .withColumn("s_coslat", GeoFunctions.cosLat(col("s_lat")))
          .withColumn("sgx", GeoFunctions.gridX(col("s_lon"), GeoFunctions.KyivBounds._3, cell))
          .withColumn("sgy", GeoFunctions.gridY(col("s_lat"), GeoFunctions.KyivBounds._1, cell))
        val p = Par.spread(posOnly)
          .withColumn("coslat", GeoFunctions.cosLat(col("lat")))
          .withColumn("gx", GeoFunctions.gridX(col("lon"), GeoFunctions.KyivBounds._3, cell))
          .withColumn("gy", GeoFunctions.gridY(col("lat"), GeoFunctions.KyivBounds._1, cell))
        val sig9 = sig.select(col("signal_id"), col("s_lat"), col("s_lon"),
            col("s_coslat"), col("sgx").as("gx"), col("sgy").as("gy"))
          .select(col("signal_id"), col("s_lat"), col("s_lon"), col("s_coslat"),
            col("gx"), col("gy"), explode(sequence(lit(-1), lit(1))).as("__dx"))
          .select(col("signal_id"), col("s_lat"), col("s_lon"), col("s_coslat"),
            (col("gx") + col("__dx")).as("jgx"), col("gy"),
            explode(sequence(lit(-1), lit(1))).as("__dy"))
          .select(col("signal_id"), col("s_lat"), col("s_lon"), col("s_coslat"),
            col("jgx"), (col("gy") + col("__dy")).as("jgy"))
        val dist = GeoFunctions.haversineKmPre(
          col("lat"), col("lon"), col("coslat"),
          col("s_lat"), col("s_lon"), col("s_coslat"))
        val packed = when(col("signal_id").isNotNull,
          round(round(dist, 6) * lit(1e6)).cast("long") * lit(1L << 31) + col("signal_id"))
        p.join(sig9, col("gx") === col("jgx") && col("gy") === col("jgy"), "left_outer")
          .groupBy("event_id").agg(min(packed).as("m"))
      }
      val c = cellOf
      println(s"SCRATCH geo dir=$d cell=$c")
      for (i <- 1 to 3) {
        time(s"geo posOnly r$i")(posOnly)
        time(s"geo sig     r$i")(sigOnly)
        time(s"geo pass1   r$i")(pass1(c))
        time(s"geo full    r$i")(full)
      }
      spark.stop(); return
    }

    // r20: cell-exponent A/B for geo_nearest_signal — the 0.4 exponent
    // was probed BEFORE the r19 ring ladder existed; with survivors now
    // climbing 1->2->8 at x25 (not x289), a smaller cell (fewer ring-1
    // candidates, more survivors) may win. Results are exact for any
    // cell (checksummed here).
    if (sys.env.contains("SCRATCH_GEOCELL")) {
      val d = sys.env.getOrElse("SCRATCH_GEOCELL_DIR", "/tmp/graft-sf1")
      import graft.functions.GeoFunctions
      import graft.operators.GeoNearest
      val n = math.max(1L, Tables.events(spark, d).count() / 199)
      def run(cell: Double) = GeoNearest.nearest(
        queries.GeoQueries.pos(spark, d).select("event_id", "lat", "lon"),
        queries.GeoQueries.pos(spark, d).filter(col("event_id") % 199 === 0)
          .select((col("event_id") / 199).cast("long").as("signal_id"),
            col("lat").as("s_lat"), col("lon").as("s_lon")),
        cellDeg = cell,
        originLat = GeoFunctions.KyivBounds._1,
        originLon = GeoFunctions.KyivBounds._3,
        maxAbsLatDeg = GeoFunctions.KyivBounds._2,
        midRings = Seq(2),
        layerRows = if (sys.env.contains("SCRATCH_GEOCELL_NOBCAST")) None
          else Some(n))
      // sweep spec: comma-separated base:exp pairs, e.g. "0.05:0.4,0.035:0.5"
      val variants = sys.env.getOrElse("SCRATCH_GEOCELL_VARIANTS",
        "0.05:0.4,0.035:0.5,0.025:0.5,0.018:0.5")
        .split(",").toSeq.map { sp =>
          val Array(b, x) = sp.split(":"); (b.toDouble, x.toDouble) }
      val cells = variants.map { case (b, x) =>
        (s"b$b x$x", math.max(0.002, math.min(0.2, b * math.pow(500.0 / n, x)))) }
      println(s"SCRATCH geocell n=$n " + cells.map { case (t, c) =>
        f"$t=$c%.5f" }.mkString(" "))
      val reps = sys.env.getOrElse("SCRATCH_GEOCELL_REPS", "3").toInt
      for (i <- 1 to reps; (t, c) <- cells) time(s"cell $t r$i")(run(c))
      def sig(df: DataFrame) = df.selectExpr(
        "sum(hash(event_id, signal_id, cast(dist_km*1e6 as long))) as s",
        "count(*) as n").collect()(0).toString
      cells.foreach { case (t, c) =>
        println(s"SCRATCH geocell sig $t = " + sig(run(c))) }
      spark.stop(); return
    }

    // r20: run one query and dump per-operator metrics (rows, codegen
    // pipeline durations) from the executed plan — the UI-less stand-in
    // for the SQL tab.
    if (sys.env.contains("SCRATCH_METRICS")) {
      val d = sys.env.getOrElse("SCRATCH_METRICS_DIR", dir)
      val names = sys.env.getOrElse("SCRATCH_METRICS_QUERIES", "geo_nearest_signal")
        .split(",").map(_.trim).toSeq
      names.foreach { nm =>
        val df = SparkEntry.queries(nm)(spark, d)
        val t0 = System.nanoTime()
        // execute the df's OWN QueryExecution (a noop write would plan a
        // separate execution whose metrics we can't reach)
        spark.sparkContext.runJob(df.queryExecution.toRdd,
          (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
            var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n })
        println(f"SCRATCH metrics[$nm] total=${(System.nanoTime() - t0) / 1e9}%6.2f s")
        def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
          val ms = p.metrics.toSeq.sortBy(_._1).collect {
            case (k, m) if m.value > 0 &&
              (k.contains("Time") || k.contains("duration") ||
               k == "numOutputRows" || k.contains("build") || k.contains("sort")) =>
              s"$k=${m.value}"
          }.mkString(" ")
          val tag = p.nodeName
          if (ms.nonEmpty) println(("  " * depth) + s"$tag: $ms")
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan, depth + 1)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan, depth + 1)
            case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
              walk(r.child, depth + 1)
            case other => other.children.foreach(walk(_, depth + 1))
          }
        }
        walk(df.queryExecution.executedPlan, 0)
      }
      spark.stop(); return
    }

    // dd_ngram A/B: fused SortedShingleHashes path vs unfused raw path
    import graft.operators.Dedup
    val t = queries.DedupQueries.JaccardThreshold
    def ngramFused = Dedup.jaccardPairsPrefixFromText(
      Tables.documents(spark, dir), "doc_id", "text", 3, t)
      .repartition(1).dropDuplicates().sortWithinPartitions("a_id", "b_id")
    def ngramRaw = Dedup.jaccardPairsPrefixRaw(
      Dedup.hashShingles(
        Dedup.shingles(Tables.documents(spark, dir), "doc_id", "text", 3)), t)
      .repartition(1).dropDuplicates().sortWithinPartitions("a_id", "b_id")
    def ngramShared = {
      import graft.operators.Par
      val hs = Par.spread(Tables.documents(spark, dir)
        .select(col("doc_id").as("__id"), col("text").as("__text")))
        .select(col("__id"),
          coalesce(graft.plans.SortedShingleHashes(col("__text"), 3),
            array().cast("array<long>")).as("hs"))
        .withColumn("sz", size(col("hs")).cast("long"))
      val pre = hs.select(col("__id"), col("sz"), col("hs"),
        explode(slice(col("hs"), lit(1), greatest(lit(1),
          (col("sz") - ceil(col("sz") * t) + 1).cast("int")))).as("sg"))
      val ex = pre.repartition(col("sg"))
      val a = ex.select(col("__id").as("a_id"), col("sz").as("a_sz"),
        col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
      val b = ex.select(col("__id").as("b_id"), col("sz").as("b_sz"),
        col("hs").as("hs_b"), col("sg"))
      a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
        .withColumn("shared",
          graft.plans.SortedIntersectCount(col("hs_a"), col("hs_b")))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac")
        .repartition(1).dropDuplicates().sortWithinPartitions("a_id", "b_id")
    }
    for (i <- 1 to 4) {
      time(s"ngramFused  r$i")(ngramFused)
      time(s"ngramShared r$i")(ngramShared)
    }
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    println(s"SCRATCH shared identical=${rows(ngramFused) == rows(ngramShared)}")
    val dfS = ngramShared
    dfS.collect()
    val planStr = dfS.queryExecution.executedPlan.toString
    println("SCRATCH shared post-exec reuse: " +
      (planStr.contains("ReusedExchange") || planStr.contains("reused")) +
      " exchanges=" + "Exchange".r.findAllIn(planStr).length)
    ngramRaw.count() // keep raw referenced
    spark.stop()
  }
}
