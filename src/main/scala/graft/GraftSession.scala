package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local mode is a stand-in for a multi-executor cluster: nothing here
  * hardcodes partition counts into operator code — shuffle parallelism is
  * session-level so a cluster deploy only changes the builder args.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // InferFiltersFromGenerate duplicates the generator child into a
      // synthesized Filter (size(expr)>0 AND isnotnull(expr)) that predicate
      // pushdown then moves below repartition exchanges — for computed arrays
      // (HOF shingle/n-gram trees, interpreted eval) that re-evaluates the
      // expensive expression twice per row on the narrow pre-shuffle side.
      // Measured 11x on explode(shingleSet): 5.6s -> 0.5s at sf0.1. Generate
      // itself skips empty/null arrays, so excluding the rule is semantics-free.
      // InferFiltersFromConstraints does the same via inferred
      // isnotnull(derived-col): the null-check inlines the full derived
      // expression and pushes it below the spread. Our join keys/filters are
      // on never-null derived columns, so the inferred filters only cost.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate," +
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints")
      // Scan-split size for the LOCAL harness: the fixtures are single
      // files (tens of MB), so the 128 MB cluster default plans every
      // scan as ONE split and serializes it on one of 32 cores — the
      // sf1 lineitem (113 MB, 2 MB row groups via GenScale) scans
      // 32-wide with this, single-threaded without it. A cluster
      // deployment, whose files arrive in many 100 MB+ splits, raises
      // this back to the standard default via the env override — like
      // shufflePartitions, it is a deployment knob, not operator
      // semantics.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", (2L * 1024 * 1024).toString))
      // AQE's coalesce floor (default 1 MB) serializes CPU-bound
      // post-shuffle stages at this harness's data sizes: the slim
      // per-vehicle lag window shuffles ~10 MB compressed at sf1 and
      // was coalesced to a handful of tasks on a 32-core box (window
      // sort + haversine are compute-bound, not IO-bound — measured
      // 0.52 → 0.39 s on ta_speed_lag at sf1). On a cluster feed the
      // shuffle dwarfs any floor and the knob is inert; like
      // maxPartitionBytes above it scales with the harness, not the
      // operators.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE_BYTES", (256L * 1024).toString))
      // managed (bucketed) tables land in scratch, not the repo cwd
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // Report the sortBy order of bucketed scans (off by default
      // since 3.0 because a multi-file bucket can't guarantee it, and
      // the check lists files at planning). Bucketing.writeBucketed
      // repartitions on the bucket column before the write, so every
      // bucket is ONE sorted file by construction and the co-located
      // merge join runs sort-free — without this conf the join
      // re-sorts both pre-sorted sides on every query, which is the
      // cost the layout exists to pre-pay. The planning-time listing
      // is the same InMemoryFileIndex the scan builds anyway.
      // UPGRADE CHECKLIST (Spark-version dependence): this is a legacy
      // conf, a removal candidate in future Spark majors. Correctness
      // never depends on it — FileSourceScanExec only CLAIMS the sort
      // order when every bucket is a single file, which writeBucketed
      // guarantees — but if a Spark bump drops the conf, the bucket
      // join silently re-sorts. BucketingSpec's sort-free plan-shape
      // assertion is the tripwire: it fails on such an upgrade.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // Shuffle/spill scratch on tmpfs when the host has one. Every
      // local-mode shuffle map task commits its output under ONE
      // IndexShuffleBlockResolver lock (writeIndexFileAndCommit is
      // synchronized on the resolver), so the lock hold time is a
      // file create+write+rename on spark.local.dir — on this
      // container's virtio root disk that stalls for 1-20 ms under
      // host write-back pressure and serializes all 32 cores behind
      // it. A JFR profile of the "damaged" bistable bench state
      // (SURVEY §15) measured 48.8 s of IndexShuffleBlockResolver
      // monitor-blocked time in a 90 s window — the flat ~+0.3 s
      // per-query tax was THIS, not janino/dispatch. tmpfs makes the
      // critical section microseconds again. A cluster deployment
      // points this at its local SSDs via the env override — the
      // standard knob (spark.local.dir), not operator semantics.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", defaultLocalDir))
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read as Long (ns since epoch) and convert in-plan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // The generated-class cache defaults to 100 entries; an engine
      // serving a ~100-query registry (each plan several codegen units)
      // evicts the whole working set every cycle and re-pays janino
      // compilation (~20-100 ms/unit) on every execution of every
      // query. Sized for the registry plus headroom — compiled classes
      // are small; this is standard tuning for a diverse query mix.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Session-window aggs: merge sessions map-side BEFORE the state
      // shuffle. The synthetic stream compresses ~10:1 (1M events →
      // 95k sessions at sf1), so pre-merging cuts both shuffle rows
      // and per-row state-store updates by that factor for one extra
      // in-partition sort — the right default for any engine whose
      // session streams compress, and measured ~0.2-0.3 s off
      // st_session_window's sf1 replay.
      .config("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true")
      // FileOutputCommitter v2 renames task output straight into the
      // destination at task commit instead of staging it for a second,
      // DRIVER-SEQUENTIAL rename pass at job commit. On the local-FS
      // bench this is noise (renames are ~free), but on an HDFS-backed
      // cluster the v1 job-commit loop serializes one namenode rename
      // per file — for the dated sinks that is |dates| x filesPerDate
      // renames on the driver per micro-batch. Tasks here are
      // deterministic, so a retried task rewrites identical bytes and
      // v2's weaker failure atomicity cannot produce a wrong zone;
      // recovery-critical writes (runToDatedRecoverable) additionally
      // gate visibility on their own _commits markers and never trust
      // directory presence alone.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // Spark 4.1 turned on checkpoint-file checksums by default
      // (spark.sql.streaming.checkpoint.fileChecksum.enabled, new in
      // 4.1): EVERY checkpoint file — offset/commit WAL entries and
      // every state-store delta/snapshot per partition per batch —
      // gets a companion .crc file written on commit and re-read on
      // load. That is a file-corruption guard for DURABLE checkpoint
      // storage (HDFS/S3 bit rot); the replay harness checkpoints are
      // ephemeral tmpfs scratch rebuilt per run, where the companion
      // files are pure per-batch file-op overhead on the micro-batch
      // floor (measured A/B in OPTIMIZATION_r20.md). A deployment
      // with durable checkpoints re-enables via the env override —
      // a durability knob, not operator semantics.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      .config("spark.ui.enabled", "false")

  /** tmpfs scratch consumes RAM, so preferring /dev/shm is gated on a
    * usable-space floor (spills that should RELIEVE memory pressure
    * must not instead fill tmpfs to ENOSPC / cgroup OOM), and scratch
    * is laid out one subdirectory per JVM pid so a session start can
    * reclaim what a CRASHED JVM leaked — on tmpfs that leak is resident
    * RAM until reboot, not just disk. Only dirs whose owning pid is
    * dead (/proc/<pid> gone) are removed: a concurrently-running graft
    * JVM (bench re-roll child, driver beside builder) keeps its live
    * shuffle files. Falls back to java.io.tmpdir below the floor. */
  private[graft] def defaultLocalDir: String = {
    val shm = new java.io.File("/dev/shm")
    val floorBytes = 4L * 1024 * 1024 * 1024
    if (shm.canWrite && shm.getUsableSpace > floorBytes) {
      val root = new java.io.File(shm, "graft-local")
      root.mkdirs()
      val live = java.lang.ProcessHandle.current().pid()
      Option(root.listFiles()).getOrElse(Array.empty).foreach { d =>
        d.getName match {
          case s if s.startsWith("pid-") =>
            val pid = s.stripPrefix("pid-")
            // isDigit keeps the original guard (signed suffixes like
            // "pid--123" stay left-for-their-owner, never reclaimed);
            // Try adds overflow tolerance — an all-digit suffix wider
            // than Long.MaxValue is skipped, not a startup crash
            val dead = pid.forall(_.isDigit) &&
              scala.util.Try(pid.toLong).toOption.exists(p =>
                p != live && !java.nio.file.Files.isDirectory(
                  java.nio.file.Paths.get("/proc", pid)))
            if (dead) deleteRecursive(d)
          case _ => () // pre-layout flat scratch: left for its owner
        }
      }
      new java.io.File(root, s"pid-$live").getPath
    } else sys.props("java.io.tmpdir")
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete()
    ()
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pinCodegenCache(spark)
    spark
  }

  /** JVM-once: forces `codegen.CodeGenerator`'s static initializer to
    * run while THIS session's conf is what `SQLConf.get` resolves, so
    * the GLOBAL generated-class cache is built at the session's
    * `spark.sql.codegen.cache.maxEntries` (5000, sized for the
    * registry) instead of the 100-entry default.
    *
    * The cache size is read exactly ONCE, in the object's static init
    * (verified in the Spark 4.1 bytecode: `SQLConf.get
    * .codegenCacheMaxEntries` inside `CodeGenerator$.<clinit>`). If the
    * class happens to first load on a thread where no session conf is
    * visible — a race decided by warmup concurrency, observed flipping
    * BISTABLY across identical full-suite benches — the cache is 100
    * entries for the JVM's lifetime and the ~100-query registry evicts
    * its compiled classes every pass: every query re-pays janino,
    * ~+0.4 s each, +14 s on the suite (the round-13 thrash, back as a
    * heisenbug). Pinning the init deterministically closes it. */
  private val codegenCachePinned = new java.util.concurrent.atomic.AtomicBoolean(false)
  def pinCodegenCache(spark: SparkSession): Unit =
    if (codegenCachePinned.compareAndSet(false, true)) {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      // any class-load of the object runs its static initializer
      Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      ()
    }

  /** Idempotently equips an EXISTING session (one not built via
    * [[builder]], so without `spark.sql.extensions=graft.GraftExtensions`)
    * to run every SparkEntry query: registers the custom Catalyst
    * functions, adds the GeoRange optimizer rule, and sets the two
    * non-static confs correctness depends on (ns-as-long parquet reads
    * and the UTC session timezone the oracles assume). Called from
    * SparkEntry on every query dispatch; a GraftSession-built session
    * short-circuits on the functionExists probe. */
  def ensureFunctions(spark: SparkSession): SparkSession = {
    pinCodegenCache(spark)
    if (!spark.catalog.functionExists("array_dot")) {
      GraftExtensions.functions.foreach { case (id, info, b) =>
        org.apache.spark.sql.GraftRegistryBridge.register(spark, id, info, b)
      }
      if (!spark.experimental.extraOptimizations.contains(graft.plans.GeoRangeRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.GeoRangeRule
      }
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    spark
  }
}
