package graft

import org.apache.spark.sql.functions._
import graft.crmls.Crmls

/** Runnable end-to-end demo of the CRMLS pipeline through the public
  * API: six envelope streams -> projection -> latest-version dedup ->
  * 11-way role-aliased left join. Prints the joined table.
  *
  * `sbt "runMain graft.Demo"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 4, appName = "graft-demo")
    import spark.implicits._

    def env(pk: String, ts: Long, data: String): String = {
      val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
        s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
        s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
    }

    val raw = Map(
      "listings" -> Seq(
        env("L1", 100, """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1","BuyerAgentKeyNumeric":"A2","ListOfficeKeyNumeric":"O1"}"""),
        env("L1", 200, """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1","ListOfficeKeyNumeric":"O1"}"""),
        env("L2", 150, """{"ListingKeyNumeric":"LK2"}""")),
      "agents" -> Seq(
        env("A1", 10, """{"name":"agent one v1"}"""),
        env("A1", 20, """{"name":"agent one v2"}"""),
        env("A2", 10, """{"name":"agent two"}""")),
      "openhouses" -> Seq(env("OH1", 5, """{"ListingKeyNumeric":"LK1"}""")),
      "offices" -> Seq(env("O1", 7, """{"name":"office"}""")),
      "media" -> Seq(env("M1", 3, """{"ResourceRecordKeyNumeric":"L1"}""")),
      "history" -> Seq(env("H1", 4, """{"ResourceRecordKeyNumeric":"L2"}"""))
    ).map { case (k, v) => k -> v.toDF("value") }

    val joined = Crmls.pipeline(raw)
    joined.select("l_uc_pk", "l_uc_created_ts", "aa_uc_pk", "ab_uc_pk",
      "o_listing_key", "oa_uc_pk", "m_resource_record_key",
      "h_resource_record_key")
      .orderBy("l_uc_pk")
      .show(truncate = false)
    println(s"[demo] joined rows: ${joined.count()}")
    joined.explain("formatted")

    // SQL surface of the native expressions — injected by
    // GraftExtensions via the session factory's spark.sql.extensions
    // config (no manual registration)
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    println(s"[demo] graft_dot via SQL (extension-injected): $d")

    // co-located (bucketed) join: no shuffle exchange in the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val fact = (1 to 10000).map(i => (i.toLong % 500, s"f$i")).toDF("k", "f")
    val dim = (1 to 5000).map(i => (i.toLong % 500, s"d$i")).toDF("k", "d")
    sources.Sinks.writeBucketed(fact, "demo_fact_b", 8, Seq("k"), Seq("k"))
    sources.Sinks.writeBucketed(dim, "demo_dim_b", 8, Seq("k"), Seq("k"))
    val bj = sources.Sinks.bucketedJoin(spark, "demo_fact_b", "demo_dim_b", Seq("k"))
    val shuffles = bj.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    println(s"[demo] bucketed join rows=${bj.count()} shuffle-exchanges=$shuffles")
    spark.sql("DROP TABLE IF EXISTS demo_fact_b")
    spark.sql("DROP TABLE IF EXISTS demo_dim_b")

    // streaming event-time as-of join: probe buffers on the watermark,
    // late-but-in-bound build version wins
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingAsOf
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, java.sql.Timestamp, Boolean, String)]
      def t(sec: Int) = new java.sql.Timestamp(1700000040000L + sec * 1000L)
      val tagged = in.toDF().toDF("key", "event_ts", "isProbe", "payload")
        .withWatermark("event_ts", "30 seconds")
        .select(col("key"), col("event_ts").as("ts"), col("isProbe"), col("payload"))
        .as[StreamingAsOf.Tagged]
      val q = StreamingAsOf.asOfStream(tagged)
        .writeStream.format("memory").queryName("demo_asof")
        .outputMode("append").start()
      in.addData(("k", t(40), true, "probe@40"), ("k", t(10), false, "build@10"))
      q.processAllAvailable()
      in.addData(("k", t(35), false, "build@35"), ("k", t(90), false, "advance"))
      q.processAllAvailable()
      in.addData(("z", t(95), false, "noop"))
      q.processAllAvailable()
      q.stop()
      spark.table("demo_asof").show(truncate = false)
    }
    // training-data assembly: content-addressed split -> cross-split
    // contamination check -> concat-and-chunk packing of the train set
    {
      import graft.operators.TrainingOps
      import graft.functions.{TextFunctions => TF}
      def body(i: Long) = (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      val base = (1L to 200L).map(i => (i, body(i))).toDF("doc_id", "text")
      val split = TrainingOps.assignSplit(base, "doc_id")
      split.groupBy("split").count().orderBy("split").show()
      // plant a leak: one eval doc becomes a verbatim copy of a train doc
      val assign = split.select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val trainDoc = assign.collectFirst { case (id, "train") => id }.get
      val evalDoc = assign.collectFirst { case (id, s) if s != "train" => id }.get
      val corpus = base.withColumn("text",
        when(col("doc_id") === evalDoc, lit(body(trainDoc))).otherwise(col("text")))
      val leaks = TrainingOps.crossSplitContamination(corpus, "doc_id", "text", n = 3)
        .orderBy(col("n_contaminated").desc)
      println(s"[demo] planted: eval doc $evalDoc copies train doc $trainDoc; " +
        "contamination report:")
      leaks.show(5, truncate = false)
      val packed = TrainingOps.packSequences(
        split.filter(col("split") === "train"), "doc_id",
        TF.tokenCount(col("text")), capacity = 64)
      val bins = packed.select("pack_shard", "pack_bin").distinct().count()
      println(s"[demo] train docs packed into $bins bins of 64 tokens")
    }

    // ---- round-8 addition: the streaming job's incremental
    // maintenance, end to end — six-topic batches through
    // CrmlsStream.processBatch against the LSM state store + delta
    // sink, a dimension-only batch propagating through the reverse
    // index without recomputing the world, and a search over the
    // round-8 graph index serving path
    {
      import graft.streaming.{CrmlsStream, UpsertJoin}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-demo-stream").toString
      val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
      val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/sink",
        nBuckets = 16, deltaCompactEvery = 4)
      def tagged(rows: (String, String)*) =
        rows.toSeq.toDF("entity", "value")
      // batch 1: facts + dims
      CrmlsStream.processBatch(spark, tagged(
        ("listings", env("L1", 100,
          """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1"}""")),
        ("listings", env("L2", 100,
          """{"ListingKeyNumeric":"LK2","ListAgentKeyNumeric":"A1"}""")),
        ("agents", env("A1", 10, """{"name":"v1"}"""))), store, sink)
      // batch 2: DIMENSION-ONLY update — both listings' agent role
      // columns heal through the reverse index; per-batch durable I/O
      // is the delta (pending generations), not the state
      CrmlsStream.processBatch(spark, tagged(
        ("agents", env("A1", 20, """{"name":"v2"}"""))), store, sink)
      val outRows = sink.snapshot(spark)
        .select("l_uc_pk", "aa_uc_pk", "aa_uc_created_ts")
        .orderBy("l_uc_pk")
      println("[demo] streaming upsert sink after a dim-only batch " +
        "(both listings carry the agent's v2 timestamp):")
      outRows.show(truncate = false)
      val pend = new java.io.File(s"$tmp/state/agents/__pending")
      println(s"[demo] LSM state tier: agent updates live as pending " +
        s"generations (${Option(pend.listFiles()).map(_.count(
          _.getName.startsWith("g"))).getOrElse(0)} gens) until a fold " +
        "— per-batch state I/O is delta-sized")
    }

    // ---- round-7 additions: distributed graph index + embedding PCA
    {
      import graft.operators.{GraphAnnDist, Pca}
      val emb = sources.Tables.load(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        "embeddings")
      val edges = GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
        nCells = 8, m = 4, mCells = 2)
      val appended = GraphAnnDist.appendToIndex(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", nCells = 8, m = 4)
      println(s"[demo] distributed NSW index: ${edges.count()} edges " +
        s"built, ${appended.count()} edges from an incremental append")
      val hits = GraphAnnDist.searchIndex(emb, edges,
        emb.filter(col("vec_id") < 4), "vec_id", "embedding",
        nCells = 8, k = 3, ef = 32)
      println(s"[demo] beam search over the index (4 probes, top-3): " +
        s"${hits.count()} hits")
      val diag = Pca.diagnostics(emb, "embedding", dim = 64, iters = 6)
        .head()
      println(f"[demo] embedding health: trace=${diag.getDouble(1)}%.4f " +
        f"lambda1=${diag.getDouble(2)}%.4f " +
        f"isotropy_ratio=${diag.getDouble(3)}%.3f (1.0 = isotropic)")
    }
    spark.stop()
  }
}
