package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line
  * {"metric":...,"value":total_sec,"unit":"sec","queries":{name:sec},"sf":...}.
  *
  * Headline = the analytical + north-star operator queries, PLUS the
  * table-lifecycle queries (append→merge→read against scratch graft
  * tables: COW merge, MOR merge, incremental scan) — the merge path is
  * the product, so its number must be able to regress. Lifecycle numbers
  * include scratch-dir IO by construction; they are comparable
  * round-over-round since the recipe is fixed.
  *
  * Timing: one JVM/session warm-up action, then three timed runs per
  * query keeping the min (steady-state number, JIT/codegen-cache warm —
  * the figure that projects to a long-running cluster). The session's
  * cache manager is cleared between queries so one query's cached/
  * checkpointed frames cannot bleed into another's timing (the r2
  * q_ann_topk noise source).
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_agg", "q3_shipping", "q4_semi", "q5_local_supplier", "q6_forecast",
    "q10_returned", "q_rollup", "q_count_distinct",
    "q_filter_project", "q_window_dedup", "q_merge_upsert",
    "q_join_enrich", "q_topk", "q_count",
    "q_events_daily", "q_events_sessions", "q_funnel",
    "q_doc_stats", "q_token_count", "q_quality", "q_lang_id", "q_fingerprint",
    "q_bm25", "q_diversity", "q_decontaminate", "q_pack",
    "q_repetition", "q_span_dedup", "q_source_mix", "q_quality_classifier",
    "q_lm_score", "q_inverted_index",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_jaccard",
    "q_dedup_embedding", "q_ann_topk", "q_ann_lsh", "q_ann_ivf",
    "q_embed_norm", "q_kmeans", "q_semdedup",
    // table lifecycle (scratch-table append + merge + read per run)
    "q_table_merge", "q_table_merge_mor", "q_incremental_scan",
    "q_sql_merge", "q_hidden_partition", "q_sql_rowlevel", "q_stream_table",
    "q_table_changes")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // bound status-store growth across the ~35-query session so late
      // queries aren't taxed by state accumulated from earlier ones
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.sql.ui.retainedExecutions", "20")
      // shuffle/spill on tmpfs when available — same rationale as
      // Scratch.baseDir (disk weather must not show up as query time)
      .config("spark.local.dir", s"${graft.queries.Scratch.baseDir}/graft-spark-local")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warm-up: JVM, codegen, parquet footer cache
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val queries = SparkEntry.queries
    val results = headline.filter(queries.contains).map { name =>
      val fn = queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val runs = Seq.fill(3)(once())
      // level the field for the next query: cached frames from this one
      // (merge batch caches, checkpoint shadows) must not perturb it.
      // localCheckpoint blocks are NOT covered by clearCache — they free
      // only when the ContextCleaner sees their RDDs unreferenced, so
      // nudge a GC or ~150 runs of leftovers pile onto the heap and
      // late-session queries (the scale tier) measure memory pressure,
      // not plan cost (observed: 3-5× inflation on the 10× minhash)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val ok = runs.filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    // ---- 10× scale tier: the heavy operators against a corpus an order
    // of magnitude past the correctness gate's, pinning the linearity the
    // designs claim (generated once from the sf dir, reused across runs;
    // single timed run each — the point is the CURVE, not the millisecond)
    val scaleQueries = Seq("q_dedup_minhash", "q_ann_ivf", "q_table_merge",
      "q_table_merge_mor", "q_hidden_partition")
    val scaleResults: Seq[(String, Double)] =
      if (sys.env.get("SPARK_GRAFT_SCALE_TIER").contains("off")) Seq.empty
      else try {
        val scaleDir = graft.tools.ScaleUp.ensure(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
            s"${graft.queries.Scratch.baseDir}/graft-scale10x"))
        scaleQueries.filter(queries.contains).map { name =>
          // min-of-2: the base numbers are warm min-of-3, so a single
          // cold run would overstate the scaling ratio with FS-cache
          // and codegen noise
          def once(): Double = {
            val t0 = System.nanoTime()
            try { queries(name)(spark, scaleDir).queryExecution.toRdd.count()
              (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable =>
              System.err.println(s"[bench] scale $name failed: ${e.getMessage}")
              -1.0 }
            finally { spark.sharedState.cacheManager.clearCache(); System.gc() }
          }
          val runs = Seq.fill(2)(once()).filter(_ >= 0)
          name -> (if (runs.isEmpty) -1.0 else runs.min)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scale tier skipped: ${e.getMessage}")
        Seq.empty
      }
    val scaleJson = scaleResults.map { case (k, v) =>
      val base = results.toMap.getOrElse(k, -1.0)
      val ratio = if (base > 0 && v >= 0) v / base else -1.0
      "\"" + k + "\":{\"sec\":" + v + ",\"vs_base\":" +
        f"$ratio%.2f" + "}"
    }.mkString("{", ",", "}")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // breakdown: core30_sec is the round-1-comparable analytical set;
    // lifecycle_sec covers the scratch-table append+merge+read queries
    // added in round 2 (they include scratch-dir DDL/IO by construction)
    val lifecycle = Set("q_table_merge", "q_table_merge_mor",
      "q_incremental_scan", "q_sql_merge", "q_hidden_partition",
      "q_sql_rowlevel", "q_stream_table", "q_table_changes")
    val coreSec = results.filterNot(r => lifecycle(r._1))
      .map(_._2).filter(_ >= 0).sum
    val lifeSec = results.filter(r => lifecycle(r._1))
      .map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","core30_sec":$coreSec,"lifecycle_sec":$lifeSec,"queries":$qs,"scale10x":$scaleJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
