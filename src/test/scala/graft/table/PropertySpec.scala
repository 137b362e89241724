package graft.table

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.ingest.Checkpoint

/** Property tests promised in SURVEY.md §5: merge-vs-model equivalence,
  * checkpoint monotonicity, minhash estimate accuracy. Generated with
  * seeded ScalaCheck Gens (plain — the scalatestplus bridge isn't in the
  * offline cache); few, small cases since each spins real Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val batchGen: Gen[List[(Long, String)]] = Gen.listOfN(6,
    Gen.zip(Gen.choose(1L, 5L), Gen.alphaLowerStr.map(_.take(4))))

  test("merge sequence converges to the in-memory upsert model") {
    for (round <- 1 to 3) {
      val batches = sample(Gen.listOfN(3, batchGen), 1000 + round)
      val t = GraftTable(spark, tmpDir(s"prop-merge-$round") + "/t")
      t.create(Seq((0L, "x", 0L)).toDF("k", "v", "ts").schema)
      val model = scala.collection.mutable.Map.empty[Long, String]
      var ts = 0L
      batches.foreach { batch =>
        // unique, increasing ts per row → keep-latest is unambiguous
        val rows = batch.map { case (k, v) => ts += 1; (k, v, ts) }
        t.merge(rows.toDF("k", "v", "ts"), keys = Seq("k"),
          dedupKey = Seq("k"), orderCol = "ts")
        rows.groupBy(_._1).foreach { case (k, rs) =>
          model(k) = rs.maxBy(_._3)._2
        }
      }
      val got = t.read().select("k", "v").as[(Long, String)].collect().toMap
      assert(got === model.toMap, s"round $round diverged from model")
    }
  }

  test("checkpoint is last-writer-wins and survives reloads") {
    for (round <- 1 to 3) {
      val values = sample(Gen.listOfN(5, Gen.choose(0L, 1000000L)), 2000 + round)
      val ck = new Checkpoint(spark, tmpDir(s"prop-ck-$round") + "/ck.json")
      values.foreach(v => ck.save("w", v))
      assert(ck.load("w") === Some(values.last))
    }
  }

  test("stats pruning is conservative: a file containing v is NEVER skipped") {
    // random multi-file tables + random point/range lookups: every row
    // that exists must be found (false positives only cost IO; a false
    // NEGATIVE would silently lose data)
    for (round <- 1 to 3) {
      val ids = sample(Gen.listOfN(60,
        Gen.choose(-100000L, 100000L)), 5000 + round).distinct
      val strs = sample(Gen.listOfN(60,
        Gen.alphaNumStr.map(_.take(12))), 6000 + round)
      val rows = ids.zipAll(strs.take(ids.size), 0L, "pad")
      val dir = tmpDir(s"prop-stats-$round") + "/t"
      val t = GraftTable(spark, dir)
      t.create(Seq((0L, "")).toDF("id", "v").schema,
        properties = Map("graft.bloom.columns" -> "id,v"))
      // three unclustered appends → overlapping ranges, blooms active
      rows.grouped(math.max(rows.size / 3, 1)).foreach { g =>
        t.append(g.toDF("id", "v").coalesce(1))
      }
      val all = spark.read.format("graft").load(dir)
      // every present id is found via equality (bloom + min/max in play)
      val probes = sample(Gen.pick(10, ids), 7000 + round).toSeq
      probes.foreach { id =>
        assert(all.filter(col("id") === id).count() >= 1L,
          s"row id=$id lost by pruning (round $round)")
      }
      // range scans agree with the unpruned ground truth
      val lo = sample(Gen.choose(-100000L, 100000L), 8000 + round)
      val expect = rows.count(_._1 >= lo).toLong
      assert(all.filter(col("id") >= lo).count() === expect)
      // string equality probes
      rows.take(5).foreach { case (_, v) =>
        assert(all.filter(col("v") === v).count() ===
          rows.count(_._2 == v).toLong)
      }
    }
  }

  test("minhash similarity estimate tracks true jaccard") {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docGen = Gen.listOfN(30, Gen.oneOf(words)).map(_.mkString(" "))
    for (round <- 1 to 3) {
      val a = sample(docGen, 3000 + round)
      val b = sample(docGen, 4000 + round)
      val df = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
      val sig = graft.operators.Dedup
        .minhashSignatures(df, "doc_id", "text", 3, 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sig(0L).zip(sig(1L)).count { case (x, y) => x == y } / 64.0
      val sh = df.select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val truth = sh(0L).intersect(sh(1L)).size.toDouble /
        sh(0L).union(sh(1L)).size
      assert(math.abs(est - truth) <= 0.35,
        s"minhash estimate $est vs true $truth (round $round)")
    }
  }
}
