package graft.table

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Column-level `WHEN MATCHED THEN UPDATE SET c = expr` (ANSI MERGE's
  * partial update): matched rows keep unassigned columns, assignments
  * may mix target (plain) and source ([[MergeInto.srcCol]]) values,
  * NOT MATCHED rows insert the full source row, delete-op rows delete.
  * Same file-bounded pruning as full-row merges; MOR additionally
  * reads the key-overlapping files (bounded) for unassigned columns. */
class MergeUpdateSetSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  private def rows(t: GraftTable) =
    t.read().select("id", "v", "n").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq

  test("COW: assigned columns update (source + target refs), unassigned " +
      "keep target values, not-matched inserts full rows") {
    val t = fresh("mus-cow")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"))
    val batch = Seq((2L, "B2", 999L), (4L, "d", 40L)).toDF("id", "v", "n")
    t.merge(batch, keys = Seq("id"), dedupKey = Seq("id"),
      orderCol = "id",
      // v from the source; n accumulates target + source — the batch's
      // n=999 must NOT replace, and unmatched row 4 inserts raw
      updateSet = Some(Seq(
        "v" -> MergeInto.srcCol("v"),
        "n" -> (col("n") + MergeInto.srcCol("n")))))
    assert(rows(t) === Seq((1L, "a", 10L), (2L, "B2", 1019L),
      (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("MOR: same semantics through tombstone + re-insert; delete branch " +
      "still deletes; repeated merges accumulate") {
    val t = fresh("mus-mor")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "n"))
    def step(batch: Seq[(Long, String, Long, String)]): Unit =
      t.merge(batch.toDF("id", "v", "n", "op"),
        keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
        opCol = Some("op"), mode = "mor",
        updateSet = Some(Seq("n" -> (col("n") + MergeInto.srcCol("n")))))
    step(Seq((1L, "x", 5L, null), (3L, "c", 30L, null)))
    // 1 matched: v KEPT (unassigned), n = 10+5; 3 inserted raw
    assert(rows(t) === Seq((1L, "a", 15L), (2L, "b", 20L), (3L, "c", 30L)))
    step(Seq((1L, "y", 5L, null), (2L, "z", 0L, "D")))
    assert(rows(t) === Seq((1L, "a", 20L), (3L, "c", 30L)))
    // unmatched delete-op row: dropped, not inserted
    step(Seq((9L, "g", 1L, "D")))
    assert(rows(t) === Seq((1L, "a", 20L), (3L, "c", 30L)))
  }

  test("assigning a merge key or an unknown column fails loud") {
    val t = fresh("mus-guard")
    t.append(Seq((1L, "a", 10L)).toDF("id", "v", "n"))
    val b = Seq((1L, "x", 1L)).toDF("id", "v", "n")
    val e1 = intercept[IllegalArgumentException](
      t.merge(b, Seq("id"), Seq("id"), "id",
        updateSet = Some(Seq("id" -> lit(9L)))))
    assert(e1.getMessage.contains("merge key"))
    val e2 = intercept[IllegalArgumentException](
      t.merge(b, Seq("id"), Seq("id"), "id",
        updateSet = Some(Seq("nope" -> lit(9L)))))
    assert(e2.getMessage.contains("unknown column"))
  }

  test("syncDelete (WHEN NOT MATCHED BY SOURCE THEN DELETE): target-only " +
      "rows vanish; matched update + source-only insert still apply") {
    val t = fresh("mus-sync")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"))
    // full-row replace + sync: result ≡ the deduped source
    t.merge(Seq((2L, "B", 200L), (4L, "d", 40L)).toDF("id", "v", "n"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      syncDelete = true)
    assert(rows(t) === Seq((2L, "B", 200L), (4L, "d", 40L)))
    // partial update + sync: matched keeps unassigned target columns
    t.merge(Seq((4L, "ZZZ", 2L), (7L, "g", 70L)).toDF("id", "v", "n"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      updateSet = Some(Seq("n" -> (col("n") + MergeInto.srcCol("n")))),
      syncDelete = true)
    assert(rows(t) === Seq((4L, "d", 42L), (7L, "g", 70L)))
    // time travel still sees the pre-sync states
    assert(t.readAsOf(1L).count() === 3)
  }

  test("SQL MERGE: NOT MATCHED BY SOURCE DELETE end to end") {
    val wh = tmpDir("mus-sync-sql-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    cat.createFrom("mus_sync",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    cat.register("mus_sync")
    Seq((2L, "B"), (9L, "i")).toDF("id", "v")
      .createOrReplaceTempView("mus_sync_src")
    spark.sql(
      """MERGE INTO mus_sync t USING mus_sync_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT id, v FROM mus_sync ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((2L, "B"), (9L, "i")))
    cat.drop("mus_sync")
  }

  test("updateCond (WHEN MATCHED AND cond THEN UPDATE): failing or NULL " +
      "condition keeps the target row; composes with full-row and " +
      "column-level updates, COW and MOR") {
    val t = fresh("mus-cond")
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"))
    // full-row + condition on the SOURCE value: only n>=100 replaces
    t.merge(Seq((1L, "A", 100L), (2L, "B", 5L), (4L, "d", 40L))
      .toDF("id", "v", "n"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      updateCond = Some(MergeInto.srcCol("n") >= 100L))
    assert(rows(t) === Seq((1L, "A", 100L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
    // column-level + condition on the TARGET value, MOR mode
    t.merge(Seq((2L, "x", 1L), (3L, "y", 1L)).toDF("id", "v", "n"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      mode = "mor",
      updateSet = Some(Seq("n" -> (col("n") + MergeInto.srcCol("n")))),
      updateCond = Some(col("n") >= 30L)) // only id=3 passes (n=30)
    assert(rows(t) === Seq((1L, "A", 100L), (2L, "b", 20L),
      (3L, "c", 31L), (4L, "d", 40L)))
    // NULL condition = clause does not fire (three-valued logic)
    t.merge(Seq((4L, "Z", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "v", "n"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id",
      updateCond = Some(MergeInto.srcCol("n") > 0L))
    assert(rows(t).find(_._1 == 4L).get === ((4L, "d", 40L)))
  }

  test("SQL MERGE: conditional matched update end to end") {
    val wh = tmpDir("mus-cond-sql-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    cat.createFrom("mus_cond",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "n"))
    cat.register("mus_cond")
    Seq((1L, "A", 5L), (2L, "B", 99L), (7L, "g", 1L))
      .toDF("id", "v", "n").createOrReplaceTempView("mus_cond_src")
    spark.sql(
      """MERGE INTO mus_cond t USING mus_cond_src s ON t.id = s.id
        |WHEN MATCHED AND s.n > t.n THEN UPDATE SET v = s.v, n = s.n
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, v, n FROM mus_cond ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "a", 10L), (2L, "B", 99L), (7L, "g", 1L)))
    cat.drop("mus_cond")
  }

  test("SQL MERGE with column-level UPDATE SET (incl. t./s. refs)") {
    val wh = tmpDir("mus-sql-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    cat.createFrom("mus_sql",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "n"))
    cat.register("mus_sql")
    Seq((2L, "B2", 7L), (5L, "e", 50L)).toDF("id", "v", "n")
      .createOrReplaceTempView("mus_src")
    spark.sql(
      """MERGE INTO mus_sql t USING mus_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, v, n FROM mus_sql ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "a", 10L), (2L, "B2", 27L), (5L, "e", 50L)))
    cat.drop("mus_sql")
  }
}
