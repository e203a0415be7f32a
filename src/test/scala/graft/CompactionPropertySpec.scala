package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, Selection}

/** Property-based differentials for the sort-free typed aggregates: on
  * randomized datasets (duplicate keys, tied versions broken by a unique
  * seq, NULL scores, skewed groups) the aggregate forms must equal their
  * window-spelling references row-for-row, across partitionings. */
class CompactionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, version, seq, payload): seq is unique → (version, seq) totally
  // orders every key group, the determinism contract of both operators
  private def rowsGen(n: Int): Gen[List[(String, Int, Long, String)]] =
    Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c", "hot", "hot", "hot") // skew toward one group
      v <- Gen.choose(0, 5)                              // deliberate version ties
      p <- Gen.alphaNumStr.map(_.take(6))
    } yield (k, v, 0L, p))
      .map(_.zipWithIndex.map { case ((k, v, _, p), i) => (k, v, i.toLong, p) })

  private def dataset(seed: Long, n: Int) =
    rowsGen(n).apply(Gen.Parameters.default, Seed(seed)).get
      .toDF("key", "version", "seq", "payload")

  test("property: keepLatest equals the ROW_NUMBER window on random data") {
    (0 until 6).foreach { trial =>
      val df = dataset(100L + trial, 60 + trial * 17).repartition(1 + trial % 5)
      val w = Window.partitionBy("key").orderBy($"version".desc, $"seq".desc)
      val expected = df.withColumn("rn", row_number().over(w))
        .where($"rn" === 1).drop("rn").collect().toSet
      val got = Dedup.keepLatest(df, Seq("key"), Seq("version", "seq"))
        .collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("property: exactKeepFirst equals the ascending window on random data") {
    (0 until 6).foreach { trial =>
      val df = dataset(200L + trial, 60 + trial * 17).repartition(1 + trial % 5)
      val w = Window.partitionBy("key", "version").orderBy($"seq")
      val expected = df.withColumn("rn", row_number().over(w))
        .where($"rn" === 1).drop("rn").collect().toSet
      val got = Dedup.exactKeepFirst(df, Seq("key", "version"), "seq")
        .collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("property: topKPerGroup equals the rank-filter window on random data") {
    (0 until 6).foreach { trial =>
      val base = dataset(300L + trial, 80 + trial * 13)
        .select($"key".as("g"), $"version".cast("double").as("score"), $"seq".as("id"))
      // plant NULL scores — both spellings must agree on exclusion, so the
      // window reference filters them the way the aggregate's contract does
      val df = base.withColumn("score",
        when($"id" % 11 === 0, lit(null).cast("double")).otherwise($"score"))
        .repartition(1 + trial % 5)
      val k = 1 + trial % 4
      val w = Window.partitionBy("g").orderBy($"score".desc, $"id".desc)
      val expected = df.where($"score".isNotNull)
        .withColumn("rank", row_number().over(w)).where($"rank" <= k)
        .select($"g", $"rank", $"score", $"id").collect().toSet
      val got = Selection.topKPerGroup(df, Seq("g"), "score", "id", k)
        .collect().toSet
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("property: snapshotDiff is a total, correct classification") {
    (0 until 6).foreach { trial =>
      val old = dataset(400L + trial, 50).select($"seq".as("id"), $"payload")
        .where($"id" % 7 =!= trial % 7)
      val neu = dataset(400L + trial, 50).select($"seq".as("id"),
          when($"id" % 5 === 0, concat($"payload", lit("!"))).otherwise($"payload").as("payload"))
        .where($"id" % 9 =!= trial % 9)
      val oldMap = old.as[(Long, String)].collect().toMap
      val newMap = neu.as[(Long, String)].collect().toMap
      val expected = (oldMap.keySet ++ newMap.keySet).map { id =>
        id -> ((oldMap.get(id), newMap.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        })
      }.toMap
      val got = Dedup.snapshotDiff(old.repartition(3), neu.repartition(2),
          "id", Seq("payload"))
        .as[(Long, String)].collect()
      assert(got.length == expected.size, "every id exactly once")
      assert(got.toMap == expected, s"trial $trial")
    }
  }
}
