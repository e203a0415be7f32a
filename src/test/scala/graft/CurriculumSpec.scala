package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curriculum

/** Pins for the competence-based curriculum schedule: closed-form release
  * steps vs a driver reference, monotonicity, the step-1 band, tie/NULL
  * ordering, partitioning invariance, and guards. */
class CurriculumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = 20
  private val c0 = 0.1

  private def reference(rank: Long, n: Long): Long = {
    val pr = rank.toDouble / n
    math.max(1L, math.ceil(steps * (pr * pr - c0 * c0) / (1 - c0 * c0)).toLong)
  }

  test("release steps match the closed form; monotone in difficulty; band edges hold") {
    val df = (1 to 200).map(i => (i.toLong, (i * 7 % 199).toDouble))
      .toDF("doc_id", "difficulty")
    val out = Curriculum.competenceSchedule(df, "doc_id", "difficulty",
      steps, c0).collect()
    assert(out.length == 200)
    val n = 200L
    out.foreach { r =>
      val rank = r.getAs[Long]("rank")
      assert(r.getAs[Long]("release_step") == reference(rank, n),
        s"closed form mismatch at rank $rank")
    }
    val byRank = out.sortBy(_.getAs[Long]("rank"))
    // ranks are a permutation of 1..N following ascending difficulty
    assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to n).toSeq)
    assert(byRank.map(_.getAs[Double]("difficulty")).toSeq ==
      byRank.map(_.getAs[Double]("difficulty")).sorted.toSeq)
    // release steps are monotone along the rank order, start at 1, end at T
    val rel = byRank.map(_.getAs[Long]("release_step")).toSeq
    assert(rel.zip(rel.tail).forall { case (a, b) => a <= b })
    assert(rel.head == 1L && rel.last == steps.toLong)
    // the easiest ~c0 fraction is available from step 1
    assert(rel.take((n * c0).toInt - 1).forall(_ == 1L))
  }

  test("ties break by id; NULL difficulty ranks hardest") {
    val df = Seq((1L, Some(5.0)), (2L, Some(5.0)), (3L, None), (4L, Some(1.0)))
      .toDF("doc_id", "difficulty")
    val out = Curriculum.competenceSchedule(df, "doc_id", "difficulty", 10)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(4L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L))
  }

  test("partitioning invariance and guards") {
    val df = (1 to 100).map(i => (i.toLong, (i % 17).toDouble))
      .toDF("doc_id", "difficulty")
    val a = Curriculum.competenceSchedule(df, "doc_id", "difficulty", 8)
      .select("doc_id", "rank", "release_step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Curriculum.competenceSchedule(df.repartition(13), "doc_id",
      "difficulty", 8)
      .select("doc_id", "rank", "release_step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curriculum.competenceSchedule(df, "doc_id", "difficulty", 0)
    }
    intercept[IllegalArgumentException] {
      Curriculum.competenceSchedule(df, "doc_id", "difficulty", 5, c0 = 1.0)
    }
    intercept[IllegalArgumentException] {
      Curriculum.competenceSchedule(df.where(lit(false)), "doc_id",
        "difficulty", 5)
    }
  }
}
