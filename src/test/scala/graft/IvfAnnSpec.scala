package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfAnn

/** IVF ANN: determinism, probe subsetting, and score exactness vs the
  * brute-force baseline. */
class IvfAnnSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("q_ann_ivf is deterministic and non-empty") {
    val r1 = SparkEntry.queries("q_ann_ivf")(spark, sfDir).collect().toSeq
    val r2 = SparkEntry.queries("q_ann_ivf")(spark, sfDir).collect().toSeq
    assert(r1 == r2)
    assert(r1.nonEmpty)
  }

  test("IVF scores equal brute force for the same vectors") {
    val exact = SparkEntry.queries("q_sim_query_topk")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    SparkEntry.queries("q_ann_ivf")(spark, sfDir).collect().foreach { r =>
      exact.get(r.getAs[Long]("vec_id")).foreach { e =>
        assert(math.abs(e - r.getAs[Double]("cos")) < 1e-9)
      }
    }
  }

  test("probing fewer lists yields a candidate subset") {
    val narrow = IvfAnn.topK(spark, sfDir, 0L, 50, nprobe = 1)
      .collect().map(_.getAs[Int]("cluster")).toSet
    val wide = IvfAnn.topK(spark, sfDir, 0L, 50, nprobe = 4)
      .collect().map(_.getAs[Int]("cluster")).toSet
    assert(narrow.size <= 1)
    assert(narrow.subsetOf(wide) || wide.size >= narrow.size)
  }

  test("IVF recall@10 >= 0.8 at nprobe=4 on the structured corpus") {
    val d = "/root/testdata/sf0.01"
    val brute = SparkEntry.queries("q_sim_query_topk")(spark, d)
      .limit(10).collect().map(_.getLong(0)).toSet
    val ivf = IvfAnn.topK(spark, d, 0L, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert((brute & ivf).size >= 8,
      s"recall ${(brute & ivf).size}/10 with 4/16 lists probed")
  }

  test("IVF recall is non-decreasing in nprobe") {
    val brute = SparkEntry.queries("q_sim_query_topk")(spark, sfDir)
      .limit(10).collect().map(_.getLong(0)).toSet
    val recalls = Seq(1, 2, 4, 6).map { np =>
      val got = IvfAnn.topK(spark, sfDir, 0L, 10, nprobe = np)
        .collect().map(_.getLong(0)).toSet
      (brute & got).size
    }
    assert(recalls == recalls.sorted,
      s"probing more lists must never lose neighbors: $recalls")
  }
}
