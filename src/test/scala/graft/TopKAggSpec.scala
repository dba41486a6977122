package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopK aggregator: deterministic order, tie-break on id, caps at k") {
    val df = Seq(
      ("a", 5.0, 10L), ("a", 9.0, 11L), ("a", 9.0, 7L), ("a", 1.0, 12L),
      ("b", 2.0, 20L)
    ).toDF("g", "score", "id")
    val top2 = TopKAggregator.topk(2)
    val out = df.groupBy($"g")
      .agg(top2($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"pos", $"t.id".as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("a", 0, 7L), ("a", 1, 11L), ("b", 0, 20L)))
  }

  test("TopK merge is associative across many partitions") {
    val big = (1 to 10000).map(i => ((i % 7).toString, i.toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(16)
    val top3 = TopKAggregator.topk(3)
    val got = big.groupBy($"g").agg(top3($"score", $"id").as("top"))
      .select($"g", explode($"top").as("t")).select($"g", $"t.id".as("id"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getLong(1)).toSet }
    // group g holds ids ≡ g (mod 7); top3 = the 3 largest such ids
    (0 until 7).foreach { g =>
      val expect = (1 to 10000).filter(_ % 7 == g).sorted.takeRight(3).map(_.toLong).toSet
      assert(got(g.toString) == expect)
    }
  }
}
