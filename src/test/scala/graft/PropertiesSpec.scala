package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{DateDim, IncrementalOps, KeyOps}

/** Property-based laws (SURVEY §5.3): idempotency, except-laws,
  * surrogate-key density, date-key bijectivity. Plain ScalaCheck
  * generators sampled with fixed seeds (the scalatest bridge artifact
  * is not on the offline classpath).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 10), Gen.oneOf("a", "b", "c")))

  test("law: exceptNew(batch, loaded ∪ batch) is empty (idempotent replay)") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (batch, loaded) =>
      val b = batch.toDF("id", "v")
      val l = loaded.toDF("id", "v")
      assert(IncrementalOps.exceptNew(b, l.union(b)).isEmpty)
    }
  }

  test("law: exceptNew result is disjoint from loaded and subset of batch") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (batch, loaded) =>
      val b = batch.toDF("id", "v")
      val l = loaded.toDF("id", "v")
      val delta = IncrementalOps.exceptNew(b, l)
      assert(delta.intersect(l).isEmpty)                  // disjoint from loaded
      assert(delta.exceptAll(b.dropDuplicates()).isEmpty) // ⊆ distinct(batch)
    }
  }

  test("law: surrogate keys are dense, unique, 1..n") {
    samples(Gen.listOfN(25, Gen.alphaStr.suchThat(_.nonEmpty)), 8).foreach { names =>
      val distinct = names.distinct
      val ids = KeyOps.surrogateKey(distinct.toDF("name"), "id", "name")
        .select("id").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq == (1 to distinct.size))
    }
  }

  test("law: date key bijectivity (y,m,d) <-> y*10000+m*100+d over generated calendars") {
    samples(Gen.zip(Gen.choose(1995, 2030), Gen.choose(1, 12)), 6).foreach { case (y, m) =>
      val dim = DateDim.dateDimension(spark, f"$y%04d-$m%02d-01", f"$y%04d-$m%02d-28")
      val rows = dim.select("date_dim_id", "year", "month", "day").collect()
      rows.foreach { r =>
        assert(r.getInt(0) ==
          r.getShort(1) * 10000 + r.getByte(2) * 100 + r.getByte(3))
      }
      assert(rows.length == 28)
    }
  }
}
