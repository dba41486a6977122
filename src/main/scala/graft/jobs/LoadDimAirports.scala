package graft.jobs

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalOps, KeyOps}
import graft.schemas.Schemas

/** Airports dimension load (reference: load_dim_airports.py:9-64).
  *
  * The reference parses the FR24 airports JSON driver-side and fixes
  * mixed int/float lat/lon plus the `alt = -1` sentinel before
  * `createDataFrame` (reference: load_dim_airports.py:27-35); the same
  * normalization happens here in [[normalize]]. Surrogate keys are
  * row_number over name (reference: load_dim_airports.py:50).
  *
  * Deviation (SURVEY §4 quirk 1): the reference's change-detection
  * compares DataFrame object identity and is dead code — effective
  * semantics "always overwrite". We implement REAL content comparison
  * and skip the rewrite when nothing changed.
  */
object LoadDimAirports {

  val table = "dim_airports"

  /** Raw driver-side record as the JSON delivers it: numbers may be Int
    * or Double, alt may be the "-1" missing sentinel.
    */
  final case class RawAirport(name: String, iata: String, icao: String,
                              country: String, lat: Any, lon: Any, alt: Any)

  /** Type-fix + sentinel normalization (reference: load_dim_airports.py:27-35). */
  def normalize(raw: Seq[RawAirport]): Seq[Row] = raw.map { a =>
    def toF(v: Any): java.lang.Float = v match {
      case null => null
      case n: Number => java.lang.Float.valueOf(n.floatValue())
      case s: String => java.lang.Float.valueOf(s.toFloat)
    }
    def toAlt(v: Any): java.lang.Short = v match {
      case null => null
      case s: String if s == "-1" => null // sentinel → NULL (ref line 35)
      case s: String => java.lang.Short.valueOf(s.toShort)
      case n: Number if n.intValue() == -1 => null
      case n: Number => java.lang.Short.valueOf(n.shortValue())
    }
    Row(a.name, a.iata, a.icao, a.country, toF(a.lat), toF(a.lon), toAlt(a.alt))
  }

  /** Returns true when the dim was (re)written. */
  def run(spark: SparkSession, wh: Warehouse, raw: Seq[RawAirport]): Boolean = {
    import scala.jdk.CollectionConverters._
    val src = spark.createDataFrame(normalize(raw).asJava, Schemas.srcAirports)

    val dim = KeyOps.surrogateKey(src, "airport_dim_id", "name")
      .select(
        col("airport_dim_id"),
        col("icao").as("icao_code"),
        col("iata").as("iata_code"),
        col("name"), col("country"), col("lat"), col("lon"), col("alt"))

    val changed = !wh.exists(table) ||
      !IncrementalOps.sameContent(dim, wh.table(spark, table))
    if (changed) wh.overwrite(table, dim)
    changed
  }
}
