package graft.schemas

import org.apache.spark.sql.types._

/** Source + warehouse schemas of the reference pipeline.
  *
  * Field names/types follow the reference's declared source schemas
  * (reference: src/config/config_services.py:56-135) and warehouse DDL
  * (reference: src/dags/hql/create_hive_tbls.hql:1-48). All schemas are
  * explicit — no inference on reads that matter.
  */
object Schemas {

  /** OpenSky /flights API rows + derived partition columns
    * (reference: config_services.py:60-79). The three partition columns
    * are derived, not in the API payload; they are present here so the
    * empty-seed `unionByName` accumulator has a complete schema.
    */
  val srcFlights: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("firstSeen", LongType),
    StructField("estDepartureAirport", StringType),
    StructField("lastSeen", LongType),
    StructField("estArrivalAirport", StringType),
    StructField("callsign", StringType),
    StructField("estDepartureAirportHorizDistance", IntegerType),
    StructField("estDepartureAirportVertDistance", IntegerType),
    StructField("estArrivalAirportHorizDistance", IntegerType),
    StructField("estArrivalAirportVertDistance", IntegerType),
    StructField("departureAirportCandidatesCount", ShortType),
    StructField("arrivalAirportCandidatesCount", ShortType),
    StructField("flight_year", ShortType),
    StructField("flight_month", ByteType),
    StructField("flight_day", ByteType)))

  /** FR24 airports JSON rows (reference: config_services.py:81-91). */
  val srcAirports: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("iata", StringType),
    StructField("icao", StringType),
    StructField("country", StringType),
    StructField("lat", FloatType),
    StructField("lon", FloatType),
    StructField("alt", ShortType)))

  /** FR24 airlines JSON rows (reference: config_services.py:92-98). */
  val srcAirlines: StructType = StructType(Seq(
    StructField("Name", StringType),
    StructField("Code", StringType),
    StructField("ICAO", StringType)))

  /** OpenSky aircraft DB CSV, headerless, 15 string columns
    * (reference: config_services.py:99-117).
    */
  val srcAircrafts: StructType = StructType(Seq(
    "icao24_addr", "registration", "manufacturer_code", "manufacturer_name",
    "model", "icao_designator", "serial_num", "line_num", "icao_type",
    "operator_name", "operator_callsign", "operator_icao", "operator_iata",
    "owner", "note").map(StructField(_, StringType)))

  /** doc8643 aircraft-types CSV (reference: config_services.py:118-129). */
  val srcAircraftTypes: StructType = StructType(Seq(
    StructField("AircraftDescription", StringType),
    StructField("Description", StringType),
    StructField("Designator", StringType),
    StructField("EngineCount", ByteType),
    StructField("EngineType", StringType),
    StructField("ManufacturerCode", StringType),
    StructField("ModelFullName", StringType),
    StructField("WTC", StringType)))

  /** doc8643 manufacturers CSV (reference: config_services.py:130-135). */
  val srcManufacturers: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Name", StringType)))

  // ----- warehouse shapes (reference: create_hive_tbls.hql) -----

  val dimAirports: StructType = StructType(Seq(
    StructField("airport_dim_id", IntegerType, nullable = false),
    StructField("icao_code", StringType, nullable = false),
    StructField("iata_code", StringType),
    StructField("name", StringType),
    StructField("country", StringType),
    StructField("lat", FloatType),
    StructField("lon", FloatType),
    StructField("alt", ShortType)))

  val dimDates: StructType = StructType(Seq(
    StructField("date_dim_id", IntegerType, nullable = false),
    StructField("date_date", DateType),
    StructField("year", ShortType),
    StructField("month", ByteType),
    StructField("day", ByteType),
    StructField("week_of_year", ByteType),
    StructField("day_of_week", ByteType)))

  val dimAircrafts: StructType = StructType(Seq(
    StructField("aircraft_dim_id", IntegerType, nullable = false),
    StructField("icao24_addr", StringType, nullable = false),
    StructField("registration", StringType),
    StructField("operating_airline", StringType),
    StructField("manufacturer", StringType),
    StructField("model", StringType),
    StructField("serial_num", StringType),
    StructField("line_num", StringType),
    StructField("icao_designator", StringType),
    StructField("icao_type", StringType),
    StructField("aircraft_type", StringType),
    StructField("engine_cnt", ByteType),
    StructField("engine_type", StringType)))

  /** fct_flights; `flight_date_dim_id` is the partition column. */
  val fctFlights: StructType = StructType(Seq(
    StructField("aircraft_dim_id", IntegerType),
    StructField("depart_ts", TimestampType),
    StructField("depart_airport_dim_id", IntegerType),
    StructField("arrival_ts", TimestampType),
    StructField("arrival_airport_dim_id", IntegerType),
    StructField("flight_date_dim_id", IntegerType)))
}
