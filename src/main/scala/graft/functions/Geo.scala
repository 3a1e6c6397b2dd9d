package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo scalar surface exercised by the reference's fraud-detection demo SQL
  * (ST_POINT / ST_DISTANCE, reference:
  * demo/project_demo02-FraudDetection/project.sql:34). Points are plain
  * structs; distance is great-circle haversine in kilometers — pure column
  * expressions, codegen-friendly. */
object Geo {

  def stPoint(lon: Column, lat: Column): Column =
    struct(lon.as("lon"), lat.as("lat"))

  /** Haversine distance in km between two (lon, lat) points (degrees). */
  def stDistance(a: Column, b: Column): Column = {
    val R = 6371.0088
    val dLat = radians(b("lat") - a("lat"))
    val dLon = radians(b("lon") - a("lon"))
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(a("lat"))) * cos(radians(b("lat"))) * pow(sin(dLon / 2), 2)
    lit(2 * R) * asin(sqrt(h))
  }
}
