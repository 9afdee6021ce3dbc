package graft.queries

import org.apache.spark.sql.Column

/** The money-exactness boundary, shared by every query family that
  * aggregates prices (Relational q01/q02/..., EventOps q56, ScaleOps
  * q79): compute in exact DECIMAL, convert to double only at the output
  * boundary. ONE definition so the cross-engine contract can never drift
  * between families.
  *
  * DECIMAL(12,2) holds any price in the data; DECIMAL(6,4) holds the
  * (1±x) factors; products stay well under precision 38 in both Spark
  * and DuckDB. Output boundary: squeeze sums to scale 6 (exact — the
  * source data carries ≤6 meaningful decimals) BEFORE the double cast.
  * DuckDB's int128 decimal→double conversion is off by 1 ulp once the
  * unscaled value exceeds 53 bits; at scale 6 the mantissa stays small
  * enough that both engines convert correctly rounded.
  */
private[queries] object Exact {
  def dPrice(c: Column): Column = c.cast("decimal(12,2)")
  def dFrac(c: Column): Column  = c.cast("decimal(6,4)")
  def asD(c: Column): Column    = c.cast("decimal(38,6)").cast("double")
}
