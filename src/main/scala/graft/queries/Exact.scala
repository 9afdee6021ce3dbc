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
  * source data carries ≤6 meaningful decimals), then convert to double
  * THROUGH A STRING: decimal → exact digit string → correctly-rounded
  * parse. Both engines' string parsers (Java Double.parseDouble,
  * DuckDB fast_float) round-to-nearest the same exact decimal text, so
  * the doubles are identical at ANY magnitude. The r8 direct cast
  * relied on the unscaled value fitting 53 bits — an sf-DEPENDENT
  * premise the round-9 sf1 oracle run broke: q01's sum_charge at sf1
  * is 2.79e10 (17 significant digits at scale 6), where Spark's
  * correctly-rounded BigDecimal.doubleValue and DuckDB's
  * int128-divide conversion differ by 1 ulp. Every oracle mirrors the
  * same CAST(CAST(CAST(x AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE).
  */
private[queries] object Exact {
  def dPrice(c: Column): Column = c.cast("decimal(12,2)")
  def dFrac(c: Column): Column  = c.cast("decimal(6,4)")
  def asD(c: Column): Column    =
    c.cast("decimal(38,6)").cast("string").cast("double")
}
