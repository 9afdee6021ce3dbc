package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from one object per operator family under
  * `graft.queries`; every entry has a DuckDB oracle unless the operator is
  * genuinely not SQL-expressible (those get the driver's rows-only check).
  *
  * Session contract for externally-built sessions: running any `events`
  * query sets `spark.sql.legacy.parquet.nanosAsLong=true` for the REST of
  * the session (required by parquet timestamp[ns] data and not scopeable —
  * see Tables.events). The session timeZone, by contrast, is only pinned
  * to UTC DURING query construction and restored on exit (see `queries`).
  * Queries register graft's native functions/rules idempotently via
  * GraftExtensions.ensureRegistered.
  */
object SparkEntry {
  private def catalogs = Seq(
    _root_.graft.queries.Relational.queries,
    _root_.graft.queries.Poster.queries,
    _root_.graft.queries.TextOps.queries,
    _root_.graft.queries.VectorOps.queries,
    _root_.graft.queries.EventOps.queries,
    _root_.graft.queries.Multimodal.queries,
    _root_.graft.queries.PosterScale.queries,
    _root_.graft.queries.Extras.queries,
    _root_.graft.queries.Sinks.queries,
    _root_.graft.queries.Curation.queries,
    _root_.graft.queries.ScaleOps.queries,
    _root_.graft.queries.Selection.queries,
    _root_.graft.queries.Retrieval.queries,
    _root_.graft.queries.Affinity.queries,
    _root_.graft.queries.Warehouse.queries,
  )
  private def oracleCatalogs = Seq(
    _root_.graft.queries.Relational.oracles,
    _root_.graft.queries.Poster.oracles,
    _root_.graft.queries.TextOps.oracles,
    _root_.graft.queries.VectorOps.oracles,
    _root_.graft.queries.EventOps.oracles,
    _root_.graft.queries.Multimodal.oracles,
    _root_.graft.queries.PosterScale.oracles,
    _root_.graft.queries.Extras.oracles,
    _root_.graft.queries.Sinks.oracles,
    _root_.graft.queries.Curation.oracles,
    _root_.graft.queries.ScaleOps.oracles,
    _root_.graft.queries.Selection.oracles,
    _root_.graft.queries.Retrieval.oracles,
    _root_.graft.queries.Affinity.oracles,
    _root_.graft.queries.Warehouse.oracles,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry is wrapped in [[graft.model.Tables.withUtcSession]]: query
    * CONSTRUCTION runs with session timeZone pinned to UTC (the events
    * cross-engine contract) and the caller's zone is restored before the
    * lambda returns — reading one table no longer re-configures a host
    * session for good (VERDICT r7 #7; soundness argument and end-to-end
    * proof in Tables.withUtcSession / UtcScopeSpec). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.reduce(_ ++ _).map { case (name, f) =>
      name -> ((s: SparkSession, dir: String) =>
        _root_.graft.model.Tables.withUtcSession(s)(f(s, dir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleCatalogs.reduce(_ ++ _)
}
