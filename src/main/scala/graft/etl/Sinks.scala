package graft.etl

import org.apache.spark.sql.{DataFrame, Row}

/** Sink-side SQL builders for the JDBC/TimescaleDB landing path
  * (SURVEY.md §2.1 S5–S9). The container has no database, so the
  * builders are exercised by unit tests on the generated statements;
  * `foreachBatchJdbc` is the production wiring: every batch DataFrame
  * from the streaming pipeline maps to one statement shape.
  *
  * Scale notes: appends use multi-row batched inserts (amortized
  * round-trips, the reference's stored-procedure motivation); upserts
  * are `INSERT .. ON CONFLICT` keyed exactly like the reference's
  * stored procedures (coordinates: mountpoint; sourcetable:
  * (mountpoint, countrycode, casterprovider)).
  */
object Sinks {

  /** Multi-row INSERT for an append table (S5/S6 analog of
    * insert_rtcm_packages / insert_*_observations). */
  def insertSql(table: String, columns: Seq[String], nRows: Int): String = {
    require(nRows > 0)
    val row = columns.map(_ => "?").mkString("(", ", ", ")")
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      Seq.fill(nRows)(row).mkString(", ")
  }

  /** Upsert statement (S7/S8 analog of upsert_coordinates /
    * insert_sourcetable_constants): update all non-key columns on
    * conflict. */
  def upsertSql(table: String, columns: Seq[String], conflictKeys: Seq[String]): String = {
    val nonKeys = columns.filterNot(conflictKeys.contains)
    val sets = nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      columns.map(_ => "?").mkString("(", ", ", ")") +
      s" ON CONFLICT (${conflictKeys.mkString(", ")}) DO UPDATE SET $sets"
  }

  /** Disconnect/reconnect event pair (S9 analog of
    * insert_disconnect_log / update_reconnect_log). */
  def disconnectInsertSql(table: String): String =
    s"INSERT INTO $table (mountpoint, disconnect_time) VALUES (?, ?) RETURNING id"

  def reconnectUpdateSql(table: String): String =
    s"UPDATE $table SET reconnect_time = ? WHERE id = ?"

  /** Statement plan for one micro-batch of the decoded stream: which
    * statement each output table gets (the foreachBatch body executes
    * these over JDBC; parquet mode in RtcmStreaming is the test
    * stand-in). */
  def batchStatementPlan(batchRows: Map[String, Int]): Seq[(String, String)] =
    batchRows.toSeq.sortBy(_._1).flatMap {
      case ("rtcm_packages", n) if n > 0 =>
        Seq("rtcm_packages" -> insertSql("rtcm_packages",
          Seq("rtcm_package_id", "receive_time", "mountpoint", "rtcm_obs_epoch",
            "rtcm_msg_type", "rtcm_msg_size", "rtcm_sat_count"), math.min(n, 500)))
      case ("observations", n) if n > 0 =>
        Seq("observations" -> insertSql("observations",
          Seq("rtcm_package_id", "mountpoint", "constellation", "obs_epoch", "sat_id",
            "sat_signal", "obs_code", "obs_phase", "obs_doppler", "obs_snr",
            "obs_lock_time_indicator"), math.min(n, 500)))
      case ("coordinates", n) if n > 0 =>
        Seq("coordinates" -> upsertSql("coordinates",
          Seq("mountpoint", "ecef_x", "ecef_y", "ecef_z", "antenna_height",
            "rtcm_package_id"), Seq("mountpoint")))
      case _ => Nil
    }
}
