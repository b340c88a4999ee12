package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Row}

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

  /** How a batch obtains its JDBC connections. Serializable so the
    * append path can open one connection PER PARTITION on executors;
    * a DriverManager-URL factory is the production impl, a recording
    * fake is the test impl (no DB in this container). */
  trait ConnectionFactory extends Serializable {
    def connect(): java.sql.Connection
  }

  final case class UrlConnectionFactory(url: String, props: Map[String, String])
      extends ConnectionFactory {
    override def connect(): java.sql.Connection = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      java.sql.DriverManager.getConnection(url, p)
    }
  }

  /** Batched executor-side append: one connection per partition,
    * single-row prepared INSERT + addBatch/executeBatch every
    * `batchSize` rows — the JDBC shape of the reference's multi-row
    * stored-proc insert (amortized round trips). */
  def appendJdbc(df: DataFrame, table: String, factory: ConnectionFactory,
                 batchSize: Int = 500): Unit = {
    val columns = df.columns.toSeq
    val sql = insertSql(table, columns, 1)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = factory.connect()
        try {
          val st = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { r =>
              var i = 0
              while (i < columns.length) { st.setObject(i + 1, r.get(i)); i += 1 }
              st.addBatch()
              pending += 1
              if (pending >= batchSize) { st.executeBatch(); pending = 0 }
            }
            if (pending > 0) st.executeBatch()
            ()
          } finally st.close()
        } finally conn.close()
      }
    }
  }

  /** Driver-side upsert of the (small, one row per mountpoint) latest
    * coordinates — the reference's `upsert_coordinates` ON CONFLICT
    * semantics executed verbatim. */
  def upsertCoordinatesJdbc(latest: DataFrame, factory: ConnectionFactory,
                            table: String = "coordinates"): Int = {
    val columns = Seq("mountpoint", "ecef_x", "ecef_y", "ecef_z", "antenna_height",
      "rtcm_package_id")
    val sql = upsertSql(table, columns, Seq("mountpoint"))
    val rows = latest.selectExpr(columns: _*).collect()
    if (rows.isEmpty) return 0
    val conn = factory.connect()
    try {
      val st = conn.prepareStatement(sql)
      try {
        rows.foreach { r =>
          var i = 0
          while (i < columns.length) { st.setObject(i + 1, r.get(i)); i += 1 }
          st.addBatch()
        }
        st.executeBatch()
        rows.length
      } finally st.close()
    } finally conn.close()
  }

  /** The landed-table schemas (reference: initdb/01-rtcm_packages.sql,
    * initdb/11-*_observations.sql) — the executed inserts must project
    * EXACTLY these columns, not whatever the projection DataFrames
    * happen to carry (e.g. the engine-side `constellation` routing
    * column is not a reference table column). */
  val PackagesColumns: Seq[String] = Seq(
    "rtcm_package_id", "receive_time", "mountpoint", "rtcm_obs_epoch",
    "rtcm_msg_type", "rtcm_msg_size", "rtcm_sat_count")
  val ObservationsColumns: Seq[String] = Seq(
    "rtcm_package_id", "mountpoint", "constellation", "obs_epoch", "sat_id",
    "sat_signal", "obs_code", "obs_phase", "obs_doppler", "obs_snr",
    "obs_lock_time_indicator")

  /** The executable foreachBatch body for the relational landing path
    * (S5–S7): appends packages + observations executor-side, upserts
    * latest coordinates. The parquet sink in RtcmStreaming remains the
    * no-DB stand-in; this is the same batch wiring against any JDBC
    * endpoint. */
  def writeDecodedBatchJdbc(batch: Dataset[DecodedFrame],
                            factory: ConnectionFactory): Unit = {
    val b = batch.persist()
    try {
      appendJdbc(RtcmPipeline.packages(b).selectExpr(PackagesColumns: _*),
        "rtcm_packages", factory)
      appendJdbc(RtcmPipeline.observations(b).selectExpr(ObservationsColumns: _*),
        "observations", factory)
      upsertCoordinatesJdbc(RtcmPipeline.latestCoordinates(b)
        .selectExpr("mountpoint", "ecef_x", "ecef_y", "ecef_z", "antenna_height",
          "rtcm_package_id"), factory)
    } finally { b.unpersist(); () }
  }
}
