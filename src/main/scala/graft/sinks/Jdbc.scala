package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC sink + verification probes (SURVEY §2.1 S6–S8, S11).
  *
  * Reference: `ETL Scripts/db_utils.py:121-159` — chunked multi-row INSERT
  * with `replace`/`append`/`fail` modes and batch_size 1000; post-load
  * `SELECT COUNT(*)` verification (`db_utils.py:221-245`); arbitrary SQL
  * passthrough (`db_utils.py:161-187`); information_schema table-exists
  * probe (`db_utils.py:189-219`).
  *
  * Spark-first shape: `df.write.format("jdbc")` writes from EXECUTORS in
  * parallel — one connection per partition, `batchsize` rows per round
  * trip — not through the driver like pandas `to_sql`. `numPartitions`
  * caps sink-side connection fan-in for databases that can't take one
  * connection per upstream partition.
  *
  * The test/verification database is embedded Derby (ships with Spark's
  * jars); against a real warehouse only `url`/`driver` change — the
  * operator surface (modes, batchsize, verify-count, exists-probe) is
  * engine-agnostic.
  */
object Jdbc {

  /** Mirror of the reference's if_exists modes. */
  def saveMode(ifExists: String): SaveMode = ifExists match {
    case "replace" => SaveMode.Overwrite
    case "append"  => SaveMode.Append
    case "fail"    => SaveMode.ErrorIfExists
    case other     => throw new IllegalArgumentException(
      s"unknown if_exists mode: $other (expected replace|append|fail)")
  }

  /** S6 — bulk load with mode + batchsize (+ optional connection cap). */
  def load(df: DataFrame, url: String, table: String,
           ifExists: String = "replace", batchSize: Int = 1000,
           numPartitions: Option[Int] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode(saveMode(ifExists))
    numPartitions.fold(w)(n => w.option("numPartitions", n.toString)).save()
  }

  /** MERGE upsert — the reference's listed-future-work "upsert"
    * load_strategy (`config.template.yaml:31` documents
    * replace/append/upsert; only replace/append exist in
    * `db_utils.py:121-159`). Two phases:
    *
    *   1. stage: the batch ships over JDBC exactly ONCE, from
    *      executors in parallel, into `<table>__stage` — no data ever
    *      returns to the driver and no SQL text is built from values;
    *   2. apply: a single engine-side `MERGE INTO target USING stage`
    *      updates matched keys and inserts the rest ATOMICALLY (one
    *      statement, unlike the delete+insert pair, which readers can
    *      observe between statements).
    *
    * Derby (the embedded test engine) supports MERGE since 10.11;
    * Postgres 15+, SQL Server, and Oracle take the same statement.
    * Contract: `df` must be UNIQUE on `keys` (SQL MERGE raises on a
    * double-matched target row — dedup with Dedup.keepLatest first);
    * a missing target table degrades to a plain create-and-load. The
    * stage table is left behind (overwritten by the next upsert),
    * mirroring the streaming sink's staging seam.
    */
  /** MERGE ON fragment for one key: Derby maps Spark StringType to
    * CLOB, which MERGE cannot compare — string keys go through a
    * VARCHAR cast on both sides (no-op for engines that already used
    * VARCHAR; numeric/date keys compare directly).
    */
  private def keyEq(df: DataFrame, k: String): String = {
    def q(c: String) = "\"" + c + "\""
    df.schema(k).dataType match {
      case org.apache.spark.sql.types.StringType =>
        s"CAST(t.${q(k)} AS VARCHAR(512)) = CAST(s.${q(k)} AS VARCHAR(512))"
      case _ => s"t.${q(k)} = s.${q(k)}"
    }
  }

  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             batchSize: Int = 1000,
             numPartitions: Option[Int] = None): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    if (!tableExists(url, table)) {
      load(df, url, table, ifExists = "replace", batchSize, numPartitions)
    } else {
      val stage = s"${table}__stage"
      load(df, url, stage, ifExists = "replace", batchSize, numPartitions)
      def q(c: String) = "\"" + c + "\""
      val on = keys.map(k => keyEq(df, k)).mkString(" AND ")
      val nonKeys = df.columns.filterNot(keys.contains)
      val updateClause =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = df.columns.map(q).mkString(", ")
      val insertVals = df.columns.map(c => s"s.${q(c)}").mkString(", ")
      execute(url,
        s"""MERGE INTO $table t USING $stage s ON $on
           |$updateClause
           |WHEN NOT MATCHED THEN INSERT ($insertCols)
           |VALUES ($insertVals)""".stripMargin)
    }
  }

  /** Apply a change frame shaped like operators/SnapshotDiff.diff's
    * output (keys…, change_type in insert|delete|update, old_/new_
    * tracked columns) to a warehouse table — the other half of the
    * snapshot-CDC lifecycle: SnapshotDiff RECOVERS the stream, this
    * APPLIES it. One staged batch + ONE three-clause MERGE (Derby
    * 10.11+/Postgres 15+/SQL Server), so the whole batch lands
    * atomically. Replay-idempotent by construction: re-applied
    * deletes find no match, re-applied updates set the same values,
    * re-applied inserts match and degrade to same-value updates.
    * A missing target bootstraps from the non-delete rows.
    */
  def applyCdc(changes: DataFrame, url: String, table: String,
               keys: Seq[String], tracked: Seq[String],
               batchSize: Int = 1000): Unit = {
    require(keys.nonEmpty && tracked.nonEmpty,
      "applyCdc needs key and tracked columns")
    def q(c: String) = "\"" + c + "\""
    val flat = changes.select(
      keys.map(col) ++
        tracked.map(c => col("new_" + c).as(c)) :+ col("change_type"): _*)
    if (!tableExists(url, table)) {
      load(flat.filter(col("change_type") =!= "delete")
          .select((keys ++ tracked).map(col): _*),
        url, table, ifExists = "replace", batchSize)
    } else {
      val stage = s"${table}__stage"
      load(flat, url, stage, ifExists = "replace", batchSize)
      val on = keys.map(k => keyEq(flat, k)).mkString(" AND ")
      val updates = tracked.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val cols = (keys ++ tracked)
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val del = s"CAST(s.${q("change_type")} AS VARCHAR(16)) = 'delete'"
      execute(url,
        s"""MERGE INTO $table t USING $stage s ON $on
           |WHEN MATCHED AND $del THEN DELETE
           |WHEN MATCHED AND NOT ($del) THEN UPDATE SET $updates
           |WHEN NOT MATCHED AND NOT ($del) THEN INSERT ($insertCols)
           |VALUES ($insertVals)""".stripMargin)
    }
  }

  /** S7 — post-load row count, pushed down as COUNT(*) (the subquery-as-
    * dbtable trick: only the 1-row count crosses the wire).
    */
  def rowCount(spark: SparkSession, url: String, table: String): Long =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"(SELECT COUNT(*) AS n FROM $table) q")
      .load()
      // COUNT(*)'s JDBC type differs per engine (Derby INTEGER, Postgres
      // BIGINT) — widen via Number instead of assuming LongType.
      .head().getAs[Number](0).longValue()

  /** S8 — SELECT passthrough: run remote SQL, get a DataFrame. */
  def query(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($sql) q")
      .load()

  /** S8 — DDL/DML passthrough (driver-side side effect, like the
    * reference's execute_query non-SELECT branch).
    */
  def execute(url: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  /** Several statements in ONE transaction (autocommit off, commit at
    * the end, rollback on failure) — the atomicity seam the additive
    * rollup sink needs to pair its MERGE with its ledger insert.
    */
  def executeAll(url: String, sqls: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      try {
        val st = conn.createStatement()
        try sqls.foreach(st.execute) finally st.close()
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    } finally conn.close()
  }

  /** Additive MERGE: like [[upsert]], but matched rows ACCUMULATE the
    * `additive` columns (t.c = t.c + s.c) instead of being replaced —
    * the maintenance statement of a rolling aggregate ("materialized
    * view") fed by incremental batches. Extra statements run FIRST in
    * the SAME transaction as the MERGE (see [[executeAll]]), so a
    * caller can make apply + ledger-mark atomic — and, because the
    * ledger INSERT precedes the MERGE, a ledger primary-key collision
    * from a CONCURRENT writer applying the same batch aborts the whole
    * transaction before any rows are touched (single-writer is the
    * normal foreachBatch contract; this makes violating it safe, not
    * just documented).
    */
  def upsertAdditive(df: DataFrame, url: String, table: String,
                     keys: Seq[String], additive: Seq[String],
                     alsoInTxn: Seq[String] = Nil,
                     batchSize: Int = 1000): Unit = {
    require(keys.nonEmpty && additive.nonEmpty,
      "additive upsert needs key and additive columns")
    def q(c: String) = "\"" + c + "\""
    if (!tableExists(url, table)) {
      // Bootstrap must be as atomic as the steady state: stage the batch,
      // create an EMPTY target (DDL auto-commits, but an empty table is
      // harmless to replay — the ledger is still unmarked, so a crash here
      // re-enters the MERGE path below and applies against zero rows), then
      // apply + ledger-mark in ONE transaction. The old shape (load target,
      // then ledger in a second txn) could crash between the two and
      // double-count the first batch on replay.
      val stage = s"${table}__stage"
      load(df, url, stage, ifExists = "replace", batchSize)
      execute(url, s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
      executeAll(url, alsoInTxn :+ s"INSERT INTO $table SELECT * FROM $stage")
    } else {
      val stage = s"${table}__stage"
      load(df, url, stage, ifExists = "replace", batchSize)
      val on = keys.map(k => keyEq(df, k)).mkString(" AND ")
      val updates = additive.map(c => s"${q(c)} = t.${q(c)} + s.${q(c)}")
        .mkString(", ")
      val insertCols = df.columns.map(q).mkString(", ")
      val insertVals = df.columns.map(c => s"s.${q(c)}").mkString(", ")
      executeAll(url, alsoInTxn :+
        s"""MERGE INTO $table t USING $stage s ON $on
           |WHEN MATCHED THEN UPDATE SET $updates
           |WHEN NOT MATCHED THEN INSERT ($insertCols)
           |VALUES ($insertVals)""".stripMargin)
    }
  }

  /** SCD2 MERGE maintenance — the warehouse-side sibling of
    * operators/Scd2 (which COMPUTES history from a change log; this
    * MAINTAINS it incrementally in a serving table). The target keeps
    * (keys, attrs, valid_from, valid_to, is_current); each batch:
    *
    *   1. stage ships executor-parallel (like [[upsert]]);
    *   2. ONE transaction runs (a) a MERGE that CLOSES the open row of
    *      every key whose staged state differs (null-safe compare) —
    *      `valid_to = staged ts, is_current = false` — and (b) an
    *      INSERT of staged rows for keys with no remaining open row
    *      (new keys, or keys the MERGE just closed).
    *
    * Contract: one row per key in `df` (Dedup.keepLatest first) and
    * monotone batch times. REPLAY-IDEMPOTENT by construction: a
    * replayed batch's states equal the open rows, so the close-MERGE
    * matches nothing and the insert's NOT EXISTS sees the open row —
    * both no-ops (proved in JdbcScd2Spec).
    */
  def scd2Upsert(df: DataFrame, url: String, table: String,
                 keys: Seq[String], attrs: Seq[String], tsCol: String,
                 batchSize: Int = 1000): Unit = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs keys and attrs")
    def q(c: String) = "\"" + c + "\""
    val stage = s"${table}__stage"
    load(df, url, stage, ifExists = "replace", batchSize)
    val cols = keys ++ attrs
    if (!tableExists(url, table)) {
      execute(url,
        s"""CREATE TABLE $table AS SELECT
           |${cols.map(c => s"${q(c)}").mkString(", ")},
           |${q(tsCol)} AS "valid_from", ${q(tsCol)} AS "valid_to",
           |CAST(NULL AS BOOLEAN) AS "is_current"
           |FROM $stage WITH NO DATA""".stripMargin)
      // CTAS inherits valid_to's nullability from the staged ts column,
      // which a NOT-NULL source (e.g. a lit() timestamp) makes NOT NULL
      // — but open intervals REQUIRE NULL valid_to.
      execute(url, s"""ALTER TABLE $table ALTER COLUMN "valid_to" NULL""")
    }
    val on = keys.map(k => keyEq(df, k)).mkString(" AND ")
    // null-safe "state differs" over the tracked attrs (Derby has no
    // IS DISTINCT FROM; string attrs go through a VARCHAR cast since
    // Derby cannot compare CLOBs). The cast is Derby's MAXIMUM VARCHAR
    // width (32672), not keyEq's 512: truncating an INEQUALITY compare
    // would make states that differ only past the cutoff look equal and
    // silently drop the change from history — keys can afford 512
    // because they only need to MATCH, and real keys are short.
    def side(alias: String, c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        s"CAST($alias.${q(c)} AS VARCHAR(32672))"
      case _ => s"$alias.${q(c)}"
    }
    val differs = attrs.map { c =>
      val (t, s) = (side("t", c), side("s", c))
      s"($t <> $s OR ($t IS NULL AND $s IS NOT NULL)" +
        s" OR ($t IS NOT NULL AND $s IS NULL))"
    }.mkString("(", " OR ", ")")
    val close =
      s"""MERGE INTO $table t USING $stage s
         |ON $on AND t."is_current" = TRUE
         |WHEN MATCHED AND $differs THEN UPDATE SET
         |  "valid_to" = s.${q(tsCol)}, "is_current" = FALSE""".stripMargin
    val insert =
      s"""INSERT INTO $table
         |(${(cols.map(q) ++ Seq("\"valid_from\"", "\"is_current\""))
              .mkString(", ")})
         |SELECT ${cols.map(c => s"s.${q(c)}").mkString(", ")},
         |  s.${q(tsCol)}, TRUE
         |FROM $stage s
         |WHERE NOT EXISTS (SELECT 1 FROM $table t
         |  WHERE $on AND t."is_current" = TRUE)""".stripMargin
    executeAll(url, Seq(close, insert))
  }

  /** S11 — table-exists probe via JDBC metadata (portable across engines,
    * unlike information_schema dialects).
    */
  def tableExists(url: String, table: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      try rs.next() finally rs.close()
    } finally conn.close()
  }
}
