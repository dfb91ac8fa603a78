package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Materialization strategies — the Spark re-expression of the
  * reference's strategy classes (src/framework/materialization.py:89-760)
  * and its Polars CDC retirement engine (src/framework/cdc_polars.py).
  *
  * Everything is a declarative DataFrame plan ending in one distributed
  * write. Where the reference retires SCD2 rows with batched
  * `UPDATE ... WHERE key IN (...)` loops, 1000 keys at a time
  * (cdc_polars.py:356-379), we do a single join against the (broadcast
  * when small) change-key set — one shuffle-free pass per batch
  * regardless of batch size.
  */
final class Materializer(wh: Warehouse) {

  import Materializer._

  /** Dispatch on the model's materialization type. `df` is the rendered
    * model query's result; `batchTs` stamps CDC/SCD2 rows (injectable for
    * deterministic tests; a scheduler would pass wall-clock time).
    *
    * `fullRefresh` forces incremental/CDC models through their
    * initial-load path — a fresh versioned write of the (full-history)
    * input, atomically replacing the current version — the recovery path
    * for a corrupted table or state file (reference plan.py:118-154
    * full_refresh). Watermarks re-derive from the fresh data.
    */
  def materialize(
      cfg: ModelConfig,
      df: DataFrame,
      batchTs: String = "1970-01-01 00:00:00",
      fullRefresh: Boolean = false): MaterializeResult = {
    cfg.validate()
    cfg.materialized match {
      case "view" =>
        wh.registerView(cfg.name, df); MaterializeResult(cfg.name, "view")
      case "table" =>
        bucketSpec(cfg) match {
          case Some((bucketCols, n)) =>
            // `-- config: bucket_by=c1;c2, buckets=N` → CLUSTERED BY
            // catalog table; equi-joins between co-bucketed models on the
            // bucket keys plan without a shuffle.
            wh.writeVersionBucketed(cfg.name, df, bucketCols, n, sortCols(cfg))
            MaterializeResult(cfg.name, "table", status = s"bucketed:$n")
          case None =>
            // `-- config: sort_by=c1;c2` clusters files for min/max pruning.
            val sorted = sortCols(cfg) match {
              case Nil => df
              case cols => df.sortWithinPartitions(cols.map(col): _*)
            }
            wh.writeVersion(cfg.name, sorted, partitionCols(cfg))
            MaterializeResult(cfg.name, "table")
        }
      case "temp_table" =>
        // Session-scoped eager table: cache + force, like CREATE TEMP TABLE.
        val cached = df.cache()
        cached.count()
        wh.registerView(cfg.name, cached)
        MaterializeResult(cfg.name, "temp_table")
      case "incremental" => incremental(cfg, df, fullRefresh)
      case "cdc" => cdcSnapshot(cfg, df, fullRefresh)
      case "cdc_scd2" => cdcScd2(cfg, df, batchTs, fullRefresh)
      case other =>
        throw new ConfigError(s"Unknown materialization: $other",
          Map("model" -> cfg.name))
    }
  }

  // ------------------------------------------------------------- incremental
  private def incremental(
      cfg: ModelConfig, df: DataFrame, fullRefresh: Boolean): MaterializeResult =
    cfg.incrementalStrategy.get match {
      case "time" => timeIncremental(cfg, df, fullRefresh)
      case "unique_key" => mergeIncremental(cfg, df, fullRefresh)
      case "append" => appendIncremental(cfg, df, fullRefresh)
      case other =>
        throw new ConfigError(s"Unknown incremental strategy: $other",
          Map("model" -> cfg.name))
    }

  /** Time watermark strategy (materialization.py:203-310): first run
    * loads everything; later runs append only rows with
    * time_column > watermark. The watermark advances to max(time_column)
    * actually ingested (exact, unlike the reference's wall-clock stamp —
    * no rows can fall between watermark and now). */
  private def timeIncremental(
      cfg: ModelConfig, df: DataFrame, fullRefresh: Boolean = false): MaterializeResult = {
    val tc = cfg.timeColumn.get
    if (fullRefresh || !wh.exists(cfg.name)) {
      wh.writeVersion(cfg.name, df, partitionCols(cfg))
      advanceWatermark(cfg.name, tc, df)
      MaterializeResult(cfg.name, "incremental_time",
        status = if (fullRefresh) "full_refresh" else "initial_load")
    } else {
      val wm = wh.state.watermark(cfg.name, WatermarkKey)
        .getOrElse(wh.read(cfg.name).agg(max(col(tc)).cast("string")).head().getString(0))
      val fresh = df.filter(col(tc) > lit(wm).cast(df.schema(tc).dataType))
      wh.append(cfg.name, fresh)
      // Advance from the batch only (O(batch), not O(table)); empty batch
      // leaves the watermark untouched.
      advanceWatermark(cfg.name, tc, fresh)
      MaterializeResult(cfg.name, "incremental_time", status = "appended")
    }
  }

  private def advanceWatermark(model: String, tc: String, df: DataFrame): Unit = {
    val mx = df.agg(max(col(tc)).cast("string")).head().getString(0)
    if (mx != null) wh.state.setWatermark(model, WatermarkKey, mx)
  }

  /** Upsert-by-key strategy (materialization.py:312-400's MERGE):
    * existing rows whose key appears in the batch are replaced. One
    * anti-join + union + versioned write; the key set is broadcast when
    * small enough for Catalyst's threshold.
    *
    * With `partition_by` set, the rewrite is PARTITION-SCOPED: only
    * partitions holding batch keys (or receiving batch rows) are read,
    * merged, and rewritten; every other partition is carried into the new
    * version by hard link ([[Warehouse.writeVersionScoped]]). A small
    * batch against a 100 TB table then costs O(touched partitions), and
    * the partition filter prunes the `existing` scan to those partitions
    * too. */
  private def mergeIncremental(
      cfg: ModelConfig, df: DataFrame, fullRefresh: Boolean = false): MaterializeResult = {
    val key = cfg.uniqueKey.get
    if (fullRefresh || !wh.exists(cfg.name)) {
      wh.writeVersion(cfg.name, df, partitionCols(cfg))
      MaterializeResult(cfg.name, "incremental_unique_key",
        status = if (fullRefresh) "full_refresh" else "initial_load")
    } else {
      val existing = wh.read(cfg.name)
      val keys = df.select(col(key)).distinct()
      partitionCols(cfg) match {
        case pcs if pcs.nonEmpty =>
          val affected = affectedPartitions(existing, df, keys, key, pcs)
          val touched = existing.filter(partFilter(pcs, affected.map(_._1)))
          val kept = touched.join(keys, Seq(key), "left_anti")
          wh.writeVersionScoped(cfg.name, kept.unionByName(df), pcs,
            affected.map(_._2).toSet)
          MaterializeResult(cfg.name, "incremental_unique_key",
            status = s"merged_scoped:${affected.size}")
        case _ =>
          val kept = existing.join(keys, Seq(key), "left_anti")
          wh.writeVersion(cfg.name, kept.unionByName(df))
          MaterializeResult(cfg.name, "incremental_unique_key", status = "merged")
      }
    }
  }

  /** Partition tuples touched by a merge batch: partitions the batch
    * writes into ∪ partitions of existing rows whose key is in the batch
    * (a key may move partitions — its old partition must be rewritten to
    * drop the stale row). Returns (typed values, relative partition path
    * `c1=v1/c2=v2`); cardinality is bounded by the batch's distinct
    * partitions + matched keys, so the collect is O(touched partitions),
    * never O(table). */
  private def affectedPartitions(
      existing: DataFrame, batchRows: DataFrame, keys: DataFrame,
      key: String, pcs: Seq[String]): Seq[(Seq[Any], String)] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val sel = pcs.zipWithIndex.map { case (c, i) => col(c).as(s"__p$i") } ++
      pcs.zipWithIndex.map { case (c, i) => col(c).cast("string").as(s"__s$i") }
    batchRows.select(sel: _*)
      .unionByName(existing.join(keys, Seq(key), "left_semi").select(sel: _*))
      .distinct()
      .collect()
      .map { r =>
        val raw = pcs.indices.map(r.get)
        val rel = pcs.indices.map { i =>
          val v = if (r.isNullAt(pcs.length + i)) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
            else ExternalCatalogUtils.escapePathName(r.getString(pcs.length + i))
          s"${ExternalCatalogUtils.escapePathName(pcs(i))}=$v"
        }.mkString("/")
        (raw, rel)
      }.toSeq
  }

  /** Prunable membership filter over the partition columns: OR of
    * per-tuple equality conjunctions (NULL partitions matched with
    * isNull — `===` can't). */
  private def partFilter(pcs: Seq[String], tuples: Seq[Seq[Any]]): Column =
    tuples.map { vs =>
      pcs.zip(vs).map { case (c, v) =>
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))

  private def appendIncremental(
      cfg: ModelConfig, df: DataFrame, fullRefresh: Boolean = false): MaterializeResult =
    if (fullRefresh || !wh.exists(cfg.name)) {
      wh.writeVersion(cfg.name, df)
      MaterializeResult(cfg.name, "incremental_append",
        status = if (fullRefresh) "full_refresh" else "initial_load")
    } else {
      wh.append(cfg.name, df)
      MaterializeResult(cfg.name, "incremental_append", status = "appended")
    }

  // -------------------------------------------------------------------- CDC
  /** Current-snapshot CDC (materialization.py:500-600's MERGE): the batch
    * carries a change-type column with I/U/D (missing → 'U'). Matched
    * I/U upsert, D deletes. */
  private def cdcSnapshot(
      cfg: ModelConfig, batch: DataFrame, fullRefresh: Boolean = false): MaterializeResult = {
    val key = cfg.uniqueKey.get
    val opCol = cfg.changeTypeColumn
    val withOp = normalizeOp(batch, opCol)
    if (fullRefresh || !wh.exists(cfg.name)) {
      wh.writeVersion(cfg.name,
        dedupeByKey(withOp.filter(col(opCol) =!= "D").drop(opCol), key),
        partitionCols(cfg))
      MaterializeResult(cfg.name, "cdc",
        status = if (fullRefresh) "full_refresh" else "initial_load")
    } else {
      val existing = wh.read(cfg.name)
      val touched = withOp.select(col(key)).distinct()
      val upserts = dedupeByKey(withOp.filter(col(opCol) =!= "D").drop(opCol), key)
      partitionCols(cfg) match {
        case pcs if pcs.nonEmpty =>
          // Partition-scoped: deletes/updates pull in the partitions their
          // current rows live in (semi-join side of affectedPartitions).
          val affected = affectedPartitions(existing, upserts, touched, key, pcs)
          val touchedPart = existing.filter(partFilter(pcs, affected.map(_._1)))
          val survivors = touchedPart.join(touched, Seq(key), "left_anti")
          wh.writeVersionScoped(cfg.name, survivors.unionByName(upserts), pcs,
            affected.map(_._2).toSet)
          MaterializeResult(cfg.name, "cdc",
            status = s"merged_scoped:${affected.size}")
        case _ =>
          val survivors = existing.join(touched, Seq(key), "left_anti")
          wh.writeVersion(cfg.name, survivors.unionByName(upserts))
          MaterializeResult(cfg.name, "cdc", status = "merged")
      }
    }
  }

  /** SCD2 retirement CDC (cdc_polars.py:205-445): history table where the
    * current row per key has obsolete_date NULL.
    *   INSERT → new row, obsolete_date NULL
    *   UPDATE → retire current row (obsolete_date = batchTs), insert new
    *   DELETE/EXPIRED → retire current row
    * One pass: join current rows against the changed-key set.
    */
  private def cdcScd2(
      cfg: ModelConfig,
      batch: DataFrame,
      batchTs: String,
      fullRefresh: Boolean = false): MaterializeResult = {
    val key = cfg.uniqueKey.get
    val opCol = cfg.changeTypeColumn
    val ts = lit(batchTs).cast("timestamp")
    val withOp = normalizeOp(batch, opCol)

    if (fullRefresh || !wh.exists(cfg.name)) {
      val initial = withOp.filter(col(opCol) =!= "D").drop(opCol)
        .withColumn(CdcTimestampCol, ts)
        .withColumn(ObsoleteDateCol, lit(null).cast("timestamp"))
      wh.writeVersion(cfg.name, initial, partitionCols(cfg))
      MaterializeResult(cfg.name, "cdc_scd2",
        status = if (fullRefresh) "full_refresh" else "initial_load")
    } else {
      val existing = wh.read(cfg.name)
      val changedKeys = withOp
        .filter(col(opCol).isin("U", "D", "E"))
        .select(col(key)).distinct()
      val inserted = withOp.filter(col(opCol).isin("I", "U")).drop(opCol)
        .withColumn(CdcTimestampCol, ts)
        .withColumn(ObsoleteDateCol, lit(null).cast("timestamp"))
      def retire(hist: DataFrame): DataFrame = hist
        .join(changedKeys.withColumn("__changed", lit(1)), Seq(key), "left")
        .withColumn(ObsoleteDateCol,
          when(col(ObsoleteDateCol).isNull && col("__changed").isNotNull, ts)
            .otherwise(col(ObsoleteDateCol)))
        .drop("__changed")
      partitionCols(cfg) match {
        case pcs if pcs.nonEmpty =>
          // Partition-scoped: retirement only mutates CURRENT rows of
          // changed keys, so only their partitions (plus insert targets)
          // are rewritten; obsolete history elsewhere links forward.
          val affected = affectedPartitions(
            existing.filter(col(ObsoleteDateCol).isNull), inserted,
            changedKeys, key, pcs)
          val touchedPart = existing.filter(partFilter(pcs, affected.map(_._1)))
          wh.writeVersionScoped(cfg.name,
            retire(touchedPart).unionByName(inserted), pcs,
            affected.map(_._2).toSet)
          MaterializeResult(cfg.name, "cdc_scd2",
            status = s"merged_scoped:${affected.size}")
        case _ =>
          // Single pass over history: retire current rows for changed keys.
          wh.writeVersion(cfg.name, retire(existing).unionByName(inserted))
          MaterializeResult(cfg.name, "cdc_scd2", status = "merged")
      }
    }
  }

  /** `-- config: partition_by=col1;col2` → directory-partitioned writes
    * (prunable scans for downstream date/range filters at scale). */
  private def partitionCols(cfg: ModelConfig): Seq[String] =
    cfg.meta.get("partition_by").toSeq.flatMap(_.split(";")).map(_.trim)
      .filter(_.nonEmpty)

  private def sortCols(cfg: ModelConfig): Seq[String] =
    cfg.meta.get("sort_by").toSeq.flatMap(_.split(";")).map(_.trim)
      .filter(_.nonEmpty)

  /** `-- config: bucket_by=c1;c2, buckets=N` → CLUSTERED BY spec. */
  private def bucketSpec(cfg: ModelConfig): Option[(Seq[String], Int)] =
    cfg.meta.get("bucket_by").map { cols =>
      (cols.split(";").map(_.trim).filter(_.nonEmpty).toSeq,
        cfg.meta.get("buckets").map(_.toInt).getOrElse(8))
    }.filter(_._1.nonEmpty)

  private def normalizeOp(df: DataFrame, opCol: String): DataFrame =
    if (df.columns.contains(opCol))
      df.withColumn(opCol, coalesce(col(opCol), lit("U"))) // cdc default, macros.py:44
    else df.withColumn(opCol, lit("U"))

  /** One row per key within a batch (the reference dedupes CDC chunks by
    * unique key, cdc_polars.py:425-445). The survivor is the max over the
    * remaining columns — deterministic under any partitioning/shuffle
    * order, unlike "keep last seen". */
  private def dedupeByKey(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filterNot(_ == key).map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(struct(others: _*).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}

object Materializer {
  val WatermarkKey = "last_processed_time"
  val ObsoleteDateCol = "obsolete_date" // cdc_polars.py:64
  val CdcTimestampCol = "__cdc_timestamp"
}

final case class MaterializeResult(
    modelName: String,
    materialization: String,
    status: String = "success")
