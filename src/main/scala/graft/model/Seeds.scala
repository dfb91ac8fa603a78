package graft.model

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** Seed loading — dbt `seeds` parity: version-controlled CSV files
  * (country codes, category maps, rate tables) load into the warehouse
  * as first-class relations that models `ref()` like any other model.
  *
  * Ref behavior: the reference framework has no seed surface; this is
  * dbt-parity framework completion, like contracts (B34) and hooks
  * (B36).
  *
  * Typing: dbt infers seed column types with agate and lets
  * `column_types` override. Inference is sample-dependent — the exact
  * non-determinism this engine bans — so here every column is STRING
  * unless declared in the optional sidecar `<seed>.columns` file
  * (`col:type, col:type`, the `-- contract:` syntax; types round-trip
  * Catalyst's DDL parser, loud on garbage). Declared casts use Spark
  * cast semantics (uncastable values become NULL — add a not_null test
  * downstream to make that loud).
  *
  * Scale shape: seeds are small reference data by construction; each
  * loads as one CSV scan + cast projection + versioned warehouse write
  * (broadcastable downstream). Nothing here collects.
  */
object Seeds {

  /** Seed files in `<projectDir>/seeds` (sorted by name). */
  def seedFiles(projectDir: Path): Seq[Path] = {
    val dir = projectDir.resolve("seeds")
    if (!Files.isDirectory(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir) // closed: NIO streams hold a file handle
      try s.iterator().asScala
        .filter(_.toString.endsWith(".csv")).toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
  }

  /** Declared column types from the optional `<seed>.columns` sidecar. */
  def columnTypes(csvPath: Path): Seq[(String, String)] = {
    val sidecar = csvPath.resolveSibling(
      csvPath.getFileName.toString.stripSuffix(".csv") + ".columns")
    if (!Files.isRegularFile(sidecar)) Nil
    else ModelConfig.splitTopLevel(Files.readString(sidecar).replace("\n", ","))
      .map { pair =>
        pair.split(":", 2) match {
          case Array(c, t) if c.trim.nonEmpty && t.trim.nonEmpty =>
            val tpe =
              try org.apache.spark.sql.types.DataType.fromDDL(t.trim)
              catch {
                case scala.util.control.NonFatal(_) =>
                  throw new ConfigError(
                    s"seed sidecar '$sidecar': unparseable type '${t.trim}'")
              }
            c.trim -> tpe.simpleString
          case _ => throw new ConfigError(
            s"seed sidecar '$sidecar': malformed entry '$pair' (want column:type)")
        }
      }
  }

  /** Read one seed CSV with its declared types applied. */
  def read(wh: Warehouse, csvPath: Path): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = wh.spark.read
      .option("header", "true")
      .option("inferSchema", "false") // sample-dependent — never
      .csv(csvPath.toString)
    val types = columnTypes(csvPath).toMap
    types.keys.find(c => !raw.columns.contains(c)).foreach { c =>
      throw new ConfigError(
        s"seed '${csvPath.getFileName}': declared column '$c' not in CSV header")
    }
    raw.select(raw.columns.toSeq.map { c =>
      types.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }: _*)
  }

  /** Load every seed of a project into the warehouse as versioned
    * relations named after the file (`seeds/fx_rates.csv` →
    * `ref('fx_rates')`). Returns (seedName, rows) per seed.
    *
    * `modelNames` (the project's model set) makes name collisions LOUD:
    * a seed named like an existing model would silently write a new
    * version of that model's relation, and every ref() consumer would
    * read seed data as model output until the next run — dbt fails on
    * duplicate resource names for the same reason. */
  def loadAll(wh: Warehouse, projectDir: Path,
      modelNames: Set[String] = Set.empty): Seq[(String, Long)] =
    seedFiles(projectDir).map { p =>
      val name = p.getFileName.toString.stripSuffix(".csv")
      if (modelNames.contains(name))
        throw new ConfigError(
          s"seed '$name' collides with model '$name': seeds and models " +
            "share the ref() namespace, so the seed would overwrite the " +
            "model's relation — rename one of them")
      val df = read(wh, p)
      wh.writeVersion(name, df)
      name -> wh.read(name).count()
    }
}
