package graft.model

import java.nio.file.Files
import graft.{SparkSpec, Tables}

/** schema.yml sidecar configs (reference model.py:157-232) — parse,
  * header merge, ModelRunner e2e (YAML-declared tests run; docs show
  * descriptions), loud unknown-model/column errors, export round-trip. */
class SchemaYamlSpec extends SparkSpec {

  private val yamlText =
    """models:
      |  - name: silver_orders
      |    description: Cleaned orders
      |    config:
      |      materialized: table
      |      owner_team: core
      |    tags: [silver, core]
      |    depends_on: [bronze_orders]
      |    meta:
      |      owner: data-team
      |    columns:
      |      - name: o_orderkey
      |        description: Primary key
      |        tests: [not_null, unique]
      |      - name: o_orderstatus
      |        description: Order state flag
      |        tests:
      |          - accepted_values: { values: [F, O, P], severity: warn }
      |      - name: o_totalprice
      |        tests:
      |          - range: { min: 0, max: 1000000 }
      |    tests:
      |      - relationships: { column: o_custkey, to: customers, field: c_custkey }
      |""".stripMargin

  test("parse: config, tags, columns, every test shape, meta") {
    val cfgs = SchemaYaml.parse(yamlText)
    val c = cfgs("silver_orders")
    assert(c.materialized == "table")
    assert(c.description.contains("Cleaned orders"))
    assert(c.tags == Set("silver", "core"))
    assert(c.dependsOn == Set("bronze_orders"))
    assert(c.meta("owner") == "data-team")
    // non-reserved config keys ride into meta (like unknown header kvs)
    assert(c.meta("owner_team") == "core")
    assert(c.columns.map(_.name) ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
    assert(c.columns.head.description.contains("Primary key"))
    val byType = c.tests.groupBy(_.testType)
    assert(byType("not_null").head.column == "o_orderkey")
    assert(byType("unique").head.column == "o_orderkey")
    val av = byType("accepted_values").head
    assert(av.column == "o_orderstatus" && av.params == Seq("F", "O", "P") &&
      av.severity == "warn")
    assert(byType("range").head.params == Seq("0", "1000000"))
    val rel = byType("relationships").head
    assert(rel.column == "o_custkey" && rel.params == Seq("customers", "c_custkey"))
  }

  test("SQL headers merge over the sidecar base: scalars win, lists add") {
    val base = SchemaYaml.parse(yamlText)("silver_orders")
    val merged = ModelConfig.fromSql("silver_orders",
      """-- config: materialized=view
        |-- tags: gold
        |-- test: not_null(o_custkey)
        |SELECT 1""".stripMargin, base)
    assert(merged.materialized == "view") // header wins the scalar
    assert(merged.tags == Set("silver", "core", "gold")) // additive
    assert(merged.tests.exists(t =>
      t.testType == "not_null" && t.column == "o_custkey")) // header test added
    assert(merged.tests.exists(t =>
      t.testType == "accepted_values")) // sidecar tests kept
    assert(merged.description.contains("Cleaned orders"))
    // header-only parse (no sidecar) unchanged
    val plain = ModelConfig.fromSql("m", "-- config: materialized=table\nSELECT 1")
    assert(plain.materialized == "table" && plain.description.isEmpty)
  }

  private def fixture() = {
    Tables.registerAll(spark, sfDir)
    val whDir = Files.createTempDirectory("graft_wh_").toString
    val wh = new Warehouse(spark, whDir, StateStore(whDir + "/state"))
    new ModelRunner(wh, Map(("raw", "orders") -> "orders"))
  }

  test("e2e: YAML-declared tests run through ModelRunner; docs show descriptions") {
    val dir = Files.createTempDirectory("graft_proj_models_")
    Files.writeString(dir.resolve("orders_clean.sql"),
      "-- config: materialized=table\n" +
        "SELECT o_orderkey, o_orderstatus FROM {{ source('raw', 'orders') }}")
    Files.writeString(dir.resolve("schema.yml"),
      """models:
        |  - name: orders_clean
        |    description: Orders with valid status
        |    columns:
        |      - name: o_orderkey
        |        description: Primary key
        |        tests: [not_null, unique]
        |      - name: o_orderstatus
        |        tests:
        |          - accepted_values: { values: [F, O, P] }
        |""".stripMargin)
    val runner = fixture()
    runner.addModelsFromDir(dir)
    assert(runner.config("orders_clean").materialized == "table")
    runner.executeModel("orders_clean")
    val outcomes = runner.runModelTests("orders_clean")
    assert(outcomes.length == 3 && outcomes.forall(_.passed))
    val wh = new Warehouse(spark,
      Files.createTempDirectory("graft_wh2_").toString,
      StateStore(Files.createTempDirectory("graft_st2_").toString))
    val md = Docs.markdown(wh, runner)
    assert(md.contains("Orders with valid status"))
    assert(md.contains("Primary key"))
    // a failing YAML test gates the model like a header test would
    val dir2 = Files.createTempDirectory("graft_proj_models2_")
    Files.writeString(dir2.resolve("orders_bad.sql"),
      "-- config: materialized=table\n" +
        "SELECT o_orderkey, 'X' AS o_orderstatus FROM {{ source('raw', 'orders') }}")
    Files.writeString(dir2.resolve("schema.yml"),
      """models:
        |  - name: orders_bad
        |    columns:
        |      - name: o_orderstatus
        |        tests:
        |          - accepted_values: { values: [F, O, P] }
        |""".stripMargin)
    val runner2 = fixture()
    runner2.addModelsFromDir(dir2)
    intercept[ModelRunner.ModelTestFailure] {
      runner2.executeModel("orders_bad")
    }
  }

  test("unknown model and drifted column doc fail loudly") {
    val dir = Files.createTempDirectory("graft_proj_models3_")
    Files.writeString(dir.resolve("real_model.sql"), "SELECT 1 AS a")
    Files.writeString(dir.resolve("schema.yml"),
      "models:\n  - name: renamed_model\n    description: gone\n")
    val e = intercept[ConfigError] { fixture().addModelsFromDir(dir) }
    assert(e.getMessage.contains("renamed_model"))
    // column documented in the sidecar but absent from the model output
    val dir2 = Files.createTempDirectory("graft_proj_models4_")
    Files.writeString(dir2.resolve("m.sql"),
      "-- config: materialized=table\nSELECT 1 AS a")
    Files.writeString(dir2.resolve("schema.yml"),
      "models:\n  - name: m\n    columns:\n      - name: b\n")
    val runner = fixture()
    runner.addModelsFromDir(dir2)
    val e2 = intercept[ConfigError] { runner.executeModel("m") }
    assert(e2.getMessage.contains("'b'"))
  }

  test("export round-trips: parse(export(parse(yaml))) == parse(yaml)") {
    val first = SchemaYaml.parse(yamlText)
    val exported = SchemaYaml.export(first.values.toSeq)
    val second = SchemaYaml.parse(exported)
    assert(second == first)
    // duplicate model declarations across files are loud
    val dir = Files.createTempDirectory("graft_proj_models5_")
    Files.writeString(dir.resolve("x.sql"), "SELECT 1 AS a")
    Files.writeString(dir.resolve("schema.yml"), "models:\n  - name: x\n")
    Files.writeString(dir.resolve("schema_extra.yml"), "models:\n  - name: x\n")
    val e = intercept[ConfigError] { SchemaYaml.loadDir(dir) }
    assert(e.getMessage.contains("more than one schema file"))
  }

  test("within-file duplicates and blank YAML values handled loudly/safely") {
    // duplicate model names in ONE file must not silently last-win
    val e = intercept[ConfigError] {
      SchemaYaml.parse("models:\n  - name: m\n  - name: m\n")
    }
    assert(e.getMessage.contains("more than once"))
    // YAML empty values (null) are ABSENT, never the string "null"
    val c = SchemaYaml.parse(
      """models:
        |  - name: m
        |    description:
        |    config:
        |    columns:
        |      - name: a
        |        description:
        |""".stripMargin)("m")
    assert(c.description.isEmpty)
    assert(c.materialized == "view")
    assert(c.columns.head.description.isEmpty)
    // an empty models key is an empty registry, not an error
    assert(SchemaYaml.parse("models:\n").isEmpty)
    // a null DOCUMENT (empty file / comments-only / bare ---) is an
    // empty registry too — typed, never an NPE (reference model.py's
    // `if not data: return`)
    assert(SchemaYaml.parse("").isEmpty)
    assert(SchemaYaml.parse("# just a comment\n").isEmpty)
    assert(SchemaYaml.parse("---\n").isEmpty)
  }

  test("sources: parse with table-level freshness overriding source-level") {
    val yaml =
      """sources:
        |  - name: raw
        |    path: /data/raw
        |    loaded_at_field: ts
        |    freshness:
        |      warn_after: { count: 12, period: hour }
        |      error_after: { count: 1, period: day }
        |    tables:
        |      - name: events
        |        identifier: raw_events
        |        loaded_at_field: event_ts
        |        freshness:
        |          warn_after: { count: 30, period: minute }
        |          error_after: { count: 2, period: hour }
        |      - name: orders
        |      - name: unfresh_dim
        |        freshness:
        |""".stripMargin
    val specs = SchemaYaml.parseSources(yaml)
    assert(specs.map(_.qualified) ==
      Seq("raw.events", "raw.orders", "raw.unfresh_dim"))
    val ev = specs.find(_.table == "events").get
    assert(ev.identifier == "raw_events")
    assert(ev.loadedAtField.contains("event_ts"))
    assert(ev.warnAfterS.contains(1800L) && ev.errorAfterS.contains(7200L))
    val ord = specs.find(_.table == "orders").get
    assert(ord.identifier == "/data/raw/orders", "base-path fallback")
    assert(ord.loadedAtField.contains("ts"), "source-level loaded_at inherits")
    assert(ord.warnAfterS.contains(43200L) && ord.errorAfterS.contains(86400L))
    // a blank freshness block inherits NOTHING and is not checkable…
    val dim = specs.find(_.table == "unfresh_dim").get
    assert(!dim.hasFreshness)
    // …and single-sided windows resolve per dbt semantics
    assert(SourceTableSpec("s", "t", "t", Some("ts"),
      warnAfterS = Some(60L)).effectiveWindows._1 == 60L)
    assert(SourceTableSpec("s", "t", "t", Some("ts"),
      errorAfterS = Some(60L)).effectiveWindows == ((60L, 60L)))
    // malformed declarations are loud, typed errors
    intercept[ConfigError] { SchemaYaml.parseSources(
      "sources:\n  - name: s\n    tables:\n      - name: t\n        freshness:\n          warn_after: { period: hour }\n") }
    intercept[ConfigError] { SchemaYaml.parseSources(
      "sources:\n  - name: s\n    tables:\n      - name: t\n        freshness:\n          warn_after: { count: 5, period: fortnight }\n") }
    intercept[ConfigError] { SchemaYaml.parseSources(
      "sources:\n  - name: s\n    tables:\n      - name: t\n        freshness:\n          warn_after: { count: 5, period: day }\n          error_after: { count: 1, period: hour }\n") }
    // duplicates within one file are loud
    intercept[ConfigError] { SchemaYaml.parseSources(
      "sources:\n  - name: s\n    tables: [ { name: t }, { name: t } ]\n") }
    // a models-only file declares no sources; content-free files too
    assert(SchemaYaml.parseSources("models:\n  - name: m\n").isEmpty)
    assert(SchemaYaml.parseSources("# nothing\n").isEmpty)
  }

  test("loadDirSources: cross-file duplicates loud, recursive walk") {
    val dir = Files.createTempDirectory("graft_src_models_")
    Files.writeString(dir.resolve("schema.yml"),
      "sources:\n  - name: raw\n    tables: [ { name: a } ]\n")
    Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("sub").resolve("schema_more.yml"),
      "sources:\n  - name: raw\n    tables: [ { name: b } ]\n")
    assert(SchemaYaml.loadDirSources(dir).map(_.qualified).sorted ==
      Seq("raw.a", "raw.b"))
    Files.writeString(dir.resolve("schema_dup.yml"),
      "sources:\n  - name: raw\n    tables: [ { name: a } ]\n")
    val e = intercept[ConfigError] { SchemaYaml.loadDirSources(dir) }
    assert(e.getMessage.contains("raw.a"))
  }

  test("export round-trips a custom change_type_column") {
    val yaml =
      """models:
        |  - name: cdc_m
        |    config:
        |      materialized: cdc
        |      change_type_column: op_code
        |""".stripMargin
    val first = SchemaYaml.parse(yaml)
    assert(first("cdc_m").changeTypeColumn == "op_code")
    val second = SchemaYaml.parse(SchemaYaml.export(first.values.toSeq))
    assert(second("cdc_m").changeTypeColumn == "op_code")
    // the default column is NOT emitted (no noise in exported sidecars)
    val plain = SchemaYaml.export(
      SchemaYaml.parse("models:\n  - name: m\n").values.toSeq)
    assert(!plain.contains("change_type_column"))
  }
}
