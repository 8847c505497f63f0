package graft

import graft.api.EngineApi
import graft.config.Registry
import graft.pipeline.Runner
import graft.sources.GridSource
import graft.store.{BlobStore, TableStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Read-side API + blob store: S6 point lookup, S10 blob CRUD + cache,
  * S11 JSON summary, S12 bulk init, SQL views, panel. */
class ApiSpec extends SparkSuite {

  private def env() = {
    val dir = Files.createTempDirectory("graft-api").toString
    val store = new TableStore(spark, dir)
    val runner = new Runner(spark, store, () => Timestamp.valueOf("2025-06-01 00:00:00"))
    (store, runner, new EngineApi(spark, store))
  }

  private def load(runner: Runner, name: String, fixture: String): String = {
    val cfg = Registry.edbConfigs.find(_.name == name).get
    val grid = GridSource.readGrid(spark, s"fixtures/$fixture", cfg.dataLocation)
    val (canon, snake) = GridSource.canonicalize(
      GridSource.processMonthly(grid, cfg), cfg)
    runner.runDataset(cfg.tableName, canon, Seq(snake))
    cfg.tableName
  }

  test("driver contract: entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("blob store: round trip, list, write-through cache, delete") {
    val dir = Files.createTempDirectory("graft-blob").toString
    val blobs = new BlobStore(spark, dir)
    blobs.upload("raw/I_AUTO.XLS".replace("/", "_"), "payload".getBytes)
    assert(new String(blobs.download("raw_I_AUTO.XLS").get) == "payload")
    assert(blobs.list("raw_") == Seq("raw_I_AUTO.XLS"))
    var fetches = 0
    val a = blobs.getOrFetch("cached.bin") { fetches += 1; "data".getBytes }
    val b = blobs.getOrFetch("cached.bin") { fetches += 1; "other".getBytes }
    assert(fetches == 1 && new String(a) == "data" && new String(b) == "data")
    assert(blobs.delete("cached.bin") && !blobs.exists("cached.bin"))
  }

  test("bulk init makes every configured table readable (empty, typed)") {
    val (store, _, api) = env()
    api.initTables()
    assert(Registry.allConfigs.forall(c => store.exists(c.tableName)))
    val auto = store.read("autosales")
    assert(auto.isEmpty && auto.columns.toSeq == Seq("date", "sales"))
    val nyu = store.read("equityriskpremium")
    assert(nyu.columns.toSeq ==
      Seq("date", "tbond_rate", "erp_t12m", "expected_return"))
  }

  test("point lookup, series read, SQL views, panel over the store") {
    val (_, runner, api) = env()
    load(runner, "auto_sales", "edb_auto_sales.csv")
    load(runner, "gas_price", "edb_gas_price.csv")
    // S6 point lookup
    val hit = api.pointLookup("autosales", "2015-07-01")
    assert(hit.exists(_.getAs[Double]("sales") == 7887.0))
    assert(api.pointLookup("autosales", "1999-01-01").isEmpty)
    // SQL surface
    val views = api.registerViews()
    assert(views.contains("autosales") && views.contains("gasprice"))
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM autosales WHERE date >= '2020-01-01'")
      .collect().head.getLong(0)
    assert(viaSql > 0)
    // J2 panel: one row per date, both series' columns
    val panel = api.panelAll()
    assert(panel.columns.toSeq == Seq("date", "autosales", "gasprice"))
    val jul15 = panel.filter(col("date") === "2015-07-01").collect().head
    assert(jul15.getAs[Double]("autosales") == 7887.0)
    assert(jul15.getAs[Double]("gasprice") == 0.68)
    // panel is full-outer: dates present in either series appear
    assert(panel.count() >= 119)
  }

  test("panelFull: full 26-dataset registry incl. unpivoted NYU rates") {
    val (store, runner, api) = env()
    val fx = Files.createTempDirectory("graft-regfx").toString
    val files = graft.tools.RegistryFixtures.writeAll(fx)
    assert(files.size == Registry.allConfigs.size)
    // populate three representative tables: one EDB (via real workbook
    // bytes), one quarterly FRED, and the NYU sheet
    val auto = Registry.edbConfigs.find(_.name == "auto_sales").get
    val (aC, aS) = GridSource.canonicalize(GridSource.processMonthly(
      GridSource.readGrid(spark, s"$fx/${files("auto_sales")}", auto.dataLocation), auto), auto)
    runner.runDataset(auto.tableName, aC, Seq(aS))
    val gdp = Registry.fredConfigs.find(_.name == "real_gdp").get
    val (gC, gS) = graft.sources.FredSource.canonicalize(
      graft.sources.FredSource.process(
        graft.sources.FredSource.readObservations(
          spark, s"$fx/${files("real_gdp")}"), gdp), gdp)
    runner.runDataset(gdp.tableName, gC, Seq(gS))
    val nyuC = graft.sources.NyuSource.canonicalize(
      graft.sources.NyuSource.process(
        graft.sources.NyuSource.readSheet(spark, s"$fx/${files("equity_risk_premium")}")))
    runner.runDataset(Registry.nyuConfig.tableName, nyuC, Registry.nyuValueFields)
    val panel = api.panelFull()
    assert(panel.columns.toSeq ==
      Seq("date", "autosales", "realgdp") ++ Registry.nyuValueFields)
    // formula spot-checks: m=72 (2020-01): autosales k=1 int; NYU f=1..3
    val r = panel.filter(col("date") === "2020-01-01").collect().head
    assert(r.getAs[Double]("autosales") ==
      graft.tools.RegistryFixtures.baseValue(1, 72).toDouble)
    assert(r.getAs[Double]("tbond_rate") ==
      graft.tools.RegistryFixtures.nyuText(1, 72).toDouble)
    // quarterly shift: realgdp at 2020-01 carries the 2019-10 observation
    assert(!r.isNullAt(r.fieldIndex("realgdp")))
    assert(panel.filter(col("date") === "2020-02-01")
      .collect().head.isNullAt(2)) // no quarterly obs lands on Feb
  }

  test("revision history API + run-summary JSON sink") {
    val (store, runner, api) = env()
    val t = load(runner, "auto_sales", "edb_auto_sales.csv")
    // revise one value via a second run (new clock)
    val runner2 = new Runner(spark, store, () => Timestamp.valueOf("2025-06-03 00:00:00"))
    val cfg = Registry.edbConfigs.find(_.name == "auto_sales").get
    val grid = GridSource.readGrid(spark, "fixtures/edb_auto_sales.csv", cfg.dataLocation)
    val (canon, snake) = GridSource.canonicalize(
      GridSource.processMonthly(grid, cfg), cfg)
    val revised = canon.withColumn(snake,
      when(col("date") === "2016-01-01", col(snake) + 1).otherwise(col(snake)))
    val r = runner2.runDataset(t, revised, Seq(snake))
    assert(r.revisions == 1)
    val hist = api.revisionHistory(dataset = Some(t), limit = Some(10)).collect()
    assert(hist.length == 1 && hist.head.getAs[String]("data_date") == "2016-01-01")
    // empty-store revision history works too
    assert(api.revisionHistory(dataset = Some("nope")).isEmpty ||
      api.revisionHistory(dataset = Some("nope")).count() == 0)
    // S11 JSON summary
    val summary = runner2.summarize(Seq(r), durationSecs = 2.0)
    val path = api.saveRunSummaryJson(summary, "20250603")
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
  }
}
