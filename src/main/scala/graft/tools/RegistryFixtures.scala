package graft.tools

import graft.config.Registry
import graft.sources.{XlsWriter, XlsxWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** Deterministic synthetic fixtures for the FULL 26-dataset registry — 15
  * EDB workbook grids (real legacy `.xls` BIFF8 bytes, the format of every
  * production EDB file: core_local/config.py:32-116), 10 FRED observation
  * JSONs, 1 NYU `.xlsx` sheet — generated from closed-form value formulas
  * so a DuckDB oracle can recompute every stored value from first
  * principles.
  *
  * The formulas are the spec; the engine must reproduce them THROUGH its
  * whole ingestion stack (workbook parse -> A1 slice -> header promotion ->
  * melt -> fiscal dates -> coercion -> rounding -> merge -> store -> panel
  * pivot). Any bug anywhere in that chain breaks the panel_all oracle match
  * (reference flagship read: documentation/economic_indicators.md:71,122).
  *
  * Value design (k = 1-based position in Registry.allConfigs, m = months
  * since 2014-01):
  *   - single-value series: k*100 + (m*(2k+3)) mod 37, plus a per-quarter
  *     fraction for float series (quarters .25/.5/.75, or tenths .2/.5/.8
  *     for DECIMAL(12,1)-declared series — see fracText) — exact in
  *     binary AND within each series' declared scale, so double compares
  *     are bit-exact and the declared-type sink cast is lossless;
  *   - NYU rates (f = 1..3): (3f + (m*(f+2)) mod 11)/1000 — all below the
  *     0.2 percent-heuristic threshold, so normalization is the identity;
  *   - quarterly FRED series emit observations at quarter starts; the
  *     engine's quarter-end shift (F3) stores them 3 months later.
  */
object RegistryFixtures {

  private val Epoch = LocalDate.of(2014, 1, 1)
  /** Months 0..137 = 2014-01 .. 2025-06 (the EDB FY2016..2025 window). */
  val MaxMonth = 137

  private def monthDate(m: Int): String = Epoch.plusMonths(m.toLong).toString

  private def k(cfg: Registry.DatasetConfig): Int =
    Registry.allConfigs.indexOf(cfg) + 1

  /** Integer part of series k at month m. */
  def baseValue(k: Int, m: Int): Long = k * 100L + (m.toLong * (2 * k + 3)) % 37

  /** Quarter-fraction index (0..3); float series add a fraction per idx. */
  def quarterIdx(k: Int, m: Int): Int = (m + k) % 4

  /** Fraction text at quarter idx, in decimals that FIT the dataset's
    * DECLARED DECIMAL scale (Registry.DatasetConfig.decimal): scale-1
    * series (the reference's DECIMAL(12,1) FRED declarations) use tenths,
    * everything else quarter fractions. Both are exact in binary, and both
    * survive the sink's declared-type cast unchanged — so a re-ingest
    * compares clean against the store and the panel oracle can recompute
    * values without modeling any rounding. */
  def fracText(cfg: Registry.DatasetConfig, idx: Int): String = {
    val tenths = cfg.decimal.exists(_._2 == 1)
    idx match {
      case 1 => if (tenths) ".2" else ".25"
      case 2 => ".5"
      case 3 => if (tenths) ".8" else ".75"
      case _ => ""
    }
  }

  /** Exact decimal text of series k at month m (what the fixture stores). */
  def valueText(cfg: Registry.DatasetConfig, m: Int): String = {
    val kk = k(cfg)
    val base = baseValue(kk, m)
    cfg.valueType match {
      case Registry.IntType => base.toString
      case Registry.FloatType => s"$base${fracText(cfg, quarterIdx(kk, m))}"
    }
  }

  /** NYU rate f (1..3) at month m, in exact milli text ("0.017"). */
  def nyuText(f: Int, m: Int): String = {
    val milli = 3L * f + (m.toLong * (f + 2)) % 11
    java.math.BigDecimal.valueOf(milli).movePointLeft(3).toPlainString
  }

  private val FiscalMonths = Seq(
    "July" -> 7, "August" -> 8, "September" -> 9, "October" -> 10,
    "November" -> 11, "December" -> 12, "January" -> 1, "February" -> 2,
    "March" -> 3, "April" -> 4, "May" -> 5, "June" -> 6)

  private val FiscalYears = 2016 to 2025

  /** Write all 26 fixture files into `dir`; returns the file name per
    * dataset name (EDB/NYU are .xlsx workbooks, FRED are .json bodies). */
  def writeAll(dir: String): Map[String, String] = {
    Files.createDirectories(Paths.get(dir))
    val entries = Registry.allConfigs.map { cfg =>
      cfg.kind match {
        case Registry.Monthly | Registry.Quarterly =>
          val header: Vector[String] =
            null +: FiscalYears.map(_.toString).toVector
          val body = FiscalMonths.map { case (name, mn) =>
            name +: FiscalYears.map { fy =>
              val calYear = if (mn >= 7) fy - 1 else fy
              valueText(cfg, (calYear - 2014) * 12 + (mn - 1))
            }.toVector
          }
          val filler = Vector(
            Vector("SYNTHETIC REGISTRY FIXTURE"),
            Vector(cfg.fileName + " / " + cfg.sheetName),
            Vector.empty[String], Vector.empty[String], Vector.empty[String])
          // production EDB files are legacy .XLS BIFF8 workbooks
          // (core_local/config.py:32-116: I_AUTO.XLS, I_BANKRUPT.XLS, ...)
          val file = s"edb_${cfg.name}.xls"
          XlsWriter.write(s"$dir/$file", filler ++ (header +: body))
          cfg.name -> file
        case Registry.Fred =>
          val months =
            if (cfg.frequency == "q") 0 to (MaxMonth - 2) by 3
            else 0 to MaxMonth
          val obs = months.map(m =>
            s"""{"date": "${monthDate(m)}", "value": "${valueText(cfg, m)}"}""")
          val file = s"fred_${cfg.name}.json"
          Files.write(Paths.get(s"$dir/$file"),
            s"""{"observations": [${obs.mkString(", ")}]}"""
              .getBytes(StandardCharsets.UTF_8))
          cfg.name -> file
        case Registry.NyuStern =>
          val header = Vector("Start of month", "T.Bond Rate", "ERP (T12m)",
            "Expected Return")
          val body = (0 to MaxMonth).map(m =>
            monthDate(m) +: (1 to 3).map(f => nyuText(f, m)).toVector).toVector
          val file = "nyu_erp_full.xlsx"
          XlsxWriter.write(s"$dir/$file", header +: body)
          cfg.name -> file
      }
    }
    entries.toMap
  }

  /** DuckDB SQL recomputing the 2020-01..2024-12 panel window (60 monthly
    * rows, 25 single-value columns + 3 NYU rate columns) from the same
    * closed-form formulas — fully independent of the engine's storage. */
  def oracleSql: String = {
    // the fraction CASE is generated FROM fracText, so the oracle cannot
    // drift from the fixture writer's scale-aware fractions
    def fracSql(cfg: Registry.DatasetConfig, idxExpr: String): String = {
      def n(i: Int) = {
        val t = fracText(cfg, i); if (t.isEmpty) "0" else s"0$t"
      }
      s"(CASE ($idxExpr) WHEN 1 THEN ${n(1)} WHEN 2 THEN ${n(2)}" +
        s" WHEN 3 THEN ${n(3)} ELSE 0 END)"
    }
    val singles = Registry.allConfigs
      .filterNot(_.kind == Registry.NyuStern)
      .map { cfg =>
        val kk = k(cfg)
        val expr =
          if (cfg.kind == Registry.Fred && cfg.frequency == "q")
            // quarter-start observation at m-3, stored shifted to month m
            s"CASE WHEN m % 3 = 0 THEN CAST($kk*100 + ((m-3)*(2*$kk+3)) % 37" +
              s" + ${fracSql(cfg, s"(m-3+$kk)%4")} AS DOUBLE) END"
          else if (cfg.valueType == Registry.IntType)
            s"CAST($kk*100 + (m*(2*$kk+3)) % 37 AS DOUBLE)"
          else
            s"CAST($kk*100 + (m*(2*$kk+3)) % 37 + ${fracSql(cfg, s"(m+$kk)%4")} AS DOUBLE)"
        s"$expr AS ${cfg.tableName}"
      }
    val nyu = Registry.nyuValueFields.zipWithIndex.map { case (field, i) =>
      val f = i + 1
      s"CAST((3*$f + (m*($f+2)) % 11) / 1000.0 AS DOUBLE) AS $field"
    }
    s"""SELECT strftime(DATE '2014-01-01' + to_months(CAST(m AS INT)), '%Y-%m-%d') AS date,
       |  ${(singles ++ nyu).mkString(",\n  ")}
       |FROM generate_series(72, 131, 1) AS t(m)
       |ORDER BY date""".stripMargin
  }
}
