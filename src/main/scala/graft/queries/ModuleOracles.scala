package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 module-family oracle queries: the remaining hard families that
  * previously rested on ScalaTest alone, each replayed relationally by
  * DuckDB over the same closed-form generated corpus (the q44-q50
  * recipe).
  */
object ModuleOracles {

  private val Wells = 20

  /** The q51 segment corpus, one well = one segment tree with two real
    * branches, two junctions and three ICDs:
    * {{{
    *   1 <- 2 <- 3 <- 4 <- 5        branch 1 (tubing)
    *             ^         ^  ^
    *             6 <- 7    9  10    branch 2 (+ ICDs 9/10 on br 4/5)
    *                  ^
    *                  8             ICD on branch 3
    * }}}
    * Segment 3 is a plain junction (inflows 4, 6); segment 5 is an
    * ICD-FED junction (inflows 9, 10) — the case rft.py:434-436 dedups
    * with the `CONSEGNO == SEGIDX_upstream` filter. Depth/pressure are
    * exact closed forms of (well, segidx).
    */
  private def segCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    val edges = Seq( // (segidx, segnxt, segbrno)
      (1, None, 1), (2, Some(1), 1), (3, Some(2), 1), (4, Some(3), 1),
      (5, Some(4), 1), (6, Some(3), 2), (7, Some(6), 2),
      (8, Some(7), 3), (9, Some(5), 4), (10, Some(5), 5))
    (0 until Wells).flatMap { w =>
      edges.map { case (idx, nxt, br) =>
        ("W" + w, idx, nxt, br, 1000.0 + 10 * w + idx, 200.0 + w + idx)
      }
    }.toDF("WELL", "SEGIDX", "SEGNXT", "SEGBRNO", "SEGDEPTH", "SEGPRES")
  }

  /** Four connections per well: via ICD 8 (downstream seg 7), via ICDs
    * 9 and 10 (both drain to junction seg 5 — exercises the upstream
    * dedup), and one direct non-ICD connection at seg 2 (anti-join
    * remainder). Connection 4 carries CONPRES = 0 so the reference's
    * zero-pressure guard on COMPLETION_DP (rft.py:478-483) is
    * hash-checked; the [CONLENST, CONLENEN] interval and phase rates
    * feed the CONMD/CONLENTH/scaled-rate derivations.
    */
  private def conCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    val cons = Seq((1, 8), (2, 9), (3, 10), (4, 2)) // (conidx, consegno)
    (0 until Wells).flatMap { w =>
      cons.map { case (ci, csn) =>
        val lenst = 2000.0 + 10 * w + 10 * ci
        ("W" + w, ci, csn, 1000.0 + 10 * w + csn,
          if (ci == 4) 0.0 else 250.0 + w + ci,
          lenst, lenst + 5 + ci, 100.0 + ci, 50.0 + ci, 200.0 + ci)
      }
    }.toDF("WELL", "CONIDX", "CONSEGNO", "CONDEPTH", "CONPRES",
      "CONLENST", "CONLENEN", "CONORAT", "CONWRAT", "CONGRAT")
  }

  /** J5/J6 under the oracle gate: the corpus-native RFT segment pipeline —
    * topology self-join with LEAF/JUNCTION/LONELYSEG/JUNCTION_DOWNSTREAM
    * flags (rft.py:219-276), per-well windowed ICD split (rft.py:326-373),
    * the connection → ICD → branch-segment chain with the ICD-fed-junction
    * upstream dedup and the anti-join direct remainder (rft.py:376-460),
    * and the full add_extras derived surface (rft.py:463-508:
    * zero-guarded COMPLETION_DP, DRAWDOWN default, CONMD/CONLENTH from
    * the length interval, per-length scaled phase rates) — 20 wells in
    * ONE plan keyed on WELL.
    */
  def q51RftTopology(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq("WELL")
    val topo = graft.modules.Rft.processSegTopology(segCorpus(s), keys)
    val (nonIcd, icd) = graft.modules.Rft.splitSegIcd(topo, keys)
    val merged = graft.modules.Rft.mergeIcdSegConseg(conCorpus(s), icd, nonIcd, keys)
    graft.modules.Rft.addDerived(merged)
      .select(col("WELL").as("well"), col("CONIDX").as("conidx"),
        col("CONSEGNO").as("consegno"), col("CONDEPTH").as("condepth"),
        col("CONPRES").as("conpres"),
        col("ICD_SEGIDX").as("icd_segidx"), col("ICD_SEGNXT").as("icd_segnxt"),
        col("ICD_SEGBRNO").as("icd_segbrno"),
        col("ICD_SEGDEPTH").as("icd_segdepth"),
        col("SEGIDX").as("segidx"), col("SEGNXT").as("segnxt"),
        col("SEGBRNO").as("segbrno"), col("SEGDEPTH").as("segdepth"),
        col("SEGPRES").as("segpres"),
        col("LEAF").as("leaf"), col("JUNCTION").as("junction"),
        col("LONELYSEG").as("lonelyseg"),
        col("JUNCTION_DOWNSTREAM").as("junction_downstream"),
        col("SEGIDX_upstream").as("segidx_upstream"),
        col("SEGDEPTH_upstream").as("segdepth_upstream"),
        col("COMPLETION_DP").as("completion_dp"),
        col("DRAWDOWN").as("drawdown"),
        col("CONLENST").as("conlenst"), col("CONLENEN").as("conlenen"),
        col("CONMD").as("conmd"), col("CONLENTH").as("conlenth"),
        col("CONORATS").as("conorats"), col("CONWRATS").as("conwrats"),
        col("CONGRATS").as("congrats"))
      .orderBy(col("well"), col("conidx"))
  }

  private val PrtFiles = 20

  /** One generated PRT file: a dated FIPNUM region-1 block with all four
    * report-row shapes (3/2/1-column oil and gas sections), a `====` table
    * footer followed by a stray report row (must be dropped — the footer
    * closes the block, fipreports.py:162-164), a FIPZON block (other
    * family — also dropped), then a second date and a FIPNUM region-2
    * block. Every numeric cell is `base·r + f` with r the row kind.
    */
  private def prtLines(f: Int): Seq[String] = {
    def v(r: Int, base: Int) = s"${base * r + f}.0"
    def oil3(r: Int) = s"${v(r, 100)}    ${v(r, 200)}    ${v(r, 300)}"
    def gas3(r: Int) = s"${v(r, 500)}    ${v(r, 600)}    ${v(r, 700)}"
    def cur3(r: Int) =
      s" :CURRENTLY IN PLACE       :   ${oil3(r)}:   ${v(r, 400)}:   ${gas3(r)}:"
    Seq(
      "RUNNING SIMULATION",
      s"  REPORT   1     1 JAN ${2000 + f}",
      "  BAL  :FIPNUM  REPORT REGION    1        :",
      cur3(1),
      s" :OUTFLOW TO REGION   2    :   ${v(2, 100)}    ${v(2, 300)}:   ${v(2, 400)}:   ${v(2, 500)}    ${v(2, 700)}:",
      s" :MATERIAL BALANCE ERROR.  :   ${v(3, 300)}:   ${v(3, 400)}:   ${v(3, 700)}:",
      s" :ORIGINALLY IN PLACE      :   ${oil3(4)}:   ${v(4, 400)}:   ${gas3(4)}:",
      " ============================",
      cur3(8), // after the footer: excluded
      s"  REPORT   2    15 FEB ${2000 + f}",
      "  BAL  :FIPZON  REPORT REGION    7        :",
      cur3(9), // other FIP family: excluded
      "  BAL  :FIPNUM  REPORT REGION    2        :",
      cur3(5))
  }

  /** S8 under the oracle gate: the stateful PRT scan as pure relational
    * operators — date and region-block forward-fill windows over per-file
    * line ordinals (fipreports.py:123-170 scan state), family/footer block
    * closing, and the colon-sectioned 3/2/1-column row parse
    * (fipreports.py:34-97) — 20 files in one plan keyed on src.
    */
  def q52Fipreports(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = (0 until PrtFiles).flatMap(f =>
      prtLines(f).zipWithIndex.map { case (l, i) => (l, i.toLong, s"f$f") })
      .toDF("line", "idx", "src")
    graft.modules.FipReports.fromLines(lines)
      .select(col("DATE").as("date"), col("FIPNAME").as("fipname"),
        col("REGION").as("region"), col("DATATYPE").as("datatype"),
        col("TO_REGION").as("to_region"), col("STOIIP_OIL").as("stoiip_oil"),
        col("ASSOCIATEDOIL_GAS").as("associatedoil_gas"),
        col("STOIIP_TOTAL").as("stoiip_total"),
        col("WIIP_TOTAL").as("wiip_total"), col("GIIP_GAS").as("giip_gas"),
        col("ASSOCIATEDGAS_OIL").as("associatedgas_oil"),
        col("GIIP_TOTAL").as("giip_total"))
      .orderBy(col("date"), col("region"), col("datatype"))
  }

  /** S8 corpus mode on the gate: the same [[PrtFiles]] generated PRT
    * texts as q52, but written as REAL files and scanned by
    * `FipReports.corpusFromPath` — one distributed plan (wholetext file
    * scan → per-file posexplode ordinals → src-partitioned scan-state
    * windows), no per-file driver loop. The file identity survives as
    * the `file` column, so the hash also proves no scan state leaked
    * across file boundaries.
    */
  def q89FipreportsCorpus(s: SparkSession, dir: String): DataFrame = {
    val root = BinaryGate.fixtureDir("q89")
    // corpusFromPath scans the WHOLE directory (unlike the BinaryGate
    // queries, which read back exact paths), so clear anything a
    // formula change or crashed run left behind before writing
    new java.io.File(root).listFiles().foreach(_.delete())
    (0 until PrtFiles).foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"case$f.PRT"),
        prtLines(f).mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    graft.modules.FipReports.corpusFromPath(s, root)
      .select(col("SRC").as("file"), col("DATE").as("date"),
        col("REGION").as("region"), col("DATATYPE").as("datatype"),
        col("TO_REGION").as("to_region"),
        col("STOIIP_TOTAL").as("stoiip_total"),
        col("WIIP_TOTAL").as("wiip_total"),
        col("GIIP_TOTAL").as("giip_total"))
      .orderBy(col("file"), col("date"), col("region"), col("datatype"))
  }

  private val TreeCases = 20

  /** R10 on the gate: ASCII tree rendering as data — the LAST operator
    * family that rested outside the hash gate (display-only by design).
    * A 20-tree corpus (ternary forests with two roots, sizes varying per
    * case, names deliberately mixing 1- and 2-digit suffixes so
    * lexicographic sibling order ≠ numeric order) renders through the
    * distributed `TreePrint.renderLines` (one task per tree); the DuckDB
    * oracle replays the walk as a RECURSIVE CTE carrying the prefix
    * string down the tree and ordering lines by the '/'-joined path
    * (for alphanumeric names, path order IS DFS preorder: '/' sorts
    * below every alnum char). Every box-drawing connector, prefix run
    * and line ordinal must hash-match.
    */
  def q90TreeRender(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = (0 until TreeCases).flatMap { c =>
      val nNodes = 12 + c % 4
      (0 until nNodes).map { n =>
        val parent =
          if (n < 2) None else Some(s"N${(((n - 2) / 3) * 7 + c) % 100}")
        (c.toLong, s"N${(n * 7 + c) % 100}", parent)
      }
    }.toDF("case_id", "CHILD", "PARENT")
    graft.modules.TreePrint.renderLines(edges, "case_id")
      .select(col("case_id").cast("long").as("case_id"),
        col("line_no"), col("line"))
      .orderBy(col("case_id"), col("line_no"))
  }

  private val Cases = 20

  /** The q53 summary corpus: per case, a three-hop restart ancestry
    * (grandparent Jan 1-6, parent restarts Jan 4-8, child restarts Jan 7
    * with a duplicate Jan 8 report step). Case identity rides in the
    * vector name ("V0@c3"), so all [[Cases]] chains fold in ONE plan —
    * chainRestart is keyed per vector by construction. Even cases carry a
    * DAYS-unit TIMESTEP (0.25 → +6 h on the duplicate), odd cases HOURS
    * (0.25 → +15 min).
    */
  private def summaryRuns(s: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    // dates go in as strings and cast in-plan, so the timestamps are
    // session-timezone values like every other query corpus —
    // java.sql.Timestamp.valueOf would bake in the JVM default zone and
    // hash-mismatch the (naive) DuckDB oracle on a non-UTC driver
    def day(d: Int) = f"2000-01-${d}%02d 00:00:00"
    def rows(firstDay: Int, dayOff: Int => Int, steps: Int, valOff: Int) =
      (0 until Cases).flatMap { c =>
        (0 until 2).flatMap { k =>
          (0 until steps).map { i =>
            (s"V$k@c$c", day(firstDay + dayOff(i)),
              (100000 * k + 1000 * c + valOff + i).toDouble, 0.25,
              if (c % 2 == 0) "DAYS" else "HOURS", i)
          }
        }
      }.toDF("VECTOR", "DATE", "VALUE", "TIMESTEP", "UNIT", "STEP")
        .withColumn("DATE", to_timestamp(col("DATE")))
    (rows(1, identity, 6, 0),              // grandparent: Jan 1..6
      rows(4, identity, 5, 100),           // parent: Jan 4..8
      rows(7, Seq(0, 1, 1, 2), 4, 200))    // child: Jan 7, 8, 8 (dup), 9
  }

  /** W5 + restart chaining under the oracle gate: chainRestart folds a
    * three-hop RESTART ancestry ("the restarted run owns every date from
    * its start", summary.py:299/332 / resdata include_restart) and
    * ensureUniqueDates separates the surviving duplicate report step by
    * its own TIMESTEP value in the frame's unit
    * (_ensure_unique_datetime_index, summary.py:435-483) — 20 chains, 40
    * vectors, one plan.
    */
  def q53SummaryRestart(s: SparkSession, dir: String): DataFrame = {
    import graft.modules.Summary
    val (gp, parent, child) = summaryRuns(s)
    val chained = Summary.chainRestart(Summary.chainRestart(gp, parent), child)
    val fixed = Seq("DAYS", "HOURS").map { u =>
      Summary.ensureUniqueDates(chained.filter(col("UNIT") === u),
        Seq("VECTOR"), Seq(col("STEP")),
        timestep = Some(col("TIMESTEP")), timestepUnit = u)
    }.reduce(_ unionByName _)
    fixed.select(col("VECTOR").as("vector"), col("DATE").as("date"),
        col("VALUE").as("value"), col("TIMESTEP").as("timestep"))
      .orderBy(col("vector"), col("date"))
  }

  /** The q54 corpus: per well, four connections on layers 1-4 (zonemap
    * covers 1-2 → A, 3 → B; layer 4 unmapped and dropped), a Feb
    * status flip on connection 1, plus X-prefixed clone wells that the
    * exclusion filter must drop. Even wells also get CPI summary vectors
    * (0→5→0 on conn 1, first-positive on conn 2, all-zero on conn 3), so
    * their completion history comes from the connection-status change log
    * instead of compdat.
    */
  private def wcdCompdat(s: SparkSession): DataFrame = {
    import s.implicits._
    val d1 = java.sql.Date.valueOf("2000-01-01")
    val d2 = java.sql.Date.valueOf("2000-02-01")
    (0 until Wells).flatMap { w =>
      Seq("W", "X").flatMap { p =>
        val well = s"$p$w"
        Seq(
          (well, 1, 1, 1, 1, "OPEN", 10.0 + w, d1),
          (well, 1, 1, 2, 2, "OPEN", 20.0 + w, d1),
          (well, 1, 1, 3, 3, "SHUT", 30.0 + w, d1),
          (well, 1, 1, 4, 4, "OPEN", 40.0 + w, d1),
          (well, 1, 1, 1, 1, "SHUT", 10.0 + w, d2))
      }
    }.toDF("WELL", "I", "J", "K1", "K2", "OP/SH", "KH", "DATE")
  }

  private def wcdCpi(s: SparkSession): DataFrame = {
    import s.implicits._
    val dates = Seq("2000-01-01", "2000-02-01", "2000-03-01")
      .map(java.sql.Date.valueOf)
    (0 until Wells by 2).flatMap { w =>
      Seq(
        (s"CPI:W$w:1,1,1", dates(0), 0.0), (s"CPI:W$w:1,1,1", dates(1), 5.0),
        (s"CPI:W$w:1,1,1", dates(2), 0.0),
        (s"CPI:W$w:1,1,2", dates(0), 3.0),
        (s"CPI:W$w:1,1,3", dates(0), 0.0), (s"CPI:W$w:1,1,3", dates(1), 0.0))
    }.toDF("VECTOR", "DATE", "VALUE")
  }

  /** J8/A4 (+P12/W3/J4) under the oracle gate: the whole
    * wellcompletiondata pipeline — CPI-vector change detection
    * (wellconnstatus.py:38-86), connstatus-over-compdat merge with the
    * compdat-only remainder (wellcompletiondata.py:168-215), well-prefix
    * exclusion, zonemap lookup with unmapped-layer drop, and the
    * zone-level KH/status rollup (wellcompletiondata.py:141-165) — 20
    * wells in one plan keyed on WELL.
    */
  def q54WellCompletion(s: SparkSession, dir: String): DataFrame = {
    val cs = graft.modules.WellOps.wellConnStatus(wcdCpi(s))
    graft.modules.WellCompletionData.df(wcdCompdat(s),
        zonemap = Map(1 -> "A", 2 -> "A", 3 -> "B"),
        connstatus = Some(cs), excludeWellPrefix = Some("X"))
      .select(col("WELL").as("well"), col("ZONE").as("zone"),
        col("DATE").as("date"), col("KH").as("kh"), col("OP/SH").as("op_sh"))
      .orderBy(col("well"), col("zone"), col("date"))
  }

  /** q197 fixture: one connection per well over a year of monthly CPI
    * samples, value = 0 when (w + month) ≡ 0 (mod 4) else 1 — every
    * well cycles through shut-in months at a phase set by its id, so
    * islands, their lengths, and the open-at-horizon tail all vary by
    * well in closed form.
    */
  private def uptimeCpi(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until Wells).flatMap { w =>
      (0 until 12).map { d =>
        (s"CPI:W$w:1,1,1",
          java.sql.Date.valueOf(java.time.LocalDate.of(2000, 1, 1).plusMonths(d)),
          if ((w + d) % 4 == 0) 0.0 else 1.0)
      }
    }.toDF("VECTOR", "DATE", "VALUE")
  }

  /** q197: WELL UPTIME ISLANDS — the production-availability report on
    * top of the connection-status change log: each OPEN event from
    * [[graft.modules.WellOps.wellConnStatus]] (the real module — first
    * positive sample opens, transitions after) pairs with the NEXT
    * change of the same connection (lead window) or the end-of-history
    * horizon, yielding per-well uptime segments with exact day
    * durations, plus the per-well rollup (segment count / total /
    * longest) broadcast back onto the segments. The reference's
    * connstatus front stops at the change log; the islands-and-
    * durations layer is the question an availability review actually
    * asks of it.
    *
    * Scale shape: change detection and the lead pairing share ONE
    * window exchange keyed (well, conn); the rollup re-keys by well
    * (report-sized) and broadcasts back. Nothing quadratic; the
    * segment count is bounded by the change-log size.
    */
  def q197UptimeIslands(s: SparkSession, dir: String): DataFrame = {
    val horizon = java.sql.Date.valueOf("2001-01-01")
    val cs = graft.modules.WellOps.wellConnStatus(uptimeCpi(s))
    val w = Window.partitionBy(col("WELL"), col("I"), col("J"), col("K"))
      .orderBy(col("DATE"))
    val segs = cs
      .withColumn("next_date", lead(col("DATE"), 1).over(w))
      .filter(col("OP/SH") === "OPEN")
      .select(col("WELL").as("well"), col("DATE").as("start_date"),
        coalesce(col("next_date"), lit(horizon)).as("end_date"),
        col("next_date").isNull.as("open_at_end"))
      .withColumn("days",
        datediff(col("end_date"), col("start_date")).cast("long"))
    val tot = segs.groupBy(col("well"))
      .agg(count(lit(1)).as("n_segments"), sum(col("days")).as("uptime_days"),
        max(col("days")).as("longest_days"))
    segs.join(broadcast(tot), Seq("well"))
      .select(col("well"), col("start_date").cast("timestamp").as("start_date"),
        col("end_date").cast("timestamp").as("end_date"), col("days"),
        col("open_at_end"), col("n_segments"), col("uptime_days"),
        col("longest_days"))
      .orderBy(col("well"), col("start_date"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_uptime_islands" -> (q197UptimeIslands _),
    "q51_rft_topology" -> (q51RftTopology _),
    "q52_fipreports" -> (q52Fipreports _),
    "q89_fipreports_corpus" -> (q89FipreportsCorpus _),
    "q90_tree_render" -> (q90TreeRender _),
    "q53_summary_restart" -> (q53SummaryRestart _),
    "q54_wellcompletion" -> (q54WellCompletion _),
  )

  /** The q51 oracle rebuilds the same segment/connection corpus in closed
    * form and replays the whole chain relationally: self-join for
    * upstream rows, inflow counts for LEAF/JUNCTION, a windowed count for
    * LONELYSEG, per-well branch stats for the ICD split, then the
    * via-ICD join (with the upstream dedup) plus the anti-join direct
    * path.
    */
  /** Shared q52/q89 oracle prefix: generate the PRT corpus by template
    * and replay the stateful scan relationally - regex date/region
    * extraction, IGNORE NULLS forward-fill windows per file, family/
    * footer block close, colon-section split - ending at the `parsed`
    * CTE (which carries the file id `f` for q89).
    */
  private def prtScanCte: String =
      s"""WITH files AS (SELECT CAST(unnest(range($PrtFiles)) AS BIGINT) AS f),
        |tmpl(idx, kind, r) AS (VALUES
        |  (0, 'noise', 0), (1, 'date1', 0), (2, 'hdr1', 0), (3, 'cur', 1),
        |  (4, 'out', 2), (5, 'mat', 3), (6, 'orig', 4), (7, 'eq', 0),
        |  (8, 'cur', 8), (9, 'date2', 0), (10, 'hdrz', 0), (11, 'cur', 9),
        |  (12, 'hdr2', 0), (13, 'cur', 5)),
        |lines AS (
        |  SELECT f, idx,
        |    CASE kind
        |      WHEN 'noise' THEN 'RUNNING SIMULATION'
        |      WHEN 'date1' THEN '  REPORT   1     1 JAN ' || (2000 + f)
        |      WHEN 'date2' THEN '  REPORT   2    15 FEB ' || (2000 + f)
        |      WHEN 'hdr1' THEN '  BAL  :FIPNUM  REPORT REGION    1        :'
        |      WHEN 'hdr2' THEN '  BAL  :FIPNUM  REPORT REGION    2        :'
        |      WHEN 'hdrz' THEN '  BAL  :FIPZON  REPORT REGION    7        :'
        |      WHEN 'eq' THEN ' ============================'
        |      WHEN 'cur' THEN ' :CURRENTLY IN PLACE       :   '
        |        || (100*r+f) || '.0    ' || (200*r+f) || '.0    ' || (300*r+f)
        |        || '.0:   ' || (400*r+f) || '.0:   ' || (500*r+f) || '.0    '
        |        || (600*r+f) || '.0    ' || (700*r+f) || '.0:'
        |      WHEN 'out' THEN ' :OUTFLOW TO REGION   2    :   '
        |        || (100*r+f) || '.0    ' || (300*r+f) || '.0:   ' || (400*r+f)
        |        || '.0:   ' || (500*r+f) || '.0    ' || (700*r+f) || '.0:'
        |      WHEN 'mat' THEN ' :MATERIAL BALANCE ERROR.  :   '
        |        || (300*r+f) || '.0:   ' || (400*r+f) || '.0:   '
        |        || (700*r+f) || '.0:'
        |      WHEN 'orig' THEN ' :ORIGINALLY IN PLACE      :   '
        |        || (100*r+f) || '.0    ' || (200*r+f) || '.0    ' || (300*r+f)
        |        || '.0:   ' || (400*r+f) || '.0:   ' || (500*r+f) || '.0    '
        |        || (600*r+f) || '.0    ' || (700*r+f) || '.0:'
        |    END AS line
        |  FROM files, tmpl),
        |scan AS (
        |  SELECT f, idx, line,
        |    CASE WHEN regexp_matches(line,
        |           '^\\s{1,3}REPORT\\s+\\d+\\s+\\d+\\s+[A-Z]{3}\\s+\\d+')
        |      THEN make_date(
        |        CAST(regexp_extract(line,
        |          'REPORT\\s+\\d+\\s+\\d+\\s+[A-Z]{3}\\s+(\\d+)', 1) AS INT),
        |        CASE regexp_extract(line,
        |          'REPORT\\s+\\d+\\s+\\d+\\s+([A-Z]{3})', 1)
        |          WHEN 'JAN' THEN 1 WHEN 'FEB' THEN 2 END,
        |        CAST(regexp_extract(line, 'REPORT\\s+\\d+\\s+(\\d+)', 1) AS INT))
        |    END AS date_here,
        |    CASE WHEN regexp_extract(line,
        |           ':\\s*(FIP[A-Z0-9_]*)\\s+REPORT\\s+REGION', 1) = 'FIPNUM'
        |           THEN CAST(regexp_extract(line,
        |             'REPORT\\s+REGION\\s+(\\d+)', 1) AS INT)
        |         WHEN regexp_extract(line,
        |           ':\\s*(FIP[A-Z0-9_]*)\\s+REPORT\\s+REGION', 1) <> '' THEN -1
        |         WHEN line LIKE ' ============================%' THEN -1
        |    END AS region_here
        |  FROM lines),
        |st AS (
        |  SELECT f, idx, line,
        |    last_value(date_here IGNORE NULLS)
        |      OVER (PARTITION BY f ORDER BY idx) AS date,
        |    last_value(region_here IGNORE NULLS)
        |      OVER (PARTITION BY f ORDER BY idx) AS region
        |  FROM scan),
        |rpt AS (SELECT * FROM st
        |        WHERE region IS NOT NULL AND region <> -1
        |          AND regexp_matches(trim(line),
        |            '^:(CURRENTLY|OUTFLOW|MATERIAL|ORIGINALLY)')),
        |parsed AS (
        |  SELECT f, date, region, line, string_split(line, ':') AS s,
        |         string_split_regex(trim(string_split(line, ':')[3]), '\\s+') AS oil,
        |         trim(string_split(line, ':')[4]) AS water,
        |         string_split_regex(trim(string_split(line, ':')[5]), '\\s+') AS gas
        |  FROM rpt)
        |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    /* The q54 oracle rebuilds the corpus (W-prefixed wells only — the X
     * clones fall to the exclusion filter) and replays the pipeline:
     * lag-window change detection over CPI samples, connstatus rows
     * joined to compdat attributes with the compdat-only-well remainder,
     * inline zonemap with unmapped layers dropped, and the
     * any-open/KH-sum zone rollup. */
    // q197: the CPI lattice in closed form, the module's first-positive/
    // transition rule as lag windows, lead pairing to the next change or
    // the horizon, and the per-well rollup joined back
    "q197_uptime_islands" ->
      s"""WITH wl AS (SELECT unnest(range($Wells)) AS w),
        |mo AS (SELECT unnest(range(12)) AS d),
        |cpi AS (SELECT 'W' || CAST(w AS VARCHAR) AS well, w, d,
        |               CAST(DATE '2000-01-01' + to_months(CAST(d AS INT)) AS DATE) AS date,
        |               CASE WHEN (w + d) % 4 = 0 THEN 0.0 ELSE 1.0 END AS value
        |        FROM wl CROSS JOIN mo),
        |fl AS (SELECT well, date, value > 0 AS open,
        |              lag(value > 0) OVER (PARTITION BY well ORDER BY date) AS prev_open
        |       FROM cpi),
        |ch AS (SELECT well, date, CASE WHEN open THEN 'OPEN' ELSE 'SHUT' END AS st
        |       FROM fl WHERE (prev_open IS NULL AND open)
        |                  OR (prev_open IS NOT NULL AND prev_open <> open)),
        |seg0 AS (SELECT well, date AS start_date, st,
        |                lead(date) OVER (PARTITION BY well ORDER BY date) AS next_date
        |         FROM ch),
        |segs AS (SELECT well, start_date,
        |                coalesce(next_date, DATE '2001-01-01') AS end_date,
        |                next_date IS NULL AS open_at_end,
        |                CAST(date_diff('day', start_date,
        |                     coalesce(next_date, DATE '2001-01-01')) AS BIGINT) AS days
        |         FROM seg0 WHERE st = 'OPEN'),
        |tot AS (SELECT well, CAST(count(*) AS BIGINT) AS n_segments,
        |               CAST(sum(days) AS BIGINT) AS uptime_days,
        |               CAST(max(days) AS BIGINT) AS longest_days
        |        FROM segs GROUP BY 1)
        |SELECT s.well, CAST(s.start_date AS TIMESTAMP) AS start_date,
        |       CAST(s.end_date AS TIMESTAMP) AS end_date, s.days,
        |       s.open_at_end, t.n_segments, t.uptime_days, t.longest_days
        |FROM segs s JOIN tot t USING (well)
        |ORDER BY s.well, s.start_date""".stripMargin,
    "q54_wellcompletion" ->
      s"""WITH wells AS (SELECT CAST(unnest(range($Wells)) AS BIGINT) AS w),
        |compdat AS (
        |  SELECT 'W' || w AS well, r.k1, r.opsh, r.kh0 + w AS kh, r.d AS date
        |  FROM wells, (VALUES (1, 'OPEN', 10.0, DATE '2000-01-01'),
        |                      (2, 'OPEN', 20.0, DATE '2000-01-01'),
        |                      (3, 'SHUT', 30.0, DATE '2000-01-01'),
        |                      (4, 'OPEN', 40.0, DATE '2000-01-01'),
        |                      (1, 'SHUT', 10.0, DATE '2000-02-01'))
        |       r(k1, opsh, kh0, d)),
        |cpi AS (SELECT 'W' || w AS well, r.k, r.d AS date, r.v AS value
        |        FROM wells, (VALUES (1, DATE '2000-01-01', 0.0),
        |                            (1, DATE '2000-02-01', 5.0),
        |                            (1, DATE '2000-03-01', 0.0),
        |                            (2, DATE '2000-01-01', 3.0),
        |                            (3, DATE '2000-01-01', 0.0),
        |                            (3, DATE '2000-02-01', 0.0)) r(k, d, v)
        |        WHERE w % 2 = 0),
        |cs AS (  -- W3: 0→positive = OPEN (first positive too), positive→0 = SHUT
        |  SELECT well, k, date,
        |         CASE WHEN open THEN 'OPEN' ELSE 'SHUT' END AS opsh
        |  FROM (SELECT *, value > 0 AS open,
        |               lag(value > 0) OVER (PARTITION BY well, k ORDER BY date)
        |                 AS prev
        |        FROM cpi)
        |  WHERE (prev IS NULL AND open) OR (prev IS NOT NULL AND prev <> open)),
        |merged AS (  -- J8: connstatus wins where present, compdat elsewhere
        |  SELECT c.well, c.k AS k1, c.date, c.opsh, a.kh
        |  FROM cs c JOIN (SELECT DISTINCT well, k1, kh FROM compdat) a
        |    ON a.well = c.well AND a.k1 = c.k
        |  UNION ALL
        |  SELECT well, k1, date, opsh, kh FROM compdat
        |  WHERE well NOT IN (SELECT DISTINCT well FROM cs)),
        |zoned AS (  -- J4: zonemap lookup, unmapped layers dropped
        |  SELECT m.*, CASE WHEN k1 IN (1, 2) THEN 'A'
        |                   WHEN k1 = 3 THEN 'B' END AS zone
        |  FROM merged m)
        |SELECT well, zone, date,
        |  CAST(coalesce(sum(CASE WHEN opsh = 'OPEN' THEN kh END), 0) AS DOUBLE)
        |    AS kh,
        |  CASE WHEN max(CASE WHEN opsh = 'OPEN' THEN 1 ELSE 0 END) = 1
        |       THEN 'OPEN' ELSE 'SHUT' END AS op_sh
        |FROM zoned WHERE zone IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY well, zone, date""".stripMargin,

    /* The q53 oracle rebuilds the three runs in closed form and replays
     * the chain relationally: each hop keeps ancestor rows strictly
     * before the per-vector min date of the newer run (history rewrite),
     * then the duplicate-timestamp CTE offsets every post-first row
     * sharing a (vector, date) by its TIMESTEP in the case's unit. */
    "q53_summary_restart" ->
      s"""WITH cases AS (SELECT CAST(unnest(range($Cases)) AS BIGINT) AS c),
        |ks AS (SELECT CAST(unnest(range(2)) AS BIGINT) AS k),
        |gp AS (SELECT c, k, CAST(i AS INT) AS step,
        |         TIMESTAMP '2000-01-01' + CAST(i AS INT) * INTERVAL 1 DAY AS date,
        |         CAST(100000*k + 1000*c + i AS DOUBLE) AS value
        |       FROM cases, ks, (SELECT unnest(range(6)) AS i)),
        |par AS (SELECT c, k, CAST(i AS INT) AS step,
        |         TIMESTAMP '2000-01-04' + CAST(i AS INT) * INTERVAL 1 DAY AS date,
        |         CAST(100000*k + 1000*c + 100 + i AS DOUBLE) AS value
        |       FROM cases, ks, (SELECT unnest(range(5)) AS i)),
        |ch AS (SELECT c, k, CAST(i AS INT) AS step,
        |         TIMESTAMP '2000-01-07' + (CASE WHEN i = 0 THEN 0
        |           WHEN i = 3 THEN 2 ELSE 1 END) * INTERVAL 1 DAY AS date,
        |         CAST(100000*k + 1000*c + 200 + i AS DOUBLE) AS value
        |       FROM cases, ks, (SELECT unnest(range(4)) AS i)),
        |minp AS (SELECT c, k, min(date) AS md FROM par GROUP BY 1, 2),
        |minc AS (SELECT c, k, min(date) AS md FROM ch GROUP BY 1, 2),
        |chained AS (
        |  SELECT g.* FROM gp g
        |    JOIN minp ON minp.c = g.c AND minp.k = g.k
        |    JOIN minc ON minc.c = g.c AND minc.k = g.k
        |  WHERE g.date < minp.md AND g.date < minc.md
        |  UNION ALL
        |  SELECT p.* FROM par p JOIN minc ON minc.c = p.c AND minc.k = p.k
        |  WHERE p.date < minc.md
        |  UNION ALL SELECT * FROM ch),
        |dedup AS (SELECT *, row_number()
        |            OVER (PARTITION BY c, k, date ORDER BY step) - 1 AS n
        |          FROM chained)
        |SELECT 'V' || k || '@c' || c AS vector,
        |  CASE WHEN n > 0 THEN date + CASE WHEN c % 2 = 0
        |       THEN INTERVAL 21600 SECOND ELSE INTERVAL 900 SECOND END
        |       ELSE date END AS date,
        |  value, CAST(0.25 AS DOUBLE) AS timestep
        |FROM dedup
        |ORDER BY vector, date""".stripMargin,

    /* The q52 oracle builds the same PRT lines by template and replays
     * the scan relationally: regex date/region extraction, IGNORE NULLS
     * forward-fill windows per file, family/footer block close, and the
     * colon-section split with 3/2/1-column oil/gas parsing. */
    "q52_fipreports" -> (prtScanCte +
      """SELECT date, 'FIPNUM' AS fipname, region,
        |  CASE WHEN contains(line, 'OUTFLOW TO REGION') THEN 'OUTFLOW TO REGION'
        |       ELSE upper(trim(regexp_replace(s[2], '\s+', ' ', 'g'))) END
        |    AS datatype,
        |  CASE WHEN contains(line, 'OUTFLOW TO REGION')
        |       THEN CAST(regexp_extract(s[2], 'REGION\s+(\d+)', 1) AS INT) END
        |    AS to_region,
        |  CASE WHEN len(oil) >= 2 THEN CAST(oil[1] AS DOUBLE) END AS stoiip_oil,
        |  CASE WHEN len(oil) = 3 THEN CAST(oil[2] AS DOUBLE) END
        |    AS associatedoil_gas,
        |  CAST(oil[len(oil)] AS DOUBLE) AS stoiip_total,
        |  CAST(water AS DOUBLE) AS wiip_total,
        |  CASE WHEN len(gas) >= 2 THEN CAST(gas[1] AS DOUBLE) END AS giip_gas,
        |  CASE WHEN len(gas) = 3 THEN CAST(gas[2] AS DOUBLE) END
        |    AS associatedgas_oil,
        |  CAST(gas[len(gas)] AS DOUBLE) AS giip_total
        |FROM parsed
        |ORDER BY date, region, datatype""".stripMargin),

    /* The q90 oracle replays the tree walk as a recursive CTE: sibling
     * rank/count precomputed per edge, the render prefix accumulated
     * down the recursion, DFS line order recovered from the path. */
    "q90_tree_render" ->
      s"""WITH RECURSIVE cases AS (SELECT CAST(unnest(range($TreeCases)) AS BIGINT) AS c),
        |nodes AS (SELECT c, CAST(unnest(range(12 + c % 4)) AS BIGINT) AS n FROM cases),
        |edges AS (SELECT c, 'N' || ((n * 7 + c) % 100) AS child,
        |                 CASE WHEN n >= 2
        |                      THEN 'N' || ((((n - 2) // 3) * 7 + c) % 100) END AS parent
        |          FROM nodes),
        |sib AS (SELECT c, child, parent,
        |               row_number() OVER (PARTITION BY c, parent ORDER BY child) AS rn,
        |               count(*) OVER (PARTITION BY c, parent) AS cnt
        |        FROM edges WHERE parent IS NOT NULL),
        |walk AS (
        |  SELECT c, child AS name, child AS path,
        |         CAST('' AS VARCHAR) AS cprefix, child AS line
        |  FROM edges WHERE parent IS NULL
        |  UNION ALL
        |  SELECT s.c, s.child, w.path || '/' || s.child,
        |         w.cprefix || CASE WHEN s.rn = s.cnt THEN '    ' ELSE '│   ' END,
        |         w.cprefix || CASE WHEN s.rn = s.cnt THEN '└── ' ELSE '├── ' END
        |           || s.child
        |  FROM walk w JOIN sib s ON s.c = w.c AND s.parent = w.name)
        |SELECT c AS case_id,
        |       CAST(row_number() OVER (PARTITION BY c ORDER BY path) AS BIGINT)
        |         AS line_no,
        |       line
        |FROM walk ORDER BY case_id, line_no""".stripMargin,

    /* The q89 oracle is the SAME generated corpus and scan replay, with
     * the file identity surviving to the output — the corpus-mode
     * contract (state never crosses a file boundary) under the hash. */
    "q89_fipreports_corpus" -> (prtScanCte +
      """SELECT 'case' || f || '.PRT' AS file, date, region,
        |  CASE WHEN contains(line, 'OUTFLOW TO REGION') THEN 'OUTFLOW TO REGION'
        |       ELSE upper(trim(regexp_replace(s[2], '\s+', ' ', 'g'))) END
        |    AS datatype,
        |  CASE WHEN contains(line, 'OUTFLOW TO REGION')
        |       THEN CAST(regexp_extract(s[2], 'REGION\s+(\d+)', 1) AS INT) END
        |    AS to_region,
        |  CAST(oil[len(oil)] AS DOUBLE) AS stoiip_total,
        |  CAST(water AS DOUBLE) AS wiip_total,
        |  CAST(gas[len(gas)] AS DOUBLE) AS giip_total
        |FROM parsed
        |ORDER BY file, date, region, datatype""".stripMargin),

    "q51_rft_topology" ->
      s"""WITH wells AS (SELECT CAST(unnest(range($Wells)) AS BIGINT) AS w),
        |edges(segidx, segnxt, segbrno) AS (VALUES
        |  (1, NULL, 1), (2, 1, 1), (3, 2, 1), (4, 3, 1), (5, 4, 1),
        |  (6, 3, 2), (7, 6, 2), (8, 7, 3), (9, 5, 4), (10, 5, 5)),
        |seg AS (
        |  SELECT w, CAST(segidx AS INT) AS segidx, CAST(segnxt AS INT) AS segnxt,
        |         CAST(segbrno AS INT) AS segbrno,
        |         1000.0 + 10 * w + segidx AS segdepth,
        |         200.0 + w + segidx AS segpres
        |  FROM wells, edges),
        |merged AS (  -- J5: one row per inflow, upstream columns suffixed
        |  SELECT s.*, u.segidx AS segidx_upstream, u.segdepth AS segdepth_upstream
        |  FROM seg s LEFT JOIN seg u ON u.w = s.w AND u.segnxt = s.segidx),
        |inflow AS (SELECT w, segnxt AS segidx, count(*) AS n FROM seg
        |           WHERE segnxt IS NOT NULL GROUP BY 1, 2),
        |topo AS (
        |  SELECT m.*, coalesce(i.n, 0) > 1 AS junction,
        |         coalesce(i.n, 0) = 0 AS leaf,
        |         EXISTS (SELECT 1 FROM inflow j
        |                 WHERE j.w = m.w AND j.segidx = m.segnxt AND j.n > 1)
        |           AS junction_downstream,
        |         count(*) OVER (PARTITION BY m.w, m.segbrno) = 1 AS lonelyseg
        |  FROM merged m LEFT JOIN inflow i ON i.w = m.w AND i.segidx = m.segidx),
        |stats AS (  -- per-well ICD presence: max branch no > true branches
        |  SELECT w, max(segbrno) AS mx,
        |         greatest(1, count(DISTINCT CASE WHEN NOT leaf OR junction_downstream
        |                                         THEN segbrno END)) AS br
        |  FROM topo GROUP BY 1),
        |icd AS (SELECT t.* FROM topo t JOIN stats st ON st.w = t.w AND st.mx > st.br
        |        WHERE t.leaf AND t.lonelyseg),
        |nonicd AS (SELECT t.* FROM topo t
        |           WHERE NOT (t.leaf AND t.lonelyseg AND EXISTS
        |             (SELECT 1 FROM stats st WHERE st.w = t.w AND st.mx > st.br))),
        |con AS (
        |  SELECT w, c.conidx, c.consegno,
        |         1000.0 + 10 * w + c.consegno AS condepth,
        |         CASE WHEN c.conidx = 4 THEN CAST(0.0 AS DOUBLE)
        |              ELSE 250.0 + w + c.conidx END AS conpres,
        |         2000.0 + 10 * w + 10 * c.conidx AS conlenst,
        |         2000.0 + 10 * w + 10 * c.conidx + 5 + c.conidx AS conlenen,
        |         100.0 + c.conidx AS conorat, 50.0 + c.conidx AS conwrat,
        |         200.0 + c.conidx AS congrat
        |  FROM wells, (VALUES (1, 8), (2, 9), (3, 10), (4, 2)) c(conidx, consegno)),
        |via AS (  -- J6 via-ICD chain with the upstream dedup (rft.py:434-436)
        |  SELECT c.w, c.conidx, c.consegno, c.condepth, c.conpres,
        |         c.conlenst, c.conlenen, c.conorat, c.conwrat, c.congrat,
        |         i.segidx AS icd_segidx, i.segnxt AS icd_segnxt,
        |         i.segbrno AS icd_segbrno, i.segdepth AS icd_segdepth,
        |         t.segidx, t.segnxt, t.segbrno, t.segdepth, t.segpres,
        |         t.leaf, t.junction, t.lonelyseg, t.junction_downstream,
        |         t.segidx_upstream, t.segdepth_upstream
        |  FROM con c
        |  JOIN icd i ON i.w = c.w AND i.segidx = c.consegno
        |  LEFT JOIN nonicd t ON t.w = c.w AND t.segidx = i.segnxt
        |  WHERE c.consegno = t.segidx_upstream),
        |direct AS (  -- anti-join remainder joins its segment directly
        |  SELECT c.w, c.conidx, c.consegno, c.condepth, c.conpres,
        |         c.conlenst, c.conlenen, c.conorat, c.conwrat, c.congrat,
        |         CAST(NULL AS INT) AS icd_segidx, CAST(NULL AS INT) AS icd_segnxt,
        |         CAST(NULL AS INT) AS icd_segbrno, CAST(NULL AS DOUBLE) AS icd_segdepth,
        |         t.segidx, t.segnxt, t.segbrno, t.segdepth, t.segpres,
        |         t.leaf, t.junction, t.lonelyseg, t.junction_downstream,
        |         t.segidx_upstream, t.segdepth_upstream
        |  FROM con c JOIN nonicd t ON t.w = c.w AND t.segidx = c.consegno
        |  WHERE NOT EXISTS (SELECT 1 FROM icd i
        |                    WHERE i.w = c.w AND i.segidx = c.consegno)),
        |unioned AS (SELECT * FROM via UNION ALL SELECT * FROM direct)
        |SELECT 'W' || w AS well, conidx, consegno, condepth, conpres,
        |       icd_segidx, icd_segnxt, icd_segbrno, icd_segdepth,
        |       segidx, segnxt, segbrno, segdepth, segpres,
        |       leaf, junction, lonelyseg, junction_downstream,
        |       segidx_upstream, segdepth_upstream,
        |       -- add_extras: zero-guarded dp, drawdown default, length family
        |       CASE WHEN conpres > 0 AND segpres > 0 THEN conpres - segpres
        |            ELSE CAST(0.0 AS DOUBLE) END AS completion_dp,
        |       CAST(0.0 AS DOUBLE) AS drawdown,
        |       conlenst, conlenen,
        |       0.5 * (conlenst + conlenen) AS conmd,
        |       conlenen - conlenst AS conlenth,
        |       conorat / (conlenen - conlenst) AS conorats,
        |       conwrat / (conlenen - conlenst) AS conwrats,
        |       congrat / (conlenen - conlenst) AS congrats
        |FROM unioned
        |ORDER BY well, conidx""".stripMargin,
  )
}
