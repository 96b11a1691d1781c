package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.modules.{Equil, Faults, GridOps, Pillars, Pvt}

/** Round-8 reservoir-family oracle queries: the last §2 operator families
  * that rested on ScalaTest alone — pillar contacts (A2/P11/J13), the
  * FAULTS 3-D unroll (R2), the PVT nested reshape (R6/R7), EQUIL with
  * phase-dependent contact columns, and the trans neighbour-pair
  * construction with direction filters + NNC concat (P9/J7/U2) — each
  * replayed relationally by DuckDB over the same closed-form corpus
  * (the q44-q54 recipe).
  */
object ReservoirGate {

  // ---------------------------------------------------------------- q71

  /** The q71 grid: 8×5 pillars × 10 layers. Saturations are closed forms
    * of (i, j, k) chosen so every contact rule fires somewhere:
    * water legs at k ≥ 8 except on i%4==0 pillars (those fail the
    * water-eligibility semi-join and must lose their OWC), gas caps at
    * k ≤ 2 except on j%3==0 pillars (no GOC there — and because BOTH
    * contact frames are non-empty, pillars.py:310-318 inner-joins them,
    * so those pillars report NEITHER contact). All cell values are
    * integer-valued doubles, so sums/averages are exact cross-engine.
    */
  private def pillarGrid(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { i <- 1 to 8; j <- 1 to 5; k <- 1 to 10 } yield {
      val swat = if (i % 4 == 0) 0.1 else if (k >= 8) 0.9 else 0.1
      val sgas = if (j % 3 == 0) 0.0 else if (k <= 2) 0.8 else 0.0
      (i, j, k, 100.0 * i, 100.0 * j, 1000.0 + 10 * k + (i + j) % 3,
        100.0 + i + j + k, 10.0 + ((i * j + k) % 5), 50.0 + k,
        swat, sgas, (i % 2) + 1)
    }).toDF("I", "J", "K", "X", "Y", "Z", "VOLUME", "PORV", "PERMX",
      "SWAT", "SGAS", "EQLNUM")
  }

  /** A1/A2/P11/J13 under the oracle gate: Pillars.df — per-pillar stats
    * (sum VOLUME/PORV, mean coords/PERMX, pore-volume-weighted PORO),
    * SOIL derivation, saturation-cutoff OWC/GOC contact depths with the
    * water/oil eligibility semi-joins and the both-present inner-join
    * combine (pillars.py:38-141, 260-318) — 40 pillars, one plan.
    */
  def q71Pillars(s: SparkSession, dir: String): DataFrame =
    Pillars.df(pillarGrid(s), region = Some("EQLNUM"))
      .select(col("PILLAR").as("pillar"), col("EQLNUM").as("eqlnum"),
        col("N_CELLS").as("n_cells"), col("VOLUME").as("volume"),
        col("PORV").as("porv"), col("X").as("x"), col("Y").as("y"),
        col("Z").as("z"), col("PERMX").as("permx"), col("PORO").as("poro"),
        col("OWC").as("owc"), col("GOC").as("goc"))
      .orderBy(col("pillar"))

  // ---------------------------------------------------------------- q72

  private val FaultN = 12
  private val FaultFaces = Seq("X", "Y", "Z", "X-", "Y-", "Z-")

  private def faultSpec(f: Int): (String, Int, Int, Int, Int, Int, Int, String) = {
    val ix1 = 1 + f % 3; val iy1 = 1 + f % 2; val iz1 = 1 + f % 4
    (s"F$f", ix1, ix1 + 1 + f % 2, iy1, iy1 + 2, iz1, iz1 + f % 3,
      FaultFaces(f % 6))
  }

  private def faultsDeck: String = {
    val recs = (0 until FaultN).map { f =>
      val (n, a, b, c, d, e, g, face) = faultSpec(f)
      s" '$n' $a $b $c $d $e $g '$face' /"
    }
    ("FAULTS" +: recs :+ "/").mkString("", "\n", "\n")
  }

  /** R2 under the oracle gate: the FAULTS 3-D range unroll
    * (faults.py:43-58) — deck text through the real parser, triple
    * explode(sequence) to one row per (fault, cell, face).
    */
  def q72Faults(s: SparkSession, dir: String): DataFrame =
    Faults.df(s, faultsDeck)
      .select(col("NAME").as("name"), col("I").as("i"), col("J").as("j"),
        col("K").as("k"), col("FACE").as("face"))
      .orderBy(col("name"), col("i"), col("j"), col("k"))

  // ---------------------------------------------------------------- q73

  private val PvtN = 12

  /** The q73 deck: [[PvtN]] regions through every PVT keyword family —
    * DENSITY/ROCK/PVTW record counters (PVTW with trailing defaults),
    * PVDO/PVDG DATA reshapes, and the nested PVTO/PVTG undersaturated
    * lines split by the empty-record counter. All values are quarter-
    * aligned doubles (exact cross-engine).
    */
  private def pvtDeck: String = {
    val sb = new StringBuilder
    def kw(name: String)(body: => Unit): Unit = {
      sb.append(name).append('\n'); body; sb.append("/\n")
    }
    kw("DENSITY") {
      for (n <- 1 to PvtN)
        sb.append(s" ${800 + n} ${1000 + n} ${1 + 0.25 * n} /\n")
    }
    kw("ROCK") {
      for (n <- 1 to PvtN)
        sb.append(s" ${100 + n} ${0.5 + 0.25 * n} /\n")
    }
    kw("PVTW") {
      for (n <- 1 to PvtN)
        sb.append(s" ${200 + n} ${1 + 0.5 * n} /\n") // rest defaulted
    }
    kw("PVDO") {
      for (n <- 1 to PvtN) {
        val rows = (0 to 2).map(r => s"${100 * n + 50 * r} ${10 + 2 * r + n} ${1 + r + 2 * n}")
        sb.append(" " + rows.mkString(" ") + " /\n")
      }
    }
    kw("PVDG") {
      for (n <- 1 to PvtN) {
        val rows = (0 to 1).map(r => s"${100 * n + 25 * r} ${20 + r + n} ${2 + r + n}")
        sb.append(" " + rows.mkString(" ") + " /\n")
      }
    }
    // nested keywords: each region's table closed by an empty record
    sb.append("PVTO\n")
    for (n <- 1 to PvtN) {
      sb.append(s" ${10 * n + 1} ${100 + n} ${5 + n} ${1 + n} /\n")
      sb.append(s" ${10 * n + 2} ${150 + n} ${6 + n} ${2 + n} ${200 + n} ${7 + n} ${3 + n} /\n")
      sb.append(" /\n")
    }
    sb.append("PVTG\n")
    for (n <- 1 to PvtN) {
      sb.append(s" ${30 + n} 0.25 ${8 + n} ${4 + n} 0.0 ${9 + n} ${5 + n} /\n")
      sb.append(s" ${60 + n} 0.5 ${10 + n} ${6 + n} /\n")
      sb.append(" /\n")
    }
    sb.toString
  }

  /** R6/R7/U1 under the oracle gate: the full PVT surface (pvt.py:31-73,
    * 126-194, 239-242) — record-counted DENSITY/ROCK/PVTW, DATA-reshaped
    * PVDO/PVDG, the empty-record-counter PVTNUM split for nested
    * PVTO/PVTG undersaturated lines, and the per-keyword-column-set
    * union — [[PvtN]] regions, one plan.
    */
  def q73Pvt(s: SparkSession, dir: String): DataFrame =
    Pvt.df(s, pvtDeck)
      .select(col("KEYWORD").as("keyword"), col("PVTNUM").as("pvtnum"),
        col("OILDENSITY").as("oildensity"), col("WATERDENSITY").as("waterdensity"),
        col("GASDENSITY").as("gasdensity"), col("PRESSURE").as("pressure"),
        col("COMPRESSIBILITY").as("compressibility"),
        col("VOLUMEFACTOR").as("volumefactor"), col("VISCOSITY").as("viscosity"),
        col("VISCOSIBILITY").as("viscosibility"), col("RS").as("rs"),
        col("OGR").as("ogr"))
      .orderBy(col("keyword"), col("pvtnum"),
        col("rs").asc_nulls_first, col("pressure").asc_nulls_first,
        col("ogr").asc_nulls_first)

  // ---------------------------------------------------------------- q74

  private val EquilN = 15

  /** The q74 deck: three-phase declaration, [[EquilN]] EQUIL records
    * (odd regions defaulting the trailing items — PC slots fall to their
    * 0.0 schema defaults, the int items to null), plus all four depth
    * sub-keywords per region: RSVD (two depth nodes), PBVD, RVVD and
    * PDVD (one each).
    */
  private def equilDeck: String = {
    val sb = new StringBuilder("OIL\nWATER\nGAS\n\n")
    sb.append("EQUIL\n")
    for (n <- 1 to EquilN)
      if (n % 2 == 0)
        sb.append(s" ${2000 + n} ${200 + n} ${2100 + n} 0.5 ${1700 + n} 0.25 1 2 20 /\n")
      else
        sb.append(s" ${2000 + n} ${200 + n} ${2100 + n} /\n")
    sb.append("/\n")
    sb.append("RSVD\n")
    for (n <- 1 to EquilN)
      sb.append(s" ${1500 + n} ${10 + n} ${1800 + n} ${20 + n} /\n")
    sb.append("/\n")
    sb.append("PBVD\n")
    for (n <- 1 to EquilN)
      sb.append(s" ${1600 + n} ${50 + n} /\n")
    sb.append("/\n")
    sb.append("RVVD\n")
    for (n <- 1 to EquilN)
      sb.append(s" ${1650 + n} ${70 + n} /\n")
    sb.append("/\n")
    sb.append("PDVD\n")
    for (n <- 1 to EquilN)
      sb.append(s" ${1700 + n} ${90 + n} /\n")
    sb.append("/\n")
    sb.toString
  }

  /** R7 + phase-dependent schemas under the oracle gate: Equil.df
    * (equil.py:30-128) — per-EQLNUM EQUIL records with the three-phase
    * OWC/GOC contact slots and trailing-default handling, all FOUR
    * depth-profile DATA reshapes (RSVD/PBVD/RVVD/PDVD), and the
    * per-keyword union — [[EquilN]] regions, one plan.
    */
  def q74Equil(s: SparkSession, dir: String): DataFrame =
    Equil.df(s, equilDeck)
      .select(col("EQLNUM").as("eqlnum"), col("KEYWORD").as("keyword"),
        col("Z").as("z"), col("PRESSURE").as("pressure"),
        col("OWC").as("owc"), col("PCOWC").as("pcowc"),
        col("GOC").as("goc"), col("PCGOC").as("pcgoc"),
        col("INITRS").as("initrs"), col("INITRV").as("initrv"),
        col("ACCURACY").as("accuracy"), col("RS").as("rs"), col("PB").as("pb"),
        col("RV").as("rv"), col("PD").as("pd"))
      .orderBy(col("eqlnum"), col("keyword"), col("z").asc_nulls_first)

  // ---------------------------------------------------------------- q75

  /** The q75 grid: 6×5×4 cells; each TRAN vector is positive only where
    * the +dir neighbour exists, with closed-form holes (the mod filters)
    * so the `> 0` pair predicate does real work. FIPNUM quarters the grid
    * in I and K; X/Y/Z integer-valued so midpoints are exact halves.
    */
  private def transGrid(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { i <- 1 to 6; j <- 1 to 5; k <- 1 to 4 } yield {
      val tx = if (i < 6 && (i + j + k) % 5 != 0) 100.0 + 10 * i + j + k else 0.0
      val ty = if (j < 5 && (i + 2 * j + k) % 7 != 0) 200.0 + 10 * i + j + k else 0.0
      val tz = if (k < 4 && (i + j + 2 * k) % 6 != 0) 300.0 + 10 * i + j + k else 0.0
      (i, j, k, 100.0 * i, 100.0 * j, 1000.0 + 10.0 * k, tx, ty, tz,
        (if (i <= 3) 1 else 2) + (if (k <= 2) 0 else 2))
    }).toDF("I", "J", "K", "X", "Y", "Z", "TRANX", "TRANY", "TRANZ", "FIPNUM")
  }

  private def nncPairs(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 5).map(m => (1, m, 1, 3, m, 4, 50.0 + m))
      .toDF("I1", "J1", "K1", "I2", "J2", "K2", "TRAN")
  }

  /** P9/J7/U2 under the oracle gate: GridOps.trans (trans.py:77-176) —
    * the union of an onlyKDir call (carrying the NNC concat) and an
    * onlyIJDir call, so BOTH direction filters execute and together
    * reproduce the full pair set; INIT-vector attachment to both cells,
    * averaged midpoint + absolute-distance coords.
    */
  def q75Trans(s: SparkSession, dir: String): DataFrame = {
    val g = transGrid(s)
    val kd = GridOps.trans(g, vectors = Seq("FIPNUM"), coords = true,
      onlyKDir = true, nnc = Some(nncPairs(s)))
    val ij = GridOps.trans(g, vectors = Seq("FIPNUM"), coords = true,
      onlyIJDir = true)
    kd.unionByName(ij)
      .select(col("I1").as("i1"), col("J1").as("j1"), col("K1").as("k1"),
        col("I2").as("i2"), col("J2").as("j2"), col("K2").as("k2"),
        col("DIR").as("dir"), col("TRAN").as("tran"),
        col("FIPNUM1").as("fipnum1"), col("FIPNUM2").as("fipnum2"),
        col("X").as("x"), col("Y").as("y"), col("Z").as("z"),
        col("DX").as("dx"), col("DY").as("dy"), col("DZ").as("dz"))
      .orderBy(col("dir"), col("i1"), col("j1"), col("k1"))
  }

  // ---------------------------------------------------------------- q78

  private val StackP = 30

  /** R3/W2 under the oracle gate: Ops.stackOnColnames — the reference's
    * wide `COL@date` → long reshape (stack_on_colnames, common.py:787-844)
    * including the missing-combination null fill (no GOC column exists
    * for the third date) and the all-dates timestamp cast. The engine's
    * own frames never take the wide form (R4 design), so this gates the
    * COMPATIBILITY path for wide reference CSVs.
    */
  def q78StackWide(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = (0 until StackP).map(p =>
      ("P" + p, 1000.0 + p, 1010.0 + p, 1020.0 + p, 900.0 + p, 910.0 + p))
      .toDF("PILLAR", "OWC@2000-01-01", "OWC@2010-01-01", "OWC@2020-01-01",
        "GOC@2000-01-01", "GOC@2010-01-01")
    graft.core.Ops.stackOnColnames(wide)
      .select(col("PILLAR").as("pillar"), col("DATE").as("date"),
        col("OWC").as("owc"), col("GOC").as("goc"))
      .orderBy(col("pillar"), col("date"))
  }

  // ---------------------------------------------------------------- q79

  private val ResampleV = 10

  /** Six samples per vector, start day shifted per vector off the Monday
    * 2000-01-03 so the weekly grid's conditional rollforward takes BOTH
    * branches across the corpus (c=1 and c=8 end ON a Monday), spaced
    * 11 days so samples and grid points interleave.
    */
  private def resampleSamples(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until ResampleV).flatMap { c =>
      (0 until 6).map { i =>
        val d = java.time.LocalDate.of(2000, 1, 3).plusDays(c + 11L * i)
        (s"V$c", s"$d 00:00:00", 1000.0 * c + i)
      }
    }.toDF("VECTOR", "DATE", "VALUE")
      .withColumn("DATE", to_timestamp(col("DATE")))
  }

  /** Calendar resampling under the oracle gate beyond q31's monthly
    * linear: WEEKLY and YEARLY grids (resample_smry_dates freq
    * mnemonics, summary.py:30-37, 195-290) with normalize semantics —
    * rollback of the start, CONDITIONAL rollforward of the end (a max
    * date already on the grid boundary IS the last point) — and STEP
    * (previous-value) interpolation clamped to the next sample before
    * the first. All values exact (no division in step mode).
    */
  def q79ResampleCalendar(s: SparkSession, dir: String): DataFrame = {
    import graft.modules.Summary
    val base = resampleSamples(s)
    Seq("weekly", "yearly").map { f =>
      Summary.resample(base, f, step = true).withColumn("freq", lit(f))
    }.reduce(_ unionByName _)
      .select(col("VECTOR").as("vector"), col("freq"),
        col("DATE").as("date"), col("VALUE").as("value"))
      .orderBy(col("vector"), col("freq"), col("date"))
  }

  // ---------------------------------------------------------------- q83

  /** P3 + P7 under the oracle gate: the resdata NaN sentinel wash
    * (values below −1e20+1e13 → null, grid.py:264-266) followed by the
    * vertical-NNC filter (I1==I2 ∧ J1==J2, nnc.py:150-169) over a
    * closed-form pair list where every third pair is lateral and every
    * fifth TRAN carries the sentinel.
    */
  def q83NncVertical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = (0 until 60).map { m =>
      val lateral = m % 3 == 0
      (m, 1 + m % 5, 2 + m % 4, 1 + m % 3,
        if (lateral) 2 + m % 5 else 1 + m % 5, 2 + m % 4, 2 + m % 3,
        if (m % 5 == 0) -1.0e20 else 10.0 + m)
    }.toDF("pair_id", "I1", "J1", "K1", "I2", "J2", "K2", "TRAN")
    graft.modules.GridOps.filterVerticalNnc(
        graft.modules.GridOps.washNanSentinel(pairs, Seq("TRAN")))
      .select(col("pair_id"), col("I1").as("i1"), col("J1").as("j1"),
        col("K1").as("k1"), col("I2").as("i2"), col("J2").as("j2"),
        col("K2").as("k2"), col("TRAN").as("tran"))
      .orderBy(col("pair_id"))
  }

  // ---------------------------------------------------------------- q84

  private val MatchWells = (0 until 40).map { w =>
    val prefix = Seq("OP", "B_", "WI", "D_")(w % 4)
    s"$prefix${w}H".take(if (w % 5 == 0) 3 else 8)
  }
  private val MatchTemplates =
    Seq("OP*", "B*H", "B_?H*", "\\*I2*", "D_*", "\\????")

  /** P2 under the oracle gate: well-name template matching with the
    * reference's leading-wildcard escape rule
    * (get_wells_matching_template, common.py:955-980; whole-name
    * anchoring per the Eclipse semantics — see Ops.wellsMatchingTemplate)
    * — every (template, well) match pair over a closed-form well list,
    * evaluated as the same translated-regex rlike the schedule keywords
    * use at scale.
    */
  def q84WellMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // THE production validation + translation (Ops.templateToRegex),
    // evaluated DISTRIBUTED: the templates are a broadcast dimension and
    // the match is an rlike over the anchored translated regex — the
    // shape the schedule keywords use against a corpus-sized well set
    val temps = MatchTemplates.map(t => (t, graft.core.Ops.templateToRegex(t)))
      .toDF("template", "re")
    MatchWells.toDF("well")
      .crossJoin(broadcast(temps))
      .filter(expr("well rlike re"))
      .select(col("template"), col("well"))
      .orderBy(col("template"), col("well"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_nnc_vertical" -> (q83NncVertical _),
    "q84_well_match" -> (q84WellMatch _),
    "q71_pillars" -> (q71Pillars _),
    "q72_faults" -> (q72Faults _),
    "q73_pvt" -> (q73Pvt _),
    "q74_equil" -> (q74Equil _),
    "q75_trans" -> (q75Trans _),
    "q78_stack_wide" -> (q78StackWide _),
    "q79_resample_calendar" -> (q79ResampleCalendar _),
  )

  val oracleSql: Map[String, String] = Map(
    /* The q71 oracle rebuilds the grid closed-form and replays the
     * pillar pipeline: SOIL derivation, grouped stats with PORV/VOLUME
     * porosity, eligibility semi-joins, per-pillar max-Z contacts, and
     * the both-frames-non-empty inner-join combine. */
    "q71_pillars" ->
      """WITH cells AS (
        |  SELECT i, j, k,
        |    CAST(100 * i AS DOUBLE) AS x, CAST(100 * j AS DOUBLE) AS y,
        |    CAST(1000 + 10 * k + (i + j) % 3 AS DOUBLE) AS z,
        |    CAST(100 + i + j + k AS DOUBLE) AS volume,
        |    CAST(10 + ((i * j + k) % 5) AS DOUBLE) AS porv,
        |    CAST(50 + k AS DOUBLE) AS permx,
        |    CAST(CASE WHEN i % 4 = 0 THEN 0.1 WHEN k >= 8 THEN 0.9
        |              ELSE 0.1 END AS DOUBLE) AS swat,
        |    CAST(CASE WHEN j % 3 = 0 THEN 0.0 WHEN k <= 2 THEN 0.8
        |              ELSE 0.0 END AS DOUBLE) AS sgas,
        |    CAST(i % 2 + 1 AS INT) AS eqlnum
        |  FROM (SELECT unnest(range(1, 9)) AS i),
        |       (SELECT unnest(range(1, 6)) AS j),
        |       (SELECT unnest(range(1, 11)) AS k)),
        |soil AS (SELECT *, CAST(1.0 AS DOUBLE) - swat - sgas AS soil,
        |                i || '-' || j AS pillar FROM cells),
        |stats AS (
        |  SELECT pillar, eqlnum, count(*) AS n_cells, sum(volume) AS volume,
        |         sum(porv) AS porv, avg(x) AS x, avg(y) AS y, avg(z) AS z,
        |         avg(permx) AS permx, sum(porv) / sum(volume) AS poro
        |  FROM soil GROUP BY 1, 2),
        |waterk AS (SELECT DISTINCT pillar, eqlnum FROM soil WHERE swat > 0.7),
        |owc AS (SELECT s.pillar, s.eqlnum, max(z) AS owc
        |        FROM soil s JOIN waterk USING (pillar, eqlnum)
        |        WHERE soil > 0.2 GROUP BY 1, 2),
        |oilk AS (SELECT DISTINCT pillar, eqlnum FROM soil WHERE soil > 0.01),
        |goc AS (SELECT s.pillar, s.eqlnum, max(z) AS goc
        |        FROM soil s JOIN oilk USING (pillar, eqlnum)
        |        WHERE sgas > 0.7 AND soil > 0.01 GROUP BY 1, 2),
        |contacts AS (SELECT * FROM owc JOIN goc USING (pillar, eqlnum))
        |SELECT st.pillar, st.eqlnum, st.n_cells, st.volume, st.porv,
        |       st.x, st.y, st.z, st.permx, st.poro, c.owc, c.goc
        |FROM stats st LEFT JOIN contacts c USING (pillar, eqlnum)
        |ORDER BY pillar""".stripMargin,

    /* The q72 oracle rebuilds the fault specs closed-form and unrolls
     * the three ranges with chained unnest(range(...)) expansions. */
    "q72_faults" ->
      s"""WITH f AS (SELECT CAST(unnest(range($FaultN)) AS BIGINT) AS f),
        |spec AS (
        |  SELECT 'F' || f AS name,
        |    1 + f % 3 AS ix1, 1 + f % 3 + 1 + f % 2 AS ix2,
        |    1 + f % 2 AS iy1, 1 + f % 2 + 2 AS iy2,
        |    1 + f % 4 AS iz1, 1 + f % 4 + f % 3 AS iz2,
        |    (['X', 'Y', 'Z', 'X-', 'Y-', 'Z-'])[CAST(f % 6 AS INT) + 1] AS face
        |  FROM f),
        |u1 AS (SELECT s.*, CAST(unnest(range(ix1, ix2 + 1)) AS INT) AS i FROM spec s),
        |u2 AS (SELECT u1.*, CAST(unnest(range(iy1, iy2 + 1)) AS INT) AS j FROM u1),
        |u3 AS (SELECT u2.*, CAST(unnest(range(iz1, iz2 + 1)) AS INT) AS k FROM u2)
        |SELECT name, i, j, k, face FROM u3
        |ORDER BY name, i, j, k""".stripMargin,

    /* The q73 oracle rebuilds every keyword family closed-form over the
     * region range and unions the per-keyword column sets with NULLs. */
    "q73_pvt" ->
      s"""WITH r AS (SELECT CAST(unnest(range(1, ${PvtN + 1})) AS INT) AS n)
        |SELECT * FROM (
        |  SELECT 'DENSITY' AS keyword, n AS pvtnum,
        |         CAST(800 + n AS DOUBLE) AS oildensity,
        |         CAST(1000 + n AS DOUBLE) AS waterdensity,
        |         CAST(1 + 0.25 * n AS DOUBLE) AS gasdensity,
        |         CAST(NULL AS DOUBLE) AS pressure,
        |         CAST(NULL AS DOUBLE) AS compressibility,
        |         CAST(NULL AS DOUBLE) AS volumefactor,
        |         CAST(NULL AS DOUBLE) AS viscosity,
        |         CAST(NULL AS DOUBLE) AS viscosibility,
        |         CAST(NULL AS DOUBLE) AS rs, CAST(NULL AS DOUBLE) AS ogr
        |  FROM r
        |  UNION ALL
        |  SELECT 'ROCK', n, NULL, NULL, NULL,
        |         CAST(100 + n AS DOUBLE), CAST(0.5 + 0.25 * n AS DOUBLE),
        |         NULL, NULL, NULL, NULL, NULL
        |  FROM r
        |  UNION ALL
        |  SELECT 'PVTW', n, NULL, NULL, NULL,
        |         CAST(200 + n AS DOUBLE), CAST(0.0 AS DOUBLE),
        |         CAST(1 + 0.5 * n AS DOUBLE), CAST(0.0 AS DOUBLE),
        |         CAST(0.0 AS DOUBLE), NULL, NULL
        |  FROM r
        |  UNION ALL
        |  SELECT 'PVDO', n, NULL, NULL, NULL,
        |         CAST(100 * n + 50 * rr AS DOUBLE), NULL,
        |         CAST(10 + 2 * rr + n AS DOUBLE), CAST(1 + rr + 2 * n AS DOUBLE),
        |         NULL, NULL, NULL
        |  FROM r, (SELECT unnest(range(0, 3)) AS rr)
        |  UNION ALL
        |  SELECT 'PVDG', n, NULL, NULL, NULL,
        |         CAST(100 * n + 25 * rr AS DOUBLE), NULL,
        |         CAST(20 + rr + n AS DOUBLE), CAST(2 + rr + n AS DOUBLE),
        |         NULL, NULL, NULL
        |  FROM r, (SELECT unnest(range(0, 2)) AS rr)
        |  UNION ALL  -- PVTO region n: RS=10n+1 (1 line), RS=10n+2 (2 lines)
        |  SELECT 'PVTO', n, NULL, NULL, NULL,
        |         CAST(v.p + n AS DOUBLE), NULL,
        |         CAST(v.b + n AS DOUBLE), CAST(v.m + n AS DOUBLE),
        |         NULL, CAST(10 * n + v.rsoff AS DOUBLE), NULL
        |  FROM r, (VALUES (1, 100, 5, 1), (2, 150, 6, 2), (2, 200, 7, 3))
        |         v(rsoff, p, b, m)
        |  UNION ALL  -- PVTG region n: node 30+n (2 lines), node 60+n (1 line)
        |  SELECT 'PVTG', n, NULL, NULL, NULL,
        |         CAST(v.p + n AS DOUBLE), NULL,
        |         CAST(v.b + n AS DOUBLE), CAST(v.m + n AS DOUBLE),
        |         NULL, NULL, CAST(v.ogr AS DOUBLE)
        |  FROM r, (VALUES (30, 0.25, 8, 4), (30, 0.0, 9, 5), (60, 0.5, 10, 6))
        |         v(p, ogr, b, m)
        |)
        |ORDER BY keyword, pvtnum, rs ASC NULLS FIRST,
        |         pressure ASC NULLS FIRST, ogr ASC NULLS FIRST""".stripMargin,

    /* The q74 oracle rebuilds the EQUIL records (odd regions defaulted:
     * PC slots 0.0, int items NULL) and the four depth sub-keyword tables. */
    "q74_equil" ->
      s"""WITH r AS (SELECT CAST(unnest(range(1, ${EquilN + 1})) AS INT) AS n)
        |SELECT * FROM (
        |  SELECT n AS eqlnum, 'EQUIL' AS keyword,
        |         CAST(2000 + n AS DOUBLE) AS z, CAST(200 + n AS DOUBLE) AS pressure,
        |         CAST(2100 + n AS DOUBLE) AS owc,
        |         CAST(CASE WHEN n % 2 = 0 THEN 0.5 ELSE 0.0 END AS DOUBLE) AS pcowc,
        |         CAST(CASE WHEN n % 2 = 0 THEN 1700 + n ELSE 0.0 END AS DOUBLE) AS goc,
        |         CAST(CASE WHEN n % 2 = 0 THEN 0.25 ELSE 0.0 END AS DOUBLE) AS pcgoc,
        |         CASE WHEN n % 2 = 0 THEN 1 END AS initrs,
        |         CASE WHEN n % 2 = 0 THEN 2 END AS initrv,
        |         CASE WHEN n % 2 = 0 THEN 20 END AS accuracy,
        |         CAST(NULL AS DOUBLE) AS rs, CAST(NULL AS DOUBLE) AS pb,
        |         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS DOUBLE) AS pd
        |  FROM r
        |  UNION ALL
        |  SELECT n, 'RSVD', CAST(v.z0 + n AS DOUBLE), NULL, NULL, NULL, NULL,
        |         NULL, NULL, NULL, NULL, CAST(v.v0 + n AS DOUBLE), NULL, NULL, NULL
        |  FROM r, (VALUES (1500, 10), (1800, 20)) v(z0, v0)
        |  UNION ALL
        |  SELECT n, 'PBVD', CAST(1600 + n AS DOUBLE), NULL, NULL, NULL, NULL,
        |         NULL, NULL, NULL, NULL, NULL, CAST(50 + n AS DOUBLE), NULL, NULL
        |  FROM r
        |  UNION ALL
        |  SELECT n, 'RVVD', CAST(1650 + n AS DOUBLE), NULL, NULL, NULL, NULL,
        |         NULL, NULL, NULL, NULL, NULL, NULL, CAST(70 + n AS DOUBLE), NULL
        |  FROM r
        |  UNION ALL
        |  SELECT n, 'PDVD', CAST(1700 + n AS DOUBLE), NULL, NULL, NULL, NULL,
        |         NULL, NULL, NULL, NULL, NULL, NULL, NULL, CAST(90 + n AS DOUBLE)
        |  FROM r
        |)
        |ORDER BY eqlnum, keyword, z ASC NULLS FIRST""".stripMargin,

    /* The q75 oracle rebuilds the grid + NNC list closed-form, derives
     * the three direction pair sets from the positive TRAN vectors,
     * attaches FIPNUM to both cells and computes midpoint/abs-distance
     * coords. */
    "q75_trans" ->
      """WITH cells AS (
        |  SELECT i, j, k,
        |    CAST(100 * i AS DOUBLE) AS x, CAST(100 * j AS DOUBLE) AS y,
        |    CAST(1000 + 10 * k AS DOUBLE) AS z,
        |    CASE WHEN i < 6 AND (i + j + k) % 5 <> 0
        |         THEN CAST(100 + 10 * i + j + k AS DOUBLE) ELSE 0 END AS tx,
        |    CASE WHEN j < 5 AND (i + 2 * j + k) % 7 <> 0
        |         THEN CAST(200 + 10 * i + j + k AS DOUBLE) ELSE 0 END AS ty,
        |    CASE WHEN k < 4 AND (i + j + 2 * k) % 6 <> 0
        |         THEN CAST(300 + 10 * i + j + k AS DOUBLE) ELSE 0 END AS tz,
        |    CAST(CASE WHEN i <= 3 THEN 1 ELSE 2 END
        |         + CASE WHEN k <= 2 THEN 0 ELSE 2 END AS INT) AS fip
        |  FROM (SELECT CAST(unnest(range(1, 7)) AS INT) AS i),
        |       (SELECT CAST(unnest(range(1, 6)) AS INT) AS j),
        |       (SELECT CAST(unnest(range(1, 5)) AS INT) AS k)),
        |pairs AS (
        |  SELECT i AS i1, j AS j1, k AS k1, i + 1 AS i2, j AS j2, k AS k2,
        |         'I' AS dir, tx AS tran FROM cells WHERE tx > 0
        |  UNION ALL
        |  SELECT i, j, k, i, j + 1, k, 'J', ty FROM cells WHERE ty > 0
        |  UNION ALL
        |  SELECT i, j, k, i, j, k + 1, 'K', tz FROM cells WHERE tz > 0
        |  UNION ALL
        |  SELECT CAST(1 AS INT), CAST(m AS INT), CAST(1 AS INT),
        |         CAST(3 AS INT), CAST(m AS INT), CAST(4 AS INT),
        |         'NNC', CAST(50 + m AS DOUBLE)
        |  FROM (SELECT unnest(range(1, 6)) AS m))
        |SELECT p.i1, p.j1, p.k1, p.i2, p.j2, p.k2, p.dir, p.tran,
        |       c1.fip AS fipnum1, c2.fip AS fipnum2,
        |       (c1.x + c2.x) / 2 AS x, (c1.y + c2.y) / 2 AS y,
        |       (c1.z + c2.z) / 2 AS z,
        |       abs(c1.x - c2.x) AS dx, abs(c1.y - c2.y) AS dy,
        |       abs(c1.z - c2.z) AS dz
        |FROM pairs p
        |JOIN cells c1 ON c1.i = p.i1 AND c1.j = p.j1 AND c1.k = p.k1
        |JOIN cells c2 ON c2.i = p.i2 AND c2.j = p.j2 AND c2.k = p.k2
        |ORDER BY dir, i1, j1, k1""".stripMargin,

    /* The q83 oracle rebuilds the pair list closed-form, nulls the
     * sentinel values and keeps the vertical pairs. */
    "q83_nnc_vertical" ->
      """WITH m AS (SELECT CAST(unnest(range(60)) AS INT) AS m),
        |pairs AS (
        |  SELECT m AS pair_id,
        |    1 + m % 5 AS i1, 2 + m % 4 AS j1, 1 + m % 3 AS k1,
        |    CASE WHEN m % 3 = 0 THEN 2 + m % 5 ELSE 1 + m % 5 END AS i2,
        |    2 + m % 4 AS j2, 2 + m % 3 AS k2,
        |    CASE WHEN m % 5 = 0 THEN CAST(-1.0e20 AS DOUBLE)
        |         ELSE CAST(10.0 + m AS DOUBLE) END AS tran
        |  FROM m)
        |SELECT pair_id, i1, j1, k1, i2, j2, k2,
        |       CASE WHEN tran < -1.0e20 + 1.0e13 THEN NULL ELSE tran END AS tran
        |FROM pairs WHERE i1 = i2 AND j1 = j2
        |ORDER BY pair_id""".stripMargin,

    /* The q84 oracle rebuilds the well list closed-form and evaluates
     * each template as an INDEPENDENTLY hand-anchored regex (the glob
     * translation under test is restated, not reused). */
    "q84_well_match" ->
      """WITH w AS (SELECT CAST(unnest(range(40)) AS BIGINT) AS w),
        |wells AS (
        |  SELECT CASE WHEN w % 5 = 0
        |           THEN left((['OP','B_','WI','D_'])[CAST(w % 4 AS INT) + 1]
        |                     || w || 'H', 3)
        |           ELSE left((['OP','B_','WI','D_'])[CAST(w % 4 AS INT) + 1]
        |                     || w || 'H', 8) END AS well
        |  FROM w),
        |temps(template, re) AS (VALUES
        |  ('OP*', '^OP.*$'), ('B*H', '^B.*H$'), ('B_?H*', '^B_.H.*$'),
        |  ('\*I2*', '^.*I2.*$'), ('D_*', '^D_.*$'), ('\????', '^....$'))
        |SELECT template, well FROM wells, temps
        |WHERE regexp_matches(well, re)
        |ORDER BY template, well""".stripMargin,

    /* The q78 oracle rebuilds the wide frame's VALUES closed-form as
     * long rows directly: owc = 1000 + decade-offset + p, goc likewise
     * but absent (null) for the third date. */
    "q78_stack_wide" ->
      s"""WITH p AS (SELECT CAST(unnest(range($StackP)) AS BIGINT) AS p),
        |d AS (SELECT * FROM (VALUES (TIMESTAMP '2000-01-01', 0),
        |                            (TIMESTAMP '2010-01-01', 10),
        |                            (TIMESTAMP '2020-01-01', 20)) v(date, off))
        |SELECT 'P' || p AS pillar, date,
        |       CAST(1000 + off + p AS DOUBLE) AS owc,
        |       CASE WHEN off < 20 THEN CAST(900 + off + p AS DOUBLE) END AS goc
        |FROM p, d
        |ORDER BY pillar, date""".stripMargin,

    /* The q79 oracle rebuilds the samples closed-form, generates the
     * weekly/yearly grids with the same rollback + conditional
     * rollforward, and resolves step values with ASOF joins (previous
     * sample at or before the target; next sample when none precedes). */
    "q79_resample_calendar" ->
      s"""WITH c AS (SELECT CAST(unnest(range($ResampleV)) AS BIGINT) AS c),
        |i AS (SELECT CAST(unnest(range(6)) AS BIGINT) AS i),
        |samples AS (
        |  SELECT 'V' || c AS vector,
        |         TIMESTAMP '2000-01-03' + (c + 11 * i) * INTERVAL 1 DAY AS d,
        |         CAST(1000 * c + i AS DOUBLE) AS v
        |  FROM c, i),
        |bounds AS (SELECT vector, min(d) AS mn, max(d) AS mx
        |           FROM samples GROUP BY 1),
        |grids AS (
        |  SELECT vector, 'weekly' AS freq, unnest(generate_series(
        |           date_trunc('week', mn),
        |           CASE WHEN date_trunc('week', mx) = mx THEN mx
        |                ELSE date_trunc('week', mx) + INTERVAL 1 WEEK END,
        |           INTERVAL 1 WEEK)) AS md
        |  FROM bounds
        |  UNION ALL
        |  SELECT vector, 'yearly', unnest(generate_series(
        |           date_trunc('year', mn),
        |           CASE WHEN date_trunc('year', mx) = mx THEN mx
        |                ELSE date_trunc('year', mx) + INTERVAL 1 YEAR END,
        |           INTERVAL 1 YEAR))
        |  FROM bounds),
        |prev AS (SELECT g.vector, g.freq, g.md, s.v AS pv
        |         FROM grids g ASOF LEFT JOIN samples s
        |           ON g.vector = s.vector AND g.md >= s.d),
        |nxt AS (SELECT g.vector, g.freq, g.md, s.v AS nv
        |        FROM grids g ASOF LEFT JOIN samples s
        |          ON g.vector = s.vector AND g.md < s.d)
        |SELECT p.vector, p.freq, p.md AS date, coalesce(p.pv, n.nv) AS value
        |FROM prev p JOIN nxt n USING (vector, freq, md)
        |ORDER BY vector, freq, date""".stripMargin,
  )
}
