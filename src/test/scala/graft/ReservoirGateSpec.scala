package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 gate queries (q71-q77): pillar contacts, FAULTS unroll, the
  * PVT/EQUIL keyword families, trans pair construction, chunking and
  * sequence packing. The DuckDB hash check is the primary gate; these
  * specs pin invariants the hash can't express (eligibility semantics,
  * coverage/conservation laws, pack-exactness).
  */
class ReservoirGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("q71: contact eligibility and the inner-join combine behave like the reference") {
    val rows = graft.queries.ReservoirGate.q71Pillars(spark, Sf).collect()
    assert(rows.length == 40)
    val byPillar = rows.map(r => r.getAs[String]("pillar") -> r).toMap
    // i%4==0 pillars hold no water (SWAT<=0.7 everywhere): no OWC, and
    // with the inner-join combine no GOC either
    val p41 = byPillar("4-1")
    assert(p41.isNullAt(p41.fieldIndex("owc")) && p41.isNullAt(p41.fieldIndex("goc")))
    // j%3==0 pillars hold no gas: GOC missing drags OWC out too
    val p13 = byPillar("1-3")
    assert(p13.isNullAt(p13.fieldIndex("owc")) && p13.isNullAt(p13.fieldIndex("goc")))
    // a fully eligible pillar reports both closed-form depths
    val p11 = byPillar("1-1")
    assert(p11.getAs[Double]("owc") == 1072.0) // deepest SOIL>0.2 cell: k=7
    assert(p11.getAs[Double]("goc") == 1022.0) // deepest gas-cap cell: k=2
    // PORO is pore-volume weighted: sum(PORV)/sum(VOLUME), not a cell mean
    val porv = (1 to 10).map(k => 10.0 + ((1 * 1 + k) % 5)).sum
    val vol = (1 to 10).map(k => 100.0 + 1 + 1 + k).sum
    assert(p11.getAs[Double]("poro") == porv / vol)
  }

  test("q72: the 3-D unroll emits exactly the cartesian cell set per fault") {
    val rows = graft.queries.ReservoirGate.q72Faults(spark, Sf)
    val expected = (0 until 12).map(f => (2 + f % 2) * 3 * (1 + f % 3)).sum
    assert(rows.count() == expected)
    val f0 = rows.filter(col("name") === "F0").collect()
    assert(f0.length == 6) // i 1..2, j 1..3, k 1..1
    assert(f0.forall(_.getAs[String]("face") == "X"))
    assert(f0.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Int]("k"))).toSet ==
      (for { i <- 1 to 2; j <- 1 to 3 } yield (i, j, 1)).toSet)
  }

  test("q73: the empty-record counter splits nested PVTO/PVTG regions") {
    val df = graft.queries.ReservoirGate.q73Pvt(spark, Sf)
    val pvto = df.filter(col("keyword") === "PVTO")
    assert(pvto.count() == 36) // 3 lines per region
    assert(pvto.filter(col("pvtnum") === 5).select("rs").distinct()
      .collect().map(_.getDouble(0)).toSet == Set(51.0, 52.0))
    assert(df.filter(col("keyword") === "PVTG").count() == 36)
    // PVTW trailing defaults fall to the schema defaults, not null
    val w3 = df.filter(col("keyword") === "PVTW" && col("pvtnum") === 3).collect().head
    assert(w3.getAs[Double]("compressibility") == 0.0)
    assert(w3.getAs[Double]("viscosibility") == 0.0)
  }

  test("q74: EQUIL trailing defaults and the per-keyword union") {
    val df = graft.queries.ReservoirGate.q74Equil(spark, Sf)
    assert(df.count() == 90) // 15 EQUIL + 30 RSVD + 15 each PBVD/RVVD/PDVD
    val e1 = df.filter(col("keyword") === "EQUIL" && col("eqlnum") === 1).collect().head
    assert(e1.getAs[Double]("pcowc") == 0.0 && e1.getAs[Double]("goc") == 0.0)
    assert(e1.isNullAt(e1.fieldIndex("initrs")))
    val e2 = df.filter(col("keyword") === "EQUIL" && col("eqlnum") === 2).collect().head
    assert(e2.getAs[Double]("goc") == 1702.0 && e2.getAs[Int]("accuracy") == 20)
    // RSVD carries RS only; PBVD carries PB only
    assert(df.filter(col("keyword") === "RSVD" && col("rs").isNull).count() == 0)
    assert(df.filter(col("keyword") === "PBVD" && col("pb").isNull).count() == 0)
  }

  test("q75: direction split, NNC concat and midpoint coords") {
    val rows = graft.queries.ReservoirGate.q75Trans(spark, Sf)
    val byDir = rows.groupBy("dir").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDir("NNC") == 5)
    // closed-form counts: positive-TRAN cells per direction
    val expI = (for { i <- 1 to 5; j <- 1 to 5; k <- 1 to 4 } yield (i, j, k))
      .count { case (i, j, k) => (i + j + k) % 5 != 0 }
    assert(byDir("I") == expI)
    // an NNC pair gets coordinates from both endpoints
    val n1 = rows.filter(col("dir") === "NNC" && col("j1") === 2).collect().head
    assert(n1.getAs[Double]("dx") == 200.0 && n1.getAs[Double]("dz") == 30.0)
    assert(n1.getAs[Double]("x") == 200.0) // midpoint of 100 and 300
    // a K pair crossing k=2 -> 3 crosses the FIPNUM split
    val crossing = rows.filter(col("dir") === "K" && col("k1") === 2)
    assert(crossing.count() > 0)
    assert(crossing.filter(col("fipnum1") === col("fipnum2")).count() == 0)
  }

  test("q76: chunks tile every document with the configured stride") {
    val rows = graft.queries.Chunking.q76Chunk(spark, Sf)
      .join(spark.read.parquet(s"$Sf/documents.parquet")
        .select(col("doc_id"), length(col("text")).cast("long").as("len")), Seq("doc_id"))
    // per doc: n_chunks = (len-1) div 180 + 1; last chunk reaches the end
    assert(rows.filter(col("n_chunks") =!= expr("(len - 1) div 180") + 1)
      .count() == 0)
    val last = rows.filter(col("chunk_idx") === col("n_chunks") - 1)
    assert(last.filter(col("chunk_start") + col("chunk_len") - 1 =!= col("len"))
      .count() == 0)
    // every chunk is window-wide or clipped by the document end (the
    // second-to-last can be 181-239 chars: window 240 > stride 180)
    assert(rows.filter(col("chunk_len") =!=
      least(lit(240L), col("len") - col("chunk_start") + 1)).count() == 0)
    // content check against an independent derivation: each emitted md5
    // must equal the digest of the text slice at the emitted offsets
    val withText = graft.queries.Chunking.q76Chunk(spark, Sf)
      .join(spark.read.parquet(s"$Sf/documents.parquet")
        .select(col("doc_id"), col("text")), Seq("doc_id"))
    assert(withText.filter(col("chunk_md5") =!=
      md5(expr("substring(text, CAST(chunk_start AS INT), 240)").cast("binary")))
      .count() == 0)
  }

  test("q78: wide COL@date columns stack long with missing combinations null") {
    val rows = graft.queries.ReservoirGate.q78StackWide(spark, Sf)
    assert(rows.count() == 90) // 30 pillars x 3 dates
    assert(rows.schema("date").dataType.typeName == "timestamp")
    val p5 = rows.filter(col("pillar") === "P5").orderBy("date").collect()
    assert(p5.map(_.getAs[Double]("owc")).toSeq == Seq(1005.0, 1015.0, 1025.0))
    assert(p5(2).isNullAt(p5(2).fieldIndex("goc"))) // no GOC@2020 column
  }

  test("q79: weekly grids roll forward only when the end is off-boundary") {
    val rows = graft.queries.ReservoirGate.q79ResampleCalendar(spark, Sf)
    val wk = rows.filter(col("freq") === "weekly")
    // V1 ends ON a Monday (2000-01-04 + 55d = Mon 2000-02-28): its last
    // grid point IS that date; V2 ends Tue Feb 29 (leap year) and rolls
    // forward to the next Monday
    def lastDate(v: String) = wk.filter(col("vector") === v)
      .agg(max("date")).collect().head.getTimestamp(0).toString
    assert(lastDate("V1").startsWith("2000-02-28"))
    assert(lastDate("V2").startsWith("2000-03-06"))
    // step semantics: grid value equals the latest sample at or before it
    val v0 = wk.filter(col("vector") === "V0" && col("date") === "2000-01-17 00:00:00")
      .collect().head // samples at Jan 3 (v=0) and Jan 14 (v=1)
    assert(v0.getAs[Double]("value") == 1.0)
    // yearly: every vector spans into 2001 via the rollforward
    val yr = rows.filter(col("freq") === "yearly")
    assert(yr.groupBy("vector").count().filter(col("count") =!= 2).count() == 0)
  }

  test("q80: rule attribution is consistent with the keep bit") {
    val rows = graft.queries.Curation.q80QualityGate(spark, Sf)
    assert(rows.count() == 500)
    // keep <=> zero failures <=> empty reasons
    assert(rows.filter(col("keep") =!= (col("n_failed") === 0)).count() == 0)
    assert(rows.filter(col("keep") && col("reasons") =!= "").count() == 0)
    assert(rows.filter(!col("keep") && col("reasons") === "").count() == 0)
    // the cascade must actually split the corpus (thresholds do work)
    val kept = rows.filter(col("keep")).count()
    assert(kept > 0 && kept < 500)
  }

  test("q81: top-k token counts conserve the corpus token total") {
    val rows = graft.queries.Curation.q81TokenTopk(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // ordered by count desc, token asc (zip-with-tail: total order holds
    // pairwise, and a single-row result is trivially ordered)
    val pairs = rows.map(r => (r.getAs[Long]("n"), r.getAs[String]("tok")))
    assert(pairs.zip(pairs.drop(1)).forall { case ((n1, t1), (n2, t2)) =>
      n1 > n2 || (n1 == n2 && t1 < t2) })
    // df <= n always, and df bounded by the document count
    assert(rows.forall(r => r.getAs[Long]("df") <= r.getAs[Long]("n")))
    assert(rows.forall(r => r.getAs[Long]("df") <= 500))
  }

  test("property: packing layout laws hold for random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(1L, 50L)))
    (0 until 5).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { docs0 =>
        // random (source, n_tok) docs; text = n_tok single-char tokens
        val docs = docs0.zipWithIndex.map { case ((s, n), id) =>
          (id.toLong, s"s$s", Seq.fill(n.toInt)("x").mkString(" "))
        }.toDF("doc_id", "source", "text")
        val B = 7L // small packs: force straddles
        val spans = graft.queries.Chunking.q77PackOver(docs, B).collect()
        val bySrc = spans.groupBy(_.getAs[String]("source"))
        bySrc.foreach { case (_, rows) =>
          // conservation per doc
          rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, spansOfDoc) =>
            assert(spansOfDoc.map(_.getAs[Long]("tok_in_pack")).sum ==
              spansOfDoc.head.getAs[Long]("n_tok"))
            assert(spansOfDoc.count(_.getAs[Boolean]("is_head")) == 1)
          }
          // every pack except the last holds exactly B tokens
          val perPack = rows.groupBy(_.getAs[Long]("pack_id"))
            .view.mapValues(_.map(_.getAs[Long]("tok_in_pack")).sum).toMap
          val lastPack = perPack.keys.max
          perPack.foreach { case (p, t) => if (p != lastPack) assert(t == B) }
          // pack ids are dense from 0
          assert(perPack.keys.min == 0 && perPack.size == lastPack + 1)
        }
      }
  }

  test("q85: rollup superaggregates reconcile with the leaf rows") {
    val rows = graft.queries.Curation.q85CorpusRollup(spark, Sf).collect()
    val leaves = rows.filter(_.getAs[Long]("gid") == 0)
    val bySource = rows.filter(_.getAs[Long]("gid") == 1)
    val grand = rows.filter(_.getAs[Long]("gid") == 3)
    assert(grand.length == 1)
    // every level sums to the same doc/token totals
    assert(leaves.map(_.getAs[Long]("n_docs")).sum ==
      grand.head.getAs[Long]("n_docs"))
    assert(bySource.map(_.getAs[Long]("total_tokens")).sum ==
      grand.head.getAs[Long]("total_tokens"))
    // per-source rows have null lang; grand total nulls both
    assert(bySource.forall(_.isNullAt(1)))
    assert(grand.head.isNullAt(0) && grand.head.isNullAt(1))
  }

  test("q86: recall grades the gated ANN against the gated exact baseline") {
    val rows = graft.queries.Curation.q86AnnRecall(spark, Sf).collect()
    assert(rows.length == 10) // one row per query vector
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= 5)
      assert(r.getAs[Double]("recall_at_5") == h / 5.0)
    }
    // recall reconciles with a direct intersection for one query
    val qid0Exact = graft.queries.DedupSim.q28CosineTopK(spark, Sf)
      .filter(col("qid") === 0).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet
    val qid0Ann = graft.queries.DedupSim.q36AnnIvf(spark, Sf)
      .filter(col("qid") === 0).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet
    val expected = (qid0Exact & qid0Ann).size.toLong
    assert(rows.find(_.getAs[Long]("qid") == 0L).get.getAs[Long]("n_hits") == expected)
  }

  test("q83: sentinel wash nulls, vertical filter keeps I/J-aligned pairs") {
    val rows = graft.queries.ReservoirGate.q83NncVertical(spark, Sf).collect()
    // the m%3==0 pairs are lateral (i2 shifted) and must be dropped
    assert(rows.length == 40)
    assert(rows.forall(r => r.getAs[Int]("i1") == r.getAs[Int]("i2") &&
      r.getAs[Int]("j1") == r.getAs[Int]("j2")))
    // every m%5==0 survivor carries a washed-null TRAN
    rows.filter(_.getAs[Int]("pair_id") % 5 == 0)
      .foreach(r => assert(r.isNullAt(r.fieldIndex("tran"))))
  }

  test("q84: template matching enforces the leading-wildcard escape rule") {
    val rows = graft.queries.ReservoirGate.q84WellMatch(spark, Sf).collect()
    val byTemplate = rows.groupBy(_.getAs[String]("template"))
      .view.mapValues(_.map(_.getAs[String]("well")).toSet).toMap
    // whole-name anchoring: every B*H match ENDS in H
    assert(byTemplate("B*H").forall(_.endsWith("H")))
    // escaped leading * re-enables the wildcard for the first char
    assert(byTemplate("\\*I2*").forall(_.contains("I2")))
    // \???? matches exactly the 4-char names (and matches SOMETHING —
    // a broken escape translation must fail here, not pass vacuously)
    assert(byTemplate("\\????").nonEmpty)
    assert(byTemplate("\\????").forall(_.length == 4))
    // unescaped leading wildcards throw (the WLIST-name protection)
    assertThrows[IllegalArgumentException](
      graft.core.Ops.wellsMatchingTemplate("*P1", Seq("OP1")))
  }

  test("q77: packing conserves tokens and fills every non-final pack exactly") {
    val rows = graft.queries.Chunking.q77Pack(spark, Sf)
    // conservation: each doc's spans sum to its token count
    val perDoc = rows.groupBy("doc_id", "n_tok")
      .agg(sum("tok_in_pack").as("got"), sum(when(col("is_head"), 1).otherwise(0)).as("heads"))
    assert(perDoc.filter(col("got") =!= col("n_tok")).count() == 0)
    assert(perDoc.filter(col("heads") =!= 1).count() == 0)
    // every pack except a source's last holds exactly 1024 tokens
    val perPack = rows.groupBy("source", "pack_id").agg(sum("tok_in_pack").as("t"))
    val lastPack = perPack.groupBy("source").agg(max("pack_id").as("pack_id"))
    assert(perPack.join(lastPack, Seq("source", "pack_id"), "left_anti")
      .filter(col("t") =!= 1024).count() == 0)
  }
}
