package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column query with a DuckDB oracle: the image decode is a
  * real codec (JDK ImageIO), so the oracle can't replay it — instead the
  * query builds each image from a CLOSED-FORM pixel formula, round-trips
  * it through the actual PNG encoder+decoder, and reports what the
  * DECODED image contains; the oracle computes the same quantities from
  * the formula alone. A hash match therefore proves the codec really ran
  * and recovered every pixel (dims, corner pixels, full red-channel sum),
  * which a byte-fold stub cannot fake.
  */
object Media {

  /** q43: per document `doc_id` deterministic image of
    * `(8 + id%24) × (8 + id%16)` px, pixel `(x,y)` red channel
    * `(id + 3x + 7y) % 256` — encode PNG, decode PNG, report decoded
    * width/height/band-count, the two corner red values and the red sum.
    * Partition-batched kernel (one codec context per executor thread,
    * the 100 TB shape: images never leave their partition).
    */
  def q43ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 24).toInt
        val h = (8 + id % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id + 3 * x + 7 * y) % 256).toInt
            val g = ((id + x) % 256).toInt
            val b = ((id + y) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val dec = Multimodal.decodeImage(Multimodal.encodePng(img))
          .getOrElse(throw new IllegalStateException(s"PNG round-trip failed for doc $id"))
        def red(x: Int, y: Int): Int = (dec.getRGB(x, y) >> 16) & 0xff
        var redSum = 0L
        var yy = 0
        while (yy < dec.getHeight) {
          var xx = 0
          while (xx < dec.getWidth) { redSum += red(xx, yy); xx += 1 }
          yy += 1
        }
        (id, dec.getWidth, dec.getHeight, dec.getRaster.getNumBands,
          red(0, 0), red(dec.getWidth - 1, dec.getHeight - 1), redSum)
      }
    }.toDF("doc_id", "width", "height", "channels", "px00_red", "pxwh_red", "red_sum")
      .orderBy(col("doc_id"))
  }

  /** q46: the audio twin of q43 — per `doc_id` a deterministic mono
    * 16-bit PCM signal of `64 + id%64` samples at 8 kHz, sample
    * `i` = `((id·31 + i·17) % 65536) − 32768`, encoded through the JDK's
    * actual RIFF/WAV writer and decoded back through [[Multimodal
    * .decodeWav]]; the query reports what the DECODED stream contains
    * (frame count, rate, channels, first/last raw samples, full sample
    * sum) while the oracle computes the same quantities from the formula
    * alone. A hash match proves the WAV codec really ran and recovered
    * every sample — a byte-fold stub cannot fake it.
    */
  def q46AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 64).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort)
        val wav = Multimodal.decodeWav(Multimodal.encodeWav(samples, 8000, 1))
          .getOrElse(throw new IllegalStateException(s"WAV round-trip failed for doc $id"))
        def raw(i: Int): Int = Math.round(wav.samples(i) * 32768f)
        var sum = 0L
        var i = 0
        while (i < wav.samples.length) { sum += raw(i); i += 1 }
        (id, wav.frames, wav.sampleRate.toInt, wav.channels,
          raw(0), raw(wav.samples.length - 1), sum)
      }
    }.toDF("doc_id", "n_frames", "sample_rate", "channels", "s_first", "s_last", "sample_sum")
      .orderBy(col("doc_id"))
  }

  /** q93: the video-style plumbing ops on the gate — [[Multimodal
    * .frameSample]] (n evenly-spaced byte offsets per item, the keyframe
    * extraction layout) and [[Multimodal.resize]] (every-kth-byte
    * content transform + metadata rewrite) over closed-form ASCII
    * payloads, so the oracle replays both from the formula: byte
    * offsets, resized lengths, AND a character probed out of the
    * actually-resized binary content (which a metadata-only stub could
    * not produce). Payloads are ASCII by construction so byte and
    * character indexing agree on both engines.
    */
  def q93FrameSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(expr("repeat('ABCDEFGHIJ', CAST(1 + doc_id % 7 AS INT))"),
          col("doc_id").cast("string")).as("payload"))
    val media = Multimodal.fromText(docs, "doc_id", "payload", "video")
    val frames = Multimodal.frameSample(media, 4)
    val resized = Multimodal.resize(media, 3)
      .select(col("media_id"), col("meta.n_bytes").as("rs_nbytes"),
        col("content").cast("string").as("rs_text"))
    frames.join(resized, Seq("media_id"))
      .withColumn("rs_char", expr("substr(rs_text, CAST(frame_idx AS INT) + 1, 1)"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("byte_offset"), col("media_type"), col("rs_nbytes"), col("rs_char"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** q125: PERCEPTUAL image dedup — the multimodal member of the dedup
    * family (q24 exact text, q26 near-dup text, q96 embeddings; this is
    * the IMAGE axis a multimodal corpus needs). Per doc a deterministic
    * 32×16 image keyed on `gid = doc_id % 50` (so every ~10 docs share
    * PIXELS) is encoded through the JDK's REAL lossless codecs — half
    * the corpus as PNG, half as BMP (same decoded pixels, entirely
    * different container bytes: the same-photo-different-format case a
    * scraped corpus is full of, invisible to byte-md5 dedup) — decoded
    * back with [[Multimodal.decodeImage]] (format auto-detected) and
    * fingerprinted with
    * [[Multimodal.averageHash]] (8×8 block-mean aHash, exact integer
    * compares). Same decoded pixels ⇒ same hash ⇒ the q24 keep-first
    * report, now robust to re-encoding. The oracle replays the aHash
    * bit math from the pixel formula alone — a hash match proves the
    * real PNG codec ran AND the block fingerprint matched across the
    * two encoder paths.
    *
    * Scale shape: one stateless mapPartitions decode kernel (the
    * mapInPandas batch shape), one 16-byte-key hash aggregate, one
    * broadcast-sized join back — q24's plan with a decode stage.
    */
  /** The shared q125/q153 image fixture: a deterministic 32×16 image
    * keyed on gid — red encodes gid's bits in BLOCK brightness (block
    * bi reads bit bi mod 6), green/blue add a gid-independent texture:
    * every gid in 0..49 lands on a DISTINCT aHash (simulated
    * exhaustively), so dedup groups are exactly the pixel-identical gid
    * groups — a smooth per-pixel gradient collapsed 28 gids into one
    * hash (aHash is deliberately coarse; structure must sit at block
    * scale to survive it). */
  private[graft] def gidImage(gid: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      32, 16, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 32) {
        val bi = (y / 2) * 8 + x / 4
        val r = (((gid >> (bi % 6)) & 1L) * 255L).toInt
        val g = (x * 8) % 256
        val b = (y * 16) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode through the JDK's REAL lossless codecs — half the corpus as
    * PNG, half as BMP (same decoded pixels, entirely different container
    * bytes), then decode back with format auto-detection. */
  private[graft] def roundTripImage(id: Long, keys: Long = 50L): java.awt.image.BufferedImage = {
    val img = gidImage(id % keys)
    val bytes = if ((id / keys) % 2 == 0) Multimodal.encodePng(img)
      else {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        bos.toByteArray
      }
    Multimodal.decodeImage(bytes)
      .getOrElse(throw new IllegalStateException(s"image round-trip failed for doc $id"))
  }

  def q125ImageDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map { id =>
        val (lo, hi) = Multimodal.averageHash(roundTripImage(id))
        (id, lo, hi)
      }
    }.toDF("doc_id", "ahash_lo", "ahash_hi")
    val grp = hashed.groupBy(col("ahash_lo"), col("ahash_hi"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    hashed.join(grp, Seq("ahash_lo", "ahash_hi"))
      .select(col("doc_id"), col("ahash_lo"), col("ahash_hi"),
        col("keep_id"), col("n_copies"), (col("doc_id") > col("keep_id")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** q153: FREQUENCY-DOMAIN image dedup — the q125 corpus fingerprinted
    * with [[Multimodal.hadamardHash]] (Walsh–Hadamard wHash): the exact
    * integer analog of pHash's DCT low-frequency signature, run through
    * the same real PNG/BMP codec round trip. aHash (q125) thresholds
    * each block against the global mean; wHash thresholds the 15
    * low-sequency TRANSFORM coefficients against their median, so it
    * reads pattern structure (edges, stripes, gradients) rather than
    * brightness layout — the second, independent axis a production
    * image-dedup cascade votes across (aHash ∧ wHash agreement is the
    * standard false-positive guard). The oracle replays block sums →
    * ±1 transform → median threshold from the pixel formula alone
    * (popcount via an 8-entry table over 3-bit operands), so a hash
    * match proves the real codecs ran AND the transform math is
    * bit-identical in both engines.
    *
    * Scale shape: identical to q125 — one stateless decode kernel, one
    * hash aggregate, one broadcast-sized join back.
    */
  def q153WHashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map(id => (id, Multimodal.hadamardHash(roundTripImage(id))))
    }.toDF("doc_id", "whash")
    val grp = hashed.groupBy(col("whash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    hashed.join(grp, Seq("whash"))
      .select(col("doc_id"), col("whash"), col("keep_id"), col("n_copies"),
        (col("doc_id") > col("keep_id")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** q161: MULTI-INDEX HAMMING NEAR-DUP over the wHash space — exact
    * Hamming-distance search done the scalable way (Norouzi, Punjani &
    * Fleet, "Fast Search in Hamming Space with Multi-Index Hashing"):
    * split the 15-bit fingerprint into 3 disjoint 5-bit bands; by
    * pigeonhole, any two hashes within distance ≤ 2 agree EXACTLY on
    * at least one band, so an equi-join per band finds every candidate
    * and a popcount verify keeps the true near pairs — no all-pairs
    * comparison ever exists. The search runs at HASH level (distinct
    * fingerprints with member counts), so the join is bounded by the
    * fingerprint space, not the corpus: the near-duplicate IMAGE
    * report (re-encoded + slightly-edited copies) that exact-hash
    * q153 cannot see.
    *
    * Exactness: popcount of a 15-bit XOR via three 32-entry table
    * lookups — pure integer, engine-identical. Candidates emit ONCE
    * per pair (minimum agreeing band, the q91 single-emission rule)
    * so no distinct-dedup pass is needed.
    */
  def q161HammingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map(id => (id, Multimodal.hadamardHash(roundTripImage(id))))
    }.toDF("doc_id", "whash")
    val hs = hashed.groupBy(col("whash")).agg(count(lit(1)).as("n_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = hs.select(col("whash"), col("n_docs"),
      explode(expr("sequence(0, 2)")).as("band"))
      .withColumn("bkey", expr("shiftright(whash, cast(band * 5 as int)) & 31"))
    val pc32 = (0 until 32).map(Integer.bitCount).mkString("array(", ", ", ")")
    val dist = expr(s"""element_at($pc32, cast((shiftright(hx, 0) & 31) as int) + 1)
      + element_at($pc32, cast((shiftright(hx, 5) & 31) as int) + 1)
      + element_at($pc32, cast((shiftright(hx, 10) & 31) as int) + 1)""")
    val minBand = expr("""least(
      CASE WHEN (shiftright(hx, 0) & 31) = 0 THEN 0 ELSE 99 END,
      CASE WHEN (shiftright(hx, 5) & 31) = 0 THEN 1 ELSE 99 END,
      CASE WHEN (shiftright(hx, 10) & 31) = 0 THEN 2 ELSE 99 END)""")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.whash") < col("b.whash"))
      .select(col("a.whash").as("hash_a"), col("b.whash").as("hash_b"),
        col("a.n_docs").as("n_a"), col("b.n_docs").as("n_b"), col("a.band").as("band"))
      .withColumn("hx", expr("hash_a ^ hash_b"))
      .withColumn("dist", dist)
      .filter(col("dist") <= 2 && col("band") === minBand)
      .select(col("hash_a"), col("hash_b"), col("dist").cast("long").as("dist"),
        col("n_a"), col("n_b"))
      .orderBy(col("hash_a"), col("hash_b"))
  }

  private val AfpOffset = 1L << 60
  private val AfpWindows = 8

  /** q193: ACOUSTIC-FINGERPRINT DEDUP — the energy-envelope front end
    * every audio-dedup pipeline starts from (Shazam-style fingerprints
    * are functions of exactly this window-energy sequence): decode each
    * clip through the REAL WAV codec (q46's path), sum squared samples
    * over [[AfpWindows]] equal windows (exact BIGINT — the remainder
    * tail is dropped identically on both engines), fingerprint the
    * envelope, and group. The corpus plants a PHASE-INVERTED twin of
    * every clip (samples negated; −32768 wraps to itself under 16-bit
    * two's complement, which leaves its square — hence the envelope —
    * unchanged either way): energy is sign-blind, so every twin must
    * land in its original's group — the invariance the energy domain
    * exists to provide, and one a byte-level dedup (q24) structurally
    * cannot see.
    *
    * Scale shape: one per-clip decode kernel (linear, embarrassingly
    * parallel), ONE md5-keyed group (map-side combined) + an equi-join
    * back on the same key — the q24/q181 dedup shuffle budget with the
    * codec in front.
    */
  def q193AudioFingerprintDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deliberately NOT spread (guide §2.5 tried and REVERTED, r14): the
    // javax.sound codec path serializes on the JVM-global provider
    // registry lock, so a 32-way spread measured 82.7 s of task time
    // (lock wait) for the same ~3 s of real decode CPU — wall flat,
    // contention pure loss. The kernel stays on the scan's layout.
    val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val items = ids.mapPartitions { it =>
      it.flatMap { id =>
        val n = (64 + id % 64).toInt
        val base = Array.tabulate(n)(i =>
          (((id * 31 + i.toLong * 17) % 65536) - 32768).toShort)
        val inverted = base.map(v => (-v).toShort)
        Seq((id, base), (id + AfpOffset, inverted))
      }.map { case (itemId, samples) =>
        val wav = Multimodal.decodeWav(Multimodal.encodeWav(samples, 8000, 1))
          .getOrElse(throw new IllegalStateException(
            s"WAV round-trip failed for item $itemId"))
        def raw(i: Int): Long = Math.round(wav.samples(i) * 32768f).toLong
        val n = wav.samples.length
        val w = n / AfpWindows
        val env = Array.tabulate(AfpWindows) { k =>
          var acc = 0L
          var i = k * w
          while (i < (k + 1) * w) { acc += raw(i) * raw(i); i += 1 }
          acc
        }
        (itemId, n.toLong, env.mkString(","))
      }
    }.toDF("item_id", "n_frames", "env")
    val withFp = items.withColumn("fp", md5(col("env").cast("binary")))
    // group stats via ONE fp-keyed window instead of groupBy + self-join:
    // the join's second consumption of withFp re-executed the whole
    // decode kernel (no shared-scan reuse across an aggregate), doubling
    // the codec CPU; the window pays the same fp-keyed exchange once and
    // decodes once. Values identical (count/min are order-free).
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    withFp
      .withColumn("n_copies", count(lit(1)).over(wFp))
      .withColumn("canonical_id", min(col("item_id")).over(wFp))
      .select(col("item_id"), col("n_frames"), col("fp"), col("n_copies"),
        col("canonical_id"), (col("item_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy(col("item_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_audio_fp_dedup" -> (q193AudioFingerprintDedup _),
    "q125_image_dedup" -> (q125ImageDedup _),
    "q153_whash_dedup" -> (q153WHashDedup _),
    "q161_hamming_neardup" -> (q161HammingNearDup _),
    "q43_image_decode" -> (q43ImageDecode _),
    "q46_audio_decode" -> (q46AudioDecode _),
    "q93_frame_sample" -> (q93FrameSample _),
  )

  /** 32-entry popcount table as a SQL list literal (5-bit operands). */
  private val Pc32List: String =
    (0 until 32).map(Integer.bitCount).mkString("[", ", ", "]")

  /** The wHash replay as oracle CTE text: expects a `docs(doc_id, gid)`
    * CTE in scope, emits `gids`/`pix`/`blocks`/`uv`/`co`/`med` and the
    * final `hashes(gid, whash)` — ONE definition shared by the q153
    * batch gate and the q158 streaming-ingest gate (index and probe
    * replay identical bit math). */
  private[queries] val whashCtes: String =
    """gids AS (SELECT DISTINCT gid FROM docs),
      |pix AS (
      |  SELECT gid, x, y,
      |         ((gid >> CAST(((y // 2) * 8 + x // 4) % 6 AS INT)) & 1) * 255
      |           + (x * 8) % 256 + (y * 16) % 256 AS lum
      |  FROM gids
      |  CROSS JOIN (SELECT unnest(range(32)) AS x)
      |  CROSS JOIN (SELECT unnest(range(16)) AS y)),
      |blocks AS (
      |  SELECT gid, x // 4 AS bx, y // 2 AS by, CAST(sum(lum) AS BIGINT) AS bs
      |  FROM pix GROUP BY 1, 2, 3),
      |uv AS (SELECT u.u, v.v, CAST(v.v * 4 + u.u - 1 AS INT) AS idx
      |       FROM (SELECT unnest(range(4)) AS u) u
      |       CROSS JOIN (SELECT unnest(range(4)) AS v) v
      |       WHERE NOT (u.u = 0 AND v.v = 0)),
      |co AS (
      |  SELECT b.gid, uv.idx,
      |         CAST(sum(b.bs * (1 - 2 * ((([0,1,1,2,1,2,2,3])[CAST((uv.u & b.bx) + 1 AS INT)]
      |                  + ([0,1,1,2,1,2,2,3])[CAST((uv.v & b.by) + 1 AS INT)]) % 2))) AS BIGINT) AS c
      |  FROM blocks b CROSS JOIN uv
      |  GROUP BY 1, 2),
      |med AS (SELECT gid, c AS medv FROM (
      |          SELECT gid, c, row_number() OVER (PARTITION BY gid ORDER BY c, idx) AS rk
      |          FROM co)
      |        WHERE rk = 8),
      |hashes AS (
      |  SELECT co.gid,
      |         CAST(sum(CASE WHEN co.c > med.medv
      |                       THEN (CAST(1 AS BIGINT) << co.idx) ELSE 0 END) AS BIGINT) AS whash
      |  FROM co JOIN med USING (gid) GROUP BY 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // aHash bit math replayed from the pixel formula: 32×16 image,
    // 8×8 block grid (4×2 px blocks), lum = r+g+b, bit set iff
    // bs·64 > ts (exact integer cross-multiply) — engine-identical
    // the multi-index Hamming join replayed at hash level: banded
    // candidates, XOR popcount via 32-entry tables, min-band emission
    "q161_hamming_neardup" ->
      s"""WITH docs AS (SELECT doc_id, doc_id % 50 AS gid FROM documents),
        |${whashCtes},
        |dh AS (SELECT d.doc_id, h.whash FROM docs d JOIN hashes h USING (gid)),
        |hs AS (SELECT whash, CAST(count(*) AS BIGINT) AS n_docs FROM dh GROUP BY 1),
        |bk AS (SELECT whash, n_docs, band,
        |              (whash >> CAST(band * 5 AS INT)) & 31 AS bkey
        |       FROM (SELECT whash, n_docs, unnest(range(3)) AS band FROM hs)),
        |cand AS (SELECT a.whash AS hash_a, b.whash AS hash_b, a.n_docs AS n_a,
        |                b.n_docs AS n_b, a.band AS band,
        |                xor(a.whash, b.whash) AS hx
        |         FROM bk a JOIN bk b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.whash < b.whash),
        |v AS (SELECT *,
        |             ($Pc32List)[CAST(((hx >> 0) & 31) + 1 AS INT)]
        |               + ($Pc32List)[CAST(((hx >> 5) & 31) + 1 AS INT)]
        |               + ($Pc32List)[CAST(((hx >> 10) & 31) + 1 AS INT)] AS dist,
        |             least(CASE WHEN ((hx >> 0) & 31) = 0 THEN 0 ELSE 99 END,
        |                   CASE WHEN ((hx >> 5) & 31) = 0 THEN 1 ELSE 99 END,
        |                   CASE WHEN ((hx >> 10) & 31) = 0 THEN 2 ELSE 99 END) AS mb
        |      FROM cand)
        |SELECT hash_a, hash_b, CAST(dist AS BIGINT) AS dist, n_a, n_b
        |FROM v WHERE dist <= 2 AND band = mb ORDER BY hash_a, hash_b""".stripMargin,
    // wHash bit math replayed from the pixel formula: block sums → ±1
    // Walsh–Hadamard transform (sign via an 8-entry popcount table over
    // the 3-bit operands) → 15 low-sequency coefficients → exact rank-8
    // median threshold — engine-identical BIGINTs throughout
    "q153_whash_dedup" ->
      s"""WITH docs AS (SELECT doc_id, doc_id % 50 AS gid FROM documents),
        |${whashCtes},
        |dh AS (SELECT d.doc_id, h.whash FROM docs d JOIN hashes h USING (gid)),
        |grp AS (SELECT whash, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        |        FROM dh GROUP BY 1)
        |SELECT dh.doc_id, dh.whash, g.keep_id, g.n_copies,
        |       dh.doc_id > g.keep_id AS is_dup
        |FROM dh JOIN grp g USING (whash) ORDER BY dh.doc_id""".stripMargin,
    "q125_image_dedup" ->
      """WITH docs AS (SELECT doc_id, doc_id % 50 AS gid FROM documents),
        |gids AS (SELECT DISTINCT gid FROM docs),
        |pix AS (
        |  SELECT gid, x, y,
        |         ((gid >> CAST(((y // 2) * 8 + x // 4) % 6 AS INT)) & 1) * 255
        |           + (x * 8) % 256 + (y * 16) % 256 AS lum
        |  FROM gids
        |  CROSS JOIN (SELECT unnest(range(32)) AS x)
        |  CROSS JOIN (SELECT unnest(range(16)) AS y)),
        |blocks AS (
        |  SELECT gid, CAST(y // 2 AS BIGINT) * 8 + x // 4 AS bit,
        |         CAST(sum(lum) AS BIGINT) AS bs
        |  FROM pix GROUP BY 1, 2),
        |tots AS (SELECT gid, sum(bs) AS ts FROM blocks GROUP BY 1),
        |hashes AS (
        |  SELECT b.gid,
        |         CAST(sum(CASE WHEN bit < 32 AND bs * 64 > ts
        |                       THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
        |                       ELSE 0 END) AS BIGINT) AS ahash_lo,
        |         CAST(sum(CASE WHEN bit >= 32 AND bs * 64 > ts
        |                       THEN (CAST(1 AS BIGINT) << CAST(bit - 32 AS INT))
        |                       ELSE 0 END) AS BIGINT) AS ahash_hi
        |  FROM blocks b JOIN tots USING (gid) GROUP BY 1),
        |dh AS (SELECT d.doc_id, h.ahash_lo, h.ahash_hi
        |       FROM docs d JOIN hashes h USING (gid)),
        |grp AS (SELECT ahash_lo, ahash_hi, min(doc_id) AS keep_id,
        |               CAST(count(*) AS BIGINT) AS n_copies
        |        FROM dh GROUP BY 1, 2)
        |SELECT d.doc_id, d.ahash_lo, d.ahash_hi, g.keep_id, g.n_copies,
        |       d.doc_id > g.keep_id AS is_dup
        |FROM dh d JOIN grp g USING (ahash_lo, ahash_hi)
        |ORDER BY d.doc_id""".stripMargin,
    "q43_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(8 + doc_id % 24 AS INT) AS width,
        |         CAST(8 + doc_id % 16 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT unnest(range(32)) AS x),
        |ys AS (SELECT unnest(range(24)) AS y),
        |sums AS (
        |  SELECT d.doc_id,
        |         CAST(SUM((d.doc_id + 3*xs.x + 7*ys.y) % 256) AS BIGINT) AS red_sum
        |  FROM dims d JOIN xs ON xs.x < d.width JOIN ys ON ys.y < d.height
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id, d.width, d.height, CAST(3 AS INT) AS channels,
        |       CAST(d.doc_id % 256 AS INT) AS px00_red,
        |       CAST((d.doc_id + 3*(d.width-1) + 7*(d.height-1)) % 256 AS INT) AS pxwh_red,
        |       s.red_sum
        |FROM dims d JOIN sums s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // q193: the q46 sample formula squared over 8 equal windows (the
    // remainder tail dropped); twins share the base envelope verbatim
    "q193_audio_fp_dedup" ->
      s"""WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n
        |           FROM documents),
        |w AS (SELECT doc_id, n, n // $AfpWindows AS wlen FROM d),
        |k AS (SELECT unnest(range($AfpWindows)) AS k),
        |i AS (SELECT unnest(range(128)) AS i),
        |en AS (SELECT w.doc_id, w.n, k.k,
        |              CAST(SUM(((w.doc_id * 31 + i.i * 17) % 65536 - 32768)
        |                       * ((w.doc_id * 31 + i.i * 17) % 65536 - 32768))
        |                   AS BIGINT) AS e
        |       FROM w CROSS JOIN k
        |       JOIN i ON i.i >= k.k * w.wlen AND i.i < (k.k + 1) * w.wlen
        |       GROUP BY 1, 2, 3),
        |env AS (SELECT doc_id, n,
        |               string_agg(CAST(e AS VARCHAR), ',' ORDER BY k) AS env
        |        FROM en GROUP BY 1, 2),
        |items AS (SELECT doc_id AS item_id, n AS n_frames, env FROM env
        |          UNION ALL
        |          SELECT doc_id + $AfpOffset, n, env FROM env),
        |g AS (SELECT md5(env) AS fp, CAST(count(*) AS BIGINT) AS n_copies,
        |             min(item_id) AS canonical_id
        |      FROM items GROUP BY 1)
        |SELECT i.item_id, i.n_frames, md5(i.env) AS fp, g.n_copies,
        |       g.canonical_id, i.item_id <> g.canonical_id AS is_dup
        |FROM items i JOIN g ON md5(i.env) = g.fp
        |ORDER BY item_id""".stripMargin,

    "q46_audio_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n
        |  FROM documents),
        |idx AS (SELECT unnest(range(128)) AS i),
        |sums AS (
        |  SELECT d.doc_id,
        |         CAST(SUM((d.doc_id * 31 + idx.i * 17) % 65536 - 32768) AS BIGINT)
        |           AS sample_sum
        |  FROM dims d JOIN idx ON idx.i < d.n
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id, d.n AS n_frames, CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST(d.doc_id * 31 % 65536 - 32768 AS INT) AS s_first,
        |       CAST((d.doc_id * 31 + (d.n - 1) * 17) % 65536 - 32768 AS INT) AS s_last,
        |       s.sample_sum
        |FROM dims d JOIN sums s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    /* Spark divides frame_idx·n_bytes/4 as IEEE and casts long by
     * TRUNCATION — floor() replays that for the non-negative operands;
     * the resized char comes straight off the payload formula. */
    "q93_frame_sample" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |                  repeat('ABCDEFGHIJ', CAST(1 + doc_id % 7 AS INT))
        |                    || CAST(doc_id AS VARCHAR) AS payload
        |           FROM documents),
        |m AS (SELECT media_id, payload,
        |             CAST(length(payload) AS BIGINT) AS n_bytes,
        |             CAST(length(payload) // 3 AS BIGINT) AS rs_nbytes
        |      FROM p),
        |f AS (SELECT media_id, CAST(unnest(range(4)) AS BIGINT) AS frame_idx FROM m)
        |SELECT m.media_id, f.frame_idx,
        |       CAST(floor(f.frame_idx * greatest(m.n_bytes, 1) / 4.0) AS BIGINT)
        |         AS byte_offset,
        |       'video' AS media_type, m.rs_nbytes,
        |       CASE WHEN f.frame_idx < m.rs_nbytes
        |            THEN substr(m.payload, CAST(f.frame_idx * 3 + 1 AS INT), 1)
        |            ELSE '' END AS rs_char
        |FROM m JOIN f USING (media_id)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
