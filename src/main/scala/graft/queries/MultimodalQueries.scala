package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing surface — every query here is hash-checked against a
  * DuckDB oracle. q80 serializes the feature vector deterministically
  * (integer parts-per-million, see below) so the raw `array<float>` never
  * reaches the driver's pandas compare; q28 exposes the HLL sketch through a
  * checkable `within_5pct` face.
  */
object MultimodalQueries {

  // q80: binary payload → partition-batched feature extraction. The
  // `array<float>` features are serialized as comma-joined integer ppm
  // (round(f*1e6)): both Spark `round` and DuckDB `round` are
  // half-away-from-zero, so ties like 1/128 = 0.0078125 agree — unlike
  // format_number (HALF_UP) vs printf (HALF_EVEN).
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(Tables(s, dir).documents))
      .select($"media_id", $"kind", $"n_bytes",
        array_join(transform($"features",
          f => round(f.cast("double") * 1000000).cast("long").cast("string")), ",")
          .as("features_ppm"))
      .orderBy($"media_id")
  }

  // q327: shot-boundary detection — the video-segmentation primitive a
  // multimodal training pipeline runs before captioning/sampling: frames
  // whose intensity jumps against the previous frame start a new shot.
  // The pipeline is the REAL contract (64-byte frames via the declarative
  // sampler, per-frame "luma" = exact integer byte sum through the
  // typed-mapPartitions codec seam where a real decoder slots in, keyed
  // lag + running boundary count per media, per-shot lengths), the
  // decode is the documented stub. At 100 TB every stage is keyed by
  // media_id: the windows sort frames-per-video, never the corpus; the
  // only shuffles are (media_id) keyed. Boundaries are integer
  // comparisons (|Δluma| > 400), so both engines segment identically.
  def shotBoundary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.mediaFromDocuments(Tables(s, dir).documents)
    val frames = Multimodal.sampleFrames(media, 64, 1)
    val lumas = frames.select($"media_id", $"frame_idx", $"frame_bytes")
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init point: a real frame decoder would be
        // constructed once here (FakeDecoder discipline, q80)
        rows.map { case (id, fi, b) =>
          var sum = 0L
          var i = 0
          while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
          (id, fi, sum)
        }
      }.toDF("media_id", "frame_idx", "luma")
    val w = Window.partitionBy($"media_id").orderBy($"frame_idx")
    val seg = lumas
      .withColumn("prev", lag($"luma", 1).over(w))
      .withColumn("cut",
        when($"prev".isNotNull && abs($"luma" - $"prev") > 400, 1).otherwise(0))
      .withColumn("shot", sum($"cut").over(w))
    seg.groupBy($"media_id", $"shot").agg(count(lit(1)).as("flen"))
      .groupBy($"media_id")
      .agg((max($"shot") + 1).cast("long").as("n_shots"),
        sum($"flen").as("n_frames"),
        max($"flen").as("max_shot_frames"))
      .join(lumas.groupBy($"media_id").agg(sum($"luma").as("luma_sum")),
        Seq("media_id"))
      .select($"media_id", $"n_frames", $"n_shots", $"max_shot_frames", $"luma_sum")
      .orderBy($"media_id")
  }

  // q81: frame sampling accounting (64-byte frames, stride 2), per kind.
  def mediaFrameStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(Tables(s, dir).documents)
    Multimodal.sampleFrames(media, 64, 2)
      .join(media.select($"media_id", $"kind"), Seq("media_id"))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct($"media_id").as("n_media"),
        sum(length($"frame_bytes")).as("total_bytes"))
      .orderBy($"kind")
  }

  // q83: dominant feature bin per media — the oracle-checkable face of the
  // q80 decode: argmax histogram bin (tie → lowest bin) + its fraction.
  // Fraction stays in FLOAT on both engines (count/len in float, then
  // widened) so the values are bit-identical.
  def mediaDominantBin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables(s, dir).documents))
    feats.filter($"n_bytes" > 0)
      .select($"media_id", $"kind", $"n_bytes",
        (array_position($"features", array_max($"features")) - 1).cast("int").as("top_bin"),
        round(element_at($"features",
          array_position($"features", array_max($"features")).cast("int")).cast("double"), 6).as("top_frac"))
      .orderBy($"media_id")
  }

  // q28: approximate distinct (HLL++) — the sketch value itself is not
  // SQL-reproducible, so the checkable face is the accuracy contract:
  // |approx − exact| / exact ≤ 5% (HLL++ at default rsd 0.05), which the
  // oracle asserts as a constant TRUE next to the exact count.
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx_parts" - $"exact_parts") / $"exact_parts" <= 0.05).as("within_5pct"))
      .orderBy($"l_returnflag")
  }

  // q82: multimodal struct composition — documents ⋈ embeddings on id,
  // nesting text metadata + vector into one struct column (the "one row =
  // one sample with every modality" shape), then field access back out.
  def docEmbeddingJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.documents.join(t.embeddings, $"doc_id" === $"vec_id")
      .select($"doc_id", struct(
        struct($"lang", $"source", $"n_chars").as("meta"),
        $"embedding", $"label").as("sample"))
      .select($"doc_id",
        $"sample.meta.lang".as("lang"),
        $"sample.label".as("label"),
        size($"sample.embedding").as("dim"),
        round(element_at($"sample.embedding", 1).cast("double"), 6).as("e0"))
      .orderBy($"doc_id")
  }

  // q85: byte-domain resize (stride downsample to ≤128 bytes) then re-run
  // the stub decoder on the RESIZED payload — dominant bin + fraction,
  // hash-checked. Proves the resample plumbing end to end: stride math,
  // payload reconstruction, and that downstream features still compute.
  def mediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val resized = Multimodal.resize(
      Multimodal.mediaFromDocuments(Tables(s, dir).documents), 128)
    Multimodal.extractFeatures(resized)
      .join(resized.select($"media_id", $"n_orig", $"stride"), Seq("media_id"))
      .filter($"n_bytes" > 0)
      .select($"media_id", $"kind", $"n_orig", $"stride", $"n_bytes",
        (array_position($"features", array_max($"features")) - 1).cast("int").as("top_bin"),
        round(element_at($"features",
          array_position($"features", array_max($"features")).cast("int")).cast("double"), 6).as("top_frac"))
      .orderBy($"media_id")
  }

  // q266: perceptual-hash near-dup banding — aHash over the decoded
  // payload: 64 bytes sampled at integer stride, bit i = sample·64 > Σ
  // (the above-mean test without division), packed into four 16-bit
  // bands, then LSH-style bucket stats per band (distinct values, hottest
  // bucket, Σ C(n,2) candidate pairs — the number that decides whether a
  // band join is feasible before running it, q246's audit for the image
  // pipeline). Visually-similar media agree on most bits, so true
  // near-dups co-bucket in ≥1 band (q68's SimHash pigeonhole, on media).
  // Everything integer; the stub decoder stands in for the codec, the
  // sampling/hash/band plumbing is the real contract.
  def mediaPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaFromDocuments(Tables(s, dir).documents)
      .select($"media_id", decode($"payload", "utf-8").as("s"))
      .withColumn("n", length($"s")).filter($"n" >= 64)
      .withColumn("v", expr(
        "transform(sequence(0, 63), i -> " +
        "ascii(substring(s, CAST(1 + (i * n) DIV 64 AS INT), 1)))"))
      .withColumn("sv", expr("aggregate(v, 0L, (a, x) -> a + x)"))
      .select($"media_id", posexplode(expr(
        "transform(sequence(0, 3), b -> aggregate(sequence(0, 15), 0L, " +
        "(a, i) -> a + CAST(CASE WHEN element_at(v, CAST(b * 16 + i + 1 AS INT)) " +
        "* 64 > sv THEN 1 ELSE 0 END AS BIGINT) * shiftleft(1L, CAST(i AS INT))))"))
        .as(Seq("band_idx", "band_val")))
      .groupBy($"band_idx", $"band_val").agg(count(lit(1)).as("c"))
      .groupBy($"band_idx".cast("int").as("band_idx"))
      .agg(sum($"c").as("n_docs"), count(lit(1)).as("n_buckets"),
        max($"c").as("max_bucket"),
        sum(expr("c * (c - 1) DIV 2")).as("cand_pairs"))
      .orderBy($"band_idx")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q266_media_phash" -> mediaPhash _,
    "q85_media_resize" -> mediaResize _,
    "q82_doc_embedding_join" -> docEmbeddingJoin _,
    "q83_media_dominant_bin" -> mediaDominantBin _,
    "q327_shot_boundary" -> shotBoundary _,
    "q80_media_features" -> mediaFeatures _,
    "q81_media_frame_stats" -> mediaFrameStats _,
    "q28_approx_distinct" -> approxDistinct _
  )

  val oracles: Map[String, String] = Map(
    "q266_media_phash" ->
      """WITH m AS (SELECT doc_id AS media_id, text AS s, len(text) AS n
        |  FROM documents WHERE len(text) >= 64),
        |v AS (SELECT media_id, n, list_transform(range(0, 64), i ->
        |    ascii(substring(s, CAST(1 + (i * n) // 64 AS INT), 1))) AS v
        |  FROM m),
        |b AS (SELECT media_id, v, list_sum(v) AS sv FROM v),
        |bands AS (SELECT media_id, CAST(t.b AS INT) AS band_idx,
        |    CAST(list_sum(list_transform(range(0, 16), i ->
        |      (CASE WHEN v[CAST(t.b * 16 + i + 1 AS INT)] * 64 > sv
        |       THEN 1 ELSE 0 END) * (1 << i))) AS BIGINT) AS band_val
        |  FROM b, range(0, 4) t(b)),
        |buckets AS (SELECT band_idx, band_val, CAST(count(*) AS BIGINT)
        |    AS c FROM bands GROUP BY 1, 2)
        |SELECT band_idx, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(c) AS BIGINT) AS max_bucket,
        |  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS cand_pairs
        |FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin,
    // documents.text is ASCII in this corpus → payload bytes = chars; the
    // stub decoder's 16-bin histogram is reproduced bin-by-bin (zero bins
    // included), L1-normalized in FLOAT on both engines, then serialized as
    // integer ppm so float formatting never enters the hash.
    "q327_shot_boundary" ->
      """WITH f AS (SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      j -> ascii(substr(text, CAST(t.i * 64 + j AS INT), 1))))
        |      AS BIGINT) AS luma
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(0, len(text) // 64)) AS i) t),
        |c AS (SELECT media_id, frame_idx, luma,
        |    lag(luma) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev
        |  FROM f),
        |g AS (SELECT media_id, frame_idx, luma,
        |    sum(CASE WHEN prev IS NOT NULL AND abs(luma - prev) > 400
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY media_id ORDER BY frame_idx) AS shot
        |  FROM c),
        |per AS (SELECT media_id, shot, count(*) AS flen FROM g GROUP BY 1, 2),
        |a AS (SELECT media_id, CAST(max(shot) + 1 AS BIGINT) AS n_shots,
        |    CAST(sum(flen) AS BIGINT) AS n_frames,
        |    CAST(max(flen) AS BIGINT) AS max_shot_frames
        |  FROM per GROUP BY 1),
        |l AS (SELECT media_id, CAST(sum(luma) AS BIGINT) AS luma_sum
        |  FROM f GROUP BY 1)
        |SELECT a.media_id, n_frames, n_shots, max_shot_frames, luma_sum
        |FROM a JOIN l USING (media_id) ORDER BY a.media_id""".stripMargin,
    "q80_media_features" ->
      """WITH docs0 AS (SELECT doc_id, text, len(text) AS n FROM documents),
        |bins AS (SELECT doc_id, n, unnest(range(0, 16)) AS bin FROM docs0),
        |chars AS (SELECT doc_id, ascii(substring(text, i, 1)) * 16 // 256 AS bin
        |  FROM docs0, lateral (SELECT unnest(range(1, n + 1)) AS i)),
        |hist AS (SELECT b.doc_id, b.n, b.bin, count(c.bin) AS cnt
        |  FROM bins b LEFT JOIN chars c ON b.doc_id = c.doc_id AND b.bin = c.bin
        |  GROUP BY 1, 2, 3),
        |feat AS (SELECT doc_id, n, bin,
        |    CASE WHEN n = 0 THEN 0
        |         ELSE CAST(round(CAST(CAST(cnt AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT)
        |    END AS ppm
        |  FROM hist)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(n AS INT) AS n_bytes,
        |  string_agg(CAST(ppm AS VARCHAR), ',' ORDER BY bin) AS features_ppm
        |FROM feat GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,
    "q28_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q82_doc_embedding_join" ->
      """SELECT doc_id, lang, label, CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e0
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    // documents.text is ASCII in this corpus → payload bytes = chars;
    // resize keeps chars at 1-based positions 1, 1+s, 1+2s, …
    "q85_media_resize" ->
      """WITH d AS (SELECT doc_id, text, len(text) AS n,
        |    greatest(1, (len(text) + 127) // 128) AS stride
        |  FROM documents WHERE len(text) > 0),
        |kept AS (SELECT doc_id, n, stride,
        |    ascii(substring(text, i, 1)) * 16 // 256 AS bin
        |  FROM d, lateral (SELECT unnest(range(1, n + 1)) AS i)
        |  WHERE (i - 1) % stride = 0),
        |sz AS (SELECT doc_id, count(*) AS n_res FROM kept GROUP BY doc_id),
        |hist AS (SELECT doc_id, n, stride, bin, count(*) AS cnt
        |  FROM kept GROUP BY 1, 2, 3, 4),
        |ranked AS (SELECT doc_id, n, stride, bin, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bin ASC) AS rn
        |  FROM hist)
        |SELECT r.doc_id AS media_id,
        |  CASE WHEN r.doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(r.n AS INT) AS n_orig, CAST(r.stride AS INT) AS stride,
        |  CAST(sz.n_res AS INT) AS n_bytes, CAST(r.bin AS INT) AS top_bin,
        |  round(CAST(CAST(r.cnt AS FLOAT) / CAST(sz.n_res AS FLOAT) AS DOUBLE), 6) AS top_frac
        |FROM ranked r JOIN sz USING (doc_id) WHERE rn = 1 ORDER BY media_id""".stripMargin,
    // documents.text is ASCII in this corpus → payload bytes = chars.
    "q83_media_dominant_bin" ->
      """WITH chars AS (SELECT doc_id, len(text) AS n,
        |    ascii(substring(text, i, 1)) * 16 // 256 AS bin
        |  FROM documents, lateral (SELECT unnest(range(1, len(text) + 1)) AS i)
        |  WHERE len(text) > 0),
        |hist AS (SELECT doc_id, n, bin, count(*) AS cnt FROM chars GROUP BY 1, 2, 3),
        |ranked AS (SELECT doc_id, n, bin, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bin ASC) AS rn
        |  FROM hist)
        |SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(n AS INT) AS n_bytes, CAST(bin AS INT) AS top_bin,
        |  round(CAST(CAST(cnt AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE), 6) AS top_frac
        |FROM ranked WHERE rn = 1 ORDER BY media_id""".stripMargin,
    "q81_media_frame_stats" ->
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  len(text) // 64 AS n_frames_raw FROM documents)
        |SELECT kind,
        |  CAST(sum((n_frames_raw + 1) // 2) AS BIGINT) AS n_frames,
        |  count(CASE WHEN n_frames_raw > 0 THEN 1 END) AS n_media,
        |  CAST(sum(((n_frames_raw + 1) // 2) * 64) AS BIGINT) AS total_bytes
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin
  )
}
