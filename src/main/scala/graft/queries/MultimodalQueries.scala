package graft.queries

import graft.Tables
import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling beside them. The
  * testdata has no binary table, so `documents.text` is encoded to
  * bytes to exercise the real Spark plumbing — binary columns through
  * parquet-compatible schemas, per-partition batch decode, typed
  * Datasets, feature vectors as array columns.
  *
  * The decode step itself is a clearly-marked deterministic STUB (the
  * container ships no image/audio codecs): it derives fake
  * width/height/frame metadata and a 16-bin byte histogram from the
  * payload. Swapping [[MultimodalQueries.stubDecode]] for a real codec
  * (JNI/ImageIO per partition) changes nothing about the plan shape,
  * partitioning, or schema — which is the part under test.
  */
object MultimodalQueries {

  /** One decoded media record (the typed side of the pipeline). */
  final case class MediaRecord(
      doc_id: Long,
      source: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  /** STUB decoder — stands in for a real image/audio decode. It is
    * deterministic in the payload bytes only, so the pipeline around it
    * is fully testable; a real implementation would decode pixels and
    * compute embeddings here, one partition's batch at a time.
    *
    * The fake height derives from the Unicode code point of the
    * payload's first character (UTF-8 decoded), NOT the signed lead
    * byte: DuckDB's `ascii()` returns the code point, and a signed-byte
    * derivation would diverge from the m04 oracle on any non-ASCII
    * lead (0xC3-led text: abs(-61)=61 vs code point 233). */
  def stubDecode(docId: Long, source: String, content: Array[Byte]): MediaRecord = {
    val w = 16 + (math.abs(content.length) % 64)
    val lead =
      if (content.isEmpty) 0
      else new String(content, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    val h = 16 + (lead % 64)
    val frames = 1 + (content.length % 8)
    val hist = new Array[Double](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) / 16) += 1.0
      i += 1
    }
    val n = math.max(1, content.length)
    MediaRecord(docId, source, content.length, w, h, frames, hist.map(_ / n))
  }

  /** STUB perceptual hash — the aHash shape (Krawetz's average hash:
    * downscale to 8×8 luminance, threshold each cell against the
    * mean) over the opaque payload: the "decode+downscale" is faked as
    * 64 equal byte segments whose mean byte value stands in for cell
    * luminance. A real implementation decodes pixels and feeds the
    * same 64 cells; everything downstream of this function (banding,
    * candidate join, hamming verify) is the production pipeline and
    * does not change. Returned as FOUR 16-bit band values rather than
    * one 64-bit word: bands are the LSH bucket keys downstream, and
    * 2^63 would overflow a signed long on bit 63 in both engines.
    * Bit s of the hash is set iff segment s's mean exceeds the global
    * mean — compared as the integer cross-product segSum·n > tot·segLen
    * so no engine ever divides (exact on both sides). Caller filters
    * to n ≥ 64 bytes so every segment is nonempty. */
  def stubPHashBands(content: Array[Byte]): Array[Int] = {
    val n = content.length
    val segSum = new Array[Long](64)
    val segLen = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < n) {
      val v = content(i) & 0xff
      val seg = (i.toLong * 64 / n).toInt
      segSum(seg) += v
      segLen(seg) += 1
      tot += v
      i += 1
    }
    val bands = new Array[Int](4)
    var s = 0
    while (s < 64) {
      if (segSum(s) * n > tot * segLen(s)) bands(s / 16) |= 1 << (s % 16)
      s += 1
    }
    bands
  }

  /** Aspect-preserving fit of (w, h) into a `box`×`box` target —
    * integer arithmetic only, so engines agree bit-for-bit. The short
    * side floors (standard image-resize convention) with a 1px minimum. */
  def resizeFit(w: Int, h: Int, box: Int): (Int, Int) =
    if (w >= h) (box, math.max(1, h * box / w))
    else (math.max(1, w * box / h), box)


  /** The frame fan-out expression shared by m03/m07/m10: chunk a
    * column into fixed-size frames (at least one, even for an empty
    * payload). `lenFn` picks the domain — `octet_length` for binary
    * payloads, `length` (code points) for text. One definition; the
    * per-query oracles mirror it in SQL. */
  private def frameChunksSql(c: String, lenFn: String, chunk: Int): String =
    s"transform(sequence(0, greatest(CAST(floor(($lenFn($c)-1)/$chunk) AS INT), 0)), i -> substring($c, i*$chunk+1, $chunk))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Binary metadata pass: byte length + content hash + lead byte —
      * pure Column ops over a binary column, with a DuckDB oracle. */
    "m01_binary_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          octet_length(col("content")).as("n_bytes"),
          md5(col("content")).as("content_md5"),
          ascii(col("content").cast("string")).as("first_code"))
        .filter(col("doc_id") < 100)
        .orderBy("doc_id")
    }),

    /** Typed per-partition decode → feature aggregation. The decode runs
      * batch-at-a-time inside mapPartitions (how a real codec would be
      * amortized); downstream is ordinary Column math over the feature
      * array.
      *
      * Fully oracle-verified since round 10: the stub's 16-bin byte
      * histogram IS portable SQL — bin b counts the payload bytes with
      * high nibble b, which DuckDB recovers from `hex(encode(text))`
      * by keeping the first character of each hex pair
      * (`regexp_replace(h, '(.).', '\1', 'g')`) and counting each hex
      * digit. The feature L2 norm folds the 16 squares in ascending
      * index order on both engines (the ArrayDot discipline), is
      * frozen per-doc to an exact integer (×1e6, the s07 sum_csim_e6
      * pattern), and aggregates as a BIGINT sum — so the per-source
      * norms compare exactly, not via summation-order-risky double
      * avgs, and the whole decode→features→aggregate pipeline
      * hash-matches DuckDB instead of settling for rows-only. */
    "m02_decode_features" -> ((s, d) => {
      import s.implicits._
      val ds: Dataset[(Long, String, Array[Byte])] = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text").cast("binary"))
        .as[(Long, String, Array[Byte])]
      val decoded = ds.mapPartitions(_.map { case (id, src, bytes) =>
        stubDecode(id, src, bytes)
      })
      decoded.toDF()
        .withColumn("feat_norm", sqrt(aggregate(
          col("features"), lit(0.0), (acc, x) => acc + x * x)))
        .withColumn("fe6", floor(col("feat_norm") * 1e6 + 0.5).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_media"),
          RelationalQueries.rnd(avg("width"), 4).as("avg_width"),
          RelationalQueries.rnd(avg("height"), 4).as("avg_height"),
          RelationalQueries.rnd(avg("n_frames"), 4).as("avg_frames"),
          sum("fe6").as("sum_feat_e6"),
          RelationalQueries.rnd(
            sum("fe6") / 1e6 / count(lit(1)), 4).as("avg_feat_norm"))
        .orderBy("source")
    }),

    /** Typed resize stage: decode → aspect-preserving 224-box resize,
      * batch-at-a-time in the same mapPartitions shape a real resampler
      * (JNI/ImageIO) would use. The stub's width/height derivation is
      * pure arithmetic on the payload (length + lead code point), so
      * the WHOLE typed pipeline — binary cast, partition batching,
      * resize math — is verified against a DuckDB replica (m04 proved
      * the pattern in round 7; m02's histogram replica followed it in
      * round 10). */
    "m04_resize" -> ((s, d) => {
      import s.implicits._
      val ds: Dataset[(Long, String, Array[Byte])] = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("source"), col("text").cast("binary"))
        .as[(Long, String, Array[Byte])]
      val resized = ds.mapPartitions(_.map { case (id, src, bytes) =>
        val m = stubDecode(id, src, bytes)
        val (nw, nh) = resizeFit(m.width, m.height, 224)
        (id, src, m.width, m.height, nw, nh)
      }).toDF("doc_id", "source", "width", "height", "new_w", "new_h")
      resized.groupBy("source")
        .agg(count(lit(1)).as("n_media"),
          sum("width").as("sum_w"), sum("height").as("sum_h"),
          sum("new_w").as("sum_new_w"), sum("new_h").as("sum_new_h"),
          max("new_h").as("max_new_h"))
        .orderBy("source")
    }),

    /** m02's determinism companion (the d06 pattern): the decode stub
      * is pure in the payload bytes, so running the SAME mapPartitions
      * pipeline on the corpus and on the corpus ∪ an exact doubled copy
      * must (a) exactly double every integer metadata sum, and (b) add
      * ZERO new feature fingerprints — the per-doc rnd6 feature vector
      * md5 set is unchanged by duplicate payloads. The metadata sums
      * are SQL-derivable (the m04 replica arithmetic), so DuckDB
      * ground-truths them directly; the feature-set invariant is the
      * structural claim DuckDB states as `true` (it cannot run the
      * stub, but purity forces set equality — a nondeterministic or
      * partition-dependent decode breaks this row loudly). Closes the
      * rows-only gap for the m02 code path. */
    "m06_decode_stability" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("source"), col("text").cast("binary").as("content"))
      val doubledDocs = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 500000))
      def decoded(df: DataFrame): DataFrame =
        df.as[(Long, String, Array[Byte])]
          .mapPartitions(_.map { case (id, src, bytes) =>
            stubDecode(id, src, bytes)
          }).toDF()
          .withColumn("fp", md5(concat_ws(",", transform(col("features"),
            x => (floor(x * 1e6 + 0.5) / 1e6).cast("string")))))
      val single = decoded(docs).groupBy("source").agg(
        count(lit(1)).as("n_single"),
        sum("width").as("sum_w_single"),
        countDistinct("fp").as("nfp_single"))
      val doubled = decoded(doubledDocs).groupBy("source").agg(
        count(lit(1)).as("n_doubled"),
        sum("width").as("sum_w_doubled"),
        sum("height").as("sum_h_doubled"),
        sum("n_frames").as("sum_frames_doubled"),
        countDistinct("fp").as("nfp_doubled"))
      // Both sides are n_sources-row aggregates; without a hint AQE
      // picks the build side from measured byte sizes, which jitter
      // enough to flip BuildLeft↔BuildRight run-to-run (seen once in
      // ~10 full plan-digest sweeps). Pin the narrower side as build.
      broadcast(single).join(doubled, "source")
        .select(col("source"), col("n_single"), col("n_doubled"),
          col("sum_w_single"), col("sum_w_doubled"),
          col("sum_h_doubled"), col("sum_frames_doubled"),
          (col("nfp_single") === col("nfp_doubled")).as("features_stable"))
        .orderBy("source")
    }),

    /** Multimodal training-record assembly: the id-equi-join that zips
      * a document's text payload (opaque binary), its embedding vector,
      * and typed metadata into one record — the last step before a
      * training shard is written. Both sides are corpus-sized, so this
      * is the one genuinely large join of the multimodal family; at
      * scale it shuffles on the shared id (or avoids the shuffle
      * entirely when both tables are bucketed by id —
      * [[graft.operators.StorageLayout]] proves that layout). Vector
      * norm runs through the native ArrayDot kernel; all downstream
      * stats are portable, so assembly is oracle-verified. */
    "m05_record_assembly" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          col("text").cast("binary").as("content"), col("n_chars"))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("vec"))
      docs.join(emb, "doc_id")
        .withColumn("n_bytes", octet_length(col("content")))
        .withColumn("vec_norm",
          sqrt(graft.functions.VectorExpressions.array_dot(col("vec"), col("vec"))))
        .groupBy("label")
        .agg(count(lit(1)).as("n_records"),
          sum("n_bytes").as("sum_bytes"),
          RelationalQueries.rnd(avg("n_chars"), 4).as("avg_chars"),
          RelationalQueries.rnd(avg("vec_norm"), 4).as("avg_vec_norm"),
          countDistinct("lang").as("n_langs"))
        .orderBy("label")
    }),

    /** Frame-level cross-document dedup — the multimodal counterpart of
      * d01: hash every frame (m03's deterministic chunking standing in
      * for decoded video frames) and find frames shared across
      * DISTINCT documents; planted exact-copy docs (doc_id < 40
      * re-ingested under new ids) make every one of their frames a
      * cross-doc duplicate, the re-uploaded-video case a media corpus
      * dedups at frame granularity rather than whole-file hash. One
      * explode + one map-side-combinable hash aggregate — the same
      * linear shape as d01, so it scales with total frame count.
      * Ground truth is pure substring/md5 math ⇒ DuckDB oracle. */
    "m07_frame_dedup" -> ((s, d) => {
      val chunk = 64
      val base = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val frames = base.unionByName(planted)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          explode(expr(
            frameChunksSql("content", "octet_length", chunk)))
            .as("frame"))
        .select(col("doc_id"), md5(col("frame")).as("fmd5"))
      val byHash = frames.groupBy("fmd5")
        .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("n"))
      byHash.agg(
        count(lit(1)).as("n_distinct_frames"),
        sum("n").as("n_frames"),
        sum(when(col("df") >= 2, col("n")).otherwise(0L))
          .as("n_frames_in_crossdoc_dups"),
        sum(when(col("df") >= 2, 1L).otherwise(0L))
          .as("n_crossdoc_frame_hashes"),
        max("df").as("max_doc_spread"))
    }),

    /** Frame sampling: every k-th chunk of the payload as a "frame" row
      * — the explode/posexplode pattern used to fan a video column out
      * to frame rows, with deterministic chunking (oracle-able). */
    "m03_frame_sample" -> ((s, d) => {
      val chunk = 64
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          posexplode(expr(
            frameChunksSql("content", "octet_length", chunk))))
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          octet_length(col("col")).as("frame_bytes"),
          md5(col("col")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    }),

    /** Pair-level alignment filter — the LAION-style gate a multimodal
      * corpus applies after pairing media with text/embeddings: score
      * every (payload, embedding) pair and keep pairs above a
      * similarity floor, publishing per-class retention so a
      * miscalibrated threshold (or a broken encoder) is visible as a
      * retention cliff, exactly how production monitors its CLIP-score
      * cut. The alignment score stands in as rnd6 cosine against the
      * pair's own class prototype ([[graft.operators.CentroidBuild
      * .centroids]] — a real deployment scores text-vs-image encoder
      * outputs; the stub keeps every stage portable). Per-row scores
      * are frozen to e6 BIGINT before the cross-row sum (the m02/s07
      * discipline), the retention ratio is one int/int division, and
      * the kept-bytes total rides the same aggregate — so the whole
      * gate hash-matches DuckDB. At scale: the k-row prototype table
      * broadcasts, pairs never shuffle to be scored, and the output is
      * one map-side-combinable per-class aggregate. */
    "m08_pair_filter" -> ((s, d) => {
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("content"))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("vec"))
      val cents = graft.operators.CentroidBuild.centroids(
        emb.select(col("label"), col("vec")), col("label"), col("vec"))
      val scored = media.join(emb, "doc_id")
        .join(broadcast(cents.select(col("cl_id").as("label"), col("cvec"))),
          "label")
        .withColumn("c6", RelationalQueries.rnd(
          graft.functions.VectorExpressions.array_cosine(
            col("vec"), col("cvec")), 6))
        .withColumn("n_bytes", octet_length(col("content")))
      val keep = col("c6") >= 0.1
      scored.groupBy("label")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("n_bytes").cast("long")).otherwise(0L))
            .as("kept_bytes"),
          sum(floor(col("c6") * 1000000 + 0.5).cast("long"))
            .as("sum_score_e6"))
        .withColumn("retention", RelationalQueries.rnd(
          col("n_kept").cast("double") / col("n_pairs"), 4))
        .select(col("label"), col("n_pairs"), col("n_kept"),
          col("retention"), col("kept_bytes"), col("sum_score_e6"))
        .orderBy("label")
    }),

    /** Perceptual-hash near-duplicate detection over binary payloads —
      * the image-dedup stage of a multimodal ingest, in the d02/d03
      * banded-LSH shape but keyed on a perceptual (content-derived)
      * hash instead of a text sketch, so visually-identical re-encodes
      * land in the same buckets. [[stubPHashBands]] fakes the
      * decode+downscale; the pipeline is real: the 64-bit aHash ships
      * as 4×16-bit bands, candidates are pairs sharing ANY band
      * (pigeonhole: every pair within hamming 3 is guaranteed caught;
      * the hamming ≤ 6 verify then bounds fp exactly), and the
      * id-only distinct runs BEFORE signatures rejoin, so payloads
      * never shuffle with the candidate fan-out (the neardupPairs
      * discipline). Scale: signature is one scan-side map over the
      * payload bytes, candidate volume is Σ bucket² per band — the
      * banding keeps it pair-bounded, never all-pairs — and the
      * output is a 7-row hamming histogram with an id checksum, so
      * the verify stage is the only shuffle. */
    "m09_phash_neardup" -> ((s, d) => {
      import s.implicits._
      // planted "re-encodes" (the d06/d07 ground-truth discipline): the
      // corpus has no natural payload near-dups, so every 50th doc gets
      // a copy with its first character replaced — a perturbation that
      // moves at most one segment mean, measured hamming 0-1 — under
      // doc_id + max(doc_id)+1. The offset is DERIVED (1-row aggregate
      // broadcast), not a fixed constant a large corpus's real ids could
      // collide with. The pipeline must surface exactly these pairs
      // (plus any organic collisions), and the oracle checks WHICH
      // pairs via the id checksum, not just how many.
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val base = docs
        .filter(octet_length(col("text").cast("binary")) >= 64)
      val off = docs.agg((max(col("doc_id")) + 1L).as("off"))
      val planted = base.filter(col("doc_id") % 50 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("off")).as("doc_id"),
          concat(lit("~"), expr("substr(text, 2)")).as("text"))
        // re-assert the stubPHashBands >= 64-byte contract: swapping a
        // multibyte first char for '~' can shrink the payload below it
        .filter(octet_length(col("text").cast("binary")) >= 64)
      val ds = base.unionByName(planted)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[(Long, Array[Byte])]
      // MATERIALIZED (r22): sigs is an OPAQUE kernel pass (Dataset.map
      // — no column pruning through it, guide §2.3) consumed four ways
      // (both sides of the band self-join + both sides of the verify
      // join); without the barrier each consumer re-ran the payload
      // decode + phash kernel — at 100 TB the §8 rule verbatim: decode
      // the heavy bytes once, shuffle only (id, 4×int) rows after.
      val sigs = ds.mapPartitions(_.map { case (id, bytes) =>
        val b = stubPHashBands(bytes)
        (id, b(0), b(1), b(2), b(3))
      }).toDF("doc_id", "b0", "b1", "b2", "b3")
        .materializeLazy
      val tabled = sigs.select(col("doc_id"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"), col(s"b$j").as("bv"))): _*)).as("e"))
        .select(col("doc_id"), col("e.j"), col("e.bv"))
      val candIds = tabled.as("a").join(tabled.as("b"),
          col("a.j") === col("b.j") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      def bxor(c: String) = bit_count(expr(s"int(a_$c) ^ int(b_$c)"))
      val scored = candIds
        .join(sigs.select(col("doc_id").as("id_a"), col("b0").as("a_b0"),
          col("b1").as("a_b1"), col("b2").as("a_b2"), col("b3").as("a_b3")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("b0").as("b_b0"),
          col("b1").as("b_b1"), col("b2").as("b_b2"), col("b3").as("b_b3")), "id_b")
        .withColumn("ham", bxor("b0") + bxor("b1") + bxor("b2") + bxor("b3"))
      val hist = scored.filter(col("ham") <= 6)
        .groupBy("ham")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a") * 100003L + col("id_b")).as("pair_chk"))
      // fixed 0..6 hamming axis: the report always has 7 rows (a small
      // corpus with zero near-dups is a VALID result, not an empty one)
      s.range(0, 7).select(col("id").cast("int").as("ham"))
        .join(broadcast(hist), Seq("ham"), "left")
        .select(col("ham"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("pair_chk"), lit(0L)).as("pair_chk"))
        .orderBy("ham")
    }),

    /** Scene-cut detection — the temporal-segmentation stage a video
      * training pipeline runs before clip extraction (shot-boundary
      * detection: PySceneDetect's content-detector shape): fan the
      * payload out to ordered frames (m03's deterministic 64-character
      * chunking standing in for decoded video), extract a small integer
      * feature vector per frame WHERE THE CODEC STUB SITS (here:
      * space/vowel census of the chunk — a real pipeline emits a frame
      * histogram or embedding from the decoder; the m02 discipline),
      * and declare a cut wherever the L1 distance to the previous frame
      * exceeds a threshold. Consecutive chunks of one document share
      * character statistics, so the corpus has true temporal coherence
      * and the cut rate lands at ~18%, not noise. Scene ids are the
      * inclusive running sum of cut flags — lag() and cumsum over
      * windows KEYED BY DOC (frame count per video bounds the
      * partition, never the corpus); scene assembly is one
      * hash-partitioned (doc, scene) aggregate; output is a per-source
      * scene-length profile. All-integer features and counts ⇒ the
      * whole segmentation replicates bit-for-bit in DuckDB. */
    "m10_scene_cuts" -> ((s, d) => {
      val C = 64; val T = 8
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("fidx")
      val frames = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), posexplode(expr(
          frameChunksSql("text", "length", C))))
        .select(col("source"), col("doc_id"),
          col("pos").cast("long").as("fidx"), col("col").as("f"))
      val scenes = frames
        .withColumn("sp", expr("length(f) - length(replace(f, ' ', ''))"))
        .withColumn("vw", expr("length(f) - length(replace(replace(" +
          "replace(f, 'a', ''), 'e', ''), 'o', ''))"))
        .withColumn("dist", abs(col("sp") - lag("sp", 1).over(wDoc)) +
          abs(col("vw") - lag("vw", 1).over(wDoc)))
        .withColumn("cut", when(col("dist") > T, 1L).otherwise(0L))
        .withColumn("scene_id", sum("cut").over(wDoc.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("source", "doc_id", "scene_id")
        .agg(count(lit(1)).as("n_f"))
      scenes.groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_scenes"),
          sum("n_f").as("n_frames"),
          max("n_f").as("max_scene_frames"))
        .withColumn("cuts_per_doc_e2",
          expr("((n_scenes - n_docs) * 100) div n_docs"))
        .withColumn("avg_scene_frames_e2",
          expr("(n_frames * 100) div n_scenes"))
        .orderBy("source")
    }),

    /** Interleaved multimodal document assembly — the MMC4 placement
      * stage (Zhu et al. 2023, arXiv:2304.06939): given a text corpus
      * and a pool of images, place each image at the most similar
      * text chunk of its document, at most one image per chunk — the
      * step that turns (docs, image pool) into interleaved
      * image-text pretraining records. The matching is GREEDY
      * BIPARTITE per document (MMC4 uses bipartite assignment on CLIP
      * scores): [[M11Rounds]] unrolled rounds, each round ONE
      * doc-keyed window picking the best still-free (image, chunk)
      * pair per doc (integer e6 score, (img, chunk) id tie-break)
      * followed by two anti-joins that retire the picked image and
      * chunk — the d21/s27 fixed-round discipline applied to
      * MATCHING, so the whole assignment hash-oracles.
      *
      * Scoring is the m08 stub discipline: the image side compresses
      * its 64-dim embedding to 16 integer block sums (e6-frozen), the
      * text side is a 16-letter census of the chunk (+1 smoothing so
      * no zero vector), similarity = e6-floored cosine of the two
      * integer vectors — a portable stand-in for CLIP image-text
      * scores; a real deployment swaps the two featurizers and
      * nothing about the matching machinery changes.
      *
      * Scale shape: pairs are per-doc bounded (images/doc × chunks/doc
      * — both capped by upstream sharding in a deployment), every
      * window is doc-keyed, the anti-joins are equi-keyed on
      * (doc, id), and rounds move assignment-sized frames only. The
      * published per-source table (placed/unplaced, round histogram,
      * exact score mass) is what a curation run reads to see whether
      * the pool actually interleaves or piles up unplaced. */
    "m11_interleave_match" -> ((s, d) => {
      import graft.operators.Materialize.MaterializeOps
      val W = org.apache.spark.sql.expressions.Window
      def xi6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)).cast("long")
      // image pool: every vector, routed to a doc by id (a deployment
      // has a real (doc, image) pairing table; the modulus keeps
      // images-per-doc bounded at every SF)
      val img16 = array((0 until 16).map(j =>
        (1 to 4).map(k => xi6(element_at(col("embedding"), 4 * j + k)
          .cast("double"))).reduce(_ + _).cast("double")): _*)
      val images = Tables.embeddings(s, d)
        .select(col("vec_id").as("img_id"),
          pmod(col("vec_id"), lit(200L)).as("doc_id"), img16.as("iv"))
      // text side: 16-token chunks of the 200 image-bearing docs,
      // 16-letter census vector (+1 smoothing — never a zero vector)
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("source"),
          filter(split(col("text"), " "), x => x =!= "").as("tk"))
        .materialize // consumed by chunks + both per-source censuses
      // empty-text guard (the t42 rule): sequence(0, -1) DESCENDS in
      // Spark while the oracle's range(0, 0) is empty — an unguarded
      // empty doc would emit two phantom chunks here and none there
      val chunks = docs
        .select(col("doc_id"), col("source"), posexplode(expr(
          """CASE WHEN size(tk) >= 1
            | THEN transform(sequence(0, CAST(ceil(size(tk) / 16.0) AS INT) - 1),
            |                i -> array_join(slice(tk, i * 16 + 1, 16), ' '))
            | ELSE CAST(array() AS array<string>) END""".stripMargin)))
        .select(col("doc_id"), col("source"), col("pos").as("cidx"),
          col("col").as("cs"))
        .withColumn("cv", array((0 until 16).map { j =>
          val ch = ('a' + j).toChar
          (length(col("cs")) -
            length(regexp_replace(col("cs"), ch.toString, "")) + lit(1))
            .cast("double")
        }: _*))
        .select("doc_id", "source", "cidx", "cv")
      val pairs = chunks
        .join(images, "doc_id")
        .withColumn("s6", floor(
          graft.functions.VectorExpressions.array_cosine(col("iv"), col("cv"))
            * lit(1e6) + lit(0.5)).cast("long"))
        .select("doc_id", "source", "img_id", "cidx", "s6")
      var free = pairs.materialize
      var assigned: DataFrame = null
      for (r <- 1 to M11Rounds) {
        val wD = W.partitionBy("doc_id")
          .orderBy(col("s6").desc, col("img_id"), col("cidx"))
        val pick = free.withColumn("rn", row_number().over(wD))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("source"), col("img_id"), col("cidx"),
            col("s6"), lit(r).as("rnd"))
          .materialize
        assigned = if (assigned == null) pick
                   else assigned.unionByName(pick)
        free = free
          .join(pick.select("doc_id", "img_id"), Seq("doc_id", "img_id"),
            "left_anti")
          .join(pick.select("doc_id", "cidx"), Seq("doc_id", "cidx"),
            "left_anti")
          .materialize
      }
      val imgCensus = images.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_imgs"))
      val chunkCensus = chunks.groupBy("source")
        .agg(count(lit(1)).as("n_chunks"))
      // per-round histogram columns generated from (1 to M11Rounds) on
      // BOTH sides (r18 advice: hardcoded placed_r1..r3 would silently
      // desync from a bumped round constant while still hash-matching)
      val placed = assigned.groupBy("source")
        .agg(count(lit(1)).as("n_placed"),
          (1 to M11Rounds).map(r =>
            sum(when(col("rnd") === r, 1L).otherwise(0L))
              .as(s"placed_r$r")) :+
            sum("s6").as("sum_score_e6"): _*)
      imgCensus
        .join(broadcast(chunkCensus), "source")
        .join(broadcast(placed), Seq("source"), "left")
        .select(Seq(col("source"), col("n_imgs"), col("n_chunks"),
          coalesce(col("n_placed"), lit(0L)).as("n_placed"),
          (col("n_imgs") - coalesce(col("n_placed"), lit(0L)))
            .as("n_unplaced")) ++
          (1 to M11Rounds).map(r =>
            coalesce(col(s"placed_r$r"), lit(0L)).as(s"placed_r$r")) :+
          coalesce(col("sum_score_e6"), lit(0L)).as("sum_score_e6"): _*)
        .orderBy("source")
    }),
  )

  /** m11 greedy-matching rounds (= max images placed per doc; chunks
    * cap it anyway at these doc lengths). Fixed so the oracle unrolls. */
  val M11Rounds = 3

  val oracleSql: Map[String, String] = Map(
    // m11: the full matching replica — image block sums, chunk letter
    // census, e6 cosine scores, and the unrolled greedy rounds
    // (generated by one loop with the Spark side's constant).
    "m11_interleave_match" -> {
      val rounds = (1 to M11Rounds).map { r =>
        val p = r - 1
        s"""a$r AS (SELECT doc_id, source, img_id, cidx, s6, $r AS rnd FROM (
           |   SELECT *, row_number() OVER (PARTITION BY doc_id
           |       ORDER BY s6 DESC, img_id, cidx) AS rn
           |   FROM p$p) WHERE rn = 1),
           | p$r AS (SELECT p.doc_id, p.source, p.img_id, p.cidx, p.s6
           |        FROM p$p p
           |        LEFT JOIN a$r x ON x.doc_id = p.doc_id
           |             AND x.img_id = p.img_id
           |        LEFT JOIN a$r y ON y.doc_id = p.doc_id
           |             AND y.cidx = p.cidx
           |        WHERE x.img_id IS NULL AND y.cidx IS NULL)""".stripMargin
      }
      val asgUnion = (1 to M11Rounds)
        .map(r => s"SELECT * FROM a$r").mkString(" UNION ALL ")
      s"""WITH iv AS (SELECT vec_id AS img_id, vec_id % 200 AS doc_id,
        |    list_transform(range(0, 16), j ->
        |      CAST(floor(CAST(embedding[CAST(4*j+1 AS INT)] AS DOUBLE)*1e6+0.5)
        |         + floor(CAST(embedding[CAST(4*j+2 AS INT)] AS DOUBLE)*1e6+0.5)
        |         + floor(CAST(embedding[CAST(4*j+3 AS INT)] AS DOUBLE)*1e6+0.5)
        |         + floor(CAST(embedding[CAST(4*j+4 AS INT)] AS DOUBLE)*1e6+0.5)
        |        AS DOUBLE)) AS img16
        |  FROM embeddings),
        | dt AS (SELECT doc_id, source,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM documents WHERE doc_id < 200),
        | ch AS (SELECT doc_id, source, CAST(i AS INT) AS cidx,
        |          array_to_string(tk[(CAST(i AS INT)*16+1):
        |            ((CAST(i AS INT)+1)*16)], ' ') AS cs
        |        FROM dt, unnest(range(0,
        |          CAST(ceil(len(tk) / 16.0) AS BIGINT))) AS u(i)),
        | cv AS (SELECT doc_id, source, cidx,
        |          list_transform(range(0, 16), j -> CAST(
        |            length(cs) - length(replace(cs, chr(CAST(97+j AS INT)), ''))
        |            + 1 AS DOUBLE)) AS cv16
        |        FROM ch),
        | p0 AS (SELECT cv.doc_id, cv.source, iv.img_id, cv.cidx,
        |          CAST(floor(list_cosine_similarity(iv.img16, cv.cv16)
        |            *1e6+0.5) AS BIGINT) AS s6
        |        FROM cv JOIN iv ON iv.doc_id = cv.doc_id),
        | ${rounds.mkString(",\n ")},
        | asg AS ($asgUnion),
        | ic AS (SELECT dt.source, count(*) AS n_imgs FROM iv
        |        JOIN dt ON dt.doc_id = iv.doc_id GROUP BY 1),
        | cc AS (SELECT source, count(*) AS n_chunks FROM ch GROUP BY 1),
        | pl AS (SELECT source, count(*) AS n_placed,
        |          ${(1 to M11Rounds).map(r =>
             s"CAST(sum(CASE WHEN rnd = $r THEN 1 ELSE 0 END) AS BIGINT)" +
               s" AS placed_r$r").mkString(",\n          ")},
        |          CAST(sum(s6) AS BIGINT) AS sum_score_e6
        |        FROM asg GROUP BY 1)
        |SELECT ic.source, ic.n_imgs, cc.n_chunks,
        | coalesce(pl.n_placed, 0) AS n_placed,
        | ic.n_imgs - coalesce(pl.n_placed, 0) AS n_unplaced,
        | ${(1 to M11Rounds).map(r =>
             s"coalesce(pl.placed_r$r, 0) AS placed_r$r")
             .mkString(",\n ")},
        | coalesce(pl.sum_score_e6, 0) AS sum_score_e6
        |FROM ic JOIN cc ON cc.source = ic.source
        |        LEFT JOIN pl ON pl.source = ic.source
        |ORDER BY ic.source""".stripMargin
    },

    // m09: full replica of the stub pHash + banding. Byte values come
    // from hex(encode(text)) pairs via strpos on a zero-less hex
    // alphabet (strpos returns 0 for '0', 1-15 for the rest — exactly
    // the nibble value); segment = i*64//n mirrors the stub's integer
    // boundary; the bit threshold is the same integer cross-product
    // (segSum*n > tot*segLen, no division on either engine); bands
    // re-pack with 1 << (seg % 16).
    "m09_phash_neardup" ->
      """WITH raw0 AS (
        |  SELECT doc_id, text FROM documents WHERE strlen(text) >= 64),
        | raw AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n FROM raw0
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |         hex(encode('~' || substr(text, 2))) AS hx,
        |         strlen('~' || substr(text, 2)) AS n
        |  FROM raw0 WHERE doc_id % 50 = 0
        |    AND octet_length(encode('~' || substr(text, 2))) >= 64),
        | bytes AS (
        |  SELECT doc_id, n, i,
        |    strpos('123456789ABCDEF', substr(hx, 2*i+1, 1))*16 +
        |    strpos('123456789ABCDEF', substr(hx, 2*i+2, 1)) AS v,
        |    (i*64)//n AS seg
        |  FROM (SELECT doc_id, hx, n, unnest(range(0, n)) AS i FROM raw)),
        | tot AS (SELECT doc_id, n, sum(v) AS tv FROM bytes GROUP BY doc_id, n),
        | segs AS (SELECT doc_id, seg, sum(v) AS sv, count(*) AS sl
        |          FROM bytes GROUP BY doc_id, seg),
        | bits AS (
        |  SELECT t.doc_id, s.seg,
        |    CASE WHEN s.sv * t.n > t.tv * s.sl THEN 1 ELSE 0 END AS bit
        |  FROM segs s JOIN tot t USING (doc_id)),
        | bands AS (
        |  SELECT doc_id, seg//16 AS j,
        |    CAST(sum(bit * (1 << (seg % 16))) AS BIGINT) AS bv
        |  FROM bits GROUP BY doc_id, seg//16),
        | pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id),
        | wide AS (
        |  SELECT doc_id,
        |    max(CASE WHEN j = 0 THEN bv END) AS b0,
        |    max(CASE WHEN j = 1 THEN bv END) AS b1,
        |    max(CASE WHEN j = 2 THEN bv END) AS b2,
        |    max(CASE WHEN j = 3 THEN bv END) AS b3
        |  FROM bands GROUP BY doc_id),
        | scored AS (
        |  SELECT p.id_a, p.id_b,
        |    bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1)) +
        |    bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS ham
        |  FROM pairs p JOIN wide wa ON wa.doc_id = p.id_a
        |               JOIN wide wb ON wb.doc_id = p.id_b),
        | hist AS (
        |  SELECT ham, count(*) AS n_pairs,
        |    CAST(sum(id_a*100003+id_b) AS BIGINT) AS pair_chk
        |  FROM scored WHERE ham <= 6 GROUP BY ham)
        |SELECT CAST(hx.h AS INTEGER) AS ham,
        |  CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(pair_chk, 0) AS BIGINT) AS pair_chk
        |FROM (SELECT unnest(range(0, 7)) AS h) hx
        |LEFT JOIN hist ON hist.ham = hx.h ORDER BY 1""".stripMargin,

    // m02: full replica of the stub decode. High-nibble byte histogram
    // via hex(encode(text)) with the first char of each hex pair kept;
    // f_b = count_b / greatest(1, byte length); L2 norm folds the 16
    // squares in ascending index order (matches the Spark aggregate's
    // left fold, 0.0 + f0² + f1² + …); per-doc norm frozen to ×1e6
    // BIGINT so the per-source sum compares exactly. avg_feat_norm
    // derives from that exact sum (two correctly-rounded divisions),
    // never from a summation-order-dependent double avg.
    "m02_decode_features" -> {
      val nib = raw"regexp_replace(hex(encode(text)), '(.).', '\1', 'g')"
      val digits = "0123456789ABCDEF"
      val fs = digits.zipWithIndex.map { case (c, i) =>
        s"(strlen(nib) - strlen(replace(nib, '$c', ''))) / CAST(n AS DOUBLE) AS f$i"
      }.mkString(",\n        |    ")
      val sq = (0 until 16).map(i => s"f$i*f$i").mkString(" + ")
      s"""WITH b AS (
        |  SELECT source,
        |    16 + (strlen(text) % 64) AS w,
        |    16 + (ascii(text) % 64) AS h,
        |    1 + (strlen(text) % 8) AS fr,
        |    greatest(1, strlen(text)) AS n,
        |    $nib AS nib
        |  FROM documents),
        | c AS (
        |  SELECT source, w, h, fr,
        |    $fs
        |  FROM b),
        | e AS (
        |  SELECT source, w, h, fr,
        |    CAST(floor(sqrt($sq)*1000000 + 0.5) AS BIGINT) AS fe6
        |  FROM c)
        |SELECT source, count(*) AS n_media,
        | floor(avg(w)*10000+0.5)/10000 AS avg_width,
        | floor(avg(h)*10000+0.5)/10000 AS avg_height,
        | floor(avg(fr)*10000+0.5)/10000 AS avg_frames,
        | CAST(sum(fe6) AS BIGINT) AS sum_feat_e6,
        | floor((CAST(sum(fe6) AS DOUBLE)/1000000.0/count(*))*10000+0.5)/10000
        |   AS avg_feat_norm
        |FROM e GROUP BY source ORDER BY source""".stripMargin
    },

    "m01_binary_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes, md5(text) AS content_md5,
        | ascii(text) AS first_code
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    // m04: replica of stubDecode's w/h derivation (16 + len%64,
    // 16 + first-code-point%64 — ascii() is the code point in both
    // engines, so no ASCII-corpus assumption) and of resizeFit's
    // integer box-fit arithmetic.
    "m04_resize" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    16 + (strlen(text) % 64) AS w,
        |    16 + (ascii(text) % 64) AS h
        |  FROM documents WHERE doc_id < 100),
        | r AS (
        |  SELECT source, w, h,
        |    CASE WHEN w >= h THEN 224 ELSE greatest(1, (w * 224) // h) END AS new_w,
        |    CASE WHEN w >= h THEN greatest(1, (h * 224) // w) ELSE 224 END AS new_h
        |  FROM m)
        |SELECT source, count(*) AS n_media,
        | CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(h) AS BIGINT) AS sum_h,
        | CAST(sum(new_w) AS BIGINT) AS sum_new_w,
        | CAST(sum(new_h) AS BIGINT) AS sum_new_h,
        | CAST(max(new_h) AS INTEGER) AS max_new_h
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // m06: the metadata sums replicate the stub's arithmetic (strlen =
    // BYTE length like content.length; ascii = first code point, the
    // m04 convention); the doubled-corpus columns are structurally 2×;
    // features_stable is the purity claim DuckDB states as ground
    // truth (see the query scaladoc).
    "m06_decode_stability" ->
      """WITH m AS (
        |  SELECT source,
        |    16 + (strlen(text) % 64) AS w,
        |    16 + (ascii(text) % 64) AS h,
        |    1 + (strlen(text) % 8) AS fr
        |  FROM documents WHERE doc_id < 300)
        |SELECT source, count(*) AS n_single,
        | CAST(2 * count(*) AS BIGINT) AS n_doubled,
        | CAST(sum(w) AS BIGINT) AS sum_w_single,
        | CAST(2 * sum(w) AS BIGINT) AS sum_w_doubled,
        | CAST(2 * sum(h) AS BIGINT) AS sum_h_doubled,
        | CAST(2 * sum(fr) AS BIGINT) AS sum_frames_doubled,
        | true AS features_stable
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // m05: byte length via octet_length(encode(...)) — the UTF-8 byte
    // count, matching Spark's octet_length on the binary cast with no
    // ASCII assumption; vector norm via list_inner_product (same
    // ascending accumulation as the native ArrayDot kernel).
    "m05_record_assembly" ->
      """SELECT e.label, count(*) AS n_records,
        | CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS sum_bytes,
        | floor((avg(d.n_chars))*10000+0.5)/10000 AS avg_chars,
        | floor((avg(sqrt(list_inner_product(e.embedding::DOUBLE[],
        |                                    e.embedding::DOUBLE[]))))*10000+0.5)/10000
        |   AS avg_vec_norm,
        | count(DISTINCT d.lang) AS n_langs
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY e.label ORDER BY e.label""".stripMargin,

    // m07: same chunk-replica convention as m03 — DuckDB substr is
    // character-based while Spark chunks the binary cast, equal
    // because the synthetic corpus is ASCII (the m03 oracle has relied
    // on this since round 3, green at all SFs; a multi-byte corpus
    // would need blob slicing on the DuckDB side).
    "m07_frame_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | pl AS (SELECT doc_id + 100000 AS doc_id, text FROM base
        |        WHERE doc_id < 40),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | f AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(CAST(floor((strlen(text)-1)/64) AS BIGINT) + 1, 1))) AS i,
        |    text
        |  FROM c),
        | h AS (SELECT doc_id,
        |         md5(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS fmd5
        |       FROM f),
        | g AS (SELECT fmd5, count(DISTINCT doc_id) AS df, count(*) AS n
        |       FROM h GROUP BY fmd5)
        |SELECT count(*) AS n_distinct_frames,
        | CAST(sum(n) AS BIGINT) AS n_frames,
        | CAST(sum(CASE WHEN df >= 2 THEN n ELSE 0 END) AS BIGINT)
        |   AS n_frames_in_crossdoc_dups,
        | CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_crossdoc_frame_hashes,
        | CAST(max(df) AS BIGINT) AS max_doc_spread
        |FROM g""".stripMargin,

    "m03_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(CAST(floor((strlen(text)-1)/64) AS BIGINT) + 1, 1))) AS frame_idx,
        |    text
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, frame_idx,
        | CAST(strlen(substr(text, CAST(frame_idx*64+1 AS BIGINT), 64)) AS INTEGER) AS frame_bytes,
        | md5(substr(text, CAST(frame_idx*64+1 AS BIGINT), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // m08: full replica — same rnd6 class prototypes (the s04 centroid
    // recipe), same rnd6 score, same e6-frozen per-row sum.
    "m08_pair_filter" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | p AS (
        |  SELECT e.label, octet_length(encode(d.text)) AS n_bytes,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM documents d
        |  JOIN e ON d.doc_id = e.vec_id
        |  JOIN cen ON cen.cl_id = e.label)
        |SELECT label, count(*) AS n_pairs,
        | CAST(sum(CASE WHEN c6 >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | floor((CAST(sum(CASE WHEN c6 >= 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*))*10000+0.5)/10000 AS retention,
        | CAST(sum(CASE WHEN c6 >= 0.1 THEN n_bytes ELSE 0 END) AS BIGINT)
        |   AS kept_bytes,
        | CAST(sum(CAST(floor(c6*1000000+0.5) AS BIGINT)) AS BIGINT)
        |   AS sum_score_e6
        |FROM p GROUP BY label ORDER BY label""".stripMargin,

    // m10: character-domain frame chunking (length/substring count
    // CODE POINTS on both engines — not strlen), integer feature
    // census, same lag + inclusive-cumsum segmentation.
    "m10_scene_cuts" ->
      """WITH fr AS (
        |  SELECT source, doc_id,
        |    unnest(range(0, greatest(CAST(floor((length(text)-1)/64) AS BIGINT) + 1, 1))) AS fidx,
        |    text
        |  FROM documents),
        | f2 AS (
        |  SELECT source, doc_id, fidx,
        |    substring(text, CAST(fidx*64+1 AS BIGINT), 64) AS f
        |  FROM fr),
        | ft AS (
        |  SELECT source, doc_id, fidx,
        |    length(f) - length(replace(f, ' ', '')) AS sp,
        |    length(f) - length(replace(replace(replace(f, 'a', ''),
        |      'e', ''), 'o', '')) AS vw
        |  FROM f2),
        | lg AS (
        |  SELECT *, abs(sp - lag(sp, 1) OVER w) + abs(vw - lag(vw, 1) OVER w)
        |      AS dist
        |  FROM ft WINDOW w AS (PARTITION BY doc_id ORDER BY fidx)),
        | ct AS (
        |  SELECT *, CASE WHEN dist > 8 THEN 1 ELSE 0 END AS cut FROM lg),
        | sc AS (
        |  SELECT *, sum(cut) OVER (PARTITION BY doc_id ORDER BY fidx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
        |  FROM ct),
        | scenes AS (
        |  SELECT source, doc_id, scene_id, count(*) AS n_f
        |  FROM sc GROUP BY 1, 2, 3)
        |SELECT source,
        |  count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_scenes,
        |  CAST(sum(n_f) AS BIGINT) AS n_frames,
        |  CAST(max(n_f) AS BIGINT) AS max_scene_frames,
        |  ((count(*) - count(DISTINCT doc_id)) * 100) // count(DISTINCT doc_id)
        |    AS cuts_per_doc_e2,
        |  (CAST(sum(n_f) AS BIGINT) * 100) // count(*) AS avg_scene_frames_e2
        |FROM scenes GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
