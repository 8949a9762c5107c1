package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Queries q61-q72: corpus curation and profiling — the remaining
  * operations a large-scale training-data pipeline runs besides dedup and
  * similarity search (no reference counterpart — matdb has no text or
  * profiling operators): deterministic sampling/splits, sessionization,
  * text scrubbing, repetition quality signals, per-source caps, exact
  * correlation profiling, histograms, TF-IDF term weighting, test-set
  * decontamination, passage-level dedup, Zipf token profiling, and
  * embedding-column profiling.
  *
  * Every query follows the cross-engine determinism rules in [[Q]]; the
  * hash-based ones reuse the 56-bit md5 hash trick from [[Pipeline]] so the
  * DuckDB oracle replays them bit-identically.
  */
object Curation {

  /** 56-bit md5-based hash — Spark side (same as Pipeline.h56). */
  private def h56(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")
  private def h56Sql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 14))::BIGINT)"

  /** doc_id + exploded 10-token passages of lower(text) — q70's split,
    * shared with [[graft.tools.PipelineScaleProbe]] so the probe measures
    * exactly the battery's construction. */
  def passageChunks(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, (size(ws)+9) div 10 - 1)," +
          " c -> array_join(slice(ws, c*10+1, 10), ' '))")).as("chunk"))

  /** Session gap: 30 minutes in MICROseconds. events.ts is nanosecond
    * parquet, but DuckDB (1.0) truncates it to µs TIMESTAMP on read, so the
    * finest cross-engine grain is truncated microseconds: Spark replays the
    * truncation with `ts div 1000` (ts is positive — floor = truncate). */
  private val SessionGapUs = 1800000000L

  val entries: Seq[Entry] = Seq(

    // ---- deterministic stratified sampling ------------------------------
    // Train/eval splits and per-source downsampling must be reproducible
    // across runs and engines, so the sample decision is a pure function
    // of the row key: 56-bit md5 hash mod 10 under a per-source rate.
    // Embarrassingly parallel — a filter over the scan, no shuffle, and at
    // 100 TB the same predicate IS the sample (no reservoir state).
    Entry("q61_sample_hash", Some(
      s"""SELECT doc_id, source, ${h56Sql("CAST(doc_id AS VARCHAR)")} % 10 AS sample_bucket
         |FROM documents
         |WHERE ${h56Sql("CAST(doc_id AS VARCHAR)")} % 10 <
         |      CASE WHEN source IN ('src0', 'src1', 'src2') THEN 5 ELSE 1 END
         |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val bucket = h56(col("doc_id").cast("string")) % 10
      table(s, d, "documents")
        .select(col("doc_id"), col("source"), bucket.as("sample_bucket"))
        .where(col("sample_bucket") <
          when(col("source").isin("src0", "src1", "src2"), 5).otherwise(1))
        .orderBy(col("doc_id"))
    },

    // ---- sessionization --------------------------------------------------
    // Gap-based sessions (new session when >30 min since the user's last
    // event): the lag-flag + running-sum idiom. Both window passes
    // partition by user_id — one shuffle on user_id total, no global sort;
    // the per-user partitions are the unit of parallelism at any scale.
    Entry("q62_sessionize", Some(
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) tu FROM events),
         |m AS (SELECT user_id, tu,
         |             CASE WHEN lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) IS NULL
         |                    OR tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) > $SessionGapUs
         |                  THEN 1 ELSE 0 END is_new
         |      FROM e),
         |s AS (SELECT user_id, tu,
         |             sum(is_new) OVER (PARTITION BY user_id ORDER BY tu
         |                               ROWS UNBOUNDED PRECEDING) sid
         |      FROM m)
         |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         |       count(*) AS n_events, min(tu) AS start_us, max(tu) AS end_us,
         |       max(tu) - min(tu) AS span_us
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_id""".stripMargin)) { (s, d) =>
      val tus = expr("ts div 1000")
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), tus.as("tu"))
        .withColumn("is_new",
          when(lag(col("tu"), 1).over(byTs).isNull ||
            col("tu") - lag(col("tu"), 1).over(byTs) > SessionGapUs, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("tu")).as("start_us"),
          max(col("tu")).as("end_us"), (max(col("tu")) - min(col("tu"))).as("span_us"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // ---- text scrubbing (PII-redaction machinery) ------------------------
    // Regex term scrubbing with hit accounting — the exact shape of a PII
    // pass (emails/phones/ids swap in as patterns; this corpus is synthetic
    // word-salad, so the demo list is two plain terms). Pure per-row map.
    Entry("q63_redact_terms", Some(
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\b(customer|value)\b')) AS BIGINT) AS n_hits,
        |       md5(regexp_replace(text, '\b(customer|value)\b', '[X]', 'g')) AS clean_fp
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, d) =>
      table(s, d, "documents").select(
        col("doc_id"),
        regexp_count(col("text"), lit("\\b(customer|value)\\b")).cast("long").as("n_hits"),
        md5(regexp_replace(col("text"), "\\b(customer|value)\\b", "[X]")).as("clean_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- repetition / diversity quality signal ---------------------------
    // Gopher-style repetition filters: distinct-token ratio and the mass of
    // the single most frequent token. Token counts need one shuffle on
    // (doc_id, token); everything after is per-doc.
    Entry("q64_repetition_profile", Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) w
        |             FROM documents),
        |cnt AS (SELECT doc_id, w, count(*) c FROM tok GROUP BY doc_id, w)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct, max(c) AS top_n,
        |       CAST(max(c) AS DOUBLE) / sum(c) AS top_frac,
        |       CAST(count(*) AS DOUBLE) / sum(c) AS distinct_ratio
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_n"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_n"),
          (col("top_n").cast("double") / col("n_tokens")).as("top_frac"),
          (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- per-source caps (corpus balancing) ------------------------------
    // Domain/source quotas: keep each source's 5 largest docs. The grouped
    // top-k shape again (cf. q58's O(k) UDAF — here the window form, whose
    // per-group sort is the point: rank WITHIN source).
    Entry("q65_source_cap", Some(
      """SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) rn
        |  FROM documents) t
        |WHERE rn <= 5 ORDER BY source, rn""".stripMargin)) { (s, d) =>
      table(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
        .where(col("rn") <= 5)
        .orderBy(col("source"), col("rn"))
    },

    // ---- exact correlation profiling -------------------------------------
    // Pearson correlation from exact INTEGER power sums (built-in corr()
    // streams doubles in partition order — nondeterministic across engines).
    // Inputs are scaled to cents/hundredths as BIGINT (correlation is
    // scale-invariant, so the ×100 cancels); every aggregate is exact
    // integer arithmetic, and every value cast to DOUBLE is integer-valued —
    // the one conversion both engines round identically. (A DECIMAL(38,4)
    // power sum would be exact too, but its →DOUBLE cast divides by 10^4
    // AFTER rounding the mantissa in DuckDB and BEFORE in Spark: a 1-ULP
    // hash mismatch, observed at sf0.001.) One hash aggregate.
    Entry("q66_corr_exact", Some(
      """SELECT l_returnflag, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
        |       CAST(sx AS DOUBLE) / 100.0 / n AS avg_qty,
        |       CAST(sy AS DOUBLE) / 100.0 / n AS avg_price
        |FROM (SELECT l_returnflag, count(*) n,
        |             CAST(sum(qx) AS BIGINT) sx, CAST(sum(qy) AS BIGINT) sy,
        |             sum(CAST(qx AS HUGEINT) * qx) sxx,
        |             sum(CAST(qy AS HUGEINT) * qy) syy,
        |             sum(CAST(qx AS HUGEINT) * qy) sxy
        |      FROM (SELECT l_returnflag,
        |                   CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) qx,
        |                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) qy
        |            FROM lineitem) r
        |      GROUP BY l_returnflag) t
        |ORDER BY l_returnflag""".stripMargin)) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val qx = (dec2(col("l_quantity")) * 100).cast("long")
      val qy = (dec2(col("l_extendedprice")) * 100).cast("long")
      val d38 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val n = col("n").cast("double")
      table(s, d, "lineitem")
        .select(col("l_returnflag"), qx.as("qx"), qy.as("qy"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("qx")).cast("long").as("sx"), sum(col("qy")).cast("long").as("sy"),
          sum(d38(col("qx")) * d38(col("qx"))).as("sxx"),
          sum(d38(col("qy")) * d38(col("qy"))).as("syy"),
          sum(d38(col("qx")) * d38(col("qy"))).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((n * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((n * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")) *
              (n * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double"))))
            .as("corr_qty_price"),
          (col("sx").cast("double") / 100.0 / col("n")).as("avg_qty"),
          (col("sy").cast("double") / 100.0 / col("n")).as("avg_price"))
        .orderBy(col("l_returnflag"))
    },

    // ---- fixed-width histogram -------------------------------------------
    // Value-distribution profiling: bucket = floor(value / width). The
    // bucketing is a per-row map into a small-cardinality hash aggregate —
    // the profile of a 100 TB column costs one scan.
    Entry("q67_histogram", Some(
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n,
        |       min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin)) { (s, d) =>
      table(s, d, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    },

    // ---- TF-IDF term weighting --------------------------------------------
    // Top-3 characteristic terms per document, scored tf·N/df (the idf is
    // kept rational — log() is libm-dependent and monotone, so rankings are
    // identical). tf and df are two hash aggregates over the token explode;
    // the corpus size N rides in as a broadcast 1-row cross join, never a
    // driver-side constant.
    Entry("q68_tfidf_topterms", Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) w
        |             FROM documents),
        |tf AS (SELECT doc_id, w, count(*) tf FROM tok GROUP BY doc_id, w),
        |df AS (SELECT w, count(DISTINCT doc_id) dfw FROM tok GROUP BY w),
        |n AS (SELECT count(*) nd FROM documents),
        |scored AS (SELECT doc_id, w, CAST(tf * nd AS DOUBLE) / dfw AS score
        |           FROM tf JOIN df USING (w) CROSS JOIN n)
        |SELECT doc_id, w AS term, score, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, w, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) rn
        |  FROM scored) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin)) { (s, d) =>
      val tok = table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      // tf has exactly one row per (doc, term), so df(w) is a plain count
      // of tf rows per term — computed as a window over tf instead of a
      // second aggregate + join: the corpus is tokenized and shuffled ONCE
      // (a separate df branch can't share the tf subtree — column pruning
      // specializes the two aggregates so the exchange is not reused — and
      // so would re-tokenize everything; measured at sf0.1, and the gap
      // only widens with corpus size)
      val dfw = Window.partitionBy(col("w"))
      val nd = table(s, d, "documents").agg(count(lit(1)).as("nd"))
      tf.withColumn("dfw", count(lit(1)).over(dfw)).crossJoin(broadcast(nd))
        .select(col("doc_id"), col("w"),
          ((col("tf") * col("nd")).cast("double") / col("dfw")).as("score"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("w"))).cast("long"))
        .where(col("rn") <= 3)
        .select(col("doc_id"), col("w").as("term"), col("score"), col("rn"))
        .orderBy(col("doc_id"), col("rn"))
    },

    // ---- test-set decontamination -----------------------------------------
    // Benchmark contamination check: which train docs share 3-gram shingles
    // with the (deterministic, hash-split) eval set? Same hashed inverted
    // index + hot-shingle df-cap as q46 (one stop-shingle must not fan out
    // train×eval). The join is left UNHINTED: here the eval side is a 10%
    // hash slice of the corpus itself (so it grows with the corpus and must
    // be allowed to shuffle on g), and the planner broadcasts it at small
    // scale on its own. A real pipeline whose contaminant reference is a
    // small fixed benchmark suite adds broadcast() and gets the map-side
    // probe shape.
    Entry("q69_decontaminate", Some(
      s"""WITH ${Pipeline.shinglesSql},
         |exh AS (SELECT doc_id, ${h56Sql("g")} AS g FROM ex),
         |dfc AS (SELECT g, count(*) dfx FROM exh GROUP BY g),
         |hot AS (SELECT g FROM dfc WHERE dfx > 100),
         |exc AS (SELECT e.doc_id, e.g FROM exh e ANTI JOIN hot h ON e.g = h.g),
         |tr AS (SELECT * FROM exc WHERE ${h56Sql("CAST(doc_id AS VARCHAR)")} % 10 != 9),
         |ev AS (SELECT * FROM exc WHERE ${h56Sql("CAST(doc_id AS VARCHAR)")} % 10 = 9),
         |j AS (SELECT t.doc_id tid, e.doc_id eid, t.g FROM tr t JOIN ev e ON t.g = e.g)
         |SELECT tid AS doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared,
         |       CAST(count(DISTINCT eid) AS BIGINT) AS n_eval_docs
         |FROM j GROUP BY tid
         |HAVING count(DISTINCT g) >= 3 ORDER BY doc_id""".stripMargin)) { (s, d) =>
      graft.functions.TextOps.register(s)
      val exh = graft.operators.NearDup.shingles(table(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), graft.functions.TextOps.h56Col(col("g")).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exc = exh.join(broadcast(graft.operators.NearDup.hotShingles(exh, 100)),
        Seq("g"), "left_anti")
      val bucket = h56(col("doc_id").cast("string")) % 10
      val tr = exc.where(bucket =!= 9)
      val ev = exc.where(bucket === 9)
      tr.as("t").join(ev.as("e"), col("t.g") === col("e.g"))
        .select(col("t.doc_id").as("doc_id"), col("e.doc_id").as("eid"), col("t.g").as("g"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_shared"),
          countDistinct(col("eid")).as("n_eval_docs"))
        .where(col("n_shared") >= 3)
        .orderBy(col("doc_id"))
    },

    // ---- passage-level dedup ----------------------------------------------
    // Sub-document dedup: split each doc into fixed 10-token passages, hash
    // them, and score each doc by the fraction of its passages that occur
    // more than once corpus-wide (boilerplate/template detection). The
    // passage split is a per-row map; the only shuffle is the hash-groupBy
    // on the 8-byte passage hash — exact dedup's shape, one level down.
    Entry("q70_passage_dedup", Some(
      s"""WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') ws FROM documents),
         |ch AS (SELECT doc_id, unnest(list_transform(range(0, (len(ws)+9)//10),
         |               c -> array_to_string(ws[c*10+1 : c*10+10], ' '))) chunk
         |       FROM tok),
         |chh AS (SELECT doc_id, ${h56Sql("chunk")} AS h FROM ch),
         |cnt AS (SELECT h, count(*) n FROM chh GROUP BY h)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
         |FROM chh JOIN cnt USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val chh = passageChunks(table(s, d, "documents"))
        .select(col("doc_id"), h56(col("chunk")).as("h"))
      val cnt = chh.groupBy(col("h")).agg(count(lit(1)).as("n"))
      chh.join(cnt, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_frac"))
        .orderBy(col("doc_id"))
    },

    // ---- Zipf / token-frequency profile ------------------------------------
    // Corpus vocabulary profile: the 100 most frequent tokens with their
    // corpus share and cumulative share. groupBy(token) is vocabulary-sized;
    // the top-100 is a distributed TakeOrdered (each partition keeps 100),
    // and only then does a 100-row window compute ranks and running share —
    // no global sort of the vocabulary at any scale.
    Entry("q71_zipf_profile", Some(
      """WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\s+')) w FROM documents),
        |cnt AS (SELECT w, count(*) c FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) t FROM cnt),
        |top AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) rk
        |        FROM cnt QUALIFY rk <= 100)
        |SELECT CAST(rk AS BIGINT) AS rk, w AS token, c AS n,
        |       CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS share,
        |       CAST(sum(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |         / CAST(t AS DOUBLE) AS cum_share
        |FROM top CROSS JOIN tot ORDER BY rk""".stripMargin)) { (s, d) =>
      val cnt = table(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum(col("c")).cast("long").as("t"))
      val byFreq = Window.orderBy(col("c").desc, col("w"))
      val running = byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnt.orderBy(col("c").desc, col("w")).limit(100)
        .crossJoin(broadcast(tot))
        .withColumn("rk", row_number().over(byFreq).cast("long"))
        .withColumn("share", col("c").cast("double") / col("t").cast("double"))
        .withColumn("cum_share",
          sum(col("c")).over(running).cast("double") / col("t").cast("double"))
        .select(col("rk"), col("w").as("token"), col("c").as("n"),
          col("share"), col("cum_share"))
        .orderBy(col("rk"))
    },

    // ---- embedding-column profile ------------------------------------------
    // Per-label centroid norm over the embedding column — drift/quality
    // profiling for vector corpora. Doubles can't be summed cross-engine
    // (order-dependent), so components are quantized to 2^-26 fixed point
    // (floor is engine-identical) and every aggregate is exact int64
    // arithmetic. The round-4 formulation overflowed int64 at ~8.4M
    // vectors/label; the obvious HUGEINT/DECIMAL(38,0) repair is NOT safe
    // either — DuckDB's int128→double cast double-rounds (converts the two
    // 64-bit halves separately, then re-rounds their sum; observed 1-ULP
    // off the correctly-rounded value Spark's BigDecimal produces). So no
    // integer wider than int64 may ever cross to double. Instead each
    // per-(label, i) component sum is limb-split sq = a·2^26 + b (the a
    // extraction goes through a double floor-divide, exact while |sq| < 2^53
    // — i.e. up to 2^27 ≈ 134M vectors per label, the documented headroom),
    // and the label aggregate keeps three int64 power sums
    // ss = S2·2^52 + S1·2^27 + S0 (S2=Σa², S1=Σab, S0=Σb², all within
    // int64 at that headroom). The norm recombines them in a fixed,
    // parenthesized IEEE evaluation order — int64→double casts and IEEE
    // ops are engine-identical, so the result is deterministic across
    // engines by construction (and ≤1 ULP from the exact value). Shape:
    // posexplode → one (label, pos) hash aggregate → one label-sized
    // aggregate; linear in corpus size, 64·L intermediate rows.
    Entry("q72_embed_profile", Some(
      """WITH ex AS (SELECT label, unnest(embedding) v,
        |                  unnest(range(1, len(embedding)+1)) i
        |            FROM embeddings),
        |q AS (SELECT label, i,
        |             CAST(floor(CAST(v AS DOUBLE) * 67108864.0) AS BIGINT) qv
        |      FROM ex),
        |s AS (SELECT label, i, CAST(sum(qv) AS BIGINT) sq, count(*) n
        |      FROM q GROUP BY label, i),
        |ab AS (SELECT label, CAST(floor(CAST(sq AS DOUBLE) / 67108864.0) AS BIGINT) a,
        |              sq, n FROM s),
        |ab2 AS (SELECT label, a, sq - a * 67108864 AS b, n FROM ab),
        |agg AS (SELECT label, CAST(sum(a*a) AS BIGINT) s2, CAST(sum(a*b) AS BIGINT) s1,
        |               CAST(sum(b*b) AS BIGINT) s0, max(n) nv
        |        FROM ab2 GROUP BY label)
        |SELECT label, nv AS n_vecs,
        |       sqrt((CAST(s2 AS DOUBLE) * 4503599627370496.0 + CAST(s1 AS DOUBLE) * 134217728.0) + CAST(s0 AS DOUBLE))
        |       / (CAST(nv AS DOUBLE) * 67108864.0) AS centroid_norm
        |FROM agg ORDER BY label""".stripMargin)) { (s, d) =>
      val q = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .toDF("label", "p", "v")
        .select(col("label"), (col("p") + 1).as("i"),
          floor(col("v").cast("double") * lit(67108864.0)).cast("long").as("qv"))
      q.groupBy(col("label"), col("i"))
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("n"))
        .select(col("label"),
          floor(col("sq").cast("double") / lit(67108864.0)).cast("long").as("a"),
          col("sq"), col("n"))
        .withColumn("b", col("sq") - col("a") * lit(67108864L))
        .groupBy(col("label"))
        .agg(sum(col("a") * col("a")).as("s2"), sum(col("a") * col("b")).as("s1"),
          sum(col("b") * col("b")).as("s0"), max(col("n")).as("nv"))
        .select(col("label"), col("nv").as("n_vecs"),
          (sqrt((col("s2").cast("double") * lit(4503599627370496.0) +
            col("s1").cast("double") * lit(134217728.0)) + col("s0").cast("double")) /
            (col("nv").cast("double") * lit(67108864.0))).as("centroid_norm"))
        .orderBy(col("label"))
    },

    // ---- sequence packing (concat-and-cut) ---------------------------------
    // THE pretraining batch-prep op: concatenate the corpus in a canonical
    // order and cut it into fixed context-length sequences; a document
    // spanning a boundary contributes to both neighbors. Output = one row
    // per (sequence, document) span with the token count contributed.
    // Scale shape: the global running token offset comes from
    // operators.PrefixSum (range partition + per-partition windows +
    // broadcast offsets), NOT a single-partition window — the one
    // formulation of "cumulative sum" that survives 100 TB. Everything
    // after the offset is a per-row map + bounded explode.
    Entry("q79_sequence_packing", Some(
      """WITH tok AS (SELECT doc_id,
        |                    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) n
        |             FROM documents),
        |c AS (SELECT doc_id, n,
        |             CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
        |      FROM tok),
        |sp AS (SELECT doc_id, n, cum - n AS lo, cum,
        |              (cum - n) // 512 AS k0, (cum - 1) // 512 AS k1
        |       FROM c),
        |x AS (SELECT doc_id, lo, cum, unnest(range(k0, k1 + 1)) AS seq_id FROM sp)
        |SELECT seq_id, doc_id,
        |       least(cum, (seq_id + 1) * 512) - greatest(lo, seq_id * 512) AS tok_in_seq
        |FROM x ORDER BY seq_id, doc_id""".stripMargin)) { (s, d) =>
      import graft.operators.PrefixSum
      val tok = table(s, d, "documents")
        .select(col("doc_id"),
          size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      PrefixSum.runningTotal(tok, "doc_id", "n")
        .select(col("doc_id"), col("cum"), (col("cum") - col("n")).as("lo"))
        .withColumn("seq_id",
          explode(sequence(expr("lo div 512"), expr("(cum - 1) div 512"))))
        .select(col("seq_id"), col("doc_id"),
          (least(col("cum"), (col("seq_id") + 1) * 512) -
            greatest(col("lo"), col("seq_id") * 512)).as("tok_in_seq"))
        .orderBy(col("seq_id"), col("doc_id"))
    },

    // ---- sliding-window chunking (overlap) ---------------------------------
    // RAG/long-doc prep: split each document into W=64-token chunks with
    // stride S=48 (16-token overlap); the last chunk clamps to the end.
    // Pure per-document map + bounded explode — no shuffle at all; chunk
    // text is fingerprinted (md5) so the gate compares content without
    // hauling the full chunk bodies through the hash compare.
    Entry("q80_chunk_overlap", Some(
      """WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') toks
        |             FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) n FROM tok),
        |k AS (SELECT doc_id, toks, n,
        |             CASE WHEN n <= 64 THEN CAST(0 AS BIGINT)
        |                  ELSE (n - 64 + 47) // 48 END AS kmax
        |      FROM n),
        |x AS (SELECT doc_id, toks, n, unnest(range(0, kmax + 1)) AS chunk_idx FROM k),
        |sp AS (SELECT doc_id, chunk_idx, toks,
        |              chunk_idx * 48 AS tok_start,
        |              least(chunk_idx * 48 + 64, n) AS tok_end
        |       FROM x)
        |SELECT doc_id, chunk_idx, tok_start, tok_end,
        |       md5(array_to_string(list_slice(toks, tok_start + 1, tok_end), ' ')) AS chunk_fp
        |FROM sp ORDER BY doc_id, chunk_idx""".stripMargin)) { (s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("chunk_idx", explode(sequence(lit(0L),
          when(col("n") <= 64, lit(0L))
            .otherwise(expr("(n - 64 + 47) div 48")))))
        .withColumn("tok_start", col("chunk_idx") * 48)
        .withColumn("tok_end", least(col("chunk_idx") * 48 + 64, col("n")))
        .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_end"),
          md5(concat_ws(" ", expr("slice(toks, cast(tok_start + 1 as int), cast(tok_end - tok_start as int))")))
            .as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- deterministic epoch shuffle (training order) -------------------
    // Materializing a shuffled training epoch: every row gets a global
    // position under a seed-keyed pseudo-random permutation, then a batch
    // id and within-batch slot. The permutation key is (h56(seed:doc_id),
    // doc_id) — the doc_id tiebreak keeps the order total even when the
    // 56-bit hash collides (guaranteed somewhere at 10^11 rows), so the
    // epoch is reproducible across runs, engines, AND cluster sizes.
    // Global positions come from operators.PrefixSum over n=1 (range
    // partition + per-partition windows — no SinglePartition row_number);
    // the composite key is one fixed-width string so the range partitioner
    // and the oracle's ORDER BY (hk, doc_id) agree bit-for-bit.
    Entry("q81_epoch_shuffle", Some(
      s"""WITH h AS (SELECT doc_id, ${h56Sql("'ep7:' || CAST(doc_id AS VARCHAR)")} AS hk
         |           FROM documents),
         |r AS (SELECT doc_id,
         |             CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT) AS pos
         |      FROM h)
         |SELECT doc_id, pos, (pos - 1) // 256 AS batch_id, (pos - 1) % 256 AS slot
         |FROM r ORDER BY pos""".stripMargin)) { (s, d) =>
      val keyed = table(s, d, "documents")
        .select(col("doc_id"),
          h56(concat(lit("ep7:"), col("doc_id").cast("string"))).as("hk"),
          lit(1L).as("one"))
        .withColumn("_ok", concat(
          lpad(hex(col("hk")), 14, "0"),
          lpad(col("doc_id").cast("string"), 19, "0")))
      graft.operators.PrefixSum.runningTotal(keyed, "_ok", "one", "pos")
        .select(col("doc_id"), col("pos"),
          expr("(pos - 1) div 256").as("batch_id"),
          ((col("pos") - 1) % 256).as("slot"))
        .orderBy(col("pos"))
    },

    // ---- novelty filter (incremental-ingest dedup, batch form) ----------
    // The dedup-against-corpus join of streaming.Streams.noveltyFilter:
    // docs with doc_id % 5 = 0 play the incoming micro-batch, the rest the
    // committed corpus; survivors are incoming docs whose fingerprint no
    // history doc has. The operator keeps the corpus side un-shuffled
    // (both joins broadcast the batch-derived side — StreamingSpec pins
    // the plan); the oracle is NOT EXISTS, the SQL spelling of LEFT ANTI.
    Entry("q82_novelty_filter", Some(
      s"""WITH fp AS (SELECT doc_id, ${h56Sql("text")} AS fp FROM documents),
         |hist AS (SELECT fp FROM fp WHERE doc_id % 5 <> 0),
         |inc AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0)
         |SELECT doc_id, fp FROM inc
         |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = inc.fp)
         |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val docs = table(s, d, "documents").select(col("doc_id"), h56(col("text")).as("fp"))
      val hist = docs.where(col("doc_id") % 5 =!= 0).select(col("fp"))
      val inc = docs.where(col("doc_id") % 5 === 0)
      graft.streaming.Streams.noveltyFilter(inc, hist, "fp").orderBy(col("doc_id"))
    },

    // ---- corpus-trained unigram LM quality score ----------------------
    // CCNet-style language-model filtering: train unigram statistics on
    // the corpus itself, score every document by mean token surprisal,
    // rank/filter on the score. Surprisal is the INTEGER log2 bucket
    // ⌊log2 N⌋−⌊log2 c⌋ computed exactly as length(bin(N))−length(bin(c))
    // — float ln() is libm-dependent and never crosses engines (see Q
    // scaladoc); the integer bucket ranks documents the same way and is
    // bit-identical everywhere. Two token-level shuffles total (count
    // aggregate + dictionary join), same shape as q68's TF-IDF — no
    // per-doc loops, no driver state.
    Entry("q85_unigram_surprisal", Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) w
        |             FROM documents),
        |cnt AS (SELECT w, count(*) c FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) t FROM cnt),
        |sur AS (SELECT w, CAST(length(bin(t)) - length(bin(c)) AS BIGINT) s
        |        FROM cnt CROSS JOIN tot),
        |doc AS (SELECT t.doc_id, CAST(sum(s.s) AS BIGINT) AS sum_surprisal,
        |               count(*) AS n_tokens
        |        FROM tok t JOIN sur s ON t.w = s.w GROUP BY t.doc_id)
        |SELECT doc_id, sum_surprisal, n_tokens,
        |       CAST(sum_surprisal AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |         AS mean_surprisal
        |FROM doc ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val tok = table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      val cnt = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum(col("c")).cast("long").as("t"))
      val sur = cnt.crossJoin(broadcast(tot))
        .select(col("w"),
          (length(bin(col("t"))) - length(bin(col("c")))).cast("long").as("s"))
      tok.join(sur, Seq("w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("s")).cast("long").as("sum_surprisal"),
          count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("sum_surprisal"), col("n_tokens"),
          (col("sum_surprisal").cast("double") / col("n_tokens").cast("double"))
            .as("mean_surprisal"))
        .orderBy(col("doc_id"))
    },

    // ---- embedding outliers: distance to own label's centroid ---------
    // Curation classic: rank every vector by its distance to its label
    // centroid — far-from-centroid rows are mislabeled/noisy candidates
    // for removal. Exact cross-engine: dist² = (1/n²)·Σᵢ(n·qxᵢ − Sᵢ)²
    // over 2^-26 fixed-point components, the square summed in three int64
    // limb power-sums (q72's scheme — headroom ~134M vectors/label) and
    // recombined in one fixed IEEE order. Two shuffles (per-(label,i)
    // centroid aggregate + the join back); the per-label rank window is
    // the only per-label colocation.
    Entry("q86_embed_outliers", Some(
      """WITH ex AS (SELECT vec_id, label, unnest(embedding) v,
        |                  unnest(range(1, len(embedding)+1)) i
        |            FROM embeddings),
        |q AS (SELECT vec_id, label, i,
        |             CAST(floor(CAST(v AS DOUBLE) * 67108864.0) AS BIGINT) qx
        |      FROM ex),
        |s AS (SELECT label, i, CAST(sum(qx) AS BIGINT) sq, count(*) n
        |      FROM q GROUP BY label, i),
        |t AS (SELECT q.vec_id, q.label, s.n, s.n * q.qx - s.sq AS tv
        |      FROM q JOIN s ON q.label = s.label AND q.i = s.i),
        |ab AS (SELECT vec_id, label, n, tv,
        |              CAST(floor(CAST(tv AS DOUBLE) / 67108864.0) AS BIGINT) a
        |       FROM t),
        |ab2 AS (SELECT vec_id, label, n, a, tv - a * 67108864 AS b FROM ab),
        |agg AS (SELECT vec_id, label, n, CAST(sum(a*a) AS BIGINT) s2,
        |               CAST(sum(a*b) AS BIGINT) s1, CAST(sum(b*b) AS BIGINT) s0
        |        FROM ab2 GROUP BY vec_id, label, n),
        |d AS (SELECT vec_id, label,
        |             sqrt((CAST(s2 AS DOUBLE) * 4503599627370496.0
        |                   + CAST(s1 AS DOUBLE) * 134217728.0) + CAST(s0 AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * 67108864.0) AS dist_to_centroid
        |      FROM agg)
        |SELECT vec_id, label, dist_to_centroid,
        |       CAST(row_number() OVER (PARTITION BY label
        |              ORDER BY dist_to_centroid DESC, vec_id) AS BIGINT) AS olr_rank
        |FROM d ORDER BY vec_id""".stripMargin)) { (s, d) =>
      val q = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .toDF("vec_id", "label", "p", "v")
        .select(col("vec_id"), col("label"), (col("p") + 1).as("i"),
          floor(col("v").cast("double") * lit(67108864.0)).cast("long").as("qx"))
      val cent = q.groupBy(col("label"), col("i"))
        .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      val dist = q.join(cent, Seq("label", "i"))
        .select(col("vec_id"), col("label"), col("n"),
          (col("n") * col("qx") - col("sq")).as("tv"))
        .withColumn("a",
          floor(col("tv").cast("double") / lit(67108864.0)).cast("long"))
        .withColumn("b", col("tv") - col("a") * lit(67108864L))
        .groupBy(col("vec_id"), col("label"), col("n"))
        .agg(sum(col("a") * col("a")).as("s2"), sum(col("a") * col("b")).as("s1"),
          sum(col("b") * col("b")).as("s0"))
        .select(col("vec_id"), col("label"),
          (sqrt((col("s2").cast("double") * lit(4503599627370496.0) +
            col("s1").cast("double") * lit(134217728.0)) + col("s0").cast("double")) /
            (col("n").cast("double") * lit(67108864.0))).as("dist_to_centroid"))
      val byLabel = Window.partitionBy(col("label"))
        .orderBy(col("dist_to_centroid").desc, col("vec_id"))
      dist
        .withColumn("olr_rank", row_number().over(byLabel).cast("long"))
        .orderBy(col("vec_id"))
    },

    // ---- digest-prefiltered novelty (q82 semantics, Bloom fast path) --
    // Same incremental-ingest split as q82, but routed through
    // operators.BloomDigest: history → sparse (word, bits) Bloom table,
    // batch → definite-novel majority skips the history scan, only the
    // ~fpp maybes anti-join history. The composed filter is EXACT, so
    // the oracle is the plain relational novelty — DuckDB doesn't need
    // to know a Bloom filter was involved. That exactness claim IS the
    // gate.
    Entry("q87_novelty_digest", Some(
      s"""WITH fp AS (SELECT doc_id, ${h56Sql("text")} AS fp FROM documents),
         |hist AS (SELECT fp FROM fp WHERE doc_id % 5 <> 0),
         |inc AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0)
         |SELECT doc_id, fp FROM inc
         |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.fp = inc.fp)
         |ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val docs = table(s, d, "documents").select(col("doc_id"), h56(col("text")).as("fp"))
      val hist = docs.where(col("doc_id") % 5 =!= 0).select(col("fp"))
      val inc = docs.where(col("doc_id") % 5 === 0)
      // sized from the parquet row-count metadata (upper bound of hist) —
      // counting hist itself would pay the fingerprint pass twice
      val digest = graft.operators.BloomDigest.build(hist, "fp",
        expectedItems = table(s, d, "documents").count(), fpp = 0.01)
      graft.streaming.Streams.noveltyFilterDigest(inc, hist, digest, "fp")
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus-trained trigram LM quality score ----------------------
    // q85's CCNet-style filter raised to order 3: train trigram/bigram
    // counts on the corpus itself (KenLM-style count tables), score every
    // document by mean smoothed trigram surprisal. Add-1 smoothing:
    // P(w|ctx) = (c3+1)/(c2+V); surprisal is the INTEGER log2 bucket
    // ⌊log2(c2+V)⌋ − ⌊log2(c3+1)⌋ via length(bin(·)) — exact cross-engine,
    // no libm (q85's rule). Scale shape: token-linear — two count
    // aggregates (trigram, bigram) + two dictionary joins + the per-doc
    // aggregate; V is a 1-row broadcast. Same class as q68/q85: no per-doc
    // loops, no driver state, every stage a hash aggregate or equi-join.
    Entry("q97_trigram_lm", Some(
      """WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') ws
        |             FROM documents),
        |uni AS (SELECT CAST(count(DISTINCT w) AS BIGINT) v
        |        FROM (SELECT unnest(ws) w FROM tok)),
        |big AS (SELECT ws[i] || ' ' || ws[i+1] AS ctx
        |        FROM (SELECT ws, unnest(range(1, len(ws))) i
        |              FROM tok WHERE len(ws) >= 2)),
        |c2 AS (SELECT ctx, CAST(count(*) AS BIGINT) c2 FROM big GROUP BY ctx),
        |tri AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g,
        |               ws[i] || ' ' || ws[i+1] AS ctx
        |        FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) i
        |              FROM tok WHERE len(ws) >= 3)),
        |c3 AS (SELECT g, CAST(count(*) AS BIGINT) c3 FROM tri GROUP BY g),
        |sc AS (SELECT t.doc_id,
        |              CAST(length(bin(b.c2 + u.v)) - length(bin(c.c3 + 1)) AS BIGINT) s
        |       FROM tri t JOIN c3 c USING (g) JOIN c2 b USING (ctx) CROSS JOIN uni u),
        |doc AS (SELECT doc_id, CAST(sum(s) AS BIGINT) sum_surprisal,
        |               CAST(count(*) AS BIGINT) n_trigrams
        |        FROM sc GROUP BY doc_id)
        |SELECT doc_id, sum_surprisal, n_trigrams,
        |       CAST(sum_surprisal AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
        |         AS mean_surprisal
        |FROM doc ORDER BY doc_id""".stripMargin)) { (s, d) =>
      // fanned out: four branches tokenize this one-split scan (Q.fanOut)
      val docs = Q.fanOut(table(s, d, "documents"))
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      val uni = docs.select(explode(col("ws")).as("w"))
        .agg(count_distinct(col("w")).cast("long").as("v"))
      val big = docs.where(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
          .as("ctx"))
      val c2 = big.groupBy(col("ctx")).agg(count(lit(1)).as("c2"))
      val tri = docs.where(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws)-3), i -> struct(" +
            "concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS g, " +
            "concat_ws(' ', ws[i], ws[i+1]) AS ctx))")).as("t"))
        .select(col("doc_id"), col("t.g").as("g"), col("t.ctx").as("ctx"))
      val c3 = tri.groupBy(col("g")).agg(count(lit(1)).as("c3"))
      tri.join(c3, Seq("g")).join(c2, Seq("ctx")).crossJoin(broadcast(uni))
        .select(col("doc_id"),
          (length(bin(col("c2") + col("v"))) - length(bin(col("c3") + 1)))
            .cast("long").as("s"))
        .groupBy(col("doc_id"))
        .agg(sum(col("s")).cast("long").as("sum_surprisal"),
          count(lit(1)).cast("long").as("n_trigrams"))
        .select(col("doc_id"), col("sum_surprisal"), col("n_trigrams"),
          (col("sum_surprisal").cast("double") / col("n_trigrams").cast("double"))
            .as("mean_surprisal"))
        .orderBy(col("doc_id"))
    },

    // ---- temperature-weighted source mixing ----------------------------
    // Training mixtures re-weight sources by mass^alpha (alpha<1 upsamples
    // the tail — the "temperature" knob of the usual data-mixing recipe).
    // Everything is INTEGER-exact so both engines agree bit-for-bit:
    //   weight  w_s = floor(sqrt(sum(n_chars)))        (alpha = 0.5)
    //   quota_s     = largest-remainder apportionment of N=100 over w_s
    //                 (base = (N*w) div W, +1 to the largest (N*w) mod W)
    //   pick        = per-source hash-rank <= quota_s  (deterministic)
    // Scale shape: one per-source aggregate (|sources| rows — metadata,
    // not data), quota math on that tiny table (the only global window is
    // over |sources| rows, same class as q32's offset table), quotas
    // broadcast back, and a per-source rank window — the one data shuffle.
    // A hot source is a per-partition top-k (the q58/q74 aggregator swaps
    // in if quota << source size).
    Entry("q89_source_mixing", Some(
      s"""WITH mass AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS m
         |              FROM documents GROUP BY source),
         |w AS (SELECT source, CAST(floor(sqrt(CAST(m AS DOUBLE))) AS BIGINT) AS w
         |      FROM mass),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
         |q0 AS (SELECT source, w, (100 * w) // tw AS base, (100 * w) % tw AS rem
         |       FROM w, tot),
         |lo AS (SELECT CAST(100 - sum(base) AS BIGINT) AS lo FROM q0),
         |qf AS (SELECT source,
         |              base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
         |                          <= lo THEN 1 ELSE 0 END AS quota
         |       FROM q0, lo),
         |ranked AS (SELECT doc_id, source,
         |                  CAST(row_number() OVER (PARTITION BY source
         |                    ORDER BY ${h56Sql("CAST(doc_id AS VARCHAR)")}, doc_id)
         |                    AS BIGINT) AS rk
         |           FROM documents)
         |SELECT r.doc_id, r.source, q.quota, r.rk
         |FROM ranked r JOIN qf q USING (source)
         |WHERE r.rk <= q.quota ORDER BY r.doc_id""".stripMargin)) { (s, d) =>
      val docs = table(s, d, "documents")
      val w = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("m"))
        .select(col("source"),
          floor(sqrt(col("m").cast("double"))).cast("long").as("w"))
      val tot = w.agg(sum(col("w")).cast("long").as("tw"))
      val q0 = w.crossJoin(broadcast(tot))
        .withColumn("base", expr("(100 * w) div tw"))
        .withColumn("rem", expr("(100 * w) % tw"))
      val lo = q0.agg((lit(100L) - sum(col("base"))).cast("long").as("lo"))
      // |sources|-row window: bounded metadata, not data (cf. q32)
      val byRem = Window.orderBy(col("rem").desc, col("source"))
      val quota = q0.crossJoin(broadcast(lo))
        .withColumn("quota", col("base") +
          when(row_number().over(byRem) <= col("lo"), 1L).otherwise(0L))
        .select(col("source"), col("quota"))
      val bySrc = Window.partitionBy(col("source"))
        .orderBy(h56(col("doc_id").cast("string")), col("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(bySrc).cast("long"))
        .join(broadcast(quota), Seq("source"))
        .where(col("rk") <= col("quota"))
        .select(col("doc_id"), col("source"), col("quota"), col("rk"))
        .orderBy(col("doc_id"))
    },

    // ---- ordered funnel analysis (operators.Funnel) --------------------
    // Strict-order conversion depth (view -> click -> purchase): step i+1
    // counts only strictly after the user's earliest qualifying step i.
    // Chained whole-partition window minima — no sort, one exchange on
    // user_id for the whole funnel — where the textbook k-way self-join
    // costs k shuffles. The oracle replays the same chained windows.
    Entry("q119_funnel", Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) tn FROM events
        |            WHERE event_id < 120),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
        |                          AND tn > t1 THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
        |                          AND tn > t2 THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t3 FROM s2),
        |d AS (SELECT user_id,
        |             max(CASE WHEN t3 IS NOT NULL THEN 3
        |                      WHEN t2 IS NOT NULL THEN 2
        |                      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS depth
        |      FROM s3 GROUP BY user_id)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS users
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin)) { (s, d) =>
      graft.operators.Funnel.report(
        table(s, d, "events").where(col("event_id") < 120)
          .select(col("user_id"), col("event_type"), col("ts")),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    },

    // ---- funnel with a CONVERSION WINDOW (round 10) ---------------------
    // q119's strict-order funnel plus the predicate real funnel analyses
    // add: step i+1 must land within maxGap of the user's step-i time
    // ("clicked within ~5.6h of the view"). Same chained unbounded-window
    // minima — the window is one more conjunct inside the when(), so the
    // whole k-step funnel still costs ONE exchange (FunnelSpec pins it).
    // Timestamps compared as epoch NANOS on both engines (the fixture
    // loader already surfaces ts as epoch-nanos BIGINT; DuckDB epoch_ns —
    // exact integers, no float time arithmetic). Window = 2e13 ns ~ 5.6h.
    Entry("q122_funnel_window", Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) tn FROM events
        |            WHERE event_id < 200),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
        |                          AND tn > t1 AND tn <= t1 + 20000000000000
        |                          THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
        |                          AND tn > t2 AND tn <= t2 + 20000000000000
        |                          THEN tn END)
        |                 OVER (PARTITION BY user_id) AS t3 FROM s2),
        |d AS (SELECT user_id,
        |             max(CASE WHEN t3 IS NOT NULL THEN 3
        |                      WHEN t2 IS NOT NULL THEN 2
        |                      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS depth
        |      FROM s3 GROUP BY user_id)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS users
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin)) { (s, d) =>
      graft.operators.Funnel.report(
        table(s, d, "events").where(col("event_id") < 200)
          .select(col("user_id"), col("event_type"), col("ts").as("tn")),
        "user_id", "event_type", "tn", Seq("view", "click", "purchase"),
        maxGap = Some(20000000000000L))
    },

    // ---- PageRank in exact integer fixed point (operators.PageRank) ----
    // Source-authority prior for curation: rank the part graph whose
    // edges are consecutive lineitems within an order. All arithmetic is
    // int64 floor division (rank mass in integer units), so three damped
    // iterations replay bit-identically in DuckDB — the float PageRank
    // everyone writes depends on summation order, which no distributed
    // engine should promise; this one is engine-independent by
    // construction. Top 100 under a total (rank, node) order.
    Entry("q114_pagerank", Some(pagerankOracleSql)) { (s, d) =>
      val li = table(s, d, "lineitem")
      // (orderkey, linenumber) is NOT unique in the fixture — the walk
      // order adds l_partkey so remaining ties have equal partkey and the
      // edge MULTISET is permutation-invariant (deterministic both engines)
      val nxt = lead(col("l_partkey"), 1).over(
        Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey")))
      val edges = li.select(col("l_partkey").as("src"), nxt.as("dst"))
        .where(col("dst").isNotNull && col("dst") =!= col("src"))
      graft.operators.PageRank.run(edges, iters = 3)
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    },

    // ---- RAG-style overlapping chunking (round 12) ----------------------
    // Sliding-window passage extraction — the retrieval/pretraining chunker
    // q70's fixed non-overlapping split cannot express: windows of W=64
    // tokens at stride S=48 (16-token overlap), final window clipped, every
    // doc emitting at least one chunk. Start count k = ceil(max(n-W,0)/S)
    // in pure INTEGER arithmetic ((m+S-1) div S), so both engines derive
    // the same window set; chunk text re-joins the token slice (slice
    // clipping is identical 1-based inclusive semantics). Scale shape: a
    // per-row map + one explode — no shuffle at all until the final
    // presentation sort; at 100 TB this is the ingest-side operator that
    // feeds the embedding/index stages, and it pipelines entirely.
    Entry("q136_rag_chunking", Some(
      """WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') ws
        |             FROM documents),
        |d AS (SELECT doc_id, ws, len(ws) AS n,
        |             (greatest(len(ws) - 64, 0) + 47) // 48 AS k FROM tok),
        |c AS (SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
        |             array_to_string(ws[u.i*48+1 : u.i*48+64], ' ') AS chunk_text,
        |             CAST(least(64, n - u.i*48) AS BIGINT) AS tok_cnt
        |      FROM d, unnest(generate_series(0, k)) AS u(i))
        |SELECT doc_id, chunk_idx, chunk_text, tok_cnt FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin)) { (s, d) =>
      val W = 64; val S = 48
      table(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
        .withColumn("n", size(col("ws")))
        .withColumn("k", expr(s"(greatest(n - $W, 0) + ${S - 1}) div $S"))
        .select(col("doc_id"), col("ws"), col("n"),
          explode(expr("sequence(0L, k)")).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          array_join(slice(col("ws"),
            (col("chunk_idx") * S + 1).cast("int"), lit(W)), " ").as("chunk_text"),
          least(lit(W.toLong), col("n") - col("chunk_idx") * S)
            .cast("long").as("tok_cnt"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }
  )

  /** DuckDB replay of q114: the same three integer fixed-point iterations
    * as chained CTEs. Sums cast to BIGINT (DuckDB sum() is HUGEINT). */
  private lazy val pagerankOracleSql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (SELECT nodes.node,
         |            ((1000000000000 // n) * 15 // 100)
         |              + (85 * COALESCE(c.s, 0)) // 100 AS rank
         |        FROM nodes CROSS JOIN nn
         |        LEFT JOIN (SELECT ewd.dst AS node,
         |                          CAST(sum(r.rank // ewd.od) AS BIGINT) AS s
         |                   FROM $prev r JOIN ewd ON r.node = ewd.src
         |                   GROUP BY ewd.dst) c USING (node))""".stripMargin
    s"""WITH e AS (SELECT l_partkey AS src,
       |                  lead(l_partkey) OVER (PARTITION BY l_orderkey
       |                                        ORDER BY l_linenumber, l_partkey) AS dst
       |           FROM lineitem),
       |edges AS (SELECT src, dst FROM e WHERE dst IS NOT NULL AND dst <> src),
       |outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
       |ewd AS (SELECT edges.src, edges.dst, outd.od FROM edges JOIN outd USING (src)),
       |nodes AS (SELECT DISTINCT node FROM
       |          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) t),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, (1000000000000 // n) AS rank FROM nodes CROSS JOIN nn),
       |${iter("r0", "it1")},
       |${iter("it1", "it2")},
       |${iter("it2", "it3")}
       |SELECT node, rank FROM it3 ORDER BY rank DESC, node LIMIT 100""".stripMargin
  }
}
