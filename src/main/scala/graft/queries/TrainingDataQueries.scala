package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Relational, TrainingData => TD}
import graft.functions.{ParityFunctions => PF}

/** Training-data preparation surface: deterministic hash sampling,
  * train/val/test splitting, class balancing, sequence packing, PII
  * scrubbing, and banded-SimHash near-dup — the corpus-prep operators an
  * LLM pretraining pipeline runs between dedup and tokenization.
  *
  * All randomness is md5-keyed (see [[graft.operators.TrainingData]]), so
  * every query here is exactly reproducible in the DuckDB oracle.
  */
object TrainingDataQueries {

  /** DuckDB spelling of [[TD.hashBucket]]. */
  private def bucketSql(key: String, buckets: Int): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 6))::BIGINT % $buckets"

  // q63: 10% deterministic hash sample of the corpus. No shuffle: a
  // per-row filter that composes with parquet pushdown of other predicates.
  def hashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    TD.sampleByHash(docs, $"doc_id", 1000, 10000)
      .select($"doc_id", $"lang", $"source",
        TD.hashBucket($"doc_id", 10000).as("bucket"))
      .orderBy($"doc_id")
  }

  // q320: deterministic epoch shuffle — multi-epoch training needs a
  // DIFFERENT, reproducible global permutation of the corpus each epoch,
  // with no RNG state to coordinate across 1000 executors: the sort key
  // is md5(epoch ':' doc_id), so order-by-key IS the permutation —
  // seedable (epoch), stable under retries/stragglers, and at 100 TB a
  // range partition on a uniform hash, i.e. an embarrassingly parallel
  // sort with no hot ranges by construction. The face emits each
  // epoch's first 10 positions (epochs 0-2) via a per-group top-k
  // (WindowGroupLimit — never a global single-task sort) with the key
  // prefix alongside, proving the three epochs produce distinct
  // decorrelated prefixes while every rerun hashes identically.
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir).documents.select($"doc_id")
      .select($"doc_id", explode(array((0 until 3).map(lit(_)): _*)).as("epoch"))
      .select($"epoch", $"doc_id",
        md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))).as("sk"))
    Relational.topKPerGroup(e, Seq(col("epoch")),
        Seq(col("sk").asc, col("doc_id").asc), 10, rankCol = "pos")
      .select($"epoch", $"pos", $"doc_id", substring($"sk", 1, 8).as("key_prefix"))
      .orderBy($"epoch", $"pos")
  }

  // q414: SPAN CORRUPTION (r13) — the T5/UL2 denoising objective's
  // preprocessing as a deterministic relational pipeline: ~5% of token
  // positions START a 3-token corruption span (md5-keyed, so the same
  // rows corrupt identically on every engine, every retry, every
  // epoch-seed — rand() would break retries AND the oracle), overlapping
  // spans merge into maximal masked runs (the max-over-3-preceding
  // window), each run gets a consecutive sentinel id per doc
  // (gaps-and-islands), and the face emits the (input, target) pair the
  // encoder actually trains on: input = unmasked tokens with
  // <extra_id_N> at each run, target = <extra_id_N> + the masked
  // tokens, both pinned by md5 so a one-token boundary drift moves the
  // gate hash. Scale shape: one explode + three doc-keyed window passes
  // + two doc-keyed aggregations — the corpus shuffles ONCE on doc_id
  // and every subsequent pass reuses that partitioning; sentinel
  // numbering needs no global coordination (per-doc running sum).
  def spanCorruption(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables(s, dir).documents
      .select($"doc_id", posexplode(
        filter(split($"text", "\\s+"), t => length(t) > 0)).as(Seq("pos", "tok")))
    val marked = toks
      .withColumn("st", (TD.hashBucket(
        concat($"doc_id".cast("string"), lit(":"), $"pos".cast("string")), 20) === 0)
        .cast("int"))
      .withColumn("masked", max($"st").over(w.rowsBetween(-2, 0)) === 1)
      .withColumn("run_start",
        $"masked" && !coalesce(lag($"masked", 1).over(w), lit(false)))
      .withColumn("sid",
        sum($"run_start".cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .localCheckpoint()
    val sentinel = concat(lit("<extra_id_"), $"sid", lit(">"))
    val inputStr = marked.filter(!$"masked")
      .select($"doc_id", $"pos", $"tok".as("piece"))
      .unionByName(marked.filter($"run_start")
        .select($"doc_id", $"pos", sentinel.as("piece")))
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"pos", $"piece"))),
        x => x.getField("piece")), " ").as("input_s"))
    val targetStr = marked.filter($"masked")
      .select($"doc_id", $"pos", lit(1).as("ord"), $"tok".as("piece"))
      .unionByName(marked.filter($"run_start")
        .select($"doc_id", $"pos", lit(0).as("ord"), sentinel.as("piece")))
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"pos", $"ord", $"piece"))),
        x => x.getField("piece")), " ").as("target_s"))
    marked.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"masked".cast("long")).as("n_masked"),
        sum($"run_start".cast("long")).as("n_spans"))
      .join(inputStr, Seq("doc_id"), "left")
      .join(targetStr, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"n_masked", $"n_spans",
        md5(coalesce($"input_s", lit(""))).as("input_md5"),
        md5(coalesce($"target_s", lit(""))).as("target_md5"))
      .orderBy($"doc_id")
  }

  // q101: stratified sampling — per-language rates (en 20%, fr 50%, de
  // 80%, es 100%, zh dropped) in ONE stateless per-row filter: the domain
  // rebalancing move of a pretraining mix with no shuffle and no
  // per-group state, and each stratum's kept set is independent of every
  // other stratum's rate. Row-level output: any row wrongly kept/dropped
  // breaks the hash.
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TD.stratifiedSample(Tables(s, dir).documents, $"lang", $"doc_id",
        Seq("en" -> 20, "fr" -> 50, "de" -> 80, "es" -> 100), 100)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  // q64: stable train/val/test assignment (80/10/10 by key hash), reported
  // as per-(split, lang) counts — adding documents later never moves an
  // existing one across splits.
  def splitStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    TD.assignSplit(docs, $"doc_id", 80, 10)
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"split", $"lang")
  }

  // q65: class-balanced downsample — at most 30 vectors per label, chosen
  // by deterministic md5 order (reproducible "random").
  def classBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir).embeddings
    TD.balanceClasses(emb, $"label", $"vec_id", 30)
      .select($"label", $"vec_id", $"rk")
      .orderBy($"label", $"rk")
  }

  // q66: concat-and-chunk sequence packing into 512-token bins within 8
  // hash shards; reports per-bin document/token totals. The shard count is
  // the pack stage's parallelism (pick ~cluster cores at real scale).
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
      .select($"doc_id", size(PF.tokens($"text")).as("n_tokens"))
      .withColumn("shard", TD.hashBucket($"doc_id", 8))
    TD.packSequences(docs, $"shard", $"doc_id", $"n_tokens", 512)
      .groupBy($"shard", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"))
      .orderBy($"shard", $"bin")
  }

  // q67: PII scrub audit. The synthetic corpus carries no PII, so a
  // deterministic contact line (email + phone derived from doc_id) is
  // appended first; the scrubbed text is md5-fingerprinted so the oracle
  // hash-checks the exact redaction output, not just the counts.
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withPii = Tables(s, dir).documents.select($"doc_id",
      concat($"text", lit(" Contact: user"), $"doc_id",
        lit("@mail.example or +1 555 "),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0")).as("text"))
    withPii.select(
        $"doc_id",
        TD.countMatches($"text", TD.emailPattern).as("n_emails"),
        TD.countMatches($"text", TD.phonePattern).as("n_phones"),
        md5(TD.scrubPii($"text").cast("binary")).as("clean_md5"))
      .orderBy($"doc_id")
  }

  // q68: banded-SimHash near-dup pairs over a 60-bit signature (32 bits
  // collides quadratically on a large corpus — scale-probed), two-tier:
  // identical signatures collapse to a min-id representative FIRST (linear
  // agg), then 15-bit-band candidates pair up and exact Hamming <= 2
  // filters. The band join shuffles only (band, id, sig) rows, never text;
  // complete for Hamming <= 3 by pigeonhole, so <= 2 is exact.
  def simhashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = Dedup.simHash(Tables(s, dir).documents, "doc_id", "text", bits = 60)
    TD.simhashNearDup(sig, "doc_id", maxHamming = 2, bits = 60)
      .select($"id_a", $"id_b", $"hamming".cast("int").as("hamming"))
      .orderBy($"id_a", $"id_b")
  }

  // q79: benchmark-contamination scan. Unlike near-dup (symmetric Jaccard),
  // contamination is ASYMMETRIC containment: |corpus ∩ benchmark| /
  // |benchmark| — a training doc that embeds a whole eval item is
  // contaminated even if the doc is 100× larger than the item. The
  // "benchmark" here is a deterministic held-out slice (hash bucket) of
  // documents; candidates are blocked on shared shingles (the benchmark
  // side is small — at real scale it broadcasts), then exact containment
  // >= 0.5 is computed only on pairs sharing >= 3 shingles.
  def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
    val bench = TD.sampleByHash(docs, $"doc_id", 5, 100)
    val corpus = docs.join(bench.select($"doc_id"), Seq("doc_id"), "left_anti")
    val shC = Dedup.shingles(corpus, "doc_id", "text", 3)
      .select($"doc_id".as("c_id"), $"shingle")
    val shB = Dedup.shingles(bench, "doc_id", "text", 3)
      .select($"doc_id".as("b_id"), $"shingle")
    val bSizes = shB.groupBy($"b_id").agg(count(lit(1)).as("b_sz"))
    shC.join(shB, Seq("shingle"))
      .groupBy($"c_id", $"b_id").agg(count(lit(1)).as("common"))
      .filter($"common" >= 3)
      .join(bSizes, Seq("b_id"))
      .select($"c_id", $"b_id",
        round($"common".cast("double") / $"b_sz", 6).as("containment"))
      .filter($"containment" >= 0.5)
      .orderBy($"c_id", $"b_id")
  }

  /** GPT-style pre-tokenization classes: letter runs, digit runs,
    * non-space symbol runs. Identical in Java regex and RE2. */
  private val pretokPattern = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+"

  // q84: BPE-ish pre-tokenization counts — the token-budget estimator a
  // pretraining pipeline runs before the real (proprietary) tokenizer.
  // Pure per-row regexp work, no shuffle below the final order.
  def pretokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir).documents
      .select($"doc_id", regexp_extract_all($"text", lit(pretokPattern), lit(0)).as("pt"))
    toks.select($"doc_id",
        size($"pt").as("n_pretokens"),
        size(filter($"pt", t => t.rlike("^\\p{L}+$"))).as("n_word"),
        size(filter($"pt", t => t.rlike("^\\p{N}+$"))).as("n_num"),
        size(array_distinct($"pt")).as("n_distinct"))
      .orderBy($"doc_id")
  }

  // q92: fixed-size chunking with overlap — RAG/context-window prep. Each
  // document explodes into 256-char windows advancing by stride 192 (64
  // overlap); chunk content is md5-fingerprinted so the oracle checks the
  // exact bytes of every chunk, not just counts. Pure per-row explode —
  // no shuffle below the final order; at 100 TB the chunker is a map.
  def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stride = 192
    val size = 256
    val docs = Tables(s, dir).documents
      .select($"doc_id", $"text", length($"text").as("n"))
      .filter($"n" > 0)
    docs
      .select($"doc_id", $"text", $"n",
        explode(sequence(lit(0), floor(($"n" - 1) / stride).cast("int"))).as("ci"))
      .select($"doc_id", $"ci".as("chunk_idx"),
        length($"text".substr($"ci" * stride + 1, lit(size))).as("chunk_len"),
        md5($"text".substr($"ci" * stride + 1, lit(size)).cast("binary")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  // q93: repetition/diversity quality filter (Gopher/C4-style rules): the
  // type-token ratio and the share of the most repeated word bigram flag
  // TEMPLATE/boilerplate text that length-based heuristics miss. Ratios
  // are count/count IEEE divisions (exactly rounded — cross-engine safe),
  // rounded to 6 for the hash.
  def repetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = graft.operators.Relational.spread(Tables(s, dir).documents, $"doc_id")
      .select($"doc_id",
        filter(split(lower($"text"), " "), t => length(t) > 0).as("t"))
      .filter(size($"t") >= 2)
    val bigrams = toks.select($"doc_id", size($"t").as("n_tokens"),
        size(array_distinct($"t")).as("n_distinct"),
        explode(zip_with(slice($"t", lit(1), size($"t") - 1), slice($"t", lit(2), size($"t") - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    bigrams.groupBy($"doc_id", $"n_tokens", $"n_distinct", $"bg")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"n_tokens", $"n_distinct")
      .agg(max($"c").as("top_bg"), sum($"c").cast("long").as("n_bigrams"))
      .select($"doc_id", $"n_tokens",
        round($"n_distinct".cast("double") / $"n_tokens", 6).as("ttr"),
        round($"top_bg".cast("double") / $"n_bigrams", 6).as("top_bigram_ratio"),
        ($"n_distinct".cast("double") / $"n_tokens" > 0.3 &&
          $"top_bg".cast("double") / $"n_bigrams" < 0.2).as("keep"))
      .orderBy($"doc_id")
  }

  // q94: domain mixing — per-source weighted sampling, the pretraining
  // mix step (web×0.1 … books×1.0). Weights here derive from the source
  // name (so the oracle can mirror them); membership is the same md5
  // bucket as q63 — deterministic, retry-stable, shuffle-free per row.
  // Each source reports its weight, population, and the sampled doc/char
  // volume the mix admits.
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // total on ANY source shape, identical in both engines: last ≤6 digits
    // (or '' → NULL → 0 for non-numeric names) — avoids Spark's silent
    // NULL-vs-DuckDB's-error divergence on a bare CAST of the raw suffix
    val weight =
      (coalesce(expr("try_cast(regexp_extract(source, '([0-9]{1,6})$', 1) as int)"),
        lit(0)) % 10 + 1) * 1000
    Tables(s, dir).documents
      .select($"source", $"n_chars",
        TD.hashBucket($"doc_id", 10000).as("b"), weight.as("w"))
      .groupBy($"source")
      .agg(first($"w").as("weight_bp"),
        count(lit(1)).as("n_docs"),
        sum(when($"b" < $"w", 1).otherwise(0)).cast("long").as("n_sampled"),
        sum(when($"b" < $"w", $"n_chars").otherwise(0)).cast("long").as("sampled_chars"))
      .orderBy($"source")
  }

  // q171: token-budget mixture plan — the planning step BEFORE q94's
  // weighted sampling: given a per-source token budget, compute each
  // source's admission fraction min(1, budget/tokens) and the doc/token
  // volume that admits. One token-count aggregate per source; the plan
  // itself is |sources| rows of closed-form arithmetic (floor of one
  // double product — the same IEEE op on both engines), so the mix can
  // be audited before any sampling pass runs.
  def mixPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSrc = Tables(s, dir).documents
      .select($"source", size(PF.tokens($"text")).cast("long").as("toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"))
    val frac = least(lit(1.0), lit(5000.0) / $"n_tokens")
    perSrc.select($"source", $"n_docs", $"n_tokens",
      round(frac, 6).as("sample_frac"),
      floor($"n_tokens" * frac).cast("long").as("exp_tokens"),
      floor($"n_docs" * frac).cast("long").as("exp_docs"))
      .orderBy($"source")
  }

  // q199: corpus-prep pipeline v2 — the round-6 composition: exact
  // content dedup (md5 canonical, min-id keeps), then q171's token-budget
  // admission applied to the DEDUPED corpus (per-source fraction
  // min(1, budget/tokens) realized as an md5-bucket threshold — the same
  // retry-stable membership as q63/q94), reported per source with an
  // id-set fingerprint so the oracle pins exact membership, not just
  // counts. Each stage is a keyed aggregate or per-row filter — the
  // pipeline inherits every stage's scale posture.
  def pipelineV2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5($"text".cast("binary")))
    val deduped = Tables(s, dir).documents
      .withColumn("_min_id", min($"doc_id").over(w))
      .filter($"doc_id" === $"_min_id")
    val toks = deduped.select($"source", $"doc_id",
      size(PF.tokens($"text")).cast("long").as("tk"))
    val per = toks.groupBy($"source").agg(sum($"tk").as("ntok"))
    val thresh = floor(least(lit(1.0), lit(5000.0) / $"ntok") * 1000)
    toks.join(per, Seq("source"))
      .filter(TD.hashBucket($"doc_id", 1000) < thresh)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_admitted"),
        sum($"tk").cast("long").as("admitted_tokens"),
        PF.idsFingerprint($"doc_id").as("ids_md5"))
      .orderBy($"source")
  }

  // q248: nested-sampling invariant face — the 5% hash sample must be a
  // SUBSET of the 10% one (bucket < 5 ⊆ bucket < 10), so growing a
  // sample rate only ADDS rows: retraining on a larger sample reuses
  // every example already curated at the smaller rate. The face counts
  // escapees (rows in 5% but not 10%) — pinned 0 through BOTH engines —
  // exactly the q189-style contract shape; rand()-based sampling has no
  // such guarantee, which is why every sampler here is hash-bucketed.
  def nestedSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = TD.hashBucket($"doc_id", 100)
    Tables(s, dir).documents.select(b.as("bk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"bk" < 5, 1L).otherwise(0L)).as("n_5pct"),
        sum(when($"bk" < 10, 1L).otherwise(0L)).as("n_10pct"),
        sum(when($"bk" < 5 && !($"bk" < 10), 1L).otherwise(0L))
          .as("n_escaped"))
      .select($"n_docs", $"n_5pct", $"n_10pct", $"n_escaped",
        ($"n_escaped" === 0L).as("nested_ok"))
  }

  // q261: systematic PPS sampling — probability-proportional-to-size
  // selection (big documents are likelier picks, selection count is
  // exactly bounded) via ONE distributed prefix sum: doc i is selected
  // iff the char-weight interval (cum−w, cum] crosses a multiple of
  // step = ⌊ΣW / 200⌋. Everything is integer (cumulative char counts,
  // floor division), so the sample is bit-reproducible in any engine and
  // stable under re-runs — the property md5-hash sampling (q63) gives
  // uniformly that this gives size-weighted. The prefix sum is
  // Relational.globalRunningSum (range partition + per-partition offsets,
  // driver state = |partitions| longs), NEVER a single-task global
  // window — the shape that survives a 100 TB corpus. Output: per-source
  // admitted counts/mass + exact id-sum fingerprint of the membership.
  def ppsSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir).documents
      .select($"doc_id", $"source", $"n_chars".cast("long").as("w"))
    val tot = docs.agg(sum($"w").as("tw"))
    val cum = Relational.globalRunningSum(
        docs.crossJoin(broadcast(tot)), Seq($"doc_id"), $"w", "cw")
      // greatest(1, ·): on a degenerate corpus with ΣW < 200 a zero step
      // would be NULL-division in Spark but a hard error in DuckDB — the
      // engines must take the same path (here: every doc selected)
      .withColumn("step", greatest(lit(1L), expr("tw DIV 200")))
      .withColumn("sel", expr("cw DIV step") > expr("(cw - w) DIV step"))
    cum.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"w").as("chars_total"),
        sum(when($"sel", 1L).otherwise(0L)).as("n_selected"),
        sum(when($"sel", $"w").otherwise(0L)).as("chars_selected"),
        sum(when($"sel", $"doc_id").otherwise(0L)).as("id_fingerprint"))
      .orderBy($"source")
  }

  // q281: group-aware K-fold assignment — the leakage-free split for
  // training data: ALL rows of a user land in one fold because the fold is
  // a pure md5 hash of the GROUP key, never of the row (GroupKFold
  // semantics). No join, no shuffle beyond the audit aggregates; future
  // rows of a known user route identically forever (q63's determinism
  // argument). The face pins fold balance (user/event counts per fold) and
  // the disjointness audit: Σ per-fold distinct users ≡ global distinct
  // users iff no user straddles folds.
  def groupFolds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir).events.select($"user_id",
      (conv(substring(md5($"user_id".cast("string").cast("binary")), 1, 6), 16, 10)
        .cast("long") % 5).cast("int").as("fold"))
    val per = ev.groupBy($"fold")
      .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
    val tot = ev.agg(countDistinct($"user_id").as("_tot"))
    val audit = per.agg(sum($"n_users").as("_sum"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(audit))
      .select($"fold", $"n_users", $"n_events", ($"_sum" === $"_tot").as("disjoint"))
      .orderBy($"fold")
  }

  // q294: deterministic negative sampling — contrastive training pairs
  // for a recommender: per customer, up to 5 parts they have NEVER
  // ordered, drawn by a pure hash of (customer, trial index) — no RNG
  // state, so every retry, every engine, every partition layout draws
  // the SAME sample (q63's determinism argument extended to sampling
  // WITH rejection). Candidates = |customers|·8 rows, positives rejected
  // by one anti join on (customer, part); at any scale the sample cost
  // is per-customer O(trials), never O(|parts|). Fingerprint is
  // order-pinned by trial index (sorted struct array → md5), so the
  // hash compare proves the exact sample, not just its size.
  def negativeSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val maxp = t.part.agg(max($"p_partkey").as("maxp"))
    val pos = t.orders.join(t.lineitem, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p")).distinct()
    val trials = t.customer.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey".as("c"))
      .crossJoin(broadcast(maxp))
      .select($"c", explode(sequence(lit(0), lit(7))).as("i"), $"maxp")
      .select($"c", $"i",
        (conv(substring(md5(concat($"c".cast("string"), lit(":"),
          $"i".cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % ($"maxp" + 1)).as("p"))
    trials.join(pos, Seq("c", "p"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"c").orderBy($"i")))
      .filter($"rn" <= 5)
      .groupBy($"c")
      .agg(count(lit(1)).as("n_neg"),
        md5(expr("array_join(transform(array_sort(collect_list(struct(i, p))), x -> cast(x.p as string)), ',')")
          .cast("binary")).as("sample_md5"))
      .select($"c".as("custkey"), $"n_neg", $"sample_md5")
      .orderBy($"custkey")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q294_negative_sampling" -> negativeSampling _,
    "q281_group_folds" -> groupFolds _,
    "q261_pps_sample" -> ppsSample _,
    "q248_nested_sampling" -> nestedSampling _,
    "q199_pipeline_v2" -> pipelineV2 _,
    "q171_mix_plan" -> mixPlan _,
    "q79_contamination" -> contamination _,
    "q84_pretokenize" -> pretokenize _,
    "q92_chunk_overlap" -> chunkOverlap _,
    "q93_repetition_filter" -> repetitionFilter _,
    "q94_domain_mix" -> domainMix _,
    "q414_span_corruption" -> spanCorruption _,
    "q320_epoch_shuffle" -> epochShuffle _,
    "q63_hash_sample" -> hashSample _,
    "q101_stratified_sample" -> stratifiedSample _,
    "q64_split_stats" -> splitStats _,
    "q65_class_balance" -> classBalance _,
    "q66_pack_sequences" -> packSequences _,
    "q67_pii_scrub" -> piiScrub _,
    "q68_simhash_neardup" -> simhashNearDup _
  )

  private val simhashSigCte =
    """toks AS (SELECT doc_id,
      |  unnest(list_distinct(list_filter(string_split(lower(text), ' '), x -> len(x) > 0))) AS tok
      |  FROM documents),
      |h AS (SELECT doc_id, substring(md5(tok), 1, 15) AS hh FROM toks),
      |bits AS (SELECT doc_id, t.b,
      |  strpos('0123456789abcdef', substring(hh, CAST(t.b // 4 AS INT) + 1, 1)) - 1 AS nib
      |  FROM h, range(0, 60) t(b)),
      |votes AS (SELECT doc_id, b,
      |  ((nib // (CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4 WHEN b % 4 = 2 THEN 2 ELSE 1 END)) % 2) * 2 - 1 AS vote
      |  FROM bits),
      |sums AS (SELECT doc_id, b, sum(vote) AS s FROM votes GROUP BY doc_id, b),
      |sig AS (SELECT doc_id,
      |  sum(CASE WHEN s > 0 THEN CAST(power(2.0, 59 - b) AS BIGINT) ELSE 0 END) AS simhash
      |  FROM sums GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q294_negative_sampling" ->
      """WITH mp AS (SELECT max(p_partkey) AS maxp FROM part),
        |pos AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |cust AS (SELECT c_custkey AS c FROM customer
        |  WHERE c_custkey % 10 = 0),
        |trials AS (SELECT c, unnest(generate_series(0, 7)) AS i, maxp
        |  FROM cust, mp),
        |tp AS (SELECT c, i,
        |    ('0x' || substr(md5(CAST(c AS VARCHAR) || ':'
        |      || CAST(i AS VARCHAR)), 1, 8))::BIGINT % (maxp + 1) AS p
        |  FROM trials),
        |negs AS (SELECT tp.* FROM tp LEFT JOIN pos
        |    ON tp.c = pos.c AND tp.p = pos.p
        |  WHERE pos.c IS NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c ORDER BY i)
        |    AS rn FROM negs)
        |SELECT c AS custkey, CAST(count(*) AS BIGINT) AS n_neg,
        |  md5(string_agg(CAST(p AS VARCHAR), ',' ORDER BY i)) AS sample_md5
        |FROM r WHERE rn <= 5 GROUP BY 1 ORDER BY custkey""".stripMargin,
    "q281_group_folds" ->
      s"""WITH f AS (SELECT user_id,
         |    CAST(${bucketSql("user_id", 5)} AS INT) AS fold FROM events),
         |per AS (SELECT fold, CAST(count(DISTINCT user_id) AS BIGINT)
         |    AS n_users, CAST(count(*) AS BIGINT) AS n_events
         |  FROM f GROUP BY 1),
         |tot AS (SELECT count(DISTINCT user_id) AS t FROM f),
         |s AS (SELECT sum(n_users) AS su FROM per)
         |SELECT fold, n_users, n_events, (s.su = tot.t) AS disjoint
         |FROM per, tot, s ORDER BY fold""".stripMargin,
    "q261_pps_sample" ->
      """WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w
        |  FROM documents),
        |t AS (SELECT greatest(1, CAST(sum(w) AS BIGINT) // 200) AS step
        |  FROM d),
        |c AS (SELECT doc_id, source, w,
        |    CAST(sum(w) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM d),
        |sel AS (SELECT source, w, doc_id,
        |    ((cw // (SELECT step FROM t))
        |      > ((cw - w) // (SELECT step FROM t))) AS sel FROM c)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS chars_total,
        |  CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
        |  CAST(sum(CASE WHEN sel THEN w ELSE 0 END) AS BIGINT)
        |    AS chars_selected,
        |  CAST(sum(CASE WHEN sel THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS id_fingerprint
        |FROM sel GROUP BY source ORDER BY source""".stripMargin,
    "q248_nested_sampling" ->
      """WITH b AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |    1, 6))::BIGINT % 100 AS bk FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN bk < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_5pct,
        |  CAST(sum(CASE WHEN bk < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_10pct,
        |  CAST(sum(CASE WHEN bk < 5 AND NOT (bk < 10) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_escaped,
        |  CAST(sum(CASE WHEN bk < 5 AND NOT (bk < 10) THEN 1 ELSE 0 END)
        |    AS BIGINT) = 0 AS nested_ok
        |FROM b""".stripMargin,
    "q199_pipeline_v2" ->
      s"""WITH d AS (SELECT source, doc_id, text,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS mid
         |  FROM documents),
         |dd AS (SELECT source, doc_id,
         |    CAST(len(list_filter(string_split(lower(text), ' '),
         |      x -> len(x) > 0)) AS BIGINT) AS tk
         |  FROM d WHERE doc_id = mid),
         |per AS (SELECT source, CAST(sum(tk) AS BIGINT) AS ntok
         |  FROM dd GROUP BY source),
         |a AS (SELECT dd.source, dd.doc_id, dd.tk,
         |    floor(least(1.0, 5000.0 / ntok) * 1000) AS th
         |  FROM dd JOIN per USING (source))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_admitted,
         |  CAST(sum(tk) AS BIGINT) AS admitted_tokens,
         |  md5(list_aggregate(list_sort(list(doc_id)), 'string_agg', ','))
         |    AS ids_md5
         |FROM a WHERE ${bucketSql("doc_id", 1000)} < th
         |GROUP BY source ORDER BY source""".stripMargin,
    "q171_mix_plan" ->
      """WITH t AS (SELECT source,
        |    len(list_filter(string_split(lower(text), ' '),
        |      x -> len(x) > 0)) AS toks
        |  FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  round(least(1.0, 5000.0 / n_tokens), 6) AS sample_frac,
        |  CAST(floor(n_tokens * least(1.0, 5000.0 / n_tokens)) AS BIGINT)
        |    AS exp_tokens,
        |  CAST(floor(n_docs * least(1.0, 5000.0 / n_tokens)) AS BIGINT)
        |    AS exp_docs
        |FROM a ORDER BY source""".stripMargin,
    "q94_domain_mix" ->
      s"""WITH d AS (SELECT source, n_chars,
         |    ${bucketSql("doc_id", 10000)} AS b,
         |    (coalesce(try_cast(regexp_extract(source, '([0-9]{1,6})$$', 1) AS INT), 0)
         |      % 10 + 1) * 1000 AS w
         |  FROM documents)
         |SELECT source, min(w) AS weight_bp, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN b < w THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN b < w THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
         |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q92_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) > 0)
        |SELECT doc_id, CAST(t.ci AS INT) AS chunk_idx,
        |  len(substring(text, CAST(t.ci AS INT) * 192 + 1, 256)) AS chunk_len,
        |  md5(substring(text, CAST(t.ci AS INT) * 192 + 1, 256)) AS chunk_md5
        |FROM d, lateral (SELECT unnest(range(0, (n - 1) // 192 + 1)) AS ci) t
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q93_repetition_filter" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |t2 AS (SELECT doc_id, t, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
        |  FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, n_tokens, n_distinct,
        |    t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
        |  FROM t2, lateral (SELECT unnest(range(1, len(t))) AS i) r),
        |bgc AS (SELECT doc_id, n_tokens, n_distinct, bg, count(*) AS c
        |  FROM bg GROUP BY 1, 2, 3, 4),
        |agg AS (SELECT doc_id, n_tokens, n_distinct, max(c) AS top_bg,
        |    CAST(sum(c) AS BIGINT) AS n_bigrams
        |  FROM bgc GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens,
        |  round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
        |  round(CAST(top_bg AS DOUBLE) / n_bigrams, 6) AS top_bigram_ratio,
        |  (CAST(n_distinct AS DOUBLE) / n_tokens > 0.3
        |    AND CAST(top_bg AS DOUBLE) / n_bigrams < 0.2) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q79_contamination" ->
      s"""WITH w AS (SELECT doc_id, ${bucketSql("doc_id", 100)} AS bkt,
         |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS w FROM documents),
         |sh AS (SELECT doc_id, bkt, unnest(list_distinct(list_transform(range(1, len(w)-1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle FROM w),
         |shb AS (SELECT doc_id AS b_id, shingle FROM sh WHERE bkt < 5),
         |shc AS (SELECT doc_id AS c_id, shingle FROM sh WHERE bkt >= 5),
         |bsz AS (SELECT b_id, count(*) AS b_sz FROM shb GROUP BY b_id),
         |common AS (SELECT c_id, b_id, count(*) AS common
         |  FROM shc JOIN shb USING (shingle) GROUP BY c_id, b_id HAVING count(*) >= 3)
         |SELECT c_id, b_id, round(CAST(common AS DOUBLE) / b_sz, 6) AS containment
         |FROM common JOIN bsz USING (b_id)
         |WHERE CAST(common AS DOUBLE) / b_sz >= 0.5
         |ORDER BY c_id, b_id""".stripMargin,
    "q84_pretokenize" ->
      """WITH pt AS (SELECT doc_id,
        |    regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+') AS pt
        |  FROM documents)
        |SELECT doc_id, len(pt) AS n_pretokens,
        |  len(list_filter(pt, t -> regexp_full_match(t, '\p{L}+'))) AS n_word,
        |  len(list_filter(pt, t -> regexp_full_match(t, '\p{N}+'))) AS n_num,
        |  len(list_distinct(pt)) AS n_distinct
        |FROM pt ORDER BY doc_id""".stripMargin,
    // q414: the denoising recompute — same md5-keyed span starts, the
    // 3-token mask window, island sentinel numbering, and both
    // assembled strings hashed
    "q414_span_corruption" ->
      """WITH t0 AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |tk AS (SELECT doc_id, unnest(range(len(toks))) AS pos,
        |    unnest(toks) AS tok FROM t0),
        |mk AS (SELECT doc_id, pos, tok,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(pos AS VARCHAR)), 1, 6))::BIGINT % 20 = 0
        |      THEN 1 ELSE 0 END AS st
        |  FROM tk),
        |m2 AS (SELECT *, max(st) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS masked FROM mk),
        |m3 AS (SELECT *, masked AND NOT coalesce(lag(masked) OVER
        |    (PARTITION BY doc_id ORDER BY pos), FALSE) AS run_start FROM m2),
        |m4 AS (SELECT *, CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY doc_id ORDER BY pos) AS BIGINT) - 1 AS sid FROM m3),
        |ip AS (
        |  SELECT doc_id, pos, tok AS piece FROM m4 WHERE NOT masked
        |  UNION ALL
        |  SELECT doc_id, pos, '<extra_id_' || CAST(sid AS VARCHAR) || '>'
        |  FROM m4 WHERE run_start),
        |istr AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_s
        |  FROM ip GROUP BY doc_id),
        |tp AS (
        |  SELECT doc_id, pos, 1 AS ord, tok AS piece FROM m4 WHERE masked
        |  UNION ALL
        |  SELECT doc_id, pos, 0, '<extra_id_' || CAST(sid AS VARCHAR) || '>'
        |  FROM m4 WHERE run_start),
        |tstr AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY pos, ord) AS target_s
        |  FROM tp GROUP BY doc_id),
        |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |    CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        |  FROM m4 GROUP BY doc_id)
        |SELECT s.doc_id, n_tokens, n_masked, n_spans,
        |  md5(coalesce(input_s, '')) AS input_md5,
        |  md5(coalesce(target_s, '')) AS target_md5
        |FROM st s LEFT JOIN istr USING (doc_id) LEFT JOIN tstr USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q320_epoch_shuffle" ->
      """WITH e AS (SELECT d.doc_id, CAST(t.e AS INT) AS epoch,
        |    md5(CAST(t.e AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS sk
        |  FROM documents d, range(0, 3) t(e)),
        |r AS (SELECT epoch, doc_id, sk,
        |    row_number() OVER (PARTITION BY epoch ORDER BY sk, doc_id) AS pos
        |  FROM e)
        |SELECT epoch, CAST(pos AS INT) AS pos, doc_id,
        |  substr(sk, 1, 8) AS key_prefix
        |FROM r WHERE pos <= 10 ORDER BY epoch, pos""".stripMargin,
    "q63_hash_sample" ->
      s"""SELECT doc_id, lang, source,
         |  CAST(${bucketSql("doc_id", 10000)} AS INT) AS bucket
         |FROM documents
         |WHERE ${bucketSql("doc_id", 10000)} < 1000
         |ORDER BY doc_id""".stripMargin,
    "q101_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${bucketSql("doc_id", 100)} <
         |  CASE lang WHEN 'en' THEN 20 WHEN 'fr' THEN 50 WHEN 'de' THEN 80
         |            WHEN 'es' THEN 100 ELSE 0 END
         |ORDER BY doc_id""".stripMargin,
    "q64_split_stats" ->
      s"""WITH b AS (SELECT *, ${bucketSql("doc_id", 100)} AS bkt FROM documents),
         |s AS (SELECT *, CASE WHEN bkt < 80 THEN 'train'
         |                     WHEN bkt < 90 THEN 'val'
         |                     ELSE 'test' END AS split FROM b)
         |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q65_class_balance" ->
      """SELECT label, vec_id, CAST(rk AS INT) AS rk FROM (
        |  SELECT label, vec_id, row_number() OVER (
        |    PARTITION BY label
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS rk
        |  FROM embeddings)
        |WHERE rk <= 30 ORDER BY label, rk""".stripMargin,
    "q66_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |    len(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS n_tokens,
         |    ${bucketSql("doc_id", 8)} AS shard
         |  FROM documents),
         |packed AS (SELECT shard, n_tokens,
         |    CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
         |      // 512 AS INT) AS bin
         |  FROM d)
         |SELECT CAST(shard AS INT) AS shard, bin, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |FROM packed GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    "q67_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |    text || ' Contact: user' || doc_id || '@mail.example or +1 555 ' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '\+\d{1,2} \d{3} \d{4}')) AS n_phones,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,2} \d{3} \d{4}', '<PHONE>', 'g')) AS clean_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "q68_simhash_neardup" ->
      s"""WITH $simhashSigCte,
         |reps AS (SELECT simhash, min(doc_id) AS doc_id FROM sig GROUP BY simhash),
         |bands AS (SELECT doc_id, simhash, t.k AS band_idx,
         |    (simhash >> (15 * CAST(t.k AS INT))) & 32767 AS band_val
         |  FROM reps, range(0, 4) t(k)),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    bit_count(xor(a.simhash, b.simhash)) AS hamming
         |  FROM bands a JOIN bands b USING (band_idx, band_val)
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pairs
         |WHERE hamming <= 2 ORDER BY id_a, id_b""".stripMargin
  )
}
