package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Training-data deduplication operators: exact, normalized-fingerprint,
  * banded n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB): nothing here is O(n²) over the corpus. Exact and
  * fingerprint dedup are single hash-partitioned groupBys; Jaccard pairs
  * are generated only inside band buckets ((lang, length-bucket) here,
  * LSH band-hash buckets for MinHash); SimHash compares only within a
  * band. All signatures are built columnar (array expressions over the
  * token array) — no explode of (doc × shingle × hash) rows, no UDFs.
  */
object Dedup {

  /** Storage level for the pair family's corpus-sized intermediate
    * persists (hashed-shingle / signature / banded-vector frames).
    * Default MEMORY_AND_DISK (deserialized — fastest when the heap has
    * room). `SPARK_GRAFT_PAIR_STORAGE=ser` flips every site to
    * MEMORY_AND_DISK_SER: array-heavy rows compress 2-4× serialized, so
    * on a tight heap (the 24 g driver-memory sensitivity, SURVEY §7f-2)
    * the cache stops evicting/GC-thrashing at the price of per-access
    * deserialization. MemAudit measures the trade at both heap sizes.
    *
    * AUTO-SELECT (round-11 verdict item 3): when the env var is unset
    * and the JVM max heap is under 32 GiB, default to the serialized
    * level — MEMAUDIT_r11 measured the deserialized cache GC-thrashing
    * at 24 g (43.5 s vs 14.1 s serialized on the worst row) while at
    * 48 g deserialized wins. `SPARK_GRAFT_PAIR_STORAGE=deser` forces
    * the deserialized level on any heap.
    */
  private[graft] lazy val pairStorage: org.apache.spark.storage.StorageLevel =
    sys.env.get("SPARK_GRAFT_PAIR_STORAGE") match {
      case Some("ser") => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case Some("deser") => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      case _ =>
        // 30 GiB, not 32: Runtime.maxMemory reports slightly under the
        // nominal -Xmx (GC region accounting), and a -Xmx32g run should
        // classify as the 32 g tier, not flip to ser on the rounding
        if (Runtime.getRuntime.maxMemory < 30L * 1024 * 1024 * 1024) {
          System.err.println("[graft] pairStorage: heap < ~32g -> " +
            "MEMORY_AND_DISK_SER (SPARK_GRAFT_PAIR_STORAGE=deser to override)")
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        } else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    }

  /** Word n-gram shingles (distinct) of a text column.
    *
    * Built as a zip_with chain over shifted slices, NOT per-index
    * element_at: higher-order array functions are interpreted and inline
    * their inputs on every reference, so an element_at formulation
    * re-tokenizes the text O(shingles) times per row; this one references
    * the token array O(n) times total. zip_with's null padding (the slices
    * are shorter than the word array) is filtered out at the end.
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val words = wordTokens(text)
    val joined = (2 to n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), greatest(size(words) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(joined, x => x.isNotNull))
  }

  /** Exact-duplicate groups by content hash: one shuffle, representative =
    * min id. (Reference has no dedup surface; this is the LLM-pipeline
    * extension family.)
    */
  def exactGroups(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.groupBy(md5(contentCol).as("content_hash"))
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Near-exact groups by normalized fingerprint (case/punct/whitespace
    * insensitive).
    */
  def fingerprintGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(normFingerprint(textCol).as("fingerprint"))
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Exact Jaccard near-dup pairs via prefix-filtered posting joins (the
    * AllPairs/SSJoin formulation): shingles are hashed + globally ordered,
    * only each set's prefix postings enter the candidate self-join (a pair
    * with J ≥ t must share a prefix element), candidates are
    * size-ratio-pruned (t·|A| ≤ |B| ≤ |A|/t), and only survivors pay an
    * exact intersect. Shuffle keys are single shingle hashes — skew-safe
    * under AQE, never a bucket cross-product.
    */
  /** `collapseKeys` — enables the exact-duplicate collapse (see
    * [[containmentPairs]]) when a `pairPredicate` is present: the
    * predicate must be a FUNCTION of the listed per-doc expressions (e.g.
    * the ingest parity gate `id % 2 ≠ id_b % 2` is a function of
    * `Seq(col(id) % 2)`), so that every collapse group is
    * predicate-homogeneous and rep-level blocking equals member-level
    * blocking. The predicate must additionally be SYMMETRIC in the two
    * sides (`p(a, b) = p(b, a)`, as the parity gate is): rep-level
    * pruning evaluates it under REP id ordering while the legacy path
    * evaluates it under MEMBER id ordering, and the two orderings can
    * disagree across groups — symmetry is what makes both evaluations
    * equal. (The member-level re-application is canonicalized to
    * least/greatest order, so only the rep-level PRUNING leans on this.)
    * With no predicate the collapse is always safe and always
    * on; with a predicate and NO keys the collapse is skipped (legacy
    * exact path) because a predicate that varies inside a group could be
    * blocked at the rep and silently lose qualifying member pairs.
    */
  /** `collapseExactDups` — the collapse pays two extra linear
    * array-keyed shuffles to remove clique candidate+verify work; it WINS
    * when candidate precision is low (unbanded joins: measured ingest
    * sf4-replica 35 → 27 s) and LOSES when bands already keep verify
    * ≈ output-sized (q_dedup_ngram_jaccard's (lang, lb) bands, isolated
    * like-for-like A/B at 40× data: 17.0 vs 20.2 s replica, 16.3 vs
    * 23.9 s fresh) — banded callers with tight candidate precision
    * should pass false.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, shingleCol: String,
      bandCols: Seq[String], threshold: Double,
      preHashed: Boolean = false,
      pairPredicate: Option[Column] = None,
      collapseKeys: Seq[Column] = Seq.empty,
      collapseExactDups: Boolean = true): DataFrame = {
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    // the text→shingle→hash chain feeds the posting join AND both verify
    // sides — persist it once (size ~ corpus ids + hashed shingles).
    // preHashed: shingleCol is already a distinct array<bigint>.
    // array_compact on the pre-hashed branch: drops null slots AND marks
    // the element type non-null — the SortedIntersectCount verify kernel
    // rejects containsNull=true (a null slot would read undefined), and a
    // caller-supplied hash column (e.g. portableHash64, whose conv() chain
    // is nullable-typed) legitimately carries the nullable marker with no
    // actual nulls. The xxhash64 branch is containsNull=false already.
    val sh =
      if (preHashed) array_sort(array_compact(col(shingleCol)))
      else array_sort(array_distinct(transform(col(shingleCol), s => xxhash64(s))))
    if (!collapseExactDups || (pairPredicate.isDefined && collapseKeys.isEmpty)) {
      // legacy path: predicate without a group-homogeneity contract
      val base = lockedPersist(docs.select(
        (bandCols :+ idCol).map(col) :+ sh.as("_sh"): _*)
        .withColumn("_n", size(col("_sh"))))
      // materialize (pairs ≪ corpus) so the cache can go
      try lockedCheckpoint(
        jaccardPairsOn(base, idCol, bandCols, threshold, pairPredicate))
      finally lockedUnpersist(base)
    } else {
      // EXACT-DUPLICATE COLLAPSE (round 12, the containmentPairs pattern):
      // Jaccard is a function of the two shingle SETS, so identical
      // (bandCols, collapseKeys, set) rows run the posting/verify
      // machinery once per distinct group and rep pairs expand back to
      // member pairs with output-sized joins. A g-copy replica clique
      // pays 1 candidate+verify unit instead of g²; an all-distinct
      // corpus pays two linear co-partitioned shuffles on _sh.
      val ckNames = collapseKeys.indices.map(i => s"_ck$i")
      val all = lockedPersist(docs.select(bandCols.map(col) ++ Seq(col(idCol)) ++
        collapseKeys.zip(ckNames).map { case (c, n) => c.as(n) } :+
        sh.as("_sh"): _*))
      // DUP-RATE GATE (the autoBanding pattern — decide the shape from a
      // cheap corpus stat): the collapse's array-keyed groupBy + mapping
      // join cost ~15-20% of the whole pair job on an all-distinct
      // corpus, so probe the duplicate rate first with one linear
      // int-aggregate over the already-persisted frame (hash of the set,
      // not the set — nothing array-keyed shuffles in the probe). Under
      // 5% duplicates the clique savings cannot repay the shuffles: run
      // the legacy single-corpus pipeline. The hash is only a gate
      // heuristic — a collision merely under-counts distinct sets and
      // flips the gate toward collapsing, never toward wrong results.
      // ONE aggregate job for both stats (count + countDistinct share the
      // scan that also materializes the persisted frame): the r12 shape ran
      // a separate count() first, and at sf0.1 the two fixed job walls on
      // ~8 gated queries showed up as pure catalog overhead
      // r15: the same aggregate also returns Σ|_sh| — the verify-side
      // byte estimate, so the skip path no longer pays arraySideBytes
      // a separate job for it
      var sideBytes: Option[Long] = None
      val skipCollapse = sys.env.get("SPARK_GRAFT_COLLAPSE") match {
        case Some("force") => false
        case Some("off") => true
        case _ =>
          val probe = lockedHead(all.agg(count(lit(1)).as("n"),
            countDistinct(struct((bandCols ++ ckNames).map(col) :+
              xxhash64(col("_sh")): _*)).as("d"),
            coalesce(sum(size(col("_sh"))), lit(0L)).as("p")))
          val nDocs = probe.getLong(0)
          val nSets = probe.getLong(1)
          sideBytes = Some(nDocs * 24L + probe.getLong(2) * 8L)
          val skip = nSets * 20L >= nDocs * 19L // dup rate < 5%
          System.err.println(s"[graft] jaccard dup-rate gate: docs=$nDocs " +
            s"distinct=$nSets -> ${if (skip) "skip collapse" else "collapse"}")
          skip
      }
      if (skipCollapse) {
        val base = all
          .select((bandCols :+ idCol).map(col) :+ col("_sh"): _*)
          .withColumn("_n", size(col("_sh")))
        try lockedCheckpoint(jaccardPairsOn(base, idCol, bandCols, threshold,
          pairPredicate, sideBytes))
        finally lockedUnpersist(all)
      } else collapsedJaccardPairs(all, idCol, bandCols, threshold,
        pairPredicate, ckNames)
    }
  }

  /** The collapse arm of [[jaccardPairs]] — only entered when the
    * dup-rate gate measured ≥ 5% exact-duplicate sets.
    */
  private def collapsedJaccardPairs(all: DataFrame, idCol: String,
      bandCols: Seq[String], threshold: Double,
      pairPredicate: Option[Column], ckNames: Seq[String]): DataFrame = {
    {
      val gKeys = (bandCols ++ ckNames) :+ "_sh"
      val repTab = all.groupBy(gKeys.map(col): _*)
        .agg(min(col(idCol)).as("_rep"))
      val base = lockedPersist(repTab
        .select(bandCols.map(col) ++ Seq(col("_rep").as(idCol), col("_sh")): _*)
        .withColumn("_n", size(col("_sh"))))
      val mapping = lockedPersist(all.join(repTab, gKeys)
        .select(col(idCol).as("_m"), col("_rep")))
      // release the corpus-scale source cache once the two derived caches
      // exist — every later read is off base or mapping (see
      // collapsedContainmentPairs for the measured pressure rationale);
      // r15: the two independent materialization jobs run concurrently
      inParallel(lockedCount(base), lockedCount(mapping))
      lockedUnpersist(all)
      try {
        val repPairs = jaccardPairsOn(base, idCol, bandCols, threshold,
          pairPredicate)
        val subMap = mapping.select(col("_m").as("_ma"), col("_rep").as("doc_a"))
        val supMap = mapping.select(col("_m").as("_mb"), col("_rep").as("doc_b"))
        val cross = repPairs.join(subMap, "doc_a").join(supMap, "doc_b")
          .select(col("_ma").as(idCol), col("_mb").as(s"${idCol}_b"),
            col("jaccard"))
        // within-group member pairs: identical sets, J exactly 1.0 — the
        // pre-collapse pipeline found them via shared postings (df ≥ 2
        // because both copies were present); empty sets (_n = 0) never
        // shared a posting, so they stay excluded
        val m2 = mapping.toDF("_m2", "_rep")
        val sizes = base.select(col(idCol).as("_rep"), col("_n"))
          .filter(col("_n") > 0)
        val within = mapping.join(m2, "_rep")
          .filter(col("_m") < col("_m2"))
          .join(sizes, "_rep")
          .select(col("_m").as(idCol), col("_m2").as(s"${idCol}_b"),
            lit(1.0).as("jaccard"))
        // re-apply the predicate on member pairs AFTER least/greatest
        // canonicalization, so it sees exactly the (doc_a < doc_b)
        // orientation the legacy path evaluates at its candidate join —
        // an orientation-dependent expression can't silently diverge
        // between the two arms on the re-application. (Rep-level pruning
        // inside jaccardPairsOn still evaluates the predicate at REP ids
        // under rep ordering — sound because the collapseKeys contract
        // below also requires symmetry in the two sides.)
        lockedCheckpoint(cross.unionAll(within)
          .select(least(col(idCol), col(s"${idCol}_b")).as(idCol),
            greatest(col(idCol), col(s"${idCol}_b")).as(s"${idCol}_b"),
            col("jaccard"))
          .filter(pairPredicate.getOrElse(lit(true)))
          .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"),
            col("jaccard")))
      } finally {
        lockedUnpersist(base); lockedUnpersist(mapping); lockedUnpersist(all)
      }
    }
  }

  /** `pairPredicate` — optional blocking constraint over the pair's two id
    * columns (`idCol`, `${idCol}_b`), e.g. ingest-gate "new vs existing"
    * parity or cross-source-only. Applied AT the candidate posting join,
    * so excluded pairs never reach the distinct or the verify join —
    * filtering after pair generation would pay the full quadratic
    * candidate cost for pairs the caller then throws away.
    */
  /** Rank-annotated postings under the RAREST-FIRST global order — every
    * (doc, hash) posting carries the hash's 1-based position `_pos` in the
    * doc's `(document frequency, hash)` order plus the doc's set size
    * `_n`. Any common total order keeps the prefix filter lossless (the
    * smallest shared element of a qualifying pair lands in both prefixes
    * by the upward-closed-suffix argument), but the ORDER CHOICE drives
    * the candidate volume: the posting join's output is Σ_h q_h·i_h, and
    * hash order makes prefixes a random sample of the df distribution —
    * at 20× data the frequent-shingle products dominated the entire
    * containment/ingest wall (measured via the replica-vs-fresh A/B:
    * candidate generation, not pair verification, was the sf2 floor).
    * Rarest-first empties the prefixes of exactly the high-df postings,
    * collapsing q_h for every frequent h. Costs two linear exchanges (df
    * aggregate + annotate) and one per-doc window — all O(postings).
    * Callers take their prefix with `filter(_pos <= plen)`; `_pos` also
    * feeds the PPJoin positional filter (see [[prefixCandidates]]).
    */
  /** [[dfOrderedPosts]] for the stage-decomposition probe
    * (graft.ContainmentDecomp) — same frame containmentPairs persists.
    */
  private[graft] def rankedPostsForProbe(base: DataFrame,
      idCol: String): DataFrame = dfOrderedPosts(base, idCol, Seq.empty)

  private def dfOrderedPosts(base: DataFrame, idCol: String,
      bandCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posts = base.select(
      (bandCols.map(col) :+ col(idCol)) :+ col("_n") :+
        explode(col("_sh")).as("_h"): _*)
    // _sh is distinct per doc, so count(*) per hash IS document frequency.
    // r16: _df is a count window over _h instead of the former
    // groupBy(_h) + join-back — the join side had to shuffle every
    // posting by _h anyway, so annotating in place drops one Exchange +
    // one full posting scan from every posting query's plan while
    // producing the identical per-hash count (the aggregate-then-annotate
    // fusion of VERDICT r15 item 3). The global (df, h) order — and with
    // it every `_pos` rank and prefix length — is unchanged.
    val withDf =
      if (sys.env.contains("SPARK_GRAFT_DF_JOIN")) { // A/B: r15 join form
        val dfTab = posts.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
        posts.join(dfTab, "_h")
      } else posts
        .withColumn("_df", count(lit(1)).over(Window.partitionBy(col("_h"))))
    withDf
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("_df"), col("_h"))))
      // df<2 postings can never match across documents (any shared hash
      // has df >= 2 by definition), so they are dead weight in every
      // downstream candidate self-join — drop them AFTER the rank window
      // (ranks stay computed over the full element set, so prefix lengths
      // and the positional bound are untouched; a qualifying pair's
      // prefix matches are shared elements, hence never dropped). On a
      // high-entropy corpus (df ~= 1 almost everywhere) this collapses
      // the posting-join shuffle to the tiny shared-hash subset.
      .filter(col("_df") >= 2)
      .select((bandCols.map(col) :+ col(idCol)) :+ col("_n") :+
        col("_h") :+ col("_pos") :+ col("_df"): _*)
  }

  /** Candidate pairs for the symmetric-Jaccard posting join — exposed
    * package-private so the scale probes can A/B the `positional` filter's
    * candidate mass; [[jaccardPairsOn]] always runs with it on.
    *
    * PPJoin positional filter (Xiao et al.): a match of hash h at 1-based
    * ranks (i, j) of the two docs' shared global order bounds the overlap
    * — every shared element sits at rank ≥ i in A and ≥ j in B once h is
    * the pair's FIRST shared element, so o ≤ 1 + min(n_a−i, n_b−j). J ≥ t
    * ⟺ o·(1+t) ≥ t·(n_a+n_b); a pair survives if ANY of its prefix
    * matches could still reach that bar. Lossless: for a qualifying pair
    * the first-shared-element match is in both prefixes (the prefix
    * lemma) and its bound ≥ the true overlap. The filter runs INSIDE the
    * posting join output, before the distinct and the verify join — the
    * two stages whose input it shrinks.
    */
  private[graft] def prefixCandidates(base: DataFrame, idCol: String,
      bandCols: Seq[String], threshold: Double,
      pairPredicate: Option[Column] = None,
      positional: Boolean = true): DataFrame = {
    // prefix-filtering (AllPairs): under a global element order, two sets
    // with J >= t must share an element within their first
    // n - ceil(t*n) + 1 elements — only prefix postings enter the join,
    // and the prefix is taken rarest-first (see dfOrderedPosts)
    val prefixLen = (col("_n") - ceil(col("_n") * threshold) + 1).cast("int")
    val posts = dfOrderedPosts(base, idCol, bandCols)
      .filter(col("_pos") <= prefixLen)
    val rhs = posts.toDF(posts.columns.map(c =>
      if (bandCols.contains(c) || c == "_h") c else s"${c}_b"): _*)
    // overlap upper bound at this match; the -1e-9 slack keeps borderline
    // float equality on the LENIENT side (can only under-prune — the
    // verify step recomputes exact J, so losslessness is never at risk)
    val ubound = lit(1) +
      least(col("_n") - col("_pos"), col("_n_b") - col("_pos_b"))
    val positionalOk =
      ubound * (1.0 + threshold) >=
        (col("_n") + col("_n_b")) * threshold - 1e-9
    posts.join(rhs, bandCols :+ "_h")
      .filter(pairPredicate.foldLeft(col(idCol) < col(s"${idCol}_b"))(_ && _))
      .filter(if (positional) positionalOk else lit(true))
      .select(col(idCol), col(s"${idCol}_b"))
      .distinct()
  }

  /** Byte estimate of an (id, _sh, _n) array side — drives the verify
    * join strategy choice. One tiny aggregate over the (cached) frame:
    * rows x fixed row overhead + total array elements x 8.
    */
  private def arraySideBytes(base: DataFrame): Long = {
    val st = lockedHead(base.agg(count(lit(1)).as("n"), sum(col("_n")).as("p")))
    st.getLong(0) * 24L + (if (st.isNullAt(1)) 0L else st.getLong(1) * 8L)
  }

  /** VERIFY-JOIN STRATEGY (round 13, measured on the dense-df corpora):
    * the candidate stream can be 10^8-10^9 skinny rows, and ANY plan that
    * exchanges or sorts the FIRST array-join's output materializes
    * ~candidates x array-bytes — sf4 containment wrote 40+ GB of wide
    * shuffle before being killed, under both SMJ (sorts the wide stream
    * for join 2) and plain SHUFFLE_HASH (exchanges it). When the array
    * side fits a broadcast, BOTH lookups pipeline around the unsorted
    * candidate stream inside one stage and the wide rows never hit disk
    * or the network — that is the right plan at any candidate volume.
    * Past the cap (384 MB default, SPARK_GRAFT_VERIFY_BCAST_CAP to tune;
    * a 100 TB corpus's array side does not broadcast) fall back to
    * SHUFFLE_HASH: the arrays stay on the build side, the stream is never
    * SORTED, and the one wide exchange is linear in candidates — banding
    * is what must bound candidates at that scale, not the join.
    */
  private def verifyBcastCap: Long =
    sys.env.get("SPARK_GRAFT_VERIFY_BCAST_CAP").map(_.toLong)
      .getOrElse(384L << 20)

  /** Heap guard on top of the cap: BOTH verify sides broadcast
    * simultaneously and the in-memory HashedRelation runs ~1.5-3x the
    * raw estimate (UnsafeRow + relation overhead), so require
    * 2 x sideBytes x 3 to fit in a quarter of the heap before
    * broadcasting. On the 48 g bench driver this never binds (the 384 MB
    * cap does); on the default 8 g driver it lowers the effective
    * per-side bound to ~341 MB, so two near-cap broadcasts can't OOM
    * instead of falling back — the same heap-tier pattern as
    * [[pairStorage]].
    */
  private def verifySide(side: DataFrame, sideBytes: Long): DataFrame =
    if (sideBytes <= verifyBcastCap &&
        sideBytes * 6L <= Runtime.getRuntime.maxMemory / 4L) broadcast(side)
    else side.hint("SHUFFLE_HASH")

  private def jaccardPairsOn(base: DataFrame, idCol: String,
      bandCols: Seq[String], threshold: Double,
      pairPredicate: Option[Column] = None,
      knownSideBytes: Option[Long] = None): DataFrame = {
    graft.plans.SortedIntersectCount.register(base.sparkSession)
    val candidates = prefixCandidates(base, idCol, bandCols, threshold,
      pairPredicate)
    val aSide = base.select(col(idCol), col("_sh"), col("_n"))
    val bSide = aSide.toDF(s"${idCol}_b", "_sh_b", "_n_b")
    // callers whose gate probe already measured (rows, Σ|_sh|) pass the
    // estimate in; others pay the one-aggregate job
    val sideBytes = knownSideBytes.getOrElse(arraySideBytes(base))
    candidates.join(verifySide(aSide, sideBytes), idCol)
      .join(verifySide(bSide, sideBytes), s"${idCol}_b")
      .filter(col("_n_b") >= col("_n") * threshold &&
        col("_n") >= col("_n_b") * threshold)
      // _sh is sorted-distinct by construction (see the callers'
      // array_sort) — the two-pointer count IS size(array_intersect)
      // without the per-pair hash set + materialized intersection array
      .withColumn("_c",
        graft.plans.SortedIntersectCount.count(col("_sh"), col("_sh_b")))
      .withColumn("jaccard",
        col("_c").cast("double") / (col("_n") + col("_n_b") - col("_c")))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"), col("jaccard"))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: C(A,B) = |A∩B| / |A| ≥ t —
    * the "document A is quoted/embedded inside B" shape that symmetric
    * Jaccard misses when |B| ≫ |A| (boilerplate-wrapped copies, quote
    * farms). Same posting-join discipline as [[jaccardPairs]] but with the
    * containment prefix filter: the QUERY side only posts its
    * `n - ceil(t·n) + 1` smallest hashes (any pair with C ≥ t must share
    * one of them — else A∩B fits inside A's top `ceil(t·n) - 1` elements,
    * a contradiction), while the INDEX side posts everything. Prefix
    * length uses exact integer `ceil(t·n) = (num·n + den - 1) div den`
    * so float rounding can never break the lossless guarantee.
    *
    * Emits directed pairs (doc_sub → doc_sup): `threshold = num/den`.
    */
  def containmentPairs(docs: DataFrame, idCol: String, shingleCol: String,
      num: Int, den: Int, preHashed: Boolean = false): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    // ONE persisted (id, _sh, _n) cache serves the gate probes AND the
    // chosen arm (r15): the former all-then-base persist pair cost an
    // extra materialization job + a second array-heavy cache per call
    // on the exact path for an identical frame
    val all = lockedPersist(docs.select(col(idCol),
      hashedSetCol(shingleCol, preHashed)
      .as("_sh")).withColumn("_n", size(col("_sh"))))
    // ARM GATE (round 15, r14 verdict item 2 — the r14 `weak` row): the
    // exact posting join is lossless ground truth but its candidate mass
    // on DENSE-df corpora is quadratic (true-pair shingle df ∝ corpus ⇒
    // every posting group ∝ N; measured fresh e 1.56, 79.6 s at 40×),
    // while the LSH-Ensemble arm reads e 0.74 at recall 1.0 on the same
    // chain. Route by a measured corpus stat, the dup-rate-gate pattern:
    // avg shingle document-frequency over the DISTINCT-SET corpus
    // (exact-dup copies must not inflate df — they collapse before any
    // posting work in both arms). Floored to the exact arm below
    // `floorDocs` distinct sets, so both oracle scales (2 k / 20 k docs)
    // keep the lossless arm and all committed hashes. The density pass
    // (explode + HLL) is only paid ABOVE the floor, where the query
    // itself is tens of seconds. SPARK_GRAFT_CONTAINMENT_ARM=exact|lsh
    // pins the route for A/B probes and ground-truth runs.
    val floorDocs = sys.env
      .getOrElse("SPARK_GRAFT_CONTAINMENT_FLOOR", "100000").toLong
    val dfGate = sys.env
      .getOrElse("SPARK_GRAFT_CONTAINMENT_DF_GATE", "64").toDouble
    var probed: Option[org.apache.spark.sql.Row] = None
    val useLsh = sys.env.get("SPARK_GRAFT_CONTAINMENT_ARM") match {
      case Some("exact") => false
      case Some("lsh") => true
      case _ =>
        val probe = containmentProbe(all)
        probed = Some(probe)
        val n = probe.getLong(0); val d = probe.getLong(1)
        val p = probe.getLong(2)
        if (d < floorDocs) {
          System.err.println(s"[graft] containment arm gate: docs=$n " +
            s"distinct=$d < floor $floorDocs -> exact")
          false
        } else {
          // distinct-set postings ≈ p·d/n (exact when n = d; dup copies
          // carry the same set sizes on average), one HLL pass for the
          // distinct-shingle count
          val distinctSh = lockedHead(all
            .select(explode(col("_sh")).as("_h"))
            .agg(approx_count_distinct(col("_h")))).getLong(0)
          val avgDf =
            if (distinctSh == 0L) 0.0
            else (p.toDouble * d / math.max(1L, n)) / distinctSh
          val lsh = avgDf > dfGate
          System.err.println(f"[graft] containment arm gate: docs=$n " +
            f"distinct=$d postings=$p shingles=$distinctSh " +
            f"avgDf=$avgDf%.1f gate=$dfGate%.1f -> " +
            (if (lsh) "lsh" else "exact"))
          lsh
        }
    }
    if (useLsh) collapsedContainmentPairs(all, idCol, num, den,
      lshBands = Some((0, 0)))
    else exactContainmentPairs(all, idCol, num, den, probed)
  }

  /** The lossless exact arm of [[containmentPairs]], bypassing the arm
    * gate — ground truth for the recall evals and probes (which run it
    * on sampled/large corpora where the gate would route to LSH).
    */
  def containmentPairsExact(docs: DataFrame, idCol: String,
      shingleCol: String, num: Int, den: Int,
      preHashed: Boolean = false): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    val all = lockedPersist(docs.select(col(idCol),
      hashedSetCol(shingleCol, preHashed)
      .as("_sh")).withColumn("_n", size(col("_sh"))))
    exactContainmentPairs(all, idCol, num, den, None)
  }

  // array_compact on the pre-hashed branch: drops null slots AND marks
  // the element type non-null — the SortedIntersectCount verify kernel
  // rejects containsNull=true (a null slot would read undefined), and a
  // caller-supplied hash column (e.g. portableHash64, whose conv() chain
  // is nullable-typed) legitimately carries the nullable marker with no
  // actual nulls. The xxhash64 branch is containsNull=false already.
  private def hashedSetCol(shingleCol: String, preHashed: Boolean): Column =
    if (preHashed) array_sort(array_compact(col(shingleCol)))
    else array_sort(array_distinct(transform(col(shingleCol), s => xxhash64(s))))

  // ONE aggregate job for the gate stats — the scan doubles as the
  // persist materialization (the r12 separate count()+countDistinct pair
  // measured as fixed per-call overhead across the gated catalog
  // queries): docs, distinct sets (hash of the set so nothing array-keyed
  // shuffles; a collision only under-counts), total postings
  private def containmentProbe(all: DataFrame): org.apache.spark.sql.Row =
    lockedHead(all.agg(count(lit(1)).as("n"),
      countDistinct(xxhash64(col("_sh"))).as("d"),
      coalesce(sum(col("_n")), lit(0L)).as("p")))

  /** GLOBAL PLAN LOCK (r16, VERDICT r15 item 1). The r15 arm-overlap race
    * (exact containment verify intermittently emitting ~10× duplicated
    * rows, reproducer graft.R15Race3) is attributed to catalyst COMPILES
    * — specifically the `withCachedData` cached-plan substitution —
    * racing the other arm's cache-registry mutations
    * (persist/unpersist). The fix is structural, not a sleep: every
    * compile and every registry mutation in the pair family goes through
    * this lock, and only RDD/stage-level EXECUTION overlaps. Forcing
    * `queryExecution.executedPlan` under the lock pins the whole
    * analyze → withCachedData → optimize → physical-plan chain (with AQE
    * this does NOT run stages — AdaptiveSparkPlanExec construction is
    * lazy; stage materialization happens at execute, outside the lock);
    * the subsequent action on the SAME Dataset reuses that
    * QueryExecution, so nothing recompiles outside the lock. Overlapped
    * arms additionally share no identically-shaped private cache (the
    * one shared frame, `all`, is persisted by the caller and released
    * only after both arms), so no arm can unpersist a cache the other's
    * running plan substituted. Sequential callers pay one uncontended
    * monitor acquisition.
    */
  private[graft] val planLock = new Object

  /** Compile under [[planLock]], collect outside it. `df.collect()`
    * reuses this Dataset's own QueryExecution, so the forced
    * executedPlan is exactly what runs.
    */
  private[graft] def lockedRows(df: DataFrame): Array[org.apache.spark.sql.Row] = {
    planLock.synchronized { df.queryExecution.executedPlan }
    df.collect()
  }

  private[graft] def lockedHead(df: DataFrame): org.apache.spark.sql.Row =
    lockedRows(df).head

  /** count() compiles a separate aggregate plan — route it through the
    * same compile-under-lock discipline.
    */
  private[graft] def lockedCount(df: DataFrame): Long =
    lockedHead(df.groupBy().count()).getLong(0)

  /** Eager localCheckpoint with the compile under [[planLock]] and the
    * checkpoint job (the arm's long pole) outside it.
    */
  private[graft] def lockedCheckpoint(df: DataFrame): DataFrame = {
    planLock.synchronized { df.queryExecution.executedPlan }
    df.localCheckpoint(true)
  }

  /** persist registers the plan in the shared CacheManager and compiles
    * the cached representation — a registry mutation AND a compile; both
    * belong under the lock. Same for unpersist (registry removal).
    */
  private[graft] def lockedPersist(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel = pairStorage): DataFrame =
    planLock.synchronized { df.persist(level) }

  private[graft] def lockedUnpersist(df: DataFrame): Unit =
    planLock.synchronized { df.unpersist(): Unit }

  /** Run two independent ARM pipelines concurrently (guide §2.6; VERDICT
    * r15 item 1 — the safe re-introduction of the r15 reverted overlap).
    * Arms must route every compile / persist / unpersist / checkpoint
    * through the locked helpers above. `SPARK_GRAFT_NO_ARM_OVERLAP=1`
    * forces sequential construction (A/B + incident kill-switch).
    * On failure of `fa` the helper still awaits `fb` before propagating,
    * so no arm ever outlives the call into the caller's cleanup.
    */
  private[graft] def overlapArms[A, B](fa: => A, fb: => B): (A, B) = {
    if (sys.env.contains("SPARK_GRAFT_NO_ARM_OVERLAP")) { val a = fa; (a, fb) }
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val f = Future(fb)
      val a =
        try fa
        catch { case t: Throwable =>
          try Await.ready(f, Duration.Inf) catch { case _: Throwable => () }
          throw t
        }
      (a, Await.result(f, Duration.Inf))
    }
  }

  /** Run two independent eager pipeline pieces concurrently (guide
    * §2.6) — `b` on a pool thread, `a` on the caller's. Used where two
    * materialization jobs have no mutual dependency, so the second's
    * job chain is not serialized behind the first's stage tails.
    */
  private def inParallel[A, B](fa: => A, fb: => B): (A, B) = {
    if (sys.env.contains("SPARK_GRAFT_NO_OVERLAP")) { val a = fa; (a, fb) }
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val f = Future(fb)
      // r16 (r15 ADVICE): if fa throws, STILL await fb before propagating
      // — otherwise fb's job outlives the call into the caller's finally
      // unpersist block, recreating exactly the concurrent
      // action-vs-registry-mutation window this helper is documented to
      // avoid. fb's own failure is secondary to fa's.
      val a =
        try fa
        catch { case t: Throwable =>
          try Await.ready(f, Duration.Inf) catch { case _: Throwable => () }
          throw t
        }
      (a, Await.result(f, Duration.Inf))
    }
  }

  /** Both arms of a sampled containment recall eval over ONE shared
    * (id, _sh, _n) cache and ONE gate aggregate, constructed
    * CONCURRENTLY (r16, VERDICT r15 item 1 — the safe re-introduction of
    * the r15 reverted overlap; see [[planLock]] for why this is now
    * sound). The r15 sequential form persisted the identical
    * shingle-array frame twice (once per arm) and probed it twice; here
    * the exact arm and the banded/LSH arm read one cache that outlives
    * both, and the only cross-arm-visible registry entry is exactly that
    * deliberately shared frame. Returns (exactPairs, otherPairs), both
    * eagerly checkpointed.
    */
  private[graft] def containmentEvalArms(docs: DataFrame, idCol: String,
      shingleCol: String, num: Int, den: Int, preHashed: Boolean,
      bandedQueryCap: Option[Int]): (DataFrame, DataFrame) = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    val all = lockedPersist(docs.select(col(idCol),
      hashedSetCol(shingleCol, preHashed).as("_sh"))
      .withColumn("_n", size(col("_sh"))))
    try {
      // one aggregate: gate stats for the exact arm's dup-rate gate +
      // the verify byte estimate; its scan materializes the shared cache
      // BEFORE the arms fork, so neither arm races the other populating it
      val probe = containmentProbe(all)
      overlapArms(
        exactContainmentPairs(all, idCol, num, den, Some(probe),
          ownsAll = false),
        bandedQueryCap match {
          case Some(qc) => collapsedContainmentPairs(all, idCol, num, den,
            caps = Some((qc, 0L)), ownsAll = false)
          case None => collapsedContainmentPairs(all, idCol, num, den,
            lshBands = Some((0, 0)), ownsAll = false)
        })
    } finally lockedUnpersist(all)
  }

  /** The exact arm's body: dup-rate collapse gate, then the lossless
    * posting join (non-collapsed pipeline or
    * [[collapsedContainmentPairs]]). `probed` reuses the arm gate's
    * aggregate when [[containmentPairs]] already ran it.
    */
  /** `ownsAll = false` (r16): the caller owns the persisted `all` cache
    * (shared-arm evals keep it alive for the other arm) — this function
    * then never unpersists it.
    */
  private[graft] def exactContainmentPairs(all: DataFrame, idCol: String,
      num: Int, den: Int,
      probed: Option[org.apache.spark.sql.Row],
      ownsAll: Boolean = true): DataFrame = {
    // EXACT-DUPLICATE COLLAPSE (round-12: ContainmentDecomp measured the
    // sf4-replica wall 85% in the verify join over 181M candidates, and
    // replica cliques are the candidate mass): containment is a function
    // of the two shingle SETS alone, so identical sets are interchangeable
    // — group them (exact array equality, no hash-collision exposure),
    // run the posting/verify machinery once per DISTINCT set, and expand
    // rep-level pairs back to member pairs at the end. Replica-style
    // corpora (and real 100 TB crawls, where exact dups are 20-40% of
    // documents) stop paying the near-dup join per copy; a collapse
    // group of g docs turns g² candidate×verify work into 1. On an
    // all-distinct corpus the collapse is two linear co-partitioned
    // shuffles on _sh and the mapping join is a no-op expansion.
    // DUP-RATE GATE (the autoBanding pattern — decide the shape from a
    // cheap corpus stat): under 5% exact-duplicate sets the collapse's
    // array-keyed groupBy + mapping join cannot repay themselves — probe
    // with one linear int-aggregate over the persisted frame (hash of
    // the set, so nothing array-keyed shuffles in the probe; a collision
    // only under-counts and flips the gate toward collapsing, never
    // toward wrong results) and run the single-corpus pipeline when the
    // corpus is effectively all-distinct.
    // SPARK_GRAFT_COLLAPSE=force|off overrides the gate (A/B probes);
    // default: measure and decide, reusing the arm gate's aggregate when
    // it already ran (containmentProbe — the scan doubles as the persist
    // materialization)
    var probeRow: Option[org.apache.spark.sql.Row] = probed
    val skipCollapse = sys.env.get("SPARK_GRAFT_COLLAPSE") match {
      case Some("force") => false
      case Some("off") => true
      case _ =>
        val probe = probed.getOrElse(containmentProbe(all))
        probeRow = Some(probe)
        val skip = probe.getLong(1) * 20L >= probe.getLong(0) * 19L // <5% dup
        System.err.println(s"[graft] containment dup-rate gate: " +
          s"docs=${probe.getLong(0)} distinct=${probe.getLong(1)} -> " +
          s"${if (skip) "skip collapse" else "collapse"}")
        skip
    }
    if (skipCollapse) {
      // single-cache discipline (r15 form): `all` now carries `_n` from
      // construction, so it IS the base frame — one persisted
      // array-heavy cache, already materialized by the gate/dup probes,
      // serves the candidate and verify stages directly. (The r12
      // finding stands: the persist boundary on this frame is what
      // keeps the downstream join plans the measured shapes — the
      // boundary is unchanged, only the redundant second copy and its
      // materialization job are gone.)
      val base = all
      val ranked = lockedPersist(dfOrderedPosts(base, idCol, Seq.empty))
      try {
        val candidates = containmentCandidates(base, idCol, num, den,
          rankedPosts = Some(ranked))
        val aSide = base.select(col(idCol).as("_a"), col("_sh").as("_sh_a"),
          col("_n").as("_n_a"))
        val bSide = base.select(col(idCol).as("_b"), col("_sh").as("_sh_b"))
        // strategy: see verifySide — broadcast when the arrays fit,
        // SHUFFLE_HASH past the cap (never sort the candidate stream).
        // base == all here, so the gate probe's (n, _, p) already IS the
        // byte estimate — reuse it instead of a second aggregate job
        val sideBytes = probeRow
          .map(r => r.getLong(0) * 24L + r.getLong(2) * 8L)
          .getOrElse(arraySideBytes(base))
        lockedCheckpoint(candidates.join(verifySide(aSide, sideBytes), "_a")
          .join(verifySide(bSide, sideBytes), "_b")
          .withColumn("_c",
            graft.plans.SortedIntersectCount.count(col("_sh_a"), col("_sh_b")))
          .filter(col("_c") * den >= col("_n_a") * num)
          .select(col("_a").as("doc_sub"), col("_b").as("doc_sup"),
            col("_c").cast("long").as("common"),
            col("_n_a").cast("long").as("size_sub"),
            (col("_c").cast("double") / col("_n_a")).as("containment")))
      } finally {
        lockedUnpersist(ranked)
        // base == all on this path: one cache, released only by its owner
        if (ownsAll) lockedUnpersist(all)
      }
    } else collapsedContainmentPairs(all, idCol, num, den, ownsAll = ownsAll)
  }

  /** BANDED containment near-dup pairs — the corpus-scale production arm
    * of [[containmentPairs]] for high-entropy corpora (round 14; the
    * exact arm's fresh-mode candidate mass is provably the post-filter
    * floor, SURVEY §5n-2/§5o-7, and measured e≈1.8 at 40×).
    *
    * Same directed semantics (C(A,B) = |A∩B|/|A| ≥ num/den, pairs over
    * the distinct-set corpus expanded to members), but the candidate
    * join is BANDED instead of lossless: each query posts only its
    * `queryCap` rarest prefix shingles, and shingles in more than
    * `dfCap` documents are dropped from both sides (stop-shingle rule).
    * Candidates ≤ docs × queryCap × dfCap — linear in the corpus — and
    * every surviving pair is verified EXACTLY, so precision is 1 and
    * only recall is approximate. Recall is measured, never assumed:
    * `q_containment_eval_sampled` runs both arms inside the
    * deterministic 25% id-sample and reports the recall estimate (the
    * q_minhash_eval_sampled protocol).
    *
    * Always runs the exact-duplicate collapse (no gate): banded
    * semantics are DEFINED over the distinct-set corpus, so document
    * frequency — and with it the banding itself — cannot be inflated by
    * exact duplicates (a boilerplate doc duplicated 10⁹ times at 100 TB
    * must not push its own shingles over the stop-shingle cap), and
    * within-group pairs (C = 1.0 by identity) are emitted exactly with
    * zero recall loss. `dfCap = 0` resolves adaptively from the
    * measured distinct-set count.
    */
  def containmentPairsBanded(docs: DataFrame, idCol: String,
      shingleCol: String, num: Int, den: Int, preHashed: Boolean = false,
      queryCap: Int = 8, dfCap: Long = 0L): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    require(queryCap > 0, "queryCap must be positive")
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    val all = lockedPersist(docs.select(col(idCol),
      hashedSetCol(shingleCol, preHashed).as("_sh")))
    collapsedContainmentPairs(all, idCol, num, den,
      caps = Some((queryCap, dfCap)))
  }

  /** LSH containment near-dup pairs — the corpus-scale production arm
    * for DENSE-df corpora (round 14). The measured failure of both exact
    * and df-capped postings on such corpora: the shingles that identify
    * true pairs have df proportional to the corpus (df/N constant), so
    * ANY posting join on raw shingles carries candidate groups ∝ N per
    * posting — quadratic total — while a fixed df cap loses the true
    * pairs entirely once their shingles outgrow it (measured cliff:
    * recall 1.0 → 0.05 from sf2f to sf4f at dfCap 256, SURVEY §5p).
    *
    * The LSH-Ensemble reading (Zhu et al., VLDB'16) instead converts the
    * directed containment threshold into a Jaccard floor within a
    * declared size-ratio horizon: C(A,B) = |A∩B|/|A| ≥ t and
    * |B| ≤ R·|A| imply J(A,B) ≥ t/(1+R−t) (worst case |A∩B| = t·|A|,
    * |B| = R·|A|), so OPH MinHash band-bucket candidates — whose mass is
    * bounded by band-bucket occupancy, linear on real corpora and
    * already measured linear on this one (q_dedup_minhash e ≤ 1.11) —
    * recover every horizon pair the banding's S-curve admits at its
    * Jaccard. Survivors are verified EXACTLY in both directions
    * (precision 1); recall is measured, never assumed
    * (`q_containment_lsh_eval_sampled`). Pairs beyond the horizon are
    * only found if a band still collides (J decays as 1/R); a 100 TB
    * deployment chasing extreme-asymmetry pairs (tweet inside a book)
    * should partition the index by size octave and re-band per
    * partition — the full LSH-Ensemble construction this arm's horizon
    * parameter is the single-partition form of.
    *
    * Banding: `numHashes = bands = 0` (the default) resolves via
    * [[autoContainmentBanding]] from the measured distinct-set count once
    * the collapse materializes — (64, 32×2) below 2²⁰ reps (the
    * oracle-pinned shape; at the R = 2 horizon floor J = t/(3−t) = 0.36
    * (t = 4/5), band recall 1−(1−J²)³² ≈ 0.99, and ≈ 1−10⁻¹⁴ at the
    * J ≥ 0.8 the corpus's real pairs sit at), stepping rows 2→3→4 per
    * ~7 size octaves to hold the coincidental band-collision mass down
    * (same motivation as [[autoBanding]] for the hyperplane family).
    * Explicit (numHashes, bands) pins the shape (oracle twins, probes).
    * Always collapses exact-duplicate sets first (within-group pairs
    * emitted exactly; df/banding invariant to dup inflation), same
    * discipline as [[containmentPairsBanded]].
    */
  def containmentPairsLsh(docs: DataFrame, idCol: String,
      shingleCol: String, num: Int, den: Int, preHashed: Boolean = false,
      numHashes: Int = 0, bands: Int = 0): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0,1]")
    require((numHashes == 0) == (bands == 0),
      "numHashes and bands must be pinned together (0,0 = auto)")
    require(numHashes == 0 || numHashes % bands == 0,
      "bands must divide numHashes")
    graft.plans.SortedIntersectCount.register(docs.sparkSession)
    val all = lockedPersist(docs.select(col(idCol),
      hashedSetCol(shingleCol, preHashed).as("_sh")))
    collapsedContainmentPairs(all, idCol, num, den,
      lshBands = Some((numHashes, bands)))
  }

  /** Size-octave banding for the containment-LSH arm: rows per band step
    * 2 → 3 → 4 as the DISTINCT-SET corpus grows, band count fixed at 32.
    * A fixed r = 2 banding admits coincidental (non-pair) band
    * collisions with probability J², so their mass grows ~n²·E[J²] —
    * the same fixed-shape risk [[autoBanding]] retired for the
    * hyperplane family in r11. Raising rows sharpens the S-curve
    * (per-band collision J^r) at the cost of horizon-floor recall
    * (J = 0.36: r2 ≈ 0.99, r3 ≈ 0.78, r4 ≈ 0.42 per 32 bands) — still
    * ≥ 1−10⁻¹⁰ at the J ≥ 0.8 the measured true pairs sit at, and
    * recall is MEASURED per rung, never assumed (probe grid committed in
    * probes/; `q_containment_lsh_eval_sampled` keeps it continuously
    * measurable). Floors to the oracle-pinned (64, 32×2) below 2²⁰ reps
    * so both correctness scales and the 10–40× chain keep their r14
    * shapes byte-for-byte.
    */
  def autoContainmentBanding(nReps: Long): (Int, Int) =
    if (nReps < (1L << 20)) (64, 32)        // r = 2 — oracle-pinned shape
    else if (nReps < (1L << 27)) (96, 32)   // r = 3
    else (128, 32)                          // r = 4

  /** The collapse arm of [[containmentPairs]] — entered when the
    * dup-rate gate measured ≥ 5% exact-duplicate sets, and ALWAYS by
    * [[containmentPairsBanded]] (banded semantics are defined over the
    * distinct-set corpus so document frequency — hence the banding
    * itself — is invariant to exact-duplicate inflation).
    *
    * `caps` = Some((queryCap, dfCap)) threads the banded caps into the
    * candidate join (positional filter off — see
    * [[containmentCandidates]]); dfCap 0 resolves adaptively from the
    * measured rep count once the rep table materializes.
    */
  private[graft] def collapsedContainmentPairs(all: DataFrame, idCol: String,
      num: Int, den: Int, caps: Option[(Int, Long)] = None,
      lshBands: Option[(Int, Int)] = None,
      ownsAll: Boolean = true): DataFrame = {
    // min-id representative per distinct set; mapping id -> rep is a
    // co-partitioned join on _sh (never a collect_list of group members
    // — a boilerplate doc duplicated 10⁹ times must not become one row)
    val repTab = all.groupBy(col("_sh")).agg(min(col(idCol)).as("_rep"))
    val base = lockedPersist(repTab
      .select(col("_rep").as(idCol), col("_sh"))
      .withColumn("_n", size(col("_sh"))))
    val mapping = lockedPersist(all.join(repTab, "_sh")
      .select(col(idCol).as("_m"), col("_rep")))
    // materialize both derived caches NOW and release the corpus-scale
    // source cache before the heavy candidate/verify stages — the r12
    // shape held three near-identical array-heavy caches (all/base/
    // mapping) until job end, tripling pair-family pressure on the
    // 24g-sensitive heaps for no reuse (every later read is off base or
    // mapping). r15: the two materialization jobs are independent — run
    // them concurrently (guide §2.6) — and base's job is ONE aggregate
    // that also returns Σ_n, which is exactly the verify-side byte
    // estimate arraySideBytes used to pay a third job for.
    val (baseStats, _) = inParallel(
      lockedHead(base.agg(count(lit(1)), coalesce(sum(col("_n")), lit(0L)))),
      lockedCount(mapping))
    val nReps = baseStats.getLong(0)
    val repSideBytes = nReps * 24L + baseStats.getLong(1) * 8L
    if (ownsAll) lockedUnpersist(all)
    // adaptive stop-shingle cap: a shingle present in more than ~1/64 of
    // the distinct-set corpus (floor 256 so small corpora never band) is
    // boilerplate whose posting group is quadratic candidate mass with
    // no dedup signal — measured grid in SURVEY §5p picks the rule
    val resolvedCaps = caps.map { case (qc, dc) =>
      (qc, if (dc > 0) dc else math.max(256L, nReps / 64L))
    }
    resolvedCaps.foreach { case (qc, dc) =>
      System.err.println(s"[graft] containment banded caps: reps=$nReps " +
        s"queryCap=$qc dfCap=$dc")
    }
    // the rank-annotated postings feed BOTH sides of the candidate join
    // (query prefix + full index): persist them for the duration of the
    // (eager) checkpointed computation or the df-join + rank window would
    // run twice — one full-posting shuffle pair per side (measured: the
    // recomputation alone put sf2 containment from 18 to 29 s).
    // The LSH arm never builds postings — its candidates come from the
    // OPH band-bucket self-join — so the persist is posting-path-only.
    val ranked =
      if (lshBands.isDefined) None
      else Some(lockedPersist(dfOrderedPosts(base, idCol, Seq.empty)))
    try {
      val candidates = lshBands match {
        case Some((numHashes0, bands0)) =>
          // MinHash band-bucket candidates (the LSH-Ensemble reading of
          // containment: C ≥ t within size ratio R implies
          // J ≥ t/(1+R−t), so Jaccard banding bounds candidate mass
          // linearly where the posting join's df-driven mass is
          // quadratic). Buckets are undirected; containment is directed,
          // so each colliding pair enters the verify in both directions.
          // (0, 0) = resolve the shape from the measured distinct-set
          // count (autoContainmentBanding) now that nReps is known.
          val (numHashes, bands) =
            if (numHashes0 > 0) (numHashes0, bands0)
            else {
              val shape = autoContainmentBanding(nReps)
              System.err.println(s"[graft] containment lsh auto-banding: " +
                s"reps=$nReps -> hashes=${shape._1} bands=${shape._2} " +
                s"rows=${shape._1 / shape._2}")
              shape
            }
          // materialize the OPH signature pass ONCE (r16): unchecked, the
          // signature aggregate re-ran on BOTH sides of the band
          // self-join AND again under the unionAll's second `und`
          // reference — the profile showed FOUR ~7 s signature stages
          // (28 s of the query's 34 s task time) computing identical
          // sigs. One checkpointed (id, _sig) frame (64 longs/doc) feeds
          // the cheap band-key explode on every reference; the banding
          // function is literally the same composition
          // (minhashBandKeys = bandKeysFromSig ∘ minhashSigs), so bucket
          // keys — and with them the candidate set and the verified
          // output — are byte-identical.
          val sigs = lockedCheckpoint(minhashSigs(
            base.select(col(idCol), col("_sh")), idCol, numHashes))
          val banded = bandKeysFromSig(sigs, idCol, numHashes, bands)
          val other = banded.select(col(idCol).as("_b2"),
            col("band"), col("bk"))
          // und is output-sized (candidate pairs) — checkpoint so the
          // both-directions union reads it instead of re-running the
          // band self-join twice
          val und = lockedCheckpoint(banded.join(other, Seq("band", "bk"))
            .filter(col(idCol) < col("_b2"))
            .select(col(idCol).as("_a"), col("_b2").as("_b"))
            .distinct())
          und.unionAll(und.select(col("_b").as("_a"), col("_a").as("_b")))
        case None => containmentCandidates(base, idCol, num, den,
          positional = resolvedCaps.isEmpty,
          rankedPosts = ranked,
          queryCap = resolvedCaps.map(_._1),
          dfCap = resolvedCaps.map(_._2))
      }
      val aSide = base.select(col(idCol).as("_a"), col("_sh").as("_sh_a"),
        col("_n").as("_n_a"))
      val bSide = base.select(col(idCol).as("_b"), col("_sh").as("_sh_b"))
      // rep-level qualifying pairs (directed, between DISTINCT sets);
      // _sh is sorted-distinct by construction, so the two-pointer count
      // IS size(array_intersect) without the per-pair hash set + the
      // materialized intersection array the old verify allocated 181M×
      // strategy: see verifySide — broadcast when the arrays fit,
      // SHUFFLE_HASH past the cap (never sort the candidate stream);
      // byte estimate reused from the materialization aggregate above
      val sideBytes = repSideBytes
      val repPairs = candidates.join(verifySide(aSide, sideBytes), "_a")
        .join(verifySide(bSide, sideBytes), "_b")
        .withColumn("_c",
          graft.plans.SortedIntersectCount.count(col("_sh_a"), col("_sh_b")))
        .filter(col("_c") * den >= col("_n_a") * num)
        .select(col("_a"), col("_b"), col("_c"), col("_n_a"))
      // expand rep pairs to member pairs: every (a ∈ group(_a), b ∈
      // group(_b)) inherits the rep pair's exact counts (same sets).
      // Output-sized joins.
      val subMap = mapping.select(col("_m").as("doc_sub"), col("_rep").as("_a"))
      val supMap = mapping.select(col("_m").as("doc_sup"), col("_rep").as("_b"))
      val cross = repPairs.join(subMap, "_a").join(supMap, "_b")
        .select(col("doc_sub"), col("doc_sup"),
          col("_c").cast("long").as("common"),
          col("_n_a").cast("long").as("size_sub"),
          (col("_c").cast("double") / col("_n_a")).as("containment"))
      // within-group pairs: identical sets contain each other exactly
      // (C = 1 ≥ any threshold) — every ordered member pair, both
      // directions. Output-sized (these ARE result rows).
      val m2 = mapping.toDF("_m2", "_rep")
      // _n = 0 groups (empty shingle sets) never share a posting, so the
      // pre-collapse pipeline never paired them — keep them out here too
      val sizes = base.select(col(idCol).as("_rep"), col("_n"))
        .filter(col("_n") > 0)
      val within = mapping.join(m2, "_rep")
        .filter(col("_m") =!= col("_m2"))
        .join(sizes, "_rep")
        .select(col("_m").as("doc_sub"), col("_m2").as("doc_sup"),
          col("_n").cast("long").as("common"),
          col("_n").cast("long").as("size_sub"),
          lit(1.0).as("containment"))
      lockedCheckpoint(cross.unionAll(within))
    } finally {
      ranked.foreach(lockedUnpersist); lockedUnpersist(base)
      lockedUnpersist(mapping)
      if (ownsAll) lockedUnpersist(all)
    }
  }

  /** Candidate (query, index) pairs for the containment posting join —
    * package-private for the scale probes' positional-filter A/B;
    * [[containmentPairs]] always runs with `positional` on.
    *
    * The query side posts its `n - ceil(t·n) + 1` smallest hashes (any
    * pair with C ≥ t must share one of them — else A∩B fits inside A's
    * top `ceil(t·n) - 1` elements, a contradiction), the index side
    * posts everything, and BOTH sides carry their rarest-first rank so
    * the positional filter can bound the overlap pairwise: a match at
    * ranks (i, j) of the pair's first shared element bounds
    * |A∩B| ≤ 1 + min(n_a−i, n_b−j), and C ≥ t needs |A∩B|·den ≥ n_a·num
    * — all-integer, so float rounding can never break losslessness. (The
    * query-side-only bound `1 + n_a − i ≥ ceil(t·n_a)` is a tautology at
    * every prefix position — the prefix length is chosen as exactly the
    * positions that satisfy it — which is why the index side's rank is
    * what makes the filter bite.)
    */
  private[graft] def containmentCandidates(base: DataFrame, idCol: String,
      num: Int, den: Int, positional: Boolean = true,
      rankedPosts: Option[DataFrame] = None,
      bucketedIndex: Boolean = false,
      queryCap: Option[Int] = None,
      dfCap: Option[Long] = None): DataFrame = {
    // exact integer ceil(t*n), immune to 0.8*35 = 28.000000000000004
    val ceilTn = ((col("_n") * num + (den - 1)) / den).cast("int")
    val prefixLen = col("_n") - ceilTn + 1
    // rarest-first keeps frequent shingles out of the candidate join's
    // query side AND gives both sides the shared global rank the
    // positional filter needs — one window over all postings, reused by
    // both branches of the self-join (callers pass a persisted frame via
    // rankedPosts so the window genuinely runs once)
    val ranked = rankedPosts.getOrElse(dfOrderedPosts(base, idCol, Seq.empty))
    // LENGTH-BUCKETED INDEX PREFIX (round 13, the fresh-mode candidate
    // floor probe). Bucket query docs by size octave k = ⌊log₂ n_a⌋; for
    // every query in bucket k the overlap must reach o ≥ ⌈t·2ᵏ⌉, and the
    // pair's FIRST shared element at index rank j satisfies
    // o ≤ n_b − j + 1 (all shared elements sit at rank ≥ j on the index
    // side once j is the first), so j ≤ n_b − ⌈t·2ᵏ⌉ + 1: the index posts
    // only that rank prefix per query bucket. Lossless by the same
    // first-shared-element lemma as the query prefix.
    //
    // SCOPE — be precise about what this can and cannot cut: the emitted
    // candidate SET is IDENTICAL to the positional filter's (the bucket
    // bound is the positional bound weakened from n_a to 2^⌊log₂ n_a⌋, so
    // every match the bucket drops, the positional filter below drops
    // too — PrefixFilterPropertySpec pins the equality). What moves is
    // WHERE the pruning happens: the dropped matches are never GENERATED
    // by the join (index postings above the per-octave cutoff never enter
    // it), instead of being produced and then filtered — i.e. this trades
    // per-octave replication of the index posting shuffle for the
    // posting join's raw match-generation volume. It cannot shrink the
    // post-filter distinct (the sf4-fresh 450M-row stage); that mass
    // survives the positional bound itself. ⌊log₂ n⌋ is integer-exact
    // (length(bin(n))−1) — no float log whose rounding could flip a
    // bucket (an under-assigned bucket would still be lossless, but the
    // rule should not depend on that).
    //
    // MEASURED NEGATIVE RESULT (round 13) — default OFF. On the r13 scale
    // corpora the trade LOSES catastrophically: document sizes span
    // several live octaves, and every SMALL octave's cutoff
    // (n_b − ⌈t·2ᵏ⌉ + 1 with 2ᵏ ≪ n_b) keeps ~all index postings, so
    // each such octave adds a near-full copy of the posting table to the
    // (_h, _qb) join's sort — sf4-replica containment went 25.5 s →
    // 669 s FAILED (SPILL_OUT_OF_MEMORY: the expanded sort spilled past
    // the box's free disk). The win case is a size-HOMOGENEOUS corpus
    // (1-2 live octaves, where the single live cutoff prunes ~70% of
    // index postings); callers with that shape can opt in explicitly.
    // The honest general fix for the fresh-mode candidate floor remains
    // open: the floor is the post-positional distinct mass itself.
    // BANDED CAPS (round 14, the fresh-mode production arm — see
    // [[containmentPairsBanded]]): queryCap keeps only each query's
    // `queryCap` RAREST prefix postings (the lossless prefix can be
    // ~(1−t)·n postings whose df grows with the corpus; the rarest few
    // carry nearly all of the discrimination), and dfCap drops postings
    // of shingles present in more than `dfCap` documents from BOTH sides
    // (stop-shingle rule, same discipline as qWinnowPairs' df ≤ 100):
    // their posting groups are the quadratic candidate mass and they
    // carry no dedup signal. Candidates are then ≤ docs × queryCap ×
    // dfCap — LINEAR in the corpus. Recall < 1 (a pair found only
    // through a dropped posting is lost) and is MEASURED, never assumed
    // (q_containment_eval_sampled). Callers passing caps must run with
    // positional = false: the positional bound's first-shared-element
    // lemma assumes the globally-first shared element was generated,
    // which a cap can remove — the bound would then over-prune pairs the
    // capped join legitimately found through a later element.
    require((queryCap.isEmpty && dfCap.isEmpty) || !positional,
      "positional filter is unsound under banded caps (first-shared-element lemma)")
    val dfOk = dfCap.map(col("_df") <= _)
    val queryPosts0 = ranked.filter(col("_pos") <= prefixLen)
      .filter(queryCap.map(col("_pos") <= _).getOrElse(lit(true)))
      .filter(dfOk.getOrElse(lit(true)))
      .select(col(idCol).as("_a"), col("_h"),
        col("_pos").as("_pos_a"), col("_n").as("_n_a"))
    val indexPosts0 = ranked.filter(dfOk.getOrElse(lit(true)))
      .select(col(idCol).as("_b"), col("_h"),
        col("_pos").as("_pos_b"), col("_n").as("_n_b"))
    val (queryPosts, indexPosts, joinKeys) =
      if (!bucketedIndex) (queryPosts0, indexPosts0, Seq("_h"))
      else {
        val qb = (length(bin(col("_n_a"))) - 1).cast("int")
        val q = queryPosts0.withColumn("_qb", qb)
        // live octaves: tiny (≤ 64 rows) — broadcast to expand each index
        // posting into exactly the octaves whose prefix keeps it
        val octaves = q.select(col("_qb")).distinct()
        // ⌈t·2ᵏ⌉ integer-exact; SQL shiftleft (the Scala helper only takes
        // a literal shift). Exact-integer double division, same pattern as
        // ceilTn above.
        val minOverlap = ((expr("shiftleft(CAST(1 AS BIGINT), _qb)") * num +
          (den - 1)) / den).cast("long")
        val ix = indexPosts0.join(broadcast(octaves),
          col("_pos_b") <= col("_n_b") - minOverlap + 1)
        (q, ix, Seq("_h", "_qb"))
      }
    val ubound = lit(1) +
      least(col("_n_a") - col("_pos_a"), col("_n_b") - col("_pos_b"))
    queryPosts.join(indexPosts, joinKeys)
      .filter(col("_a") =!= col("_b"))
      .filter(if (positional) ubound * den >= col("_n_a") * num
        else lit(true))
      .select(col("_a"), col("_b"))
      .distinct()
  }

  /** One-permutation-hashing MinHash signature (Li et al.): each doc's
    * hashed shingles are exploded to rows, split into `numHashes` buckets
    * by hash residue, and sig[i] = MIN(h | h ≡ i) — one hash per shingle
    * total instead of `numHashes`, as plain codegen'd min-aggregates with
    * map-side partials. Empty buckets are densified deterministically from
    * the doc's global min.
    */
  def minhashSignature(hashedRows: DataFrame, idCol: String, hCol: String,
      numHashes: Int): DataFrame = {
    val h = col(hCol)
    val bucket = pmod(h, lit(numHashes))
    hashedRows.groupBy(col(idCol))
      .agg(min(when(bucket === 0, h)).as("raw_0"),
        (1 until numHashes).map(i =>
          min(when(bucket === i, h)).as(s"raw_$i")): _*)
      .select(col(idCol) +:
        (0 until numHashes).map(i =>
          // rotation densification: first non-empty bucket scanning
          // forward from i (matches MinHashAgg)
          coalesce((0 until numHashes).map(j =>
            col(s"raw_${(i + j) % numHashes}")): _*).as(s"mh_$i")): _*)
  }

  /** LSH candidate pairs: band the signature, bucket-join on
    * (band, band-slice), dedup the bare id pairs, then verify with exact
    * Jaccard on the hashed shingle sets. Only ids + band slices travel
    * through the band shuffle; shingle arrays are joined back just for the
    * surviving pairs.
    *
    * `hashFn` defaults to xxhash64 (fast path); pass
    * [[graft.functions.portableHash64]] to make the full chain
    * reproducible in an ANSI-SQL oracle (band buckets are compared as raw
    * signature slices, not engine-private hashes, so candidate sets are
    * provably identical across engines).
    */
  /** OPH MinHash signature → exploded (idCol, band, bk) band-key rows for
    * a pre-hashed (idCol, _sh: array<bigint>) frame. Shared by the batch
    * LSH pairs and the incremental streaming dedup so their stores stay
    * band-compatible.
    */
  def minhashBandKeys(hashed: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame =
    bandKeysFromSig(minhashSigs(hashed, idCol, numHashes), idCol,
      numHashes, bands)

  /** One-pass native OPH signature (graft.plans.MinHashAgg) for a
    * pre-hashed (idCol, _sh: array<bigint>) frame → (idCol, _sig).
    */
  def minhashSigs(hashed: DataFrame, idCol: String,
      numHashes: Int): DataFrame = {
    graft.plans.MinHashAgg.register(hashed.sparkSession, numHashes)
    hashed.select(col(idCol), explode(col("_sh")).as("_h"))
      .groupBy(col(idCol))
      .agg(graft.plans.MinHashAgg.minhashSig(col("_h")).as("_sig"))
  }

  /** Band-key explosion of a PRECOMPUTED signature frame (idCol, _sig) —
    * factored out of [[minhashBandKeys]] so a band-configuration sweep
    * (q_lsh_sweep*) shares ONE corpus signature pass across all its
    * bandings instead of re-aggregating per configuration.
    */
  def bandKeysFromSig(signed: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    signed
      .withColumn("_band", explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          slice(col("_sig"), b * rows + 1, lit(rows)).as("bk")))))
      .select(col(idCol), col("_band.band"), col("_band.bk"))
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, shingleCol: String,
      numHashes: Int, bands: Int, threshold: Double,
      hashFn: Column => Column = xxhash64(_),
      preHashed: Boolean = false): DataFrame = {
    // preHashed: shingleCol is already a distinct array<bigint> (e.g. the
    // native graft.plans.ShingleHashes one-pass form)
    val hashed = lockedPersist(
      if (preHashed) docs.select(col(idCol), col(shingleCol).as("_sh"))
      else docs.select(col(idCol),
        array_distinct(transform(col(shingleCol), s => hashFn(s))).as("_sh")))
    try {
      // one checkpointed signature pass (r16, same fix as the containment
      // LSH arm): the band self-join's two sides otherwise re-run the
      // OPH aggregate twice; bucket keys are unchanged
      // (minhashBandKeys = bandKeysFromSig ∘ minhashSigs)
      val banded = bandKeysFromSig(
        lockedCheckpoint(minhashSigs(hashed, idCol, numHashes)),
        idCol, numHashes, bands)
      val other = banded.select(col(idCol).as(s"${idCol}_b"), col("band"), col("bk"))
      val pairs = banded.join(other, Seq("band", "bk"))
        .filter(col(idCol) < col(s"${idCol}_b"))
        .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"))
        .distinct()
      val jac = size(array_intersect(col("_sh"), col("_sh_b"))).cast("double") /
        size(array_union(col("_sh"), col("_sh_b")))
      // pairs ≪ corpus; the checkpoint frees the shingle cache
      lockedCheckpoint(pairs
        .join(hashed.select(col(idCol).as("doc_a"), col("_sh")), "doc_a")
        .join(hashed.select(col(idCol).as("doc_b"), col("_sh").as("_sh_b")), "doc_b")
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard")))
    } finally lockedUnpersist(hashed)
  }

  /** Columnar SimHash over a pre-hashed token column: majority vote on the
    * low `bits` bits, one sign-sum expression per bit. Reference semantics
    * for [[graft.plans.SimHashBits]] (which does the same in one codegen'd
    * pass); kept columnar here for parity tests and SQL-expressibility.
    */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    val bs = (0 until bits).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }
    bs.reduce(_ + _)
  }

  /** 63-bit SimHash over word tokens (bit 63 left clear so the signature
    * stays a non-negative long). Columnar: 63 sign-sum expressions over the
    * token-hash array.
    */
  def simhash63(text: Column): Column =
    simhashFromHashes(transform(wordTokens(text), t => xxhash64(t)), 63)

  /** SimHash near-dup pairs within a band (same length bucket), Hamming
    * distance ≤ `maxHamming` via xor + bit_count.
    */
  def simhashPairs(docs: DataFrame, idCol: String, simhashCol: String,
      bandCols: Seq[String], maxHamming: Int): DataFrame = {
    val a = docs.select((bandCols :+ idCol :+ simhashCol).map(col): _*)
    val b = a.toDF(a.columns.map(c => if (bandCols.contains(c)) c else s"${c}_b"): _*)
    a.join(b, bandCols)
      .filter(col(idCol) < col(s"${idCol}_b"))
      .withColumn("hamming",
        bit_count(col(simhashCol).bitwiseXOR(col(s"${simhashCol}_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"), col("hamming"))
  }

  /** Connected components over near-dup pairs: min-label propagation with
    * pointer jumping, iterated to a TRUE fixpoint.
    *
    * Each round does (a) neighbor-min propagation (label(v) ← min over v
    * and its neighbors' labels) and (b) pointer jumping (label(v) ←
    * label(label(v))). Propagation alone needs O(diameter) rounds; the
    * jumping step halves label-chain depth every round, so convergence is
    * O(log diameter) — a 2^20-link chain closes in ~20 rounds, and no
    * silent cap can leave a cluster half-merged (`maxIters` is a safety
    * valve that THROWS instead of truncating). Every round is
    * `localCheckpoint`ed: lineage stays O(1) and the fixpoint probe reads
    * materialized partitions instead of replaying the whole LSH chain.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 64,
      driverMaxEdges: Long = 4000000L): DataFrame = {
    // Size-based strategy: near-dup pair sets are tiny relative to the
    // corpus (pairs ≪ docs even at 100 TB — they're the output of LSH
    // banding + verification). Below `driverMaxEdges` edges, union-find on
    // the driver is exact and costs one collect instead of 2×rounds shuffle
    // jobs; above it, the O(log diameter) distributed loop takes over.
    val longIds = pairs.schema.take(2).forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    if (longIds && pairs.count() <= driverMaxEdges)
      return driverUnionFind(pairs)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged) {
      if (i >= maxIters)
        throw new IllegalStateException(
          s"dupClusters did not converge in $maxIters rounds — " +
            "component diameter exceeds 2^" + maxIters)
      // (a) neighbor-min propagation (carrying the pre-round label as `old`
      // so the fixpoint probe is a filter on materialized data, not a join)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "nlabel"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nlabel")).as("nmin"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // (b) pointer jumping: follow the label one hop (labels only ever
      // decrease, so label(label(v)) ≤ label(v) — least() is implicit)
      val updated = propagated.as("a")
        .join(propagated.select(col("id").as("pid"), col("label").as("plabel")),
          col("a.label") === col("pid"), "left")
        .select(col("a.id").as("id"), col("a.old").as("old"),
          coalesce(col("plabel"), col("a.label")).as("label"))
        .localCheckpoint(true)
      converged = updated.filter(col("label") =!= col("old")).isEmpty
      labels = updated.select(col("id"), col("label"))
      i += 1
    }
    labels // (id, label) where label = min doc id of the component
  }

  /** Exact min-label components via union-find (path compression + attach
    * -larger-root-under-smaller, so every root IS its component's min id).
    */
  /** [[dupClusters]] for pair sets whose edges NEVER cross a known
    * blocking column (SemDeDup: [[embeddingPairs]] joins within the
    * k-means bucket, so components are bucket-local by construction).
    * One shuffle (group by bucket) + a per-group union-find replaces
    * the global O(log diameter) pointer-jumping loop — at sf4-replica
    * the 7.5M-edge semdedup pair set took 12.1 s through the
    * distributed loop vs one grouped pass here, and the shape is the
    * 100 TB path: bucket count grows with n (Similarity.autoK), while
    * per-group state is O(vertices in bucket) — bounded by the
    * quantizer's target bucket size, independent of corpus size.
    * Edges stream from the group iterator (never materialized).
    *
    * Same contract as [[dupClusters]]: (id, label) for every id in
    * `pairs`, label = component-min id (union-by-min, identical to
    * driverUnionFind's arithmetic — SemDedupAutoKSpec pins parity).
    */
  def dupClustersBucketed(pairs: DataFrame, bucketCol: String,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val ss = pairs.sparkSession
    import ss.implicits._
    pairs.select(col(bucketCol).cast("long"), col(aCol).cast("long"),
        col(bCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val nxt = parent(c); parent(c) = r; c = nxt
          }
          r
        }
        it.foreach { case (_, a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keysIterator.map(v => (v, find(v))).toSeq
      }
      .toDF("id", "label")
  }

  private def driverUnionFind(pairs: DataFrame): DataFrame = {
    val es = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = parent.keysIterator.map(v => (v, find(v))).toSeq
    pairs.sparkSession.createDataFrame(labels).toDF("id", "label")
  }

  /** The end-use of the dedup family: remove every non-representative
    * member of each near-dup cluster, keeping the min-id doc.
    */
  def dedupedCorpus(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = dupClusters(pairs).filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Winnowing document fingerprints (Schleimer et al., the MOSS
    * rolling-hash scheme): hash every character k-gram of the normalized
    * text, then keep the minimum hash of each complete window of `w`
    * consecutive k-grams — a content-defined selection of ~n/w
    * representative hashes per document that is robust to insertions.
    *
    * Shape: explode to (doc, gram-index) rows and take a sliding-frame
    * window min — everything stays in whole-stage codegen (one hash per
    * gram, no higher-order array lambdas to inline), and the only shuffle
    * is the per-doc window partition. Returns (idCol, fp) rows, one per
    * distinct selected fingerprint.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, hashFn: Column => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")
    val base = docs.select(col(idCol), norm.as("_norm"))
      .withColumn("_ng", greatest(length(col("_norm")) - (k - 1), lit(0)))
    val grams = base
      .withColumn("_i", explode(when(col("_ng") >= 1,
        sequence(lit(1), col("_ng"))).otherwise(array())))
      .select(col(idCol), col("_ng"), col("_i"),
        hashFn(col("_norm").substr(col("_i"), lit(k))).as("_h"))
    val frame = Window.partitionBy(col(idCol)).orderBy(col("_i"))
      .rowsBetween(Window.currentRow, w - 1)
    grams.withColumn("_fp", min(col("_h")).over(frame))
      .filter(col("_i") <= col("_ng") - (w - 1)) // complete windows only
      .select(col(idCol), col("_fp").as("fp"))
      .distinct()
  }

  /** Deterministic ±1 (Rademacher) hyperplane bank for sign-random-
    * projection LSH — shared by [[embeddingLshPairs]] and its SQL oracle
    * generator, so both engines compute bit-identical bucket keys (±1
    * entries round-trip exactly through SQL literals; Gaussian floats
    * would risk parse drift).
    */
  lazy val hyperplanes: Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    // 2048 planes = headroom for [[autoBanding]]'s deepest shape
    // (rows=20 × bands=92 = 1840 under the dual-design-point table).
    // `Array.fill` draws row-by-row, so the first 64 rows are
    // bit-identical to the historical 64-plane bank — every committed
    // oracle SQL literal and pinned-(8,8) bucket key is unchanged (the
    // correctness gate would catch any drift).
    Array.fill(2048)(Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** Pinned (rows → bands) table for [[autoBanding]]: for each signature
    * width `rows`, the band count that holds the S-curve recall of the
    * historical (bands=8, rows=8) shape at BOTH design cosines —
    * bands(r) = max(bands₀.₉₅(r), bands₀.₈₅(r)) with
    * bands_c(r) = ⌈ln(1−R₈(c))/ln(1−p(c)ʳ)⌉, p(c) = 1 − arccos(c)/π,
    * R₈(c) = 1 − (1 − p(c)⁸)⁸ (p(0.95) ≈ 0.89892, R₈ ≈ 0.9883;
    * p(0.85) ≈ 0.82340, R₈ ≈ 0.8503; bands(8) = 8 by construction).
    * Literals are PINNED — recomputing them per-JVM from doubles could
    * drift a ceil across platforms and silently change every bucket key.
    *
    * Recall contract (round-12 restatement — the r11 single-design-point
    * table only guaranteed ≥ at c* = 0.95; for tight rungs the crossing
    * sat near 0.95, so mid-cosine recall silently dropped below the
    * baseline): anchoring each rung at BOTH 0.95 and 0.85 pins the
    * adaptive curve ≥ the (8, 8) baseline at the two ends of the
    * near-dup regime, and because two S-curves of this family cross at
    * most once, the ≥ holds POINTWISE on all of cos ∈ [0.85, 1]
    * (verified on a 0.001-step grid for every rung; zero violations).
    * Below 0.85 a steeper curve necessarily trades recall for precision
    * — that is the point of sizing rows with the corpus, and recall
    * down there was never the near-dup contract (the (8, 8) shape
    * itself recalls <20% at cos 0.4). EmbeddingLshAutoSpec pins the ≥
    * empirically on planted corpora at a shallow (rows=9) AND a deep
    * (rows≥11) rung. Cost: the 0.85 anchor raises bands 1.3–1.6× at
    * the rungs real corpora hit (11–14) — the coincidental-collision
    * term stays ≈ n·occ·bands, still linear in n.
    */
  val bandsForRows: Map[Int, Int] = Map(
    8 -> 8, 9 -> 10, 10 -> 13, 11 -> 16, 12 -> 19, 13 -> 23, 14 -> 28,
    15 -> 35, 16 -> 42, 17 -> 51, 18 -> 62, 19 -> 76, 20 -> 92)

  /** Corpus-adaptive LSH shape (SURVEY §7f-0 / round-10 verdict item 1):
    * coincidental collisions between non-near-dup vectors contribute
    * ≈ n²·bands/2ʳᵒʷˢ candidate pairs — quadratic in corpus size for any
    * FIXED banding (measured exponent 2.07 at 40× data,
    * SCALE_CURVE_r10). Sizing rows with the corpus so mean bucket
    * occupancy stays ≤ `targetOcc` (2ʳᵒʷˢ ≥ n/occ, i.e.
    * rows = ⌈log₂(n/occ)⌉) makes that term ≈ n·occ·bands — linear —
    * while [[bandsForRows]] raises bands to hold recall. Floors at the
    * historical (8, 8) for n ≤ occ·2⁸ = 4096, which covers both
    * correctness scales (sf0.01 n=500, sf0.1 n=2000) — the oracle-gated
    * queries therefore run the EXACT pinned shape their static SQL
    * twins encode (spec-pinned in EmbeddingLshAutoSpec). Integer-exact
    * arithmetic (bit-length, no floating log) so any engine reproducing
    * the rule lands on the same shape.
    */
  def autoBanding(n: Long, targetOcc: Int = 16): (Int, Int) = {
    val m = math.max(1L, (n + targetOcc - 1) / targetOcc) // ceil(n/occ)
    val ceilLog2 =
      if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L)
    val rows = math.max(8, math.min(20, ceilLog2))
    (bandsForRows(rows), rows)
  }

  /** Embedding near-dup pairs via random-hyperplane LSH (Charikar): the
    * signature bit for hyperplane h is sign(v·h); `bands` bands of `rows`
    * bits each bucket the vectors, candidates share a band bucket, and
    * only candidates pay the exact-cosine verify. This is the 100 TB path
    * for embedding dedup — no low-cardinality band column (a popular
    * label/length bucket is O(bucket²)), bucket population is driven by
    * the data distribution itself, and the shuffle keys are (band, key)
    * ints.
    *
    * SIZING RULE (measured at 40× data, SCALE_CURVE_r10): coincidental
    * collisions between NON-near-dup vectors contribute
    * ≈ n²·bands/2^rows candidate pairs — quadratic in corpus size for
    * any FIXED banding. [[embeddingLshPairsAuto]] implements the sizing
    * rule (2^rows ≳ n/occ with [[bandsForRows]] holding recall on the
    * S-curve) and is the default entry point; this fixed-shape form
    * stays for pinned/oracle use and as the auto variant's target.
    */
  def embeddingLshPairs(emb: DataFrame, idCol: String, vecCol: String,
      bands: Int, rows: Int, threshold: Double,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bands * rows <= hyperplanes.length, "not enough hyperplanes")
    graft.plans.SignProjKeys.register(emb.sparkSession,
      hyperplanes.take(bands * rows), rows)
    val base = emb.select((idCol +: vecCol +: extraKeys).map(col): _*)
      .persist(Dedup.pairStorage)
    try {
      // all band keys in one native pass (graft.plans.SignProjKeys) —
      // bands×rows interpreted dot-folds would dominate the query
      val banded = base
        .select(col(idCol) +: extraKeys.map(col) :+ posexplode(
          graft.plans.SignProjKeys.signProjKeys(col(vecCol))): _*)
        .toDF((idCol +: extraKeys) ++ Seq("band", "bk"): _*)
      val other = banded.withColumnRenamed(idCol, s"${idCol}_b")
      // extraKeys join with (band, bk): candidates must share the LSH
      // bucket AND every extra key — a low-cardinality extra key (label)
      // alone would be O(bucket²); composed with the adaptive bucket it
      // only ever SHRINKS the LSH candidate set
      val pairs = banded.join(other, Seq("band", "bk") ++ extraKeys)
        .filter(col(idCol) < col(s"${idCol}_b"))
        .select(col(idCol).as("vec_a"), col(s"${idCol}_b").as("vec_b"))
        .distinct()
      // native one-pass cosine for the verify: bit-identical to the
      // dotD/norm formulation (same sequential folds), ~20× cheaper
      graft.plans.VecCosine.register(emb.sparkSession)
      pairs
        .join(base.select(col(idCol).as("vec_a"), col(vecCol)), "vec_a")
        .join(base.select(col(idCol).as("vec_b"), col(vecCol).as("_v_b")), "vec_b")
        .withColumn("cos", graft.plans.VecCosine.cosine(col(vecCol), col("_v_b")))
        .filter(col("cos") >= threshold)
        .select(col("vec_a"), col("vec_b"), col("cos"))
        .localCheckpoint(true)
    } finally {
      base.unpersist()
      // restore the session-global SQL function to the shape
      // GraftExtensions documents (pinned 64-plane / rows=8): the
      // adaptive registration above is needed only until the
      // localCheckpoint materializes, and leaving it would silently
      // hand later SQL callers drifted bucket keys
      graft.plans.SignProjKeys.register(emb.sparkSession,
        hyperplanes.take(64), 8)
    }
  }

  /** [[embeddingLshPairs]] with the (bands, rows) shape auto-sized from
    * the corpus via [[autoBanding]] — the default entry point (the fixed
    * shape stays available for pinned/oracle use). `n` comes from
    * Catalyst's logical-plan row-count stat when the plan carries one;
    * otherwise one `count()` job — on a parquet scan that is a
    * footer-metadata aggregate (no column data read), seconds against a
    * pair-generation query that scales in n·occ·bands, and exact where a
    * sizeInBytes-derived estimate could flip a ladder step between
    * engines. The chosen shape is logged to stderr so a run is
    * self-describing about which banding it used.
    */
  def embeddingLshPairsAuto(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, extraKeys: Seq[String] = Nil,
      targetOcc: Int = 16): DataFrame = {
    val n = emb.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(rc) => rc.toLong
      case None => emb.count()
    }
    val (bands, rows) = autoBanding(n, targetOcc)
    System.err.println(
      s"[graft] embeddingLshPairsAuto: n=$n -> bands=$bands rows=$rows " +
      s"(occ<=$targetOcc, coincidental~n*occ*bands)")
    embeddingLshPairs(emb, idCol, vecCol, bands, rows, threshold, extraKeys)
  }

  /** Embedding-cosine near-dup pairs, banded by a cluster/label column.
    * Norms are computed once per vector (before the pair fan-out), so each
    * pair costs a single dot-product fold.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
      bandCol: String, threshold: Double,
      keepBand: Boolean = false): DataFrame = {
    graft.plans.VecCosine.register(emb.sparkSession)
    val a = emb.select(col(bandCol), col(idCol), col(vecCol))
    val b = a.toDF(bandCol, s"${idCol}_b", s"${vecCol}_b")
    val out = (if (keepBand) Seq(col(bandCol)) else Seq.empty) ++ Seq(
      col(idCol).as("vec_a"), col(s"${idCol}_b").as("vec_b"), col("cos"))
    a.join(b, bandCol)
      .filter(col(idCol) < col(s"${idCol}_b"))
      .withColumn("cos",
        graft.plans.VecCosine.cosine(col(vecCol), col(s"${vecCol}_b")))
      .filter(col("cos") >= threshold)
      .select(out: _*)
  }
}
