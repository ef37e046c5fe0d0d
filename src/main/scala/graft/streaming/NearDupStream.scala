package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming near-duplicate detection — MinHash-LSH over a document stream.
  *
  * The batch pipeline (`q_dedup_minhash_pairs`) computes signatures, bands
  * them, and self-joins band buckets. A stream can't self-join its own
  * history, so the bucket membership becomes KEYED STATE: documents shuffle
  * once on (band, bucket) and `flatMapGroupsWithState` holds each bucket's
  * previously-seen doc ids, emitting a candidate pair the moment a new doc
  * lands in an occupied bucket. The signature computation is the SAME
  * codegen'd column expressions as batch ([[Dedup.withMinhashSignature]]) —
  * streaming DataFrames accept them unchanged, so batch and stream can never
  * drift (NearDupStreamSpec drains the corpus through the stream and asserts
  * pair-set equality with the batch join).
  *
  * Scale posture: state per bucket is a doc-id list bounded by
  * `maxPerBucket`. A bucket past the cap stops emitting pairs and marks
  * itself saturated (one sentinel row with `dup_of = -1`) — an over-full
  * bucket means the banding is too coarse for the corpus (the batch
  * pipeline has the same Σn_b² blowup there), and silently emitting n²
  * pairs from a hot bucket would be the streaming version of that
  * explosion. No timeout: LSH buckets are content-addressed, not
  * time-windowed — members stay matchable forever, which is the semantics
  * of retroactive dedup (bound memory by capping, not by forgetting).
  */
object NearDupStream {

  final case class BandedDoc(band: Int, bucket: Long, doc_id: Long)

  /** `dup_of == -1` flags a saturated bucket (emitted once, when the cap is
    * first crossed). */
  final case class DupCandidate(doc_id: Long, dup_of: Long, band: Int, bucket: Long)

  final case class BucketState(members: List[Long], saturated: Boolean)

  /** docs → (band, bucket, doc_id) via the batch signature expressions.
    * Works on batch AND streaming frames (map-only, no state). `portable`
    * selects the hash domain exactly as in batch: the oracle-parity
    * tokHash (default — NearDupStreamSpec pins pair-set equality against
    * the oracle-checked batch join) or the saturation-free production
    * xxhash64 ([[Dedup.prodTokHash]] — what a production stream over a
    * large corpus should run, matching `graft curate`; the portable hash
    * crowds buckets as the corpus grows, which in the STREAMING shape
    * surfaces as saturated-bucket sentinels instead of quadratic pairs). */
  def bandedDocs(docs: DataFrame, tokensCol: String,
      portable: Boolean = true): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the shingle window needs ≥3 tokens (same guard every batch consumer
    // applies before withMinhashSignature) — WITHOUT it a 1-2-token doc is
    // a poison pill: sequence(1, size-2) walks through 0, element_at(_, 0)
    // throws, the micro-batch fails, and every restart replays the same
    // committed file and fails again. Short docs simply don't band.
    val guarded = docs.filter(size(col(tokensCol)) >= 3)
    Dedup.withMinhashSignature(guarded, tokensCol, portable)
      .select(col("doc_id"), explode(array(
        struct(lit(0).as("band"), col("band0").as("bucket")),
        struct(lit(1).as("band"), col("band1").as("bucket")))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("doc_id"))
      .as[BandedDoc]
  }

  def updateBucket(maxPerBucket: Int)(
      key: (Int, Long),
      docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[DupCandidate] = {
    val (band, bucket) = key
    // deterministic fold order within a micro-batch
    val arrivals = docs.toSeq.map(_.doc_id).distinct.sorted
    var st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
    // O(1) membership per arrival (List.contains per doc would make a hot
    // bucket O(n²) over its lifetime); the List stays the stored encoding
    var memberSet = st.members.toSet
    val out = Seq.newBuilder[DupCandidate]
    arrivals.foreach { id =>
      if (!memberSet.contains(id)) {
        if (st.saturated) {
          () // saturated: membership frozen, nothing emitted
        } else if (st.members.size >= maxPerBucket) {
          out += DupCandidate(id, -1L, band, bucket)
          st = st.copy(saturated = true)
        } else {
          st.members.foreach(prev => out += DupCandidate(id, prev, band, bucket))
          st = st.copy(members = id :: st.members)
          memberSet += id
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming candidate pairs: shuffle once on (band, bucket), stateful
    * emit-on-collision. Append-mode output. */
  def candidates(
      stream: DataFrame, tokensCol: String,
      maxPerBucket: Int = 10000,
      portable: Boolean = true): Dataset[DupCandidate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    bandedDocs(stream, tokensCol, portable)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateBucket(maxPerBucket))
  }
}
