package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.expressions.DecimalScaledDotImpl
import graft.ops.Similarity

/** Streaming face of the embedding pipeline: online semantic dedup —
  * q73's batch operator (SemDeDup, arXiv:2303.09540) re-expressed for
  * `readStream`, with the IVF cell as the state-partitioning key.
  */
object EmbeddingStreams {

  /** One dedup decision per arriving vector. `witness` is the kept
    * representative that caused a drop (None for kept rows).
    */
  case class DedupDecision(id: Long, cell: Long, kept: Boolean,
      witness: Option[Long])

  /** A kept representative in cell state: id + vector + precomputed
    * norm (the per-row self-dot hoist, same as the batch pair join).
    * Public: the state encoder's generated code must reach the
    * constructor and accessors (a private class fails Janino
    * compilation inside flatMapGroupsWithState).
    */
  case class Rep(id: Long, vec: Array[Float], norm: Double)

  /** ONLINE semantic dedup over a vector stream: each arriving vector
    * is assigned its IVF cell map-side (literal centroids — no join,
    * no shuffle beyond the cell groupBy), compared against the cell's
    * KEPT representatives via the same scaled-long cosine as the
    * batch operator, and dropped iff some kept rep scores ≥ `tau`
    * (that rep is the emitted witness); otherwise it becomes a rep
    * itself.
    *
    * Survivor semantics vs batch [[graft.ops.Dedup.semanticDedup]]:
    * the stream keeps the FIRST ARRIVAL of each duplicate group where
    * batch connected-components keeps the min id. The two agree
    * exactly when (a) within-cell duplicate groups are cliques at
    * `tau` (no A–B–C chain with A–C below tau — for the near-identical
    * duplicates dedup targets, they are) and (b) the stream replays in
    * id order; parity on that ground is spec-enforced
    * (`StreamingSemanticDedupSpec`). Transitive chains genuinely
    * differ: CC welds them into one group, the online pass keeps each
    * new member that clears every kept rep — the standard online/batch
    * SemDeDup trade, inherent to single-pass streaming (CC needs the
    * full pair graph).
    *
    * Scale shape: state per cell is its kept reps (id + dim floats +
    * norm) — the irreducible dedup memory; the cell key bounds
    * per-record comparisons to one cell's reps and spreads state
    * across executors. Zero-norm vectors are kept but never become
    * reps (no direction ⇒ near-dup of nothing — the batch map-side
    * filter's streaming analog). Within a micro-batch, a cell's rows
    * process in id order, making replay deterministic. For bounded
    * state horizons (dedup-within-a-window), swap NoTimeout for a
    * processing-time timeout that drops idle cells; unbounded history
    * dedup needs the full rep set by definition.
    */
  def semanticDedupStream(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], tau: Double): Dataset[DedupDecision] = {
    require(centroids.nonEmpty,
      "semanticDedupStream: no centroids (train on a batch sample first)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val assigned = vecs.select(
        col(idCol).cast("long").as("_1"),
        col(vecCol).cast("array<float>").as("_2"),
        Similarity.assignCell(col(vecCol), centroids).as("_3"))
      .as[(Long, Array[Float], Long)]
    assigned
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[Rep], DedupDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (cell, rows, state) =>
          var reps = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[DedupDecision]
          rows.toSeq.sortBy(_._1).foreach { case (id, vec, _) =>
            val norm = math.sqrt(DecimalScaledDotImpl.compute(vec, vec))
            if (norm == 0.0) out += DedupDecision(id, cell, kept = true, None)
            else {
              val hit = reps.find(r =>
                DecimalScaledDotImpl.compute(r.vec, vec) / (r.norm * norm) >= tau)
              hit match {
                case Some(r) =>
                  out += DedupDecision(id, cell, kept = false, Some(r.id))
                case None =>
                  reps = reps :+ Rep(id, vec, norm)
                  out += DedupDecision(id, cell, kept = true, None)
              }
            }
          }
          state.update(reps)
          out.result().iterator
      }
  }
}
