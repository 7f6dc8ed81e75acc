package graft.queries

/** Fixture-coupled calibration constants — every number here is
  * MEASURED against the current `/root/testdata` seed (via
  * `graft.RecallProbe`), not derived. If the fixtures are ever
  * regenerated with a new seed, these are the constants to re-pin;
  * `graft.queries.CalibrationSpec` re-measures each one against the
  * live fixtures and fails with the measured replacement value when a
  * floor no longer holds, so a seed change produces a self-explaining
  * artifact instead of a bare hash mismatch.
  *
  * Re-pin procedure: `sbt "runMain graft.RecallProbe /root/testdata/sfX"`
  * at all three scales, take the weakest measured value across scales,
  * and leave at least one full hit of margin (k·|Q| hits ⇒ one hit =
  * 1/(k·|Q|) of recall).
  */
object Calibration {

  /** q25: recall floor for MinHash LSH pairs (3-gram shingles,
    * 4 bands × 8 rows, τ=0.6) vs the exact-Jaccard pair set. Measured
    * recall 1.0 at sf0.001/0.01 and ≥0.9 at sf0.1 (RecallProbe r4–r7);
    * 0.75 keeps a multi-pair margin.
    */
  val MinhashRecallFloor = 0.75

  /** q78: recall floor for incremental (batch × corpus) LSH pairs vs
    * the exact cross-side Jaccard set. For any fixed pair the
    * candidate event is identical to q25's (same signatures, same
    * band collisions), but the floor is over a SUBSET of the pairs,
    * so it is measured separately (RecallProbe incremental section).
    * Measured 1.0 at sf0.001/0.1 and 0.93 (13/14) at sf0.01 (r7);
    * 0.75 keeps a two-pair margin at the weakest scale.
    */
  val IncrementalRecallFloor = 0.75

  /** q29: per-query recall@5 floor for `lshTopK(nPlanes=4, nTables=16)`
    * vs exact cosine. Measured per-query MIN 0.6 at all of
    * sf0.001/0.01/0.1 (RecallProbe r6, re-confirmed r7) — 0.4 keeps a
    * whole hit of margin.
    */
  val LshRecallFloor = 0.4

  /** q41/q75: MEAN recall@5 floor for IVF (8 cells, nProbe=3, and the
    * int8-quantized-rerank variant, measured recall-identical) vs the
    * exact dot path. Measured mean 0.60–0.66 at all three scales
    * (RecallProbe r6/r7).
    */
  val IvfMeanRecallFloor = 0.5

  /** q103: MEAN recall@5 floor for `projectedRerankTopK(projDim=32,
    * rerankFactor=8)` — the JL-shortlist + exact-re-rank path — vs
    * exact cosine. Measured mean 0.48/0.58/0.38 at sf0.001/0.01/0.1
    * (RecallProbe, after the seed-stride widening to 2²⁰ re-rolled
    * the sign matrix); 0.25 keeps a six-hit margin below the weakest
    * scale while staying far above the ~0.02 random-shortlist
    * baseline (40 of 2000 candidates). The synthetic near-isotropic
    * embeddings are the hard case for JL — real embedding corpora
    * cluster, raising recall at the same projDim.
    */
  val ProjectedRecallFloor = 0.25

  /** q105: MEAN recall@5 floor for `projectedQuantizedRerankTopK(
    * projDim=32, shortlistFactor=16, rerankFactor=4)` — the composed
    * JL-shortlist → int8-trim → exact-re-rank path — vs exact cosine.
    * Measured mean 0.74/0.76/0.52 at sf0.001/0.01/0.1 (RecallProbe
    * r8), IDENTICAL to the pure projected path at the same shortlist
    * width at every scale and parameter set — the int8 trim costs no
    * recall on the fixtures, the same result the IVF quantized arm
    * measured in r6/r7. 0.35 keeps an ~8-hit margin under the weakest
    * scale.
    */
  val ProjectedQuantizedRecallFloor = 0.35

  /** Index-lifecycle recall floor (r12 order #5, datum recorded r14):
    * MEAN recall@5 vs the exact survivor set of the COMPACTED tree
    * under FROZEN centroids (16 cells, nProbe=3) after the production
    * steady-state lifecycle — build on 75% of the corpus, append the
    * other 25% (drift), tombstone ~30%, fold. Measured by
    * `RecallProbe`'s ivf_lifecycle section at all three scales:
    * post_append 0.50/0.44/0.32, tombstoned 0.50/0.46/0.28,
    * compacted_frozen 0.50/0.46/0.28, maybeRetrain_fresh
    * 0.54/0.62/0.32 (sf0.001/0.01/0.1). Two results: (1) tombstoned ≡
    * compacted recall EXACTLY at every scale — compaction is purely a
    * layout op, folding + physical purge under the frozen quantizer
    * costs zero recall (the q141 identity law, now measured through
    * the full lifecycle); (2) fresh-centroid retrain ≥ frozen at
    * every scale (largest gap +0.16 at sf0.01) — the drift the
    * appendedFraction trigger watches is real, and maybeRetrain's
    * rebuild arm buys recall, never costs it. 0.4 keeps a five-hit
    * margin under the sf0.001 measurement the spec re-measures.
    */
  val IvfLifecycleFrozenRecallFloor = 0.4

  /** The divergence tolerance for the lifecycle's retrain-vs-frozen
    * comparison: fresh-centroid mean recall must not fall more than
    * ONE hit (1/(k·|Q|) = 0.02 at k=5, 10 queries) below the
    * frozen-centroid fold on the same survivors — i.e. retraining
    * never hurts. Measured fresh−frozen: +0.04/+0.16/+0.04 at
    * sf0.001/0.01/0.1.
    */
  val IvfLifecycleRetrainSlack = 0.02

  /** PRODUCTION-SCALE IVF operating point (r14 order #1): MEAN
    * recall@5 of the STORED index ([[graft.ops.AnnIndex
    * .searchIvfIndex]]) at the HALF-PROBE point — nCells=16,
    * nProbe=8, 50 queries — vs exact cosine. The full (nCells,
    * nProbe) grid (RecallProbe `ivf_grid`, NOTES r15) shows that on
    * the near-isotropic fixtures mean recall is a SCALE-STABLE
    * function of the probed fraction nProbe/nCells — mildly
    * super-linear in it, and improving with cell granularity at a
    * fixed fraction. Half-probe measured 0.844/0.832/0.784 at
    * sf0.001/0.01/0.1 (cells=16) and 0.932/0.912/0.872 (cells=64);
    * quarter-probe ≈ 0.54–0.79 across the grid. 0.7 keeps a ≥21-hit
    * margin (50·5 hits, one hit = 0.004) under the weakest scale.
    * UNLIKE the other floors this one is enforced at sf0.01 AND at
    * sf0.1 (two CalibrationSpec arms) — the scale-relevant recall
    * pins r14 "What's wrong" #1 asked for; sf0.1 is exactly the
    * scale where the old nProbe=3/16 default measured 0.28–0.32.
    *
    * OPERATING POINTS (isotropic worst case — real clustered
    * embedding corpora sit well above these at the same cost; the
    * fixtures are the adversarial floor):
    *   - probed fraction 1/8  → mean recall ≈ 0.45–0.65
    *   - probed fraction 1/4  → mean recall ≈ 0.54–0.79
    *   - probed fraction 1/2  → mean recall ≈ 0.78–0.93
    *   - probed fraction 1    → 1.0 (exact within the index)
    * Pick nCells ≈ √|C| ([[graft.ops.Similarity.adaptiveCellCount]] —
    * more cells is strictly better recall at a fixed fraction, paid
    * in quantizer size), then nProbe = fraction·nCells from the
    * target row, or let [[graft.ops.AnnIndex.searchIvfIndexConverged]]
    * widen per query (below).
    */
  val IvfHalfProbeRecallFloor = 0.7

  /** [[graft.ops.AnnIndex.searchIvfIndexConverged]] — adaptive
    * probe widening (nProbe0=1, cells=16, 50 queries): mean recall@5
    * floor vs exact cosine, enforced at sf0.01 beside the half-probe
    * point. Measured 0.928/0.936/0.836 at sf0.001/0.01/0.1 with mean
    * n_probe_used 13.3/13.8/12.2 — on the isotropic fixtures most
    * queries ride the ladder high (neighbors scatter across cells;
    * this IS the adversarial case), while the per-query widths show
    * the mode paying less wherever a query stabilizes early; at
    * cells=64 the mean probed fraction drops to ~0.55 for ~0.87
    * recall. 0.8 keeps a ≥34-hit margin under the enforced sf0.01
    * measurement.
    */
  val IvfConvergedRecallFloor = 0.8

  /** TWO-LEVEL index recall at the half-probed-fraction operating
    * point (8 coarse × 8 fine = 64 effective cells; nProbeCoarse=4,
    * nProbeFine=8 ⇒ probed fraction 1/2; 50 queries) vs exact cosine
    * — the equal-probed-fraction contract of r15 order #2. Measured
    * 0.772/0.724/0.736 at sf0.001/0.01/0.1 (RecallProbe `ivf2`),
    * vs the FLAT 64-cell index's 0.932/0.912/0.872 at the same
    * fraction: hierarchical quantization pays 0.14–0.19 recall on the
    * isotropic fixtures (coarse-level misses compound — this is the
    * adversarial case; clustered corpora pay less) and buys the
    * capacity past the 65,536-cell ceiling. Exhaustive probing is
    * exact (1.000 at every scale — the q159 identity). 0.6 keeps a
    * ≥ 31-hit margin under the weakest (sf0.01, enforced) scale.
    *
    * Re-pin: `runMain graft.RecallProbe <sf> grid`, read the `ivf2`
    * line's frac-0.50 point at all three scales, take the weakest,
    * leave ≥ 10 hits (0.04) of margin.
    */
  val Ivf2HalfFracRecallFloor = 0.6

  /** PQ arm recall at the same half-fraction operating point
    * (m=8 one-byte sub-codes, ks=256, rerankFactor=4) vs exact
    * cosine: measured 0.756/0.708/0.600 at sf0.001/0.01/0.1
    * (RecallProbe `ivf2_pq`), vs the exact two-level arm's
    * 0.772/0.724/0.736 — the 8-byte codes cost 0.02 recall at small
    * scale and up to 0.14 at sf0.1 on the isotropic fixtures (more
    * mass per cell ⇒ more near-ties the coarse reconstruction dot
    * cannot separate; raise rerankFactor to buy it back — the
    * generous-shortlist identity law q160 pins means the ceiling is
    * the exact arm). 0.55 keeps a ≥ 39-hit margin under the enforced
    * sf0.01 measurement. Re-pin: the `ivf2_pq` probe line, weakest
    * scale, ≥ 10 hits of margin.
    */
  val Ivf2PqRerank4RecallFloor = 0.55

  /** The equal-fraction SLACK bound pairing [[Ivf2HalfFracRecallFloor]]:
    * two-level recall at probed fraction 1/2 must sit within this of
    * the flat 64-cell index at the same fraction (measured gaps
    * 0.160/0.188/0.136 — the price of hierarchy, bounded so a
    * regression that quietly destroys the fine layer's usefulness
    * fails the spec rather than hiding under the absolute floor).
    */
  val Ivf2EqualFracSlack = 0.3

  /** The COST side of the converged-mode contract (r15 order #5):
    * ceiling on the MEAN PROBED FRACTION (mean n_probe_used / nCells)
    * of [[graft.ops.AnnIndex.searchIvfIndexConverged]] at the
    * calibration operating point (nCells=16, nProbe0=1, 50 queries,
    * sf0.01). The recall floors alone cannot catch a regression that
    * silently rides EVERY query to the exhaustive width (recall only
    * improves); this pins what the ladder PAYS. Measured mean
    * fraction 0.83/0.86/0.76 at sf0.001/0.01/0.1 (RecallProbe
    * ivf_converged — the isotropic fixtures are the adversarial
    * case; clustered corpora converge far lower, e.g. ~0.55 at
    * cells=64). 0.95 sits 9 points above the enforced sf0.01
    * measurement (one query widening one rung moves the mean by
    * 8/16/50 = 0.01, so ~9 queries of drift) while failing the
    * everything-exhaustive state (1.0) outright.
    *
    * Re-pin procedure: `runMain graft.RecallProbe <sf> grid` at all
    * three scales, read `mean probed frac` off the cells=16
    * ivf_converged line, take the LARGEST, and leave ≥ 5 queries of
    * margin (0.05) below 1.0 so the ceiling still has teeth.
    */
  val IvfConvergedMeanProbedFracCeiling = 0.95

  /** q73: semantic-dedup cosine threshold. Calibrated to the synthetic
    * embeddings, whose max pairwise cosine tops out near 0.45 (real
    * embedding models sit near 0.95+) — τ=0.4 keeps the operator
    * non-vacuous (some pairs dedup) without collapsing the corpus.
    */
  val SemanticDedupTau = 0.4
}
