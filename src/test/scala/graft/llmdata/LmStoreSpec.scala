package graft.llmdata

import graft.SparkSpec
import graft.sync.GenDir
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted unigram LM's vocabulary cap (r14, VERDICT r13 #6):
  * the 100-TB CCNet shape — persist only the top-K terms, floor the
  * rest to OOV — must cut a DETERMINISTIC boundary, keep the FULL
  * corpus total (capping must not inflate kept-term probabilities),
  * and score capped-out terms exactly at the floor the uncapped
  * model applies to genuinely-unseen tokens. The registered
  * `ingest_lm_gate_capped` entry's DuckDB oracle is generated from
  * the same K; this spec pins the store-level semantics directly. */
class LmStoreSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary cap: deterministic top-K boundary, full total preserved, capped-out terms at the OOV floor (r14 #6)") {
    val lmU = Files.createTempDirectory("graft-lm-u").toString
    val lmC = Files.createTempDirectory("graft-lm-c").toString
    val k = 5L
    val (vU, tU) = LmStore.write(spark, sf, lmU)
    val (vC, tC) = LmStore.write(spark, sf, lmC, keepTopK = Some(k))
    assert(tC === tU, "the cap must not change the total token count")
    assert(vC === k && vU > vC, s"vocab: uncapped $vU capped $vC")
    def freqOf(dir: String): Map[String, Long] =
      spark.read.parquet(s"${LmStore.resolveGen(spark, dir)}/freq.parquet")
        .select(col("term"), col("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (fU, fC) = (freqOf(lmU), freqOf(lmC))
    // the persisted slice IS the top-K at the (cnt desc, term asc)
    // boundary both engines cut
    val wantTop = fU.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(k.toInt).toMap
    assert(fC === wantTop, s"capped slice diverged:\n$fC\nvs\n$wantTop")
    // a capped-OUT term scores the OOV floor ln(1/total); the
    // uncapped model scores its true frequency — and an in-cap term
    // scores identically under both models
    val out = (fU.keySet -- fC.keySet).min
    val in = fC.keySet.min
    def microOf(dir: String, term: String): Long =
      LmStore.avgLogprob(spark, dir, Seq((1L, term)).toDF("doc_id", "text"))
        .select(col("micro_sum")).head.getLong(0)
    val floorMicro =
      math.floor(math.log(1.0 / tU.toDouble) * 1e6 + 0.5).toLong
    assert(microOf(lmC, out) === floorMicro,
      "capped-out term must score the OOV floor")
    assert(microOf(lmU, out) !==
      floorMicro, "the probe term must be IN the uncapped vocabulary")
    assert(microOf(lmC, in) === microOf(lmU, in),
      "in-cap terms must score identically under both models")
  }
}
