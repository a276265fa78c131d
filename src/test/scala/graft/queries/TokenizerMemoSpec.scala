package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the trained-tokenizer session memo (VERDICT r16 #2): within
  * one session, `text_bpe_apply` / `pipe_pack_sequences_trained` /
  * `text_bpe_train` (and the unigram trio) share ONE training run —
  * the memo value is the collected k-row / vocab-sized model, so a
  * second consumer is a map lookup, not a driver-loop retrain. Evict
  * retrains; the unigram seed-cap conf is part of the key (a capped
  * model is a DIFFERENT model, not a staler one). */
class TokenizerMemoSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("bpe: one training run serves every consumer; evict retrains") {
    val spark = graft.sources.SparkTestSession.spark
    TextOps.evictTokenizerModels(spark, sf)
    val r0 = TextOps.bpeTrainRuns.get()
    val m1 = TextOps.bpeModel(spark, sf)
    val m2 = TextOps.bpeModel(spark, sf)
    assert(TextOps.bpeTrainRuns.get() === r0 + 1, "second call retrained")
    assert(m1 eq m2, "memo must return the same model instance")
    assert(m1.nonEmpty && m1.map(_._1) === (1 to m1.length).toVector)
    TextOps.evictTokenizerModels(spark, sf)
    val m3 = TextOps.bpeModel(spark, sf)
    assert(TextOps.bpeTrainRuns.get() === r0 + 2, "evict must retrain")
    assert(m3 === m1, "retrained model must be deterministic")
  }

  test("unigram: memoized per (dir, seed cap); capped model is a distinct key") {
    val spark = graft.sources.SparkTestSession.spark
    TextOps.evictTokenizerModels(spark, sf)
    val r0 = TextOps.unigramTrainRuns.get()
    val uncapped = TextOps.unigramModel(spark, sf)
    assert(TextOps.unigramModel(spark, sf) eq uncapped)
    assert(TextOps.unigramTrainRuns.get() === r0 + 1)
    spark.conf.set("spark.graft.unigram.maxSeedVocab", "10")
    try {
      val capped = TextOps.unigramModel(spark, sf)
      assert(TextOps.unigramTrainRuns.get() === r0 + 2,
        "capped seed vocab is a different model and must train")
      assert(capped !== uncapped)
      // flipping the conf back serves the original memo entry
      spark.conf.unset("spark.graft.unigram.maxSeedVocab")
      assert(TextOps.unigramModel(spark, sf) eq uncapped)
      assert(TextOps.unigramTrainRuns.get() === r0 + 2)
    } finally {
      spark.conf.unset("spark.graft.unigram.maxSeedVocab")
      TextOps.evictTokenizerModels(spark, sf)
    }
  }
}
