package graft

class ModelsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("typed loaders round-trip the driver tables") {
    val ev = Models.events(spark, sf)
    assert(ev.head().event_id >= 0)
    assert(ev.count() === Tables.events(spark, sf).count())
    val doc = Models.documents(spark, sf).head()
    assert(doc.text.nonEmpty && doc.n_chars > 0)
    val emb = Models.embeddings(spark, sf).head()
    assert(emb.embedding.length === 64)
  }

  test("driver entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
