package graft

import org.apache.spark.storage.StorageLevel

import graft.ops.Caches

/** The build-time persist registry: cached() persists and registers,
  * releaseAll() unpersists everything and empties the registry (so a
  * runner can call it after every query action without bookkeeping).
  */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("cached persists; releaseAll unpersists and is idempotent") {
    val df = Caches.cached(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    Caches.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE)
    Caches.releaseAll() // empty registry: no-op, no error
  }
}
