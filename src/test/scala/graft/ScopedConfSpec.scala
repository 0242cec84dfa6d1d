package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftshim.ScopedConf

/** The scoped-conf clone cache must (a) actually scope the override,
  * (b) reuse clones across calls, (c) stay bounded, and (d) release a
  * retired parent session under churn — the r10 WeakHashMap design
  * could never release one (the cached clone strongly referenced the
  * parent's SessionState, so the weak key was uncollectible). */
class ScopedConfSpec extends AnyFunSuite {
  import TestSpark._

  test("override is visible inside the body and absent outside") {
    val df = spark.range(10).toDF("x")
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val outer = spark.conf.get(key)
    ScopedConf.withScopedConf(df, Seq(key -> "12345b")) { scoped =>
      assert(scoped.sparkSession.conf.get(key) == "12345b")
      assert(scoped.count() == 10)
    }
    assert(spark.conf.get(key) == outer)
  }

  test("same (session, overrides) reuses one clone; cache stays bounded") {
    val df = spark.range(3).toDF("x")
    val confs = Seq("spark.sql.shuffle.partitions" -> "7")
    var s1: org.apache.spark.sql.SparkSession = null
    var s2: org.apache.spark.sql.SparkSession = null
    ScopedConf.withScopedConf(df, confs)(d => s1 = d.sparkSession)
    ScopedConf.withScopedConf(df, confs)(d => s2 = d.sparkSession)
    assert(s1 eq s2, "identical overrides must reuse the cached clone")

    // flood with distinct override sets: the cache must stay <= its bound
    (0 until 64).foreach { i =>
      ScopedConf.withScopedConf(df,
        Seq("spark.sql.shuffle.partitions" -> (8 + i).toString))(_.count())
    }
    assert(ScopedConf.cacheSize <= 32, s"cache grew to ${ScopedConf.cacheSize}")
  }

  test("invalidate drops a retired session's clones deterministically") {
    val df = spark.range(2).toDF("x")
    ScopedConf.withScopedConf(df,
      Seq("spark.sql.shuffle.partitions" -> "11"))(_.schema)
    assert(ScopedConf.cacheSize > 0)
    // the embedder contract: retiring a session calls invalidate(session)
    // instead of waiting for LRU churn
    ScopedConf.invalidate(spark)
    assert(ScopedConf.cacheSize == 0,
      "invalidate must drop every clone keyed to the session")
  }

  test("the application-end listener clears the whole cache") {
    val df = spark.range(2).toDF("x")
    ScopedConf.withScopedConf(df,
      Seq("spark.sql.shuffle.partitions" -> "13"))(_.schema)
    assert(ScopedConf.cacheSize > 0)
    // fire the hook directly (stopping the shared test context would
    // kill every other suite); registration itself is exercised by any
    // withScopedConf call above
    new ScopedConf.CleanupListener().onApplicationEnd(
      org.apache.spark.scheduler.SparkListenerApplicationEnd(0L))
    assert(ScopedConf.cacheSize == 0,
      "application end must clear the clone cache")
  }

  test("a retired parent session's clones become collectible under churn") {
    // scope the parent inside a helper so no local slot keeps it alive
    def makeAndUseParent(): java.lang.ref.WeakReference[Object] = {
      val parent = spark.newSession()
      // analysis-only body: an ACTION here could leak `parent` into
      // inheritable thread-locals of lazily-spawned driver pool threads
      // (a Spark-side retention unrelated to the cache under test)
      ScopedConf.withScopedConf(parent.range(2).toDF("x"),
        Seq("spark.sql.shuffle.partitions" -> "5")) { d =>
        assert(d.sparkSession.conf.get("spark.sql.shuffle.partitions") == "5")
        d.schema
      }
      new java.lang.ref.WeakReference[Object](parent)
    }
    val weakParent = makeAndUseParent()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    // churn the LRU past its bound with clones of the MAIN session so
    // the retired parent's entry evicts
    (0 until 40).foreach { i =>
      ScopedConf.withScopedConf(spark.range(1).toDF("x"),
        Seq("spark.sql.shuffle.partitions" -> (100 + i).toString))(_.count())
    }
    var cleared = false
    var attempts = 0
    while (!cleared && attempts < 20) {
      System.gc()
      Thread.sleep(50)
      cleared = weakParent.get() == null
      attempts += 1
    }
    assert(cleared,
      "evicted clone must release the parent session (r10 retention bug)")
  }
}
