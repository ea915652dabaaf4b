package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Chunk, ChunkJobs}

/** Token-window chunking + greedy sequence packing: overlap invariants,
  * lossless reconstruction, window-count boundaries, and greedy packing
  * semantics including the oversized-chunk case. */
class ChunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chunk-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkDoc(id: Long, nTokens: Int): (Long, String) =
    id -> (1 to nTokens).map(i => s"t$i").mkString(" ")

  private def chunksOf(nTokens: Int, size: Int, overlap: Int): Seq[Chunk] = {
    import spark.implicits._
    val docs = Seq(mkDoc(1L, nTokens)).toDF("doc_id", "text")
    ChunkJobs.chunk(docs, size, overlap).as[Chunk]
      .collect().sortBy(_.chunk_id).toSeq
  }

  test("window-count boundaries") {
    assert(chunksOf(32, 32, 8).map(_.n_tokens) == Seq(32))
    assert(chunksOf(33, 32, 8).map(_.n_tokens) == Seq(32, 9))   // 1 new token
    assert(chunksOf(56, 32, 8).map(_.n_tokens) == Seq(32, 32))  // exact cover
    assert(chunksOf(57, 32, 8).map(_.n_tokens) == Seq(32, 32, 9))
    assert(chunksOf(1, 32, 8).map(_.n_tokens) == Seq(1))
  }

  test("consecutive chunks share exactly `overlap` tokens") {
    val cs = chunksOf(100, 32, 8)
    cs.sliding(2).foreach { case Seq(a, b) =>
      val at = a.text.split(" ")
      val bt = b.text.split(" ")
      assert(at.takeRight(8).sameElements(bt.take(8)))
    }
  }

  test("dropping the overlap from each later chunk reconstructs the text") {
    for (n <- Seq(5, 32, 33, 80, 81, 100, 257)) {
      val cs = chunksOf(n, 32, 8)
      val rebuilt = (cs.head.text +: cs.tail.map(_.text.split(" ").drop(8).mkString(" ")))
        .filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == mkDoc(1L, n)._2, s"n=$n")
      assert(cs.map(_.n_tokens).sum == n + 8 * (cs.length - 1), s"n=$n token count")
    }
  }

  test("empty and whitespace-only docs produce no chunks") {
    import spark.implicits._
    val docs = Seq(1L -> "", 2L -> "   ", 3L -> "one two").toDF("doc_id", "text")
    val cs = ChunkJobs.chunk(docs, 32, 8).as[Chunk].collect()
    assert(cs.map(_.doc_id).toSet == Set(3L))
  }

  test("greedy packing: fills to budget, never splits a chunk") {
    import spark.implicits._
    // doc 1: chunks of 32,32,32,32,9 (n=105) with budget 100 -> packs [3,2]
    val docs = Seq(mkDoc(1L, 105)).toDF("doc_id", "text")
    val c = ChunkJobs.chunk(docs, 32, 8).as[Chunk]
    val packs = ChunkJobs.pack(spark, c, 100).collect().sortBy(_.pack_id)
    assert(packs.map(p => (p.n_chunks, p.n_tokens)).toSeq == Seq((3, 96), (2, 41)))
  }

  test("oversized chunk gets its own pack, nothing dropped") {
    import spark.implicits._
    val hand = Seq(
      Chunk(9L, 0, 10, "a"), Chunk(9L, 1, 50, "b"),  // 50 > budget 40
      Chunk(9L, 2, 10, "c"), Chunk(9L, 3, 10, "d"))
    val packs = ChunkJobs.pack(spark, spark.createDataset(hand), 40)
      .collect().sortBy(_.pack_id)
    assert(packs.map(p => (p.n_chunks, p.n_tokens)).toSeq ==
      Seq((1, 10), (1, 50), (2, 20)))
    assert(packs.map(_.n_chunks).sum == hand.length)
  }

  test("packing is per-document and deterministic across partitionings") {
    import spark.implicits._
    val docs = Seq(mkDoc(1L, 105), mkDoc(2L, 40), mkDoc(3L, 7)).toDF("doc_id", "text")
    val c = ChunkJobs.chunk(docs, 32, 8).as[Chunk]
    val a = ChunkJobs.pack(spark, c, 100).collect().sortBy(p => (p.doc_id, p.pack_id)).toSeq
    val b = ChunkJobs.pack(spark, c.repartition(7), 100)
      .collect().sortBy(p => (p.doc_id, p.pack_id)).toSeq
    assert(a == b)
    assert(a.map(_.doc_id).distinct == Seq(1L, 2L, 3L))
  }
}
