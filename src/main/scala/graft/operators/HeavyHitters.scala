package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed exact heavy hitters via per-partition Misra-Gries
  * candidate generation + a second exact counting pass.
  *
  * The scalable two-pass shape for "which tokens exceed total/k of a
  * 100 TB stream": pass 1 runs Misra-Gries with `capacity` counters
  * inside each partition (bounded memory, no shuffle, one sequential
  * scan) and emits only the surviving candidate keys; pass 2 exact-
  * counts just those candidates (the shuffle carries a vocabulary
  * bounded by capacity × partitions, not the corpus's long tail).
  *
  * Soundness (why no qualifying token is lost): if an item's global
  * count satisfies cnt·k > N, then by the mediant inequality some
  * partition p has f_p·k > N_p, i.e. f_p > N_p/k ≥ N_p/capacity when
  * capacity ≥ k — and Misra-Gries with `capacity` counters is
  * guaranteed to retain every item whose partition-local frequency
  * exceeds N_p/capacity. So the candidate set is a superset of the
  * true heavy hitters and the exact second pass makes the final
  * answer precise (no false positives either).
  *
  * Reference analogue: the reference delegates frequency analytics to
  * its warehouse (etl-rust docs/environment-variables.md:50-69 routes
  * tables to BigQuery); this is the engine-native form.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries summary: emits the surviving keys. */
  def candidates(tokens: Dataset[String], capacity: Int): Dataset[String] = {
    import tokens.sparkSession.implicits._
    tokens.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < capacity => counters.update(t, 1L)
          case None =>
            // decrement-all; drop zeros (amortized O(1) per input item)
            val dead = new scala.collection.mutable.ArrayBuffer[String]
            counters.foreach { case (k, c) =>
              if (c == 1L) dead += k else counters.update(k, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.distinct()
  }

  /** Exact heavy hitters: tokens whose global count × k exceeds the
    * total token count. `capacity` ≥ k preserves the superset
    * guarantee; larger capacities only shrink false-candidate counts.
    */
  def exact(tokens: Dataset[String], k: Int, capacity: Int): DataFrame = {
    require(capacity >= k, s"capacity $capacity must be >= k $k for the MG superset guarantee")
    val s = tokens.sparkSession
    val cand = candidates(tokens, capacity).toDF("term")
    val counted = tokens.toDF("term")
      .join(broadcast(cand), "term", "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = tokens.toDF("term").agg(count(lit(1)).as("total"))
    counted.join(broadcast(total))
      .filter(col("cnt") * k > col("total"))
      .select(col("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }
}
