package graft.aria

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seed-stable YCSB-style workload generator (SURVEY.md §2 O12/O13).
  *
  * Reference: `Transction::generate` draws op_count ~ U[0,max_ops],
  * key[i] ~ U[1,keys_max], update[i] ~ Bernoulli(WR_rate) from one global
  * seeded engine (`/root/reference/src/database/ycsb/Transction_y.h:17-26`,
  * `random.h:8-41`); defaults WR_rate=0.4, max_ops=30, keys_max=20000
  * (`Transction.h:24-33`).
  *
  * Spark re-expression: a *per-txn* seed (seed+tid) instead of one global
  * stream, so generation is embarrassingly parallel and independent of
  * partitioning — the documented seeding scheme of SURVEY.md §7.4 (bit-compat
  * with the reference's curand streams is a non-goal; determinism of OUR
  * scheme is what tests assert). Generated via mapPartitions over
  * spark.range, so a billion-txn batch generates with no driver involvement.
  */
object TxnGen {
  case class Config(
      wrRate: Double = 0.4,
      maxOps: Int = 30,
      keysMax: Long = 20000,
      seed: Long = 0)

  case class Op(tid: Long, opIdx: Int, k: Long, isUpdate: Boolean)

  /** Exploded ops batch for txns with Tids 1..nTxns (1-based: Tid 0 means
    * "no reservation", `TrancM_func.cuh:138`).
    */
  def ops(spark: SparkSession, nTxns: Long, cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    // keysMax is sampled via nextInt; larger keyspaces would silently
    // narrow (keysMax.toInt) into a wrong or negative bound
    require(cfg.keysMax <= Int.MaxValue,
      s"keysMax ${cfg.keysMax} exceeds Int.MaxValue")
    spark.range(1, nTxns + 1).as[Long].mapPartitions { tids =>
      tids.flatMap { tid =>
        val rng = new scala.util.Random(cfg.seed + tid)
        val nOps = rng.nextInt(cfg.maxOps + 1)
        (0 until nOps).map { i =>
          Op(tid, i, 1L + rng.nextInt(cfg.keysMax.toInt).toLong,
            rng.nextDouble() < cfg.wrRate)
        }
      }
    }.toDF()
  }

  /** 10×10 printable-char payload fields (ASCII 33–126), the reference's
    * `Value::generate` (`/root/reference/src/cuda/kv.cuh:64-78`), seeded per
    * key so bulk load is deterministic and partition-independent.
    */
  def payload(seed: Long, k: Long): Array[String] = {
    val rng = new scala.util.Random(seed ^ (k * 0x9E3779B97F4A7C15L))
    Array.fill(10)(new String(Array.fill(10)((33 + rng.nextInt(94)).toChar)))
  }

  /** O11 bulk load: keys 1..n-1 (the reference starts at i=1; key 0 is the
    * invalid sentinel, `db.h:42-53`) with seeded payloads and zeroed
    * reservation metadata (epoch/rts/wts = 0).
    */
  def bulkLoad(spark: SparkSession, n: Long, seed: Long = 0): DataFrame = {
    import spark.implicits._
    spark.range(1, n).as[Long].mapPartitions { keys =>
      keys.map { k =>
        val f = payload(seed, k)
        (k, f, 0, 0, 0)
      }
    }.toDF("k", "fields", "epoch", "rts", "wts")
  }
}
