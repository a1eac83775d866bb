package graft.kv

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-packed reservation metadata word, faithful to the reference layout
  * `[epoch(16) | rts(16) | wts(16)]` at offsets 32/16/0
  * (`/root/reference/src/cuda/metadatahelper.cuh:94-105`).
  *
  * The engine normally keeps epoch/rts/wts as three columns (SURVEY.md
  * §1.1 — clearer and codegen-equivalent), but the packed form is the
  * exact wire format of the reference and is what a byte-compatible
  * export/import of reservation state would use. Pure shift/mask
  * expressions — whole-stage-codegen'd, no UDFs.
  */
object MetadataWord {
  private val Mask16 = 0xFFFFL

  /** Pack (epoch, rts, wts) — each must fit 16 bits, like the reference's
    * uint16 fields.
    */
  def pack(epoch: Column, rts: Column, wts: Column): Column =
    shiftleft(epoch.cast("long").bitwiseAND(Mask16), 32)
      .bitwiseOR(shiftleft(rts.cast("long").bitwiseAND(Mask16), 16))
      .bitwiseOR(wts.cast("long").bitwiseAND(Mask16))

  def epoch(word: Column): Column =
    shiftright(word, 32).bitwiseAND(Mask16).cast("int")

  def rts(word: Column): Column =
    shiftright(word, 16).bitwiseAND(Mask16).cast("int")

  def wts(word: Column): Column =
    word.bitwiseAND(Mask16).cast("int")
}
