package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identity generation (robosystems/schemas/base.py:19-21 — node ids
  * are UUIDv7 strings; robosystems/adapters/sec/processors/ids.py —
  * deterministic md5 content ids). */
object IdFunctions {

  /** UUIDv7 (RFC 9562): 48-bit unix-millis prefix (time-ordered — ids
    * sort by creation time, the property the reference relies on for
    * pk locality), version nibble 7, random tail. Non-deterministic by
    * design; use [[contentId]] for replay-stable identities. */
  def uuidv7(): Column = {
    val ts = unix_millis(current_timestamp())
    val randA = (rand() * 4096).cast("long") // 12 bits
    val randBHi = (rand() * 16384).cast("long") + 32768L // 2-bit variant 10 + 14 bits
    val randBLo = (rand() * 281474976710656L).cast("long") // 48 bits
    lower(concat(
      lpad(hex(shiftright(ts, 16)), 8, "0"), lit("-"),
      lpad(hex(ts.bitwiseAND(0xFFFFL)), 4, "0"), lit("-"),
      lit("7"), lpad(hex(randA), 3, "0"), lit("-"),
      lpad(hex(randBHi), 4, "0"), lit("-"),
      lpad(hex(randBLo), 12, "0")))
  }

  /** Deterministic content-derived id (md5 over the identifying tuple,
    * ids.py / xbrl_graph.py:563) — replays produce the same id, which
    * is what makes ignore-errors re-ingest idempotent. */
  def contentId(prefix: String, parts: Column*): Column =
    concat(lit(prefix), lit("_"), md5(concat_ws("|", parts: _*)))
}
