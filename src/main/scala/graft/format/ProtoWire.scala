package graft.format

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Shared protobuf wire-format primitives for the hand-rolled codecs
  * ([[TfExampleSerializer]], `graft.views.SubstraitPlans`). Exactly the
  * varint arithmetic and tag framing live here — the field-walking
  * loops stay with their codecs because their allocation profiles
  * differ (TfExample walks slices zero-copy on the per-record path;
  * Substrait parses plan-sized messages into copies). */
object ProtoWire {

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7F).toInt)
  }

  /** Decode one varint; returns (value, next offset). */
  def readVarint(b: Array[Byte], from: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = from
    while ({
      val x = b(p) & 0xFF
      v |= (x & 0x7FL) << shift; shift += 7; p += 1
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

  def writeTag(out: ByteArrayOutputStream, fieldNo: Int, wire: Int): Unit =
    writeVarint(out, (fieldNo.toLong << 3) | wire.toLong)

  def writeLenDelim(out: ByteArrayOutputStream, fieldNo: Int, body: Array[Byte]): Unit = {
    writeTag(out, fieldNo, 2)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  def writeVarintField(out: ByteArrayOutputStream, fieldNo: Int, v: Long): Unit = {
    writeTag(out, fieldNo, 0)
    writeVarint(out, v)
  }

  def writeStringField(out: ByteArrayOutputStream, fieldNo: Int, s: String): Unit =
    writeLenDelim(out, fieldNo, s.getBytes(UTF_8))
}

/** Shared JSON string escaping for the hand-rolled JSON writers
  * (Bench/Verify artifact lines, TfExample feature documents): quote,
  * backslash, and ALL control characters below 0x20. */
object Jsons {
  def escape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }
}
