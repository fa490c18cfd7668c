package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** JPEG SOF (start-of-frame) metadata from a binary column, as a packed
  * long — the variable-offset container parse that fixed-offset column
  * algebra (PNG's IHDR, WAV's fmt chunk) cannot express: a JPEG's
  * dimensions live in an SOF segment whose POSITION depends on the data
  * (every APPn/COM/DQT/DHT segment before it has its own 2-byte length),
  * so finding it is a genuine loop over the marker stream. That loop runs
  * here as a native expression — `eval` and the codegen'd path share ONE
  * static walk ([[JpegSofMeta.pack]]), so interpreted and compiled plans
  * cannot disagree — and stays inside whole-stage codegen like the rest
  * of the binary column algebra.
  *
  * Packing: `marker<<48 | width<<32 | height<<16 | precision<<8 | ncomp`
  * (JPEG dimensions are 16-bit by format, so the fields cannot collide);
  * NULL when the bytes are not a JPEG or no SOF precedes scan data. The
  * walk accepts any SOFn marker (C0–CF minus DHT C4 / JPG C8 / DAC CC),
  * skips fill bytes, and bails on a corrupt marker stream rather than
  * over-reading — real .jpg files parse, truncated ones return NULL.
  */
case class JpegSofMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_sof_meta"

  override def nullSafeEval(input: Any): Any = {
    val packed = JpegSofMeta.pack(input.asInstanceOf[Array[Byte]])
    if (packed < 0L) null else java.lang.Long.valueOf(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegSofMeta.pack($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegSofMeta {

  /** True for SOFn markers that carry frame dimensions. */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Byte offset just past the first SOFn segment — where the
    * container-aware dHash ([[DHash64Container]]) starts gridding the
    * payload region — or -1 under exactly [[pack]]'s failure conditions.
    * Same walk as pack (the length field of the SOF segment bounds it). */
  def sofEnd(bytes: Array[Byte]): Int = {
    if (bytes == null || bytes.length < 4) return -1
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return -1
    var pos = 2
    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return -1
      var markerAt = pos + 1
      while (markerAt + 2 < bytes.length && (bytes(markerAt) & 0xFF) == 0xFF)
        markerAt += 1
      val marker = bytes(markerAt) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return -1
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        pos = markerAt + 1
      } else {
        if (markerAt + 2 >= bytes.length) return -1
        val len = ((bytes(markerAt + 1) & 0xFF) << 8) |
          (bytes(markerAt + 2) & 0xFF)
        if (len < 2) return -1
        if (isSof(marker)) {
          if (markerAt + 8 >= bytes.length) return -1
          // a declared SOF length extending past the payload (truncated
          // body) must take the opaque fallback in hashContainer, not a
          // silent null hash that never pairs
          if (markerAt + 1 + len > bytes.length) return -1
          return markerAt + 1 + len
        }
        pos = markerAt + 1 + len
      }
    }
    -1
  }

  /** Walk the marker stream from SOI to the first SOFn and pack its
    * fields; -1 when `bytes` is not a JPEG, the stream is corrupt or
    * truncated, or scan data / EOI arrives before any SOF. Shared by
    * eval and codegen (called as a static forwarder from generated
    * Java). */
  def pack(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length < 4) return -1L
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return -1L
    var pos = 2
    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return -1L // lost marker alignment
      var markerAt = pos + 1
      // fill bytes: any number of 0xFF may pad before the marker id
      while (markerAt + 2 < bytes.length && (bytes(markerAt) & 0xFF) == 0xFF)
        markerAt += 1
      val marker = bytes(markerAt) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return -1L // EOI / SOS first
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        pos = markerAt + 1 // TEM / RSTn carry no length field
      } else {
        if (markerAt + 2 >= bytes.length) return -1L
        val len = ((bytes(markerAt + 1) & 0xFF) << 8) |
          (bytes(markerAt + 2) & 0xFF)
        if (len < 2) return -1L
        if (isSof(marker)) {
          if (markerAt + 8 >= bytes.length) return -1L // truncated SOF
          val precision = bytes(markerAt + 3) & 0xFF
          val height = ((bytes(markerAt + 4) & 0xFF) << 8) |
            (bytes(markerAt + 5) & 0xFF)
          val width = ((bytes(markerAt + 6) & 0xFF) << 8) |
            (bytes(markerAt + 7) & 0xFF)
          val nComp = bytes(markerAt + 8) & 0xFF
          return (marker.toLong << 48) | (width.toLong << 32) |
            (height.toLong << 16) | (precision.toLong << 8) | nComp.toLong
        }
        pos = markerAt + 1 + len
      }
    }
    -1L
  }
}
