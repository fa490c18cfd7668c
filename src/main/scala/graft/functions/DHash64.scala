package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual difference hash (dHash) over a binary payload — the
  * standard image near-dup fingerprint (Krawetz's dHash: downscale to a
  * 9×8 luminance grid, hash the horizontal gradient signs), expressed
  * over an OPAQUE byte payload: the container codecs are not in this
  * environment, so the "downscale" treats the payload as a row-major
  * byte image and block-MEANS it into the 9×8 grid (72 contiguous
  * equal-share blocks — the honest resize stub: deterministic, local
  * edits perturb only their own blocks, exactly the property the real
  * pixel pipeline has), while the gradient-sign hash itself is the real
  * dHash algebra. Bit r·8+c is set when cell (r,c) < cell (r,c+1).
  * Swapping in a real decoder means replacing the block-mean sampler
  * with decoded luminance — the hash, banding, and verify join are
  * unchanged.
  *
  * Why an Expression: 72 block means per row over raw bytes is a fused
  * primitive loop (like [[PqCodes]]) — the column-algebra formulation
  * would be 72 substring/conv chains per row. Stays inside whole-stage
  * codegen; empty payloads hash to null (nothing to fingerprint).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"dhash64 needs BINARY input, got ${child.dataType}")
  }
  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else java.lang.Long.valueOf(DHash64.hash(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |if ($b.length == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.DHash64$$.MODULE$$.hash($b); }
       """.stripMargin)
}

/** Container-aware 64-bit dHash: parse the REAL container header the repo
  * already round-trips (#37c PNG fixed offsets / #37e JPEG marker walk),
  * then grid the DECODED-PAYLOAD REGION as a row-major image of the
  * header's parsed pixel WIDTH — the real dHash geometry, where the 9×8
  * cells tile the image plane, so an in-place edit perturbs exactly the
  * cells covering its pixel rectangle and appended/cropped ROWS leave
  * the upper grid untouched. The whole-payload [[DHash64]] has neither
  * property on containers: its cells are byte-stream slices, so the
  * header bytes (and any segment-length drift) smear into every cell.
  *
  *  - PNG (signature + IHDR): region = bytes after the 33-byte
  *    signature+IHDR block, width = the IHDR's big-endian width.
  *  - JPEG (SOI + marker walk to SOFn): region = bytes after the SOF
  *    segment, width = the SOF's width ([[JpegSofMeta.sofEnd]]).
  *  - Anything else: the opaque whole-payload block-mean fallback —
  *    one hash column serves a mixed-container corpus.
  *
  * The byte-per-pixel luminance is still the honest codec stub (the
  * container BODIES here are stand-in bytes; a real build swaps the
  * region sampler for decoded luminance), but header parsing, region
  * offsets, row-major grid geometry, and the gradient-sign hash are the
  * real pipeline. Empty payloads and empty regions hash to null. */
case class DHash64Container(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64_container"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"dhash64_container needs BINARY input, got ${child.dataType}")
  }
  override protected def withNewChildInternal(
      newChild: Expression): DHash64Container = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    DHash64.hashContainer(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val tmp = ctx.freshName("ch")
      s"""
         |java.lang.Long $tmp =
         |  graft.functions.DHash64$$.MODULE$$.hashContainer($b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
}

object DHash64 {
  /** Block-mean 9×8 grid + horizontal gradient signs; see class doc. */
  def hash(bytes: Array[Byte]): Long = hashRegion(bytes, 0)

  /** [[hash]] restricted to `bytes[off, bytes.length)` — the byte-stream
    * grid over a container's decoded-payload REGION (header excluded, so
    * segment-length drift stays out of every cell). */
  def hashRegion(bytes: Array[Byte], off: Int): Long = {
    val n = bytes.length - off
    val cells = new Array[Double](72)
    var k = 0
    while (k < 72) {
      val lo = off + (k.toLong * n / 72).toInt
      var hi = off + ((k + 1).toLong * n / 72).toInt
      if (hi <= lo) hi = math.min(lo + 1, bytes.length)
      var s = 0.0
      var i = lo
      while (i < hi) { s += (bytes(i) & 0xFF); i += 1 }
      cells(k) = s / math.max(hi - lo, 1)
      k += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c) < cells(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** dHash over the ROW-MAJOR image region `bytes[off, bytes.length)` of
    * `width` pixels (bytes) per row — the real dHash grid geometry: cell
    * (r, c) means the pixel rectangle rows [r·H/8, (r+1)·H/8) × cols
    * [c·W/9, (c+1)·W/9) with H = ceil(region / width), then the same
    * horizontal gradient-sign hash. A wholly-missing rectangle (ragged
    * last row) contributes 0.0. Null when the region or width is empty. */
  def hashImage(bytes: Array[Byte], off: Int,
                width: Int): java.lang.Long = {
    val n = bytes.length - off
    if (n <= 0 || width <= 0) return null
    val rows = (n + width - 1) / width
    // Degenerate geometry guard: the 8×9 grid needs ≥8 distinct pixel
    // rows and ≥9 distinct columns, or grid rows alias the SAME pixels —
    // a one-column edit then flips one bit in EVERY grid row (2 per
    // 16-bit band), which no Hamming band can survive. A region that
    // cannot fill the declared geometry (stub bodies; truncated files)
    // takes the region-anchored byte-stream grid instead: locality and
    // header-drift invisibility hold, geometry claims don't.
    if (rows < 8 || width < 9)
      return java.lang.Long.valueOf(hashRegion(bytes, off))
    val cells = new Array[Double](72)
    var r = 0
    while (r < 8) {
      val rLo = (r.toLong * rows / 8).toInt
      var rHi = ((r + 1).toLong * rows / 8).toInt
      if (rHi <= rLo) rHi = math.min(rLo + 1, rows)
      var c = 0
      while (c < 9) {
        val cLo = (c.toLong * width / 9).toInt
        var cHi = ((c + 1).toLong * width / 9).toInt
        if (cHi <= cLo) cHi = math.min(cLo + 1, width)
        var s = 0.0
        var cnt = 0
        var pr = rLo
        while (pr < rHi) {
          var pc = cLo
          val rowBase = off + pr * width
          while (pc < cHi) {
            val i = rowBase + pc
            if (i < bytes.length) { s += (bytes(i) & 0xFF); cnt += 1 }
            pc += 1
          }
          pr += 1
        }
        cells(r * 9 + c) = if (cnt == 0) 0.0 else s / cnt
        c += 1
      }
      r += 1
    }
    var h = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c) < cells(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(h)
  }

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Container-aware dHash (see [[DHash64Container]]): PNG → grid the
    * post-IHDR region at the IHDR width; JPEG → grid the post-SOF region
    * at the SOF width; anything else → the opaque whole-payload
    * [[hash]]. Null for empty payloads/regions. Shared by eval and
    * codegen. */
  def hashContainer(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.isEmpty) return null
    val isPng = bytes.length >= 33 && {
      var i = 0
      var ok = true
      while (ok && i < 8) { ok = bytes(i) == PngSig(i); i += 1 }
      ok && bytes(12) == 'I' && bytes(13) == 'H' &&
        bytes(14) == 'D' && bytes(15) == 'R'
    }
    if (isPng) {
      val width = ((bytes(16) & 0xFF) << 24) | ((bytes(17) & 0xFF) << 16) |
        ((bytes(18) & 0xFF) << 8) | (bytes(19) & 0xFF)
      return hashImage(bytes, 33, width)
    }
    val packed = JpegSofMeta.pack(bytes)
    if (packed >= 0L) {
      val width = ((packed >> 32) & 0xFFFFL).toInt
      val end = JpegSofMeta.sofEnd(bytes)
      if (end >= 0) return hashImage(bytes, end, width)
    }
    java.lang.Long.valueOf(hash(bytes))
  }
}
