package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, LongType}
import org.apache.spark.sql.types.Decimal

/** Order-preserving primitive packing of the keep-best ELECTION key
  * (`quality` DESC, ties to the LOWEST id) into one `DECIMAL(38,0)` —
  * the fix for the SortAggregate fallback on `max(struct(q, -id))`:
  * Spark's hash aggregation requires a mutable fixed-width aggregation
  * buffer, which structs (and binary) are not, so every keep-best
  * election paid an O(n log n) per-task sort on the group key; a
  * 128-bit decimal IS mutable in `UnsafeRow`, so `max(election_pack(q,
  * id))` plans as HashAggregate with map-side partial collapse
  * (PlanAuditSpec pins the plan, DedupSpec pins value-equivalence to
  * the struct form including null-quality and tie groups).
  *
  * Encoding (injective, total-order-preserving for (q ASC, id DESC)):
  * `s` = Lucene-style sortable bits of `q` (`bits ^ ((bits >> 63) &
  * 0x7fff…)`) — monotone with IEEE double ordering, NaN greatest,
  * -0.0 < 0.0, exactly Spark's own double comparator; a NULL quality
  * packs `s = Long.MinValue`, a slot no real double maps to, keeping
  * the struct form's nulls-lose-elections semantics. The key is
  * `s · 2^63 + (Long.MaxValue − id)`, lexicographic because the id term
  * sits in [0, 2^63) — which also requires `id ≥ 0` (enforced; crawl
  * doc ids are non-negative). |key| < 2^126 ≈ 8.5e37 fits
  * DECIMAL(38,0) with headroom. Null id → null key (a row without an
  * identity cannot win an election), matching max-ignores-null.
  */
object ElectionKey {
  private val SHIFT: java.math.BigInteger = java.math.BigInteger.ONE.shiftLeft(63)

  /** q-sortable-bits: monotone map double → signed long (Lucene trick). */
  def sortableBits(q: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(q)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }

  def pack(s: Long, id: Long): Decimal = {
    if (id < 0) throw new IllegalArgumentException(
      s"election_pack: id must be non-negative, got $id. The packed " +
        "election key reserves a 63-bit id slot (exact 64-bit quality + " +
        "full signed 64-bit id would need 128 bits; DECIMAL(38,0) holds " +
        "~127.2). For corpora with signed external ids use the " +
        "struct-election twins graft.llm.Dedup.urlKeepBestFullRange / " +
        "exactKeepBestFullRange, which cover the entire Long range.")
    val bi = java.math.BigInteger.valueOf(s).shiftLeft(63)
      .add(java.math.BigInteger.valueOf(Long.MaxValue - id))
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  def unpackId(key: Decimal): Long = {
    val bi = key.toJavaBigDecimal.toBigInteger
    Long.MaxValue - bi.mod(SHIFT).longValueExact()
  }

  /** Sortable-bits component of the key; Long.MinValue = packed null q. */
  def unpackS(key: Decimal): Long = {
    val bi = key.toJavaBigDecimal.toBigInteger
    bi.subtract(bi.mod(SHIFT)).shiftRight(63).longValueExact()
  }

  def bitsToDouble(s: Long): Double = {
    val bits = s ^ ((s >> 63) & 0x7fffffffffffffffL)
    java.lang.Double.longBitsToDouble(bits)
  }
}

/** `election_pack(quality, id)` → DECIMAL(38,0); see [[ElectionKey]].
  * Custom null handling: null id → null key; null quality → the
  * below-all-doubles slot (so null-quality rows still lose elections
  * deterministically by id, the struct form's semantics). */
case class ElectionPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  // always true so doGenCode's isNull slot is a real variable (the
  // FalseLiteral fast path would make the declarations below invalid)
  override def nullable: Boolean = true
  override def prettyName: String = "election_pack"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ElectionPack =
    copy(left = newLeft, right = newRight)

  override def eval(input: InternalRow): Any = {
    val idAny = right.eval(input)
    if (idAny == null) return null
    val qAny = left.eval(input)
    val s = if (qAny == null) Long.MinValue
            else ElectionKey.sortableBits(qAny.asInstanceOf[Double])
    ElectionKey.pack(s, idAny.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val qGen = left.genCode(ctx)
    val idGen = right.genCode(ctx)
    val s = ctx.freshName("sbits")
    val helper = ElectionKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${idGen.code}
        boolean ${ev.isNull} = ${idGen.isNull};
        org.apache.spark.sql.types.Decimal ${ev.value} = null;
        if (!${ev.isNull}) {
          ${qGen.code}
          long $s = ${qGen.isNull}
            ? Long.MIN_VALUE
            : $helper.sortableBits(${qGen.value});
          ${ev.value} = $helper.pack($s, ${idGen.value});
        }""")
  }
}

/** `election_id(key)` → BIGINT: the winning id of a packed election key. */
case class ElectionId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "election_id"
  override protected def withNewChildInternal(newChild: Expression): ElectionId =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ElectionKey.unpackId(input.asInstanceOf[Decimal]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ElectionKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $helper.unpackId($k);")
  }
}

/** `election_quality(key)` → DOUBLE: the winning quality of a packed
  * election key — exact bit round-trip; null when the winner's quality
  * was null. */
case class ElectionQuality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "election_quality"
  override protected def withNewChildInternal(newChild: Expression): ElectionQuality =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val k = child.eval(input)
    if (k == null) return null
    val s = ElectionKey.unpackS(k.asInstanceOf[Decimal])
    if (s == Long.MinValue) null
    else java.lang.Double.valueOf(ElectionKey.bitsToDouble(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kGen = child.genCode(ctx)
    val s = ctx.freshName("sbits")
    val helper = ElectionKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${kGen.code}
        boolean ${ev.isNull} = ${kGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          long $s = $helper.unpackS(${kGen.value});
          if ($s == Long.MIN_VALUE) { ${ev.isNull} = true; }
          else { ${ev.value} = $helper.bitsToDouble($s); }
        }""")
  }
}
