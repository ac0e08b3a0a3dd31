package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{DotF, Norm2F, PcmCodec, PcmDecode, PcmSynth}

/** The four custom expressions are the hot inner loops (vector kernels +
  * audio decode). Round 1 left them CodegenFallback; these tests force
  * actual code generation (GenerateUnsafeProjection.generate throws if the
  * emitted Java fails to compile) and assert parity with interpreted eval,
  * including the null paths. */
class CodegenSpec extends AnyFunSuite {

  private def farr(xs: Float*): ArrayData = ArrayData.toArrayData(xs.toArray)

  test("DotF/Norm2F codegen compiles and matches interpreted eval") {
    val a = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true)
    val b = BoundReference(1, ArrayType(FloatType, containsNull = false), nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(DotF(a, b), Norm2F(a)))
    val out = proj(InternalRow(farr(1.0f, 2.5f, -3f), farr(0.5f, 2f, 4f)))
    assert(out.getDouble(0) == 1.0 * 0.5 + 2.5 * 2.0 + -3.0 * 4.0)
    assert(out.getDouble(1) == 1.0 + 6.25 + 9.0)
    // interpreted parity on the same inputs
    assert(out.getDouble(0) == DotF(a, b).eval(InternalRow(farr(1.0f, 2.5f, -3f), farr(0.5f, 2f, 4f))))
    // null input propagates
    val out2 = proj(InternalRow(null, farr(1f)))
    assert(out2.isNullAt(0) && out2.isNullAt(1))
  }

  test("PcmSynth/PcmDecode codegen compiles, matches eval, handles nulls") {
    val freq = BoundReference(0, DoubleType, nullable = true)
    val sr = BoundReference(1, IntegerType, nullable = true)
    val dur = BoundReference(2, IntegerType, nullable = true)
    val codec = BoundReference(3, StringType, nullable = true)
    val synth = PcmSynth(Seq(freq, sr, dur, codec))
    val proj = GenerateUnsafeProjection.generate(Seq(synth, PcmDecode(synth, codec)))

    def row(c: Any) = InternalRow(440.0, 8000, 50, c)
    val out = proj(row(UTF8String.fromString("pcm_s16le")))
    assert(out.getBinary(0).length == 2 * 400)
    val arr = out.getArray(1)
    assert(arr.numElements() == 400)
    val expected = PcmCodec.decode(PcmCodec.synth(440.0, 8000, 50, "pcm_s16le"), "pcm_s16le")
    (0 until 400).foreach(i => assert(arr.getFloat(i) == expected(i)))

    // wav container round-trips through the generated code too
    val outWav = proj(row(UTF8String.fromString("wav")))
    assert(outWav.getBinary(0).length == 44 + 2 * 400)
    assert(outWav.getArray(1).numElements() == 400)

    // unsupported codec → null result, not a crash (tolerant semantics)
    val outStub = proj(row(UTF8String.fromString("opus-stub")))
    assert(outStub.isNullAt(0) && outStub.isNullAt(1))

    // null input → null result
    val outNull = proj(InternalRow(null, 8000, 50, UTF8String.fromString("wav")))
    assert(outNull.isNullAt(0) && outNull.isNullAt(1))
  }
}
