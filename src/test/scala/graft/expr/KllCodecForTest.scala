package graft.expr

/** test-scope bridge to the package-private KLL blob codec. */
object KllCodecForTest {
  def roundTrip(buf: KllBuf): KllBuf = KllExpr.fromBlob(KllExpr.toBlob(buf))
}
