package graft
object LnProbe {
  def main(args: Array[String]): Unit = {
    // dump Math.log for integers 1..200000 (the cnt/tot domain) as bits
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream("/tmp/ln_java.bin")))
    var i = 1L
    while (i <= 200000L) { out.writeLong(java.lang.Double.doubleToLongBits(math.log(i.toDouble))); i += 1 }
    out.close()
    println("done")
  }
}
