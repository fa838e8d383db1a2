package graft

import graft.expr.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after injection") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_hmac_sha256_hex('what do ya want for nothing?', 'Jefe')
           AS h,
         graft_array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                         array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
      """).head()
    assert(row.getString(0) ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    assert(row.getDouble(1) == 11.0)
  }

  test("fernet UDFs roundtrip from SQL") {
    GraftExtensions.register(spark)
    val key = java.util.Base64.getUrlEncoder
      .encodeToString("ABCDEFGHIJKLMNOPABCDEFGHIJKLMNOP".getBytes("US-ASCII"))
    val row = spark.sql(
      s"""SELECT graft_fernet_decrypt(
            graft_fernet_encrypt('top secret', '$key'), '$key') AS back,
          graft_fernet_encrypt('top secret', '$key') LIKE 'gAAAAA%' AS fmt
       """).head()
    assert(row.getString(0) == "top secret")
    assert(row.getBoolean(1))
  }

  test("array_dot rejects non-array inputs at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_array_dot('a', 'b')").head()
    }
    assert(e.getMessage.contains("graft_array_dot") ||
      e.getMessage.toLowerCase.contains("datatype"))
  }
}
