package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiCryptoSpec extends SparkSpec {
  import spark.implicits._

  test("hashRow: one sha2 over the pipe-joined row, nulls -> n/a sentinel") {
    val df = Seq((1, "a", null.asInstanceOf[String]), (2, "a", null.asInstanceOf[String]))
      .toDF("k", "x", "y")
    val out = Pii.hashRow(df, Seq("x", "y")).select("hashed_jk").as[String].collect()
    assert(out(0) == out(1) && out(0).length == 64)
    assert(out(0) == Pii.sha256Hex("a|n/a"))
  }

  test("hashColumns anonymizes per column into <col>_hash") {
    val out = Pii.hashColumns(Seq(("secret", 1)).toDF("v", "k"), Seq("v"))
    assert(out.columns.contains("v_hash"))
    assert(out.select("v_hash").as[String].collect().head == Pii.sha256Hex("secret"))
  }

  test("scrubText replaces each PII match with its own sha256") {
    val text = "ssn 123-45-6789 and mail a@b.com end"
    val scrubbed = Pii.scrubText(Pii.DefaultPiiPatterns)(text)
    assert(scrubbed.contains(Pii.sha256Hex("123-45-6789")))
    assert(scrubbed.contains(Pii.sha256Hex("a@b.com")))
    assert(!scrubbed.contains("123-45-6789") && !scrubbed.contains("a@b.com"))
    assert(scrubbed.startsWith("ssn ") && scrubbed.endsWith(" end"))
    assert(Pii.scrubText(Pii.DefaultPiiPatterns)(null) == null)
  }

  test("mask in place vs _masked column") {
    val df = Seq(("card 1234", 1)).toDF("v", "k")
    assert(Pii.mask(df, "v", "[0-9]", "X").select("v").as[String].collect().head == "card XXXX")
    val out = Pii.mask(df, "v", "[0-9]", "X", inPlace = false)
    assert(out.select("v_masked").as[String].collect().head == "card XXXX")
    assert(out.select("v").as[String].collect().head == "card 1234")
  }

  test("identifyColumns: exact when commonFlag, substring otherwise") {
    val schema = Seq("email", "user_email", "name")
    assert(Pii.identifyColumns(schema, Seq(("email", true))) == Seq("email"))
    assert(Pii.identifyColumns(schema, Seq(("email", false))).toSet ==
      Set("email", "user_email"))
  }

  test("AES codec round-trips and restores null via the n/a sentinel") {
    val codec = AesCodec("salt", "secret")
    assert(codec.decrypt(codec.encrypt("hello")) == "hello")
    assert(codec.decrypt(codec.encrypt(null)) == "n/a")
    val df = Seq(("x", 1), (null.asInstanceOf[String], 2)).toDF("v", "k")
    val enc = Crypto.encryptColumns(df, Seq("v"), codec)
    assert(enc.filter(col("v").isNull).count() == 0) // nulls encrypted as sentinel
    val dec = Crypto.decryptColumns(enc, Seq("v"), codec)
    val back = dec.orderBy("k").select("v").collect().map(r => Option(r.getString(0)))
    assert(back.toSeq == Seq(Some("x"), None)) // sentinel restored to null
  }

  test("AES codec round-trips under fuzz: unicode, salts, keys, long strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random (salt, secret, plaintext) triples, plaintexts including
    // unicode and block-boundary lengths (15/16/17 bytes matter under
    // ECB/PKCS5): decrypt(encrypt(x)) must be exact, distinct keys or
    // salts must produce distinct ciphertexts for the same plaintext
    val genStr = Gen.oneOf(
      Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOf(Gen.oneOf('ü', 'é', '中', '€', 'a', ' ')).map(_.mkString),
      Gen.choose(0, 64).map("x" * _))
    val genCase = for {
      salt <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      key <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      text <- genStr
    } yield (salt.take(16), key.take(16), text)
    val prop = Prop.forAll(genCase) { case (salt, key, text) =>
      val codec = AesCodec(salt, key)
      val rt = codec.decrypt(codec.encrypt(text)) == text
      val other = AesCodec(salt + "z", key)
      val keyed = text.isEmpty ||
        codec.encrypt(text) != other.encrypt(text)
      if (!(rt && keyed))
        println(s"salt=$salt key=$key text=${text.take(40)} rt=$rt keyed=$keyed")
      rt && keyed
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("epoch cast only applies when the column exists") {
    val df = Seq((1000L, 1)).toDF("ts", "k")
    val out = Pii.epochMillisToTimestamp(df, "ts")
    assert(out.schema("ts").dataType.typeName == "timestamp")
    assert(Pii.epochMillisToTimestamp(df, "absent").columns.toSeq == Seq("ts", "k"))
  }
}
