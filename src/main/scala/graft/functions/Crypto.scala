package graft.functions

import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level AES encryption matching the reference's scheme (reference
  * M/utility/Crypt.scala:16-32, M/utility/Utility.scala:100-133): key =
  * first 16 bytes of SHA-1(salt + key), AES/ECB/PKCS5Padding, Base64 text,
  * with the "n/a" sentinel standing in for NULL so encrypted columns stay
  * non-null and round-trip back to NULL on decrypt.
  *
  * Spark's builtin `aes_encrypt` (GCM, random IV) is non-deterministic and
  * derives keys differently, so byte-compatibility requires this UDF pair.
  * Secrets come from plain config values, not any vendor secret store.
  */
final case class AesCodec(salt: String, secret: String) extends Serializable {
  @transient private lazy val keySpec: SecretKeySpec = {
    val sha = MessageDigest.getInstance("SHA-1")
    val raw = sha.digest((salt + secret).getBytes("UTF-8")).take(16)
    new SecretKeySpec(raw, "AES")
  }

  def encrypt(plain: String): String = {
    val v = if (plain == null) "n/a" else plain
    val c = Cipher.getInstance("AES/ECB/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, keySpec)
    Base64.getEncoder.encodeToString(c.doFinal(v.getBytes("UTF-8")))
  }

  def decrypt(cipherText: String): String = {
    if (cipherText == null) return null
    val c = Cipher.getInstance("AES/ECB/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE, keySpec)
    new String(c.doFinal(Base64.getDecoder.decode(cipherText)), "UTF-8")
  }
}

object Crypto {

  def encryptUdf(codec: AesCodec): Column => Column = {
    val f = udf((s: String) => codec.encrypt(s))
    c => f(c)
  }

  def decryptUdf(codec: AesCodec): Column => Column = {
    val f = udf((s: String) => codec.decrypt(s))
    c => f(c)
  }

  /** `encryptIt` (ref M/utility/Utility.scala:100-115): encrypt listed columns
    * in place; NULLs become encrypted "n/a". */
  def encryptColumns(df: DataFrame, cols: Seq[String], codec: AesCodec): DataFrame = {
    val enc = encryptUdf(codec)
    cols.foldLeft(df)((d, c) => d.withColumn(c, enc(col(c).cast("string"))))
  }

  /** `decryptIt` (ref M/utility/Utility.scala:117-133): decrypt listed columns
    * and restore the "n/a" sentinel back to NULL. */
  def decryptColumns(df: DataFrame, cols: Seq[String], codec: AesCodec): DataFrame = {
    val dec = decryptUdf(codec)
    cols.foldLeft(df) { (d, c) =>
      val plain = dec(col(c))
      d.withColumn(c, when(plain === "n/a", lit(null)).otherwise(plain))
    }
  }
}
