package graft.engine

import org.apache.spark.sql.SparkSession

/** S3A credential/endpoint configuration — operator K6 in SURVEY.md §2.2.
  *
  * The reference sets five conf keys on the session before writing
  * (`unload_databricks_data_to_s3.py:465-473`): the temporary-credentials
  * provider, access key, secret key, session token and endpoint. The same
  * key surface is exposed here; on a local filesystem it is a no-op (the
  * `file://` scheme never consults `fs.s3a.*`), so tests assert the mapping
  * rather than a live S3 round-trip.
  *
  * Keys are set on BOTH the runtime conf (what the reference does — DBR
  * forwards it) and the SparkContext Hadoop conf (what OSS s3a actually
  * reads), so the shim works on either distribution.
  */
object S3Conf {

  final case class S3Credentials(
      accessKey: String,
      secretKey: String,
      sessionToken: String,
      endpoint: String
  )

  val ProviderKey = "fs.s3a.aws.credentials.provider"
  val AccessKeyKey = "fs.s3a.access.key"
  val SecretKeyKey = "fs.s3a.secret.key"
  val SessionTokenKey = "fs.s3a.session.token"
  val EndpointKey = "fs.s3a.endpoint"

  /** Provider class for STS-style triplet credentials — same literal the
    * reference sets (`unload_databricks_data_to_s3.py:465`).
    */
  val TemporaryProvider = "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"

  def keyValues(creds: S3Credentials): Seq[(String, String)] = Seq(
    ProviderKey -> TemporaryProvider,
    AccessKeyKey -> creds.accessKey,
    SecretKeyKey -> creds.secretKey,
    SessionTokenKey -> creds.sessionToken,
    EndpointKey -> creds.endpoint
  )

  def configure(spark: SparkSession, creds: S3Credentials): Unit =
    keyValues(creds).foreach { case (k, v) =>
      spark.conf.set(k, v)
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
