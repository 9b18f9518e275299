package graft.sources

import org.apache.spark.sql.SparkSession

/** Cloud object-store paths (reference `crates/polars-io/src/cloud/` —
  * `options.rs` CloudOptions, `object_store_setup.rs`): polars resolves
  * `s3://`/`gs://`/`az://` URIs plus per-call `storage_options` into an
  * object-store client. Spark's equivalent is the Hadoop FileSystem layer:
  * the SAME `spark.read.parquet(path)` call serves any store once the
  * scheme resolves to a connector and the credentials sit in the Hadoop
  * configuration. This module is that mapping, made explicit and testable
  * without network:
  *
  *   - [[normalize]] — polars URI scheme → the Hadoop-connector scheme
  *     (`s3://` → `s3a://`; `az://container@account/key` → the ABFS URI).
  *   - [[hadoopConf]] — polars `storage_options` keys → the documented
  *     `fs.*` Hadoop keys, per scheme.
  *   - [[configure]] — apply both to a live session, returning the
  *     normalized path to hand to `spark.read`.
  *
  * Connector jars (NOT in this offline container, standard on any cloud
  * Spark distro): `hadoop-aws` + AWS SDK bundle for s3a,
  * `gcs-connector` for gs, `hadoop-azure` for abfss. With the jars
  * present, `configure(spark, path, opts)` then `spark.read.parquet(...)`
  * is the complete deploy story; everything this module emits is plain
  * configuration, so it is exercised by spec offline.
  */
object CloudPaths {

  /** polars URI → the scheme Spark's Hadoop connectors register.
    * `s3://` rides the s3a connector; `az://container@account/key`
    * becomes `abfss://container@account.dfs.core.windows.net/key`;
    * `gs://`, `s3a://`, `abfss://`, `hdfs://`, `file://` and bare local
    * paths pass through. */
  def normalize(path: String): String = path match {
    case p if p.startsWith("s3://") => "s3a://" + p.stripPrefix("s3://")
    case p if p.startsWith("az://") || p.startsWith("azure://") =>
      val rest = p.stripPrefix("az://").stripPrefix("azure://")
      rest.split("/", 2) match {
        case Array(containerAt, key) if containerAt.contains("@") =>
          val Array(container, account) = containerAt.split("@", 2)
          s"abfss://$container@$account.dfs.core.windows.net/$key"
        case _ => throw new IllegalArgumentException(
          s"az:// path must be az://<container>@<account>/<key>: $path")
      }
    case p => p
  }

  /** polars `storage_options` → Hadoop configuration keys for the path's
    * scheme. Unknown option keys raise (same strictness as the reference's
    * CloudOptions parse — a typo'd credential key must not silently become
    * an anonymous request). */
  def hadoopConf(path: String, options: Map[String, String]): Map[String, String] = {
    val scheme = normalize(path).takeWhile(_ != ':')
    scheme match {
      case "s3a" =>
        options.map {
          case ("aws_access_key_id", v)     => "fs.s3a.access.key" -> v
          case ("aws_secret_access_key", v) => "fs.s3a.secret.key" -> v
          case ("aws_session_token", v)     => "fs.s3a.session.token" -> v
          case ("aws_region", v)            => "fs.s3a.endpoint.region" -> v
          case ("endpoint_url", v)          => "fs.s3a.endpoint" -> v
          case ("anonymous", "true") => "fs.s3a.aws.credentials.provider" ->
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
          case (k, _) => throw new IllegalArgumentException(
            s"unknown s3 storage option: $k")
        }
      case "gs" =>
        options.map {
          case ("service_account_path", v) =>
            "google.cloud.auth.service.account.json.keyfile" -> v
          case ("project_id", v) => "fs.gs.project.id" -> v
          case (k, _) => throw new IllegalArgumentException(
            s"unknown gcs storage option: $k")
        }
      case "abfss" =>
        val account = normalize(path).split("@", 2)(1).takeWhile(_ != '/')
        options.map {
          case ("account_key", v) => s"fs.azure.account.key.$account" -> v
          case ("sas_token", v)   => s"fs.azure.sas.fixed.token.$account" -> v
          case (k, _) => throw new IllegalArgumentException(
            s"unknown azure storage option: $k")
        }
      case _ if options.isEmpty => Map.empty
      case other => throw new IllegalArgumentException(
        s"storage options given for non-cloud scheme $other")
    }
  }

  /** Resolve `path` + `storageOptions` against a live session: credentials
    * land in the session's Hadoop configuration (the per-session scope
    * Spark reads for every FileSystem it opens), and the returned
    * normalized path goes straight to `spark.read`/`df.write`. */
  def configure(spark: SparkSession, path: String,
                storageOptions: Map[String, String] = Map.empty): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    hadoopConf(path, storageOptions).foreach { case (k, v) => conf.set(k, v) }
    normalize(path)
  }
}
