package graft

import graft.sources.CloudPaths

/** Config-level cloud-path contract (reference polars-io/src/cloud/):
  * scheme resolution and storage_options → Hadoop-config plumbing, proven
  * without network. With the standard connector jars on a cluster, the
  * exact keys asserted here are the whole deploy story. */
class CloudPathsSpec extends SparkSpec {

  test("scheme normalization: s3→s3a, az→abfss, passthrough for the rest") {
    assert(CloudPaths.normalize("s3://bucket/a/b.parquet") == "s3a://bucket/a/b.parquet")
    assert(CloudPaths.normalize("s3a://bucket/k") == "s3a://bucket/k")
    assert(CloudPaths.normalize("gs://bucket/k") == "gs://bucket/k")
    assert(CloudPaths.normalize("az://data@acct/raw/t.parquet") ==
      "abfss://data@acct.dfs.core.windows.net/raw/t.parquet")
    assert(CloudPaths.normalize("hdfs://nn:8020/x") == "hdfs://nn:8020/x")
    assert(CloudPaths.normalize("/local/path") == "/local/path")
    intercept[IllegalArgumentException](CloudPaths.normalize("az://noaccount/k"))
  }

  test("storage_options map to the documented Hadoop keys per scheme") {
    assert(CloudPaths.hadoopConf("s3://b/k", Map(
      "aws_access_key_id" -> "AK", "aws_secret_access_key" -> "SK",
      "aws_session_token" -> "TOK", "aws_region" -> "eu-west-1",
      "endpoint_url" -> "http://minio:9000")) == Map(
      "fs.s3a.access.key" -> "AK", "fs.s3a.secret.key" -> "SK",
      "fs.s3a.session.token" -> "TOK", "fs.s3a.endpoint.region" -> "eu-west-1",
      "fs.s3a.endpoint" -> "http://minio:9000"))
    assert(CloudPaths.hadoopConf("s3://b/k", Map("anonymous" -> "true")) == Map(
      "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"))
    assert(CloudPaths.hadoopConf("gs://b/k", Map(
      "service_account_path" -> "/sa.json", "project_id" -> "p1")) == Map(
      "google.cloud.auth.service.account.json.keyfile" -> "/sa.json",
      "fs.gs.project.id" -> "p1"))
    assert(CloudPaths.hadoopConf("az://c@acct/k", Map("account_key" -> "K")) == Map(
      "fs.azure.account.key.acct.dfs.core.windows.net" -> "K"))
    // a typo'd credential key must raise, never silently go anonymous
    intercept[IllegalArgumentException](
      CloudPaths.hadoopConf("s3://b/k", Map("aws_acces_key_id" -> "AK")))
    intercept[IllegalArgumentException](
      CloudPaths.hadoopConf("/local/p", Map("aws_access_key_id" -> "AK")))
  }

  test("configure lands credentials in the session Hadoop conf and returns the read path") {
    val p = CloudPaths.configure(spark, "s3://bkt/tbl",
      Map("aws_access_key_id" -> "AKTEST", "endpoint_url" -> "http://localhost:9"))
    assert(p == "s3a://bkt/tbl")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "AKTEST")
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9")
  }
}
