package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Scheme-agnostic dataset staging — the object-store put/get edge
  * (reference `data_generator.py:280-291` uploads generated files to a GCS
  * bucket; the offline analog is the same API over any Hadoop filesystem).
  *
  * All path handling goes through the Hadoop `FileSystem` registry: the URI
  * scheme (`file://`, `hdfs://`, `s3a://`, `gs://` with the connector on the
  * classpath) picks the implementation, and NONE of the staging code changes
  * per store — which is exactly how the same job moves from a laptop to a
  * bucket-backed cluster. A scheme-less path is resolved against the default
  * filesystem (local in tests, the cluster FS in production).
  *
  * Scale posture: `put` is executor-parallel (every partition writes its own
  * object; no driver-side streaming), which is the only upload shape that
  * works when the dataset is 100 TB — the reference's single-file
  * `blob.upload_from_filename` is the laptop special case.
  */
object Stage {

  /** Parse + normalize a location: keeps an explicit scheme, resolves a bare
    * path against the default FS. Returns the fully-qualified URI string. */
  def resolve(spark: SparkSession, location: String): String = {
    val path = new org.apache.hadoop.fs.Path(location)
    val conf = spark.sessionState.newHadoopConf()
    val fs = path.getFileSystem(conf)
    fs.makeQualified(path).toString
  }

  /** The URI scheme a location would dispatch to ("file", "hdfs", "gs", …). */
  def scheme(spark: SparkSession, location: String): String =
    java.net.URI.create(resolve(spark, location)).getScheme

  /** Stage a dataset to a location (the bucket-put analog). Partition-parallel
    * writer; format + mode explicit, no silent append. */
  def put(df: DataFrame, location: String, format: String = "parquet",
      mode: String = "overwrite", options: Map[String, String] = Map.empty): String = {
    val target = resolve(df.sparkSession, location)
    df.write.mode(mode).format(format).options(options).save(target)
    target
  }

  /** Read a staged dataset back. `schema` pins the contract (no inference
    * job at plan time — same rule as [[graft.Tables]]); pass None for the
    * inference-based bronze edge. */
  def get(spark: SparkSession, location: String, format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base: DataFrameReader = spark.read.format(format).options(options)
    schema.fold(base)(base.schema).load(resolve(spark, location))
  }
}
