package graft.streaming

/** A local-disk Hadoop FileSystem registered under a NON-`file:` scheme
  * (`graftfs://`) for StateFsSpec: path resolution succeeds only through
  * the Hadoop conf's `fs.graftfs.impl` lookup — the same dispatch an
  * `hdfs://` or `s3a://` checkpoint store takes on a cluster — so any
  * residual java.io/java.nio path assumption in the code under test
  * fails loudly instead of silently hitting the default filesystem.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
