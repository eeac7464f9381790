package org.lucenespark.testfs;

import java.net.URI;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-scaffold Hadoop filesystem serving the {@code s3mock://} scheme from
 * local storage. Lets Spark read/write an index whose root is a NON-file
 * URI scheme end-to-end in the sandbox (no object store available), while
 * the engine's pyarrow side-channel exercises object-store semantics (no
 * atomic rename) through its own s3mock handler. Rebuild with:
 *
 *   javac -cp $SPARK_HOME/jars/hadoop-client-api-*.jar -d /tmp/cls java/S3MockFileSystem.java
 *   jar cf lucene_spark/resources/s3mock-fs.jar -C /tmp/cls .
 */
public class S3MockFileSystem extends RawLocalFileSystem {
  @Override
  public URI getUri() {
    return URI.create("s3mock:///");
  }

  public String getScheme() {
    return "s3mock";
  }
}
