package graft.torch

import java.net.URI

/**
 * Test-only Hadoop FileSystem with a non-`file:` scheme, registered via
 * ServiceLoader (`META-INF/services/org.apache.hadoop.fs.FileSystem`) —
 * exercises [[TorchScriptModel.readAllBytes]]'s Hadoop-FS branch (the
 * reference's object_store fetch, lib.rs:64-77) without network: any
 * `mock://` URL resolves through the full `Path.getFileSystem` +
 * `fs.open` machinery onto the local disk.
 */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")
}
