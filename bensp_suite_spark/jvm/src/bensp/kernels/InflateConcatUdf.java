package bensp.kernels;

import java.io.ByteArrayOutputStream;
import java.util.zip.Inflater;

import com.github.luben.zstd.Zstd;

import org.apache.spark.sql.api.java.UDF2;

import scala.collection.Iterator;
import scala.collection.Seq;

/**
 * Decode-side reassembly kernel: inflate each chunk payload (already
 * ordered by the caller's array_sort over (l1, l2)) and concatenate into
 * the original file bytes -- the JVM analog of the Python decode's
 * applyInPandas reassembly (pipeline.decode). compressType "none" means
 * payloads are raw and are concatenated as-is.
 */
public class InflateConcatUdf implements UDF2<Seq<byte[]>, String, byte[]> {

  @Override
  public byte[] call(Seq<byte[]> payloads, String compressType) throws Exception {
    boolean gzip = "gzip".equals(compressType);
    boolean zstd = "zstd".equals(compressType);
    if (!gzip && !zstd && !"none".equals(compressType)) {
      throw new IllegalArgumentException(
          "JVM decode supports compress_type gzip|zstd|none, got: " + compressType);
    }
    ByteArrayOutputStream out = new ByteArrayOutputStream(1 << 16);
    Inflater inflater = gzip ? new Inflater() : null;
    byte[] scratch = gzip ? new byte[1 << 16] : null;
    try {
      Iterator<byte[]> it = payloads.iterator();
      while (it.hasNext()) {
        byte[] p = it.next();
        if (p == null) {
          throw new IllegalStateException("null payload reached decode (unresolved fingerprint)");
        }
        if (zstd) {
          long size = Zstd.getFrameContentSize(p);
          if (size < 0) {
            throw new IllegalStateException("zstd frame missing content size");
          }
          out.write(Zstd.decompress(p, (int) size), 0, (int) size);
        } else if (gzip) {
          inflater.reset();
          inflater.setInput(p);
          while (!inflater.finished()) {
            int m = inflater.inflate(scratch);
            if (m == 0 && inflater.needsInput()) {
              break; // empty payload stream
            }
            out.write(scratch, 0, m);
          }
        } else {
          out.write(p);
        }
      }
    } finally {
      if (inflater != null) {
        inflater.end();
      }
    }
    return out.toByteArray();
  }
}
