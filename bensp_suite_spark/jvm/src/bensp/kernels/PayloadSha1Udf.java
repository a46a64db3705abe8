package bensp.kernels;

import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.security.MessageDigest;
import java.util.zip.Inflater;

import com.github.luben.zstd.Zstd;

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream;
import org.apache.spark.sql.api.java.UDF2;

/**
 * SHA-1 of a chunk's ORIGINAL bytes given its compressed payload — the
 * digest-recompute step the CLI decoder needs to resolve fingerprint
 * records against payload records (decoder.c:206-238 keys its hashtable
 * by the uncompressed chunk's digest). JVM-side so zstd payloads (no
 * Python zstd in the stdlib) resolve exactly like gzip/bzip2 ones.
 */
public class PayloadSha1Udf implements UDF2<byte[], String, String> {

  private static final char[] HEX = "0123456789abcdef".toCharArray();

  private static String hex(byte[] digest) {
    char[] c = new char[digest.length * 2];
    for (int i = 0; i < digest.length; i++) {
      c[2 * i] = HEX[(digest[i] >> 4) & 0xF];
      c[2 * i + 1] = HEX[digest[i] & 0xF];
    }
    return new String(c);
  }

  @Override
  public String call(byte[] payload, String compressType) throws Exception {
    if (payload == null) {
      return null;
    }
    byte[] raw;
    if ("gzip".equals(compressType)) {
      Inflater inflater = new Inflater();
      try {
        inflater.setInput(payload);
        ByteArrayOutputStream out = new ByteArrayOutputStream(payload.length * 2);
        byte[] scratch = new byte[1 << 14];
        while (!inflater.finished()) {
          int m = inflater.inflate(scratch);
          if (m == 0 && inflater.needsInput()) {
            break;
          }
          out.write(scratch, 0, m);
        }
        raw = out.toByteArray();
      } finally {
        inflater.end();
      }
    } else if ("bzip2".equals(compressType)) {
      ByteArrayOutputStream out = new ByteArrayOutputStream(payload.length * 2);
      try (BZip2CompressorInputStream in =
          new BZip2CompressorInputStream(new ByteArrayInputStream(payload))) {
        byte[] scratch = new byte[1 << 14];
        int m;
        while ((m = in.read(scratch)) > 0) {
          out.write(scratch, 0, m);
        }
      }
      raw = out.toByteArray();
    } else if ("zstd".equals(compressType)) {
      long size = Zstd.getFrameContentSize(payload);
      if (size < 0) {
        throw new IllegalStateException("zstd frame missing content size");
      }
      raw = Zstd.decompress(payload, (int) size);
    } else if ("none".equals(compressType)) {
      raw = payload;
    } else {
      throw new IllegalArgumentException("unknown compress_type: " + compressType);
    }
    return hex(MessageDigest.getInstance("SHA-1").digest(raw));
  }
}
