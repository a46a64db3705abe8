package bensp.kernels;

import java.io.ByteArrayOutputStream;
import java.io.OutputStream;
import java.security.MessageDigest;
import java.util.HashSet;
import java.util.zip.Deflater;

import com.github.luben.zstd.Zstd;

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF3;

/**
 * Fused content-defined-chunking kernel: Rabin CDC + SHA-1 + local-dup-aware
 * compression (DEFLATE, commons-compress bzip2, or zstd via Spark's bundled
 * zstd-jni -- the modern codec the reference lacks), one pass per file,
 * entirely JVM-side.
 *
 * Semantics are bit-identical to the Python kernel in
 * bensp_suite_spark/dedup/rabin.py + pipeline.chunk_hash_compress
 * (with_payload=False), which is itself validated against the reference
 * encoder (apps/dedup/src/rabin.c:72-100, encoder.c:885-1192; see
 * tests/test_dedup_rabin.py). The Python kernel remains the test oracle;
 * this class exists because a JIT-compiled per-byte rolling-hash loop runs
 * ~10x faster per core than the vectorized-numpy scan, and because keeping
 * the whole stage in the JVM removes the Arrow executor-to-Python transfer
 * of every input byte.
 *
 * Output: one struct of parallel arrays per file (l1, l2, start, size,
 * is_last_l2, sha1-hex, compressed-len, payload). A file-local duplicate
 * chunk gets c_len = 0 and a null payload, mirroring the Python pipeline;
 * emitPayload=false (the stats path) nulls every payload while still
 * counting compressed lengths.
 */
public class CdcFuseUdf implements UDF3<byte[], String, Boolean, Row> {

  static final int IRR_POLY = 0x45C2B6A1; // rabin.c:15
  static final int NWINDOW = 32;          // rabin.h:8
  static final int RABIN_MASK = 0xFFF;    // rabin.h:10
  static final int ANCHOR_JUMP = 2 * 1024 * 1024; // dedupdef.h:264
  // zstd default level; deterministic for a fixed zstd-jni version, but do
  // NOT pin golden oracles on zstd byte lengths (library-version-dependent)
  static final int ZSTD_LEVEL = 3;

  private static final int[] TAB = new int[256];
  private static final int[] WIN = new int[256];
  private static final char[] HEX = "0123456789abcdef".toCharArray();

  static {
    for (int i = 0; i < 256; i++) {
      TAB[i] = fpreduce(i);
    }
    // WIN[b] = contribution of the outgoing byte at window offset 0: absorb
    // b then 31 zero-byte absorbs (equals the Python kernel's T[0] row and
    // the reference's rabinwintab, rabin.c:51-68).
    for (int b = 0; b < 256; b++) {
      int h = b;
      for (int j = 0; j < NWINDOW - 1; j++) {
        int x = h >>> 24;
        h = (h << 8) ^ TAB[x];
      }
      WIN[b] = h;
    }
  }

  private static int fpreduce(int x) {
    // GF(2) reduction of x * 2^32 mod the irreducible poly (rabin.c:28-39)
    for (int i = 0; i < 32; i++) {
      x = (x >>> 31) != 0 ? (x << 1) ^ IRR_POLY : x << 1;
    }
    return x;
  }

  /** Absolute positions i (NWINDOW <= i <= n) where hash(data[i-32:i]) has
   *  its low 12 bits zero -- the same global match scan the Python kernel
   *  builds with pair-table gathers (rabin.py match_positions). */
  static int[] matchPositions(byte[] data) {
    int n = data.length;
    if (n < NWINDOW) {
      return new int[0];
    }
    int[] out = new int[64 + n / 2048]; // expected match rate ~ 1/4096
    int count = 0;
    int h = 0;
    for (int i = 0; i < NWINDOW; i++) {
      int x = h >>> 24;
      h = (h << 8) | (data[i] & 0xFF);
      h ^= TAB[x];
    }
    if ((h & RABIN_MASK) == 0) {
      out[count++] = NWINDOW;
    }
    for (int i = NWINDOW; i < n; i++) {
      h ^= WIN[data[i - NWINDOW] & 0xFF];
      int x = h >>> 24;
      h = (h << 8) | (data[i] & 0xFF);
      h ^= TAB[x];
      if ((h & RABIN_MASK) == 0) {
        if (count == out.length) {
          out = java.util.Arrays.copyOf(out, out.length * 2);
        }
        out[count++] = i + 1;
      }
    }
    return java.util.Arrays.copyOf(out, count);
  }

  private static int firstMatchAtLeast(int[] matches, int bound) {
    int lo = 0;
    int hi = matches.length;
    while (lo < hi) {
      int mid = (lo + hi) >>> 1;
      if (matches[mid] < bound) {
        lo = mid + 1;
      } else {
        hi = mid;
      }
    }
    return lo;
  }

  /** Byte-counting sink for the stats path: bzip2 c_len without buffering
   *  the compressed stream. */
  private static final class CountOnlyOutputStream extends OutputStream {
    long count;

    @Override
    public void write(int b) {
      count++;
    }

    @Override
    public void write(byte[] b, int off, int len) {
      count += len;
    }
  }

  /** bzip2-compress one chunk (commons-compress, block size 9 = the Python
   *  stage's bz2.compress(data, 9)). The two encoders emit different —
   *  both valid — byte streams (~0.03% length difference measured), so
   *  bzip2 parity with the Python kernel is ROUND-TRIP parity
   *  (bz2.decompress(jvm_payload) == chunk; tests/test_dedup_pipeline.py
   *  round-trips), not byte parity as with DEFLATE; no oracle or golden
   *  depends on bzip2 byte lengths. */
  private static byte[] bzip2Chunk(byte[] content, int start, int len) throws Exception {
    ByteArrayOutputStream bos = new ByteArrayOutputStream(Math.max(64, len / 2));
    try (BZip2CompressorOutputStream z = new BZip2CompressorOutputStream(bos, 9)) {
      z.write(content, start, len);
    }
    return bos.toByteArray();
  }

  private static long bzip2ChunkLen(byte[] content, int start, int len) throws Exception {
    CountOnlyOutputStream counter = new CountOnlyOutputStream();
    try (BZip2CompressorOutputStream z = new BZip2CompressorOutputStream(counter, 9)) {
      z.write(content, start, len);
    }
    return counter.count;
  }

  private static String hex(byte[] digest) {
    char[] c = new char[digest.length * 2];
    for (int i = 0; i < digest.length; i++) {
      c[2 * i] = HEX[(digest[i] >> 4) & 0xF];
      c[2 * i + 1] = HEX[digest[i] & 0xF];
    }
    return new String(c);
  }

  @Override
  public Row call(byte[] content, String compressType, Boolean emitPayload) throws Exception {
    boolean gzip = "gzip".equals(compressType);
    boolean bzip2 = "bzip2".equals(compressType);
    boolean zstd = "zstd".equals(compressType);
    boolean emit = Boolean.TRUE.equals(emitPayload);
    if (!gzip && !bzip2 && !zstd && !"none".equals(compressType)) {
      throw new IllegalArgumentException(
          "JVM kernel supports compress_type gzip|bzip2|zstd|none, got: " + compressType);
    }
    int n = content == null ? 0 : content.length;
    if (n == 0) {
      // single empty chunk, same digest/c_len the Python stats path emits
      MessageDigest md = MessageDigest.getInstance("SHA-1");
      long clen = 0;
      if (gzip) {
        Deflater d = new Deflater(1);
        d.setInput(new byte[0]);
        d.finish();
        byte[] buf = new byte[32];
        while (!d.finished()) {
          clen += d.deflate(buf);
        }
        d.end();
      } else if (bzip2) {
        clen = bzip2ChunkLen(new byte[0], 0, 0);
      } else if (zstd) {
        clen = Zstd.compress(new byte[0], ZSTD_LEVEL).length;
      }
      byte[] emptyPayload = null;
      if (emit) {
        if (gzip) {
          Deflater d2 = new Deflater(1);
          d2.setInput(new byte[0]);
          d2.finish();
          byte[] b2 = new byte[32];
          int m2 = 0;
          while (!d2.finished()) {
            m2 += d2.deflate(b2, m2, b2.length - m2);
          }
          d2.end();
          emptyPayload = java.util.Arrays.copyOf(b2, m2);
        } else if (bzip2) {
          emptyPayload = bzip2Chunk(new byte[0], 0, 0);
        } else if (zstd) {
          emptyPayload = Zstd.compress(new byte[0], ZSTD_LEVEL);
        } else {
          emptyPayload = new byte[0];
        }
      }
      return RowFactory.create(
          new long[] {0L}, new long[] {0L}, new long[] {0L}, new long[] {0L},
          new boolean[] {true}, new String[] {hex(md.digest())}, new long[] {clen},
          new byte[][] {emptyPayload});
    }

    int[] matches = matchPositions(content);

    // coarse anchors (Fragment, encoder.c:1140-1192)
    int[] anchors = new int[2 + n / ANCHOR_JUMP];
    int nAnchors = 0;
    anchors[nAnchors++] = 0;
    int cur = 0;
    while (n - cur > ANCHOR_JUMP) {
      int idx = firstMatchAtLeast(matches, cur + ANCHOR_JUMP + NWINDOW);
      if (idx >= matches.length || matches[idx] >= n) {
        break;
      }
      cur = matches[idx];
      anchors[nAnchors++] = cur;
    }
    anchors[nAnchors++] = n;

    int cap = matches.length + nAnchors + 2;
    long[] l1s = new long[cap];
    long[] l2s = new long[cap];
    long[] starts = new long[cap];
    long[] sizes = new long[cap];
    boolean[] lasts = new boolean[cap];
    String[] sha1s = new String[cap];
    long[] clens = new long[cap];
    byte[][] payloads = new byte[cap][];
    int nc = 0;

    MessageDigest sha1 = MessageDigest.getInstance("SHA-1");
    Deflater deflater = gzip ? new Deflater(1) : null;
    byte[] scratch = gzip ? new byte[1 << 16] : null;
    HashSet<String> localSeen = new HashSet<>();

    try {
      for (int a = 0; a + 1 < nAnchors; a++) {
        int cs = anchors[a];
        int ce = anchors[a + 1];
        // fine boundaries (FragmentRefine, encoder.c:885-958)
        int firstChunkOfAnchor = nc;
        int start = cs;
        while (true) {
          int idx = firstMatchAtLeast(matches, start + NWINDOW);
          int end = (idx >= matches.length || matches[idx] >= ce) ? ce : matches[idx];
          sha1.reset();
          sha1.update(content, start, end - start);
          String digest = hex(sha1.digest());
          long clen = 0;
          byte[] payload = null;
          if (localSeen.add(digest)) {
            if (zstd) {
              byte[] piece = java.util.Arrays.copyOfRange(content, start, end);
              byte[] z = Zstd.compress(piece, ZSTD_LEVEL);
              clen = z.length;
              if (emit) {
                payload = z;
              }
            } else if (bzip2) {
              if (emit) {
                payload = bzip2Chunk(content, start, end - start);
                clen = payload.length;
              } else {
                clen = bzip2ChunkLen(content, start, end - start);
              }
            } else if (gzip) {
              deflater.reset();
              deflater.setInput(content, start, end - start);
              deflater.finish();
              if (emit) {
                byte[] out = new byte[(end - start) + ((end - start) >> 9) + 64];
                int m = 0;
                while (!deflater.finished()) {
                  if (m == out.length) {
                    out = java.util.Arrays.copyOf(out, out.length * 2);
                  }
                  m += deflater.deflate(out, m, out.length - m);
                }
                payload = java.util.Arrays.copyOf(out, m);
                clen = m;
              } else {
                while (!deflater.finished()) {
                  clen += deflater.deflate(scratch);
                }
              }
            } else {
              clen = end - start;
              if (emit) {
                payload = java.util.Arrays.copyOfRange(content, start, end);
              }
            }
          }
          l1s[nc] = a;
          l2s[nc] = nc - firstChunkOfAnchor;
          starts[nc] = start;
          sizes[nc] = end - start;
          sha1s[nc] = digest;
          clens[nc] = clen;
          payloads[nc] = payload;
          nc++;
          if (end == ce) {
            break;
          }
          start = end;
        }
        lasts[nc - 1] = true;
      }
    } finally {
      if (deflater != null) {
        deflater.end();
      }
    }

    return RowFactory.create(
        java.util.Arrays.copyOf(l1s, nc),
        java.util.Arrays.copyOf(l2s, nc),
        java.util.Arrays.copyOf(starts, nc),
        java.util.Arrays.copyOf(sizes, nc),
        java.util.Arrays.copyOf(lasts, nc),
        java.util.Arrays.copyOf(sha1s, nc),
        java.util.Arrays.copyOf(clens, nc),
        java.util.Arrays.copyOf(payloads, nc));
  }

}
