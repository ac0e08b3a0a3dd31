import java.util.concurrent.*;
import java.util.concurrent.atomic.LongAdder;

/**
 * Host-scaling probe (no Spark): measures how this box's raw compute
 * scales from N to 4N threads, as the denominator for judging the
 * engine's 8->32 scaling efficiency. Two workloads:
 *
 *  - alu: per-thread 64-bit mix loop over a private value (pure ALU,
 *    ~zero memory traffic) -> the best-case core-scaling the host can
 *    physically deliver to ANY process.
 *  - mem: per-thread streaming XOR-sum over a private 64 MiB long array
 *    (DRAM-bandwidth-bound once per-core caches are exceeded) -> the
 *    ceiling for light-transform workloads that stream rows.
 *
 * Prints one JSON line:
 *   {"alu":{"t8":ops,"t32":ops,"eff_8_32":e}, "mem":{...}, "load_before":l}
 *
 * Usage: java CpuScale [durationSecPerTrial] (default 6)
 */
public final class CpuScale {

  static long mix(long x, long iters) {
    for (long i = 0; i < iters; i++) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17;  // xorshift64
      x += 0x9E3779B97F4A7C15L;
    }
    return x;
  }

  /** ops/sec across `threads` workers for `sec` seconds. */
  static double run(int threads, int sec, boolean memBound) throws Exception {
    final LongAdder ops = new LongAdder();
    final CountDownLatch start = new CountDownLatch(1);
    // wall window must exclude per-thread buffer init (2 GiB at 32 threads
    // vs 0.5 at 8) or the wide mem probe is biased low
    final CountDownLatch ready = new CountDownLatch(threads);
    final long deadlineNs = sec * 1_000_000_000L;
    Thread[] ts = new Thread[threads];
    for (int t = 0; t < threads; t++) {
      final int tid = t;
      ts[t] = new Thread(() -> {
        long[] arr = null;
        if (memBound) {
          arr = new long[8 * 1024 * 1024];            // 64 MiB per thread
          for (int i = 0; i < arr.length; i++) arr[i] = i * 0x9E3779B97F4A7C15L;
        }
        ready.countDown();
        try { start.await(); } catch (InterruptedException e) { return; }
        long t0 = System.nanoTime();
        long sink = tid;
        while (System.nanoTime() - t0 < deadlineNs) {
          if (memBound) {
            long s = 0;
            for (int i = 0; i < arr.length; i += 8) s ^= arr[i]; // 1 cacheline/iter
            sink ^= s;
            ops.add(arr.length / 8);
          } else {
            sink = mix(sink, 1_000_000);
            ops.add(1_000_000);
          }
        }
        if (sink == 42) System.out.print("");          // defeat DCE
      });
      ts[t].setDaemon(true);
      ts[t].start();
    }
    ready.await();
    long w0 = System.nanoTime();
    start.countDown();
    for (Thread th : ts) th.join();
    double wallSec = (System.nanoTime() - w0) / 1e9;
    return ops.sum() / wallSec;
  }

  public static void main(String[] args) throws Exception {
    int sec = args.length > 0 ? Integer.parseInt(args[0]) : 6;
    double load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean().getSystemLoadAverage();
    run(32, 2, false); // warmup/JIT
    StringBuilder sb = new StringBuilder("{");
    for (String mode : new String[]{"alu", "mem"}) {
      boolean mem = mode.equals("mem");
      if (mem) run(32, 2, true); // warm allocation paths
      // interleave widths so both see the same neighbor epochs; 2 trials each
      double t8 = 0, t32 = 0;
      for (int i = 0; i < 2; i++) {
        t32 = Math.max(t32, run(32, sec, mem));
        t8 = Math.max(t8, run(8, sec, mem));
      }
      double eff = (t32 / t8) / 4.0;
      sb.append(String.format(
          "\"%s\":{\"t8_ops_per_sec\":%.3e,\"t32_ops_per_sec\":%.3e,\"eff_8_32\":%.3f},",
          mode, t8, t32, eff));
    }
    sb.append(String.format("\"load_before\":%.1f}", load));
    System.out.println(sb);
  }
}
