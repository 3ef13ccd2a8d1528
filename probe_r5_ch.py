"""A/B the nb-mode mix chunk CH=1024 (was 512) on the featured chain."""
import bench
bench.enable_compile_cache()
import probe_front_tn as p
OUT = open("/root/repo/probe_r5_ch.out", "a")
for run in range(2):
    tn, ms = p.timed_chain(True, None, iters=12)
    line = f"featured nb CH=1024 run{run}: TN={tn} {ms*1e3:.3f} ms/block"
    print(line, flush=True)
    print(line, file=OUT, flush=True)
