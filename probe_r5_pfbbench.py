import json
import bench
bench.enable_compile_cache()
OUT = open("/root/repo/probe_r5_pfbbench.out", "a")
r = bench.bench_pfb(iters=12)
print(json.dumps(r), flush=True)
print(json.dumps(r), file=OUT, flush=True)
