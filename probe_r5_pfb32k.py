import json
import bench
bench.enable_compile_cache()
OUT = open("/root/repo/probe_r5_pfb32k.out", "a")
r = bench.bench_pfb(iters=8, mult=32768, mxu_dft=True, fused=True)
print(json.dumps(r), flush=True)
print(json.dumps(r), file=OUT, flush=True)
