"""Round-5 TPU measurement campaign (run on the real chip):
1. PFB fused time-major pipeline vs r4 corner-turn (VERDICT r4 item 1).
2. Featured chain with the NB front kernel forced to TN=2 vs TN=4
   (VERDICT r4 item 3: is the ~4.5 ms non-NB marginal a tile artifact?).
Writes findings to probe_r5_campaign.out as it goes."""
import json
import sys

import numpy as np

import bench

bench.enable_compile_cache()

OUT = open("/root/repo/probe_r5_campaign.out", "a")


def say(*a):
    print(*a, flush=True)
    print(*a, file=OUT, flush=True)


say("=== PFB fused vs unfused ===")
for fused in (True, False):
    for mxu in (True, False):
        r = bench.bench_pfb(iters=12, mxu_dft=mxu, fused=fused)
        say(json.dumps({k: r[k] for k in
                        ("value", "ms_per_block", "dispatch_floor_pct",
                         "idft", "demod")}))

say("=== featured chain: NB front TN via vmem budget ===")
import probe_front_tn as p

for budget in (None, 14 << 20, 8 << 20):
    try:
        tn, ms = p.timed_chain(True, budget, iters=12)
        say(f"nb budget={'dflt28' if budget is None else budget >> 20}MB "
            f"-> TN={tn}: {ms*1e3:.3f} ms/block")
    except Exception as e:
        say(f"budget={budget} FAIL: {str(e).splitlines()[0][:110]}")
say("campaign done")
