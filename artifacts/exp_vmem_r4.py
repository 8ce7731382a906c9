"""Round-4 experiment: un-strand the v3/v4 fused-heads kernels.

Round-3 state: fuse_heads=True needed the program-wide
xla_tpu_scoped_vmem_limit_kib=130048 jit option, and THAT OPTION slows
the surrounding program 2x (the same scan program: 21.1 plain vs
41.7 ms under the limit) — so the 12.42-vs-15-ms emulator win never
reached the headline.

Round-4 hypothesis: the v3/v4 pallas_calls simply omitted
``compiler_params=pltpu.CompilerParams(vmem_limit_bytes=...)`` — the
one structural difference from the v2 kernels, which compile under a
plain jit. With the declaration added (ops/pallas_rnn.py), the fused
kernel should compile plain, no program-wide option, no collateral.

Matrix (full hybrid coupled step, bench.py methodology, 21,600 cols,
fix_water+fix_energy — the certified production config):
  A  v2 kernel, plain jit                      (round-3 headline control)
  B  v4 fused-heads, plain jit                 (the candidate fix)
  C  v4 fused-heads, scoped limit 130048       (the round-3 poisoned arm)
Run serialized on the one chip:
  timeout 1800 python artifacts/exp_vmem_r4.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: build + measure)

ARMS = [
    # v5 channel-major kernel in the full production step
    ("F_v5cm_production", dict(fuse_heads=True), None),
    ("F2_v5cm_none", dict(fuse_heads=True, scheme="none",
                          fix_water=False, fix_energy=False), None),
    ("A_v2_production", dict(fuse_heads=False), None),
]

HI = (120, 180, 60)


def main():
    results = {}
    for name, bkw, jkw in ARMS:
        t0 = time.time()
        try:
            stencil = bkw.pop("stencil", True)
            built = bench.build(HI, stencil_pallas=stencil,
                                emulator_pallas=True, **bkw)
            med, spread = bench.measure(*built, jit_kwargs=jkw)
            cols = HI[0] * HI[1] / med
            results[name] = {"ms_per_step": round(med * 1e3, 2),
                             "cols_per_s": round(cols, 0),
                             "spread": round(spread, 3),
                             "wall_s": round(time.time() - t0, 1)}
            print(f"## {name}: {med*1e3:.2f} ms/step ({cols:,.0f} cols/s, "
                  f"spread {spread:.0%})", flush=True)
        except Exception as e:
            msg = str(e)
            results[name] = {"error": f"{type(e).__name__}: {msg[:800]}"}
            print(f"## {name} FAILED: {type(e).__name__}: {msg[:2000]}",
                  flush=True)
    print(json.dumps(results, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_vmem_r4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
