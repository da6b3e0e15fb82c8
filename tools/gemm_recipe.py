#!/usr/bin/env python
"""hybrid-gemm (GEMM-stream-only FP8) at 83M: 3000- and 6000-step cells
vs the cached bf16 baselines.  The production-scoped recipe the
budget-extension study motivates (policy.gemm_only_training_policy);
writes ACCURACY_BUDGET.json["gemm_recipe"]."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accuracy_gates import direct_recipe_gates

OUT = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_BUDGET.json")
results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)
for steps, key in ((3000, "gemm_recipe_3000"), (6000, "gemm_recipe_6000")):
    direct_recipe_gates(steps, 32, 1e-3, results, "large",
                        recipes=(("hybrid-gemm", "fp16"),), out_key=key)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
print("wrote", OUT)
